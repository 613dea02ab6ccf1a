package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator as-of join — the (c) rung of the custom-operator ladder
  * (SURVEY §7.2 / builder brief): a `LogicalPlan` node, a `SparkStrategy`,
  * and a physical `SparkPlan` whose merge sweep implements the operator
  * directly, instead of composing it from union + window
  * ([[graft.operators.TemporalQueries.ajAsof]], which remains the
  * declared portable form — the two are pinned row-identical by
  * `aj_asof_native`'s shared oracle).
  *
  * Semantics: for every left (probe) row, the right (reference) row with
  * the greatest (time, tie) among rows of the SAME key with
  * time <= probe.time; left outer (payload nulls when no such row).
  *
  * Scale shape — and why a physical operator at all: the relational
  * statement of as-of is a theta join (`ON key = key AND r.time <=
  * l.time`) + per-probe argmax, which Spark plans as a broadcast/shuffle
  * join whose output is the FULL prefix set per probe — quadratic per key
  * — before the argmax prunes it. The union+window composition fixes the
  * blowup but still pays a unioned sort over probes+references and a
  * window operator's buffering. The native exec declares
  * `ClusteredDistribution`/`SortOrder` requirements (EnsureRequirements
  * inserts ONE hash shuffle + per-partition sort per side, reusing any
  * existing partitioning — the same machinery sort-merge join rides) and
  * then streams BOTH sorted sides through a two-pointer sweep holding
  * O(1) state: strictly less work than either alternative, no buffering
  * beyond one candidate row, and partition-parallel by key. */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute, rightPayload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tie, payload) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, payload) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute, rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  /** Both sides cluster on the key (EnsureRequirements co-partitions them,
    * exactly as for a shuffled join) and sort within partitions by
    * (key, time[, tie]) — so the sweep below is a linear merge. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val nPayload = rightPayload.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bindReference's result is cast to the STATIC argument type — pass
      // the attributes up-typed to Expression or the returned
      // BoundReference fails the cast back to Attribute
      val lKey = BindReferences.bindReference(leftKey: Expression, left.output)
      val lTime = BindReferences.bindReference(leftTime: Expression, left.output)
      val rKey = BindReferences.bindReference(rightKey: Expression, right.output)
      val rTime = BindReferences.bindReference(rightTime: Expression, right.output)
      val payloadProj = UnsafeProjection.create(rightPayload, right.output)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow
      // downstream consumers (collect, exchanges) require UnsafeRow output;
      // bind against the nullability-WIDENED schema (`output`, not
      // left.output ++ rightPayload) — a non-nullable payload attribute
      // would bind a no-null-check reader and turn the outer-join nulls
      // into zeros
      val resultProj = UnsafeProjection.create(output, output)
      // stored values may reference a reused row buffer: copy what outlives
      // the iteration step
      def own(v: Any): Any = v match {
        case s: UTF8String => s.clone()
        case x => x
      }
      // Primitive fast path for bigint keys (the common shape — entity
      // ids): ordinal getLong reads, no expression eval, no boxing, no
      // comparator dispatch in the per-row loop. The sweep is the hot
      // inner loop of the whole operator; the interpreted-eval generic
      // path measured 3.5x slower at the sf10 decade point.
      val longKeys = leftKey.dataType == org.apache.spark.sql.types.LongType &&
        rightKey.dataType == org.apache.spark.sql.types.LongType
      if (longKeys) {
        val lk0 = left.output.indexWhere(_.exprId == leftKey.exprId)
        val lt0 = left.output.indexWhere(_.exprId == leftTime.exprId)
        val rk0 = right.output.indexWhere(_.exprId == rightKey.exprId)
        val rt0 = right.output.indexWhere(_.exprId == rightTime.exprId)
        new Iterator[InternalRow] {
          private var rRow: InternalRow = _      // lookahead reference row
          private var rLive = false
          private var cand: InternalRow = _      // best payload for candKey
          private var candKey = 0L
          private var hasCand = false

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = l.getLong(lk0)
            val lt = l.getLong(lt0)
            if (hasCand && candKey != lk) hasCand = false
            var scan = true
            while (scan) {
              if (!rLive) {
                if (rIter.hasNext) { rRow = rIter.next(); rLive = true }
                else scan = false
              }
              if (rLive) {
                val rk = rRow.getLong(rk0)
                if (rk < lk) rLive = false
                else if (rk > lk) scan = false
                else if (rRow.getLong(rt0) <= lt) {
                  cand = payloadProj(rRow).copy()
                  candKey = lk
                  hasCand = true
                  rLive = false
                } else scan = false
              }
            }
            resultProj(joined(l, if (hasCand) cand else nullPayload))
          }
        }
      } else new Iterator[InternalRow] {
        private var rRow: InternalRow = _        // lookahead reference row
        private var rLive = false
        private var cand: InternalRow = _        // best payload for candKey
        private var candKey: Any = _
        private var hasCand = false

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey.eval(l)
          val lt = lTime.eval(l).asInstanceOf[Long]
          if (hasCand && keyOrd.compare(candKey, lk) != 0) hasCand = false
          var scan = true
          while (scan) {
            if (!rLive) {
              if (rIter.hasNext) { rRow = rIter.next(); rLive = true }
              else scan = false
            }
            if (rLive) {
              val c = keyOrd.compare(rKey.eval(rRow), lk)
              if (c < 0) rLive = false // stale key: discard, keep scanning
              else if (c > 0) scan = false // future key: hold for later probes
              else {
                val rt = rTime.eval(rRow).asInstanceOf[Long]
                if (rt <= lt) {
                  // later qualifying rows overwrite: sorted (time, tie)
                  // order makes the last one the as-of winner
                  cand = payloadProj(rRow).copy()
                  candKey = own(lk)
                  hasCand = true
                  rLive = false
                } else scan = false // beyond the probe time: hold
              }
            }
          }
          resultProj(joined(l, if (hasCand) cand else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point. `probes.asofJoin(refs)` semantics: both
  * inputs must expose `key` and `time` (bigint) columns; every OTHER
  * column of `refs` is carried (nullable) onto each probe row from the
  * as-of matched reference row; `tie` breaks equal reference times
  * (greatest wins). Registers the planner strategy idempotently via the
  * public `spark.experimental.extraStrategies`, so it works on sessions
  * without [[GraftExtensions]] installed. */
object AsofJoin {
  def apply(probes: DataFrame, refs: DataFrame, key: String, time: String,
            tie: String): DataFrame = {
    val spark = probes.sparkSession
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofJoinStrategy
    // Re-alias both sides so every output attribute has a FRESH exprId.
    // When both inputs derive from one relation they share exprIds; the
    // analyzer's DeduplicateRelations then remaps the right child's
    // conflicting attributes, but it cannot rewrite a custom node's
    // Attribute fields — they go stale and the optimizer prunes the
    // "unreferenced" key/time columns out from under the exec.
    def fresh(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.functions.col
      df.select(df.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    }
    val lp = fresh(probes).queryExecution.analyzed
    val rp = fresh(refs).queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"missing column $n"))
    val payload = rp.output.filterNot(a => a.name == key || a.name == time)
    // The exec's own() deep-copies only UTF8String values read off the
    // reused UnsafeRow; buffer-backed key types (struct/array/map) would
    // leave the stored candidate key pointing at overwritten memory and
    // produce wrong matches — reject them up front (ADVICE r11).
    for (a <- Seq(attr(lp, key), attr(rp, key))) {
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val buffered = a.dataType match {
        case _: StructType | _: ArrayType | _: MapType => true
        case _ => false
      }
      require(!buffered,
        s"as-of join key '$key' must be an atomic type, got ${a.dataType}")
    }
    DatasetBridge.ofRows(spark,
      AsofJoinPlan(lp, rp, attr(lp, key), attr(rp, key),
        attr(lp, time), attr(rp, time), attr(rp, tie), payload))
  }
}
