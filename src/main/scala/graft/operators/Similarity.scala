package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`, builder brief).
  *
  * - `cosineTopK` — brute-force double-precision path (codegen'd higher-order
  *   functions, broadcast probes): the baseline, O(probes x corpus).
  * - `cosineTopKBucketed` — IVF-style path: neighbors restricted to the
  *   probe's coarse cell (here the `label` column stands in for a centroid
  *   assignment), cutting the scanned fraction to ~1/cells; at 100 TB the
  *   corpus is pre-partitioned/bucketed by cell so each probe touches only
  *   its cell's partitions.
  * - declared oracle queries use exact DECIMAL dot products (cast back to
  *   double) so Spark and DuckDB agree bit-for-bit regardless of summation
  *   order — float summation order is the classic cross-engine mismatch.
  */
object Similarity {

  /** Coarse-cell count of the IVF-PQ family (fixture-scale; a production
    * index uses thousands of cells — sqrt(n) is the usual rule).
    * Declared FIRST: `val` initialization order is declaration order, and
    * the narrow/wide graph oracles bake this into SQL at object init. */
  val IvfPqCells = 8

  /** Cells probed per query. nprobe > 1 is the IVF recall lever: measured
    * on the batch variant's recall gate (sim_pq_recall, sf1), nprobe
    * 1 → 3 on the trained cells lifts recall@3 from the boundary-loss
    * floor toward the PQ-funnel ceiling while candidate volume stays
    * probes × nprobe·corpus/cells. */
  val IvfPqNprobe = 3

  /** Sequential-fold double dot product (production path). */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Exact decimal dot product — order-independent, oracle-parity path
    * (kept for reference; the declared queries use the faster quantized-long
    * variant below). */
  def dotDec(a: Column, b: Column): Column = {
    val prod = zip_with(a, b,
      (x, y) => x.cast("double").cast("decimal(18,9)") * y.cast("double").cast("decimal(18,9)"))
    aggregate(prod, lit(0).cast("decimal(38,18)"),
      (acc, x) => (acc + x).cast("decimal(38,18)"))
  }

  /** Quantize a float vector to 1e-8-unit longs: integer arithmetic from here
    * on is exact and order-independent, so Spark and DuckDB agree bit-for-bit.
    * round() is half-away-from-zero in both engines.
    *
    * Deliberately the DECLARATIVE form: a native codegen'd twin exists
    * (graft.plans.quantizeVec, equality spec-checked) but measured 2x
    * SLOWER inside the cosine queries — the interpreted-fallback lambda
    * forces a materialization boundary (q computed once per row), while the
    * codegen-capable expression inlines into the fused consuming stage and
    * recomputes the BigDecimal-heavy rounding per reference (norms use q
    * twice, the join output a third time). Fusion is only a win when the
    * fused expression is cheap per call or referenced once — dot products
    * and sketches qualify, decimal rounding under multi-reference does not. */
  def qvec(c: Column): Column =
    transform(c, x => round(x.cast("double") * lit(1e8)).cast("long"))

  /** Exact long dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Brute-force cosine top-k (production): probes broadcast against the
    * corpus; per-probe heap via window over (probe) partitions. */
  def cosineTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("qid"), col("embedding").as("va"))
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("vb"))
    val scored = broadcast(p).crossJoin(c).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dotD(col("va"), col("vb")) /
          (sqrt(dotD(col("va"), col("va"))) * sqrt(dotD(col("vb"), col("vb"))))).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "nid", "cosine")
  }

  // ---- oracle fragments (quantized-long arithmetic, relational unnest) ----
  private def unnestSql(filter: String): String =
    s"SELECT vec_id, CAST(round(CAST(unnest(embedding) AS DOUBLE)*100000000.0) AS BIGINT) AS v, " +
      s"generate_subscripts(embedding, 1) AS i FROM embeddings$filter"

  private def topkOracle(probeFilter: String, cellJoin: String, k: Int): String =
    s"""WITH a AS (${unnestSql(probeFilter)}),
      |b AS (${unnestSql("")}),
      |lbl AS (SELECT vec_id, label FROM embeddings),
      |dots AS (SELECT a.vec_id AS qid, b.vec_id AS nid, CAST(CAST(SUM(a.v * b.v) AS BIGINT) AS DOUBLE) AS dot
      |  FROM a JOIN b ON a.i = b.i AND a.vec_id <> b.vec_id
      |  $cellJoin
      |  GROUP BY a.vec_id, b.vec_id),
      |norms AS (SELECT vec_id, sqrt(CAST(CAST(SUM(v * v) AS BIGINT) AS DOUBLE)) AS norm FROM b GROUP BY vec_id)
      |SELECT qid, nid, cosine FROM (
      |  SELECT qid, nid,
      |    round(dot / (na.norm * nb.norm), 6) AS cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
      |      round(dot / (na.norm * nb.norm), 6) DESC, nid) AS rn
      |  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = nid) t
      |WHERE rn <= $k""".stripMargin

  /** (vec_id, label, q, norm): quantized vectors + norms, computed in one
    * scan-stage projection (norm = sqrt(q.q), fused codegen'd dot) and
    * PERSISTED once per session — every similarity query consumes this
    * relation on both join sides (probe + corpus), and at 100 TB the
    * quantize+norm pass is the expensive scan a vector store amortizes,
    * exactly like the MinHash signature store (Dedup.writeSignatureStore). */
  def qnormRelation(spark: SparkSession, d: String): DataFrame =
    graft.Persisted.of(spark, s"$d#emb_qnorm") {
      Tables.embeddings(spark, d)
        .select(col("vec_id"), col("label"), qvec(col("embedding")).as("q"))
        .select(col("vec_id"), col("label"), col("q"),
          sqrt(graft.plans.dotQNative(col("q"), col("q")).cast("double")).as("norm"))
    }

  private def sparkTopKDec(spark: SparkSession, d: String, probeMax: Int,
                           sameCell: Boolean, k: Int): DataFrame = {
    val withNorm = qnormRelation(spark, d)
    val p = withNorm.filter(col("vec_id") < probeMax)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("q").as("va"), col("norm").as("qnorm"))
    val c = withNorm
      .select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("q").as("vb"), col("norm").as("nnorm"))
    val joined =
      if (sameCell) broadcast(p).join(c, col("qlabel") === col("nlabel") && col("qid") =!= col("nid"))
      else broadcast(p).crossJoin(c).filter(col("qid") =!= col("nid"))
    // round(…, 6) both here and in the oracle so 1-ulp double formatting
    // differences can't surface (division/sqrt are IEEE-identical, but keep
    // the guard for robustness across engines).
    val scored = joined.select(col("qid"), col("nid"),
      round(dotQ(col("va"), col("vb")).cast("double") /
        (col("qnorm") * col("nnorm")), 6).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "nid", "cosine")
  }

  /** Brute-force cosine top-5 for probe vectors vec_id < 20 (oracle-checked,
    * exact decimal arithmetic). */
  val simCosineTopK = QueryDef("sim_cosine_topk",
    topkOracle(" WHERE vec_id < 20", "", 5)) { (spark, d) =>
    sparkTopKDec(spark, d, probeMax = 20, sameCell = false, k = 5)
  }

  /** IVF-bucketed variant: neighbors restricted to the probe's cell
    * (label = coarse centroid id); probes vec_id < 100. */
  val simIvfBucketed = QueryDef("sim_ivf_bucketed",
    topkOracle(" WHERE vec_id < 100",
      "JOIN lbl la ON la.vec_id = a.vec_id JOIN lbl lb ON lb.vec_id = b.vec_id AND la.label = lb.label", 3)) { (spark, d) =>
    sparkTopKDec(spark, d, probeMax = 100, sameCell = true, k = 3)
  }

  /** Embedding-cosine near-duplicate pairs (dedup method #5 in the brief):
    * candidate pairs (same cell, id window <= 200 — standing in for an LSH
    * candidate set, which is what feeds this verify stage at scale) scored
    * by exact quantized cosine, kept above threshold 0.3. */
  val ddEmbeddingNearDup = QueryDef("dd_embedding_neardup",
    // The oracle bands the id window INTO the join key exactly like the
    // engine's dd_semdedup plan (a forward pair within 200 lands in the
    // same or next id band, so the left side explodes into two band keys)
    // and forms dots as per-pair list arithmetic instead of a 64x unnest
    // join — the unbanded form hash-joined on the 10-value label alone,
    // putting n²/20 pre-filter pairs through the window predicate, which
    // is what blew the 600 s oracle budget at sf1 (VERDICT r11 #5; the
    // result set is identical, the sf0.001..0.1 gates prove it).
    s"""WITH q AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*100000000.0) AS BIGINT)) AS qv FROM embeddings),
      |xa AS (SELECT vec_id, label, qv, vec_id // 200 AS band FROM q
      |       UNION ALL SELECT vec_id, label, qv, vec_id // 200 + 1 FROM q),
      |cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.qv AS qa, b.qv AS qb
      |  FROM xa a JOIN q b ON a.label = b.label AND a.band = b.vec_id // 200
      |    AND a.vec_id < b.vec_id AND b.vec_id - a.vec_id <= 200),
      |norms AS (SELECT vec_id, sqrt(CAST(list_sum(list_transform(qv, v -> v*v)) AS DOUBLE)) AS norm FROM q)
      |SELECT vec_a, vec_b, cosine FROM (
      |  SELECT vec_a, vec_b,
      |    round(CAST(list_sum(list_transform(generate_series(1, len(qa)), i -> qa[i]*qb[i])) AS DOUBLE)
      |      / (na.norm * nb.norm), 6) AS cosine
      |  FROM cand JOIN norms na ON na.vec_id = vec_a
      |            JOIN norms nb ON nb.vec_id = vec_b) t
      |WHERE cosine >= 0.3""".stripMargin) { (spark, d) =>
    val withNorm = qnormRelation(spark, d)
    // the id window rides IN the join key as a band (the dd_semdedup
    // construction, 28x at sf10): label-only equality makes the join
    // materialize sum-of-squared-label-group intermediates with the
    // window as a post-join filter — quadratic in the label group size
    val a = withNorm.select(col("vec_id").as("vec_a"), col("label"),
        col("q").as("qa"), col("norm").as("na"))
      .withColumn("band",
        explode(array(expr("vec_a div 200"), expr("vec_a div 200 + 1"))))
    val b = withNorm.select(col("vec_id").as("vec_b"), col("label"),
        col("q").as("qb"), col("norm").as("nb"))
      .withColumn("band", expr("vec_b div 200"))
    a.join(b, Seq("label", "band"))
      .filter(col("vec_a") < col("vec_b") && col("vec_b") - col("vec_a") <= 200)
      .select(col("vec_a"), col("vec_b"),
        round(dotQ(col("qa"), col("qb")).cast("double") /
          (col("na") * col("nb")), 6).as("cosine"))
      .filter(col("cosine") >= 0.3)
  }

  // ---- hyperplane LSH (random-projection signs) ----
  /** Deterministic pseudo-random hyperplane component for lane j, dim i
    * (1-based): ((Aj*i + Bj) mod 7) - 3 in {-3..3} — tiny integers so the
    * dot with a 1e-8-quantized vector stays an exact long on both engines. */
  val HA: Seq[Long] = Seq(104729L, 130363L, 174763L, 224737L, 12289L, 52361L,
    75377L, 1103L, 2971L, 56993L, 11213L, 3571L, 91129L, 40031L, 65537L, 12345L)
  val HB: Seq[Long] = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L,
    37L, 41L, 43L, 47L, 53L, 59L, 61L, 67L)
  val Dim = 64

  private def hyperplane(j: Int): Seq[Long] =
    (1 to Dim).map(i => ((HA(j) * i + HB(j)) % 7) - 3)

  /** 16-bit sign sketch of a quantized vector: bit j set iff dot(q, h_j)>=0.
    * Each lane is a fused codegen'd dot against a literal hyperplane. */
  private def lshSig(q: Column): Column =
    (0 until 16).map { j =>
      when(graft.plans.dotQNative(q, typedlit(hyperplane(j))) >= 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  private def lshSigSql(q: String): String =
    (0 until 16).map { j =>
      s"CASE WHEN list_sum(list_transform(generate_series(1, len($q)), i -> $q[i] * (((${HA(j)}*i + ${HB(j)}) % 7) - 3))) >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")

  /** Explode a (vec_id, …, q, norm) relation into hyperplane-LSH band rows
    * (vec_id, …, q, norm, band_id, band_val) — the storable vector-index
    * shape: both 8-bit bands of the 16-bit sign sketch. Columns other than
    * `q` pass through untouched, so an index can carry routing metadata
    * (e.g. an IVF `cell`) alongside the sketch. */
  def hyperBandsOfQNorm(r: DataFrame): DataFrame = {
    val base = r.columns.toSeq.map(col)
    r.select(base :+ lshSig(col("q")).as("sg"): _*)
      .select(base :+
        explode(array((0 until 2).map { bid =>
          struct(lit(bid).as("band_id"),
            shiftright(col("sg"), 8 * bid).bitwiseAND(lit(255L)).as("band_val"))
        }: _*)).as("band"): _*)
      .select(base ++ Seq(col("band.band_id"), col("band.band_val")): _*)
  }

  /** Same, from raw (vec_id, …, embedding) vectors: quantize + norm + bands
    * in one pass (the store-build / batch-sketch entry). Non-embedding
    * columns pass through. */
  def hyperBands(vecs: DataFrame): DataFrame =
    hyperBandsOfQNorm(qnormOfVecs(vecs))

  /** Wide-tier twin of [[hyperBands]] (4 × 16-bit bands off the 64-lane
    * sketch): the rolling-ingest entry for stores past the band knee —
    * tier choice is a BOOTSTRAP parameter of a rolling store (its bands
    * are at rest; re-tiering is an offline re-encode, like IVF
    * retraining), so the streaming loops take it as a flag where the
    * batch side routes per-call ([[knnGraphAuto]]). Same relation shape
    * as the narrow tier — every consumer takes either. */
  def hyperBandsWide(vecs: DataFrame): DataFrame =
    hyperBandsWideOfQNorm(qnormOfVecs(vecs))

  /** (passthrough…, q, norm) off raw (…, embedding) vectors — the shared
    * quantize+norm pass of both band-tier sketchers. */
  private def qnormOfVecs(vecs: DataFrame): DataFrame = {
    val passthrough = vecs.columns.toSeq.filterNot(_ == "embedding").map(col)
    vecs.select(passthrough :+ qvec(col("embedding")).as("q"): _*)
      .select(passthrough ++ Seq(col("q"),
        sqrt(graft.plans.dotQNative(col("q"), col("q")).cast("double")).as("norm")): _*)
  }

  // ---- WIDE hyperplane family (the band-saturation tier) ----
  /** 64-lane hyperplane family for the wide band tier. NOT the narrow
    * family's {-3..3} mod-7 components: that family has at most 6 x 7 = 42
    * distinct patterns (a lane depends only on A mod 7, B mod 7), so 64
    * lanes would necessarily duplicate hyperplanes and the 16-bit bands
    * would carry far fewer effective bits (measured: only a 2.8x candidate
    * cut on a spread corpus). Components ((A i + B) mod 101) - 50 in
    * {-50..50} give ~10k distinct patterns; (A, B) draw from consecutive
    * primes (primes > 101 are never ≡ 0 mod 101, so no lane degenerates).
    * Computed, not typed: the same Seq feeds both the Spark literals and
    * the generated oracle SQL, so the two engines cannot drift. Dots stay
    * exact longs: |q_i| <= ~1e9, |h_i| <= 50, 64 terms — well under 2^63. */
  private def primesFrom(start: Long, n: Int): Seq[Long] =
    Iterator.iterate(start)(_ + 1)
      .filter(x => x > 1 && (2L to math.sqrt(x.toDouble).toLong).forall(x % _ != 0))
      .take(n).toSeq
  val HAWide: Seq[Long] = primesFrom(300000L, 64)
  val HBWide: Seq[Long] = primesFrom(300L, 64)

  /** Package-visible so the occupancy census (graft.Probe) measures the
    * SAME lanes the production bands use — a re-derived copy would
    * silently desynchronize if the formula or seeds changed. */
  private[graft] def hyperplaneW(j: Int): Seq[Long] =
    (1 to Dim).map(i => ((HAWide(j) * i + HBWide(j)) % 101) - 50)

  /** 16-bit band value b (0..3) of the 64-lane sign sketch: bit t set iff
    * dot(q, h_{16b+t}) >= 0. Band values are built directly (sum of
    * disjoint powers of two < 2^16) instead of slicing a packed 64-bit
    * signature, so no band expression ever touches the long sign bit —
    * 2^63 does not fit the oracle's BIGINT literal space. */
  private def wideBandVal(q: Column, b: Int): Column =
    (0 until 16).map { t =>
      when(graft.plans.dotQNative(q, typedlit(hyperplaneW(16 * b + t))) >= 0,
        lit(1L << t)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def wideBandValSql(q: String, b: Int): String =
    (0 until 16).map { t =>
      val j = 16 * b + t
      s"CASE WHEN list_sum(list_transform(generate_series(1, len($q)), i -> $q[i] * (((${HAWide(j)}*i + ${HBWide(j)}) % 101) - 50))) >= 0 THEN CAST(${1L << t} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")

  /** Wide analogue of [[hyperBandsOfQNorm]]: 4 bands x 16 bits from the
    * 64-lane sketch — band value space 65,536 vs the narrow tier's 256.
    * Same relation shape, so every consumer of the narrow store can take
    * the wide one unchanged. */
  def hyperBandsWideOfQNorm(r: DataFrame): DataFrame = {
    val base = r.columns.toSeq.map(col)
    r.select(base :+ explode(array((0 until 4).map { b =>
        struct(lit(b).as("band_id"), wideBandVal(col("q"), b).as("band_val"))
      }: _*)).as("band"): _*)
      .select(base ++ Seq(col("band.band_id"), col("band.band_val")): _*)
  }

  /** Hyperplane-LSH ANN: candidates = vectors sharing either 8-bit band of
    * the 16-bit sign sketch with the probe (sign sketches of near-parallel
    * vectors agree on most bits -> some band collides); exact quantized
    * cosine on candidates only; top-3 per probe. The second LSH family next
    * to IVF (sim_ivf_bucketed): no centroids needed, candidate volume
    * ~n/256 per band at uniform spread. Probes vec_id < 100. */
  val simLshHyperplane: QueryDef = {
    val k = 3
    QueryDef("sim_lsh_ann",
      s"""WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*100000000.0) AS BIGINT)) AS qv FROM embeddings),
        |sig AS (SELECT vec_id, qv, ${lshSigSql("qv")} AS sg FROM q),
        |bands AS (SELECT vec_id, qv, band_id, (sg >> (band_id*8)) & 255 AS band_val
        |          FROM sig CROSS JOIN (VALUES (0),(1)) b(band_id)),
        |cand AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
        |  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
        |    AND a.vec_id < 100 AND a.vec_id <> b.vec_id),
        |dots AS (SELECT c.qid, c.nid,
        |    CAST(list_sum(list_transform(generate_series(1, len(x.qv)), i -> x.qv[i] * y.qv[i])) AS DOUBLE) AS dot
        |  FROM cand c JOIN q x ON x.vec_id = c.qid JOIN q y ON y.vec_id = c.nid),
        |norms AS (SELECT vec_id, sqrt(CAST(list_sum(list_transform(qv, v -> v*v)) AS DOUBLE)) AS norm FROM q)
        |SELECT qid, nid, cosine FROM (
        |  SELECT qid, nid, round(dot / (na.norm * nb.norm), 6) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY round(dot / (na.norm * nb.norm), 6) DESC, nid) AS rn
        |  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = nid) t
        |WHERE rn <= $k""".stripMargin) { (spark, d) =>
      // Band join over a PERSISTED bands relation (like dd_simhash_neardup):
      // persisting gives compute-once across the two join sides, and the
      // join streams bucket expansion with bounded memory (sort-merge
      // spill + AQE skew split) where a collect_list bucket held an entire
      // — possibly O(N)-skewed — LSH bucket in one aggregation buffer.
      // The probe side (vec_id < 100) is tiny, so it broadcasts: the
      // corpus never shuffles, which is the 100 TB shape for ANN probing.
      val bands = narrowBandsRelation(spark, d)
      val probe = bands.filter(col("vec_id") < 100)
        .select(col("band_id"), col("band_val"), col("vec_id").as("qid"),
          col("q").as("qa"), col("norm").as("na"))
      val corpus = bands
        .select(col("band_id"), col("band_val"), col("vec_id").as("nid"),
          col("q").as("qb"), col("norm").as("nb"))
      val cand = broadcast(probe).join(corpus, Seq("band_id", "band_val"))
        .filter(col("qid") =!= col("nid"))
        .select("qid", "nid", "qa", "qb", "na", "nb")
        .distinct()
      val scored = cand.select(col("qid"), col("nid"),
        round(graft.plans.dotQNative(col("qa"), col("qb")).cast("double") /
          (col("na") * col("nb")), 6).as("cosine"))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("qid", "nid", "cosine")
    }
  }

  /** Incremental batch-vs-store ANN (VERDICT r7 #4, mirroring
    * [[Dedup.simhashNearDupIncremental]]): top-k exact-cosine neighbors for
    * each NEW vector, candidates drawn from band collisions against
    * (store ∪ batch) — without recomputing stored sketches. Work scales
    * with the batch: the store never reshuffles (its bands join the
    * batch's), which is the rolling-ingest shape a 100 TB vector corpus
    * needs. Same ingest contract as the dedup twins: re-ingested ids
    * supersede their store rows (anti-join against the persisted batch
    * sketch ids, no second source scan), the batch sketch computes once
    * per call, and only the LATEST batch stays cached.
    *
    * `routeCols` names metadata columns (present in BOTH the store bands
    * and `newVecs`, e.g. an IVF `cell`) that join the band key: candidates
    * must then share the routing value as well. On clustered corpora the
    * cross-cell band collisions dominate (sf1: 8x the same-cell
    * candidates — two clusters coinciding on one 8-bit band value
    * contribute |A|x|B| pairs), and at 100 TB the store is partitioned by
    * the routing column anyway, so routing the band join is both the
    * candidate cut and the partition-pruning story. The switch is an
    * explicit call-site decision — a metadata column merely NAMED cell
    * never changes semantics. Store columns outside (vec_id, q, norm,
    * bands, routeCols) are ignored, so one routed store can serve
    * unrouted calls. */
  def lshAnnIncremental(storeBands: DataFrame, newVecs: DataFrame, k: Int = 3,
                        routeCols: Seq[String] = Nil): DataFrame = {
    val spark = newVecs.sparkSession
    val batchPrefix = (Seq("hyperlsh_batch") ++ routeCols).mkString("_") + "#"
    val batchKey = batchPrefix + newVecs.queryExecution.analyzed.semanticHash()
    // Per-variant prefix: the routed and unrouted queries keep independent
    // batch caches instead of evicting each other on every alternation.
    graft.Persisted.clearExcept(spark, batchPrefix, batchKey)
    val newBands = graft.Persisted.of(spark, batchKey) { hyperBands(newVecs) }
    lshAnnIncrementalBands(storeBands, newBands, k, routeCols)
  }

  /** [[lshAnnIncremental]] over a PRE-SKETCHED batch: `newBands` is the
    * batch's band relation (from [[hyperBands]]), already persisted by the
    * caller — the entry a driver that also WRITES the batch bands uses
    * (e.g. [[graft.streaming.RollingIngest]]), so the sketch computes once
    * for both the probe and the store append. */
  def lshAnnIncrementalBands(storeBands: DataFrame, newBands: DataFrame,
                             k: Int = 3, routeCols: Seq[String] = Nil): DataFrame = {
    require(routeCols.forall(newBands.columns.contains),
      s"routeCols $routeCols must be columns of the batch bands")
    val bandCols = Seq("vec_id", "q", "norm", "band_id", "band_val") ++ routeCols
    val bandKey = Seq("band_id", "band_val") ++ routeCols
    val liveStore = storeBands.select(bandCols.map(col): _*)
      .join(newBands.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
    val allBands = liveStore
      .unionByName(newBands.select(bandCols.map(col): _*))
    // Candidates carry IDS ONLY through the band join and its dedup — at
    // sf1 the 8-bit bands put ~80 vectors in a bucket, and shipping the
    // 64-element quantized arrays through that expansion + distinct was
    // 10x the whole query (11.2s -> ~1s). Vectors join back from the band
    // relations afterwards (band_id = 0 projects each vector exactly once,
    // no array-hashing distinct), so exact scoring work ∝ distinct
    // candidate pairs — the same ids-only discipline as sim_sq8_rerank's
    // top CTE.
    val cand = allBands.select(bandKey.map(col) :+ col("vec_id").as("nid"): _*)
      .join(newBands.select(bandKey.map(col) :+ col("vec_id").as("qid"): _*),
        bandKey)
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid")
      .distinct()
    val vecsNew = newBands.filter(col("band_id") === 0)
      .select(col("vec_id").as("qid"), col("q").as("qa"), col("norm").as("na"))
    val vecsAll = allBands.filter(col("band_id") === 0)
      .select(col("vec_id").as("nid"), col("q").as("qb"), col("norm").as("nb"))
    val scored = cand.join(vecsNew, "qid").join(vecsAll, "nid")
      .select(col("qid"), col("nid"),
        round(graft.plans.dotQNative(col("qa"), col("qb")).cast("double") /
          (col("na") * col("nb")), 6).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "nid", "cosine")
  }

  /** Oracle chain shared by the incremental-ingest queries: full-corpus
    * band collisions restricted to batch probes (vec_id % 20 = 0), with the
    * IVF cell equality folded into the candidate join when `cellEq`. */
  private def incrementalAnnOracle(cellEq: Boolean, k: Int): String = {
    val lbl = if (cellEq) ", label" else ""
    val cellCond = if (cellEq) " AND a.label = b.label" else ""
    s"""WITH q AS (SELECT vec_id$lbl, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*100000000.0) AS BIGINT)) AS qv FROM embeddings),
      |sig AS (SELECT vec_id$lbl, qv, ${lshSigSql("qv")} AS sg FROM q),
      |bands AS (SELECT vec_id$lbl, qv, band_id, (sg >> (band_id*8)) & 255 AS band_val
      |          FROM sig CROSS JOIN (VALUES (0),(1)) b(band_id)),
      |cand AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
      |  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val$cellCond
      |    AND a.vec_id % 20 = 0 AND a.vec_id <> b.vec_id),
      |dots AS (SELECT c.qid, c.nid,
      |    CAST(list_sum(list_transform(generate_series(1, len(x.qv)), i -> x.qv[i] * y.qv[i])) AS DOUBLE) AS dot
      |  FROM cand c JOIN q x ON x.vec_id = c.qid JOIN q y ON y.vec_id = c.nid),
      |norms AS (SELECT vec_id, sqrt(CAST(list_sum(list_transform(qv, v -> v*v)) AS DOUBLE)) AS norm FROM q)
      |SELECT qid, nid, cosine FROM (
      |  SELECT qid, nid, round(dot / (na.norm * nb.norm), 6) AS cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY round(dot / (na.norm * nb.norm), 6) DESC, nid) AS rn
      |  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = nid) t
      |WHERE rn <= $k""".stripMargin
  }

  /** ONE session band store over the mod-20 "persisted corpus"
    * (vec_id % 20 != 0), carrying the IVF cell: it serves BOTH incremental
    * queries — the unrouted path simply ignores the cell column
    * (lshAnnIncremental projects the store to the columns it needs).
    * Built over the persisted [[qnormRelation]], so the quantize+norm pass
    * is never repeated for the store build. */
  private def incrementalStore(spark: SparkSession, d: String): DataFrame =
    graft.Persisted.of(spark, s"$d#hyperlsh_store_mod20") {
      hyperBandsOfQNorm(
        qnormRelation(spark, d).filter(col("vec_id") % 20 =!= 0)
          .select(col("vec_id"), col("label").as("cell"), col("q"), col("norm")))
    }

  /** Oracle-checked incremental ingest query: proportional seeding (ids
    * with vec_id % 20 == 0 are the NEW batch, the rest the persisted
    * store) so it holds at every SF. A 5% batch is the incremental
    * premise — work ∝ batch; the corpus embeddings are CLUSTERED, so
    * band buckets hold whole clusters and candidates grow with
    * batch x cluster size at any band width (measured 3.5M pairs at sf1
    * for a 25% batch; a wider 32-lane sketch only cut 2.6x because
    * near-identical vectors share any sign band — that is what bands are
    * for). The oracle replays the full-corpus band chain restricted to
    * batch probes — equivalent because the incremental (store ∪ batch) x
    * batch band join finds exactly the full chain's batch-probed
    * collisions, and the mod-20 split has no id overlap, so supersede
    * semantics (spec-covered) don't alter the result. */
  val simIncrementalAnn: QueryDef = {
    val k = 3
    QueryDef("sim_incremental_ann", incrementalAnnOracle(cellEq = false, k)) { (spark, d) =>
      val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      lshAnnIncremental(incrementalStore(spark, d),
        emb.filter(col("vec_id") % 20 === 0), k)
    }
  }

  /** IVF-cell-routed incremental ANN: the same batch-vs-store band join,
    * but candidates must also share the probe's coarse cell (label =
    * centroid id, as in sim_ivf_bucketed), via `routeCols`. On the
    * clustered corpus the cross-cell band collisions are the candidate
    * blowup — two clusters whose sketches coincide on one 8-bit band value
    * contribute |A|x|B| pairs — and the cell equality removes exactly
    * those (measured at sf1: 713,600 -> 78,900 distinct candidate pairs, a
    * 9x cut; 2.5x faster end-to-end). At 100 TB the vector store is
    * IVF-partitioned by cell, so this is also the partition-pruning shape:
    * a batch probe's band join touches only its cell's partitions. */
  val simIncrementalAnnIvf: QueryDef = {
    val k = 3
    QueryDef("sim_incremental_ann_ivf", incrementalAnnOracle(cellEq = true, k)) { (spark, d) =>
      val emb = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("label").as("cell"), col("embedding"))
      lshAnnIncremental(incrementalStore(spark, d),
        emb.filter(col("vec_id") % 20 === 0), k, routeCols = Seq("cell"))
    }
  }

  // ---- SQ8 compressed-domain scan + exact re-rank ----

  /** (vec_id, code, s127, q, norm): int8-style scalar quantization — per
    * vector, scale s127 = max|x| / 127 and code_i = round(x_i / s127) in
    * [-127, 127] — alongside the exact quantized vector + norm, persisted
    * once per session. The compressed-domain ANN store: the approximate
    * scan reads 1-byte-range codes (4x less memory bandwidth than f32; the
    * dominant cost of a 100 TB brute scan is bytes moved), and the exact
    * columns serve the re-rank. Codes ride an array<bigint> here — the
    * VALUE range is int8; a deployment would pack them into BinaryType via
    * a native expression, a storage-format change that does not affect the
    * query semantics tested here. Zero vectors quantize to all-zero codes. */
  def sq8Relation(spark: SparkSession, d: String): DataFrame =
    graft.Persisted.of(spark, s"$d#emb_sq8") {
      qnormRelation(spark, d)
        .join(Tables.embeddings(spark, d).select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("vec_id"), col("q"), col("norm"),
          (array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127.0)
            .as("s127"),
          col("embedding"))
        .select(col("vec_id"), col("q"), col("norm"), col("s127"),
          when(col("s127") > 0,
            transform(col("embedding"), x => round(x.cast("double") / col("s127")).cast("long")))
            .otherwise(transform(col("embedding"), _ => lit(0L))).as("code"))
    }

  /** SQ8 two-phase ANN (the FAISS scalar-quantizer pattern): phase 1 scores
    * the WHOLE corpus per probe in the compressed domain — integer code
    * dot, rescaled by (s127_a * s127_b) and normalized, round(6) — keeping
    * the top 10; phase 2 re-ranks those candidates with the exact
    * quantized cosine and emits the top 3. The approximate ordering
    * differs from the exact one (that is the point — it is computed from
    * 1/4 the bytes); the re-rank restores exactness within the candidate
    * set, and every arithmetic step is deterministic on both engines.
    * Probes vec_id < 50. */
  val simSq8Rerank: QueryDef = {
    val k = 3
    val cand = 10
    QueryDef("sim_sq8_rerank",
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |mx AS (SELECT vec_id, list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s127 FROM e),
        |cd AS (SELECT e.vec_id, mx.s127,
        |    CASE WHEN mx.s127 > 0
        |         THEN list_transform(e.embedding, x -> CAST(round(CAST(x AS DOUBLE) / mx.s127) AS BIGINT))
        |         ELSE list_transform(e.embedding, x -> CAST(0 AS BIGINT)) END AS code
        |  FROM e JOIN mx ON mx.vec_id = e.vec_id),
        |q AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*100000000.0) AS BIGINT)) AS qv FROM e),
        |norms AS (SELECT vec_id, sqrt(CAST(list_sum(list_transform(qv, v -> v*v)) AS DOUBLE)) AS norm FROM q),
        |approx AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    round(CAST(list_sum(list_transform(generate_series(1, len(a.code)), i -> a.code[i] * b.code[i])) AS DOUBLE)
        |      * a.s127 * b.s127 / ((na.norm / 100000000.0) * (nb.norm / 100000000.0)), 6) AS acos
        |  FROM cd a JOIN cd b ON a.vec_id < 50 AND a.vec_id <> b.vec_id
        |  JOIN norms na ON na.vec_id = a.vec_id JOIN norms nb ON nb.vec_id = b.vec_id),
        |top AS (SELECT qid, nid FROM (
        |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY acos DESC, nid) AS rn
        |  FROM approx) t WHERE rn <= $cand),
        |exact AS (
        |  SELECT t.qid, t.nid,
        |    round(CAST(list_sum(list_transform(generate_series(1, len(x.qv)), i -> x.qv[i] * y.qv[i])) AS DOUBLE)
        |      / (na.norm * nb.norm), 6) AS cosine
        |  FROM top t JOIN q x ON x.vec_id = t.qid JOIN q y ON y.vec_id = t.nid
        |  JOIN norms na ON na.vec_id = t.qid JOIN norms nb ON nb.vec_id = t.nid)
        |SELECT qid, nid, cosine FROM (
        |  SELECT qid, nid, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rn
        |  FROM exact) t WHERE rn <= $k""".stripMargin) { (spark, d) =>
      val r = sq8Relation(spark, d)
      // per-side norm/1e8 FIRST, then multiply — the oracle parenthesizes
      // identically, so the IEEE doubles match bit-for-bit; the exact phase
      // divides by the raw quantized norms like sparkTopKDec
      val p = r.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("code").as("ca"),
          col("s127").as("sa"), (col("norm") / 1e8).as("na"))
      val c = r.select(col("vec_id").as("nid"), col("code").as("cb"),
        col("s127").as("sb"), (col("norm") / 1e8).as("nb"))
      // phase 1: compressed-domain scan — integer code dot, rescaled.
      // Emits ONLY (qid, nid, acos): the full-corpus rows pass through the
      // per-probe top-10 window carrying three scalars, never the exact
      // vectors — carrying q through this shuffle would move more bytes
      // than the code scan saves and defeat the compressed-domain design
      // (the oracle's `top` CTE keeps only ids for the same reason).
      val approx = broadcast(p).crossJoin(c).filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          round(graft.plans.dotQNative(col("ca"), col("cb")).cast("double") *
            col("sa") * col("sb") / (col("na") * col("nb")), 6).as("acos"))
      val wApprox = Window.partitionBy("qid").orderBy(col("acos").desc, col("nid"))
      val cands = approx.withColumn("rn", row_number().over(wApprox))
        .filter(col("rn") <= cand)
        .select("qid", "nid")
      // phase 2: the <=10-per-probe candidates join back to the persisted
      // store for exact vectors + norms — exact work ∝ candidates, not corpus
      val exact = cands
        .join(r.select(col("vec_id").as("qid"), col("q").as("qa"),
          col("norm").as("qna")), "qid")
        .join(r.select(col("vec_id").as("nid"), col("q").as("qb"),
          col("norm").as("qnb")), "nid")
        .select(col("qid"), col("nid"),
          round(graft.plans.dotQNative(col("qa"), col("qb")).cast("double") /
            (col("qna") * col("qnb")), 6).as("cosine"))
      val wExact = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
      exact.withColumn("rn", row_number().over(wExact)).filter(col("rn") <= k)
        .select("qid", "nid", "cosine")
    }
  }

  /** All-pairs k-NN graph over the corpus — the SemDeDup-family building
    * block: semantic near-dup clustering, diversity filtering, and
    * embedding-space outlier pruning all start from "top-k neighbors for
    * EVERY vector", not for a probe set. [[simLshHyperplane]] with the
    * probe restriction removed: the persisted LSH band relation
    * SELF-joins on (band_id, band_val), so candidate volume is
    * sum-of-squared-bucket-sizes — ~n^2/256 per band at uniform spread,
    * against n^2 for the brute-force graph — then exact quantized cosine
    * on candidates only and a per-node top-3 window.
    *
    * Scale shape: no broadcast side exists (both sides are the corpus),
    * so this is the one similarity query that MUST shuffle the corpus —
    * once, by band key, the same exchange both sides reuse
    * (ReusedExchange: the two branches are projections of one persisted
    * relation). Hot buckets (clustered corpora collapse to few sketch
    * values) are AQE skew-split; recall is the band-collision probability,
    * raised by adding bands, never by widening buckets. */
  /** Shared oracle for the narrow-band graph tier, with the trained-cell
    * equality optionally composed into the candidate join (`cellEq`) and
    * an optional source restriction (`srcCond`, appended to the q CTE —
    * the dedup-then-index composition filters to SemDeDup survivors). */
  private def narrowKnnOracleSql(cellEq: Boolean, k: Int,
                                 srcCond: String = ""): String = {
    val coarse = if (cellEq) coarseCellCtesSql("", "") + ",\n" else ""
    val cellJoin = if (cellEq)
      """
        |    JOIN cells ca ON ca.vec_id = a.vec_id
        |    JOIN cells cb ON cb.vec_id = b.vec_id AND cb.cell = ca.cell""".stripMargin
    else ""
    s"""WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*100000000.0) AS BIGINT)) AS qv FROM embeddings$srcCond),
      |${coarse}sig AS (SELECT vec_id, qv, ${lshSigSql("qv")} AS sg FROM q),
      |bands AS (SELECT vec_id, band_id, (sg >> (band_id*8)) & 255 AS band_val
      |          FROM sig CROSS JOIN (VALUES (0),(1)) b(band_id)),
      |cand AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
      |  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
      |    AND a.vec_id <> b.vec_id$cellJoin),
      |dots AS (SELECT c.qid, c.nid,
      |    CAST(list_sum(list_transform(generate_series(1, len(x.qv)), i -> x.qv[i] * y.qv[i])) AS DOUBLE) AS dot
      |  FROM cand c JOIN q x ON x.vec_id = c.qid JOIN q y ON y.vec_id = c.nid),
      |norms AS (SELECT vec_id, sqrt(CAST(list_sum(list_transform(qv, v -> v*v)) AS DOUBLE)) AS norm FROM q)
      |SELECT qid, nid, cosine FROM (
      |  SELECT qid, nid, round(dot / (na.norm * nb.norm), 6) AS cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY round(dot / (na.norm * nb.norm), 6) DESC, nid) AS rn
      |  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = nid) t
      |WHERE rn <= $k""".stripMargin
  }

  val simKnnGraph: QueryDef = {
    val k = 3
    QueryDef("sim_knn_graph", narrowKnnOracleSql(cellEq = false, k)) { (spark, d) =>
      knnGraphFromBands(narrowBandsRelation(spark, d), k)
    }
  }

  /** Session-persisted narrow (2 x 8-bit) band store over the corpus —
    * shared by sim_lsh_ann, sim_knn_graph, and the auto tier router.
    * Carries the TRAINED IVF cell as routing metadata (see
    * [[wideBandsRelation]]): unrouted consumers project it away, the
    * routed graph joins on it — one sketch pass either way. */
  def narrowBandsRelation(spark: SparkSession, d: String): DataFrame = {
    // train OUTSIDE the Persisted.of closure: lloydBook runs Spark actions
    // (two collects), and the build closure executes under the global
    // Persisted monitor — holding it through training would block every
    // other session's Persisted.of (the documented lock-scope rule)
    val coarse = ivfPqCoarseBook(spark, d)
    graft.Persisted.of(spark, s"$d#hyperlsh_bands") {
      hyperBandsOfQNorm(
        withCell(qnormRelation(spark, d), coarse)
          .select("vec_id", "cell", "q", "norm"))
    }
  }

  /** Session-persisted wide (4 x 16-bit) band store — the tier past the
    * narrow bands' saturation knee. Carries the TRAINED IVF cell
    * ([[ivfPqCoarseBook]] assignment, round 13) as routing metadata: the
    * unrouted consumers project it away, the cell∧band graph joins on it,
    * and ONE materialized sketch pass serves both (at 100 TB this is the
    * cell-partitioned vector index itself). */
  def wideBandsRelation(spark: SparkSession, d: String): DataFrame = {
    val coarse = ivfPqCoarseBook(spark, d) // actions outside the monitor
    graft.Persisted.of(spark, s"$d#hyperlsh_bands_wide") {
      hyperBandsWideOfQNorm(
        withCell(qnormRelation(spark, d), coarse)
          .select("vec_id", "cell", "q", "norm"))
    }
  }

  /** Shared graph tail for both band tiers. Score DURING the band join,
    * dedup AFTER: the ~1 KB quantized vectors shuffle exactly once, by
    * band key, on each side of the self-join (volume ∝ corpus, never ∝
    * pairs); the cosine is computed in the join stage, so what reaches the
    * distinct is the 24-byte (qid, nid, cosine) row — sound because cosine
    * is a pure function of the pair, at the price of re-scoring the pairs
    * that collide on more than one band. The two earlier forms both
    * shuffled per-PAIR wide rows somewhere (arrays through the distinct:
    * 1.6 s at sf0.1; bare-id distinct then vector gather joins: 0.6 s at
    * sf0.1 but ~12 s at sf1, where the duplicate-heavy inflated corpus
    * pushes 14M candidate pairs through a ~0.5 KB/row gather exchange).
    * Pair volume only ever rides narrow rows here — the shape that
    * survives a duplicate-skewed 100 TB corpus. */
  private def knnGraphFromBands(bands: DataFrame, k: Int,
                                routeCols: Seq[String] = Nil): DataFrame = {
    val key = Seq("band_id", "band_val") ++ routeCols
    val a = bands.select(key.map(col) ++ Seq(
      col("vec_id").as("qid"), col("q").as("qa"), col("norm").as("na")): _*)
    val b = bands.select(key.map(col) ++ Seq(
      col("vec_id").as("nid"), col("q").as("qb"), col("norm").as("nb")): _*)
    val scored = a.join(b, key)
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(graft.plans.dotQNative(col("qa"), col("qb")).cast("double") /
          (col("na") * col("nb")), 6).as("cosine"))
      .distinct()
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("qid", "nid", "cosine")
  }

  /** WIDE-band tier of [[simKnnGraph]] (4 x 16-bit bands, 65,536 bucket
    * values): candidate volume ~ 4 n^2 / 65536 vs the narrow tier's
    * 2 n^2 / 256 — a 128x pair cut. Measured: the narrow graph grows
    * 17x/decade past sf0.1 (sf1 = 7.3 s, 19.5M raw pairs on the
    * duplicate-skewed inflated corpus) — the same quadratic knee the
    * simhash family hit at 16-bit bands (ARCHITECTURE.md round-7).
    * Recall trades per-band collision p^8 -> p^16 against double the
    * bands: expected collisions 4 p^16 >= 2 p^8 once p >= 2^(-1/8) ≈ 0.92
    * (cosine ≳ 0.97), so the wide tier keeps the closest edges — the ones
    * a top-3 list is made of — and sheds the moderate-similarity band
    * noise the narrow tier drowns in past the knee.
    * Same banded shape end-to-end: equi-join on (band_id, band_val), exact
    * rescoring of candidates only, per-node top-k window. */
  /** The default quantized-source CTE of the graph oracles. */
  private val rawQCte: String =
    "q AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*100000000.0) AS BIGINT)) AS qv FROM embeddings)"

  /** Re-upload-resolved quantized source (the vector instance of the
    * [[Reup]] convention): vec_id % 24 ∈ {7, 15} carry their block
    * leader's embedding; the quantize rides a second CTE so the
    * resolution itself stays the shared generated form. */
  private val reupQCte: String =
    s"""${Reup.srcSql("esrc", "embeddings", "vec_id", Seq("embedding" -> "embedding"))},
      |q AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*100000000.0) AS BIGINT)) AS qv FROM esrc)""".stripMargin

  /** Shared oracle for the wide-band graph tier, with the trained-cell
    * equality optionally composed into the candidate join (`cellEq`) and a
    * pluggable quantized-source CTE (`qCte` — the routed-wide declared
    * query passes the re-upload-resolved corpus). */
  private def wideKnnOracleSql(cellEq: Boolean, k: Int,
                               qCte: String = rawQCte): String = {
    val bv = (0 until 4).map(b => wideBandValSql("qv", b))
    val coarse = if (cellEq) coarseCellCtesSql("", "") + ",\n" else ""
    val cellJoin = if (cellEq)
      """
        |    JOIN cells ca ON ca.vec_id = a.vec_id
        |    JOIN cells cb ON cb.vec_id = b.vec_id AND cb.cell = ca.cell""".stripMargin
    else ""
    s"""WITH $qCte,
      |${coarse}sig AS (SELECT vec_id, qv, ${bv(0)} AS bv0, ${bv(1)} AS bv1, ${bv(2)} AS bv2, ${bv(3)} AS bv3 FROM q),
      |bands AS (SELECT vec_id, band_id,
      |    CASE band_id WHEN 0 THEN bv0 WHEN 1 THEN bv1 WHEN 2 THEN bv2 ELSE bv3 END AS band_val
      |  FROM sig CROSS JOIN (VALUES (0),(1),(2),(3)) b(band_id)),
      |cand AS (SELECT DISTINCT a.vec_id AS qid, b.vec_id AS nid
      |  FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
      |    AND a.vec_id <> b.vec_id$cellJoin),
      |dots AS (SELECT c.qid, c.nid,
      |    CAST(list_sum(list_transform(generate_series(1, len(x.qv)), i -> x.qv[i] * y.qv[i])) AS DOUBLE) AS dot
      |  FROM cand c JOIN q x ON x.vec_id = c.qid JOIN q y ON y.vec_id = c.nid),
      |norms AS (SELECT vec_id, sqrt(CAST(list_sum(list_transform(qv, v -> v*v)) AS DOUBLE)) AS norm FROM q)
      |SELECT qid, nid, cosine FROM (
      |  SELECT qid, nid, round(dot / (na.norm * nb.norm), 6) AS cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY round(dot / (na.norm * nb.norm), 6) DESC, nid) AS rn
      |  FROM dots JOIN norms na ON na.vec_id = qid JOIN norms nb ON nb.vec_id = nid) t
      |WHERE rn <= $k""".stripMargin
  }

  val simKnnGraphWide: QueryDef = {
    val k = 3
    QueryDef("sim_knn_graph_wide", wideKnnOracleSql(cellEq = false, k)) { (spark, d) =>
      knnGraphFromBands(wideBandsRelation(spark, d), k)
    }
  }

  /** IVF∧band-routed knn graph (VERDICT r12 #3): the wide-band self-join
    * with the TRAINED coarse-cell equality composed into the join key —
    * candidates must share a band value AND the probe's cell. The sf100
    * occupancy census's conclusion made this the next candidate lever:
    * past 16-bit bands the surviving collisions are genuine
    * near-neighbors on clustered data, so widening bands cannot cut
    * candidates below the true similarity density — but cell equality
    * can, because it removes the CROSS-cluster band coincidences (two
    * clusters coinciding on one band value contribute |A|×|B| pairs; the
    * same construction measured 9× in sim_incremental_ann_ivf). The cell
    * rides the persisted band stores as metadata, so routing costs no
    * extra scan, and at 100 TB the (cell, band) join key IS the partition
    * layout of a cell-partitioned vector index — the graph build never
    * forms cross-partition pairs. Semantics: the SAME-CELL knn graph (the
    * per-cluster graph SemDeDup-style pipelines build); edges to
    * neighbors assigned to a different cell are out of contract — recall
    * vs the unrouted tier is corpus-dependent and measured at the decade
    * points in ARCHITECTURE.md.
    *
    * The DECLARED query routes the NARROW tier, which has gate-SF-visible
    * edges at every scale the oracle runs (the wide∧cell composition at
    * 500 vectors produces zero candidates — an empty-output oracle
    * certifies nothing, the r12 frame-family lesson); the wide∧cell point
    * the census recommends past the knee is [[knnGraphRoutedWide]],
    * A/B-measured at sf10 via the probe harness. */
  val simKnnGraphRouted: QueryDef = {
    val k = 3
    QueryDef("sim_knn_graph_routed", narrowKnnOracleSql(cellEq = true, k)) { (spark, d) =>
      knnGraphFromBands(narrowBandsRelation(spark, d), k, routeCols = Seq("cell"))
    }
  }

  /** The wide∧cell graph — the operating point a post-knee corpus runs
    * (same contract as [[simKnnGraphRouted]] over the wide store). */
  def knnGraphRoutedWide(spark: SparkSession, d: String, k: Int = 3): DataFrame =
    knnGraphFromBands(wideBandsRelation(spark, d), k, routeCols = Seq("cell"))

  /** Re-upload-resolved embeddings — the certification corpus of the
    * routed WIDE graph (VERDICT r13 #1): vec_id % 24 ∈ {7, 15} carry their
    * block leader's embedding (left fallback to their own when the leader
    * id is absent), the vector twin of [[Dedup.nearCopyDocs]] /
    * [[Multimodal.frameSourceDocs]]. Identical vectors share every band
    * value AND the trained cell, so the wide∧cell composition — which has
    * ZERO candidates on the raw 500-vector gate corpus (an empty-output
    * oracle certifies nothing, the r12 lesson) — emits a constant 3-node
    * clique per 24 ids at every SF. */
  def reupEmbeddings(spark: SparkSession, d: String): DataFrame =
    Reup.resolve(Tables.embeddings(spark, d), "vec_id",
      Seq("embedding" -> "embedding"))

  /** Session-persisted quantized-norm relation over the re-upload-resolved
    * corpus (the [[qnormRelation]] shape minus the label column). */
  private def reupQnormRelation(spark: SparkSession, d: String): DataFrame =
    graft.Persisted.of(spark, s"$d#emb_qnorm_reup") {
      reupEmbeddings(spark, d)
        .select(col("vec_id"), qvec(col("embedding")).as("q"))
        .select(col("vec_id"), col("q"),
          sqrt(graft.plans.dotQNative(col("q"), col("q")).cast("double")).as("norm"))
    }

  /** Wide band store over the re-upload-resolved corpus, cell-assigned
    * under a coarse book TRAINED on that corpus (same Lloyd contract as
    * [[ivfPqCoarseBook]]; its own memo key — the raw and resolved corpora
    * train different books). */
  def reupWideBandsRelation(spark: SparkSession, d: String): DataFrame = {
    val coarse = pqCbMemo.of(spark, s"$d#ivfpq_kcb_reup") {
      lloydBook(reupQnormRelation(spark, d)
        .select(col("vec_id"), col("q").as("v")), IvfPqCells, 1000000000L)
    }
    graft.Persisted.of(spark, s"$d#hyperlsh_bands_wide_reup") {
      hyperBandsWideOfQNorm(
        withCell(reupQnormRelation(spark, d), coarse)
          .select("vec_id", "cell", "q", "norm"))
    }
  }

  /** DECLARED wide∧cell routed graph — [[knnGraphRoutedWide]]'s exact plan
    * shape (wide 4×16-bit bands, trained-cell equality composed into the
    * join key, same-cell contract) run over the re-upload-resolved
    * certification corpus, so the oracle carries rows at every SF
    * (VERDICT r13 #1: the production wide tier was probe-only because the
    * raw gate corpus has zero wide∧cell candidates — this declares it).
    * The raw-corpus operating point stays A/B-measured at the sf10 decade
    * via the `knn_routed_wide` probe variant. */
  val simKnnGraphRoutedWide: QueryDef = {
    val k = 3
    QueryDef("sim_knn_graph_routed_wide",
      wideKnnOracleSql(cellEq = true, k, qCte = reupQCte)) { (spark, d) =>
      knnGraphFromBands(reupWideBandsRelation(spark, d), k, routeCols = Seq("cell"))
    }
  }

  /** Recall@3 of the ROUTED graph against the global brute-force top-3 on
    * a 20-node sample — the acceptance gate for the same-cell contract
    * ([[simKnnGraphRouted]]'s doc): it prices BOTH loss sources (a true
    * neighbor in another cell is out of contract; a true neighbor whose
    * bands never collide is band loss) exactly as sim_pq_recall does for
    * the IVF-PQ stack. Expect corpus-dependent numbers: high on
    * replica-inflated scale dirs (replicas share cells), routing-capped
    * on spread corpora — the honest number a same-cell graph quotes.
    * Measured (round 13): 100% at sf1 (replica neighbors share cells),
    * 6.7% at sf0.1 — on near-unclustered fixture vectors the narrow
    * 2-band sketch rarely collides true (but not duplicate) neighbors
    * AND the same-cell contract excludes cross-cell ones; a deployment
    * that needs spread-corpus graph recall adds bands (recall is the
    * collision probability, raised by band count) before it widens
    * anything else. */
  val simGraphRecall: QueryDef =
    QueryDef("sim_graph_recall",
      s"""SELECT e.qid, CAST(count(a.nid) AS BIGINT) AS hits,
        |  CAST(count(a.nid) AS BIGINT) * 1000000 // 3 AS recall_ppm
        |FROM (${topkOracle(" WHERE vec_id < 20", "", 3)}) e
        |LEFT JOIN (
        |${narrowKnnOracleSql(cellEq = true, 3)}) a ON a.qid = e.qid AND a.nid = e.nid
        |GROUP BY e.qid""".stripMargin) { (spark, d) =>
      val exact = sparkTopKDec(spark, d, 20, sameCell = false, k = 3)
        .select("qid", "nid")
      val approx = simKnnGraphRouted.fn(spark, d)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      exact.join(approx, Seq("qid", "nid"), "left")
        .groupBy("qid").agg(count(col("hit")).as("hits"))
        .select(col("qid"), col("hits"),
          expr("(hits * 1000000) div 3").as("recall_ppm"))
    }

  /** AUTO-TIER routed graph: [[knnGraphAuto]]'s knee rule with the cell
    * composed into the join key at BOTH tiers — the entry a consumer that
    * accepts the same-cell contract rides at any corpus size (below the
    * knee the narrow∧cell point is where routing pays most: 6.1×
    * candidate cut at sf1; above it wide∧cell trims the residual
    * cross-cell noise off the saturation-safe tier). Same band stores,
    * same spec-checkable tier rule. */
  def knnGraphRoutedAuto(spark: SparkSession, d: String, k: Int = 3,
                         knee: Long = KnnBandKnee): DataFrame =
    if (knnGraphTier(vecCount(spark, d), knee) == 8)
      knnGraphFromBands(narrowBandsRelation(spark, d), k, routeCols = Seq("cell"))
    else
      knnGraphFromBands(wideBandsRelation(spark, d), k, routeCols = Seq("cell"))

  /** Session-persisted knn-graph edge set (qid, nid, cosine) — the
    * materialized graph every graph-analytics consumer derives from
    * (gr_pagerank's degree-attached adjacency, gr_triangles' undirected
    * edges), so the band self-join + top-k window runs once per session,
    * not once per consumer.
    *
    * `graft.knn.tier` (default `narrow`) exists for measured scale
    * attribution only, the j3 maxGram pattern: the DECLARED graph queries
    * pin the narrow tier so the oracle gate stays deterministic at every
    * SF, but past the band-occupancy knee (n >= [[KnnBandKnee]], e.g. the
    * 200k-vector sf10 probe corpus) the narrow store saturates into
    * mega-buckets and a graph consumer would measure the saturation, not
    * the graph stage — `auto` routes the store through [[knnGraphAuto]]'s
    * knee rule, which is what a production deployment rides. The tier is
    * part of the cache key, and sibling tiers are evicted on a flip so an
    * A/B never compares a tier against itself or holds both stores. */
  def knnEdgesRelation(spark: SparkSession, d: String): DataFrame = {
    val tier = spark.conf.getOption("graft.knn.tier").getOrElse("narrow")
    // Fail fast on an unknown tier: a typo (e.g. "wide") would otherwise
    // silently compute the narrow graph but cache it under the foreign
    // key, corrupting the A/B attribution the knob exists for (ADVICE r11)
    require(tier == "narrow" || tier == "auto",
      s"graft.knn.tier must be 'narrow' or 'auto', got '$tier'")
    Seq("narrow", "auto").filter(_ != tier)
      .foreach(t => graft.Persisted.clear(spark, s"$d#knn_edges#$t"))
    graft.Persisted.of(spark, s"$d#knn_edges#$tier") {
      if (tier == "auto") knnGraphAuto(spark, d) else simKnnGraph.fn(spark, d)
    }
  }

  /** Band-occupancy knee for the graph tier rule: expected candidates per
    * node are b*n/space — narrow n/128, wide n/16384. The wide tier only
    * has enough bucket-mates to fill a top-k list once n/16384 >= ~8, i.e.
    * n ≈ 2 * 65536 — the SAME knee arithmetic as the simhash tiers
    * (Dedup.SimhashBandKnee), where the narrow tier's raw pair volume
    * (2 n^2 / 256 ≈ 1.3e8 at the knee) has long left the linear regime. */
  val KnnBandKnee: Long = 2L * 65536

  /** Band bits for a corpus of `nVecs` — the pure tier rule
    * [[knnGraphAuto]] applies, factored out for spec checks. */
  def knnGraphTier(nVecs: Long, knee: Long = KnnBandKnee): Int =
    if (nVecs < knee) 8 else 16

  private val vecCountMemo = new graft.SessionMemo[java.lang.Long]
  private def vecCount(spark: SparkSession, d: String): Long =
    vecCountMemo.of(spark, d)(Long.box(Tables.embeddings(spark, d).count()))

  /** AUTO-TIER k-NN graph: routes between the band tiers on corpus size vs
    * the occupancy knee, the [[graft.operators.Dedup.simhashNearDupAuto]]
    * pattern — a caller whose corpus grows past saturation does not
    * silently keep the drowning tier, and a small corpus does not get the
    * wide tier's near-empty buckets (graph recall collapses below the
    * knee). The declared oracle queries pin their tiers explicitly so the
    * gate stays deterministic at every SF. */
  def knnGraphAuto(spark: SparkSession, d: String, k: Int = 3,
                   knee: Long = KnnBandKnee): DataFrame =
    if (knnGraphTier(vecCount(spark, d), knee) == 8)
      knnGraphFromBands(narrowBandsRelation(spark, d), k)
    else
      knnGraphFromBands(wideBandsRelation(spark, d), k)

  /** Index-quality evaluation: recall@3 of the LSH ANN path against the
    * exact brute-force top-3, per probe — the standard acceptance check an
    * approximate index runs on a SAMPLED probe set before serving a 100 TB
    * corpus (the brute-force side is O(probes x corpus), affordable
    * exactly because the probe set is a sample; the LSH side reads the
    * persisted band store the production queries share). Everything is
    * integer end-to-end (hit counts, ppm via floor division), so the
    * cross-engine hash has no tie surface; the underlying top-3 sets are
    * deterministic by the 6-dp round + nid tiebreak both engines already
    * agree on (sim_cosine_topk / sim_lsh_ann green). */
  val simRecallEval: QueryDef =
    QueryDef("sim_recall_eval",
      s"""SELECT e.qid, CAST(count(a.nid) AS BIGINT) AS hits,
        |  CAST(count(a.nid) AS BIGINT) * 1000000 // 3 AS recall_ppm
        |FROM (${topkOracle(" WHERE vec_id < 20", "", 3)}) e
        |LEFT JOIN (
        |${simLshHyperplane.oracle.get}) a ON a.qid = e.qid AND a.nid = e.nid
        |GROUP BY e.qid""".stripMargin) { (spark, d) =>
      val exact = sparkTopKDec(spark, d, 20, sameCell = false, k = 3)
        .select("qid", "nid")
      val approx = simLshHyperplane.fn(spark, d)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      exact.join(approx, Seq("qid", "nid"), "left")
        .groupBy("qid").agg(count(col("hit")).as("hits"))
        .select(col("qid"), col("hits"),
          expr("(hits * 1000000) div 3").as("recall_ppm"))
    }

  /** Product quantization + asymmetric-distance top-k — the UNROUTED
    * seed-codebook A/B BASELINE for the production path [[simIvfPq]]
    * (trained codebooks + cell-routed ADC, 10.9x at sf10): this query is
    * kept as the anchor that prices what training + routing buy, not as a
    * deployment shape. It is the remaining
    * member of the compressed-ANN family ([[simSq8Rerank]] compresses per
    * VECTOR with a scalar scale; PQ compresses per SUBSPACE against a
    * codebook, the FAISS/IVFPQ layout). m = 2 subspaces of 32 dims, k = 8
    * codewords each = the 8 lowest vec_ids' sub-vectors (seed-codebook
    * discipline matching sim_kmeans' seeds — codebook TRAINING is the
    * k-means family's job; this query owns the encode + ADC shapes).
    *
    * Encode: per subspace, each corpus vector takes the codeword
    * minimizing exact-integer L2 (|a|² + |c|² − 2a·c via three fused
    * native dots, ties to the lowest codeword) — corpus × 8 broadcast
    * rows, partial-agg'd min(struct). The (vec_id, c1, c2) code relation
    * is 2 BYTES of payload per vector at this geometry — the 100 TB point
    * of PQ: the scan phase never touches vectors.
    *
    * ADC: each probe precomputes its 8-entry partial-dot table per
    * subspace (2 × 400 tiny broadcast rows); the corpus scan is then two
    * code-keyed table lookups + one add per (probe, vector) — against a
    * 64-multiply full dot — followed by the sq8-pattern funnel: per-probe
    * top-10 window on the rounded approx cosine, exact rerank of
    * candidates only, top-3 out. */
  val simPqAdc: QueryDef = {
    val (dh, kcw, probes, cand, k) = (32, 8, 50, 10, 3)
    def encCte(s: Int) =
      s"""d$s AS (SELECT v.vec_id, c.cw,
        |    CAST(list_sum(list_transform(generate_series(1, $dh), i -> (v.q$s[i] - c.cv[i]) * (v.q$s[i] - c.cv[i]))) AS BIGINT) AS d2
        |  FROM s v CROSS JOIN cb$s c),
        |e$s AS (SELECT vec_id, cw AS c$s FROM (
        |    SELECT vec_id, cw, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cw) AS rn FROM d$s) t
        |  WHERE rn = 1)""".stripMargin
    def adcCte(s: Int) =
      s"""t$s AS (SELECT p.vec_id AS qid, c.cw,
        |    CAST(list_sum(list_transform(generate_series(1, $dh), i -> p.q$s[i] * c.cv[i])) AS BIGINT) AS t
        |  FROM s p CROSS JOIN cb$s c WHERE p.vec_id < $probes)""".stripMargin
    QueryDef("sim_pq_adc",
      s"""WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*100000000.0) AS BIGINT)) AS qv FROM embeddings),
        |s AS (SELECT vec_id, qv[1:$dh] AS q1, qv[${dh + 1}:${2 * dh}] AS q2 FROM q),
        |norms AS (SELECT vec_id, sqrt(CAST(list_sum(list_transform(qv, v -> v*v)) AS DOUBLE)) AS norm FROM q),
        |cb1 AS (SELECT vec_id AS cw, q1 AS cv FROM s WHERE vec_id < $kcw),
        |cb2 AS (SELECT vec_id AS cw, q2 AS cv FROM s WHERE vec_id < $kcw),
        |${encCte(1)},
        |${encCte(2)},
        |${adcCte(1)},
        |${adcCte(2)},
        |codes AS (SELECT e1.vec_id, e1.c1, e2.c2 FROM e1 JOIN e2 ON e2.vec_id = e1.vec_id),
        |approx AS (SELECT t1.qid, c.vec_id AS nid,
        |    round(CAST(t1.t + t2.t AS DOUBLE) / (na.norm * nb.norm), 6) AS acos
        |  FROM codes c
        |  JOIN t1 ON t1.cw = c.c1 JOIN t2 ON t2.cw = c.c2 AND t2.qid = t1.qid
        |  JOIN norms na ON na.vec_id = t1.qid JOIN norms nb ON nb.vec_id = c.vec_id
        |  WHERE t1.qid <> c.vec_id),
        |top AS (SELECT qid, nid FROM (
        |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY acos DESC, nid) AS rn
        |  FROM approx) t WHERE rn <= $cand),
        |exact AS (
        |  SELECT t.qid, t.nid,
        |    round(CAST(list_sum(list_transform(generate_series(1, ${2 * dh}), i -> x.qv[i] * y.qv[i])) AS DOUBLE)
        |      / (na.norm * nb.norm), 6) AS cosine
        |  FROM top t JOIN q x ON x.vec_id = t.qid JOIN q y ON y.vec_id = t.nid
        |  JOIN norms na ON na.vec_id = t.qid JOIN norms nb ON nb.vec_id = t.nid)
        |SELECT qid, nid, cosine FROM (
        |  SELECT qid, nid, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rn
        |  FROM exact) t WHERE rn <= $k""".stripMargin) { (spark, d) =>
      val r = qnormRelation(spark, d)
      val sub = r.select(col("vec_id"),
        slice(col("q"), 1, dh).as("q1"), slice(col("q"), dh + 1, dh).as("q2"),
        col("norm"))
      def cb(s: Int) = broadcast(sub.filter(col("vec_id") < kcw)
        .select(col("vec_id").as("cw"), col(s"q$s").as("cv")))
      // encode: exact-integer L2 argmin over the 8 broadcast codewords;
      // min(struct(d2, cw)) is the deterministic tie-break, partial-agg'd
      def enc(s: Int) = sub.select(col("vec_id"), col(s"q$s").as("v"))
        .crossJoin(cb(s))
        .select(col("vec_id"), col("cw"),
          (graft.plans.dotQNative(col("v"), col("v")) +
            graft.plans.dotQNative(col("cv"), col("cv")) -
            lit(2L) * graft.plans.dotQNative(col("v"), col("cv"))).as("d2"))
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("cw"))).as("m"))
        .select(col("vec_id"), col(s"m.cw").as(s"c$s"))
      val codes = graft.Persisted.of(spark, s"$d#pq_codes") {
        enc(1).join(enc(2), "vec_id")
      }
      // ADC tables: per-probe 8-entry partial dots, tiny and broadcast
      def adc(s: Int) = broadcast(
        sub.filter(col("vec_id") < probes)
          .select(col("vec_id").as("qid"), col(s"q$s").as("pv"))
          .crossJoin(cb(s))
          .select(col("qid"), col("cw").as(s"c$s"),
            graft.plans.dotQNative(col("pv"), col("cv")).as(s"t$s")))
      val probeNorm = r.filter(col("vec_id") < probes)
        .select(col("vec_id").as("qid"), col("norm").as("na"))
      val approx = codes
        .join(r.select(col("vec_id"), col("norm").as("nb")), "vec_id")
        .join(adc(1), Seq("c1"))
        .join(adc(2).toDF("qid2", "c2b", "t2"),
          col("c2") === col("c2b") && col("qid2") === col("qid"))
        .filter(col("qid") =!= col("vec_id"))
        .join(broadcast(probeNorm), "qid")
        .select(col("qid"), col("vec_id").as("nid"),
          round((col("t1") + col("t2")).cast("double") /
            (col("na") * col("nb")), 6).as("acos"))
      val wApprox = Window.partitionBy("qid").orderBy(col("acos").desc, col("nid"))
      val cands = approx.withColumn("rn", row_number().over(wApprox))
        .filter(col("rn") <= cand).select("qid", "nid")
      val exact = cands
        .join(r.select(col("vec_id").as("qid"), col("q").as("qa"),
          col("norm").as("qna")), "qid")
        .join(r.select(col("vec_id").as("nid"), col("q").as("qb"),
          col("norm").as("qnb")), "nid")
        .select(col("qid"), col("nid"),
          round(graft.plans.dotQNative(col("qa"), col("qb")).cast("double") /
            (col("qna") * col("qnb")), 6).as("cosine"))
      val wExact = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
      exact.withColumn("rn", row_number().over(wExact)).filter(col("rn") <= k)
        .select("qid", "nid", "cosine")
    }
  }

  // ---- IVF-PQ: trained codebooks + cell-routed ADC ----

  private val pqCbMemo = new graft.SessionMemo[Seq[(Int, Array[Long])]]

  /** Nearest-codeword assignment as a ZERO-shuffle projection: the
    * codewords are driver-side literals (k·dim longs — the k-means
    * property), distances are exact long L2 (|v|² + |c|² − 2v·c, fused
    * native dots), argmin ties to the lowest codeword id
    * (array_position finds the FIRST minimum; `cents` sorted by id).
    * The [[Clustering]] assignedTo shape, reused for subvectors. */
  /** Exact-long squared L2 distances of vector column `v` (with `vv` =
    * v·v) to each literal centroid: |v|² + |c|² − 2v·c via a fused native
    * dot per centroid. Retained as the DECLARATIVE REFERENCE of the
    * assignment arithmetic: the production paths ([[argminCw]],
    * [[withCell]], [[withCode]], [[probeCellsOf]]) all route through ONE
    * fused expression ([[graft.plans.nearestCells]]) whose loop evaluates
    * this same arithmetic in vv-reduced form — the kc-literal-expression
    * form here outgrows whole-stage codegen at the routed kc = √n
    * operating point (measured interpreted fallback at kc = 512, the
    * dominant term of the sf10 retrain event) — and the equality spec
    * pins native ≡ this chain including ties. */
  private[graft] def centDists(v: Column, vv: Column,
                               cents: Seq[(Int, Array[Long])]): Seq[Column] =
    cents.map { case (_, cv) =>
      val bb = cv.map(x => x * x).sum
      vv + lit(bb) - lit(2L) * graft.plans.dotQNative(v, lit(cv))
    }

  /** The nearest trained centroid's id for a quantized vector column —
    * (exact L2, book position) argmin via the fused native expression. */
  private def cellOf(q: Column, cents: Seq[(Int, Array[Long])]): Column =
    element_at(graft.plans.nearestCells(q, cents, 1), 1)

  private def argminCw(v: DataFrame, cents: Seq[(Int, Array[Long])]): DataFrame =
    v.select(col("vec_id"), col("v"), cellOf(col("v"), cents).as("cw"))

  /** One exact-integer Lloyd update round over a (vec_id, v) relation:
    * seed = the k lowest-id vectors, assign (zero-shuffle literal-argmin
    * projection), per-codeword integer mean floor((Σq + n·OFF)/n) − OFF.
    * The driver holds (and round-trips) only k·dim longs — the
    * [[Clustering.lloyd]] contract — shared by the PQ subspace books AND
    * the IVF coarse quantizer (round 13: the coarse cells are trained by
    * the same update, not borrowed from the fixture's label column).
    * Empty codewords drop out of the book (deterministic k-means
    * degeneracy, identical on both engines). */
  private def lloydBook(v: DataFrame, kcw: Int, Off: Long): Seq[(Int, Array[Long])] = {
    val seeds = v.filter(col("vec_id") < kcw).orderBy("vec_id").collect()
      .map(rr => (rr.getLong(0).toInt, rr.getSeq[Long](1).toArray)).toSeq
    val sums = argminCw(v, seeds)
      .select(col("cw"), posexplode(col("v")).as(Seq("i", "qv")))
      .groupBy("cw", "i").agg(sum("qv").as("csum"), count(lit(1)).as("n"))
      .collect()
    sums.groupBy(_.getInt(0)).toSeq.map { case (cw, rows) =>
      val cv = rows.sortBy(_.getInt(1)).map { rr =>
        val (csum, n) = (rr.getLong(2), rr.getLong(3))
        (csum + n * Off) / n - Off  // floor div: positive operands
      }.toArray
      (cw, cv)
    }.sortBy(_._1)
  }

  /** Append the trained coarse-cell id to every row of a (…, q) relation —
    * the zero-shuffle IVF assignment projection (exact long L2 argmin over
    * literal centroids; ties to the lowest cell id via array_position's
    * first minimum, matching the oracle's ORDER BY d2, cell). */
  private def withCell(df: DataFrame, cents: Seq[(Int, Array[Long])]): DataFrame =
    df.withColumn("cell", cellOf(col("q"), cents))

  /** Each probe's `nprobe` NEAREST trained cells — (qid, pcell) rows, as a
    * zero-shuffle projection: build the (d2, cell) structs against the
    * literal centroids, array_sort (lexicographic: d2 then cell — the
    * oracle's ORDER BY d2, cell), slice nprobe, explode. Multi-cell
    * probing is where IVF recall comes from: a true neighbor near a cell
    * boundary sits in a DIFFERENT cell than its probe, and nprobe > 1
    * trades a bounded candidate increase (probes × nprobe·corpus/cells)
    * for retrieving exactly those. */
  private def probeCellsOf(probes: DataFrame, cents: Seq[(Int, Array[Long])],
                           nprobe: Int): DataFrame =
    probes.select(col("vec_id").as("qid"),
        explode(graft.plans.nearestCells(col("q"), cents, nprobe)).as("pcell"))

  /** The coarse-quantizer oracle chain — one Lloyd update (seed → assign
    * → integer mean) over the full-dim vectors, then full-corpus
    * assignment to the trained centroids — ending with
    * `cells(vec_id, cell)` (the distance relation `kd(vec_id, cell, d2)`
    * stays addressable for nprobe ranking). Assumes a CTE
    * `q(vec_id, qv)`. ONE definition shared by the IVF-PQ family and the
    * cell-routed knn graph, so the trained-cell semantics cannot drift
    * between consumers. */
  private def coarseCellCtesSql(seedCondSql: String, trainCondSql: String,
                                kc: Int = IvfPqCells): String = {
    val Off = 1000000000L
    s"""kc0 AS (SELECT vec_id AS cell, qv AS cv FROM q WHERE vec_id < $kc$seedCondSql),
      |kd0 AS (SELECT v.vec_id, c.cell,
      |    CAST(list_sum(list_transform(generate_series(1, $Dim), i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))) AS BIGINT) AS d2
      |  FROM q v CROSS JOIN kc0 c$trainCondSql),
      |ka0 AS (SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM kd0) t
      |  WHERE rn = 1),
      |kcb AS (SELECT cell, list(cq ORDER BY i) AS cv FROM (
      |    SELECT a.cell, g.i,
      |      CAST((SUM(v.qv[g.i]) + COUNT(*) * $Off) // COUNT(*) - $Off AS BIGINT) AS cq
      |    FROM ka0 a JOIN q v ON v.vec_id = a.vec_id
      |    CROSS JOIN generate_series(1, $Dim) g(i)
      |    GROUP BY a.cell, g.i) t GROUP BY cell),
      |kd AS (SELECT v.vec_id, c.cell,
      |    CAST(list_sum(list_transform(generate_series(1, $Dim), i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))) AS BIGINT) AS d2
      |  FROM q v CROSS JOIN kcb c),
      |cells AS (SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM kd) t
      |  WHERE rn = 1)""".stripMargin
  }

  /** The batch-variant trained coarse book (full-corpus training, memo key
    * shared with [[simIvfPq]] — trained once per session), the cell
    * assignment every routed consumer shares. */
  def ivfPqCoarseBook(spark: SparkSession, d: String): Seq[(Int, Array[Long])] =
    pqCbMemo.of(spark, s"$d#ivfpq_kcb") {
      lloydBook(qnormRelation(spark, d).select(col("vec_id"), col("q").as("v")),
        IvfPqCells, 1000000000L)
    }

  /** kc-PARAMETERIZED coarse training + assignment — the occupancy-probe
    * surface for measuring the cell-count lever (production kc ~ sqrt(n);
    * the declared queries pin kc = [[IvfPqCells]] for oracle determinism).
    * Returns the qnorm relation with a `cell` column under a kc-cell
    * trained book. Seeds = first kc vectors, one Lloyd update — the same
    * contract as the fixture-scale book, just wider. */
  def coarseCellsScaled(spark: SparkSession, d: String, kc: Int): DataFrame =
    withCell(qnormRelation(spark, d),
      // kc == IvfPqCells is the SAME training run ivfPqCoarseBook holds
      // (same corpus, seeds, cell count) — share its memo instead of
      // retraining a duplicate full-corpus book in the session (ADVICE r13)
      if (kc == IvfPqCells) ivfPqCoarseBook(spark, d)
      else pqCbMemo.of(spark, s"$d#ivfpq_kcb_k$kc") {
        lloydBook(qnormRelation(spark, d)
          .select(col("vec_id"), col("q").as("v")), kc, 1000000000L)
      })

  /** IVF-PQ — the production 100 TB ANN stack, replacing [[simPqAdc]]'s
    * honesty gaps (VERDICT r11 #1, r12 #1): the PQ codebooks are TRAINED
    * (one exact-integer Lloyd update round per subspace), the coarse
    * quantizer is TRAINED TOO (the same Lloyd update over the full-dim
    * vectors — round 12 borrowed the fixture's label column here, which
    * its own recall gate priced at 57.3% recall@3), and the ADC scan is
    * IVF-ROUTED with MULTI-CELL PROBING: each probe scans its nprobe
    * nearest cells' codes (at 100 TB the code store is cell-partitioned,
    * so the probed-cell IN-filter pushed onto the persisted store here is
    * partition pruning there).
    *
    * Exactness: every re-quantized trained centroid component is
    * floor(Σq/n) computed as (Σq + n·OFF) div n − OFF with OFF = 1e9 >
    * max|q| — positive operands make Spark's truncating `div`, Java's
    * `/`, and DuckDB's `//` all agree, so the trained books (coarse and
    * PQ) are bit-identical on every engine and the full chain (train →
    * assign → encode → nprobe-route → ADC → rerank) hash-matches end to
    * end.
    *
    * Scale shape: each training round = two bounded collects (k seed
    * rows; k·dim partial-agg sums — map-side combine caps the shuffle at
    * k·dim rows per partition); assignment and probe-cell ranking are
    * zero-shuffle literal projections; codes persisted 2 bytes/vector +
    * one small int cell id; ADC tables = probes × k broadcast rows; the
    * routed join's candidate volume is probes × nprobe·corpus/cells —
    * the structure simPqAdc lacks (linear 12.5 s at sf10). */
  /** Shared builder for the trained-IVF-PQ family: `trainCondSql` /
    * `trainPred` restrict the TRAINING set (seed draw + assignment), so
    * the incremental variant trains on the store only and the batch
    * encodes against FROZEN codebooks; `probeCondSql` / `probePred`
    * select the probe rows; `tag` keys the per-variant persisted
    * codes/codebook caches. One definition, two declared queries, and
    * the generated oracle replays whichever chain the parameters
    * select.
    *
    * Parameter scale note: m = 4 subspaces × k = 16 codewords × one Lloyd
    * update round are FIXTURE-SCALE settings chosen so the oracle's
    * replayed training CTEs stay tractable on DuckDB at every gate SF —
    * a production index uses m = 8–16, k = 256, and iterates the update
    * to convergence. (m = 2 × k = 8 was measured insufficient: 6-bit
    * codes collapse the routed candidates into ≤64 ADC groups and the
    * recall gate read 24% at sf1; 16-bit codes with the cand=50 funnel
    * read 100%.) Every scale property is parameter-invariant: the
    * driver round-trip stays k·dim longs per round, assignment stays a
    * zero-shuffle literal projection (k·m dot products per row), the
    * update stays one (cw, dim) partial-agg shuffle, and the code store
    * stays m small ints per vector. Growing m/k/rounds changes constants,
    * not shapes. */
  private def ivfPqDef(name: String, seedCondSql: String, trainCondSql: String,
                       probeCondSql: String,
                       trainPred: Column => Column, probePred: Column => Column,
                       tag: String, split: Boolean = false,
                       nprobe: Int = IvfPqNprobe): QueryDef = {
    // m=4 subspaces x 16 codewords (16-bit codes): the geometry the sf1
    // recall A/B selected — m=2 x 8 (6-bit codes) collapses ~7k routed
    // candidates per probe into <=64 ADC groups whose intra-group order
    // is 1/candidate-norm, and recall@3 measured 24%; 4x16 with cand=50
    // measured 100% at sf1 (38% at sf0.1, capped by the routing recall
    // of 8 trained cells over near-unclustered fixture vectors).
    val m = 4
    val dh = 64 / m
    val (kcw, cand, k) = (16, 50, 3)
    val kc = IvfPqCells
    val Off = 1000000000L
    // oracle training chain, per subspace: seed -> assign -> integer-mean
    def trainCte(s: Int) =
      s"""cb${s}0 AS (SELECT vec_id AS cw, q$s AS cv FROM s WHERE vec_id < $kcw$seedCondSql),
        |d${s}0 AS (SELECT v.vec_id, c.cw,
        |    CAST(list_sum(list_transform(generate_series(1, $dh), i -> (v.q$s[i] - c.cv[i]) * (v.q$s[i] - c.cv[i]))) AS BIGINT) AS d2
        |  FROM s v CROSS JOIN cb${s}0 c$trainCondSql),
        |a${s}0 AS (SELECT vec_id, cw FROM (
        |    SELECT vec_id, cw, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cw) AS rn FROM d${s}0) t
        |  WHERE rn = 1),
        |cb$s AS (SELECT cw, list(cq ORDER BY i) AS cv FROM (
        |    SELECT a.cw, g.i,
        |      CAST((SUM(v.q$s[g.i]) + COUNT(*) * $Off) // COUNT(*) - $Off AS BIGINT) AS cq
        |    FROM a${s}0 a JOIN s v ON v.vec_id = a.vec_id
        |    CROSS JOIN generate_series(1, $dh) g(i)
        |    GROUP BY a.cw, g.i) t GROUP BY cw)""".stripMargin
    def encCte(s: Int) =
      s"""d$s AS (SELECT v.vec_id, c.cw,
        |    CAST(list_sum(list_transform(generate_series(1, $dh), i -> (v.q$s[i] - c.cv[i]) * (v.q$s[i] - c.cv[i]))) AS BIGINT) AS d2
        |  FROM s v CROSS JOIN cb$s c),
        |e$s AS (SELECT vec_id, cw AS c$s FROM (
        |    SELECT vec_id, cw, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cw) AS rn FROM d$s) t
        |  WHERE rn = 1)""".stripMargin
    // ADC oracle tables are ONE ROW PER PROBE (codeword-ordered value +
    // id lists), so every t-join is 1:1 on qid: with per-(qid, cw) rows
    // and m = 4, DuckDB's optimizer could join the four t-tables together
    // on qid FIRST — probes × 16⁴ = 163M rows at sf1, which is what blew
    // the incremental oracle's 600 s budget (the Spark plan is unaffected:
    // its ADC joins are broadcast hash joins keyed (qid, c_s)). The house
    // rule again: a generated oracle is a query too — audit its join
    // orders like any declared plan.
    def adcCte(s: Int) =
      s"""t$s AS (SELECT qid, list(t ORDER BY cw) AS ts, list(cw ORDER BY cw) AS cws FROM (
        |    SELECT p.vec_id AS qid, c.cw,
        |      CAST(list_sum(list_transform(generate_series(1, $dh), i -> p.q$s[i] * c.cv[i])) AS BIGINT) AS t
        |    FROM s p CROSS JOIN cb$s c WHERE $probeCondSql) GROUP BY qid)""".stripMargin
    // coarse-quantizer oracle chain + the probes' nprobe nearest cells
    // (ROW_NUMBER <= nprobe over (d2, cell))
    val coarseCtes =
      s"""${coarseCellCtesSql(seedCondSql, trainCondSql, kc)},
        |pcells AS (SELECT vec_id AS qid, cell FROM (
        |    SELECT p.vec_id, p.cell, ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY p.d2, p.cell) AS rn
        |    FROM kd p WHERE $probeCondSql) t
        |  WHERE rn <= $nprobe)""".stripMargin
    val subspaceCols =
      (1 to m).map(s => s"qv[${(s - 1) * dh + 1}:${s * dh}] AS q$s").mkString(", ")
    val pqCtes = (1 to m).map(s => s"${trainCte(s)},\n${encCte(s)},\n${adcCte(s)}")
      .mkString(",\n")
    val codesJoin = (2 to m).map(s => s"JOIN e$s ON e$s.vec_id = e1.vec_id")
      .mkString(" ")
    val codeCols = (1 to m).map(s => s"e$s.c$s").mkString(", ")
    val tSum = (1 to m)
      .map(s => s"t$s.ts[list_position(t$s.cws, c.c$s)]").mkString(" + ")
    val tJoins = (1 to m)
      .map(s => s"JOIN t$s ON t$s.qid = pc.qid")
      .mkString("\n  ")
    QueryDef(name,
      s"""WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*100000000.0) AS BIGINT)) AS qv FROM embeddings),
        |s AS (SELECT vec_id, $subspaceCols FROM q),
        |norms AS (SELECT vec_id, sqrt(CAST(list_sum(list_transform(qv, v -> v*v)) AS DOUBLE)) AS norm FROM q),
        |$coarseCtes,
        |$pqCtes,
        |codes AS (SELECT e1.vec_id, ce.cell, $codeCols
        |  FROM e1 $codesJoin JOIN cells ce ON ce.vec_id = e1.vec_id),
        |approx AS (SELECT pc.qid, c.vec_id AS nid,
        |    round(CAST($tSum AS DOUBLE) / (na.norm * nb.norm), 6) AS acos
        |  FROM codes c
        |  JOIN pcells pc ON pc.cell = c.cell
        |  $tJoins
        |  JOIN norms na ON na.vec_id = pc.qid JOIN norms nb ON nb.vec_id = c.vec_id
        |  WHERE pc.qid <> c.vec_id),
        |top AS (SELECT qid, nid FROM (
        |  SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY acos DESC, nid) AS rn
        |  FROM approx) t WHERE rn <= $cand),
        |exact AS (
        |  SELECT t.qid, t.nid,
        |    round(CAST(list_sum(list_transform(generate_series(1, $Dim), i -> x.qv[i] * y.qv[i])) AS DOUBLE)
        |      / (na.norm * nb.norm), 6) AS cosine
        |  FROM top t JOIN q x ON x.vec_id = t.qid JOIN q y ON y.vec_id = t.nid
        |  JOIN norms na ON na.vec_id = t.qid JOIN norms nb ON nb.vec_id = t.nid)
        |SELECT qid, nid, cosine FROM (
        |  SELECT qid, nid, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rn
        |  FROM exact) t WHERE rn <= $k""".stripMargin) { (spark, d) =>
      import spark.implicits._
      val r = qnormRelation(spark, d)
      // trained coarse quantizer: one Lloyd update over the TRAINING
      // rows' full-dim vectors; memoized — kc x 64 longs on the driver
      val coarse = pqCbMemo.of(spark, s"$d#ivfpq_kcb$tag") {
        lloydBook(r.filter(trainPred(col("vec_id")))
          .select(col("vec_id"), col("q").as("v")), kc, Off)
      }
      // the sub-vector store, every row tagged with its TRAINED cell
      // (zero-shuffle assignment projection); per-variant key — the
      // incremental variant's store-trained centroids differ
      val sub = graft.Persisted.of(spark, s"$d#ivfpq_sub$tag") {
        withCell(r, coarse)
          .select(col("vec_id") +: col("cell") +:
            (1 to m).map(s => slice(col("q"), (s - 1) * dh + 1, dh).as(s"q$s")) :+
            col("norm"): _*)
      }
      // one Lloyd update round per subspace over the TRAINING rows;
      // memoized — the driver holds (and round-trips) only kcw x dh
      // longs, never anything data-sized
      def train(s: Int): Seq[(Int, Array[Long])] =
        pqCbMemo.of(spark, s"$d#ivfpq_cb$s$tag") {
          lloydBook(sub.filter(trainPred(col("vec_id")))
            .select(col("vec_id"), col(s"q$s").as("v")), kcw, Off)
        }
      val books: Seq[Seq[(Int, Array[Long])]] = (1 to m).map(train)
      def encode(rows: DataFrame) =
        (1 to m).foldLeft(
          rows.select(col("vec_id"), col("cell"), col("norm").as("nb"))) { (acc, s) =>
          acc.join(
            argminCw(rows.select(col("vec_id"), col(s"q$s").as("v")), books(s - 1))
              .select(col("vec_id"), col("cw").as(s"c$s")), "vec_id")
        }
      // The code store: one relation for the whole-corpus queries; for
      // the incremental variant the STORE codes and the BATCH codes are
      // separate persisted relations unioned at read (the band-store
      // split of mmImageIncremental) — per-batch encode work is the
      // batch's rows only, the store encodes once and is append-only at
      // ingest (code-review r12: a single full-corpus encode would
      // contradict the declared work-∝-batch contract). The mod-20 split
      // has no id overlap, so no supersede anti-join is needed here.
      val codes =
        if (!split) graft.Persisted.of(spark, s"$d#ivfpq_codes") {
          encode(sub)
        } else {
          graft.Persisted.of(spark, s"$d#ivfpq_codes_store$tag") {
            encode(sub.filter(trainPred(col("vec_id"))))
          }.unionByName(graft.Persisted.of(spark, s"$d#ivfpq_codes_batch$tag") {
            encode(sub.filter(probePred(col("vec_id"))))
          })
        }
      // ADC tables: probes x trained codewords, tiny and broadcast (the
      // probe norm rides only the first table so the join carries it once)
      def cbDf(cb: Seq[(Int, Array[Long])]) = cb.toDF("cw", "cv")
      val probeSide = sub.filter(probePred(col("vec_id")))
      def adc(s: Int, cb: Seq[(Int, Array[Long])], keepNorm: Boolean) = broadcast(
        probeSide
          .select(col("vec_id").as("qid"), col(s"q$s").as("pv"), col("norm").as("na"))
          .crossJoin(cbDf(cb))
          .select(Seq(col("qid"), col("cw").as(s"c$s"),
            graft.plans.dotQNative(col("pv"), col("cv")).as(s"t$s")) ++
            (if (keepNorm) Seq(col("na")) else Nil): _*))
      // nprobe routing relation: each probe's nprobe nearest trained
      // cells, tiny and broadcast (probes x nprobe rows)
      val pCells = broadcast(graft.Persisted.of(spark, s"$d#ivfpq_pcells$tag") {
        probeCellsOf(r.filter(probePred(col("vec_id"))).select("vec_id", "q"),
          coarse, nprobe)
      })
      // IVF routing, scan-level: only the PROBED cells leave the code
      // store (the IN-list is bounded by the coarse-cell count; at 100 TB
      // the codes are cell-partitioned and this is partition pruning)
      val cells = pCells.select("pcell").distinct().collect().map(_.getInt(0)).toSeq
      val withTs = (1 to m).foldLeft(
        codes.filter(col("cell").isin(cells: _*))
          .join(pCells, col("pcell") === col("cell"))
          .filter(col("qid") =!= col("vec_id"))) { (acc, s) =>
        acc.join(adc(s, books(s - 1), keepNorm = s == 1), Seq("qid", s"c$s"))
      }
      val approx = withTs.select(col("qid"), col("vec_id").as("nid"),
        round((1 to m).map(s => col(s"t$s")).reduce(_ + _).cast("double") /
          (col("na") * col("nb")), 6).as("acos"))
      val wApprox = Window.partitionBy("qid").orderBy(col("acos").desc, col("nid"))
      val cands = approx.withColumn("rn", row_number().over(wApprox))
        .filter(col("rn") <= cand).select("qid", "nid")
      val exact = cands
        .join(r.select(col("vec_id").as("qid"), col("q").as("qa"),
          col("norm").as("qna")), "qid")
        .join(r.select(col("vec_id").as("nid"), col("q").as("qb"),
          col("norm").as("qnb")), "nid")
        .select(col("qid"), col("nid"),
          round(graft.plans.dotQNative(col("qa"), col("qb")).cast("double") /
            (col("qna") * col("qnb")), 6).as("cosine"))
      val wExact = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
      exact.withColumn("rn", row_number().over(wExact)).filter(col("rn") <= k)
        .select("qid", "nid", "cosine")
    }
  }

  /** The batch variant's routing relations, re-derived for specs: the
    * trained (vec_id, cell) assignment and the probes' (qid, pcell)
    * probed cells — same memoized coarse book (tag ""), same constants,
    * so the spec checks the contract the declared query actually runs. */
  def ivfPqRouting(spark: SparkSession, d: String): (DataFrame, DataFrame) = {
    val r = qnormRelation(spark, d)
    val coarse = ivfPqCoarseBook(spark, d)
    (withCell(r, coarse).select("vec_id", "cell"),
      probeCellsOf(r.filter(col("vec_id") < 50).select("vec_id", "q"),
        coarse, IvfPqNprobe))
  }

  val simIvfPq: QueryDef =
    ivfPqDef("sim_ivf_pq", seedCondSql = "", trainCondSql = "",
      probeCondSql = "p.vec_id < 50",
      trainPred = _ => lit(true), probePred = _ < 50, tag = "")

  /** FROZEN-codebook incremental ingest — the continuous-ingest shape of
    * the IVF-PQ stack: the coarse quantizer AND the PQ codebooks train on
    * the STORE only (vec_id % 20 != 0; retraining is an offline event,
    * never a per-batch one), the NEW batch (vec_id % 20 == 0, the
    * proportional-seeding convention of sim_incremental_ann) assigns,
    * encodes, and probes against those frozen books. Per-batch work ∝
    * batch (assignment + encode are zero-shuffle literal-argmin
    * projections over batch rows); the code store itself is append-only
    * at ingest. The oracle replays the frozen-training chain: seeds and
    * assignment restricted to store rows, cell/code assignment over
    * store ∪ batch, ADC probes = the batch.
    *
    * nprobe = 1 — the INGEST operating point, deliberately different
    * from the batch variant's retrieval point (nprobe = 3): ingest
    * near-dup probing hunts re-uploads and near-copies, which land in
    * their original's cell by construction (the cell is a deterministic
    * function of the vector), so multi-cell probing buys boundary-case
    * recall the ingest gate rarely needs at 3× the candidate volume —
    * measured 245 s (nprobe 3) vs 55.7 s (nprobe 1) at sf10 under the
    * probes-∝-corpus seeding.
    * Cross-cell recall is priced by sim_pq_recall on the batch variant;
    * a deployment needing it at ingest raises nprobe, not the funnel. */
  val simIvfPqIncremental: QueryDef =
    ivfPqDef("sim_ivf_pq_incremental",
      seedCondSql = " AND vec_id % 20 <> 0",
      trainCondSql = " WHERE v.vec_id % 20 <> 0",
      probeCondSql = "p.vec_id % 20 = 0",
      trainPred = _ % 20 =!= 0, probePred = _ % 20 === 0, tag = "_inc",
      split = true, nprobe = 1)

  /** Fixed-size-batch twin of [[simIvfPqIncremental]] (probe/A-B surface,
    * not declared): a CONSTANT 1000-probe batch (vec_id % 20 == 0 AND
    * vec_id < 20000) against the same frozen store-trained books. The
    * declared variant's proportional mod-20 seeding grows probes ∝ corpus
    * — right for the oracle gate, but it makes the decade points conflate
    * batch growth with per-probe cost; a production ingest batch is
    * rate-fixed, and this twin prices exactly that: per-batch cost ∝
    * probes × nprobe·corpus/cells with the corpus term isolated. */
  lazy val simIvfPqIncrementalFixed: QueryDef =
    ivfPqDef("sim_ivf_pq_inc_fixed",
      seedCondSql = " AND vec_id % 20 <> 0",
      trainCondSql = " WHERE v.vec_id % 20 <> 0",
      probeCondSql = "p.vec_id % 20 = 0 AND p.vec_id < 20000",
      trainPred = _ % 20 =!= 0,
      probePred = c => c % 20 === 0 && c < 20000,
      tag = "_incf", split = true)

  /** Recall@3 of the trained IVF-PQ stack against the GLOBAL brute-force
    * top-3 — the end-to-end acceptance number a routed+quantized index
    * quotes (it folds BOTH loss sources: cell routing can exclude a true
    * neighbor from another cell, PQ quantization can misrank candidates
    * within the cell). The [[simRecallEval]] harness applied to
    * [[simIvfPq]]: exact side O(probes × corpus) — affordable because the
    * probe set is a sample — approx side reads the same persisted
    * codes/codebooks the production query uses, so it measures the
    * deployed index. Integer end-to-end (hits, ppm floor division).
    *
    * Measured (round 13, trained coarse cells + nprobe=3 + 4x16 PQ +
    * cand=50): recall@3 = 100% at sf1, up from 57.3% in round 12 — and
    * the round-12 number was flattered by the inflated corpus (identical
    * replicas share the probe's label): on the uninflated sf0.1 vectors
    * the label-as-cell routing retains only 8.7% of true top-3 neighbors
    * where the trained cells retain 64% (nprobe=3 of 8), which caps sf0.1
    * end-to-end recall at 38% — the honest ceiling of kc=8 coarse cells
    * over near-unclustered fixture vectors; production raises kc and
    * nprobe together, not the funnel. */
  val simIvfPqRecall: QueryDef =
    QueryDef("sim_pq_recall",
      s"""SELECT e.qid, CAST(count(a.nid) AS BIGINT) AS hits,
        |  CAST(count(a.nid) AS BIGINT) * 1000000 // 3 AS recall_ppm
        |FROM (${topkOracle(" WHERE vec_id < 50", "", 3)}) e
        |LEFT JOIN (
        |${simIvfPq.oracle.get}) a ON a.qid = e.qid AND a.nid = e.nid
        |GROUP BY e.qid""".stripMargin) { (spark, d) =>
      val exact = sparkTopKDec(spark, d, 50, sameCell = false, k = 3)
        .select("qid", "nid")
      val approx = simIvfPq.fn(spark, d)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      exact.join(approx, Seq("qid", "nid"), "left")
        .groupBy("qid").agg(count(col("hit")).as("hits"))
        .select(col("qid"), col("hits"),
          expr("(hits * 1000000) div 3").as("recall_ppm"))
    }

  /** DEDUP-THEN-INDEX — the pipeline composition the 2M-vector censuses
    * concluded with: no candidate-generation lever (band width, cell
    * count, or both composed) can cut below the corpus's TRUE
    * near-duplicate density, so a production vector pipeline removes the
    * duplication first and builds retrieval structures on the survivors.
    * This query IS that composition, oracle-checked end to end: SemDeDup
    * ([[Clustering.ddSemdedup]] — k-means cells, in-cell banded exact
    * cosine, connected components, cluster-min keeper) prunes non-keeper
    * members, then the narrow-band knn graph builds over the SURVIVORS
    * only (their band relation persisted — the self-join must not replay
    * the dedup chain per side). On a duplicate-heavy corpus the graph's
    * input collisions drop by the clique mass the censuses measured; on
    * the gate fixtures the survivor set is nearly the corpus and the
    * query degenerates gracefully to the plain graph. The oracle nests
    * the full recursive SemDeDup chain as the survivor filter of the
    * knn chain, so the two stages cannot drift. */
  lazy val simDedupIndex: QueryDef = {
    val k = 3
    QueryDef("sim_dedup_index",
      s"""WITH sd AS (SELECT * FROM (
        |${Clustering.ddSemdedup.oracle.get}
        |) sdt),
        |removed AS (SELECT vec_id FROM sd WHERE vec_id <> keeper_id),
        |${narrowKnnOracleSql(cellEq = false, k,
             srcCond = " WHERE vec_id NOT IN (SELECT vec_id FROM removed)")
             .stripPrefix("WITH ")}""".stripMargin) { (spark, d) =>
      // the SemDeDup chain is constructed INSIDE the Persisted block: its
      // logical plan alone costs ~1 s of Catalyst per construction (JFR,
      // round 17 — the recursive chain dominates this query's plan_min),
      // and on a band-store hit none of it is needed
      val bands = graft.Persisted.of(spark, s"$d#dedup_index_bands") {
        val removed = Clustering.ddSemdedup.fn(spark, d)
          .filter(col("vec_id") =!= col("keeper_id")).select("vec_id")
        hyperBandsOfQNorm(
          qnormRelation(spark, d).join(removed, Seq("vec_id"), "left_anti")
            .select("vec_id", "q", "norm"))
      }
      knnGraphFromBands(bands, k)
    }
  }

  /** Production form of the dedup-then-index composition: the survivor
    * graph rides the KNEE-ROUTED band tier ([[knnGraphTier]] on the
    * survivor count) — the declared [[simDedupIndex]] pins the narrow
    * tier for oracle determinism, which saturates past the band knee
    * like every narrow-pinned graph (measured 314 s at sf10, where the
    * gate fixture's id-window dedup convention cannot see Inflate's
    * far-id replicas and survivors ≈ corpus). Survivor bands persist
    * per tier; one count() gates the choice. */
  private val survivorCountMemo = new graft.SessionMemo[java.lang.Long]

  def dedupThenIndexAuto(spark: SparkSession, d: String, k: Int = 3,
                         knee: Long = KnnBandKnee): DataFrame = {
    // survivors is a DEF: the SemDeDup chain's logical plan costs ~1 s of
    // Catalyst to construct (JFR, round 17), so it is only built where a
    // memo/store MISS actually needs it — a warm session's repeat call
    // touches neither the chain nor its analysis
    def survivors = {
      val removed = Clustering.ddSemdedup.fn(spark, d)
        .filter(col("vec_id") =!= col("keeper_id")).select("vec_id")
      qnormRelation(spark, d)
        .join(removed, Seq("vec_id"), "left_anti")
        .select("vec_id", "q", "norm")
    }
    // gate count memoized per (session, dir): recomputing it would replay
    // the whole SemDeDup chain on every invocation (code-review r13)
    val n: Long = survivorCountMemo.of(spark, s"$d#dedup_survivors")(
      Long.box(survivors.count()))
    if (knnGraphTier(n, knee) == 8)
      // the declared composition's store — one survivor band relation
      // per session, never a tier-8 twin under a second key
      knnGraphFromBands(graft.Persisted.of(spark, s"$d#dedup_index_bands") {
        hyperBandsOfQNorm(survivors)
      }, k)
    else
      knnGraphFromBands(graft.Persisted.of(spark, s"$d#dedup_index_bands_auto32") {
        hyperBandsWideOfQNorm(survivors)
      }, k)
  }

  // ---- kc auto-router (VERDICT r14 #2) ----

  /** Routed IVF cell count — kc ~ √n on the power-of-2 grid, the remedy
    * ARCHITECTURE's ingest decade points name for the fixture's hand-set
    * kc = [[IvfPqCells]]: per-probe candidate volume is nprobe·n/kc, so a
    * FIXED kc degrades probe cost linearly with corpus growth while
    * kc = √n keeps both the probe side (n/kc = √n) and the assignment
    * side (kc distance evaluations per row) sublinear — the standard IVF
    * balance point. Floor = the fixture constant (a book can't have more
    * cells than seed vectors, and the declared oracles pin kc = 8); cap =
    * 4096 (beyond it the assignment projection's literal centroid table
    * stops being a sensible single-stage expression — a 100 TB deployment
    * shards the coarse book before it gets there). Same knee-router
    * pattern as [[knnGraphTier]] / [[Dedup.simhashNearDupAuto]]:
    * declared queries pin the fixture constant for oracle determinism,
    * the auto entry points route, and a spec pins routed ≡ declared at
    * the forced fixture kc. */
  def ivfPqKcRouted(n: Long): Int = {
    val exp = math.round(
      math.log(math.sqrt(math.max(1L, n).toDouble)) / math.log(2.0)).toInt
    // clamp the exponent BEFORE shifting: 1 << 31 wraps negative and a
    // huge corpus would silently route to the floor instead of the cap
    math.max(IvfPqCells, 1 << math.min(12, math.max(0, exp)))
  }

  private val pqPairMemo =
    new graft.SessionMemo[(Seq[(Int, Array[Long])], Seq[Seq[(Int, Array[Long])]])]

  /** Frozen books trained at an explicit kc, memoized per (session, d, kc)
    * — the training step of [[ivfPqAuto]] and the kc-routed ingest. */
  def ivfPqBooksAt(spark: SparkSession, d: String,
                   kc: Int): (Seq[(Int, Array[Long])], Seq[Seq[(Int, Array[Long])]]) =
    pqPairMemo.of(spark, s"$d#ivfpq_auto_books_k$kc") {
      ivfPqTrain(Tables.embeddings(spark, d).select("vec_id", "embedding"), kc)
    }

  /** kc-ROUTED trained IVF-PQ batch retrieval — the production twin of the
    * declared [[simIvfPq]] (which pins kc = [[IvfPqCells]] for oracle
    * determinism): the coarse cell count comes from the corpus census via
    * [[ivfPqKcRouted]], everything else — trained books, persisted
    * cell-tagged code store, nprobe routing with the probed-cell IN-filter
    * pushed onto the store, broadcast ADC tables, cand-50 exact-rerank
    * funnel — is the same chain. `kcOverride` exists for the equality
    * spec (forced fixture kc must reproduce the declared rows) and for
    * probe A/Bs. */
  def ivfPqAuto(spark: SparkSession, d: String, probeMax: Int = 50,
                k: Int = 3, nprobe: Int = IvfPqNprobe,
                kcOverride: Option[Int] = None): DataFrame = {
    val kc = kcOverride.getOrElse(ivfPqKcRouted(vecCount(spark, d)))
    val (coarse, books) = ivfPqBooksAt(spark, d, kc)
    val codes = graft.Persisted.of(spark, s"$d#ivfpq_codes_auto_k$kc") {
      ivfPqEncode(Tables.embeddings(spark, d).select("vec_id", "embedding"),
        coarse, books)
    }
    val probes = codes.filter(col("vec_id") < probeMax)
    ivfPqIncrementalCodes(codes, probes, coarse, books, k, nprobe)
  }

  // ---- frozen-book IVF-PQ as STREAMING-ingest building blocks ----

  /** Train frozen IVF-PQ books offline from a static (vec_id, embedding)
    * corpus — the deployment step a rolling ingest ships with (retraining
    * is an offline event; the stream never moves the books). Returns
    * (coarse book, per-subspace PQ books). */
  /** [[ivfPqTrain]] with the cell count ROUTED from the training corpus's
    * own census ([[ivfPqKcRouted]]) — the entry a kc-routed deployment
    * (and [[graft.streaming.RollingIngest.ivfPqIngest]] callers) trains
    * with. Returns the routed kc alongside the books so the caller can
    * record/report the operating point. */
  def ivfPqTrainRouted(vecs: DataFrame, kcw: Int = 16, m: Int = 4)
      : (Int, Seq[(Int, Array[Long])], Seq[Seq[(Int, Array[Long])]]) = {
    val kc = ivfPqKcRouted(vecs.count())
    val (coarse, books) = ivfPqTrain(vecs, kc, kcw, m)
    (kc, coarse, books)
  }

  def ivfPqTrain(vecs: DataFrame, kc: Int = IvfPqCells, kcw: Int = 16,
                 m: Int = 4): (Seq[(Int, Array[Long])], Seq[Seq[(Int, Array[Long])]]) =
    ivfPqTrainQ(vecs.select(col("vec_id"), qvec(col("embedding")).as("q")),
      kc, kcw, m)

  /** [[ivfPqTrain]] from an already-QUANTIZED (vec_id, q) relation — the
    * entry a RETRAIN event uses: the rolling code store carries each
    * vector's exact quantized form (books-independent), so retraining
    * reads (vec_id, q) straight off the store without ever re-touching
    * raw embeddings (VERDICT r15 next-#1 wiring). Training from q equals
    * training from the raw floats bit-for-bit, because ivfPqTrain's first
    * step IS this quantization. */
  def ivfPqTrainQ(r: DataFrame, kc: Int = IvfPqCells, kcw: Int = 16,
                  m: Int = 4): (Seq[(Int, Array[Long])], Seq[Seq[(Int, Array[Long])]]) = {
    val dh = Dim / m
    val coarse = lloydBook(r.select(col("vec_id"), col("q").as("v")), kc,
      1000000000L)
    val books = (1 to m).map(s => lloydBook(
      r.select(col("vec_id"), slice(col("q"), (s - 1) * dh + 1, dh).as("v")),
      kcw, 1000000000L))
    (coarse, books)
  }

  /** One zero-join encode projection appending code column c`s` for
    * subspace `s` against a frozen book — the same [[centDists]]
    * arithmetic and first-minimum tie-break as every other assignment. */
  private def withCode(df: DataFrame, s: Int, dh: Int,
                       book: Seq[(Int, Array[Long])]): DataFrame =
    df.withColumn(s"c$s",
      cellOf(slice(col("q"), (s - 1) * dh + 1, dh), book))

  /** Encode a (vec_id, embedding) batch against FROZEN books into the
    * code-store row shape (vec_id, cell, c1..cm, q, norm) — one
    * zero-shuffle projection chain (quantize, norm, cell argmin, m code
    * argmins); the streaming ingest writes exactly these rows,
    * cell-partitioned. The exact vector rides along for the rerank phase,
    * the same layout choice as the hyperplane band store. */
  def ivfPqEncode(vecs: DataFrame, coarse: Seq[(Int, Array[Long])],
                  books: Seq[Seq[(Int, Array[Long])]]): DataFrame =
    ivfPqEncodeQNorm(
      vecs.select(col("vec_id"), qvec(col("embedding")).as("q"))
        .withColumn("norm",
          sqrt(graft.plans.dotQNative(col("q"), col("q")).cast("double"))),
      coarse, books)

  /** [[ivfPqEncode]] from an already-quantized (vec_id, q, norm) relation —
    * the RE-ENCODE entry of a retrain event: cell and codes are pure
    * functions of (q, books), and q/norm are books-independent, so
    * re-encoding a code store under new books reads (vec_id, q, norm)
    * straight off the old rows (VERDICT r15 next-#1 wiring). */
  def ivfPqEncodeQNorm(r: DataFrame, coarse: Seq[(Int, Array[Long])],
                       books: Seq[Seq[(Int, Array[Long])]]): DataFrame = {
    val dh = Dim / books.size
    val base = withCell(r.select(col("vec_id"), col("q"), col("norm")), coarse)
    books.indices.foldLeft(base)((acc, i) => withCode(acc, i + 1, dh, books(i)))
      .select(Seq(col("vec_id"), col("cell")) ++
        books.indices.map(i => col(s"c${i + 1}")) ++
        Seq(col("q"), col("norm")): _*)
  }

  /** Batch-vs-store routed-ADC probe over ENCODED code relations — the
    * IVF-PQ twin of [[lshAnnIncrementalBands]], and the probe the rolling
    * ingest runs per micro-batch: supersede the store against the batch's
    * ids, route each probe to its nprobe nearest frozen cells, ADC-score
    * the routed codes (broadcast per-probe tables), rerank the top
    * `rerank` candidates exactly. Work ∝ batch on the probe side; the
    * store side is the routed scan (cell partition pruning at rest). */
  def ivfPqIncrementalCodes(store: DataFrame, batch: DataFrame,
                            coarse: Seq[(Int, Array[Long])],
                            books: Seq[Seq[(Int, Array[Long])]],
                            k: Int = 3, nprobe: Int = 1,
                            rerank: Int = 50): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val m = books.size
    val dh = Dim / m
    val codeCols = (1 to m).map(s => s"c$s")
    val live = store
      .join(batch.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
    val all = live.select(store.columns.map(col): _*)
      .unionByName(batch.select(store.columns.map(col): _*))
    val pCells = broadcast(probeCellsOf(batch.select("vec_id", "q"), coarse, nprobe))
    val cells = pCells.select("pcell").distinct().collect().map(_.getInt(0)).toSeq
    def adc(s: Int, keepNorm: Boolean) = broadcast(
      batch.select(col("vec_id").as("qid"),
          slice(col("q"), (s - 1) * dh + 1, dh).as("pv"), col("norm").as("na"))
        .crossJoin(books(s - 1).toDF("cw", "cv"))
        .select(Seq(col("qid"), col("cw").as(s"c$s"),
          graft.plans.dotQNative(col("pv"), col("cv")).as(s"t$s")) ++
          (if (keepNorm) Seq(col("na")) else Nil): _*))
    val withTs = (1 to m).foldLeft(
      all.select((Seq("vec_id", "cell") ++ codeCols).map(col) :+
          col("norm").as("nb"): _*)
        .filter(col("cell").isin(cells: _*))
        .join(pCells, col("pcell") === col("cell"))
        .filter(col("qid") =!= col("vec_id"))) { (acc, s) =>
      acc.join(adc(s, keepNorm = s == 1), Seq("qid", s"c$s"))
    }
    val approx = withTs.select(col("qid"), col("vec_id").as("nid"),
      round((1 to m).map(s => col(s"t$s")).reduce(_ + _).cast("double") /
        (col("na") * col("nb")), 6).as("acos"))
    val wApprox = Window.partitionBy("qid").orderBy(col("acos").desc, col("nid"))
    val cands = approx.withColumn("rn", row_number().over(wApprox))
      .filter(col("rn") <= rerank).select("qid", "nid")
    val exact = cands
      .join(batch.select(col("vec_id").as("qid"), col("q").as("qa"),
        col("norm").as("qna")), "qid")
      .join(all.select(col("vec_id").as("nid"), col("q").as("qb"),
        col("norm").as("qnb")), "nid")
      .select(col("qid"), col("nid"),
        round(graft.plans.dotQNative(col("qa"), col("qb")).cast("double") /
          (col("qna") * col("qnb")), 6).as("cosine"))
    val wExact = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    exact.withColumn("rn", row_number().over(wExact)).filter(col("rn") <= k)
      .select("qid", "nid", "cosine")
  }

  /** Maximum-inner-product top-5 — the dual-encoder retrieval metric
    * (query·document trained unnormalized), completing the metric family
    * next to cosine (sim_cosine_topk), L2 (sim_pq_adc's encode), and the
    * banded approximations. Entirely EXACT INTEGERS: quantized dots rank
    * directly (no norms, no division, no round(6) guard needed — the only
    * similarity query with zero doubles anywhere). Per-probe top-5 rides
    * the bounded-state [[graft.plans.TopKStructs]] aggregate ((dot, -nid)
    * DESC-lex encodes the nid-ascending tie-break) rather than a rank
    * window — the operator built for exactly this shape.
    *
    * Scale path: MIPS reduces to cosine by the norm-augmentation
    * transform ([x, sqrt(M^2 - |x|^2)] with 0 appended to probes), after
    * which the hyperplane-banded machinery (sim_lsh_ann /
    * sim_incremental_ann_ivf) applies unchanged; the declared query is
    * the exact broadcast-probe baseline, the same contract as
    * sim_cosine_topk. */
  val simMipsTopK = QueryDef("sim_mips_topk",
    s"""WITH a AS (${unnestSql(" WHERE vec_id < 20")}),
      |b AS (${unnestSql("")}),
      |dots AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
      |    CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      |  FROM a JOIN b ON a.i = b.i AND a.vec_id <> b.vec_id
      |  GROUP BY a.vec_id, b.vec_id)
      |SELECT qid, nid, dot FROM (
      |  SELECT qid, nid, dot,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rn
      |  FROM dots) t
      |WHERE rn <= 5""".stripMargin) { (spark, d) =>
    val withNorm = qnormRelation(spark, d)
    val p = withNorm.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("q").as("va"))
    val c = withNorm.select(col("vec_id").as("nid"), col("q").as("vb"))
    broadcast(p).crossJoin(c).filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        dotQ(col("va"), col("vb")).cast("long").as("dot"))
      .groupBy("qid")
      .agg(graft.plans.topK(
        struct(col("dot"), (-col("nid")).as("mnid")), 5).as("top"))
      .select(col("qid"), explode(col("top")).as("s"))
      .select(col("qid"), (-col("s.mnid")).cast("long").as("nid"),
        col("s.dot").cast("long").as("dot"))
  }

  val all: Seq[QueryDef] = Seq(
    simCosineTopK, simIvfBucketed, simLshHyperplane, ddEmbeddingNearDup,
    simSq8Rerank, simIncrementalAnn, simIncrementalAnnIvf, simKnnGraph,
    simKnnGraphWide, simKnnGraphRouted, simKnnGraphRoutedWide, simGraphRecall,
    simRecallEval,
    simPqAdc, simIvfPq, simIvfPqIncremental, simIvfPqRecall, simDedupIndex,
    simMipsTopK)
}
