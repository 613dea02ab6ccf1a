package graft

import graft.operators.Similarity
import graft.streaming.RollingIngest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The full curation funnel as one rolling loop (round 17):
  * quality gate -> decontamination gate -> near-dup keeper gate ->
  * quantized index, with a per-doc audit across the two sinks. Every
  * planted drop must fall at exactly its stage with exactly its reason,
  * survivors must equal the static replay of the same gates, and both
  * stores must hold exactly the final keepers. */
class CuratedIngestSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int): Seq[Float] =
    Seq.tabulate(64)(j => (math.sin(seed * 17 + j * 3) * 2).toFloat)

  // 25 tokens, few stopwords, word lengths ~5: passes every quality rule
  private def text(i: Long): String =
    s"curated document $i covering topic${i % 7} using steady prose body " +
      (0 until 16).map(j => s"w${i}x$j").mkString(" ")

  test("curatedIngest: each planted drop falls at its stage; stores hold exactly the survivors") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = Files.createTempDirectory("graft_curated").toString
    val (dd, ann) = (root + "/dedup", root + "/ann")
    val (coarse, books) = Similarity.ivfPqTrain(
      (0L until 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding"))
    // the held-out benchmark: one distinctive passage
    val benchText = "benchmark heldout evaluation passage " +
      (0 until 21).map(j => s"bench${j}tok").mkString(" ")
    val benchDocs = Seq((1000L, benchText)).toDF("doc_id", "text")
    val dupText = "shared payload " + (0 until 22).map(j => s"u$j").mkString(" ")
    val b0: Seq[(Long, String, Seq[Float])] =
      (0L until 10L).map(i => (i, text(i), vec(i.toInt))) :+
        (90L, "tiny short text", vec(90)) :+      // quality: too_short
        (91L, benchText, vec(91))                 // decontam: contaminated
    val b1: Seq[(Long, String, Seq[Float])] =
      (10L until 18L).map(i => (i, text(i), vec(i.toInt))) :+
        (92L, text(3), vec(92)) :+                // near-dup of stored doc 3
        (93L, dupText, vec(93)) :+                // in-batch exact pair:
        (94L, dupText, vec(94))                   //   93 kept, 94 'duplicate'
    val curation = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, String)]
    val decisions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Boolean)]
    val in = MemoryStream[(Long, String, Seq[Float])]
    val q = RollingIngest.curatedIngest(
      in.toDF().toDF("doc_id", "text", "embedding"), benchDocs, dd, ann,
      coarse, books,
      curationSink = (c, id) => curation ++= c.collect().map(r =>
        (id, r.getLong(0), r.getString(1), r.getString(2))),
      dedupSink = (dec, id) => decisions ++= dec.collect().map(r =>
        (id, r.getLong(0), r.getLong(1), r.getBoolean(2)))) { (n, _) =>
      n.collect(): Unit
    }
    try Seq(b0, b1).foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()
    // ---- the funnel account, stage by stage ----
    val byDoc = curation.map(t => t._2 -> ((t._3, t._4))).toMap
    assert(byDoc == Map(
      90L -> (("quality", "too_short")),
      91L -> (("decontam", "contaminated")),
      94L -> (("quality", "duplicate"))),
      s"unexpected curation drops: $curation")
    // dedup decisions cover exactly the gate survivors; 92 loses to the
    // stored keeper 3, everything else keeps itself
    val survivors = (0L until 18L).toSet + 92L + 93L
    assert(decisions.map(_._2).toSet == survivors)
    val dropped = decisions.filter(!_._4)
    assert(dropped.map(d => (d._2, d._3)) == Seq((92L, 3L)),
      s"unexpected dedup drops: $dropped")
    // ---- stores hold exactly the final keepers, in both structures ----
    val kept = survivors - 92L
    val ddSchema = graft.operators.Dedup.simhash64Bands(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).schema
    val ddIds = RollingIngest.storeView(spark, dd, ddSchema, "doc_id").get
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(ddIds == kept)
    val codeSchema = Similarity.ivfPqEncode(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      coarse, books).schema
    val eff = RollingIngest.storeView(spark, ann, codeSchema, "vec_id").get
    val keptRows = (b0 ++ b1).filter(t => kept(t._1))
    val want = Similarity.ivfPqEncode(
      keptRows.map(t => (t._1, t._3)).toDF("vec_id", "embedding"),
      coarse, books)
    assert(eff.collect().toSet == want.collect().toSet,
      "code store must equal the encode of the curated survivors")
    // ---- gates equal their static batch replay (the spec the replay
    // contract leans on: deterministic per batch + static benchmark) ----
    val staticQ = graft.operators.TextAnalysis.keepFilter(
      b1.map(t => (t._1, t._2)).toDF("doc_id", "text"))
      .filter(!col("keep")).select("doc_id", "reason")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(staticQ == Set((94L, "duplicate")))
  }

  test("decontamGate: both tiers equal the one-shot decontaminate; release is idempotent") {
    import graft.operators.{Dedup, TextAnalysis}
    val bench = Seq((1000L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // full overlap
      (2L, "alpha beta gamma unrelated tokens here entirely"),
      (3L, "nothing shared at all with the benchmark"))
      .toDF("doc_id", "text")
    val benchWids = Dedup.docWidArrays(bench)
    val corpusWids = Dedup.docWidArrays(corpus)
    val dictIds = benchWids.select(explode(col("wids"))).distinct().count()
    val want = TextAnalysis.decontaminate(corpusWids, benchWids, dictIds)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    Seq(Long.MaxValue /* broadcast tier */, 0L /* bloom tier */).foreach { cap =>
      val (gate, release) = TextAnalysis.decontamGate(benchWids, cap)
      val got = gate(corpusWids)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
      assert(got == want, s"tier cap=$cap must equal one-shot decontaminate")
      release(); release() // idempotent (the stream-termination hook may double-fire)
    }
    assert(want.exists(t => t._1 == 1L && t._3),
      "the full-overlap doc must be contaminated (else the test is vacuous)")
  }
}
