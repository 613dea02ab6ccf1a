package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Cross-checks and invariants for the query families on sf0.001. */
class OperatorsSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and has stable column names") {
    SparkEntry.defs.foreach { q =>
      val df = q.fn(spark, sf0001)
      assert(df.columns.nonEmpty, q.name)
      assert(df.count() >= 0, q.name)
    }
  }

  test("every declared oracle references only testdata tables") {
    val tables = Tables.names.toSet
    SparkEntry.oracleSql.values.foreach { sql =>
      val froms = "(?i)(?:from|join)\\s+([a-z_]+)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      assert(froms.intersect(tables).nonEmpty)
    }
  }

  test("A1 consensus value is seen by every method of its user") {
    val cand = Consensus.candidates(spark, sf0001).cache()
    val res = Consensus.a1Consensus.fn(spark, sf0001).collect()
    val byUser = cand.collect().groupBy(_.getLong(0))
    res.foreach { r =>
      val (u, k) = (r.getLong(0), r.getInt(1))
      val methods = byUser(u).map(_.getString(1)).toSet
      val methodsWithK = byUser(u).filter(_.getInt(2) == k).map(_.getString(1)).toSet
      assert(methodsWithK == methods, s"user $u consensus $k")
    }
    cand.unpersist()
  }

  test("A2 weighted vote only emits candidates backed by purchase + another") {
    val cand = Consensus.candidates(spark, sf0001).collect()
      .groupBy(r => (r.getLong(0), r.getInt(2)))
    Consensus.a2WeightedVote.fn(spark, sf0001).collect().foreach { r =>
      val rows = cand((r.getLong(0), r.getInt(1)))
      val methods = rows.map(_.getString(1)).toSet
      assert(methods.contains("purchase") && methods.exists(_ != "purchase"))
    }
  }

  test("W2 dedup keeps exactly one row per customer, the max-price one") {
    val out = CoreQueries.w2DedupMax.fn(spark, sf0001)
    val orders = Tables.orders(spark, sf0001)
    assert(out.groupBy("o_custkey").count().filter(col("count") > 1).count() == 0)
    val maxes = orders.groupBy("o_custkey").agg(max("o_totalprice").as("mx"))
    val joined = out.join(maxes, "o_custkey")
      .filter(col("o_totalprice") =!= col("mx")).count()
    assert(joined == 0)
  }

  test("similarity: cosine of a vector with itself is 1.0 (double path)") {
    import spark.implicits._
    val v = Seq((1L, Array(0.6f, 0.8f)), (2L, Array(0.6f, 0.8f)), (3L, Array(-0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(v.filter($"vec_id" === 1), v, k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(math.abs(top(2L) - 1.0) < 1e-12)       // identical vector
    assert(math.abs(top(3L)) < 1e-12)             // orthogonal vector
  }

  test("media codec: real BMP/PPM headers round-trip; junk falls to the stub") {
    // encode with known dims -> decode must recover them FROM THE BYTES
    assert(MediaCodec.decode(MediaCodec.encodeBmp(33, 47, 7L)) === Some(("bmp", 33, 47)))
    assert(MediaCodec.decode(MediaCodec.encodePpm(640, 480, 7L)) === Some(("ppm", 640, 480)))
    // BMP with 3*w not divisible by 4: size formula must include row padding
    val bmp = MediaCodec.encodeBmp(17, 5, 1L)
    assert(bmp.length === 54 + (3 * 17 + 3) / 4 * 4 * 5)
    // top-down BMP (negative height) decodes to |height|
    val td = MediaCodec.encodeBmp(20, 10, 1L)
    val buf = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -10)
    assert(MediaCodec.decode(td) === Some(("bmp", 20, 10)))
    // PPM comments/whitespace per Netpbm spec
    val commented = "P6\n# a comment\n 12\t34\n255\n".getBytes("US-ASCII")
    assert(MediaCodec.decode(commented) === Some(("ppm", 12, 34)))
    // junk and truncated headers: no decode (callers fall back to the stub)
    assert(MediaCodec.decode("not an image".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.decode(Array[Byte]('B', 'M', 1, 2)).isEmpty)
    assert(MediaCodec.decode("P6\n-3 4\n255\n".getBytes("US-ASCII")).isEmpty)
    // missing separator after the magic / between numbers: rejected, not
    // misread as width 123 (Netpbm requires whitespace)
    assert(MediaCodec.decode("P6123 4\n255\n".getBytes("US-ASCII")).isEmpty)
    // adversarial 20-digit dimension: must fail, not wrap Int to a bogus
    // positive width
    assert(MediaCodec.decode("P6\n18446744073709551617 4\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.decode("P6\n4 99999999999999999999\n255\n".getBytes("US-ASCII")).isEmpty)
  }

  test("image near-dup tiers equal the brute-force all-pairs hamming (sound AND complete)") {
    // independent of the DuckDB oracle (whose raster CTE OOMs past sf0.1 —
    // an oracle-cost bound): collect both hash relations, compute every
    // pairwise hamming in Scala, and compare the banded queries' outputs
    // exactly. Soundness (reported hamming correct, <= 3) and pigeonhole
    // completeness (no qualifying pair missed by banding) in one check.
    val a = graft.operators.Multimodal.ahashRelation(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val p = graft.operators.Multimodal.phashRelation(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(x: String, y: String) = x.zip(y).count(t => t._1 != t._2).toLong
    def brute(h: Map[Long, String]) = (for {
      (i, hi) <- h.toSeq; (j, hj) <- h.toSeq if i < j
      d = ham(hi, hj) if d <= 3
    } yield (i, j, d)).toSet
    val got64 = graft.operators.Multimodal.mmImageNeardup.fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got64 === brute(a))
    val combined = a.map { case (id, h) => id -> (h + p(id)) }
    val got128 = graft.operators.Multimodal.mmImageNeardup128.fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got128 === brute(combined))
    assert(got64.nonEmpty && got128.nonEmpty)
  }

  test("frame overlap: hot-digest df gate drops boilerplate frames, keeps genuine overlap bounded") {
    import spark.implicits._
    // skewed fixture: ONE boilerplate digest in 1000 docs (the black-frame
    // case — ungated it alone emits ~500k candidate pairs), plus two
    // genuine near-dup pairs sharing 2 rare digests each
    val hotRows = (1L to 1000L).map(id => (id, "HOT"))
    val genuine = Seq(
      (1L, "r1"), (1L, "r2"), (2L, "r1"), (2L, "r2"),             // pair (1,2)
      (3L, "r3"), (3L, "r4"), (3L, "r5"), (4L, "r3"), (4L, "r4"), // pair (3,4)
      (4L, "r6"))
    val fr = (hotRows ++ genuine).toDF("doc_id", "frame_md5")
    val got = graft.operators.Multimodal.frameOverlap(fr, dfGate = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the hot digest feeds NO pairs (ungated it alone would put ~500k
    // rows through the self-join); kept-frame counts exclude it too
    assert(got.toSet === Set(
      (1L, 2L, 2L, 1000000L),          // 2 shared / min(2, 2) kept frames
      (3L, 4L, 2L, 666666L)))          // 2 shared / min(3, 3) kept frames
    // n_shared counts only INFORMATIVE digests: with the gate off, the
    // hot digest inflates every genuine pair's count and ppm
    val ungated = graft.operators.Multimodal.frameOverlap(fr, dfGate = 100000)
      .filter($"doc_a" === 1 && $"doc_b" === 2).collect()
    assert(ungated.head.getLong(2) === 3L)  // HOT leaked into n_shared
  }

  test("frame overlap incremental: batch-vs-store equals the full gated chain restricted to batch") {
    import spark.implicits._
    val fr = graft.operators.Multimodal.framesRelation(spark, sf0001)
    val store = fr.filter($"doc_id" % 4 =!= 0)
    val batch = fr.filter($"doc_id" % 4 === 0)
    val inc = graft.operators.Multimodal.frameOverlapIncremental(store, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = graft.operators.Multimodal.frameOverlap(fr)
      .filter($"doc_a" % 4 === 0 || $"doc_b" % 4 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(inc === full)
    // supersede: a re-ingested id pairs off its FRESH frames only
    val store2 = store.unionByName(Seq((4L, "stale")).toDF("doc_id", "frame_md5"))
    val inc2 = graft.operators.Multimodal.frameOverlapIncremental(store2, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(inc2 === inc)
  }

  test("image incremental: batch-vs-store equals the full banded chain restricted to batch") {
    import spark.implicits._
    val hv = graft.operators.Multimodal.ahashBandsOf(
      graft.operators.Multimodal.ahashRelation(spark, sf0001))
    val inc = graft.operators.Multimodal.imageNearDupIncremental(
        hv.filter($"doc_id" % 4 =!= 0), hv.filter($"doc_id" % 4 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = graft.operators.Multimodal.mmImageNeardup.fn(spark, sf0001)
      .filter($"doc_a" % 4 === 0 || $"doc_b" % 4 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full)
    assert(inc.nonEmpty)
  }

  test("approx_stats: a group whose distinct key is all NULL survives with exact_customers = 0") {
    // ADVICE r11: the split's inner join dropped all-NULL groups the
    // oracle's single aggregate emits; pin the left-join + coalesce fix
    // on a fixture the testdata can't produce (it has no NULL custkeys)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nullgrp").toString
    Seq[(String, Option[Long], Double)](
      ("1-URGENT", Some(10L), 100.0), ("1-URGENT", Some(11L), 50.0),
      ("5-LOW", None, 70.0), ("5-LOW", None, 30.0))
      .toDF("o_orderpriority", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.ExtendedQueries.approxStats.fn(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet === Set("1-URGENT", "5-LOW"))
    assert(got("1-URGENT")._1 === 2L)
    assert(got("5-LOW") === ((0L, true)), "all-NULL group must survive with 0 exact and true bound")
  }

  test("corrDouble production twin tracks the exact-moment agg_corr within 10 ppm") {
    // the dotD-vs-dotQNative contract: the deployment runs the codegen'd
    // double corr; the oracle-declared DECIMAL moment form certifies it
    val exact = graft.operators.QualityQueries.aggCorr.fn(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val fast = graft.operators.QualityQueries.corrDouble(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(exact.nonEmpty && fast.keySet === exact.keySet)
    exact.foreach { case (flag, (n, r2, sign)) =>
      val (fn2, fr2, fsign) = fast(flag)
      assert(fn2 === n, s"flag $flag n")
      assert(fsign === sign, s"flag $flag sign")
      // same split-floor statistic, double vs exact arithmetic: a floor
      // can flip only when the true ratio sits within double error of an
      // integer, moving r2_ppm by well under 1 ppm per factor
      assert(math.abs(fr2 - r2) <= 5, s"flag $flag r2_ppm: exact $r2 vs double $fr2")
    }
  }

  test("agg_corr long-product moments equal the per-row DECIMAL-product form") {
    // round-17 optimization pin: the declared query now computes x·y, x²,
    // y² as LONGs (domain-bounded: x ≤ 5e3, y ≤ ~1.1e7 cents) and widens
    // to DECIMAL(38,0) only at the accumulator — this spec holds the
    // rewrite to the original widen-first form at full output precision,
    // so a future edit that lets a product overflow a long fails here
    // (and documents the bound the rewrite rests on)
    import org.apache.spark.sql.functions._
    val t = graft.Tables.lineitem(spark, sf0001).select(
      col("l_returnflag").as("flag"),
      round(col("l_quantity") * 100).cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val widenFirst = t.groupBy("flag").agg(
      sum(dec(col("x")) * col("y")).as("sxy"),
      sum(dec(col("x")) * col("x")).as("sxx"),
      sum(dec(col("y")) * col("y")).as("syy"))
    val longProd = t.groupBy("flag").agg(
      sum(dec(col("x") * col("y"))).as("sxy"),
      sum(dec(col("x") * col("x"))).as("sxx"),
      sum(dec(col("y") * col("y"))).as("syy"))
    // belt-and-braces: the bound itself, on the real fixture
    val mx = t.agg(max(abs(col("x"))), max(abs(col("y")))).head()
    assert(mx.getLong(0) <= 5000L && mx.getLong(1) <= 20000000L,
      s"domain bound moved: max|x|=${mx.getLong(0)} max|y|=${mx.getLong(1)}")
    val a = widenFirst.collect().map(r => r.getString(0) ->
      ((r.getDecimal(1), r.getDecimal(2), r.getDecimal(3)))).toMap
    val b = longProd.collect().map(r => r.getString(0) ->
      ((r.getDecimal(1), r.getDecimal(2), r.getDecimal(3)))).toMap
    assert(a === b)
  }

  test("j1 packed-long argmax equals the max_by struct form") {
    // round-17 optimization pin: j1's argmax now rides one packed long
    // (score·2⁵⁸ + (2⁵⁸−1 − orderkey), a primitive-buffer HashAggregate)
    // instead of max_by's struct buffer (which silently planned as
    // SortAggregate). This spec holds the pack/decode to the max_by form
    // — same grouping, same tie rule (max score, then min orderkey)
    import org.apache.spark.sql.functions._
    val byMaxBy = graft.Tables.orders(spark, sf0001)
      .withColumn("s",
        when(col("o_orderstatus") === "F", 10).otherwise(0) +
          when(col("o_orderpriority").startsWith("1-"), 9).otherwise(0) +
          when(col("o_totalprice") > 100000, 7).otherwise(0) +
          when(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"), 3).otherwise(0))
      .groupBy("o_custkey")
      .agg(max_by(struct(col("o_orderkey"), col("s")),
        struct(col("s"), (-col("o_orderkey")).as("nk"))).as("b"))
      .select(col("o_custkey"), col("b.o_orderkey"), col("b.s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val byPacked = graft.operators.CoreQueries.j1ScoreArgmax.fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(byPacked.nonEmpty && byPacked === byMaxBy)
  }

  test("wav codec: RIFF chunk walk survives extra/odd chunks, rejects non-PCM and truncation") {
    import java.nio.{ByteBuffer, ByteOrder}
    val wav = MediaCodec.encodeWav(300, 8000, 5L)
    assert(MediaCodec.decodeWav(wav) === Some((8000, 44, 300)))
    // a LIST chunk of ODD length between fmt and data: the walker must pad
    // to the word boundary or every later offset shifts by one
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3)
    val withList = wav.take(36) ++ list ++ Array[Byte](0) ++ wav.drop(36)
    ByteBuffer.wrap(withList).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, withList.length - 8)
    assert(MediaCodec.decodeWav(withList) === Some((8000, 44 + 12, 300)))
    // non-PCM format code, truncated payload, wrong magic
    val nonPcm = wav.clone()
    ByteBuffer.wrap(nonPcm).order(ByteOrder.LITTLE_ENDIAN).putShort(20, 3)
    assert(MediaCodec.decodeWav(nonPcm).isEmpty)
    assert(MediaCodec.decodeWav(wav.take(100)).isEmpty)
    assert(MediaCodec.decodeWav("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
  }

  test("multimodal metadata: decoded dims equal the construction params on real payloads") {
    val out = Multimodal.mediaMeta(Tables.documents(spark, sf0001)).collect()
    assert(out.nonEmpty)
    val nChars = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === (if (id % 2 == 0) "bmp" else "ppm"))
      assert(r.getInt(3) === 16 + (id % 32).toInt, s"width of doc $id")
      assert(r.getInt(4) === 16 + (nChars(id) % 32).toInt, s"height of doc $id")
      assert(r.getLong(2) === Multimodal.mediaBytes(id, nChars(id)).length.toLong)
    }
  }

  test("multimodal frame sampling: batch path agrees with the expression path") {
    // the batch stage is generic over its (doc_id, text) input; the
    // declared query feeds it the re-upload-resolved source docs
    val viaBatch = Multimodal.frameSampleBatch(
      Multimodal.frameSourceDocs(Tables.documents(spark, sf0001)))
    val viaExpr = Multimodal.mmFrameSample.fn(spark, sf0001)
    assert(viaExpr.count() > 0)
    assert(viaBatch.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.exceptAll(viaBatch).count() == 0)
  }

  test("multimodal resize: batch buffers match the expression plan's shapes") {
    val plan = Multimodal.mmResize.fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getInt(5), r.getLong(6))).toMap
    val batch = Multimodal.resizeBatch(Tables.documents(spark, sf0001)).collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      val (ow, oh, ob) = plan(r.getLong(0))
      assert(r.getInt(1) === ow && r.getInt(2) === oh)
      assert(r.getAs[Array[Byte]](3).length.toLong === ob)
    }
  }

  test("sim_lsh_ann: every reported neighbor is a true candidate with correct cosine") {
    // soundness: reported cosines match the exact quantized cosine; bounded k
    val out = Similarity.simLshHyperplane.fn(spark, sf0001).collect()
    assert(out.nonEmpty)
    val perProbe = out.groupBy(_.getLong(0))
    assert(perProbe.values.forall(_.length <= 3))
    assert(out.forall(r => r.getDouble(2) >= -1.000001 && r.getDouble(2) <= 1.000001))
  }

  test("incremental ANN: batch-vs-store equals full recompute; re-ingested ids supersede") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    // store holds vectors < 450; the batch RE-INGESTS ids >= 350 with a
    // perturbed embedding plus genuinely-new ids >= 450 — stale store
    // bands of 350..449 must not contribute candidates or pair rows
    val store = Similarity.hyperBands(emb.filter($"vec_id" < 450))
    val batch = emb.filter($"vec_id" >= 350)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(2.0f) + lit(0.25f)))
    val inc = Similarity.lshAnnIncremental(store, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(inc.nonEmpty)
    // every probe is a batch id; at most k=3 rows per probe; no duplicates
    assert(inc.forall(_._1 >= 350))
    assert(inc.groupBy(_._1).values.forall(_.length <= 3))
    assert(inc.map(t => (t._1, t._2)).distinct.length == inc.length)
    // reference: full recompute over the superseded corpus, batch probes only
    val corpus = emb.filter($"vec_id" < 350).unionByName(batch)
    val full = Similarity.lshAnnIncremental(Similarity.hyperBands(corpus),
      corpus.filter($"vec_id" >= 350)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(inc.toSet === full.toSet,
      "incremental result must equal full recompute restricted to batch probes")
  }

  test("IVF-cell incremental ANN equals per-cell generic runs unioned") {
    // Independent reference: restricting candidates to the probe's cell is
    // the same as running the GENERIC incremental ANN per cell on that
    // cell's sub-corpus and unioning — each probe's candidate set and
    // top-k ordering are confined to its cell either way.
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label").as("cell"), col("embedding"))
    val ivf = Similarity.simIncrementalAnnIvf.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cells = emb.select("cell").distinct().as[Int].collect()
    val perCell = cells.flatMap { c =>
      val sub = emb.filter($"cell" === c).select("vec_id", "embedding")
      Similarity.lshAnnIncremental(
        Similarity.hyperBands(sub.filter($"vec_id" % 20 =!= 0)),
        sub.filter($"vec_id" % 20 === 0)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(ivf.nonEmpty)
    assert(ivf === perCell,
      "cell-keyed band join must equal per-cell generic incremental runs")
  }

  test("approx sketch aggregates land within tolerance of the exact values") {
    // The query now emits the tolerance verdicts itself (oracle-checkable
    // booleans); a drifted sketch shows up as a false flag here AND as a
    // driver hash mismatch. Cross-check exact_customers independently.
    val rows = ExtendedQueries.approxStats.fn(spark, sf0001).collect()
    assert(rows.length == 5)
    val exact = Tables.orders(spark, sf0001)
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val k = r.getString(0)
      assert(r.getLong(2) == exact(k), s"$k exact_customers")
      assert(r.getBoolean(3), s"$k hll_within_2pct")
      assert(r.getBoolean(4), s"$k p50_within_5pct")
    }
  }

  test("seed-style dedup W1: one row per (segment, nation), lowest key") {
    val out = CoreQueries.w1FirstSeen.fn(spark, sf0001)
    assert(out.groupBy("c_mktsegment", "c_nationkey").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("salted join equals the plain join exactly") {
    val salted = SpecExtractors.jSalted.fn(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("order_cnt"),
        (sum((col("o_totalprice") * 100 + 0.5).cast("long")) / 100.0).as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("sim_sq8_rerank: per-probe ordering is exact-cosine and recall vs true top-3 is high") {
    val got = Similarity.simSq8Rerank.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byProbe = got.groupBy(_._1)
    assert(byProbe.keySet == (0L until 50L).toSet)
    byProbe.values.foreach { rows =>
      assert(rows.length == 3)
      val cs = rows.sortBy(_._2).sortBy(-_._3).map(_._3).toSeq
      assert(cs == cs.sorted.reverse, "re-ranked output must be cosine-descending")
    }
    // true exact top-3 per probe, brute-forced driver-side on the fixture
    val vecs = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val hits = (0L until 50L).map { q =>
      val truth = vecs.keys.filter(_ != q).toSeq
        .map(n => n -> cos(vecs(q), vecs(n)))
        .sortBy { case (n, c) => (-c, n) }.take(3).map(_._1).toSet
      (byProbe(q).map(_._2).toSet intersect truth).size
    }.sum
    // the compressed phase must be informative: >= 60% of the true top-3
    // survive the 10-candidate funnel on this corpus (measured ~constant;
    // the re-rank makes the kept ones exactly ordered)
    assert(hits >= 90, s"recall too low: $hits/150")
  }

  test("ta_keep_filter: first failing rule wins, duplicates keep their group minimum") {
    import spark.implicits._
    // the real corpus exercises the metric rules...
    val out = TextAnalysis.taKeepFilter.fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out.values.exists(_._1), "some docs must pass the gate")
    assert(out.values.exists(!_._1), "some docs must fail the gate")
    // ...and a synthetic corpus pins the cascade ORDER + the duplicate rule
    // (the fixture corpora contain no byte-identical documents)
    val good = ("the quick brown fox jumped over the lazy dog and then " * 3).trim
    val docs = Seq(
      (1L, good),                  // keeper: keep
      (2L, good),                  // byte-identical dup of 1: 'duplicate'
      (3L, "too short"),           // fails rule 1
      (4L, "too short"),           // dup of 3, but too_short fires FIRST
      (5L, ("a " * 40).trim),      // 40 tokens, stop_ratio 1.0: 'stopword_ratio'
      (6L, null.asInstanceOf[String]) // NULL text: every metric nulls — must not fall through to keep
    ).toDF("doc_id", "text")
    val got = TextAnalysis.keepFilter(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(got(1L) == ((true, "keep")))
    assert(got(2L) == ((false, "duplicate")))
    assert(got(3L) == ((false, "too_short")))
    assert(got(4L) == ((false, "too_short")), "earlier rule must outrank 'duplicate'")
    assert(got(5L) == ((false, "stopword_ratio")))
    assert(got(6L) == ((false, "too_short")), "NULL text must be rejected")
  }

  test("j3 gram stores rebuild when graft.j3.maxGram changes mid-session") {
    import org.apache.spark.sql.functions._
    // the conf is part of the store cache keys (code-review r10): an A/B in
    // ONE session must never serve the other tier's cached index. sf0.01:
    // its 4-digit customer names carry 4-grams but sf0.001's (<= 3 chars)
    // carry none, so the 3-vs-4 ceiling discriminates the store contents.
    val sf001 = "/root/testdata/sf0.01"
    def gram4Count(): Long = {
      val (buckets, _) = graft.operators.CoreQueries.j3Stores(spark, sf001)
      buckets.filter(length(col("g")) === 4).count()
    }
    // the whole sweep is finally-guarded: a failure mid-A/B must not leak
    // a non-default tier into the shared session for later suites
    val (g3, g4) = try {
      spark.conf.set("graft.j3.maxGram", "3")
      val a = gram4Count()
      spark.conf.set("graft.j3.maxGram", "4")
      (a, gram4Count())
    } finally spark.conf.unset("graft.j3.maxGram")
    assert(g3 === 0L, "maxGram=3 store must hold no 4-gram entries")
    assert(g4 > 0L, "maxGram=4 store must hold 4-gram entries")
  }

  test("ta_shard_pack: two-level prefix equals the sequential fill; corpus window partitions by bucket") {
    val df = SparkEntry.queries("ta_shard_pack")(spark, sf0001)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.nonEmpty)
    // sequential greedy-fill reference: shard = budget window of the
    // running prefix START, in doc_id order
    var cum = 0L
    val expShards = got.map { case (_, n, _) => val s = cum / 4096L; cum += n; s }
    assert(got.map(_._3).toSeq === expShards.toSeq,
      "two-level prefix must equal the global sequential fill exactly")
    assert(got.head._3 === 0L && expShards.max > 0L,
      "test corpus must span multiple shards for the check to bite")
    // scale guard: the corpus-side prefix window must be PARTITIONED (by
    // bucket) — the single-partition window exists only on the tiny
    // bucket-totals relation
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(bucket"),
      s"expected the corpus window shuffled by bucket:\n$p")
  }

  test("ta_seq_pack: every sequence full except the tail; totals reconcile; docs monotone") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("ta_seq_pack")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.length > 1, "test corpus must span multiple sequences")
    assert(got.map(_._1).toSeq === (0L until got.length.toLong).toSeq,
      "sequence ids must be contiguous from 0")
    got.init.foreach { case (s, _, n, _, _) =>
      assert(n === 512L, s"non-tail sequence $s must hold exactly 512 tokens") }
    assert(got.last._3 >= 1L && got.last._3 <= 512L)
    val totTok = graft.Tables.documents(spark, sf0001)
      .select(sum(size(split(graft.functions.Exprs.normText(col("text")), " "))
        .cast("long")).as("t")).collect()(0).getLong(0)
    assert(got.map(_._3).sum === totTok,
      "packed token totals must reconcile with the corpus token count")
    // the concatenated stream is doc_id-ordered: consecutive sequences
    // meet at (or after) the boundary-spanning document
    got.sliding(2).foreach { case Array((_, _, _, _, l1), (_, _, _, f2, _)) =>
      assert(f2 >= l1, "doc ranges must be monotone across sequences")
    case _ => ()
    }
    // scale guard: the prefix window must be bucket-partitioned (shared
    // tokenStarts core — the single-partition window exists only on the
    // tiny bucket-totals relation)
    val p = SparkEntry.queries("ta_seq_pack")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(bucket"),
      s"expected the corpus window shuffled by bucket:\n$p")
  }

  test("bigramPairs: scan-stage pair formation handles 0/1-token and tie-heavy docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq(
      (1L, "a b c"), (2L, "x"), (3L, ""), (4L, "  "), (5L, "a a a"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.bigramPairs(col("text")).as("bg"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getString(0), p.getString(1))))
      .toMap
    assert(got(1L) === Seq(("a", "b"), ("b", "c")))
    assert(got(2L).isEmpty, "single-token doc yields no bigrams")
    assert(got(3L).isEmpty && got(4L).isEmpty,
      "empty/whitespace docs yield no bigrams (normText collapses to one '' token)")
    assert(got(5L) === Seq(("a", "a"), ("a", "a")),
      "repeated-token docs keep every occurrence pair")
  }

  test("ta_repetition: metrics match hand-computed values on a synthetic corpus") {
    // live corpus sanity
    val live = TextAnalysis.taRepetition.fn(spark, sf0001).collect()
    assert(live.nonEmpty)
    live.foreach { r =>
      val (n, d) = (r.getLong(1), r.getLong(2))
      assert(d >= 1 && d <= n, s"doc ${r.getLong(0)}: distinct in [1, n_words]")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
    // synthetic pins: "a a a a b" -> n=5, distinct=2, dup=0.6, top=0.8
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a a a a b"), (2L, "x y z"), (3L, "w w")).toDF("doc_id", "text")
      .select(col("doc_id"), inline(graft.plans.wordCounts(col("text"))))
    val dupF = round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 6)
    val topF = round(col("top_cnt").cast("double") / col("n_words"), 6)
    val got = df.groupBy("doc_id")
      .agg(sum("tf").as("n_words"), count(lit(1)).as("n_distinct"), max("tf").as("top_cnt"))
      .select(col("doc_id"), dupF.as("dup"), topF.as("top"),
        (dupF > 0.3 || topF > 0.1).as("rep"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((0.6, 0.8, true)))
    assert(got(2L) == ((0.0, 0.333333, true)),
      "uniform 3-word doc: top share 1/3 > 0.1 gate")
    assert(got(3L) == ((0.5, 1.0, true)))
  }

  test("decontam bloom tier is result-identical to the broadcast tier") {
    // VERDICT r8 #3: the dictionary tier past broadcast size — bloom
    // candidate probe + exact equi-join re-check. False positives from the
    // bloom can only ADD candidate rows; the verify join removes exactly
    // those, so the two tiers must agree row-for-row. Exercised at a
    // deliberately awful fpp (0.5) so false positives actually occur.
    val wid = graft.operators.Dedup.widRelation(spark, sf0001)
    val corpus = wid.filter(col("doc_id") % 50 =!= 0)
    val bench = wid.filter(col("doc_id") % 50 === 0)
    val viaBroadcast = TextAnalysis.decontamBroadcast(corpus, bench)
      .collect().map(_.toSeq).toSet
    assert(viaBroadcast.nonEmpty, "fixture corpus must contain overlap")
    val viaBloom = TextAnalysis.decontamBloom(corpus, bench,
      expectedDictIds = 100000L, fpp = 0.5).collect().map(_.toSeq).toSet
    assert(viaBloom == viaBroadcast)
    // the tiered entry routes on dictionary size: a threshold below the
    // fixture dictionary flips it to the bloom tier, same result
    val viaTiered = TextAnalysis.decontaminate(corpus, bench,
      dictIds = 100000L, broadcastMaxIds = 10L).collect().map(_.toSeq).toSet
    assert(viaTiered == viaBroadcast)
  }

  test("x15/x16 extraction recovers the synthesized names and slugs") {
    val x15 = SpecExtractors.x15SrcName.fn(spark, sf0001)
    // the extracted card_name must equal p_name for every part
    val bad = x15.withColumnRenamed("p_partkey", "k")
      .join(Tables.part(spark, sf0001), col("k") === col("p_partkey"))
      .filter(col("card_name") =!= col("p_name")).count()
    assert(bad == 0)
    assert(x15.count() == Tables.part(spark, sf0001).count())
    val x16 = SpecExtractors.x16HrefSlug.fn(spark, sf0001)
    assert(x16.filter(col("slug") === "").count() == 0)
    // rank-1 keywords only from the first keyword set
    assert(x16.filter(col("rank") === 1 &&
      !col("href").rlike("^/(investments|portfolio)/")).count() == 0)
  }

  test("ta_stratified_sample: exact quotas, two-level rank equals the global window") {
    import org.apache.spark.sql.expressions.Window
    val df = SparkEntry.queries("ta_stratified_sample")(spark, sf0001)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val quota = Map("en" -> 100L, "es" -> 50L).withDefaultValue(40L)
    val strata = Tables.documents(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exactly min(quota, |stratum|) selected per language
    val perLang = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    strata.foreach { case (l, n) =>
      assert(perLang.getOrElse(l, 0L) == math.min(quota(l), n), s"stratum $l")
    }
    // ranks are dense 1..k within each stratum
    got.groupBy(_._2).foreach { case (l, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"ranks $l")
    }
    // the two-level decomposition must equal the naive per-stratum window
    val naive = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"),
        Dedup.shingleIdChar(concat(lit("q"), col("doc_id").cast("string"))).as("hv"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy("hv", "doc_id")).cast("long"))
      .filter(col("rk") <= when(col("lang") === "en", 100L)
        .when(col("lang") === "es", 50L).otherwise(40L))
      .select("doc_id", "lang", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == naive.sortBy(_._1).toSeq)
    // scale guard: the corpus window is partitioned by (lang, bucket) —
    // the per-stratum single-partition window exists only on the tiny
    // offsets relation
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(lang") && p.contains("bucket"),
      s"expected the corpus window shuffled by (lang, bucket):\n$p")
  }

  test("ta_corpus_shuffle: dense permutation equal to the naive global hash-order window") {
    import org.apache.spark.sql.expressions.Window
    val df = SparkEntry.queries("ta_corpus_shuffle")(spark, sf0001)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = Tables.documents(spark, sf0001).count()
    assert(got.length.toLong == n, "every doc gets a position")
    assert(got.map(_._2).sorted.toSeq == (1L to n).toSeq, "positions are a dense permutation")
    val naive = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        Dedup.shingleIdChar(concat(lit("r"), col("doc_id").cast("string"))).as("hv"))
      .withColumn("pos", row_number().over(Window.orderBy("hv", "doc_id")).cast("long"))
      .select("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    got.foreach { case (id, p) => assert(naive(id) == p, s"doc $id position") }
    // the permutation must not be doc_id order (that would mean the hash
    // collapsed) nor the 'q'-salted sampling order
    assert(got.sortBy(_._1).map(_._2).toSeq != (1L to n).toSeq)
    // scale guard: the optimizer constant-folds the pseudo-stratum away,
    // so the corpus window partitions by the hash bucket ALONE — still
    // never a single-partition window
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(bucket"),
      s"expected the corpus window shuffled by bucket:\n$p")
  }

  test("ta_chunk: stride/overlap invariants and exact document reconstruction") {
    val (w, s) = (64, 48)
    val out = SparkEntry.queries("ta_chunk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Exprs.normText(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "every doc chunks")
    byDoc.foreach { case (id, chunks) =>
      val words = docs(id).split(" ")
      val sorted = chunks.sortBy(_._2)
      // dense chunk ids, stride-s starts, full windows except possibly last
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, ci, start, n, text) =>
        assert(start == ci * s)
        assert(n == math.min(w, words.length - start).toLong)
        assert(text == words.slice(start.toInt, start.toInt + n.toInt).mkString(" "))
      }
      // windows cover the doc: last chunk reaches the final token
      val (_, _, lastStart, lastN, _) = sorted.last
      assert(lastStart + lastN == words.length.toLong)
      // consecutive windows overlap by w - s tokens (full-window case)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._3 == s.toLong)
          if (a._4 == w.toLong) assert(a._3 + a._4 - b._3 == (w - s).toLong)
        case _ =>
      }
    }
  }

  test("dd_cross_doc: duplicated-shingle coverage on constructed docs") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, base),                          // identical to 1 -> fully covered
      (1L, base),
      (2L, base + " lambda mu nu"),        // shares 0/1's shingles + 4 unique (la/mu/nu tails)
      (3L, "one two three four five six")  // no shingle shared with anyone
    ).toDF("doc_id", "text")
    val wid = Dedup.docWidArrays(docs)
    val exploded = wid.select(col("doc_id"), explode(col("wids")).as("wid"))
    val dup = exploded.groupBy("wid").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2)
    val overlap = exploded.join(dup.select("wid"), "wid")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    val out = wid.select(col("doc_id"), size(col("wids")).cast("long").as("n"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n"), coalesce(col("n_dup"), lit(0L)).as("nd"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((8L, 8L)), "identical docs: every shingle cross-doc duplicated")
    assert(out(1L) == ((8L, 8L)))
    assert(out(2L)._1 == 11L && out(2L)._2 == 8L,
      "superset doc: the 8 shared shingles duplicated, the 3 new tail shingles not")
    assert(out(3L) == ((4L, 0L)), "unrelated doc: zero cross-doc shingles")
    // live-corpus invariants through the declared query
    val live = SparkEntry.queries("dd_cross_doc")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(live.length == Tables.documents(spark, sf0001).count())
    live.foreach { case (id, n, nd, f) =>
      assert(nd >= 0 && nd <= n, s"doc $id: 0 <= n_dup <= n_shingles")
      assert(n == 0 || math.abs(f - nd.toDouble / n) == 0.0, s"doc $id: frac")
    }
  }
}
