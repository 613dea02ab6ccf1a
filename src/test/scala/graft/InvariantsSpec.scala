package graft

import graft.functions.Exprs._
import graft.operators.{Dedup, FoundedYear, Similarity}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariants (SURVEY.md §5): randomized inputs with a fixed
  * seed, evaluated in one batch per property (one Spark job instead of one
  * per case). */
class InvariantsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private def randWs(n: Int): String = {
    val ws = Seq(" ", "\t", "\n", "  ", "")
    (1 to n).map(_ => ws(rnd.nextInt(ws.size)) + Random.alphanumeric.take(rnd.nextInt(6)).mkString).mkString
  }

  test("fixed-point money sums are partition-invariant (order-independent)") {
    // The core claim behind q1_agg/j4/o1's cents sums: the result is
    // IDENTICAL (bitwise) under any partitioning/accumulation order, where
    // a raw double SUM drifts. 50k random 2dp money values, grouped 7 ways.
    val rows = (1 to 50000).map { i =>
      (i % 7, math.round(rnd.nextDouble() * 1e7) / 100.0)
    }
    def centsSum(parts: Int) = rows.toDF("g", "x").repartition(parts)
      .groupBy("g")
      .agg((sum((col("x") * 100 + 0.5).cast("long")) / 100.0).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val p1 = centsSum(1)
    val p32 = centsSum(32)
    assert(p1 === p32) // exact equality, not a tolerance
    // and it equals the exact rational total
    val exactCents = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(t => math.round(t._2 * 100)).sum
    }
    exactCents.foreach { case (g, c) => assert(p1(g) == c / 100.0, s"group $g") }
  }

  test("X1 normText is idempotent on 200 random whitespace-heavy strings") {
    val df = (1 to 200).map(i => randWs(i % 20 + 1)).toDF("s")
    val bad = df.filter(normText(normText($"s")) =!= normText($"s")).count()
    assert(bad == 0)
  }

  test("X13 nameMatches is symmetric on random pairs") {
    val words = Seq("acme", "acme capital", "ac", "zenith partners", "zen", "capital", "")
    val pairs = for (a <- words; b <- words) yield (a, b)
    val df = pairs.toDF("a", "b")
    val asym = df.filter(nameMatches($"a", $"b") =!= nameMatches($"b", $"a")).count()
    assert(asym == 0)
  }

  test("X3 extracted years always lie in 1800..2099") {
    val df = (1 to 200).map(_ => (1 to 5).map(_ => rnd.nextInt(4000)).mkString(" ")).toDF("s")
    val bad = df.select(explode(extractYears($"s")).as("y"))
      .filter($"y" < 1800 || $"y" > 2099).count()
    assert(bad == 0)
  }

  test("A1 consensus year is contained in every method's candidate set") {
    val rows = for {
      site <- 1 to 30
      method <- Seq("jsonld", "relevant", "homepage", "google")
      if rnd.nextInt(4) > 0 // some methods missing per site
      y <- (1 to rnd.nextInt(5) + 1).map(_ => 1900 + rnd.nextInt(120))
    } yield (s"https://site$site", method, y)
    val cand = rows.toDF("website", "method", "year").distinct()
    val cons = FoundedYear.consensus(cand)
    val perMethod = cand.collect().groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(_.map(_.getInt(2)).toSet).toMap
    cons.collect().foreach { r =>
      val (site, y) = (r.getString(0), r.getInt(1))
      val methods = perMethod.keys.filter(_._1 == site)
      assert(methods.nonEmpty)
      methods.foreach { m => assert(perMethod(m).contains(y), s"$site $m missing $y") }
    }
  }

  test("similarity: dotQ symmetric and |cosine| <= 1 + quantization slack") {
    val vecs = (1 to 40).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val q = vecs.select($"vec_id", Similarity.qvec($"embedding").as("q"))
    val a = q.select($"vec_id".as("ia"), $"q".as("qa"))
    val b = q.select($"vec_id".as("ib"), $"q".as("qb"))
    val pairs = a.crossJoin(b)
      .select($"ia", $"ib",
        Similarity.dotQ($"qa", $"qb").as("dab"),
        Similarity.dotQ($"qb", $"qa").as("dba"),
        (Similarity.dotQ($"qa", $"qb").cast("double") /
          (sqrt(Similarity.dotQ($"qa", $"qa").cast("double")) *
            sqrt(Similarity.dotQ($"qb", $"qb").cast("double")))).as("cos"))
    assert(pairs.filter($"dab" =!= $"dba").count() == 0)
    assert(pairs.filter(abs($"cos") > 1.0 + 1e-6).count() == 0)
  }

  test("shingle count is words-2 for docs of unique words") {
    val docs = (1 to 50).map { i =>
      (i.toLong, (1 to i % 12).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val bad = docs.select($"doc_id",
      size(split(normText($"text"), " ")).as("nw"),
      size(Dedup.shinglesOf($"text")).as("ns"))
      .filter(!($"ns" === greatest($"nw" - 2, lit(0)) ||
        ($"nw" === 1 && $"ns" === 0))) // single empty-string word edge
      .count()
    assert(bad == 0)
  }

  test("shingleIdChar is deterministic and collision-reasonable") {
    val words = (1 to 500).map(i => s"token$i ngram${i * 7 % 97} x${i % 13}").toDF("s")
    val ids = words.select(Dedup.shingleIdChar($"s").as("id"))
    assert(ids.distinct().count() >= 490) // near-unique on distinct inputs
    val again = words.select(Dedup.shingleIdChar($"s").as("id"))
    assert(ids.exceptAll(again).count() == 0)
  }

  test("curation pipeline composes end-to-end: gate -> quota -> shuffle -> chunk") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    // 1. quality/dedup gate
    val kept = TextAnalysis.keepFilter(docs).filter(col("keep"))
      .select("doc_id").join(docs, "doc_id")
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.nonEmpty && keptIds.size < docs.count())
    // 2. exact per-language quotas over the SURVIVORS
    val quota = when(col("lang") === "en", 40L).otherwise(15L)
    val sampled = TextAnalysis.stratifiedSample(kept, quota)
    val sampledRows = sampled.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sampledRows.map(_._1).toSet.subsetOf(keptIds), "quota draws only from survivors")
    val keptStrata = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sampledRows.groupBy(_._2).foreach { case (l, rows) =>
      val q = if (l == "en") 40L else 15L
      assert(rows.length.toLong == math.min(q, keptStrata(l)), s"stratum $l quota")
    }
    // 3. deterministic shuffle of the sample is a dense permutation
    val sampleDocs = sampled.select("doc_id").join(docs, "doc_id")
    val shuffled = TextAnalysis.corpusShuffle(sampleDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(shuffled.map(_._1).toSet == sampledRows.map(_._1).toSet)
    assert(shuffled.map(_._2).sorted.toSeq == (1L to shuffled.length).toSeq)
    // 4. chunking the sample covers every sampled doc, tokens conserved
    val chunks = TextAnalysis.chunk(sampleDocs)
      .groupBy("doc_id").agg(max(col("start_tok") + col("n_tok")).as("end"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = sampleDocs.select(col("doc_id"),
        size(split(normText(col("text")), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == toks.keySet)
    chunks.foreach { case (id, end) =>
      assert(end == toks(id), s"doc $id: chunk tail reaches the last token")
    }
  }

  test("ta_bm25: hits contain a query term; scores positive and rank-ordered") {
    import graft.operators.TextAnalysis
    val terms = Set("scan", "merge", "window", "spark")
    val top = TextAnalysis.taBm25.fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(top.length == 10)
    assert(top.forall { case (_, nHit, s) => s > 0 && nHit >= 1 && nHit <= terms.size })
    // result arrives in rank order: score desc, doc_id tie-break
    top.sliding(2).foreach { case Array((d1, _, s1), (d2, _, s2)) =>
      assert(s1 > s2 || (s1 == s2 && d1 < d2))
    }
    val texts = Tables.documents(spark, sf0001)
      .filter(col("doc_id").isin(top.map(_._1): _*))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    top.foreach { case (id, _, _) =>
      assert(texts(id).split("\\s+").exists(terms), s"doc $id contains a query term")
    }
  }

  test("ta_mixture: probabilities normalize and follow sqrt up-sampling") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.taMixture.fn(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4) // round(6) per-source residue only
    assert(rows.map(_._4).sum <= 100000L)      // floor never over-allocates
    // temperature alpha=1/2: share ordering tracks n_docs ordering, and the
    // largest/smallest share ratio is sqrt of the doc-count ratio (to 6dp)
    val byN = rows.sortBy(_._2)
    byN.sliding(2).foreach { case Array((_, n1, p1, _), (_, n2, p2, _)) =>
      assert(n1 < n2 === p1 < p2 || n1 == n2 || p1 == p2)
    }
    val (min, max) = (byN.head, byN.last)
    assert(math.abs(max._3 / min._3 - math.sqrt(max._2.toDouble / min._2)) < 1e-3)
  }

  test("st_cdc_upsert: one live row per key, tombstoned keys vanish") {
    import graft.operators.ExtendedQueries
    val snap = ExtendedQueries.stCdcUpsert.fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(snap.map(_._1).distinct.length == snap.length, "one row per key")
    assert(snap.forall(_._3 != "error"), "no tombstone survives")
    // replay the log driver-side: latest by (ts_us, event_id) per user
    val raw = Tables.events(spark, sf0001)
    val log = raw.select(col("user_id"), Tables.tsUs(raw).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val latest = log.groupBy(_._1).map { case (u, es) => u -> es.maxBy(e => (e._2, e._3)) }
    latest.foreach { case (u, (_, _, eid, typ)) =>
      val row = snap.find(_._1 == u)
      if (typ == "error") assert(row.isEmpty, s"user $u tombstoned")
      else assert(row.exists(_._2 == eid), s"user $u latest event")
    }
  }

  test("sim_knn_graph: no self-edges, <=3 ranked neighbors, recall bounded by exact top-1") {
    import graft.operators.Similarity
    val edges = Similarity.simKnnGraph.fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(edges.nonEmpty)
    assert(edges.forall { case (q, n, c) => q != n && c >= -1.0001 && c <= 1.0001 })
    edges.groupBy(_._1).foreach { case (q, es) =>
      assert(es.length <= 3, s"node $q degree")
      es.sortBy(e => (-e._3, e._2)).zip(es).foreach { case (a, b) =>
        assert(a == b, s"node $q neighbors rank-ordered")
      }
    }
    // LSH graph can MISS neighbors but never invent a better-than-exact one:
    // each node's best graph cosine <= its exact best cosine over all
    // vectors (1e-5 slack: the graph scores quantized round(6) cosines,
    // the brute helper raw doubles)
    val emb = Tables.embeddings(spark, sf0001)
    val exactBest = Similarity.cosineTopK(emb, emb, k = 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Double]("cosine")).toMap
    edges.groupBy(_._1).foreach { case (q, es) =>
      exactBest.get(q).foreach(b => assert(es.map(_._3).max <= b + 1e-5, s"node $q"))
    }
  }

  test("sim_ivf_pq: routed to probe's cell, rerank cosines exact, never better than brute force") {
    import graft.operators.Similarity
    val res = Similarity.simIvfPq.fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.nonEmpty)
    assert(res.forall { case (q, n, c) => q != n && c >= -1.0001 && c <= 1.0001 })
    val (cellsDf, pcellsDf) = Similarity.ivfPqRouting(spark, sf0001)
    val cell = cellsDf.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probed = pcellsDf.collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getInt(1)).toSet }
    // IVF contract: every returned neighbor sits in one of its probe's
    // nprobe probed TRAINED cells (round 13: cells are Lloyd-trained, not
    // the fixture label column, and probing is multi-cell)
    res.foreach { case (q, n, _) =>
      assert(probed(q).contains(cell(n)), s"pair ($q,$n) outside probed cells")
    }
    // and each probe probes at most nprobe distinct existing cells
    probed.values.foreach(s =>
      assert(s.nonEmpty && s.size <= Similarity.IvfPqNprobe))
    // rerank contract: the emitted cosine is the EXACT pair cosine (the
    // ADC approximation only selects candidates, never scores the output)
    val emb = Tables.embeddings(spark, sf0001)
    val exact = Similarity.cosineTopK(emb, emb, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    res.foreach { case (q, n, c) =>
      exact.get((q, n)).foreach(e => assert(math.abs(c - e) <= 1e-5, s"pair ($q,$n)"))
    }
    // PQ can MISS a true neighbor but never invent a better-than-exact one
    val bestExact = exact.groupBy(_._1._1).map { case (q, m) => q -> m.values.max }
    res.groupBy(_._1).foreach { case (q, es) =>
      bestExact.get(q).foreach(b => assert(es.map(_._3).max <= b + 1e-5, s"probe $q"))
    }
  }
}
