package graft

import graft.operators.{EventAnalytics, GraphQueries, MediaCodec}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized differential tests: each new operator core against an
  * INDEPENDENT straight-line Scala reference on generated inputs — the
  * oracle gate pins values on the driver corpus; these pin the semantics on
  * inputs the corpus never exercises (ties, empty stages, dangling nodes,
  * degenerate dimensions). Fixed seeds, one Spark job per property. */
class RandomizedReferenceSpec extends SparkSpec {
  import spark.implicits._

  test("funnel fold equals the brute-force reference on random event logs") {
    val rnd = new Random(7)
    val types = Seq("signup", "view", "purchase")
    // heavy ts collisions on purpose: the strict-after semantics and the
    // (ts, event_id) sort tiebreak are where implementations drift
    val events = (1 to 4000).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(50).toLong * 1000L,
        i.toLong, types(rnd.nextInt(3)))
    }
    val got = EventAnalytics.funnel(
      events.toDF("user_id", "ts_us", "event_id", "event_type"))
      .collect()
      .map(r => (r.getLong(0), (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4))))
      .toMap
    val want = events.groupBy(_._1).flatMap { case (u, evs) =>
      var t1, t2, t3 = Option.empty[Long]
      evs.sortBy(e => (e._2, e._3)).foreach { case (_, ts, _, tp) =>
        if (t1.isEmpty && tp == "signup") t1 = Some(ts)
        else if (t2.isEmpty && tp == "view" && t1.exists(ts > _)) t2 = Some(ts)
        else if (t3.isEmpty && tp == "purchase" && t2.exists(ts > _)) t3 = Some(ts)
      }
      val stage = if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1
      t1.map(_ => u -> ((t1, t2, t3, stage)))
    }
    assert(got === want)
  }

  test("attribution sweep equals the brute-force reference on tie-heavy logs") {
    val rnd = new Random(11)
    val types = Seq("click", "view", "purchase", "error")
    // coarse ts grid for heavy collisions; small lookback so the 'direct'
    // fallback path fires; 'error' rows must be ignored entirely
    val lookback = 20000L
    val events = (1 to 5000).map { i =>
      (rnd.nextInt(30).toLong, rnd.nextInt(60).toLong * 1000L,
        i.toLong, types(rnd.nextInt(4)), rnd.nextInt(1000).toLong)
    }
    val got = EventAnalytics.attribution(
      events.toDF("user_id", "ts_us", "event_id", "event_type", "cents"),
      lookbackUs = lookback)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val byUser = events.groupBy(_._1)
    val credited = events.filter(_._4 == "purchase").map { case (u, ts, id, _, cents) =>
      // touches at the purchase's exact ts count; latest (ts, event_id) wins
      val touch = byUser(u)
        .filter(t => (t._4 == "click" || t._4 == "view") && t._2 <= ts)
        .sortBy(t => (t._2, t._3)).lastOption
      val ch = touch match {
        case Some(t) if ts - t._2 <= lookback => t._4
        case _ => "direct"
      }
      (ch, cents)
    }
    val want = credited.groupBy(_._1)
      .map { case (ch, xs) => ch -> ((xs.size.toLong, xs.map(_._2).sum)) }
    assert(got === want)
  }

  test("aHashBits equals the construction-formula reference on random media") {
    val rnd = new Random(11)
    (1 to 60).foreach { _ =>
      val w = 8 + rnd.nextInt(40)
      val h = 8 + rnd.nextInt(40)
      val seed = rnd.nextInt(100000).toLong
      val bmp = rnd.nextBoolean()
      val bytes =
        if (bmp) MediaCodec.encodeBmp(w, h, seed) else MediaCodec.encodePpm(w, h, seed)
      // reference: predict every pixel byte from the fill formula alone
      // (never reading the encoded bytes), like the oracle does
      def fill(i: Long): Long = ((seed + i) * 31) & 0xFF
      val rowSize = (3 * w + 3) / 4 * 4
      val hlen = 9 + w.toString.length + h.toString.length
      val sums = Array.fill(64)(0L); val n = Array.fill(64)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (0 until 3).map { c =>
          if (bmp) fill((h - 1 - y).toLong * rowSize + 3 * x + c)
          else fill(hlen.toLong + 3 * (y.toLong * w + x) + c)
        }.sum
        val k = (8 * y / h) * 8 + 8 * x / w
        sums(k) += g; n(k) += 3
      }
      val ts = sums.sum; val ta = n.sum
      val want = (0 until 64)
        .map(k => if (sums(k) * ta > ts * n(k)) '1' else '0').mkString
      assert(MediaCodec.aHashBits(bytes).contains(want), s"w=$w h=$h bmp=$bmp seed=$seed")
    }
  }

  test("pagerank: the rebased (>nestAbove) regime is bit-identical to the nested plan") {
    // VERDICT r15 #6: past nestAbove rounds each iteration is rebased on
    // its own RDD (constant plan depth); the rebase must change ONLY the
    // plan, never the exact-integer ranks
    val rnd = new Random(29)
    val n = 30
    val edges = (for {
      src <- 0 until n
      dst <- Seq.fill(2)(rnd.nextInt(n).toLong).distinct if dst != src
    } yield (src.toLong, dst)).distinct
    val edgesDf = edges.toDF("qid", "nid")
      .join(edges.toDF("qid", "x").groupBy("qid").agg(count(lit(1)).as("deg")), "qid")
      .select("qid", "nid", "deg")
    val nodesDf = (0 until n).map(_.toLong).toDF("vec_id")
    val iters = 8
    val rebased = GraphQueries.pagerank(edgesDf, nodesDf, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nested = GraphQueries.pagerank(edgesDf, nodesDf, iters, nestAbove = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rebased == nested)
  }

  test("pagerank core equals the integer reference on random graphs with dangling nodes") {
    val rnd = new Random(13)
    val n = 40
    val edges = (for {
      src <- 0 until n if rnd.nextInt(4) != 0 // ~25% dangling
      k = 1 + rnd.nextInt(3)
      dst <- Seq.fill(k)(rnd.nextInt(n).toLong).distinct if dst != src
    } yield (src.toLong, dst)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val edgesDf = edges.toDF("qid", "nid")
      .join(edges.toDF("qid", "x").groupBy("qid").agg(count(lit(1)).as("deg")), "qid")
      .select("qid", "nid", "deg")
    val nodesDf = (0 until n).map(_.toLong).toDF("vec_id")
    val got = GraphQueries.pagerank(edgesDf, nodesDf, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var r = Map((0 until n).map(i => i.toLong -> 1000000000L): _*)
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = (0 until n).map { i =>
        i.toLong -> (150000000L + (85L * contrib.getOrElse(i.toLong, 0L)) / 100L)
      }.toMap
    }
    assert(got === r)
  }

  test("commonNeighbors equals the brute-force set reference on random graphs") {
    val rnd = new Random(29)
    val n = 60
    // dense enough that >=2 shared neighbors actually occur, plus isolated
    // vertices and degree-1 leaves (never emitted, must not crash the joins)
    val edges = (for {
      _ <- 1 to 260
      u = rnd.nextInt(n).toLong; v = rnd.nextInt(n).toLong if u != v
    } yield (math.min(u, v), math.max(u, v))).distinct
    val got = GraphQueries.commonNeighbors(edges.toDF("u", "v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (a, es) => a -> es.map(_._2).toSet }
    val want = (for {
      (a, na) <- nbrs; (b, nb) <- nbrs if a < b
      inter = (na & nb).size.toLong if inter >= 2
      union = (na | nb).size.toLong
    } yield (a, b) -> ((inter, union, inter * 1000000L / union))).toMap
    assert(got === want)
  }

  test("localClustering equals the brute-force per-vertex triangle reference") {
    val rnd = new Random(31)
    val n = 50
    val edges = (for {
      _ <- 1 to 220
      u = rnd.nextInt(n).toLong; v = rnd.nextInt(n).toLong if u != v
    } yield (math.min(u, v), math.max(u, v))).distinct
    val e = edges.toDF("u", "v")
    val adj = e.select(col("u").as("n"), col("v").as("nbr"))
      .union(e.select(col("v").as("n"), col("u").as("nbr")))
    val got = GraphQueries.localClustering(adj, e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (a, es) => a -> es.map(_._2).toSet }
    val eset = edges.toSet
    val want = (for {
      (v, nv) <- nbrs if nv.size >= 2
      deg = nv.size.toLong
      tri = (for {
        x <- nv.toSeq; y <- nv.toSeq if x < y
        if eset((x, y))
      } yield 1).size.toLong
    } yield v -> ((deg, tri, tri * 2000000L / (deg * (deg - 1))))).toMap
    assert(got === want)
    assert(want.values.exists(_._2 > 0), "no triangles in the random graph — fixture degenerate")
    assert(want.values.exists(_._2 == 0), "every vertex closed — threshold not exercised")
  }
}
