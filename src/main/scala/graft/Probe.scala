package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc performance probe (dev tool, not a judged surface): times named
  * SparkEntry queries plus experimental variants side by side, several
  * iterations each, to attribute headline-bench time before changing the
  * declared queries. Usage:
  *   sbt 'runMain graft.Probe /root/testdata/sf0.1 o1_topk o1_cents ...'
  */
object Probe {
  /** Null-safe directory listing: `File.listFiles` returns null for a
    * missing directory, and a keeper-less first batch legitimately leaves
    * the store directory uncreated (ADVICE r15). */
  private def lsFiles(dir: java.io.File): Array[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)

  /** Recursive directory byte count (shared by every store-layout probe;
    * null-safe via [[lsFiles]]). */
  private def duBytes(f: java.io.File): Long =
    if (f.isDirectory) lsFiles(f).map(duBytes).sum else f.length()

  def variants(spark: SparkSession, d: String): Map[String, () => DataFrame] = {
    def li = Tables.lineitem(spark, d)
    def ord = Tables.orders(spark, d)
    Map(
      "scan_count" -> (() => li.select(count(lit(1)))),
      "scan_count_events" -> (() => Tables.events(spark, d).select(count(lit(1)))),
      "scan_count_docs" -> (() => Tables.documents(spark, d).select(count(lit(1)))),
      "scan_count_cust" -> (() => Tables.customer(spark, d).select(count(lit(1)))),
      "noop_local" -> (() => spark.range(1).select(count(lit(1)))),
      // Near-unique-key aggregation A/B (round 17, the s1 o1_topk gap):
      // when distinct keys per map task approach rows per map task, the
      // map-side partial agg reduces almost nothing — it pays a big random
      // hash probe per row AND still shuffles ~one row per input row. The
      // shuffle-first shape moves the same bytes but aggregates once,
      // where each reduce partition holds ndv/nPart keys (cache-resident).
      // the pre-r17 j4 shape: (n_name, r_name) folded into the build side,
      // group by the STRINGS — kept as the measured contrast for the
      // decorate-late rewrite (fast-hash-map getBytes copies per probe row)
      "j4_stringkey" -> (() => {
        val geo = graft.Persisted.of(spark, s"$d#cust_geo_probe") {
          Tables.customer(spark, d)
            .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
            .join(broadcast(Tables.region(spark, d)), col("n_regionkey") === col("r_regionkey"))
            .select(col("c_custkey"), col("n_name"), col("r_name"))
        }
        ord.join(geo, col("o_custkey") === col("c_custkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("order_cnt"),
            (sum((col("o_totalprice") * 100 + 0.5).cast("long")) / 100.0).as("revenue"))
      }),
      // q1 with the two CHAR(1) group keys aggregated as their byte codes
      // and re-materialized after — prices the generated fast hash map's
      // per-row UTF8String.getBytes copy (the round-17 j4 JFR finding) on
      // q1's string keys.
      "q1_asciikey" -> (() => li
        .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy(ascii(col("l_returnflag")).as("rf"), ascii(col("l_linestatus")).as("ls"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          (sum((col("l_extendedprice") * 100 + 0.5).cast("long")) / 100.0).as("sum_base_price"),
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000 + 0.5).cast("long")) / 10000.0).as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .select(char(col("rf")).as("l_returnflag"), char(col("ls")).as("l_linestatus"),
          col("sum_qty"), col("sum_base_price"), col("sum_disc_price"),
          col("avg_qty"), col("count_order"))),
      "o1_prepart" -> (() => li
        .select(col("l_partkey"),
          (col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
        .repartition(col("l_partkey"))
        .groupBy("l_partkey")
        .agg((sum(col("cents")) / 100.0).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey")).limit(10)),
      // single-stage scan+agg floors: what a bare pruned scan of each
      // headline fact costs — the denominator for "is the query plan-bound
      // or scan-bound" at each SF (round-17 sf1 attribution)
      "floor_orders_sum" -> (() => ord.agg(
        sum((col("o_totalprice") * 100 + 0.5).cast("long")))),
      "floor_li_sum" -> (() => li.agg(
        sum((col("l_extendedprice") * 100 + 0.5).cast("long")),
        sum(col("l_quantity")))),
      "floor_cust_sum" -> (() => Tables.customer(spark, d)
        .agg(sum(length(col("c_mktsegment"))), sum(col("c_nationkey")))),
      // window-sort twin of w_topk_per_key (the declared query uses the
      // bounded-state graft_top_k aggregate) — the A/B this operator
      // exists to win
      "w_topk_window" -> (() => {
        val t = Tables.events(spark, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            round(col("value") * 100).cast("long").as("cents"), col("event_id"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("cents").desc, col("event_id").desc)
        t.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
          .select(col("user_id"), col("rnk").cast("long").as("rnk"),
            col("cents"), col("event_id"))
      }),
      // auto-tier knn graph (the knee router) for the sf100 occupancy
      // validation — the declared queries pin fixed tiers
      "knn_auto" -> (() => operators.Similarity.knnGraphAuto(spark, d)),
      // auto-tier incremental image ingest (the knee router) for the
      // sf10 decade points — the declared queries pin fixed tiers
      "mm_image_inc_auto" -> (() => operators.Multimodal.mmImageIncrementalAuto(spark, d)),
      // wide∧cell knn graph — the post-knee routed point, A/B'd at sf10
      // against the unrouted wide tier (the declared routed query pins
      // the narrow tier for gate-SF-visible rows)
      "knn_routed_wide" -> (() => operators.Similarity.knnGraphRoutedWide(spark, d)),
      // constant-1000-probe incremental IVF-PQ batch — the rate-fixed
      // ingest decade point next to the declared probes-∝-corpus variant
      "ivfpq_inc_fixed" -> (() =>
        operators.Similarity.simIvfPqIncrementalFixed.fn(spark, d)),
      // knee-routed dedup-then-index (the declared query pins narrow)
      "dedup_index_auto" -> (() =>
        operators.Similarity.dedupThenIndexAuto(spark, d)),
      // recall gate for the knee-routed dedup-then-index point (VERDICT
      // r13 #6): exact top-3 among SURVIVORS for 20 sample probes vs the
      // auto-tier graph's edges — the same acceptance measure
      // sim_graph_recall applies to the routed graph, here attached to
      // the 9.3 s sf10 headline. Prints to stderr; run PROBE_ITERS=1.
      "dedup_index_recall" -> (() => dedupIndexRecall(spark, d)),
      // END-TO-END rolling IVF-PQ ingest (VERDICT r13 #5): drives
      // RollingIngest.ivfPqIngest over the corpus in PROBE_INGEST_BATCHES
      // micro-batches against frozen seed-trained books, printing
      // per-batch wall time, delta bytes vs cumulative store bytes, and
      // the live store layout (compaction amortization made visible).
      "ivfpq_ingest_e2e" -> (() => ivfPqIngestE2E(spark, d)),
      // RETRAIN-CADENCE rolling IVF-PQ ingest (VERDICT r15 #1): same
      // harness as ivfpq_ingest_e2e but through ivfPqIngestRouted with
      // PROBE_RETRAIN_STEPS grid steps (default 1 so sf-scale corpora
      // cross a retrain point mid-run). Prints per-batch wall (cost must
      // RE-FLATTEN after the retrain), the retrain events, and recall@3
      // vs brute force at BOTH operating points (bootstrap books vs final
      // books). Run PROBE_ITERS=1.
      "ivfpq_ingest_routed_e2e" -> (() => ivfPqIngestRoutedE2E(spark, d)),
      // END-TO-END composed dedup-then-index ingest (VERDICT r14 #4):
      // drives RollingIngest.dedupIndexIngest over the (doc ⋈ embedding)
      // corpus in PROBE_INGEST_BATCHES micro-batches, printing per-batch
      // wall time, keeper counts, and both stores' delta bytes — the
      // write ∝ batch contract for the two-store composition.
      "dedup_index_ingest_e2e" -> (() => dedupIndexIngestE2E(spark, d)),
      // TEXT-SIDE-ONLY rolling dedup ingest (VERDICT r15 #3's isolation
      // run): drives RollingIngest.dedupIngest — simhash store only, no
      // ANN side — so the narrow/wide signature tiers A/B without the
      // vector bands dominating the batch cost. PROBE_INGEST_WIDESIG=1
      // picks the 128-bit bootstrap tier. Run PROBE_ITERS=1.
      "dedup_ingest_e2e" -> (() => {
        implicit val sc = spark.sqlContext
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val nb = sys.env.getOrElse("PROBE_INGEST_BATCHES", "8").toInt
        val compactEvery = sys.env.getOrElse("PROBE_INGEST_COMPACT", "4").toInt
        val wideSig = sys.env.get("PROBE_INGEST_WIDESIG").contains("1")
        val src = Tables.documents(spark, d).select(col("doc_id"), col("text"))
        val idRow = src.agg(min("doc_id"), max("doc_id")).collect()(0)
        require(!idRow.isNullAt(0), s"$d: documents empty")
        val (minId, maxId) = (idRow.getLong(0), idRow.getLong(1))
        val step = (maxId - minId) / nb + 1
        val dir = java.nio.file.Files.createTempDirectory("graft_dd_e2e").toString + "/store"
        val in = MemoryStream[(Long, String)]
        var pairs = 0L
        System.err.println(s"[probe] dedup_ingest_e2e wide_sig=$wideSig")
        val q = streaming.RollingIngest.dedupIngest(
          in.toDF().toDF("doc_id", "text"), dir,
          compactEvery = compactEvery, wideSig = wideSig) { (p, _) =>
          pairs += p.count()
        }
        def newestDelta(): Long =
          lsFiles(new java.io.File(dir))
            .filter(f => f.isDirectory && f.getName.matches("d\\d+"))
            .sortBy(_.getName.drop(1).toLong).lastOption.map(duBytes).getOrElse(0L)
        try (0 until nb).foreach { i =>
          val lo = minId + i * step
          val b = src.filter(col("doc_id") >= lo && col("doc_id") < lo + step)
            .as[(Long, String)].collect()
          if (b.nonEmpty) {
            val tb = System.nanoTime()
            in.addData(b.toSeq); q.processAllAvailable()
            val dt = (System.nanoTime() - tb) / 1e9
            System.err.println(f"[probe] dedup_ingest_e2e batch=$i%d n=${b.length}%d " +
              f"dt=$dt%.2fs delta=${newestDelta()}%d " +
              s"dirs=${lsFiles(new java.io.File(dir)).map(_.getName).sorted.mkString(",")}")
          }
        } finally q.stop()
        System.err.println(s"[probe] dedup_ingest_e2e pairs=$pairs")
        spark.range(1).toDF("id")
      }),
      // FULL curation funnel (round 17): quality -> decontam -> near-dup
      // keeper gate -> quantized index in one loop (curatedIngest), the
      // mod-50 documents slice standing in for the held-out benchmark
      // (the ta_decontam fixture convention). Per batch: latency and the
      // cumulative funnel account. The gates must not bend the composed
      // pipeline's per-batch slope — they are scan-stage work ∝ batch.
      // Run PROBE_ITERS=1.
      "curated_ingest_e2e" -> (() => {
        implicit val sc = spark.sqlContext
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val nb = sys.env.getOrElse("PROBE_INGEST_BATCHES", "8").toInt
        val compactEvery = sys.env.getOrElse("PROBE_INGEST_COMPACT", "4").toInt
        val all = Tables.documents(spark, d).select(col("doc_id"), col("text"))
        val bench = all.filter(col("doc_id") % 50 === 0)
        val src = all.filter(col("doc_id") % 50 =!= 0)
          .join(Tables.embeddings(spark, d)
            .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
        val idRow = src.agg(min("doc_id"), max("doc_id")).collect()(0)
        require(!idRow.isNullAt(0), s"$d: documents-embeddings join is empty")
        val (minId, maxId) = (idRow.getLong(0), idRow.getLong(1))
        val step = (maxId - minId) / nb + 1
        val root = java.nio.file.Files.createTempDirectory("graft_cur_e2e").toString
        val (dd, ann) = (root + "/dedup", root + "/ann")
        val (_, coarse, books) = operators.Similarity.ivfPqTrainRouted(
          src.filter(col("doc_id") < minId + step)
            .select(col("doc_id").as("vec_id"), col("embedding")))
        var (qualityN, decontamN, dedupN, keptN, emitted) = (0L, 0L, 0L, 0L, 0L)
        val in = MemoryStream[(Long, String, Seq[Float])]
        val q = streaming.RollingIngest.curatedIngest(
          in.toDF().toDF("doc_id", "text", "embedding"), bench, dd, ann,
          coarse, books, compactEvery = compactEvery,
          curationSink = (c, _) => {
            val byStage = c.groupBy("stage").count().collect()
              .map(r => r.getString(0) -> r.getLong(1)).toMap
            qualityN += byStage.getOrElse("quality", 0L)
            decontamN += byStage.getOrElse("decontam", 0L)
          },
          dedupSink = (dec, _) => {
            dedupN += dec.filter(!col("kept")).count()
            keptN += dec.filter(col("kept")).count()
          }) { (nbrs, _) => emitted += nbrs.count() }
        try (0 until nb).foreach { i =>
          val lo = minId + i * step
          val b = src.filter(col("doc_id") >= lo && col("doc_id") < lo + step)
            .as[(Long, String, Seq[Float])].collect() // driver memory ∝ batch
          if (b.nonEmpty) {
            val tb = System.nanoTime()
            in.addData(b.toSeq); q.processAllAvailable()
            val dt = (System.nanoTime() - tb) / 1e9
            System.err.println(f"[probe] curated_ingest_e2e batch=$i%d " +
              f"n=${b.length}%d dt=$dt%.2fs funnel: quality=$qualityN%d " +
              f"decontam=$decontamN%d near_dup=$dedupN%d kept=$keptN%d")
          }
        } finally q.stop()
        System.err.println(s"[probe] curated_ingest_e2e emitted=$emitted " +
          s"quality=$qualityN decontam=$decontamN near_dup=$dedupN kept=$keptN")
        spark.range(1).toDF("id")
      }),
      // Pinned snapshots (round 17): the retention + read cost of a pin
      // at scale. dedupIngest over the corpus in PROBE_INGEST_BATCHES
      // batches, pinning after the midpoint batch and letting later
      // folds supersede the pinned elements; prints per-batch dt (the
      // pin must not bend the slope — the write path is unchanged), the
      // bytes retained purely for the pin once the live store has moved
      // past it, snapshot-vs-live read wall, and the bytes reclaimed by
      // unpin + vacuum. Run PROBE_ITERS=1.
      "snapshot_pin" -> (() => {
        implicit val sc = spark.sqlContext
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val nb = sys.env.getOrElse("PROBE_INGEST_BATCHES", "8").toInt
        val compactEvery = sys.env.getOrElse("PROBE_INGEST_COMPACT", "4").toInt
        val src = Tables.documents(spark, d).select(col("doc_id"), col("text"))
        val idRow = src.agg(min("doc_id"), max("doc_id")).collect()(0)
        require(!idRow.isNullAt(0), s"$d: documents empty")
        val (minId, maxId) = (idRow.getLong(0), idRow.getLong(1))
        val step = (maxId - minId) / nb + 1
        val dir = java.nio.file.Files.createTempDirectory("graft_snap_p").toString + "/store"
        val in = MemoryStream[(Long, String)]
        val q = streaming.RollingIngest.dedupIngest(
          in.toDF().toDF("doc_id", "text"), dir,
          compactEvery = compactEvery) { (p, _) => p.count(): Unit }
        def duStore(): Long = duBytes(new java.io.File(dir))
        var manifest = Seq.empty[String]
        try (0 until nb).foreach { i =>
          val lo = minId + i * step
          val b = src.filter(col("doc_id") >= lo && col("doc_id") < lo + step)
            .as[(Long, String)].collect()
          if (b.nonEmpty) {
            val tb = System.nanoTime()
            in.addData(b.toSeq); q.processAllAvailable()
            val dt = (System.nanoTime() - tb) / 1e9
            System.err.println(f"[probe] snapshot_pin batch=$i%d n=${b.length}%d " +
              f"dt=$dt%.2fs store_bytes=${duStore()}%d" +
              (if (manifest.nonEmpty) " (pinned)" else ""))
            // first non-empty batch at-or-past the midpoint pins (an
            // exact-midpoint match misses entirely at nb=1 or when the
            // id-interval batching leaves that batch empty)
            if (manifest.isEmpty && i >= nb / 2 - 1) {
              manifest = streaming.RollingIngest.pinSnapshot(spark, dir, "probe")
              System.err.println(s"[probe] snapshot_pin PIN after batch $i: " +
                s"${manifest.mkString(",")}")
            }
          }
        } finally q.stop()
        if (manifest.isEmpty)
          System.err.println("[probe] snapshot_pin no batch reached the " +
            "pin point (empty corpus?) — skipping the snapshot reads")
        else {
          // bytes retained purely for the pin = pinned elements no longer
          // in the live view (folded/superseded, spared by the pin guard)
          val els = lsFiles(new java.io.File(dir)).filter(_.isDirectory)
          val baseVer = els.map(_.getName).flatMap(n =>
            streaming.RollingIngest.parseEl(n))
            .filter(_._1 == "base").map(_._2).maxOption.getOrElse(-1L)
          val liveNames = els.map(_.getName).flatMap(n =>
            streaming.RollingIngest.parseEl(n).map(p => (n, p))).collect {
            case (n, ("base", v)) if v == baseVer => n
            case (n, ("d", v)) if v > baseVer     => n
            case (n, ("tier", _))                 => n
          }.toSet
          val retained = manifest.filterNot(liveNames)
          val retainedBytes = retained.map(n => duBytes(new java.io.File(dir, n))).sum
          System.err.println(s"[probe] snapshot_pin retained=${retained.mkString(",")} " +
            s"retained_bytes=$retainedBytes of store_bytes=${duStore()}")
          def timed[T](what: String)(f: => T): T = {
            val t0 = System.nanoTime()
            val r = f
            System.err.println(f"[probe] snapshot_pin $what%s " +
              f"wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
            r
          }
          val snapN = timed("snapshot_read")(
            streaming.RollingIngest.snapshotDedupView(spark, dir, "probe")
              .get.count())
          val ddSchema = operators.Dedup.simhash64Bands(
            Seq.empty[(Long, String)].toDF("doc_id", "text")).schema
          val liveN = timed("live_read")(
            streaming.RollingIngest.storeView(spark, dir, ddSchema, "doc_id")
              .get.count())
          System.err.println(s"[probe] snapshot_pin snap_rows=$snapN live_rows=$liveN")
          val before = duStore()
          streaming.RollingIngest.unpinSnapshot(spark, dir, "probe")
          streaming.RollingIngest.vacuumStore(spark, dir)
          System.err.println(s"[probe] snapshot_pin vacuum reclaimed=" +
            s"${before - duStore()} bytes; store_bytes=${duStore()}")
        }
        spark.range(1).toDF("id")
      }),
      // Rolling connected components (round 17): per-batch cost vs store
      // census, and the BRIDGE event — one edge joining two grown
      // components must cost one ledger row, not a relabel of the larger
      // side. PROBE_CC_BATCHES chain-edge batches of PROBE_CC_N edges each
      // build two disjoint chains; the final batch is a single bridging
      // edge. Prints per-batch wall + delta bytes, then the bridge's.
      "components_ingest_e2e" -> (() => {
        implicit val sc = spark.sqlContext
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val nb = sys.env.getOrElse("PROBE_CC_BATCHES", "6").toInt
        val n = sys.env.getOrElse("PROBE_CC_N", "100000").toLong
        val compactEvery = sys.env.getOrElse("PROBE_CC_COMPACT", "4").toInt
        val dir = java.nio.file.Files.createTempDirectory("graft_cc_e2e").toString + "/store"
        val in = MemoryStream[(Long, Long)]
        val q = streaming.RollingIngest.componentsIngest(
          in.toDF().toDF("u", "v"), dir, compactEvery) { (_, _) => () }
        def newestDelta(): Long =
          lsFiles(new java.io.File(dir))
            .filter(f => f.isDirectory && f.getName.matches("d\\d+"))
            .sortBy(_.getName.drop(1).toLong).lastOption.map(duBytes).getOrElse(0L)
        // two chains: evens extend from node 2, odds from node 1+2k+1 —
        // disjoint until the bridge. Each batch appends n/nb edges to BOTH.
        val per = n / nb
        try {
          (0 until nb).foreach { i =>
            val b = (0L until per).flatMap { j =>
              val k = i * per + j
              Seq((2 * k, 2 * k + 2), (2 * k + 1, 2 * k + 3))
            }
            val tb = System.nanoTime()
            in.addData(b); q.processAllAvailable()
            val dt = (System.nanoTime() - tb) / 1e9
            System.err.println(f"[probe] cc_e2e batch=$i%d edges=${b.size}%d " +
              f"dt=$dt%.2fs delta=${newestDelta()}%d")
          }
          // the BRIDGE: both components hold ~n nodes each by now
          val tb = System.nanoTime()
          in.addData(Seq((0L, 1L))); q.processAllAvailable()
          val dt = (System.nanoTime() - tb) / 1e9
          System.err.println(f"[probe] cc_e2e BRIDGE dt=$dt%.2fs " +
            f"delta=${newestDelta()}%d " +
            s"dirs=${lsFiles(new java.io.File(dir)).map(_.getName).sorted.mkString(",")}")
          // verify: a sampled node from each side resolves to the min (0)
          val got = streaming.RollingIngest.componentLabels(spark, dir).get
            .filter(col("node").isin(0L, 1L, 2 * n - 2, 2 * (n / 2) + 1))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          System.err.println(s"[probe] cc_e2e sampled_labels=$got")
          require(got.values.forall(_ == 0L), s"bridge must merge to min id: $got")
        } finally q.stop()
        spark.range(1).toDF("id")
      }),
      // kc-ROUTED batch IVF-PQ (VERDICT r14 #2): the √n-cell twin of the
      // declared sim_ivf_pq; PROBE_KC forces a fixed kc for the A/B
      // against the fixture constant.
      "ivfpq_auto" -> (() => operators.Similarity.ivfPqAuto(spark, d,
        kcOverride = sys.env.get("PROBE_KC").map(_.toInt))),
      // FORCED-distributed connected components (VERDICT r14 #3): the only
      // components path that exists at 100 TB, timed on the production
      // 64-bit near-dup edge set vs the driver union-find shortcut every
      // gate-SF edge set normally routes to. Prints edge count, both wall
      // clocks, and rounds-to-converge. Run PROBE_ITERS=1.
      "components_forced_dist" -> (() => {
        val edges = operators.Dedup.simhashNearDupPairs(
          operators.Dedup.simhash64BandsRelation(spark, d))
          .select("doc_a", "doc_b").cache()
        val n = edges.count()
        val t0 = System.nanoTime()
        val nDrv = operators.Dedup.labelPropagation(edges).count()
        val tDrv = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val nDist = operators.Dedup.labelPropagationDistributed(edges).count()
        val tDist = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val nStar = operators.Dedup.starContraction(edges).count()
        val tStar = (System.nanoTime() - t2) / 1e9
        edges.unpersist()
        System.err.println(f"[probe] components_forced_dist edges=$n%d " +
          f"driver_s=$tDrv%.2f driver_labels=$nDrv%d dist_s=$tDist%.2f " +
          f"dist_labels=$nDist%d rounds=${operators.Dedup.lastDistributedRounds.get()}%d " +
          f"star_s=$tStar%.2f star_labels=$nStar%d star_rounds=${operators.Dedup.lastStarRounds.get()}%d")
        spark.range(1).toDF("id")
      }),
      // ABOVE-GATE components A/B: the corpus edge sets all sit under the
      // 1M driver gate, so this builds a deterministic PROBE_COMPONENTS_EDGES
      // synthetic set (default 2M: half 10-vertex chains — diameter stress,
      // half 101-vertex stars — skew stress) and times the driver path
      // (gate raised) against the distributed path (gate 0) where the
      // DEFAULT gate would genuinely route distributed. Run PROBE_ITERS=1.
      "components_above_gate" -> (() => {
        val n = sys.env.getOrElse("PROBE_COMPONENTS_EDGES", "2000000").toLong
        val half = n / 2
        // chains: blocks of 10 consecutive vertices, edges j -> j+1
        // (div, not '/': Spark's '/' is double division even on longs)
        val chain = spark.range(half).select(
          expr("id div 9 * 10 + id % 9").as("doc_a"),
          expr("id div 9 * 10 + id % 9 + 1").as("doc_b"))
        // stars: vertex base+s*101 is the hub of 100 leaves (id-offset so
        // the two families never share vertices)
        val star = spark.range(half).select(
          expr("1000000000L + id div 100 * 101").as("doc_a"),
          expr("1000000000L + id div 100 * 101 + 1 + id % 100").as("doc_b"))
        val edges = chain.unionByName(star).cache()
        val m = edges.count()
        val t0 = System.nanoTime()
        val nDrv = operators.Dedup.labelPropagation(edges, driverMaxEdges = m + 1).count()
        val tDrv = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val nDist = operators.Dedup.labelPropagationDistributed(edges).count()
        val tDist = (System.nanoTime() - t1) / 1e9
        // the gate's above-threshold strategy (star contraction) — what
        // labelPropagation(driverMaxEdges = 0) actually runs now
        val t2 = System.nanoTime()
        val nStar = operators.Dedup.labelPropagation(edges, driverMaxEdges = 0L).count()
        val tStar = (System.nanoTime() - t2) / 1e9
        edges.unpersist()
        System.err.println(f"[probe] components_above_gate edges=$m%d " +
          f"driver_s=$tDrv%.2f driver_labels=$nDrv%d dist_s=$tDist%.2f " +
          f"dist_labels=$nDist%d rounds=${operators.Dedup.lastDistributedRounds.get()}%d " +
          f"star_s=$tStar%.2f star_labels=$nStar%d star_rounds=${operators.Dedup.lastStarRounds.get()}%d")
        spark.range(1).toDF("id")
      }),
      // ONE LONG CHAIN (VERDICT r15 #7): the shape where min-label
      // propagation needs O(diameter) rounds — a PROBE_CHAIN_EDGES chain
      // (default 2M edges = diameter 2M) is unrunnable under min-label
      // (2M shuffle rounds) but converges in ~2·log2(n) star-contraction
      // rounds. Prints star rounds + wall; min-label is A/B'd only up to
      // PROBE_CHAIN_MINLABEL_EDGES (default 128) where diameter-many
      // rounds are still feasible. Run PROBE_ITERS=1.
      "components_chain" -> (() => {
        val n = sys.env.getOrElse("PROBE_CHAIN_EDGES", "2000000").toLong
        val chain = spark.range(n).select(col("id").as("doc_a"),
          (col("id") + 1).as("doc_b")).cache()
        val m = chain.count()
        val t0 = System.nanoTime()
        val nStar = operators.Dedup.starContraction(chain).count()
        val tStar = (System.nanoTime() - t0) / 1e9
        val starRounds = operators.Dedup.lastStarRounds.get()
        chain.unpersist()
        val mlN = sys.env.getOrElse("PROBE_CHAIN_MINLABEL_EDGES", "128").toLong
        val small = spark.range(mlN).select(col("id").as("doc_a"),
          (col("id") + 1).as("doc_b")).cache()
        small.count()
        val t1 = System.nanoTime()
        val nMl = operators.Dedup.labelPropagationDistributed(small).count()
        val tMl = (System.nanoTime() - t1) / 1e9
        small.unpersist()
        System.err.println(f"[probe] components_chain edges=$m%d " +
          f"star_s=$tStar%.2f star_labels=$nStar%d star_rounds=$starRounds%d " +
          f"log2_bound=${(math.log(m.toDouble + 1) / math.log(2.0)).ceil.toInt}%d " +
          f"minlabel_edges=$mlN%d minlabel_s=$tMl%.2f minlabel_labels=$nMl%d " +
          f"minlabel_rounds=${operators.Dedup.lastDistributedRounds.get()}%d")
        spark.range(1).toDF("id")
      }),
      // SCRUB REASSEMBLY long-doc probe (VERDICT r15 #4): per-doc cost of
      // the two-pointer native scrub vs the old filter/array_contains
      // formulation on synthetic documents of growing length at >=80%
      // coverage — under the old quadratic the per-doc cost grows
      // superlinearly in document length; the fix must be ~linear.
      "scrub_longdoc" -> (() => {
        import org.apache.spark.sql.functions.{array_sort => asort}
        for (nw <- Seq(2500, 5000, 10000, 20000, 40000)) {
          val docs = spark.range(32).select(col("id").as("doc_id"),
            expr(s"transform(sequence(1, $nw), j -> concat('w', j % 97))").as("ws"),
            expr(s"array_sort(transform(filter(sequence(1, $nw), j -> j % 5 != 0), j -> CAST(j AS INT)))").as("cps"))
            .cache()
          docs.count()
          val t0 = System.nanoTime()
          val a = docs.select(graft.plans.scrubWords(col("ws"), asort(col("cps"))).as("s"))
            .agg(sum(length(col("s")))).collect()(0).getLong(0)
          val tNative = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val b = docs.select(
              expr("concat_ws(' ', filter(ws, (w, i) -> NOT array_contains(cps, i + 1)))").as("s"))
            .agg(sum(length(col("s")))).collect()(0).getLong(0)
          val tDecl = (System.nanoTime() - t1) / 1e9
          docs.unpersist()
          System.err.println(f"[probe] scrub_longdoc words=$nw%d covered_pct=80 " +
            f"native_s=$tNative%.3f declarative_s=$tDecl%.3f equal=${a == b}%b")
        }
        spark.range(1).toDF("id")
      }),
      // PAGERANK iteration-budget probe (VERDICT r15 #6): run the core at
      // PROBE_PAGERANK_ITERS (default 20) over the corpus adjacency and
      // print per-round wall — flat per-round cost proves the rebased
      // regime killed the nested-plan superlinearity in this loop shape.
      "pagerank_iters" -> (() => {
        val iters = sys.env.getOrElse("PROBE_PAGERANK_ITERS", "20").toInt
        val e = operators.Similarity.knnEdgesRelation(spark, d).select(col("qid"), col("nid"))
        val edges = e.join(e.groupBy("qid").agg(count(lit(1)).as("deg")), "qid").cache()
        edges.count()
        val nodes = Tables.embeddings(spark, d).select("vec_id").cache()
        nodes.count()
        // cumulative timing at increasing budgets; flat per_round across
        // the three points is the superlinearity check. Each point is
        // clamped to >= 1 (ADVICE r16: iters < 4 made the first point
        // k = 0 — pagerank returns the initial ranks and dt/k prints
        // Infinity); distinct keeps a tiny budget from timing one point
        // three times.
        for (k <- Seq(math.max(1, iters / 4), math.max(1, iters / 2),
            math.max(1, iters)).distinct) {
          val t0 = System.nanoTime()
          val cnt = operators.GraphQueries.pagerank(edges, nodes, k).count()
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[probe] pagerank_iters iters=$k%d total_s=$dt%.2f " +
            f"per_round_s=${dt / k}%.3f rows=$cnt%d")
        }
        edges.unpersist(); nodes.unpersist()
        spark.range(1).toDF("id")
      }),
      // BPE merge-budget stress (VERDICT r14 #5): run the memoized training
      // loop at PROBE_BPE_MERGES rounds (default 64) and print the
      // per-round cost law — the driver-loop shape (one vocab-sized
      // shuffle per round) is only proven linear-per-round by measuring
      // past the declared 5-merge budget. Run PROBE_ITERS=1 (the memo
      // returns instantly on re-run, with no round timings).
      "bpe_merge_stress" -> (() => {
        val n = sys.env.getOrElse("PROBE_BPE_MERGES", "64").toInt
        val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
        operators.TextAnalysis.bpeMerges(spark, d, n,
          (k, s) => rounds += ((k, s)))
        if (rounds.nonEmpty) {
          val buckets = rounds.grouped(8).map(g =>
            f"${g.head._1}%d-${g.last._1}%d:${g.map(_._2).sum / g.size}%.3f").mkString(" ")
          System.err.println(f"[probe] bpe_merge_stress n=$n%d " +
            f"total_s=${rounds.map(_._2).sum}%.2f per_round_avg_s=[$buckets]")
        } else System.err.println(
          "[probe] bpe_merge_stress: memoized run returned no round timings")
        spark.range(1).toDF("id")
      }),
      // TEXT-SIDE OCCUPANCY KNEE, forced (VERDICT r16 #7): the round-7 law
      // said narrow 16-bit band buckets saturate (~n/65536 docs/bucket)
      // while wide 32-bit buckets stay sparse to n ~ 4e9 — but the narrow
      // blowup had only ever been PROJECTED on this engine (sf10 = 500k
      // docs measures tier-independent). Synthesize a diverse corpus at
      // census points past the knee and measure the production incremental
      // probe (simhashNearDupIncrementalBands, fixed 100k-doc batch) per
      // tier: narrow per-batch cost must bend with census, wide stay flat.
      // Doc texts are 24 words drawn uniformly from a 200k vocab keyed on
      // xxhash64(doc_id, pos) — near-random signatures, so band occupancy
      // is the uniform n/buckets the law predicts; everything stays
      // distributed (no driver collect).
      "dedup_tier_knee" -> (() => {
        import graft.operators.Dedup
        val points = sys.env.getOrElse("PROBE_KNEE_DOCS", "250000,1000000,4000000")
          .split(',').map(_.trim.toLong).toSeq
        val batchN = sys.env.getOrElse("PROBE_KNEE_BATCH", "100000").toLong
        def synth(lo: Long, hi: Long) = spark.range(lo, hi)
          .select(col("id").as("doc_id"),
            expr("concat_ws(' ', transform(sequence(1, 24), " +
              "j -> concat('w', pmod(xxhash64(id, j), 200000))))").as("text"))
        val tiers = Seq(
          ("narrow", Dedup.simhash64Bands _, Seq("simhash")),
          ("wide", Dedup.simhash128Bands _, Seq("sig_lo", "sig_hi")))
        for (n <- points; (label, bandsOf, sigCols) <- tiers) {
          val store = bandsOf(synth(0, n)).persist()
          val tS0 = System.nanoTime()
          store.count()
          val sketchS = (System.nanoTime() - tS0) / 1e9
          val batch = bandsOf(synth(n, n + batchN)).persist()
          batch.count()
          val t0 = System.nanoTime()
          val pairs = Dedup.simhashNearDupIncrementalBands(
            store, batch, 3, sigCols).count()
          val dt = (System.nanoTime() - t0) / 1e9
          store.unpersist(); batch.unpersist()
          System.err.println(f"[probe] dedup_tier_knee census=$n%d tier=$label%s " +
            f"batch=$batchN%d probe_s=$dt%.2f pairs=$pairs%d sketch_s=$sketchS%.2f " +
            f"occupancy=${n.toDouble / (if (label == "narrow") 65536 else 4294967296L)}%.3f")
        }
        spark.range(1).toDF("id")
      }),
      // TIER-MIGRATION decade harness (VERDICT r16 #1): bootstrap the
      // rolling dedup store NARROW on the same synthetic corpus past the
      // knee, watch per-batch cost climb with the store census, run the
      // offline migrateDedupTier event (timed; keeper-set equality
      // checked), resume the stream on its checkpoint, and watch
      // per-batch cost re-flatten at the wide tier's occupancy.
      "dedup_tier_migration_e2e" -> (() => {
        import graft.operators.Dedup
        implicit val sc = spark.sqlContext
        import spark.implicits._
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val nb = sys.env.getOrElse("PROBE_MIG_BATCHES", "6").toInt
        val batchN = sys.env.getOrElse("PROBE_MIG_BATCH", "250000").toLong
        val postB = sys.env.getOrElse("PROBE_MIG_POST", "2").toInt
        def words(id: Long): String =
          (1 to 24).map(j => "w" + Math.floorMod(
            scala.util.hashing.MurmurHash3.productHash((id, j)), 200000)).mkString(" ")
        val root = java.nio.file.Files.createTempDirectory("graft_mig_e2e").toString
        val (dir, cp) = (root + "/store", root + "/cp")
        var pairs = 0L
        val in = MemoryStream[(Long, String)]
        def start() = streaming.RollingIngest.dedupIngest(
          in.toDF().toDF("doc_id", "text"), dir,
          configure = _.option("checkpointLocation", cp)) { (p, _) =>
          pairs += p.count()
        }
        var q = start()
        def runBatch(i: Int, phase: String): Unit = {
          val lo = i * batchN
          val b = (lo until lo + batchN).map(id => (id, words(id)))
          val t0 = System.nanoTime()
          in.addData(b); q.processAllAvailable()
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[probe] dedup_tier_migration_e2e batch=$i%d " +
            f"phase=$phase%s census=${(i + 1) * batchN}%d dt=$dt%.2fs")
        }
        try {
          (0 until nb).foreach(runBatch(_, "narrow"))
          q.stop()
          // the offline event: corpus re-read + wide re-sketch + swap
          val narrowSchema = Dedup.simhash64Bands(
            Seq.empty[(Long, String)].toDF("doc_id", "text")).schema
          val before = streaming.RollingIngest
            .storeView(spark, dir, narrowSchema, "doc_id").get
            .select("doc_id").distinct().count()
          val corpus = spark.range(0, nb * batchN).select(col("id").as("doc_id"))
            .as[Long].map(id => (id, words(id))).toDF("doc_id", "text")
          val tM0 = System.nanoTime()
          streaming.RollingIngest.migrateDedupTier(spark, dir, corpus)
          val migS = (System.nanoTime() - tM0) / 1e9
          val wideSchema = Dedup.simhash128Bands(
            Seq.empty[(Long, String)].toDF("doc_id", "text")).schema
          val after = streaming.RollingIngest
            .storeView(spark, dir, wideSchema, "doc_id").get
            .select("doc_id").distinct().count()
          System.err.println(f"[probe] dedup_tier_migration_e2e MIGRATE " +
            f"dt=$migS%.2fs ids_before=$before%d ids_after=$after%d " +
            f"equal=${before == after}%b")
          q = start()
          (nb until nb + postB).foreach(runBatch(_, "wide"))
        } finally q.stop()
        System.err.println(s"[probe] dedup_tier_migration_e2e pairs=$pairs")
        spark.range(1).toDF("id")
      }),
      // gr_common_neighbors drill-down: the persisted undirected edge
      // store alone, then the wedge join alone — attribution of the
      // 2.2 s bench time (cache-read vs wedge vs degree-join assembly)
      "gr_edges_only" -> (() => operators.GraphQueries.undirectedKnnStore(spark, d)),
      // frame-family drill-down: the persisted frame store alone, then the
      // df-gated relation alone — attribution of mm_frame_overlap's cost
      "mm_fr_only" -> (() => operators.Multimodal.framesRelation(spark, d)),
      "mm_kept_only" -> (() => operators.Multimodal.keptFramesStore(spark, d)),
      "gr_wedge_only" -> (() => {
        val e = operators.GraphQueries.undirectedKnnStore(spark, d)
        val adj = e.select(col("u").as("n"), col("v").as("nbr"))
          .union(e.select(col("v").as("n"), col("u").as("nbr")))
        adj.select(col("n"), col("nbr").as("x"))
          .join(adj.select(col("n"), col("nbr").as("y")), "n")
          .filter(col("x") < col("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("inter_n"))
          .filter(col("inter_n") >= 2)
      }),
      // cell∧band composition census: distinct candidate pairs with and
      // without the cell key, plus edge retention of the routed graph vs
      // its unrouted tier — the numbers the routed-graph A/B records.
      // Run once per tier with PROBE_ITERS=1; the counts print to stderr.
      "knn_routed_census_wide" -> (() => knnRoutedCensus(spark, d, wide = true)),
      "knn_routed_census_narrow" -> (() => knnRoutedCensus(spark, d, wide = false)),
      // routed occupancy census (run with PROBE_SHOW=1): raw candidate
      // pair volume Σ n(n−1)/2 per tier, bucketed by (band, value) vs
      // (band, value, cell) — bucket-count arithmetic only, no pair join
      // materialized, so it runs on the 2M-distinct-vector sf100e fixture
      // where the r12 occupancy census measured the band ladder's end.
      // This is the composition's honest (perturbed, non-replica) A/B.
      "knn_routed_occupancy" -> (() => {
        def stats(bands: DataFrame, tier: String, routed: Boolean) = {
          val key = Seq("band_id", "band_val") ++ (if (routed) Seq("cell") else Nil)
          bands.groupBy(key.map(col): _*).agg(count(lit(1)).as("n"))
            .agg(lit(tier).as("tier"), lit(if (routed) "cell" else "-").as("routed"),
              count(lit(1)).as("n_buckets"),
              sum(col("n") * (col("n") - 1) / 2).cast("long").as("cand_pairs"),
              max("n").as("max_bucket"))
        }
        val narrow = operators.Similarity.narrowBandsRelation(spark, d)
        val wide = operators.Similarity.wideBandsRelation(spark, d)
        Seq(false, true).map { routed =>
          stats(narrow, "narrow8", routed)
            .unionByName(stats(wide, "wide16", routed))
        }.reduce(_ unionByName _)
      }),
      // the CELL-COUNT lever: same wide-tier bucket census with a
      // kc-parameterized trained coarse book (PROBE_KC, default 64) —
      // validates that raising kc (production: ~sqrt(n)) cuts the
      // cross-base collision mass the 8 fixture cells cannot
      "knn_routed_occupancy_kc" -> (() => {
        val kc = sys.env.getOrElse("PROBE_KC", "64").toInt
        val cells = operators.Similarity.coarseCellsScaled(spark, d, kc)
          .select("vec_id", "cell", "q", "norm")
        val bands = operators.Similarity.hyperBandsWideOfQNorm(cells)
        bands.groupBy("band_id", "band_val", "cell").agg(count(lit(1)).as("n"))
          .agg(lit(s"wide16xkc$kc").as("tier"), count(lit(1)).as("n_buckets"),
            sum(col("n") * (col("n") - 1) / 2).cast("long").as("cand_pairs"),
            max("n").as("max_bucket"))
      }),
      // band-occupancy census across tier widths (run with PROBE_SHOW=1):
      // per tier, bucket count, candidate-pair volume Σ n(n−1)/2, the max
      // bucket, and avg bucket-mates per vector — the raw quantities the
      // KnnBandKnee occupancy rule predicts. wide32 is the NEXT rung
      // (2 bands x 32 bits off the same 64-lane sketch), built here to
      // measure where its buckets are still empty.
      "knn_band_occupancy" -> (() => {
        val r = operators.Similarity.qnormRelation(spark, d).select("vec_id", "q")
        def stats(bands: DataFrame, tier: String) =
          bands.groupBy("band_id", "band_val").agg(count(lit(1)).as("n"))
            .agg(lit(tier).as("tier"), count(lit(1)).as("n_buckets"),
              sum(col("n") * (col("n") - 1) / 2).cast("long").as("cand_pairs"),
              max("n").as("max_bucket"),
              // n·(n−1), not n²: a vector is not its own bucket-mate — in
              // an empty tier this must read ~0, not 1 (code-review r12)
              round(sum(col("n") * (col("n") - 1)) / sum(col("n")), 2).as("avg_mates"))
        def bandW(q: org.apache.spark.sql.Column, b: Int,
                  width: Int): org.apache.spark.sql.Column =
          (0 until width).map { t =>
            when(plans.dotQNative(q,
              typedlit(operators.Similarity.hyperplaneW(width * b + t))) >= 0,
              lit(1L << t)).otherwise(lit(0L))
          }.reduce(_ + _)
        val wide32 = r.select(col("vec_id") +: (0 until 2).map(b =>
            bandW(col("q"), b, 32).as(s"b$b")): _*)
          .select(col("vec_id"), explode(array((0 until 2).map(b =>
            struct(lit(b).as("band_id"), col(s"b$b").as("band_val"))): _*)).as("band"))
          .select(col("vec_id"), col("band.band_id"), col("band.band_val"))
        stats(operators.Similarity.hyperBandsOfQNorm(r), "narrow8")
          .unionByName(stats(operators.Similarity.hyperBandsWideOfQNorm(r), "wide16"))
          .unionByName(stats(wide32, "wide32"))
      }),
      // double-moment production twin of agg_corr (spec-pinned within
      // 5 ppm) — the A/B that prices the declared query's DECIMAL(38)
      // exactness at scale
      "agg_corr_double" -> (() => operators.QualityQueries.corrDouble(spark, d)),
      // A/B for frameOverlapIncremental's double-emission collapse (round
      // 17): the declared path pays a full-width .distinct() Exchange over
      // the (md5, pair, counts) stream ONLY to dedupe batch×batch pairs
      // that the join emits twice. This variant flags batch membership on
      // the build side (one broadcast of batch ids) and keeps a pair iff
      // the build row is store-side OR ida < idb — exactly one row per
      // (unordered pair, md5), no distinct Exchange.
      // MEASURED AND REJECTED (round 17, min-of-7 ×2 interleaved at sf0.1):
      // 1.09/1.26 s vs the declared distinct path's 0.99/1.10 s — the saved
      // Exchange is outweighed by the added broadcast flag join + wider
      // probe rows at this scale; kept as the A/B witness.
      "mm_frame_inc_nodup" -> (() => {
        val fr = operators.Multimodal.framesRelation(spark, d)
        val store = graft.Persisted.of(spark, s"$d#mm_frames_store_mod4") {
          fr.filter(col("doc_id") % 4 =!= 0)
        }
        val batchFr = fr.filter(col("doc_id") % 4 === 0)
        val batchIds = batchFr.select("doc_id").distinct()
        val live = store.select("doc_id", "frame_md5")
          .join(batchIds, Seq("doc_id"), "left_anti")
        val corpus = live.unionByName(batchFr.select("doc_id", "frame_md5"))
        val kept = operators.Multimodal.keptFrames(
          corpus, operators.Multimodal.FrameDfGate, "inc")
        val flagged = kept.join(
          broadcast(batchIds.withColumn("is_b", lit(true))), Seq("doc_id"), "left")
          .withColumn("is_b", coalesce(col("is_b"), lit(false)))
        val keptBatch = flagged.filter(col("is_b"))
        flagged.select(col("doc_id").as("ida"), col("frame_md5"),
            col("nf").as("nia"), col("is_b"))
          .join(keptBatch.select(col("doc_id").as("idb"), col("frame_md5"),
            col("nf").as("nib")), Seq("frame_md5"))
          .filter(!col("is_b") || col("ida") < col("idb"))
          .filter(col("ida") =!= col("idb"))
          .select(least(col("ida"), col("idb")).as("doc_a"),
            greatest(col("ida"), col("idb")).as("doc_b"),
            when(col("ida") < col("idb"), col("nia")).otherwise(col("nib")).as("nfa"),
            when(col("ida") < col("idb"), col("nib")).otherwise(col("nia")).as("nfb"))
          .groupBy("doc_a", "doc_b", "nfa", "nfb").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .select(col("doc_a"), col("doc_b"), col("n_shared"),
            expr("(n_shared * 1000000) div least(nfa, nfb)").as("overlap_ppm"))
      }),
      // A/B for agg_corr's per-row arithmetic (round 17): the declared
      // query multiplied DECIMAL(38,0) values per ROW (dec(x)*y) when the
      // products provably fit a long (x ≤ 5e3 cents, y ≤ ~1.1e7 cents ⇒
      // x·y ≤ 5.5e10, y² ≤ 1.3e14) — only the SUMS need int128-class
      // accumulators. This long-product/decimal-accumulate form measured
      // 0.87 → 0.69 s at sf0.1; the declared query then went one further
      // (graft.plans.sum128's two-long buffer, 0.69 → 0.36–0.43 s, probed
      // by its REAL name per the promoted-variant convention above) —
      // kept as the witness that isolates the per-row BigDecimal ADD
      // (this variant) from the per-row BigDecimal MULTIPLY (agg_corr as
      // it shipped before round 17).
      "agg_corr_longprod" -> (() => {
        val t = li.select(col("l_returnflag").as("flag"),
          round(col("l_quantity") * 100).cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"))
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        val m = t.groupBy("flag").agg(
          count(lit(1)).as("n"), sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
          sum(dec(col("x") * col("y"))).as("sxy"),
          sum(dec(col("x") * col("x"))).as("sxx"),
          sum(dec(col("y") * col("y"))).as("syy"))
        m.select(col("flag"), col("n").cast("long").as("n"),
            (dec(col("n")) * col("sxy") - col("sx") * col("sy")).as("cov"),
            (dec(col("n")) * col("sxx") - col("sx") * col("sx")).as("vx"),
            (dec(col("n")) * col("syy") - col("sy") * col("sy")).as("vy"))
          .filter(col("vx") > 0 && col("vy") > 0)
          .select(col("flag"), col("n"),
            expr("(abs(cov) * 1000000 div vx) * (abs(cov) * 1000000 div vy) div 1000000")
              .cast("long").as("r2_ppm"),
            when(col("cov") > 0, 1L).when(col("cov") < 0, -1L).otherwise(0L)
              .as("sign"))
      }),
      "scan_sum_qty" -> (() => li.select(sum(col("l_quantity")))),
      "scan_sum_double" -> (() => li.select(sum(col("l_extendedprice")))),
      "scan_sum_decimal" -> (() => li.select(sum(col("l_extendedprice").cast("decimal(18,2)")))),
      "scan_sum_cents" -> (() => li.select(sum(round(col("l_extendedprice") * 100).cast("long")))),
      "o1_cents" -> (() => li
        .groupBy("l_partkey")
        .agg((sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey")).limit(10)),
      "o1_group_double" -> (() => li
        .groupBy("l_partkey").agg(sum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey")).limit(10)),
      // A/B for the argmax BUFFER representation (round 17): max_by with a
      // struct buffer disqualifies HashAggregateExec (mutable-primitive
      // buffers only) AND ObjectHashAggregateExec (TypedImperative only),
      // so the declared j1/w1 plans run as SortAggregate — each task SORTS
      // its input by group key before combining. Packing the (score desc,
      // orderkey asc) decision and the payload into ONE long (score<<58 |
      // (2^58−1−orderkey); score ≤ 29 < 2^5, orderkey ≪ 2^58 at any SF)
      // turns the agg into max(long) — a primitive-buffer HashAggregate —
      // decoded after the aggregate.
      "j1_packed" -> (() => {
        val score =
          when(col("o_orderstatus") === "F", 10).otherwise(0) +
            when(col("o_orderpriority").startsWith("1-"), 9).otherwise(0) +
            when(col("o_totalprice") > 100000, 7).otherwise(0) +
            when(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"), 3).otherwise(0)
        val KMAX = (1L << 58) - 1
        ord.withColumn("match_score", score)
          .groupBy("o_custkey")
          .agg(max(col("match_score").cast("long") * (KMAX + 1)
            + (lit(KMAX) - col("o_orderkey"))).as("p"))
          .select(col("o_custkey"),
            (lit(KMAX) - (col("p") % (KMAX + 1))).as("o_orderkey"),
            // integer div, not Column./ (double) — p ~ 8e18 exceeds a
            // 53-bit mantissa and a near-1 fraction could round the score
            // up. PROMOTED into the declared j1 (probe it by its real
            // name); kept as the SortAggregate-vs-HashAggregate witness.
            expr(s"p div ${KMAX + 1}").cast("int").as("match_score"))
      }),
      // w1's payload carries a STRING (c_name), unpackable — this variant
      // decides with a plain min(long) hash agg and re-attaches the name
      // by joining back to the dim (the guide §8 decide-small/attach-late
      // shape at micro scale). MEASURED AND REJECTED (round 17, sf1
      // min-of-8): 0.246 s vs the declared SortAggregate min_by's 0.139 —
      // the second dim scan + join costs more than the per-task sort at
      // dim-table sizes; w1 keeps min_by (its input is customer-sized,
      // not fact-sized, so the sort term stays small at scale too).
      "w1_minjoin" -> (() => {
        val c = Tables.customer(spark, d)
        val keys = c.groupBy("c_mktsegment", "c_nationkey")
          .agg(min(col("c_custkey")).as("c_custkey"))
        keys.join(c.select("c_custkey", "c_name"), Seq("c_custkey"))
          .select("c_mktsegment", "c_nationkey", "c_custkey", "c_name")
      }),
      "j1_maxby" -> (() => {
        val score =
          when(col("o_orderstatus") === "F", 10).otherwise(0) +
            when(col("o_orderpriority").startsWith("1-"), 9).otherwise(0) +
            when(col("o_totalprice") > 100000, 7).otherwise(0) +
            when(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"), 3).otherwise(0)
        ord.withColumn("match_score", score)
          .groupBy("o_custkey")
          .agg(max_by(struct(col("match_score"), (-col("o_orderkey")).as("nk"), col("o_orderkey")),
            struct(col("match_score"), (-col("o_orderkey")).as("nk"))).as("b"))
          .select(col("o_custkey"), col("b.o_orderkey"), col("b.match_score"))
      }),
      "repart_cost" -> (() => li.repartition(32).groupBy("l_partkey")
        .agg(sum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey")).limit(10)),
      // NOTE: the winning "+0.5 cast" fixed-point forms were PROMOTED into
      // the declared queries (q1_agg/j4/o1/w1) — probe them by their real
      // names; the variants kept below are the measured alternatives.
      // A/B for the MinHash band-key encoding (VERDICT r10 #7): the packed
      // long is the production path (Dedup.packedBandSig); the concat
      // string is the pre-r10 form kept here for the measured delta.
      "lsh_pairs_packed" -> (() =>
        graft.operators.Dedup.lshCandidatePairs(
          graft.operators.Dedup.minhashSigRelation(spark, d))
          .select(count(lit(1)))),
      "lsh_pairs_string" -> (() => {
        val sigs = graft.operators.Dedup.minhashSigRelation(spark, d)
        val bands = sigs.select(col("doc_id"), explode(array((0 until 4).map { bid =>
          struct(lit(bid).as("band_id"),
            concat_ws(",", col(s"mh${2 * bid}"), col(s"mh${2 * bid + 1}")).as("band_sig"))
        }: _*)).as("band")).select(col("doc_id"), col("band.*"))
        val a = bands.select(col("band_id"), col("band_sig"), col("doc_id").as("doc_a"))
        val b = bands.select(col("band_id"), col("band_sig"), col("doc_id").as("doc_b"))
        a.join(b, Seq("band_id", "band_sig")).filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct().select(count(lit(1)))
      }),
      "q1_cents" -> (() => li
        .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("sum_base_price"),
          (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000).cast("long")) / 10000.0).as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))),
      "tw_grouptopk" -> (() => {
        import graft.functions.Exprs.normText
        val docs = Tables.documents(spark, d)
        val tf = docs
          .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val dfq = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val n = broadcast(docs.agg(count(lit(1)).as("n")))
        val weighted = tf.join(dl, "doc_id").join(dfq, "w").crossJoin(n)
          .select(col("doc_id"), col("w").as("term"), col("tf").cast("long").as("tf"),
            round((col("tf") * col("n")).cast("double") / (col("dl") * col("df")), 6).as("weight"))
        weighted.groupBy("doc_id")
          .agg(slice(sort_array(collect_list(struct(
            (-col("weight")).as("nw"), col("term"), col("tf"), col("weight")))), 1, 5).as("top"))
          .select(col("doc_id"), explode(col("top")).as("t"))
          .select(col("doc_id"), col("t.term").as("term"), col("t.tf").as("tf"),
            col("t.weight").as("weight"))
      }),
      "o1_round" -> (() => li
        .groupBy("l_partkey").agg(round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey")).limit(10)),
      "q1_round" -> (() => li
        .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))),
      "j3x_eq" -> (() => {
        val s = Tables.supplier(spark, d)
          .select(col("s_suppkey"), regexp_replace(col("s_name"), "^Supplier#0*", "").as("sn"))
        val c = Tables.customer(spark, d)
          .select(col("c_custkey"), regexp_replace(col("c_name"), "^Customer#0*", "").as("cn"))
        broadcast(s.filter(length(col("sn")) < 3))
          .join(c.filter(length(col("cn")) < 3), col("sn") === col("cn"))
          .select("s_suppkey", "c_custkey")
      }),
      "j3x_store" -> (() => {
        graft.operators.CoreQueries.j3Bucketed.fn(spark, d) // warm path incl. store
          .limit(1)
      }),
      "j3x_pairs" -> (() => {
        // candidate pairs ENTERING the exact containment verify — the
        // number the gram-class lever (3/4/5) is sized by. Prints the
        // count (run with PROBE_ITERS=1; the timing line is secondary).
        val (buckets, rarest) = graft.operators.CoreQueries.j3Stores(spark, d)
        val pairs = rarest
          .select(col("side").as("i_side"), col("name").as("i_name"), col("g"))
          .join(buckets.select(col("side").as("o_side"), col("name").as("o_name"),
            col("g").as("o_g")),
            col("g") === col("o_g") && col("i_side") =!= col("o_side"))
          .count()
        System.err.println(s"[probe] j3x_pairs verify-candidates=$pairs")
        spark.range(1).toDF("id")
      }),
      // Bloom-tier decade attribution (VERDICT r9 #7): the SAME contamination
      // query with a mod-2 split — at sf10 the dictionary side is 250k docs
      // (tens of millions of distinct shingle ids, far past the 4M-id
      // broadcast ceiling) — once through each tier.
      "tdx_bigdict_bloom" -> (() => {
        val wid = graft.operators.Dedup.widRelation(spark, d)
        graft.operators.TextAnalysis.decontamBloom(
          wid.filter(col("doc_id") % 2 =!= 0), wid.filter(col("doc_id") % 2 === 0),
          expectedDictIds = 40000000L)
      }),
      "tdx_bigdict_bcast" -> (() => {
        val wid = graft.operators.Dedup.widRelation(spark, d)
        graft.operators.TextAnalysis.decontamBroadcast(
          wid.filter(col("doc_id") % 2 =!= 0), wid.filter(col("doc_id") % 2 === 0))
      }),
      "j4_predim" -> (() => {
        val dim = Tables.customer(spark, d)
          .join(broadcast(Tables.nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(spark, d)), col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"), col("r_name"), col("n_name"))
        Tables.orders(spark, d)
          .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("order_cnt"),
            round(sum(col("o_totalprice")), 2).as("revenue"))
      })
    )
  }

  private def knnRoutedCensus(spark: SparkSession, d: String,
                              wide: Boolean): DataFrame = {
    val bands =
      if (wide) operators.Similarity.wideBandsRelation(spark, d)
      else operators.Similarity.narrowBandsRelation(spark, d)
    def cand(routed: Boolean): Long = {
      val key = Seq("band_id", "band_val") ++ (if (routed) Seq("cell") else Nil)
      val a = bands.select(key.map(col) :+ col("vec_id").as("qid"): _*)
      val b = bands.select(key.map(col) :+ col("vec_id").as("nid"): _*)
      a.join(b, key).filter(col("qid") =!= col("nid"))
        .select("qid", "nid").distinct().count()
    }
    def edges(routed: Boolean) = {
      val df =
        if (wide && routed) operators.Similarity.knnGraphRoutedWide(spark, d)
        else if (wide) operators.Similarity.simKnnGraphWide.fn(spark, d)
        else if (routed) operators.Similarity.simKnnGraphRouted.fn(spark, d)
        else operators.Similarity.simKnnGraph.fn(spark, d)
      df.select("qid", "nid")
    }
    val (cu, cr) = (cand(routed = false), cand(routed = true))
    val eu = edges(routed = false).cache()
    val total = eu.count()
    val retained = edges(routed = true).intersect(eu).count()
    eu.unpersist()
    val tier = if (wide) "wide" else "narrow"
    System.err.println(s"[probe] knn_routed_census_$tier cand_unrouted=$cu cand_routed=$cr edges_unrouted=$total routed_retained=$retained")
    spark.range(1).toDF("id")
  }

  /** Recall@3 of [[operators.Similarity.dedupThenIndexAuto]] against the
    * exact cosine top-3 AMONG SURVIVORS for the 20 lowest survivor ids —
    * both sides score the identical round-6 quantized cosine, so the only
    * loss sources are band non-collision (and, above the knee, the wide
    * tier's stricter collision point). */
  private def dedupIndexRecall(spark: SparkSession, d: String): DataFrame = {
    import operators.{Clustering, Similarity}
    val removed = Clustering.ddSemdedup.fn(spark, d)
      .filter(col("vec_id") =!= col("keeper_id")).select("vec_id")
    val surv = Similarity.qnormRelation(spark, d)
      .join(removed, Seq("vec_id"), "left_anti")
      .select("vec_id", "q", "norm").cache()
    val probes = surv.orderBy("vec_id").limit(20)
      .select(col("vec_id").as("qid"), col("q").as("qa"), col("norm").as("na"))
    val scored = broadcast(probes).crossJoin(
        surv.select(col("vec_id").as("nid"), col("q").as("qb"), col("norm").as("nb")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(plans.dotQNative(col("qa"), col("qb")).cast("double") /
          (col("na") * col("nb")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("nid"))
    val exact = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("qid", "nid")
    val approx = Similarity.dedupThenIndexAuto(spark, d).select("qid", "nid")
    val total = exact.count()
    val hit = exact.intersect(approx).count()
    System.err.println(s"[probe] dedup_index_recall exact_edges=$total " +
      s"retained=$hit recall_ppm=${if (total > 0) hit * 1000000 / total else -1}")
    surv.unpersist()
    spark.range(1).toDF("id")
  }

  /** Wall-clock decade harness for [[streaming.RollingIngest.ivfPqIngest]]:
    * corpus → PROBE_INGEST_BATCHES MemoryStream micro-batches against
    * frozen books trained on the FIRST batch's worth of vectors (the
    * offline deployment step, timed separately). Per batch: latency, the
    * delta's bytes (the write ∝ batch contract), cumulative store bytes,
    * and the live directory layout (compaction amortization). */
  private def ivfPqIngestE2E(spark: SparkSession, d: String): DataFrame = {
    import operators.Similarity
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val nb = sys.env.getOrElse("PROBE_INGEST_BATCHES", "8").toInt
    val compactEvery = sys.env.getOrElse("PROBE_INGEST_COMPACT", "4").toInt
    val emb = Tables.embeddings(spark, d).select("vec_id", "embedding")
    // id-interval batching: the driver never holds more than one batch
    // (a whole-corpus collect would make the harness itself the sf100
    // bottleneck), and the FIRST interval — the lowest vec_ids — is the
    // training slice, passed as a DataFrame so lloydBook's vec_id < kcw
    // seed rule always has its seeds regardless of scan order
    // (code-review r14: an unordered collect could omit them).
    val Seq(minId, maxId) = emb.agg(min("vec_id"), max("vec_id"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]): @unchecked
    val step = (maxId - minId) / nb + 1
    val t0 = System.nanoTime()
    // kc comes from the ROUTED trainer by default (the √n operating point,
    // VERDICT r14 #2); PROBE_KC forces a fixed cell count for A/Bs against
    // the old hand-set fixture constant.
    val trainSlice = emb.filter(col("vec_id") < minId + step)
    val (kcUsed, coarse, books) = sys.env.get("PROBE_KC") match {
      case Some(kc) =>
        val (c, bk) = Similarity.ivfPqTrain(trainSlice, kc.toInt)
        (kc.toInt, c, bk)
      case None => Similarity.ivfPqTrainRouted(trainSlice)
    }
    val trainSec = (System.nanoTime() - t0) / 1e9
    System.err.println(s"[probe] ivfpq_ingest_e2e kc=$kcUsed (routed=${sys.env.get("PROBE_KC").isEmpty})")
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_e2e").toString + "/store"
    val in = MemoryStream[(Long, Seq[Float])]
    var emitted = 0L
    val q = streaming.RollingIngest.ivfPqIngest(
      in.toDF().toDF("vec_id", "embedding"), dir, coarse, books,
      compactEvery = compactEvery) { (nbrs, _) => emitted += nbrs.count() }
    try (0 until nb).foreach { i =>
      val lo = minId + i * step
      val b = emb.filter(col("vec_id") >= lo && col("vec_id") < lo + step)
        .as[(Long, Seq[Float])].collect() // driver memory ∝ batch
      if (b.nonEmpty) {
        val tb = System.nanoTime()
        in.addData(b.toSeq); q.processAllAvailable()
        val dt = (System.nanoTime() - tb) / 1e9
        val store = new java.io.File(dir)
        // the batch's delta is the NEWEST d* dir (compaction only folds
        // deltas strictly older than this batch) — streaming batch ids only
        // equal the interval index when every interval is non-empty, so a
        // loop-index path would silently read 0 bytes on sparse id ranges
        // (ADVICE r14)
        val delta = lsFiles(store)
          .filter(f => f.isDirectory && f.getName.matches("d\\d+"))
          .sortBy(_.getName.drop(1).toLong).lastOption
        System.err.println(f"[probe] ivfpq_ingest_e2e batch=$i%d n=${b.length}%d " +
          f"dt=$dt%.2fs delta_bytes=${delta.map(duBytes).getOrElse(0L)}%d " +
          s"store_bytes=${duBytes(store)} " +
          s"dirs=${lsFiles(store).map(_.getName).sorted.mkString(",")}")
      }
    } finally q.stop()
    System.err.println(f"[probe] ivfpq_ingest_e2e train=$trainSec%.2fs emitted=$emitted%d")
    spark.range(1).toDF("id")
  }

  /** Wall-clock harness for [[streaming.RollingIngest.dedupIndexIngest]]:
    * (documents ⋈ embeddings on id) → PROBE_INGEST_BATCHES MemoryStream
    * micro-batches through the composed keeper-gated pipeline. Per batch:
    * latency, kept/total docs, emitted neighbor rows, and each store's
    * newest delta bytes (write ∝ batch on BOTH stores). Same id-interval
    * batching discipline as [[ivfPqIngestE2E]] — the driver never holds
    * more than one batch. */
  private def dedupIndexIngestE2E(spark: SparkSession, d: String): DataFrame = {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val nb = sys.env.getOrElse("PROBE_INGEST_BATCHES", "8").toInt
    val compactEvery = sys.env.getOrElse("PROBE_INGEST_COMPACT", "4").toInt
    val src = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .join(Tables.embeddings(spark, d)
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    // an empty doc-embedding join must fail with a message, not an NPE on
    // the unchecked row extraction (ADVICE r15)
    val idRow = src.agg(min("doc_id"), max("doc_id")).collect()(0)
    require(!idRow.isNullAt(0), s"$d: documents-embeddings join is empty")
    val (minId, maxId) = (idRow.getLong(0), idRow.getLong(1))
    val step = (maxId - minId) / nb + 1
    val root = java.nio.file.Files.createTempDirectory("graft_ddi_e2e").toString
    val (dd, ann) = (root + "/dedup", root + "/ann")
    val in = MemoryStream[(Long, String, Seq[Float])]
    var emitted = 0L
    var dropped = 0L
    // PROBE_INGEST_WIDE=1 bootstraps the ANN store on the wide band tier,
    // PROBE_INGEST_WIDESIG=1 the dedup store on the 128-bit signature tier
    // — the deployment choices for a post-knee census (sf10 decade A/Bs).
    // PROBE_INGEST_PQ=1 routes the composed pipeline through
    // dedupIndexIngestPq (frozen books trained at the routed kc on the
    // first id interval's embeddings) — the keeper-gated QUANTIZED stack;
    // PROBE_INGEST_PQ_ROUTED=1 uses dedupIndexIngestPqRouted instead
    // (store-owned books + the census-drift retrain cadence, grid steps
    // from PROBE_RETRAIN_STEPS, default 1).
    val wide = sys.env.get("PROBE_INGEST_WIDE").contains("1")
    val wideSig = sys.env.get("PROBE_INGEST_WIDESIG").contains("1")
    val pqRouted = sys.env.get("PROBE_INGEST_PQ_ROUTED").contains("1")
    val pq = pqRouted || sys.env.get("PROBE_INGEST_PQ").contains("1")
    System.err.println(s"[probe] dedup_index_ingest_e2e wide_bands=$wide " +
      s"wide_sig=$wideSig pq=$pq pq_routed=$pqRouted")
    // bootstrap books hoisted out of the query construction: the routed
    // variant's post-run recall acceptance re-probes under BOTH operating
    // points (VERDICT r16 #4)
    val pqTrained = if (!pq) None else Some {
      val t0 = System.nanoTime()
      val t = operators.Similarity.ivfPqTrainRouted(
        src.filter(col("doc_id") < minId + step)
          .select(col("doc_id").as("vec_id"), col("embedding")))
      System.err.println(f"[probe] dedup_index_ingest_e2e pq_train kc=${t._1}%d " +
        f"train_s=${(System.nanoTime() - t0) / 1e9}%.2f")
      t
    }
    val q = if (pq) {
      val (_, coarse, books) = pqTrained.get
      val dSink = (dec: org.apache.spark.sql.DataFrame, _: Long) => {
        dropped += dec.filter(!col("kept")).count(): Unit
      }
      if (pqRouted) streaming.RollingIngest.dedupIndexIngestPqRouted(
        in.toDF().toDF("doc_id", "text", "embedding"), dd, ann, coarse, books,
        compactEvery = compactEvery, wideSig = wideSig,
        retrainGridSteps = sys.env.getOrElse("PROBE_RETRAIN_STEPS", "1").toInt,
        dedupSink = dSink,
        onRetrain = (o, n, cz) => System.err.println(
          f"[probe] dedup_index_ingest_e2e RETRAIN old_kc=$o%d new_kc=$n%d census=$cz%d")) {
        (nbrs, _) => emitted += nbrs.count()
      }
      else streaming.RollingIngest.dedupIndexIngestPq(
        in.toDF().toDF("doc_id", "text", "embedding"), dd, ann, coarse, books,
        compactEvery = compactEvery, wideSig = wideSig,
        dedupSink = dSink) { (nbrs, _) =>
        emitted += nbrs.count()
      }
    } else streaming.RollingIngest.dedupIndexIngest(
      in.toDF().toDF("doc_id", "text", "embedding"), dd, ann,
      compactEvery = compactEvery, wideBands = wide, wideSig = wideSig,
      dedupSink = (dec, _) =>
        dropped += dec.filter(!col("kept")).count()) { (nbrs, _) =>
      emitted += nbrs.count()
    }
    // lsFiles: a batch that dedups away ENTIRELY creates no store
    // directory (keeper-less batches skip the delta write by design), so
    // every listing here must tolerate a missing dir (ADVICE r15)
    def newestDelta(dir: String): Long =
      lsFiles(new java.io.File(dir))
        .filter(f => f.isDirectory && f.getName.matches("d\\d+"))
        .sortBy(_.getName.drop(1).toLong).lastOption.map(duBytes).getOrElse(0L)
    try (0 until nb).foreach { i =>
      val lo = minId + i * step
      val b = src.filter(col("doc_id") >= lo && col("doc_id") < lo + step)
        .as[(Long, String, Seq[Float])].collect() // driver memory ∝ batch
      if (b.nonEmpty) {
        val tb = System.nanoTime()
        in.addData(b.toSeq); q.processAllAvailable()
        val dt = (System.nanoTime() - tb) / 1e9
        System.err.println(f"[probe] dedup_index_ingest_e2e batch=$i%d " +
          f"n=${b.length}%d dt=$dt%.2fs dd_delta=${newestDelta(dd)}%d " +
          f"ann_delta=${newestDelta(ann)}%d " +
          s"dd_dirs=${lsFiles(new java.io.File(dd)).map(_.getName).sorted.mkString(",")} " +
          s"ann_dirs=${lsFiles(new java.io.File(ann)).map(_.getName).sorted.mkString(",")}")
      }
    } finally q.stop()
    System.err.println(s"[probe] dedup_index_ingest_e2e dropped=$dropped emitted=$emitted")
    if (pqRouted) {
      // recall@3 acceptance over the KEEPER corpus at each books operating
      // point (VERDICT r16 #4): the composed routed stack's retrieval
      // quality at the moved kc, not just content equality and cost. The
      // keeper corpus is read back from the ANN store itself (it holds
      // exactly the canonical ids); the acceptance bound — recall@3 >= the
      // plain routed ingest's measured 1.000 at nprobe=1 within noise —
      // is stated in ARCHITECTURE.md.
      import operators.Similarity
      val (_, coarse0, books0) = pqTrained.get
      val bookDir = lsFiles(new java.io.File(ann))
        .filter(_.getName.startsWith("books"))
        .maxBy(_.getName.drop("books".length).toLong)
      val (cN, bN) = streaming.RollingIngest.readBooks(spark, bookDir.toString)
      val schema = Similarity.ivfPqEncode(
        src.limit(0).select(col("doc_id").as("vec_id"), col("embedding")),
        coarse0, books0).schema
      val keeperIds = streaming.RollingIngest
        .storeView(spark, ann, schema, "vec_id").get
        .select("vec_id").distinct()
      val keepers = src.select(col("doc_id").as("vec_id"), col("embedding"))
        .join(keeperIds, "vec_id").persist()
      val probes = keepers.orderBy("vec_id").limit(20).persist()
      val exact = Similarity.cosineTopK(probes, keepers, 3)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((label, cc, bb) <- Seq(("bootstrap", coarse0, books0), ("final", cN, bN))) {
        val codes = Similarity.ivfPqEncode(keepers, cc, bb).persist()
        val pCodes = Similarity.ivfPqEncode(probes, cc, bb)
        val t1 = System.nanoTime()
        val got = Similarity.ivfPqIncrementalCodes(codes, pCodes, cc, bb,
            k = 3, nprobe = 1)
          .select(col("qid"), col("nid")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t1) / 1e9
        codes.unpersist()
        val recall = if (exact.isEmpty) 0.0
          else got.intersect(exact).size.toDouble / exact.size
        System.err.println(f"[probe] dedup_index_ingest_e2e recall@3 " +
          f"books=$label%s kc=${cc.size}%d recall=$recall%.3f probe_s=$dt%.2f")
      }
      probes.unpersist(); keepers.unpersist()
    }
    spark.range(1).toDF("id")
  }

  /** Wall-clock + recall harness for
    * [[streaming.RollingIngest.ivfPqIngestRouted]]: bootstrap books train
    * on the first id interval at the ROUTED kc of that slice, then the
    * census-drift trigger retrains mid-run. Per batch: latency, emitted
    * rows, newest delta bytes; per retrain: (oldKc, newKc, census). After
    * the run, recall@3 of 20 sample probes vs exact brute force is
    * measured under BOTH the bootstrap and the final books over the same
    * final corpus — the acceptance number at each operating point. */
  private def ivfPqIngestRoutedE2E(spark: SparkSession, d: String): DataFrame = {
    import operators.Similarity
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val nb = sys.env.getOrElse("PROBE_INGEST_BATCHES", "8").toInt
    val compactEvery = sys.env.getOrElse("PROBE_INGEST_COMPACT", "4").toInt
    val gridSteps = sys.env.getOrElse("PROBE_RETRAIN_STEPS", "1").toInt
    val emb = Tables.embeddings(spark, d).select("vec_id", "embedding")
    val idRow = emb.agg(min("vec_id"), max("vec_id")).collect()(0)
    require(!idRow.isNullAt(0), s"$d: embeddings empty")
    val (minId, maxId) = (idRow.getLong(0), idRow.getLong(1))
    val step = (maxId - minId) / nb + 1
    val t0 = System.nanoTime()
    val trainSlice = emb.filter(col("vec_id") < minId + step)
    val (kc0, coarse0, books0) = Similarity.ivfPqTrainRouted(trainSlice)
    val trainSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[probe] ivfpq_routed_e2e bootstrap kc=$kc0%d train=$trainSec%.2fs grid_steps=$gridSteps%d")
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_rt_e2e").toString + "/store"
    val in = MemoryStream[(Long, Seq[Float])]
    var emitted = 0L
    val q = streaming.RollingIngest.ivfPqIngestRouted(
      in.toDF().toDF("vec_id", "embedding"), dir, coarse0, books0,
      compactEvery = compactEvery, retrainGridSteps = gridSteps,
      onRetrain = (o, n, cz) => System.err.println(
        f"[probe] ivfpq_routed_e2e RETRAIN old_kc=$o%d new_kc=$n%d census=$cz%d")) {
      (nbrs, _) => emitted += nbrs.count()
    }
    try (0 until nb).foreach { i =>
      val lo = minId + i * step
      val b = emb.filter(col("vec_id") >= lo && col("vec_id") < lo + step)
        .as[(Long, Seq[Float])].collect() // driver memory ∝ batch
      if (b.nonEmpty) {
        val tb = System.nanoTime()
        in.addData(b.toSeq); q.processAllAvailable()
        val dt = (System.nanoTime() - tb) / 1e9
        val store = new java.io.File(dir)
        val delta = lsFiles(store)
          .filter(f => f.isDirectory && f.getName.matches("d\\d+"))
          .sortBy(_.getName.drop(1).toLong).lastOption
        System.err.println(f"[probe] ivfpq_routed_e2e batch=$i%d n=${b.length}%d " +
          f"dt=$dt%.2fs delta_bytes=${delta.map(duBytes).getOrElse(0L)}%d " +
          s"dirs=${lsFiles(store).map(_.getName).sorted.mkString(",")}")
      }
    } finally q.stop()
    // final books off the store; recall@3 at both operating points
    val bookDir = lsFiles(new java.io.File(dir))
      .filter(_.getName.startsWith("books"))
      .maxBy(_.getName.drop("books".length).toLong)
    val (cN, bN) = streaming.RollingIngest.readBooks(spark, bookDir.toString)
    System.err.println(s"[probe] ivfpq_routed_e2e final_kc=${cN.size} emitted=$emitted")
    val probes = emb.filter(col("vec_id") < minId + 20).persist()
    val exact = Similarity.cosineTopK(probes, emb, 3)
      .select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((label, cc, bb) <- Seq(("bootstrap", coarse0, books0), ("final", cN, bN))) {
      val codes = Similarity.ivfPqEncode(emb, cc, bb).persist()
      val pCodes = Similarity.ivfPqEncode(probes, cc, bb)
      val t1 = System.nanoTime()
      val got = Similarity.ivfPqIncrementalCodes(codes, pCodes, cc, bb, k = 3, nprobe = 1)
        .select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t1) / 1e9
      codes.unpersist()
      val recall = if (exact.isEmpty) 0.0 else
        got.intersect(exact).size.toDouble / exact.size
      System.err.println(f"[probe] ivfpq_routed_e2e recall@3 books=$label%s " +
        f"kc=${cc.size}%d recall=$recall%.3f probe_s=$dt%.2f")
    }
    probes.unpersist()
    spark.range(1).toDF("id")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // tz-pin like Bench/Verify: the ntz ts dispatch is only tz-free
      // under UTC (belt-and-braces — build.sbt's forked javaOptions set
      // it too, but Probe must stay correct under any launcher)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // Same default as Bench so probe timings attribute headline behavior.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART", "134217728"))
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(';').filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k, v)
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional warm-buffer experiment: cache every table relation in memory
    // (columnar), the Spark analogue of the DuckDB baseline's warm page
    // cache. SPARK_GRAFT_TABLE_REPART=<n> additionally repartitions each
    // relation on ingest (wired to the graft.table.repartition conf Tables
    // reads) so the cached scans parallelize.
    if (sys.env.get("PROBE_CACHE_TABLES").contains("1")) {
      sys.env.get("SPARK_GRAFT_TABLE_REPART")
        .foreach(n => spark.conf.set("graft.table.repartition", n))
      Tables.names.foreach { n =>
        val df = Tables.t(spark, sfDir, n); df.persist(); df.count()
      }
    }

    // PROBE_FINALPLAN=1: print each action's EXECUTED plan (post-AQE) —
    // what actually ran, not what the pre-execution explain showed.
    if (sys.env.get("PROBE_FINALPLAN").contains("1"))
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          System.err.println(s"[finalplan] $funcName:\n${qe.executedPlan}")
        override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      })

    // PROBE_JOBS=1: per-action job timeline — each Spark job's wall time and
    // the driver-side gap before it (analysis/AQE planning/broadcast build
    // all show up as gaps). Attribution tool for the per-action floor.
    if (sys.env.get("PROBE_JOBS").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          @volatile private var lastEnd = 0L
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val now = System.nanoTime()
            val gap = if (lastEnd == 0) 0.0 else (now - lastEnd) / 1e9
            t0.put(j.jobId, now)
            val names = j.stageInfos.map(
              _.rddInfos.map(r => r.name).mkString(">").take(80)).mkString(" | ")
            System.err.println(f"[jobs] job ${j.jobId}%3d start  gap=$gap%6.3fs  stages=${j.stageInfos.size}  [$names]")
          }
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val now = System.nanoTime()
            lastEnd = now
            val dt = (now - t0.getOrDefault(j.jobId, now)) / 1e9
            System.err.println(f"[jobs] job ${j.jobId}%3d end    dur=$dt%6.3fs")
          }
          // per-stage task-metric rollup: where a slow wave actually goes —
          // run (executor work), ser/deser (dispatch), gc, sched (dispatch
          // queue + result handling = stage wall minus everything else)
          private val agg = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = t.taskMetrics
            if (m != null) {
              val a = agg.computeIfAbsent(t.stageId, _ => new Array[Long](6))
              a.synchronized {
                a(0) += m.executorRunTime
                a(1) += m.executorDeserializeTime + m.resultSerializationTime
                a(2) += m.jvmGCTime
                a(3) += m.shuffleWriteMetrics.writeTime / 1000000L
                a(4) += m.executorCpuTime / 1000000L
                a(5) = math.max(a(5), t.taskInfo.duration)
              }
            }
          }
          override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = s.stageInfo
            val dur = (for (a <- i.submissionTime; b <- i.completionTime) yield (b - a) / 1e3).getOrElse(-1.0)
            val a = agg.getOrDefault(i.stageId, new Array[Long](6))
            System.err.println(f"[stage] ${i.stageId}%3d dur=$dur%6.3fs tasks=${i.numTasks}%3d run=${a(0)}%5dms cpu=${a(4)}%5dms serde=${a(1)}%4dms gc=${a(2)}%4dms shw=${a(3)}%4dms maxTask=${a(5)}%4dms ${i.name.take(60)}")
          }
        })

    val vs = variants(spark, sfDir)
    val all: Map[String, () => DataFrame] =
      SparkEntry.queries.map { case (n, f) => n -> (() => f(spark, sfDir)) } ++ vs
    val run = if (names.isEmpty) vs.keys.toSeq.sorted else names
    run.foreach { n =>
      all.get(n) match {
        case None => System.err.println(s"[probe] unknown: $n")
        case Some(f) =>
          if (sys.env.get("PROBE_EXPLAIN").contains("1")) f().explain("formatted")
          // PROBE_SHOW=1: print the variant's rows (for stats variants
          // like knn_band_occupancy whose VALUES are the measurement)
          if (sys.env.get("PROBE_SHOW").contains("1")) f().show(100, false)
          f().count() // warm
          val iters = sys.env.getOrElse("PROBE_ITERS", "5").toInt
          val useRdd = sys.env.get("PROBE_RDD").contains("1")
          val ts = (1 to iters).map { _ =>
            val t0 = System.nanoTime()
            val df = f()
            df.queryExecution.executedPlan // force analysis + planning
            val t1 = System.nanoTime()
            if (useRdd) df.queryExecution.toRdd.count() else df.count()
            val t2 = System.nanoTime()
            ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
          }
          if (sys.env.get("PROBE_EXPLAIN_AFTER").contains("1")) {
            val df = f(); df.count()
            System.err.println(df.queryExecution.executedPlan.toString)
          }
          val tot = ts.map(t => t._1 + t._2)
          System.err.println(f"[probe] $n%-22s min=${tot.min}%6.3f  med=${tot.sorted.apply(iters / 2)}%6.3f  plan_min=${ts.map(_._1).min}%6.3f  exec_min=${ts.map(_._2).min}%6.3f  (${tot.take(10).map(t => f"$t%.2f").mkString(", ")})")
      }
    }
    val (n, h, m) = graft.plans.SessionBroadcastCache.stats(spark.sparkContext)
    System.err.println(s"[probe] broadcast-cache entries=$n hits=$h misses=$m")
    spark.stop()
  }
}
