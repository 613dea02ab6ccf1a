package graft

/** Physical-plan regression guards: the judged claims in PLANS.md must stay
  * true of the plans Catalyst actually produces, not just of the prose. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  /** The OUTER physical tree (adaptive wrapper stripped): traversal stops
    * at InMemoryTableScan leaves, so nodes inside a cached relation's build
    * plan — which plan.toString prints — are not counted. */
  private def outerPlan(name: String): org.apache.spark.sql.execution.SparkPlan =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("q1_agg: date filter pushed to the scan, columns pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"),
      s"expected pushed date filter:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
  }

  test("j4_join_chain: decorate-late — numeric-key agg between two broadcast joins, no shuffle join") {
    // round 17: the fact side probes the two-long cust→nationkey broadcast,
    // the aggregate runs on the NUMERIC c_nationkey (the string group keys
    // were half the map CPU in getBytes — PLANS.md), and a 25-row broadcast
    // decorates (n_name, r_name) after. So: exactly TWO outer BHJs, no
    // shuffle join, and the agg keys contain c_nationkey, not n_name.
    val root = outerPlan("j4_join_chain")
    val bhj = root.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b }
    assert(bhj.size == 2, s"expected exactly 2 outer BHJs:\n$root")
    assert(root.collect {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s }.isEmpty)
    assert(root.toString.contains("InMemoryTableScan"),
      s"expected the persisted cust_nkey dim:\n$root")
    val aggs = root.collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h }
    assert(aggs.nonEmpty && aggs.forall(_.groupingExpressions.forall(
        _.references.map(_.name).forall(_ == "c_nationkey"))),
      s"aggregate must group on the numeric key only:\n$root")
  }

  test("o1_topk: top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("o1_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$p")
  }

  test("w1_first_seen_dedup: partial-agg argmin, no window sort") {
    val p = plan("w1_first_seen_dedup")
    assert(p.contains("min_by"), s"expected min_by aggregate:\n$p")
    assert(!p.contains("Window"), s"expected no window operator:\n$p")
    assert(p.contains("partial_min_by"), s"expected map-side partial agg:\n$p")
  }

  test("j1_score_argmax: argmax is a hash aggregate with map-side combine") {
    // round 17: the max_by struct buffer silently planned as SortAggregate
    // (struct buffers disqualify HashAggregateExec; DeclarativeAggregate
    // disqualifies ObjectHashAggregateExec) — the packed-long max restores
    // a TRUE primitive-buffer hash aggregate, which this spec now pins
    val p = plan("j1_score_argmax")
    assert(p.contains("HashAggregate") && p.contains("partial_max"),
      s"expected packed-long hash argmax with map-side combine:\n$p")
    assert(!p.contains("SortAggregate"),
      s"struct-buffer argmax would fall back to SortAggregate:\n$p")
    assert(!p.contains("Window"))
  }

  test("x17_map_lookup: native key probe in the plan, no from_json") {
    val p = plan("x17_map_lookup")
    assert(p.contains("graft_json_key_long"), s"expected native key probe:\n$p")
    assert(!p.contains("from_json"), s"interpreted from_json must be gone:\n$p")
  }

  test("j3_bucketed: equi-joins on grams, no nested-loop; rows identical to the theta join") {
    val p = plan("j3_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"bucketed variant must not nested-loop:\n$p")
    val theta = SparkEntry.queries("j3_name_substring_join")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = SparkEntry.queries("j3_bucketed")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === theta, "candidate generation + verify must reproduce the theta join")
  }

  test("aj_asof_join: one shuffle + ordered window, never a join operator") {
    // the union+running-last() formulation: at 100 TB the naive
    // `LEFT JOIN ... ts <= ts` plans as a nested loop and dies — the whole
    // point of the shape is that NO join node exists at all
    val p = plan("aj_asof_join")
    assert(p.contains("Window"), s"expected the running-last window:\n$p")
    assert(!p.contains("Join"), s"as-of must not plan ANY join:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 1,
      s"expected exactly one shuffle (on user_id):\n$p")
  }

  test("aj_range_join: time-cell band join stays an equi-join") {
    val p = plan("aj_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"band join must never nested-loop:\n$p")
    assert("""HashJoin \[user_id#\d+L?, cell#\d+L?\]""".r.findFirstIn(p).isDefined,
      s"expected (user_id, cell) as the equi-join key:\n$p")
  }

  test("j_salted: pinned to the shuffled-join regime where salting matters") {
    val p = plan("j_salted")
    // under a broadcast the salt would be inert (no reducer-side skew to
    // spread); the SHUFFLE_HASH hint keeps the demonstrated regime real
    assert(p.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"broadcast would make salting inert:\n$p")
  }

  test("pipe_portco_e2e: ONE scan of the page corpus feeds both cards and entities") {
    // the artifacts relation is memoized per (session, pages-plan): repeated
    // derivations return the SAME persisted DataFrame instance
    val pages = Tables.supplier(spark, sf0001).selectExpr(
      "s_name AS firm_name", "'https://x.example' AS firm_url",
      "'<div class=\"card\">x</div>' AS html")
    val a1 = graft.operators.PortCoPipeline.pageArtifacts(pages)
    val a2 = graft.operators.PortCoPipeline.pageArtifacts(pages)
    assert(a1 eq a2, "pageArtifacts must memoize via graft.Persisted")
    // and the e2e plan reads the page source ONLY inside that cached
    // relation: the outer plan has no file scan of the synthesized pages,
    // just two InMemoryTableScans (cards side + entities side)
    val root = outerPlan("pipe_portco_e2e")
    val memScans = root.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => m }
    assert(memScans.size >= 2,
      s"both explode branches must read the persisted artifacts:\n$root")
    val outerFileScans = root.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(outerFileScans.isEmpty,
      s"page corpus must not be re-scanned outside the artifacts relation:\n$root")
  }

  test("dd_simhash_neardup: both join sides read one persisted bands relation") {
    val p = plan("dd_simhash_neardup")
    assert("InMemoryTableScan".r.findAllMatchIn(p).size >= 2,
      s"expected both sides on the cached bands relation:\n$p")
    assert(!p.contains("collect_list"), s"no bucket materialization allowed:\n$p")
  }

  test("gs_grouping_sets: one Expand feeds a single partial+final aggregate") {
    val p = plan("gs_grouping_sets")
    assert("Expand".r.findAllMatchIn(p).size == 1, s"expected one Expand:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 1,
      s"expected a single agg shuffle:\n$p")
  }

  test("ta_decontam: benchmark dictionary broadcasts; no string shingles in the corpus scan") {
    val p = plan("ta_decontam")
    // the asymmetric corpus-vs-reference shape: dictionary = broadcast
    // build side, corpus = scan-stage native shingle ids (the raw-string
    // explode form measured 17x slower)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dictionary:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must never shuffle for the join:\n$p")
    assert(p.contains("graft_word_shingles"), s"expected native shingle-id pass:\n$p")
    assert(!p.contains("concat_ws"), s"no string-shingle construction allowed:\n$p")
  }

  test("sim_incremental_ann_ivf: cell joins the band key; store and batch read from cache") {
    val p = plan("sim_incremental_ann_ivf")
    // the routing column is part of the candidate join's equi-key — the
    // 9x cross-cell candidate cut depends on it being IN the join, not a
    // post-filter over the un-routed expansion
    assert("""HashJoin \[band_id#\d+, band_val#\d+L?, cell#\d+\]""".r
      .findFirstIn(p).isDefined, s"expected cell in the band join key:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band join must stay an equi-join:\n$p")
    // both the mod-20 store and the batch sketch come from persisted
    // relations (compute-once contract)
    assert("InMemoryTableScan".r.findAllMatchIn(p).size >= 2,
      s"expected cached store + batch bands:\n$p")
  }

  test("wa_funnel: one shuffle to a per-user sorted fold, no window, type filter pushed") {
    // the funnel is a fold over collect_list, NOT the chained-min 3-shuffle
    // relational form the oracle states — and the stage-type filter must
    // reach the parquet scan so only funnel-relevant events are read
    val p = plan("wa_funnel")
    assert(!p.contains("Window"), s"funnel must not plan a window:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 1,
      s"expected exactly one shuffle (on user_id):\n$p")
    assert(p.contains("In(event_type"), s"expected pushed stage-type filter:\n$p")
  }

  test("wa_retention: two shuffles, no join — cohort comes from the day set itself") {
    val p = plan("wa_retention")
    assert(!p.contains("Join"), s"retention must not self-join for the cohort:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 2,
      s"expected day-set agg + triangle agg only:\n$p")
  }

  test("st_window_agg: tumbling window is a projection + one agg shuffle") {
    // TimeWindowing rewrites single-window tumbling into a plain projection
    // — no Expand, no window operator, just a grouped aggregate
    val p = plan("st_window_agg")
    assert(!p.contains("Window ["), s"expected no window operator:\n$p")
    assert(!p.contains("Expand"), s"expected no Expand for a tumbling window:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 1,
      s"expected one aggregate shuffle:\n$p")
  }

  test("sim_kmeans_assign: assignment is a zero-shuffle projection over the store") {
    // centroids enter as literals (driver-held k-means state), so the
    // assignment must plan as a pure scan projection: no join, no exchange
    val p = plan("sim_kmeans_assign")
    assert(!p.contains("Join"), s"assignment must not join centroids:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).isEmpty,
      s"assignment must not shuffle:\n$p")
    assert(p.contains("InMemoryTableScan"), s"expected the persisted qnorm store:\n$p")
  }

  test("sim_kmeans_update: literal centroids — no join, two aggregate shuffles") {
    val p = plan("sim_kmeans_update")
    assert(!p.contains("Join"), s"update must not join centroids:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 2,
      s"expected (cluster,dim) agg + cluster assembly only:\n$p")
  }

  test("wa_outliers: stats broadcast back onto the scan, no window, no shuffle join") {
    // two-pass variance: one partial-agg'd shuffle to 5 type-level rows,
    // broadcast back for the per-row sigma test — the row-level relation
    // must never shuffle for the join
    val p = plan("wa_outliers")
    assert(p.contains("BroadcastHashJoin"), s"expected stats broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"row side must not shuffle-join or window:\n$p")
  }

  test("st_stream_join: interval join is an equi-join on user, never nested-loop") {
    // the time bounds ride as a post-join range condition on the user_id
    // equi key; a BroadcastNestedLoopJoin here would be the unbounded-state
    // batch analogue of the stream-join hazard the watermark bound removes
    val p = plan("st_stream_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join must keep its equi key:\n$p")
  }

  test("sim_knn_graph: banded candidates, no all-pairs join") {
    val p = plan("sim_knn_graph")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"knn graph must stay banded/bucketed:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"expected the persisted assignment/qnorm store:\n$p")
  }

  test("sim_knn_graph_wide: same banded shape over the wide band store") {
    val p = plan("sim_knn_graph_wide")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"wide knn graph must stay banded/bucketed:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"expected the persisted wide band store:\n$p")
  }

  test("ta_bigram_lm: bigrams form in the scan stage — no window, no self-join on position") {
    val p = plan("ta_bigram_lm")
    // zip_with over the word array against its own tail replaces the
    // lag()-window (full token-stream shuffle) and the pos+1 self-join
    // (token-stream shuffle twice) the oracle states
    assert(!p.contains("Window"), s"bigram formation must not plan a window:\n$p")
    assert(p.contains("zip_with"), s"expected scan-stage zip_with pairing:\n$p")
    assert(p.contains("InMemoryTableScan"), s"expected the persisted bigram-type store:\n$p")
    // the only nested-loop allowed is the broadcast 1-row vocabulary scalar
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 1,
      s"only the V scalar may cross-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
  }

  test("ta_bpe_encode: merges apply to the vocabulary store, token totals join it back") {
    val p = plan("ta_bpe_encode")
    // the merge chain rewrites DISTINCT words (Heap's-law-sublinear), never
    // token occurrences; the per-doc totals come from the persisted term
    // store joined to merged token lengths — an equi-join, no all-pairs
    assert(p.contains("InMemoryTableScan"), s"expected the persisted term store:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"vocab join must stay an equi-join:\n$p")
    assert(!p.contains("Window"), s"no window operator in the encode path:\n$p")
  }

  test("wa_attribution: union+window sweep — no join, window partitioned by user") {
    // the oracle states join+argmax (per-purchase × all preceding touches,
    // per-user quadratic); the engine must plan the one-shuffle ordered
    // sweep instead, and the window must be user-partitioned (a global
    // window would single-partition the event stream)
    val p = plan("wa_attribution")
    assert(!p.contains("Join"), s"attribution must not join touches to purchases:\n$p")
    assert(p.contains("Window"), s"expected the running-last window sweep:\n$p")
    assert("""Window \[.*\], \[user_id#\d+L?\]""".r.findFirstIn(p).isDefined,
      s"window must partition by user_id:\n$p")
  }

  test("sim_pq_adc: codes persisted, ADC tables broadcast, no cartesian") {
    // the compressed-domain contract: the scan phase joins the persisted
    // 2-byte-payload code relation to tiny broadcast lookup tables — the
    // only nested-loop allowed is the deliberate 8-codeword broadcast
    // expansion in the encode/table builds, never a corpus × corpus product
    val p = plan("sim_pq_adc")
    assert(p.contains("InMemoryTableScan"), s"expected the persisted code relation:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast ADC-table joins:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
  }

  test("sim_ivf_pq: probe-cell filter on the persisted codes, broadcast ADC, no cartesian") {
    // the routed contract: the code-store scan carries the probes' cell
    // IN-filter (partition pruning at 100 TB), the ADC tables join as
    // broadcasts, and nothing degenerates to a corpus x corpus product
    val p = plan("sim_ivf_pq")
    assert(p.contains("InMemoryTableScan"), s"expected the persisted code relation:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast ADC-table joins:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
    assert("""cell#\d+ IN""".r.findFirstIn(p).isDefined,
      s"expected the probe-cell IN filter on the code store:\n$p")
  }

  test("sim_knn_graph_routed: cell rides the band self-join KEY, one persisted store, no cartesian") {
    // the cell∧band composition must be ONE composite equi-join key (the
    // candidate cut happens inside the join, never as a post-join filter),
    // over the persisted band store on both sides
    val root = outerPlan("sim_knn_graph_routed")
    val joins = root.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.map(_.toString).mkString(",")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.map(_.toString).mkString(",")
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.leftKeys.map(_.toString).mkString(",") // AQE broadcasts at gate SF
    }
    assert(joins.exists(k => k.contains("band_val") && k.contains("cell")),
      s"expected cell inside the band join key, got keys $joins in:\n$root")
    assert(!root.toString.contains("CartesianProduct") &&
      !root.toString.contains("BroadcastNestedLoopJoin"))
    assert(root.toString.contains("InMemoryTableScan"),
      s"expected the persisted band store:\n$root")
  }

  test("mm_frame_overlap: df gate (broadcast anti-join) sits above the frame store, below the self-join") {
    // the hot-frame gate: both self-join inputs read the PERSISTED gated
    // relation (whose build plan carries the LeftAnti against the
    // broadcast hot-digest dictionary) — a gate-free input reintroduces
    // the k² boilerplate-frame blowup, an un-persisted gate re-runs the
    // df aggregate per consumer
    val p = plan("mm_frame_overlap")
    assert(p.contains("LeftAnti"), s"expected the df-gate anti-join:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"expected the persisted gated frame relation:\n$p")
    assert(!p.contains("CartesianProduct"))
    // and the self-join sides are the cached gated relation, not raw frames
    val root = outerPlan("mm_frame_overlap")
    val rawScans = root.collect {
      case s if s.nodeName.contains("InMemoryTableScan") => s }
    assert(rawScans.size >= 2, s"self-join must read the cached gate:\n$root")
  }

  test("st_heavy_hitters: two window-keyed aggregates joined, no cartesian, no per-key window sort") {
    // the sketch agg and the exact-count agg each shuffle once on the
    // window key and join window-count-sized relations; nothing explodes
    // per event and nothing sorts per window
    val p = plan("st_heavy_hitters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"window join must stay an equi-join:\n$p")
    assert(p.contains("graft_mg_topk"), s"expected the MG sketch aggregate:\n$p")
    assert(!p.contains("Window"), s"no rank window in the heavy-hitter path:\n$p")
  }

  test("gr_pagerank: iterations stay equi-joins over the cached adjacency") {
    val p = plan("gr_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"rank propagation must never nested-loop:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"expected the persisted knn adjacency:\n$p")
  }

  test("ta_winnow: fused native selection in the scan — no lambda chain, no window, no shuffle") {
    val p = plan("ta_winnow")
    assert(p.contains("graft_winnow"), s"expected the fused WinnowSelect:\n$p")
    // the wedge this guard pins: interpreted transform/aggregate lambdas
    // cloned into inferred predicates (PLANS.md ta_winnow)
    assert(!p.contains("transform(") && !p.contains("aggregate("),
      s"no higher-order lambdas may survive on the declared path:\n$p")
    assert(!p.contains("Window") && !p.contains("Exchange"),
      s"selection must complete inside the scan stage:\n$p")
  }

  test("wa_rolling_active: bounded day-explode, no window, no distinct-over-range") {
    val p = plan("wa_rolling_active")
    assert(!p.contains("Window"),
      s"WAU must not be a window (COUNT DISTINCT OVER RANGE doesn't exist):\n$p")
    assert(p.contains("Generate explode"),
      s"expected the <=7-day bounded explode:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"day support must stay an equi-join:\n$p")
  }

  test("wa_mad_outliers / agg_quantile_bins: rank stats broadcast back, no window, no sort") {
    for (q <- Seq("wa_mad_outliers", "agg_quantile_bins")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q: no global rank window allowed:\n$p")
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
        s"$q: vocabulary-sized stats must broadcast back:\n$p")
      assert(!p.toLowerCase.contains("sortexec") && !p.contains("GlobalSort"),
        s"$q: no corpus sort:\n$p")
    }
  }

  test("ta_heavy_hitters: the MG sketch aggregates with a partial stage (O(k) per partition)") {
    val p = plan("ta_heavy_hitters")
    assert(p.contains("graft_mg_topk"), s"expected the MG aggregate:\n$p")
    assert(p.contains("partial_graft_mg_topk") || p.contains("ObjectHashAggregate"),
      s"expected partial aggregation of the sketch (merge-side O(k)):\n$p")
  }

  test("mm_audio_energy / mm_phash: per-partition scan stages, zero shuffle") {
    // audio has no re-upload resolution: strictly scan work
    val pa = outerPlan("mm_audio_energy").toString
    assert(!pa.contains("Exchange") && !pa.contains("Window") && !pa.contains("Join"),
      s"mm_audio_energy: featurization must be shuffle-free:\n$pa")
    // the image hashes resolve re-uploads to their leader (round 14): the
    // resolution must stay a BROADCAST HASH join — featurization itself
    // remains per-partition scan work with no shuffle partitioning and no
    // other join kind (a BroadcastNestedLoopJoin here would evaluate the
    // mod-24 predicate per row pair — O(corpus × reups))
    val ppPlan = SparkEntry.queries("mm_phash")(spark, sf0001)
      .queryExecution.executedPlan
    val ppJoins = ppPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(ppJoins.forall(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"mm_phash: every resolution join must be a broadcast hash join:\n$ppPlan")
    val pp = ppPlan.toString
    assert(!pp.contains("Exchange hashpartitioning") &&
      !pp.contains("Exchange rangepartitioning") && !pp.contains("Window"),
      s"mm_phash: featurization + broadcast resolution must be shuffle-free:\n$pp")
  }

  test("count-annotated stores: no post-aggregation join survives (r14 wins)") {
    // gr_common_neighbors / mm_frame_overlap / ta_collocations each moved
    // their per-doc/marginal counts INTO the session store (the
    // degree-annotated adjacency pattern) — a join appearing ABOVE the
    // pair/corpus aggregate in the outer plan means the win regressed.
    // gr_common_neighbors: exactly ONE outer join (the wedge self-join)
    val gr = outerPlan("gr_common_neighbors")
    val grJoins = gr.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(grJoins.size == 1,
      s"expected only the wedge self-join, got ${grJoins.size}:\n$gr")
    // mm_frame_overlap: exactly ONE outer join (the frame self-join)
    val fo = outerPlan("mm_frame_overlap")
    val foJoins = fo.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(foJoins.size == 1,
      s"expected only the frame self-join, got ${foJoins.size}:\n$fo")
    // ta_collocations: a filter+projection of the annotated store — the
    // only join is the broadcast of the scalar N, the only aggregate is N
    val tc = outerPlan("ta_collocations")
    val tcAggs = tc.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
    assert(tcAggs.size <= 2, // partial + final of the scalar N
      s"expected only the scalar-N aggregate, got ${tcAggs.size}:\n$tc")
    val tcSmj = tc.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(tcSmj.isEmpty, s"no shuffle join may appear:\n$tc")
  }

  test("gr_local_clustering: one wedge self-join + closure semi-join + partial-agg, no cartesian") {
    val p = outerPlan("gr_local_clustering")
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    // wedge self-join (inner), triangle-closure (left_semi), and the
    // vocabulary-sized deg LEFT join — nothing else, nothing cartesian
    assert(joins.size == 3, s"expected wedge + closure + deg joins, got ${joins.size}:\n$p")
    assert(joins.count(_.joinType.sql == "LEFT SEMI") == 1,
      s"expected exactly one semi-join closure:\n$p")
    val s = p.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"no cartesian/BNLJ may appear:\n$s")
    // the per-center triangle count must keep its map-side partial stage
    assert(s.contains("partial_count") || s.contains("Partial"),
      s"expected a partial aggregate stage:\n$s")
  }

  test("aj_asof_native: the custom exec plans one shuffle + one sort per side, no window") {
    val p = plan("aj_asof_native")
    assert(p.contains("AsofJoin"), s"expected the custom operator:\n$p")
    assert(!p.contains("Window"), s"the sweep replaces the window:\n$p")
    assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 2,
      s"expected exactly one shuffle per side:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"no join operator may appear:\n$p")
  }

  test("w_topk_per_key: bounded-state aggregate with a partial stage, no window sort") {
    val p = plan("w_topk_per_key")
    assert(p.contains("graft_top_k"), s"expected the top-k aggregate:\n$p")
    assert(p.contains("partial_graft_top_k"),
      s"map-side partial aggregation is the operator's point:\n$p")
    assert(!p.contains("Window"), s"no window sort allowed:\n$p")
  }

  test("mm_image_neardup tiers: banded equi-join candidates, never all-pairs") {
    for (q <- Seq("mm_image_neardup", "mm_image_neardup128")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: candidate generation must stay an equi-join:\n$p")
    }
  }

  test("qa_schema_profile: per-column aggregates, no distinct-rewrite Expand, pruned scans") {
    val p = plan("qa_schema_profile")
    // the approx_stats cliff guard: stacked countDistincts expand one row
    // per (group, distinct-key); the per-column union must never plan one
    assert(!p.contains("Expand"), s"profiler must not hit the distinct rewrite:\n$p")
    assert("ReadSchema: struct<l_orderkey".r.findAllMatchIn(p).nonEmpty,
      s"each branch must scan only its own column:\n$p")
  }

  test("agg_corr / qa_tv_drift: one corpus-sized aggregate each, no window, no cartesian") {
    for (q <- Seq("agg_corr", "qa_tv_drift")) {
      val p = plan(q)
      assert(!p.contains("Window") && !p.contains("CartesianProduct"),
        s"$q: moments/buckets come from plain aggregation:\n$p")
    }
  }
}
