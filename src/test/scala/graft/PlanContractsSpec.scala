package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.types.{LongType, StringType}

/** PLAN-REGRESSION LOCK (r13, verdict #8): the PLANS.md "Must show"
  * contracts, swept as ONE suite over the registry — so a Spark upgrade
  * or an innocent-looking query edit cannot silently degrade a plan the
  * 50M-row bench already validated. Contracts already pinned by the
  * per-operator suites (pushdown NTZ cases, Expand counts, GroupTopK,
  * salted-join spread, enrich broadcast) keep their focused specs; this
  * suite adds the remaining headliners from the registry surface the
  * driver actually runs.
  *
  * Exchange/scan assertions read the EXECUTED plan (post
  * EnsureRequirements — `sparkPlan` has no exchanges yet) with AQE off
  * for the one planning call, so the asserted shape is the static one
  * PLANS.md documents. Suites run sequentially in the forked test JVM,
  * so the temporary conf flip cannot race another suite. */
class PlanContractsSpec extends SparkTestBase {

  private def physical(df: => DataFrame): SparkPlan = {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }
  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)
  private def plan(name: String): SparkPlan = physical(q(name))

  /** Hash-partitioned exchanges only — the data-movement shuffles the
    * contracts bound. (The trailing orderBy's range exchange is
    * presentation, present in every registry query.) */
  private def hashShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
  private def scans(p: SparkPlan) = p.collect { case s: FileSourceScanExec => s }
  private def pushed(p: SparkPlan): String =
    scans(p).map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
  private def noTextInExchanges(p: SparkPlan): Unit =
    p.collect { case e: ShuffleExchangeExec => e }.foreach(e => e.output.foreach(a =>
      assert(a.name != "text" && a.name != "chunk_text",
        s"corpus text column '${a.name}' crossed an exchange")))

  // ---- dashboard surface -------------------------------------------------

  test("flow_time_filter: time-range predicate reaches the parquet scan") {
    assert(pushed(plan("flow_time_filter")).contains("GreaterThanOrEqual"))
  }

  test("flow_top_src_ip: numeric grouping, render above aggregate, TakeOrderedAndProject") {
    val p = plan("flow_top_src_ip")
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.size === 1,
      "top-N must be TakeOrderedAndProject, not a global sort")
    assert(p.collect { case s: SortExec => s }.isEmpty, "no sort anywhere in a top-N plan")
    // the IPv4/v6 conditional render must NOT appear below the aggregate:
    // every aggregate groups on numeric columns only
    val aggs = p.collect { case a: HashAggregateExec => a }
    assert(aggs.nonEmpty)
    aggs.foreach(a => a.groupingExpressions.foreach(g =>
      assert(g.dataType != StringType, s"aggregate groups on rendered string: ${g.sql}")))
  }

  test("flow_proto_dist: partial+final aggregate, scan pruned to touched columns") {
    val p = plan("flow_proto_dist")
    assert(p.collect { case a: HashAggregateExec => a }.size >= 2, "partial+final")
    val sc = scans(p)
    assert(sc.nonEmpty)
    assert(sc.head.schema.fieldNames.length <= 4,
      s"scan must prune, reads ${sc.head.schema.fieldNames.mkString(",")}")
  }

  test("flow_unique_src: distinct keys stay numeric through every exchange") {
    val p = plan("flow_unique_src")
    val exs = hashShuffles(p)
    assert(exs.size === 2, "two-phase distinct: (bucket, src_ip) then bucket")
    exs.foreach(e => e.output.foreach(a =>
      assert(a.dataType != StringType, s"exchange carries rendered string ${a.name}")))
  }

  test("flow_sessions: single window shuffle on the 5-tuple key") {
    val p = plan("flow_sessions")
    assert(hashShuffles(p).size === 1,
      "lag, session id and the session windows must share ONE key exchange")
  }

  test("ops_histogram_quantile: one fixed-width aggregate pass, quantile cascade is projection") {
    val p = plan("ops_histogram_quantile")
    assert(scans(p).size === 1, "no second pass over the fact table")
    assert(p.collect { case a: HashAggregateExec => a }.size >= 2)
  }

  test("ops_rate_sum: counter fold and rate windows share series exchanges; one fact scan") {
    val p = plan("ops_rate_sum")
    assert(scans(p).size === 1, "counter samples must not re-scan per metric")
    assert(p.collect { case w: WindowExec => w }.size === 3,
      "cumulative fold, reset-aware delta, sliding increase — three windows")
    assert(hashShuffles(p).size === 3,
      "sample build + series windows + final (metric, ts) agg — three exchanges")
  }

  // ---- sketches ----------------------------------------------------------

  test("flow_heavy_hitters (serving form): ObjectHashAggregate partial+final, one sketch exchange") {
    val p = physical(graft.flow.FlowQueries.heavyHitters(spark, sf))
    assert(p.collect { case a: ObjectHashAggregateExec => a }.size === 2)
    assert(hashShuffles(p).size === 1, "only the sketch blob crosses one exchange")
  }

  test("flow_heavy_hitters (oracle form): the exact-regime guard rides the same shape") {
    val p = plan("flow_heavy_hitters")
    // countDistinct adds the distinct-rewrite level: 4 ObjectHashAggregates
    assert(p.collect { case a: ObjectHashAggregateExec => a }.size >= 2)
    assert(hashShuffles(p).size <= 2)
  }

  test("flow_unique_src_overlap: one scan, blob exchanges, broadcast pairing (no window, no shuffle join)") {
    val p = plan("flow_unique_src_overlap")
    assert(scans(p).size === 1, "consecutive-day pairing must not re-scan")
    assert(p.collect { case a: ObjectHashAggregateExec => a }.size >= 2)
    // r19 (verdict #6): pairing is a broadcast self-join of the day-grain
    // relation (both sides share the aggregate exchange), replacing the
    // unpartitioned lead window whose single task also serialized the
    // per-pair blob-intersection kernels
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      "no unpartitioned lead window on the pairing path")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.size === 1,
      "day-over-day overlap pairs via broadcast")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty,
      "the day-grain self-join must never shuffle")
  }

  test("flow_bytes_quantiles_kll: two ObjectHashAggregate levels, blobs-only between") {
    val p = plan("flow_bytes_quantiles_kll")
    assert(p.collect { case a: ObjectHashAggregateExec => a }.size >= 4,
      "(proto, day) partials then per-proto merge, each partial+final")
  }

  // ---- text / training pipeline -----------------------------------------

  test("text_fingerprint: exactly ONE md5 evaluation in the optimized plan") {
    val s = q("text_fingerprint").queryExecution.optimizedPlan.toString
    val n = "md5\\(".r.findAllIn(s).size
    assert(n === 1, s"expected one md5 call, plan shows $n (the r3 doubled-digest regression)")
  }

  test("text_tfidf_topk: rank filter plans as WindowGroupLimit, one corpus scan, df is an aggregate not a hot-term window") {
    val p = plan("text_tfidf_topk")
    assert(p.collect { case w: WindowGroupLimitExec => w }.size >= 2,
      "rank<=k must plan as partial+final WindowGroupLimit")
    assert(scans(p).size === 1, "df must derive from the reduced tf relation, not a re-scan")
    // r14 rewrite: df = groupBy(term).count JOINED back — a
    // `count over (partition by term)` window buffers the entire
    // hot-term partition ("the": df ~ corpus) in ONE task
    p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      .foreach { w =>
        assert(w.partitionSpec.exists(_.references.exists(_.name == "doc_id")),
          "every remaining window must partition by doc_id (vocab-bounded), " +
            "never by term (corpus-bounded hot keys)")
      }
  }

  test("text_pmi_topk: one scan+explode, top-k is TakeOrderedAndProject, marginal windows ride the reduced bigram relation") {
    val p = plan("text_pmi_topk")
    assert(scans(p).size === 1)
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.size === 1)
    // r14 A/B kept the windows (aggregate+join measured ~2x slower,
    // BENCH_text_ab_r14.json) — they are sound BECAUSE each partition is
    // vocabulary-bounded AND they consume the (x,y)-grain aggregate, not
    // bigram occurrences; the aggregate below every window pins that
    p.collect { case w: WindowExec => w }.foreach { w =>
      assert(w.partitionSpec.nonEmpty, "marginal windows must partition by word")
      assert(w.find {
        case _: HashAggregateExec => true
        case _: ObjectHashAggregateExec => true
        case _ => false
      }.isDefined, "marginal windows must run over the reduced bigram relation")
    }
  }

  test("text_bow_dedup: canonical pick is a map-combined aggregate — no window over the dup cluster; digests only in exchanges") {
    val p = plan("text_bow_dedup")
    noTextInExchanges(p)
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      "min_by/count must fold as partial+final aggregates — a window over " +
        "bow_key lands a boilerplate mega-cluster in one task (r13 weak spot)")
    assert(scans(p).size === 1)
  }

  test("text_ngram_topk: ONE Generate, top-k is TakeOrderedAndProject (the measured 50M winner)") {
    val p = plan("text_ngram_topk")
    assert(p.collect { case g: GenerateExec => g }.size === 1)
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.size === 1)
  }

  test("text_pack: packing window exchange carries (source, ids, counts) — never document text") {
    val p = plan("text_pack")
    assert(hashShuffles(p).size === 1, "pack window + final agg share the source exchange")
    noTextInExchanges(p)
  }

  test("text_prep_pipeline: chunk/dedup/pack DAG — two key exchanges, text in NO exchange") {
    val p = plan("text_prep_pipeline")
    assert(hashShuffles(p).size === 2,
      "dedup window on h + pack window on source (the final agg is co-partitioned)")
    noTextInExchanges(p)
  }

  test("dedup_minhash_lsh: shuffles carry only ids/hashes/signatures — never text") {
    noTextInExchanges(plan("dedup_minhash_lsh"))
  }

  // ---- events ------------------------------------------------------------

  test("events_dau_wau: fact scanned once; DAU and WAU derive from the materialized distinct") {
    val p = plan("events_dau_wau")
    assert(scans(p).isEmpty,
      "both heads must read the ONE materialized (day, user) distinct, not re-scan the fact table")
    assert(p.collect { case g: GenerateExec => g }.size === 1, "the x7 day fan-out")
  }

  test("events_gap_sessions: lag, session id and aggregate share one user exchange") {
    val p = plan("events_gap_sessions")
    assert(hashShuffles(p).size === 1,
      "three window/agg passes must share the single user_id exchange")
  }

  test("events_transitions: per-user lead window then partial+final (from,to) aggregate") {
    val p = plan("events_transitions")
    assert(p.collect { case w: WindowExec => w }.size === 1)
    assert(p.collect { case e: ExpandExec => e }.size <= 1,
      "distinct-users is the only Expand, over the windowed relation")
  }

  // ---- relational / graph ------------------------------------------------

  test("rel_shipping_priority: both date predicates pushed, broadcast dim, top-10 TakeOrdered") {
    val p = plan("rel_shipping_priority")
    val pf = pushed(p)
    assert(pf.contains("o_orderdate") && pf.contains("l_shipdate"),
      s"date predicates must reach the scans: $pf")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "customer segment side must broadcast")
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.size === 1)
  }

  test("rel_interval_join: prefix-sum range count — no cartesian; BNLJ only for scalar bounds") {
    val p = plan("rel_interval_join")
    assert(p.collect { case j: CartesianProductExec => j }.isEmpty)
    // the one legitimate nested-loop cross: the broadcast 1-row (lo, hi)
    // bounds aggregate (a scalar, not a relation — grouping keys empty)
    p.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      val scalarAgg = j.collect {
        case a: HashAggregateExec if a.groupingExpressions.isEmpty => a
      }
      assert(scalarAgg.nonEmpty,
        "BroadcastNestedLoopJoin against something that is not a scalar bounds aggregate")
    }
  }

  test("flow_ip_pagerank: sweep shuffles carry only long columns; top-20 TakeOrdered; no global sort") {
    // checkpointEvery > iters exposes the full stacked-sweep plan the
    // contract describes (the default per-sweep cut hides earlier sweeps
    // behind materialized RDD scans — itself asserted in FlowQueriesSpec)
    val p = physical(graft.flow.FlowQueries.ipPageRank(spark, sf, checkpointEvery = 100))
    val exs = hashShuffles(p)
    assert(exs.nonEmpty)
    exs.foreach { e =>
      assert(e.output.size <= 3,
        s"sweep exchange wider than the graph triple: ${e.output.map(_.name)}")
      e.output.foreach(a => assert(a.dataType == LongType,
        s"non-long column ${a.name} in a sweep exchange — no float anywhere"))
    }
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.size === 1)
    assert(p.collect { case s: SortExec if s.global => s }.isEmpty,
      "no global sort (SMJ-local sorts are fine)")
  }

  test("flow_lpm_enrich: route dim broadcasts, candidates equi-join, no range/nested-loop join") {
    val p = plan("flow_lpm_enrich")
    assert(p.collect { case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
      .nonEmpty, "prefix dimension must join as BroadcastHashJoin")
    assert(p.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, "LPM must never plan a cartesian / nested-loop join")
    // exactly one Generate: the static candidate expansion
    assert(p.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }.size === 1)
    // the deepest-match reduction (the seq-keyed aggregate over the
    // candidate stream) is a HASH aggregate over the packed-long key — a
    // struct max would fall back to SortAggregate (per-partition sort of
    // the candidate stream). The dimension's own 25-row dedup may
    // sort-aggregate freely; only the fact-sized reduction is bound.
    def groupsOnSeq(es: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]) =
      es.exists(_.name == "seq")
    assert(p.collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if groupsOnSeq(h.groupingExpressions) => h
    }.nonEmpty, "deepest-match reduction must be a HashAggregate")
    assert(p.collect {
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec
        if groupsOnSeq(s.groupingExpressions) => s
    }.isEmpty, "deepest-match must hash-aggregate, not sort-aggregate")
  }

  test("flow_anomaly_zscore: one fact scan; moments come back via broadcast join") {
    val p = plan("flow_anomaly_zscore")
    assert(scans(p).size === 1, "fact table must be scanned exactly once")
    assert(p.collect { case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
      .nonEmpty, "per-proto moments must broadcast back onto the minute relation")
  }

  test("rel_bloom_semi: might_contain prunes the fact scan BELOW the semi-join exchange") {
    val p = physical(graft.operators.RelQueries.bloomSemiJoin(spark, sf))
    val semi = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType.sql == "LEFT SEMI" => j
    }
    assert(semi.nonEmpty, "exact LeftSemi join must remain in the plan")
    // the bloom predicate must sit on the fact side UNDER the semi join
    val underSemi = semi.head.left.toString + semi.head.right.toString
    assert(underSemi.contains("might_contain"),
      "bloom prefilter must prune before the join, not after")
  }

  // ---- r13 full-sweep additions (verdict #8): the remaining batch
  // PLANS.md "Must show" contracts. Streaming/managed-layout contracts
  // (stream_neardup batch/horizon, flow_raw_time_range_managed,
  // sim_knn_ivf_indexed manifest pruning) stay in their focused suites —
  // they need seeded indexes/streams this registry-shaped suite can't build.

  test("flow_rollup_5m: partial+final hash aggregate around ONE exchange") {
    val p = plan("flow_rollup_5m")
    assert(hashShuffles(p).size === 1, "one rollup-key exchange")
    assert(p.collect { case a: HashAggregateExec => a }.size >= 2, "partial+final")
  }

  test("flow_top_bytes_per_proto: GroupTopK partial+final, no sort below the top-k") {
    val p = plan("flow_top_bytes_per_proto")
    val topks = p.collect { case g: graft.plans.GroupTopKExec => g }
    assert(topks.size === 2, "per-group top-k must plan as partial+final GroupTopKExec")
    // no sort UNDER the top-k (the trailing presentation orderBy above it,
    // over <= |protos|·k rows, is fine)
    topks.foreach(g => assert(g.collect { case s: SortExec => s }.isEmpty,
      "GroupTopK exists to avoid sorting the fact relation"))
  }

  test("text_source_cap: GroupTopK partial+final — a hot source ships <= cap rows per partition") {
    val p = plan("text_source_cap")
    assert(p.collect { case g: graft.plans.GroupTopKExec => g }.size === 2)
  }

  test("sim_cosine_dup_pairs: embeddings never cross an exchange; pair dedup aggregates ids only") {
    val p = plan("sim_cosine_dup_pairs")
    hashShuffles(p).foreach(e => e.output.foreach(a =>
      assert(!a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
        s"embedding array '${a.name}' crossed a shuffle — must re-attach by id join")))
  }

  test("sim_knn_ivf: assignment is a zero-exchange argmax; the corpus array never shuffles") {
    val p = plan("sim_knn_ivf")
    hashShuffles(p).foreach(e => e.output.foreach(a =>
      assert(!a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
        s"embedding array '${a.name}' crossed a shuffle — assignment must stay map-side")))
  }

  test("flow_enrich: two left-outer broadcast joins, zero fact-side shuffle") {
    val p = plan("flow_enrich")
    // src + dst dimension attach (the dim-BUILD subtree may add its own
    // small broadcast join; the bound is that nothing joins any other way)
    val outer = p.collect { case j: BroadcastHashJoinExec if j.joinType.sql == "LEFT OUTER" => j }
    assert(outer.size === 2, s"src+dst AS joins must be left-outer broadcasts, got ${outer.size}")
    assert(p.collect {
      case j: SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty, "no shuffle-based join anywhere in the enrichment plan")
    assert(hashShuffles(p).isEmpty, "the fact side must never shuffle for enrichment")
  }

  test("flow_enrich_asof: the fill window hashes on (key, time-bucket) so hot keys fan out") {
    val p = plan("flow_enrich_asof")
    val kb = hashShuffles(p).filter { e =>
      val names = e.outputPartitioning.asInstanceOf[HashPartitioning]
        .expressions.flatMap(_.references.map(_.name)).toSet
      names.exists(_.contains("__k")) && names.exists(_.contains("__b"))
    }
    assert(kb.nonEmpty,
      "as-of fill must partition on (__k, __b) — key AND bucket, never key alone")
  }

  test("q1_agg: classic partial+final aggregate; scan pruned to the 4 touched columns") {
    val p = plan("q1_agg")
    assert(p.collect { case a: HashAggregateExec => a }.size >= 2)
    val sc = scans(p)
    assert(sc.nonEmpty)
    assert(sc.head.schema.fieldNames.toSet ===
      Set("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"),
      s"scan reads ${sc.head.schema.fieldNames.mkString(",")}")
  }

  test("flow_ip_anon: keys stay numeric through both distinct exchanges; render above the aggregate") {
    val p = plan("flow_ip_anon")
    hashShuffles(p).foreach(e => e.output.foreach(a =>
      assert(a.dataType != StringType,
        s"rendered string '${a.name}' below the final aggregate")))
  }

  test("dedup_substring_spans: ONE window-build Generate; everything after moves the reduced relation") {
    val p = plan("dedup_substring_spans")
    assert(p.collect { case g: GenerateExec => g }.size === 1,
      "exactly one Generate — the window build; a second means a corpus re-explode")
    noTextInExchanges(p)
  }

  test("rel_rollup_agg: grouping sets compile to ONE Expand over ONE pruned scan") {
    val p = plan("rel_rollup_agg")
    assert(p.collect { case e: ExpandExec => e }.size === 1,
      "ROLLUP must be one Expand, not a per-level union of re-scans")
    assert(scans(p).size === 1)
    assert(scans(p).head.schema.fieldNames.length <= 3,
      s"scan must prune to the 3 touched columns, reads ${scans(p).head.schema.fieldNames.mkString(",")}")
  }

  test("flow_anomaly_mad: one fact scan; both medians broadcast back onto the minute relation") {
    val p = plan("flow_anomaly_mad")
    assert(scans(p).size === 1,
      "fact table scanned once — the three perMin uses must share one aggregate subtree")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.size >= 2,
      "median and MAD are broadcast ≤|protos|-row relations")
    // every median window is proto-partitioned — never a global sort
    p.collect { case w: WindowExec => w }.foreach(w =>
      assert(w.partitionSpec.nonEmpty, "median windows must partition by proto"))
  }

  test("sketch quantile segmentation twins: no NTILE window anywhere; cut points attach as a broadcast") {
    for (name <- Seq("events_rfm_sketch", "rel_customer_quartiles_sketch")) {
      val p = plan(name)
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"$name: the sketch twin exists to avoid the global NTILE sort")
      assert(p.collect { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty,
        s"$name: the 1-row cut relation must attach as a broadcast")
    }
  }

  test("events_rfm: adaptive rank — pinned dimension + NTILE at gate SF; range-partitioned rank (no funnel) in the fact regime (r19)") {
    // DIMENSION regime (gate SF sits far under rankThreshold): chained
    // NTILE windows over ONE single-partition pass of the PINNED per-user
    // relation — the measured-faster form at dimension sizes (r19 A/B)
    val p = plan("events_rfm")
    assert(scans(p).isEmpty,
      "rank scoring must serve from the pinned per-user relation, not re-scan events")
    assert(p.collect { case a: HashAggregateExec => a }.nonEmpty)
    // FACT regime (rankThreshold = 0 forces it): no NTILE funnel — rank is
    // a range-partitioned parallel sort; the only unpartitioned windows
    // run over the P-row per-partition offsets relations
    val pf = physical(graft.operators.EventOps.rfm(spark, sf, 5, rankThreshold = 0L))
    assert(scans(pf).isEmpty)
    pf.collect { case w: WindowExec => w }.foreach { w =>
      assert(!w.windowExpression.exists(_.sql.toLowerCase.contains("ntile")),
        "the NTILE single-task funnel must not reappear in the fact regime (r18 verdict #3)")
      if (w.partitionSpec.isEmpty)
        assert(w.child.collectFirst {
          case a: HashAggregateExec
            if a.groupingExpressions.exists(_.sql.contains("__p")) => a
        }.isDefined,
          "an unpartitioned window may only run over the P-row per-partition " +
          "offsets relation, never the per-user relation")
    }
  }

  test("dedup_cross_source: digests-only exchanges; the self-join shares one aggregate subtree") {
    val p = plan("dedup_cross_source")
    noTextInExchanges(p)
    assert(scans(p).size <= 2, "both self-join sides are the same reduced relation")
  }

  test("sim_ann_recall: rank lists compare by id — no embedding array crosses a shuffle") {
    val p = plan("sim_ann_recall")
    hashShuffles(p).foreach(e => e.output.foreach(a =>
      assert(!a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
        s"embedding array '${a.name}' crossed a shuffle")))
  }

  test("flow_src_hhi: two reduction exchanges, no join, scan pruned to (ts, src)") {
    val p = plan("flow_src_hhi")
    assert(hashShuffles(p).size === 2,
      "fact → (minute, src) counts → minute grain: exactly two hash exchanges")
    assert(p.collect { case j: BroadcastHashJoinExec => j
                       case j: SortMergeJoinExec => j }.isEmpty, "no joins")
    assert(scans(p).size === 1)
    assert(scans(p).head.schema.fieldNames.length <= 3,
      s"scan must prune to the time + src columns, reads ${scans(p).head.schema.fieldNames.mkString(",")}")
  }

  test("flow_ewma_forecast: lag window partitioned by proto over the reduced minute relation") {
    val p = plan("flow_ewma_forecast")
    assert(scans(p).size === 1)
    p.collect { case w: WindowExec => w }.foreach(w =>
      assert(w.partitionSpec.nonEmpty, "lag window must partition by proto — never a global sort"))
    assert(p.collect { case a: HashAggregateExec => a }.size >= 2,
      "minute-grain reduction is a partial+final hash aggregate")
  }

  test("flow_ip_degree_dist: distinct-edge + per-src + bucket reductions, no join") {
    val p = plan("flow_ip_degree_dist")
    assert(p.collect { case j: BroadcastHashJoinExec => j
                       case j: SortMergeJoinExec => j }.isEmpty, "no joins")
    assert(scans(p).size === 1)
    assert(hashShuffles(p).size <= 3, "edge-distinct, per-src, bucket: at most three exchanges")
  }

  test("events_cohort_ltv: cumulative window partitioned by cohort; no cartesian") {
    val p = plan("events_cohort_ltv")
    p.collect { case w: WindowExec => w }.foreach(w =>
      assert(w.partitionSpec.nonEmpty, "running LTV must partition by cohort_week"))
    assert(p.collect { case c: CartesianProductExec => c
                       case c: BroadcastNestedLoopJoinExec => c }.isEmpty)
  }

  test("flow_traffic_matrix: serving plan reads the pinned cells — no fact re-scan; broadcast 1-row share") {
    val p = plan("flow_traffic_matrix")
    assert(scans(p).isEmpty,
      "both the output and the total branch must read the pinned cell relation — " +
        "a FileSourceScan here means the total re-scanned the fact table")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty, "no sort-merge join")
    assert(hashShuffles(p).isEmpty, "the cell relation is already aggregated and pinned")
  }

  test("rel_market_share: dims broadcast, ONE conditional aggregate pass, no second fact branch") {
    val p = plan("rel_market_share")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.size >= 2,
      "supplier and nation must broadcast — never shuffle the fact on their keys")
    assert(scans(p).count(_.toString.contains("lineitem")) === 1,
      "slice + total come from one conditional aggregate — one lineitem scan")
  }

  test("rel_promo_share: part broadcasts; single lineitem scan; partial+final aggregate") {
    val p = plan("rel_promo_share")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.size === 1)
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty)
    assert(scans(p).size === 2, "lineitem + part, once each")
    assert(p.collect { case a: HashAggregateExec => a }.size >= 2)
  }

  test("events_user_activity_dist: no joins; scan prunes to user_id alone") {
    val p = plan("events_user_activity_dist")
    assert(p.collect { case j: BroadcastHashJoinExec => j
                       case j: SortMergeJoinExec => j }.isEmpty, "no joins")
    assert(scans(p).size === 1)
    assert(scans(p).head.schema.fieldNames.toSeq === Seq("user_id"),
      s"histogram needs only user_id, reads ${scans(p).head.schema.fieldNames.mkString(",")}")
  }

  test("dedup_threshold_curve: text never crosses an exchange; spine join is broadcast over O(1) buckets") {
    val p = plan("dedup_threshold_curve")
    noTextInExchanges(p)
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty, "no cartesian")
    // the non-equi spine joins are BNLJ over <= 11-row broadcast bucket
    // relations — bounded; anything larger in a BNLJ build is a regression
    p.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      assert(j.buildSide.toString.contains("Right") || j.buildSide.toString.contains("Left"))
    }
  }

  test("sim_cos_hist: embedding arrays never cross a shuffle; histogram is a bounded aggregate") {
    val p = plan("sim_cos_hist")
    hashShuffles(p).foreach(e => e.output.foreach(a =>
      assert(!a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
        s"embedding array '${a.name}' crossed a shuffle")))
    assert(p.collect { case a: HashAggregateExec => a }.nonEmpty)
  }

  test("multimodal_dedup: payload blobs never cross an exchange — digests only") {
    val p = plan("multimodal_dedup")
    p.collect { case e: ShuffleExchangeExec => e }.foreach(e => e.output.foreach(a =>
      assert(a.name != "payload", "payload blob crossed an exchange")))
  }

  test("multimodal_near_dup: payload decodes in the scan stage; no exchange carries it (r15)") {
    val p = plan("multimodal_near_dup")
    p.collect { case e: ShuffleExchangeExec => e }.foreach(e => e.output.foreach(a =>
      assert(a.name != "payload", "payload blob crossed an exchange")))
  }

  test("multimodal_knn: per-modality serving — no exchange carries the payload (r15)") {
    val p = plan("multimodal_knn")
    p.collect { case e: ShuffleExchangeExec => e }.foreach(e => e.output.foreach(a =>
      assert(a.name != "payload", "payload blob crossed an exchange")))
  }

  test("text_freq_spectrum: no global sort below the bucket fold; text never crosses an exchange") {
    val p = plan("text_freq_spectrum")
    noTextInExchanges(p)
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      "the spectrum needs no rank window — that would be a vocabulary-wide global sort")
    assert(p.collect { case j: BroadcastHashJoinExec => j
                       case j: SortMergeJoinExec => j }.isEmpty, "no joins")
  }

  test("text_len_pctiles: corpus reduces to the (lang, n_chars) grain BELOW the rank windows (r14 shard rewrite)") {
    val p = plan("text_len_pctiles")
    noTextInExchanges(p)
    p.collect { case w: WindowExec => w }.foreach { w =>
      assert(w.partitionSpec.nonEmpty, "cumulative windows must partition by lang")
      // the windows must consume the GRAIN aggregate, not document rows:
      // an aggregate (partial+final pair) sits beneath every window
      assert(w.find {
        case _: HashAggregateExec => true
        case _: ObjectHashAggregateExec => true
        case _ => false
      }.isDefined,
        "rank arithmetic must run over the (lang, n_chars)-grain " +
          "histogram — a per-document window is a one-task external " +
          "sort for a web-scale language (r13 weak spot)")
    }
    assert(scans(p).size === 1)
    assert(scans(p).head.schema.fieldNames.toSet === Set("lang", "n_chars"),
      s"scan must prune to the two grain columns, reads ${scans(p).head.schema.fieldNames.mkString(",")}")
  }

  test("rel_top_supplier: quarter predicate pushed; ONE lineitem scan feeds revenue and max; broadcasts only") {
    val p = plan("rel_top_supplier")
    assert(pushed(p).contains("GreaterThanOrEqual"),
      "ship-quarter bounds must reach the parquet scan")
    assert(scans(p).count(_.toString.contains("lineitem")) === 1,
      "the max branch must reuse the revenue aggregate's exchange, not re-scan")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty, "max + name lookup broadcast")
  }

  test("events_ab_test: two aggregate stages fold to one row; no join, no window") {
    val p = plan("events_ab_test")
    assert(p.collect { case j: BroadcastHashJoinExec => j
                       case j: SortMergeJoinExec => j }.isEmpty, "conditional sums, not a join")
    assert(p.collect { case w: WindowExec => w }.isEmpty)
    assert(scans(p).size === 1)
  }

  test("dedup_lsh_eval: both pair pipelines ship digests only — text never crosses an exchange") {
    noTextInExchanges(plan("dedup_lsh_eval"))
  }

  test("rel_table_profile: two hash-friendly branches; Expand path never sort-aggregates") {
    val p = plan("rel_table_profile")
    // one column-pruned scan per branch (distincts / min-max), no more
    assert(scans(p).size === 2, "profile is exactly the two measured branches")
    assert(p.collect { case e: org.apache.spark.sql.execution.ExpandExec => e }.size === 1,
      "multi-distinct must compile to ONE Expand")
    // the r13 lesson: min/max(STRING) in the same aggregate dragged the
    // Expand relation through SortAggregate (9.3 s vs 2.2-4.3 s measured).
    // Grouped aggregates must all hash; only the keyless min/max fold
    // (which never sorts) may be a SortAggregate.
    p.collect { case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec => s }
      .foreach(s => assert(s.groupingExpressions.isEmpty,
        "a keyed SortAggregate crept back into the profile plan"))
  }

  // ---- round-13 fourth/fifth wave ---------------------------------------

  test("flow_bidir_ratio: join-free canonical-pair aggregate; top pairs via TakeOrdered") {
    val p = plan("flow_bidir_ratio")
    assert(p.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      "pair canonicalization must not self-join the fact against its reversed projection")
    assert(scans(p).size === 1)
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.size === 1)
  }

  test("flow_pkt_size_dist: one scan, one hash exchange, no joins") {
    val p = plan("flow_pkt_size_dist")
    assert(p.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty)
    assert(scans(p).size === 1)
    assert(hashShuffles(p).size === 1, "partial+final aggregate around ONE exchange")
  }

  test("rel_customer_distribution: the per-customer count folds below the single outer join") {
    val p = plan("rel_customer_distribution")
    val joins = p.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.size === 1, "one customer<->counts join")
    assert(joins.head.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }.nonEmpty,
      "raw order rows must never reach the join — counts aggregate below it")
  }

  test("rel_small_qty_revenue: per-part aggregate broadcasts; lineitem never shuffles on partkey") {
    val p = plan("rel_small_qty_revenue")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "the reduced per-part relation must broadcast back onto lineitem")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty)
    assert(scans(p).size === 2, "base + per-part aggregate branch, once each")
  }

  test("rel_order_priority: date window pushed; lateness rides the LeftSemi join condition") {
    val p = plan("rel_order_priority")
    assert(pushed(p).contains("GreaterThanOrEqual(o_orderdate"),
      "the quarter bounds must prune the orders scan")
    val semis = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType.toString == "LeftSemi" => j }
    assert(semis.size === 1, "EXISTS plans as one left-semi join")
    assert(semis.head.condition.nonEmpty,
      "the lateness predicate must live in the join condition (probe-time filter)")
  }

  test("rel_nation_traffic: four broadcast dims, single lineitem scan, no cartesian") {
    val p = plan("rel_nation_traffic")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.size >= 4,
      "customer/supplier/nation x2 must broadcast")
    assert(scans(p).count(_.toString.contains("lineitem")) === 1)
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
  }

  test("rel_sales_opportunity: broadcast 1-row average, anti join, orders pruned to one column") {
    val p = plan("rel_sales_opportunity")
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType.toString == "LeftAnti" => j }.size === 1,
      "never-ordered plans as one left-anti join")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
    val orderScans = scans(p).filter(_.toString.contains("orders"))
    assert(orderScans.nonEmpty &&
      orderScans.forall(_.schema.fieldNames.toSeq === Seq("o_custkey")),
      "the anti side must read only o_custkey")
  }

  test("sim_label_centroids: Generate-free one-pass moments; blob-only object aggregate") {
    val p = plan("sim_label_centroids")
    assert(p.collect { case g: GenerateExec => g }.isEmpty,
      "centroid sums must come from vec_sums, not a corpus x dims posexplode")
    assert(p.collect { case a: ObjectHashAggregateExec => a }.size >= 2,
      "partial+final vec_sums fold")
    assert(p.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty)
  }

  test("sim_centroid_outliers: moments broadcast onto the corpus; top-k is TakeOrdered") {
    val p = plan("sim_centroid_outliers")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "the |labels|-row moments relation must broadcast — the corpus never shuffles for the join")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty)
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.size === 1)
  }

  test("sim_centroid_pairs: the triangular pair join is an NLJ over the reduced |labels| relation") {
    val p = plan("sim_centroid_pairs")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty &&
      p.collect { case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }.isEmpty,
      "no shuffled join — pairs form over broadcast blobs")
    assert(p.collect { case a: ObjectHashAggregateExec => a }.nonEmpty,
      "the corpus folds through vec_sums exactly once")
  }

  test("text_stopword_df: per-doc dedup before the explode; text never crosses an exchange") {
    val p = plan("text_stopword_df")
    noTextInExchanges(p)
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.size === 1)
    assert(scans(p).size <= 2, "term pass + corpus-total pass only")
  }

  test("text_ttr_by_source: join-free single scan; text never crosses an exchange") {
    val p = plan("text_ttr_by_source")
    noTextInExchanges(p)
    assert(p.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty)
    assert(scans(p).size === 1)
  }

  test("text_bigram_coverage: ONE pinned explode; top list broadcasts onto the reduced grain") {
    val p = plan("text_bigram_coverage")
    noTextInExchanges(p)
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "the 100-row top list must broadcast — membership never shuffles occurrence rows")
    // r13 rewrite: the (source, bigram) grain aggregates once and is
    // PINNED (materializeOnce), so the serving plan reads the checkpointed
    // relation — NO parquet scan, and the corpus is never exploded twice
    assert(scans(p).isEmpty,
      "both heads must read the pinned occurrence grain, not re-scan the corpus")
  }

  test("text_quality_model: serving is ONE map-side scan — no join, no generate, no hash shuffle") {
    val p = plan("text_quality_model")
    noTextInExchanges(p)
    assert(p.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      "the vocabulary-sized model must ride the kernel, not a join")
    assert(p.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }.isEmpty,
      "serving must not explode token ids")
    assert(hashShuffles(p).isEmpty,
      "scoring is per-document — only the presentation sort may exchange")
    assert(scans(p).size === 1)
  }

  test("text_quality_model_weights: training exchange carries vocabulary-grain partials, never doc ids or text") {
    val p = plan("text_quality_model_weights")
    noTextInExchanges(p)
    p.collect { case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[HashPartitioning] => e }
      .foreach { e =>
        e.output.foreach(a => assert(a.name != "doc_id",
          "doc ids must not cross the training exchange — the stats are token-grain"))
      }
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "the token-name attach must broadcast the |vocab|+1 relation")
  }
}
