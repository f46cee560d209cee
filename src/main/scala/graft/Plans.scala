package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev artifact generator: dumps `explain(formatted)` for the headline
  * queries into PLANS.md, with a note on what each plan must show. Run:
  * `sbt "runMain graft.Plans [sfDir]"`. Regenerated per round so plan
  * regressions (lost pushdown, surprise shuffles, codegen breaks) show up
  * in review diffs.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val picks: Seq[(String, String)] = Seq(
      "flow_rollup_5m" -> ("partial+final HashAggregate around ONE exchange; " +
        "scan reads only the projected event columns"),
      "flow_time_filter" -> "time-range predicate reaches the parquet scan (PushedFilters)",
      "flow_top_src_ip" -> ("grouping on NUMERIC (ip, etype) — codec render appears " +
        "ABOVE the aggregate, TakeOrderedAndProject for the top-N (no global sort)"),
      "flow_top_bytes_per_proto" -> ("custom GroupTopKExec partial+final around a " +
        "k-bounded exchange; no SortExec below the top-k"),
      "flow_sessions" -> "single window shuffle on the 5-tuple key, then hash aggregate",
      "dedup_minhash_lsh" -> ("shuffles carry only ids/hashes; shingle UDF evaluated " +
        "once per side (no UDF inside Filter)"),
      "sim_cosine_dup_pairs" -> ("bucket equality join on signatures; distinct over id " +
        "pairs only; embeddings re-attached by id joins"),
      "sim_knn_ivf" -> ("broadcast centroid-ARRAY; assignment is a zero-exchange " +
        "argmax projection (no groupBy(vec_id) shuffle of the corpus)"),
      "flow_enrich" -> ("two LeftOuter BroadcastHashJoins on the AS dimension; " +
        "ZERO fact-side exchange (no ShuffleExchange below the joins)"),
      "flow_enrich_asof" -> ("the fill Window's exchange hashes on (__k, __b) — key " +
        "AND time bucket, so a hot key fans out across tasks; the boundary-seed side " +
        "is a small distinct (k,b) probe joined to the dim, NOT a broadcast of the " +
        "version history sized by the fact table"),
      "ops_rate_sum" -> ("one window exchange per series partition (range frame), " +
        "then partial+final hash aggregate for the BY clause"),
      "text_source_cap" -> ("custom GroupTopKExec partial+final — a hot source " +
        "ships <= cap rows per input partition, never its full row set"),
      "text_fingerprint" -> ("ONE md5 in the projection — fp64 derives from the " +
        "content_md5 alias; the doubled regexp+digest was the r3 +57% regression"),
      "q1_agg" -> "classic partial+final agg; column pruning to the 4 touched columns",
      "flow_ip_anon" -> ("distinct-count runs as the standard two-phase " +
        "(key, src_ip) partial agg — keys stay NUMERIC through both " +
        "exchanges; the /24 render appears only above the final aggregate"),
      "text_pack" -> ("the packing window exchanges on SOURCE (shards pack " +
        "in parallel) and its sort/window input carries only (source, " +
        "doc_id, token_count) — document text never crosses the exchange"),
      "text_prep_pipeline" -> ("chunk -> dedup -> pack in one DAG: chunking " +
        "and the md5 digest evaluate inside the scan stage; the three " +
        "exchanges (dedup window on h, pack window on source, final agg) " +
        "carry (digest, ids, length) — chunk text appears in NO exchange"),
      "dedup_stream_neardup_batch" -> ("the micro-batch keep plan against a seeded " +
        "index: cross-batch candidates come from a PRUNED band-index scan (file list " +
        "= probed buckets only, not the corpus); verify joins carry (id, hash) " +
        "columns only; output anti-joins the drop set — per-batch cost is " +
        "O(probed buckets × index/N), not O(corpus seen)"),
      "dedup_stream_neardup_horizon" -> ("the horizon-bounded probe of the SAME " +
        "micro-batch shape: the band-index scan's file list excludes files whose " +
        "manifest-recorded (min,max) src_batch lies wholly below the horizon (here " +
        "batch 4 probing [2,4): batch-0/1 files absent from the InMemoryFileIndex, " +
        "zero footer reads), and the residual predicate pushes " +
        "src_batch >= lo AND < hi into the surviving files' row groups — per-batch " +
        "join input is O(horizon), not O(corpus lifetime)"),
      "sim_knn_ivf_indexed" -> ("the materialized-IVF serving plan: the cells scan " +
        "lists ONLY the probed cells' files (manifest prune, no footer reads " +
        "elsewhere); probes broadcast; re-rank reads embeddings from the pruned " +
        "subset — no second corpus join"),
      "flow_raw_time_range_managed" -> ("a 1-hour window on a 3-day managed raw " +
        "table: the scan's file list comes from the MANIFEST's per-file (min,max) " +
        "timeReceived stats — only the overlapping day's file appears (1 of 3; the " +
        "ClickHouse ORDER BY TimeReceived range-scan parity, zero footer reads for " +
        "skipped files); the residual time predicate pushes into the surviving " +
        "files' row-group stats"),
      "dedup_substring_spans" -> ("ONE Generate (window build) in the final plan — " +
        "the raw window relation feeds a single partial-combined (h, doc) " +
        "aggregate; frequency agg, frequency join and per-doc fold all move the " +
        "REDUCED relation; no corpus-sized cache, no count-over-window sort of a " +
        "hot boilerplate hash"),
      "rel_shipping_priority" -> ("Q3-shaped star join: BOTH date predicates reach " +
        "their parquet scans (PushedFilters on o_orderdate / l_shipdate), the " +
        "customer segment filter broadcasts, orders⋈lineitem is the single " +
        "fact-side shuffle join, TakeOrderedAndProject for the top-10 (no global " +
        "sort)"),
      "flow_heavy_hitters_sketch" -> ("the SpaceSaving TypedImperativeAggregate " +
        "plans as ObjectHashAggregate partial+final around ONE exchange — only " +
        "the serialized sketch (<= capacity entries) crosses it, never the item " +
        "stream; posexplode projects ABOVE the final aggregate"),
      "rel_rollup_agg" -> ("ROLLUP grouping sets compile to ONE Expand feeding a " +
        "single partial+final aggregate over the fact scan — not a per-level " +
        "union of re-scans; scan prunes to the 3 touched columns"),
      "events_dau_wau" -> ("the corpus-sized (day, user) distinct materializes ONCE " +
        "(no FileScan in the final plan — both heads read the checkpointed relation); " +
        "DAU is a count over it, WAU fans it out x7 via ONE Generate — the events " +
        "fact table is scanned exactly once, at materialization"),
      "flow_unique_src_overlap" -> ("ONE fact scan; per-day theta sketches via " +
        "partial+final ObjectHashAggregate (only serialized blobs cross the " +
        "exchange); consecutive-day pairing is a lead WINDOW over the " +
        "one-row-per-day relation — no self-join, no second scan; intersection " +
        "is a scalar over two blobs"),
      "flow_bytes_quantiles_kll" -> ("two ObjectHashAggregate levels — (proto, day) " +
        "KLL partials then per-proto merge — each partial+final; between them only " +
        "fixed-size sketch blobs cross the one exchange, never byte counts"),
      "text_tfidf_topk" -> ("ONE corpus scan+explode; df is a map-combined " +
        "AGGREGATE over the reduced tf relation joined back (exchange reuse " +
        "keeps one scan) — never a count window partitioned by term, whose " +
        "hot-term partition ('the': df ~ corpus) buffers in ONE task; the " +
        "rank<=k filter plans as partial+final WindowGroupLimit — bounded " +
        "per-document state, no full sort per doc"),
      "text_pmi_topk" -> ("ONE corpus scan+explode into a partial-combined pair " +
        "aggregate; PMI marginals are two sum WINDOWS over the vocab²-sized " +
        "bigram relation — KEPT after an r14 same-data A/B (aggregate+join " +
        "~2x slower; partitions are vocabulary-bounded, no hot-key funnel); " +
        "final top-k is TakeOrderedAndProject (per-partition " +
        "heaps, no global sort)"),
      "events_gap_sessions" -> ("lag, running-sum session id, and the final " +
        "aggregate ALL share the user_id exchange — one shuffle for three " +
        "window/agg passes"),
      "events_transitions" -> ("per-user lead window then a partial+final hash " +
        "aggregate on (from, to); the distinct-users count is the only Expand, " +
        "over the already-windowed relation"),
      "rel_interval_join" -> ("prefix-sum range COUNT: no pair materialization " +
        "at all — per-day ship counts + a calendar-sized cumulative window, " +
        "BROADCAST into two equi-joins against orders (the pairwise form " +
        "benched 58.9 s at sf0.1 because the week predicate genuinely matches " +
        "~250M pairs that the count then throws away)"),
      "flow_ip_pagerank" -> ("ONE sweep join in the final plan (every earlier sweep " +
        "is a materialized rank relation behind the per-sweep lineage cut — plan " +
        "depth O(1) per sweep, r13); exchanges ship only long columns, partial+final " +
        "sum per sweep; final top-20 is TakeOrderedAndProject — no global sort, no " +
        "float anywhere"),
      "ops_histogram_quantile" -> ("ONE fixed-width hash aggregate (partial+" +
        "final) builds every le bucket; the quantile cascade is pure projection " +
        "— no second pass over the fact table"),
      "text_ngram_topk" -> ("ONE explode into a partial-combined string count; " +
        "final top-k is TakeOrderedAndProject — the measured winner at 50M rows " +
        "(a two-phase hash-candidate variant benched 40% slower: explode CPU, " +
        "not exchange width, dominates at this gram width)"),
      "flow_lpm_enrich" -> ("LPM as candidate expansion: ONE Generate (x|lens|=5) " +
        "masks each flow at the static widths, the route dim joins as a " +
        "BroadcastHashJoin on (len, network) — NO range join, no nested loop; " +
        "the only exchange is the per-flow deepest-match reduction on seq, a " +
        "partial+final HASH aggregate over the packed (len<<32|network) long " +
        "(struct max would sort-aggregate); origin recovers via a second " +
        "broadcast probe of the same dim"),
      "flow_anomaly_zscore" -> ("fact table scanned ONCE into the map-combined " +
        "minute aggregate; the per-proto moments aggregate over the REDUCED " +
        "minute relation and come back via BroadcastHashJoin — the z projection " +
        "is pure integer/one-sqrt arithmetic above it"),
      "rel_bloom_semi" -> ("bloom might_contain sits in the Filter DIRECTLY above " +
        "the lineitem scan — rows are pruned BEFORE the semi-join exchange " +
        "(the runtime-filter shape, made explicit); the exact LeftSemi join " +
        "then removes false positives"),
      "sim_diversity_int8" -> ("NO join and NO Generate anywhere — the O(n²) " +
        "pair relation never exists and neither does the corpus×dims explode: " +
        "ONE vec_moments TypedImperativeAggregate folds each task into a " +
        "(n, Σq[], Σq²[]) buffer, the exchange carries |labels| blobs, and " +
        "the finalize is a per-label projection (the posexplode twin is " +
        "retained as simDiversityExplode for the bit-equality spec)"),
      "rel_table_profile" -> ("TWO column-pruned scans, one per branch: the " +
        "multi-distinct branch is a single Expand feeding HASH aggregates " +
        "(all-long buffers); min/max(string) folds keylessly in its own branch " +
        "(no sort) and cross-joins back as a broadcast 1-row relation — the " +
        "one-pass form sort-aggregated the whole Expand relation and benched " +
        "9.3 s vs 2.2-4.3 s at sf0.1 (r13)"),
      "flow_traffic_matrix" -> ("cells aggregate once and are PINNED " +
        "(materializeOnce) — the serving plan shows NO FileSourceScan: the " +
        "share total reads the pinned cells via a broadcast 1-row cross join " +
        "(the naive total branch had its count pruned, de-canonicalizing the " +
        "exchange and re-scanning the fact table)"),
      "rel_top_supplier" -> ("quarter bounds in PushedFilters; ONE lineitem " +
        "scan — the 1-row max branch REUSES the revenue aggregate's exchange " +
        "(requires the null-key filter stated in both branches; the join-" +
        "pushed isnotnull otherwise splits the subtrees); winners + names " +
        "attach via broadcast joins"),
      "rel_market_share" -> ("supplier and nation BROADCAST; the nation slice " +
        "and the total are ONE conditional aggregate over the joined " +
        "relation — a single lineitem scan, share is one division"),
      "dedup_threshold_curve" -> ("pairs from the df-capped co-shingle " +
        "relation (hash-only shuffles, text in no exchange); both histogram " +
        "branches reduce to <= 11 bucket rows; the cumulative step is a " +
        "broadcast non-equi join over the constant 11-row threshold spine"),
      "sim_cos_hist" -> ("same signature/probe candidate join as " +
        "sim_cosine_dup_pairs (never all-pairs); exact cosine only on " +
        "candidates; the histogram is a map-combined aggregate to <= 21 rows"),
      "text_freq_spectrum" -> ("two map-combined hash aggregates (term " +
        "counts -> <= 64 bit-length bands) — NO rank window (a literal " +
        "rank-frequency plot would global-sort the vocabulary); only " +
        "(term, count) crosses the exchange"),
      "text_len_pctiles" -> ("the corpus reduces FIRST to the (lang, " +
        "n_chars)-grain histogram (one map-combined aggregate; the scan " +
        "prunes to two columns); the cumulative rank windows run over that " +
        "bounded grain relation and the rank-r pick is an interval lookup " +
        "— never a per-document rank window (a web-scale language would be " +
        "one task's external sort)"),
      "flow_bidir_ratio" -> ("NO join anywhere: the canonical (lo, hi) pair " +
        "relation comes from ONE partial+final hash aggregate with " +
        "conditional fwd/rev sums — never a self-join of the fact table " +
        "against its reversed projection; top pairs are TakeOrderedAndProject"),
      "rel_customer_distribution" -> ("the per-customer order count folds " +
        "BELOW the single left-outer join (partial+final around one " +
        "o_custkey exchange), so the join moves (custkey, cnt) pairs — " +
        "raw order rows never reach it; the zero bucket is the outer miss"),
      "rel_small_qty_revenue" -> ("the per-part (sum, cnt) aggregate " +
        "BROADCASTS back onto lineitem (BroadcastHashJoin) — the fact " +
        "table is never shuffled; the threshold predicate is exact-integer " +
        "arithmetic above the join, final keyless aggregate to one row"),
      "sim_label_centroids" -> ("NO Generate: the vec_sums " +
        "ObjectHashAggregate folds each task to a per-label (n, sums[]) " +
        "blob — |labels| blobs cross the one exchange, never corpus x dims " +
        "rows; the norm math sits above the final aggregate"),
      "sim_lsh_probe_curve" -> ("ONE multiprobe bucket join at the widest " +
        "radius with the exact hamming distance attached per candidate; " +
        "each radius's top-k filters the shared scored relation — one " +
        "bucket join, one exact re-score, four curve points; only " +
        "(id, id, hamming) tuples cross the dedup shuffle"),
      "sim_ivf_probe_curve" -> ("ONE candidate join + ONE exact re-score " +
        "shared by every probe budget (each candidate carries its cell's " +
        "probe rank; budgets expand only the nQueries-bounded candidate " +
        "relation); corpus never shuffles — centroids and probe set " +
        "broadcast, same as knn_ivf"),
      "flow_port_scan_sketch" -> ("NO Expand: the exact twin's " +
        "multi-countDistinct doubles the pre-exchange row stream; here " +
        "two theta ObjectHashAggregates fold partial+final around ONE " +
        "exchange carrying compact sketch blobs per (day, src) group; " +
        "strict oracle registration guards the exact regime loudly"),
      "events_rfm_sketch" -> ("NO NTILE window: quintile cut points come " +
        "from the KLL sketch over the per-user relation (two tiny chained " +
        "aggregates reusing the user_id exchange) and attach as a " +
        "broadcast 1-row relation; scoring is a compare projection and " +
        "the final segment aggregate is partial+final — zero global sort " +
        "at any user count"),
      "sim_centroid_outliers" -> ("the |labels|-row moments relation " +
        "BROADCASTS back onto the corpus (BroadcastHashJoin, no corpus " +
        "shuffle); distances are exact-integer projections through the " +
        "native dot_longs/sum_sq_longs codegen kernels (the r13 HOF " +
        "lesson — no interpreted zip_with/aggregate in the hot loop); " +
        "top-k is TakeOrderedAndProject, never a global sort"),
      "text_stopword_df" -> ("array_distinct applies INSIDE the projection " +
        "below the explode, so the exchange carries each (doc, term) pair " +
        "once; the corpus total attaches as a broadcast 1-row relation; " +
        "top-k is TakeOrderedAndProject"),
      "rel_nation_traffic" -> ("ONE fact-sized shuffle (lineitem<->orders " +
        "on the order key); customer, supplier, and BOTH nation " +
        "role-playing slices are BroadcastHashJoins — no fact exchange on " +
        "any dimension key; final partial+final aggregate to <= " +
        "|nations|^2 x years rows"),
      "rel_order_priority" -> ("date window in the orders scan's " +
        "PushedFilters; LeftSemi join with the lateness predicate in the " +
        "join CONDITION (probe stops at the first matching line); " +
        "lineitem scan reads only (l_orderkey, l_shipdate)"),
      "sim_centroid_pairs" -> ("ONE corpus scan into the vec_sums " +
        "ObjectHashAggregate (|labels| blobs); the triangular pair join " +
        "is a BroadcastNestedLoopJoin over that reduced relation — the " +
        "only acceptable NLJ shape, because both sides are |labels| rows; " +
        "no shuffled join anywhere"),
      "rel_sales_opportunity" -> ("the positive-balance (sum, n) aggregate " +
        "attaches as a BROADCAST 1-row cross join; the threshold predicate " +
        "is exact-integer (bal*n > sum) ABOVE it — no IEEE division in a " +
        "Filter; the LeftAnti join moves only threshold-survivors against " +
        "orders pruned to the single o_custkey column"),
      "flow_pkt_size_dist" -> ("ONE map-combined partial+final hash " +
        "aggregate over the fact scan — the band exponent is pure " +
        "integer/bin() arithmetic inside the grouping projection (no " +
        "log2/libm, no join, no window); output <= |protos| x 11 rows"),
      "text_ttr_by_source" -> ("ONE map-combined aggregate to |sources| " +
        "rows — tokenize + array_distinct evaluate INSIDE the scan-stage " +
        "projection, so only (source, long, long) triples reach the " +
        "exchange; text never shuffles; the TTR division happens once " +
        "above the final aggregate"),
      "text_bigram_coverage" -> ("ONE corpus explode (r13 rewrite): the " +
        "(source, bigram) occurrence grain aggregates once and is PINNED " +
        "— the serving plan shows NO FileSourceScan; the top list " +
        "re-aggregates from the pinned relation (TakeOrderedAndProject) " +
        "and BROADCASTS onto the same vocab-sized relation for the " +
        "coverage join — never onto the raw occurrence stream"),
      "rel_filtered_revenue" -> ("the pushdown probe (Q6): shipdate " +
        "window, discount band, and quantity cap ALL in PushedFilters; " +
        "one keyless map-combined aggregate to a single row — query cost " +
        "is exactly the row groups the filters fail to prune"),
      "rel_profit_by_nation" -> ("Q9 star: the name-filtered part slice, " +
        "supplier, and nation all BroadcastHashJoin; lineitem<->orders is " +
        "the ONLY fact-sized shuffle; profit is exact-integer cents in " +
        "the aggregate"),
      "rel_returned_customers" -> ("Q10: returnflag and the order-date " +
        "quarter prune their scans; revenue folds to the per-customer " +
        "grain BEFORE the customer join (the join moves reduced rows, " +
        "never line rows); top-20 is TakeOrderedAndProject"),
      "rel_important_parts" -> ("Q11 HAVING-vs-global-scalar: the global " +
        "(sum, n) folds over the per-part aggregate and re-attaches as a " +
        "BROADCAST 1-row cross join; the threshold is exact-integer — no " +
        "IEEE division in the Filter"),
      "rel_late_priority_mix" -> ("Q12: the ship-year window reaches the " +
        "lineitem scan; ONE fact<->fact shuffle; both priority counts are " +
        "a single conditional aggregate — never two passes"),
      "rel_supplier_part_counts" -> ("Q16: the (partkey, suppkey) " +
        "relation dedups FIRST, the blocklist anti-joins as a broadcast, " +
        "part attributes broadcast — the distinct count runs over the " +
        "reduced relation only"),
      "rel_large_orders" -> ("Q18 HAVING-against-own-aggregate: the " +
        "quantity sum folds lineitem to the order grain and filters " +
        "BELOW both joins; top-100 is TakeOrderedAndProject"),
      "rel_disjunctive_revenue" -> ("Q19 OR-of-conjunctions: the " +
        "branches' common quantity band is an explicit conjunct in " +
        "PushedFilters even though the disjunction can't push; part " +
        "attributes broadcast; one keyless fold"),
      "rel_dominant_suppliers" -> ("Q20 nested-aggregate + semi: the " +
        "year window and broadcast part slice reduce the fact before " +
        "BOTH aggregates; the majority test is exact-integer 2*sq > tq " +
        "over the reduced (part, supplier) relation"),
      "rel_waiting_suppliers" -> ("Q21 without self-joins: two narrow " +
        "fold exchanges — per-(order, supplier) max-late, then per-order " +
        "(count, late-count, late-key) — replace the classic " +
        "EXISTS/NOT-EXISTS pair; NO Expand (no distinct aggregates), " +
        "supplier names broadcast, top-20 is TakeOrderedAndProject"),
      "sim_gram_matrix" -> ("the vec_gram ObjectHashAggregate folds the " +
        "corpus into ONE d(d+1)/2-long triangle blob per partition — no " +
        "Generate below the aggregate, the corpus x dims^2 pair explosion " +
        "never exists; the two unpacking explodes sit ABOVE the one-row " +
        "aggregate"),
      "flow_as_balance" -> ("ONE fact pass to the (src_as, dst_as) pair " +
        "grain, PINNED (materializeOnce); egress/ingress re-aggregate " +
        "from the pinned cells (no FileSourceScan in the serving plan); " +
        "the dimension joins broadcast"),
      "flow_proto_mix_shift" -> ("one map-combined aggregate to the " +
        "(day, proto) grain; the day-total sum window and the lag window " +
        "both run over that reduced relation; shares are integer ppm — " +
        "no float sum anywhere"),
      "dedup_df_profile" -> ("one hash exchange on the shingle hash " +
        "(ids/hashes only, text never leaves the scan), then a " +
        "map-combined fold to <= ~32 band rows; band exponent is " +
        "integer bin() arithmetic"),
      "events_new_vs_returning" -> ("the corpus-sized (day, user) " +
        "distinct materializes ONCE (no FileSourceScan in the final " +
        "plan); first-seen is a min aggregate over the reduced relation; " +
        "the day rollup is one conditional aggregate"),
      "text_langid_eval" -> ("predictions evaluate INSIDE the scan-stage " +
        "projection (never materialized); one map-combined aggregate to " +
        "|langs|^2 cells; the label-share window runs over that reduced " +
        "relation"),
      "sim_norm_profile" -> ("one map-combined aggregate to <= ~21 band " +
        "rows — norm2 and the band exponent are exact integer " +
        "projections in the scan stage; no join, no window"),
      "rel_yoy_growth" -> ("revenue folds to the (nation, year) grain in " +
        "one fact pass (lineitem<->orders the only fact-sized shuffle, " +
        "dims broadcast); the lag window runs over the reduced grain; " +
        "growth is integer ppm"),
      "dedup_cluster_size_dist" -> ("digest-only exchange (text never " +
        "leaves the scan); two map-combined aggregates to <= ~32 band " +
        "rows"),
      "multimodal_batches" -> ("payload LENGTH evaluates in the scan " +
        "stage — the exchange and the per-kind window carry only (kind, " +
        "media_id, byte_len); the payload blob never shuffles; one " +
        "window partition per modality"),
      "text_quality_model" -> ("serving is ONE map-side scan: the fused " +
        "TokenScore kernel (vocabulary + learned integer weights as plan " +
        "reference objects) inside WholeStageCodegen — no join, no " +
        "Generate, no hash exchange; only the presentation sort " +
        "exchanges (the training pass runs separately: explode carries " +
        "(label, tid) only, gopher label computed BELOW the Generate — " +
        "hoisted above it the split/array ops re-run per token row, " +
        "measured 13 s vs 0.9 s at 5 k docs)"),
      "sim_knn_pq" -> ("ADC serving over the CODES relation: encode is " +
        "one fused kernel projection (quant_longs -> pq_encode, both " +
        "codegen'd, codebook as a reference object); the whole query " +
        "batch scores in one pq_adc_cos_batch call per candidate — no " +
        "join, no raw-vector access above the encode; the ranking " +
        "exchange carries (vec_id, query_id, adc_cos) longs/doubles only"),
      "sim_knn_ivfpq" -> ("the production ANN stack: ONE corpus pass " +
        "fuses coarse-cell assignment (nearest_centroid codegen kernel, " +
        "zero-exchange argmax) with PQ encode; the (queries x nProbe) " +
        "probe relation BROADCASTS onto it — candidates come from " +
        "probed cells, never a corpus shuffle; ADC scores via the " +
        "query-indexed LUT kernel; no vectors or codes in the ranking " +
        "exchange"),
      "text_bm25_topk" -> ("BM25 retrieval: the 8-term query relation " +
        "BROADCASTS onto the tf relation (map-side semi-reduction " +
        "before any exchange); doc lengths and df fold from the same " +
        "(doc_id, term) aggregate (ReuseExchange); per-doc scores are " +
        "integer sums of micro-quantized contributions; the final " +
        "top-k is TakeOrderedAndProject — no corpus window, no global " +
        "sort"),
      "sim_knn_ivfpq_res" -> ("residual IVFADC: the same probe-pruned " +
        "candidate join as sim_knn_ivfpq, with per-(query,cell) " +
        "integer scalars riding the broadcast probe relation and the " +
        "three residual LUT sums folded by one pq_adc_parts_res_at " +
        "kernel call — mean centroids, cross terms and codebooks are " +
        "all plan reference objects; no vectors past the one fused " +
        "assign+encode pass"),
      "sim_knn_ivfpq_refined" -> ("ADC-nominate -> exact-refine: the " +
        "materialized index's probed-cell code scan nominates top-R " +
        "per query; the R x |queries| candidate relation BROADCASTS " +
        "into the raw-vector scan (id-pruned fetch — the corpus is " +
        "never re-scanned for scoring) and the exact cosine re-rank " +
        "runs on candidates only; no raw vectors cross any exchange"))

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` over `$dir`. Each section notes what the\n")
    sb.append("plan is required to show; regressions surface as diffs here.\n")
    picks.foreach { case (name, note) =>
      val df =
        if (name == "dedup_stream_neardup_batch") streamNearDupKeep(spark)
        else if (name == "dedup_stream_neardup_horizon") streamNearDupHorizon(spark)
        else if (name == "flow_raw_time_range_managed") managedTimeRange(spark)
        // the SERVING form (no exact-regime guard): the guard's
        // countDistinct Expand is oracle plumbing, not the operator
        else if (name == "flow_heavy_hitters_sketch")
          graft.flow.FlowQueries.heavyHitters(spark, dir)
        else SparkEntry.queries(name)(spark, dir)
      sb.append(s"\n## $name\n\n**Must show:** $note\n\n```\n")
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim)
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.size} plans)")
    spark.stop()
  }

  /** A managed raw table with three daily appends (each entry carrying its
    * footer-derived (min,max) timeReceived in the manifest), read through a
    * 1-hour window on day 2 — the plan's scan must list only day-2's file. */
  private def managedTimeRange(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import graft.streaming.{FlowStreams, ManifestTable}
    val table = Files.createTempDirectory("plans_timerange").toString
    val t0 = 1704067200L
    (0 to 2).foreach { d =>
      ManifestTable.append(
        graft.flow.FlowGen.flows(spark, 200, seed = 7L + d, baseTime = t0 + d * 86400L)
          .toDF().transform(FlowStreams.projectRaw).coalesce(1),
        table, Some("event_date"), d.toLong, statsCol = Some("timeReceived"))
    }
    FlowStreams.readRawManagedRange(spark, table, t0 + 86400L, t0 + 86400L + 3600L)
  }

  /** Batch 4's keep frame under probeHorizon=2 over a 4-batch index:
    * the scan's file list must exclude the beyond-horizon batches'
    * files (skipped at the manifest via recorded (min,max) src_batch). */
  private def streamNearDupHorizon(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val idx = Files.createTempDirectory("plans_neardup_hidx").toString
    val out = Files.createTempDirectory("plans_neardup_hout").toString
    def words(p: String): String = (0 until 30).map(i => s"$p$i").mkString(" ")
    (0 to 3).foreach { b =>
      val docs = (1L to 4L).map(i => (b * 10 + i, words(s"h${b}d${i}x")))
        .toDF("doc_id", "text")
      graft.operators.Dedup.nearDupBatch(docs, b.toLong, "text", "doc_id", idx, out,
        0.2, 64, 16, 64, 2L)
    }
    val probe = Seq((900L, words("h3d1x") + " tail")).toDF("doc_id", "text")
    graft.operators.Dedup.nearDupKeep(probe, 4L, "text", "doc_id", idx,
      0.2, 64, 16, 64, 2L)._1
  }

  /** The streaming near-dup micro-batch `keep` plan: seed an index with
    * batch 0 (real committed appends), then build batch 1's keep frame —
    * its plan shows the pruned index probe the scale posture rests on. */
  private def streamNearDupKeep(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val idx = Files.createTempDirectory("plans_neardup_idx").toString
    val out = Files.createTempDirectory("plans_neardup_out").toString
    def words(p: String): String = (0 until 30).map(i => s"$p$i").mkString(" ")
    val seed = (1L to 8L).map(i => (i, words(s"p${i}x"))).toDF("doc_id", "text")
    graft.operators.Dedup.nearDupBatch(seed, 0L, "text", "doc_id", idx, out, 0.2, 64, 16)
    val b1 = Seq((100L, words("p3x") + " tail")).toDF("doc_id", "text")
    graft.operators.Dedup.nearDupKeep(b1, 1L, "text", "doc_id", idx, 0.2, 64, 16, 64)._1
  }
}
