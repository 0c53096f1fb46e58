package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, length, lit, sum}

import graft.functions.TextFunctions
import graft.multimodal.Multimodal
import graft.operators.{Analytics, Dedup, Fusion, Incremental, Relational, Similarity, Temporal, Validity}
import graft.sources.Ingest

/** Driver contract: every operator in SURVEY.md §2, one `queries` entry
  * each, with DuckDB oracle SQL where the semantics are exactly
  * SQL-expressible (approx/LSH/decode operators are rows-only by
  * design — their oracles are ScalaTest properties instead).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 ingestion & sources
    "src_schema_mapped_read" -> ((s, d) => Ingest.schemaMappedRead(s, d)),
    "src_ts_normalize" -> ((s, d) => Ingest.tsNormalize(s, d)),
    "src_zorder_roundtrip" -> ((s, d) => Ingest.zorderRoundtrip(s, d)),
    "src_jdbc_incremental" -> ((s, d) => Ingest.jdbcIncremental(s, d)),
    "src_catalog_columns" ->
      ((s, d) => graft.sources.SchemaAlign.catalogColumns(s, d, graft.sources.Tables.all)),
    "src_file_stats" ->
      ((s, d) => graft.sources.SchemaAlign.fileStats(s, d, graft.sources.Tables.all)),
    "src_sample_ingest" -> ((s, d) => Ingest.sampleIngest(s, d)),
    "src_dynamic_projection" -> ((s, d) => Ingest.dynamicProjection(s, d)),
    "src_lineage_column" -> ((s, d) => Ingest.lineageColumn(s, d)),
    "src_json_props_extract" -> ((s, d) => Ingest.jsonPropsExtract(s, d)),
    "src_jdbc_roundtrip" -> ((s, d) => Ingest.jdbcRoundtrip(s, d)),
    "src_ddl_bootstrap" ->
      ((s, d) => graft.sources.Ddl.ddlColumns(s, d,
        Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem"))),
    // §2.2 relational / ETL core
    "q_min_per_key" -> ((s, d) => Validity.firstEventQuery(s, d)),
    "q_year_coalesce" -> ((s, d) => Fusion.caseYear(s, d)),
    "q_cutoff_lookup_join" -> ((s, d) => Validity.cutoffAssignments(s, d)),
    "q_latest_at_cutoff" -> ((s, d) => Validity.statusAtCutoffQuery(s, d)),
    "q_valid_entities" -> ((s, d) => Validity.validUsersFromDir(s, d)),
    "q_valid_entities_sql" -> ((s, d) => graft.sql.GraftSql.validUsers(s, d)),
    "q_semi_join_filter" -> ((s, d) => Fusion.semiJoinFilter(s, d)),
    "q_anti_join" -> ((s, d) => Fusion.antiJoin(s, d)),
    "q_case_flag" -> ((s, d) => Fusion.caseFlag(s, d)),
    "q_rename_derive" -> ((s, d) => Fusion.renameDerive(s, d)),
    "q_union_sources" -> ((s, d) => Fusion.unionSources(s, d)),
    "q_dedup_pk" -> ((s, d) => Fusion.dedupLatestPerKey(s, d)),
    "q_sample_per_group" -> ((s, d) => Fusion.samplePerGroup(s, d)),
    "q_fusion_etl" -> ((s, d) => Fusion.fusionEtl(s, d).orderBy("o_orderkey")),
    "q_merge" -> ((s, d) => Fusion.mergeChanges(s, d)),
    // §2.3 analytics
    "q1_pricing_summary" -> ((s, d) => Analytics.pricingSummary(s, d)),
    "q_star_join_agg" -> ((s, d) => Analytics.starJoinRevenue(s, d)),
    "q_topn_per_group" -> ((s, d) => Analytics.topNPerGroup(s, d)),
    "q_topk_agg" -> ((s, d) => Analytics.topKPerGroupAgg(s, d)),
    "q_running_window" -> ((s, d) => Analytics.runningUserValue(s, d)),
    "q_pivot" -> ((s, d) => Analytics.pivotEventTypes(s, d)),
    "q_rollup" -> ((s, d) => Analytics.rollupAcctBal(s, d)),
    "q_distinct_count" -> ((s, d) => Analytics.distinctSuppliersPerPart(s, d)),
    "q_approx_distinct" -> ((s, d) => Analytics.approxDistinctGate(s, d)),
    "q_sessionize" -> ((s, d) => Analytics.sessionize(s, d)),
    "q_tumbling_window" -> ((s, d) => Analytics.tumblingHourly(s, d)),
    "q_session_window" -> ((s, d) => Analytics.sessionWindowAgg(s, d)),
    "q_gap_fill" -> ((s, d) => Analytics.gapFillDaily(s, d)),
    "q_funnel" -> ((s, d) => Analytics.funnel(s, d)),
    "q_median" -> ((s, d) => Analytics.medianPricePerPriority(s, d)),
    "q_median_narrow" -> ((s, d) => graft.operators.Quantiles.medianNarrow(s, d)),
    "q_quantile_narrow" -> ((s, d) => graft.operators.Quantiles.quantileNarrow(s, d)),
    "q_quantiles_multi" -> ((s, d) => graft.operators.Quantiles.quantilesNarrowMulti(s, d)),
    "q_weighted_median_narrow" -> ((s, d) => graft.operators.Quantiles.weightedMedianNarrow(s, d)),
    "q_weighted_quantiles_multi" -> ((s, d) => graft.operators.Quantiles.weightedQuantilesNarrowMulti(s, d)),
    "q_weighted_median_auto" -> ((s, d) => graft.operators.Quantiles.weightedMedianAuto(s, d)),
    "q_approx_weighted_quantile" -> ((s, d) => graft.operators.Quantiles.approxWeightedQuantileGate(s, d)),
    "q_approx_quantile" -> ((s, d) => Analytics.approxQuantileGate(s, d)),
    "q_cms_topk" -> ((s, d) => Relational.cmsTopkGate(s, d)),
    "q_cube" -> ((s, d) => Analytics.cubeStatusPriority(s, d)),
    "q_ntile" -> ((s, d) => Analytics.priceQuartiles(s, d)),
    "text_editdist" -> ((s, d) => TextFunctions.editDistanceChain(s, d)),
    "q_window_range" -> ((s, d) => Analytics.hourlyMovingAvg(s, d)),
    "q_lag_delta" -> ((s, d) => Analytics.lagLeadDeltas(s, d)),
    "q_first_last" -> ((s, d) => Analytics.firstLastPerUser(s, d)),
    "q_moving_rows" -> ((s, d) => Analytics.movingAvgRows(s, d)),
    "q_percent_rank" -> ((s, d) => Analytics.percentRanks(s, d)),
    "q_zscore" -> ((s, d) => Analytics.zscorePerPriority(s, d)),
    "q_stats_agg" -> ((s, d) => Analytics.statsPerPriority(s, d)),
    "q_grouping_sets" -> ((s, d) => Relational.groupingSetsTotals(s, d)),
    "q_intersect_except" -> ((s, d) => Relational.intersectExceptUsers(s, d)),
    "q_argminmax" -> ((s, d) => Relational.argMinMaxOrders(s, d)),
    "q_histogram" -> ((s, d) => Relational.priceHistogram(s, d)),
    "q_date_parts" -> ((s, d) => Relational.datePartsOrders(s, d)),
    "q_null_clean" -> ((s, d) => Relational.nullCleanOrders(s, d)),
    "q_full_outer" -> ((s, d) => Relational.fullOuterReconcile(s, d)),
    "q_snapshot_diff" -> ((s, d) => Relational.snapshotDiff(s, d)),
    "q_collect_set" -> ((s, d) => Relational.collectTypesPerUser(s, d)),
    "q_sequence_agg" -> ((s, d) => Relational.journeyPerUser(s, d)),
    "q_mode_per_key" -> ((s, d) => Relational.modePerUser(s, d)),
    "q_string_funcs" -> ((s, d) => Relational.stringFuncsCustomers(s, d)),
    "q_above_avg" -> ((s, d) => graft.sql.GraftSql.aboveAvgOrders(s, d)),
    "q_exists_sql" -> ((s, d) => graft.sql.GraftSql.existsUrgent(s, d)),
    "q_scd2" -> ((s, d) => Relational.scd2Intervals(s, d)),
    "q_unpivot" -> ((s, d) => Relational.unpivotOrders(s, d)),
    "q_profile" -> ((s, d) => Relational.profileOrders(s, d)),
    "text_tfidf" -> ((s, d) => TextFunctions.tfidfTopTerms(s, d)),
    "text_ngram_freq" -> ((s, d) => TextFunctions.bigramFreq(s, d)),
    "text_batch_pack" -> ((s, d) => TextFunctions.batchPack(s, d)),
    "q_asof_join" -> ((s, d) => Temporal.purchaseAsOfClick(s, d)),
    "q_asof_native" -> ((s, d) => Temporal.purchaseAsOfClickNative(s, d)),
    "q_asof_broadcast" -> ((s, d) => Temporal.purchaseAsOfClickBroadcast(s, d)),
    "q_asof_forward" -> ((s, d) => Temporal.purchaseNextClick(s, d)),
    "q_range_join" -> ((s, d) => Temporal.eventsByRange(s, d)),
    "q_range_join_native" -> ((s, d) => Temporal.eventsByRangeNative(s, d)),
    "q_salted_join_agg" -> ((s, d) => Temporal.saltedJoinRevenue(s, d)),
    // §2.4 dedup family
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.minhashPairs(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingPairs(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.nearDupClusters(s, d)),
    "dedup_span" -> ((s, d) => Dedup.spanDups(s, d)),
    "dedup_report" -> ((s, d) => Dedup.dedupReport(s, d)),
    "dedup_apply" -> ((s, d) => Dedup.dedupApply(s, d)),
    "dedup_lsh_sweep" -> ((s, d) => Dedup.lshSweep(s, d)),
    "dedup_incremental" -> ((s, d) => Dedup.dedupIncremental(s, d)),
    "dedup_compact_probe" -> ((s, d) => Dedup.dedupCompactProbe(s, d)),
    "dedup_compact_grams" -> ((s, d) => Dedup.gramCompactIndex(s, d)),
    "dedup_substring" -> ((s, d) => Dedup.substringSpans(s, d)),
    "dedup_substring_apply" -> ((s, d) => Dedup.substringScrub(s, d)),
    "dedup_substring_incremental" -> ((s, d) => Dedup.substringIncremental(s, d)),
    // §2.5 similarity search
    "sim_bruteforce_topk" -> ((s, d) => Similarity.bruteforceTopK(s, d)),
    "sim_ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "sim_sq_topk" -> ((s, d) => Similarity.sqTopK(s, d)),
    "sim_ivf_kmeans" -> ((s, d) => Similarity.ivfKMeansGate(s, d)),
    "sim_pair_stats" -> ((s, d) => Similarity.pairStats(s, d)),
    "sim_centroid_classify" -> ((s, d) => Similarity.centroidClassify(s, d)),
    // probes=3 plants deterministic near-dup vectors so the gate row is
    // non-vacuous (the natural corpus has no pair above cos 0.61);
    // production callers run with probes=0.
    "sim_rp_lsh" -> ((s, d) => Similarity.rpLshPairs(s, d, probes = 3)),
    "sim_knn_graph" -> ((s, d) => Similarity.knnGraph(s, d)),
    "sim_range_search" -> ((s, d) => Similarity.rangeSearch(s, d)),
    "sim_mrl_topk" -> ((s, d) => Similarity.mrlTopK(s, d)),
    "q_cogroup_profile" -> ((s, d) => Relational.cogroupProfile(s, d)),
    "q_asof_nearest" -> ((s, d) => Temporal.purchaseNearestClick(s, d)),
    "q_scd2_lookup" -> ((s, d) => Temporal.scd2Lookup(s, d)),
    // the TVF surface of the DSv2 generator — same aggregate, same oracle
    "src_docgen_sql" -> ((s, _) => s.sql(
      """SELECT source, count(*) AS n_docs,
        |       sum(CAST(n_words AS BIGINT)) AS sum_words,
        |       sum(CAST(length(text) AS BIGINT)) AS sum_chars
        |FROM graft_docgen(5000)
        |GROUP BY source ORDER BY source""".stripMargin)),
    "sim_recall_report" -> ((s, d) => Similarity.recallReport(s, d)),
    "sim_pq_topk" -> ((s, d) => Similarity.pqTopK(s, d)),
    "sim_pq_trained" -> ((s, d) => Similarity.pqTrainedGate(s, d)),
    "sim_ivfpq_topk" -> ((s, d) => Similarity.ivfpqTopK(s, d)),
    "sim_ivfpq_trained" -> ((s, d) => Similarity.ivfpqTrainedGate(s, d)),
    "sim_sql_topk" -> ((s, d) => graft.sql.GraftSql.sqlTopK(s, d)),
    // §2.6 text analysis
    "text_tokens" -> ((s, d) => TextFunctions.tokenStats(s, d)),
    "text_quality" -> ((s, d) => TextFunctions.qualityScore(s, d)),
    "text_langid" -> ((s, d) => TextFunctions.langId(s, d)),
    "text_fingerprint" -> ((s, d) => TextFunctions.fingerprint(s, d)),
    "text_gopher" -> ((s, d) => TextFunctions.gopherRules(s, d)),
    "text_scrub" -> ((s, d) => TextFunctions.scrub(s, d)),
    "text_domain_mix" -> ((s, d) => TextFunctions.domainMix(s, d)),
    "text_subsample" -> ((s, d) => TextFunctions.subsample(s, d)),
    "text_repetition" -> ((s, d) => TextFunctions.repetitionStats(s, d)),
    "text_contamination" -> ((s, d) => TextFunctions.contamination(s, d)),
    "text_rarity" -> ((s, d) => TextFunctions.rarity(s, d)),
    "q_heavy_hitters" -> ((s, d) => Relational.heavyHitters(s, d)),
    "q_retention_cohort" -> ((s, d) => Analytics.retentionCohort(s, d)),
    "q_hll_rollup" -> ((s, d) => Analytics.hllRollupGate(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "q_throttle" -> ((s, d) => Analytics.throttleEvents(s, d)),
    "q_entropy" -> ((s, d) => Analytics.hourlyEntropy(s, d)),
    "q_skyline" -> ((s, d) => Relational.paretoOrders(s, d)),
    "q_array_funcs" -> ((s, d) => Relational.arrayFuncsOrders(s, d)),
    "text_weighted_sample" -> ((s, d) => TextFunctions.weightedSample(s, d)),
    "q_bloom_prune" -> ((s, d) => Relational.bloomPrunedRevenue(s, d)),
    "q_incr_agg" -> ((s, d) => Incremental.incrementalAgg(s, d)),
    // §2.7 multimodal plumbing
    "mm_payload_stats" -> ((s, d) => Multimodal.payloadStats(s, d)),
    "mm_decode_stats" -> ((s, d) => Multimodal.decodeStats(s, d)),
    "mm_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    "mm_resize_stats" -> ((s, d) => Multimodal.resizePlan(s, d)),
    "mm_audio_chunks" -> ((s, d) => Multimodal.audioChunks(s, d)),
    "mm_embed_topk" -> ((s, d) => Multimodal.embedTopK(s, d)),
    "mm_modality_route" -> ((s, d) => Multimodal.modalityRoute(s, d)),
    // custom DataSourceV2 generator — (doc_id, source) projection is
    // pruned at the source, text is never built for it
    "src_docgen" -> ((s, _) => s.read.format("graft-docgen")
      .option("rows", 5000L).option("partitions", 8).load()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("sum_words"),
        sum(length(col("text")).cast("long")).as("sum_chars"))
      .orderBy(col("source"))),
    "text_curriculum" -> ((s, d) => TextFunctions.curriculumBuckets(s, d)),
    "text_filter_verdict" -> ((s, d) => TextFunctions.filterVerdict(s, d)),
    // round-3 session 2: time-series pack, exact-decimal money,
    // semantic survivorship, PMI collocations, pushdown-pruned docgen
    "q_ohlc" -> ((s, d) => Analytics.ohlcBars(s, d)),
    "q_transition_matrix" -> ((s, d) => Analytics.transitionMatrix(s, d)),
    "q_pct_of_total" -> ((s, d) => Analytics.pctOfTotal(s, d)),
    "q_concurrency" -> ((s, d) => Analytics.peakConcurrency(s, d)),
    "q_cume_users" -> ((s, d) => Analytics.cumeUsers(s, d)),
    "q_mad" -> ((s, d) => Analytics.madPerPriority(s, d)),
    "q_asof_tolerance" -> ((s, d) => Temporal.purchaseAsOfClickTolerance(s, d)),
    "q_hour_bitmap" -> ((s, d) => Analytics.hourBitmap(s, d)),
    "mm_shard_pack" -> ((s, d) => Multimodal.shardPack(s, d)),
    "q_time_weighted" -> ((s, d) => Analytics.timeWeightedAvg(s, d)),
    "q_locf" -> ((s, d) => Analytics.locfFill(s, d)),
    "q_streaks" -> ((s, d) => Analytics.dayStreaks(s, d)),
    "q_decimal_agg" -> ((s, d) => Relational.decimalRevenue(s, d)),
    "dedup_semantic" -> ((s, d) => Dedup.semanticSurvivors(s, d)),
    "text_pmi" -> ((s, d) => TextFunctions.pmiCollocations(s, d)),
    "text_split" -> ((s, d) => TextFunctions.trainValTestSplit(s, d)),
    // a 100M-row logical table behind a 1000-row doc_id slice: without
    // the source-side range pushdown this query would synthesize 1e8
    // documents — finishing at interactive speed IS the pruning proof
    // (and the spec asserts the scan's clamped range explicitly)
    "src_docgen_pushdown" -> ((s, _) => s.read.format("graft-docgen")
      .option("rows", 100000000L).option("partitions", 8).load()
      .filter(col("doc_id") >= 99990000L && col("doc_id") < 99991000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("sum_words"),
        sum(length(col("text")).cast("long")).as("sum_chars"))
      .orderBy(col("source"))),
    // round-3 session-3 additions: robust stats, apportionment,
    // sequence mining, interval coverage, media near-dup
    "q_percentile_disc" -> ((s, d) => Analytics.percentileDisc(s, d)),
    "q_outlier_iqr" -> ((s, d) => Analytics.outlierIqr(s, d)),
    "q_chi2" -> ((s, d) => Analytics.chi2Cells(s, d)),
    "q_interval_union" -> ((s, d) => Temporal.intervalUnion(s, d)),
    "q_rfm" -> ((s, d) => Relational.rfmSegments(s, d)),
    "q_allocation" -> ((s, d) => Relational.largestRemainder(s, d)),
    "q_seq_ngrams" -> ((s, d) => Relational.journeyTrigrams(s, d)),
    "mm_phash_pairs" -> ((s, d) => Multimodal.phashPairs(s, d)),
    "q_trend_regression" -> ((s, d) => Analytics.trendRegression(s, d)),
    "q_yoy" -> ((s, d) => Analytics.periodRevenue(s, d)),
    "q_event_pattern" -> ((s, d) => Analytics.eventPattern(s, d)),
    "q_map_funcs" -> ((s, d) => Relational.mapFuncsProfile(s, d)),
    "q_cooccurrence" -> ((s, d) => Relational.typeCooccurrence(s, d)),
    "text_readability" -> ((s, d) => TextFunctions.readability(s, d)),
    "text_zipf" -> ((s, d) => TextFunctions.zipfFit(s, d)),
    "src_table_checksum" -> ((s, d) => graft.sources.SchemaAlign.tableChecksums(s, d)),
    "q_weighted_median" -> ((s, d) => Analytics.weightedMedian(s, d)),
    "q_percentile_cont" -> ((s, d) => Analytics.percentileCont(s, d)),
    "q_histogram_equi" -> ((s, d) => Analytics.equiDepthHistogram(s, d)),
    "text_boilerplate" -> ((s, d) => TextFunctions.boilerplate(s, d)),
    "q_attribution" -> ((s, d) => Temporal.attribution(s, d)),
    "q_capped_balance" -> ((s, d) => Relational.cappedBalance(s, d)),
    "sim_rrf_fusion" -> ((s, d) => Similarity.rrfFusion(s, d)),
    "q_pagerank" -> ((s, d) => Analytics.pageRank(s, d)),
    "q_ab_test" -> ((s, d) => Analytics.abTest(s, d)),
    "q_decile_lift" -> ((s, d) => Analytics.decileLift(s, d)),
    "text_ngram_novelty" -> ((s, d) => TextFunctions.ngramNovelty(s, d)),
    "q_gini" -> ((s, d) => Analytics.giniSpend(s, d)),
    "q_autocorr" -> ((s, d) => Analytics.autocorr(s, d)),
    "q_changepoint" -> ((s, d) => Analytics.changepoint(s, d)),
    "q_ewma" -> ((s, d) => Analytics.ewmaDaily(s, d)),
    "q_benford" -> ((s, d) => Analytics.benford(s, d)),
    "q_backtest" -> ((s, d) => Analytics.backtestNaive(s, d)),
    "q_fuzzy_join" -> ((s, d) => Fusion.fuzzyNameJoin(s, d)),
    "q_market_basket" -> ((s, d) => Relational.marketBasket(s, d)),
    "q_survival" -> ((s, d) => Relational.survivalCurve(s, d)),
    "q_dau_wau" -> ((s, d) => Analytics.dauWau(s, d)),
    "q_elasticity" -> ((s, d) => Analytics.elasticity(s, d)),
    "q_ship_priority" -> ((s, d) => Analytics.shipPriority(s, d)),
    "q_region_volume" -> ((s, d) => Analytics.regionVolume(s, d)),
    "q_seasonality_dow" -> ((s, d) => Analytics.seasonalityDow(s, d)),
    "text_mixture_sample" -> ((s, d) => TextFunctions.mixtureSample(s, d)),
    "sim_sparse_cosine" -> ((s, d) => Similarity.sparseCosine(s, d)),
    "q_entity_resolution" -> ((s, d) => Fusion.entityResolution(s, d)),
    "q_shortest_path" -> ((s, d) => Analytics.shortestPath(s, d)),
    "q_bollinger" -> ((s, d) => Analytics.bollinger(s, d)),
    "q_rolling_median" -> ((s, d) => Analytics.rollingMedian(s, d)),
    "q_except_all" -> ((s, d) => Relational.exceptAllClicks(s, d)),
    "mm_audio_energy" -> ((s, d) => Multimodal.audioEnergy(s, d)),
    "text_keywords" -> ((s, d) => TextFunctions.rakeKeywords(s, d)),
    "mm_scene_cuts" -> ((s, d) => Multimodal.sceneCuts(s, d)),
    "q_mwu_test" -> ((s, d) => Analytics.mwuTest(s, d)),
    "q_period_detect" -> ((s, d) => Analytics.periodDetect(s, d)),
    "q_itemset3" -> ((s, d) => Relational.itemset3(s, d)),
    "dedup_minhash_oph" -> ((s, d) => Dedup.ophPairs(s, d)),
    "text_sentence_dedup" -> ((s, d) => TextFunctions.sentenceDedup(s, d)),
    "q_delta_encode" -> ((s, d) => Analytics.deltaEncode(s, d)),
    "q_time_to_convert" -> ((s, d) => Analytics.timeToConvert(s, d)),
    "sim_knn_classify" -> ((s, d) => Similarity.knnClassify(s, d)),
    // rows-only: HLL estimates have no SQL-exact oracle; the spec
    // bounds est_inter against exact_inter
    "q_hll_intersect" -> ((s, d) => Analytics.hllIntersectGate(s, d)),
    "q_rank_dense" -> ((s, d) => Relational.rankDense(s, d)),
    // COUNT(*) answered from source METADATA (SupportsPushDownAggregates):
    // a half-billion-row logical table counts at interactive speed —
    // finishing at all is the pushdown proof; the oracle is the closed form
    "src_docgen_count" -> ((s, _) => s.read.format("graft-docgen")
      .option("rows", 500000000L).option("partitions", 8).load()
      .agg(count(lit(1)).as("n_docs"))),
    // rows-only: the stats live in the parquet FOOTER (DuckDB's view of
    // them isn't reachable from the fixed-table oracle harness); the
    // spec proves footer truthfulness against the data
    "src_rowgroup_stats" ->
      ((s, d) => graft.sources.SchemaAlign.rowGroupStats(s, d)),
    "dedup_semantic_sweep" -> ((s, d) => Dedup.semanticSweep(s, d)),
    "q_new_returning" -> ((s, d) => Analytics.newReturning(s, d)),
    "q_typed_agg" -> ((s, d) => Analytics.typedAgg(s, d)),
    "text_bigram_lm" -> ((s, d) => TextFunctions.bigramLm(s, d)),
    "text_bpe_merges" -> ((s, d) => TextFunctions.bpeMerges(s, d)),
    "text_bpe_encode" -> ((s, d) => TextFunctions.bpeEncode(s, d)),
    "text_dsir" -> ((s, d) => TextFunctions.dsirSelect(s, d)),
    "text_dsir_resample" -> ((s, d) => TextFunctions.dsirResample(s, d)),
    "q_theil_sen" -> ((s, d) => Analytics.theilSen(s, d)),
    "q_winsor" -> ((s, d) => Analytics.winsorizedStats(s, d)),
    "q_cohort_ltv" -> ((s, d) => Analytics.cohortLtv(s, d)),
    "text_bpe_tokenize" -> ((s, d) => TextFunctions.bpeTokenize(s, d)),
    "src_csv_roundtrip" -> ((s, d) => Ingest.csvRoundtrip(s, d)),
    "src_orc_roundtrip" -> ((s, d) => Ingest.orcRoundtrip(s, d)),
    "sim_nprobe_sweep" -> ((s, d) => Similarity.nprobeSweep(s, d)),
    "q_heat_grid" -> ((s, d) => Analytics.heatGrid(s, d)),
    "q_rollup_cascade" -> ((s, d) => Analytics.rollupCascade(s, d)),
    "q_psi" -> ((s, d) => Analytics.psi(s, d)),
    "q_holt" -> ((s, d) => Analytics.holt(s, d)),
    "text_bm25" -> ((s, d) => TextFunctions.bm25(s, d)),
    "dedup_detector_overlap" -> ((s, d) => Dedup.detectorOverlap(s, d)),
    "q_intersect_all" -> ((s, d) => Relational.intersectAllClicks(s, d)),
    "text_lang_confusion" -> ((s, d) => TextFunctions.langConfusion(s, d)),
    "sim_centroid_drift" -> ((s, d) => Similarity.centroidDrift(s, d)),
    "text_doc_embedding" -> ((s, d) => TextFunctions.docEmbedding(s, d)),
    "q_overlap_join" -> ((s, d) => Temporal.overlapJoin(s, d)),
    "q_constraint_audit" -> ((s, d) => Relational.constraintAudit(s, d)),
    "text_contamination_pairs" -> ((s, d) => TextFunctions.contaminationPairs(s, d)),
    "pipe_llm_corpus" -> ((s, d) => graft.operators.Pipeline.llmCorpus(s, d)),
    "pipe_report" -> ((s, d) => graft.operators.Pipeline.llmReport(s, d)),
    "pipe_report_mat" ->
      ((s, d) => graft.operators.Pipeline.llmReportMaterialized(s, d)),
    "text_url_canon" -> ((s, d) => TextFunctions.urlCanon(s, d))
  )

  private val cutoffValues =
    Validity.cutoffs.map { case (w, t) => s"($w, TIMESTAMP '$t')" }.mkString(", ")

  /** The validity chain CTEs, shared by the three §2.2 oracle queries.
    * ts comparisons happen at the parquet's ns precision; outputs are
    * CAST to µs TIMESTAMP to match Spark's reader normalization.
    */
  private val validityCtes: String =
    s"""WITH fe AS (
       |  SELECT user_id, min(ts) AS first_ts_ns FROM events GROUP BY user_id),
       |fw AS (
       |  SELECT user_id, CAST(first_ts_ns AS TIMESTAMP) AS first_ts,
       |         CAST(ceil(day(first_ts_ns) / CAST(7.0 AS DOUBLE)) AS INTEGER) AS wk
       |  FROM fe),
       |cut(wk, cutoff_ts) AS (VALUES $cutoffValues),
       |assigned AS (
       |  SELECT fw.user_id, fw.wk, fw.first_ts, cut.cutoff_ts
       |  FROM fw JOIN cut ON fw.wk = cut.wk),
       |ranked AS (
       |  SELECT e.user_id, a.wk, a.cutoff_ts, e.event_type, e.ts, e.event_id,
       |         row_number() OVER (PARTITION BY e.user_id
       |                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
       |  FROM events e JOIN assigned a ON e.user_id = a.user_id
       |  WHERE e.ts <= a.cutoff_ts),
       |latest AS (
       |  SELECT user_id, wk, cutoff_ts, event_type AS last_type,
       |         CAST(ts AS TIMESTAMP) AS last_ts, event_id AS last_event_id
       |  FROM ranked WHERE rn = 1)
       |""".stripMargin

  private def textWords(src: String = "text") =
    s"regexp_extract_all(lower($src), '[a-z0-9]+')"

  /** Unrolled k-round BPE replay (`text_bpe_merges`): each round's CTE
    * trio recounts adjacent symbol pairs, picks the top pair under the
    * same (count DESC, lhs, rhs) tie-break, and re-segments via the
    * same space-padded left-to-right `replace` the engine applies —
    * the merge loop itself is what the oracle verifies, round by round.
    */
  private def duckBpeSql(k: Int): String = {
    val head =
      s"""WITH w0 AS (
         |  SELECT concat(trim(regexp_replace(w, '(.)', '\\1 ', 'g')),
         |                ' </w>') AS sym, count(*) AS cnt
         |  FROM (SELECT unnest(${textWords()}) AS w FROM documents)
         |  GROUP BY 1)""".stripMargin
    val rounds = (0 until k).map { i =>
      s""",p$i AS (
         |  SELECT pr[1] AS a, pr[2] AS b, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS pr, cnt
         |        FROM (SELECT string_split(sym, ' ') AS l, cnt FROM w$i))
         |  GROUP BY 1, 2),
         |t$i AS (SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1),
         |w${i + 1} AS (
         |  SELECT trim(replace(' ' || sym || ' ', ' ' || a || ' ' || b || ' ',
         |    ' ' || a || b || ' ')) AS sym, cnt FROM w$i CROSS JOIN t$i)""".stripMargin
    }.mkString("\n")
    val sel = (0 until k).map(i =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, " +
        s"c AS pair_cnt FROM t$i").mkString(" UNION ALL ")
    s"$head\n$rounds\nSELECT * FROM ($sel) ORDER BY merge_rank"
  }

  /** `text_bpe_encode` replay: the SAME k unrolled merge rounds, read
    * out as the final vocabulary's token distribution (top-N head).
    */
  private def duckBpeEncodeSql(k: Int, topN: Int): String = {
    val merge = duckBpeSql(k)
    val ctes = merge.substring(0, merge.lastIndexOf("\nSELECT"))
    s"""$ctes
       |SELECT tok AS token, CAST(sum(cnt) AS BIGINT) AS n_occurrences
       |FROM (SELECT unnest(string_split(sym, ' ')) AS tok, cnt FROM w$k)
       |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT $topN""".stripMargin
  }

  /** `text_bpe_tokenize` replay: the same k-round CTE chain, read out
    * as (word → symbol count) and joined back to the corpus' words —
    * per-doc BPE token counts, empty docs zeroed via the spine join.
    */
  private def duckBpeTokenizeSql(k: Int): String = {
    val merge = duckBpeSql(k)
    val ctes = merge.substring(0, merge.lastIndexOf("\nSELECT"))
    s"""$ctes,
       |seg AS (SELECT replace(replace(sym, ' ', ''), '</w>', '') AS w,
       |               len(string_split(sym, ' ')) AS n_sym
       |        FROM w$k),
       |dw AS (SELECT doc_id, unnest(${textWords()}) AS w FROM documents),
       |g AS (SELECT dw.doc_id, count(*) AS n_words,
       |             sum(seg.n_sym) AS n_bpe_tokens
       |      FROM dw JOIN seg USING (w) GROUP BY dw.doc_id)
       |SELECT d.doc_id, CAST(coalesce(g.n_words, 0) AS BIGINT) AS n_words,
       |       CAST(coalesce(g.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents d LEFT JOIN g USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Media metadata CTE shared by the multimodal oracles: kind cycles
    * by doc_id, b0/b1 are the first two RAW UTF-8 BYTES of the payload
    * (what FakeDecoder reads) via hex(encode()) — NOT ascii()
    * codepoints, so the oracle agrees with the byte-based decoder even
    * for non-ASCII text.
    */
  private val duckMediaMeta: String =
    """m AS (
      |  SELECT doc_id,
      |         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
      |              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |         CAST(strlen(text) AS BIGINT) AS n_bytes,
      |         CASE WHEN strlen(text) >= 1
      |              THEN CAST(concat('0x', substr(hex(encode(text)), 1, 2)) AS INTEGER)
      |              ELSE 0 END AS b0,
      |         CASE WHEN strlen(text) >= 2
      |              THEN CAST(concat('0x', substr(hex(encode(text)), 3, 2)) AS INTEGER)
      |              ELSE 0 END AS b1
      |  FROM documents)""".stripMargin

  /** Shared by q_asof_join (window formulation) and q_asof_native
    * (custom AsOfJoinExec) — identical semantics, one oracle.
    */
  private val duckAsOf: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, max(event_id) AS event_id FROM events
      |      WHERE event_type = 'click' GROUP BY user_id, ts)
      |SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
      |       c.event_id AS click_event_id, CAST(c.ts AS TIMESTAMP) AS click_ts
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.user_id, p.ts, p.event_id""".stripMargin

  /** Forward twin of duckAsOf: earliest click at-or-after, min id. */
  private val duckAsOfForward: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, min(event_id) AS event_id FROM events
      |      WHERE event_type = 'click' GROUP BY user_id, ts)
      |SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
      |       c.event_id AS click_event_id, CAST(c.ts AS TIMESTAMP) AS click_ts
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.ts >= p.ts
      |ORDER BY p.user_id, p.ts, p.event_id""".stripMargin

  private val duckShingles: String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(w) >= 3
       |         THEN list_transform(range(len(w) - 2),
       |                i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
       |         ELSE CAST([] AS VARCHAR[]) END) AS shingle
       |  FROM (SELECT doc_id, ${textWords()} AS w FROM documents))
       |""".stripMargin

  /** DuckDB twin of Dedup.md5Bits — the cross-engine hash that lets the
    * oracle replay MinHash/SimHash banding bit-for-bit.
    */
  private def duckMd5Bits(s: String, start: Int, len: Int): String =
    s"CAST(concat('0x', substr(md5($s), $start, $len)) AS BIGINT)"

  /** Shared CTE chain of the LSH replay: shingles → double-hash minhash
    * signatures → band md5 buckets → candidate pairs → exact Jaccard,
    * identical to Dedup.minhashPairs. Used by both the pair oracle and
    * the connected-component cluster oracle.
    */
  private val duckMinhashCtes: String = {
    import graft.operators.Dedup.{MinhashBands, MinhashK}
    val rowsPerBand = MinhashK / MinhashBands
    val sigCols = (0 until MinhashK)
      .map(i => s"min(h1 + $i * h2) AS sig_$i").mkString(", ")
    val bandExprs = (0 until MinhashBands).map { b =>
      val comps = (0 until rowsPerBand)
        .map(r => s"CAST(sig_${b * rowsPerBand + r} AS VARCHAR)").mkString(", ")
      s"md5(concat_ws('_', '$b', $comps))"
    }.mkString(",\n|    ")
    s"""$duckShingles,
       |hh AS (
       |  SELECT doc_id,
       |         ${duckMd5Bits("shingle", 1, 7)} AS h1,
       |         ${duckMd5Bits("shingle", 8, 7)} AS h2
       |  FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM hh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, unnest([$bandExprs]) AS band_hash
       |  FROM sig),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
       |shv AS (SELECT DISTINCT doc_id,
       |               ${duckMd5Bits("shingle", 1, 15)} AS h FROM sh),
       |card AS (SELECT doc_id, count(*) AS n_sh FROM shv GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |  FROM shv a JOIN shv b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jac AS (
       |  SELECT id_a, id_b,
       |         CAST(n_inter AS DOUBLE) /
       |         CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE) AS j
       |  FROM inter
       |  JOIN card ca ON ca.doc_id = id_a
       |  JOIN card cb ON cb.doc_id = id_b)""".stripMargin
  }

  /** `dedup_incremental` replay: signatures/bands recomputed for the
    * WHOLE corpus (they are per-doc, so computing both splits in one
    * chain is identical), candidate pairs restricted to new-batch ×
    * history, verification by signature agreement — the exact
    * estimator the probe applies against the persisted index.
    */
  private def duckIndexProbe(oldPred: String): String = {
    import graft.operators.Dedup.{MinhashBands, MinhashK}
    val rowsPerBand = MinhashK / MinhashBands
    val sigCols = (0 until MinhashK)
      .map(i => s"min(h1 + $i * h2) AS sig_$i").mkString(", ")
    val bandExprs = (0 until MinhashBands).map { b =>
      val comps = (0 until rowsPerBand)
        .map(r => s"CAST(sig_${b * rowsPerBand + r} AS VARCHAR)")
        .mkString(", ")
      s"md5(concat_ws('_', '$b', $comps))"
    }.mkString(", ")
    val agree = (0 until MinhashK)
      .map(i => s"CASE WHEN n.sig_$i = o.sig_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $duckShingles,
       |hh AS (SELECT doc_id, ${duckMd5Bits("shingle", 1, 7)} AS h1,
       |              ${duckMd5Bits("shingle", 8, 7)} AS h2 FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM hh GROUP BY doc_id),
       |bands AS (SELECT doc_id, unnest([$bandExprs]) AS band_hash FROM sig),
       |candn AS (
       |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
       |  FROM bands n JOIN bands o ON n.band_hash = o.band_hash
       |  WHERE n.doc_id % 4 = 0 AND $oldPred),
       |cand AS (
       |  SELECT new_id, old_id FROM (
       |    SELECT new_id, old_id, row_number() OVER (
       |      PARTITION BY new_id ORDER BY old_id) AS rk
       |    FROM candn) WHERE rk <= 64),
       |est AS (
       |  SELECT c.new_id, c.old_id,
       |         round(CAST($agree AS DOUBLE) / $MinhashK, 6) AS est_jac
       |  FROM cand c JOIN sig n ON n.doc_id = c.new_id
       |              JOIN sig o ON o.doc_id = c.old_id)
       |SELECT new_id, old_id, est_jac FROM est
       |WHERE est_jac >= 0.5 ORDER BY new_id, old_id""".stripMargin
  }

  private val duckIncrementalDedup: String =
    duckIndexProbe("o.doc_id % 4 <> 0")

  /** `dedup_compact_probe` replay: the probe against history ∪ batch
    * counted ONCE — what the persisted index holds only if compaction
    * actually collapsed the replayed appends.
    */
  private val duckCompactProbe: String =
    duckIndexProbe("o.doc_id % 4 IN (1, 2)")

  /** `dedup_compact_grams` replay: every gram over history ∪ batch,
    * occurrences of the twice-appended batch counted twice, first-doc
    * as the global min — the exact re-aggregation compaction promises.
    */
  private val duckCompactGrams: String =
    s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents
       |           WHERE doc_id % 4 IN (1, 2)),
       |win AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 10
       |              THEN list_transform(range(len(w) - 9),
       |                     i -> array_to_string(w[i+1:i+10], ' '))
       |              ELSE CAST([] AS VARCHAR[]) END AS wl
       |  FROM t),
       |e AS (SELECT doc_id, unnest(wl) AS s FROM win),
       |hh AS (SELECT doc_id, ${duckMd5Bits("s", 1, 15)} AS h FROM e)
       |SELECT h,
       |       CAST(sum(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END)
       |            AS BIGINT) AS n_occ,
       |       min(doc_id) AS first_doc
       |FROM hh GROUP BY h ORDER BY h""".stripMargin

  /** Shared by q_range_join (broadcast non-equi join) and
    * q_range_join_native (custom IntervalJoinExec) — same semantics.
    */
  private val duckRangeJoin: String =
    s"""WITH ranges(wk_bucket, start_ts, end_ts) AS (VALUES ${
      graft.operators.Temporal.weekRanges.map { case (w, s, e) =>
        s"($w, TIMESTAMP '$s', TIMESTAMP '$e')"
      }.mkString(", ")})
       |SELECT r.wk_bucket, count(*) AS n_events,
       |       round(sum(e.value), 2) AS sum_value
       |FROM events e JOIN ranges r
       |  ON e.ts >= r.start_ts AND e.ts < r.end_ts
       |GROUP BY r.wk_bucket ORDER BY r.wk_bucket""".stripMargin

  private val duckExact: String =
    """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
      |       min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin

  private val duckNgram: String =
    s"""WITH $duckShingles,
       |shh AS (SELECT DISTINCT doc_id,
       |               ${duckMd5Bits("shingle", 1, 15)} AS h FROM sh),
       |hot AS (SELECT h FROM shh GROUP BY h
       |        HAVING count(*) > ${graft.operators.Dedup.MaxShingleDf}),
       |kept AS (SELECT * FROM shh WHERE h NOT IN (SELECT h FROM hot)),
       |card AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |       round(CAST(n_inter AS DOUBLE) /
       |             CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
       |FROM inter
       |JOIN card ca ON ca.doc_id = id_a
       |JOIN card cb ON cb.doc_id = id_b
       |WHERE CAST(n_inter AS DOUBLE) /
       |      CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE) >= 0.4
       |ORDER BY id_a, id_b""".stripMargin

  private val duckSpan: String =
    s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
       |win AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 10
       |              THEN list_transform(range(len(w) - 9),
       |                     i -> array_to_string(w[i+1:i+10], ' '))
       |              ELSE CAST([] AS VARCHAR[]) END AS wl
       |  FROM t),
       |e AS (SELECT doc_id, generate_subscripts(wl, 1) - 1 AS pos,
       |             unnest(wl) AS s FROM win),
       |hh AS (SELECT doc_id, pos, ${duckMd5Bits("s", 1, 15)} AS h FROM e)
       |SELECT h, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
       |       min(doc_id) AS first_doc, CAST(min(pos) AS BIGINT) AS min_pos
       |FROM hh GROUP BY h HAVING count(DISTINCT doc_id) > 1
       |ORDER BY h""".stripMargin

  /** Maximal duplicated spans: duckSpan's window-hash CTEs, then
    * gaps-and-islands (pos − row_number constant per consecutive run)
    * over occurrences of the corpus-duplicated hashes — the same merge
    * the engine runs per document.
    */
  private val duckSubstring: String =
    s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
       |win AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 10
       |              THEN list_transform(range(len(w) - 9),
       |                     i -> array_to_string(w[i+1:i+10], ' '))
       |              ELSE CAST([] AS VARCHAR[]) END AS wl
       |  FROM t),
       |e AS (SELECT doc_id, generate_subscripts(wl, 1) - 1 AS pos,
       |             unnest(wl) AS s FROM win),
       |hh AS (SELECT doc_id, pos, ${duckMd5Bits("s", 1, 15)} AS h FROM e),
       |dup AS (SELECT h FROM hh GROUP BY h HAVING count(DISTINCT doc_id) > 1),
       |occ AS (SELECT hh.doc_id, hh.pos FROM hh JOIN dup USING (h)),
       |isl AS (SELECT doc_id, pos,
       |               pos - row_number() OVER (PARTITION BY doc_id
       |                                        ORDER BY pos) AS grp
       |        FROM occ)
       |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |       CAST(max(pos) - min(pos) + 10 AS BIGINT) AS span_tokens
       |FROM isl GROUP BY doc_id, grp
       |HAVING max(pos) - min(pos) + 10 >= 15
       |ORDER BY doc_id, span_start""".stripMargin

  /** Span-scrub replay: the duckSubstring island chain, then cut every
    * span-covered token position (NOT EXISTS over the span ranges) and
    * rebuild the surviving text in position order — the scrub hash pins
    * the reconstruction byte-for-byte. Fully-scrubbed docs come back as
    * the empty string via the corpus-spine left join, exactly like the
    * engine.
    */
  private val duckSubstringApply: String =
    s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
       |win AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 10
       |              THEN list_transform(range(len(w) - 9),
       |                     i -> array_to_string(w[i+1:i+10], ' '))
       |              ELSE CAST([] AS VARCHAR[]) END AS wl
       |  FROM t),
       |e AS (SELECT doc_id, generate_subscripts(wl, 1) - 1 AS pos,
       |             unnest(wl) AS s FROM win),
       |hh AS (SELECT doc_id, pos, ${duckMd5Bits("s", 1, 15)} AS h FROM e),
       |dup AS (SELECT h FROM hh GROUP BY h HAVING count(DISTINCT doc_id) > 1),
       |occ AS (SELECT hh.doc_id, hh.pos FROM hh JOIN dup USING (h)),
       |isl AS (SELECT doc_id, pos,
       |               pos - row_number() OVER (PARTITION BY doc_id
       |                                        ORDER BY pos) AS grp
       |        FROM occ),
       |sp AS (SELECT doc_id, min(pos) AS span_start,
       |              max(pos) - min(pos) + 10 AS span_tokens
       |       FROM isl GROUP BY doc_id, grp
       |       HAVING max(pos) - min(pos) + 10 >= 15),
       |tp AS (SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos,
       |              unnest(w) AS tok FROM t),
       |kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tp
       |         WHERE NOT EXISTS (
       |           SELECT 1 FROM sp s WHERE s.doc_id = tp.doc_id
       |             AND tp.pos >= s.span_start
       |             AND tp.pos < s.span_start + s.span_tokens)),
       |g AS (SELECT doc_id, count(*) AS n_kept,
       |             string_agg(tok, ' ' ORDER BY pos) AS scrub
       |      FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
       |       CAST(coalesce(g.n_kept, 0) AS BIGINT) AS n_kept,
       |       CAST(len(t.w) - coalesce(g.n_kept, 0) AS BIGINT) AS n_removed,
       |       ${duckMd5Bits("coalesce(g.scrub, '')", 1, 15)} AS scrub_h
       |FROM t LEFT JOIN g USING (doc_id) ORDER BY t.doc_id""".stripMargin

  /** Incremental substring replay: history's distinct window hashes,
    * batch occurrences semi-joined against them, then the same island
    * merge — both sides recomputed from the raw documents.
    */
  private val duckSubstringIncremental: String =
    s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
       |win AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 10
       |              THEN list_transform(range(len(w) - 9),
       |                     i -> array_to_string(w[i+1:i+10], ' '))
       |              ELSE CAST([] AS VARCHAR[]) END AS wl
       |  FROM t),
       |e AS (SELECT doc_id, generate_subscripts(wl, 1) - 1 AS pos,
       |             unnest(wl) AS s FROM win),
       |hh AS (SELECT doc_id, pos, ${duckMd5Bits("s", 1, 15)} AS h FROM e),
       |hist AS (SELECT DISTINCT h FROM hh WHERE doc_id % 4 <> 0),
       |occ AS (SELECT hh.doc_id, hh.pos FROM hh JOIN hist USING (h)
       |        WHERE hh.doc_id % 4 = 0),
       |isl AS (SELECT doc_id, pos,
       |               pos - row_number() OVER (PARTITION BY doc_id
       |                                        ORDER BY pos) AS grp
       |        FROM occ)
       |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |       CAST(max(pos) - min(pos) + 10 AS BIGINT) AS span_tokens
       |FROM isl GROUP BY doc_id, grp
       |HAVING max(pos) - min(pos) + 10 >= 15
       |ORDER BY doc_id, span_start""".stripMargin

  /** DSIR replay: hashed-bigram bucket counts, add-1-smoothed target
    * (lang='en') and raw bucket models, per-doc log likelihood ratio,
    * top-N on the ROUNDED weight (ties → doc_id) — float noise can
    * never change which rows cross the boundary.
    */
  private val duckDsir: String =
    s"""WITH t AS (SELECT doc_id, lang, ${textWords()} AS w FROM documents),
       |win AS (
       |  SELECT doc_id, lang,
       |         CASE WHEN len(w) >= 2
       |              THEN list_transform(range(len(w) - 1),
       |                     i -> array_to_string(w[i+1:i+2], ' '))
       |              ELSE CAST([] AS VARCHAR[]) END AS wl
       |  FROM t),
       |f AS (SELECT doc_id, lang,
       |             ${duckMd5Bits("unnest(wl)", 1, 7)} % 256 AS b
       |      FROM win),
       |cd AS (SELECT doc_id, lang, b, count(*) AS c FROM f GROUP BY 1, 2, 3),
       |bt AS (SELECT b, sum(c) AS raw_c,
       |              sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS tgt_c
       |       FROM cd GROUP BY b),
       |tot AS (SELECT sum(raw_c) AS r_tot, sum(tgt_c) AS t_tot FROM bt),
       |lr AS (SELECT b,
       |              ln((tgt_c + 1.0) / (t_tot + 256.0)) -
       |              ln((raw_c + 1.0) / (r_tot + 256.0)) AS lr
       |       FROM bt CROSS JOIN tot),
       |w AS (SELECT cd.doc_id, any_value(cd.lang) AS lang,
       |             round(sum(cd.c * lr.lr), 6) AS dsir_logw
       |      FROM cd JOIN lr USING (b) GROUP BY cd.doc_id),
       |r AS (SELECT doc_id, lang, dsir_logw,
       |             row_number() OVER (ORDER BY dsir_logw DESC, doc_id) AS rk
       |      FROM w)
       |SELECT CAST(rk AS BIGINT) AS rk, doc_id, lang, dsir_logw
       |FROM r WHERE rk <= 100 ORDER BY rk""".stripMargin

  /** DSIR resampling replay: the duckDsir model chain, then the
    * deterministic Gumbel-top-k draw — key = round(logw, 6) − ln(−ln u)
    * with u = (md5₆₀(doc_id) + 0.5)/2⁶⁰, a pure function of doc_id.
    * Ranking on the ROUNDED weight (the dsirSelect discipline) keeps
    * the key bit-stable across engines despite float-sum accumulation
    * order, so both engines draw the identical sample.
    */
  private val duckDsirResample: String =
    s"""WITH t AS (SELECT doc_id, lang, ${textWords()} AS w FROM documents),
       |win AS (
       |  SELECT doc_id, lang,
       |         CASE WHEN len(w) >= 2
       |              THEN list_transform(range(len(w) - 1),
       |                     i -> array_to_string(w[i+1:i+2], ' '))
       |              ELSE CAST([] AS VARCHAR[]) END AS wl
       |  FROM t),
       |f AS (SELECT doc_id, lang,
       |             ${duckMd5Bits("unnest(wl)", 1, 7)} % 256 AS b
       |      FROM win),
       |cd AS (SELECT doc_id, lang, b, count(*) AS c FROM f GROUP BY 1, 2, 3),
       |bt AS (SELECT b, sum(c) AS raw_c,
       |              sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS tgt_c
       |       FROM cd GROUP BY b),
       |tot AS (SELECT sum(raw_c) AS r_tot, sum(tgt_c) AS t_tot FROM bt),
       |lr AS (SELECT b,
       |              ln((tgt_c + 1.0) / (t_tot + 256.0)) -
       |              ln((raw_c + 1.0) / (r_tot + 256.0)) AS lr
       |       FROM bt CROSS JOIN tot),
       |w AS (SELECT cd.doc_id, any_value(cd.lang) AS lang,
       |             sum(cd.c * lr.lr) AS logw
       |      FROM cd JOIN lr USING (b) GROUP BY cd.doc_id),
       |g AS (SELECT doc_id, lang, logw,
       |             round(logw, 6) - ln(-ln(
       |               (CAST(${duckMd5Bits("CAST(doc_id AS VARCHAR)", 1, 15)} AS DOUBLE)
       |                + CAST(0.5 AS DOUBLE)) /
       |               CAST(1152921504606846976 AS DOUBLE))) AS gkey
       |      FROM w),
       |r AS (SELECT doc_id, lang, logw,
       |             row_number() OVER (ORDER BY gkey DESC, doc_id) AS rk
       |      FROM g)
       |SELECT CAST(rk AS BIGINT) AS rk, doc_id, lang,
       |       round(logw, 6) AS dsir_logw
       |FROM r WHERE rk <= 100 ORDER BY rk""".stripMargin

  private val duckMinhash: String =
    s"""WITH $duckMinhashCtes
       |SELECT jac.id_a AS id_a, jac.id_b AS id_b, round(j, 6) AS jaccard
       |FROM jac JOIN cand ON jac.id_a = cand.id_a AND jac.id_b = cand.id_b
       |WHERE j >= 0.7
       |ORDER BY jac.id_a, jac.id_b""".stripMargin

  /** The banding sweep replayed config-by-config over the SAME
    * signature CTE the minhash oracle uses (the whole sweep is pure
    * md5 arithmetic — nothing approximate about it, the "approx"
    * labeling it previously carried was wrong): per (bands,
    * rows/band), candidate volume = distinct co-banded pairs.
    */
  private val duckLshSweep: String = {
    import graft.operators.Dedup.MinhashK
    val parts = Seq(4, 8, 16).map { b =>
      val rpb = MinhashK / b
      val bandExprs = (0 until b).map { bIdx =>
        val comps = (0 until rpb)
          .map(r => s"CAST(sig_${bIdx * rpb + r} AS VARCHAR)").mkString(", ")
        s"md5(concat_ws('_', '$bIdx', $comps))"
      }.mkString(", ")
      s"SELECT CAST($b AS INTEGER) AS n_bands, " +
        s"CAST($rpb AS INTEGER) AS rows_per_band, " +
        s"CAST((SELECT count(*) FROM (" +
        s"SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib " +
        s"FROM (SELECT doc_id, unnest([$bandExprs]) AS bh FROM sig) x " +
        s"JOIN (SELECT doc_id, unnest([$bandExprs]) AS bh FROM sig) y " +
        s"ON x.bh = y.bh AND x.doc_id < y.doc_id)) AS BIGINT) AS n_candidates"
    }
    s"""WITH $duckMinhashCtes
       |${parts.mkString("\nUNION ALL\n")}
       |ORDER BY n_bands""".stripMargin
  }

  /** Connected components over the verified minhash pairs via a
    * recursive transitive-closure CTE: cluster_id = min doc_id
    * reachable in the near-dup graph; singletons map to themselves.
    */
  private val duckClusters: String =
    s"""WITH RECURSIVE $duckMinhashCtes,
       |pairs AS (
       |  SELECT jac.id_a AS id_a, jac.id_b AS id_b
       |  FROM jac JOIN cand ON jac.id_a = cand.id_a AND jac.id_b = cand.id_b
       |  WHERE j >= 0.7),
       |edges AS (
       |  SELECT id_a AS s, id_b AS d FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(s, d) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
       |comp AS (
       |  SELECT s AS doc_id, least(min(d), s) AS cluster_id
       |  FROM reach GROUP BY s)
       |SELECT dd.doc_id,
       |       coalesce(comp.cluster_id, dd.doc_id) AS cluster_id,
       |       CAST(CASE WHEN coalesce(comp.cluster_id, dd.doc_id) = dd.doc_id
       |                 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM documents dd LEFT JOIN comp ON dd.doc_id = comp.doc_id
       |ORDER BY dd.doc_id""".stripMargin

  /** `pipe_llm_corpus` replay: the seven pipeline stages chained as
    * CTEs, each stage's SQL the SAME formulation its standalone oracle
    * is gated on, but reading the previous stage's survivor CTE
    * instead of raw `documents` — so what this gate adds (and what no
    * per-stage gate covers) is exactly the inter-stage contracts:
    * which frame feeds which stage, which text column (original vs
    * scrubbed) each detector reads, and which token counts drive the
    * budget and the packing.
    */
  private val duckLlmStageCtes: String = {
    import graft.operators.Dedup.{MinhashBands, MinhashK}
    val rowsPerBand = MinhashK / MinhashBands
    val sigCols = (0 until MinhashK)
      .map(i => s"min(h1 + $i * h2) AS sig_$i").mkString(", ")
    val bandExprs = (0 until MinhashBands).map { b =>
      val comps = (0 until rowsPerBand)
        .map(r => s"CAST(sig_${b * rowsPerBand + r} AS VARCHAR)").mkString(", ")
      s"md5(concat_ws('_', '$b', $comps))"
    }.mkString(", ")
    val weightCase = graft.functions.TextFunctions.mixtureWeights
      .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ")
    def grams8(src: String) =
      s"""unnest(CASE WHEN len($src) >= 8
         |         THEN list_transform(range(len($src) - 7),
         |                i -> array_to_string($src[i+1:i+8], ' '))
         |         ELSE CAST([] AS VARCHAR[]) END)""".stripMargin
    s"""base AS (SELECT doc_id, source, text, ${textWords()} AS w FROM documents),
       |gf AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, len(w) AS n_words,
       |           CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
       |                AS DOUBLE) /
       |             greatest(CAST(len(w) AS DOUBLE), CAST(1 AS DOUBLE)) AS mean_wl,
       |           len(list_intersect(list_distinct(w),
       |               ['the', 'a', 'of', 'and', 'to', 'in', 'is'])) AS n_stop,
       |           CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
       |                AS DOUBLE) /
       |             greatest(CAST(len(w) AS DOUBLE), CAST(1 AS DOUBLE)) AS alpha_r
       |    FROM base)
       |  WHERE n_words BETWEEN 50 AND 100000 AND mean_wl BETWEEN 3.0 AND 10.0
       |    AND n_stop >= 2 AND alpha_r >= 0.8),
       |s1 AS (SELECT b.* FROM base b JOIN gf USING (doc_id)),
       |ek AS (SELECT min(doc_id) AS doc_id FROM (
       |         SELECT doc_id,
       |                md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
       |         FROM s1) GROUP BY fp),
       |s2 AS (SELECT s1.* FROM s1 JOIN ek USING (doc_id)),
       |sh AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(w) >= 3
       |         THEN list_transform(range(len(w) - 2),
       |                i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
       |         ELSE CAST([] AS VARCHAR[]) END) AS shingle
       |  FROM s2),
       |hh AS (SELECT doc_id, ${duckMd5Bits("shingle", 1, 7)} AS h1,
       |              ${duckMd5Bits("shingle", 8, 7)} AS h2 FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM hh GROUP BY doc_id),
       |bands AS (SELECT doc_id, unnest([$bandExprs]) AS band_hash FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b
       |           ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
       |shv AS (SELECT DISTINCT doc_id,
       |               ${duckMd5Bits("shingle", 1, 15)} AS h FROM sh),
       |card AS (SELECT doc_id, count(*) AS n_sh FROM shv GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |          FROM shv a JOIN shv b ON a.h = b.h AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |jac AS (SELECT id_a, id_b,
       |               CAST(n_inter AS DOUBLE) /
       |               CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE) AS j
       |        FROM inter JOIN card ca ON ca.doc_id = id_a
       |                   JOIN card cb ON cb.doc_id = id_b),
       |pairs AS (SELECT jac.id_a, jac.id_b FROM jac
       |          JOIN cand ON jac.id_a = cand.id_a AND jac.id_b = cand.id_b
       |          WHERE j >= 0.7),
       |edges AS (SELECT id_a AS s, id_b AS d FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |reach(s, d) AS (SELECT s, d FROM edges
       |                UNION
       |                SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
       |comp AS (SELECT s AS doc_id, least(min(d), s) AS cluster_id
       |         FROM reach GROUP BY s),
       |s3 AS (SELECT s2.* FROM s2 LEFT JOIN comp USING (doc_id)
       |       WHERE coalesce(comp.cluster_id, s2.doc_id) = s2.doc_id),
       |win AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 10
       |              THEN list_transform(range(len(w) - 9),
       |                     i -> array_to_string(w[i+1:i+10], ' '))
       |              ELSE CAST([] AS VARCHAR[]) END AS wl
       |  FROM s3),
       |e AS (SELECT doc_id, generate_subscripts(wl, 1) - 1 AS pos,
       |             unnest(wl) AS s FROM win),
       |hh2 AS (SELECT doc_id, pos, ${duckMd5Bits("s", 1, 15)} AS h FROM e),
       |dup AS (SELECT h FROM hh2 GROUP BY h HAVING count(DISTINCT doc_id) > 1),
       |occ AS (SELECT hh2.doc_id, hh2.pos FROM hh2 JOIN dup USING (h)),
       |isl AS (SELECT doc_id, pos,
       |               pos - row_number() OVER (PARTITION BY doc_id
       |                                        ORDER BY pos) AS grp
       |        FROM occ),
       |sp AS (SELECT doc_id, min(pos) AS span_start,
       |              max(pos) - min(pos) + 10 AS span_tokens
       |       FROM isl GROUP BY doc_id, grp
       |       HAVING max(pos) - min(pos) + 10 >= 15),
       |tp AS (SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos,
       |              unnest(w) AS tok FROM s3),
       |kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tp
       |         WHERE NOT EXISTS (
       |           SELECT 1 FROM sp s WHERE s.doc_id = tp.doc_id
       |             AND tp.pos >= s.span_start
       |             AND tp.pos < s.span_start + s.span_tokens)),
       |g AS (SELECT doc_id, count(*) AS n_kept,
       |             string_agg(tok, ' ' ORDER BY pos) AS scrub
       |      FROM kept GROUP BY doc_id),
       |s4 AS (SELECT s3.doc_id, s3.source,
       |              CAST(coalesce(g.n_kept, 0) AS BIGINT) AS n_tok,
       |              coalesce(g.scrub, '') AS scrub
       |       FROM s3 LEFT JOIN g USING (doc_id)),
       |evg AS (SELECT DISTINCT ${duckMd5Bits("s", 1, 15)} AS h FROM (
       |          SELECT ${grams8("w")} AS s
       |          FROM base WHERE doc_id % 97 = 0)),
       |tr AS (SELECT doc_id, source, n_tok, scrub,
       |              regexp_extract_all(lower(scrub), '[a-z0-9]+') AS tw
       |       FROM s4 WHERE doc_id % 97 <> 0),
       |trg AS (SELECT DISTINCT doc_id, ${duckMd5Bits("s", 1, 15)} AS h FROM (
       |          SELECT doc_id, ${grams8("tw")} AS s FROM tr)),
       |cf AS (SELECT trg.doc_id, count(*) AS n_grams,
       |              sum(CASE WHEN evg.h IS NULL THEN 0 ELSE 1 END) AS n_hit
       |       FROM trg LEFT JOIN evg ON trg.h = evg.h GROUP BY 1),
       |s5 AS (SELECT tr.doc_id, tr.source, tr.n_tok, tr.scrub
       |       FROM tr LEFT JOIN cf USING (doc_id)
       |       WHERE cf.doc_id IS NULL OR
       |             CAST(cf.n_hit AS DOUBLE) < 0.05 * CAST(cf.n_grams AS DOUBLE)),
       |per_src AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok_s
       |            FROM s5 GROUP BY 1),
       |tot AS (SELECT CAST(sum(tok_s) AS BIGINT) AS tok_total FROM per_src),
       |r2 AS (SELECT source,
       |              CAST(CASE WHEN tok_s = 0 THEN 0 ELSE least(1000,
       |                (((tok_total * 40 // 100) *
       |                  (CASE source $weightCase ELSE 0 END)) // 1000)
       |                * 1000 // tok_s) END AS BIGINT) AS accept_permille
       |       FROM per_src CROSS JOIN tot),
       |s6 AS (SELECT s5.* FROM s5 JOIN r2 USING (source)
       |       WHERE ${duckMd5Bits("CAST(doc_id AS VARCHAR)", 1, 7)} % 1000
       |             < accept_permille)""".stripMargin
  }

  private val duckLlmPipeline: String =
    s"""WITH RECURSIVE
       |$duckLlmStageCtes,
       |c AS (SELECT doc_id, source, n_tok, scrub,
       |             sum(n_tok) OVER (ORDER BY doc_id
       |                              ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM s6)
       |SELECT doc_id, source, n_tok,
       |       ${duckMd5Bits("scrub", 1, 15)} AS scrub_h,
       |       CAST(floor((cum - n_tok) / 512.0) AS BIGINT) AS batch_id
       |FROM c ORDER BY doc_id""".stripMargin

  /** `pipe_report` replay: the same stage CTEs read out as one
    * aggregate row per stage — raw word counts through detection,
    * scrubbed counts from the scrub stage on.
    */
  private val duckLlmReport: String =
    s"""WITH RECURSIVE
       |$duckLlmStageCtes
       |SELECT stage_no, stage, n_docs, n_tokens FROM (
       |  SELECT CAST(0 AS BIGINT) AS stage_no, 'raw' AS stage,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(coalesce(sum(len(w)), 0) AS BIGINT) AS n_tokens FROM base
       |  UNION ALL SELECT CAST(1 AS BIGINT), 'gopher',
       |         CAST(count(*) AS BIGINT),
       |         CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM s1
       |  UNION ALL SELECT CAST(2 AS BIGINT), 'exact_dedup',
       |         CAST(count(*) AS BIGINT),
       |         CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM s2
       |  UNION ALL SELECT CAST(3 AS BIGINT), 'cluster_dedup',
       |         CAST(count(*) AS BIGINT),
       |         CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM s3
       |  UNION ALL SELECT CAST(4 AS BIGINT), 'substring_scrub',
       |         CAST(count(*) AS BIGINT),
       |         CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s4
       |  UNION ALL SELECT CAST(5 AS BIGINT), 'decontaminate',
       |         CAST(count(*) AS BIGINT),
       |         CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s5
       |  UNION ALL SELECT CAST(6 AS BIGINT), 'mixture_sample',
       |         CAST(count(*) AS BIGINT),
       |         CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s6
       |) ORDER BY stage_no""".stripMargin

  /** SimHash replay: 60-bit word hashes → signed bit sums → signature
    * (token-less docs get signature 0 via the LEFT JOIN, like the Spark
    * side) → 15-bit band blocking → hamming verify.
    */
  private val duckSimhash: String = {
    import graft.operators.Dedup.SimhashBits
    s"""WITH w AS (
       |  SELECT doc_id, unnest(${textWords()}) AS w FROM documents),
       |h AS (SELECT doc_id, ${duckMd5Bits("w", 1, 15)} AS h FROM w),
       |bits AS (
       |  SELECT doc_id, j.j,
       |         sum(CASE WHEN (h >> CAST(j.j AS INTEGER)) & 1 = 1
       |                  THEN 1 ELSE -1 END) AS s
       |  FROM h CROSS JOIN (SELECT unnest(range($SimhashBits)) AS j) j
       |  GROUP BY doc_id, j.j),
       |sig0 AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN s > 0
       |                       THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
       |                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sim
       |  FROM bits GROUP BY doc_id),
       |sig AS (
       |  SELECT d.doc_id, coalesce(s.sim, CAST(0 AS BIGINT)) AS sim
       |  FROM documents d LEFT JOIN sig0 s ON d.doc_id = s.doc_id),
       |bv AS (
       |  SELECT doc_id, sim, b.b AS band_idx,
       |         (sim >> CAST(b.b * 15 AS INTEGER)) & 32767 AS band_val
       |  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) b),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
       |         a.sim AS sim_a, c.sim AS sim_b
       |  FROM bv a JOIN bv c
       |    ON a.band_idx = c.band_idx AND a.band_val = c.band_val
       |   AND a.doc_id < c.doc_id)
       |SELECT id_a, id_b,
       |       CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
       |FROM cand
       |WHERE bit_count(xor(sim_a, sim_b)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    val m0 = baseOracleSql
    // The TVF spelling of the generator is gated by the same replay.
    val m = m0 + ("src_docgen_sql" -> m0("src_docgen"))
    // The composite filter verdict reuses the component oracles as
    // CTEs — the SAME SQL the components are individually gated on.
    m + ("text_filter_verdict" ->
      s"""WITH go AS (${m("text_gopher")}),
         |re AS (${m("text_repetition")}),
         |la AS (${m("text_langid")}),
         |co AS (${m("text_contamination")})
         |SELECT co.doc_id,
         |       CAST(go.pass_word_count * go.pass_mean_len *
         |            go.pass_stopwords * go.pass_alpha AS BIGINT) AS gopher_ok,
         |       CASE WHEN re.dup_frac <= 0.2 AND re.top_frac <= 0.3
         |            THEN 1 ELSE 0 END AS rep_ok,
         |       CASE WHEN la.lang_guess = 'en' THEN 1 ELSE 0 END AS lang_ok,
         |       CASE WHEN co.contam_frac < 0.05 THEN 1 ELSE 0 END AS contam_ok,
         |       CAST(go.pass_word_count * go.pass_mean_len *
         |            go.pass_stopwords * go.pass_alpha AS BIGINT) *
         |       (CASE WHEN re.dup_frac <= 0.2 AND re.top_frac <= 0.3
         |             THEN 1 ELSE 0 END) *
         |       (CASE WHEN la.lang_guess = 'en' THEN 1 ELSE 0 END) *
         |       (CASE WHEN co.contam_frac < 0.05 THEN 1 ELSE 0 END) AS keep
         |FROM co JOIN go ON co.doc_id = go.doc_id
         |        JOIN re ON co.doc_id = re.doc_id
         |        JOIN la ON co.doc_id = la.doc_id
         |ORDER BY co.doc_id""".stripMargin)
  }

  private def baseOracleSql: Map[String, String] = Map(
    "src_schema_mapped_read" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |       c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "src_sample_ingest" ->
      "SELECT * FROM orders ORDER BY o_orderkey LIMIT 888",
    // The round-trip goes through an embedded Derby DB on the Spark
    // side; the oracle is simply the source table — the property under
    // test is that the batched JDBC write + partitioned JDBC read is
    // lossless.
    "src_jdbc_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    // the roundtrip gates aggregate the SOURCE table: any mangling the
    // interchange format introduces hash-fails against this
    "src_csv_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price,
        |       min(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')) AS min_day,
        |       max(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')) AS max_day
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "src_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // The Spark side derives DDL column plans from parquet footers via
    // the ANSI dialect; the oracle is DuckDB's OWN catalog over the
    // same files — two engines independently agreeing on the emitted
    // DDL type for every column.
    "src_ddl_bootstrap" ->
      """SELECT table_name, CAST(ordinal_position AS BIGINT) AS ordinal,
        |       column_name, CAST(data_type AS VARCHAR) AS ddl_type,
        |       is_nullable
        |FROM information_schema.columns
        |WHERE table_name IN ('region', 'nation', 'customer', 'supplier',
        |                     'part', 'orders', 'lineitem')
        |ORDER BY table_name, ordinal""".stripMargin,
    "src_catalog_columns" ->
      """SELECT table_name, column_name, CAST(data_type AS VARCHAR) AS data_type
        |FROM information_schema.columns
        |WHERE table_name IN ('region', 'nation', 'customer', 'supplier',
        |                     'part', 'orders', 'lineitem', 'events',
        |                     'documents', 'embeddings')
        |ORDER BY table_name, column_name""".stripMargin,
    // Spark reports num_rows from footers alone; the oracle COUNTS the
    // rows — footer truthfulness is the property under test.
    "src_file_stats" ->
      """WITH counts AS (
        |  SELECT 'region' AS table_name, count(*) AS num_rows FROM region
        |  UNION ALL SELECT 'nation', count(*) FROM nation
        |  UNION ALL SELECT 'customer', count(*) FROM customer
        |  UNION ALL SELECT 'supplier', count(*) FROM supplier
        |  UNION ALL SELECT 'part', count(*) FROM part
        |  UNION ALL SELECT 'orders', count(*) FROM orders
        |  UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |  UNION ALL SELECT 'events', count(*) FROM events
        |  UNION ALL SELECT 'documents', count(*) FROM documents
        |  UNION ALL SELECT 'embeddings', count(*) FROM embeddings),
        |cols AS (
        |  SELECT table_name, count(*) AS n_columns
        |  FROM information_schema.columns
        |  WHERE table_name IN ('region', 'nation', 'customer', 'supplier',
        |                       'part', 'orders', 'lineitem', 'events',
        |                       'documents', 'embeddings')
        |  GROUP BY table_name)
        |SELECT counts.table_name, counts.num_rows, cols.n_columns
        |FROM counts JOIN cols USING (table_name)
        |ORDER BY table_name""".stripMargin,
    "src_dynamic_projection" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(l_quantity AS DOUBLE) AS l_quantity,
        |       CAST(NULL AS VARCHAR) AS load_note
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "src_lineage_column" ->
      "SELECT *, 'eCollision Oracle' AS source FROM region ORDER BY r_regionkey",
    "src_json_props_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_min_per_key" ->
      (validityCtes +
        "SELECT user_id, first_ts, wk FROM fw ORDER BY user_id"),
    "q_year_coalesce" ->
      """SELECT o_orderkey,
        |       CAST(year(coalesce(CASE WHEN o_orderstatus = 'O' THEN NULL
        |                               ELSE o_orderdate END,
        |                          o_orderdate)) AS BIGINT) AS case_year
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_cutoff_lookup_join" ->
      (validityCtes +
        "SELECT user_id, wk, first_ts, cutoff_ts FROM assigned ORDER BY user_id"),
    "q_latest_at_cutoff" ->
      (validityCtes +
        "SELECT user_id, wk, cutoff_ts, last_type, last_ts, last_event_id " +
        "FROM latest ORDER BY user_id"),
    "q_valid_entities" ->
      (validityCtes +
        """SELECT l.user_id, c.c_name
          |FROM latest l LEFT JOIN customer c ON l.user_id = c.c_custkey
          |WHERE l.last_type IN ('purchase', 'signup') AND c.c_name IS NOT NULL
          |ORDER BY c.c_name DESC, l.user_id""".stripMargin),
    "q_valid_entities_sql" ->
      (validityCtes +
        """SELECT l.user_id, c.c_name
          |FROM latest l LEFT JOIN customer c ON l.user_id = c.c_custkey
          |WHERE l.last_type IN ('purchase', 'signup') AND c.c_name IS NOT NULL
          |ORDER BY c.c_name DESC, l.user_id""".stripMargin),
    "q_fusion_etl" ->
      (validityCtes +
        """SELECT o.o_orderkey,
          |       CAST(year(o.o_orderdate) AS BIGINT) AS case_year,
          |       o.o_totalprice AS total_price,
          |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_datestring,
          |       'eCollision Oracle' AS source
          |FROM orders o
          |WHERE o.o_custkey IN (
          |  SELECT l.user_id FROM latest l
          |  LEFT JOIN customer c ON l.user_id = c.c_custkey
          |  WHERE l.last_type IN ('purchase', 'signup')
          |    AND c.c_name IS NOT NULL)
          |ORDER BY o.o_orderkey""".stripMargin),
    "q_semi_join_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_case_flag" ->
      """SELECT event_id, user_id, event_type,
        |       CAST(CASE WHEN event_type IN ('purchase', 'signup')
        |                 THEN 1 ELSE 0 END AS BIGINT) AS valid_flag
        |FROM events ORDER BY event_id""".stripMargin,
    "q_rename_derive" ->
      """SELECT o_orderkey, o_totalprice AS total_price,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_datestring,
        |       'eCollision Oracle' AS source
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_union_sources" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority,
        |       'eCollision Oracle' AS source, CAST(NULL AS VARCHAR) AS o_orderstatus
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
        |       'eCollision Analytics' AS source, o_orderstatus
        |FROM orders WHERE o_orderkey % 2 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    "q_dedup_pk" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |       value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_sample_per_group" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 2) AS avg_qty,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_star_join_agg" ->
      """SELECT r.r_name, n.n_name,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name
        |ORDER BY r.r_name, n.n_name""".stripMargin,
    "q_topk_agg" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC,
        |                                         o_orderkey DESC) AS rk
        |      FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "q_topn_per_group" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 5 ORDER BY o_orderpriority, rk""".stripMargin,
    "q_running_window" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS UNBOUNDED PRECEDING), 6) AS running_value
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |       count(*) FILTER (WHERE event_type = 'view') AS n_view,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |       count(*) FILTER (WHERE event_type = 'error') AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_rollup" ->
      """SELECT r.r_name, n.n_name, count(*) AS n_cust,
        |       round(sum(c.c_acctbal), 2) AS sum_bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r.r_name, n.n_name)
        |ORDER BY r.r_name ASC NULLS FIRST, n.n_name ASC NULLS FIRST""".stripMargin,
    "q_distinct_count" ->
      """SELECT l_partkey, count(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    "q_sessionize" ->
      """WITH x AS (
        |  SELECT event_id, user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT event_id, user_id, ts,
        |         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM x)
        |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |       CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM y ORDER BY user_id, ts, event_id""".stripMargin,
    "q_tumbling_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Sessions replayed as lag/cumsum: a >=30min gap breaks (Spark's
    // session_window end is exclusive, so an event exactly gap-later
    // opens a NEW session). ts is µs-cast up front to match Spark's
    // micro-floored parquet read of the ns column.
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |x AS (
        |  SELECT user_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM e),
        |y AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM x),
        |z AS (
        |  SELECT user_id, ts, value,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM y)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM z GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    // the two-epoch watermark loop must reproduce the source subset
    // exactly: a double-pulled row, missed delta, or surviving stale
    // seed all hash-mismatch
    "src_jdbc_incremental" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |       o_totalprice, o_orderdate
        |FROM orders WHERE o_orderkey % 8 = 0
        |ORDER BY o_orderkey""".stripMargin,
    // normalization must be value-neutral: the oracle rolls up the RAW
    // source while the engine rolls up the normalized rewrite
    "src_ts_normalize" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
        |       count(*) AS n_events,
        |       min(event_id) AS min_event_id,
        |       max(event_id) AS max_event_id,
        |       round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Z-order is a pure LAYOUT change: the oracle aggregates the RAW
    // source, so any value the rewrite mangled hash-fails.
    "src_zorder_roundtrip" ->
      """SELECT user_id % 16 AS bucket, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value,
        |       min(event_id) AS min_event_id,
        |       max(event_id) AS max_event_id
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_median_narrow" ->
      """SELECT l_returnflag, round(median(l_extendedprice), 4) AS med
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_quantile_narrow" ->
      """SELECT l_linenumber, round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin,
    // identical oracle as q_weighted_median_narrow: the router must be
    // semantics-preserving whichever path it picks
    "q_weighted_median_auto" ->
      """WITH cum AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice) AS BIGINT) AS cw,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag) AS BIGINT) AS total_w
        |  FROM lineitem)
        |SELECT l_returnflag, round(min(l_extendedprice), 4) AS wmed
        |FROM cum WHERE cw >= CAST(ceiling(0.5 * total_w) AS BIGINT)
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // rank-contract gate (q_approx_quantile's pattern): the oracle
    // recomputes exact counts/weights and predicts both verdicts true,
    // so a weight-rank excursion past the sample bound fails the hash
    "q_approx_weighted_quantile" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w_total,
        |       true AS p50_rank_ok, true AS p90_rank_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_weighted_median_narrow" ->
      """WITH cum AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice) AS BIGINT) AS cw,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag) AS BIGINT) AS total_w
        |  FROM lineitem)
        |SELECT l_returnflag, round(min(l_extendedprice), 4) AS wmed
        |FROM cum WHERE cw >= CAST(ceiling(0.5 * total_w) AS BIGINT)
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q_weighted_quantiles_multi" ->
      """WITH cum AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice) AS BIGINT) AS cw,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag) AS BIGINT) AS total_w
        |  FROM lineitem),
        |pick AS (
        |  SELECT l_returnflag, CAST(0.25 AS DOUBLE) AS p,
        |         round(min(l_extendedprice), 4) AS q
        |  FROM cum WHERE cw >= CAST(ceiling(0.25 * total_w) AS BIGINT)
        |  GROUP BY 1
        |  UNION ALL
        |  SELECT l_returnflag, CAST(0.5 AS DOUBLE) AS p,
        |         round(min(l_extendedprice), 4) AS q
        |  FROM cum WHERE cw >= CAST(ceiling(0.5 * total_w) AS BIGINT)
        |  GROUP BY 1
        |  UNION ALL
        |  SELECT l_returnflag, CAST(0.9 AS DOUBLE) AS p,
        |         round(min(l_extendedprice), 4) AS q
        |  FROM cum WHERE cw >= CAST(ceiling(0.9 * total_w) AS BIGINT)
        |  GROUP BY 1)
        |SELECT * FROM pick ORDER BY l_returnflag, p""".stripMargin,
    "q_quantiles_multi" ->
      """SELECT l_returnflag, CAST(0.5 AS DOUBLE) AS p,
        |       round(quantile_cont(l_extendedprice, 0.5), 4) AS q
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT l_returnflag, CAST(0.9 AS DOUBLE) AS p,
        |       round(quantile_cont(l_extendedprice, 0.9), 4) AS q
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT l_returnflag, CAST(0.99 AS DOUBLE) AS p,
        |       round(quantile_cont(l_extendedprice, 0.99), 4) AS q
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag, p""".stripMargin,
    "q_median" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_ntile" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |       CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |                           ORDER BY o_totalprice, o_orderkey) AS BIGINT)
        |         AS quartile
        |FROM orders
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin,
    "text_editdist" ->
      """SELECT a.doc_id,
        |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
        |       CAST(length(a.text) AS BIGINT) AS len_a,
        |       CAST(length(b.text) AS BIGINT) AS len_b
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin,
    "q_window_range" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |       round(avg(value) OVER (
        |         PARTITION BY user_id
        |         ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6)
        |         AS moving_avg
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_lag_delta" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |       epoch_us(CAST(ts AS TIMESTAMP)) -
        |         epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) AS gap_us,
        |       lead(event_type) OVER w AS next_type
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_first_last" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |       first_value(event_type) OVER w AS first_type,
        |       last_value(event_type) OVER w AS last_type,
        |       nth_value(event_id, 2) OVER w AS second_event_id
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_moving_rows" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
        |         AS moving_avg3
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_percent_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin,
    "q_zscore" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |       round((o_totalprice - avg(o_totalprice) OVER w) /
        |             stddev_samp(o_totalprice) OVER w, 6) AS z
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q_stats_agg" ->
      """SELECT o_orderpriority,
        |       round(stddev_samp(o_totalprice), 4) AS sd_price,
        |       round(var_samp(o_totalprice) / CAST(1000000.0 AS DOUBLE), 4)
        |         AS var_price_m,
        |       round(corr(o_totalprice, age_days), 6) AS corr_price_age,
        |       round(covar_samp(o_totalprice, age_days) / CAST(1000000.0 AS DOUBLE), 6)
        |         AS cov_price_age_m,
        |       count(*) AS n_orders
        |FROM (SELECT o_orderpriority, o_totalprice,
        |             CAST(datediff('day', DATE '1995-01-01',
        |                           CAST(o_orderdate AS DATE)) AS DOUBLE) AS age_days
        |      FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_intersect_except" ->
      """SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
        |FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
        |FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
        |FROM events WHERE event_type = 'error'
        |ORDER BY user_id, d""".stripMargin,
    "q_argminmax" ->
      """SELECT o_orderpriority,
        |       (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS max_order,
        |       (max(struct_pack(p := o_totalprice, k := o_orderkey))).p AS max_price,
        |       (min(struct_pack(p := o_totalprice, k := o_orderkey))).k AS min_order,
        |       (min(struct_pack(p := o_totalprice, k := o_orderkey))).p AS min_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(least(greatest(floor((o_totalprice - CAST(0.0 AS DOUBLE)) /
        |                                 CAST(50000.0 AS DOUBLE)),
        |                           CAST(0.0 AS DOUBLE)),
        |                  CAST(11.0 AS DOUBLE)) AS BIGINT) AS bucket,
        |       count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_date_parts" ->
      """SELECT o_orderkey,
        |       CAST(year(d) AS BIGINT) AS yr, CAST(quarter(d) AS BIGINT) AS qtr,
        |       CAST(month(d) AS BIGINT) AS mo, CAST(day(d) AS BIGINT) AS dom,
        |       CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
        |       strftime(last_day(d), '%Y-%m-%d') AS month_end,
        |       strftime(d + 30, '%Y-%m-%d') AS plus30,
        |       CAST(datediff('day', DATE '1995-01-01', d) AS BIGINT) AS age_days
        |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_null_clean" ->
      """SELECT o_orderkey,
        |       coalesce(CASE WHEN o_orderstatus <> 'O' THEN o_orderpriority END,
        |                'UNSPECIFIED') AS priority_clean,
        |       CAST(CASE WHEN (CASE WHEN o_orderstatus <> 'O'
        |                            THEN o_orderpriority END) IS NULL
        |                 THEN 0 ELSE 1 END AS BIGINT) AS priority_present,
        |       round(coalesce(CASE WHEN o_totalprice >= CAST(5000.0 AS DOUBLE)
        |                           THEN o_totalprice END,
        |                      CAST(0.0 AS DOUBLE)), 2) AS price_filled
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_full_outer" ->
      """SELECT coalesce(a.k, b.k) AS k,
        |       CAST(CASE WHEN a.price_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_a,
        |       CAST(CASE WHEN b.price_b IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_b,
        |       round(coalesce(a.price_a, b.price_b), 2) AS price
        |FROM (SELECT o_orderkey AS k, o_totalprice AS price_a FROM orders
        |      WHERE o_orderkey % 2 = 0) a
        |FULL OUTER JOIN
        |     (SELECT o_orderkey AS k, o_totalprice AS price_b FROM orders
        |      WHERE o_orderkey % 3 = 0) b
        |  ON a.k = b.k
        |ORDER BY k""".stripMargin,
    "q_merge" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
        |feed AS (
        |  SELECT o_orderkey AS k,
        |         o_totalprice + CAST(100 AS DOUBLE) AS new_price,
        |         (o_orderkey % 11 = 0) AS is_delete
        |  FROM o WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000 AS k, o_totalprice AS new_price,
        |         false AS is_delete
        |  FROM o WHERE o_orderkey % 13 = 0),
        |kept AS (
        |  SELECT o.o_orderkey,
        |         round(coalesce(f.new_price, o.o_totalprice), 2) AS price,
        |         o.o_orderstatus AS status,
        |         CASE WHEN f.k IS NOT NULL THEN 'update' ELSE 'keep' END AS action
        |  FROM o LEFT JOIN feed f ON o.o_orderkey = f.k
        |  WHERE f.is_delete IS NULL OR NOT f.is_delete),
        |ins AS (
        |  SELECT f.k AS o_orderkey, round(f.new_price, 2) AS price,
        |         CAST(NULL AS VARCHAR) AS status, 'insert' AS action
        |  FROM feed f
        |  WHERE NOT f.is_delete
        |    AND f.k NOT IN (SELECT o_orderkey FROM o))
        |SELECT * FROM kept UNION ALL SELECT * FROM ins
        |ORDER BY o_orderkey""".stripMargin,
    "q_snapshot_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey, o_totalprice AS price_a, o_orderstatus AS status_a
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |b AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 7 = 0
        |              THEN o_totalprice * CAST(2 AS DOUBLE)
        |              ELSE o_totalprice END AS price_b,
        |         o_orderstatus AS status_b
        |  FROM orders WHERE o_orderkey % 5 <> 0),
        |d AS (
        |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |         CASE WHEN a.price_a IS NULL THEN 'insert'
        |              WHEN b.price_b IS NULL THEN 'delete'
        |              WHEN a.price_a <> b.price_b
        |                OR a.status_a <> b.status_b THEN 'update'
        |              ELSE 'same' END AS change,
        |         round(coalesce(b.price_b, a.price_a), 2) AS price
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        |SELECT o_orderkey, change, price FROM d
        |WHERE change <> 'same' ORDER BY o_orderkey""".stripMargin,
    "q_collect_set" ->
      """SELECT user_id,
        |       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        |       count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // The oracle REBUILDS the generated corpus from range(N) with the
    // same closed-form id arithmetic — checking the DSv2 reader's
    // partition planning and row synthesis against pure SQL.
    "src_docgen" ->
      """WITH ids AS (SELECT range AS id FROM range(5000)),
        |d AS (SELECT id,
        |             'gen' || CAST(id % 10 AS VARCHAR) AS source,
        |             5 + id % 20 AS n_words,
        |             array_to_string(
        |               list_transform(range(CAST(5 + id % 20 AS BIGINT)),
        |                 i -> 'w' || CAST((id * 2654435761 + i * 40503) % 1000
        |                                  AS VARCHAR)), ' ') AS text
        |      FROM ids)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_words) AS BIGINT) AS sum_words,
        |       CAST(sum(strlen(text)) AS BIGINT) AS sum_chars
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q_scd2_lookup" ->
      """WITH d AS (SELECT user_id, event_id AS status_event_id,
        |                  CAST(ts AS TIMESTAMP) AS valid_from,
        |                  CAST(lead(ts) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS TIMESTAMP) AS valid_to
        |           FROM events WHERE event_type = 'click' AND user_id < 20),
        |p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |      FROM events WHERE event_type = 'purchase' AND user_id < 20)
        |SELECT p.event_id, p.user_id, p.ts,
        |       d.status_event_id, d.valid_from AS status_from
        |FROM p LEFT JOIN d ON p.user_id = d.user_id
        |  AND p.ts >= d.valid_from
        |  AND (d.valid_to IS NULL OR p.ts < d.valid_to)
        |ORDER BY p.user_id, p.ts, p.event_id""".stripMargin,
    "q_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, min(event_id) AS click_event_id
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |b AS (SELECT p.event_id, p.user_id, p.ts,
        |             c.click_event_id AS b_id, c.ts AS b_ts
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND c.ts <= p.ts),
        |f AS (SELECT p.event_id, c.click_event_id AS f_id, c.ts AS f_ts
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND c.ts >= p.ts),
        |j AS (SELECT b.event_id, b.user_id, b.ts, b.b_id, b.b_ts, f.f_id, f.f_ts,
        |             epoch_us(CAST(b.ts AS TIMESTAMP)) -
        |               epoch_us(CAST(b.b_ts AS TIMESTAMP)) AS db,
        |             epoch_us(CAST(f.f_ts AS TIMESTAMP)) -
        |               epoch_us(CAST(b.ts AS TIMESTAMP)) AS df,
        |             (f.f_id IS NULL OR (b.b_id IS NOT NULL AND
        |              epoch_us(CAST(b.ts AS TIMESTAMP)) -
        |                epoch_us(CAST(b.b_ts AS TIMESTAMP)) <=
        |              epoch_us(CAST(f.f_ts AS TIMESTAMP)) -
        |                epoch_us(CAST(b.ts AS TIMESTAMP)))) AS pick_b
        |      FROM b JOIN f ON b.event_id = f.event_id)
        |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |       CASE WHEN pick_b THEN b_id ELSE f_id END AS near_event_id,
        |       CAST(CASE WHEN pick_b THEN b_ts ELSE f_ts END
        |            AS TIMESTAMP) AS near_ts,
        |       CASE WHEN pick_b THEN db ELSE df END AS delta_us
        |FROM j ORDER BY user_id, ts, event_id""".stripMargin,
    "q_retention_cohort" ->
      """WITH f AS (
        |  SELECT user_id,
        |         CAST(date_trunc('week', CAST(min(ts) AS TIMESTAMP)) AS DATE) AS cw
        |  FROM events GROUP BY user_id)
        |SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
        |       CAST(floor(date_diff('day', f.cw,
        |                  CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) / 7.0) AS BIGINT) AS wk_n,
        |       count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_cohort_ltv" ->
      """WITH f AS (
        |  SELECT user_id,
        |         CAST(date_trunc('week', CAST(min(ts) AS TIMESTAMP)) AS DATE) AS cw
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT f.cw,
        |         CAST(floor(date_diff('day', f.cw,
        |                    CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) / 7.0) AS BIGINT)
        |           AS wk_n,
        |         count(DISTINCT e.user_id) AS n_active,
        |         round(sum(e.value), 2) AS week_value
        |  FROM events e JOIN f USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, wk_n, n_active,
        |       week_value,
        |       round(sum(week_value) OVER (PARTITION BY cw ORDER BY wk_n), 2)
        |         AS cum_value
        |FROM g ORDER BY 1, 2""".stripMargin,
    "q_throttle" ->
      """WITH c AS (SELECT event_id, user_id, event_type,
        |                  CAST(ts AS TIMESTAMP) AS ts FROM events),
        |x AS (SELECT event_id, user_id, event_type, ts,
        |        lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |                                ORDER BY ts, event_id) AS prev_us
        |      FROM c)
        |SELECT event_id, user_id, event_type, ts FROM x
        |WHERE prev_us IS NULL OR epoch_us(ts) - prev_us >= 3600000000
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_entropy" ->
      """WITH cells AS (
        |  SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS hr, count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |       CAST(sum(c) AS BIGINT) AS n,
        |       count(*) AS n_hours,
        |       round(ln(CAST(sum(c) AS DOUBLE)) -
        |             sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) /
        |               CAST(sum(c) AS DOUBLE), 6) AS entropy
        |FROM cells GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Independent O(n²) dominance check — the Spark side never
    // compares pairs (distinct-price prefix-min), so agreement is a
    // real cross-check of the frontier, not a replay.
    "q_skyline" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders o
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders a
        |  WHERE a.o_orderpriority = o.o_orderpriority
        |    AND a.o_totalprice <= o.o_totalprice
        |    AND a.o_orderdate <= o.o_orderdate
        |    AND (a.o_totalprice < o.o_totalprice
        |         OR a.o_orderdate < o.o_orderdate))
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    // Plain grouped aggregates here vs the HOF array pipeline on the
    // Spark side — an independent formulation, not a list replay.
    "q_array_funcs" ->
      """SELECT l_orderkey,
        |       count(*) AS n_items,
        |       sum(l_quantity) AS qty_total,
        |       CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |       CAST(round(max(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS max_net_cents,
        |       CAST(max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS any_return
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "text_weighted_sample" ->
      s"""WITH k AS (
         |  SELECT doc_id, source, n_chars,
         |         (ln(CAST(${duckMd5Bits("CAST(doc_id AS VARCHAR)", 1, 15)} + 1 AS DOUBLE))
         |          - 60 * ln(CAST(2 AS DOUBLE))) / CAST(n_chars AS DOUBLE) AS es_key
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, n_chars,
         |         row_number() OVER (PARTITION BY source
         |                            ORDER BY es_key DESC, doc_id) AS rk
         |  FROM k)
         |SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk <= 3 ORDER BY source, rk""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        |       upper(c_name) AS name_upper,
        |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |       substr(c_name, 1, 8) AS name_prefix,
        |       replace(c_name, '#', '-') AS name_dashed,
        |       reverse(c_mktsegment) AS segment_rev,
        |       CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_exists_sql" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_sequence_agg" ->
      """SELECT user_id,
        |       string_agg(event_type, '>'
        |                  ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |         AS journey,
        |       count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_mode_per_key" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, event_type, cnt,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY cnt DESC, event_type DESC) AS rn
        |  FROM c)
        |SELECT user_id, event_type AS mode_type, cnt AS mode_n
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_scd2" ->
      """SELECT user_id, event_id, event_type AS status,
        |       CAST(ts AS TIMESTAMP) AS valid_from,
        |       CAST(lead(ts) OVER w AS TIMESTAMP) AS valid_to,
        |       CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END
        |            AS BIGINT) AS is_current
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin,
    "q_unpivot" ->
      """SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS val
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'o_custkey', CAST(o_custkey AS DOUBLE)
        |FROM orders
        |ORDER BY o_orderkey, metric""".stripMargin,
    "q_profile" ->
      """SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_null,
        |       count(DISTINCT o_custkey) AS n_distinct,
        |       CAST(min(o_custkey) AS VARCHAR) AS min_s,
        |       CAST(max(o_custkey) AS VARCHAR) AS max_s
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       count(DISTINCT o_orderpriority),
        |       CAST(min(o_orderpriority) AS VARCHAR),
        |       CAST(max(o_orderpriority) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*),
        |       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       count(DISTINCT o_orderstatus),
        |       CAST(min(o_orderstatus) AS VARCHAR),
        |       CAST(max(o_orderstatus) AS VARCHAR)
        |FROM orders
        |ORDER BY column_name""".stripMargin,
    "text_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${textWords()}) AS w FROM documents),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w),
         |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (
         |  SELECT tf.doc_id, tf.w,
         |         CAST(tf.tf AS DOUBLE) *
         |         ln((CAST(n.n_docs AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
         |            (CAST(df.df AS DOUBLE) + CAST(1.0 AS DOUBLE))) AS score
         |  FROM tf JOIN df ON tf.w = df.w CROSS JOIN n),
         |r AS (SELECT doc_id, w, score,
         |             row_number() OVER (PARTITION BY doc_id
         |                                ORDER BY score DESC, w ASC) AS rk
         |      FROM s)
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, w AS term,
         |       round(score, 6) AS tfidf
         |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "text_gopher" ->
      s"""WITH b AS (
         |  SELECT doc_id, ${textWords()} AS w,
         |         length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS nalnum
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, len(w) AS n_words,
         |         CAST(nalnum AS DOUBLE) /
         |           greatest(CAST(len(w) AS DOUBLE), CAST(1 AS DOUBLE)) AS mean_wl,
         |         len(list_intersect(list_distinct(w),
         |             ['the', 'a', 'of', 'and', 'to', 'in', 'is'])) AS n_stop,
         |         CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
         |              AS DOUBLE) /
         |           greatest(CAST(len(w) AS DOUBLE), CAST(1 AS DOUBLE)) AS alpha_r
         |  FROM b)
         |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         |       round(mean_wl, 6) AS mean_word_len,
         |       CAST(n_stop AS BIGINT) AS n_stop_distinct,
         |       round(alpha_r, 6) AS alpha_ratio,
         |       CAST(CASE WHEN n_words BETWEEN 50 AND 100000
         |                 THEN 1 ELSE 0 END AS BIGINT) AS pass_word_count,
         |       CAST(CASE WHEN mean_wl BETWEEN 3.0 AND 10.0
         |                 THEN 1 ELSE 0 END AS BIGINT) AS pass_mean_len,
         |       CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT)
         |         AS pass_stopwords,
         |       CAST(CASE WHEN alpha_r >= 0.8 THEN 1 ELSE 0 END AS BIGINT)
         |         AS pass_alpha,
         |       CAST(CASE WHEN n_words BETWEEN 50 AND 100000
         |                  AND mean_wl BETWEEN 3.0 AND 10.0
         |                  AND n_stop >= 2 AND alpha_r >= 0.8
         |                 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_scrub" ->
      """WITH s AS (
        |  SELECT doc_id, lower(text) AS lt,
        |         regexp_replace(regexp_replace(lower(text),
        |           '\b(customer|supplier)\b', '[X]', 'g'),
        |           '[0-9]{3,}', '[N]', 'g') AS scrubbed
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(lt, '\b(customer|supplier)\b'))
        |            AS BIGINT) AS n_blocked,
        |       CAST(len(regexp_extract_all(lt, '[0-9]{3,}')) AS BIGINT) AS n_nums,
        |       md5(scrubbed) AS scrub_fp,
        |       CAST(length(scrubbed) AS BIGINT) AS n_chars_scrubbed
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_domain_mix" ->
      s"""WITH p AS (
         |  SELECT source, count(*) AS n_docs,
         |         count(DISTINCT lang) AS n_langs,
         |         sum(len(${textWords()})) AS sum_words,
         |         round(avg(CAST(length(text) AS DOUBLE)), 6) AS avg_chars
         |  FROM documents GROUP BY source),
         |t AS (SELECT count(*) AS n_total FROM documents)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |       round(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
         |         AS doc_share,
         |       CAST(n_langs AS BIGINT) AS n_langs,
         |       CAST(sum_words AS BIGINT) AS sum_words, avg_chars
         |FROM p CROSS JOIN t ORDER BY source""".stripMargin,
    "text_subsample" -> {
      val rateCase = graft.functions.TextFunctions.sourceRates
        .map { case (s, r) => s"WHEN '$s' THEN $r" }.mkString(" ")
      s"""WITH r AS (
         |  SELECT doc_id, source,
         |         ${duckMd5Bits("CAST(doc_id AS VARCHAR)", 1, 7)} % 100 AS bucket,
         |         CASE source $rateCase ELSE 0 END AS rate_pct
         |  FROM documents)
         |SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket
         |FROM r WHERE bucket < rate_pct ORDER BY doc_id""".stripMargin
    },
    "text_split" ->
      s"""WITH r AS (
         |  SELECT doc_id, source,
         |         ${duckMd5Bits("CAST(doc_id AS VARCHAR)", 1, 7)} % 100 AS bucket
         |  FROM documents)
         |SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket,
         |       CASE WHEN bucket < 10 THEN 'test'
         |            WHEN bucket < 20 THEN 'val' ELSE 'train' END AS split
         |FROM r ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(
         |    CASE WHEN len(w) >= 2
         |         THEN list_transform(range(len(w) - 1),
         |                i -> w[i+1] || ' ' || w[i+2])
         |         ELSE CAST([] AS VARCHAR[]) END) AS bg
         |  FROM t),
         |c AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2),
         |p AS (SELECT doc_id, sum(n) AS n_bigrams, count(*) AS n_distinct,
         |             max(n) AS max_occ
         |      FROM c GROUP BY doc_id)
         |SELECT d.doc_id,
         |       CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |       CAST(coalesce(p.n_distinct, 0) AS BIGINT) AS n_distinct,
         |       CAST(coalesce(p.max_occ, 0) AS BIGINT) AS max_occ,
         |       round(CASE WHEN p.n_bigrams IS NULL THEN 0.0
         |             ELSE 1.0 - CAST(p.n_distinct AS DOUBLE) /
         |                        CAST(p.n_bigrams AS DOUBLE) END, 6) AS dup_frac,
         |       round(CASE WHEN p.n_bigrams IS NULL THEN 0.0
         |             ELSE CAST(p.max_occ AS DOUBLE) /
         |                  CAST(p.n_bigrams AS DOUBLE) END, 6) AS top_frac
         |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "dedup_containment" ->
      s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
         |win AS (
         |  SELECT doc_id, unnest(
         |    CASE WHEN len(w) >= 8
         |         THEN list_transform(range(len(w) - 7),
         |                i -> array_to_string(w[i+1:i+8], ' '))
         |         ELSE CAST([] AS VARCHAR[]) END) AS s
         |  FROM t),
         |g AS (SELECT DISTINCT doc_id, ${duckMd5Bits("s", 1, 15)} AS h FROM win),
         |n AS (SELECT doc_id, count(*) AS n_g FROM g GROUP BY doc_id),
         |k AS (SELECT g.doc_id, g.h FROM g
         |      JOIN (SELECT h FROM g GROUP BY h HAVING count(*) <= 1000) hc
         |        ON g.h = hc.h),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |      FROM k a JOIN k b ON a.h = b.h AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2)
         |SELECT id_a, id_b, n_shared,
         |       round(CAST(n_shared AS DOUBLE) / na.n_g, 6) AS contain_a,
         |       round(CAST(n_shared AS DOUBLE) / nb.n_g, 6) AS contain_b
         |FROM p JOIN n na ON p.id_a = na.doc_id
         |       JOIN n nb ON p.id_b = nb.doc_id
         |WHERE round(CAST(n_shared AS DOUBLE) / na.n_g, 6) >= 0.2
         |   OR round(CAST(n_shared AS DOUBLE) / nb.n_g, 6) >= 0.2
         |ORDER BY id_a, id_b""".stripMargin,
    "text_contamination" ->
      s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
         |win AS (
         |  SELECT doc_id, unnest(
         |    CASE WHEN len(w) >= 8
         |         THEN list_transform(range(len(w) - 7),
         |                i -> array_to_string(w[i+1:i+8], ' '))
         |         ELSE CAST([] AS VARCHAR[]) END) AS s
         |  FROM t),
         |g AS (SELECT DISTINCT doc_id, ${duckMd5Bits("s", 1, 15)} AS h FROM win),
         |ev AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, h FROM g WHERE doc_id % 97 <> 0),
         |p AS (SELECT tr.doc_id, count(*) AS n_grams,
         |             sum(CASE WHEN ev.h IS NULL THEN 0 ELSE 1 END) AS n_hit
         |      FROM tr LEFT JOIN ev ON tr.h = ev.h GROUP BY 1)
         |SELECT d.doc_id,
         |       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
         |       CAST(coalesce(p.n_hit, 0) AS BIGINT) AS n_hit,
         |       round(CASE WHEN p.n_grams IS NULL THEN 0.0
         |             ELSE CAST(p.n_hit AS DOUBLE) /
         |                  CAST(p.n_grams AS DOUBLE) END, 6) AS contam_frac
         |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
         |WHERE d.doc_id % 97 <> 0
         |ORDER BY d.doc_id""".stripMargin,
    "mm_embed_topk" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS payload,
        |         CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |e AS (
        |  SELECT doc_id, list_transform(range(8), i ->
        |           CASE WHEN n = 0 THEN CAST(1.0 AS DOUBLE)
        |                ELSE CAST(CAST(concat('0x',
        |                       substr(hex(payload),
        |                              CAST((i % n) * 2 + 1 AS INTEGER), 2))
        |                     AS INTEGER) + 1.0 AS DOUBLE) END) AS emb
        |  FROM m),
        |q AS (SELECT doc_id AS q_id, emb AS q_emb FROM e
        |      WHERE doc_id % 101 = 0),
        |s AS (
        |  SELECT q.q_id, e.doc_id AS nb_id,
        |         list_cosine_similarity(CAST(e.emb AS DOUBLE[]),
        |                                CAST(q.q_emb AS DOUBLE[])) AS cos
        |  FROM e CROSS JOIN q WHERE e.doc_id <> q.q_id),
        |r AS (SELECT q_id, nb_id, cos,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos DESC, nb_id) AS rk
        |      FROM s)
        |SELECT q_id, CAST(rk AS BIGINT) AS rk, nb_id, round(cos, 6) AS cos
        |FROM r WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin,
    "text_curriculum" ->
      s"""WITH occ AS (
         |  SELECT doc_id, unnest(${textWords()}) AS tok FROM documents),
         |vocab AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY tok),
         |p AS (SELECT o.doc_id, count(*) AS n_toks, sum(v.cnt) AS sum_cnt
         |      FROM occ o JOIN vocab v ON o.tok = v.tok GROUP BY o.doc_id),
         |s AS (SELECT d.doc_id, d.source,
         |             CAST(coalesce(p.n_toks, 0) AS BIGINT) AS n_toks,
         |             CASE WHEN coalesce(p.n_toks, 0) = 0 THEN 0.0
         |                  ELSE CAST(p.sum_cnt AS DOUBLE) / CAST(p.n_toks AS DOUBLE)
         |                  END AS mean_cnt
         |      FROM documents d LEFT JOIN p USING (doc_id)),
         |b AS (SELECT doc_id, source, n_toks,
         |             ntile(4) OVER (PARTITION BY source
         |                            ORDER BY mean_cnt DESC, doc_id) AS bucket
         |      FROM s)
         |SELECT source, CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
         |       CAST(sum(n_toks) AS BIGINT) AS tok_volume
         |FROM b GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,
    "text_rarity" ->
      s"""WITH occ AS (
         |  SELECT doc_id, unnest(${textWords()}) AS tok FROM documents),
         |vocab AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY tok),
         |tot AS (SELECT sum(cnt) AS t_total FROM vocab),
         |p AS (
         |  SELECT o.doc_id, count(*) AS n_toks, sum(v.cnt) AS sum_cnt
         |  FROM occ o JOIN vocab v ON o.tok = v.tok
         |  GROUP BY o.doc_id)
         |SELECT d.doc_id,
         |       CAST(coalesce(p.n_toks, 0) AS BIGINT) AS n_toks,
         |       CAST(coalesce(p.sum_cnt, 0) AS BIGINT) AS sum_cnt,
         |       round(CASE WHEN p.n_toks IS NULL THEN 0.0
         |             ELSE -ln(CAST(p.sum_cnt AS DOUBLE) /
         |                      (CAST(p.n_toks AS DOUBLE) *
         |                       CAST(tot.t_total AS DOUBLE))) END, 6) AS rarity
         |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
         |CROSS JOIN tot
         |ORDER BY d.doc_id""".stripMargin,
    "q_heavy_hitters" ->
      """WITH perkey AS (
        |  SELECT l_orderkey AS key, count(*) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(n_rows) AS n_total FROM perkey),
        |r AS (SELECT key, n_rows,
        |             row_number() OVER (ORDER BY n_rows DESC, key) AS rk
        |      FROM perkey)
        |SELECT CAST(rk AS BIGINT) AS rk, key, n_rows,
        |       round(CAST(n_rows AS DOUBLE) / CAST(tot.n_total AS DOUBLE), 6)
        |         AS share
        |FROM r CROSS JOIN tot WHERE rk <= 20 ORDER BY rk""".stripMargin,
    // Stage timestamps compared at µs (CAST up front) to match Spark's
    // micro-floored reader; share = n/stage1 rounded at the edge.
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'click' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'purchase'
        |         AND e.ts >= s1.t1 AND e.ts <= s1.t1 + INTERVAL 6 HOUR
        |       GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |       FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'signup'
        |         AND e.ts >= s2.t2 AND e.ts <= s2.t2 + INTERVAL 6 HOUR
        |       GROUP BY e.user_id),
        |c AS (
        |  SELECT '1_click' AS stage, count(*) AS n_users FROM s1
        |  UNION ALL SELECT '2_purchase', count(*) FROM s2
        |  UNION ALL SELECT '3_signup', count(*) FROM s3),
        |b AS (SELECT greatest(n_users, 1) AS base FROM c WHERE stage = '1_click')
        |SELECT stage, n_users,
        |       round(CAST(n_users AS DOUBLE) / base, 6) AS share
        |FROM c CROSS JOIN b ORDER BY stage""".stripMargin,
    "q_gap_fill" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, value
        |  FROM events WHERE user_id < 10),
        |daily AS (
        |  SELECT user_id, day, count(*) AS n, sum(value) AS s
        |  FROM e GROUP BY user_id, day),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |           AS day
        |  FROM b),
        |grid AS (
        |  SELECT u.user_id, spine.day
        |  FROM (SELECT DISTINCT user_id FROM e) u CROSS JOIN spine)
        |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
        |       coalesce(d.n, 0) AS n_events,
        |       round(coalesce(d.s, CAST(0 AS DOUBLE)), 2) AS sum_value
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, day""".stripMargin,
    // Merged incremental state must equal the one-pass recompute —
    // the oracle IS the full recompute over all raw events.
    "q_incr_agg" ->
      """SELECT user_id, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value,
        |       CAST(min(ts) AS TIMESTAMP) AS first_ts,
        |       CAST(max(ts) AS TIMESTAMP) AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // The bloom prune is exact after the join removes false positives,
    // so the oracle is simply the unpruned join.
    "q_bloom_prune" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |       count(*) AS n_items,
        |       round(sum(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)), 2)
        |         AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_knn_graph" ->
      """WITH s AS (
        |  SELECT a.vec_id, b.vec_id AS nb_id,
        |         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                CAST(b.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (SELECT vec_id, nb_id, cos,
        |             row_number() OVER (PARTITION BY vec_id
        |                                ORDER BY cos DESC, nb_id) AS rk
        |      FROM s)
        |SELECT vec_id, CAST(rk AS BIGINT) AS rk, nb_id, round(cos, 6) AS cos
        |FROM r WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin,
    "text_ngram_freq" ->
      s"""WITH t AS (SELECT ${textWords()} AS w FROM documents),
         |b AS (SELECT unnest(
         |        CASE WHEN len(w) >= 2
         |             THEN list_transform(range(len(w) - 1),
         |                    i -> w[i+1] || ' ' || w[i+2])
         |             ELSE CAST([] AS VARCHAR[]) END) AS bigram FROM t),
         |c AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram),
         |r AS (SELECT bigram, n,
         |             row_number() OVER (ORDER BY n DESC, bigram ASC) AS rk
         |      FROM c)
         |SELECT CAST(rk AS BIGINT) AS rk, bigram, n
         |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,
    "q_asof_join" -> duckAsOf,
    "q_asof_native" -> duckAsOf,
    "q_asof_broadcast" -> duckAsOf,
    "q_asof_forward" -> duckAsOfForward,
    "q_range_join" -> duckRangeJoin,
    "q_range_join_native" -> duckRangeJoin,
    "q_salted_join_agg" ->
      """SELECT o.o_orderpriority,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "dedup_exact" -> duckExact,
    "dedup_ngram_jaccard" -> duckNgram,
    "dedup_span" -> duckSpan,
    "dedup_minhash" -> duckMinhash,
    "dedup_lsh_sweep" -> duckLshSweep,
    "dedup_incremental" -> duckIncrementalDedup,
    "dedup_compact_probe" -> duckCompactProbe,
    "dedup_compact_grams" -> duckCompactGrams,
    "dedup_substring" -> duckSubstring,
    "dedup_substring_apply" -> duckSubstringApply,
    "dedup_substring_incremental" -> duckSubstringIncremental,
    "text_dsir" -> duckDsir,
    "text_dsir_resample" -> duckDsirResample,
    "dedup_simhash" -> duckSimhash,
    "dedup_clusters" -> duckClusters,
    // Survivors of BOTH detectors, applied to the corpus.
    "dedup_apply" ->
      s"""WITH ck AS ($duckClusters),
         |ex AS (SELECT keep_id AS doc_id FROM ($duckExact))
         |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
         |FROM documents d
         |JOIN ck ON d.doc_id = ck.doc_id AND ck.keep = 1
         |JOIN ex ON d.doc_id = ex.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "dedup_report" ->
      s"""SELECT method, n FROM (
         |  SELECT 'exact_dup_groups' AS method, count(*) AS n
         |  FROM ($duckExact) WHERE n_dups > 1
         |  UNION ALL SELECT 'minhash_pairs', count(*) FROM ($duckMinhash)
         |  UNION ALL SELECT 'ngram_pairs', count(*) FROM ($duckNgram)
         |  UNION ALL SELECT 'simhash_pairs', count(*) FROM ($duckSimhash)
         |  UNION ALL SELECT 'span_hashes', count(*) FROM ($duckSpan)
         |) ORDER BY method""".stripMargin,
    "sim_centroid_classify" ->
      """WITH pos AS (
        |  SELECT label, vec_id, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, list(avg_v ORDER BY pos) AS centroid
        |  FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS avg_v
        |        FROM pos GROUP BY label, pos)
        |  GROUP BY label),
        |sc AS (
        |  SELECT e.vec_id, e.label, c.label AS pred_label,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                c.centroid) AS cos
        |  FROM embeddings e CROSS JOIN cent c),
        |r AS (
        |  SELECT vec_id, label, pred_label,
        |         row_number() OVER (PARTITION BY vec_id
        |                            ORDER BY cos DESC, pred_label ASC) AS rk
        |  FROM sc)
        |SELECT label, pred_label, count(*) AS n_vecs
        |FROM r WHERE rk = 1
        |GROUP BY label, pred_label ORDER BY label, pred_label""".stripMargin,
    // Replays rpBandValues per band: band_idx = j // bw, bit = j % bw,
    // so the widest shift is bw-1 <= 25 — never the `1 << 63` a packed
    // 64-bit signature replay would hit at tier 2 (4 x 16 bits).
    // emb_in plants the 3 deterministic probe vectors (same float
    // rounding as Similarity.withProbes) so the row is non-vacuous.
    "sim_rp_lsh" ->
      s"""WITH emb_in AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + ${Similarity.ProbeIdOffset},
         |         list_transform(embedding,
         |           x -> CAST(x * CAST(1.01 AS DOUBLE)
         |                       + CAST(0.001 AS DOUBLE) AS REAL))
         |  FROM (SELECT vec_id, embedding FROM embeddings
         |        ORDER BY vec_id LIMIT 3)),
         |bwsel AS (
         |  SELECT CASE WHEN count(*) <= ${Similarity.RpAdaptiveCutoff} THEN 8
         |              WHEN count(*) <= ${Similarity.RpWideCutoff} THEN 16
         |              WHEN count(*) <= ${Similarity.RpHugeCutoff} THEN 21
         |              WHEN count(*) <= ${Similarity.RpVastCutoff} THEN 26
         |              ELSE 30 END AS bw,
         |         CASE WHEN count(*) <= ${Similarity.RpWideCutoff} THEN 4
         |              WHEN count(*) <= ${Similarity.RpHugeCutoff} THEN 3
         |              ELSE 6 END AS nb
         |  FROM emb_in),
         |el AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM emb_in),
         |hp AS (
         |  SELECT p.pos, j.j,
         |         CASE WHEN ${duckMd5Bits(
                     "CAST(j.j AS VARCHAR) || '_' || CAST(p.pos AS VARCHAR)", 1, 15)}
         |                   & 1 = 1
         |              THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE)
         |         END AS s
         |  FROM (SELECT DISTINCT pos FROM el) p
         |  CROSS JOIN (SELECT unnest(range(
         |                (SELECT nb * bw FROM bwsel))) AS j) j),
         |d AS (
         |  SELECT el.vec_id, hp.j, sum(el.v * hp.s) AS dj
         |  FROM el JOIN hp ON el.pos = hp.pos GROUP BY el.vec_id, hp.j),
         |bv AS (
         |  SELECT vec_id,
         |         CAST(j // (SELECT bw FROM bwsel) AS INTEGER) AS band_idx,
         |         CAST(sum(CASE WHEN dj > 0
         |                       THEN (CAST(1 AS BIGINT)
         |                             << CAST(j % (SELECT bw FROM bwsel)
         |                                     AS INTEGER))
         |                       ELSE CAST(0 AS BIGINT) END) AS BIGINT)
         |           AS band_val
         |  FROM d GROUP BY vec_id, band_idx),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
         |  FROM bv a JOIN bv c
         |    ON a.band_idx = c.band_idx AND a.band_val = c.band_val
         |   AND a.vec_id < c.vec_id),
         |sc AS (
         |  SELECT cand.id_a, cand.id_b,
         |         list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
         |                                CAST(eb.embedding AS DOUBLE[])) AS cos
         |  FROM cand
         |  JOIN emb_in ea ON ea.vec_id = cand.id_a
         |  JOIN emb_in eb ON eb.vec_id = cand.id_b)
         |SELECT id_a, id_b, round(cos, 6) AS cos
         |FROM sc WHERE cos >= CAST(0.5 AS DOUBLE)
         |ORDER BY id_a, id_b""".stripMargin,
    "dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    // Same oracle as sim_bruteforce_topk: the SQL surface must return
    // the identical ranking through the registered native expression.
    "sim_sql_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.q_id, e.vec_id,
        |             list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                    CAST(e.embedding AS DOUBLE[])) AS cos
        |      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, cos,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos DESC, vec_id) AS rk
        |      FROM s)
        |SELECT q_id, rk, vec_id, round(cos, 6) AS cos
        |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "sim_bruteforce_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.q_id, e.vec_id,
        |             list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                    CAST(e.embedding AS DOUBLE[])) AS cos
        |      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, cos,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos DESC, vec_id) AS rk
        |      FROM s)
        |SELECT q_id, rk, vec_id, round(cos, 6) AS cos
        |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "sim_range_search" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.q_id, e.vec_id,
        |             list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                    CAST(e.embedding AS DOUBLE[])) AS cos
        |      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, round(cos, 6) AS cos FROM s
        |WHERE cos >= 0.3 ORDER BY q_id, vec_id""".stripMargin,
    "sim_mrl_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 8),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |s AS (SELECT q.q_id, e.vec_id, q.q_emb, e.emb,
        |             list_cosine_similarity(q.q_emb[1:8], e.emb[1:8]) AS cos_c
        |      FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id),
        |c AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |                                   ORDER BY cos_c DESC, vec_id) AS crk
        |      FROM s),
        |r AS (SELECT q_id, vec_id,
        |             list_cosine_similarity(q_emb, emb) AS cos
        |      FROM c WHERE crk <= 25),
        |f AS (SELECT q_id, vec_id, cos,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos DESC, vec_id) AS rk
        |      FROM r)
        |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id, round(cos, 6) AS cos
        |FROM f WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "q_cogroup_profile" ->
      """WITH o AS (SELECT o_custkey AS k, count(*) AS n_orders,
        |                  min(epoch_us(o_orderdate)) AS first_o
        |           FROM orders GROUP BY 1),
        |e AS (SELECT user_id AS k, count(*) AS n_events,
        |             min(epoch_us(CAST(ts AS TIMESTAMP))) AS first_e
        |      FROM events GROUP BY 1)
        |SELECT coalesce(o.k, e.k) AS key,
        |       CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
        |       CAST(coalesce(e.n_events, 0) AS BIGINT) AS n_events,
        |       CASE WHEN o.k IS NULL OR e.k IS NULL THEN NULL
        |            ELSE CAST(floor((o.first_o - e.first_e) / 86400000000.0)
        |                 AS BIGINT) END AS delta_days
        |FROM o FULL OUTER JOIN e ON o.k = e.k
        |ORDER BY key""".stripMargin,
    "sim_sq_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |m AS (SELECT vec_id, emb,
        |             list_max(list_transform(emb, x -> abs(x))) AS mx
        |      FROM e),
        |z AS (SELECT vec_id,
        |             list_transform(emb, x -> CAST(floor(
        |               x * (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 1.0 END)
        |               + 0.5) AS DOUBLE)) AS qv
        |      FROM m),
        |q AS (SELECT vec_id AS q_id, qv AS q_qv FROM z WHERE vec_id < 8),
        |s AS (SELECT q.q_id, z.vec_id,
        |             list_cosine_similarity(q.q_qv, z.qv) AS cos_q
        |      FROM q CROSS JOIN z WHERE z.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, cos_q,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos_q DESC, vec_id) AS rk
        |      FROM s)
        |SELECT q_id, rk, vec_id, round(cos_q, 6) AS cos_q
        |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "sim_ivf_topk" ->
      """WITH pos AS (
        |  SELECT label, vec_id, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, list(avg_v ORDER BY pos) AS centroid
        |  FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS avg_v
        |        FROM pos GROUP BY label, pos)
        |  GROUP BY label),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |      FROM embeddings WHERE vec_id < 8),
        |cellrank AS (
        |  SELECT q.q_id, q.q_emb, c.label,
        |         row_number() OVER (PARTITION BY q.q_id
        |           ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                           c.centroid) DESC,
        |                    c.label) AS cell_rk
        |  FROM q CROSS JOIN cent c),
        |probed AS (SELECT q_id, q_emb, label FROM cellrank WHERE cell_rk <= 2),
        |s AS (SELECT p.q_id, e.vec_id,
        |             list_cosine_similarity(CAST(p.q_emb AS DOUBLE[]),
        |                                    CAST(e.embedding AS DOUBLE[])) AS cos
        |      FROM probed p JOIN embeddings e ON e.label = p.label
        |      WHERE e.vec_id <> p.q_id),
        |r AS (SELECT q_id, vec_id, cos,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos DESC, vec_id) AS rk
        |      FROM s)
        |SELECT q_id, rk, vec_id, round(cos, 6) AS cos
        |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Replays the full PQ pipeline: subvector split, sample codebook,
    // argmin encode, ADC tables, fixed-order distance reassembly.
    // Squared L2 is an explicit index-order fold (list_zip lambda) on
    // both engines — list_distance's sqrt+square would drift ulps.
    "sim_pq_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |sub AS (
        |  SELECT vec_id, j.j, emb[j.j*16+1 : j.j*16+16] AS sv
        |  FROM e CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) j),
        |cb AS (SELECT j, CAST(vec_id AS INTEGER) AS c, sv AS cw
        |       FROM sub WHERE vec_id < 16),
        |asg AS (
        |  SELECT s.vec_id, s.j, b.c,
        |         row_number() OVER (PARTITION BY s.vec_id, s.j
        |           ORDER BY list_sum(list_transform(list_zip(s.sv, b.cw),
        |                      p -> (p[1]-p[2])*(p[1]-p[2]))), b.c) AS rn
        |  FROM sub s JOIN cb b ON s.j = b.j),
        |codes AS (SELECT vec_id, j, c FROM asg WHERE rn = 1),
        |qd AS (
        |  SELECT s.vec_id AS q_id, s.j, b.c,
        |         list_sum(list_transform(list_zip(s.sv, b.cw),
        |           p -> (p[1]-p[2])*(p[1]-p[2]))) AS qd
        |  FROM sub s JOIN cb b ON s.j = b.j WHERE s.vec_id < 8),
        |agg AS (
        |  SELECT q.q_id, codes.vec_id,
        |         sum(CASE WHEN codes.j = 0 THEN q.qd END) AS p0,
        |         sum(CASE WHEN codes.j = 1 THEN q.qd END) AS p1,
        |         sum(CASE WHEN codes.j = 2 THEN q.qd END) AS p2,
        |         sum(CASE WHEN codes.j = 3 THEN q.qd END) AS p3
        |  FROM codes JOIN qd q ON codes.j = q.j AND codes.c = q.c
        |  WHERE codes.vec_id <> q.q_id
        |  GROUP BY q.q_id, codes.vec_id),
        |r AS (
        |  SELECT q_id, vec_id, ((p0 + p1) + p2) + p3 AS adist,
        |         row_number() OVER (PARTITION BY q_id
        |           ORDER BY ((p0 + p1) + p2) + p3, vec_id) AS rk
        |  FROM agg)
        |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id,
        |       round(adist, 6) AS approx_dist
        |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Replays the COMPOSED pipeline: centroid cell probe (sim_ivf_topk's
    // CTEs) restricting the candidate set, PQ encode + ADC
    // (sim_pq_topk's CTEs) ranking it.
    "sim_ivfpq_topk" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |pos AS (
        |  SELECT label, vec_id, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, list(avg_v ORDER BY pos) AS centroid
        |  FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS avg_v
        |        FROM pos GROUP BY label, pos)
        |  GROUP BY label),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |      FROM embeddings WHERE vec_id < 8),
        |cellrank AS (
        |  SELECT q.q_id, c.label,
        |         row_number() OVER (PARTITION BY q.q_id
        |           ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                           c.centroid) DESC,
        |                    c.label) AS cell_rk
        |  FROM q CROSS JOIN cent c),
        |probed AS (SELECT q_id, label FROM cellrank WHERE cell_rk <= 2),
        |sub AS (
        |  SELECT vec_id, j.j, emb[j.j*16+1 : j.j*16+16] AS sv
        |  FROM e CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) j),
        |cb AS (SELECT j, CAST(vec_id AS INTEGER) AS c, sv AS cw
        |       FROM sub WHERE vec_id < 16),
        |asg AS (
        |  SELECT s.vec_id, s.j, b.c,
        |         row_number() OVER (PARTITION BY s.vec_id, s.j
        |           ORDER BY list_sum(list_transform(list_zip(s.sv, b.cw),
        |                      p -> (p[1]-p[2])*(p[1]-p[2]))), b.c) AS rn
        |  FROM sub s JOIN cb b ON s.j = b.j),
        |codes AS (SELECT vec_id, j, c FROM asg WHERE rn = 1),
        |qd AS (
        |  SELECT s.vec_id AS q_id, s.j, b.c,
        |         list_sum(list_transform(list_zip(s.sv, b.cw),
        |           p -> (p[1]-p[2])*(p[1]-p[2]))) AS qd
        |  FROM sub s JOIN cb b ON s.j = b.j WHERE s.vec_id < 8),
        |cand AS (
        |  SELECT p.q_id, e.vec_id FROM probed p
        |  JOIN e ON e.label = p.label WHERE e.vec_id <> p.q_id),
        |agg AS (
        |  SELECT cand.q_id, codes.vec_id,
        |         sum(CASE WHEN codes.j = 0 THEN q.qd END) AS p0,
        |         sum(CASE WHEN codes.j = 1 THEN q.qd END) AS p1,
        |         sum(CASE WHEN codes.j = 2 THEN q.qd END) AS p2,
        |         sum(CASE WHEN codes.j = 3 THEN q.qd END) AS p3
        |  FROM cand
        |  JOIN codes ON codes.vec_id = cand.vec_id
        |  JOIN qd q ON q.q_id = cand.q_id
        |            AND codes.j = q.j AND codes.c = q.c
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT q_id, vec_id, ((p0 + p1) + p2) + p3 AS adist,
        |         row_number() OVER (PARTITION BY q_id
        |           ORDER BY ((p0 + p1) + p2) + p3, vec_id) AS rk
        |  FROM agg)
        |SELECT q_id, CAST(rk AS BIGINT) AS rk, vec_id,
        |       round(adist, 6) AS approx_dist
        |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Replays BOTH rankings (brute-force + IVF probe) and intersects —
    // the recall measurement itself is what's being verified.
    "sim_recall_report" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 8),
        |bs AS (SELECT q.q_id, e.vec_id,
        |              list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                     CAST(e.embedding AS DOUBLE[])) AS cos
        |       FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
        |br AS (SELECT q_id, vec_id,
        |              row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos DESC, vec_id) AS rk
        |       FROM bs),
        |exact AS (SELECT q_id, vec_id FROM br WHERE rk <= 5),
        |pos AS (
        |  SELECT label, vec_id, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, list(avg_v ORDER BY pos) AS centroid
        |  FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS avg_v
        |        FROM pos GROUP BY label, pos)
        |  GROUP BY label),
        |cellrank AS (
        |  SELECT q.q_id, q.q_emb, c.label,
        |         row_number() OVER (PARTITION BY q.q_id
        |           ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                           c.centroid) DESC,
        |                    c.label) AS cell_rk
        |  FROM q CROSS JOIN cent c),
        |probed AS (SELECT q_id, q_emb, label FROM cellrank WHERE cell_rk <= 2),
        |ivs AS (SELECT p.q_id, e.vec_id,
        |               list_cosine_similarity(CAST(p.q_emb AS DOUBLE[]),
        |                                      CAST(e.embedding AS DOUBLE[])) AS cos
        |        FROM probed p JOIN embeddings e ON e.label = p.label
        |        WHERE e.vec_id <> p.q_id),
        |ivr AS (SELECT q_id, vec_id,
        |               row_number() OVER (PARTITION BY q_id
        |                                  ORDER BY cos DESC, vec_id) AS rk
        |        FROM ivs),
        |approx AS (SELECT q_id, vec_id FROM ivr WHERE rk <= 5)
        |SELECT e.q_id,
        |       CAST(count(a.vec_id) AS BIGINT) AS n_hits,
        |       round(CAST(count(a.vec_id) AS DOUBLE) / 5, 6) AS recall
        |FROM exact e LEFT JOIN approx a
        |  ON e.q_id = a.q_id AND e.vec_id = a.vec_id
        |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin,
    "mm_decode_stats" -> (s"WITH $duckMediaMeta\n" +
      """SELECT doc_id, kind, n_bytes,
        |       CAST(CASE WHEN kind = 'audio' THEN 0
        |                 ELSE 16 + b0 % 64 END AS INTEGER) AS width,
        |       CAST(CASE WHEN kind = 'audio' THEN 0
        |                 ELSE 16 + b1 % 64 END AS INTEGER) AS height,
        |       CAST(CASE WHEN kind = 'image' THEN 1
        |                 WHEN kind = 'audio' THEN 0
        |                 ELSE 1 + b1 % 240 END AS INTEGER) AS n_frames,
        |       CAST(CASE WHEN kind = 'audio' THEN 8000 + (b0 % 5) * 8000
        |                 ELSE 0 END AS INTEGER) AS sample_rate
        |FROM m ORDER BY doc_id""".stripMargin),
    "mm_modality_route" -> (s"WITH $duckMediaMeta,\n" +
      """r AS (
        |  SELECT kind, n_bytes,
        |         CASE WHEN kind = 'image'
        |              THEN (16 + b0 % 64) * (16 + b1 % 64) * 3
        |              WHEN kind = 'video'
        |              THEN (1 + b1 % 240) * (16 + b0 % 64) * (16 + b1 % 64) * 3
        |              ELSE (n_bytes // 2) * 2 END AS est_out
        |  FROM m)
        |SELECT kind, count(*) AS n_items,
        |       CAST(sum(n_bytes) AS BIGINT) AS in_bytes,
        |       CAST(sum(est_out) AS BIGINT) AS out_bytes
        |FROM r GROUP BY kind ORDER BY kind""".stripMargin),
    // Same byte-derived dims as mm_decode_stats; resize math in exact
    // small-int double space (floor of products ≤ 2^24) both engines.
    "mm_resize_stats" -> (s"WITH $duckMediaMeta,\n" +
      """d AS (
        |  SELECT doc_id, kind,
        |         CAST(16 + b0 % 64 AS INTEGER) AS width,
        |         CAST(16 + b1 % 64 AS INTEGER) AS height,
        |         CAST(CASE WHEN kind = 'image' THEN 1
        |                   ELSE 1 + b1 % 240 END AS INTEGER) AS n_frames
        |  FROM m WHERE kind <> 'audio'),
        |r AS (
        |  SELECT doc_id, kind, width, height, n_frames,
        |         CAST(floor(CAST(width * 224 AS DOUBLE) /
        |                    greatest(width, height)) AS INTEGER) AS out_w,
        |         CAST(floor(CAST(height * 224 AS DOUBLE) /
        |                    greatest(width, height)) AS INTEGER) AS out_h
        |  FROM d)
        |SELECT doc_id, kind, width, height, out_w, out_h,
        |       CAST(n_frames AS BIGINT) * out_w * out_h * 3 AS out_bytes
        |FROM r ORDER BY doc_id""".stripMargin),
    // 16-bit PCM chunking in pure integer math; audio kind + rate come
    // from the same byte-derived metadata as mm_decode_stats.
    "mm_audio_chunks" -> (s"WITH $duckMediaMeta,\n" +
      """a AS (
        |  SELECT doc_id,
        |         CAST(8000 + (b0 % 5) * 8000 AS INTEGER) AS sample_rate,
        |         n_bytes // 2 AS n_samples
        |  FROM m WHERE kind = 'audio' AND n_bytes // 2 >= 1),
        |c AS (
        |  SELECT doc_id, sample_rate, n_samples,
        |         (n_samples + sample_rate - 1) // sample_rate AS n_chunks
        |  FROM a)
        |SELECT doc_id, sample_rate, i.i AS chunk_i,
        |       i.i * sample_rate AS start_sample,
        |       least(CAST(sample_rate AS BIGINT),
        |             n_samples - i.i * sample_rate) AS chunk_samples
        |FROM c CROSS JOIN LATERAL (SELECT unnest(range(n_chunks)) AS i) i
        |ORDER BY doc_id, chunk_i""".stripMargin),
    "mm_frame_sample" -> (s"WITH $duckMediaMeta,\n" +
      """v AS (SELECT doc_id, 1 + b1 % 240 AS n_frames FROM m
        |      WHERE kind = 'video'),
        |s AS (SELECT doc_id, n_frames, unnest(range(4)) AS sample_i FROM v)
        |SELECT doc_id, CAST(sample_i AS BIGINT) AS sample_i,
        |       CAST(floor(CAST(sample_i AS DOUBLE) * CAST(n_frames AS DOUBLE) /
        |                  CAST(4.0 AS DOUBLE)) AS BIGINT) AS frame_idx,
        |       CAST(n_frames AS BIGINT) AS n_frames
        |FROM s ORDER BY doc_id, sample_i""".stripMargin),
    "sim_pair_stats" ->
      """WITH pos AS (
        |  SELECT label, vec_id, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, list(avg_v ORDER BY pos) AS centroid
        |  FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS avg_v
        |        FROM pos GROUP BY label, pos)
        |  GROUP BY label)
        |SELECT e.label, count(*) AS n_vecs,
        |       round(avg(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                        c.centroid)), 6) AS mean_cos_to_centroid
        |FROM embeddings e JOIN cent c ON e.label = c.label
        |GROUP BY e.label ORDER BY e.label""".stripMargin,
    "text_batch_pack" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9]+'))
        |              AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |         sum(n_tok) OVER (ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT doc_id, n_tok,
        |       CAST(floor((cum - n_tok) / 512.0) AS BIGINT) AS batch_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_words,
        |       CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT)
        |         AS n_alnum_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS DOUBLE) AS nw,
        |         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
        |              AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct,
        |         CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS nsw,
        |         CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS DOUBLE) AS nalnum
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars_text,
        |       CAST(nw AS BIGINT) AS n_words,
        |       round(punct, 6) AS punct_ratio,
        |       round(nsw / greatest(nw, CAST(1.0 AS DOUBLE)), 6) AS stopword_ratio,
        |       round(nalnum / greatest(nw, CAST(1.0 AS DOUBLE)), 6) AS mean_word_len,
        |       round(least(CAST(1.0 AS DOUBLE),
        |             least(nw / CAST(20.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) *
        |             (CAST(1.0 AS DOUBLE) - punct) *
        |             (CAST(0.5 AS DOUBLE) + nsw / greatest(nw, CAST(1.0 AS DOUBLE)))), 6)
        |         AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(w, x -> x IN ('the','a','and','of','to'))) AS BIGINT) AS s_en,
        |         CAST(len(list_filter(w, x -> x IN ('der','die','das','und','nicht'))) AS BIGINT) AS s_de,
        |         CAST(len(list_filter(w, x -> x IN ('el','la','los','que','y'))) AS BIGINT) AS s_es
        |  FROM t)
        |SELECT doc_id, s_en, s_de, s_es,
        |       CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |            WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS lang_guess
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |       CAST(greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')) - 2, 0)
        |            AS BIGINT) AS n_shingles
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_payload_stats" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Open/high/low/close are pass-through parquet doubles (no
    // arithmetic on either side), so no rounding is needed for
    // agreement; only the turnover sum rounds at the edge.
    "q_ohlc" ->
      """WITH b AS (SELECT user_id,
        |                  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_ts,
        |                  CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY user_id, bar_ts
        |                           ORDER BY ts, event_id) AS rn_a,
        |        row_number() OVER (PARTITION BY user_id, bar_ts
        |                           ORDER BY ts DESC, event_id DESC) AS rn_d
        |      FROM b)
        |SELECT user_id, bar_ts,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |       count(*) AS volume,
        |       round(sum(value), 2) AS turnover
        |FROM r GROUP BY user_id, bar_ts ORDER BY user_id, bar_ts""".stripMargin,
    // Sweep-line replayed on the same minute grid; the argmax tie
    // breaks to the earliest minute in both engines.
    "q_concurrency" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m,
        |         1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_type,
        |         date_trunc('minute', CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE),
        |         -1 FROM events),
        |g AS (SELECT event_type, m, sum(delta) AS d FROM b GROUP BY 1, 2),
        |o AS (SELECT event_type, m,
        |             sum(d) OVER (PARTITION BY event_type ORDER BY m
        |                          ROWS UNBOUNDED PRECEDING) AS open
        |      FROM g),
        |r AS (SELECT event_type, m, open,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY open DESC, m ASC) AS rk
        |      FROM o)
        |SELECT event_type, CAST(open AS BIGINT) AS peak,
        |       strftime(m, '%Y-%m-%d %H:%M') AS peak_at
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "q_pct_of_total" ->
      """WITH cell AS (
        |  SELECT o_orderstatus, o_orderpriority,
        |         round(sum(o_totalprice), 2) AS sum_price,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, o_orderpriority, sum_price, n_orders,
        |       round(sum_price / sum(sum_price) OVER (PARTITION BY o_orderstatus), 6)
        |         AS share
        |FROM cell ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_cume_users" ->
      """WITH fd AS (SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
        |            FROM events GROUP BY user_id),
        |pd AS (SELECT d, count(*) AS new_users FROM fd GROUP BY d)
        |SELECT strftime(d, '%Y-%m-%d') AS d, new_users,
        |       CAST(sum(new_users) OVER (ORDER BY d
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cume_users
        |FROM pd ORDER BY d""".stripMargin,
    "q_mad" ->
      """WITH med AS (SELECT o_orderpriority,
        |                    quantile_cont(o_totalprice, 0.5) AS m
        |             FROM orders GROUP BY o_orderpriority)
        |SELECT o.o_orderpriority,
        |       round(max(med.m), 4) AS median_price,
        |       round(quantile_cont(abs(o.o_totalprice - med.m), 0.5), 4) AS mad_price,
        |       count(*) AS n_orders
        |FROM orders o JOIN med USING (o_orderpriority)
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    // pandas merge_asof(tolerance=1h) semantics: the backward match,
    // voided when stale.
    "q_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(event_id) AS event_id FROM events
        |      WHERE event_type = 'click' GROUP BY user_id, ts),
        |j AS (SELECT p.event_id, p.user_id, p.ts,
        |             c.event_id AS click_event_id, c.ts AS click_ts
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND c.ts <= p.ts)
        |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |       CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
        |                 epoch_us(CAST(click_ts AS TIMESTAMP)) <= 3600000000
        |            THEN click_event_id END AS click_event_id,
        |       CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
        |                 epoch_us(CAST(click_ts AS TIMESTAMP)) <= 3600000000
        |            THEN CAST(click_ts AS TIMESTAMP) END AS click_ts
        |FROM j ORDER BY user_id, ts, event_id""".stripMargin,
    "q_transition_matrix" ->
      """WITH t AS (SELECT user_id, event_type,
        |                  lead(event_type) OVER (PARTITION BY user_id
        |                                         ORDER BY ts, event_id) AS to_type
        |           FROM events),
        |c AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |      FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, sum(n) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, CAST(f.n_from AS BIGINT) AS n_from,
        |       round(CAST(c.n AS DOUBLE) / CAST(f.n_from AS DOUBLE), 6) AS p
        |FROM c JOIN f USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "q_hour_bitmap" ->
      """WITH b AS (SELECT user_id,
        |                  (CAST(1 AS BIGINT) << hour(CAST(ts AS TIMESTAMP))) AS bit
        |           FROM events),
        |m AS (SELECT user_id, bit_or(bit) AS hour_mask FROM b GROUP BY user_id)
        |SELECT user_id, hour_mask,
        |       CAST(bit_count(hour_mask) AS BIGINT) AS n_active_hours
        |FROM m ORDER BY user_id""".stripMargin,
    // The two-phase prefix sum must equal a plain per-kind running
    // cumsum in doc_id order — that equality IS the check.
    "mm_shard_pack" ->
      """WITH m AS (SELECT doc_id,
        |                  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |                       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |                  CAST(strlen(text) AS BIGINT) AS n_bytes
        |           FROM documents),
        |c AS (SELECT *, sum(n_bytes) OVER (PARTITION BY kind ORDER BY doc_id
        |                ROWS UNBOUNDED PRECEDING) AS cum FROM m)
        |SELECT doc_id, kind, n_bytes,
        |       CAST(floor(CAST(cum - n_bytes AS DOUBLE) / 4096) AS BIGINT) AS shard_id
        |FROM c ORDER BY kind, doc_id""".stripMargin,
    "q_time_weighted" ->
      """WITH e AS (SELECT user_id, value, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |x AS (SELECT user_id, value,
        |             lead(us) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) - us AS dt_us
        |      FROM e)
        |SELECT user_id, count(*) AS n_intervals,
        |       CAST(sum(dt_us) AS BIGINT) AS span_us,
        |       round(sum(value * CAST(dt_us AS DOUBLE)) /
        |             CAST(sum(dt_us) AS DOUBLE), 6) AS twa_value
        |FROM x WHERE dt_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // The carried value is a pass-through parquet double — unrounded.
    "q_locf" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |       last_value(CASE WHEN event_type = 'purchase' THEN value END
        |                  IGNORE NULLS)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS last_purchase_value
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,
    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |                     CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |isl AS (SELECT user_id, d,
        |               d - CAST(row_number() OVER (PARTITION BY user_id
        |                                           ORDER BY d) AS INTEGER) AS anchor
        |        FROM days),
        |g AS (SELECT user_id, anchor, count(*) AS len FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days,
        |       count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    // All aggregation happens in exact decimal on both engines; the
    // integral cents columns are the bit-exact check, the doubles are
    // for readability (a 2dp decimal converts to double exactly the
    // same way everywhere). DuckDB's decimal→decimal downscale CAST
    // truncates, so the scale change goes through round() (half-away,
    // = Spark's HALF_UP cast for positive money).
    "q_decimal_agg" ->
      """WITH d AS (SELECT l_returnflag,
        |                  CAST(l_extendedprice AS DECIMAL(18,4)) AS p,
        |                  CAST(l_discount AS DECIMAL(9,4)) AS dsc
        |           FROM lineitem),
        |s AS (SELECT l_returnflag,
        |             CAST(round(sum(p), 2) AS DECIMAL(18,2)) AS g2,
        |             CAST(round(sum(p * (CAST(1 AS DECIMAL(9,4)) - dsc)), 2)
        |                  AS DECIMAL(18,2)) AS n2,
        |             count(*) AS n_items
        |      FROM d GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |       CAST(g2 * 100 AS BIGINT) AS gross_cents,
        |       CAST(n2 * 100 AS BIGINT) AS net_cents,
        |       CAST(g2 AS DOUBLE) AS gross,
        |       CAST(n2 AS DOUBLE) AS net,
        |       n_items
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "dedup_semantic" ->
      """WITH dom AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])) >= 0.3)
        |SELECT e.vec_id, e.label FROM embeddings e
        |WHERE e.vec_id NOT IN (SELECT vec_id FROM dom)
        |ORDER BY e.vec_id""".stripMargin,
    // Selection is integral (top-K by pair count); the single float
    // expression is written with the same association order as the
    // Spark side so IEEE multiplication agrees bit-for-bit and only
    // the final ln carries libm noise, absorbed by the 6dp rounding.
    "text_pmi" ->
      s"""WITH t AS (SELECT ${textWords()} AS w FROM documents),
         |uni AS (SELECT unnest(w) AS word FROM t),
         |u AS (SELECT word, count(*) AS c1 FROM uni GROUP BY word),
         |b AS (SELECT unnest(
         |        CASE WHEN len(w) >= 2
         |             THEN list_transform(range(len(w) - 1),
         |                    i -> w[i+1] || ' ' || w[i+2])
         |             ELSE CAST([] AS VARCHAR[]) END) AS bigram FROM t),
         |c AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram),
         |tot AS (SELECT (SELECT count(*) FROM uni) AS t_uni,
         |               (SELECT count(*) FROM b) AS t_bi),
         |r AS (SELECT bigram, n,
         |             row_number() OVER (ORDER BY n DESC, bigram ASC) AS rk
         |      FROM c WHERE n >= 5)
         |SELECT CAST(r.rk AS BIGINT) AS rk, r.bigram, r.n AS n_pair,
         |       u1.c1 AS cx, u2.c1 AS cy,
         |       round(ln((CAST(r.n AS DOUBLE) * CAST(tot.t_uni AS DOUBLE)
         |                 * CAST(tot.t_uni AS DOUBLE)) /
         |                (CAST(tot.t_bi AS DOUBLE) * CAST(u1.c1 AS DOUBLE)
         |                 * CAST(u2.c1 AS DOUBLE))), 6) AS pmi
         |FROM r CROSS JOIN tot
         |JOIN u u1 ON u1.word = split_part(r.bigram, ' ', 1)
         |JOIN u u2 ON u2.word = split_part(r.bigram, ' ', 2)
         |WHERE r.rk <= 20 ORDER BY rk""".stripMargin,
    // Same corpus rebuild as src_docgen, restricted to the pushed-down
    // id slice — DuckDB only ever generates the 1000 surviving rows,
    // exactly like the pruned DSv2 scan.
    "src_docgen_pushdown" ->
      """WITH ids AS (SELECT range AS id FROM range(99990000, 99991000)),
        |d AS (SELECT id,
        |             'gen' || CAST(id % 10 AS VARCHAR) AS source,
        |             5 + id % 20 AS n_words,
        |             array_to_string(
        |               list_transform(range(CAST(5 + id % 20 AS BIGINT)),
        |                 i -> 'w' || CAST((id * 2654435761 + i * 40503) % 1000
        |                                  AS VARCHAR)), ' ') AS text
        |      FROM ids)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_words) AS BIGINT) AS sum_words,
        |       CAST(sum(strlen(text)) AS BIGINT) AS sum_chars
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    // quantile_disc = element at 1-based position floor((n-1)p)+1 —
    // the Spark side reproduces exactly that index rule; p ∈ {¼,½,¾}
    // only (exact binary fractions, so the float index product agrees).
    "q_percentile_disc" ->
      """SELECT o_orderpriority,
        |       quantile_disc(o_totalprice, 0.25) AS p25_disc,
        |       quantile_disc(o_totalprice, 0.5) AS p50_disc,
        |       quantile_disc(o_totalprice, 0.75) AS p75_disc,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // Fences from DISCRETE quartiles (stored values): the fence
    // arithmetic is the same three IEEE ops on identical doubles in
    // both engines, so classification can't flip on float noise.
    "q_outlier_iqr" ->
      """WITH f AS (SELECT o_orderpriority,
        |                  quantile_disc(o_totalprice, 0.25) AS q1,
        |                  quantile_disc(o_totalprice, 0.75) AS q3
        |           FROM orders GROUP BY o_orderpriority)
        |SELECT o.o_orderpriority, max(f.q1) AS q1, max(f.q3) AS q3,
        |       CAST(sum(CASE WHEN o.o_totalprice < f.q1 - 1.5 * (f.q3 - f.q1)
        |                       OR o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       max(CASE WHEN o.o_totalprice > f.q3 + 1.5 * (f.q3 - f.q1)
        |                THEN o.o_totalprice END) AS max_outlier,
        |       count(*) AS n_orders
        |FROM orders o JOIN f USING (o_orderpriority)
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    // Per-cell emission: expected and contribution are each ONE float
    // expression (identical association order both sides) — no
    // cross-cell summation whose order could differ.
    "q_chi2" ->
      """WITH cell AS (SELECT o_orderstatus, o_orderpriority,
        |                     count(*) AS observed
        |              FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderstatus, sum(observed) AS row_total FROM cell GROUP BY 1),
        |c AS (SELECT o_orderpriority, sum(observed) AS col_total FROM cell GROUP BY 1),
        |n AS (SELECT sum(observed) AS grand_total FROM cell)
        |SELECT cell.o_orderstatus, cell.o_orderpriority, cell.observed,
        |       round(CAST(r.row_total AS DOUBLE) * CAST(c.col_total AS DOUBLE)
        |             / CAST(n.grand_total AS DOUBLE), 4) AS expected,
        |       round(pow(CAST(cell.observed AS DOUBLE)
        |                 - CAST(r.row_total AS DOUBLE) * CAST(c.col_total AS DOUBLE)
        |                   / CAST(n.grand_total AS DOUBLE), 2)
        |             / (CAST(r.row_total AS DOUBLE) * CAST(c.col_total AS DOUBLE)
        |                / CAST(n.grand_total AS DOUBLE)), 6) AS contribution
        |FROM cell JOIN r USING (o_orderstatus) JOIN c USING (o_orderpriority)
        |CROSS JOIN n
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    // Sweep-line union: integral-µs window arithmetic, identical
    // formulation both sides.
    "q_interval_union" ->
      """WITH iv AS (SELECT user_id, event_id,
        |                   epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |                   epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS en
        |            FROM events),
        |x AS (SELECT user_id, s, en,
        |             max(en) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               AS prev_end
        |      FROM iv)
        |SELECT user_id, count(*) AS n_intervals,
        |       CAST(sum(CASE WHEN prev_end IS NULL OR s > prev_end
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_blocks,
        |       CAST(sum(greatest(0, en - greatest(s, coalesce(prev_end, s))))
        |            AS BIGINT) AS covered_us
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Every metric and cut point is integral (cents / days / counts),
    // so scores compare exactly; quantile_disc mirrors discCuts.
    "q_rfm" ->
      """WITH per AS (SELECT o_custkey,
        |                    max(CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)) AS last_d,
        |                    count(*) AS frequency,
        |                    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |                         AS BIGINT) AS monetary_cents
        |             FROM orders GROUP BY o_custkey),
        |mx AS (SELECT max(last_d) AS corpus_max FROM per),
        |cust AS (SELECT o_custkey,
        |                CAST(datediff('day', last_d, corpus_max) AS BIGINT)
        |                  AS recency_days,
        |                frequency, monetary_cents
        |         FROM per CROSS JOIN mx),
        |q AS (SELECT quantile_disc(recency_days, 0.25) AS r25,
        |             quantile_disc(recency_days, 0.5) AS r50,
        |             quantile_disc(recency_days, 0.75) AS r75,
        |             quantile_disc(frequency, 0.25) AS f25,
        |             quantile_disc(frequency, 0.5) AS f50,
        |             quantile_disc(frequency, 0.75) AS f75,
        |             quantile_disc(monetary_cents, 0.25) AS m25,
        |             quantile_disc(monetary_cents, 0.5) AS m50,
        |             quantile_disc(monetary_cents, 0.75) AS m75
        |      FROM cust),
        |sc AS (SELECT c.o_custkey, c.recency_days, c.frequency, c.monetary_cents,
        |              4 - ((CASE WHEN c.recency_days > q.r25 THEN 1 ELSE 0 END)
        |                 + (CASE WHEN c.recency_days > q.r50 THEN 1 ELSE 0 END)
        |                 + (CASE WHEN c.recency_days > q.r75 THEN 1 ELSE 0 END))
        |                AS r_score,
        |              1 + (CASE WHEN c.frequency > q.f25 THEN 1 ELSE 0 END)
        |                + (CASE WHEN c.frequency > q.f50 THEN 1 ELSE 0 END)
        |                + (CASE WHEN c.frequency > q.f75 THEN 1 ELSE 0 END)
        |                AS f_score,
        |              1 + (CASE WHEN c.monetary_cents > q.m25 THEN 1 ELSE 0 END)
        |                + (CASE WHEN c.monetary_cents > q.m50 THEN 1 ELSE 0 END)
        |                + (CASE WHEN c.monetary_cents > q.m75 THEN 1 ELSE 0 END)
        |                AS m_score
        |       FROM cust c CROSS JOIN q)
        |SELECT o_custkey, recency_days, frequency, monetary_cents,
        |       r_score, f_score, m_score,
        |       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
        |         || CAST(m_score AS VARCHAR) AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin,
    // Integer arithmetic end to end: quotas are exactly reproducible.
    "q_allocation" ->
      """WITH n AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |b AS (SELECT source, n_docs, sum(n_docs) OVER () AS total FROM n),
        |c AS (SELECT source, n_docs,
        |             (n_docs * 1000) // total AS base,
        |             (n_docs * 1000) % total AS remainder FROM b),
        |d AS (SELECT *, 1000 - sum(base) OVER () AS leftover,
        |             row_number() OVER (ORDER BY remainder DESC, source) AS pos
        |      FROM c)
        |SELECT source, n_docs, CAST(base AS BIGINT) AS base,
        |       CAST(remainder AS BIGINT) AS remainder,
        |       CAST(CASE WHEN pos <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
        |       CAST(base + CASE WHEN pos <= leftover THEN 1 ELSE 0 END
        |            AS BIGINT) AS alloc
        |FROM d ORDER BY source""".stripMargin,
    "q_seq_ngrams" ->
      """WITH t AS (SELECT event_type AS t1,
        |                  lead(event_type, 1) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS t2,
        |                  lead(event_type, 2) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS t3
        |           FROM events)
        |SELECT t1, t2, t3, count(*) AS n FROM t WHERE t3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin,
    // Byte-exact replay of the sampled-nibble fingerprint: offsets via
    // integer division, nibbles read from hex(encode(text)) so
    // non-ASCII documents stay byte-addressed (not char-addressed).
    "mm_phash_pairs" -> {
      val sampleCols = (0 until 8).map(i =>
        s"substr(hx, CAST(($i * n) // 8 AS INTEGER) * 2 + 1, 1) AS s$i").mkString(",\n             ")
      val aCols = (0 until 8).map(i => s"a.s$i AS a$i").mkString(", ")
      val bCols = (0 until 8).map(i => s"c.s$i AS b$i").mkString(", ")
      val diff = (0 until 8).map(i =>
        s"(CASE WHEN a$i <> b$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH img AS (SELECT doc_id, hex(encode(text)) AS hx,
         |                    octet_length(encode(text)) AS n
         |             FROM documents WHERE doc_id % 3 = 0),
         |s AS (SELECT doc_id,
         |             $sampleCols
         |      FROM img),
         |bands AS (SELECT doc_id, b.band,
         |                 CASE b.band WHEN 0 THEN s0 || s1 WHEN 1 THEN s2 || s3
         |                      WHEN 2 THEN s4 || s5 ELSE s6 || s7 END AS bval,
         |                 s0, s1, s2, s3, s4, s5, s6, s7
         |          FROM s CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         |                $aCols, $bCols
         |         FROM bands a JOIN bands c
         |           ON a.band = c.band AND a.bval = c.bval
         |          AND a.doc_id < c.doc_id)
         |SELECT doc_a, doc_b, CAST($diff AS BIGINT) AS n_diff
         |FROM cand WHERE $diff <= 2
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // OLS from exact integer moment sums — one double division at the
    // end, so both engines divide identical integers.
    "q_winsor" ->
      """WITH e AS (
        |  SELECT o_orderpriority,
        |         quantile_cont(o_totalprice, 0.05) AS lo,
        |         quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, count(*) AS n_orders,
        |       round(avg(greatest(e.lo, least(e.hi, o.o_totalprice))), 4)
        |         AS winsor_mean,
        |       round(avg(CASE WHEN o.o_totalprice BETWEEN e.lo AND e.hi
        |                      THEN o.o_totalprice END), 4) AS trim_mean,
        |       round(any_value(e.lo), 4) AS p05,
        |       round(any_value(e.hi), 4) AS p95
        |FROM orders o JOIN e USING (o_orderpriority)
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "q_theil_sen" ->
      """WITH cells AS (
        |  SELECT event_type,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
        |         CAST(count(*) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |sl AS (
        |  SELECT a.event_type,
        |         (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
        |  FROM cells a JOIN cells b
        |    ON a.event_type = b.event_type AND a.x < b.x),
        |ms AS (
        |  SELECT event_type, quantile_cont(slope, 0.5) AS slope,
        |         count(*) AS n_pairs
        |  FROM sl GROUP BY event_type)
        |SELECT c.event_type, count(*) AS n_days,
        |       CAST(any_value(ms.n_pairs) AS BIGINT) AS n_pairs,
        |       round(any_value(ms.slope), 6) AS slope,
        |       round(quantile_cont(c.y - ms.slope * c.x, 0.5), 6) AS intercept
        |FROM cells c JOIN ms ON c.event_type = ms.event_type
        |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin,
    "q_trend_regression" ->
      """WITH cells AS (
        |  SELECT event_type,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
        |         count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM cells GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |             CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
        |       round((CAST(sy AS DOUBLE) -
        |              CAST(n * sxy - sx * sy AS DOUBLE) /
        |              CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
        |             CAST(n AS DOUBLE), 6) AS intercept,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) *
        |             CAST(n * sxy - sx * sy AS DOUBLE) /
        |             (CAST(n * sxx - sx * sx AS DOUBLE) *
        |              CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
        |FROM m ORDER BY event_type""".stripMargin,
    "q_yoy" ->
      """WITH monthly AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |         round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT month, revenue,
        |         lag(revenue, 1) OVER (ORDER BY month) AS prev_m,
        |         lag(revenue, 12) OVER (ORDER BY month) AS prev_y
        |  FROM monthly)
        |SELECT month, revenue,
        |       round(revenue - prev_m, 2) AS mom_delta,
        |       round((revenue - prev_m) / prev_m, 6) AS mom_pct,
        |       round((revenue - prev_y) / prev_y, 6) AS yoy_pct
        |FROM w ORDER BY month""".stripMargin,
    "q_event_pattern" ->
      """SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |       string_agg(substr(event_type, 1, 1), ''
        |                  ORDER BY ts, event_id) AS seq,
        |       CAST(regexp_matches(
        |         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id),
        |         'v.*c.*p') AS INTEGER) AS funnel_hit
        |FROM events GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin,
    "q_map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |       count(*) AS n_types,
        |       CAST(count(*) FILTER (WHERE c >= 2) AS BIGINT) AS n_frequent,
        |       CAST(sum(c) * 10 AS BIGINT) AS weighted_total,
        |       coalesce(string_agg(event_type || ':' || c, ','
        |                  ORDER BY event_type) FILTER (WHERE c >= 2),
        |                '') AS frequent_profile
        |FROM c GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |tot AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |                     AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t1, t2, n_both, t_1.n AS n1, t_2.n AS n2,
        |       round(CAST(n_both AS DOUBLE) /
        |             CAST(t_1.n + t_2.n - n_both AS DOUBLE), 6) AS jaccard
        |FROM pairs
        |JOIN tot t_1 ON t_1.event_type = t1
        |JOIN tot t_2 ON t_2.event_type = t2
        |ORDER BY t1, t2""".stripMargin,
    // Same non-overlapping regex matches counted on both sides.
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
        |         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sents,
        |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syll
        |  FROM documents)
        |SELECT doc_id, n_words, n_sents, n_syll,
        |       CASE WHEN n_words > 0 THEN
        |         round(206.835 - 1.015 * CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE)
        |               - 84.6 * CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE), 4)
        |       END AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_zipf" ->
      """WITH freq AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |        FROM documents)
        |  GROUP BY 1 ORDER BY c DESC, w LIMIT 100),
        |r AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE)) AS lr,
        |         ln(CAST(c AS DOUBLE)) AS lf
        |  FROM freq),
        |m AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(lr) AS sx, sum(lf) AS sy,
        |         sum(lr * lf) AS sxy, sum(lr * lr) AS sxx
        |  FROM r)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
        |       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
        |         AS zipf_intercept
        |FROM m""".stripMargin,
    // Order-independent signatures: xor + modular sum of the same
    // md5-derived 60-bit row hash on both engines.
    "src_table_checksum" ->
      """WITH o AS (SELECT CAST(concat('0x', substr(md5(concat_ws('|',
        |             o_orderkey, o_custkey, o_orderstatus, o_orderpriority)),
        |             1, 15)) AS BIGINT) AS h FROM orders),
        |c AS (SELECT CAST(concat('0x', substr(md5(concat_ws('|',
        |             c_custkey, c_name, c_nationkey)), 1, 15)) AS BIGINT) AS h
        |      FROM customer),
        |p AS (SELECT CAST(concat('0x', substr(md5(concat_ws('|',
        |             p_partkey, p_name)), 1, 15)) AS BIGINT) AS h FROM part)
        |SELECT * FROM (
        |  SELECT 'orders' AS table_name, count(*) AS n_rows,
        |         bit_xor(h) AS xor_sig,
        |         CAST(sum(h % 1000000007) AS BIGINT) AS sum_sig FROM o
        |  UNION ALL
        |  SELECT 'customer', count(*), bit_xor(h),
        |         CAST(sum(h % 1000000007) AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT 'part', count(*), bit_xor(h),
        |         CAST(sum(h % 1000000007) AS BIGINT) FROM p)
        |ORDER BY table_name""".stripMargin,
    "q_weighted_median" ->
      """WITH cum AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |           AS BIGINT) AS cw,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |           PARTITION BY l_returnflag) AS BIGINT) AS total_w
        |  FROM lineitem)
        |SELECT l_returnflag, total_w, min(l_extendedprice) AS weighted_median
        |FROM cum WHERE cw * 2 >= total_w
        |GROUP BY 1, 2 ORDER BY l_returnflag""".stripMargin,
    "q_percentile_cont" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
        |       round(quantile_cont(o_totalprice, 0.75), 4) AS p75
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q_histogram_equi" ->
      """WITH hist AS (SELECT o_totalprice AS v, count(*) AS c
        |              FROM orders GROUP BY 1),
        |cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum,
        |               sum(c) OVER () AS n_total
        |        FROM hist)
        |SELECT CAST(ceil(cum * 10 / n_total) AS BIGINT) AS bucket,
        |       CAST(sum(c) AS BIGINT) AS n, min(v) AS lo, max(v) AS hi
        |FROM cum GROUP BY 1 ORDER BY bucket""".stripMargin,
    "text_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
         |win AS (
         |  SELECT doc_id,
         |         CASE WHEN len(w) >= 6
         |              THEN list_transform(range(len(w) - 5),
         |                     i -> array_to_string(w[i+1:i+6], ' '))
         |              ELSE CAST([] AS VARCHAR[]) END AS wl
         |  FROM t),
         |g AS (SELECT DISTINCT doc_id, unnest(wl) AS gram FROM win)
         |SELECT gram, count(*) AS n_docs
         |FROM g GROUP BY 1 HAVING count(*) >= 3
         |ORDER BY n_docs DESC, gram LIMIT 20""".stripMargin,
    // last_view = max over preceding rows (equivalent to last non-null:
    // view timestamps are monotone within the ordered frame).
    "q_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |w AS (
        |  SELECT user_id, event_type, event_id, t,
        |         max(CASE WHEN event_type = 'view' THEN t END) OVER (
        |           PARTITION BY user_id ORDER BY t, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view,
        |         min(CASE WHEN event_type = 'view' THEN t END) OVER (
        |           PARTITION BY user_id ORDER BY t, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_view
        |  FROM e)
        |SELECT user_id, event_id AS purchase_id, t AS purchase_us,
        |       CASE WHEN last_view >= t - 259200000000 THEN last_view END
        |         AS last_touch_us,
        |       first_view AS first_touch_us
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    // The non-associative max(0, bal+Δ) fold replayed with list_reduce;
    // floor (not round) keeps the cents conversion engine-independent.
    "q_capped_balance" ->
      """WITH d AS (
        |  SELECT user_id, ts, event_id,
        |         CAST(floor(value * 100) AS BIGINT) *
        |           (CASE WHEN event_type = 'purchase' THEN -1 ELSE 1 END) AS delta
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                     list(delta ORDER BY ts, event_id)),
        |                   (a, b) -> greatest(CAST(0 AS BIGINT), a + b))
        |         AS final_balance
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    "sim_rrf_fusion" ->
      s"""WITH toks AS (SELECT doc_id, list_distinct(${textWords()}) AS toks
         |              FROM documents),
         |q AS (SELECT doc_id AS q_id, toks AS q_toks FROM toks WHERE doc_id < 8),
         |tr AS (SELECT q.q_id, t.doc_id AS id,
         |              row_number() OVER (PARTITION BY q.q_id ORDER BY
         |                CAST(len(list_intersect(t.toks, q.q_toks)) AS DOUBLE) /
         |                CAST(len(t.toks) + len(q.q_toks) -
         |                     len(list_intersect(t.toks, q.q_toks)) AS DOUBLE) DESC,
         |                t.doc_id) AS r_text
         |       FROM toks t CROSS JOIN q WHERE t.doc_id <> q.q_id),
         |qe AS (SELECT vec_id AS q_id, embedding AS q_emb
         |       FROM embeddings WHERE vec_id < 8),
         |vr AS (SELECT qe.q_id, e.vec_id AS id,
         |              row_number() OVER (PARTITION BY qe.q_id ORDER BY
         |                list_cosine_similarity(CAST(qe.q_emb AS DOUBLE[]),
         |                                       CAST(e.embedding AS DOUBLE[])) DESC,
         |                e.vec_id) AS r_vec
         |       FROM embeddings e CROSS JOIN qe WHERE e.vec_id <> qe.q_id),
         |f AS (SELECT tr.q_id, tr.id, tr.r_text, vr.r_vec,
         |             CAST(1 AS DOUBLE) / (60 + tr.r_text) +
         |             CAST(1 AS DOUBLE) / (60 + vr.r_vec) AS rrf
         |      FROM tr JOIN vr ON tr.q_id = vr.q_id AND tr.id = vr.id),
         |r AS (SELECT q_id, id, r_text, r_vec, rrf,
         |             row_number() OVER (PARTITION BY q_id
         |                                ORDER BY rrf DESC, id) AS rk
         |      FROM f)
         |SELECT q_id, rk, id, r_text, r_vec, round(rrf, 6) AS rrf
         |FROM r WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin,
    // Three unrolled damped iterations; 0.15/0.85 written as exact
    // decimal literals on both engines (never computed as 1-d).
    "q_pagerank" ->
      """WITH seq AS (
        |  SELECT user_id, event_type, event_id, ts,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |edges AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |          FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |outd AS (SELECT from_type, sum(n) AS n_out FROM edges GROUP BY 1),
        |p AS (SELECT e.from_type, e.to_type,
        |             CAST(e.n AS DOUBLE) / CAST(o.n_out AS DOUBLE) AS w
        |      FROM edges e JOIN outd o USING (from_type)),
        |nodes AS (SELECT DISTINCT event_type AS node FROM events),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
        |r0 AS (SELECT node, CAST(1 AS DOUBLE) / x.nn AS pr
        |       FROM nodes CROSS JOIN nn x),
        |r1 AS (SELECT n.node,
        |              CAST(0.15 AS DOUBLE) / x.nn +
        |              CAST(0.85 AS DOUBLE) * coalesce(s.inflow, 0) AS pr
        |       FROM nodes n CROSS JOIN nn x
        |       LEFT JOIN (SELECT p.to_type AS node, sum(p.w * r.pr) AS inflow
        |                  FROM p JOIN r0 r ON p.from_type = r.node
        |                  GROUP BY 1) s ON s.node = n.node),
        |r2 AS (SELECT n.node,
        |              CAST(0.15 AS DOUBLE) / x.nn +
        |              CAST(0.85 AS DOUBLE) * coalesce(s.inflow, 0) AS pr
        |       FROM nodes n CROSS JOIN nn x
        |       LEFT JOIN (SELECT p.to_type AS node, sum(p.w * r.pr) AS inflow
        |                  FROM p JOIN r1 r ON p.from_type = r.node
        |                  GROUP BY 1) s ON s.node = n.node),
        |r3 AS (SELECT n.node,
        |              CAST(0.15 AS DOUBLE) / x.nn +
        |              CAST(0.85 AS DOUBLE) * coalesce(s.inflow, 0) AS pr
        |       FROM nodes n CROSS JOIN nn x
        |       LEFT JOIN (SELECT p.to_type AS node, sum(p.w * r.pr) AS inflow
        |                  FROM p JOIN r2 r ON p.from_type = r.node
        |                  GROUP BY 1) s ON s.node = n.node)
        |SELECT node, round(pr, 6) AS pagerank FROM r3 ORDER BY node""".stripMargin,
    "q_ab_test" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type,
        |                   (user_id % 2 = 0) AS in_a FROM events),
        |coh AS (SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |               CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
        |        FROM (SELECT DISTINCT user_id, (user_id % 2 = 0) AS in_a
        |              FROM events)),
        |reach AS (SELECT event_type,
        |                 CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS xa,
        |                 CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS xb
        |          FROM ut GROUP BY 1)
        |SELECT event_type, xa, na, xb, nb,
        |       round(CAST(xa AS DOUBLE) / na, 6) AS pa,
        |       round(CAST(xb AS DOUBLE) / nb, 6) AS pb,
        |       CASE WHEN xa + xb > 0 AND xa + xb < na + nb THEN
        |         round((CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb) /
        |               sqrt((CAST(xa + xb AS DOUBLE) / (na + nb)) *
        |                    (CAST(1 AS DOUBLE) -
        |                     CAST(xa + xb AS DOUBLE) / (na + nb)) *
        |                    (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb)), 6)
        |       END AS z
        |FROM reach CROSS JOIN coh ORDER BY event_type""".stripMargin,
    "q_decile_lift" ->
      """WITH users AS (
        |  SELECT user_id,
        |         CAST(sum(CASE WHEN event_type = 'purchase'
        |                       THEN CAST(floor(value * 100) AS BIGINT)
        |                       ELSE 0 END) AS BIGINT) AS spend_c,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_buys
        |  FROM events GROUP BY 1),
        |hist AS (SELECT spend_c, count(*) AS c FROM users GROUP BY 1),
        |cut AS (SELECT spend_c,
        |               CAST(ceil(sum(c) OVER (ORDER BY spend_c DESC) * 10 /
        |                    (SELECT CAST(sum(c) AS BIGINT) FROM hist))
        |                    AS BIGINT) AS decile
        |        FROM hist),
        |g AS (SELECT decile, count(*) AS n_users,
        |             CAST(sum(u.spend_c) AS BIGINT) AS spend_c,
        |             CAST(sum(n_buys) AS BIGINT) AS n_buys
        |      FROM users u JOIN cut USING (spend_c) GROUP BY 1),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS tu,
        |             CAST(sum(spend_c) AS BIGINT) AS ts,
        |             CAST(sum(n_buys) AS BIGINT) AS tb FROM g)
        |SELECT decile, n_users, spend_c, n_buys,
        |       round(CAST(spend_c AS DOUBLE) / ts, 6) AS spend_share,
        |       round(CAST(n_buys AS DOUBLE) / tb, 6) AS buy_share,
        |       round((CAST(n_buys AS DOUBLE) / tb) /
        |             (CAST(n_users AS DOUBLE) / tu), 6) AS lift
        |FROM g CROSS JOIN t ORDER BY decile""".stripMargin,
    "text_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
         |win AS (
         |  SELECT doc_id,
         |         CASE WHEN len(w) >= 6
         |              THEN list_transform(range(len(w) - 5),
         |                     i -> array_to_string(w[i+1:i+6], ' '))
         |              ELSE CAST([] AS VARCHAR[]) END AS wl
         |  FROM t),
         |g AS (SELECT DISTINCT doc_id, ${duckMd5Bits("gram", 1, 15)} AS h
         |      FROM (SELECT doc_id, unnest(wl) AS gram FROM win)),
         |fo AS (SELECT h, min(doc_id) AS first_doc FROM g GROUP BY 1)
         |SELECT g.doc_id, count(*) AS n_grams,
         |       CAST(sum(CASE WHEN fo.first_doc = g.doc_id THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_novel,
         |       round(CAST(sum(CASE WHEN fo.first_doc = g.doc_id
         |                          THEN 1 ELSE 0 END) AS DOUBLE) /
         |             count(*), 6) AS novelty
         |FROM g JOIN fo USING (h) GROUP BY 1 ORDER BY g.doc_id""".stripMargin,
    // Lorenz closed form over the value histogram; // is DuckDB's
    // integer division mirroring Spark's DIV.
    "q_gini" ->
      """WITH users AS (
        |  SELECT user_id,
        |         CAST(sum(CASE WHEN event_type = 'purchase'
        |                       THEN CAST(floor(value * 100) AS BIGINT)
        |                       ELSE 0 END) AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |hist AS (SELECT v, count(*) AS c FROM users GROUP BY 1),
        |wb AS (SELECT v, c, sum(c) OVER (ORDER BY v) - c AS base FROM hist),
        |m AS (SELECT CAST(sum(c) AS BIGINT) AS n_users,
        |             CAST(sum(v * c) AS BIGINT) AS total_c,
        |             CAST(sum(v * (c * base + (c * (c + 1)) // 2)) AS BIGINT)
        |               AS s1
        |      FROM wb)
        |SELECT n_users, total_c,
        |       round(CAST(2 * s1 - (n_users + 1) * total_c AS DOUBLE) /
        |             CAST(n_users * total_c AS DOUBLE), 6) AS gini
        |FROM m""".stripMargin,
    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type, a.c AS x, b.c AS y
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND b.d = a.d + 1),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM pairs GROUP BY 1)
        |SELECT event_type, n AS n_pairs,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |             sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |                  CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r1
        |FROM m ORDER BY event_type""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS s, count(*) AS n
        |        FROM daily GROUP BY 1),
        |cs AS (SELECT d.event_type, d.d, t.n, t.s,
        |              row_number() OVER (PARTITION BY d.event_type
        |                                 ORDER BY d.d) AS tt,
        |              CAST(sum(d.c) OVER (PARTITION BY d.event_type
        |                                  ORDER BY d.d) AS BIGINT) AS ps
        |       FROM daily d JOIN tot t USING (event_type)),
        |cc AS (SELECT event_type, d, n,
        |              CAST(ps AS DOUBLE) -
        |              CAST(tt AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |                AS cusum
        |       FROM cs),
        |r AS (SELECT event_type, d, n, cusum,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY abs(cusum) DESC, d) AS rk
        |      FROM cc)
        |SELECT event_type, d AS cp_day, round(cusum, 6) AS cusum, n AS n_days
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,
    // list_reduce replays the same left-to-right smooth; (1-0.3) is
    // COMPUTED on both engines (a 0.7 literal differs in the last ulp).
    "q_ewma" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS n_days,
        |             list_reduce(list(CAST(c AS DOUBLE) ORDER BY d),
        |               (a, b) -> CAST(0.3 AS DOUBLE) * b +
        |                         (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * a)
        |               AS ewma,
        |             CAST(arg_max(c, d) AS DOUBLE) AS last_c
        |      FROM daily GROUP BY 1)
        |SELECT event_type, n_days, round(ewma, 6) AS ewma,
        |       round(last_c - ewma, 6) AS last_gap
        |FROM s ORDER BY event_type""".stripMargin,
    "q_benford" ->
      """WITH counts AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
        |                     AS VARCHAR), 1, 1) AS digit,
        |         count(*) AS n
        |  FROM orders GROUP BY 1),
        |f AS (SELECT digit, n FROM counts WHERE digit <> '0'),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM f),
        |x AS (SELECT digit, n,
        |             CAST(n AS DOUBLE) / total AS observed,
        |             ln(CAST(1 AS DOUBLE) +
        |                CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE)) /
        |               ln(CAST(10 AS DOUBLE)) AS expected,
        |             total
        |      FROM f CROSS JOIN t)
        |SELECT digit, n, round(observed, 6) AS observed,
        |       round(expected, 6) AS expected,
        |       round((observed - expected) * (observed - expected) / expected *
        |             CAST(total AS DOUBLE), 6) AS chi2_contrib
        |FROM x ORDER BY digit""".stripMargin,
    "q_backtest" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |scored AS (
        |  SELECT a.event_type, a.c AS actual, f.c AS forecast
        |  FROM daily a JOIN daily f
        |    ON a.event_type = f.event_type AND f.d = a.d - 7),
        |m AS (
        |  SELECT event_type, count(*) AS n_eval,
        |         CAST(sum(abs(actual - forecast)) AS BIGINT) AS sae,
        |         CAST(sum(actual - forecast) AS BIGINT) AS sbias,
        |         sum(CAST(abs(actual - forecast) AS DOUBLE) /
        |             CAST(actual AS DOUBLE)) AS sape
        |  FROM scored GROUP BY 1)
        |SELECT event_type, n_eval,
        |       round(CAST(sae AS DOUBLE) / n_eval, 6) AS mae,
        |       round(CAST(sbias AS DOUBLE) / n_eval, 6) AS bias,
        |       round(sape / n_eval, 6) AS mape
        |FROM m ORDER BY event_type""".stripMargin,
    "q_fuzzy_join" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |p AS (SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM n)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    "q_market_basket" ->
      """WITH baskets AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
        |                        event_type FROM events),
        |nb AS (SELECT count(*) AS n_baskets
        |       FROM (SELECT DISTINCT user_id, day FROM baskets)),
        |single AS (SELECT event_type, count(*) AS n FROM baskets GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS lhs, b.event_type AS rhs, count(*) AS n_both
        |  FROM baskets a JOIN baskets b
        |    ON a.user_id = b.user_id AND a.day = b.day
        |   AND a.event_type <> b.event_type
        |  GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT lhs, rhs, n_both, l.n AS n_lhs, r.n AS n_rhs,
        |       round(CAST(n_both AS DOUBLE) / n_baskets, 6) AS support,
        |       round(CAST(n_both AS DOUBLE) / l.n, 6) AS confidence,
        |       round(CAST(n_both AS DOUBLE) * n_baskets /
        |             (CAST(l.n AS DOUBLE) * r.n), 6) AS lift
        |FROM pairs
        |JOIN single l ON l.event_type = lhs
        |JOIN single r ON r.event_type = rhs
        |CROSS JOIN nb
        |ORDER BY lhs, rhs""".stripMargin,
    // Suffix at-risk cumsum over the bounded duration grid; the
    // survival product is exp(Σ ln(1−d/n)) on BOTH engines.
    "q_survival" ->
      """WITH life AS (
        |  SELECT user_id,
        |         date_diff('day', min(CAST(ts AS DATE)),
        |                   max(CAST(ts AS DATE))) AS t,
        |         (max(CAST(ts AS DATE)) >= DATE '2024-01-24') AS censored
        |  FROM events GROUP BY 1),
        |grid AS (SELECT t,
        |                CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END)
        |                     AS BIGINT) AS d,
        |                count(*) AS c
        |         FROM life GROUP BY 1),
        |g2 AS (SELECT t, d,
        |              CAST(sum(c) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
        |       FROM grid),
        |g3 AS (SELECT t, d, n_risk,
        |              CASE WHEN d > 0
        |                   THEN ln(CAST(1 AS DOUBLE) -
        |                           CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |                   ELSE CAST(0 AS DOUBLE) END AS lnterm
        |       FROM g2),
        |g4 AS (SELECT t, d, n_risk,
        |              exp(sum(lnterm) OVER (ORDER BY t)) AS surv FROM g3)
        |SELECT t, d AS n_churned, n_risk, round(surv, 6) AS survival
        |FROM g4 ORDER BY t""".stripMargin,
    "q_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |            FROM events),
        |days AS (SELECT DISTINCT day AS d FROM ud),
        |dau AS (SELECT day AS d, count(*) AS dau FROM ud GROUP BY 1),
        |wau AS (SELECT d, count(DISTINCT user_id) AS wau
        |        FROM days JOIN ud ON ud.day <= d AND ud.day >= d - 6
        |        GROUP BY 1)
        |SELECT strftime(d, '%Y-%m-%d') AS day, dau, wau,
        |       round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
        |FROM dau JOIN wau USING (d) ORDER BY day""".stripMargin,
    "q_elasticity" ->
      """WITH pp AS (
        |  SELECT l_partkey, CAST(sum(l_quantity) AS DOUBLE) AS qty,
        |         sum(l_extendedprice) / sum(l_quantity) AS unit_price
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT p.p_brand, ln(qty) AS ly, ln(unit_price) AS lx
        |      FROM pp JOIN part p ON p.p_partkey = pp.l_partkey),
        |m AS (SELECT p_brand, CAST(count(*) AS DOUBLE) AS n,
        |             sum(lx) AS sx, sum(ly) AS sy,
        |             sum(lx * ly) AS sxy, sum(lx * lx) AS sxx
        |      FROM j GROUP BY 1)
        |SELECT p_brand, CAST(n AS BIGINT) AS n_parts,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity
        |FROM m ORDER BY p_brand""".stripMargin,
    // TPC-H Q3 shape; decimal-cents revenue (q_decimal_agg protocol:
    // DuckDB's decimal downscale CAST truncates, so round() first).
    "q_ship_priority" ->
      """SELECT o_orderkey,
        |       CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                           (CAST(1 AS DECIMAL(9,4)) -
        |                            CAST(l_discount AS DECIMAL(9,4)))), 2)
        |                 AS DECIMAL(18,2)) * 100 AS BIGINT) AS revenue_cents,
        |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
        |       o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-06-01'
        |  AND CAST(l_shipdate AS DATE) > DATE '1997-06-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_cents DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_region_volume" ->
      """SELECT n_name,
        |       CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                           (CAST(1 AS DECIMAL(9,4)) -
        |                            CAST(l_discount AS DECIMAL(9,4)))), 2)
        |                 AS DECIMAL(18,2)) * 100 AS BIGINT) AS revenue_cents,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND s_nationkey = c_nationkey
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // weekday(day)+1 in Spark == isodow in DuckDB (Monday-based 1..7);
    // the index is the identical (sd/dd)/(st/dt) IEEE sequence.
    "q_seasonality_dow" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |by_dow AS (SELECT event_type, isodow(day) AS dow,
        |                  CAST(sum(cnt) AS BIGINT) AS sd
        |           FROM daily GROUP BY 1, 2),
        |by_type AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS st
        |            FROM daily GROUP BY 1),
        |days AS (SELECT DISTINCT day FROM daily),
        |dow_days AS (SELECT isodow(day) AS dow, count(*) AS dd
        |             FROM days GROUP BY 1),
        |tot AS (SELECT count(*) AS dt FROM days)
        |SELECT b.event_type, CAST(b.dow AS BIGINT) AS dow, b.sd AS n_events,
        |       round((CAST(b.sd AS DOUBLE) / dd) /
        |             (CAST(st AS DOUBLE) / dt), 6) AS seasonality
        |FROM by_dow b
        |JOIN dow_days USING (dow)
        |JOIN by_type USING (event_type)
        |CROSS JOIN tot
        |ORDER BY event_type, dow""".stripMargin,
    "text_mixture_sample" -> {
      val weightCase = graft.functions.TextFunctions.mixtureWeights
        .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ")
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         CAST(len(${textWords()}) AS BIGINT) AS n_toks
         |  FROM documents),
         |per_src AS (SELECT source,
         |                   CAST(sum(n_toks) AS BIGINT) AS tok_s
         |            FROM d GROUP BY 1),
         |tot AS (SELECT CAST(sum(tok_s) AS BIGINT) AS tok_total FROM per_src),
         |rates AS (
         |  SELECT source, tok_s,
         |         CAST(((tok_total * 40 // 100) *
         |          (CASE source $weightCase ELSE 0 END)) // 1000 AS BIGINT)
         |           AS budget_s
         |  FROM per_src CROSS JOIN tot),
         |r2 AS (SELECT source, tok_s, budget_s,
         |              CAST(CASE WHEN tok_s = 0 THEN 0
         |                   ELSE least(1000, budget_s * 1000 // tok_s) END
         |                   AS BIGINT) AS accept_permille
         |       FROM rates),
         |kept AS (
         |  SELECT d.source, count(*) AS n_docs_kept,
         |         CAST(sum(d.n_toks) AS BIGINT) AS tok_kept
         |  FROM d JOIN r2 ON d.source = r2.source
         |  WHERE ${duckMd5Bits("CAST(doc_id AS VARCHAR)", 1, 7)} % 1000
         |        < accept_permille
         |  GROUP BY 1)
         |SELECT r2.source, tok_s, budget_s, accept_permille,
         |       coalesce(n_docs_kept, 0) AS n_docs_kept,
         |       coalesce(tok_kept, 0) AS tok_kept
         |FROM r2 LEFT JOIN kept ON r2.source = kept.source
         |ORDER BY r2.source""".stripMargin
    },
    // Inverted-index sparse cosine: integral dot/norms, ONE identical
    // double expression per pair (threshold compare is bit-stable).
    "sim_sparse_cosine" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${textWords()}) AS tok FROM documents),
         |counts AS (
         |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
         |vocab AS (
         |  SELECT tok FROM counts GROUP BY tok
         |  HAVING count(*) >= 2 AND count(*) <= 50),
         |kept AS (SELECT c.* FROM counts c JOIN vocab v ON c.tok = v.tok),
         |norms AS (SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS nrm
         |          FROM kept GROUP BY 1),
         |dots AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         CAST(sum(a.c * b.c) AS BIGINT) AS dot
         |  FROM kept a JOIN kept b
         |    ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, dot,
         |       round(CAST(dot AS DOUBLE) /
         |             (sqrt(CAST(na.nrm AS DOUBLE)) *
         |              sqrt(CAST(nb.nrm AS DOUBLE))), 6) AS cos
         |FROM dots
         |JOIN norms na ON na.doc_id = id_a
         |JOIN norms nb ON nb.doc_id = id_b
         |WHERE CAST(dot AS DOUBLE) /
         |      (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
         |      >= CAST(0.4 AS DOUBLE)
         |ORDER BY id_a, id_b""".stripMargin,
    // Transitive closure over the fuzzy pair graph (dedup_clusters
    // recursive-CTE pattern on the name domain).
    "q_entity_resolution" ->
      """WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
        |p AS (SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM n),
        |pairs AS (
        |  SELECT a.p_name AS na, b.p_name AS nb
        |  FROM p a JOIN p b ON a.blk = b.blk AND a.p_name < b.p_name
        |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
        |edges AS (
        |  SELECT na AS s, nb AS d FROM pairs
        |  UNION SELECT nb, na FROM pairs),
        |reach(s, d) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
        |comp AS (
        |  SELECT s AS name, least(min(d), s) AS canonical
        |  FROM reach GROUP BY s),
        |resolved AS (
        |  SELECT n.p_name AS name,
        |         coalesce(comp.canonical, n.p_name) AS canonical
        |  FROM n LEFT JOIN comp ON n.p_name = comp.name),
        |sizes AS (SELECT canonical, count(*) AS cluster_size
        |          FROM resolved GROUP BY 1)
        |SELECT name, canonical, CAST(cluster_size AS BIGINT) AS cluster_size
        |FROM resolved JOIN sizes USING (canonical)
        |ORDER BY name""".stripMargin,
    // Depth-capped recursive walk == the Spark relaxation loop.
    "q_shortest_path" ->
      """WITH RECURSIVE t AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |edges AS (
        |  SELECT DISTINCT event_type AS f, to_type AS t
        |  FROM t WHERE to_type IS NOT NULL),
        |walk(t, d) AS (
        |  SELECT 'click', 0
        |  UNION ALL
        |  SELECT e.t, w.d + 1 FROM walk w JOIN edges e ON e.f = w.t
        |  WHERE w.d < 6)
        |SELECT t AS event_type, CAST(min(d) AS BIGINT) AS hops
        |FROM walk GROUP BY t ORDER BY event_type""".stripMargin,
    // Integral window moments (floor-cents); identical band expression.
    "q_bollinger" ->
      """WITH c AS (
        |  SELECT user_id, event_id, ts, value,
        |         CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 10 AND value IS NOT NULL),
        |m AS (
        |  SELECT user_id, event_id, value,
        |         count(cents) OVER w AS n,
        |         sum(cents) OVER w AS sx,
        |         sum(cents * cents) OVER w AS sxx
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, value, CAST(n AS BIGINT) AS n,
        |       round(CAST(sx AS DOUBLE) / n / 100.0, 6) AS mid,
        |       round(CAST(sx AS DOUBLE) / n / 100.0 -
        |             2.0 * (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n / 100.0),
        |             6) AS lower,
        |       round(CAST(sx AS DOUBLE) / n / 100.0 +
        |             2.0 * (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / n / 100.0),
        |             6) AS upper
        |FROM m ORDER BY user_id, event_id""".stripMargin,
    // The median is a STORED cents value picked at ceil(n/2) — no
    // float accumulation anywhere.
    "q_rolling_median" ->
      """WITH c AS (
        |  SELECT user_id, event_id, ts,
        |         CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 10 AND value IS NOT NULL),
        |m AS (
        |  SELECT user_id, event_id,
        |         list_sort(list(cents) OVER w) AS vals
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, CAST(len(vals) AS BIGINT) AS n,
        |       vals[CAST(ceil(len(vals) / 2.0) AS INTEGER)] AS med_cents,
        |       round(CAST(vals[CAST(ceil(len(vals) / 2.0) AS INTEGER)]
        |                  AS DOUBLE) / 100.0, 6) AS median
        |FROM m ORDER BY user_id, event_id""".stripMargin,
    "q_except_all" ->
      """SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
        |FROM events WHERE event_type = 'click'
        |EXCEPT ALL
        |SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
        |FROM events WHERE event_type = 'view'
        |ORDER BY user_id, d""".stripMargin,
    // Chunk grid from mm_audio_chunks + byte-addressed amplitude probe.
    "mm_audio_energy" -> (s"WITH $duckMediaMeta,\n" +
      """a AS (
        |  SELECT doc_id,
        |         CAST(8000 + (b0 % 5) * 8000 AS INTEGER) AS sample_rate,
        |         n_bytes // 2 AS n_samples
        |  FROM m WHERE kind = 'audio' AND n_bytes // 2 >= 1),
        |c AS (
        |  SELECT doc_id, sample_rate, n_samples,
        |         (n_samples + sample_rate - 1) // sample_rate AS n_chunks
        |  FROM a),
        |ch AS (
        |  SELECT doc_id, i.i AS chunk_i,
        |         i.i * sample_rate AS start_sample,
        |         least(CAST(sample_rate AS BIGINT),
        |               n_samples - i.i * sample_rate) AS chunk_samples
        |  FROM c CROSS JOIN LATERAL (SELECT unnest(range(n_chunks)) AS i) i),
        |hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents)
        |SELECT ch.doc_id, chunk_i, chunk_samples,
        |       CAST(concat('0x', substr(h, CAST(start_sample * 4 AS INTEGER) + 1, 2))
        |            AS BIGINT) AS amp0,
        |       CAST(CASE WHEN CAST(concat('0x',
        |                substr(h, CAST(start_sample * 4 AS INTEGER) + 1, 2))
        |                AS BIGINT) < 32 THEN 1 ELSE 0 END AS BIGINT) AS is_silent
        |FROM ch JOIN hx USING (doc_id)
        |ORDER BY doc_id, chunk_i""".stripMargin),
    // RAKE with the all-integer degree score; phrase order and score
    // ties are fully deterministic.
    "text_keywords" -> {
      val swList = graft.functions.TextFunctions.stopwords
        .map(s => s"'$s'").mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${textWords()}) AS w,
         |         generate_subscripts(${textWords()}, 1) AS pos
         |  FROM documents),
         |f AS (SELECT doc_id, pos, w, w IN ($swList) AS is_stop FROM toks),
         |ph AS (
         |  SELECT doc_id, pos, w, is_stop,
         |         sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
         |  FROM f),
         |pw AS (SELECT doc_id, phrase_id, pos, w FROM ph WHERE NOT is_stop),
         |pl AS (
         |  SELECT doc_id, phrase_id, count(*) AS len,
         |         string_agg(w, ' ' ORDER BY pos) AS phrase
         |  FROM pw GROUP BY 1, 2),
         |deg AS (
         |  SELECT pw.doc_id, pw.w, sum(pl.len) AS deg
         |  FROM pw JOIN pl ON pw.doc_id = pl.doc_id
         |                 AND pw.phrase_id = pl.phrase_id
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT pw.doc_id, pw.phrase_id, sum(deg.deg) AS score
         |  FROM pw JOIN deg ON pw.doc_id = deg.doc_id AND pw.w = deg.w
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT sc.doc_id, pl.phrase, sc.score,
         |         row_number() OVER (PARTITION BY sc.doc_id
         |                            ORDER BY sc.score DESC, pl.phrase ASC) AS rn
         |  FROM sc JOIN pl ON sc.doc_id = pl.doc_id
         |                 AND sc.phrase_id = pl.phrase_id)
         |SELECT doc_id, phrase AS keyword, CAST(score AS BIGINT) AS score
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
    },
    // Frame grid at k=8 + byte probe at frame_idx mod n_bytes; cut =
    // |probe − prev| > 64 (first frame never a cut).
    "mm_scene_cuts" -> (s"WITH $duckMediaMeta,\n" +
      """v AS (SELECT doc_id, 1 + b1 % 240 AS n_frames, n_bytes FROM m
        |      WHERE kind = 'video' AND n_bytes >= 1),
        |s AS (SELECT doc_id, n_frames, n_bytes, unnest(range(8)) AS sample_i
        |      FROM v),
        |fr AS (
        |  SELECT doc_id, sample_i, n_bytes,
        |         CAST(floor(CAST(sample_i AS DOUBLE) * CAST(n_frames AS DOUBLE) /
        |                    CAST(8.0 AS DOUBLE)) AS BIGINT) AS frame_idx
        |  FROM s),
        |hx AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
        |p AS (
        |  SELECT fr.doc_id, sample_i, frame_idx,
        |         CAST(concat('0x',
        |              substr(h, CAST((frame_idx % n_bytes) * 2 AS INTEGER) + 1, 2))
        |              AS BIGINT) AS probe
        |  FROM fr JOIN hx USING (doc_id)),
        |l AS (
        |  SELECT doc_id, sample_i, frame_idx, probe,
        |         lag(probe) OVER (PARTITION BY doc_id ORDER BY sample_i) AS prev
        |  FROM p)
        |SELECT doc_id, CAST(sample_i AS BIGINT) AS sample_i, frame_idx, probe,
        |       CAST(CASE WHEN prev IS NULL THEN 0
        |                 WHEN abs(probe - prev) > 64 THEN 1 ELSE 0 END
        |            AS BIGINT) AS is_cut
        |FROM l ORDER BY doc_id, sample_i""".stripMargin),
    // Doubled midranks from the value histogram keep U integral;
    // z written as one identical expression (no tie correction).
    "q_mwu_test" ->
      """WITH v AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
        |         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS in_a
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, cents, count(*) AS c,
        |             CAST(sum(in_a) AS BIGINT) AS a_v
        |      FROM v GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, c, a_v,
        |         coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY cents
        |                               ROWS BETWEEN UNBOUNDED PRECEDING
        |                               AND 1 PRECEDING), 0) AS cum_before
        |  FROM h),
        |m AS (
        |  SELECT event_type,
        |         CAST(sum(a_v) AS BIGINT) AS n_a,
        |         CAST(sum(c - a_v) AS BIGINT) AS n_b,
        |         CAST(sum(a_v * (2 * cum_before + c + 1)) AS BIGINT) AS r2_a
        |  FROM r GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |       r2_a - n_a * (n_a + 1) AS u2_a,
        |       round(CAST(r2_a - n_a * (n_a + 1) - n_a * n_b AS DOUBLE) /
        |             (2.0 * sqrt(CAST(n_a * n_b * (n_a + n_b + 1) AS DOUBLE)
        |                         / 12.0)), 6) AS z
        |FROM m ORDER BY event_type""".stripMargin,
    // Lag sweep 1..14; zero-variance lags excluded INTEGRALLY before
    // the (r desc, lag asc) pick.
    "q_period_detect" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |              AS BIGINT) AS d,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |lags AS (SELECT unnest(range(1, 15)) AS lag),
        |p AS (
        |  SELECT a.event_type, l.lag, a.c AS x, b.c AS y
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + l.lag),
        |m AS (
        |  SELECT event_type, lag, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, lag, n,
        |         CAST(n * sxy - sx * sy AS DOUBLE) /
        |         sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |              CAST(n * syy - sy * sy AS DOUBLE)) AS r
        |  FROM m
        |  WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0),
        |k AS (
        |  SELECT event_type, lag, n, r,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY r DESC, lag ASC) AS rk
        |  FROM s)
        |SELECT event_type, CAST(lag AS BIGINT) AS best_lag,
        |       CAST(n AS BIGINT) AS n_pairs, round(r, 6) AS r
        |FROM k WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "q_itemset3" ->
      """WITH baskets AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
        |                        event_type FROM events),
        |nb AS (SELECT count(*) AS n_baskets
        |       FROM (SELECT DISTINCT user_id, day FROM baskets)),
        |t AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2, c.event_type AS t3,
        |         count(*) AS n_all3
        |  FROM baskets a
        |  JOIN baskets b ON a.user_id = b.user_id AND a.day = b.day
        |  JOIN baskets c ON a.user_id = c.user_id AND a.day = c.day
        |  WHERE a.event_type < b.event_type AND b.event_type < c.event_type
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 5)
        |SELECT t1, t2, t3, n_all3,
        |       round(CAST(n_all3 AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6)
        |         AS support
        |FROM t CROSS JOIN nb
        |ORDER BY t1, t2, t3""".stripMargin,
    // One-permutation minhash replay: one 60-bit hash per shingle,
    // bin mins with the 2^60 empty-bin sentinel, 4×4 banding, exact
    // Jaccard verify over candidate pairs only.
    "dedup_minhash_oph" ->
      s"""WITH $duckShingles,
         |hh AS (SELECT doc_id, ${duckMd5Bits("shingle", 1, 15)} AS h FROM sh),
         |bins AS (SELECT doc_id, h % 16 AS bin, min(h) AS sig
         |         FROM hh GROUP BY 1, 2),
         |spine AS (SELECT DISTINCT doc_id FROM hh),
         |grid AS (SELECT doc_id, b.b AS bin
         |         FROM spine CROSS JOIN (SELECT unnest(range(16)) AS b) b),
         |fullg AS (
         |  SELECT g.doc_id, g.bin,
         |         coalesce(bins.sig, 1152921504606846976) AS sig
         |  FROM grid g LEFT JOIN bins
         |    ON bins.doc_id = g.doc_id AND bins.bin = g.bin),
         |bstr AS (
         |  SELECT doc_id, bin // 4 AS band,
         |         string_agg(CAST(sig AS VARCHAR), '_' ORDER BY bin) AS s,
         |         min(sig) AS min_sig
         |  FROM fullg GROUP BY doc_id, bin // 4),
         |bnd AS (
         |  SELECT doc_id,
         |         md5(concat(CAST(band AS VARCHAR), '_', s)) AS band_hash
         |  FROM bstr
         |  WHERE min_sig < 1152921504606846976),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bnd x JOIN bnd y
         |    ON x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |shv AS (SELECT DISTINCT doc_id, h FROM hh),
         |card AS (SELECT doc_id, count(*) AS n_sh FROM shv GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |  FROM shv a JOIN shv b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT c.id_a, c.id_b,
         |       round(CAST(n_inter AS DOUBLE) /
         |             CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
         |FROM cand c
         |JOIN inter ON inter.id_a = c.id_a AND inter.id_b = c.id_b
         |JOIN card ca ON ca.doc_id = c.id_a
         |JOIN card cb ON cb.doc_id = c.id_b
         |WHERE CAST(n_inter AS DOUBLE) /
         |      CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE) >= 0.7
         |ORDER BY c.id_a, c.id_b""".stripMargin,
    // Sentences = punctuation-run splits, whitespace-only pieces
    // dropped on BOTH engines; cross-doc hash counts shuffle 60-bit
    // ids; kept text reassembled in original order for the md5.
    "text_sentence_dedup" ->
      s"""WITH pieces AS (
         |  SELECT doc_id,
         |         generate_subscripts(string_split_regex(lower(text),
         |                                                '[.!?]+'), 1) AS pos,
         |         unnest(string_split_regex(lower(text), '[.!?]+')) AS raw
         |  FROM documents),
         |sent AS (
         |  SELECT doc_id, pos, trim(raw) AS s,
         |         ${duckMd5Bits("trim(raw)", 1, 15)} AS h
         |  FROM pieces WHERE length(trim(raw)) > 0),
         |hot AS (SELECT h FROM sent GROUP BY h
         |        HAVING count(DISTINCT doc_id) >= 3),
         |kept AS (SELECT sent.* FROM sent LEFT JOIN hot ON sent.h = hot.h
         |         WHERE hot.h IS NULL),
         |ka AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |         md5(string_agg(s, '. ' ORDER BY pos)) AS kept_fp
         |  FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, count(*) AS n_sent FROM sent GROUP BY doc_id)
         |SELECT tot.doc_id, tot.n_sent,
         |       coalesce(ka.n_kept, 0) AS n_kept,
         |       coalesce(ka.kept_fp, '') AS kept_fp
         |FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id
         |ORDER BY tot.doc_id""".stripMargin,
    // Arithmetic zigzag + integer CASE-ladder varint sizes — the whole
    // cost model is BIGINT on both engines.
    "q_delta_encode" -> {
      def vb(col: String) =
        s"""CASE WHEN $col < 128 THEN 1 WHEN $col < 16384 THEN 2
           |     WHEN $col < 2097152 THEN 3 WHEN $col < 268435456 THEN 4
           |     WHEN $col < 34359738368 THEN 5 WHEN $col < 4398046511104 THEN 6
           |     WHEN $col < 562949953421312 THEN 7
           |     WHEN $col < 72057594037927936 THEN 8
           |     WHEN $col < 9223372036854775807 THEN 9 ELSE 10 END""".stripMargin
      s"""WITH e AS (
         |  SELECT user_id, event_id,
         |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |         CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE value IS NOT NULL),
         |d AS (
         |  SELECT user_id,
         |         us - coalesce(lag(us) OVER w, us) AS dts,
         |         cents - coalesce(lag(cents) OVER w, 0) AS dv
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |z AS (
         |  SELECT user_id,
         |         CASE WHEN dts >= 0 THEN dts * 2 ELSE dts * -2 - 1 END AS zts,
         |         CASE WHEN dv >= 0 THEN dv * 2 ELSE dv * -2 - 1 END AS zv
         |  FROM d)
         |SELECT user_id, count(*) AS n_events,
         |       count(*) * 16 AS raw_bytes,
         |       CAST(sum((${vb("zts")}) + (${vb("zv")})) AS BIGINT) AS delta_bytes,
         |       round(CAST(count(*) * 16 AS DOUBLE) /
         |             CAST(sum((${vb("zts")}) + (${vb("zv")})) AS DOUBLE), 6)
         |         AS ratio
         |FROM z GROUP BY user_id ORDER BY user_id""".stripMargin
    },
    // Discrete ceil(n·p) picks over the latency histogram cumsum.
    "q_time_to_convert" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |fc AS (SELECT user_id, min(us) AS click_us
        |       FROM e WHERE event_type = 'click' GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id, min(e.us) - min(fc.click_us) AS lat_us
        |  FROM e JOIN fc ON e.user_id = fc.user_id
        |  WHERE e.event_type = 'purchase' AND e.us >= fc.click_us
        |  GROUP BY e.user_id),
        |h AS (SELECT lat_us, count(*) AS c FROM conv GROUP BY 1),
        |r AS (SELECT lat_us, sum(c) OVER (ORDER BY lat_us) AS cum FROM h),
        |n AS (SELECT count(*) AS n FROM conv)
        |SELECT n.n AS n_converted,
        |       (SELECT min(lat_us) FROM r
        |        WHERE cum >= ceil(CAST(n.n AS DOUBLE) * 0.25)) AS q1_us,
        |       (SELECT min(lat_us) FROM r
        |        WHERE cum >= ceil(CAST(n.n AS DOUBLE) * 0.5)) AS med_us,
        |       (SELECT min(lat_us) FROM r
        |        WHERE cum >= ceil(CAST(n.n AS DOUBLE) * 0.75)) AS q3_us
        |FROM n""".stripMargin,
    // Cosine ranks replayed with list_cosine_similarity; integral
    // majority vote with (votes desc, label asc) tie-break.
    "sim_knn_classify" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS tl
        |           FROM embeddings WHERE vec_id % 5 = 0),
        |l AS (SELECT vec_id, embedding, label FROM embeddings
        |      WHERE vec_id % 5 <> 0),
        |s AS (SELECT q.q_id, q.tl, l.vec_id, l.label,
        |             list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                    CAST(l.embedding AS DOUBLE[])) AS cos
        |      FROM q CROSS JOIN l),
        |r AS (SELECT q_id, tl, vec_id, label,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos DESC, vec_id) AS rk
        |      FROM s),
        |v AS (SELECT q_id, tl, label, count(*) AS n_votes
        |      FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
        |w AS (SELECT q_id, tl, label, n_votes,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY n_votes DESC, label) AS vr
        |      FROM v)
        |SELECT q_id AS vec_id, label AS predicted, n_votes,
        |       tl AS true_label,
        |       CAST(CASE WHEN label = tl THEN 1 ELSE 0 END AS BIGINT) AS correct
        |FROM w WHERE vr = 1 ORDER BY vec_id""".stripMargin,
    "q_rank_dense" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |       rank() OVER w1 AS rnk,
        |       dense_rank() OVER w1 AS drnk,
        |       row_number() OVER w2 AS rn
        |FROM orders
        |WINDOW w1 AS (PARTITION BY o_orderpriority ORDER BY o_totalprice),
        |       w2 AS (PARTITION BY o_orderpriority
        |              ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "src_docgen_count" -> "SELECT CAST(500000000 AS BIGINT) AS n_docs",
    // One pair scan, three threshold filters; identical IEEE cosines.
    "dedup_semantic_sweep" ->
      """WITH p AS (
        |  SELECT b.vec_id AS id_b,
        |         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                CAST(b.embedding AS DOUBLE[])) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id),
        |n AS (SELECT count(*) AS n_total FROM embeddings),
        |t(threshold) AS (VALUES (CAST(0.2 AS DOUBLE)), (CAST(0.3 AS DOUBLE)),
        |                        (CAST(0.4 AS DOUBLE))),
        |sw AS (
        |  SELECT t.threshold,
        |         CAST(count(DISTINCT CASE WHEN p.cos >= t.threshold
        |                                  THEN p.id_b END) AS BIGINT) AS n_dropped
        |  FROM t LEFT JOIN p ON p.cos >= t.threshold
        |  GROUP BY t.threshold)
        |SELECT threshold, n_dropped,
        |       n_total - n_dropped AS n_survivors
        |FROM sw CROSS JOIN n ORDER BY threshold""".stripMargin,
    "q_new_returning" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |            FROM events),
        |fs AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |       count(*) AS dau,
        |       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_new,
        |       count(*) - CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
        |                       AS BIGINT) AS n_returning,
        |       round(CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
        |                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS new_share
        |FROM ud JOIN fs USING (user_id)
        |GROUP BY day ORDER BY day""".stripMargin,
    "q_typed_agg" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       min(CAST(floor(value * 100) AS BIGINT)) AS min_cents,
        |       max(CAST(floor(value * 100) AS BIGINT)) AS max_cents
        |FROM events WHERE value IS NOT NULL AND user_id < 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Add-1 bigram LM; per-doc ln-prob sum replayed by the ORDERED
    // list_reduce (the q_ewma fold protocol).
    "text_bpe_merges" -> duckBpeSql(8),
    "text_bpe_encode" -> duckBpeEncodeSql(8, 20),
    "text_bpe_tokenize" -> duckBpeTokenizeSql(8),
    "text_bigram_lm" ->
      s"""WITH toks AS (
         |  SELECT doc_id, generate_subscripts(${textWords()}, 1) AS pos,
         |         unnest(${textWords()}) AS w
         |  FROM documents),
         |pairs AS (
         |  SELECT a.doc_id, a.pos, a.w AS x, b.w AS y
         |  FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         |uni AS (SELECT w AS x, count(*) AS c_x FROM toks GROUP BY 1),
         |vv AS (SELECT count(*) AS v FROM uni),
         |bi AS (SELECT x, y, count(*) AS c_xy FROM pairs GROUP BY 1, 2),
         |lp AS (
         |  SELECT p.doc_id, p.pos,
         |         ln(CAST(c_xy + 1 AS DOUBLE) / CAST(c_x + v AS DOUBLE)) AS lnp
         |  FROM pairs p
         |  JOIN bi ON bi.x = p.x AND bi.y = p.y
         |  JOIN uni ON uni.x = p.x
         |  CROSS JOIN vv),
         |f AS (
         |  SELECT doc_id, count(*) AS n,
         |         list_reduce(list(lnp ORDER BY pos), (a, b) -> a + b) AS s
         |  FROM lp GROUP BY doc_id)
         |SELECT doc_id, n AS n_bigrams, round(-s, 6) AS nll,
         |       round(exp(-s / n), 6) AS ppl
         |FROM f ORDER BY doc_id""".stripMargin,
    // The recall-report replay swept over nprobe 1..3.
    "sim_nprobe_sweep" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 8),
        |bs AS (SELECT q.q_id, e.vec_id,
        |              list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                     CAST(e.embedding AS DOUBLE[])) AS cos
        |       FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
        |br AS (SELECT q_id, vec_id,
        |              row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos DESC, vec_id) AS rk
        |       FROM bs),
        |exact AS (SELECT q_id, vec_id FROM br WHERE rk <= 5),
        |pos AS (
        |  SELECT label, vec_id, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, list(avg_v ORDER BY pos) AS centroid
        |  FROM (SELECT label, pos, avg(CAST(v AS DOUBLE)) AS avg_v
        |        FROM pos GROUP BY label, pos)
        |  GROUP BY label),
        |cellrank AS (
        |  SELECT q.q_id, q.q_emb, c.label,
        |         row_number() OVER (PARTITION BY q.q_id
        |           ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |                                           c.centroid) DESC,
        |                    c.label) AS cell_rk
        |  FROM q CROSS JOIN cent c),
        |np(nprobe) AS (VALUES (1), (2), (3)),
        |probed AS (
        |  SELECT np.nprobe, cr.q_id, cr.q_emb, cr.label
        |  FROM cellrank cr CROSS JOIN np WHERE cr.cell_rk <= np.nprobe),
        |ivs AS (SELECT p.nprobe, p.q_id, e.vec_id,
        |               list_cosine_similarity(CAST(p.q_emb AS DOUBLE[]),
        |                                      CAST(e.embedding AS DOUBLE[])) AS cos
        |        FROM probed p JOIN embeddings e ON e.label = p.label
        |        WHERE e.vec_id <> p.q_id),
        |ivr AS (SELECT nprobe, q_id, vec_id,
        |               row_number() OVER (PARTITION BY nprobe, q_id
        |                                  ORDER BY cos DESC, vec_id) AS rk
        |        FROM ivs),
        |approx AS (SELECT nprobe, q_id, vec_id FROM ivr WHERE rk <= 5)
        |SELECT CAST(np.nprobe AS BIGINT) AS nprobe,
        |       CAST(count(a.vec_id) AS BIGINT) AS n_hits,
        |       CAST(count(*) AS BIGINT) AS n_exact,
        |       round(CAST(count(a.vec_id) AS DOUBLE) /
        |             CAST(count(*) AS DOUBLE), 6) AS recall
        |FROM np CROSS JOIN exact e
        |LEFT JOIN approx a ON a.nprobe = np.nprobe
        |  AND a.q_id = e.q_id AND a.vec_id = e.vec_id
        |GROUP BY np.nprobe ORDER BY nprobe""".stripMargin,
    "q_heat_grid" ->
      """WITH c AS (
        |  SELECT isodow(CAST(ts AS DATE)) AS dow,
        |         hour(CAST(ts AS TIMESTAMP)) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT dow, CAST(sum(n) AS BIGINT) AS n_dow FROM c GROUP BY 1)
        |SELECT CAST(c.dow AS BIGINT) AS dow, CAST(hr AS BIGINT) AS hr,
        |       n, round(CAST(n AS DOUBLE) / CAST(n_dow AS DOUBLE), 6)
        |         AS dow_share
        |FROM c JOIN d USING (dow) ORDER BY dow, hr""".stripMargin,
    // The oracle aggregates raw events STRAIGHT to days — equality
    // with the minute→hour→day cascade IS the re-aggregability proof.
    "q_rollup_cascade" ->
      """SELECT event_type,
        |       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    // Reference-population decile edges (stored values), per-bucket
    // PSI terms — no cross-bucket float sum.
    "q_psi" ->
      """WITH o AS (SELECT o_orderkey,
        |                  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |ref AS (SELECT cents FROM o WHERE o_orderkey % 2 = 0),
        |cur AS (SELECT cents FROM o WHERE o_orderkey % 2 = 1),
        |h AS (SELECT cents, count(*) AS c FROM ref GROUP BY 1),
        |r AS (SELECT cents, sum(c) OVER (ORDER BY cents) AS cum FROM h),
        |nn AS (SELECT count(*) AS n FROM ref),
        |edges AS (
        |  SELECT d.d,
        |         (SELECT min(cents) FROM r CROSS JOIN nn
        |          WHERE cum >= ceil(CAST(n AS DOUBLE) *
        |                            (CAST(d.d AS DOUBLE) / 10.0))) AS edge
        |  FROM (SELECT unnest(range(1, 10)) AS d) d),
        |bref AS (
        |  SELECT coalesce((SELECT max(d) FROM edges e
        |                   WHERE e.edge <= ref.cents), 0) AS bucket,
        |         count(*) AS n_ref
        |  FROM ref GROUP BY 1),
        |bcur AS (
        |  SELECT coalesce((SELECT max(d) FROM edges e
        |                   WHERE e.edge <= cur.cents), 0) AS bucket,
        |         count(*) AS n_cur
        |  FROM cur GROUP BY 1),
        |nr AS (SELECT count(*) AS nr FROM ref),
        |nc AS (SELECT count(*) AS nc FROM cur)
        |SELECT CAST(coalesce(bref.bucket, bcur.bucket) AS BIGINT) AS bucket,
        |       CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
        |       CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur,
        |       round((CAST(coalesce(n_ref, 0) AS DOUBLE) / nr -
        |              CAST(coalesce(n_cur, 0) AS DOUBLE) / nc) *
        |             ln((CAST(coalesce(n_ref, 0) AS DOUBLE) / nr) /
        |                (CAST(coalesce(n_cur, 0) AS DOUBLE) / nc)), 6)
        |         AS psi_term
        |FROM bref FULL OUTER JOIN bcur ON bref.bucket = bcur.bucket
        |CROSS JOIN nr CROSS JOIN nc
        |ORDER BY bucket""".stripMargin,
    // The Holt recurrence replayed as a RECURSIVE CTE walking the
    // indexed series — identical op sequence to the mapGroups fold
    // (lNew recomputed inside the b term gives the same double).
    "q_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |              AS BIGINT) AS d,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type,
        |         row_number() OVER (PARTITION BY event_type ORDER BY d) AS i,
        |         CAST(c AS DOUBLE) AS x
        |  FROM daily),
        |nn AS (SELECT event_type, max(i) AS n FROM idx GROUP BY 1),
        |walk(event_type, i, l, b) AS (
        |  SELECT i1.event_type, CAST(1 AS BIGINT), i1.x, i2.x - i1.x
        |  FROM idx i1 JOIN idx i2
        |    ON i1.event_type = i2.event_type AND i1.i = 1 AND i2.i = 2
        |  UNION ALL
        |  SELECT w.event_type, w.i + 1,
        |         0.5 * ix.x + (1.0 - 0.5) * (w.l + w.b),
        |         0.25 * ((0.5 * ix.x + (1.0 - 0.5) * (w.l + w.b)) - w.l) +
        |         (1.0 - 0.25) * w.b
        |  FROM walk w JOIN idx ix
        |    ON ix.event_type = w.event_type AND ix.i = w.i + 1)
        |SELECT w.event_type, nn.n AS n_days,
        |       round(w.l, 6) AS level, round(w.b, 6) AS trend,
        |       round(w.l + w.b, 6) AS forecast
        |FROM walk w JOIN nn ON nn.event_type = w.event_type AND w.i = nn.n
        |ORDER BY w.event_type""".stripMargin,
    // BM25 replay: same idf/tf/length expressions, same term-ordered
    // 0.0-seeded fold (list_prepend + list_reduce == aggregate HOF).
    "text_bm25" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${textWords()}) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |stats AS (SELECT count(*) AS n_docs,
         |                 CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |                   AS avgdl
         |          FROM dl),
         |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |qt AS (
         |  SELECT q_id, tok, df FROM (
         |    SELECT tf.doc_id AS q_id, tf.tok, df.df,
         |           row_number() OVER (PARTITION BY tf.doc_id
         |                              ORDER BY df.df ASC, tf.tok ASC) AS trk
         |    FROM tf JOIN df ON tf.tok = df.tok
         |    WHERE tf.doc_id < 4)
         |  WHERE trk <= 5),
         |contrib AS (
         |  SELECT qt.q_id, tf.doc_id, qt.tok,
         |         ln((CAST(n_docs AS DOUBLE) - CAST(qt.df AS DOUBLE) + 0.5) /
         |            (CAST(qt.df AS DOUBLE) + 0.5) + 1.0) *
         |         (CAST(tf.tf AS DOUBLE) * 2.2) /
         |         (CAST(tf.tf AS DOUBLE) +
         |          1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl))
         |           AS c
         |  FROM qt
         |  JOIN tf ON tf.tok = qt.tok
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN stats
         |  WHERE tf.doc_id <> qt.q_id),
         |scored AS (
         |  SELECT q_id, doc_id,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |                                  list(c ORDER BY tok)),
         |                     (a, b) -> a + b) AS score,
         |         count(*) AS n_terms
         |  FROM contrib GROUP BY 1, 2),
         |r AS (
         |  SELECT q_id, doc_id, n_terms, score,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY score DESC, doc_id ASC) AS rk
         |  FROM scored)
         |SELECT q_id, CAST(rk AS BIGINT) AS rk, doc_id,
         |       CAST(n_terms AS BIGINT) AS n_terms, round(score, 6) AS score
         |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Pairwise overlap of the three detectors' verified pair sets;
    // minhash and ngram CTEs replayed, OPH bucketed the same way.
    "dedup_detector_overlap" -> {
      val oph =
        s"""hh2 AS (SELECT doc_id, ${duckMd5Bits("shingle", 1, 15)} AS h FROM sh),
           |bins AS (SELECT doc_id, h % 16 AS bin, min(h) AS sig
           |         FROM hh2 GROUP BY 1, 2),
           |spine AS (SELECT DISTINCT doc_id FROM hh2),
           |grid AS (SELECT doc_id, b.b AS bin
           |         FROM spine CROSS JOIN (SELECT unnest(range(16)) AS b) b),
           |fullg AS (
           |  SELECT g.doc_id, g.bin,
           |         coalesce(bins.sig, 1152921504606846976) AS sig
           |  FROM grid g LEFT JOIN bins
           |    ON bins.doc_id = g.doc_id AND bins.bin = g.bin),
           |bstr AS (
           |  SELECT doc_id, bin // 4 AS band,
           |         string_agg(CAST(sig AS VARCHAR), '_' ORDER BY bin) AS s
           |  FROM fullg GROUP BY doc_id, bin // 4),
           |bnd AS (SELECT doc_id,
           |               md5(concat(CAST(band AS VARCHAR), '_', s)) AS band_hash
           |        FROM bstr),
           |ocand AS (
           |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
           |  FROM bnd x JOIN bnd y
           |    ON x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
           |shv2 AS (SELECT DISTINCT doc_id, h FROM hh2),
           |card2 AS (SELECT doc_id, count(*) AS n_sh FROM shv2 GROUP BY doc_id),
           |inter2 AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
           |  FROM shv2 a JOIN shv2 b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |ophp AS (
           |  SELECT c.id_a, c.id_b FROM ocand c
           |  JOIN inter2 i ON i.id_a = c.id_a AND i.id_b = c.id_b
           |  JOIN card2 ca ON ca.doc_id = c.id_a
           |  JOIN card2 cb ON cb.doc_id = c.id_b
           |  WHERE CAST(n_inter AS DOUBLE) /
           |        CAST(ca.n_sh + cb.n_sh - n_inter AS DOUBLE) >= 0.7)""".stripMargin
      s"""WITH $duckMinhashCtes,
         |mhp AS (
         |  SELECT jac.id_a, jac.id_b
         |  FROM jac JOIN cand ON jac.id_a = cand.id_a AND jac.id_b = cand.id_b
         |  WHERE j >= 0.7),
         |$oph,
         |ngp AS (
         |  SELECT id_a, id_b FROM jac WHERE j >= 0.7),
         |pairsets AS (
         |  SELECT 'minhash_vs_oph' AS pairing,
         |         (SELECT count(*) FROM mhp) AS n_left,
         |         (SELECT count(*) FROM ophp) AS n_right,
         |         (SELECT count(*) FROM (SELECT * FROM mhp INTERSECT
         |                                SELECT * FROM ophp)) AS n_both
         |  UNION ALL
         |  SELECT 'minhash_vs_ngram',
         |         (SELECT count(*) FROM mhp),
         |         (SELECT count(*) FROM ngp),
         |         (SELECT count(*) FROM (SELECT * FROM mhp INTERSECT
         |                                SELECT * FROM ngp))
         |  UNION ALL
         |  SELECT 'oph_vs_ngram',
         |         (SELECT count(*) FROM ophp),
         |         (SELECT count(*) FROM ngp),
         |         (SELECT count(*) FROM (SELECT * FROM ophp INTERSECT
         |                                SELECT * FROM ngp)))
         |SELECT pairing, CAST(n_left AS BIGINT) AS n_left,
         |       CAST(n_right AS BIGINT) AS n_right,
         |       CAST(n_both AS BIGINT) AS n_both,
         |       CAST(n_left + n_right - n_both AS BIGINT) AS n_union
         |FROM pairsets ORDER BY pairing""".stripMargin
    },
    "q_intersect_all" ->
      """SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
        |FROM events WHERE event_type = 'click'
        |INTERSECT ALL
        |SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d
        |FROM events WHERE event_type = 'view'
        |ORDER BY user_id, d""".stripMargin,
    "text_lang_confusion" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(w, x -> x IN ('the','a','and','of','to'))) AS BIGINT) AS s_en,
        |         CAST(len(list_filter(w, x -> x IN ('der','die','das','und','nicht'))) AS BIGINT) AS s_de,
        |         CAST(len(list_filter(w, x -> x IN ('el','la','los','que','y'))) AS BIGINT) AS s_es
        |  FROM t),
        |g AS (
        |  SELECT doc_id,
        |         CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |              WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS lang_guess
        |  FROM s),
        |cells AS (
        |  SELECT d.lang, g.lang_guess, count(*) AS n
        |  FROM documents d JOIN g ON d.doc_id = g.doc_id
        |  GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_actual
        |        FROM cells GROUP BY 1)
        |SELECT cells.lang, lang_guess, n, n_actual,
        |       round(CAST(n AS DOUBLE) / CAST(n_actual AS DOUBLE), 6) AS share
        |FROM cells JOIN tot ON cells.lang = tot.lang
        |ORDER BY cells.lang, lang_guess""".stripMargin,
    "sim_centroid_drift" ->
      """WITH pe AS (
        |  SELECT label, CAST(vec_id % 2 AS INTEGER) AS par,
        |         unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, par, pos, avg(CAST(v AS DOUBLE)) AS m, count(*) AS c
        |  FROM pe GROUP BY 1, 2, 3),
        |arr AS (
        |  SELECT label, par, list(m ORDER BY pos) AS cen,
        |         CAST(max(c) AS BIGINT) AS n
        |  FROM cent GROUP BY 1, 2)
        |SELECT a.label, a.n AS n_even, b.n AS n_odd,
        |       round(list_cosine_similarity(a.cen, b.cen), 6) AS cos_drift
        |FROM arr a JOIN arr b
        |  ON a.label = b.label AND a.par = 0 AND b.par = 1
        |ORDER BY a.label""".stripMargin,
    // Integer token-dim hashes mean-pooled exactly (int sum / count).
    "text_doc_embedding" -> {
      val dims = (0 until 8).map { i =>
        val h = duckMd5Bits(s"concat('${i}_', tok)", 1, 7)
        s"round(CAST(sum($h % 1000) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS d$i"
      }.mkString(",\n|       ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${textWords()}) AS tok FROM documents)
         |SELECT doc_id, count(*) AS n_toks,
         |       $dims
         |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q_overlap_join" -> {
      val promoValues = graft.operators.Temporal.promoWindows
        .map { case (id, s, e) =>
          s"($id, TIMESTAMP '$s', TIMESTAMP '$e')" }.mkString(", ")
      s"""WITH promos(promo_id, p0t, p1t) AS (VALUES $promoValues),
         |p AS (SELECT promo_id, epoch_us(p0t) AS p0, epoch_us(p1t) AS p1
         |      FROM promos),
         |spans AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day,
         |         min(epoch_us(CAST(ts AS TIMESTAMP))) AS a0,
         |         max(epoch_us(CAST(ts AS TIMESTAMP))) AS a1
         |  FROM events GROUP BY 1, 2)
         |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
         |       CAST(promo_id AS BIGINT) AS promo_id,
         |       least(a1, p1) - greatest(a0, p0) AS overlap_us
         |FROM spans JOIN p ON a0 < p1 AND p0 < a1
         |WHERE least(a1, p1) - greatest(a0, p0) > 0
         |ORDER BY user_id, day, promo_id""".stripMargin
    },
    "q_constraint_audit" ->
      """SELECT * FROM (
        |  SELECT 'customer_pk' AS check_name, count(*) AS n_checked,
        |         count(*) - count(DISTINCT c_custkey) AS n_violations
        |  FROM customer
        |  UNION ALL SELECT 'orders_pk', count(*),
        |         count(*) - count(DISTINCT o_orderkey) FROM orders
        |  UNION ALL SELECT 'lineitem_pk', count(*),
        |         count(*) - (SELECT count(*) FROM
        |           (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
        |  FROM lineitem
        |  UNION ALL SELECT 'part_pk', count(*),
        |         count(*) - count(DISTINCT p_partkey) FROM part
        |  UNION ALL SELECT 'orders_custkey_fk', count(*),
        |         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey
        |  UNION ALL SELECT 'lineitem_orderkey_fk', count(*),
        |         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey
        |  UNION ALL SELECT 'lineitem_partkey_fk', count(*),
        |         CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
        |    ON l.l_partkey = p.p_partkey
        |  UNION ALL SELECT 'lineitem_suppkey_fk', count(*),
        |         CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
        |    ON l.l_suppkey = s.s_suppkey
        |  UNION ALL SELECT 'customer_nationkey_fk', count(*),
        |         CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
        |    ON c.c_nationkey = n.n_nationkey
        |  UNION ALL SELECT 'supplier_nationkey_fk', count(*),
        |         CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM supplier s LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
        |    ON s.s_nationkey = n.n_nationkey
        |  UNION ALL SELECT 'nation_regionkey_fk', count(*),
        |         CAST(sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM nation n LEFT JOIN (SELECT DISTINCT r_regionkey FROM region) r
        |    ON n.n_regionkey = r.r_regionkey
        |) ORDER BY check_name""".stripMargin,
    "text_contamination_pairs" ->
      s"""WITH t AS (SELECT doc_id, ${textWords()} AS w FROM documents),
         |win AS (
         |  SELECT doc_id, unnest(
         |    CASE WHEN len(w) >= 8
         |         THEN list_transform(range(len(w) - 7),
         |                i -> array_to_string(w[i+1:i+8], ' '))
         |         ELSE CAST([] AS VARCHAR[]) END) AS s
         |  FROM t),
         |g AS (SELECT DISTINCT doc_id, ${duckMd5Bits("s", 1, 15)} AS h FROM win),
         |ev AS (SELECT doc_id AS eval_doc, h FROM g WHERE doc_id % 10 = 0),
         |tr AS (SELECT doc_id AS train_doc, h FROM g WHERE doc_id % 10 <> 0)
         |SELECT train_doc, eval_doc,
         |       CAST(count(DISTINCT tr.h) AS BIGINT) AS n_shared
         |FROM tr JOIN ev ON tr.h = ev.h
         |GROUP BY 1, 2 HAVING count(DISTINCT tr.h) >= 3
         |ORDER BY train_doc, eval_doc""".stripMargin,
    "pipe_llm_corpus" -> duckLlmPipeline,
    "pipe_report" -> duckLlmReport,
    // the materialized-stage-frames mode is gated on the SAME replay
    // as the recompute mode — the modes are row-identical by contract
    "pipe_report_mat" -> duckLlmReport,
    // URL canonicalization: the same deterministic synthesis from
    // (doc_id, source), the same RE2-safe regex chain, the same
    // min-id url dedup and per-domain rank — replayed end to end.
    "text_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN 'docs.' ELSE 'cdn.' END) ||
        |    source || '.com' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
        |    '/docs/' || CAST(doc_id // 40 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed'
        |          WHEN doc_id % 7 = 1
        |            THEN '?ref=' || CAST(doc_id // 40 AS VARCHAR) ||
        |                 '&utm_campaign=w'
        |          ELSE '' END) ||
        |    (CASE WHEN doc_id % 11 = 0 THEN '#s' ELSE '' END) AS raw
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |         regexp_replace(raw, '#.*$', '') AS nf,
        |         regexp_replace(regexp_replace(raw, '#.*$', ''),
        |                        '^[A-Za-z]+://', '') AS rest
        |  FROM u),
        |c AS (
        |  SELECT doc_id,
        |         lower(regexp_extract(nf, '^([A-Za-z]+)://', 1)) AS scheme,
        |         regexp_replace(regexp_replace(
        |           lower(regexp_extract(rest, '^([^/?#]+)', 1)),
        |           '^www\.', ''), ':443$', '') AS host,
        |         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |           regexp_replace(rest, '^[^/?#]+', ''),
        |           'utm_[a-z]+=[^&#]*&?', ''), '[?&]$', ''),
        |           '/\?', '?'), '/$', '') AS tail
        |  FROM p),
        |b AS (
        |  SELECT doc_id, scheme || '://' || host || tail AS url_canon,
        |         regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM c),
        |w AS (
        |  SELECT doc_id, url_canon, domain,
        |         min(doc_id) OVER (PARTITION BY url_canon) AS url_dup_of
        |  FROM b),
        |r AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (PARTITION BY domain
        |                                 ORDER BY doc_id) AS BIGINT)
        |           AS domain_rk
        |  FROM w WHERE url_dup_of = doc_id)
        |SELECT w.doc_id, w.url_canon, w.domain, w.url_dup_of,
        |       CAST(coalesce(r.domain_rk, 0) AS BIGINT) AS domain_rk,
        |       CAST(CASE WHEN r.domain_rk IS NOT NULL AND r.domain_rk <= 10
        |                 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM w LEFT JOIN r ON w.doc_id = r.doc_id
        |ORDER BY w.doc_id""".stripMargin,
    // ---- bounded-error gates for the approximate operators (r10) ----
    // Each approximate query's registered surface emits the EXACT
    // counterpart columns (recomputed here) plus a verdict column the
    // oracle predicts as `true`: the sketch/index stays load-bearing
    // inside the Spark query, and an estimate drifting outside its
    // spec bound becomes a hash FAIL in the correctness artifact
    // instead of an unchecked `no_oracle` row.
    "q_approx_distinct" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_approx_quantile" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       true AS p50_rank_ok, true AS p90_rank_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cms_topk" ->
      """SELECT CAST(row_number() OVER (ORDER BY n_exact DESC, key)
        |            AS BIGINT) AS rk,
        |       key, n_exact, true AS cms_ok
        |FROM (SELECT l_orderkey AS key, count(*) AS n_exact
        |      FROM lineitem GROUP BY 1)
        |ORDER BY n_exact DESC, key LIMIT 20""".stripMargin,
    "q_hll_rollup" ->
      """SELECT o_orderpriority,
        |       CAST(count(DISTINCT strftime(o_orderdate, '%Y-%m'))
        |            AS BIGINT) AS n_months,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
        |       true AS approx_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hll_intersect" ->
      """WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        |n AS (SELECT event_type, count(*) AS n_u FROM d GROUP BY 1),
        |i AS (SELECT a.event_type AS t_a, b.event_type AS t_b,
        |             count(*) AS exact_inter
        |      FROM d a JOIN d b ON a.user_id = b.user_id
        |                       AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT na.event_type AS t_a, nb.event_type AS t_b,
        |       CAST(coalesce(i.exact_inter, 0) AS BIGINT) AS exact_inter,
        |       CAST(na.n_u + nb.n_u - coalesce(i.exact_inter, 0)
        |            AS BIGINT) AS exact_union,
        |       true AS inter_ok
        |FROM n na JOIN n nb ON na.event_type < nb.event_type
        |LEFT JOIN i ON i.t_a = na.event_type AND i.t_b = nb.event_type
        |ORDER BY t_a, t_b""".stripMargin,
    "sim_ivf_kmeans" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(5 AS BIGINT) AS k, true AS recall_ok
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    // Trained-PQ verdict oracle (the sim_ivf_kmeans discipline): exact
    // counts DuckDB-recomputed; the two recall verdicts — clears the
    // floor, and >= the query-blind sample codebook at equal code
    // budget — are predicted true, with measured margins recorded in
    // the Scaladoc (multiple borderline-flips wide at every corpus).
    "sim_pq_trained" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(5 AS BIGINT) AS k, true AS trained_ok,
        |       true AS trained_ge_sample
        |FROM embeddings WHERE vec_id < 64""".stripMargin,
    "sim_ivfpq_trained" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(5 AS BIGINT) AS k, true AS trained_ok,
        |       true AS trained_ge_sample
        |FROM embeddings WHERE vec_id < 64""".stripMargin,
    // Real metadata oracle: DuckDB reads the SAME parquet footer the
    // Spark side surfaces. {SF_DIR} is substituted by Verify at dump
    // time (the only oracle needing a raw path — parquet_metadata()
    // has no view to hang off).
    "src_rowgroup_stats" ->
      """SELECT CAST(row_group_id AS BIGINT) AS row_group,
        |       CAST(row_group_num_rows AS BIGINT) AS n_rows,
        |       CAST(stats_min_value AS BIGINT) AS min_key,
        |       CAST(stats_max_value AS BIGINT) AS max_key,
        |       CAST(stats_null_count AS BIGINT) AS n_nulls
        |FROM parquet_metadata('{SF_DIR}/orders.parquet')
        |WHERE path_in_schema = 'o_orderkey' ORDER BY row_group""".stripMargin
  )
}
