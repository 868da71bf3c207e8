package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Analytics, BpeTrain, ChatOracle, Classifier, Dedup, Events, Hybrid, Multimodal, Privacy, Relational, Sampling, Scale, Similarity, Sketches, Statistics, TextAnalytics}
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed done in SURVEY.md §2 gets a `queries` entry and,
  * when SQL-expressible, an `oracleSql` entry with IDENTICAL column names
  * (the driver's compare sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"    -> Relational.pricingSummary _,
    "q2_revenue_filter"     -> Relational.revenueFilter _,
    "q3_cust_nation_region" -> Relational.custNationRegion _,
    "q4_order_priority"     -> Relational.orderRevenueByPriority _,
    "q5_semi_join"          -> Relational.semiJoinSegments _,
    "q6_anti_join"          -> Relational.antiJoinSegments _,
    "q7_top_orders"         -> Relational.topOrdersPerCustomer _,
    "q8_distinct"           -> Relational.distinctLangSource _,
    "q9_token_stats"        -> TextAnalytics.tokenStats _,
    "q10_quality_score"     -> TextAnalytics.qualityScore _,
    "q11_lang_id"           -> TextAnalytics.langId _,
    "q12_fingerprint"       -> TextAnalytics.fingerprint _,
    "q13_exact_dedup"       -> Dedup.exactDedup _,
    // dedup-family queries pin the DuckDB-mirrorable 32-bit hash width
    // (Dedup.OracleHashBits); the library default is 64-bit, which has
    // no cheap hex-nibble SQL mirror — see Dedup.DefaultHashBits
    "q14_minhash_lsh"       -> ((s: SparkSession, d: String) => Dedup.minhashLshPairs(s, d, Dedup.OracleHashBits)),
    "q15_jaccard_pairs"     -> ((s: SparkSession, d: String) => Dedup.jaccardPairs(s, d, Dedup.OracleHashBits)),
    "q16_simhash"           -> Dedup.simhash _,
    "q17_simhash_pairs"     -> Dedup.simhashPairs _,
    "q18_embedding_neardup" -> Similarity.nearDupPairs _,
    "q19_knn_bruteforce"    -> Similarity.knnBruteForce _,
    "q20_lsh_knn"           -> Similarity.lshKnn _,
    "q21_hourly_windows"    -> Events.hourlyTypeCounts _,
    "q22_sessionize"        -> Events.sessionize _,
    "q23_asof_join"         -> Events.clickErrorAsOf _,
    "q24_user_pivot"        -> Events.userTypePivot _,
    "q25_sliding_windows"   -> Events.slidingWindowCounts _,
    "q26_stream_windows"    -> EventStream.hourlyTypeCountsStream _,
    "q27_chunk_fixed"       -> ChatOracle.chunkFixed _,
    "q28_folder_filter"     -> ChatOracle.folderFilter _,
    "q29_exclude_filter"    -> ChatOracle.excludeFilter _,
    "q30_extension_filter"  -> ChatOracle.extensionFilter _,
    "q31_primary_langs"     -> ChatOracle.primaryLangs _,
    "q32_human_list"        -> ChatOracle.humanList _,
    "q33_hash_embed_knn"    -> ChatOracle.hashEmbedKnn _,
    "q34_media_features"    -> Multimodal.mediaFeatures _,
    "q35_frame_sample"      -> Multimodal.frameSample _,
    "q36_rollup"            -> Analytics.rollupCounts _,
    "q37_running_windows"   -> Analytics.runningOrderStats _,
    "q38_set_ops"           -> Analytics.cohortSetOps _,
    "q39_exact_median"      -> Analytics.medianPriceBySegment _,
    "q40_salted_agg"        -> Scale.saltedTypeCounts _,
    "q41_bucketed_join"     -> Scale.bucketedOrderRevenue _,
    "q42_ivf_knn"           -> Similarity.ivfKnn _,
    "q43_json_extract"      -> Events.jsonPropStats _,
    "q44_time_parts"        -> Events.timePartCounts _,
    // q45 hashes (exact, within_bound): the sketch value itself is
    // engine-specific, but the error bound is pinned by the hash gate
    "q45_approx_distinct"   -> Sketches.approxDistinctChecked _,
    "q46_bloom_semi_join"   -> Sketches.bloomPrunedOrderLineitems _,
    "q47_exact_corr"        -> Statistics.quantityPriceCorr _,
    "q48_edit_distance"     -> Statistics.partNameNearDup _,
    "q49_dedup_clusters"    -> ((s: SparkSession, d: String) => Dedup.nearDupClusters(s, d, Dedup.OracleHashBits)),
    "q50_hash_split"        -> Sampling.hashSplit _,
    "q51_stratified_sample" -> Sampling.stratifiedSample _,
    "q52_novelty"           -> ((s: SparkSession, d: String) => Dedup.noveltyScores(s, d, Dedup.OracleHashBits)),
    "q53_source_cap"        -> Sampling.sourceCap _,
    "q54_pq_knn"            -> Similarity.pqKnn _,
    "q55_oov_rate"          -> TextAnalytics.oovRate _,
    // q56 hashes quantized exact percentiles + within_bound (same
    // pattern as q45)
    "q56_approx_quantiles"  -> Sketches.approxQuantilesChecked _,
    "q57_interval_join"     -> Events.clickErrorInterval _,
    "q58_cdc_segments"      -> Dedup.cdcSegments _,
    "q59_zipf_quality"      -> TextAnalytics.zipfQuality _,
    "q60_ivfpq_knn"         -> Similarity.ivfPqKnn _,
    "q61_repetition"        -> TextAnalytics.repetitionStats _,
    "q62_decontamination"   -> ((s: SparkSession, d: String) => Dedup.decontamination(s, d, Dedup.OracleHashBits)),
    "q63_sequence_packing"  -> TextAnalytics.sequencePacking _,
    "q64_pii_screen"        -> TextAnalytics.piiScreen _,
    "q65_dup_spans"         -> ((s: SparkSession, d: String) => Dedup.dupSpans(s, d, Dedup.OracleHashBits)),
    "q66_semantic_dedup"    -> Similarity.semanticDedup _,
    "q67_hard_negatives"    -> Similarity.hardNegatives _,
    "q68_pii_redact"        -> TextAnalytics.piiRedact _,
    "q69_tfidf_keywords"    -> TextAnalytics.tfidfKeywords _,
    "q70_stream_sessions"   -> EventStream.sessionWindowStream _,
    "q71_importance_weights" -> Sampling.importanceWeights _,
    "q72_source_overlap"    -> ((s: SparkSession, d: String) => Dedup.sourceOverlap(s, d, Dedup.OracleHashBits)),
    "q73_kmeans_iter"       -> Similarity.kmeansIter _,
    // q74/q155/q158 SERVE from the persisted dedup graph (built once
    // per corpus snapshot, untimed — the q81/q105/q153 discipline);
    // the inline recomputes stay exercised as the artifact's build
    // path and by the round-trip identity specs
    "q74_dedup_survivors"   -> ((s: SparkSession, d: String) => Dedup.dedupSurvivorsFromGraph(s, d, Dedup.OracleHashBits)),
    "q75_normalized_dedup"  -> Dedup.normalizedDedup _,
    "q76_ann_recall"        -> Similarity.annRecall _,
    "q77_mixture_weights"   -> Sampling.mixtureWeights _,
    "q78_length_histogram"  -> TextAnalytics.lengthHistogram _,
    "q79_filter_funnel"     -> TextAnalytics.filterFunnel _,
    "q80_forest_recall"     -> Similarity.forestRecall _,
    // persisted-IVF serving paths: the quantizer trains ONCE into an
    // on-disk artifact (untimed, like q41's bucket write); the queries
    // read it back and must be bit-identical to the retrain-every-time
    // formulations, so they share q66/q67's oracles
    "q81_semantic_dedup_ix" -> Similarity.semanticDedupFromIndex _,
    "q82_hard_negatives_ix" -> Similarity.hardNegativesFromIndex _,
    "q83_containment_pairs" -> ((s: SparkSession, d: String) => Dedup.containmentPairs(s, d, Dedup.OracleHashBits)),
    "q84_perceptron_step"   -> Classifier.perceptronStep _,
    "q85_bm25_search"       -> TextAnalytics.bm25Search _,
    "q86_funnel_stages"     -> Events.funnelStages _,
    "q87_ssl_prototypes"    -> Similarity.prototypeScores _,
    // q88 hashes (exact top-k, within_bound): the MG sketch value is
    // summary-dependent, but the deterministic n/m bound is pinned by
    // the hash gate (the q45/q56 checked-sketch pattern)
    "q88_top_tokens"        -> Sketches.topTokensChecked _,
    "q89_cohort_retention"  -> Events.cohortRetention _,
    "q90_anomaly_windows"   -> Events.anomalyWindows _,
    "q91_cluster_split"     -> ((s: SparkSession, d: String) => Dedup.clusterSplitFromGraph(s, d, Dedup.OracleHashBits)),
    "q92_gopher_gate"       -> TextAnalytics.gopherGate _,
    "q93_pagerank_iter"     -> ((s: SparkSession, d: String) => Dedup.pagerankIterFromGraph(s, d, Dedup.OracleHashBits)),
    "q94_surprisal"         -> TextAnalytics.surprisalScores _,
    "q95_source_datacard"   -> TextAnalytics.sourceDatacard _,
    "q96_matryoshka_recall" -> Similarity.matryoshkaRecall _,
    "q97_span_corruption"   -> TextAnalytics.spanCorruption _,
    "q98_stream_anomaly"    -> EventStream.anomalyWindowsStream _,
    "q99_incremental_dedup" -> ((s: SparkSession, d: String) => Dedup.incrementalDedup(s, d, Dedup.OracleHashBits)),
    "q100_token_budget"     -> Sampling.tokenBudget _,
    "q101_jsonl_roundtrip"  -> graft.sources.JsonlCorpus.roundtripChecksum _,
    "q102_stream_admission" -> ((s: SparkSession, d: String) => graft.streaming.DedupStream.admissionStream(s, d)),
    "q103_multi_decontam"   -> ((s: SparkSession, d: String) => Dedup.multiDecontamination(s, d, Dedup.OracleHashBits)),
    "q104_threshold_sweep"  -> ((s: SparkSession, d: String) => Dedup.thresholdSweep(s, d, Dedup.OracleHashBits)),
    "q105_indexed_admission" -> ((s: SparkSession, d: String) => Dedup.incrementalDedupFromIndex(s, d, Dedup.OracleHashBits)),
    "q106_quality_survivors" -> ((s: SparkSession, d: String) => Dedup.qualitySurvivorsFromGraph(s, d, Dedup.OracleHashBits)),
    "q107_cms_tokens"       -> Sketches.cmsTokensChecked _,
    "q108_semantic_decontam" -> Similarity.semanticDecontam _,
    "q109_decontam_redact"  -> ((s: SparkSession, d: String) => Dedup.decontamRedact(s, d, Dedup.OracleHashBits)),
    "q110_sq8_recall"       -> Similarity.sq8Recall _,
    "q111_stream_gate"      -> ((s: SparkSession, d: String) => graft.streaming.DedupStream.gateStream(s, d)),
    "q112_stream_decontam"  -> ((s: SparkSession, d: String) => graft.streaming.DedupStream.decontamStream(s, d)),
    "q113_unimax_alloc"     -> Sampling.uniMaxAllocation _,
    "q114_train_order"      -> Sampling.trainOrder _,
    "q115_dup_span_redact"  -> ((s: SparkSession, d: String) => Dedup.dupSpanRedact(s, d, Dedup.OracleHashBits)),
    "q116_perplexity_buckets" -> TextAnalytics.perplexityBuckets _,
    "q117_cluster_sample"   -> Similarity.clusterBalancedSample _,
    "q118_shard_manifest"   -> Sampling.shardManifest _,
    "q119_stream_pii_redact" -> ((s: SparkSession, d: String) => graft.streaming.DedupStream.piiRedactStream(s, d)),
    "q120_within_doc_redact" -> TextAnalytics.withinDocRedact _,
    "q121_bpe_pairs"        -> BpeTrain.bpePairs _,
    "q122_bigram_surprisal" -> TextAnalytics.bigramSurprisal _,
    "q123_vocab_coverage"   -> TextAnalytics.vocabCoverage _,
    "q124_edit_verified_pairs" -> ((s: SparkSession, d: String) => Dedup.editVerifiedPairs(s, d)),
    "q125_rp_recall"        -> Similarity.rpRecall _,
    "q126_source_drift"     -> TextAnalytics.sourceDrift _,
    "q127_rrf_hybrid"       -> Hybrid.rrfHybrid _,
    "q128_winnow_pairs"     -> ((s: SparkSession, d: String) => Dedup.winnowPairs(s, d, Dedup.OracleHashBits)),
    "q129_distinct_ngrams"  -> ((s: SparkSession, d: String) => TextAnalytics.distinctNgrams(s, d, Dedup.OracleHashBits)),
    "q130_source_minhash"   -> ((s: SparkSession, d: String) => Dedup.sourceMinhashMatrix(s, d, Dedup.OracleHashBits)),
    "q131_image_dhash"      -> Multimodal.dhashPairs _,
    "q132_label_centroids"  -> Similarity.labelCentroids _,
    "q133_quality_dup_audit" -> ((s: SparkSession, d: String) => Dedup.qualityDupAuditFromGraph(s, d, Dedup.OracleHashBits)),
    "q134_stream_dhash"     -> ((s: SparkSession, d: String) => graft.streaming.DedupStream.dhashStream(s, d)),
    "q135_tokenizer_fertility" -> TextAnalytics.tokenizerFertility _,
    "q136_simhash_sweep"    -> ((s: SparkSession, d: String) => Dedup.simhashSweep(s, d, Dedup.OracleHashBits)),
    "q137_epoch_capped_alloc" -> Sampling.epochCappedAllocation _,
    "q138_cdc_dedup"        -> Dedup.cdcDedup _,
    "q139_hll_union"        -> Sketches.hllUnionReport _,
    "q140_source_embed_drift" -> ChatOracle.sourceEmbedDrift _,
    "q141_dup_spectrum"     -> ((s: SparkSession, d: String) => Dedup.dupSpectrum(s, d, Dedup.OracleHashBits)),
    "q142_stream_drift"     -> ((s: SparkSession, d: String) => graft.streaming.DedupStream.driftStream(s, d)),
    "q143_source_top_tokens" -> TextAnalytics.sourceTopTokens _,
    "q144_neg_sampling"     -> Sampling.negativeSamplingTable _,
    "q145_shared_runs"      -> ((s: SparkSession, d: String) => Dedup.sharedRunPairs(s, d, Dedup.OracleHashBits)),
    "q146_cluster_cohesion" -> ((s: SparkSession, d: String) => Dedup.clusterCohesionFromGraph(s, d, Dedup.OracleHashBits)),
    "q147_anisotropy"       -> Similarity.anisotropyReport _,
    "q148_phrase_scores"    -> TextAnalytics.phraseScores _,
    "q149_boilerplate_grams" -> ((s: SparkSession, d: String) => Dedup.boilerplateGrams(s, d, Dedup.OracleHashBits)),
    "q150_simhash_bit_bias" -> Dedup.simhashBitBias _,
    "q151_audio_envelope"   -> Multimodal.audioEnvelopePairs _,
    "q152_cross_source_matrix" -> ((s: SparkSession, d: String) => Dedup.crossSourceMatrixFromGraph(s, d, Dedup.OracleHashBits)),
    // the postings-artifact serving path must be bit-identical to q85's
    // recompute, so it shares q85's oracle (the q81/q82 discipline)
    "q153_bm25_served"      -> TextAnalytics.bm25Served _,
    "q154_retrieval_eval"   -> ((s: SparkSession, d: String) => Hybrid.retrievalEvalFromGraph(s, d, Dedup.OracleHashBits)),
    "q155_consensus_clusters" -> ((s: SparkSession, d: String) => Dedup.consensusClustersFromGraph(s, d, Dedup.OracleHashBits)),
    "q156_byte_entropy"     -> TextAnalytics.byteEntropy _,
    "q157_small_cells"      -> TextAnalytics.smallCells _,
    "q158_dup_graph_walks"  -> ((s: SparkSession, d: String) => Dedup.dupGraphWalksFromGraph(s, d, Dedup.OracleHashBits)),
    "q159_dup_loss_weights" -> ((s: SparkSession, d: String) => Dedup.dupLossWeightsFromGraph(s, d, Dedup.OracleHashBits)),
    "q160_nprobe_sweep"     -> Similarity.nprobeSweep _,
    "q161_training_triplets" -> ((s: SparkSession, d: String) => Hybrid.trainingTripletsFromGraph(s, d, Dedup.OracleHashBits)),
    "q162_source_lm_matrix" -> TextAnalytics.sourceLmMatrix _,
    "q163_winnow_attribution" -> ((s: SparkSession, d: String) => Dedup.winnowAttributionFromIndex(s, d, Dedup.OracleHashBits)),
    // the streaming replay is row-identical to batch q156 by shared
    // core, so it shares q156's oracle (the q119/q142 discipline)
    "q164_stream_entropy"   -> ((s: SparkSession, d: String) => graft.streaming.DedupStream.entropyStream(s, d)),
    // admission-wave graph attach: the append path of the persisted
    // dedup graph exercised end-to-end (batch and at the firehose);
    // the streaming replay shares q165's oracle by shared append +
    // report cores
    "q165_graph_append"     -> ((s: SparkSession, d: String) => Dedup.graphAppendReport(s, d, Dedup.OracleHashBits)),
    "q166_stream_graph_append" -> ((s: SparkSession, d: String) => graft.streaming.DedupStream.graphAppendStream(s, d)),
    // the COMPOSED retrieve: embed hypo -> kNN over-fetch -> F3/F4
    // filters -> doc-preference quota sort -> truncate -> rank, run
    // through the REAL Retrieval pipeline with a fixed classification
    // — the end-to-end cross-engine pin of the chat query flow
    "q167_composed_retrieve" -> ChatOracle.composedRetrieve _,
    // round-10 family: published retrieval/sampling/graph/geometry
    // primitives a training-data pipeline leans on, each engine-exact
    "q168_mmr_diversify"    -> Similarity.mmrDiversify _,
    "q169_priority_sample"  -> Sampling.prioritySample _,
    "q170_graph_triangles"  -> Events.coVisitTriangles _,
    "q171_twonn_dim"        -> Similarity.twoNnDim _,
    "q172_rm3_expansion"    -> TextAnalytics.rm3Expansion _,
    // round-11 family: per-vector outlier audit, weighted lottery
    // sampling, deployment-grade LM smoothing, and sequence mining
    "q173_embed_outliers"   -> Similarity.embedOutliers _,
    "q174_weighted_reservoir" -> Sampling.weightedReservoir _,
    "q175_kn_xent"          -> TextAnalytics.knBigramXent _,
    "q176_seq_patterns"     -> Events.seqPatterns _,
    // split-integrity audit, collocation mining, and the reservoir's
    // streaming form
    "q177_split_leakage"    -> Sampling.splitLeakage _,
    "q178_pmi_collocations" -> TextAnalytics.pmiCollocations _,
    "q179_stream_reservoir" -> ((s: SparkSession, d: String) =>
      graft.streaming.SampleStream.reservoirStream(s, d)),
    // q177's audit moved to the admission frontier (prevent, not report)
    "q180_admission_split_guard" -> ((s: SparkSession, d: String) =>
      Dedup.admissionSplitGuard(s, d, Dedup.OracleHashBits)),
    "q181_stream_split_guard" -> ((s: SparkSession, d: String) =>
      graft.streaming.DedupStream.splitGuardStream(s, d)),
    "q182_heaps_law"        -> TextAnalytics.heapsLaw _,
    "q183_neyman_alloc"     -> Sampling.neymanAlloc _,
    "q184_audio_constellation" -> Multimodal.audioConstellation _,
    "q185_folded_packing"   -> TextAnalytics.foldedPacking _,
    "q186_curriculum"       -> TextAnalytics.curriculumSchedule _,
    "q187_ann_leaf_skew"    -> Similarity.annLeafSkew _,
    "q188_kanon_audit"      -> Privacy.kAnonAudit _,
    "q189_dp_histogram"     -> Privacy.dpHistogram _,
    "q190_fs_linkage"       -> ((s: SparkSession, d: String) =>
      Privacy.fsLinkageFromGraph(s, d, Dedup.OracleHashBits)),
    "q191_mondrian"         -> Privacy.mondrian _,
    "q192_kanon_admission"  -> Privacy.kAnonAdmission _,
    "q193_stream_kanon_gate" -> ((s: SparkSession, d: String) =>
      graft.streaming.PrivacyStream.kAnonGateStream(s, d)),
    "q194_good_turing"      -> TextAnalytics.goodTuring _,
    "q195_query_likelihood" -> TextAnalytics.queryLikelihood _,
    "q196_rank_agreement"   -> TextAnalytics.rankAgreement _,
    "q197_ab_readout"       -> Events.abReadout _,
    "q198_cuped"            -> Events.cupedReadout _,
    "q199_stream_ab_monitor" -> ((s: SparkSession, d: String) =>
      graft.streaming.EventStream.abMonitorStream(s, d)),
    "q200_srm_guard"        -> Events.srmGuard _,
    "q201_chunk_parity"     -> graft.ops.ChunkParity.chunkParity _,
    "q202_tokenizer_parity" -> graft.ops.TokenizerParity.tokenizerParity _,
    // round-15 family: the set-overlap reports SERVED from the
    // persisted postings artifact (build/serve split, VERDICT r14
    // item 1) — same counts, same formula code, same oracles as the
    // inline q15/q83 detectors
    "q203_jaccard_served"   -> ((s: SparkSession, d: String) =>
      Dedup.jaccardPairsFromPostings(s, d, Dedup.OracleHashBits)),
    "q204_containment_served" -> ((s: SparkSession, d: String) =>
      Dedup.containmentPairsFromPostings(s, d, Dedup.OracleHashBits))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(cast(floor(l_quantity*100) as bigint))/100.0 AS sum_qty,
        |  sum(cast(floor(l_extendedprice*100) as bigint))/100.0 AS sum_base_price,
        |  sum(cast(floor(l_extendedprice*(1.0-l_discount)*100) as bigint))/100.0 AS sum_disc_price,
        |  sum(cast(floor(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*100) as bigint))/100.0 AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_revenue_filter" ->
      """SELECT
        |  sum(cast(floor(l_extendedprice*l_discount*100) as bigint))/100.0 AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.06
        |  AND l_quantity < 24.0""".stripMargin,
    "q3_cust_nation_region" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  sum(cast(floor(c_acctbal*100) as bigint))/100.0 AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority,
        |  sum(cast(floor(l_extendedprice*(1.0-l_discount)*100) as bigint))/100.0 AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q5_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q6_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_cust
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q7_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q8_distinct" ->
      """SELECT DISTINCT lang, source FROM documents
        |ORDER BY lang, source""".stripMargin,
    "q9_token_stats"        -> TextAnalytics.tokenStatsSql,
    "q10_quality_score"     -> TextAnalytics.qualityScoreSql,
    "q11_lang_id"           -> TextAnalytics.langIdSql,
    "q12_fingerprint"       -> TextAnalytics.fingerprintSql,
    "q13_exact_dedup"       -> Dedup.exactDedupSql,
    "q14_minhash_lsh"       -> Dedup.minhashLshPairsSql,
    "q15_jaccard_pairs"     -> Dedup.jaccardPairsSql,
    "q16_simhash"           -> Dedup.simhashSql,
    "q17_simhash_pairs"     -> Dedup.simhashPairsSql,
    "q18_embedding_neardup" -> Similarity.nearDupPairsSql,
    "q19_knn_bruteforce"    -> Similarity.knnBruteForceSql,
    "q20_lsh_knn"           -> Similarity.lshKnnSql,
    "q21_hourly_windows"    -> Events.hourlyTypeCountsSql,
    "q22_sessionize"        -> Events.sessionizeSql,
    "q23_asof_join"         -> Events.clickErrorAsOfSql,
    "q24_user_pivot"        -> Events.userTypePivotSql,
    "q25_sliding_windows"   -> Events.slidingWindowCountsSql,
    // the streaming replay computes the same result as the batch window agg
    "q26_stream_windows"    -> Events.hourlyTypeCountsSql,
    "q27_chunk_fixed"       -> ChatOracle.chunkFixedSql,
    "q28_folder_filter"     -> ChatOracle.folderFilterSql,
    "q29_exclude_filter"    -> ChatOracle.excludeFilterSql,
    "q30_extension_filter"  -> ChatOracle.extensionFilterSql,
    "q31_primary_langs"     -> ChatOracle.primaryLangsSql,
    "q32_human_list"        -> ChatOracle.humanListSql,
    "q33_hash_embed_knn"    -> ChatOracle.hashEmbedKnnSql,
    "q34_media_features"    -> Multimodal.mediaFeaturesSql,
    "q35_frame_sample"      -> Multimodal.frameSampleSql,
    "q36_rollup"            -> Analytics.rollupCountsSql,
    "q37_running_windows"   -> Analytics.runningOrderStatsSql,
    "q38_set_ops"           -> Analytics.cohortSetOpsSql,
    "q39_exact_median"      -> Analytics.medianPriceBySegmentSql,
    // salted + bucketed variants produce byte-identical results to the
    // plain formulations; what differs is the physical plan (spec-tested)
    "q40_salted_agg"        -> Scale.saltedTypeCountsSql,
    "q41_bucketed_join"     -> Scale.bucketedOrderRevenueSql,
    "q42_ivf_knn"           -> Similarity.ivfKnnSql,
    "q43_json_extract"      -> Events.jsonPropStatsSql,
    "q44_time_parts"        -> Events.timePartCountsSql,
    "q45_approx_distinct"   -> Sketches.approxDistinctCheckedSql,
    "q46_bloom_semi_join"   -> Sketches.bloomPrunedSql,
    "q47_exact_corr"        -> Statistics.quantityPriceCorrSql,
    "q48_edit_distance"     -> Statistics.partNameNearDupSql,
    "q49_dedup_clusters"    -> Dedup.nearDupClustersSql,
    "q50_hash_split"        -> Sampling.hashSplitSql,
    "q51_stratified_sample" -> Sampling.stratifiedSampleSql,
    "q52_novelty"           -> Dedup.noveltyScoresSql,
    "q53_source_cap"        -> Sampling.sourceCapSql,
    "q54_pq_knn"            -> Similarity.pqKnnSql,
    "q55_oov_rate"          -> TextAnalytics.oovRateSql,
    "q56_approx_quantiles"  -> Sketches.approxQuantilesCheckedSql,
    "q57_interval_join"     -> Events.clickErrorIntervalSql,
    "q58_cdc_segments"      -> Dedup.cdcSegmentsSql,
    "q59_zipf_quality"      -> TextAnalytics.zipfQualitySql,
    "q60_ivfpq_knn"         -> Similarity.ivfPqKnnSql,
    "q61_repetition"        -> TextAnalytics.repetitionStatsSql,
    "q62_decontamination"   -> Dedup.decontaminationSql,
    "q63_sequence_packing"  -> TextAnalytics.sequencePackingSql,
    "q64_pii_screen"        -> TextAnalytics.piiScreenSql,
    "q65_dup_spans"         -> Dedup.dupSpansSql,
    "q66_semantic_dedup"    -> Similarity.semanticDedupSql,
    "q67_hard_negatives"    -> Similarity.hardNegativesSql,
    "q68_pii_redact"        -> TextAnalytics.piiRedactSql,
    "q69_tfidf_keywords"    -> TextAnalytics.tfidfKeywordsSql,
    // the streaming session replay computes the same table as batch q22
    "q70_stream_sessions"   -> Events.sessionizeSql,
    "q71_importance_weights" -> Sampling.importanceWeightsSql,
    "q72_source_overlap"    -> Dedup.sourceOverlapSql,
    "q73_kmeans_iter"       -> Similarity.kmeansIterSql,
    "q74_dedup_survivors"   -> Dedup.dedupSurvivorsSql,
    "q75_normalized_dedup"  -> Dedup.normalizedDedupSql,
    "q76_ann_recall"        -> Similarity.annRecallSql,
    "q77_mixture_weights"   -> Sampling.mixtureWeightsSql,
    "q78_length_histogram"  -> TextAnalytics.lengthHistogramSql,
    "q79_filter_funnel"     -> TextAnalytics.filterFunnelSql,
    "q80_forest_recall"     -> Similarity.forestRecallSql,
    // index-served twins of q66/q67: same result, different physical life
    "q81_semantic_dedup_ix" -> Similarity.semanticDedupSql,
    "q82_hard_negatives_ix" -> Similarity.hardNegativesSql,
    "q83_containment_pairs" -> Dedup.containmentPairsSql,
    "q84_perceptron_step"   -> Classifier.perceptronStepSql,
    "q85_bm25_search"       -> TextAnalytics.bm25SearchSql,
    "q86_funnel_stages"     -> Events.funnelStagesSql,
    "q87_ssl_prototypes"    -> Similarity.prototypeScoresSql,
    "q88_top_tokens"        -> Sketches.topTokensCheckedSql,
    "q89_cohort_retention"  -> Events.cohortRetentionSql,
    "q90_anomaly_windows"   -> Events.anomalyWindowsSql,
    "q91_cluster_split"     -> Dedup.clusterSplitSql,
    "q92_gopher_gate"       -> TextAnalytics.gopherGateSql,
    "q93_pagerank_iter"     -> Dedup.pagerankIterSql,
    "q94_surprisal"         -> TextAnalytics.surprisalScoresSql,
    "q95_source_datacard"   -> TextAnalytics.sourceDatacardSql,
    "q96_matryoshka_recall" -> Similarity.matryoshkaRecallSql,
    "q97_span_corruption"   -> TextAnalytics.spanCorruptionSql,
    // streaming replay scored against frozen offline moments is
    // bit-identical to the batch monitor, so q90's oracle serves both
    "q98_stream_anomaly"    -> Events.anomalyWindowsSql,
    "q99_incremental_dedup" -> Dedup.incrementalDedupSql,
    "q100_token_budget"     -> Sampling.tokenBudgetSql,
    // oracle reads the parquet table; the query reads the JSONL export —
    // a hash match proves the sink/source pair is lossless
    "q101_jsonl_roundtrip"  -> graft.sources.JsonlCorpus.roundtripChecksumSql,
    // the streamed replay is row-identical to batch q99, so its oracle serves both
    "q102_stream_admission" -> Dedup.incrementalDedupSql,
    "q103_multi_decontam"   -> Dedup.multiDecontaminationSql,
    "q104_threshold_sweep"  -> Dedup.thresholdSweepSql,
    // admission served from the persisted index is verdict-identical
    // to the in-memory freeze, so q99's oracle serves both
    "q105_indexed_admission" -> Dedup.incrementalDedupSql,
    "q106_quality_survivors" -> Dedup.qualitySurvivorsSql,
    // the estimate is deterministic (shared md5 row hashes), so the
    // oracle rebuilds the same cells and every column hash-checks
    "q107_cms_tokens"       -> Sketches.cmsTokensCheckedSql,
    "q108_semantic_decontam" -> Similarity.semanticDecontamSql,
    // oracle hashes the REDACTED text, so removal extents are pinned
    "q109_decontam_redact"  -> Dedup.decontamRedactSql,
    "q110_sq8_recall"       -> Similarity.sq8RecallSql,
    // the gate replay is row-identical to batch q92 (shared row-level
    // core), so q92's oracle serves both
    "q111_stream_gate"      -> TextAnalytics.gopherGateSql,
    // the screen replay is row-identical to batch q62 (shared shingle
    // path + verdict core, frozen benchmark), so q62's oracle serves both
    "q112_stream_decontam"  -> Dedup.decontaminationSql,
    "q113_unimax_alloc"     -> Sampling.uniMaxAllocationSql,
    "q114_train_order"      -> Sampling.trainOrderSql,
    "q115_dup_span_redact"  -> Dedup.dupSpanRedactSql,
    "q116_perplexity_buckets" -> TextAnalytics.perplexityBucketsSql,
    "q117_cluster_sample"   -> Similarity.clusterBalancedSampleSql,
    "q118_shard_manifest"   -> Sampling.shardManifestSql,
    // the redaction replay is row-identical to batch q68 (shared
    // row-level core), so q68's oracle serves both
    "q119_stream_pii_redact" -> TextAnalytics.piiRedactSql,
    "q120_within_doc_redact" -> TextAnalytics.withinDocRedactSql,
    "q121_bpe_pairs"        -> BpeTrain.bpePairsSql,
    "q122_bigram_surprisal" -> TextAnalytics.bigramSurprisalSql,
    "q123_vocab_coverage"   -> TextAnalytics.vocabCoverageSql,
    "q124_edit_verified_pairs" -> Dedup.editVerifiedPairsSql,
    "q125_rp_recall"        -> Similarity.rpRecallSql,
    "q126_source_drift"     -> TextAnalytics.sourceDriftSql,
    "q127_rrf_hybrid"       -> Hybrid.rrfHybridSql,
    "q128_winnow_pairs"     -> Dedup.winnowPairsSql,
    "q129_distinct_ngrams"  -> TextAnalytics.distinctNgramsSql,
    "q130_source_minhash"   -> Dedup.sourceMinhashMatrixSql,
    "q131_image_dhash"      -> Multimodal.dhashPairsSql,
    "q132_label_centroids"  -> Similarity.labelCentroidsSql,
    "q133_quality_dup_audit" -> Dedup.qualityDupAuditSql,
    "q134_stream_dhash"     -> Multimodal.dhashAdmissionSql,
    "q135_tokenizer_fertility" -> TextAnalytics.tokenizerFertilitySql,
    "q136_simhash_sweep"    -> Dedup.simhashSweepSql,
    "q137_epoch_capped_alloc" -> Sampling.epochCappedAllocationSql,
    "q138_cdc_dedup"        -> Dedup.cdcDedupSql,
    "q139_hll_union"        -> Sketches.hllUnionReportSql,
    "q140_source_embed_drift" -> ChatOracle.sourceEmbedDriftSql,
    "q141_dup_spectrum"     -> Dedup.dupSpectrumSql,
    "q142_stream_drift"     -> ChatOracle.docDriftSql,
    "q143_source_top_tokens" -> TextAnalytics.sourceTopTokensSql,
    "q144_neg_sampling"     -> Sampling.negativeSamplingTableSql,
    "q145_shared_runs"      -> Dedup.sharedRunPairsSql,
    "q146_cluster_cohesion" -> Dedup.clusterCohesionSql,
    "q147_anisotropy"       -> Similarity.anisotropyReportSql,
    "q148_phrase_scores"    -> TextAnalytics.phraseScoresSql,
    "q149_boilerplate_grams" -> Dedup.boilerplateGramsSql,
    "q150_simhash_bit_bias" -> Dedup.simhashBitBiasSql,
    "q151_audio_envelope"   -> Multimodal.audioEnvelopePairsSql,
    "q152_cross_source_matrix" -> Dedup.crossSourceMatrixSql,
    "q153_bm25_served"      -> TextAnalytics.bm25SearchSql,
    "q154_retrieval_eval"   -> Hybrid.retrievalEvalSql,
    "q155_consensus_clusters" -> Dedup.consensusClustersSql,
    "q156_byte_entropy"     -> TextAnalytics.byteEntropySql,
    "q157_small_cells"      -> TextAnalytics.smallCellsSql,
    "q158_dup_graph_walks"  -> Dedup.dupGraphWalksSql,
    "q159_dup_loss_weights" -> Dedup.dupLossWeightsSql,
    "q160_nprobe_sweep"     -> Similarity.nprobeSweepSql,
    "q161_training_triplets" -> Hybrid.trainingTripletsSql,
    "q162_source_lm_matrix" -> TextAnalytics.sourceLmMatrixSql,
    "q163_winnow_attribution" -> Dedup.winnowAttributionSql,
    "q164_stream_entropy"   -> TextAnalytics.byteEntropySql,
    "q165_graph_append"     -> Dedup.graphAppendSql,
    "q166_stream_graph_append" -> Dedup.graphAppendSql,
    "q167_composed_retrieve" -> ChatOracle.composedRetrieveSql,
    "q168_mmr_diversify"    -> Similarity.mmrDiversifySql,
    "q169_priority_sample"  -> Sampling.prioritySampleSql,
    "q170_graph_triangles"  -> Events.coVisitTrianglesSql,
    "q171_twonn_dim"        -> Similarity.twoNnDimSql,
    "q172_rm3_expansion"    -> TextAnalytics.rm3ExpansionSql,
    "q173_embed_outliers"   -> Similarity.embedOutliersSql,
    "q174_weighted_reservoir" -> Sampling.weightedReservoirSql,
    "q175_kn_xent"          -> TextAnalytics.knBigramXentSql,
    "q176_seq_patterns"     -> Events.seqPatternsSql,
    "q177_split_leakage"    -> Sampling.splitLeakageSql,
    "q178_pmi_collocations" -> TextAnalytics.pmiCollocationsSql,
    // the stream is row-identical to batch q174 by shared cores, so
    // one oracle serves both (the q164/q166 discipline)
    "q179_stream_reservoir" -> Sampling.weightedReservoirSql,
    "q180_admission_split_guard" -> Dedup.admissionSplitGuardSql,
    // row-identical to batch q180 by the shared splitGuardReport seam
    "q181_stream_split_guard" -> Dedup.admissionSplitGuardSql,
    "q182_heaps_law"        -> TextAnalytics.heapsLawSql,
    "q183_neyman_alloc"     -> Sampling.neymanAllocSql,
    "q184_audio_constellation" -> Multimodal.audioConstellationSql,
    "q185_folded_packing"   -> TextAnalytics.foldedPackingSql,
    "q186_curriculum"       -> TextAnalytics.curriculumScheduleSql,
    "q187_ann_leaf_skew"    -> Similarity.annLeafSkewSql,
    "q188_kanon_audit"      -> Privacy.kAnonAuditSql,
    "q189_dp_histogram"     -> Privacy.dpHistogramSql,
    "q190_fs_linkage"       -> Privacy.fsLinkageSql,
    "q191_mondrian"         -> Privacy.mondrianSql,
    "q192_kanon_admission"  -> Privacy.kAnonAdmissionSql,
    // q193 shares q192's oracle: class counts are order-independent
    // sums, so the unioned multi-batch wave is row-identical to batch
    "q193_stream_kanon_gate" -> Privacy.kAnonAdmissionSql,
    "q194_good_turing"      -> TextAnalytics.goodTuringSql,
    "q195_query_likelihood" -> TextAnalytics.queryLikelihoodSql,
    "q196_rank_agreement"   -> TextAnalytics.rankAgreementSql,
    "q197_ab_readout"       -> Events.abReadoutSql,
    "q198_cuped"            -> Events.cupedReadoutSql,
    // q199 shares q197's oracle: per-user goal counts are sums, so the
    // unioned multi-batch fold is row-identical to the batch readout
    "q199_stream_ab_monitor" -> Events.abReadoutSql,
    "q200_srm_guard"        -> Events.srmGuardSql,
    // q201's oracle is the pinned parity VALUES table: the Spark side
    // re-chunks the 12-language fixture corpus through the production
    // splitter; the DuckDB side holds the hand-verified expectation
    "q201_chunk_parity"     -> graft.ops.ChunkParity.chunkParitySql,
    // q202's oracle is the hand-derived token-id table (VALUES): the
    // Spark side runs the production WordPiece/BPE tokenizers over the
    // pinned toy vocabularies
    "q202_tokenizer_parity" -> graft.ops.TokenizerParity.tokenizerParitySql,
    // the served overlap reports are row-identical to their inline
    // detectors by shared counts + shared formula code (the q163/q164
    // shared-oracle discipline)
    "q203_jaccard_served"   -> Dedup.jaccardPairsSql,
    "q204_containment_served" -> Dedup.containmentPairsSql
  )
}
