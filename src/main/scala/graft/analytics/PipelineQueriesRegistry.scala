package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.{Mp4, Multimodal}
import graft.similarity.Ann
import graft.text.TextAnalysis
import graft.functions.Md5Hash.{duckH31, duckH60}

/** The Markov/burstiness/DoReMi/Bloom tail of the query defs plus the
  * single `queries` registry map — a PURE MOVE out of the former 17k-line PipelineQueries.scala
  * (round-10 verdict #4): same members, same order, no logic change.
  * Self-typed to the object so every cross-slab reference resolves
  * unqualified and initialization order is exactly the old file order. */
trait PipelineQueriesRegistry { this: PipelineQueries.type =>

  /** q309 constants, shared with the oracle: power-iteration rounds and
    * the fixed-point scale (micro units). */
  private[graft] val MkRounds = 6
  private[graft] val MkScale = 1000000L

  /** Markov stationary distribution (q309) — where user behavior
    * SETTLES: the long-run occupancy of the event-type transition chain
    * (q119's matrix), i.e. the attention budget each surface ultimately
    * commands regardless of entry point. Power iteration in exact micro
    * fixed point (floor per term, [[MkRounds]] rounds from uniform) over
    * the recurrent core (types that appear as a transition SOURCE;
    * edges into sink-only types are dropped and row sums recomputed, so
    * the matrix is stochastic for every type that keeps an out-edge).
    * Degenerate sources whose EVERY target is sink-only lose all their
    * edges in the restriction: they absorb mass during the iteration but
    * carry none forward, and are omitted from the output — the same
    * semantics as the oracle's inner `ty JOIN rs`.
    *
    * Scale shape: the corpus-sized work is q119's lead-window pair
    * stream (user-partitioned window — bounded per user) + one keyed
    * aggregate to the |types|² matrix; the iteration runs DRIVER-SIDE
    * on the collected result-sized matrix (the q274/q286 rule — frame
    * algebra would pay ~20 micro-jobs of scheduling for 8×8 math), so
    * the returned frame is literal with no surviving corpus lineage. */
  def markovStationary(spark: SparkSession, dir: String): DataFrame =
    markovStationaryOf(Tables.events(spark, dir))

  private[graft] def markovStationaryOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUserTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUserTime))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = pairs.map(_._1).distinct.sorted
    val core = pairs.filter(p => types.contains(p._2))
    val rowsum = core.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pi: Map[String, Long] = types.map(_ -> MkScale / types.size).toMap
    for (_ <- 1 to MkRounds)
      pi = types.map { j =>
        j -> core.filter(_._2 == j)
          .map { case (i, _, n) => pi(i) * n / rowsum(i) }.sum
      }.toMap
    val spark = events.sparkSession
    import spark.implicits._
    // Core-less sources (every out-edge targets a sink-only type) have no
    // rowsum entry: they keep absorbing mass during the iteration (the
    // oracle's LEFT JOIN does the same) but are DROPPED from the output,
    // matching the oracle's `ty JOIN rs` — previously this threw
    // NoSuchElementException where the oracle silently omitted the row.
    types.filter(rowsum.contains).map(t => (t, rowsum(t), pi(t))).toSeq
      .toDF("event_type", "n_out", "pi_micro")
      .orderBy(col("event_type"))
  }

  /** Traffic burstiness via the Fano factor (q310) — the
    * overdispersion test behind rate-limit sizing and bot triage
    * (q148 flags WHO is a bot; this says which event TYPES arrive in
    * bursts): for each type, the variance-to-mean ratio of hourly
    * counts over the full corpus hour span (empty hours count as
    * zeros through the span arithmetic — no row is ever materialized
    * for them). Poisson traffic lands ≈10000; bursty types land
    * higher. Exact integers: F×10⁴ = (N·Σc² − S²)·10⁴ div (N·S) with
    * Σc² in DECIMAL(38,0) (hourly counts square past BIGINT at
    * production volume).
    *
    * Scale shape: one scan → (type, hour) two-phase aggregate →
    * |types|-row fold joined to a 1-row broadcast span frame. Nothing
    * corpus-sized after the first aggregate. */
  def burstiness(spark: SparkSession, dir: String): DataFrame =
    burstinessOf(Tables.events(spark, dir))

  private[graft] def burstinessOf(events: DataFrame, seal: Boolean = true): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000L").as("hour_id"))
      .groupBy(col("event_type"), col("hour_id"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val span = hourly.agg(
      (max(col("hour_id")) - min(col("hour_id")) + 1L).as("n_span"))
    // Seal: ≤|types|-row card; releases the hourly-cell cache.
    sealIf(seal,
      
      hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_active_hours"),
          sum(col("c")).as("n_events"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("c2_sum"))
        .crossJoin(broadcast(span))
        .select(col("event_type"), col("n_events"), col("n_active_hours"),
          col("n_span"),
          expr("""CAST((n_span * c2_sum - CAST(n_events AS DECIMAL(38,0)) * n_events)
            |  * 10000 div (CAST(n_span AS DECIMAL(38,0)) * n_events) AS BIGINT)"""
            .stripMargin).as("fano_x10000"),
          expr("n_events * 100L div n_span").as("mean_per_hour_x100"))
        .orderBy(col("event_type")),
      hourly)
  }

  /** Shuffle-quality audit (q311) — does the training order actually
    * decorrelate sources? For two deterministic orderings of the corpus
    * — naive (source, doc_id) and hash-shuffled (h60(doc_id:shuffle),
    * doc_id) — measure the share of ADJACENT pairs drawn from the same
    * source, against the independence baseline Σ share² (what a
    * perfect shuffle converges to). The naive order lands ≈10000 (runs
    * of one source); a good shuffle lands at the baseline. This is the
    * acceptance test for any q291-style schedule before it feeds a
    * trainer (gradient noise is correlated exactly when adjacent
    * examples share a source).
    *
    * Scale shape: each ordering is ONE GlobalRank over slim
    * (key, doc_id, source) rows; adjacency is a rank⋈(rank+1) equi-join
    * (the q262 shape); the baseline is a ≤|sources|-row aggregate with
    * DECIMAL(38,0) share squares. Nothing is ever windowed
    * unpartitioned or collected. */
  def shuffleQuality(spark: SparkSession, dir: String): DataFrame =
    shuffleQualityOf(Tables.documents(spark, dir))

  private[graft] def shuffleQualityOf(docs: DataFrame, seal: Boolean = true): DataFrame = {
    import graft.functions.PortableHashFunctions.md5_token_hashes
    import graft.operators.GlobalRank.rowNumber
    val slim = docs.select(col("doc_id"), col("source"),
      md5_token_hashes(array(concat(col("doc_id").cast("string"), lit(":shuffle"))), 60)
        .getItem(0).as("hk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTotal = slim.agg(count(lit(1)).as("n"))
    val baseline = slim.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      .crossJoin(broadcast(nTotal))
      .agg(expr("""CAST(sum(CAST(ns AS DECIMAL(38,0)) * ns) * 10000
        |  div (CAST(max(n) AS DECIMAL(38,0)) * max(n)) AS BIGINT)""".stripMargin)
        .as("baseline_bp"))
    val caches = scala.collection.mutable.ArrayBuffer[DataFrame](slim)
    def adjacency(order: Seq[org.apache.spark.sql.Column], name: String): DataFrame = {
      val ranked = rowNumber(slim, order, "rk")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      caches += ranked
      ranked.select(col("rk"), col("source").as("src_a"))
        .join(ranked.select((col("rk") - 1L).as("rk"), col("source").as("src_b")),
          Seq("rk"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("src_a") === col("src_b"), 1L).otherwise(0L)).as("n_same"))
        .select(lit(name).as("ordering"), col("n_pairs"), col("n_same"),
          expr("n_same * 10000L div n_pairs").as("same_source_bp"))
    }
    // Seal: 2-row card; releases slim + both ranked caches.
    sealIf(seal,
      
      adjacency(Seq(col("source").asc, col("doc_id").asc), "naive")
        .unionByName(adjacency(Seq(col("hk").asc, col("doc_id").asc), "shuffled"))
        .crossJoin(broadcast(baseline))
        .orderBy(col("ordering")),
      caches.toSeq: _*)
  }

  /** q312 excess-surprisal cap (Q8.8) — bounds the exp2 shift, shared
    * with the oracle. */
  private[graft] val DoremiCapQ8 = 2048L

  /** DoReMi-style mixture reweighting (q312) — closing the q304 → q251
    * loop: a domain the reference LM finds SURPRISING is the domain the
    * next training round should upweight (the DoReMi intuition, with
    * the proxy-model excess loss replaced by q304's exact Q8.8 bigram
    * surprisal). Weight ∝ 2^(excess), where excess = source mean
    * surprisal − corpus-min source mean, capped at [[DoremiCapQ8]];
    * exp2 is EXACT integer arithmetic ((256 + frac) ≪ int — the q304
    * log₂'s inverse, same linear-mantissa convention), so the emitted
    * mixture shares are hash-checked.
    *
    * Scale shape: one q304 scoring pass → a ≤|sources|-row mean frame
    * (persisted — min frame + weights both read it); everything after
    * is metadata arithmetic with 1-row broadcasts. */
  def doremiMix(spark: SparkSession, dir: String): DataFrame =
    doremiMixOf(Tables.documents(spark, dir), Some(pplModelMemo(spark, dir)))

  private[graft] def doremiMixOf(docs: DataFrame,
      memoModel: Option[(DataFrame, DataFrame)] = None,
      seal: Boolean = true): DataFrame = {
    val (model, ctx) = memoModel.getOrElse(pplModel(docs))
    val perSrc = pplScore(docs, model, ctx)
      .groupBy(col("source"))
      .agg(sum(col("s_sum")).as("ss"), sum(col("nbg")).as("nn"))
      .select(col("source"), expr("ss div nn").as("avg_q8"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val minAvg = perSrc.agg(min(col("avg_q8")).as("min_q8"))
    val w = perSrc.crossJoin(broadcast(minAvg))
      .withColumn("excess_q8",
        least(col("avg_q8") - col("min_q8"), lit(DoremiCapQ8)))
      .withColumn("w_raw",
        expr("shiftleft(256 + excess_q8 % 256, CAST(excess_q8 div 256 AS INT))"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = w.agg(sum(col("w_raw")).as("wt"))
    // Seal: ≤|sources|-row mixture; releases both per-call caches (the
    // memoized LM frames are session-owned and NOT touched).
    sealIf(seal,
      
      w.crossJoin(broadcast(tot))
        .select(col("source"), col("avg_q8"), col("excess_q8"), col("w_raw"),
          expr("w_raw * 10000L div wt").as("mix_bp"))
        .orderBy(col("source")),
      perSrc, w)
  }

  /** q315 constants, shared with the oracle: the 1%-FPR sizing rule
    * (ln(1/p)/ln²2 = 9.5699 bits/key as the DEFINED integer literal
    * 95699/10⁴ — no float anywhere), k = 7 hash functions (the optimal
    * ⌈m/n·ln2⌉ at 1%), and the derived probe-set size. */
  private[graft] val BfBitsPerKeyX10000 = 95699L
  private[graft] val BfK = 7
  private[graft] val BfProbes = 1000L

  /** Bloom-filter sizing advisor (q315) — the capacity-planning card
    * behind every Bloom deployment in the repo (the q84/q100 snapshot
    * filters, q238's join pruning): per source, the exact distinct-doc
    * count, the advised bit budget at 1% FPR, the power-of-two filter
    * actually allocated (next-pow2 via the bin()-length idiom), its
    * measured occupancy — and the MEASURED false-positive rate against
    * a deterministic 1000-string non-member probe set, because a sizing
    * rule that is never validated against the filter it sized is a
    * guess. Every position is a portable h60 mod the pow2 size, so the
    * whole filter (bit set, occupancy, probe verdicts) replays in
    * DuckDB and the card is hash-checked.
    *
    * Scale shape: member positions explode k·|distinct docs| rows and
    * two-phase-distinct to ≤ filter bits per source; the sizing frame
    * is catalog-sized and broadcasts into the constant-size probe
    * explode (|sources|·1000·k rows); the FP verdict is one
    * (source, pos)-keyed semi-ish join + a probe-keyed count. Nothing
    * corpus-sized crosses an exchange after the distinct. */
  def bloomAdvisor(spark: SparkSession, dir: String): DataFrame =
    bloomAdvisorOf(Tables.documents(spark, dir))

  private[graft] def bloomAdvisorOf(docs: DataFrame, seal: Boolean = true): DataFrame = {
    import graft.functions.PortableHashFunctions.md5_token_hashes
    val members = docs.select(col("source"), col("text")).distinct()
    val sizing = members.groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct"))
      .withColumn("advised_bits",
        expr(s"n_distinct * $BfBitsPerKeyX10000 div 10000 + 1"))
      .withColumn("m2", expr("shiftleft(1L, length(bin(advised_bits - 1)))"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def positions(d: DataFrame, keyCol: String) = d
      .select(col("source"), col("m2"), col(keyCol).as("k"),
        explode(expr(s"sequence(0, ${BfK - 1})")).as("p"))
      .select(col("source"), col("k"),
        md5_token_hashes(
          array(concat(col("k"), lit(":bf"), col("p").cast("string"))), 60)
          .getItem(0).mod(col("m2")).as("pos"))
    val bits = positions(members.join(broadcast(sizing), Seq("source")), "text")
      .select(col("source"), col("pos")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val occupancy = bits.groupBy(col("source")).agg(count(lit(1)).as("bits_set"))
    val probes = positions(
      sizing.select(col("source"), col("m2"),
        explode(expr(s"transform(sequence(1, $BfProbes), j -> concat('probe:', j))"))
          .as("pk")),
      "pk")
    val fp = probes
      .join(bits.withColumn("hit", lit(1L)), Seq("source", "pos"), "left")
      .groupBy(col("source"), col("k"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .groupBy(col("source"))
      .agg(sum(when(col("hits") === BfK, 1L).otherwise(0L)).as("n_fp"))
    // Seal: ≤|sources|-row advisory; releases the sizing + bit-set caches.
    sealIf(seal,
      
      sizing
        .join(occupancy, Seq("source"))
        .join(fp, Seq("source"))
        .select(col("source"), col("n_distinct"), col("advised_bits"), col("m2"),
          expr("bits_set * 10000L div m2").as("occupancy_bp"),
          expr(s"n_fp * 10000L div $BfProbes").as("measured_fpr_bp"))
        .orderBy(col("source")),
      sizing, bits)
  }

  // ---------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_dedup_exact" -> (dedupExact _),
    "q26_dedup_tokenset" -> (dedupTokenSet _),
    "q27_minhash_neardup" -> (minhashNearDup _),
    "q28_ngram_blocked_jaccard" -> (ngramBlockedJaccard _),
    "q29_minhash_signatures" -> (minhashSignatures _),
    "q30_simhash" -> (simhashFingerprints _),
    "q31_simhash_pairs" -> (simhashClosePairs _),
    "q32_embed_neardup" -> (embeddingNearDup _),
    "q33_ann_brute" -> (annBruteForce _),
    "q34_ann_lsh" -> (annLsh _),
    "q35_text_tokens" -> (textTokens _),
    "q36_text_quality" -> (textQuality _),
    "q37_quality_score" -> (textQualityScore _),
    "q38_langid" -> (langIdConfusion _),
    "q39_fingerprint_md5" -> (fingerprintMd5 _),
    "q40_fingerprint_rolling" -> (fingerprintRolling _),
    "q41_multimodal_features" -> (multimodalFeatures _),
    "q42_approx_distinct" -> (approxDistinct _),
    "q49_ann_ivf" -> (annIvf _),
    "q50_frame_samples" -> (frameSamples _),
    "q51_percentiles" -> (percentiles _),
    "q55_dedup_assignments" -> (dedupAssignments _),
    "q56_neardup_clusters" -> (nearDupClusters _),
    "q57_curation_report" -> (curationReport _),
    "q59_token_budget_sample" -> ((s: SparkSession, d: String) => tokenBudgetSample(s, d)),
    "q60_dataset_split" -> (datasetSplit _),
    "q61_repetition" -> (repetitionMetrics _),
    "q62_decontamination" -> (decontamination _),
    "q64_repeated_ngrams" -> ((s: SparkSession, d: String) => repeatedNgrams(s, d)),
    "q65_pii_redaction" -> (piiRedaction _),
    "q67_stratified_sample" -> (stratifiedSample _),
    "q69_approx_quantiles" -> (approxQuantiles _),
    "q70_embed_quantize" -> (embeddingQuantization _),
    "q71_embed_norms" -> (embeddingNorms _),
    "q72_token_packing" -> ((s: SparkSession, d: String) => tokenPacking(s, d)),
    "q73_ngram_contamination" -> ((s: SparkSession, d: String) => ngramContamination(s, d)),
    "q74_token_chunks" -> ((s: SparkSession, d: String) => tokenChunks(s, d)),
    "q75_bucketed_join" -> (bucketedJoinAgg _),
    "q76_pq_codes" -> (pqCodes _),
    "q77_domain_mix" -> (domainMix _),
    "q78_semdedup" -> (semDedup _),
    "q79_heavy_hitters" -> ((s: SparkSession, d: String) => heavyHitters(s, d)),
    "q80_ann_ivfpq" -> (annIvfPq _),
    "q81_ann_ivfpq_residual" -> (annIvfPqResidual _),
    "q82_pq_trained_claim" -> (pqTrainedClaim _),
    "q83_curation_v2" -> (curationV2 _),
    "q84_incremental_dedup" -> (incrementalDedup _),
    "q85_source_reputation" -> (sourceReputation _),
    "q86_kmeans_inertia" -> (kmeansInertia _),
    "q87_quality_gate" -> (qualityGate _),
    "q88_ann_recall" -> (annRecallAudit _),
    "q98_ann_indexed" -> (annIndexed _),
    "q99_compaction_publish" -> (compactionPublish _),
    "q100_stream_ingest_dedup" -> (streamingIncrementalDedup _),
    "q101_ann_index_append" -> (annIndexedAppend _),
    "q102_training_shards" -> (trainingShards _),
    "q103_range_boundaries" -> (rangeBoundaries _),
    "q104_snapshot_diff" -> (snapshotDiff _),
    "q105_zorder_layout" -> (zorderLayout _),
    "q106_scd2_merge" -> (scd2Merge _),
    "q107_skew_audit" -> (skewAudit _),
    "q108_mix_temperature" -> (mixTemperature _),
    "q109_posting_lists" -> (postingLists _),
    "q110_tfidf_topk" -> (tfidfTopk _),
    "q111_bpe_pairs" -> (bpePairs _),
    "q112_grouping_sets" -> (groupingSetsAgg _),
    "q113_weighted_median" -> (weightedMedian _),
    "q114_edit_distance_audit" -> (editDistanceAudit _),
    "q115_cluster_keeper" -> (clusterKeeper _),
    "q116_ann_index_delete" -> (annIndexedDelete _),
    "q117_exact_gram_dedup" -> (exactGramDedup _),
    "q118_weighted_sample" -> (weightedSample _),
    "q119_event_transitions" -> (eventTransitions _),
    "q121_kmv_overlap" -> (kmvOverlap _),
    "q122_source_cap" -> (sourceCap _),
    "q123_embedding_drift" -> (embeddingDrift _),
    "q124_incremental_rollup" -> (incrementalRollup _),
    "q125_ann_nprobe_sweep" -> (annNprobeSweep _),
    "q126_bm25_topk" -> (bm25Topk _),
    "q127_rrf_fusion" -> (rrfFusion _),
    "q128_event_anomaly" -> (eventRateAnomaly _),
    "q129_vocab_coverage" -> (vocabCoverage _),
    "q130_table_stats" -> (tableStats _),
    "q131_lsh_banding_sweep" -> (lshBandingSweep _),
    "q132_journey_paths" -> (journeyPaths _),
    "q133_cooccurrence_lift" -> (cooccurrenceLift _),
    "q134_mrl_recall_sweep" -> (mrlRecallSweep _),
    "q135_incremental_stats" -> (incrementalStats _),
    "q136_conversion_funnel" -> (conversionWindowFunnel _),
    "q137_rolling_active" -> (rollingActiveUsers _),
    "q138_fk_integrity" -> (fkIntegrityAudit _),
    "q139_pagerank" -> (pageRankPurchases _),
    "q140_entity_resolution" -> (entityResolution _),
    "q141_k_anonymity" -> (kAnonymityAudit _),
    "q142_semantic_decontam" -> (semanticDecontamination _),
    "q143_mad_outliers" -> (madOutliers _),
    "q144_equal_freq_bins" -> (equalFreqBins _),
    "q145_ab_experiment" -> (abExperiment _),
    "q146_idf_quality" -> (idfQuality _),
    "q147_doc_containment" -> (docContainment _),
    "q148_bot_detection" -> (botDetection _),
    "q149_label_communities" -> (labelCommunities _),
    "q150_token_concentration" -> (tokenConcentration _),
    "q153_phrase_search" -> (phraseSearch _),
    "q154_copurchase" -> (coPurchase _),
    "q155_survival_hazard" -> (survivalHazard _),
    "q156_funnel3" -> (funnelThreeStep _),
    "q157_mutual_nn" -> (mutualNn _),
    "q158_ohlc_bars" -> (ohlcBars _),
    "q159_source_diversity" -> (sourceDiversity _),
    "q162_recs_backtest" -> (recsBacktest _),
    "q163_daily_correlation" -> (dailyCorrelation _),
    "q164_value_drift" -> (valueDrift _),
    "q165_seasonality" -> (seasonalityProfile _),
    "q166_session_export" -> (sessionExport _),
    "q167_gdpr_purge" -> (gdprPurge _),
    "q168_rfm_scores" -> (rfmScores _),
    "q169_activity_streaks" -> (activityStreaks _),
    "q170_knn_label_eval" -> (knnLabelEval _),
    "q171_sliding_hll_wau" -> (slidingHllWau _),
    "q172_ab_funnel" -> (abFunnel _),
    "q173_ship_lag" -> (shipLag _),
    "q174_expectations" -> (expectationSuite _),
    "q175_market_share" -> (marketShare _),
    "q176_rank_movement" -> (revenueRankMovement _),
    "q177_triangles" -> (triangleCensus _),
    "q178_cusum" -> (cusumChangepoint _),
    "q179_large_orders" -> (largeOrders _),
    "q180_stats_drift" -> (statsDrift _),
    "q181_centroid_outliers" -> (centroidOutliers _),
    "q182_bpe_merge_round" -> (bpeMergeRound _),
    "q183_order_reconciliation" -> (orderReconciliation _),
    "q184_zonemap_audit" -> (zoneMapAudit _),
    "q185_revenue_concentration" -> (revenueConcentration _),
    "q186_bigram_fluency" -> (bigramFluency _),
    "q187_promo_share" -> (promoShare _),
    "q188_power_iteration" -> (powerIteration _),
    "q189_watermark_audit" -> (watermarkAudit _),
    "q190_degree_profile" -> (degreeProfile _),
    "q191_join_size_estimate" -> (joinSizeEstimate _),
    "q192_moment_stats" -> (momentStats _),
    "q193_quantile_accuracy" -> (quantileAccuracy _),
    "q194_peak_concurrency" -> (peakConcurrency _),
    "q195_kcore_peeling" -> (kCorePeeling _),
    "q196_pit_loyalty" -> (pitLoyalty _),
    "q197_batch_padding" -> (batchPadding _),
    "q198_bootstrap_ci" -> (bootstrapCi _),
    "q199_vocab_curve" -> (vocabSizeCurve _),
    "q200_stream_fuzzy_dedup" -> (streamingFuzzyDedup _),
    "q201_slo_burn_rate" -> (sloBurnRate _),
    "q202_pixel_packing" -> (pixelPacking _),
    "q203_context_assembly" -> (contextAssembly _),
    "q204_ann_filtered" -> (annFiltered _),
    "q205_khop_reach" -> (kHopReachability _),
    "q206_incremental_view" -> (incrementalView _),
    "q207_skyline" -> (skyline _),
    "q208_uncertainty_sample" -> (uncertaintySample _),
    "q209_whitening_stats" -> (whiteningStats _),
    "q210_hll_intersection" -> (hllIntersection _),
    "q211_path_likelihood" -> (pathLikelihood _),
    "q212_clustering_factor" -> (clusteringFactor _),
    "q213_histogram_accuracy" -> (histogramAccuracy _),
    "q214_neardup_diff" -> (nearDupDiff _),
    "q215_independence_test" -> (independenceTest _),
    "q216_priority_returns" -> (priorityReturns _),
    "q217_token_keyness" -> (tokenKeyness _),
    "q218_mp4_metadata" -> (mp4Metadata _),
    "q219_image_headers" -> (imageHeaders _),
    "q220_hard_negatives" -> (hardNegatives _),
    "q221_sorted_neighborhood" -> (sortedNeighborhood _),
    "q222_filter_ablation" -> (filterAblation _),
    "q223_dedup_funnel" -> (dedupFunnel _),
    "q224_ann_binary_quant" -> (annBinaryQuant _),
    "q225_recursive_hierarchy" -> (recursiveHierarchy _),
    "q226_ks_drift" -> (ksDrift _),
    "q227_kcenter_seeds" -> (kcenterSeeds _),
    "q228_variant_extract" -> (variantExtract _),
    "q229_bitmap_membership" -> (bitmapMembership _),
    "q230_minhash_union" -> (minhashUnion _),
    "q231_maxsim_retrieval" -> (maxsimRetrieval _),
    "q232_simhash_pr_sweep" -> (simhashPrSweep _),
    "q233_jsonl_corrupt_audit" -> (jsonlCorruptAudit _),
    "q234_retrieval_eval" -> (retrievalEval _),
    "q235_prefix_filter_join" -> (prefixFilterJoin _),
    "q236_encoding_audit" -> (encodingAudit _),
    "q237_shard_rebalance" -> (shardRebalance _),
    "q238_bloom_join_prune" -> (bloomJoinPrune _),
    "q239_global_rank" -> (globalRankQuery _),
    "q240_online_semdedup" -> (onlineSemDedup _),
    "q241_exact_quantiles" -> (exactQuantiles _),
    "q242_salt_sweep" -> (saltSweepAudit _),
    "q243_trigram_search" -> (trigramSearch _),
    "q244_benford_audit" -> (benfordAudit _),
    "q245_modularity" -> (modularityScore _),
    "q246_schema_evolution" -> (schemaEvolution _),
    "q247_source_dup_matrix" -> (sourceDupMatrix _),
    "q248_cell_balance" -> (cellBalanceAudit _),
    "q249_ngram_novelty" -> (ngramNovelty _),
    "q250_pq_recon_error" -> (pqReconError _),
    "q251_mix_allocation" -> (mixAllocation _),
    "q252_labeler_agreement" -> (labelerAgreement _),
    "q253_repeat_spans" -> (maximalRepeatSpans _),
    "q254_committed_admission" -> (committedSemDedupAdmission _),
    "q255_bpe_encode" -> (bpeEncode _),
    "q256_sig_compaction" -> (sigStoreCompaction _),
    "q257_dsir_selection" -> (dsirSelection _),
    "q258_cdc_chunks" -> (cdcChunkDedup _),
    "q259_split_leakage" -> (splitLeakage _),
    "q260_leak_quarantine" -> (leakQuarantine _),
    "q261_classifier_scores" -> (classifierScores _),
    "q262_locality_layout" -> (localityLayout _),
    "q263_stratified_quota" -> (exactStratifiedQuota _),
    "q264_score_store" -> (scoreStoreIncremental _),
    "q265_repeat_allocation" -> (repeatAllocation _),
    "q266_behavior_examples" -> (behaviorExamples _),
    "q267_stream_behavior" -> (streamBehaviorExamples _),
    "q268_stratum_quantiles" -> (stratumQuantiles _),
    "q269_ips_policy_eval" -> (ipsPolicyEval _),
    "q270_segment_boilerplate" -> (segmentBoilerplate _),
    "q271_winnowing_pairs" -> (winnowingPairs _),
    "q272_score_calibration" -> (scoreCalibration _),
    "q273_context_branching" -> (contextBranching _),
    "q274_bradley_terry" -> (bradleyTerry _),
    "q275_length_bias" -> (lengthBias _),
    "q276_jl_distortion" -> (jlDistortion _),
    "q277_boiler_store" -> (boilerStoreIncremental _),
    "q278_chunk_reassembly" -> (chunkReassembly _),
    "q279_span_corruption" -> (spanCorruption _),
    "q280_template_positions" -> (templatePositions _),
    "q281_label_aggregation" -> (labelAggregation _),
    "q282_stream_boiler_gate" -> (streamBoilerGate _),
    "q283_borda_fusion" -> (bordaFusion _),
    "q284_epoch_schedule" -> (epochSchedule _),
    "q285_normalization_audit" -> (normalizationAudit _),
    "q286_pca_power" -> (pcaPower _),
    "q287_decayed_hitters" -> (decayedHitters _),
    "q288_lpt_makespan" -> (lptMakespan _),
    "q289_bitext_mining" -> (bitextMining _),
    "q290_cluster_safe_split" -> (clusterSafeSplit _),
    "q291_interleave_schedule" -> (interleaveSchedule _),
    "q292_merkle_diff" -> (merkleDiff _),
    "q293_stream_trender" -> (streamTrender _),
    "q294_fim_assembly" -> (fimAssembly _),
    "q295_multiprobe_lsh" -> (multiProbeLsh _),
    "q296_kmv_difference" -> (kmvDifference _),
    "q297_median_binary_quant" -> (medianBinaryQuant _),
    "q298_temporal_split" -> (temporalSplit _),
    "q299_concat_chunking" -> (concatChunking _),
    "q300_soft_dedup" -> (softDedupWeights _),
    "q301_preference_pairs" -> (preferencePairs _),
    "q302_loss_mask" -> (lossMaskCard _),
    "q303_source_gini" -> (sourceGini _),
    "q304_perplexity_filter" -> (perplexityFilter _),
    "q305_token_pmi" -> (tokenPmi _),
    "q306_source_datasheet" -> (sourceDatasheet _),
    "q307_stream_ppl_gate" -> (streamPerplexityGate _),
    "q308_backoff_lm" -> (backoffLm _),
    "q309_markov_stationary" -> (markovStationary _),
    "q310_burstiness" -> (burstiness _),
    "q311_shuffle_quality" -> (shuffleQuality _),
    "q312_doremi_mix" -> (doremiMix _),
    "q313_ir_ndcg" -> (irNdcg _),
    "q314_hyperball" -> (hyperBall _),
    "q315_bloom_advisor" -> (bloomAdvisor _),
    "q316_hyperball_distance" -> (hyperBallDistance _),
    "q317_curation_dag" -> (curationDagAudit _),
    "q318_harmonic_centrality" -> (harmonicCentrality _),
    "q319_lin_centrality" -> (linCentrality _),
    "q320_closeness_centrality" -> (closenessCentrality _))

  // --- oracle SQL builders for the portable-hash family ---------------------

  import graft.functions.Md5Hash.{duckH31, duckH60}

  /** The k (sig_idx, a, b) permutation params as a DuckDB VALUES list —
    * generated from the same MinHashParams the Spark expression uses, so
    * the oracle can never drift from the engine. */
  private[analytics] def minhashParamValues: String = {
    val p = Dedup.MinHashParams()
    (0 until p.k)
      .map(i => s"($i, ${p.as(i)}::BIGINT, ${p.bs(i)}::BIGINT)")
      .mkString(", ")
  }

  /** DuckDB SQL for the q270 boilerplate card over an arbitrary
    * (doc_id, source, text) corpus expression — shared by q270 (the raw
    * documents table) and q277 (documents ∪ the ingest batch). */
  private[analytics] def boilerCardSql(corpusSql: String): String = {
    val k = BoilerSegTokens
    s"""WITH corpus AS ($corpusSql),
       |t AS (SELECT doc_id, source, str_split(text, ' ') AS toks FROM corpus),
       |c AS (SELECT doc_id, source,
       |    array_to_string(toks[(CAST(g AS INT)*$k + 1):(CAST(g AS INT)*$k + $k)], ' ') AS seg
       |  FROM t, UNNEST(range(CAST(floor(len(toks) / $k) AS BIGINT))) AS u(g)),
       |h AS (SELECT doc_id, source, ${duckH60("seg")} AS segh FROM c),
       |f AS (SELECT segh, COUNT(DISTINCT doc_id) AS doc_freq FROM h GROUP BY 1),
       |j AS (SELECT h.source, h.segh, f.doc_freq FROM h JOIN f USING (segh))
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_segments,
       |  CAST(SUM(CASE WHEN doc_freq >= $BoilerMinDocs THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_boiler_instances,
       |  CAST(SUM(CASE WHEN doc_freq >= $BoilerMinDocs THEN 1 ELSE 0 END) * 10000
       |    // COUNT(*) AS BIGINT) AS boiler_share_bp,
       |  CAST(COUNT(DISTINCT CASE WHEN doc_freq >= $BoilerMinDocs THEN segh END) AS BIGINT)
       |    AS n_boiler_segments
       |FROM j GROUP BY source ORDER BY source""".stripMargin
  }

  /** DuckDB SQL for the portable 60-bit simhash per document:
    * (doc_id, sig) — shared by the q30 and q31 oracles. */
  private[analytics] def duckSimhash: String =
    s"""h AS (SELECT doc_id, list_transform(str_split(text, ' '), tok -> ${duckH60("tok")}) AS hs FROM documents),
       |b AS (SELECT doc_id, j,
       |  CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN ((x >> j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
       |       THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END AS bitv
       |  FROM h, (SELECT unnest(range(0, 60)) AS j)),
       |s AS (SELECT doc_id, CAST(SUM(bitv) AS BIGINT) AS sig FROM b GROUP BY doc_id)""".stripMargin

  /** DuckDB predicate mirroring Dedup.simhashBandKeys' Manku 6-choose-3
    * candidate test — generated from the SAME block constants, so the
    * Spark banding and the oracle's agree by construction. */
  private[analytics] def duckSimhashBandCond: String = {
    val bits = Dedup.SimhashBlockBits
    val mask = (1L << bits) - 1
    Dedup.SimhashBandSubsets
      .map(_.map(b => s"((a.sig >> ${b * bits}) & $mask) = ((b.sig >> ${b * bits}) & $mask)")
        .mkString("(", " AND ", ")"))
      .mkString("\n   OR ")
  }

  /** DuckDB SQL replicating the langId argmax: packed hits*256+idx reduced
    * with GREATEST — generated from StopwordProfiles so both engines score
    * the exact same token lists in the exact same tie-break order. */
  private[analytics] def duckLangIdBest: String = {
    val packed = TextAnalysis.LangIdLangs.zipWithIndex.map { case (l, i) =>
      val words = TextAnalysis.StopwordProfiles(l).map(w => s"'$w'").mkString(", ")
      s"len(list_intersect(toks, [$words]))*256 + $i"
    }
    s"GREATEST(${packed.mkString(",\n  ")})"
  }

  private[analytics] def duckLangIdDecode: String = {
    val cases = TextAnalysis.LangIdLangs.zipWithIndex
      .map { case (l, i) => s"WHEN best % 256 = $i THEN '$l'" }
      .mkString(" ")
    s"CASE WHEN best < 256 THEN 'und' $cases END"
  }

}
