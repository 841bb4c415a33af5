package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-executor evidence: everything else in the repo runs `local[n]`,
  * where driver and executors share one JVM — a closure that accidentally
  * captures driver-side mutable state, a non-serializable expression, or
  * a task that only works because it sees the driver's heap would pass
  * every suite and fail on a real cluster. `local-cluster[2,2,2048]`
  * launches two SEPARATE executor JVMs (real worker processes from
  * SPARK_HOME, our classes shipped via executor extraClassPath), so
  * closures genuinely serialize, broadcasts genuinely transfer, and
  * shuffle blocks genuinely cross process boundaries.
  *
  * The query set is chosen for serialization surface, one per family:
  * codegen aggregate (q01), custom portable-hash expressions + LSH
  * banding with memoized tiers (q27), typed TopKAggregator + broadcast
  * codebooks (q80), expression-carried k-means centroids (q86), seeded
  * epoch sharding (q102), the SCD2 merge's full-outer + explode
  * (q106), and the two session-memo shapes added in round 6 — the
  * banding sweep's persisted signature matrix + broadcast verified
  * pairs (q131) and the shared incidence cache + date fan-out (q137):
  * persisted partitions live ON the executors here, so a cache that
  * only worked because storage and driver shared a heap would diverge.
  * The continuation session adds three more: iterative fixed-point
  * PageRank over a persisted src-partitioned edge list (q139 — each
  * iteration's join reads executor-resident cache blocks), the
  * broadcast phrase frame + positional-postings intersection (q153),
  * and the recommendation backtest's window/anti-join/explode chain
  * (q162). Content hashes must equal a plain `local[4]` run in the same
  * JVM (contexts run sequentially, as in [[SpillCheck]]).
  *
  * A standalone main: the master URL is fixed at context creation. Run:
  *   SPARK_SCALA_VERSION=2.13 sbt "runMain graft.tools.ClusterCheck /root/testdata/sf0.001"
  * — prints `[clustercheck] OK ...`; non-zero exit on mismatch. The env
  * var is required: the local-cluster worker launcher shells into
  * SPARK_HOME/bin scripts, which cannot infer the Scala version when
  * both jars/ and classes dirs are on the launcher classpath.
  */
object ClusterCheck {
  private val Queries = Seq(
    "q01_pricing_summary", "q27_minhash_neardup", "q80_ann_ivfpq",
    "q86_kmeans_inertia", "q102_training_shards", "q106_scd2_merge",
    "q131_lsh_banding_sweep", "q137_rolling_active",
    "q139_pagerank", "q153_phrase_search", "q162_recs_backtest",
    // This session's additions: the degree-ordered wedge/semi-join chain
    // over the shared edge memo (q177 — executor-resident cache blocks
    // feed three consumers), the driver-looped integer matvec with
    // in-expression v literals (q188 — 64-term codegen per round), and
    // the keyed bounded top-k with a broadcast threshold frame (q208).
    "q177_triangles", "q188_power_iteration", "q208_uncertainty_sample",
    // Round-7 additions: the codes-only Hamming broadcast + typed top-k
    // rerank chain (q224 — sign-bit words and candidate lists cross real
    // process boundaries), the word-sharded bitmap memo feeding three
    // consumers from executor-resident cache (q229), and the typed
    // mapPartitions container round-trip (q218 — the Mp4 builder/parser
    // closures must serialize to worker JVMs).
    "q218_mp4_metadata", "q224_ann_binary_quant", "q229_bitmap_membership",
    // Round-8 additions: the set-collapse prefix join's persisted
    // sets/members hubs feeding five lineage branches from
    // executor-resident cache (q235), GlobalRank's range exchange +
    // spark_partition_id block ranks (q239 — pid semantics must hold
    // when partitions live in separate worker JVMs), and the online
    // SemDedup wave recursion over per-wave persisted frames (q240).
    "q235_prefix_filter_join", "q239_global_rank", "q240_online_semdedup",
    // Round-10 additions (round-8 verdict #7): the two audits that read
    // the COMMITTED IVFPQ layout from executor JVMs — cell-balance
    // occupancy (q248) and reconstruction error (q250) are the queries
    // most likely to break if the on-disk layout or its broadcast
    // codebooks don't survive a real process boundary — plus the new
    // range-sharded prefix-max dominance pass (q207: pid carry-in
    // offsets must hold across worker JVMs, the q239 argument).
    "q207_skyline", "q248_cell_balance", "q250_pq_recon_error",
    // Round-10 batch-3 additions: the ExactSubstr gram-island chain
    // (q253 — semi join + doc-windows across workers), DSIR's memoized
    // bigram stream feeding three consumers from executor-resident
    // cache plus a GlobalRank quota rank (q257), and the CDC chunk
    // pipeline's window→reuse-exchange→hash-keyed dedup (q258).
    "q253_repeat_spans", "q257_dsir_selection", "q258_cdc_chunks",
    // Round-10 continuation: the map-only classifier fold (q261 — the
    // four-field bit unpack and argmax CASE run entirely in executor
    // codegen), the double-GlobalRank adjacency join (q262 — two
    // independent range exchanges whose pid block ranks must agree
    // across worker JVMs before the rank⋈rank+1 join lines up), and the
    // composite-key stratified quota (q263 — broadcast stratum offsets
    // against executor-resident ranked blocks).
    "q261_classifier_scores", "q262_locality_layout", "q263_stratified_quota",
    // ...and the digest-synced score store lifecycle (q264 — partition
    // slices score in executor JVMs and publish by direct path; the
    // driver-side digest diff must still confine the second sync), plus
    // the stratum-quantile order-statistic extraction (q268 — broadcast
    // decile targets probing executor-resident ranked blocks).
    "q264_score_store", "q268_stratum_quantiles",
    // Round-10 session additions: the incremental boilerplate store
    // (q277 — partial aggregates computed in executor JVMs per corpus
    // partition, merged from the committed sidecar: the store-partial
    // soundness argument only holds if partition slices really are
    // disjoint across processes), the positional seam join (q278 —
    // head-window explode + 60-bit seam-hash shuffle across workers),
    // and the JL panel broadcast (q276 — a limit-bounded build side
    // crossing a real process boundary into the BNLJ).
    "q276_jl_distortion", "q277_boiler_store", "q278_chunk_reassembly",
    // Continuation batch-2 additions: the quadruple-GlobalRank Borda
    // fusion (q283 — four independent range exchanges whose pid block
    // ranks and broadcast offsets must all agree across worker JVMs
    // before the fused rank lines up), the cluster-safe split's leak
    // contrast over the memoized tier outputs (q290 — executor-resident
    // cluster cache feeding three aggregate consumers), and the stride
    // interleave schedule (q291 — two chained GlobalRanks where the
    // second ranks a frame derived from the first's broadcast offsets).
    "q283_borda_fusion", "q290_cluster_safe_split", "q291_interleave_schedule",
    // ...and the two new ANN stages whose state must survive a real
    // process boundary: the multi-probe card (q295 — the new
    // HyperplaneProbes expression's plane matrix serializes into worker
    // JVMs alongside both broadcast probe frames) and the
    // median-threshold quantizer (q297 — collected medians baked as
    // expression literals + a (dim, f) GlobalRank whose pid offsets
    // must agree across executors).
    "q295_multiprobe_lsh", "q297_median_binary_quant",
    // Continuation batch-4 additions: the sharded exclusive prefix sum
    // (q299 — GlobalRank.prefixSum's pid-local ROWS sums + broadcast
    // carry-ins must agree across worker JVMs, the q239/q207 argument
    // applied to SUM), the reflected-rank preference pairing (q301 —
    // one GlobalRank + a rank-keyed self-join whose two sides live on
    // different executors), and the broadcast bucket-LM scoring pass
    // (q304 — four bounded LM frames crossing real process boundaries
    // into the codegen'd Q8.8 arithmetic).
    "q299_concat_chunking", "q301_preference_pairs", "q304_perplexity_filter",
    // ...and the HyperBall register propagation (q314 — the
    // RegMaxAggregator's packed 64-byte buffers must serialize, combine
    // map-side, and merge across real executor JVMs; its copy-on-write
    // reduce exists precisely because of typed-aggregate buffer sharing).
    "q314_hyperball",
    // Round-11 additions: the effective-diameter card (q316 — shares
    // q314's memoized propagation, so one session must serve BOTH cards
    // from one register build across real executors; its estimator
    // lambda's hoisted-constants fix is exactly a closure-serialization
    // regression this check would catch), and the multi-store curation
    // DAG (q317 — score/signature/admission stores seeded, edited, and
    // re-synced with executor-JVM writers; the digest diffs and the
    // edited-partition content audit must hold when partition slices
    // are produced by separate processes).
    "q316_hyperball_distance", "q317_curation_dag",
    // q318/q319/q320 ride the same memoized register core as q314/q316 —
    // their per-node estimate joins + TakeOrdered top-ks must agree when
    // the est frames live in separate executor JVMs.
    "q318_harmonic_centrality", "q319_lin_centrality",
    "q320_closeness_centrality")

  /** Round-13 family: the torn-compaction recovery paths across REAL
    * process boundaries (round-12 verdict #5's other option). Builds a
    * corpus, ingests + compacts with executor-JVM writers, then plants
    * BOTH crash observables — the base loses its `_SUCCESS` and the
    * manifest is truncated mid-line (the torn-publish state the
    * temp+rename fix makes rare but external truncation can still
    * produce) — and re-ingests: probes must route through the per-batch
    * fallback (survivors identical to the unit-spec literal), and the
    * auto-compaction must self-heal base + manifest. Returns the
    * published (batch, doc) rows for cross-master comparison. */
  private def tornCompactionRows(spark: SparkSession): Seq[(Long, Long)] = {
    import spark.implicits._
    val corpus = java.nio.file.Files
      .createTempDirectory("graft_cluster_torn").toString + "/corpus"
    Seq((100L, "p q r s", -1L)).toDF("doc_id", "text", "batch_id")
      .write.partitionBy("batch_id").parquet(corpus)
    graft.dedup.IncrementalDedup.fuzzyIngestBatch(
      Seq((1L, "x y z w")).toDF("doc_id", "text"), corpus, 0L)
    graft.dedup.IncrementalDedup.compactSigStore(spark, corpus)
    val sig = s"$corpus/_fuzzy_sigs"
    val fs = new org.apache.hadoop.fs.Path(corpus)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$sig/_base/_SUCCESS"), false)
    val mp = new org.apache.hadoop.fs.Path(sig, "_base_manifest")
    val in = fs.open(mp)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val out = fs.create(mp, true)
    try out.write(txt.substring(0, math.max(1, txt.lastIndexOf('='))).getBytes("UTF-8"))
    finally out.close()
    // Doc 5 twins the batch-0 survivor: must drop via the per-batch
    // fallback; doc 6 is fresh. The residual count (3 >= 2) forces the
    // self-healing auto-compaction in the same ingest.
    graft.dedup.IncrementalDedup.fuzzyIngestBatch(
      Seq((5L, "x y z w"), (6L, "a b c d")).toDF("doc_id", "text"), corpus, 1L,
      autoCompactDeltas = 2)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$sig/_base/_SUCCESS")) &&
      graft.dedup.IncrementalDedup.readStateFile(fs, sig, "_base_manifest").nonEmpty,
      "[clustercheck] torn store did not self-heal after re-ingest")
    spark.read.parquet(corpus).where(col("batch_id") >= 0)
      .select(col("batch_id").cast("long"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    // The graft classes for the executor JVMs: wherever THIS class was
    // loaded from (sbt's classes dir or a packaged jar).
    val classesDir = getClass.getProtectionDomain.getCodeSource.getLocation.getPath

    def run(master: String): (Map[String, (Long, Long)], Seq[(Long, Long)], Int) = {
      val spark = SparkSession.builder()
        .master(master)
        .appName(s"graft-clustercheck-${master.takeWhile(_ != '[')}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.executor.extraClassPath", classesDir)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val hashes = Queries.map { name =>
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          val row = df
            .select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
            .agg(count(lit(1)).as("n"), sum(expr("h % 1000000007")).as("hs"))
            .head()
          name -> (row.getLong(0), row.getAs[Any](1).toString.toLong)
        }.toMap
        val torn = tornCompactionRows(spark)
        // Executor count as the scheduler saw it (driver excluded) —
        // proof the run actually used separate executor processes.
        val execs = spark.sparkContext.statusTracker.getExecutorInfos
          .count(_.host() != null) - (if (master.startsWith("local-cluster")) 1 else 0)
        (hashes, torn, execs)
      } finally {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    val (clustered, tornC, execs) = run("local-cluster[2,2,2048]")
    require(execs >= 2,
      s"[clustercheck] expected >=2 separate executors, scheduler saw $execs")
    val (local, tornL, _) = run("local[4]")
    clustered.foreach { case (name, got) =>
      require(got == local(name),
        s"[clustercheck] $name differs across process boundaries: cluster=$got local=${local(name)}")
    }
    require(tornC == tornL && tornC == Seq((0L, 1L), (1L, 6L)),
      s"[clustercheck] torn-compaction recovery differs: cluster=$tornC local=$tornL")
    println(s"[clustercheck] OK executors=$execs torn_compaction=OK " +
      s"queries=${Queries.sorted.mkString(",")}")
  }
}
