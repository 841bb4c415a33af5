package graft.tools

import org.apache.spark.GraftListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Memory-pressure evidence (VERDICT r5 #6): the heaviest aggregate/sort
  * shapes (q27's LSH candidate distinct, q64's two-phase n-gram
  * aggregate, q117's min-owner Window over the gram-pair exchange — the
  * spillable-window-buffer path) run under a genuinely constrained
  * UnifiedMemoryManager and
  * must COMPLETE — by spilling, not by OOM — with content hashes equal to
  * an unconstrained run. This is the piece of 100×-readiness between
  * "right plan" (PlanSpec) and "right thresholds" (SpillSpec): when the
  * pool itself is too small, every buffer-holding operator must degrade
  * to disk.
  *
  * A standalone main (not a ScalaTest): `spark.testing.memory` and the
  * force-spill threshold are fixed at SparkContext creation, so they
  * cannot be toggled inside the shared test JVM. The two contexts run
  * sequentially in THIS JVM (constrained, stop, unconstrained). Run:
  *   sbt "runMain graft.tools.SpillCheck /root/testdata/sf0.01"
  * — prints `[spillcheck] OK ...`; non-zero exit on mismatch or no spill.
  */
object SpillCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    /** Run both shapes, return (order-free content hash per query, disk
      * bytes spilled, memory bytes spilled). */
    def run(constrained: Boolean): (Map[String, (Long, Long)], Long, Long) = {
      val b = SparkSession.builder()
        .master("local[4]")
        .appName(s"graft-spillcheck-${if (constrained) "tight" else "free"}")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      if (constrained) {
        // ~38 MB usable pool across 4 concurrent tasks plus a force-spill
        // row ceiling (both context-creation confs): every external
        // sorter past 5000 rows exercises its disk path. Broadcast is
        // disabled so the joins take the sort-merge shape they'd have at
        // 100 TB — the SortExecs are what the ceiling bites on (with
        // broadcast on, harness-SF shuffles ride the bypass-merge writer,
        // which has no spill path at all).
        b.config("spark.testing.memory", (64L * 1024 * 1024).toString)
          .config("spark.testing.reservedMemory", "0")
          .config("spark.shuffle.spill.numElementsForceSpillThreshold", "5000")
          .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      @volatile var disk = 0L
      @volatile var mem = 0L
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) { disk += m.diskBytesSpilled; mem += m.memoryBytesSpilled }
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val hashes = Seq("q27_minhash_neardup", "q64_repeated_ngrams",
          "q117_exact_gram_dedup",
          // The degree-ordered wedge join — this session's heaviest new
          // shuffle shape (oriented-edge self-join + LeftSemi closure).
          "q177_triangles",
          // Round-10 additions: the ExactSubstr position explosion
          // (gram-hash aggregate + LeftSemi + doc windows — the widest
          // new exchange) and the CDC chunk pipeline (doc windows +
          // ordered reassembly collect_list buffers, the
          // spillable-window/aggregate-buffer path).
          "q253_repeat_spans", "q258_cdc_chunks",
          // Round-10 continuation: the double-GlobalRank adjacency join
          // (q262 — token-array rows ride two range exchanges, two
          // pid-window sorts, and a rank⋈rank+1 sort-merge join; the
          // widest array-carrying sort path in the suite).
          "q262_locality_layout",
          // Round-10 session addition: the winnowing pipeline (q271 —
          // gram explode + per-doc window minima + fingerprint distinct
          // + df-capped pair self-join; the widest explode→window→join
          // chain among the session's new text operators).
          "q271_winnowing_pairs",
          // Continuation batch-2 addition: the quadruple-GlobalRank Borda
          // fusion (q283 — four range exchanges + four pid-window sorts
          // over the full signal frame; the most sort-heavy new query,
          // exactly the path that must stay hash-stable under forced
          // spills).
          "q283_borda_fusion",
          // Continuation batch-4 additions: the PMI pipeline (q305 —
          // the widest STRING-keyed exchange among the new operators:
          // bigram-pair aggregate + two vocab-keyed marginal joins + a
          // GlobalRank over the scored frame) and the sharded exclusive
          // prefix sum (q299 — pid-window running sums whose carry-in
          // offsets must stay exact when the sort spills).
          "q299_concat_chunking", "q305_token_pmi").map { name =>
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          val row = df
            .select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
            .agg(count(lit(1)).as("n"), sum(expr("h % 1000000007")).as("hs"))
            .head()
          name -> (row.getLong(0), row.getAs[Any](1).toString.toLong)
        }.toMap
        GraftListenerBridge.waitUntilListenerBusEmpty(spark.sparkContext)
        (hashes, disk, mem)
      } finally {
        spark.sparkContext.removeSparkListener(l)
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    val (tight, disk, mem) = run(constrained = true)
    require(disk + mem > 0,
      s"constrained run observed no spill (disk=$disk mem=$mem) — pressure not exercised")
    val (free, _, _) = run(constrained = false)
    tight.foreach { case (name, got) =>
      require(got == free(name),
        s"[spillcheck] $name mismatch under pressure: constrained=$got unconstrained=${free(name)}")
    }
    println(s"[spillcheck] OK queries=${tight.keys.toSeq.sorted.mkString(",")} " +
      s"diskSpilled=$disk memSpilled=$mem")
  }
}
