package graft

import org.apache.spark.GraftListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{PipelineQueries, Queries}

/** Spill-path evidence (the gap between "right plan" and "survives
  * pressure" at 100×): the heaviest buffer-holding shapes must COMPLETE
  * with spills observed and results identical to the unconstrained run.
  * In-suite the pressure comes from the runtime spill thresholds — the
  * same knobs a production cluster tunes when one window partition or one
  * aggregate exceeds executor memory; genuine memory-manager pressure
  * (spark.testing.memory) is per-JVM, covered by
  * [[graft.tools.SpillCheck]] in its own JVM like HiveCheck. */
class SpillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tallySpills[T](body: => T): (T, Long, Long) = {
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
      val r = body
      GraftListenerBridge.waitUntilListenerBusEmpty(spark.sparkContext)
      (r, disk, mem)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q16 window buffers spill to disk under a constrained threshold, result unchanged") {
    // WindowExec holds each user's full partition in
    // ExternalAppendOnlyUnsafeRowArray; past in.memory.threshold rows it
    // moves to an UnsafeExternalSorter that force-spills every
    // spill.threshold rows — the knob that keeps a whale user's window
    // from OOMing an executor.
    val want = Queries.windowRunning(spark, TestSpark.SfDir).collect()
    val (got, disk, mem) = withConfs(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "2",
      "spark.sql.windowExec.buffer.spill.threshold" -> "4") {
      tallySpills(Queries.windowRunning(spark, TestSpark.SfDir).collect())
    }
    assert(disk > 0, s"no disk spill observed (memSpilled=$mem)")
    assert(got.sameElements(want))
  }

  test("q64 two-phase aggregate completes through the sort-based fallback, result unchanged") {
    // HashAggregateExec's pressure valve: when the hash map can't grow,
    // the map is destructed into an external sorter (spilling it) and
    // aggregation continues sort-based. testFallbackStartsAt triggers the
    // SAME code path deterministically at harness data volume.
    val want = PipelineQueries.repeatedNgrams(spark, TestSpark.SfDir).collect()
    val (got, disk, mem) = withConfs(
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "128,256") {
      tallySpills(PipelineQueries.repeatedNgrams(spark, TestSpark.SfDir).collect())
    }
    assert(disk + mem > 0, s"aggregate fallback produced no spill (disk=$disk mem=$mem)")
    assert(got.sameElements(want))
  }

  test("q27 candidate distinct completes through the sort-based fallback, result unchanged") {
    // The LSH candidate distinct is q27's heaviest aggregate; run the
    // non-memoized core so the aggregation genuinely executes here. The
    // identity filter keeps the analyzed plan from matching any tier
    // frame another suite persisted — CacheManager would otherwise
    // substitute the InMemoryRelation and no aggregate would run at all.
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, TestSpark.SfDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") =!= -987654321L)
    def run() = Dedup
      .minhashNearDups(docs, "doc_id", "text")
      .orderBy(org.apache.spark.sql.functions.col("id_a"),
        org.apache.spark.sql.functions.col("id_b"))
      .collect()
    val want = run()
    val (got, disk, mem) = withConfs(
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "128,256") {
      tallySpills(run())
    }
    assert(disk + mem > 0, s"aggregate fallback produced no spill (disk=$disk mem=$mem)")
    assert(got.sameElements(want))
  }
}
