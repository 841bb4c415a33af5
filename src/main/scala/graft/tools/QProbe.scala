package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query optimization probe (round-13 measurement harness, guide §1):
  * runs the named queries under the EXACT Bench session configuration,
  * times [[reps]] repetitions with the same `.count()` action the bench
  * uses, and (optionally) writes `.explain("formatted")` to a plans dir —
  * the `plans/r13/<query>_{before,after}.txt` deliverable.
  *
  * Per run it also prints the per-query stage breakdown (stage id, name,
  * wall ms, task count) from a stage listener, so "where does the time
  * go" is answered empirically (guide §1.1) instead of from the plan
  * alone.
  *
  * Usage: runMain graft.tools.QProbe <sfDir> <plansDirOrNONE> <suffix> q1 q2 ...
  * (suffix e.g. "before"/"after"; NONE skips plan files.)
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val plansDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_THRESHOLD", "128"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { graft.similarity.IvfPqIndex.vacuum(spark, Set.empty); () }
    catch { case scala.util.control.NonFatal(_) => () }
    // Same warmup as Bench: every table touched once. NonFatal only, and
    // loudly (round-13 advice): swallowing OOM/linkage errors here could
    // mask a broken sfDir and let the probe time nonsense runs.
    try {
      graft.Tables.lineitem(spark, sfDir).limit(1000)
        .groupBy("l_returnflag").count().count()
      graft.Tables.events(spark, sfDir).limit(1000).count()
      Seq(graft.Tables.orders _, graft.Tables.customer _, graft.Tables.part _,
        graft.Tables.supplier _, graft.Tables.nation _, graft.Tables.region _,
        graft.Tables.documents _, graft.Tables.embeddings _)
        .foreach(t => t(spark, sfDir).limit(100).count())
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[qprobe] WARNING: warmup failed — check sfDir " +
          s"'$sfDir': ${e.getClass.getName}: ${e.getMessage}")
    }

    // Stage listener: (stageId, name-head, wall ms, tasks, task run ms,
    // task cpu ms) — run/cpu from the stage's aggregated TaskMetrics, so
    // a stage whose aggregate task time dwarfs its wall (duplicate
    // lineage execution, lock serialization) is attributable per stage.
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b)
          .getOrElse(-1L)
        val tm = i.taskMetrics
        val (run, cpu) =
          if (tm == null) (0L, 0L)
          else (tm.executorRunTime, tm.executorCpuTime / 1000000L)
        stages.add((i.stageId, i.name.takeWhile(_ != '\n').take(60), wall,
          i.numTasks, run, cpu))
        ()
      }
    })

    val reps = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt).getOrElse(3)
    val qmap = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = qmap(name)
      if (plansDir != "NONE") {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val p = java.nio.file.Paths.get(plansDir, s"${name}_$suffix.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
      }
      val times = (1 to reps).map { rep =>
        stages.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        if (rep == 1 || rep == reps) {
          val tag = if (rep == 1) "cold" else "rep" + rep
          import scala.jdk.CollectionConverters._
          val all = stages.asScala.toSeq
          val top = all.sortBy(s => -(s._3 max s._5)).take(14)
          top.foreach { case (id, n, w, t, run, cpu) =>
            println(f"[qprobe]   $name $tag stage=$id%5d wall=${w}%6d ms tasks=$t%4d run=${run}%7d cpu=${cpu}%7d  $n")
          }
          println(f"[qprobe]   $name $tag TOTAL stages=${all.size} wall=${all.map(_._3).sum}%7d run=${all.map(_._5).sum}%7d cpu=${all.map(_._6).sum}%7d")
        }
        s
      }
      println(f"[qprobe] $name reps=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}%.3f")
    }
    spark.stop()
  }
}
