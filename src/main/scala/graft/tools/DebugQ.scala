// Scratch stage-timing main (dev tool, not registered).
package graft.tools

import graft.Engine
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object DebugQ {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 32, appName = "graft-debugq")
    val dir = args(0)
    val q = args(1)
    val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val sub = si.submissionTime.getOrElse(0L)
        stages.synchronized { stages += ((si.stageId, sub,
          si.completionTime.getOrElse(0L) - sub, si.numTasks,
          si.taskMetrics.shuffleReadMetrics.recordsRead)) }
      }
    })
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"STAGE $name sec=${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    args.drop(2).foreach(w => t(s"warm:$w")(graft.SparkEntry.queries(w)(spark, dir).count()))
    val w0 = System.currentTimeMillis()
    t(q)(graft.SparkEntry.queries(q)(spark, dir).count())
    Thread.sleep(300)
    println("== timeline ==")
    stages.sortBy(_._2).filter(_._2 >= w0).foreach { case (id, sub, d, nt, rr) =>
      println(f"stage $id%4d off=${sub - w0}%6d dur=$d%6d tasks=$nt%3d recs=$rr%9d")
    }
    spark.stop()
  }
}
