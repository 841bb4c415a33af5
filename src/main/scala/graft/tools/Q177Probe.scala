// Scratch probe for the q177 ABOVE-GATE wedge closure (dev tool, not
// registered): forces the wedge path on the real sf co-purchase graph and
// reports wall + shuffle bytes for the packed-BIGINT vs 2-col closure
// keys (r14 verdict item: the path real scale takes, exercised by no
// benchmark query below the gate).
package graft.tools

import org.apache.spark.sql.functions.col

object Q177Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(cores = 32, appName = "graft-q177probe")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleReadMetrics.totalBytesRead +
            m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })
    val op = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    Seq(false, true).foreach { pack =>
      // Warm + measure: 2 reps each, report the second (memo-free path,
      // so both reps recompute; rep 2 excludes JIT).
      (1 to 2).foreach { rep =>
        Thread.sleep(500)
        bytes.set(0L)
        val t0 = System.nanoTime()
        val n = graft.analytics.PipelineQueries
          .triangleCensusOf(op, adjMaxEdges = 0L, packIds = Some(pack))
          .collect()(0).getLong(3)
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        println(f"[q177probe] pack=$pack rep=$rep triangles=$n sec=$sec%.2f shuffle_bytes=${bytes.get()}")
      }
    }
    spark.stop()
  }
}
