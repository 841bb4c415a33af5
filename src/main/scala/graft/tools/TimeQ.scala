// Single-query timing scratch main (dev tool): times named registered
// queries against a testdata dir in one JVM — the inner loop for perf work
// on an individual query without paying a full Bench suite run.
package graft.tools

import graft.{Engine, SparkEntry}

object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 32, appName = "graft-timeq")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q01_pricing_summary")
    // Warm the tables untimed (same rationale as Bench's warmup).
    try {
      graft.Tables.lineitem(spark, dir).limit(1000).count()
      graft.Tables.events(spark, dir).limit(1000).count()
      graft.Tables.documents(spark, dir).limit(100).count()
      graft.Tables.embeddings(spark, dir).limit(100).count()
    } catch { case _: Throwable => () }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      println(f"TIMEQ $n rows=$c sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
