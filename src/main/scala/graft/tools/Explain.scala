// Plan-inspection scratch main (dev tool): prints formatted plans for
// representative queries so pushdown/broadcast/codegen claims are checkable.
package graft.tools

import graft.{Engine, SparkEntry}

object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 8, appName = "graft-explain")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq(
        "q01_pricing_summary", "q08_filter_valid", "q10_join_broadcast",
        "q12_join_chain", "q17_order_limit", "q27_minhash_neardup",
        "q33_ann_brute", "q49_ann_ivf", "q57_curation_report",
        "q59_token_budget_sample", "q64_repeated_ngrams")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
