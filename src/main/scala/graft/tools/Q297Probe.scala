// Scratch bisection main for q297's card-stage CPU (dev tool, not
// registered): times each sub-pipeline against the noop sink (guide §1.4)
// so the expensive expression/operator can be named empirically.
package graft.tools

import org.apache.spark.sql.functions._

object Q297Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(cores = 32, appName = "graft-q297probe")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val d = graft.similarity.Pq.Dim
    val embs = graft.Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull && size(col("embedding")) >= d)
    val f = graft.Tables.fan(embs, col("vec_id")).select(col("vec_id"),
      expr(s"transform(slice(embedding, 1, $d), " +
        "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("f"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    f.count()
    def time[T](name: String, reps: Int = 3)(body: => Unit): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"[q297probe] $name rep$i sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def word(lohi: (Int, Int)) = expr(
      (lohi._1 until lohi._2).map(i =>
        s"CAST(CASE WHEN f[$i] > 0L THEN ${1L << (i % 32)} ELSE 0 END AS BIGINT)")
        .mkString(" + "))
    val coded = f.select(col("vec_id"), col("f"),
      word((0, 32)).as("b_lo"), word((32, d)).as("b_hi"))

    time("A_coded_project")(noop(coded))
    val q = coded.filter(col("vec_id") % 50 === 0)
    val ham = coded
      .join(broadcast(q.select(col("vec_id").as("query_id"),
        col("b_lo").as("q_lo"), col("b_hi").as("q_hi"))),
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (expr("bit_count(b_lo ^ q_lo)") + expr("bit_count(b_hi ^ q_hi)")).as("hamming"))
    time("B_ham_bnlj")(noop(ham))
    val scored = ham.select(col("query_id"), col("neighbor_id"),
      (-col("hamming")).cast("double").as("cosine"))
    time("C_topk_typed")(noop(graft.similarity.Ann.topKRanked(scored, 20)))
    // D: the same topk WITHOUT the giant word() projection under it —
    // isolates the aggregator from the expression tree.
    val flat = ham.select(col("query_id"), col("neighbor_id"),
      col("hamming").cast("double").as("cosine"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    flat.count()
    time("D_topk_on_cached")(noop(graft.similarity.Ann.topKRanked(flat, 20)))
    // E: truth build (BNLJ cosine + typed topk from parquet)
    time("E_truth_build")(noop(
      graft.similarity.Ann.bruteForceTopK(embs.filter(col("vec_id") % 50 === 0),
        embs, "vec_id", "embedding", k = 10)))
    spark.stop()
  }
}
