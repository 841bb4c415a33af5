package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_sim

/** IVF (inverted-file) ANN: cluster the corpus into `nlist` cells around
  * centroids, search only the `nprobe` cells nearest each query.
  *
  * The scale shape: centroids are tiny and broadcast everywhere; the corpus
  * is shuffled ONCE on its cell assignment (that shuffle is the index
  * build); each query touches nprobe/nlist of the data. Complements the
  * hyperplane-LSH path in [[Ann]]: IVF adapts to the data distribution
  * (learned cells) where LSH is data-oblivious.
  */
object Ivf {

  /** Typed Aggregator: element-wise mean of float vectors (the centroid of
    * a cell). Buffer is (running sums, count) — merge-able, so it runs as
    * a proper two-phase distributed aggregate. */
  class CentroidAggregator(dim: Int)
      extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      val (sums, n) = b
      var i = 0
      while (i < math.min(dim, v.length)) { sums(i) += v(i); i += 1 }
      (sums, n + 1)
    }
    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      val (sx, nx) = x; val (sy, ny) = y
      var i = 0
      while (i < dim) { sx(i) += sy(i); i += 1 }
      (sx, nx + ny)
    }
    override def finish(b: (Array[Double], Long)): Array[Float] = {
      val (sums, n) = b
      val out = new Array[Float](dim)
      if (n > 0) { var i = 0; while (i < dim) { out(i) = (sums(i) / n).toFloat; i += 1 } }
      out
    }
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)
    override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
  }

  /** Assign every row to its nearest centroid (centroids broadcast). */
  private def assign(df: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("cell"))
    df.select(col(idCol), col(vecCol))
      .join(broadcast(centroids))
      .withColumn("sim", cosine_sim(col(vecCol), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("cell"))
  }

  /** Build the IVF index: deterministic seeds (first nlist ids), one Lloyd
    * refinement with the centroid aggregator, final cell assignment.
    * Returns (assignments df [id, vec, cell], centroids df [cell, centroid]). */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 16, dim: Int = 64): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import spark.implicits._
    val seeds = corpus
      .orderBy(col(idCol))
      .limit(nlist)
      .select(col(idCol), col(vecCol))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }
      .toSeq
    val seedCentroids = seeds.toDF("cell", "centroid")
    val firstAssign = assign(corpus, seedCentroids, idCol, vecCol)
    // One Lloyd iteration: recompute centroids as distributed cell means
    // via the typed Aggregator (two-phase: partial sums merge map-side —
    // no collect_list materialization of whole cells).
    val centroidOf = udaf(new CentroidAggregator(dim), ExpressionEncoder[Array[Float]]())
    val refined = firstAssign
      .groupBy(col("cell"))
      .agg(centroidOf(col(vecCol)).as("centroid"))
    (assign(corpus, refined, idCol, vecCol), refined)
  }

  /** Search: route each query to its `nprobe` nearest cells, exact-score
    * only rows in those cells, top-k per query. */
  def topK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val (assigned, centroids) = build(spark, corpus, idCol, vecCol, nlist)
    val wq = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cell"))
    val routed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .join(broadcast(centroids))
      .withColumn("csim", cosine_sim(col("query_vec"), col("centroid")))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nprobe)
      .select(col("query_id"), col("query_vec"), col("cell"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    routed
      .join(
        assigned.select(col("cell"), col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec")),
        Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine_sim(col("query_vec"), col("neighbor_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }
}
