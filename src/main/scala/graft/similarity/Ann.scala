package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosine_sim, dot_product}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline. The
  *    query side must be small (it is broadcast); the corpus streams.
  *  - `lshTopK`: multi-table random-hyperplane LSH — the scale path. Each
  *    table hashes a vector to a `bits`-bit bucket; candidates are rows
  *    sharing a bucket in any table, then exact cosine ranks them. Shuffle
  *    cost is O(tables · n) on compact (table, bucket) keys, never O(n²).
  */
object Ann {

  /** Deterministic Gaussian hyperplanes: tables × bits planes of dim
    * `dim`. */
  private[graft] def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Signature: per table, the sign-bit bucket of the row's vector (all
    * tables computed in one sweep by the HyperplaneBuckets expression).
    * Result: df with (id, vec, table_idx, bucket). */
  private[graft] def bucketed(embs: DataFrame, idCol: String, vecCol: String,
      tables: Int, bits: Int, seed: Long, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(tables, bits, dim, seed)
    embs
      .select(
        col(idCol).as("id"),
        col(vecCol).as("vec"),
        graft.functions.HyperplaneFunctions.hyperplane_buckets(col(vecCol), planes).as("buckets"))
      .select(col("id"), col("vec"), posexplode(col("buckets")).as(Seq("table_idx", "bucket")))
  }

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * enough to broadcast (sampled probes, or an online batch); corpus-side
    * work is a single broadcast-nested-loop scan + per-query heap via
    * row_number — no O(n²) shuffle. Excludes self-matches. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val scored = c
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine_sim(col("query_vec"), col("neighbor_vec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** LSH top-k: candidates from any shared bucket across `tables` tables,
    * exact cosine rank among candidates. Recall is tunable via
    * tables/bits; misses only reduce recall, never produce false
    * positives (candidates are exactly re-scored). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, tables: Int = 8, bits: Int = 6, seed: Long = 7L): DataFrame = {
    val qb = bucketed(queries, idCol, vecCol, tables, bits, seed)
      .select(col("table_idx"), col("bucket"), col("id").as("query_id"), col("vec").as("query_vec"))
    val cb = bucketed(corpus, idCol, vecCol, tables, bits, seed)
      .select(col("table_idx"), col("bucket"), col("id").as("neighbor_id"), col("vec").as("neighbor_vec"))
    val candidates = qb
      .join(cb, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("query_vec"), col("neighbor_vec"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .withColumn("cosine", cosine_sim(col("query_vec"), col("neighbor_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }
}
