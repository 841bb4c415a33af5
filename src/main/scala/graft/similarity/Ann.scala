package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
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

  /** Multi-probe signature rows (Lv et al. 2007): per table the sign-bit
    * bucket AND its lowest-|dot|-bit flip (see
    * [[graft.functions.HyperplaneProbes]]) — the QUERY-side expansion
    * that buys most of a second hash table's recall with zero extra
    * corpus signatures. Result: (id, table_idx, bucket) with two rows
    * per (id, table). */
  private[graft] def probed(embs: DataFrame, idCol: String, vecCol: String,
      tables: Int, bits: Int, seed: Long, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(tables, bits, dim, seed)
    embs
      .select(
        col(idCol).as("id"),
        graft.functions.HyperplaneFunctions.hyperplane_probes(col(vecCol), planes).as("ps"))
      .select(col("id"), posexplode(col("ps")).as(Seq("table_idx", "keys")))
      .select(col("id"), col("table_idx"), explode(col("keys")).as("bucket"))
  }

  /** Typed bounded top-k accumulator over (id, score): kept sorted by
    * (score desc, id asc), capped at k. The selection is a pure function of
    * the input SET (merge-order independent), so the result is identical to
    * the row_number-window formulation — but partials combine MAP-SIDE: the
    * shuffle carries at most partitions·k rows per query instead of every
    * scored candidate. That is the difference between shuffling q·n scored
    * rows and shuffling q·k at 100 TB. */
  class TopKAggregator(k: Int)
      extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    private def better(a: (Long, Double), b: (Long, Double)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    override def zero: Seq[(Long, Double)] = Vector.empty
    override def reduce(buf: Seq[(Long, Double)], v: (Long, Double)): Seq[(Long, Double)] =
      if (buf.length >= k && !better(v, buf.last)) buf
      else {
        val (pre, post) = buf.span(better(_, v))
        ((pre :+ v) ++ post).take(k)
      }
    override def merge(x: Seq[(Long, Double)], y: Seq[(Long, Double)]): Seq[(Long, Double)] =
      y.foldLeft(x)(reduce)
    override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = b
    override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** (query_id, neighbor_id, cosine) → ranked top-k per query via the
    * map-side aggregator (no Window over the full scored set). Null
    * cosines (zero-norm vectors) are dropped — they can never rank.
    * private[graft]: q118 reuses it for per-stratum bounded top-k (the
    * key need not be a vector id — any Long grouping key works). */
  private[graft] def topKRanked(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .filter(col("cosine").isNotNull)
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .flatMap { case (q, topk) =>
        topk.iterator.zipWithIndex.map { case ((id, s), i) => (q, id, i + 1, s) }
      }
      .toDF("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * enough to broadcast (sampled probes, or an online batch); corpus-side
    * work is a single broadcast-nested-loop scan with the per-query top-k
    * held in a map-side typed Aggregator — no O(n²) shuffle, and no
    * corpus-wide window shuffle either. Excludes self-matches. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    // r13 note: a Tables.fan on the corpus side was measured and REVERTED —
    // several callers (q289's forward/backward passes, q134's sweep) feed
    // sub-corpus frames where the added exchange + re-executed lineage cost
    // more than the single-task cosine map saved (q289: 1.2 s → 3.2 s).
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val scored = c
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine_sim(col("query_vec"), col("neighbor_vec")))
    topKRanked(scored, k)
  }

  /** Hard-negative mining: exact top-k per query restricted to the cosine
    * band [lo, hi) — neighbors similar enough to be informative negatives
    * for contrastive training but below the near-duplicate/positive
    * ceiling. Same broadcast + map-side TopKAggregator shape as
    * [[bruteForceTopK]] (no corpus-wide window, no O(n²) shuffle); at
    * corpus scale the band predicate composes with the IVF route
    * unchanged — probe cells as usual, band-filter candidates before the
    * ranking aggregate (an upper-bound-prune on cell distance can also
    * skip cells whose best possible cosine is below `lo`). */
  def bruteForceBandTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, lo: Double, hi: Double, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val scored = c
      .join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine_sim(col("query_vec"), col("neighbor_vec")))
      .filter(col("cosine") >= lo && col("cosine") < hi)
    topKRanked(scored, k)
  }

  /** LSH top-k: candidates from any shared bucket across `tables` tables,
    * exact cosine rank among candidates. Recall is tunable via
    * tables/bits; misses only reduce recall, never produce false
    * positives (candidates are exactly re-scored).
    *
    * The candidate dedup runs on COMPACT ID PAIRS only — a candidate that
    * collides in several tables would otherwise drag both ~dim-float
    * vectors (≈512 B/row at dim=64) through the distinct exchange once per
    * collision. Vectors are re-joined once per UNIQUE pair afterwards
    * (queries broadcast; corpus one hash join), the same
    * payload-after-distinct shape as `Dedup.tieredSetPairs`. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, tables: Int = 8, bits: Int = 6, seed: Long = 7L): DataFrame = {
    val qb = bucketed(queries, idCol, vecCol, tables, bits, seed)
      .select(col("table_idx"), col("bucket"), col("id").as("query_id"))
    val cb = bucketed(corpus, idCol, vecCol, tables, bits, seed)
      .select(col("table_idx"), col("bucket"), col("id").as("neighbor_id"))
    val pairs = qb
      .join(cb, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val qv = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val scored = pairs
      .join(qv, Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .withColumn("cosine", cosine_sim(col("query_vec"), col("neighbor_vec")))
    topKRanked(scored, k)
  }
}
