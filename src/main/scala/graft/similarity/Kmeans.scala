package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PqFunctions.pq_encode

/** Distributed L2 k-means — the iterative training loop every
  * clustering-adjacent pipeline stage (IVF coarse quantizers, SemDeDup
  * cells, PQ codebooks) ultimately runs. One Lloyd iteration is:
  * map-only argmin-L2 assignment (the [[graft.functions.PqEncode]]
  * expression with ONE subspace spanning the whole vector — codebook
  * carried in-expression, zero Exchange) followed by the two-phase
  * [[Ivf.CentroidAggregator]] mean (partials merge map-side, k-row
  * collect). Per iteration the corpus is scanned twice and nothing
  * corpus-sized ever collects — the 100 TB loop shape.
  *
  * Surfaced (q86) as the engine's bounded-claim pattern for ITERATIVE
  * float computation: iteration 0's inertia is computed against the
  * SEEDED centroids (first-k-id vectors), so the oracle rebuilds it
  * exactly — same (x−y)² fold, `floor(dist·10⁶)` fixed-point BIGINT sum
  * (order-free); iterations ≥ 1 depend on float-mean centroids
  * (engine-internal aggregation order), so what's emitted is the
  * STRUCTURAL Lloyd claim: inertia never increases, within one
  * fixed-point unit per vector of slack (the means' last-ulp
  * run-to-run noise never exceeds that; real Lloyd decreases dwarf it).
  */
object Kmeans {

  /** Defaults for [[inertiaTrace]], shared with the q86 oracle generator
    * (PipelineQueries) so engine and oracle cannot silently desynchronize:
    * the oracle's seed LIMIT and its per-iteration UNION ALL rows are both
    * emitted from these named constants. */
  val DefaultK = 16
  val DefaultIters = 3

  /** Run `iters` Lloyd iterations from the seeded centroids; emit one row
    * per iteration: (iter, inertia_fp, non_increasing) where inertia_fp
    * is the exact fixed-point inertia for iter 0 (oracle-checkable) and
    * null afterwards (float-mean centroids are not engine-portable), and
    * non_increasing pins `inertia_i ≤ inertia_{i-1} + n` (n = one
    * 10⁻⁶ unit per vector of float-noise slack). */
  def inertiaTrace(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = DefaultK, iters: Int = DefaultIters, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import spark.implicits._
    require(iters >= 1, "need at least one iteration")
    val indexable = corpus.filter(col(vecCol).isNotNull && size(col(vecCol)) >= dim)
    var centroids: Array[Array[Double]] = indexable
      .orderBy(col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(centroids.nonEmpty, "empty corpus: no seed centroids")
    val centroidOf = udaf(new Ivf.CentroidAggregator(dim), ExpressionEncoder[Array[Float]]())

    def assigned(cents: Array[Array[Double]]): DataFrame = indexable
      .select(col(vecCol),
        element_at(pq_encode(col(vecCol), Array(cents)), 1).as("enc"))
      .select(col(vecCol), col("enc.code").as("cell"), col("enc.dist").as("dist"))

    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Option[Long], Boolean)]
    var prev = 0L
    (0 until iters).foreach { i =>
      val a = assigned(centroids)
      val r = a.agg(
        sum(floor(col("dist") * 1e6).cast("long")).as("fp"),
        count(lit(1)).as("n")).head()
      val (inertia, n) = (r.getLong(0), r.getLong(1))
      trace += ((i, if (i == 0) Some(inertia) else None, i == 0 || inertia <= prev + n))
      if (i > 0 && inertia > prev + n)
        System.err.println(
          s"[q86] Lloyd monotonicity VIOLATED at iter $i: $inertia > $prev + $n slack " +
            "— the oracle's TRUE row will hash-mismatch")
      prev = inertia
      if (i < iters - 1) {
        // Mean update; a cell that lost all members keeps its centroid
        // (ids stay aligned, inertia contribution unchanged).
        val next = centroids.map(_.clone())
        a.groupBy(col("cell"))
          .agg(centroidOf(col(vecCol)).as("centroid"))
          .collect()
          .foreach { row =>
            if (!row.isNullAt(0) && !row.isNullAt(1))
              next(row.getInt(0)) = row.getSeq[Float](1).toArray.map(_.toDouble)
          }
        centroids = next
      }
    }
    trace.toSeq.toDF("iter", "inertia_fp", "non_increasing").orderBy(col("iter"))
  }
}
