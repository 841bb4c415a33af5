package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IvfFunctions.nearest_cells
import graft.functions.VectorFunctions.cosine_sim

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
  * by clustering embeddings and removing near-identical vectors WITHIN each
  * cluster — the step that makes pairwise semantic comparison tractable at
  * corpus scale, because the O(n²) cosine check is bounded to cells of
  * ~n/nlist instead of the whole corpus.
  *
  * Keep rule: a vector is dropped iff some LOWER-ID vector in its cell has
  * cosine ≥ tau to it ("dominated"). Unlike the paper's random-keeper
  * greedy pass this is a pure function of the input set — order-free,
  * repartition-stable, and exactly replicable in a SQL oracle. (A dominated
  * vector's dominator may itself be dominated; that over-removal is the
  * standard price of the non-sequential rule and only fires inside a
  * duplicate clique, where everything but the minimum id is dropped anyway.)
  *
  * The registered query uses the SEEDED coarse quantizer (cells = the
  * first-nlist-id vectors, the [[Ivf.topKSeeded]] pattern) so cell
  * assignment is oracle-portable; a production run would swap in trained
  * centroids — every stage downstream is centroid-agnostic.
  *
  * Scale shape: assignment is map-only (in-expression centroid matrix);
  * the only wide op is the within-cell self-join, whose volume is
  * sum_c |cell_c|² — the knob is nlist ∝ corpus/target-cell-size (the
  * SemDeDup design point; 16 here for the harness tables, ~100k for
  * 100 TB). Cosine is the bit-portable [[graft.functions.CosineSimilarity]]
  * fold, so the ≥ tau decision — and therefore every keep bit — matches
  * the oracle exactly.
  */
object SemDedup {
  /** Cosine threshold: ~99th percentile of within-cell pair similarity on
    * the harness embeddings (probed) — removes real near-duplicates
    * without emptying cells. */
  val Tau = 0.3
  /** Cells in the seeded coarse quantizer — the HARNESS value (and the
    * floor [[keepDecisionsAuto]] never goes below). The production knob is
    * [[TargetCellSize]]: nlist grows with the corpus so the within-cell
    * self-join volume Σ|cell|² ≈ n·targetCellSize stays linear in n. */
  val Nlist = 16
  /** Production default: intended members per cell. At ~10¹⁰ docs this
    * yields nlist ≈ 2.4·10⁶ cells — the SemDeDup paper's design point
    * (cluster count ∝ corpus size, pairwise work bounded per cell). */
  val TargetCellSize = 4096

  /** (id, cell, kept) for every non-null vector: kept=false iff dominated
    * by a lower id in the same cell at cosine ≥ tau.
    *
    * `centroids` picks the coarse quantizer: null (the registered q78
    * path) seeds cells from the first-nlist-id vectors — every stage
    * oracle-portable; a trained matrix (e.g. [[Ivf.trainedMatrix]]) drops
    * in unchanged because everything downstream of the cell column is
    * centroid-agnostic. */
  def keepDecisions(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
      tau: Double = Tau, nlist: Int = Nlist,
      centroids: Array[Array[Double]] = null): DataFrame = {
    val indexable = corpus.filter(col(vecCol).isNotNull)
    val cellMatrix = Option(centroids).getOrElse(
      indexable
        .orderBy(col(idCol))
        .limit(nlist)
        .select(col(vecCol))
        .collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble)))
    require(cellMatrix.nonEmpty, "empty corpus: no vectors to build cells from")
    val assigned = indexable.select(col(idCol), col(vecCol),
      element_at(nearest_cells(col(vecCol), cellMatrix, 1), 1).as("cell"))
    val left = assigned.select(col("cell"), col(idCol).as("id"), col(vecCol).as("va"))
    val right = assigned.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    val dominated = left
      .join(right, Seq("cell"))
      .filter(col("id_b") < col("id"))
      .filter(cosine_sim(col("va"), col("vb")) >= tau)
      .select(col("id"))
      .distinct()
      .withColumn("dom", lit(true))
    assigned
      .select(col(idCol), col("cell"))
      .join(dominated.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("dom").isNull.as("kept"))
  }

  /** Production entry point: nlist derived from the corpus size
    * (`max(Nlist, ⌈n / targetCellSize⌉)` — the SemDeDup scale knob made
    * explicit) and, by default, TRAINED centroids from [[Ivf.trainedMatrix]]
    * (seed → one Lloyd refinement, the same distributed
    * CentroidAggregator the IVF build uses). Trained cells track the data
    * distribution, so occupancy is far more even than first-id seeds —
    * which is what actually bounds the within-cell Σ|cell|² at 100 TB.
    * The corpus count is one cheap aggregate; everything downstream is
    * [[keepDecisions]] unchanged. Trained float-mean centroids are not
    * oracle-portable (q78 stays on the seeded path); AnnSpec pins this
    * variant's invariants instead. */
  def keepDecisionsAuto(spark: SparkSession, corpus: DataFrame, idCol: String, vecCol: String,
      tau: Double = Tau, targetCellSize: Int = TargetCellSize,
      trained: Boolean = true, dim: Int = 64): DataFrame = {
    require(targetCellSize > 0, "targetCellSize must be positive")
    val indexable = corpus.filter(col(vecCol).isNotNull)
    val n = indexable.count()
    val nlist = math.max(Nlist.toLong, (n + targetCellSize - 1) / targetCellSize)
      .min(Int.MaxValue).toInt
    val centroids =
      if (trained) Ivf.trainedMatrix(spark, corpus, idCol, vecCol, nlist, dim) else null
    keepDecisions(spark, corpus, idCol, vecCol, tau, nlist, centroids)
  }
}
