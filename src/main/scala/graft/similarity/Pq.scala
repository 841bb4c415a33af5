package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PqFunctions.{pq_adc_lut, pq_encode}

/** Product quantization (PQ): the compression tier of a 100 TB ANN index.
  *
  * A dim-64 float vector (256 B) becomes m=8 4-bit-capable codes (8 B here,
  * one int column per subspace row) by quantizing each contiguous subspace
  * against its own ksub-entry codebook — 32× less data to scan, and
  * queries score candidates WITHOUT touching vectors again via ADC
  * (asymmetric distance): a per-query lookup table of partial distances to
  * every codebook entry, summed over subspaces.
  *
  * Like [[Ivf.topKSeeded]], the registered-query surface uses SEEDED
  * codebooks — subvectors of the first `ksub` ids — because every stage
  * (slicing, the (x−y)² left fold, argmin with lower-code ties) is exactly
  * replicable in a SQL oracle, where trained k-means codebooks would pin
  * engine-internal float aggregation order. The k-means refinement path
  * would reuse [[Ivf.CentroidAggregator]] per subspace verbatim; encoding
  * and search are codebook-agnostic.
  *
  * Scale shape: codebooks are expression-carried constants (KBs) →
  * encoding is map-only; the ADC LUT is nq·m·ksub rows built map-side from
  * the (small, broadcastable) query set; the per-(query, neighbor) sum is
  * a two-phase aggregate over int-keyed rows; ranking is the map-side
  * bounded [[Ann.TopKAggregator]]. Nothing wide ever shuffles.
  */
object Pq {
  /** Subspace count (codes per vector). */
  val M = 8
  /** Codebook entries per subspace. */
  val Ksub = 16
  /** Embedding dimensionality of the harness tables. */
  val Dim = 64
  /** Dimensions per subspace. */
  val SubDim: Int = Dim / M

  /** Seeded codebooks: codebook `s` = the `s`-th subvector slice of the
    * first `ksub` non-null vectors in id order. A ksub-row collect (the
    * legitimate kind — same as [[Ivf.topKSeeded]]'s seed fetch), never a
    * corpus collect. */
  def seededCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = M, ksub: Int = Ksub, dim: Int = Dim): Array[Array[Array[Double]]] = {
    val subdim = dim / m
    val seeds = corpus
      .filter(col(vecCol).isNotNull)
      .orderBy(col(idCol))
      .limit(ksub)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(seeds.nonEmpty, "empty corpus: no codebook seeds")
    Array.tabulate(m)(s => seeds.map(v => v.slice(s * subdim, (s + 1) * subdim)))
  }

  /** One Lloyd refinement of the seeded codebooks, per subspace: assign
    * every subvector to its nearest seeded entry ([[graft.functions.PqEncode]],
    * map-only), then recompute each entry as the distributed MEAN of its
    * members via [[Ivf.CentroidAggregator]] (two-phase, partials merge
    * map-side — the same aggregate the IVF build uses). Entries that lose
    * all members keep their seeded value, so code ids stay aligned. The
    * collect is m·ksub rows (the codebook itself), never the corpus.
    *
    * Float means are aggregation-order-dependent → NOT oracle-portable;
    * the registered q76 stays on the seeded codebooks and this path is
    * spec-covered (PqSpec: Lloyd monotonicity — trained total
    * reconstruction error ≤ seeded), exactly the q49 `topKSeeded` /
    * `topK` split. */
  def trainedCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = M, ksub: Int = Ksub, dim: Int = Dim): Array[Array[Array[Double]]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val subdim = dim / m
    val seeded = seededCodebooks(corpus, idCol, vecCol, m, ksub, dim)
    val members = corpus
      .filter(col(vecCol).isNotNull)
      .select(posexplode(pq_encode(col(vecCol), seeded)).as(Seq("subspace", "enc")),
        col(vecCol))
      .select(col("subspace"), col("enc.code").as("code"),
        slice(col(vecCol), col("subspace") * subdim + 1, lit(subdim)).as("sub"))
    val centroidOf = org.apache.spark.sql.functions
      .udaf(new Ivf.CentroidAggregator(subdim), ExpressionEncoder[Array[Float]]())
    val trained = seeded.map(_.map(_.clone()))
    members
      .groupBy(col("subspace"), col("code"))
      .agg(centroidOf(col("sub")).as("centroid"))
      .collect()
      .foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
          trained(r.getInt(0))(r.getInt(1)) = r.getSeq[Float](2).toArray.map(_.toDouble)
      }
    trained
  }

  /** Map-only encode to long format: one `(id, subspace, code, dist)` row
    * per subspace, `dist` = the exact squared reconstruction error of that
    * subspace. Null / short vectors are dropped (not encodable). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), posexplode(pq_encode(col(vecCol), codebooks)).as(Seq("subspace", "enc")))
      .filter(col("enc").isNotNull)
      .select(col(idCol), col("subspace"),
        col("enc.code").as("code"), col("enc.dist").as("dist"))

  /** IVFPQ search — the production ANN architecture (FAISS's IndexIVFPQ):
    * route each query to its `nprobe` nearest coarse cells, then score
    * ONLY the candidates in those cells, FROM CODES ONLY, via the
    * [[graft.functions.PqAdcDist]] expression. The corpus is touched
    * twice at build (cell assign + encode, both map-only, fused into one
    * projection here) and never again: the search join carries (cell, id,
    * m codes) per corpus row — at dim=64 that is 96 B of codes versus
    * 256 B of floats, and the scan is bounded by the probed cells, not
    * the corpus. Both quantizers are SEEDED (first-id vectors /
    * subvectors) so every stage — routing, codes, the two-level ADC fold,
    * the (dist asc, id asc) ranking — is bit-replicable in the DuckDB
    * oracle; trained centroids would drop in without touching the search.
    * Returns (query_id, neighbor_id, rank, adc_dist). */
  def ivfPqTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
      codebooks: Array[Array[Array[Double]]] = null): DataFrame = {
    import graft.functions.IvfFunctions.nearest_cells
    import graft.functions.PqFunctions.pq_adc_dist
    val indexable = corpus.filter(col(vecCol).isNotNull)
    val cellMatrix = indexable
      .orderBy(col(idCol))
      .limit(nlist)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(cellMatrix.nonEmpty, "empty corpus: no vectors to build IVF cells from")
    val cbs = Option(codebooks).getOrElse(seededCodebooks(corpus, idCol, vecCol))
    val assigned = indexable.select(
      col(idCol).as("neighbor_id"),
      element_at(nearest_cells(col(vecCol), cellMatrix, 1), 1).as("cell"),
      pq_encode(col(vecCol), cbs).as("enc"))
      .filter(col("enc").isNotNull)
    val routed = queries
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
        explode(nearest_cells(col(vecCol), cellMatrix, math.min(nprobe, cellMatrix.length)))
          .as("cell"))
    val scored = routed
      .join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", pq_adc_dist(col("query_vec"), col("enc"), cbs))
    Ann
      .topKRanked(
        scored.select(col("query_id"), col("neighbor_id"), negate(col("adc_dist")).as("cosine")),
        k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        negate(col("cosine")).as("adc_dist"))
  }

  /** Residual variant of [[ivfPqTopK]] — FAISS IndexIVFPQ parity: PQ
    * quantizes the RESIDUAL `x − centroid(cell)` instead of the raw vector.
    * Residuals concentrate around the origin (the coarse quantizer has
    * already explained the between-cell variance), so one codebook set
    * covers every cell's distribution well and ADC error shrinks as nlist
    * grows — the accuracy gap that made FAISS encode residuals. The query
    * side mirrors it: for each probed cell the query's residual w.r.t.
    * THAT cell's centroid is scored against the candidate codes, so both
    * sides of the ADC fold live in the same residual space.
    *
    * Everything new is elementwise IEEE double arithmetic — the subtract
    * (zip_with over the exactly-widened floats), the residual-seeded
    * codebooks (residual subvectors of the first-ksub ids), the unchanged
    * two-level ADC fold — so the q80 oracle pattern carries over
    * bit-exactly (q81). PqSpec proves the accuracy claim: recall@10
    * against exact L2 ≥ the raw-encoding variant on clustered data.
    * Scale shape is identical to [[ivfPqTopK]]: collects are seed-sized,
    * assign/encode map-only, the search join carries codes only. */
  def ivfPqTopKResidual(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
      m: Int = M, ksub: Int = Ksub, dim: Int = Dim): DataFrame = {
    import graft.functions.IvfFunctions.nearest_cells
    import graft.functions.PqFunctions.pq_adc_dist
    // A residual needs all `dim` components — shorter vectors are not
    // indexable here (the raw path drops them via enc.isNotNull; the
    // subtraction must not see them at all).
    val indexable = corpus.filter(col(vecCol).isNotNull && size(col(vecCol)) >= dim)
    val cellRows = indexable
      .orderBy(col(idCol))
      .limit(nlist)
      .select(col(idCol), col(vecCol))
      .collect()
    val cellIds = cellRows.map(_.get(0))
    val cellMatrix = cellRows.map(_.getSeq[Float](1).toArray.map(_.toDouble))
    require(cellMatrix.nonEmpty, "empty corpus: no vectors to build IVF cells from")
    // x − centroid(cell): float→double widening is exact, the subtract is
    // one correctly-rounded IEEE op per element — bit-portable to the
    // oracle's CAST(x AS DOUBLE) − CAST(c AS DOUBLE).
    def residual(vec: Column, cell: Column): Column = {
      val cells = array(cellMatrix.map(c => typedLit(c)): _*)
      zip_with(vec.cast("array<double>"), element_at(cells, cell + lit(1)), (x, y) => x - y)
    }
    val withRes = indexable
      .select(
        col(idCol).as("neighbor_id"),
        element_at(nearest_cells(col(vecCol), cellMatrix, 1), 1).as("cell"),
        col(vecCol))
      .withColumn("rvec", residual(col(vecCol), col("cell")))
    val subdim = dim / m
    // Codebook seeds come from the RESIDUAL space — and must SKIP the cell
    // seeds: a cell seed's residual is identically zero (it IS its cell's
    // centroid), so seeding from the first ksub ids when ksub == nlist
    // would make every codebook entry the zero vector and the quantizer
    // degenerate. First ksub ids AFTER the cell seeds instead; ksub-row
    // collect, never a corpus. */
    val seeds = withRes
      .filter(!col("neighbor_id").isin(cellIds: _*))
      .orderBy(col("neighbor_id"))
      .limit(ksub)
      .select(col("rvec"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.nonEmpty,
      s"corpus too small for residual codebooks (needs more than $nlist vectors)")
    val cbs = Array.tabulate(m)(s => seeds.map(_.slice(s * subdim, (s + 1) * subdim)))
    val assigned = withRes
      .select(col("neighbor_id"), col("cell"), pq_encode(col("rvec"), cbs).as("enc"))
      .filter(col("enc").isNotNull)
    val routed = queries
      .filter(col(vecCol).isNotNull && size(col(vecCol)) >= dim)
      .select(
        col(idCol).as("query_id"),
        explode(nearest_cells(col(vecCol), cellMatrix, math.min(nprobe, cellMatrix.length)))
          .as("cell"),
        col(vecCol))
      .withColumn("q_rvec", residual(col(vecCol), col("cell")))
    val scored = routed
      .join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", pq_adc_dist(col("q_rvec"), col("enc"), cbs))
    Ann
      .topKRanked(
        scored.select(col("query_id"), col("neighbor_id"), negate(col("adc_dist")).as("cosine")),
        k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        negate(col("cosine")).as("adc_dist"))
  }

  /** ADC top-k: rank corpus vectors for each query by approximate squared
    * L2 distance computed FROM CODES ONLY. The corpus side carries three
    * ints per row; the query side becomes a broadcast LUT; ties and
    * ranking follow (dist asc, neighbor_id asc) via the negated-score
    * [[Ann.TopKAggregator]] (which orders desc). Self-pairs excluded.
    * Returns (query_id, neighbor_id, rank, adc_dist). */
  def adcTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, codebooks: Array[Array[Array[Double]]] = null): DataFrame = {
    val cbs = Option(codebooks).getOrElse(seededCodebooks(corpus, idCol, vecCol))
    val codes = encode(corpus, idCol, vecCol, cbs)
      .select(col(idCol).as("neighbor_id"), col("subspace"), col("code"))
    val lut = queries
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"),
        explode(pq_adc_lut(col(vecCol), cbs)).as("e"))
      .select(col("query_id"), col("e.subspace").as("subspace"),
        col("e.code").as("code"), col("e.partial").as("partial"))
    val summed = codes
      .join(broadcast(lut), Seq("subspace", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("partial")).as("adc_dist"))
    Ann
      .topKRanked(
        summed.select(col("query_id"), col("neighbor_id"), negate(col("adc_dist")).as("cosine")),
        k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        negate(col("cosine")).as("adc_dist"))
  }
}
