package graft.analytics

import graft.similarity.Ann

/** DuckDB SQL generators for the vector/ANN oracle family.
  *
  * Both engines fold cosine terms left-to-right in IEEE double —
  * [[graft.functions.CosineSimilarity]] runs `dot += x*y; na += x*x;
  * nb += y*y` over the float elements widened to double, and DuckDB's
  * `list_reduce` is the same left fold (`0 + p1 == p1` exactly, so the
  * missing explicit zero seed changes nothing) — so the oracle recomputes
  * the SAME arithmetic on the SAME parquet floats and the scores compare
  * bit-for-bit, ranks included.
  *
  * Hyperplanes are embedded as literal DOUBLE[] VALUES generated from the
  * very `Ann.hyperplanes` call the engine uses: `Double.toString` emits the
  * shortest decimal that round-trips, and DuckDB parses decimal literals to
  * the nearest double, so the planes are bit-identical on both sides (the
  * same generate-the-oracle-from-the-engine-params pattern as
  * `minhashParamValues`).
  */
private[analytics] object VectorOracles {

  /** Left-fold sum, matching the expressions' `acc += term` loop. */
  private def foldSum(terms: String): String =
    s"list_reduce($terms, (acc, v) -> acc + v)"

  private def prodList(a: String, b: String): String =
    s"list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))"

  /** cosine(a, b) with NULL on zero norms — bit-identical to
    * [[graft.functions.CosineSimilarity]] (dot / sqrt(na * nb), one
    * multiply, one sqrt, one divide — each correctly rounded IEEE ops in
    * both engines). */
  def cosine(a: String, b: String): String = {
    val dot = foldSum(prodList(a, b))
    val na = foldSum(prodList(a, a))
    val nb = foldSum(prodList(b, b))
    s"(CASE WHEN $na = 0 OR $nb = 0 THEN NULL ELSE ($dot) / sqrt(($na) * ($nb)) END)"
  }

  /** The (table, bit, plane) rows as a DuckDB VALUES list. */
  private def planeValues(tables: Int, bits: Int, dim: Int, seed: Long): String = {
    val planes = Ann.hyperplanes(tables, bits, dim, seed)
    (for { t <- 0 until tables; b <- 0 until bits } yield {
      val lit = planes(t)(b).map(_.toString).mkString(", ")
      s"($t, $b, [$lit]::DOUBLE[])"
    }).mkString(",\n")
  }

  /** WITH-fragment `pl` (planes) + `bk` (id, table_idx, bucket) replicating
    * [[graft.functions.HyperplaneBuckets]]: bit b of a table's bucket is set
    * iff the left-fold dot of the vector with plane (t, b) is > 0. */
  def bucketCte(tables: Int, bits: Int, dim: Int, seed: Long): String = {
    val dot = foldSum(
      "list_transform(range(1, len(e.embedding) + 1), i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i])")
    s"""pl(t, b, p) AS (VALUES ${planeValues(tables, bits, dim, seed)}),
       |bk AS (SELECT e.vec_id AS id, pl.t AS table_idx,
       |  CAST(SUM(CASE WHEN $dot > 0 THEN (CAST(1 AS BIGINT) << pl.b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
       |  FROM embeddings e CROSS JOIN pl
       |  WHERE e.embedding IS NOT NULL
       |  GROUP BY e.vec_id, pl.t)""".stripMargin
  }

  /** WITH-fragments `pl` (planes), `pd` (per-(vec, table, bit) left-fold
    * dots), `bk` (sign-bit keys, as [[bucketCte]]), `fb` (the
    * lowest-|dot| bit per (vec, table) — ties to the lowest bit index,
    * exactly [[graft.functions.HyperplaneProbes]]' strict-< scan), and
    * `pr` (the two-probe set: bucket ∪ bucket ^ (1<<bmin)). */
  def probeCte(tables: Int, bits: Int, dim: Int, seed: Long): String = {
    val dot = foldSum(
      "list_transform(range(1, len(e.embedding) + 1), i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i])")
    s"""pl(t, b, p) AS (VALUES ${planeValues(tables, bits, dim, seed)}),
       |pd AS (SELECT e.vec_id AS id, pl.t, pl.b, $dot AS dot
       |  FROM embeddings e CROSS JOIN pl WHERE e.embedding IS NOT NULL),
       |bk AS (SELECT id, t, CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << b)
       |    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket FROM pd GROUP BY 1, 2),
       |fb AS (SELECT id, t, b AS bmin FROM (
       |    SELECT id, t, b, ROW_NUMBER() OVER (PARTITION BY id, t ORDER BY ABS(dot), b) AS rn
       |    FROM pd) WHERE rn = 1),
       |pr AS (SELECT id, t, bucket FROM bk
       |  UNION SELECT bk.id, bk.t, xor(bk.bucket, CAST(1 AS BIGINT) << fb.bmin)
       |  FROM bk JOIN fb ON bk.id = fb.id AND bk.t = fb.t)""".stripMargin
  }

  /** L2 norm — the same x² left fold as [[graft.functions.L2Norm]]
    * (sqrt of a sum of squares; 0.0, not NULL, for a zero vector). */
  def l2norm(a: String): String =
    s"sqrt(${foldSum(prodList(a, a))})"

  /** Top-k rank per query over a CTE `s(query_id, neighbor_id, cosine)` —
    * ties break (cosine DESC, neighbor_id ASC), exactly the
    * `TopKAggregator.better` order. */
  def topKTail(k: Int): String =
    s"""rk AS (SELECT query_id, neighbor_id, cosine,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM s WHERE cosine IS NOT NULL)
       |SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS "rank", cosine
       |FROM rk WHERE rn <= $k ORDER BY query_id, rn""".stripMargin
}
