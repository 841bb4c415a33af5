package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Pq

/** Product quantization: encode correctness vs driver-side math, seeded
  * codebook invariants, ADC search exactness and usefulness. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def embs = Tables.embeddings(spark, TestSpark.SfDir)

  lazy val cbs = Pq.seededCodebooks(embs, "vec_id", "embedding")
  lazy val all = embs
    .filter($"embedding".isNotNull)
    .select($"vec_id", $"embedding")
    .as[(Long, Array[Float])]
    .collect()
    .toMap

  /** The expression's exact fold, replicated driver-side. */
  def localEncode(v: Array[Float]): Seq[(Int, Double)] =
    (0 until Pq.M).map { s =>
      var bestCode = -1
      var bestDist = Double.PositiveInfinity
      cbs(s).indices.foreach { c =>
        var acc = 0.0
        var j = 0
        while (j < Pq.SubDim) {
          val diff = v(s * Pq.SubDim + j).toDouble - cbs(s)(c)(j)
          acc += diff * diff
          j += 1
        }
        if (bestCode == -1 || acc < bestDist) { bestCode = c; bestDist = acc }
      }
      (bestCode, bestDist)
    }

  test("seeded codebooks have shape m × ksub × subdim, from the first ids") {
    assert(cbs.length == Pq.M)
    assert(cbs.forall(_.length == Pq.Ksub))
    assert(cbs.forall(_.forall(_.length == Pq.SubDim)))
    val firstIds = all.keys.toSeq.sorted.take(Pq.Ksub)
    val seed0 = all(firstIds.head)
    assert(cbs(0)(0).toSeq == seed0.take(Pq.SubDim).map(_.toDouble).toSeq)
  }

  test("encode matches the driver-side argmin bit-for-bit on every vector") {
    val got = Pq
      .encode(embs, "vec_id", "embedding", cbs)
      .as[(Long, Int, Int, Double)]
      .collect()
      .groupBy(_._1)
      .view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq)
      .toMap
    assert(got.keySet == all.keySet)
    got.foreach { case (id, enc) => assert(enc == localEncode(all(id)), s"vec $id") }
  }

  test("a seed vector reconstructs its own subspaces at distance exactly 0") {
    val firstIds = all.keys.toSeq.sorted.take(Pq.Ksub)
    firstIds.foreach { id =>
      val enc = localEncode(all(id))
      assert(enc.forall(_._2 == 0.0), s"seed $id has nonzero reconstruction error")
    }
  }

  test("one Lloyd step never increases total reconstruction error (trained PQ)") {
    def totalErr(c: Array[Array[Array[Double]]]): Double =
      Pq.encode(embs, "vec_id", "embedding", c)
        .agg(sum($"dist")).as[Double].head()
    val trained = Pq.trainedCodebooks(embs, "vec_id", "embedding")
    val seededErr = totalErr(cbs)
    val trainedErr = totalErr(trained)
    assert(trainedErr < seededErr,
      s"Lloyd step did not improve: trained=$trainedErr seeded=$seededErr")
  }

  test("adcTopK distances equal the LUT-sum of the codes (1e-9)") {
    val queries = embs.filter($"vec_id" % 100 === 0)
    val got = Pq
      .adcTopK(queries, embs, "vec_id", "embedding", k = 10, cbs)
      .as[(Long, Long, Int, Double)]
      .collect()
    assert(got.nonEmpty)
    got.foreach { case (q, n, _, adc) =>
      assert(q != n)
      val qv = all(q)
      val codes = localEncode(all(n)).map(_._1)
      val want = (0 until Pq.M).map { s =>
        var acc = 0.0
        var j = 0
        while (j < Pq.SubDim) {
          val diff = qv(s * Pq.SubDim + j).toDouble - cbs(s)(codes(s))(j)
          acc += diff * diff
          j += 1
        }
        acc
      }.sum
      assert(math.abs(adc - want) <= 1e-9, s"($q, $n): adc=$adc want=$want")
    }
    // ranks are 1..k, ascending in distance, per query
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to byRank.length))
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sorted.toSeq)
    }
  }

  test("ivfPqTopK: every ADC distance equals the driver-side two-level fold") {
    val queries = embs.filter($"vec_id" % 100 === 0)
    val got = Pq
      .ivfPqTopK(spark, queries, embs, "vec_id", "embedding", k = 10, codebooks = cbs)
      .as[(Long, Long, Int, Double)]
      .collect()
    assert(got.nonEmpty)
    got.foreach { case (q, n, _, adc) =>
      assert(q != n)
      val qv = all(q)
      val codes = localEncode(all(n)).map(_._1)
      var want = 0.0
      (0 until Pq.M).foreach { s =>
        var acc = 0.0
        var j = 0
        while (j < Pq.SubDim) {
          val diff = qv(s * Pq.SubDim + j).toDouble - cbs(s)(codes(s))(j)
          acc += diff * diff
          j += 1
        }
        want += acc
      }
      assert(adc == want, s"($q, $n): adc=$adc want=$want") // bit-exact, not approx
    }
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to byRank.length))
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sorted.toSeq)
    }
  }

  test("PqAdcDist nulls on codes outside the codebook instead of crashing") {
    import graft.functions.PqFunctions.{pq_adc_dist, pq_encode}
    // Encode against the full 16-entry books, score against 8-entry ones:
    // rows carrying a code ≥ 8 must yield null (the short-vector contract),
    // never an executor ArrayIndexOutOfBounds.
    val smallCbs = cbs.map(_.take(8))
    val scored = embs
      .filter($"embedding".isNotNull)
      .select(pq_adc_dist($"embedding", pq_encode($"embedding", cbs), smallCbs).as("d"))
      .collect() // must not throw
    assert(scored.exists(_.isNullAt(0)), "expected some out-of-range code to null out")
  }

  test("residual IVFPQ ≥ raw IVFPQ recall@10 vs exact L2 (clustered data)") {
    // Clustered corpus — the regime IVFPQ exists for: 16 well-separated
    // centers, points = center + small noise, and ids arranged so the
    // seeded coarse cells (first 16 ids) land one per cluster. Raw PQ must
    // cover the whole spread with one codebook set; residual PQ only has
    // to cover the noise ball, which is why FAISS encodes residuals.
    val rnd = new scala.util.Random(7)
    val dim = Pq.Dim
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian() * 5.0))
    val rows = (0L until 400L).map { i =>
      val c = centers((i % 16).toInt)
      (i, c.map(v => (v + rnd.nextGaussian() * 0.3).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" % 40 === 0)
    val vecs = rows.toMap
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      a.indices.foreach { i => val d = a(i).toDouble - b(i).toDouble; acc += d * d }
      acc
    }
    def meanRecall(found: Map[Long, Set[Long]]): Double = {
      val rs = found.map { case (q, ids) =>
        val truth = vecs.view
          .filterKeys(_ != q)
          .toSeq
          .map { case (id, v) => (id, l2sq(vecs(q), v)) }
          .sortBy { case (id, d) => (d, id) }
          .take(10)
          .map(_._1)
          .toSet
        ids.intersect(truth).size.toDouble / truth.size
      }
      rs.sum / rs.size
    }
    // nprobe = nlist (probe everything) so routing recall is 1 for both
    // variants and the comparison isolates ADC/encoding accuracy.
    def topSets(res: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      res.select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val raw = meanRecall(topSets(
      Pq.ivfPqTopK(spark, queries, df, "vec_id", "embedding", k = 10, nlist = 16, nprobe = 16)))
    val residual = meanRecall(topSets(
      Pq.ivfPqTopKResidual(spark, queries, df, "vec_id", "embedding", k = 10, nlist = 16, nprobe = 16)))
    info(s"recall@10: residual=$residual raw=$raw")
    assert(residual >= raw, s"residual recall $residual < raw recall $raw")
    // Chance = 10/399 ≈ 0.025; seeded 16-entry codebooks over 8-dim
    // subspaces are deliberately coarse, so demand a clear multiple of
    // chance rather than production recall (which needs trained books).
    assert(residual > 8 * (10.0 / 399),
      s"residual recall $residual not meaningfully above chance")
  }

  test("ADC ranking beats chance against exact L2 top-k (recall@10)") {
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      a.indices.foreach { i => val d = a(i).toDouble - b(i).toDouble; acc += d * d }
      acc
    }
    val queries = embs.filter($"vec_id" % 100 === 0)
    val got = Pq
      .adcTopK(queries, embs, "vec_id", "embedding", k = 10, cbs)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    val recalls = got.map { case (q, found) =>
      val qv = all(q)
      val truth = all.view
        .filterKeys(_ != q)
        .toSeq
        .map { case (id, v) => (id, l2sq(qv, v)) }
        .sortBy { case (id, d) => (d, id) }
        .take(10)
        .map(_._1)
        .toSet
      found.intersect(truth).size.toDouble / truth.size
    }
    // Chance = k/(n−1): a random ranking finds ~2% of the true top-10 at
    // sf0.001. Seeded (untrained) codebooks on near-uniform synthetic
    // vectors are the worst case for PQ — require a clear multiple of
    // chance, not production recall (which needs trained codebooks).
    val chance = 10.0 / (all.size - 1)
    val mean = recalls.sum / recalls.size
    assert(mean > 4 * chance, s"mean ADC recall@10 = $mean vs chance $chance")
  }
}
