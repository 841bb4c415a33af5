package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Ann

/** ANN: brute-force correctness vs driver-side math; LSH recall bounds. */
class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def embs = Tables.embeddings(spark, TestSpark.SfDir)
  def queries = embs.filter($"vec_id" % 100 === 0) // 5 probes at sf0.001

  def scalaCos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    dot / math.sqrt(na * nb)
  }

  lazy val all = embs.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()

  def trueTopK(q: Long, k: Int): Seq[Long] = {
    val qv = all.find(_._1 == q).get._2
    all.filter(_._1 != q)
      .map { case (id, v) => (id, scalaCos(qv, v)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(k).map(_._1).toSeq
  }

  test("bruteForceTopK returns the exact top-10 per query") {
    val got = Ann
      .bruteForceTopK(queries, embs, "vec_id", "embedding", k = 10)
      .orderBy($"query_id", $"rank")
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    got.foreach { case (q, neighbors) => assert(neighbors == trueTopK(q, 10)) }
    assert(got.size == queries.count())
  }

  test("lshTopK finds a usable fraction of true neighbors (recall@10)") {
    val got = Ann
      .lshTopK(queries, embs, "vec_id", "embedding", k = 10)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = got.map { case (q, found) =>
      val truth = trueTopK(q, 10).toSet
      found.intersect(truth).size.toDouble / truth.size
    }
    assert(recalls.nonEmpty)
    val mean = recalls.sum / recalls.size
    assert(mean > 0.2, s"mean recall@10 = $mean")
  }

  test("ivf finds a usable fraction of true neighbors and never fabricates scores") {
    val got = graft.similarity.Ivf
      .topK(spark, queries, embs, "vec_id", "embedding", k = 10, nlist = 8, nprobe = 3)
      .select($"query_id", $"neighbor_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    val byQuery = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = byQuery.map { case (q, found) =>
      val truth = trueTopK(q, 10).toSet
      found.intersect(truth).size.toDouble / truth.size
    }
    assert(recalls.nonEmpty)
    assert(recalls.sum / recalls.size > 0.2, s"mean ivf recall = ${recalls.sum / recalls.size}")
    // exact re-scoring: every reported cosine matches driver-side math
    val vecs = all.toMap
    got.foreach { case (q, nId, s) => assert(s == scalaCos(vecs(q), vecs(nId))) }
  }

  test("top-k ranking is a map-side typed aggregate, not a corpus-wide Window") {
    val plan = Ann.bruteForceTopK(queries, embs, "vec_id", "embedding", k = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"top-k plan still windows the scored set:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected typed partial aggregate:\n$plan")
  }

  test("ivf cell assignment is map-only: zero Exchange nodes before the cell join") {
    val (assigned, _) = graft.similarity.Ivf
      .build(spark, embs, "vec_id", "embedding", nlist = 8)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"IVF assign plan shuffles:\n$plan")
    // Every row lands in a valid cell.
    val cells = assigned.select($"cell").distinct().as[Int].collect().toSet
    assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < 8))
    assert(assigned.count() == embs.count())
  }

  test("SemDedup keep bits match the driver-side reference exactly") {
    import graft.similarity.SemDedup
    val vecs = all.toMap
    val seeds = all.map(_._1).sorted.take(SemDedup.Nlist).map(vecs)
    def cellOf(v: Array[Float]): Int =
      seeds.zipWithIndex
        .map { case (s, i) => (scalaCos(v, s), i) }
        .minBy { case (sim, i) => (-sim, i) }
        ._2
    val wantCell = all.map { case (id, v) => id -> cellOf(v) }.toMap
    val wantDropped = all.filter { case (id, v) =>
      all.exists { case (jd, w) =>
        jd < id && wantCell(jd) == wantCell(id) && scalaCos(w, v) >= SemDedup.Tau
      }
    }.map(_._1).toSet
    val got = SemDedup
      .keepDecisions(spark, embs, "vec_id", "embedding")
      .as[(Long, Int, Boolean)]
      .collect()
    assert(got.length == all.length)
    got.foreach { case (id, cell, kept) =>
      assert(cell == wantCell(id), s"vec $id cell")
      assert(kept == !wantDropped(id), s"vec $id kept")
    }
    // Non-vacuous at the harness SF, and the lowest id per cell survives.
    assert(wantDropped.nonEmpty)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.minBy(_._1)._3, "lowest id in a cell was dropped")
    }
  }

  test("SemDedup auto: nlist scales with the corpus and invariants hold under a trained quantizer") {
    import graft.similarity.SemDedup
    // Plant an exact duplicate: identical vectors score identically against
    // every centroid (same argmax cell under ANY quantizer), and cosine 1 ≥
    // tau means the higher id must always be dropped.
    val base = all.toSeq
    val planted = base :+ (999999L, base.head._2.clone())
    val df = planted.toDF("vec_id", "embedding")
    val target = 16
    val wantNlist = math.max(SemDedup.Nlist,
      ((planted.size + target - 1) / target)) // 501/16 → 32, above the 16 floor
    assert(wantNlist > SemDedup.Nlist, "test corpus too small to exercise the knob")
    val got = SemDedup
      .keepDecisionsAuto(spark, df, "vec_id", "embedding", targetCellSize = target)
      .as[(Long, Int, Boolean)]
      .collect()
    assert(got.length == planted.size)
    // The derived quantizer really has wantNlist slots…
    val cells = got.map(_._2)
    assert(cells.forall(c => c >= 0 && c < wantNlist), s"cell out of [0, $wantNlist)")
    // …and the scale knob holds: average occupancy ≤ targetCellSize.
    assert(planted.size.toDouble / wantNlist <= target)
    // Dominance invariants are quantizer-agnostic: the minimum id of every
    // cell is kept (no lower id exists to dominate it)…
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.minBy(_._1)._3, "lowest id in a cell was dropped")
    }
    // …and the planted exact duplicate is dropped.
    assert(!got.find(_._1 == 999999L).get._3, "planted exact duplicate survived")
  }

  test("SemDedup trained vs seeded keep sets: same partition shape, both catch the duplicate") {
    import graft.similarity.SemDedup
    val base = all.toSeq
    val planted = base :+ (999999L, base.head._2.clone())
    val df = planted.toDF("vec_id", "embedding")
    val nlist = 32
    def drops(trained: Boolean): Set[Long] = {
      val d =
        if (trained) SemDedup.keepDecisionsAuto(spark, df, "vec_id", "embedding",
          targetCellSize = (planted.size + nlist - 1) / nlist, trained = true)
        else SemDedup.keepDecisions(spark, df, "vec_id", "embedding", nlist = nlist)
      val rows = d.as[(Long, Int, Boolean)].collect()
      assert(rows.length == planted.size) // both paths emit one decision per vector
      rows.filterNot(_._3).map(_._1).toSet
    }
    val seededDrops = drops(trained = false)
    val trainedDrops = drops(trained = true)
    info(s"drops: seeded=${seededDrops.size} trained=${trainedDrops.size}")
    assert(seededDrops.contains(999999L) && trainedDrops.contains(999999L))
    assert(seededDrops.nonEmpty && trainedDrops.nonEmpty)
  }

  test("k-means inertia trace: exact iter-0 row, claim holds, assignment is map-only") {
    val t = graft.similarity.Kmeans
      .inertiaTrace(spark, embs, "vec_id", "embedding", k = 8, iters = 3)
      .as[(Int, Option[Long], Boolean)].collect().sortBy(_._1)
    assert(t.map(_._1).toSeq == Seq(0, 1, 2))
    assert(t.head._2.exists(_ > 0), "iter-0 inertia missing or zero")
    assert(t.tail.forall(_._2.isEmpty), "trained-iteration inertia leaked into the surface")
    assert(t.forall(_._3), "Lloyd monotonicity claim violated")
    // Driver-side iter-0 cross-check: sum of min-L2² to the first-8 seeds.
    val seeds = all.sortBy(_._1).take(8).map(_._2)
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0
      a.indices.foreach { i => val d = a(i).toDouble - b(i).toDouble; acc += d * d }
      acc
    }
    val want = all.map { case (_, v) => math.floor(seeds.map(s => l2sq(v, s)).min * 1e6).toLong }.sum
    assert(t.head._2.get == want, s"iter-0 inertia ${t.head._2.get} != driver-side $want")
  }

  test("lsh results never outrank brute force (candidates are re-scored exactly)") {
    val brute = Ann.bruteForceTopK(queries, embs, "vec_id", "embedding", k = 1)
      .filter($"rank" === 1)
      .select($"query_id", $"cosine").as[(Long, Double)].collect().toMap
    Ann.lshTopK(queries, embs, "vec_id", "embedding", k = 1)
      .filter($"rank" === 1)
      .select($"query_id", $"cosine").as[(Long, Double)].collect()
      .foreach { case (q, s) => assert(s <= brute(q) + 1e-12) }
  }
}
