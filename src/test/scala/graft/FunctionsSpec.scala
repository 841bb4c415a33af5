package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

/** Custom Catalyst expressions vs plain-Scala reference implementations. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def scalaCos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    dot / math.sqrt(na * nb)
  }

  test("cosine_sim matches the reference loop bit-for-bit") {
    val vecs = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f)),
      (Array(1f, 2f, 3f), Array(-1f, 0.5f, 2f)),
      (Array(0.1f, -0.2f, 0.3f), Array(0.3f, 0.2f, -0.1f)))
    val got = vecs.toDF("a", "b").select(cosine_sim($"a", $"b")).as[Double].collect()
    val want = vecs.map { case (a, b) => scalaCos(a, b) }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    assert(math.abs(got(0) - 1.0) < 1e-12)
  }

  test("cosine_sim on real embeddings agrees with collect-side computation") {
    val rows = Tables
      .embeddings(spark, TestSpark.SfDir)
      .filter($"vec_id" < 20)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])]
      .collect()
    val pairs = for (a <- rows; b <- rows if a._1 < b._1) yield (a, b)
    val df = pairs.toSeq
      .map { case ((ia, va), (ib, vb)) => (ia, ib, va, vb) }
      .toDF("ia", "ib", "va", "vb")
    val got = df.select($"ia", $"ib", cosine_sim($"va", $"vb")).as[(Long, Long, Double)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    pairs.foreach { case ((ia, va), (ib, vb)) =>
      assert(got((ia, ib)) == scalaCos(va, vb))
    }
  }

  test("zero-norm vectors yield null, not NaN") {
    val got = Seq((Array(0f, 0f), Array(1f, 1f)))
      .toDF("a", "b").select(cosine_sim($"a", $"b")).collect()
    assert(got.head.isNullAt(0))
  }

  test("dot_product and l2_norm are consistent: dot(v,v) == norm(v)^2") {
    val df = Tables.embeddings(spark, TestSpark.SfDir).limit(50)
    val bad = df
      .select(
        (dot_product($"embedding", $"embedding") - l2_norm($"embedding") * l2_norm($"embedding")).as("d"))
      .filter(abs($"d") > 1e-9)
      .count()
    assert(bad == 0)
  }

  test("simhash64: identical token multisets → identical hash; sign rule holds") {
    val df = Seq(
      "the quick brown fox",
      "the quick brown fox",
      "fox brown quick the", // same multiset, different order → same simhash
      "completely different words here").toDF("text")
    val sigs = df.select(simhash64(transform(split($"text", " "), t => xxhash64(t))))
      .as[Long].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) == sigs(2))
    assert(sigs(0) != sigs(3))
  }

  test("sorted_intersect_size: merge scan over strings and longs, with edges") {
    import graft.functions.VectorFunctions.sorted_intersect_size
    val s = Seq(
      (Seq("a", "b", "c", "d"), Seq("b", "c", "x")),
      (Seq.empty[String], Seq("a")),
      (Seq("a"), Seq("a")))
      .toDF("a", "b")
      .select(sorted_intersect_size($"a", $"b")).as[Int].collect()
    assert(s.toSeq == Seq(2, 0, 1))
    val l = Seq((Seq(1L, 5L, 9L, 12L), Seq(0L, 5L, 12L, 44L)))
      .toDF("a", "b")
      .select(sorted_intersect_size($"a", $"b")).as[Int].head()
    assert(l == 2)
  }

  test("simhash64 single token equals that token's hash bits") {
    val r = Seq("solo").toDF("text")
      .select(
        simhash64(transform(split($"text", " "), t => xxhash64(t))).as("sig"),
        xxhash64(lit("solo")).as("h"))
      .as[(Long, Long)].head()
    assert(r._1 == r._2)
  }
}
