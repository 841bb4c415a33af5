package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counts: whitespace and BPE-ish regex") {
    val r = Seq("hello, world42 x!").toDF("text")
      .select(
        size(TextAnalysis.tokens($"text")).as("ws"),
        TextAnalysis.bpeTokenCount($"text").as("bpe"))
      .as[(Int, Long)].head()
    assert(r._1 == 3) // "hello,", "world42", "x!"
    assert(r._2 == 6) // hello , world 42 x !
  }

  test("langId picks the profile with most stopword hits") {
    val r = Seq(
      "the cat sat on the mat and it is nice",
      "el perro y la casa en que vivo",
      "qwerty zxcvb").toDF("text")
      .select(TextAnalysis.langId($"text")).as[String].collect()
    assert(r(0) == "en")
    assert(r(1) == "es")
    assert(r(2) == "und")
  }

  test("quality metrics are well-formed on real documents") {
    val m = TextAnalysis
      .qualityMetrics(Tables.documents(spark, TestSpark.SfDir))
      .select($"n_tokens", $"avg_token_len", $"stopword_ratio")
      .as[(Int, Double, Double)].collect()
    m.foreach { case (n, avg, ratio) =>
      assert(n > 0)
      assert(avg > 0 && avg < 30)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("quality score stays in [0,1]") {
    val bad = TextAnalysis.qualityScore(Tables.documents(spark, TestSpark.SfDir))
      .filter($"quality_score" < 0 || $"quality_score" > 1).count()
    assert(bad == 0)
  }

  test("rolling fingerprint is order-sensitive; md5 fingerprint is content-exact") {
    val r = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(
        TextAnalysis.rollingFingerprint($"text").as("roll"),
        TextAnalysis.contentFingerprint($"text").as("md5"))
      .as[(Long, String)].collect()
    assert(r(0)._1 == r(2)._1 && r(0)._2 == r(2)._2)
    assert(r(0)._1 != r(1)._1) // reordering changes the rolling hash
  }
}
