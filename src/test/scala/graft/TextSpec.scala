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

  test("PII redaction replaces synthetic emails/phones and counts them") {
    val rows = Seq(
      "contact alice.smith+spam@example.co.uk or call +1 (555) 123-4567 now",
      "two mails a@b.io c_d%e@f-g.com and digits 12345678901",
      "clean text with no pii at all").toDF("text")
      .select(
        TextAnalysis.emailCount($"text").as("e"),
        TextAnalysis.phoneCount($"text").as("p"),
        TextAnalysis.redactPii($"text").as("r"))
      .as[(Long, Long, String)].collect()
    assert(rows(0)._1 == 1 && rows(0)._2 == 1)
    assert(rows(0)._3 == "contact <EMAIL> or call <PHONE> now")
    assert(rows(1)._1 == 2 && rows(1)._2 == 1)
    assert(rows(1)._3 == "two mails <EMAIL> <EMAIL> and digits <PHONE>")
    assert(rows(2)._1 == 0 && rows(2)._2 == 0)
    assert(rows(2)._3 == "clean text with no pii at all")
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
