package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Md5Hash, PortableHashFunctions}

/** The portable md5-derived hashes are the cross-engine contract for the
  * fingerprint oracle family (q29/q30/q31/q40): these constants were
  * computed independently in DuckDB with the exact SQL emitted by
  * Md5Hash.duckH31/duckH60, so a drift on either side fails here before it
  * fails the driver's oracle compare. */
class PortableHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // DuckDB: fold of strpos over substr(md5(t)) — see Md5Hash.duckSql.
  val duckdbReference: Seq[(String, Long, Long)] = Seq(
    ("hello", 1564557354L, 419982666956583591L),
    ("the", 264514669L, 647465868329588333L),
    ("", 1411222745L, 955282973525019424L))

  test("h31/h60 match DuckDB's md5 hex fold bit-for-bit") {
    duckdbReference.foreach { case (t, h31, h60) =>
      assert(Md5Hash.h31(t.getBytes("UTF-8")) == h31, s"h31($t)")
      assert(Md5Hash.h60(t.getBytes("UTF-8")) == h60, s"h60($t)")
    }
  }

  test("Md5TokenHashes expression matches the driver-side function") {
    val r = Seq(("hello the", 0)).toDF("text", "i")
      .select(
        PortableHashFunctions.md5_token_hashes(split($"text", " "), 31).as("h31s"),
        PortableHashFunctions.md5_token_hashes(split($"text", " "), 60).as("h60s"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(r._1 == Seq(1564557354L, 264514669L))
    assert(r._2 == Seq(419982666956583591L, 647465868329588333L))
  }

  test("rolling fingerprint folds h31 with the documented recurrence") {
    val expected = {
      var acc = 7L
      Seq("hello", "the").foreach { t =>
        acc = (acc * 31L + Md5Hash.h31(t.getBytes("UTF-8"))) % 2147483647L
      }
      acc
    }
    val r = Seq("hello the").toDF("text")
      .select(PortableHashFunctions.rolling_fingerprint(split($"text", " ")))
      .as[Long].head()
    assert(r == expected)
  }

  test("h60 stays in [0, 2^60): simhash bits 60-63 are deterministically 0") {
    val sigs = Tables.documents(spark, TestSpark.SfDir)
      .select(graft.dedup.Dedup.simhash($"text"))
      .as[Long].collect()
    sigs.foreach(s => assert(s >= 0L && s < (1L << 60)))
  }
}
