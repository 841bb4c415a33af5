package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** The composed as-of join: inclusive match, per-key isolation, and the
  * atomic-row property — all carried right values come from the SAME
  * matched right row, even when some of its value columns are null. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("picks the latest right row at-or-before, per key, inclusive") {
    val left = Seq(("u1", 10L), ("u1", 25L), ("u2", 5L)).toDF("user", "t")
    val right = Seq(("u1", 10L, "a"), ("u1", 20L, "b"), ("u2", 9L, "c"))
      .toDF("user", "t", "v")
    val out = AsOfJoin.asOf(left, right, "user", "t", "t", Seq("v"))
      .orderBy("user", "t")
      .as[(String, Long, Option[String])].collect().toSeq
    // u1@10 matches right@10 (inclusive), u1@25 matches right@20,
    // u2@5 has no right row at-or-before → null.
    assert(out == Seq(("u1", 10L, Some("a")), ("u1", 25L, Some("b")), ("u2", 5L, None)))
  }

  test("carried values are atomic: a null in one column stays from the matched row") {
    // Latest right row (t=20) has x=null, y=2. Per-column forward-fill
    // would leak x=1 from t=10; the atomic struct carry must report
    // (null, 2) — the matched row as it is.
    val left = Seq(("k", 30L)).toDF("key", "t")
    val right = Seq(
      ("k", 10L, Option(1), Option(9)),
      ("k", 20L, Option.empty[Int], Option(2)))
      .toDF("key", "t", "x", "y")
    val out = AsOfJoin.asOf(left, right, "key", "t", "t", Seq("x", "y"))
      .select(col("asof_x"), col("asof_y"))
      .as[(Option[Int], Option[Int])].head()
    assert(out == ((None, Some(2))))
  }
}
