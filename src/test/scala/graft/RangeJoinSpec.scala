package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Binned range join: row-for-row equal to the nested-loop range
  * predicate, without the nested-loop plan. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def li = Tables.lineitem(spark, TestSpark.SfDir)
    .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
  def parts = Tables.part(spark, TestSpark.SfDir)
    .select($"p_partkey", $"p_retailprice")

  test("matches Spark's own range-predicate join exactly") {
    val binned = RangeJoin
      .inner(li, parts,
        value = $"l_extendedprice",
        lo = $"p_retailprice" * 10,
        hi = $"p_retailprice" * 10 + 50,
        binWidth = 50.0)
      .select($"p_partkey", $"l_orderkey", $"l_linenumber")
      .as[(Long, Long, Long)].collect().toSet
    val nested = li
      .join(parts,
        $"l_extendedprice" >= $"p_retailprice" * 10 &&
          $"l_extendedprice" < $"p_retailprice" * 10 + 50)
      .select($"p_partkey", $"l_orderkey", $"l_linenumber")
      .as[(Long, Long, Long)].collect().toSet
    assert(binned == nested)
    assert(binned.nonEmpty)
  }

  test("plan is an equi-join on bins, not a nested loop") {
    val plan = RangeJoin
      .inner(li, parts, $"l_extendedprice",
        $"p_retailprice" * 10, $"p_retailprice" * 10 + 50, 50.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on the bin key:\n$plan")
  }

  test("intervals spanning multiple bins still match (bin boundary cases)") {
    val left = Seq(0.0, 49.9, 50.0, 99.9, 100.0, 149.9, 250.0).toDF("v")
    val right = Seq((1L, 40.0, 160.0), (2L, 50.0, 100.0), (3L, 200.0, 201.0))
      .toDF("rid", "lo", "hi")
    val got = RangeJoin.inner(left, right, $"v", $"lo", $"hi", binWidth = 50.0)
      .select($"rid", $"v").as[(Long, Double)].collect().toSet
    val want = Set(
      (1L, 49.9), (1L, 50.0), (1L, 99.9), (1L, 100.0), (1L, 149.9),
      (2L, 50.0), (2L, 99.9)) // hi exclusive: 100.0 not in [50,100); 250 matches nothing
    assert(got == want)
  }
}
