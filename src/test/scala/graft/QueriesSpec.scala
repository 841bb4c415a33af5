package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the full driver contract: every registered query runs at
  * sf0.001 and returns a sane frame. Exact values are covered by the
  * DuckDB oracle gate (tools/check_oracle.py). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  private val mayBeEmpty = Set.empty[String]

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is non-empty at sf0.001") {
      val df = fn(spark, TestSpark.SfDir)
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(df.count() > 0, s"$name returned 0 rows")
      else df.count()
    }
  }
}
