package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Great-Expectations /
  * dbt-test shape, engine-side): each expectation compiles to ONE
  * aggregate column over the table scan, so an entire suite is a single
  * pass — no per-check scans, no driver loops. The report is one row per
  * expectation: rows checked, violations, violation bp, pass flag.
  *
  * The generalization of the hand-written audits q97 (single-table
  * invariants) and q138 (referential integrity): those stay as the
  * specific production rows; this operator is the reusable API a
  * platform team would actually configure per table.
  *
  * Scale shape: all non-FK checks share ONE map-side-combinable
  * aggregate over one scan; `unique` adds one group-by on its key
  * (count>1 groups — the only shuffle); `fk` adds one key-only anti-join
  * per edge. Everything reduces to an expectation-count-sized report.
  */
object Expectations {

  sealed trait Check { def name: String }
  /** Column is never NULL. */
  case class NotNull(colName: String) extends Check {
    val name = s"not_null($colName)"
  }
  /** Column value ∈ the literal set. */
  case class InSet(colName: String, values: Seq[String]) extends Check {
    val name = s"in_set($colName)"
  }
  /** lo ≤ value ≤ hi (NULLs are not violations — compose with NotNull). */
  case class InRange(colName: String, lo: Long, hi: Long) extends Check {
    val name = s"in_range($colName)"
  }
  /** Value matches the anchored regex (NULL-safe, like InRange). */
  case class Matches(colName: String, regex: String) extends Check {
    val name = s"matches($colName)"
  }
  /** Key column has no duplicates. Violations = rows in oversized groups. */
  case class Unique(colName: String) extends Check {
    val name = s"unique($colName)"
  }

  private def violation(c: Check): Column = c match {
    case NotNull(col0) => when(col(col0).isNull, 1L).otherwise(0L)
    case InSet(col0, vs) =>
      when(col(col0).isNull || !col(col0).isin(vs: _*), 1L).otherwise(0L)
    case InRange(col0, lo, hi) =>
      when(col(col0).isNotNull && !(col(col0) >= lo && col(col0) <= hi), 1L).otherwise(0L)
    case Matches(col0, re) =>
      when(col(col0).isNotNull && !col(col0).rlike(re), 1L).otherwise(0L)
    case Unique(_) =>
      throw new IllegalArgumentException("Unique handled separately")
  }

  /** Run a suite over one table: (expectation, n_rows, n_violations,
    * violation_bp, passed), ordered by expectation name. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val (uniques, rowChecks) = checks.partition(_.isInstanceOf[Unique])
    val base =
      if (rowChecks.isEmpty) Seq.empty[DataFrame]
      else {
        val agg = df.agg(count(lit(1)).as("n_rows"),
          rowChecks.map(c => sum(violation(c)).as(s"v_${c.name}")): _*)
        Seq(agg.select(explode(array(rowChecks.map(c =>
          struct(lit(c.name).as("expectation"), col("n_rows"),
            col(s"v_${c.name}").as("n_violations"))): _*)).as("r"))
          .select(col("r.expectation"), col("r.n_rows"), col("r.n_violations")))
      }
    val uniqueReports = uniques.collect { case u @ Unique(key) =>
      df.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_violations"))
        .select(lit(u.name).as("expectation"), col("n_rows"), col("n_violations"))
    }
    (base ++ uniqueReports)
      .reduce(_.unionByName(_))
      .select(col("expectation"), col("n_rows"), col("n_violations"),
        expr("n_violations * 10000L div n_rows").as("violation_bp"),
        (col("n_violations") === 0L).as("passed"))
      .orderBy(col("expectation"))
  }
}
