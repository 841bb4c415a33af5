package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (guide: one per suite; we share
  * across suites since sbt forks a single test JVM). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session(cores = 8, appName = "graft-test")
  val SfDir = "/root/testdata/sf0.001"
}
