package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.{Mp4, Multimodal}
import graft.similarity.Ann
import graft.text.TextAnalysis

/** Training-data pipeline queries: dedup, similarity, text analysis,
  * multimodal (builder contract "beyond the reference" operators).
  *
  * Oracle policy: anything whose arithmetic is engine-portable (int math,
  * single double divisions, md5) gets a DuckDB oracle. Engine-specific
  * hashing (xxhash64) and float accumulation (cosine) are rows-only here
  * and exactness-tested in ScalaTest against in-engine brute force.
  */
object PipelineQueries
  extends PipelineQueriesP1
  with PipelineQueriesP2
  with PipelineQueriesP3
  with PipelineQueriesP4
  with PipelineQueriesGraph
  with PipelineQueriesRetrieval
  with PipelineQueriesRegistry
  with PipelineOraclesHead
  with PipelineOraclesTailA
  with PipelineOraclesTailB {

  /** Full oracle surface (head ++ tailA ++ tailB — split only by the
    * per-domain registry files; see the trait scaladocs). */
  val oracle: Map[String, String] = oracleHead ++ oracleTailA ++ oracleTailB
}
