package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructType}

import graft.model.EventModel

/** Projection / parse / flatten operators (SURVEY.md §2.2 P1–P6, §2.3 X1).
  *
  * The reference parses each event's JSON twice — once in a Python UDF
  * filter, once in from_json (rpg_spark_stream.py:61+64). Here the pipeline
  * is a single native `from_json` followed by codegen'd column ops: one
  * parse, no JVM↔Python hop, filters stay pushdown-able (SURVEY.md §4.2).
  */
object Parse {

  /** P1+P2+P3: Kafka frame → (raw_event string, timestamp string twin +
    * typed event_time). Mirrors rpg_spark_stream.py:61–63 with the typed
    * timestamp kept alongside for event-time ops. */
  def projectRaw(kafkaFrame: DataFrame): DataFrame =
    kafkaFrame.select(
      col("value").cast(StringType).as("raw_event"),
      col("timestamp").cast(StringType).as("timestamp"),
      col("timestamp").as("event_time"))

  /** P4+P5: parse raw_event with a declared schema and flatten the struct
    * (reference README.md:386–388, `select('json.*')`). Schema-on-read:
    * unknown keys drop, missing keys null. */
  def parseAndFlatten(raw: DataFrame, schema: StructType = EventModel.gen2Schema): DataFrame =
    raw
      .withColumn("json", from_json(col("raw_event"), schema))
      .select(col("raw_event"), col("timestamp"), col("event_time"), col("json.*"))

  /** Full Gen-2 ETL: Kafka frame → flattened valid_events relation
    * (README.md:383–388). Works on both batch and streaming frames —
    * the plan is identical; Structured Streaming runs it incrementally. */
  def extractEvents(kafkaFrame: DataFrame): DataFrame =
    parseAndFlatten(projectRaw(kafkaFrame))

  /** X1: dynamic-schema extraction — the reference's RDD Row(**json) trick
    * (filtered_writes.py:39–42) re-expressed as native JSON schema
    * inference over a string Dataset. Batch only (inference needs a full
    * pass); for streaming use the declared-schema path. */
  def inferJson(spark: SparkSession, rawJson: Dataset[String]): DataFrame =
    spark.read.json(rawJson)

  /** Presto-compat column surface: Presto's parser lower-cases unquoted
    * identifiers, so the reference's analysts query `accept`, `host`,
    * `"user-agent"` (reference README.md:603–613) while the wire fields
    * are mixed-case. Fold a fidelity frame to that vocabulary — rename
    * only, zero plan cost, idempotent (non-header columns are already
    * lower-case). Register the result as a view next to the fidelity one
    * and both query surfaces resolve. */
  def prestoFolded(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase(java.util.Locale.ROOT)): _*)

  /** props-style JSON column access (harness `events.props`): single-key
    * extraction without materializing a struct. Codegen'd, no UDF. */
  def jsonKey(propsCol: Column, key: String): Column =
    get_json_object(propsCol, s"$$.$key")

  /** props column as a full map, for multi-key access in one parse. */
  def jsonAsMap(propsCol: Column): Column =
    from_json(propsCol, MapType(StringType, StringType))
}
