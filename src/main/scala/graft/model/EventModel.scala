package graft.model

import org.apache.spark.sql.types._

/** The reference's event data model, both generations (SURVEY.md §0.1, §1).
  *
  * Gen 1 (checked-in scripts): reference game_api.py:20–34 emits
  * `{event_type, sword_type|guild_name}` plus all HTTP headers
  * (game_api.py:11). Gen 2 (README-embedded, canonical): README.md:258–292
  * emits `{event_type, direction, event_detail}`. All wire fields are
  * strings (reference rpg_spark_stream.py:21–28, README.md:338–345) —
  * deliberately schema-on-read: unknown JSON keys drop, missing keys null.
  */
object EventModel {

  /** Gen-2 wire payload (README.md:338–345). */
  case class GameEvent(
      Accept: String,
      Host: String,
      `User-Agent`: String,
      event_type: String,
      direction: String,
      event_detail: String)

  /** Gen-1 wire payload (rpg_spark_stream.py:21–28). */
  case class GameEventV1(
      Accept: String,
      Host: String,
      `User-Agent`: String,
      event_type: String,
      sword_type: String,
      guild_name: String)

  /** The landed `valid_events` record: raw payload + ingest timestamp +
    * flattened fields (README.md:396–405). Timestamp kept both as the
    * reference's string form and as a true TimestampType twin so
    * event-time operators work without re-parsing. */
  case class ValidEvent(
      raw_event: String,
      timestamp: String,
      event_time: java.sql.Timestamp,
      Accept: String,
      Host: String,
      `User-Agent`: String,
      event_type: String,
      direction: String,
      event_detail: String)

  /** Gen-2 from_json schema — StringType-only for fidelity (SURVEY.md §1.3). */
  val gen2Schema: StructType = StructType(
    Seq("Accept", "Host", "User-Agent", "event_type", "direction", "event_detail")
      .map(StructField(_, StringType, nullable = true)))

  /** Gen-1 from_json schema (rpg_spark_stream.py:21–28). */
  val gen1Schema: StructType = StructType(
    Seq("Accept", "Host", "User-Agent", "event_type", "sword_type", "guild_name")
      .map(StructField(_, StringType, nullable = true)))

  /** Kafka-envelope shape delivered by Spark's Kafka source (SURVEY.md §1.1):
    * we only ever touch `value` and `timestamp`. */
  val kafkaValueSchema: StructType = StructType(Seq(
    StructField("value", BinaryType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true)))

  /** The FULL record schema of Spark's Kafka source (kafka-0-10-sql
    * KafkaRecordToRowConverter — public connector contract). Used to pin
    * the analyzed plan of the S1/S2 builders via the test stand-in
    * provider (no kafka jar ships in this sandbox). */
  val kafkaEnvelopeSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))

  // Gen-2 event_type vocabulary (README.md:254, 261, 279).
  val SwordEvent = "sword_event"
  val GuildEvent = "guild_event"
  val DefaultEvent = "default"
  // Gen-1 vocabulary (game_api.py:16, 23, 31).
  val PurchaseSword = "purchase_sword"
  val JoinGuild = "join_guild"

  val ValidEventTypes: Seq[String] = Seq(SwordEvent, GuildEvent)
}
