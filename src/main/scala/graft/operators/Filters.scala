package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.EventModel

/** Filter / predicate operators (SURVEY.md §2.2 F1–F4).
  *
  * Every reference filter is a row-at-a-time Python JSON UDF
  * (filter_swords_stream.py:29–36, README.md:349–356). Here they are native
  * Catalyst expressions over already-parsed columns: single JSON parse,
  * whole-stage codegen, predicate pushdown intact. A `functions.udf`
  * fidelity twin is kept for the reference's exact raw-JSON semantics
  * (throws nothing; malformed JSON → null → dropped, documented divergence
  * from the reference's KeyError, SURVEY.md §7.4).
  */
object Filters {

  /** F2 (Gen 2): is_valid_event — accept sword_event | guild_event
    * (README.md:349–356). Null-safe: null event_type is rejected. */
  val isValidEvent: Column =
    col("event_type").isin(EventModel.ValidEventTypes: _*)

  /** F1 (Gen 1): is_sword_purchase (filter_swords_stream.py:29–36). */
  val isSwordPurchase: Column =
    col("event_type") === EventModel.PurchaseSword

  /** F3: 3-way int classifier: sword → 1, guild → 2, anything else → 3.
    * Single codegen'd CASE, replacing the reference's Python UDF evaluated
    * once per route. */
  def classify3Way(eventType: Column, sword: String, guild: String): Column =
    when(eventType === sword, 1)
      .when(eventType === guild, 2)
      .otherwise(3)

  /** Gen-1 vocabulary (rpg_spark_stream.py:31–40): purchase_sword /
    * join_guild. */
  def classifyEvent(eventType: Column): Column =
    classify3Way(eventType, EventModel.PurchaseSword, EventModel.JoinGuild)

  /** Gen-2 vocabulary (README.md Gen-2 events): sword_event / guild_event —
    * the classifier that composes with [[isValidEvent]]-filtered streams. */
  def classifyEventGen2(eventType: Column): Column =
    classify3Way(eventType, EventModel.SwordEvent, EventModel.GuildEvent)

  /** F1 expressed over the raw JSON string without a prior from_json —
    * the pushdown-friendly single-key probe. */
  def rawJsonTypeIs(rawCol: Column, eventType: String): Column =
    get_json_object(rawCol, "$.event_type") === eventType

  /** Fidelity twin of the reference's Python UDF surface: a Scala UDF with
    * the same raw-JSON-in, boolean-out shape (filter_swords_stream.py:29).
    * Used only in tests that pin reference behavior; production paths use
    * the native predicates above. */
  val isValidEventUdf =
    udf { raw: String =>
      if (raw == null) false
      else {
        // Cheap structural probe mirroring json.loads + key compare.
        EventModel.ValidEventTypes.exists(t => raw.contains("\"" + t + "\""))
      }
    }

  /** F3 demux: split one parsed stream into the reference's three routes
    * (rpg_spark_stream.py:60–118) without re-reading the source. The three
    * frames partition the input: sword ∪ guild ∪ default = all. */
  def demux(parsed: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val cls = classifyEvent(col("event_type"))
    (parsed.filter(cls === 1), parsed.filter(cls === 2), parsed.filter(cls === 3))
  }
}
