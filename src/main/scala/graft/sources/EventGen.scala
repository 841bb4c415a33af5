package graft.sources

import java.sql.Timestamp

/** Deterministic event generator replacing the reference's Flask + Apache
  * Bench protocol (game_api.py:10–34, README.md:677–737): N events per
  * (host, event_type) with fixed seeds, so the reference's manual
  * count-reconciliation checks (README.md:759–791) become exact
  * assertions.
  */
object EventGen {

  /** One wire event as the Gen-2 JSON payload (README.md:261–263). */
  def json(eventType: String, direction: String, detail: String, host: String): String =
    s"""{"Accept": "*/*", "Host": "$host", "User-Agent": "graft-gen/1.0", """ +
      s""""event_type": "$eventType", "direction": "$direction", "event_detail": "$detail"}"""

  /** Mirror of `ab -n count -H "Host: <host>"` against one route: `count`
    * identical events from one host (README.md:677). */
  def burst(eventType: String, direction: String, detail: String, host: String,
      count: Int): Seq[String] =
    Seq.fill(count)(json(eventType, direction, detail, host))

  /** The reference's full verification corpus: per-host bursts of sword and
    * guild events plus `default` noise, with deterministic ingest
    * timestamps at a fixed cadence. Returns (rawJson, kafkaTimestamp). */
  def corpus(
      swordPerHost: Map[String, Int],
      guildPerHost: Map[String, Int],
      defaults: Int = 5,
      start: Timestamp = Timestamp.valueOf("2024-01-01 00:00:00"),
      stepMs: Long = 100L): Seq[(String, Timestamp)] = {
    val swords = swordPerHost.toSeq.sortBy(_._1).flatMap { case (h, n) =>
      burst("sword_event", "increase", "wood", h, n)
    }
    val guilds = guildPerHost.toSeq.sortBy(_._1).flatMap { case (h, n) =>
      burst("guild_event", "increase", "starter guild", h, n)
    }
    val noise = Seq.fill(defaults)("""{"event_type": "default"}""")
    (swords ++ guilds ++ noise).zipWithIndex.map { case (j, i) =>
      (j, new Timestamp(start.getTime + i * stepMs))
    }
  }

  /** Malformed / adversarial payloads for schema-on-read tests: unknown
    * keys, missing keys, invalid JSON, unicode. */
  val malformed: Seq[String] = Seq(
    """{"event_type": "sword_event", "direction": "increase", "event_detail": "wood", "extra_key": "dropped"}""",
    """{"direction": "increase"}""",
    """not json at all""",
    """{"event_type": "sword_event", "event_detail": "こんにちは"}""",
    "")
}
