package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Filters, Parse}
import graft.sources.EventSources

/** Property-based tests (SURVEY.md §5.2): parsing is total, schema-on-read
  * drops unknowns, and the filter partition law holds for arbitrary JSON —
  * including malformed, unicode, extra/missing keys. (ScalaCheck Gen
  * sampled with fixed seeds; the scalatest bridge artifact isn't in the
  * offline cache, so sampling is driven manually.) */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val keyGen: Gen[String] = Gen.oneOf(
    "event_type", "direction", "event_detail", "Host", "zzz_unknown", "漢字キー")
  val valGen: Gen[String] = Gen.oneOf(
    "sword_event", "guild_event", "default", "", "héllo wörld", "plain", "こんにちは")
  val jsonGen: Gen[String] = Gen.oneOf(
    Gen.mapOf(Gen.zip(keyGen, valGen)).map { m =>
      m.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
    },
    Gen.alphaNumStr,
    Gen.const(""),
    Gen.const("[1,2,3]"),
    Gen.const("{\"event_type\": 42}")) // wrong type for a declared field

  private def samples(n: Int): Seq[List[String]] =
    (0 until n).flatMap { i =>
      Gen.listOfN(20, jsonGen)(Gen.Parameters.default, Seed(42L + i))
    }

  test("parse is total and schema-stable for arbitrary payloads") {
    samples(10).foreach { payloads =>
      val rows = payloads.zipWithIndex.map { case (j, i) =>
        (j, new java.sql.Timestamp(1700000000000L + i))
      }
      val parsed = Parse.extractEvents(EventSources.memoryBatch(spark, rows))
      val out = parsed.collect() // must not throw
      assert(out.length == payloads.length)
      assert(parsed.columns.toSeq == Seq("raw_event", "timestamp", "event_time",
        "Accept", "Host", "User-Agent", "event_type", "direction", "event_detail"))
      val valid = parsed.filter(Filters.isValidEvent).count()
      val invalid = parsed.filter(!Filters.isValidEvent || Filters.isValidEvent.isNull).count()
      assert(valid + invalid == out.length.toLong)
    }
  }

  test("classifier is total: every event lands in exactly one route") {
    samples(10).foreach { payloads =>
      val rows = payloads.zipWithIndex.map { case (j, i) =>
        (j, new java.sql.Timestamp(1700000000000L + i))
      }
      val parsed = Parse.parseAndFlatten(
        Parse.projectRaw(EventSources.memoryBatch(spark, rows)),
        model.EventModel.gen1Schema)
      val (s, g, d) = Filters.demux(parsed)
      assert(s.count() + g.count() + d.count() == payloads.length.toLong)
    }
  }
}
