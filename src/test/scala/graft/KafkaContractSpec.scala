package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.EventModel
import graft.sources.EventSources

/** Pins the S1/S2 Kafka source contract as far as this harness can: no
  * broker or kafka connector jar exists here, so the readers cannot produce
  * an analyzed plan. What CAN be pinned: (a) both builders wire up
  * `format("kafka")` with their options and get all the way to provider
  * resolution — the failure is precisely "kafka provider not found", not a
  * builder/option error; (b) the (value, timestamp) envelope contract the
  * whole downstream ETL assumes, via the memory twin that substitutes for
  * Kafka everywhere else in the suite. */
class KafkaContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def providerMissing(t: Throwable): Boolean = {
    val msgs = Iterator
      .iterate(t)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse(""))
      .mkString(" | ")
      .toLowerCase
    msgs.contains("kafka")
  }

  test("kafkaStream builder reaches kafka provider resolution") {
    val t = intercept[Throwable] {
      EventSources.kafkaStream(spark, "localhost:9092", "events").schema
    }
    assert(providerMissing(t), s"expected kafka provider lookup, got: $t")
  }

  test("kafkaBatch builder reaches kafka provider resolution") {
    val t = intercept[Throwable] {
      EventSources.kafkaBatch(spark, "localhost:9092", "events").schema
    }
    assert(providerMissing(t), s"expected kafka provider lookup, got: $t")
  }

  test("memory twin delivers exactly the Kafka envelope the ETL consumes") {
    val df = EventSources.memoryBatch(
      spark, Seq(("{}", new java.sql.Timestamp(0L))))
    assert(df.schema == EventModel.kafkaValueSchema)
  }
}
