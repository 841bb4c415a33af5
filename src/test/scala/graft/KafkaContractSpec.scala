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

  test("kafkaStream analyzes to a streaming relation with the Kafka envelope; options round-trip") {
    val provider = classOf[KafkaEnvelopeTestProvider].getName
    val df = EventSources.kafkaStream(
      spark, "broker-1:9092,broker-2:9092", "events",
      startingOffsets = "earliest", provider = provider)
    assert(df.isStreaming)
    assert(df.schema == EventModel.kafkaEnvelopeSchema, df.schema.treeString)
    assert(df.queryExecution.analyzed.getClass.getSimpleName.contains("StreamingRelation"),
      df.queryExecution.analyzed.getClass.getName)
    val opts = KafkaEnvelopeTestProvider.lastOptions
    assert(opts.get("kafka.bootstrap.servers").contains("broker-1:9092,broker-2:9092"), opts)
    assert(opts.get("subscribe").contains("events"), opts)
    assert(opts.get("startingoffsets").contains("earliest"), opts)
    // The whole downstream ETL analyzes over the envelope source: the
    // builder → parse → filter composition is plan-checked end to end.
    val etl = graft.streaming.StreamPipeline.extractValidEvents(df)
    assert(etl.isStreaming)
    assert(etl.columns.toSeq == Seq("raw_event", "timestamp", "event_time",
      "Accept", "Host", "User-Agent", "event_type", "direction", "event_detail"))
  }

  test("kafkaBatch analyzes with the Kafka envelope; offset options round-trip") {
    val provider = classOf[KafkaEnvelopeTestProvider].getName
    val df = EventSources.kafkaBatch(spark, "broker-1:9092", "events", provider = provider)
    assert(!df.isStreaming)
    assert(df.schema == EventModel.kafkaEnvelopeSchema, df.schema.treeString)
    val opts = KafkaEnvelopeTestProvider.lastOptions
    assert(opts.get("startingoffsets").contains("earliest"), opts)
    assert(opts.get("endingoffsets").contains("latest"), opts)
  }
}
