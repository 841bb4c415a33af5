package graft

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.EventModel

/** Test stand-in for the Kafka connector (which does not ship in this
  * sandbox): a DataSource-V2 TableProvider exposing EXACTLY the Kafka
  * source's record schema, serving the rows staged in
  * [[KafkaEnvelopeTestProvider.stage]]. Driving the S1/S2 builders through
  * it exercises Spark's full source path — provider instantiation, option
  * propagation, schema inference, streaming-relation analysis, offset
  * planning, and PartitionReader execution — everything short of the
  * kafka-protocol I/O itself.
  *
  * Offsets are PER-PARTITION, like the real connector's
  * `{"topic":{"0":n,...}}`: [[stage]] distributes records round-robin over
  * `partitions` topic-partitions with independent offset sequences, the
  * stream's Offset serializes the per-partition high-water marks, each
  * micro-batch plans one InputPartition per topic-partition, and a restart
  * from a checkpoint resumes from the committed per-partition offsets
  * ([[KafkaEnvelopeTestProvider.stageMore]] appends mid-stream data for
  * exactly that test). The provider records the options it receives so the
  * spec can assert the builders' round-trip. */
class KafkaEnvelopeTestProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    KafkaEnvelopeTestProvider.record(options)
    EventModel.kafkaEnvelopeSchema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new Table with SupportsRead {
      override def name(): String = "kafka_envelope_test"
      override def schema(): StructType = EventModel.kafkaEnvelopeSchema
      override def capabilities(): util.Set[TableCapability] = {
        val s = new util.HashSet[TableCapability]()
        s.add(TableCapability.BATCH_READ)
        s.add(TableCapability.MICRO_BATCH_READ)
        s
      }
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
        KafkaEnvelopeTestProvider.record(options)
        new ScanBuilder {
          override def build(): Scan = new Scan {
            override def readSchema(): StructType = EventModel.kafkaEnvelopeSchema
            override def toBatch: Batch = new Batch {
              // Like the real source: one Spark partition per topic-partition.
              override def planInputPartitions(): Array[InputPartition] =
                KafkaEnvelopeTestProvider.staged
                  .groupBy(_.partition).toSeq.sortBy(_._1)
                  .map(g => EnvelopePartition(g._2): InputPartition)
                  .toArray
              override def createReaderFactory(): PartitionReaderFactory = EnvelopeReaderFactory
            }
            override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
              new MicroBatchStream {
                override def latestOffset(): Offset =
                  PartitionedOffset(KafkaEnvelopeTestProvider.highWaterMarks)
                override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
                  val s = start.asInstanceOf[PartitionedOffset].offsets
                  val e = end.asInstanceOf[PartitionedOffset].offsets
                  e.keys.toSeq.sorted.flatMap { p =>
                    val from = s.getOrElse(p, 0L)
                    val rows = KafkaEnvelopeTestProvider.staged
                      .filter(r => r.partition == p && r.offset >= from && r.offset < e(p))
                    if (rows.isEmpty) None else Some(EnvelopePartition(rows): InputPartition)
                  }.toArray
                }
                override def createReaderFactory(): PartitionReaderFactory = EnvelopeReaderFactory
                override def initialOffset(): Offset =
                  PartitionedOffset(KafkaEnvelopeTestProvider.highWaterMarks.map { case (p, _) => p -> 0L })
                override def deserializeOffset(json: String): Offset = PartitionedOffset.parse(json)
                override def commit(end: Offset): Unit = ()
                override def stop(): Unit = ()
              }
          }
        }
      }
    }
}

/** One staged envelope record: payload bytes + event-time micros, at a
  * (topic-partition, offset) position. */
case class EnvelopeRecord(value: Array[Byte], timestampMicros: Long,
    offset: Long, partition: Int)

/** Per-topic-partition offsets, the real connector's offset shape. json()
  * only needs to round-trip through [[PartitionedOffset.parse]]. */
case class PartitionedOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sorted.map { case (p, o) => s"$p:$o" }.mkString(",")
}
object PartitionedOffset {
  def parse(s: String): PartitionedOffset = PartitionedOffset(
    s.trim.split(",").filter(_.nonEmpty).map { kv =>
      val Array(p, o) = kv.split(":")
      p.trim.toInt -> o.trim.toLong
    }.toMap)
}

case class EnvelopePartition(rows: Seq[EnvelopeRecord]) extends InputPartition

object EnvelopeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[EnvelopePartition].rows.iterator
      private var cur: EnvelopeRecord = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow =
        // (key, value, topic, partition, offset, timestamp, timestampType)
        new GenericInternalRow(Array[Any](
          null, cur.value, UTF8String.fromString("events"), cur.partition, cur.offset,
          cur.timestampMicros, 0))
      override def close(): Unit = ()
    }
}

object KafkaEnvelopeTestProvider {
  @volatile var lastOptions: Map[String, String] = Map.empty
  @volatile var staged: Vector[EnvelopeRecord] = Vector.empty
  @volatile private var numPartitions: Int = 1

  /** Stage payloads (json string, event-time micros) round-robin over
    * `partitions` topic-partitions, replacing any previous staging. */
  def stage(rows: Seq[(String, Long)], partitions: Int = 1): Unit = synchronized {
    numPartitions = partitions
    staged = Vector.empty
    stageMore(rows)
  }

  /** Append more payloads mid-stream (same round-robin, offsets continue
    * per partition) — the "broker kept receiving while the query was
    * down" half of the checkpoint-restart contract. */
  def stageMore(rows: Seq[(String, Long)]): Unit = synchronized {
    val counts = Array.tabulate(numPartitions)(p => staged.count(_.partition == p).toLong)
    var rr = staged.length
    staged = staged ++ rows.map { case (json, us) =>
      val p = rr % numPartitions
      val rec = EnvelopeRecord(json.getBytes("UTF-8"), us, counts(p), p)
      counts(p) += 1
      rr += 1
      rec
    }
  }

  /** Current per-partition record counts (the "latest offsets"). */
  def highWaterMarks: Map[Int, Long] =
    (0 until numPartitions).map(p => p -> staged.count(_.partition == p).toLong).toMap

  private[graft] def record(options: CaseInsensitiveStringMap): Unit = {
    val it = options.entrySet().iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    val m = b.result()
    if (m.nonEmpty) lastOptions = m
  }
}
