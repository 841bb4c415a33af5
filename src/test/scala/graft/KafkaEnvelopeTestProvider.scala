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
  * [[KafkaEnvelopeTestProvider.stage]] as ONE micro-batch. Driving the
  * S1/S2 builders through it exercises Spark's full source path —
  * provider instantiation, option propagation, schema inference,
  * streaming-relation analysis, offset planning, and PartitionReader
  * execution — everything short of the kafka-protocol I/O itself. The
  * provider records the options it receives so the spec can assert the
  * builders' round-trip. */
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
              override def planInputPartitions(): Array[InputPartition] =
                Array(EnvelopePartition(KafkaEnvelopeTestProvider.staged))
              override def createReaderFactory(): PartitionReaderFactory = EnvelopeReaderFactory
            }
            override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
              new MicroBatchStream {
                private def off(n: Long): Offset = LongOffset(n)
                override def latestOffset(): Offset =
                  off(KafkaEnvelopeTestProvider.staged.length.toLong)
                override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
                  val s = start.asInstanceOf[LongOffset].n.toInt
                  val e = end.asInstanceOf[LongOffset].n.toInt
                  if (e <= s) Array.empty
                  else Array(EnvelopePartition(KafkaEnvelopeTestProvider.staged.slice(s, e)))
                }
                override def createReaderFactory(): PartitionReaderFactory = EnvelopeReaderFactory
                override def initialOffset(): Offset = off(0L)
                override def deserializeOffset(json: String): Offset = off(json.trim.toLong)
                override def commit(end: Offset): Unit = ()
                override def stop(): Unit = ()
              }
          }
        }
      }
    }
}

/** One staged envelope record: payload bytes + event-time micros. */
case class EnvelopeRecord(value: Array[Byte], timestampMicros: Long, offset: Long)

case class LongOffset(n: Long) extends Offset {
  override def json(): String = n.toString
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
          null, cur.value, UTF8String.fromString("events"), 0, cur.offset,
          cur.timestampMicros, 0))
      override def close(): Unit = ()
    }
}

object KafkaEnvelopeTestProvider {
  @volatile var lastOptions: Map[String, String] = Map.empty
  @volatile var staged: Seq[EnvelopeRecord] = Seq.empty

  /** Stage payloads (json string, event-time micros) the next scan serves. */
  def stage(rows: Seq[(String, Long)]): Unit =
    staged = rows.zipWithIndex.map { case ((json, us), i) =>
      EnvelopeRecord(json.getBytes("UTF-8"), us, i.toLong)
    }

  private[graft] def record(options: CaseInsensitiveStringMap): Unit = {
    val it = options.entrySet().iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    val m = b.result()
    if (m.nonEmpty) lastOptions = m
  }
}
