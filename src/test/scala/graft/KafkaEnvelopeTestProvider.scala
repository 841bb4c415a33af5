package graft

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.EventModel

/** Test stand-in for the Kafka connector (which does not ship in this
  * sandbox): a DataSource-V2 TableProvider exposing EXACTLY the Kafka
  * source's record schema and zero rows. Driving the S1/S2 builders
  * through it exercises Spark's full source-resolution path — provider
  * instantiation, option propagation, schema inference, streaming
  * relation analysis — everything short of the kafka-protocol I/O itself.
  * The provider records the options it receives so the spec can assert
  * the builders' round-trip. */
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
              override def planInputPartitions(): Array[InputPartition] = Array.empty
              override def createReaderFactory(): PartitionReaderFactory =
                (_: InputPartition) => throw new UnsupportedOperationException("no partitions")
            }
            override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
              new MicroBatchStream {
                private val off: Offset = new Offset { override def json(): String = "0" }
                override def latestOffset(): Offset = off
                override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
                  Array.empty
                override def createReaderFactory(): PartitionReaderFactory =
                  (_: InputPartition) => throw new UnsupportedOperationException("no partitions")
                override def initialOffset(): Offset = off
                override def deserializeOffset(json: String): Offset = off
                override def commit(end: Offset): Unit = ()
                override def stop(): Unit = ()
              }
          }
        }
      }
    }
}

object KafkaEnvelopeTestProvider {
  @volatile var lastOptions: Map[String, String] = Map.empty
  private def record(options: CaseInsensitiveStringMap): Unit = {
    val it = options.entrySet().iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    val m = b.result()
    if (m.nonEmpty) lastOptions = m
  }
}
