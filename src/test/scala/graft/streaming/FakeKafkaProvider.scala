package graft.streaming

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** TEST-ONLY in-process broker registered under data-source short name
  * `kafka` (via the test classpath's META-INF/services entry — the
  * production classpath never sees it). No Kafka artifact of any kind
  * exists in this container (re-verified every round), so the
  * `format("kafka")` plumbing the library ships —
  * [[StreamRunner.kafkaSource]]/[[StreamRunner.kafkaSink]] option
  * translation, checkpointed offsets, topic routing, value
  * serialization — could previously only be option-level specced
  * (KafkaWireSpec). This provider implements the OPTION and SCHEMA
  * contract of Spark's real Kafka connector (source schema
  * key/value/topic/partition/offset/timestamp/timestampType; reader
  * honors `subscribe` + `startingOffsets`; writer honors `topic` and a
  * `value` column, requires `kafka.bootstrap.servers`) against an
  * in-memory topic store, so the full readStream → pipeline →
  * writeStream round-trip executes end-to-end. The day a broker (and
  * the real connector jar) exists, the SAME library code runs against
  * it unchanged — KafkaE2eSpec cancels itself if a second `kafka`
  * provider appears on the classpath.
  */
class FakeKafkaProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister
    with org.apache.spark.sql.sources.CreatableRelationProvider {
  override def shortName(): String = "kafka"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeKafka.SourceSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new FakeKafka.KafkaTable(schema,
      new CaseInsensitiveStringMap(properties))

  /** Batch writes arrive on the V1 path: `kafka` sits in Spark's
    * default `spark.sql.sources.useV1SourceList`, so
    * `df.write.format("kafka")` plans a V1 InsertIntoDataSourceDir —
    * the REAL connector implements this same interface for its batch
    * producer. Streaming reads resolve through the V2 TableProvider
    * above (the v1 list does not gate `readStream`).
    */
  override def createRelation(
      ctx: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.sources.BaseRelation = {
    val opts = new CaseInsensitiveStringMap(parameters.asJava)
    require(opts.containsKey("kafka.bootstrap.servers"),
      "kafka sink needs kafka.bootstrap.servers")
    require(opts.containsKey("topic"),
      "kafka sink needs `topic` (StreamRunner.kafkaSinkOptions emits it)")
    FakeKafkaBroker.lastWriteOptions = opts.asCaseSensitiveMap().asScala.toMap
    val topic = opts.get("topic")
    val schema = data.schema
    val valueIdx = schema.fieldIndex("value")
    val keyIdx = if (schema.fieldNames.contains("key"))
      Some(schema.fieldIndex("key")) else None
    val rows = data.collect() // test double: rows come to the driver
    val log = FakeKafkaBroker.topicLog(topic)
    rows.foreach { r =>
      val value =
        if (r.isNullAt(valueIdx)) null
        else r.get(valueIdx) match {
          case s: String => s.getBytes("UTF-8")
          case b: Array[Byte] => b
        }
      val key = keyIdx match {
        case Some(i) if !r.isNullAt(i) => r.getAs[Array[Byte]](i)
        case _ => null
      }
      log.add((key, value))
    }
    val outSchema = data.schema
    new org.apache.spark.sql.sources.BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext = ctx
      override def schema: StructType = outSchema
    }
  }
}

/** The in-memory broker: append-only topic logs, offsets = positions. */
object FakeKafkaBroker {
  private val topics = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.List[(Array[Byte], Array[Byte])]]()
  /** Last options each side received — the wire-contract probes. */
  @volatile var lastReadOptions: Map[String, String] = Map.empty
  @volatile var lastWriteOptions: Map[String, String] = Map.empty

  def topicLog(t: String): java.util.List[(Array[Byte], Array[Byte])] =
    topics.computeIfAbsent(t, _ => java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Array[Byte], Array[Byte])]()))

  def publish(topic: String, values: Seq[String]): Unit =
    values.foreach(v => topicLog(topic).add((null, v.getBytes("UTF-8"))))

  def messages(topic: String): Seq[String] = {
    val log = topicLog(topic)
    log.synchronized {
      log.asScala.map { case (_, v) => new String(v, "UTF-8") }.toSeq
    }
  }

  def size(topic: String): Long = topicLog(topic).size.toLong

  def clear(): Unit = topics.clear()
}

object FakeKafka {
  /** The real connector's source schema, field for field. */
  val SourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private def requireBootstrap(opts: CaseInsensitiveStringMap): Unit =
    require(opts.containsKey("kafka.bootstrap.servers"),
      "kafka source/sink needs kafka.bootstrap.servers (the wire " +
        "contract StreamRunner.kafkaSourceOptions/kafkaSinkOptions emit)")

  class KafkaTable(writeSchema: StructType, options: CaseInsensitiveStringMap)
      extends Table with SupportsRead {
    override def name(): String = "fake-kafka"
    override def schema(): StructType = SourceSchema
    override def capabilities(): java.util.Set[TableCapability] =
      Set(TableCapability.MICRO_BATCH_READ).asJava

    override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
      requireBootstrap(options)
      require(options.containsKey("subscribe"),
        "kafka source needs `subscribe` (topic)")
      FakeKafkaBroker.lastReadOptions =
        options.asCaseSensitiveMap().asScala.toMap
      () => new Scan {
        override def readSchema(): StructType = SourceSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaMicroBatchStream(options.get("subscribe"),
            options.getOrDefault("startingoffsets", "earliest"))
      }
    }
  }

  final case class KafkaOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }

  final case class RecordsPartition(records: Array[(Array[Byte], Array[Byte])],
                                    topic: String, startOffset: Long)
      extends InputPartition

  class KafkaMicroBatchStream(topic: String, startingOffsets: String)
      extends MicroBatchStream {
    // `startingOffsets` semantics: earliest = log start; latest = log end
    // AT STREAM START (like a fresh consumer group). Only consulted on
    // first start — afterwards the checkpoint's offsets win, which is
    // exactly what the e2e spec pins across restarts.
    private val startAt: Long =
      if (startingOffsets == "latest") FakeKafkaBroker.size(topic) else 0L

    override def initialOffset(): Offset = KafkaOffset(startAt)
    override def latestOffset(): Offset =
      KafkaOffset(FakeKafkaBroker.size(topic))
    override def deserializeOffset(json: String): Offset =
      KafkaOffset(json.toLong)

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[KafkaOffset].n
      val e = end.asInstanceOf[KafkaOffset].n
      val log = FakeKafkaBroker.topicLog(topic)
      val slice = log.synchronized {
        log.subList(s.toInt, math.min(e, log.size.toLong).toInt)
          .asScala.toArray
      }
      Array(RecordsPartition(slice, topic, s))
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
          val rp = p.asInstanceOf[RecordsPartition]
          new PartitionReader[InternalRow] {
            private var i = -1
            override def next(): Boolean = { i += 1; i < rp.records.length }
            override def get(): InternalRow = {
              val (k, v) = rp.records(i)
              InternalRow(k, v, UTF8String.fromString(rp.topic), 0,
                rp.startOffset + i,
                System.currentTimeMillis() * 1000L, 0)
            }
            override def close(): Unit = ()
          }
        }
      }

    override def commit(end: Offset): Unit = () // the log retains (Kafka semantics)
    override def stop(): Unit = ()
  }
}
