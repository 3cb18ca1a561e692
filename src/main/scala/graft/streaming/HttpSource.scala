package graft.streaming

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** `http_input` as a REAL custom v2 streaming Source (reference:
  * connector/http/input.py:406-695 — an in-process uvicorn receiver) —
  * replaces the round-2 spool-file bridge's extra file hop and latency:
  *
  * {{{
  *   spark.readStream.format("graft-http")
  *     .option("port", "9000").option("credentials", "user:pass").load()
  * }}}
  *
  * The driver hosts the push endpoint set (/json /jsonl /plaintext via
  * [[Connectors.HttpInputServer]], callback mode) and buffers received
  * lines; each micro-batch's slice ships to executors INSIDE its
  * InputPartition — the same single-receiver driver-buffered design as
  * Spark's own socket source, and the honest match for the reference's
  * one-process HTTP receiver. Offsets are running line counts; committed
  * prefixes are trimmed. Like the socket source (and the reference's HTTP
  * input, which has no replay either), received-but-uncommitted data does
  * not survive a driver restart — put Kafka in front when that matters.
  */
class HttpSourceProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-http"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new HttpSource.HttpTable(new CaseInsensitiveStringMap(properties))
}

object HttpSource {
  val Schema: StructType = StructType(Seq(StructField("message", StringType)))

  /** Bound port of the most recently started stream on `requestedPort`
    * (tests bind port 0 and need the ephemeral port back).
    */
  val boundPorts = new java.util.concurrent.ConcurrentHashMap[Int, Int]()

  private[streaming] class HttpTable(options: CaseInsensitiveStringMap)
      extends Table with SupportsRead {
    override def name(): String = "graft-http"
    override def schema(): StructType = Schema
    override def capabilities(): java.util.Set[TableCapability] =
      Set(TableCapability.MICRO_BATCH_READ).asJava
    override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
      () => new Scan {
        override def readSchema(): StructType = Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new HttpMicroBatchStream(
            options.getInt("port", 0),
            options.getOrDefault("bindaddress", "127.0.0.1"),
            Option(options.get("credentials")).map { c =>
              val i = c.indexOf(':'); (c.take(i), c.drop(i + 1))
            })
      }
  }

  final case class HttpOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }

  final case class LinesPartition(lines: Array[String]) extends InputPartition

  /** Reads the lines embedded in the partition (no driver round-trip at
    * task runtime; the data rode the task closure).
    */
  class LinesReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val lines = p.asInstanceOf[LinesPartition].lines
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < lines.length }
        override def get(): InternalRow =
          InternalRow(UTF8String.fromString(lines(i)))
        override def close(): Unit = ()
      }
    }
  }

  class HttpMicroBatchStream(port: Int, bindAddress: String,
                             credentials: Option[(String, String)])
      extends MicroBatchStream {
    private val buffered = new java.util.ArrayList[String]()
    private var trimmed = 0L
    private val server = new Connectors.HttpInputServer(
      spoolDir = "", port = port, credentials = credentials,
      bindAddress = bindAddress,
      sink = Some(lines => buffered.synchronized {
        lines.foreach(buffered.add)
      })).start()
    boundPorts.put(port, server.boundPort)

    override def initialOffset(): Offset = HttpOffset(0L)
    override def latestOffset(): Offset = buffered.synchronized {
      HttpOffset(trimmed + buffered.size)
    }
    override def deserializeOffset(json: String): Offset =
      HttpOffset(json.toLong)

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[HttpOffset].n
      val e = end.asInstanceOf[HttpOffset].n
      buffered.synchronized {
        val from = math.max(0L, s - trimmed).toInt
        val to = math.max(0L, e - trimmed).toInt
        val slice = buffered.subList(from, math.min(to, buffered.size))
          .toArray(Array.empty[String])
        Array(LinesPartition(slice))
      }
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new LinesReaderFactory

    override def commit(end: Offset): Unit = buffered.synchronized {
      val upto = math.max(0L, end.asInstanceOf[HttpOffset].n - trimmed).toInt
      val n = math.min(upto, buffered.size)
      if (n > 0) {
        buffered.subList(0, n).clear()
        trimmed += n
      }
    }

    override def stop(): Unit = server.stop()
  }
}
