package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.util.concurrent.atomic.AtomicLong

/** Streaming micro-bench (BASELINE.md): the representative processor chain
  * over a rate source, docs/s at steady state. Prints one JSON line.
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val seconds = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "20").toInt
    val rate = sys.env.getOrElse("SPARK_GRAFT_STREAM_RATE", "400000").toInt
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // rate source → synthetic event shape matching the events table
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rate)
      .option("numPartitions", cpus)
      .load()
      .select(col("value").as("event_id"),
        col("timestamp").as("ts"),
        (col("value") % 25).as("user_id"),
        element_at(array(lit("click"), lit("view"), lit("purchase"),
          lit("signup"), lit("error")), (col("value") % 5 + 1).cast("int"))
          .as("event_type"),
        (col("value") % 10000 / 100.0).as("value"),
        concat(lit("{\"k\": "), col("value") % 100, lit("}")).as("props"))

    def chain(e0: DataFrame): DataFrame = {
      val e = e0.withColumn("message",
        concat_ws(" ", col("event_type"), col("user_id"), col("value")))
      val dissected = operators.PatternOps.dissector(e, "message",
        "%{etype} %{uid|int} %{val|float}")
      val decoded = operators.PatternOps.decodeJson(dissected, "props", "parsed", "k BIGINT")
      val stamped = operators.TimeOps.datetimeExtractor(decoded, "ts", "dt")
      val managed = operators.Structural.fieldManager(stamped,
        Map("etype" -> "event_class"))
      val calc = operators.Calculator.calculator(managed,
        "${val} * 2 + ${parsed.k}", "calc_out")
      operators.Lookup.genericResolver(calc, "event_class", "category",
        Seq("^pur" -> "transaction", "^sig" -> "account",
          "^err" -> "incident", ".*" -> "other"))
    }

    val processed = new AtomicLong(0)
    val q = chain(stream).writeStream
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processed.addAndGet(batch.count())
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-bench-ckpt").toString)
      .start()

    // warm-up, then measure
    Thread.sleep(5000)
    val n0 = processed.get(); val t0 = System.nanoTime()
    Thread.sleep(seconds * 1000L)
    val n1 = processed.get(); val t1 = System.nanoTime()
    q.stop()
    val docsPerSec = (n1 - n0) / ((t1 - t0) / 1e9)
    println(f"""{"metric":"stream_docs_per_sec","value":$docsPerSec%.0f,"unit":"docs/s","window_s":$seconds,"rate":$rate}""")
    spark.stop()
  }
}
