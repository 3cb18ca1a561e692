package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-bench: grok match as Scala UDF (the r7 shape) vs the
  * native GrokMatchExpr, same pattern, same sf0.1 events column.
  * Run: sbt "Test/runMain graft.ScratchGrokBench"
  */
object ScratchGrokBench {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = Tables.events(spark, dir)
      .withColumn("message",
        concat_ws(" ", col("event_type"), col("user_id"), col("value")))
    val compiled = Seq(graft.operators.Grok.compile(
      "%{WORD:g_type} %{INT:g_uid:int} %{NUMBER:g_val}"))

    def viaUdf = {
      val u = udf((s: String) => graft.operators.Grok.matchFirst(compiled, s))
      e.select(element_at(u(col("message")), "g_uid").as("g"))
    }
    def viaNative = {
      val m = org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.GrokMatchExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(
            col("message").cast("string")), compiled))
      e.select(element_at(m, "g_uid").as("g"))
    }
    def time(label: String, mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.mode("overwrite").format("noop").save() // warm
      val runs = Seq.fill(5) {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: min ${runs.min}%.3f s median ${runs.sorted.apply(2)}%.3f s")
    }
    // sanity: identical results
    val a = viaUdf.agg(sum(col("g").cast("long"))).head().getLong(0)
    val b = viaNative.agg(sum(col("g").cast("long"))).head().getLong(0)
    println(s"checksum udf=$a native=$b equal=${a == b}")
    time("udf   ", viaUdf)
    time("native", viaNative)
    spark.stop()
  }
}
