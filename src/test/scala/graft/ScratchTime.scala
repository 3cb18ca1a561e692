package graft
import org.apache.spark.sql.SparkSession

/** Scratch: time named queries from SparkEntry at a given sf dir (3
  * warm reruns, min reported) and print planned exchange counts. */
object ScratchTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
      CacheSweep.sweep(spark)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        CacheSweep.sweep(spark)
        dt
      }
      val ex = fn(spark, sfDir).queryExecution.executedPlan.toString
        .linesIterator.count(l => l.contains("Exchange") &&
          !l.contains("ReusedExchange"))
      println(f"[time] $name min=${times.min}%.3f s exchanges=$ex")
    }
    spark.stop()
  }
}
