package graft
import org.apache.spark.sql.SparkSession

/** Scratch: split ml_pretrain_recipe's "compile" cost (the biggest
  * headline line, r13 watch item) into DataFrame CONSTRUCTION (which
  * runs plan-time training actions) vs Catalyst analyze/optimize/plan.
  */
object ScratchRecipe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries("ml_pretrain_recipe")
    // warm
    fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
    CacheSweep.sweep(spark)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      CacheSweep.sweep(spark)
      println(f"run$i construct=${(t1-t0)/1e9}%.2f plan=${(t2-t1)/1e9}%.2f exec=${(t3-t2)/1e9}%.2f")
    }
    spark.stop()
  }
}
