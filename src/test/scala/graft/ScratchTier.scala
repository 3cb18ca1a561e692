package graft
import org.apache.spark.sql.SparkSession

/** Scratch: time one named query at the base sf dir AND the 10× replica
  * tier (ScaleProof's replicas), printing per-tier min wall seconds and
  * planned exchange counts — the local iteration loop for x10-ratio work
  * without running the whole ScaleProof headline.
  */
object ScratchTier {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = "/tmp/graft-x10-" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    ScaleProof.buildReplicas(spark, sfDir, out)
    val fn = SparkEntry.queries(name)
    // warm-up
    fn(spark, "/root/testdata/sf0.001").write.mode("overwrite")
      .format("noop").save()
    CacheSweep.sweep(spark)
    val res = Seq("base" -> sfDir, "x10" -> out).map { case (tier, dir) =>
      val ex = ScaleProof.planExchanges(fn(spark, dir))
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        CacheSweep.sweep(spark)
        dt
      }
      println(f"[tier] $name $tier%-4s min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")} exchanges=$ex")
      tier -> times.min
    }.toMap
    println(f"[tier] $name x10_ratio=${res("x10") / (res("base") * 10)}%.3f")
    spark.stop()
  }
}
