package graft

import org.apache.spark.sql.SparkSession

/** Scratch: paired A/B of the fuzzy histogram prefilter at one tier —
  * alternating filtered / unfiltered full `fuzzyDupPairs` runs in one
  * JVM with a cache sweep between, so JVM warm-up and leftover-persist
  * drift cancel instead of biasing whichever side ran first (the
  * ScaleProof fuzzy rows run each side once, in a fixed order).
  * `Test/runMain graft.ScratchFuzzyAB [rows] [reps]`.
  */
object ScratchFuzzyAB {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = ScaleProof.fuzzyTitleFixture(spark, n).persist()
    val planted = df.count() - n
    def once(filtered: Boolean): (Double, Long) = {
      graft.ml.Dedup.disableHistPrefilter = !filtered
      try {
        val t0 = System.nanoTime()
        val found = graft.ml.Dedup
          .fuzzyDupPairs(df, "id", "title", 2, 4096, "segment").count()
        val dt = (System.nanoTime() - t0) / 1e9
        CacheSweep.sweep(spark)
        df.persist(); df.count() // re-pin the fixture after the sweep
        (dt, found)
      } finally graft.ml.Dedup.disableHistPrefilter = false
    }
    once(true) // warm-up, not recorded
    val rows = (1 to reps).flatMap { r =>
      // reverse the within-rep order on even reps: a monotone warm-up
      // or cool-down trend then cancels instead of biasing the side
      // that always ran first
      val order = if (r % 2 == 1) Seq(true, false) else Seq(false, true)
      order.map { f =>
        val load = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        val (dt, found) = once(f)
        println(f"""{"ab_rep":$r,"filtered":$f,"rows":$n,"planted":$planted,"found":$found,"pairs_sec":$dt%.2f,"load":$load%.2f}""")
        (f, dt)
      }
    }
    def best(f: Boolean) = rows.filter(_._1 == f).map(_._2).min
    println(f"""{"ab_summary":"min","rows":$n,"filtered_sec":${best(true)}%.2f,"nofilter_sec":${best(false)}%.2f}""")
    spark.stop()
  }
}
