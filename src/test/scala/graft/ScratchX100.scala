package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: decompose ml_embed_neardup's x100 wall-time variance into
  * its legs (sig build, banded bucket count, candidate join + distinct,
  * full query) — measured, not theorized (the r13 LSH-geometry
  * discipline). Each leg timed `runs` times in one JVM.
  */
object ScratchX100 {
  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 4
    val dir = if (args.length > 1) args(1) else "/tmp/graft-sf10"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ml.Similarity

    val emb = Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    val geo = Similarity.scaledLshGeometry(n, 64)
    println(s"n=$n bands=${geo.size} r=${geo.head.size}")

    def time(tag: String)(body: => Long): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val x = body
        val dt = (System.nanoTime() - t0) / 1e9
        CacheSweep.sweep(spark)
        (dt, x)
      }
      println(f"$tag%-28s min=${ts.map(_._1).min}%.2f all=[${ts.map(t => f"${t._1}%.2f").mkString(",")}] out=${ts.head._2}")
    }

    def sig() = emb
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("n", expr("sqrt(aggregate(v, 0.0d, (a, x) -> a + x * x))"))
      .select(col("id"),
        when(col("n") > 0, transform(col("v"), x => x / col("n")))
          .otherwise(col("v")).as("u"),
        Similarity.lshBandKeys(col("v"), geo).as("ks"))

    time("sig_build_count") { sig().count() }

    def banded() = sig()
      .select(col("id"), posexplode(col("ks")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")

    time("banded_bucket_count") {
      banded().groupBy("band", "key").count().count()
    }

    time("candidate_join_distinct") {
      val s = sig().persist()
      val b = s.select(col("id"), posexplode(col("ks")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
      val l = b.alias("l"); val r = b.alias("r")
      val c = l.join(r, col("l.band") === col("r.band") &&
          col("l.key") === col("r.key") && col("l.id") < col("r.id"))
        .select(col("l.id").as("a"), col("r.id").as("b"))
        .distinct().count()
      s.unpersist()
      c
    }

    time("full_query") {
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", geo,
        threshold = 0.4, maxBucketSize = 4096).count()
    }

    spark.stop()
  }
}
