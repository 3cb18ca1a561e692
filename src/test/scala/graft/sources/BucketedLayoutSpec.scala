package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketed-layout contract: one shuffle at write time, ZERO
  * exchanges for every later join on the bucket key — in the writing
  * session AND in a fresh catalog attached via register (the marker is
  * the geometry authority).
  */
class BucketedLayoutSpec extends SparkSpec {

  private def base = "/tmp/graft-bucketed-spec"

  /** Run `body` with broadcast joins disabled so the co-located SMJ (the
    * shape that matters at 100 TB, where nothing broadcasts) is what the
    * planner produces; restore the session confs after.
    */
  private def noBroadcast[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def docs = {
    val s = spark
    import s.implicits._
    (0L until 200L).map(i => (i, s"document body number $i", i % 7))
      .toDF("doc_id", "text", "grp")
  }

  test("write + same-session join: bucketed scans, zero exchanges") {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val scores = docs.select(col("doc_id"), length(col("text")).as("score"))
    BucketedLayout.write(docs, s"$base/docs", "doc_id", 8)
    BucketedLayout.write(scores, s"$base/scores", "doc_id", 8)
    assert(BucketedLayout.geometry(spark, s"$base/docs")
      .contains(("doc_id", 8, Seq("doc_id"))))
    noBroadcast {
      val l = BucketedLayout.register(spark, s"$base/docs", "bl_docs")
      val r = BucketedLayout.register(spark, s"$base/scores", "bl_scores")
      val j = l.join(r, "doc_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"),
        s"co-located join must not shuffle:\n$plan")
      // and the result is the plain join's result
      val expect = docs.join(scores, "doc_id")
      assert(j.count() == 200L && j.except(expect).isEmpty &&
        expect.except(j).isEmpty)
    }
    spark.sql("DROP TABLE bl_docs"); spark.sql("DROP TABLE bl_scores")
  }

  test("aggregation on the bucket key also skips the exchange") {
    noBroadcast {
      val t = BucketedLayout.register(spark, s"$base/docs", "bl_docs_agg")
      val a = t.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val plan = a.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket-keyed aggregate must not shuffle:\n$plan")
      assert(a.count() == 200L)
      spark.sql("DROP TABLE bl_docs_agg")
    }
  }

  test("register without a marker fails loudly; geometry args don't exist") {
    val bare = s"$base/bare"
    docs.write.mode("overwrite").parquet(bare)
    val e = intercept[IllegalArgumentException] {
      BucketedLayout.register(spark, bare, "bl_nope")
    }
    assert(e.getMessage.contains("_graft_buckets.json"))
    // an existing table name is refused, not clobbered
    val t = BucketedLayout.register(spark, s"$base/docs", "bl_dup")
    try {
      val e2 = intercept[IllegalArgumentException] {
        BucketedLayout.register(spark, s"$base/docs", "bl_dup")
      }
      assert(e2.getMessage.contains("already exists"))
    } finally spark.sql("DROP TABLE bl_dup")
  }

  test("write validates bucket column and count") {
    intercept[IllegalArgumentException] {
      BucketedLayout.write(docs, s"$base/bad", "nope", 8)
    }
    intercept[IllegalArgumentException] {
      BucketedLayout.write(docs, s"$base/bad", "doc_id", 0)
    }
  }

  test("marker is real JSON: quoted column names and quoted paths " +
      "round-trip instead of corrupting the geometry") {
    // a column name with a quote and a backslash would break a string-
    // interpolated marker (invalid JSON → regex parser misreads) — the
    // Jackson encode/decode must round-trip it exactly
    val weird = docs.withColumnRenamed("doc_id", "doc\"id\\x")
    val wDir = s"$base/weird"
    BucketedLayout.write(weird, wDir, "doc\"id\\x", 4)
    assert(BucketedLayout.geometry(spark, wDir)
      .contains(("doc\"id\\x", 4, Seq("doc\"id\\x"))))
    val t = BucketedLayout.register(spark, wDir, "bl_weird")
    try assert(t.count() == 200L)
    finally spark.sql("DROP TABLE bl_weird")
    // a path with a single quote must not break the LOCATION literal
    val qDir = s"$base/qu'ote/docs"
    BucketedLayout.write(docs, qDir, "doc_id", 4)
    val t2 = BucketedLayout.register(spark, qDir, "bl_quote")
    try assert(t2.count() == 200L)
    finally spark.sql("DROP TABLE bl_quote")
    // garbage marker → None, not a misread geometry
    val gDir = s"$base/garbage"
    docs.write.mode("overwrite").parquet(gDir)
    val p = new org.apache.hadoop.fs.Path(gDir, "_graft_buckets.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("{not json".getBytes("UTF-8")) finally out.close()
    assert(BucketedLayout.geometry(spark, gDir).isEmpty)
  }
}
