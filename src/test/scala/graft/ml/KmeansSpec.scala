package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic (oracle-checkable) Lloyd k-means + cluster-balanced
  * sampling: hash-partition init, 6-decimal centroid snapping, squared-L2
  * first-wins assignment.
  */
class KmeansSpec extends SparkSpec {

  /** Two tight blobs far apart on dim 0 — any sane k=2 run separates
    * them regardless of init.
    */
  private def blobs = {
    import spark.implicits._
    val a = (0 until 10).map(i => (i.toLong, Seq(0.0 + i * 0.01, 1.0, 0.0)))
    val b = (10 until 20).map(i => (i.toLong, Seq(9.0 + i * 0.01, 1.0, 0.0)))
    (a ++ b).toDF("vec_id", "embedding")
  }

  test("kmeansAssign separates well-separated blobs and is deterministic") {
    val r1 = Similarity.kmeansAssign(blobs, "vec_id", "embedding",
      k = 2, dim = 3, iters = 2).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r2 = Similarity.kmeansAssign(blobs, "vec_id", "embedding",
      k = 2, dim = 3, iters = 2).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(r1 == r2, "same input must give the same assignment")
    val left = (0L until 10L).map(r1)
    val right = (10L until 20L).map(r1)
    assert(left.toSet.size == 1 && right.toSet.size == 1,
      s"each blob should land in one cluster: $r1")
    assert(left.head != right.head, "blobs should be in different clusters")
  }

  test("malformed vectors are excluded from training and output") {
    import spark.implicits._
    val bad = Seq(
      (100L, null.asInstanceOf[Seq[Double]]),      // null array
      (101L, Seq(1.0))).toDF("vec_id", "embedding") // wrong dim
    // a true null ELEMENT needs SQL (a Scala Seq[Double] can't hold one)
    val withNullElem = spark.sql(
      "SELECT 102L AS vec_id, array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS embedding")
    val df = blobs.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .unionByName(bad.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")))
      .unionByName(withNullElem)
    val out = Similarity.kmeansAssign(df, "vec_id", "embedding",
      k = 2, dim = 3, iters = 1)
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 20L).toSet,
      s"malformed rows must not appear in the output: $ids")
  }

  test("empty cluster keeps its previous centroid") {
    // all points identical → after iter 1 every point assigns to one
    // cluster; the other k-1 clusters go empty and must keep their
    // (init) centroids without an NPE or a fabricated zero vector
    import spark.implicits._
    val df = (0L until 12L).map(i => (i, Seq(5.0, 5.0))).toDF("vec_id", "embedding")
    val cen = Similarity.kmeansCentroids(df, "vec_id", "embedding",
      k = 4, dim = 2, iters = 3)
    assert(cen.length == 4)
    assert(cen.forall(_ == Seq(5.0, 5.0)),
      s"identical points: every bucket mean is the point itself: $cen")
    val out = Similarity.kmeansAssign(df, "vec_id", "embedding",
      k = 4, dim = 2, iters = 3).select("cluster").distinct().collect()
    assert(out.length == 1, "identical points must share one cluster")
  }

  test("clusterSample keeps at most perCluster rows per cluster") {
    val out = Similarity.clusterSample(blobs, "vec_id", "embedding",
      k = 2, dim = 3, iters = 1, perCluster = 3)
    val sizes = out.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ <= 3), s"cluster over cap: $sizes")
    assert(sizes.values.sum == 6L, s"both 10-row blobs should cap at 3: $sizes")
    // deterministic membership (content-addressed order)
    val a = out.select("vec_id").collect().map(_.getLong(0)).toSet
    val b = Similarity.clusterSample(blobs, "vec_id", "embedding",
        k = 2, dim = 3, iters = 1, perCluster = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("clusterPurity reports majority label and purity per cluster") {
    import spark.implicits._
    // blob A (ids 0-9) labeled 1 except one mislabeled row; blob B pure 2
    val a = (0 until 10).map(i =>
      (i.toLong, Seq(0.0 + i * 0.01, 1.0, 0.0), if (i == 9) 7 else 1))
    val b = (10 until 20).map(i =>
      (i.toLong, Seq(9.0 + i * 0.01, 1.0, 0.0), 2))
    val df = (a ++ b).toDF("vec_id", "embedding", "label")
    val rows = Similarity.clusterPurity(df, "vec_id", "embedding", "label",
        k = 2, dim = 3, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.length == 2)
    val byMaj = rows.map(r => r._3 -> r).toMap
    assert(byMaj(1)._2 == 10L && byMaj(1)._4 == 0.9, s"blob A: ${byMaj(1)}")
    assert(byMaj(2)._2 == 10L && byMaj(2)._4 == 1.0, s"blob B: ${byMaj(2)}")
  }

  test("assignment plan is a narrow projection; training rounds are single aggregates") {
    // the returned plan must carry no join and no Window — the centroids
    // ride as one plan reference inside the PqEncodeExpr kernel
    val plan = Similarity.kmeansAssign(blobs, "vec_id", "embedding",
      k = 2, dim = 3, iters = 1).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
    assert(!plan.contains("Window"), s"assignment must not window:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }

  test("clusterSample plan: one shuffle on the cluster key, group-limited window") {
    val plan = Similarity.clusterSample(blobs, "vec_id", "embedding",
        k = 2, dim = 3, iters = 1, perCluster = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-cluster cap should push below the sort as a group limit:\n$plan")
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"clusterSample should shuffle only on the cluster key:\n$plan")
  }

  test("a non-numeric id column fails loudly instead of degenerating; " +
      "numeric-STRING ids keep working (ADVICE r13 regression)") {
    // pmod(string_id, k) casts to null → every init bucket empty → all
    // centroids zero → one silent mega-cluster; the gate must reject
    // non-numeric strings…
    val named = blobs.withColumn("vec_id", concat(lit("doc_"),
      col("vec_id").cast("string")))
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(named, "vec_id", "embedding",
        k = 2, dim = 3, iters = 1)
    }
    assert(e.getMessage.contains("non-numeric"), e.getMessage)
    // …while ids that HAPPEN to be strings of digits cast cleanly
    // inside pmod and must reproduce the numeric trajectory exactly
    // (callers with string-typed numeric ids worked before the r13
    // gate and must not regress to a hard failure)
    val stringy = blobs.withColumn("vec_id", col("vec_id").cast("string"))
    val viaString = Similarity.kmeansCentroids(stringy, "vec_id",
      "embedding", k = 2, dim = 3, iters = 2)
    val viaLong = Similarity.kmeansCentroids(blobs, "vec_id",
      "embedding", k = 2, dim = 3, iters = 2)
    assert(viaString == viaLong,
      s"string-id trajectory diverged:\n$viaString\nvs\n$viaLong")
    // other types still refused up front
    val ts = blobs.withColumn("vec_id",
      org.apache.spark.sql.functions.to_timestamp(lit("2026-01-01")))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(ts, "vec_id", "embedding",
        k = 2, dim = 3, iters = 1)
    }
    assert(e2.getMessage.contains("must be numeric"), e2.getMessage)
    // …and non-FINITE numeric strings: 'NaN'/'Infinity' cast to
    // non-null doubles, but pmod(NaN, k)'s int cast is null — those
    // rows would silently fall out of every init bucket (r14 review
    // finding); the probe must refuse them like any non-numeric id
    for (evil <- Seq("NaN", "Infinity", "-Infinity")) {
      val poisoned = stringy.withColumn("vec_id",
        when(col("vec_id") === "0", lit(evil)).otherwise(col("vec_id")))
      val e3 = intercept[IllegalArgumentException] {
        Similarity.kmeansCentroids(poisoned, "vec_id", "embedding",
          k = 2, dim = 3, iters = 1)
      }
      assert(e3.getMessage.contains("non-finite"), s"$evil: ${e3.getMessage}")
    }
  }
}
