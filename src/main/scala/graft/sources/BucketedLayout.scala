package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed corpus layout: pay the shuffle ONCE at write time, then every
  * later join or aggregation on the bucket key is exchange-free.
  *
  * At 100 TB the dominant cost of a curation run is re-shuffling the
  * corpus for each id-keyed join (scores→docs, labels→docs, split
  * assignment, incremental dedup against a reference). Writing the corpus
  * `CLUSTERED BY (doc_id) INTO n BUCKETS` co-locates equal keys in equal
  * bucket files, so Spark's bucketed scan reports the hash partitioning
  * to the planner and a join of two same-geometry layouts plans as a
  * SortMergeJoin over FileScans with ZERO ShuffleExchange (spec-asserted)
  * — per-join shuffle cost drops from O(corpus) to zero.
  *
  * Spark's bucket metadata normally lives in a metastore, which would pin
  * the layout to one catalog. Here the geometry travels WITH THE DATA as
  * a `_graft_buckets.json` marker inside the directory (the dedup_ingest
  * `_graft_mode.json` convention: underscore-prefixed → invisible to
  * parquet readers), and [[register]] re-creates the external table in
  * any fresh session from marker + parquet footer schema — no metastore
  * hand-off, no way to register the wrong geometry by hand (register
  * takes NO geometry arguments; the marker is authoritative, because a
  * mis-declared bucket count silently mis-assigns rows to buckets and
  * every "co-located" join after that is quietly WRONG).
  *
  * A re-registered table needs a partition-local Sort under the join
  * (Spark only trusts SORTED BY when each bucket holds exactly one file)
  * — still zero exchanges; sorting n-th of the corpus per task is the
  * cheap half of a shuffle.
  */
object BucketedLayout {

  private val Marker = "_graft_buckets.json"

  private def markerPath(path: String) =
    new org.apache.hadoop.fs.Path(path, Marker)

  private def q(id: String): String = "`" + id.replace("`", "``") + "`"

  /** One-shuffle bucketed write of `df` to `path` (external parquet +
    * geometry marker). The catalog entry used for the write is temporary
    * — data and marker are the durable artifact; use [[register]] to
    * attach any session to it.
    */
  def write(df: DataFrame, path: String, bucketCol: String, buckets: Int,
            sortCols: Seq[String] = Seq.empty): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(df.columns.contains(bucketCol),
      s"bucket column `$bucketCol` not in ${df.columns.mkString(", ")}")
    val sort = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    sort.foreach(c => require(df.columns.contains(c),
      s"sort column `$c` not in ${df.columns.mkString(", ")}"))
    val spark = df.sparkSession
    val tmp = s"graft_bucketed_write_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(sort.head, sort.tail: _*)
      .option("path", path)
      .saveAsTable(tmp)
    // external table: DROP keeps the files; only the catalog entry goes
    spark.sql(s"DROP TABLE ${q(tmp)}")
    // a real JSON encoder — string-interpolating column names with
    // quotes/backslashes would emit invalid JSON that a regex parser
    // then misreads into the WRONG geometry (silent mis-bucketing)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("bucket_col", bucketCol)
    root.put("buckets", buckets)
    val arr = root.putArray("sort_cols")
    sort.foreach(arr.add)
    val marker = mapper.writeValueAsString(root)
    val p = markerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(marker.getBytes("UTF-8")) finally out.close()
  }

  /** The recorded geometry of a bucketed layout, or None if `path` was
    * not written by [[write]].
    */
  def geometry(spark: SparkSession,
               path: String): Option[(String, Int, Seq[String])] = {
    val p = markerPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // real JSON decode (same encoder as [[write]]) — geometry is too
      // load-bearing for a regex parse to get "mostly" right
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node =
        try mapper.readTree(txt)
        catch { case _: java.io.IOException => return None }
      val col = Option(node.get("bucket_col")).filter(_.isTextual)
        .map(_.asText)
      val n = Option(node.get("buckets")).filter(_.isInt).map(_.asInt)
      val sorts = Option(node.get("sort_cols")).filter(_.isArray).map { a =>
        (0 until a.size).map(a.get(_).asText).toSeq
      }.filter(_.nonEmpty)
      for (c <- col; b <- n) yield (c, b, sorts.getOrElse(Seq(c)))
    }
  }

  /** Bucket-aware read of `path` when it carries a layout marker, plain
    * parquet read otherwise — the drop-in form for pipeline inputs and
    * reference stores (Curate's input, dedup_against's reference,
    * perplexity_score's train corpus): a caller that already paid the
    * bucketed write gets co-located id-joins with no config, and a
    * non-bucketed path behaves exactly as before. The catalog entry is
    * internal (name derived from the path) and re-created on every
    * load, so a REWRITTEN layout with new geometry never serves stale
    * bucket metadata.
    */
  def load(spark: SparkSession, path: String): DataFrame =
    geometry(spark, path) match {
      case None => spark.read.parquet(path)
      case Some(_) =>
        val table = "graft_bucketed_" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(path.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
        spark.sql(s"DROP TABLE IF EXISTS ${q(table)}")
        register(spark, path, table)
    }

  /** Attach a fresh session to a bucketed layout: re-creates the external
    * table `table` over `path` with the MARKER's geometry (no geometry
    * parameters on purpose — see the class doc) and returns it as a
    * DataFrame whose scans are bucket-aware.
    */
  def register(spark: SparkSession, path: String, table: String): DataFrame = {
    val (bucketCol, buckets, sortCols) = geometry(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path carries no $Marker marker — not a BucketedLayout.write " +
          "output; registering a hand-declared geometry over foreign " +
          "files would silently mis-bucket every co-located join"))
    require(!spark.catalog.tableExists(table),
      s"table `$table` already exists — drop it or pick another name")
    val ddl = spark.read.parquet(path).schema.toDDL
    spark.sql(
      s"""CREATE TABLE ${q(table)} ($ddl) USING parquet
         |CLUSTERED BY (${q(bucketCol)})
         |SORTED BY (${sortCols.map(q).mkString(", ")})
         |INTO $buckets BUCKETS
         |LOCATION '${path.replace("'", "''")}'""".stripMargin)
    spark.table(table)
  }
}
