package graft

import org.apache.spark.sql.SparkSession

/** Batch curation driver: run a YAML curation pipeline over a parquet
  * corpus and write the result as training-data layout — the one-command
  * counterpart of [[graft.streaming.StreamRunner]] for the corpus side:
  *
  * {{{
  * runMain graft.Curate curation.yaml in.parquet outDir \
  *   [--partition-by split[,shard]] [--format parquet|json] \
  *   [--bucket-by doc_id:128]
  * }}}
  *
  * `--partition-by` columns (e.g. the `hash_split` stage's `split`, the
  * `shuffle_layout` stage's `shard`) become directory partitions, so a
  * trainer reads `outDir/split=train/` and shard files in position
  * order. Extra-data channels (pre_detector-style side outputs, if the
  * config produces any) write under `outDir/_extra/<channel>/`.
  * `--bucket-by col:N` writes a [[graft.sources.BucketedLayout]] instead:
  * one shuffle now buys exchange-free id-keyed joins for every later run
  * (re-attach with `BucketedLayout.register`).
  */
object Curate {

  def main(args: Array[String]): Unit = {
    val usage = "usage: Curate <config.yaml> <input.parquet> <outDir> " +
      "[--partition-by cols] [--format parquet|json] " +
      "[--profile-by stratumCol[:textCol]] [--bucket-by col:N]\n" +
      "       Curate compact-store <storePath>\n" +
      "       Curate compact-grams <storePath>\n" +
      "       Curate compact-ann <indexPath>\n" +
      "       Curate compact-lex <storePath>\n" +
      "       Curate check-ann <indexPath>\n" +
      "       Curate migrate-lex <frozenIndexPath> <storePath>\n" +
      "       Curate build-lex <corpus.parquet> <indexPath> " +
      "[idField textField [buckets]]\n" +
      "       Curate build-lex --check <corpus.parquet> <indexPath> " +
      "[textField]"
    // maintenance actions: offline compaction of the four ingest
    // stores (dedup_ingest keys / stats_ingest gram counts / the
    // ann_ingest IVF index / the lex_ingest BM25 postings store) —
    // each is a single-WRITER action, so run them while the
    // corresponding streaming query is stopped (concurrent readers
    // are fine: all four commit via ParkSwap). All four folds are
    // replay-safe: a batch replayed after its state was folded still
    // behaves correctly (the marker ledger for grams/ann/lex;
    // preserved attempt tokens for the key store, r17) — the same
    // folds the stages' `compact_every:` knob runs inline.
    // check-ann is READ-ONLY (it resolves through ParkSwap.readerDir
    // and mutates nothing) — safe beside a live writer, unlike the
    // compactions above.
    val maintenance = Set("compact-store", "compact-grams", "compact-ann",
      "compact-lex", "check-ann")
    // build-lex: materialize a BM25 lexical index (ml/LexIndex) —
    // tokenization and the df/dl/n_docs/avgdl statistics paid ONCE at
    // write, so bm25_topk/hybrid_topk `lex_index:` reads O(query
    // terms) of the postings per batch instead of scanning the corpus.
    // Immutable by contract (BM25 statistics drift under append) —
    // re-run to refresh.
    if (args.headOption.contains("build-lex")) {
      // `--check` reports staleness WITHOUT rebuilding: one cheap
      // aggregate over the current corpus vs the marker's frozen
      // n_docs/avgdl, so the re-index cadence is a measured number
      // (doc_drift_pct is also the fraction of the corpus the stale
      // index cannot see at all — see LexIndex.staleness)
      val check = args.lift(1).contains("--check")
      val a = if (check) args.patch(1, Nil, 1) else args
      require(a.length >= 3 && a.length <= 6, usage)
      val cpus0 = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val s = Tables.configure(SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus0]"))
        .config("spark.sql.shuffle.partitions", cpus0)
        .config("spark.ui.enabled", "false")).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try {
        val corpus = sources.BucketedLayout.load(s, a(1))
        if (check) {
          val textField = if (a.length > 3) a(3) else "text"
          val st = ml.LexIndex.staleness(corpus, textField, a(2))
          println(f"""{"build_lex_check":"ok","index":"${a(2)}","n_docs_frozen":${st.nDocsFrozen},"n_docs_current":${st.nDocsCurrent},"doc_drift_pct":${st.docDriftPct}%.2f,"avgdl_frozen":${st.avgdlFrozen}%.4f,"avgdl_current":${st.avgdlCurrent}%.4f,"avgdl_drift_pct":${st.avgdlDriftPct}%.2f}""")
        } else {
          val idField = if (a.length > 3) a(3) else "doc_id"
          val textField = if (a.length > 4) a(4) else "text"
          val buckets = if (a.length > 5) a(5).toInt else 64
          ml.LexIndex.write(corpus, idField, textField, a(2), buckets)
          println(s"""{"build_lex":"ok","index":"${a(2)}",""" +
            s""""buckets":$buckets}""")
        }
      } finally s.stop()
      return
    }
    // migrate-lex: adopt a frozen LexIndex into a fresh ingestable
    // store without re-tokenizing (one re-layout commit; the frozen
    // corpus becomes the store's first batch) — the upgrade path from
    // re-index-on-a-cadence to no-staleness-by-layout.
    if (args.headOption.contains("migrate-lex")) {
      require(args.length == 3, usage)
      val cpus0 = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val s = Tables.configure(SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus0]"))
        .config("spark.sql.shuffle.partitions", cpus0)
        .config("spark.ui.enabled", "false")).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try {
        ml.LexIngest.migrate(s, args(1), args(2))
        println(s"""{"migrate_lex":"ok","from":"${args(1)}",""" +
          s""""store":"${args(2)}"}""")
      } finally s.stop()
      return
    }
    if (args.headOption.exists(maintenance)) {
      require(args.length == 2, usage)
      val cpus0 = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val s = Tables.configure(SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus0]"))
        .config("spark.sql.shuffle.partitions", cpus0)
        .config("spark.ui.enabled", "false")).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try args(0) match {
        case "compact-store" =>
          val (before, after) =
            pipeline.CurationStages.compactIngestStore(s, args(1))
          println(s"""{"compact_store":"ok","store":"${args(1)}",""" +
            s""""rows_before":$before,"rows_after":$after}""")
        case "compact-grams" =>
          val (before, after) = ml.GramStore.compact(s, args(1))
          println(s"""{"compact_grams":"ok","store":"${args(1)}",""" +
            s""""rows_before":$before,"rows_after":$after}""")
        case "compact-ann" =>
          val (before, after) = ml.IvfIngest.compact(s, args(1))
          println(s"""{"compact_ann":"ok","index":"${args(1)}",""" +
            s""""files_before":$before,"files_after":$after}""")
        case "compact-lex" =>
          val (before, after) = ml.LexIngest.compact(s, args(1))
          println(s"""{"compact_lex":"ok","store":"${args(1)}",""" +
            s""""files_before":$before,"files_after":$after}""")
        case "check-ann" =>
          println(checkAnn(s, args(1)))
      } finally s.stop()
      return
    }
    // accept both `--name value` and `--name=value`; unknown flags fail
    // loudly instead of silently running with defaults
    val known = Set("partition-by", "format", "profile-by", "bucket-by")
    val flagVals = scala.collection.mutable.Map.empty[String, String]
    val pos = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val (name, value) = a.indexOf('=') match {
          case -1 =>
            require(i + 1 < args.length, s"flag $a needs a value\n$usage")
            i += 1
            (a.stripPrefix("--"), args(i))
          case eq => (a.substring(2, eq), a.substring(eq + 1))
        }
        require(known.contains(name), s"unknown flag --$name\n$usage")
        flagVals(name) = value
      } else pos += a
      i += 1
    }
    require(pos.length == 3, usage)
    val Seq(cfgPath, inPath, outDir) = pos.toSeq
    val partitionBy = flagVals.get("partition-by")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    val format = flagVals.getOrElse("format", "parquet")
    require(Set("parquet", "json").contains(format),
      s"unsupported --format $format\n$usage")
    val profileBy = flagVals.get("profile-by").map { v =>
      v.split(":") match {
        case Array(strat) => (strat, "text")
        case Array(strat, text) => (strat, text)
        case _ => throw new IllegalArgumentException(
          s"--profile-by wants stratumCol[:textCol], got $v\n$usage")
      }
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bucketBy = flagVals.get("bucket-by").map { v =>
      v.split(":") match {
        case Array(c, n) if n.forall(_.isDigit) && n.nonEmpty => (c, n.toInt)
        case _ => throw new IllegalArgumentException(
          s"--bucket-by wants col:N, got $v\n$usage")
      }
    }
    require(bucketBy.isEmpty || format == "parquet",
      s"--bucket-by is a parquet layout (got --format $format)\n$usage")

    val spark = Tables.configure(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cfgPath, inPath, outDir, partitionBy, format, profileBy,
      bucketBy)
    finally spark.stop()
  }

  /** Occupancy/drift report for an IVF index, as the one JSON line the
    * `check-ann` CLI prints — the ann twin of `build-lex --check` (the
    * r16 drift measurement priced re-tune vs re-index; THIS answers
    * "when to look" with a number): bucket occupancy under the pinned
    * centroids, and for ingestable stores the total-variation distance
    * between each LIVE batch's bucket histogram and the whole store's.
    * A batch landing lopsidedly vs the store (tv → 1) is the
    * distribution-shift tell: probe reads concentrate, recall at the
    * tuned nprobe decays — re-tune (cheap, SCALE_X100_r16 drift rows:
    * restores recall at a probe-width cost) or re-index (halves probe
    * reads). READ-ONLY: resolves through ParkSwap.readerDir, safe
    * beside a live writer. Driver state ≤ centroids × live batches —
    * model-sized; the counts come from parquet footers, not row scans.
    */
  def checkAnn(s: SparkSession, path: String): String = {
    val kind = ml.Similarity.ivfIndexGeometry(s, path)
      .map(_._1).getOrElse(throw new IllegalArgumentException(
        s"$path carries no IVF geometry marker — not an IVF index"))
    val nCen = ml.Similarity.ivfIndexGeometry(s, path).get._2.size
    val bidpart = ml.Similarity.ivfIndexLayout(s, path).contains("bidpart")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val at = ml.ParkSwap.readerDir(fs, path)
    if (bidpart && ml.IvfIngest.dataFileCount(s, at) == 0L)
      return s"""{"check_ann":"ok","index":"$path","kind":"$kind",""" +
        s""""centroids":$nCen,"rows":0}"""
    // partition discovery types `bucket` as int — normalize to long
    val df0 = s.read.parquet(at)
      .withColumn("bucket", org.apache.spark.sql.functions
        .col("bucket").cast("long"))
    val byBucket = df0.groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = byBucket.values.sum
    val occupied = byBucket.size
    val mean = n.toDouble / math.max(1, nCen)
    val maxB = if (byBucket.isEmpty) 0L else byBucket.values.max
    val imbalance = if (mean == 0) 0.0 else maxB / mean
    // per-live-bid drift (ingestable stores): tv(batch, store); the
    // consolidated __compact partition is the settled base, not a batch
    val tv =
      if (bidpart) {
        val perBid = df0.groupBy("bid", "bucket").count().collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val worst = perBid.map(_._1).distinct.filter(_ != "__compact")
          .map { b =>
            val h = perBid.filter(_._1 == b).map(x => x._2 -> x._3).toMap
            val hn = h.values.sum.toDouble
            val d = (byBucket.keySet ++ h.keySet).toSeq.map { k =>
              math.abs(h.getOrElse(k, 0L) / math.max(1.0, hn) -
                byBucket.getOrElse(k, 0L) / n.toDouble)
            }.sum / 2.0
            b -> d
          }.sortBy(-_._2).headOption
        worst.map { case (b, d) =>
          f""","max_batch_tv":$d%.4f,"max_tv_bid":"$b""""
        }.getOrElse("")
      } else ""
    f"""{"check_ann":"ok","index":"$path","kind":"$kind","centroids":$nCen,"rows":$n,"occupied_buckets":$occupied,"empty_buckets":${nCen - occupied},"mean_bucket":$mean%.1f,"max_bucket":$maxB,"imbalance_max_over_mean":$imbalance%.2f$tv}"""
  }

  def run(spark: SparkSession, cfgPath: String, inPath: String,
          outDir: String, partitionBy: Seq[String], format: String,
          profileBy: Option[(String, String)] = None,
          bucketBy: Option[(String, Int)] = None): Unit = {
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cfgPath)), "UTF-8")
    val spec = pipeline.RuleLoader.fromYaml(yaml)
    // bucket-aware input: a corpus written by a previous `--bucket-by`
    // run keeps its co-located id-joins through every later run
    val result = pipeline.PipelineCompiler.compile(spec)(
      sources.BucketedLayout.load(spark, inPath))
    val missing = partitionBy.filterNot(result.main.columns.contains)
    require(missing.isEmpty,
      s"--partition-by column(s) ${missing.mkString(", ")} not in the " +
        s"pipeline output (have: ${result.main.columns.mkString(", ")})")
    bucketBy match {
      case Some((bcol, n)) =>
        require(result.main.columns.contains(bcol),
          s"--bucket-by column $bcol not in the pipeline output " +
            s"(have: ${result.main.columns.mkString(", ")})")
        require(partitionBy.isEmpty,
          "--bucket-by with --partition-by is not supported: a split " +
            "directory per partition re-fragments the bucket files; " +
            "bucket the whole corpus and filter on the split column")
        sources.BucketedLayout.write(result.main, s"$outDir/data", bcol, n)
      case None =>
        val writer = result.main.write.mode("overwrite").format(format)
        (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
         else writer).save(s"$outDir/data")
    }
    result.extra.foreach { case (channel, df) =>
      df.write.mode("overwrite").format(format)
        .save(s"$outDir/_extra/$channel")
    }
    // before/after corpus profile (the ml_corpus_profile operator): what
    // did the run change, per stratum? Written as parquet side tables
    // and summarized on stdout — the report a curation run is judged by.
    profileBy.foreach { case (strat, text) =>
      val in = spark.read.parquet(inPath)
      val out = spark.read.format(format).load(s"$outDir/data")
      for ((tag, df) <- Seq("before" -> in, "after" -> out)) {
        require(df.columns.contains(strat) && df.columns.contains(text),
          s"--profile-by needs `$strat` and `$text` columns in the $tag " +
            s"frame (have: ${df.columns.mkString(", ")})")
        val prof = ml.CorpusStats.corpusProfile(df, strat, text)
        prof.write.mode("overwrite").parquet(s"$outDir/_profile/$tag")
        // coalesce the sums: a pipeline that drops EVERY row leaves an
        // empty profile, and null sums would NPE the summary line AFTER
        // the data was already written — masking a successful run
        val t = prof.agg(
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum("n_docs"),
            org.apache.spark.sql.functions.lit(0L)),
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum("n_tokens"),
            org.apache.spark.sql.functions.lit(0L))).head()
        println(s"""{"profile":"$tag","strata":${prof.count()},""" +
          s""""docs":${t.getLong(0)},"tokens":${t.getLong(1)}}""")
      }
    }
    val rows = spark.read.format(format).load(s"$outDir/data").count()
    println(s"""{"curate":"ok","rows":$rows,"out":"$outDir/data"""" +
      s""","partition_by":"${partitionBy.mkString(",")}"}""")
  }
}
