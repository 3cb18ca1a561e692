package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The documentation drift gate: every StageCatalog entry (the source
  * of the generated `doc/` tree) must name a real stage type, compile
  * its example YAML against a frame of its declared shape, and cite
  * only oracle queries that exist. A doc page that stops compiling
  * fails here before it can mislead a user.
  */
class StageCatalogSpec extends SparkSpec {

  private def fixturesPresent =
    new java.io.File("/root/reference/tests/testdata").isDirectory

  private def frame(kind: String): DataFrame = {
    val s = spark
    import s.implicits._
    kind match {
      case "events" =>
        Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
            7L, "click", 1.5, "{}"),
          (2L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"),
            8L, "view", 2.5, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      case "documents" =>
        Seq((1L, "alpha beta gamma delta", "en", "src0"),
          (2L, "epsilon zeta eta theta", "en", "src1"))
          .toDF("doc_id", "text", "lang", "source")
      case "embeddings" =>
        Seq((1L, Seq(1.0, 0.0, 0.0, 0.1)), (2L, Seq(0.9, 0.1, 0.0, 0.1)),
          (3L, Seq(0.0, 1.0, 0.1, 0.0)), (4L, Seq(0.1, 0.9, 0.0, 0.0)))
          .toDF("vec_id", "embedding")
      case "hybrid" => // text AND vector columns (hybrid_topk's corpus)
        Seq((1L, "alpha beta gamma", Seq(1.0, 0.0, 0.0, 0.1)),
          (2L, "delta epsilon zeta", Seq(0.0, 1.0, 0.1, 0.0)))
          .toDF("doc_id", "text", "embedding")
      case "media" =>
        Seq((1L, "not a real container".getBytes("US-ASCII")),
          (2L, Array[Byte](0, 0, 0, 8) ++ "ftyp".getBytes("US-ASCII")))
          .toDF("doc_id", "payload")
      case _ => spark.emptyDataFrame
    }
  }

  test("catalog names cover the three dispatch tables, with no strays") {
    val names = StageCatalog.all.map(_.name).toSet
    assert(StageCatalog.all.map(_.name).distinct.size ==
      StageCatalog.all.size, "duplicate catalog entries")
    val rel = RelationalStages.stageTypes
    val cur = CurationStages.stageTypes
    assert(rel.subsetOf(names),
      s"relational stages undocumented: ${(rel -- names).toSeq.sorted}")
    assert(cur.subsetOf(names),
      s"curation stages undocumented: ${(cur -- names).toSeq.sorted}")
    // 31 reference processors + 7 relational + curation set
    assert(StageCatalog.all.count(_.kind == "processor") == 31)
    assert(names.filter(rel) == rel && names.filter(cur) == cur)
  }

  test("every documented example compiles (the pages cannot drift)") {
    assume(fixturesPresent)
    val prevBase = sys.props.get("graft.rule.base")
    sys.props("graft.rule.base") = "/root/reference"
    try {
      val failures = StageCatalog.all.flatMap { d =>
        try {
          // dedup_ingest's compile IS a run (it appends to its key
          // store) — rewrite WHATEVER store path the example documents
          // to a fresh temp dir, keyed on the stage name rather than a
          // path literal so a future edit of the documented path cannot
          // silently reintroduce shared global state
          val example =
            if (d.name == "dedup_ingest")
              d.example.replaceAll("(?m)^(\\s*store:).*$",
                "$1 \"" + java.nio.file.Files
                  .createTempDirectory("catalog-ingest")
                  .toString + "/keys\"")
            else if (d.name == "hybrid_topk") {
              // the documented queries table needs text AND vector
              // columns; no committed testdata parquet carries both,
              // so the gate materializes one (the ann_ingest
              // temp-path precedent)
              val qDir = java.nio.file.Files
                .createTempDirectory("catalog-hybrid").toString + "/q"
              frame("hybrid")
                .select(col("doc_id").as("qid"), col("text").as("qtext"),
                  col("embedding").as("qvec"))
                .write.mode("overwrite").parquet(qDir)
              d.example.replaceAll("(?m)^(\\s*path:).*$",
                "$1 \"" + qDir + "\"")
            }
            else if (d.name == "ann_ingest")
              // same reasoning: the compile IS a run (create + append),
              // and a persistent documented path would let a stale
              // index from an earlier fixture refuse a retrained
              // create on geometry mismatch
              d.example.replaceAll("(?m)^(\\s*path:).*$",
                "$1 \"" + java.nio.file.Files
                  .createTempDirectory("catalog-ann")
                  .toString + "/index\"")
            else if (d.name == "lex_ingest")
              // the ann_ingest reasoning verbatim (compile = create +
              // append into the documented store path)
              d.example.replaceAll("(?m)^(\\s*path:).*$",
                "$1 \"" + java.nio.file.Files
                  .createTempDirectory("catalog-lex")
                  .toString + "/store\"")
            else d.example
          PipelineCompiler.compile(
            RuleLoader.fromYaml(example))(frame(d.schemaKind))
          None
        } catch {
          case e: Exception => Some(s"${d.name}: ${e.getMessage}")
        }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally prevBase match {
      case Some(b) => sys.props("graft.rule.base") = b
      case None => sys.props.remove("graft.rule.base")
    }
  }

  test("cited oracle queries exist in SparkEntry") {
    val known = graft.SparkEntry.queries.keySet
    val bad = StageCatalog.all.flatMap(d =>
      d.oracle.filterNot(known).map(q => s"${d.name} cites unknown $q"))
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("generated doc tree matches the catalog (regenerate with runMain graft.Docs)") {
    val docDir = new java.io.File("doc/stages")
    assume(docDir.isDirectory) // first generation creates it
    val pages = docDir.listFiles().map(_.getName).toSet
    val expected = StageCatalog.all.map(_.name + ".md").toSet
    assert(pages == expected,
      s"stale: ${(pages -- expected).toSeq.sorted} " +
        s"missing: ${(expected -- pages).toSeq.sorted}")
  }
}
