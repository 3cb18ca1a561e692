package graft.streaming

import graft.SparkSpec
import graft.pipeline.RuleLoader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Curation stages through the FULL StreamRunner path (source →
  * foreachBatch pipeline → sink): one YAML drives the batch driver
  * (graft.Curate) and the stream. Whole-corpus stages run with
  * MICRO-BATCH scope inside foreachBatch — dedup_exact dedups within
  * each batch (cross-batch dedup is dedup_events-with-watermark or a
  * dedup_against reference, by design) — and that scoping is pinned
  * here, not left implicit.
  */
class StreamCurationSpec extends SparkSpec {

  test("curation YAML through StreamRunner: signals + redact + batch-scoped dedup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val spec = RuleLoader.fromYaml(
      """pipeline:
        |  - type: quality_signals
        |    text_field: text
        |    signals: [n_tokens]
        |  - type: pii_redact
        |    fields: [text]
        |  - type: dedup_exact
        |    id_field: doc_id
        |    text_field: text
        |""".stripMargin)
    val mem = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
    val sink: DataFrame => Unit = df =>
      seen.synchronized {
        seen ++= df.select("doc_id", "text", "q_n_tokens").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      }
    val ckpt = java.nio.file.Files.createTempDirectory("cur-stream").toString

    // batch 1: an in-batch duplicate pair + a PII row
    mem.addData((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "mail a.b@example.org now"))
    val q1 = StreamRunner.run(mem.toDF().toDF("doc_id", "text"), spec,
      Map("main" -> sink), ckpt, Trigger.AvailableNow())
    q1.awaitTermination()
    assert(seen.map(_._1).sorted.toSeq == Seq(1L, 3L)) // 2 deduped in-batch
    assert(seen.find(_._1 == 3L).get._2 == "mail <EMAIL> now")
    assert(seen.find(_._1 == 1L).get._3 == 3)

    // batch 2: the SAME text again — batch scope means it reappears
    // (cross-batch dedup is dedup_events' watermarked job)
    mem.addData((4L, "alpha beta gamma"))
    val q2 = StreamRunner.run(mem.toDF().toDF("doc_id", "text"), spec,
      Map("main" -> sink), ckpt, Trigger.AvailableNow())
    q2.awaitTermination()
    assert(seen.map(_._1).sorted.toSeq == Seq(1L, 3L, 4L))
  }
}
