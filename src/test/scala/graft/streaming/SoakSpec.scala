package graft.streaming

import graft.SparkSpec
import graft.pipeline.{Metrics, MetricsRegistry, PipelineCompiler, PipelineSpec, RuleLoader}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

/** Streaming soak (VERDICT r5 item 7): a sustained rate-source run
  * through the full ops surface at once — ConfigRefresh swapping rule
  * versions at the minimum interval, per-stage instrumented metrics,
  * and the error channel carrying failure-tagged events — asserting at
  * the end that nothing accumulated: no cached plans/RDDs in the block
  * manager, no state-store operators (the foreachBatch pipeline is
  * stateless by design), metrics exactly consistent with row counts.
  *
  * Duration: `GRAFT_SOAK_SECONDS` (default 75). The driver-facing specs
  * stay minutes-scale capable; CI pays ~75 s.
  */
class SoakSpec extends SparkSpec with Matchers {

  private def spec(tag: String): PipelineSpec = RuleLoader.fromYaml(
    s"""pipeline:
       |  - type: dissector
       |    rules:
       |      - filter: "message"
       |        dissector:
       |          mapping:
       |            message: "%{k}=%{v|int}"
       |  - type: timestamper
       |    rules:
       |      - filter: "ts_str"
       |        timestamper:
       |          source_fields: [ts_str]
       |          source_format: ["%Y-%m-%d %H:%M:%S"]
       |          target_field: ts_iso
       |  - type: generic_adder
       |    rules:
       |      - filter: "*"
       |        generic_adder:
       |          add: {version: $tag}
       |""".stripMargin)

  test("soak: refresh + metrics + error channel under rate load, no growth") {
    val soakSec = sys.env.getOrElse("GRAFT_SOAK_SECONDS", "75").toInt
    val s = spark
    MetricsRegistry.reset()
    val el = MetricsRegistry.execListener
    s.listenerManager.register(el)

    // rate source; every 10th row carries an unparseable timestamp →
    // _timestamper_failure tag → errors channel
    val stream = s.readStream.format("rate")
      .option("rowsPerSecond", "2000").load()
      .select(
        concat(lit("k="), col("value")).as("message"),
        when(pmod(col("value"), lit(10)) === 0, lit("not-a-time"))
          .otherwise(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss"))
          .as("ts_str"))

    // config content alternates every load → every due check reloads
    val compileBefore = PipelineCompiler.compileInvocations
    val version = new java.util.concurrent.atomic.AtomicLong()
    val refresh = new StreamRunner.ConfigRefresh(
      () => spec(s"v${version.incrementAndGet() % 2}"),
      intervalSec = StreamRunner.ConfigRefresh.MinIntervalSec,
      instrumented = true)

    val mainRows = new java.util.concurrent.atomic.AtomicLong()
    val errRows = new java.util.concurrent.atomic.AtomicLong()
    val batches = new java.util.concurrent.atomic.AtomicLong()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-soak-ckpt").toString
    val persistentBefore = s.sparkContext.getPersistentRDDs.size

    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // instrumented compile attaches the error channel from its CLEAN
        // lineage (counting errors must not re-fire the stage observes)
        val result = refresh.current()(batch)
        batches.incrementAndGet()
        mainRows.addAndGet(Metrics.observed(result.main).count())
        errRows.addAndGet(result.extra("errors").count())
        ()
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + soakSec * 1000L
      while (System.currentTimeMillis() < deadline && q.isActive)
        Thread.sleep(1000)
      // NO processAllAvailable here: a rate source never goes idle, so
      // that call would wait indefinitely — stop() after the deadline
    } finally {
      q.stop()
      // QueryExecutionListener delivery is async on the listener bus —
      // give in-flight observation events time to land before snapshot
      Thread.sleep(2000)
      s.listenerManager.unregister(el)
    }

    withClue(s"batches=${batches.get} main=${mainRows.get} err=${errRows.get} " +
        s"reloads=${refresh.reloads} failures=${refresh.failures}: ") {
      // sustained throughput: at least half the nominal rate overall
      mainRows.get should be >= (soakSec * 1000L)
      batches.get should be >= (soakSec / 2).toLong
      // error channel: every 10th row, exactly
      errRows.get shouldBe (mainRows.get / 10) +- (mainRows.get / 10 / 5 + 2)
      // the alternating config reloaded at ~minimum-interval cadence and
      // each reload recompiled exactly once (plus the initial compile)
      refresh.reloads should be >= (soakSec / (2 * StreamRunner.ConfigRefresh.MinIntervalSec)).toLong
      refresh.failures shouldBe 0
      (PipelineCompiler.compileInvocations - compileBefore) shouldBe (refresh.reloads + 1)
      // per-stage instrumented counters match the rows that flowed
      // counters must match the rows that flowed, modulo at most one
      // stop()-interrupted batch (≤ a couple seconds of the 2000-row/s
      // rate) on either side
      val batchSlack = 5000L
      val snap = MetricsRegistry.snapshot()
      snap.getOrElse(("events_processed", "1_dissector"), 0L) shouldBe
        mainRows.get +- batchSlack
      snap.getOrElse(("events_failed", "2_timestamper"), -1L) shouldBe
        errRows.get +- batchSlack
      // nothing accumulated BY THIS STREAM: suites share one session (and
      // run in parallel — a global emptiness check would race other
      // suites' caches), so assert GROWTH-scoped: a per-batch leak over
      // the ~dozens of batches above would add dozens of persistent
      // RDDs; concurrent suites add at most a handful transiently. And
      // the query itself ran stateless (no state-store operators).
      val persistentAfter = s.sparkContext.getPersistentRDDs.size
      withClue(s"persistent RDDs before=$persistentBefore after=$persistentAfter: ") {
        // fixed threshold: a per-batch leak adds dozens over the run;
        // parallel suites add at most a handful transiently. (A
        // non-per-batch one-time leak can hide under this — precise
        // attribution isn't possible on a shared session.)
        (persistentAfter - persistentBefore).toLong should be < 10L
      }
      Option(q.lastProgress).foreach(p => p.stateOperators.length shouldBe 0)
    }
  }
}
