package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executed-stage ground truth for a query (VERDICT r14 item 6).
  *
  * Plan-text exchange counts ([[ScaleProof.planExchanges]]) describe
  * the plan Spark INTENDS to run; they cannot see the Spark 4 AQE
  * defect class r14 isolated, where a persisted self-join input wraps
  * each cache scan in its own TableCacheQueryStage, the sibling
  * exchanges stop canonicalizing equal, and a "reused" exchange
  * silently executes twice — the static pin stays constant while two
  * extra shuffle stages run (PLANS r14: cosineNearDupPairs 6 executed
  * shuffle stages / 2.73 GB with the persist vs 4 / 1.37 GB without,
  * same plan-text count). This listener counts what actually ran:
  * completed stages, how many of them wrote shuffle data, and the
  * total shuffle bytes written — the three numbers the r14
  * persist-vs-reuse audit decided on.
  *
  * Scope: counts EVERY stage completing on the context during the
  * action, so callers must not run concurrent queries (the spec/
  * scratch-session context this exists for). The listener bus is
  * async; completion is awaited by polling for quiescence rather than
  * the private `waitUntilEmpty`.
  */
object ExecutedStages {

  final case class Summary(stages: Int, shuffleWriteStages: Int,
                           shuffleBytesWritten: Long)

  /** Run `action` (default: a noop write of `df`) and return the
    * executed-stage summary.
    */
  def of(spark: SparkSession, df: DataFrame): Summary =
    run(spark) { df.write.mode("overwrite").format("noop").save() }

  def run(spark: SparkSession)(action: => Unit): Summary = {
    val lock = new Object
    var stages = 0
    var shuffleStages = 0
    var bytes = 0L
    var lastEvent = System.nanoTime()
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          stages += 1
          val w = e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          if (w > 0) { shuffleStages += 1; bytes += w }
          lastEvent = System.nanoTime()
        }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      action
      // drain: the bus delivers asynchronously — wait until no stage
      // event has landed for 300 ms (bounded at 10 s)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var quiet = false
      while (!quiet && System.nanoTime() < deadline) {
        Thread.sleep(50)
        quiet = lock.synchronized {
          (System.nanoTime() - lastEvent) > 300L * 1000 * 1000
        }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    lock.synchronized(Summary(stages, shuffleStages, bytes))
  }
}
