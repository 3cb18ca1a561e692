package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round probe (r17): per-JOB wall-time attribution for one
  * or more declared queries. The bench's compile/firstExec/steady split
  * says WHICH side (driver plan work vs execution) a query spends on;
  * this probe says WHICH JOBS — the eager plan-time actions
  * (localCheckpoints, quantile collects, store appends) land here as
  * individually timed jobs with their call sites, so a fixed-overhead
  * query (full ≈ its sf0.001 cost) can be decomposed instead of guessed
  * at.
  *
  * CLI: `runMain graft.OptProbe <sfDir> <query> [query ...]`
  * Prints, per query: total build+run wall, per-job (duration, stage
  * count, task count, description/call site), and the job-count total —
  * the "how many actions does this query really run" number that
  * guide §5 (driver) and §1.2 (order of operations) want first.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(id: Int, desc: String, site: String, start: Long,
                         var end: Long = -1L, var stages: Int = 0,
                         var tasks: Int = 0)
    val jobs = new scala.collection.mutable.ArrayBuffer[Job]
    val lock = new Object
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = lock.synchronized {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        // the result stage's name IS the action's call site (e.g.
        // "count at CurationStages.scala:2216") — the attribution we want
        val site = j.stageInfos.sortBy(-_.stageId).headOption
          .map(_.name).getOrElse("")
        jobs += Job(j.jobId, desc, site, j.time,
          stages = j.stageInfos.size,
          tasks = j.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = lock.synchronized {
        jobs.find(_.id == j.jobId).foreach(_.end = j.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "4").toInt
    for (name <- names) {
      val fn = PlanAudit.resolve(name)
      // warm-up (JIT + codegen) — not attributed
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"warmup $name: $e") }
      CacheSweep.sweep(spark)
      // min/median over N full rebuild-and-run passes (the Bench
      // discipline): a single pass carries ±20% scheduler/GC noise,
      // far above the effect sizes an optimization round grades
      val times = (1 to reps).map { _ =>
        lock.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val t1 = System.nanoTime()
        CacheSweep.sweep(spark)
        (t1 - t0) / 1e9
      }
      Thread.sleep(300) // let the listener drain
      val snap = lock.synchronized(jobs.toVector) // last pass's jobs
      val jobSum = snap.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      val med = times.sorted.apply(times.size / 2)
      println(f"\n===== $name  min=${times.min}%.3f s  med=$med%.3f s  " +
        f"(${times.map(t => f"$t%.2f").mkString(",")})  " +
        f"jobs=${snap.size}  jobwall=$jobSum%.3f s")
      val nJobs = sys.env.getOrElse("SPARK_GRAFT_PROBE_JOBS", "25")
      if (nJobs != "0")
        snap.sortBy(j => -(j.end - j.start))
          .take(if (nJobs == "1") 25 else nJobs.toInt).foreach { j =>
          val d = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
          println(f"  job ${j.id}%4d ${d}%8.3f s  stages=${j.stages}%2d " +
            f"tasks=${j.tasks}%4d  ${j.site.take(54)}%-54s ${j.desc.take(60)}")
        }
    }
    spark.stop()
  }
}
