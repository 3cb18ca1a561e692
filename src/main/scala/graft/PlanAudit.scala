package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object PlanAudit {
  /** The bench chains live in BenchChains, not the declared-query map —
    * resolve both so the full headline is auditable.
    */
  def resolve(name: String): (SparkSession, String) => DataFrame = name match {
    case "events_chain" => (s, d) => BenchChains.eventsChain(s, d)
    case "pipeline_chain" => (s, d) => BenchChains.pipelineChain(s, d)
    case other => GraftQueries.queries(other)
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.01")
    // SPARK_GRAFT_PLAN_OUT=<dir> writes one <query>.txt per name instead
    // of stdout — the plans/r17 before/after capture path
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_OUT")
    for (name <- args) {
      val txt = try resolve(name)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"FAILED to plan: $e" }
      outDir match {
        case Some(od) =>
          val p = java.nio.file.Paths.get(od, s"$name.txt")
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
          println(s"wrote $p")
        case None =>
          println(s"########## $name")
          println(txt)
      }
    }
    spark.stop()
  }
}
