package graft
import org.apache.spark.sql.SparkSession

/** Scratch: run a single named query from SparkEntry at a given sf dir,
  * print rows + plan. Not shipped — lives under tools/ via Compile unmanaged? */
object ScratchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val n = df.count()
    println(s"[scratch] $name rows=$n")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Exchange")).mkString("\n"))
    df.show(20, truncate = false)
    SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/scratch_oracle.sql"), sql)
      println(s"[scratch] oracle sql -> /tmp/scratch_oracle.sql")
    }
    spark.stop()
  }
}
