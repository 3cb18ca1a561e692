package graft
import org.apache.spark.sql.SparkSession

/** Scratch: print the tree-walk exchange count (PlanGuard's metric) for
  * one named query.
  */
object ScratchEx {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    args.take(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"[ex] $name exchanges=${ScaleProof.planExchanges(df)}")
    }
    spark.stop()
  }
}
