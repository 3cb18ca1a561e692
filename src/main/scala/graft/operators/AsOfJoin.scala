package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, attach the most recent right row with
  * the same key and right.time <= left.time.
  *
  * Spark has no built-in as-of join; the scalable implementation is the
  * union-merge shape (not a per-key subquery, not an O(left×right)
  * theta-join): tag and union both sides, sort within key by time
  * (one shuffle on the key), and carry the latest right values forward
  * with `last(..., ignoreNulls=true)` over the time-ordered window. Each
  * side is read once; the cost is one shuffle + one window pass, which
  * survives arbitrarily skewed time ranges and 100× data. (Same plan
  * family DuckDB/Pandas use for ASOF JOIN after sorting.)
  */
object AsOfJoin {

  /** Join `left` to the latest `right` row per key at-or-before the left
    * timestamp. `rightVals` are the value columns to carry; they appear
    * on the output with nulls when no right row precedes.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val lTagged = left.select(
      (col(leftKey).as("__k") +: col(leftTime).cast("timestamp").as("__t") +:
        lit(1).as("__side") +:
        leftCols.map(c => col(c).as(s"l_$c")) ++:
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"r_$c"))): _*)
    val rTagged = right.select(
      (col(rightKey).as("__k") +: col(rightTime).cast("timestamp").as("__t") +:
        lit(0).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"l_$c")) ++:
        rightVals.map(c => col(c).as(s"r_$c"))): _*)
    val unioned = lTagged.unionByName(rTagged)
    // right rows sort before left rows at equal time (side 0 < 1) so an
    // exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"r_$c", last(col(s"r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"l_$c").as(c)) ++
        rightVals.map(c => col(s"r_$c").as(s"asof_$c")): _*)
  }
}
