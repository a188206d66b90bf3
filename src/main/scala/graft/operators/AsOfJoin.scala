package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the latest right row whose time
  * is <= the left row's time, per join key.
  *
  * Spark has no as-of join operator; rather than a per-row range probe (which
  * would be a O(n·m) theta-join), we use the union-sort formulation:
  * interleave both sides into one stream, shuffle once on the key, sort by
  * (time, side) within partitions, and carry the last-seen right payload
  * forward with `last(..., ignoreNulls)` over an unbounded-preceding window.
  * One shuffle + one sort — the same cost as a sort-merge join, at any key
  * cardinality. Right rows sort before left rows at equal timestamps, giving
  * inclusive (<=) semantics.
  */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(c => c == rightKey || c == rightTime)

    val l = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        leftCols.map(col)) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        lit(null).cast(right.schema(rightTime).dataType).as(s"__rt"): _*)
    val r = right.select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        rightPayload.map(col) :+ col(rightTime).as("__rt"): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r)
      .select(
        (Seq(col("__side")) ++ leftCols.map(col) ++
          (rightPayload :+ "__rt").map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)

    filled.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightPayload.map(col)) :+
        col("__rt").as(s"asof_$rightTime"): _*)
  }
}
