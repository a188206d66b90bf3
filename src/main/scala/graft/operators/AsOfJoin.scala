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

    // Carry the whole right payload as ONE struct so every field comes from
    // the same matched right row (per-column fill would leak older values
    // into a matched row's NULL fields — a composite row that never existed).
    val payloadStruct = struct((rightPayload.map(col) :+
      col(rightTime).as("__rt")): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        rightPayload.map(c => right.schema(c).copy(name = c)) :+
          right.schema(rightTime).copy(name = "__rt")))

    val l = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        leftCols.map(col)) :+ nullStruct.as("__p"): _*)
    // a NULL right timestamp would sort nulls-first and become the as-of
    // match for every left row — such rows can match nothing, drop them
    val r = right.filter(col(rightTime).isNotNull).select(
      (col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) :+
        payloadStruct.as("__p"): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = l.unionByName(r)
      .select(
        (Seq(col("__side")) ++ leftCols.map(col)) :+
          last(col("__p"), ignoreNulls = true).over(w).as("__p"): _*)

    filled.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(c => col(s"__p.$c").as(c))) :+
        col("__p.__rt").as(s"asof_$rightTime"): _*)
  }
}
