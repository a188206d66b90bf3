package graft.write

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply — the reference's `merge_change_capture` strategy.
  *
  * Reference: the per-source log readers are closed-source, but the apply
  * semantics are public: a change stream carries `_sling_synced_op` ∈ I/U/D
  * and a monotonically increasing `_sling_cdc_seq`; apply keeps the latest
  * event per PK via ROW_NUMBER() OVER (PARTITION BY pk ORDER BY seq DESC) and
  * then deletes/upserts (core/dbio/templates/postgres.yaml:104-130, strategy
  * enum database.go:2918-2929, dispatch task_run_write.go:997-1032).
  *
  * Scale: one window shuffle over the (small) change stream + one PK join
  * against the target; on Delta this is `MERGE … WHEN MATCHED AND op='D' THEN
  * DELETE`. In streaming, the same function is the `foreachBatch` body.
  */
object ChangeCapture {

  /** Collapse a change stream to its latest event per PK. */
  def latestPerKey(cdc: DataFrame, pk: Seq[String], seqCol: String): DataFrame = {
    val w = Window.partitionBy(pk.map(col).toSeq: _*).orderBy(col(seqCol).desc)
    cdc.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Hard apply: D deletes, U/I upsert. */
  def apply(target: ParquetTarget, cdc: DataFrame, pk: Seq[String],
      seqCol: String = "_sling_cdc_seq", opCol: String = "_sling_synced_op"): Unit = {
    val latest = latestPerKey(cdc, pk, seqCol)
    val tgt = target.read
    val untouched = tgt.join(latest.select(pk.map(col).toSeq: _*), pk, "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(tgt.columns.map(col).toSeq: _*)
    target.replaceWith(untouched.unionByName(upserts))
  }

  /** Soft apply (`change_capture_soft`): deletes become a `_sling_deleted`
    * flag; updated/inserted rows carry `_sling_deleted = false`.
    */
  def applySoft(target: ParquetTarget, cdc: DataFrame, pk: Seq[String],
      seqCol: String = "_sling_cdc_seq", opCol: String = "_sling_synced_op"): Unit = {
    val latest = latestPerKey(cdc, pk, seqCol)
    val tgt = target.read
    // re-runnable: rows untouched by THIS batch keep a flag set by an
    // earlier apply (a lit(false) reset would resurrect soft deletes), and
    // the data columns exclude any existing flag so the select below can't
    // duplicate it
    val dataCols = tgt.columns.filterNot(_ == "_sling_deleted").toSeq
    val prior =
      if (tgt.columns.contains("_sling_deleted"))
        coalesce(col("_sling_deleted"), lit(false))
      else lit(false)
    val untouched = tgt.withColumn("_sling_deleted", prior)
      .join(latest.select(pk.map(col).toSeq: _*), pk, "left_anti")
      .select((dataCols.map(col) :+ col("_sling_deleted")): _*)
    val applied = latest
      .withColumn("_sling_deleted", col(opCol) === "D")
      .select((dataCols.map(col) :+ col("_sling_deleted")): _*)
    target.replaceWith(untouched.unionByName(applied))
  }
}
