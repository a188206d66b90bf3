package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.TrainingData
import graft.sources.Tables

/** Stage-by-stage wall profile of the td_pipeline_refinedweb composition.
  * Drives the SAME [[TrainingData.refinedWebFixture]] /
  * [[TrainingData.refinedWebPipeline]] the gated row runs — the stage
  * `tap` hook times each stage's construction+materialization, so the
  * profiler can never silently measure a different pipeline than the one
  * the bench prices. (This tool is how the r17 O(n³) captured-lambda
  * Gopher regression was isolated — BASELINE.md round-17.)
  *
  * Usage: runMain graft.tools.RwProfile [sfDir]
  */
object RwProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tap(name: String, f: () => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      // stages the row leaves lazy (near_dup, budget) are forced through
      // localCheckpoint here so each stage's print is its own cost —
      // same computation, one extra materialization boundary
      val r = f().localCheckpoint()
      println(f"[rw] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = TrainingData.refinedWebFixture(
      Tables(spark, sfDir, "documents")).localCheckpoint()
    val t0 = System.nanoTime()
    TrainingData.refinedWebPipeline(docs, tap)
      .write.format("noop").mode("overwrite").save()
    println(f"[rw] total        ${(System.nanoTime() - t0) / 1e9}%8.2f s " +
      "(incl. final assembly)")
    spark.stop()
  }
}
