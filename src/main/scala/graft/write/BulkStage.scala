package graft.write

/** Staged bulk-load statement rendering for warehouse targets.
  *
  * The reference's highest-throughput load path on Snowflake/BigQuery is
  * never row-wise JDBC: it stages files and issues one load statement —
  * Snowflake `PUT` + `COPY INTO` from an internal stage
  * (`core/dbio/database/database_snowflake.go:818-880` CopyViaStage,
  * `:1075-1091` StagePUT), BigQuery a load job over staged files
  * (`core/dbio/database/database_bigquery.go:826-870` CopyFromLocal /
  * LoaderFrom). graft already writes the staged parquet/CSV parts
  * distributedly (ParquetTarget / PartitionedWriter — one part per Spark
  * partition, which is exactly the parallel-files shape these loaders
  * want); this object renders the statements that complete the load.
  *
  * Rendering is pure → unit-testable offline, like NativeTypes DDL.
  */
object BulkStage {

  // ---------------- Snowflake ----------------

  /** CREATE STAGE IF NOT EXISTS (database_snowflake.go:250). */
  def snowflakeCreateStage(stageFqn: String): String =
    s"CREATE STAGE IF NOT EXISTS $stageFqn"

  /** PUT a local file part into the internal stage
    * (database_snowflake.go:1077-1080). AUTO_COMPRESS=FALSE because the
    * staged parts are already compressed (parquet/zstd CSV); PARALLEL is
    * the per-file upload thread count.
    */
  def snowflakePut(fileUri: String, stagePath: String, parallel: Int = 8): String =
    s"PUT '$fileUri' $stagePath PARALLEL=$parallel AUTO_COMPRESS=FALSE"

  /** COPY INTO from staged parquet (snowflake.yaml:31-41):
    * MATCH_BY_COLUMN_NAME so part-file column order can't silently shift
    * data, ON_ERROR=ABORT_STATEMENT for all-or-nothing semantics.
    */
  def snowflakeCopyFromStageParquet(table: String, stagePath: String): String =
    s"""COPY INTO $table
       |FROM $stagePath
       |FILE_FORMAT = (
       |  TYPE = PARQUET
       |  COMPRESSION = AUTO
       |  REPLACE_INVALID_CHARACTERS = TRUE
       |  BINARY_AS_TEXT = FALSE
       |)
       |ON_ERROR = ABORT_STATEMENT
       |MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE""".stripMargin

  /** COPY INTO from staged CSV (snowflake.yaml:14-29): explicit column
    * list + `\N` null sentinel — the same conventions as the PG COPY
    * encoder, so one staged CSV serves both targets.
    */
  def snowflakeCopyFromStageCsv(table: String, columns: Seq[String],
      stagePath: String): String = {
    val srcCols = columns.indices.map(i => s"T.$$${i + 1}").mkString(", ")
    s"""COPY INTO $table (${columns.mkString(", ")})
       |FROM (
       |  SELECT $srcCols
       |  FROM $stagePath AS T
       |)
       |FILE_FORMAT = (
       |  TYPE = CSV
       |  RECORD_DELIMITER = '\\n'
       |  ESCAPE_UNENCLOSED_FIELD = NONE
       |  FIELD_OPTIONALLY_ENCLOSED_BY = '0x22'
       |  EMPTY_FIELD_AS_NULL = FALSE
       |  NULL_IF = '\\N'
       |)
       |ON_ERROR = ABORT_STATEMENT""".stripMargin
  }

  /** Whole staged-load statement sequence for one table load: stage the
    * already-written part files, one PUT per part (the reference PUTs
    * parts concurrently; statement order within the parts is free), one
    * COPY INTO at the end.
    */
  def snowflakeStagedLoad(table: String, stageFqn: String,
      partFiles: Seq[String]): Seq[String] = {
    val stagePath = s"@$stageFqn/$table"
    snowflakeCreateStage(stageFqn) +:
      partFiles.map(f => snowflakePut(s"file://$f", stagePath)) :+
      snowflakeCopyFromStageParquet(table, stagePath)
  }

  // ---------------- BigQuery ----------------

  /** BigQuery load-job configuration (REST `jobs.insert` request body) —
    * the JSON shape of the Go client call the reference makes
    * (database_bigquery.go:861-865: LoaderFrom + WriteDisposition
    * WriteAppend). Deterministic field order for golden tests.
    */
  def bigqueryLoadJob(projectId: String, datasetId: String, tableId: String,
      sourceUris: Seq[String], sourceFormat: String = "PARQUET",
      writeDisposition: String = "WRITE_APPEND"): String = {
    require(Seq("PARQUET", "CSV", "NEWLINE_DELIMITED_JSON").contains(sourceFormat),
      s"unsupported sourceFormat $sourceFormat")
    require(Seq("WRITE_APPEND", "WRITE_TRUNCATE", "WRITE_EMPTY").contains(writeDisposition),
      s"unsupported writeDisposition $writeDisposition")
    val uris = sourceUris.map(u => "\"" + u + "\"").mkString(",")
    s"""{"configuration":{"load":{""" +
      s""""destinationTable":{"projectId":"$projectId","datasetId":"$datasetId","tableId":"$tableId"},""" +
      s""""sourceUris":[$uris],""" +
      s""""sourceFormat":"$sourceFormat",""" +
      s""""writeDisposition":"$writeDisposition"}}}"""
  }

  /** Per-dialect bulk-load capability — which fast path a staged load
    * takes instead of batched JDBC inserts (the reference's per-dialect
    * BulkImportFlow dispatch).
    */
  def fastPathFor(dialect: String): String = dialect match {
    case "postgres" => "copy_stdin"        // PgCopy, database_postgres.go:380
    case "snowflake" => "stage_put_copy"   // database_snowflake.go:818
    case "bigquery" => "load_job"          // database_bigquery.go:826
    case _ => "jdbc_batch"                 // generic Jdbc.write
  }
}
