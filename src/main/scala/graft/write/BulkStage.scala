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
       |  NULL_IF = '\\\\N'
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

  // ---------------- SQL Server BCP ----------------

  /** SQL Server's bulk path is the `bcp` utility over unquoted CSV
    * (database_sqlserver.go:698-855 BcpImportFileParrallel). BCP has no
    * escaping: delimiter/quote/CR/LF characters inside string values are
    * replaced by sentinel placeholders before the CSV is written, loaded
    * verbatim, then restored in-database with one UPDATE of nested
    * REPLACEs (database_sqlserver.go:708-712, 860-920). Empty string gets
    * its own sentinel because bcp reads empty field as NULL.
    */
  val BcpDelimRep = "$~d$~"
  val BcpQuoteRep = "$~q$~"
  val BcpNewlRep = "$~n$~"
  val BcpCarrRep = "$~r$~"
  val BcpEmptyRep = "$~e$~"

  /** Sentinel-encode one string field for the unquoted BCP CSV. */
  def bcpEncode(value: String): String = {
    if (value.isEmpty) BcpEmptyRep
    else value
      .replace(",", BcpDelimRep)
      .replace("\"", BcpQuoteRep)
      .replace("\r", BcpCarrRep)
      .replace("\n", BcpNewlRep)
  }

  /** Distributed encode: the same sentinel substitution as a codegen column
    * chain, so every Spark partition writes its own BCP-ready part file —
    * the per-partition shape `BcpImportFileParrallel` loads concurrently.
    */
  def bcpEncodeCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(c.isNull, lit(null)).otherwise(
      when(c === "", lit(BcpEmptyRep)).otherwise(
        translateSeq(c)))
  }

  private def translateSeq(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // replace() (literal, codegen) — NOT regexp_replace, the sentinels and
    // targets are fixed strings
    val steps = Seq(
      ("," , BcpDelimRep), ("\"", BcpQuoteRep),
      ("\r", BcpCarrRep), ("\n", BcpNewlRep))
    steps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  /** Post-load restore: one UPDATE with nested REPLACEs per affected
    * column (database_sqlserver.go:867-916). Only columns whose values
    * were actually rewritten need restoring — the caller passes that set,
    * keeping the UPDATE narrow.
    */
  def bcpRestoreSql(table: String, columns: Seq[String]): String = {
    val sets = columns.map { c =>
      val r1 = s"REPLACE(CONVERT(NVARCHAR(MAX), $c), '$BcpDelimRep', ',')"
      val r2 = s"REPLACE($r1, '$BcpQuoteRep', '\"')"
      val r3 = s"REPLACE($r2, '$BcpCarrRep', CHAR(13))"
      val r4 = s"REPLACE($r3, '$BcpNewlRep', CHAR(10))"
      val r5 = s"REPLACE($r4, '$BcpEmptyRep', '')"
      s"$c = $r5"
    }
    s"UPDATE $table SET ${sets.mkString(", ")}"
  }

  /** The bcp invocation argv (database_sqlserver.go:1060-1075): UTF-16
    * chars (-w, which also hex-decodes binary columns), comma delimiter,
    * abort on first error (-m 1), quoted-identifier (-q), 50k-row batches,
    * skip the header row (-F 2). Credentials are NOT rendered — the caller
    * supplies them out-of-band (-U/-P or -G for Entra tokens).
    */
  def sqlserverBcpArgs(table: String, csvPath: String, host: String,
      port: Int, database: String, batchSize: Int = 50000,
      errPath: String = "/dev/stderr"): Seq[String] = Seq(
    table.replace("\"", ""), "in", csvPath,
    "-S", s"tcp:$host,$port",
    "-d", database,
    "-t", ",",
    "-m", "1",
    // the staged part files are UTF-8 CSVs (PartitionedWriter), so char
    // mode with code page 65001 — not -w, which expects UTF-16LE input
    "-c", "-C", "65001",
    "-q",
    "-b", batchSize.toString,
    "-F", "2",
    "-e", errPath)

  /** Per-dialect bulk-load capability — which fast path a staged load
    * takes instead of batched JDBC inserts (the reference's per-dialect
    * BulkImportFlow dispatch).
    */
  def fastPathFor(dialect: String): String = dialect match {
    case "postgres" => "copy_stdin"        // PgCopy, database_postgres.go:380
    case "snowflake" => "stage_put_copy"   // database_snowflake.go:818
    case "bigquery" => "load_job"          // database_bigquery.go:826
    // azure/fabric conns embed MsSQLServerConn (database.go:389) and
    // inherit its bcp import
    case "sqlserver" | "azuresql" | "azuredwh" | "fabric" =>
      "bcp"                                // database_sqlserver.go:698
    // duckdb family loads staged files through its in-process HTTP
    // loader instead of row-wise inserts
    case "duckdb" | "motherduck" | "ducklake" =>
      "http_load"                          // database_duckdb.go:273
    case _ => "jdbc_batch"                 // generic Jdbc.write
  }
}
