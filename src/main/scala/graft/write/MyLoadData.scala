package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MySQL `LOAD DATA LOCAL INFILE` bulk-load fast path.
  *
  * The reference's MySQL throughput feature is LOAD DATA LOCAL streamed
  * through the driver's reader handler instead of batched INSERTs
  * (`core/dbio/database/database_mysql.go:543-613` LoadDataLocal,
  * template `core/dbio/templates/mysql.yaml:72-80`). The Spark-side
  * equivalent mirrors [[PgCopy]]: every row encodes to LOAD DATA's
  * *default* text format as a codegen'd projection — tab delimiter,
  * newline terminator, `\N` NULL, backslash escapes — and each partition
  * streams its lines over its own connection ([[graft.sources.Mysql]]).
  *
  * Differences from the COPY text format, per the reference's loader
  * config (database_mysql.go:551-556): booleans load as 1/0 (`BoolAsInt`
  * — LOAD DATA does not convert true/false), and binary columns go
  * hex-encoded into positional `@v` variables decoded by a
  * `SET col = UNHEX(@v)` clause (`BinaryAsHex`,
  * database_mysql.go:562-585).
  */
object MyLoadData {

  /** The LOAD DATA statement for [[graft.sources.Mysql.Client.loadData]].
    * Uses the protocol-level LOCAL INFILE request, so the "file name" is
    * a tag the server echoes back, not a real path. Binary columns get
    * the `@v`/UNHEX columns spec the reference renders. */
  def renderLoadSql(table: String, fields: Seq[StructField]): String = {
    val hasBinary = fields.exists(_.dataType == BinaryType)
    val columnsSpec =
      if (!hasBinary) s"\n(${fields.map(f => s"`${f.name}`").mkString(", ")})"
      else {
        val names = fields.zipWithIndex.map {
          case (f, i) if f.dataType == BinaryType => s"@v$i"
          case (f, _) => s"`${f.name}`"
        }
        val sets = fields.zipWithIndex.collect {
          case (f, i) if f.dataType == BinaryType =>
            s"`${f.name}` = UNHEX(@v$i)"
        }
        s"\n(${names.mkString(", ")})\nSET ${sets.mkString(", ")}"
      }
    s"LOAD DATA LOCAL INFILE 'graft' INTO TABLE $table" +
      s"\nCHARACTER SET utf8mb4$columnsSpec"
  }

  /** Escape one stringified column: backslash first, then tab/newline/CR
    * (LOAD DATA's default `ESCAPED BY '\\'` input rules). Codegen'd
    * StringReplace chain, same as the COPY encoder. */
  private def escape(c: Column): Column = {
    val bs = "\\"
    replace(replace(replace(replace(c,
      lit(bs), lit(bs + bs)),
      lit("\t"), lit(bs + "t")),
      lit("\n"), lit(bs + "n")),
      lit("\r"), lit(bs + "r"))
  }

  private def textOf(field: StructField): Column = {
    val c = col(field.name)
    field.dataType match {
      // BoolAsInt: LOAD DATA doesn't coerce true/false (database_mysql.go:552)
      case BooleanType => when(c === true, "1").when(c === false, "0")
      case BinaryType => lower(hex(c)) // BinaryAsHex → UNHEX on load
      // the MySQL session is pinned to UTC (Mysql.scala SET time_zone),
      // so instants must render as their UTC wall clock — a plain string
      // cast renders in spark.sql.session.timeZone and would shift by
      // the session offset on a write/read round trip; TimeText's epoch
      // arithmetic also sidesteps DST-window double offset resolution
      case TimestampType => TimeText.utcText(c)
      case _ => c.cast(StringType)
    }
  }

  /** One encoded column: escaped text, nulls as `\N`. */
  def encodeColumn(field: StructField): Column =
    coalesce(escape(textOf(field)), lit("\\N"))

  /** Whole-row encoder: DataFrame → single-column ("line") DataFrame of
    * LOAD DATA default-format lines. Pure projection — no shuffle, stays
    * in whole-stage codegen. */
  def encodedLines(df: DataFrame): DataFrame =
    df.select(concat_ws("\t",
      df.schema.fields.map(f => encodeColumn(f)).toIndexedSeq: _*).as("line"))
}
