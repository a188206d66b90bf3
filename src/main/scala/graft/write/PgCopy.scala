package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PostgreSQL `COPY … FROM STDIN` bulk-load fast path.
  *
  * The reference's main throughput feature on PG targets is the COPY
  * protocol instead of batched INSERTs
  * (`core/dbio/database/database_postgres.go:380-480` BulkImportStream,
  * `pq.CopyInSchema`). The Spark-side equivalent: encode every row to
  * PG's COPY text format *distributedly* — each column is a codegen'd
  * expression chain, the line assembly a `concat_ws` — and stream each
  * partition to the target through its own connection. No row ever passes
  * through the driver.
  *
  * Text-format rules (public PG docs, "COPY … FORMAT text"):
  *   - column delimiter: tab; row delimiter: newline
  *   - NULL is the two-character sequence `\N`
  *   - backslash, tab, newline, carriage return in data are escaped as
  *     `\\`, `\t`, `\n`, `\r` (backslash escaped FIRST)
  *   - boolean renders `t`/`f`, bytea as hex `\x…` (escaped to `\\x…`)
  *
  * The network send is behind [[CopyTransport]]: the production transport
  * wraps the PG JDBC driver's CopyManager (not present in this offline
  * build); tests inject a recording transport, and the encoder itself is
  * oracle-checked against DuckDB (`op_pg_copy_encode`).
  */
object PgCopy {

  /** `COPY table (cols) FROM STDIN WITH (FORMAT text)` — the statement the
    * reference prepares via pq.CopyInSchema (database_postgres.go:450).
    */
  def renderCopySql(table: String, columns: Seq[String]): String =
    s"COPY $table (${columns.mkString(", ")}) FROM STDIN WITH (FORMAT text)"

  /** Escape one already-stringified column: backslash first, then the
    * delimiter/terminator characters. Stays inside whole-stage codegen
    * (replace = StringReplace, a codegen'd expression).
    */
  private def escape(c: Column): Column = {
    val bs = "\\"
    replace(replace(replace(replace(c,
      lit(bs), lit(bs + bs)),
      lit("\t"), lit(bs + "t")),
      lit("\n"), lit(bs + "n")),
      lit("\r"), lit(bs + "r"))
  }

  /** Render one column to its COPY text form (pre-escape). */
  private def textOf(field: StructField): Column = {
    val c = col(field.name)
    field.dataType match {
      // PG's own COPY output; NULL must fall through (an `otherwise`
      // would swallow it as false) so encodeColumn's \N coalesce fires
      case BooleanType => when(c === true, "t").when(c === false, "f")
      case BinaryType => concat(lit("\\x"), lower(hex(c))) // bytea hex form
      // instants render as UTC wall clock WITH an explicit +00 offset, so
      // the stored value is independent of both spark.sql.session.timeZone
      // and the PG session TimeZone (a bare cast renders session-local
      // with no offset and the server would reinterpret it); TimeText
      // avoids zone-rule lookups entirely, so DST transition windows of
      // the session zone cannot shift the render either
      case TimestampType => concat(TimeText.utcText(c), lit("+00"))
      case _ => c.cast(StringType)
    }
  }

  /** One encoded column: escaped text, nulls as `\N`. */
  def encodeColumn(field: StructField): Column =
    coalesce(escape(textOf(field)), lit("\\N"))

  /** Whole-row encoder: DataFrame → single-column ("line") DataFrame of
    * COPY text lines. Pure projection — no shuffle, stays in whole-stage
    * codegen, scales with the input partitioning.
    */
  def encodedLines(df: DataFrame): DataFrame =
    df.select(concat_ws("\t",
      df.schema.fields.map(f => encodeColumn(f)).toIndexedSeq: _*).as("line"))

  /** Per-partition sink seam. The production implementation opens a PG
    * connection per partition and drives CopyManager.copyIn(sql, reader);
    * partition-level parallelism is the COPY analogue of the reference's
    * concurrent bulk streams.
    */
  trait CopyTransport extends Serializable {
    /** Stream one partition's lines under the given COPY statement;
      * returns rows written.
      */
    def copyPartition(copySql: String, lines: Iterator[String]): Long
  }

  /** Distributed bulk load: encode + stream every partition through the
    * transport. Returns total rows sent. The `copySql` is rendered once on
    * the driver; each executor partition opens its own channel — the same
    * fan-out the reference gets from concurrent file parts.
    */
  def bulkLoad(df: DataFrame, table: String, transport: CopyTransport): Long = {
    val sql = renderCopySql(table, df.columns.toSeq)
    val lines = encodedLines(df)
    import lines.sparkSession.implicits._
    lines.as[String].rdd
      .mapPartitions(it => Iterator.single(transport.copyPartition(sql, it)))
      .fold(0L)(_ + _)
  }
}
