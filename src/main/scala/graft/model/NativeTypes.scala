package graft.model

import org.apache.spark.sql.types._

/** Per-dialect native-type DDL rendering — the Spark-side equivalent of the
  * reference's `GetNativeType` (`core/dbio/iop/datatype.go:1493-1692`)
  * driven by the per-dialect `general_type_map` sections
  * (`core/dbio/templates/{postgres,mysql,snowflake,bigquery,duckdb}.yaml`).
  *
  * The generalized type vocabulary is the reference's; the source of truth
  * here is the Spark `StructType` (every graft write path already carries
  * one), so the mapping is Spark `DataType` → general type → dialect native
  * type, with the reference's placeholder conventions:
  *
  *   - `varchar()`   — fill `()` with the column's max length (string
  *     metadata key `maxLength`, else 255 = the reference's floor,
  *     datatype.go:1564-1579); at/over the dialect's max_string_length the
  *     column falls back to the `text` mapping (datatype.go:1584-1586);
  *   - `decimal(,)`  — fill with the DecimalType's precision/scale;
  *   - derby is included beyond the reference's big-5 so the rendering is
  *     executable in the zero-egress suite.
  */
object NativeTypes {

  /** Spark DataType → the reference's generalized type key. */
  def generalOf(dt: DataType): String = dt match {
    case ShortType | ByteType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType | DoubleType => "float"
    case _: DecimalType => "decimal"
    case BooleanType => "bool"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampNTZType => "datetime"
    case TimestampType => "timestampz"
    case _: StructType | _: ArrayType | _: MapType => "json"
    case other =>
      throw new IllegalArgumentException(s"no general type for $other")
  }

  /** general_type_map per dialect (templates/<dialect>.yaml). */
  val generalTypeMap: Map[String, Map[String, String]] = Map(
    "postgres" -> Map(
      "bigint" -> "bigint", "binary" -> "bytea", "bool" -> "bool",
      "date" -> "date", "datetime" -> "timestamp", "decimal" -> "numeric",
      "float" -> "double precision", "integer" -> "integer",
      "json" -> "jsonb", "smallint" -> "smallint", "string" -> "varchar()",
      "text" -> "text", "time" -> "time(6)", "timestamp" -> "timestamp",
      "timestampz" -> "timestamptz", "uuid" -> "uuid"),
    "mysql" -> Map(
      "bigint" -> "bigint", "binary" -> "longblob", "bool" -> "tinyint(1)",
      "date" -> "date", "datetime" -> "datetime(6)", "decimal" -> "decimal(,)",
      "float" -> "double", "integer" -> "integer", "json" -> "json",
      "smallint" -> "smallint", "string" -> "varchar()",
      "text" -> "mediumtext", "time" -> "varchar()",
      "timestamp" -> "datetime(6)", "timestampz" -> "datetime(6)",
      "uuid" -> "varchar(36)"),
    "snowflake" -> Map(
      "bigint" -> "bigint", "binary" -> "binary()", "bool" -> "boolean",
      "date" -> "date", "datetime" -> "timestamp", "decimal" -> "decimal(,)",
      "float" -> "float", "integer" -> "integer", "json" -> "variant",
      "smallint" -> "smallint", "string" -> "varchar()", "text" -> "text",
      "time" -> "varchar", "timestamp" -> "timestamp_ntz",
      "timestampz" -> "timestamp_tz", "uuid" -> "varchar(36)"),
    "bigquery" -> Map(
      "bigint" -> "int64", "binary" -> "bytes", "bool" -> "bool",
      "date" -> "date", "datetime" -> "timestamp", "decimal" -> "numeric",
      "float" -> "float64", "integer" -> "int64", "json" -> "json",
      "smallint" -> "int64", "string" -> "string", "text" -> "string",
      "time" -> "string", "timestamp" -> "timestamp",
      "timestampz" -> "timestamp", "uuid" -> "string"),
    "duckdb" -> Map(
      "bigint" -> "bigint", "binary" -> "binary", "bool" -> "bool",
      "date" -> "date", "datetime" -> "datetime", "decimal" -> "decimal(,)",
      "float" -> "double", "integer" -> "integer", "json" -> "json",
      "smallint" -> "smallint", "string" -> "varchar()", "text" -> "text",
      "time" -> "time", "timestamp" -> "timestamp",
      "timestampz" -> "timestamptz", "uuid" -> "uuid"),
    // executable in the oracle suite (not a reference dialect)
    "derby" -> Map(
      "bigint" -> "bigint", "binary" -> "blob", "bool" -> "boolean",
      "date" -> "date", "datetime" -> "timestamp", "decimal" -> "decimal(,)",
      "float" -> "double", "integer" -> "integer", "json" -> "clob",
      "smallint" -> "smallint", "string" -> "varchar()", "text" -> "clob",
      "time" -> "time", "timestamp" -> "timestamp",
      "timestampz" -> "timestamp", "uuid" -> "varchar(36)"))

  /** variable.max_string_length / max_string_type per dialect. */
  private val maxString: Map[String, (Int, String)] = Map(
    "postgres" -> (65500, "varchar(65500)"),
    "mysql" -> (16383, "mediumtext"),
    "snowflake" -> (16777216, "varchar"),
    "derby" -> (32672, "clob"))

  /** Render one column's native type. `length` fills `varchar()` (string
    * metadata `maxLength` wins; the reference floors unknown lengths at
    * 255, datatype.go:1576-1579).
    */
  def render(dialect: String, field: StructField): String = {
    val m = generalTypeMap.getOrElse(dialect,
      throw new IllegalArgumentException(s"no type map for dialect '$dialect'"))
    val general = generalOf(field.dataType)
    val tpl = m(general)
    if (tpl.endsWith("()")) {
      val declared =
        if (field.metadata.contains("maxLength"))
          Some(field.metadata.getLong("maxLength").toInt)
        else None
      val length = declared.getOrElse(255)
      maxString.get(dialect) match {
        case Some((maxLen, maxType)) if length >= maxLen => maxType
        case _ => tpl.replace("()", s"($length)")
      }
    } else if (tpl.contains("(,)")) {
      val (p, s) = field.dataType match {
        case d: DecimalType => (d.precision, d.scale)
        case _ => (38, 9)
      }
      tpl.replace("(,)", s"($p,$s)")
    } else if (dialect == "bigquery" && tpl == "numeric") {
      // BigQuery: BIGNUMERIC when outside NUMERIC's (38,9) envelope
      // (datatype.go:1669-1673)
      field.dataType match {
        case d: DecimalType if d.scale > 9 || d.precision > 38 => "bignumeric"
        case _ => tpl
      }
    } else tpl
  }

  /** CREATE TABLE DDL for a whole schema (temp-table staging shape). */
  def createTable(dialect: String, table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " not null"
      s"${f.name} ${render(dialect, f)}$nn"
    }
    s"create table $table (${cols.mkString(", ")})"
  }
}
