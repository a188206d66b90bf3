package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** JSON/struct flatten: nested fields become `parent__child` columns down to
  * `depth` levels (0 = unlimited); non-struct leaves (incl. arrays) are kept
  * as-is, matching the reference which keeps arrays as JSON payloads
  * (core/dbio/iop/json.go:80-85,309-318; config.go:1627-1638).
  *
  * Pure schema rewrite — one `select`, no shuffle, codegen-friendly.
  */
object Flatten {

  def apply(df: DataFrame, depth: Int = 0): DataFrame = {
    def walk(schema: StructType, prefix: String, path: String, level: Int): Seq[Column] =
      schema.fields.toSeq.flatMap {
        case StructField(name, st: StructType, _, _)
            if depth == 0 || level < depth =>
          walk(st, s"$prefix${name}__", s"$path`$name`.", level + 1)
        case StructField(name, _, _, _) =>
          Seq(col(s"$path`$name`").as(s"$prefix$name"))
      }
    df.select(walk(df.schema, "", "", 0): _*)
  }
}
