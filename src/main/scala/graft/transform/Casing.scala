package graft.transform

import org.apache.spark.sql.DataFrame

/** Column-name casing rules (reference datatype.go:1808-1819, Apply :1862):
  * source (keep), target/normalize, snake, upper, lower, camel; plus
  * `CleanName` which replaces non-word characters (datatype.go:23).
  */
object Casing {

  def clean(name: String): String =
    name.replaceAll("[^0-9a-zA-Z_]", "_").replaceAll("_+", "_")

  def snake(name: String): String =
    clean(name)
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      .toLowerCase

  def camel(name: String): String = {
    val parts = snake(name).split("_").filter(_.nonEmpty)
    (parts.headOption.getOrElse("") +: parts.drop(1).map(_.capitalize)).mkString
  }

  def apply(df: DataFrame, mode: String): DataFrame = {
    val rename: String => String = mode match {
      case "snake" => snake
      case "upper" => n => clean(n).toUpperCase
      case "lower" => n => clean(n).toLowerCase
      case "camel" => camel
      case "source" | "" => identity
      case other => throw new IllegalArgumentException(s"unknown casing: $other")
    }
    df.toDF(df.columns.map(rename).toIndexedSeq: _*)
  }
}
