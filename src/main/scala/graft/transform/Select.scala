package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** sling `select` expressions on a DataFrame.
  *
  * Semantics (reference task_run_read.go:58-139, ParseSelectExpr
  * datatype.go:~1140-1220):
  *   - `col`            include
  *   - `col as alias`   include renamed (case-insensitive ` as `)
  *   - `-col`           exclude
  *   - `prefix_*` glob  include/exclude all matching columns
  *   - `@columns`       sentinel for "all columns" (defaults inheritance)
  *   - exclude-only list = all columns minus excludes; any include present
  *     switches to include-mode with excludes applied after.
  */
object Select {

  private final case class Rule(pattern: String, alias: Option[String], exclude: Boolean)

  private def parse(e: String): Rule = {
    val t = e.trim
    if (t.startsWith("-")) Rule(t.drop(1).trim, None, exclude = true)
    else {
      val m = "(?i)^(.*?)\\s+as\\s+(\\S+)$".r
      t match {
        case m(c, a) => Rule(c.trim, Some(a), exclude = false)
        case _ => Rule(t, None, exclude = false)
      }
    }
  }

  private def expand(pattern: String, columns: Seq[String]): Seq[String] =
    if (pattern == "@columns") columns
    else if (pattern.contains("*")) {
      val rx = ("(?i)^" + java.util.regex.Pattern.quote(pattern).replace("*", "\\E.*\\Q") + "$").r
      columns.filter(c => rx.matches(c))
    } else columns.filter(_.equalsIgnoreCase(pattern))

  def apply(df: DataFrame, exprs: Seq[String]): DataFrame = {
    if (exprs.isEmpty) return df
    val rules = exprs.map(parse)
    val cols = df.columns.toSeq
    val excluded = rules.filter(_.exclude).flatMap(r => expand(r.pattern, cols)).toSet
    val includes = rules.filter(!_.exclude)
    val selected: Seq[(String, Option[String])] =
      if (includes.isEmpty) cols.filterNot(excluded).map(_ -> None)
      else includes.flatMap { r =>
        expand(r.pattern, cols).map(_ -> r.alias)
      }.filterNot { case (c, _) => excluded(c) }
    df.select(selected.map { case (c, a) => a.fold(col(c))(col(c).as(_)) }: _*)
  }
}
