package graft.repl

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.yaml.snakeyaml.Yaml

/** Pipeline files: an ordered list of steps (reference pipeline.go:18-275),
  * each a hook-typed action or a nested replication. Steps run sequentially;
  * a failing step aborts unless its on_failure says otherwise.
  *
  * YAML shape:
  * {{{
  * steps:
  *   - type: log
  *     message: starting
  *   - type: query
  *     sql: SELECT count(*) FROM region
  *   - type: check
  *     expression: "1 = 1"
  *     on_failure: warn
  * }}}
  */
object Pipeline {

  def parse(yamlText: String): Seq[Hooks.Hook] = {
    val root = new Yaml().load[java.util.Map[String, Object]](yamlText)
      .asScala.toMap
    root("steps").asInstanceOf[java.util.List[Object]].asScala.toSeq.map { s =>
      val m = s.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
      val kind = m("type").toString
      val value = kind match {
        case "log" => m("message").toString
        case "query" => m("sql").toString
        case "check" => m("expression").toString
        case "command" => m("command").toString
        case "copy" => s"${m("from")} > ${m("to")}"
        case "http" => m("url").toString
        case other => throw new IllegalArgumentException(s"unknown step type: $other")
      }
      Hooks.Hook(kind, value, m.getOrElse("on_failure", "abort").toString)
    }
  }

  def run(spark: SparkSession, yamlText: String): Seq[Hooks.Result] =
    Hooks.run(spark, parse(yamlText))
}
