package graft.repl

import org.apache.spark.sql.SparkSession

/** Pre/post hook interpreter (reference hooks.go:33-95 — the interface is
  * public, the executor closed-source; semantics reconstructed from the
  * docs and call sites). Supported hook types: `query` (run SQL), `check`
  * (boolean SQL expression, fail/warn per on_failure), `log`.
  * on_failure ∈ abort | warn | skip (abort raises; warn records; skip
  * ignores).
  */
object Hooks {

  final case class Hook(kind: String, value: String, onFailure: String = "abort")

  final case class Result(hook: Hook, ok: Boolean, detail: String)

  def run(spark: SparkSession, hooks: Seq[Hook]): Seq[Result] = hooks.map { h =>
    try {
      h.kind match {
        case "query" =>
          spark.sql(h.value).collect()
          Result(h, ok = true, "query ok")
        case "check" =>
          val passed = spark.sql(s"SELECT (${h.value}) AS ok").head.getBoolean(0)
          if (!passed && h.onFailure == "abort")
            throw new IllegalStateException(s"check failed: ${h.value}")
          Result(h, ok = passed, if (passed) "check ok" else s"check failed (${h.onFailure})")
        case "log" =>
          Result(h, ok = true, h.value)
        case other =>
          Result(h, ok = false, s"unknown hook type $other")
      }
    } catch {
      case e: IllegalStateException if h.onFailure == "abort" => throw e
      case e: Exception if h.onFailure != "abort" =>
        Result(h, ok = false, s"${e.getMessage} (${h.onFailure})")
    }
  }
}
