package graft.repl

import org.apache.spark.sql.SparkSession

/** Pre/post hook interpreter (reference hooks.go:33-95 — the interface is
  * public, the executor closed-source; semantics reconstructed from the
  * docs and call sites). Supported hook types: `query` (run SQL), `check`
  * (boolean SQL expression, fail/warn per on_failure), `log`, `command`
  * (run a process, non-zero exit = failure), `copy` (src>dst file copy via
  * Hadoop FS), `http` (GET the URL, non-2xx = failure).
  * on_failure ∈ abort | warn | skip (abort raises; warn records; skip
  * ignores).
  */
object Hooks {

  final case class Hook(kind: String, value: String, onFailure: String = "abort")

  final case class Result(hook: Hook, ok: Boolean, detail: String)

  private def fail(h: Hook, detail: String): Result =
    if (h.onFailure == "abort") throw new IllegalStateException(detail)
    else Result(h, ok = false, s"$detail (${h.onFailure})")

  def run(spark: SparkSession, hooks: Seq[Hook]): Seq[Result] = hooks.map { h =>
    try {
      h.kind match {
        case "query" =>
          // hook results are status signals, not data movement — cap the
          // materialization so a SELECT * hook cannot OOM the driver
          spark.sql(h.value).limit(10000).collect()
          Result(h, ok = true, "query ok")
        case "check" =>
          val passed = spark.sql(s"SELECT (${h.value}) AS ok").head.getBoolean(0)
          if (passed) Result(h, ok = true, "check ok")
          else fail(h, s"check failed: ${h.value}")
        case "log" =>
          Result(h, ok = true, h.value)
        case "command" =>
          // hooks run driver-side, like the reference's local process hooks
          val pb = new ProcessBuilder("sh", "-c", h.value)
          pb.redirectErrorStream(true)
          val proc = pb.start()
          val out = new String(proc.getInputStream.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim
          val code = proc.waitFor()
          if (code == 0) Result(h, ok = true, out)
          else fail(h, s"command exit $code: $out")
        case "copy" =>
          val Array(src, dst) = h.value.split(">", 2).map(_.trim)
          val sp = new org.apache.hadoop.fs.Path(src)
          val dp = new org.apache.hadoop.fs.Path(dst)
          val conf = spark.sparkContext.hadoopConfiguration
          // each side resolves its OWN filesystem — src on local, dst on an
          // object store is the normal export case
          org.apache.hadoop.fs.FileUtil.copy(
            sp.getFileSystem(conf), sp, dp.getFileSystem(conf), dp,
            false, true, conf)
          Result(h, ok = true, s"copied $src -> $dst")
        case "http" =>
          val conn = new java.net.URI(h.value).toURL.openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setConnectTimeout(10000)
          conn.setReadTimeout(30000)
          val code = conn.getResponseCode
          conn.disconnect()
          if (code >= 200 && code < 300) Result(h, ok = true, s"http $code")
          else fail(h, s"http $code for ${h.value}")
        case other =>
          fail(h, s"unknown hook type $other")
      }
    } catch {
      case e: IllegalStateException if h.onFailure == "abort" => throw e
      case e: Exception if h.onFailure != "abort" =>
        Result(h, ok = false, s"${e.getMessage} (${h.onFailure})")
    }
  }
}
