package graft.state

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Incremental-state backend: watermarks keyed by stream id, persisted as a
  * small JSON file (the reference keeps these in a file/DB "state" backend,
  * task_state.go; public call sites task_run.go:847-860).
  *
  * Single-writer (the driver) — written atomically via temp-file rename so a
  * crashed run can't corrupt the previous watermark. On a real deployment
  * the same interface backs onto a Delta/JDBC table.
  */
final class StateStore(path: String) {

  private def load(): Map[String, String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Map.empty
    val txt = Files.readString(p)
    // tiny flat {"k":"v",...} parser — no JSON lib dependency
    "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(txt)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2)))
      .toMap
  }

  private def escape(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  def get(streamId: String): Option[String] = load().get(streamId)

  def put(streamId: String, watermark: String): Unit = {
    val next = load() + (streamId -> watermark)
    val json = next.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${escape(k)}": "${escape(v)}"""" }
      .mkString("{", ", ", "}")
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
