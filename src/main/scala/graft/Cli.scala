package graft

import org.apache.spark.sql.SparkSession

/** CLI front-end mirroring the reference's `sling run` verbs:
  *
  *   runMain graft.Cli task <task.yaml> [sfDir]          one stream
  *   runMain graft.Cli replication <repl.yaml> <targetRoot> [sfDir]
  *   runMain graft.Cli pipeline <pipeline.yaml> [sfDir]  ordered steps
  *   runMain graft.Cli discover <pattern> [sfDir]        list streams
  *   runMain graft.Cli conns list|test|discover <env.yaml> [NAME] [pattern]
  *
  * Each verb routes to the same engine modules the library exposes —
  * the CLI is only argument parsing plus a session.
  */
object Cli {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Cli <task|replication|pipeline|discover> ...")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: Seq[String]): Unit = {
    // JSON string escape for interpolated free text (exception messages,
    // stream names): a quote or backslash would otherwise break consumers
    def j(s: String): String = Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def readFile(p: String): String =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8)
    args.head match {
      case "task" =>
        val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
        val rows = repl.TaskConfig.run(spark, readFile(args(1)), sfDir)
        println(s"""{"verb":"task","rows_in_target":$rows}""")
      case "replication" =>
        val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.001")
        val compiled = repl.Replication.parse(readFile(args(1)),
          sources.Tables.names)
        val out = repl.Replication.run(spark, sfDir, compiled, args(2))
        out.foreach { case (st, mode, n) =>
          println(s"""{"stream":"${j(st)}","mode":"${j(mode)}","rows":$n}""")
        }
      case "pipeline" =>
        val results = repl.Pipeline.run(spark, readFile(args(1)))
        results.foreach(r =>
          println(s"""{"step":"${r.hook.kind}","ok":${r.ok}}"""))
      case "discover" =>
        val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
        sources.Discover.columns(spark, sfDir, Seq(args(1)))
          .collect().foreach { r =>
            println(s"""{"stream":"${j(r.getString(0))}","position":${r.getLong(1)},""" +
              s""""column":"${j(r.getString(2))}","type":"${j(r.getString(3))}"}""")
          }
      case "conns" =>
        // conns list <env.yaml> | conns test <env.yaml> <NAME>
        // | conns discover <env.yaml> <NAME> [pattern]
        // (ref cmd/sling/sling_cli.go conns verbs; connection.go registry)
        val registry = repl.Connections.parse(readFile(args(2)))
        args(1) match {
          case "list" =>
            registry.values.toSeq.sortBy(_.name).foreach { c =>
              println(s"""{"name":"${j(c.name)}","type":"${j(c.kind)}"}""")
            }
          case "test" =>
            val (ok, msg) = repl.Connections.test(
              repl.Connections.resolve(registry, args(3)))
            println(s"""{"name":"${j(args(3).toUpperCase)}","ok":$ok,"detail":"${j(msg)}"}""")
          case "discover" =>
            val streams = repl.Connections.discover(
              repl.Connections.resolve(registry, args(3)),
              args.lift(4).getOrElse("*"))
            streams.foreach(t => println(s"""{"stream":"${j(t)}"}"""))
          case other =>
            throw new IllegalArgumentException(s"unknown conns verb $other")
        }
      case other =>
        throw new IllegalArgumentException(s"unknown verb $other")
    }
  }
}
