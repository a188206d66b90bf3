package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CLI verb routing over the library modules. */
class CliSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tempFile(content: String, suffix: String): String = {
    val f = java.io.File.createTempFile("cli", suffix)
    java.nio.file.Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  test("task verb runs a yaml end to end") {
    val out = "/tmp/graft-test/cli_task"
    val yaml =
      s"""source:
         |  stream: region
         |target:
         |  object: $out
         |  mode: full-refresh
         |""".stripMargin
    Cli.run(spark, Seq("task", tempFile(yaml, ".yaml"), "/root/testdata/sf0.001"))
    assert(spark.read.parquet(out).count() == 5)
  }

  test("pipeline verb executes steps; discover lists columns") {
    val yaml =
      """steps:
        |  - type: log
        |    message: hello
        |  - type: check
        |    expression: "1 = 1"
        |""".stripMargin
    Cli.run(spark, Seq("pipeline", tempFile(yaml, ".yaml")))
    Cli.run(spark, Seq("discover", "reg*", "/root/testdata/sf0.001"))
    intercept[IllegalArgumentException] { Cli.run(spark, Seq("nope")) }
  }
}
