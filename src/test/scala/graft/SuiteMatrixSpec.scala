package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.repl.SuiteMatrix

/** E2E suite-matrix replay — the port of the reference's templated
  * scenario suites (tests/suite.file.template.yaml + suite.db.template.yaml
  * + suite.cli.yaml) run end-to-end against the reference's own fixtures.
  */
class SuiteMatrixSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // the reference's parquet fixtures carry TIMESTAMP(NANOS) — same conf
    // the engine sessions (GraftSession/Verify/Bench) pin
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("suite matrix: every ported scenario passes its validations") {
    val results = SuiteMatrix.runSuite(spark, SuiteMatrix.resourceSuite(),
      SuiteMatrix.fixtureDir, "/tmp/graft-suite-spec", "/root/testdata/sf0.001")
    assert(results.size >= 60, s"suite shrank to ${results.size} scenarios")
    val failed = results.filterNot(_.passed)
    assert(failed.isEmpty, "failed scenarios:\n" +
      failed.map(r => s"  ${r.name}: ${r.detail}").mkString("\n"))
  }
}
