package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.StringClean
import graft.sources.Tables

/** Physical-plan assertions: the properties that matter at 100 TB
  * (pushdown, bucketed shuffle elimination, codegen containment).
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filters and projection push into the parquet scan") {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_quantity") > 10)
      .select("l_orderkey", "l_quantity")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity,10.0)"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
  }

  test("bucketed join reads bucketed scans without a join-side shuffle") {
    import org.apache.spark.sql.functions._
    val o = Tables(spark, "/root/testdata/sf0.001", "orders")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").saveAsTable("plan_o")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").saveAsTable("plan_o2")
    val j = spark.table("plan_o").join(spark.table("plan_o2"), "o_orderkey")
    val plan = formatted(j)
    assert(plan.contains("Bucketed: true"), plan)
    assert(!plan.contains("Exchange"), s"join over co-bucketed tables must not shuffle:\n$plan")
  }

  test("native string-clean expressions stay inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, "/root/testdata/sf0.001", "customer")
      .select(StringClean.strip_accents(col("c_name")).as("a"),
        StringClean.strip_non_printable(col("c_name")).as("b"))
    val plan = formatted(df)
    // formatted mode marks whole-stage-codegen operators with a codegen id;
    // the Project evaluating our expressions must carry one
    assert(plan.contains("Project [codegen id"), plan)
    // eval correctness incl. non-ASCII
    import spark.implicits._
    val out = Seq(("café x", "naïve")).toDF("s", "t")
      .select(StringClean.strip_non_printable(StringClean.strip_accents($"s")),
        StringClean.strip_accents($"t"))
      .head
    assert(out.getString(0) == "cafe x")
    assert(out.getString(1) == "naive")
  }
}
