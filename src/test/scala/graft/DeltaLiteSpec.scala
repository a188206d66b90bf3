package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DeltaLite

/** Delta transaction-log replay + single-writer commits (protocol v1). */
class DeltaLiteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = s"/tmp/graft-test/$name"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  test("append commits accumulate; overwrite swaps the snapshot") {
    import spark.implicits._
    val t = freshDir("delta1")
    DeltaLite.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), t)
    DeltaLite.append(Seq((3, "c")).toDF("id", "v"), t)
    assert(DeltaLite.read(spark, t).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))

    DeltaLite.overwrite(Seq((9, "z")).toDF("id", "v"), t)
    assert(DeltaLite.read(spark, t).collect().map(_.getInt(0)).toSeq == Seq(9))
    // three commits on disk: 0,1,2
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fs.listStatus(new org.apache.hadoop.fs.Path(t, "_delta_log"))
      .map(_.getPath.getName).filter(_.endsWith(".json")).sorted
    assert(commits.length == 3)
  }

  test("remove actions drop files from the snapshot") {
    import spark.implicits._
    val t = freshDir("delta2")
    DeltaLite.append(Seq((1, "a")).toDF("id", "v"), t)
    DeltaLite.append(Seq((2, "b")).toDF("id", "v"), t)
    val (files, version) = DeltaLite.activeFiles(spark, t)
    assert(files.size >= 2 && version == 1L)
  }

  test("checkpoint seeds the replay; later json commits still apply") {
    import spark.implicits._
    val t = freshDir("delta3")
    DeltaLite.append(Seq((1, "a")).toDF("id", "v"), t)   // v0
    DeltaLite.append(Seq((2, "b")).toDF("id", "v"), t)   // v1
    val (files, _) = DeltaLite.activeFiles(spark, t)
    // write a checkpoint at v1 advertising the current files
    val cpRows = files.map(f => Tuple1(f)).toDF("path")
      .select(struct(col("path")).as("add"))
    cpRows.coalesce(1).write.parquet(
      s"$t/_delta_log/00000000000000000001.checkpoint.parquet")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(t, "_delta_log/_last_checkpoint"), true)
    out.write("""{"version":1}""".getBytes); out.close()

    DeltaLite.append(Seq((3, "c")).toDF("id", "v"), t)   // v2, after checkpoint
    assert(DeltaLite.read(spark, t).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
  }

  test("protocol v2 tables are rejected") {
    import spark.implicits._
    val t = freshDir("delta4")
    DeltaLite.append(Seq((1, "a")).toDF("id", "v"), t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(
      t, "_delta_log/00000000000000000001.json"), true)
    out.write("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}"""
      .getBytes)
    out.close()
    intercept[IllegalArgumentException] { DeltaLite.read(spark, t) }
  }
}
