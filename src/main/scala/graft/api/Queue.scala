package graft.api

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-backed JSONL FIFO bridging pipeline stages — the reference's Queue
  * (core/dbio/iop/queue.go:20-56): a producer appends JSONL records, closes
  * the queue with a `.done` sentinel file, and consumers read records in
  * order. Between API endpoints this decouples extraction stages; the
  * consumer side here is a distributed `spark.read.json` over the queue
  * directory, so a large queue is scanned in parallel.
  */
final case class Queue(spark: SparkSession, dir: String) {

  private val path = new Path(dir)
  private def fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def donePath = new Path(path, ".done")

  /** Append one JSONL part file (producer side, driver or any single task). */
  def publish(records: Seq[String], part: String = "part-0"): Unit = {
    require(!isDone, s"queue $dir is closed")
    fs.mkdirs(path)
    val out = fs.create(new Path(path, s"$part.jsonl"), true)
    try records.foreach { r => out.write((r + "\n").getBytes(StandardCharsets.UTF_8)) }
    finally out.close()
  }

  /** Close the queue: consumers treating `consume: immediate` stop tailing
    * once the sentinel appears (queue.go:33-51).
    */
  def markDone(): Unit = { fs.mkdirs(path); fs.create(donePath, true).close() }

  def isDone: Boolean = fs.exists(donePath)

  /** Distributed consume of everything published so far. */
  def read(): DataFrame = spark.read.json(s"$dir/*.jsonl")

  /** Blocking consume: wait for the producer's done sentinel, then read. */
  def awaitAndRead(timeoutMs: Long = 60000): DataFrame = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!isDone) {
      if (System.currentTimeMillis() > deadline)
        throw new java.util.concurrent.TimeoutException(s"queue $dir not done")
      Thread.sleep(50)
    }
    read()
  }
}
