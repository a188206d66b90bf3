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

  /** Append one JSONL part file (producer side, driver or any single task).
    * The default part name is unique per call — two publishes must append,
    * not overwrite each other. */
  def publish(records: Seq[String], part: String = ""): Unit = {
    require(!isDone, s"queue $dir is closed")
    fs.mkdirs(path)
    val name =
      if (part.nonEmpty) part
      else s"part-${java.util.UUID.randomUUID().toString.take(8)}"
    // write under a temp name and rename into the consumer's *.jsonl glob:
    // the streaming tail (consumeImmediate) tracks files by name exactly
    // once, so a part appearing at its final name half-written would lose
    // its unread tail silently
    val tmp = new Path(path, s".$name.jsonl.tmp")
    val out = fs.create(tmp, true)
    try records.foreach { r => out.write((r + "\n").getBytes(StandardCharsets.UTF_8)) }
    finally out.close()
    require(fs.rename(tmp, new Path(path, s"$name.jsonl")),
      s"queue publish rename failed for $name")
  }

  /** Close the queue: consumers treating `consume: immediate` stop tailing
    * once the sentinel appears (queue.go:33-51).
    */
  def markDone(): Unit = { fs.mkdirs(path); fs.create(donePath, true).close() }

  def isDone: Boolean = fs.exists(donePath)

  /** Distributed consume of everything published so far. A closed queue
    * that never saw a publish is a legitimate empty result, not an error —
    * pass `schema` so downstream selects still resolve against an empty
    * queue (without it the empty frame has zero columns). */
  def read(schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val any = fs.globStatus(new Path(path, "*.jsonl"))
    if (any == null || any.isEmpty)
      schema.map(st => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st))
        .getOrElse(spark.emptyDataFrame)
    else {
      val r = spark.read
      schema.foreach(r.schema)
      r.json(s"$dir/*.jsonl")
    }
  }

  /** Blocking consume: wait for the producer's done sentinel, then read. */
  def awaitAndRead(timeoutMs: Long = 60000,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!isDone) {
      if (System.currentTimeMillis() > deadline)
        throw new java.util.concurrent.TimeoutException(s"queue $dir not done")
      Thread.sleep(50)
    }
    read(schema)
  }

  /** `consume: immediate` (queue.go:33-51, llm_API_SPEC.md:348): tail the
    * queue with a Structured Streaming file source WHILE the producer still
    * runs, instead of waiting for the close sentinel. The producer runs on
    * its own thread; consumer micro-batches land in `workDir/out` as
    * parquet (exactly-once via the stream checkpoint). Fail-fast group
    * semantics like the reference's errgroup: a producer error stops the
    * stream and rethrows; a stream error surfaces as-is. Returns the
    * consumed records once the sentinel appears and the tail is drained.
    *
    * Scale shape: each micro-batch is a distributed json read of only the
    * newly-listed part files; `maxFilesPerTrigger` bounds batch size so a
    * fast producer can't build an unboundedly large batch.
    */
  def consumeImmediate(schema: org.apache.spark.sql.types.StructType,
      workDir: String, producer: () => Unit, timeoutMs: Long = 120000,
      maxFilesPerTrigger: Int = 1000): DataFrame = {
    fs.mkdirs(path)
    val outPath = s"$workDir/out"
    val cpPath = s"$workDir/checkpoint"
    val wfs = new Path(workDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    wfs.delete(new Path(workDir), true)

    @volatile var producerError: Option[Throwable] = None
    val t = new Thread(() => {
      try producer() catch { case e: Throwable => producerError = Some(e) }
    }, s"queue-producer-$dir")
    t.setDaemon(true)

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(s"$dir/*.jsonl")
      .writeStream.format("parquet")
      .option("path", outPath).option("checkpointLocation", cpPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    t.start()
    try {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!isDone && producerError.isEmpty && q.exception.isEmpty) {
        if (System.currentTimeMillis() > deadline)
          throw new java.util.concurrent.TimeoutException(
            s"queue $dir producer did not close within ${timeoutMs}ms")
        Thread.sleep(50)
      }
      producerError.foreach(e => throw new RuntimeException(
        s"queue $dir producer failed (fail-fast)", e))
      q.exception.foreach(throw _)
      q.processAllAvailable() // drain files published right before the sentinel
    } finally q.stop()
    if (wfs.globStatus(new Path(outPath, "*.parquet")) == null ||
        wfs.globStatus(new Path(outPath, "*.parquet")).isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(outPath)
  }
}
