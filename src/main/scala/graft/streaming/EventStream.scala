package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface: windowed aggregation over a file-backed
  * micro-batch source, and batch sessionization (the stateful-processing
  * pattern that maps to flatMapGroupsWithState in continuous mode).
  *
  * The reference is batch micro-pipeline only (SURVEY.md §2.5); these are the
  * Spark-native streaming equivalents of its batching knobs.
  */
object EventStream {

  /** Per-user sessionization state (streamingSessionize). */
  final case class Sess(lastMicros: Long, nSessions: Long, nEvents: Long)

  /** State-store provider seam. Spark's default HDFS-backed provider keeps
    * every live state-store version on the executor heap — fine for the
    * small keyed cardinalities here, a heap bomb at real state sizes
    * (100s of GB of session keys across a cluster). The RocksDB provider
    * bundled with Spark keeps state off-heap with incremental snapshot
    * upload, so state capacity scales with disk instead of heap. Results
    * must be identical under either provider (pinned by
    * `StreamingStateStoreSpec`).
    */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val DefaultProvider: String =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def resolveProvider(p: String): String = p.toLowerCase match {
    case "rocksdb"          => RocksDbProvider
    case "hdfs" | "default" => DefaultProvider
    case _                  => p // fully-qualified custom provider class
  }

  /** Run `body` with the given state-store provider ("rocksdb", "hdfs", or a
    * fully-qualified class name), restoring the prior session setting after.
    * The provider conf is read once at stream start, so wrapping the query
    * launch is sufficient — no per-query plumbing.
    */
  private val PinnedKey = "spark.graft.stateStore.pinned"

  def withStateStore[T](spark: SparkSession, provider: String)(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    val prevPin = spark.conf.getOption(PinnedKey)
    spark.conf.set(ProviderKey, resolveProvider(provider))
    spark.conf.set(PinnedKey, "true")
    try body
    finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None    => spark.conf.unset(ProviderKey)
      }
      prevPin match {
        case Some(v) => spark.conf.set(PinnedKey, v)
        case None    => spark.conf.unset(PinnedKey)
      }
    }
  }

  /** Env seam: `SPARK_GRAFT_STATE_STORE=rocksdb` flips every stateful query
    * started by this object without touching call sites. An explicit
    * [[withStateStore]] wrapper pins its choice — the env must not
    * override it, or an A/B comparison would silently run one provider
    * twice.
    */
  private def configureFromEnv(spark: SparkSession): Unit =
    if (!spark.conf.getOption(PinnedKey).contains("true"))
      sys.env.get("SPARK_GRAFT_STATE_STORE")
        .foreach(p => spark.conf.set(ProviderKey, resolveProvider(p)))

  /** Tumbling-window count/sum per event_type, run as a real streaming query
    * (file source → complete-mode memory sink, drained synchronously).
    * Sums go through decimal so streaming-state accumulation order can't
    * change the result.
    */
  def windowedAgg(spark: SparkSession, eventsDir: String, queryName: String): DataFrame = {
    configureFromEnv(spark)
    val batch = spark.read.parquet(eventsDir)
    val stream = spark.readStream.schema(batch.schema).parquet(eventsDir)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).as("total_dec"))
    // streaming state cost scales with shuffle partitions (one state store
    // each); the keyed cardinality here is tiny, so run the stateful stage
    // narrow and restore the session setting after
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // skip the trailing empty micro-batch (complete-mode results are already
    // final after the data batch; the no-data batch just re-cycles state).
    // Save/restore like shuffle.partitions — leaking `false` session-wide
    // would stop watermark-finalization batches for every later stream.
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.getOption(noDataKey)
    spark.conf.set(noDataKey, "false")
    try {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      prevNoData match {
        case Some(v) => spark.conf.set(noDataKey, v)
        case None    => spark.conf.unset(noDataKey)
      }
    }
    spark.table(queryName)
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_dec").cast("double").as("total"))
  }

  /** Streaming deduplication with bounded state: duplicates are dropped
    * inside the watermark horizon (`dropDuplicatesWithinWatermark`), so
    * state is evicted as event time advances — the unbounded-state
    * `dropDuplicates` alternative doesn't survive an infinite stream.
    * The input is the events stream unioned with itself (every row arrives
    * twice), modelling at-least-once delivery upstream.
    */
  def streamingDedup(spark: SparkSession, eventsDir: String,
      queryName: String): DataFrame = {
    configureFromEnv(spark)
    val batch = spark.read.parquet(eventsDir)
    def src = spark.readStream.schema(batch.schema).parquet(eventsDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").as("event_ts"))
    val atLeastOnce = src.unionByName(src)
    val dedup = atLeastOnce
      .withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = dedup.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(queryName)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(queryName)
      .select("event_id", "user_id", "event_type", "value")
  }

  /** True-streaming sessionization with custom state:
    * `flatMapGroupsWithState` keyed by user, carrying (last event time,
    * session count, event count) across micro-batches and opening a new
    * session after `gapMinutes` of inactivity. This is the
    * KeyValueGroupedDataset path the reference's batching knobs map to for
    * genuinely unbounded inputs; state is per-key and O(1). On a real
    * deployment pass `stateTimeoutMinutes` to evict idle keys via the
    * processing-time timeout (a reappearing user restarts its counters —
    * the standard bounded-state tradeoff for unbounded key spaces). The
    * default keeps NoTimeout because this harness drains finite inputs
    * with processAllAvailable, which would otherwise block on the pending
    * timer batch. Emits one (user_id, n_sessions, n_events) row per user
    * per batch (Update mode).
    */
  def streamingSessionize(spark: SparkSession, eventsDir: String,
      queryName: String, gapMinutes: Int = 30,
      stateTimeoutMinutes: Option[Int] = None): DataFrame = {
    configureFromEnv(spark)
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val batch = spark.read.parquet(eventsDir)
    val stream = spark.readStream.schema(batch.schema).parquet(eventsDir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)]

    val gapMicros = gapMinutes * 60L * 1000000L

    def update(user: Long, events: Iterator[(Long, java.sql.Timestamp, Long)],
        state: GroupState[Sess]): Iterator[(Long, Long, Long)] = {
      // bounded state: a user idle past the timeout is evicted (final
      // totals were already emitted each update); a reappearing user
      // restarts its counters — the standard tradeoff that lets per-key
      // state survive an unbounded key space
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      // order within the batch: state semantics require event-time order
      val sorted = events.toSeq.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
      var s = state.getOption.getOrElse(Sess(Long.MinValue, 0L, 0L))
      sorted.foreach { case (_, ts, _) =>
        val micros = Math.floorDiv(ts.getTime, 1000L) * 1000000L +
          ts.getNanos / 1000L
        val newSession = s.lastMicros == Long.MinValue ||
          micros - s.lastMicros > gapMicros
        s = Sess(micros, s.nSessions + (if (newSession) 1 else 0), s.nEvents + 1)
      }
      state.update(s)
      stateTimeoutMinutes.foreach(m => state.setTimeoutDuration(m * 60L * 1000L))
      Iterator.single((user, s.nSessions, s.nEvents))
    }

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val timeout =
        if (stateTimeoutMinutes.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout
      val q = stream.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update, timeout)(update)
        .toDF("user_id", "n_sessions", "n_events")
        .writeStream
        .outputMode("update")
        .format("memory")
        .queryName(queryName)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // Update mode appends one row per user per batch; keep the latest
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    spark.table(queryName)
      .withColumn("__max_ev", max(col("n_events")).over(w))
      .filter(col("n_events") === col("__max_ev"))
      .drop("__max_ev").distinct()
  }

  /** Gap-based sessionization: a new session starts after `gapMinutes` of
    * user inactivity. lag + cumulative sum over (user, time) — one shuffle.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
    val newSession = when(gap.isNull || gap > gapMinutes * 60L * 1000000L, 1).otherwise(0)
    events
      .withColumn("__new", newSession)
      .withColumn("session_num", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  // ---- bounded CDC runs (config.go:1764-1794 CDCOptions + target
  // batch_limit/batch_max_duration, config.go:1737-1738) ------------------

  /** The reference's CDC batching/bounding knobs re-expressed for a
    * Structured Streaming run:
    *   - `replayFromSeq`: restart point — events with seq below it were
    *     applied by a previous run and are skipped (`replay_from`);
    *   - `runMaxEvents`: stop the RUN after exactly this many events,
    *     capping within the final micro-batch (`run_max_events`);
    *   - `runMaxDuration`: wall-clock ceiling for the run — no batch
    *     STARTS applying past the deadline (`run_max_duration`);
    *   - `batchLimit`: rows per commit — a larger micro-batch commits in
    *     chunks of at most this many events, in seq order, so progress is
    *     visible mid-stream (`batch_limit`);
    *   - `batchMaxDuration`: commit cadence → Trigger.ProcessingTime
    *     (`batch_max_duration`).
    */
  final case class CdcRunOptions(
      replayFromSeq: Option[Long] = None,
      runMaxEvents: Option[Long] = None,
      runMaxDuration: Option[java.time.Duration] = None,
      batchLimit: Option[Int] = None,
      batchMaxDuration: Option[java.time.Duration] = None,
      softDelete: Boolean = false)

  /** Duration grammar shared with the reference's YAML ("10m", "30s",
    * "500ms", "1h"; bare number = seconds). */
  def parseDuration(s: String): java.time.Duration = {
    val t = s.trim.toLowerCase
    if (t.endsWith("ms")) java.time.Duration.ofMillis(t.dropRight(2).trim.toLong)
    else if (t.endsWith("h")) java.time.Duration.ofHours(t.dropRight(1).trim.toLong)
    else if (t.endsWith("m")) java.time.Duration.ofMinutes(t.dropRight(1).trim.toLong)
    else if (t.endsWith("s")) java.time.Duration.ofSeconds(t.dropRight(1).trim.toLong)
    else java.time.Duration.ofSeconds(t.toLong)
  }

  /** Streaming CDC apply over a parquet change-feed directory with the
    * bounded-run knobs above. One input file per micro-batch (so run
    * bounds act between batches); each batch merges through
    * [[graft.write.ChangeCapture]] inside foreachBatch.
    *
    * The within-batch event cap and batch_limit chunking order by the
    * sequence column — a single-partition window, fine here because a
    * micro-batch is one input file (bounded by the writer's split size),
    * never the whole feed.
    *
    * Returns (events applied, commits made).
    */
  def cdcApplyBounded(spark: SparkSession, cdcDir: String,
      target: graft.write.ParquetTarget, pk: Seq[String],
      opts: CdcRunOptions = CdcRunOptions(),
      seqCol: String = "_sling_cdc_seq"): (Long, Long) = {
    import org.apache.spark.sql.streaming.Trigger
    val schema = spark.read.parquet(cdcDir).schema
    val applied = new java.util.concurrent.atomic.AtomicLong(0L)
    val commits = new java.util.concurrent.atomic.AtomicLong(0L)
    val deadline = opts.runMaxDuration.map(d => System.nanoTime() + d.toNanos)
    def pastDeadline: Boolean = deadline.exists(System.nanoTime() >= _)
    val src0 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(cdcDir)
    val src = opts.replayFromSeq
      .map(s0 => src0.filter(col(seqCol) >= s0)).getOrElse(src0)
    def commitChunk(chunk: DataFrame): Unit = {
      if (opts.softDelete) graft.write.ChangeCapture.applySoft(target, chunk, pk, seqCol)
      else graft.write.ChangeCapture(target, chunk, pk, seqCol)
      commits.incrementAndGet()
    }
    var writer = src.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val remaining = opts.runMaxEvents.map(_ - applied.get())
        if (!pastDeadline && remaining.forall(_ > 0)) {
          val n = batch.count()
          val takeN = remaining.map(math.min(_, n)).getOrElse(n)
          val ordered = batch.withColumn("__rn",
            row_number().over(Window.orderBy(col(seqCol))))
          val lim = opts.batchLimit.map(_.toLong).getOrElse(takeN max 1L)
          var off = 0L
          while (off < takeN) {
            val hi = math.min(off + lim, takeN)
            commitChunk(ordered
              .filter(col("__rn") > off && col("__rn") <= hi).drop("__rn"))
            off = hi
          }
          applied.addAndGet(takeN)
        }
        ()
      }
      .queryName(s"cdc_bounded_${System.identityHashCode(target)}")
    opts.batchMaxDuration.foreach(d =>
      writer = writer.trigger(Trigger.ProcessingTime(d.toMillis)))
    val q = writer.start()
    // drain all available input in a side thread; the main loop enforces
    // the run bounds (stop as soon as a bound is hit, not at drain end)
    val drain = new Thread(() => {
      try q.processAllAvailable() catch { case _: Throwable => () }
      try q.stop() catch { case _: Throwable => () }
    })
    drain.setDaemon(true)
    // set BEFORE q.stop(): distinguishes a bound-triggered stop (a clean,
    // expected end of a bounded run) from the query dying on its own
    @volatile var boundHit = false
    drain.start()
    while (q.isActive) {
      if (opts.runMaxEvents.exists(applied.get() >= _) || pastDeadline) {
        boundHit = true
        try q.stop() catch { case _: Throwable => () }
      }
      Thread.sleep(20)
    }
    drain.join(10000)
    // A failed foreachBatch (e.g. target write fault) must fail the RUN —
    // the reference fails the task on apply errors; returning partial
    // counts here would report a broken CDC apply as success. A stop we
    // triggered for run_max_events/run_max_duration is the one case where
    // the query ending early is the contract, not a failure.
    q.exception.foreach { e => if (!boundHit) throw e }
    (applied.get(), commits.get())
  }
}
