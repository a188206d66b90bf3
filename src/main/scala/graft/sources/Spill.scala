package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bounded-driver-memory staging for driver-paged REST protocols.
  *
  * Several engine surfaces (Trino's `nextUri` cursor, BigQuery
  * `getQueryResults` pages, Athena `GetQueryResults` tokens, the Azure
  * Table continuation scan, ClickHouse's single HTTP response) are
  * driver-paged by protocol design: one logical cursor, no server-side
  * slicing. The reference streams those cursors through bounded channels
  * (core/dbio/database/database_trino.go, database_clickhouse.go — the
  * result set is never held in memory); the Spark-side analogue is this
  * stage: each page's rows are appended to rotating JSONL part files as
  * they arrive (only the current page is ever resident on the driver),
  * and Spark then reads the staged files distributed — executors, not
  * the driver, do the parse/type work, and parallelism follows the part
  * files.
  *
  * Staging writes through the Hadoop FS API, so the root can be any
  * filesystem Spark can read back (`hdfs://`, `s3a://`, a shared mount,
  * `file:`). Root resolution, in order: explicit `Config.dir`, the
  * session conf `spark.graft.spill.dir`, then — ONLY on a `local[*]`
  * master, where driver temp is readable by every "executor" — a JVM
  * temp directory. On any other master an unset root is refused up
  * front: a driver-local landing zone would stage files the executors
  * can't open, and that must fail at plan time, not as a
  * FileNotFoundException mid-job.
  */
object Spill {

  /** Session conf naming the shared staging root for spill files. */
  val DirKey = "spark.graft.spill.dir"

  /** Staging knobs: rotate part files every `partBytes`, land under
    * `dir` (root resolution above when None). Small `partBytes` in tests
    * forces rotation so specs can assert bounded residency via part
    * counts. */
  final case class Config(partBytes: Long = 64L << 20,
      dir: Option[String] = None)

  /** Resolve the staging root: explicit dir > session conf > (local
    * master only) JVM temp. Factored for direct spec coverage of the
    * non-local refusal without standing up a cluster master. */
  def resolveRoot(master: String, confDir: Option[String],
      explicit: Option[String], prefix: String): String =
    explicit.orElse(confDir.filter(_.nonEmpty)).getOrElse {
      if (!master.startsWith("local"))
        throw new IllegalStateException(
          s"Spill staging has no shared root configured: executors on " +
            s"master '$master' cannot read a driver-local temp directory. " +
            s"Set $DirKey (or pass Spill.Config(dir = ...)) to a filesystem " +
            s"all executors can read — hdfs://, s3a://, or a shared mount.")
      java.nio.file.Files.createTempDirectory(s"graft-$prefix").toUri.toString
    }

  // ---- staged-directory cleanup registry ------------------------------------
  // ONE JVM shutdown hook over a removable map — staged dirs purge eagerly
  // via purge()/JsonlWriter.purge() and fall out of the registry; the hook
  // is only the backstop for dirs still live at exit. (Per-file
  // File.deleteOnExit would grow the JVM's hook set unboundedly on a
  // long-running driver and is local-FS-only.) Each entry carries the
  // Hadoop conf THE WRITER USED — a bare `new Configuration()` would miss
  // session-only settings (spark.hadoop.fs.s3a.* credentials, custom
  // scheme impls) and silently fail to delete on exactly the shared
  // stores this staging exists for.
  private val pending = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.hadoop.conf.Configuration]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      pending.forEach((d, c) =>
        try deleteDir(d, c) catch { case _: Exception => () })))
  private def deleteDir(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new Path(dir)
    p.getFileSystem(conf).delete(p, true)
  }
  private def register(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    hookInstalled; pending.put(dir, conf)
  }

  /** Eagerly delete a staged directory and drop it from the exit-time
    * backstop. Call once the staged frame has been fully consumed. */
  def purge(dir: String): Unit = {
    val conf = Option(pending.remove(dir))
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    try deleteDir(dir, conf) catch { case _: Exception => () }
  }

  /** Rotating JSONL writer over the Hadoop FS API. One line at a time —
    * the only driver-side state is the current buffered write, never the
    * result set. */
  final class JsonlWriter(spark: SparkSession, prefix: String,
      config: Config = Config()) {
    private val hconf = spark.sessionState.newHadoopConf()
    val dir: Path = {
      val shared = config.dir.orElse(
        Option(spark.conf.get(DirKey, null)).filter(_.nonEmpty))
      shared match {
        case Some(root0) =>
          // shared root: stage under a per-writer subdirectory so
          // concurrent writers never collide and purge stays scoped
          val root = new Path(root0)
          val fs = root.getFileSystem(hconf)
          val d = new Path(fs.makeQualified(root),
            s"$prefix-${java.util.UUID.randomUUID}")
          fs.mkdirs(d)
          d
        case None =>
          // default local temp: resolveRoot enforces the local-only
          // guard and creates the directory — it IS the staging dir
          // (a nested level would leave the outer temp dir behind
          // after purge/exit, leaking one empty dir per read)
          val d = new Path(resolveRoot(spark.sparkContext.master,
            None, None, prefix))
          d.getFileSystem(hconf).makeQualified(d)
      }
    }
    private val fs: FileSystem = dir.getFileSystem(hconf)
    register(dir.toString, hconf)

    private var part = -1
    private var partBytes = 0L
    private var out: java.io.Writer = null
    private var _rows = 0L
    private val _files = collection.mutable.ArrayBuffer[String]()

    private def rotate(): Unit = {
      if (out != null) out.close()
      part += 1
      partBytes = 0L
      val p = new Path(dir, f"part-$part%05d.jsonl")
      _files += p.toString
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(p), "UTF-8"), 1 << 16)
    }

    def write(line: String): Unit = {
      if (out == null || partBytes >= config.partBytes) rotate()
      out.write(line)
      out.write('\n')
      partBytes += line.length + 1
      _rows += 1
    }

    def rows: Long = _rows
    def parts: Int = _files.size

    /** Flush + close; returns the part files written (possibly none). */
    def close(): Seq[String] = {
      if (out != null) { out.close(); out = null }
      _files.toSeq
    }

    /** Eagerly delete this writer's staged directory (drops it from the
      * exit backstop too). Only after the staged frame is consumed —
      * the read is lazy and may scan the files more than once. */
    def purge(): Unit = Spill.purge(dir.toString)
  }

  /** Distributed read-back of a staged spill. With a schema the parse is
    * exact (FAILFAST — a malformed staged line is a bug, not data); with
    * None the shape flows through Spark's distributed JSON inference
    * (the NDJSON sources that always inferred keep doing so). Zero rows
    * stage no files; the frame is still correctly-typed and empty. */
  def readJsonl(spark: SparkSession, schema: Option[StructType],
      files: Seq[String]): DataFrame = schema match {
    case Some(s) if files.isEmpty =>
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    case Some(s) =>
      spark.read.schema(s).option("mode", "FAILFAST").json(files: _*)
    case None if files.isEmpty =>
      spark.emptyDataFrame
    case None =>
      spark.read.json(files: _*)
  }

  /** Type a distributed dataset of JSONL lines fetched from a remote
    * service, contacting the service EXACTLY ONCE. With a schema the
    * read is a single streaming pass (no inference scan). Without one,
    * Spark's JSON inference needs a scan before the data scan — the
    * lines persist (memory, spilling to executor disk) across the two
    * passes, the typed frame is localCheckpoint-ed to cut lineage back
    * to the fetch, and the staging blocks are released immediately.
    * Every re-fetchable-but-expensive source (Bigtable readRows,
    * ClickHouse partitioned cursors, Elasticsearch scrolls, Prometheus
    * range windows) types through here so a schema-inference pass never
    * doubles wire traffic.
    *
    * Durability tradeoff, by design: localCheckpoint blocks are not
    * recomputable after an executor loss (the lineage back to the HTTP
    * fetch is cut — which is the point: the fetch is the expensive,
    * sometimes non-idempotent part). Jobs that need executor-loss
    * resilience should pass an explicit schema (single pass, lineage
    * preserved) or land the fetch in a staged table first. */
  def typed(spark: SparkSession, schema: Option[StructType],
      lines: org.apache.spark.sql.Dataset[String]): DataFrame = schema match {
    case Some(s) =>
      spark.read.schema(s).option("mode", "FAILFAST").json(lines)
    case None =>
      val ds = lines.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try spark.read.json(ds).localCheckpoint(true)
      finally ds.unpersist(blocking = false)
  }

  /** Stage a page-walking cursor and hand back the distributed frame.
    * `walk` drives the protocol cursor, calling `emit` once per row
    * (a rendered JSONL line); nothing else is retained driver-side. */
  def stage(spark: SparkSession, prefix: String, schema: Option[StructType],
      config: Config)(walk: (String => Unit) => Unit): DataFrame = {
    val w = new JsonlWriter(spark, prefix, config)
    walk(w.write)
    readJsonl(spark, schema, w.close())
  }
}
