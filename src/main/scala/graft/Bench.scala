package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout. Queries are materialized through the noop sink so a
  * metadata-only count can't fake the work.
  */
object Bench {

  /** Representative slice of the operator inventory: scan/agg, pushdown
    * filter, multi-join, window, top-k, SQL surface, merge + CDC writers,
    * as-of join, sessionization, streaming window, text stats, LSH dedup,
    * similarity top-k, exact n-gram join, table-format write+pruned-scan.
    * The last two joined in round 8 (VERDICT r7 item 3): td_dedup_ngram was
    * the most expensive single operator with no regression tracking, and
    * op_delta_skipping covers the table-format metadata/stat-skipping path.
    */
  val headline: Seq[String] = Seq(
    "q1_agg", "q2_filter_project", "q3_join_agg", "q4_window_topn", "q5_topk",
    "q13_custom_sql", "mode_upsert", "mode_cdc_apply", "t_asof_join",
    "t_sessionize", "t_stream_window", "td_text_stats", "td_dedup_near",
    "td_sim_topk", "td_dedup_ngram", "op_delta_skipping")

  // ---- self-calibration (VERDICT r8 item 1) -------------------------------
  // Two fixed workloads measure the BOX, not the code, so every bench
  // artifact carries its own speed reference and round-over-round
  // comparisons stop needing manual "was the machine loaded?" adjudication:
  //   - calib_cpu_sec: single-threaded deterministic spin (xorshift64*,
  //     fixed iteration count) — pure scalar CPU speed;
  //   - calib_spark_sec: a pinned-partitioning in-memory Spark aggregation
  //     (range → hash-mix → groupBy) — scheduler + shuffle + codegen path
  //     at the same local[32] the queries use.
  // Reference constants below were recorded on an idle round-9 box
  // (loadavg 0.61, 2026-08-14; see BASELINE.md "Calibration");
  // normalized totals = raw * (ref / measured).
  val CalibCpuRefSec = 0.92
  val CalibSparkRefSec = 0.38

  /** Single-threaded spin: xorshift64* over a fixed iteration count. The
    * blackhole return defeats JIT dead-code elimination. */
  def calibCpu(): (Double, Long) = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var acc = 0L
    var i = 0
    while (i < 400000000) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      acc += x * 0x2545F4914F6CDD1DL
      i += 1
    }
    ((System.nanoTime() - t0) / 1e9, acc)
  }

  /** Pinned 32-partition in-memory aggregation: 64M rows hashed into 1k
    * groups. Deterministic plan (no files, no AQE dependence on input
    * sizes); exercises codegen, partial agg, and one exchange. */
  def calibSpark(spark: SparkSession): Double = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0, 64L * 1024 * 1024, 1, 32)
      .select((xxhash64(col("id")) % 1024).as("g"), col("id"))
      .groupBy("g").agg(sum("id"), count(lit(1)))
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    runOnce("q1_agg") // JVM/codegen warm-up, unmeasured

    // Median-of-N warm iterations per query: a single-shot run can't
    // distinguish an 8% regression from machine noise (r3's driver total
    // was 30.9 s vs a 27.2 s re-run of identical code). Sub-2s queries get
    // extra iterations: at that scale per-query noise on this box is ±0.6 s
    // (r4 vs r5 ran byte-identical code yet td_sim_topk moved +49%), so
    // median-of-3 is not enough to tell a real regression from jitter.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val fastIters = sys.env.getOrElse("SPARK_GRAFT_BENCH_FAST_ITERS", "7").toInt
    val fastCutoffSec = 2.0
    // optional comma-separated subset for targeted profiling
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').toSeq).getOrElse(headline)
    // Contention telemetry (VERDICT r6 "What's wrong" #2): the r6 committed
    // artifact was 131 s on a loaded box vs 12.8 s for identical code on an
    // idle one. Record process-CPU vs wall and /proc/loadavg alongside the
    // timings so the harness can tell "slow code" from "loaded machine".
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def procCpuSec: Double = osBean.getProcessCpuTime / 1e9
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(",")
      catch { case _: Throwable => "" }
    val loadStart = loadavg
    def medianD(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    // calibration before the measured queries (post-warm-up, so JIT and
    // Spark session startup don't pollute it) …
    val calibCpuStart = medianD(Seq.fill(3)(calibCpu()._1))
    val calibSparkSec = { calibSpark(spark); medianD(Seq.fill(3)(calibSpark(spark))) }
    val wallStart = System.nanoTime()
    val cpuStart = procCpuSec

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      try runOnce(name)
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    val results = selected.map { name =>
      val base = Seq.fill(iters)(time(name))
      // gate the extra iterations on the MIN, not the median: a query whose
      // true cost is fast but whose in-suite samples are polluted (GC /
      // codegen-cache pressure from earlier queries — td_dedup_near
      // measures 1.5 s isolated but has posted 8.5 s medians in-suite)
      // otherwise keeps the fewest iterations exactly when it needs the
      // most, and the polluted median ships as the artifact
      val samples =
        if (base.min < fastCutoffSec && fastIters > iters)
          base ++ Seq.fill(fastIters - iters)(time(name))
        else base
      (name, median(samples), samples.min, samples.length)
    }
    val qs = results.map { case (k, med, _, _) => "\"" + k + f"\":$med%.3f" }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, _, mn, _) => "\"" + k + f"\":$mn%.3f" }
      .mkString("{", ",", "}")
    val ns = results.map { case (k, _, _, n) => "\"" + k + s"""\":$n""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val wallSec = (System.nanoTime() - wallStart) / 1e9
    val cpuSec = procCpuSec - cpuStart
    val ratio = if (wallSec > 0) cpuSec / wallSec else 0.0
    // … and a second CPU spin after them, to catch load that arrived
    // mid-run (the r8 failure mode: loadavg 2.03 at start, flag silent)
    val calibCpuEnd = calibCpu()._1
    // normalized numbers: what this run WOULD have measured on the box the
    // reference constants were recorded on. Spark factor normalizes the
    // query timings (they are Spark workloads); the CPU factor is reported
    // for diagnosis. Factors < 1 mean this box ran faster than reference.
    val sparkFactor = CalibSparkRefSec / calibSparkSec
    val cpuFactor = CalibCpuRefSec / medianD(Seq(calibCpuStart, calibCpuEnd))
    val totalNorm = total * sparkFactor
    val qsNorm = results.map { case (k, med, _, _) =>
      "\"" + k + f"\":${med * sparkFactor}%.3f" }.mkString("{", ",", "}")
    // contended when EITHER calibration deviates >20% from its reference —
    // box-speed variance that per-process cpu/wall ratio cannot see —
    // or the process itself was starved (< 0.5 cores average).
    val calibDev = math.max(math.abs(calibCpuStart / CalibCpuRefSec - 1.0),
      math.abs(calibSparkSec / CalibSparkRefSec - 1.0))
    val contended = ratio < 0.5 || calibDev > 0.20
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","stat":"median-of-$iters%d (fast<${fastCutoffSec}%.0fs: $fastIters%d)","queries":$qs,"queries_min":$mins,"queries_norm":$qsNorm,"iters":$ns,"total_norm":$totalNorm%.3f,"calib_cpu_sec":$calibCpuStart%.3f,"calib_cpu_end_sec":$calibCpuEnd%.3f,"calib_spark_sec":$calibSparkSec%.3f,"calib_cpu_ref":$CalibCpuRefSec%.3f,"calib_spark_ref":$CalibSparkRefSec%.3f,"calib_dev":$calibDev%.3f,"wall_sec":$wallSec%.1f,"proc_cpu_sec":$cpuSec%.1f,"cpu_wall_ratio":$ratio%.2f,"loadavg_start":"$loadStart","loadavg_end":"$loadavg","contended":$contended,"sf":"$sfDir"}""")
    spark.stop()
  }
}
