package graft.state

import java.util.concurrent.ConcurrentLinkedDeque

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Rows/sec progress tracking — the reference reports throughput over a
  * trailing 10-second window (task.go:304-333, task_func.go:264-267). On
  * Spark the per-task input/output record counts arrive on the listener
  * bus, so the tracker is cluster-wide for free: every executor's task
  * metrics fold into one driver-side window.
  */
final class Progress private (windowMs: Long) extends SparkListener {

  private final case class Tick(at: Long, read: Long, written: Long)
  private val ticks = new ConcurrentLinkedDeque[Tick]()
  @volatile private var totalRead = 0L
  @volatile private var totalWritten = 0L

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    // failed/killed/speculative-duplicate attempts also fire onTaskEnd with
    // populated metrics — counting them double-counts retried rows
    if (m != null && taskEnd.reason == org.apache.spark.Success) {
      val r = m.inputMetrics.recordsRead
      val w = m.outputMetrics.recordsWritten
      if (r > 0 || w > 0) {
        totalRead += r
        totalWritten += w
        ticks.addLast(Tick(System.currentTimeMillis(), r, w))
        prune()
      }
    }
  }

  private def prune(): Unit = {
    val cutoff = System.currentTimeMillis() - windowMs
    while (!ticks.isEmpty && ticks.peekFirst().at < cutoff)
      ticks.pollFirst()
  }

  final case class Snapshot(rowsRead: Long, rowsWritten: Long,
      readPerSec: Double, writtenPerSec: Double)

  /** Totals plus trailing-window rates. */
  def snapshot(): Snapshot = {
    prune()
    val it = ticks.iterator()
    var r = 0L; var w = 0L
    while (it.hasNext) { val t = it.next(); r += t.read; w += t.written }
    val sec = windowMs / 1000.0
    Snapshot(totalRead, totalWritten, r / sec, w / sec)
  }

  def detach(spark: SparkSession): Unit =
    spark.sparkContext.removeSparkListener(this)
}

object Progress {
  /** Attach a tracker to the session's listener bus. */
  def attach(spark: SparkSession, windowSeconds: Int = 10): Progress = {
    val p = new Progress(windowSeconds * 1000L)
    spark.sparkContext.addSparkListener(p)
    p
  }
}
