package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Execution-economics telemetry: per-query shuffle/spill/task counts
  * from a `SparkListener` — the numbers an operator actually watches at
  * 100 TB (is this query's shuffle volume growing? did it start
  * spilling?). This is TELEMETRY, not a query: there is no oracle; the
  * spec asserts presence and sanity on three known plan shapes, and
  * [[graft.Bench]] folds the measurements into the bench artifact so
  * every round's record carries its execution economics alongside its
  * wall-clock.
  *
  * Accuracy contract: the listener bus is ASYNCHRONOUS, so [[measure]]
  * drains it by polling for a stable task count (bounded wait). Metrics
  * are aggregated over every task that completes during the measured
  * body — concurrent foreign work would be attributed too, so callers
  * measure one query at a time (exactly Bench's shape).
  */
object ExecStats {

  /** Aggregated task metrics for one measured body. Bytes fields are
    * totals over all completed tasks. */
  case class Metrics(shuffleReadBytes: Long, shuffleWriteBytes: Long,
                     spillMemBytes: Long, spillDiskBytes: Long,
                     peakExecMemBytes: Long, tasks: Long, jobs: Long) {
    def json: String =
      s"""{"shuffle_read":$shuffleReadBytes,"shuffle_write":$shuffleWriteBytes,""" +
        s""""spill_mem":$spillMemBytes,"spill_disk":$spillDiskBytes,""" +
        s""""peak_exec_mem":$peakExecMemBytes,"tasks":$tasks,"jobs":$jobs}"""
  }

  /** Run `body` with a registered listener and return (result, metrics
    * over the tasks that completed during it). */
  def measure[T](spark: SparkSession)(body: => T): (T, Metrics) = {
    val sRead = new AtomicLong(0); val sWrite = new AtomicLong(0)
    val spillM = new AtomicLong(0); val spillD = new AtomicLong(0)
    val peak = new AtomicLong(0)
    val tasks = new AtomicLong(0); val jobs = new AtomicLong(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          sRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          sWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillM.addAndGet(m.memoryBytesSpilled)
          spillD.addAndGet(m.diskBytesSpilled)
          peak.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
          tasks.incrementAndGet()
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = body
      // drain the async listener bus: wait until the task count is
      // stable across two consecutive 50 ms windows (bounded at 2 s)
      var last = -1L
      var waited = 0
      while (tasks.get() != last && waited < 40) {
        last = tasks.get(); Thread.sleep(50); waited += 1
      }
      (r, Metrics(sRead.get(), sWrite.get(), spillM.get(), spillD.get(),
        peak.get(), tasks.get(), jobs.get()))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
