package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-time profile of a registered query under the bench
  * harness config: runs the query with the bench's full-eval row-hash
  * action and prints one line per Spark job (start order, wall ms, #
  * tasks, callsite) — the measurement behind job-count optimization
  * (guide §1: find out WHERE the time goes before touching anything).
  * An iterative operator whose loop issues N jobs of ~70-100 ms fixed
  * latency shows up here as N near-identical rows; a per-task compute
  * bottleneck shows up as one fat job.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <queryPrefix> [passes]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefix = if (args.length > 1) args(1) else "q126"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val name = graft.SparkEntry.queries.keys.toSeq.sorted
      .find(_.startsWith(prefix))
      .getOrElse(sys.error(s"no query starting with $prefix"))

    case class Job(id: Int, start: Long, var end: Long = 0L,
                   tasks: Int = 0, site: String = "")
    val jobs = scala.collection.mutable.ArrayBuffer.empty[Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs += Job(e.jobId, e.time,
          tasks = e.stageInfos.map(_.numTasks).sum, site = site)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.end = e.time)
      }
    }

    // warm-up pass (classload/codegen) + table touch, like the bench
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings"))
      graft.util.Tables.table(spark, sfDir, t).count()

    def runOnce(): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.select(org.apache.spark.sql.functions.xxhash64(
          df.columns.toIndexedSeq.map(df.col): _*).as("_row_hash"))
        .agg(org.apache.spark.sql.functions.expr("bit_xor(_row_hash)")).head()
      (System.nanoTime() - t0) / 1e9
    }

    for (p <- 1 to passes) {
      jobs.clear()
      if (p == passes) spark.sparkContext.addSparkListener(listener)
      val sec = runOnce()
      if (p == passes) {
        spark.sparkContext.removeSparkListener(listener)
        Thread.sleep(200) // let the listener bus drain
        println(f"== $name pass $p/$passes: $sec%.3f s, ${jobs.size} jobs ==")
        val snap = jobs.synchronized(jobs.toVector).sortBy(_.start)
        var cum = 0L
        for (j <- snap) {
          val ms = if (j.end > 0) j.end - j.start else -1L
          cum += math.max(ms, 0)
          println(f"job ${j.id}%4d ${ms}%6d ms  cum ${cum}%7d  tasks ${j.tasks}%4d  ${j.site}")
        }
      } else println(f"== $name pass $p/$passes: $sec%.3f s (warm) ==")
    }
    spark.stop()
  }
}
