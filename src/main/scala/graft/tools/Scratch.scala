package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // slow-stage probe: where does the time actually go? Also keeps a
    // running total of stage wall time so driver/planning overhead is
    // visible as (query wall - stage total).
    val stageTotal = new java.util.concurrent.atomic.AtomicLong(0)
    val stageCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        dur.foreach { d => stageTotal.addAndGet(d); stageCount.incrementAndGet() }
        if (dur.exists(_ > 200)) {
          println(f"[stage] id=${si.stageId}%-5d ${dur.get / 1000.0}%7.1f s  tasks=${si.numTasks}%-4d ${si.name.takeWhile(_ != '\n').take(90)}")
          if (dur.exists(_ > 2000))
            si.details.linesIterator.filter(_.contains("graft")).take(4).foreach(l => println("    | " + l.trim))
        }
      }
    })
    def stageSnapshot(): (Long, Long) = (stageTotal.get(), stageCount.get())
    def stageDelta(before: (Long, Long)): String = {
      val (t, c) = stageSnapshot()
      f"stages=${c - before._2}%-3d stageTime=${(t - before._1) / 1000.0}%6.2f s"
    }
    // warm-up
    graft.util.Tables.events(spark, sfDir).count()
    graft.util.Tables.lineitem(spark, sfDir).count()
    def time(name: String)(f: => Long): Unit = {
      val before = stageSnapshot()
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n  ${stageDelta(before)}")
    }
    val qs = graft.SparkEntry.queries
    def hashEval(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.functions.{expr, xxhash64}
      df.select(xxhash64(df.columns.toIndexedSeq.map(df.col): _*).as("_row_hash"))
        .agg(expr("bit_xor(_row_hash)")).head(); 1L
    }
    for (name <- args.drop(1)) {
      time(name + " (count cold)")(qs(name)(spark, sfDir).count())
      time(name + " (count warm)")(qs(name)(spark, sfDir).count())
      time(name + " (hash  cold)")(hashEval(qs(name)(spark, sfDir)))
      time(name + " (hash  warm)")(hashEval(qs(name)(spark, sfDir)))
    }
    spark.stop()
  }
}
