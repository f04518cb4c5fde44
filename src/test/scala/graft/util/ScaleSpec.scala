package graft.util

import graft.SparkSuite

class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed tables join with no exchange on either side") {
    // unique names: the warehouse dir outlives the in-memory catalog, so
    // a fixed name collides on the second test run
    val tag = java.lang.Long.toHexString(System.nanoTime())
    val (tl, tr) = (s"bucketed_l_$tag", s"bucketed_r_$tag")
    val left = (1 to 1000).map(i => (i.toLong % 50, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong % 50, s"r$i")).toDF("k", "rv")
    Scale.writeBucketed(left, tl, "k", 8)
    Scale.writeBucketed(right, tr, "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table(tl).join(spark.table(tr), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000L * 1000 / 50)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $tl")
      spark.sql(s"DROP TABLE IF EXISTS $tr")
    }
  }

  test("mart sink round-trips through parquet, orc and csv") {
    import java.nio.file.Files
    val df = (1 to 100).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("k", "s", "x")
    for (fmt <- Seq("parquet", "orc", "csv")) {
      val dir = Files.createTempDirectory(s"mart_$fmt").toString + "/t"
      graft.ingest.Sinks.mart(df, dir, sortCols = Seq("k"), format = fmt)
      val back = spark.read.format(fmt)
        .option("header", "true").option("inferSchema", "true").load(dir)
      assert(back.count() == 100, fmt)
      assert(back.columns.toSeq == Seq("k", "s", "x"), fmt)
    }
  }

  test("mart sink file count responds to the files / maxRecordsPerFile knobs") {
    import java.nio.file.Files
    def parquetFiles(dir: java.io.File): Int =
      Option(dir.listFiles()).getOrElse(Array.empty).count(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    val df = (1 to 1000).map(i => (i.toLong, i % 2, s"v$i")).toDF("k", "p", "s")
    // unpartitioned: consolidate to exactly 3 files
    val flat = Files.createTempDirectory("mart_files").toString + "/t"
    graft.ingest.Sinks.mart(df, flat, sortCols = Seq("k"), files = 3)
    assert(parquetFiles(new java.io.File(flat)) == 3)
    // hive-partitioned: files land per partition dir, capped per file
    val part = Files.createTempDirectory("mart_part_files").toString + "/t"
    graft.ingest.Sinks.mart(df, part, partitionCols = Seq("p"),
      files = 4, maxRecordsPerFile = 100)
    val dirs = new java.io.File(part).listFiles().filter(_.getName.startsWith("p="))
    assert(dirs.length == 2)
    // 500 rows per partition value, ≤100/file → ≥5 files each
    dirs.foreach(d => assert(parquetFiles(d) >= 5, d.toString))
    assert(spark.read.parquet(part).count() == 1000)
  }

  test("compact consolidates a shattered append sink, preserving rows exactly") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("compact").toString + "/sink"
    // simulate many micro-batch appends → many small files
    for (b <- 0 until 12)
      (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .coalesce(2).write.mode("append").parquet(dir)
    val wantRows = spark.read.parquet(dir).collect().toSet
    val (before, after) = graft.ingest.Sinks.compact(spark, dir, filesTarget = 3)
    assert(before >= 12 && after == 3, s"$before -> $after")
    assert(spark.read.parquet(dir).collect().toSet == wantRows)
  }

  test("compact: a hard crash between the swap renames is recovered on the next run") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("compact_crash").toString + "/sink"
    (0 until 300).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(4).write.mode("append").parquet(dir)
    val want = spark.read.parquet(dir).collect().toSet
    // simulate the window: the sink staged aside, the compacted copy
    // unplaced (crash before rename(tmp, path))
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hconf)
    val old = new org.apache.hadoop.fs.Path(dir + "._compact_old")
    val tmp = new org.apache.hadoop.fs.Path(dir + "._compact_tmp")
    spark.read.parquet(dir).coalesce(1).write.parquet(tmp.toString)
    assert(fs.rename(path, old) && !fs.exists(path))
    // the re-run of the maintenance job self-heals before compacting
    val (_, after) = graft.ingest.Sinks.compact(spark, dir, filesTarget = 2)
    assert(after == 2)
    assert(spark.read.parquet(dir).collect().toSet == want)
    assert(!fs.exists(old) && !fs.exists(tmp))
    // direct reader-side recovery is idempotent on a healthy sink
    graft.ingest.Sinks.recoverCompact(spark, dir)
    assert(spark.read.parquet(dir).collect().toSet == want)
  }

  test("widen repartitions a narrow leaf up to numShufflePartitions") {
    val narrow = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v").coalesce(1)
    val p = spark.sessionState.conf.numShufflePartitions
    assert(Scale.widen(narrow).rdd.getNumPartitions == p)
  }

  test("widen leaves a post-shuffle input untouched without finalizing its adaptive plan") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val agg = (1 to 1000).map(i => (i.toLong % 10, i)).toDF("k", "v")
      .groupBy("k").count()
    val out = Scale.widen(agg)
    assert(out eq agg, "post-shuffle input must be returned as-is")
    // the old .rdd probe would have finalized the AQE plan (running its
    // stages); the planned-only probe must leave it unexecuted
    out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        assert(!a.isFinalPlan, "widen forced adaptive plan finalization (stage execution)")
      case other => fail(s"expected an AQE-wrapped plan, got ${other.nodeName}")
    }
  }

  test("AQE splits the skewed plain join at lowered thresholds (the no-salt path)") {
    // the q70 skew shape, scaled so the hot key's partition crosses a
    // lowered skew threshold: AQE must split it — the documented rule
    // (saltedJoin scaladoc) is that the explicit salt is only for the
    // cases AQE can't reach (agg-after-join, bucketed layouts, AQE off)
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val big = (1 to 20000)
        .map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, s"payload_value_$i"))
        .toDF("k", "v")
      val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
      val joined = big.join(small, "k").select("k", "v", "name")
      // collect() (NOT count(), which runs a derived plan) finalizes
      // THIS dataset's adaptive plan; ≥18000 rows = the hot key joined
      assert(joined.collect().length >= 18000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skewed"),
        s"AQE did not mark/split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals plain join on skewed data") {
    // hot key: 90% of the big side lands on key 1
    val big = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i.toLong))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
    val salted = Scale.saltedJoin(big, small, "k", factor = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
