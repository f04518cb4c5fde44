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
