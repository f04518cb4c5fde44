package graft

class SparkEntrySpec extends SparkSuite {

  test("every oracle entry has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("windowed aggregation batch form sums to the event count") {
    val dir = "/root/testdata/sf0.001"
    val n = graft.util.Tables.events(spark, dir).count()
    val tumb = graft.ext.EventWindows.tumbling(graft.util.Tables.events(spark, dir))
    assert(tumb.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) == n)
    val sess = graft.ext.EventWindows.sessions(graft.util.Tables.events(spark, dir))
    assert(sess.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0) == n)
  }

  test("q20 anti-join gate is non-trivial: the complement is non-empty at every SF") {
    // VERDICT r15 item 1: a hash gate over an EMPTY result also passes a
    // plan that wrongly drops everything. Pin non-emptiness so the gate
    // stays a real anti-join discriminator if the fixture ever changes.
    for (sf <- Seq("sf0.001", "sf0.01"))
      assert(SparkEntry.queries("q20_anti_join")(spark, s"/root/testdata/$sf")
        .count() > 0,
        s"q20 complement empty at $sf — the gate proves nothing")
  }

  test("singleton fast path equals the tree path on singleton groups") {
    import spark.implicits._
    val rows = Seq(
      graft.stats.TreeInput(7, 3, None, None, None, 2, 3, 4, 5, 7),
      graft.stats.TreeInput(9, 1, None, None, None, 1, 1, 1, 1, 9))
    val viaTree = graft.stats.TreeStats.compute(spark.createDataset(rows))
      .toDF().orderBy("tweet_id").collect().toSeq
    val viaFast = graft.stats.TreeStats.singletonStats(
      spark.createDataset(rows).toDF().withColumn("group_id", $"group_id"))
      .orderBy("tweet_id").collect().toSeq
    assert(viaTree == viaFast)
  }
}
