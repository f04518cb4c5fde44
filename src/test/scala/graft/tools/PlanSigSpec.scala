package graft.tools

import graft.SparkSuite

/** Contract of the executed-plan fingerprint (round 16): the signature
  * must be (a) STABLE across repeated runs of the same query — including
  * under AQE, where runtime partition counts differ from plan text —
  * and (b) SENSITIVE to a strategy change (broadcast vs shuffled join).
  * Those two properties are exactly what lets a bench diff classify a
  * byte drift under an equal sig as ambient rather than plan drift.
  */
class PlanSigSpec extends SparkSuite {
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame): Unit = {
    df.collect(); ()
  }

  test("same query twice yields the same folded fingerprint") {
    val collector = new PlanSig.Collector
    spark.listenerManager.register(collector)
    try {
      def q() = spark.range(0, 50000L).selectExpr("id % 100 as k", "id as v")
        .groupBy("k").sum("v")
      run(q()); val fp1 = collector.takeFingerprint()
      run(q()); val fp2 = collector.takeFingerprint()
      assert(fp1.nPlans == 1 && fp2.nPlans == 1)
      assert(fp1.sig == fp2.sig, s"$fp1 vs $fp2")
      // compare only strategy-stable histogram keys: aqe_read/exchange
      // counts race run-to-run under AQE (AQEShuffleRead appears or
      // vanishes with materialization timing — the exact class the sig
      // normalizes away), so exact-histogram equality would be flaky
      val stableKeys = Seq("bhj", "smj", "shj", "bnlj", "cartesian",
        "hash_agg", "obj_agg", "sort_agg")
      assert(stableKeys.map(k => fp1.hist.getOrElse(k, 0L)) ==
        stableKeys.map(k => fp2.hist.getOrElse(k, 0L)),
        s"${fp1.hist} vs ${fp2.hist}")
      assert(fp1.hist.getOrElse("exchange", 0L) >= 1L,
        s"groupBy must show an exchange in the histogram: ${fp1.hist}")
    } finally spark.listenerManager.unregister(collector)
  }

  test("fingerprint distinguishes broadcast from shuffled join strategy") {
    val collector = new PlanSig.Collector
    spark.listenerManager.register(collector)
    try {
      val dim = Seq((0L, "a"), (1L, "b")).toDF("k", "tag")
      val fact = spark.range(0, 10000L).selectExpr("id % 2 as k", "id as v")
      run(fact.join(org.apache.spark.sql.functions.broadcast(dim), "k"))
      val bcast = collector.takeFingerprint()
      run(fact.join(dim.hint("shuffle_hash"), "k"))
      val shuffled = collector.takeFingerprint()
      assert(bcast.sig != shuffled.sig)
      assert(bcast.hist.getOrElse("bhj", 0L) == 1L, bcast.hist.toString)
      assert(bcast.hist.getOrElse("shj", 0L) == 0L)
      assert(shuffled.hist.getOrElse("shj", 0L) == 1L, shuffled.hist.toString)
    } finally spark.listenerManager.unregister(collector)
  }

  test("signature resolves adaptive wrappers and ignores runtime partition counts") {
    val collector = new PlanSig.Collector
    spark.listenerManager.register(collector)
    try {
      // same logical query under two different advisory partition sizes:
      // AQE coalesces to DIFFERENT reducer counts, but the strategy —
      // and therefore the signature — must not move.
      def q() = spark.range(0, 200000L)
        .selectExpr("id % 1000 as k", "id as v").groupBy("k").count()
      val conf = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
      val old = spark.conf.getOption(conf)
      try {
        spark.conf.set(conf, "64MB")
        run(q()); val big = collector.takeFingerprint()
        spark.conf.set(conf, "1KB")
        run(q()); val small = collector.takeFingerprint()
        assert(big.sig == small.sig,
          "signature must be invariant to AQE coalesce counts")
        assert(!big.sig.isEmpty && big.sig.length == 32)
      } finally {
        old match {
          case Some(v) => spark.conf.set(conf, v)
          case None => spark.conf.unset(conf)
        }
      }
    } finally spark.listenerManager.unregister(collector)
  }

  test("signature normalizes wiring: codegen ids gone, ReusedExchange expanded to content") {
    // self-joined aggregate: Spark reuses the aggregate's exchange on
    // one side (ReusedExchange). The signature must (a) carry no
    // codegen stage ids — they're assigned in AQE materialization
    // order, which races — and (b) show the SAME content on both join
    // sides, so reuse-vs-rebuild wiring can never flap it (the q126
    // finding: 6 probe iterations, 6 raw sigs, one strategy).
    val agg = spark.range(0, 50000L).selectExpr("id % 97 as k", "id as v")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
    val joined = agg.join(agg.withColumnRenamed("s", "s2"), "k")
    run(joined)
    val sig = PlanSig.signature(joined.queryExecution.executedPlan)
    assert(!sig.contains("WholeStageCodegen"), sig)
    assert(!sig.contains("InputAdapter"), sig)
    assert(!sig.contains("AQEShuffleRead"), sig)
    assert(!sig.contains("ReusedExchange"), sig)
    assert("HashAggregate".r.findAllIn(sig).size >= 4,
      s"both sides must expand to their aggregate content:\n$sig")
  }

  test("lineage-only rdd access never moves the fingerprint (v3)") {
    // Dataset.rdd fires a listener event for pure lineage construction
    // (zero jobs) whose async arrival RACES the measurement window —
    // the round-17 ScaleProbe sig_flap find: Scale.widen's partition
    // probe made the same query fold 1 or 2 actions by bus timing.
    // v3 excludes funcName=="rdd" from the fold, so a window WITH the
    // access and one WITHOUT produce the same fingerprint.
    val collector = new PlanSig.Collector
    spark.listenerManager.register(collector)
    try {
      def q() = spark.range(0, 20000L).selectExpr("id % 50 as k", "id as v")
        .groupBy("k").sum("v")
      // the checkpoint is built OUTSIDE both windows (eager checkpoint
      // is a real action and would legitimately land in the fold)
      val src = spark.range(0, 100L).toDF().localCheckpoint(true)
      collector.reset()
      run(q()); val plain = collector.takeFingerprint()
      src.rdd.getNumPartitions: Unit // the contaminant access
      run(q()); val contaminated = collector.takeFingerprint()
      assert(contaminated.nPlans == plain.nPlans,
        s"rdd lineage event leaked into the fold: $contaminated vs $plain")
      assert(contaminated.sig == plain.sig)
    } finally spark.listenerManager.unregister(collector)
  }

  test("v4: ensure-requirements exchanges are erased from plan identity; user repartitions are not") {
    // the jaccard_pairs flap (SCALEPROBE_r17/r18, re-probed round 19):
    // executed plans byte-identical except the POSITION of one
    // ensure-requirements Exchange — and, under a position-only
    // normalization draft, byte-identical trees with COUNT 11 vs 10
    // (bench_history/jaccard-flap-v4count-r19.txt): the r16b leftover
    // class is a PRESENCE race. v4 therefore erases these exchanges
    // from plan identity entirely (the BroadcastExchange argument —
    // a real added/lost shuffle announces itself in bytes, which the
    // diff escalates as same_plan_work_delta); user repartitions keep
    // their tree node.
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.ProjectExec
    import org.apache.spark.sql.execution.exchange.{
      ENSURE_REQUIREMENTS, REPARTITION_BY_COL, ShuffleExchangeExec}
    val leaf = Seq((1L, "a"), (2L, "b")).toDF("k", "t")
      .queryExecution.executedPlan.collectLeaves().head
    val attr = leaf.output.head
    val part = HashPartitioning(Seq(attr), 4)
    val plain = ProjectExec(Seq(attr), leaf)
    val above = ProjectExec(Seq(attr),
      ShuffleExchangeExec(part, leaf, ENSURE_REQUIREMENTS))
    val below = ShuffleExchangeExec(part,
      ProjectExec(Seq(attr), leaf), ENSURE_REQUIREMENTS)
    // position-invariant AND presence-invariant: with, with-elsewhere
    // and without the exchange all sign identically
    assert(PlanSig.signature(above) == PlanSig.signature(below))
    assert(PlanSig.signature(above) == PlanSig.signature(plain),
      s"presence must be normalized:\n${PlanSig.signature(above)}\nvs\n" +
        PlanSig.signature(plain))
    val one = ShuffleExchangeExec(part, leaf, ENSURE_REQUIREMENTS)
    val two = ShuffleExchangeExec(part, one, ENSURE_REQUIREMENTS)
    assert(PlanSig.signature(one) == PlanSig.signature(two))
    assert(!PlanSig.signature(above).contains("Exchange"))
    // user repartition keeps its tree node (a deliberate layout is
    // plan structure, not AQE wiring)
    val user = ShuffleExchangeExec(part, leaf, REPARTITION_BY_COL)
    assert(PlanSig.signature(user).contains("Exchange"),
      PlanSig.signature(user))
  }

  test("reset drops accumulated actions; fingerprint counts every action in the window") {
    val collector = new PlanSig.Collector
    spark.listenerManager.register(collector)
    try {
      run(spark.range(10L).toDF())
      collector.reset()
      run(spark.range(10L).toDF()); run(spark.range(20L).toDF())
      val fp = collector.takeFingerprint()
      assert(fp.nPlans == 2, s"expected the 2 post-reset actions: $fp")
    } finally spark.listenerManager.unregister(collector)
  }
}
