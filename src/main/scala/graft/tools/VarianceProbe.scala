package graft.tools

import org.apache.spark.sql.SparkSession

/** Run-to-run variance probe (round-16 starting-point #3): runs the
  * named queries N times in one session, capturing wall, exec telemetry
  * AND the executed-plan fingerprint per iteration — so byte drift with
  * an EQUAL fingerprint is proven ambient (compressed-size /
  * bus-attribution noise) and byte drift with a MOVING fingerprint is a
  * flapping runtime plan decision (AQE broadcast conversion, skew
  * split) worth adjudicating.
  *
  * Usage: runMain graft.tools.VarianceProbe q05,q126 6
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS;
  * SPARK_GRAFT_PROBE_CONF="k=v;k=v" sets extra session confs — e.g.
  * spark.shuffle.compress=false separates compression-order drift
  * (bytes go constant uncompressed) from row-count drift (bytes still
  * flap), the q05 experiment.
  * Per-iteration JSON lines go to stdout; when a query's fingerprint is
  * NOT stable across iterations, the distinct per-action signature
  * strings are dumped to /tmp/varprobe-<query>-<sig>.txt for diffing.
  */
object VarianceProbe {
  def main(args: Array[String]): Unit = {
    val prefixes = args.headOption.getOrElse("q05,q126")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val iters = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach {
      _.split(";").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings"))
      graft.util.Tables.table(spark, sfDir, t).count()

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    val collector = new PlanSig.Collector
    spark.listenerManager.register(collector)

    val sigStrings = scala.collection.mutable.Map
      .empty[(String, String), Seq[String]] // (query, foldedSig) -> per-action sigs
    val seen = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.LinkedHashSet[String]]

    def fmt(d: Double) = BigDecimal(d).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toString

    for (it <- 1 to iters; name <- names) {
      val t0 = System.nanoTime()
      val ((_, metrics)) = ExecStats.measure(spark) {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.select(org.apache.spark.sql.functions.xxhash64(
            df.columns.toIndexedSeq.map(df.col): _*).as("_row_hash"))
          .agg(org.apache.spark.sql.functions.expr("bit_xor(_row_hash)"))
          .head()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // the fingerprint carries the exact per-action signatures it
      // folded (ADVICE r16: a pre-drain snapshot raced the bus — an
      // action landing between snapshot and fold was in the sig but
      // missing from the dump keyed by that sig)
      val fp = collector.takeFingerprint()
      sigStrings.getOrElseUpdate((name, fp.sig), fp.actionSigs)
      seen.getOrElseUpdate(name,
        scala.collection.mutable.LinkedHashSet.empty) += fp.sig
      println(s"""{"query":"$name","iter":$it,"sec":${fmt(sec)},""" +
        s""""exec":${metrics.json},"plan":${fp.json}}""")
    }

    // summary + dump distinct signature sets for any unstable query
    for (name <- names) {
      val sigs = seen(name).toSeq
      println(s"""{"query":"$name","distinct_plan_sigs":${sigs.length},""" +
        s""""sigs":${sigs.map("\"" + _ + "\"").mkString("[", ",", "]")}}""")
      if (sigs.length > 1) {
        for (s <- sigs) {
          val p = java.nio.file.Paths.get(s"/tmp/varprobe-$name-$s.txt")
          java.nio.file.Files.write(p,
            sigStrings((name, s)).mkString("\n\n").getBytes("UTF-8"))
          println(s"# dumped $p")
        }
      }
    }
    spark.stop()
  }
}
