package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall seconds.
  *
  * Noise robustness: this sandbox suffers multi-minute noisy-neighbor
  * CPU-starvation bursts (BENCH_r02 recorded 1117 s for a workload that
  * reproduces at ~69 s — see BASELINE.md). Each query is therefore timed
  * over N interleaved passes (pass 1 runs q01..q56, then pass 2, ...)
  * and reported as the per-query MINIMUM; a burst long enough to
  * contaminate the same query in every pass would have to span the whole
  * run. All samples are included in the artifact (`samples`) so variance
  * — i.e. how noisy the machine was — is visible, not hidden.
  *
  * `queries` (per-query min) and `total` (sum of mins) keep the same
  * shape previous rounds' artifacts used. Passes default to 3; override
  * with SPARK_GRAFT_BENCH_PASSES (=1 restores single-shot timing).
  *
  * Queries run in name order after a session warm-up (first actions in a
  * fresh JVM otherwise pay 10-20 s of classloading/codegen that would be
  * misattributed to whichever query runs first).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: local[32] with shuffle.partitions=32 (not 200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: touch every table and exercise codegen/shuffle machinery
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings"))
      graft.util.Tables.table(spark, sfDir, t).count()
    graft.util.Tables.events(spark, sfDir).groupBy("event_type").count().count()

    // SPARK_GRAFT_BENCH_ONLY=q31,q57 — subset filter (prefix match) for
    // targeted adjudication runs; absent = full registry (driver mode)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    def runOnce(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // force FULL evaluation of every output column: a row-hash
        // aggregate Catalyst cannot prune (a bare count() would let
        // projection-only queries time just the scan, not the
        // expression work); bit_xor cannot overflow under ANSI mode.
        // SPARK_GRAFT_BENCH_LEGACY=1 restores the count() harness for
        // like-for-like comparison against pre-r2 numbers.
        if (sys.env.get("SPARK_GRAFT_BENCH_LEGACY").contains("1")) df.count()
        else df.select(org.apache.spark.sql.functions.xxhash64(
            df.columns.toIndexedSeq.map(df.col): _*).as("_row_hash"))
          .agg(org.apache.spark.sql.functions.expr("bit_xor(_row_hash)")).head()
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val failedSet = scala.collection.mutable.LinkedHashSet.empty[String]
    // Ambient-calibration row (VERDICT r17 item 3): a FIXED workload —
    // constant input (range, no table reads), constant plan (one
    // shuffle, whole-stage-codegen hashing), ~0.2-0.4 s — timed once
    // per pass. Same-registry totals have swung 243–281 s on
    // byte-identical work; this row gives every bench diff an
    // in-artifact ambient denominator so "ambient by construction" is
    // a computed ratio, not a per-round forensic argument. Not a
    // registry query: it rides a separate `calib` field, never joins
    // queries/total.
    def calibOnce(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0L, 16L * 1000L * 1000L, 1L, 32)
        .select(xxhash64(org.apache.spark.sql.functions.col("id")).as("h"))
        .groupBy(pmod(org.apache.spark.sql.functions.col("h"), lit(97)).as("b"))
        .agg(expr("bit_xor(h)").as("x"), count(lit(1)).as("n"))
        .agg(expr("bit_xor(x)"), sum("n")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibOnce() // untimed codegen/classload warm-up for the calib plan
    var calib = Vector.empty[Double]
    // execution economics (shuffle/spill/tasks per query) ride the
    // FINAL pass via a SparkListener — telemetry for the artifact, not
    // timing (the listener drain happens AFTER runOnce's internal clock
    // stops). The final pass — not pass 1 — so session-cached queries
    // report the amortized OPERATING plan their min-of-N already
    // prices, instead of conflating the pass-1 store build into the
    // read's job/shuffle numbers (r12's q214 read 165 jobs where the
    // settled-store read is ~28); for everything else the plan is
    // pass-independent, so nothing changes. Pass-1 build costs stay
    // visible in samples[]. SPARK_GRAFT_BENCH_EXEC=0 disables.
    val withExec = !sys.env.get("SPARK_GRAFT_BENCH_EXEC").contains("0")
    val execStats = scala.collection.mutable.Map.empty[String, graft.tools.ExecStats.Metrics]
    // executed-plan fingerprints ride the final pass beside the exec
    // telemetry: equal sigs across rounds PIN plan identity, so a
    // shuffle-byte drift with an equal sig is ambient by construction
    // (the round-16 q05/q126 adjudication, made structural). The drain
    // happens after runOnce's clock stops, so timing is unaffected.
    val planSigs = scala.collection.mutable.Map.empty[String, graft.tools.PlanSig.Fingerprint]
    val collector = new graft.tools.PlanSig.Collector
    if (withExec) spark.listenerManager.register(collector)
    for (p <- 1 to passes; name <- names) {
      // every 32 queries, not once per pass (round-18: the first
      // calib-vs-calib diff showed 3 samples/run is too sparse — the
      // calib MIN read 0.73x while byte-identical totals read 1.06x,
      // because a ~0.5 s probe samples one instant of a ~17-minute
      // run; ~8 samples/pass at ~1% overhead track the ambient the
      // queries actually ran under, and bench_diff folds the MEDIAN)
      if (names.indexOf(name) % 32 == 0) calib = calib :+ calibOnce()
      val (sec, ok) =
        if (p == passes && withExec) {
          collector.reset() // drop signatures accumulated on prior passes
          val (r, m) = graft.tools.ExecStats.measure(spark)(runOnce(name))
          execStats(name) = m
          planSigs(name) = collector.takeFingerprint()
          r
        } else runOnce(name)
      samples(name) = samples(name) :+ sec
      if (!ok) failedSet += name
    }

    def fmt(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val mins = names.map(n => n -> samples(n).min)
    val qs = mins.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val samplesJson = names.map { n =>
      "\"" + n + "\":[" + samples(n).map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val failed = failedSet.map("\"" + _ + "\"").mkString("[", ",", "]")
    // DISCLOSURE: queries whose plan reads a session-scoped artifact
    // (trained codebook / BPE merges / settled graph store) pay the
    // build on pass 1 only — their min-of-N prices the amortized
    // operating cost a train-once deployment runs, not the build.
    // Listed explicitly so the artifact is honest about which rows
    // carry that pricing contract (see samples[] for the pass-1 cost).
    val sessionCached = Seq(
      "q100_ann_pq", "q101_ann_ivfpq", "q110_bpe_segment", "q119_bpe_stats",
      "q120_fuzzy_dedup_corpus", "q121_bpe_encode_ids", "q127_bpe_persisted",
      "q135_leakfree_split", "q137_semantic_dedup",
      "q147_dedup_cascade", "q57_dedup_survivor", "q160_cluster_histogram",
      "q113_span_dedup_rewrite",
      "q190_release_pipeline", "q191_closure_delta",
      "q192_cc_delta", "q205_substring_indexed", "q206_release_substring",
      "q212_release_decisions", "q214_release_decisions_maintained",
      "q215_ann_ivfpq_recall", "q216_top_passages_maintained",
      "q217_substring_stream_pairs", "q218_ann_ivfpq_recall_sweep",
      "q219_ann_ivfpq_index_add", "q220_ann_index_add_stream",
      "q221_funnel_maintained", "q222_ann_pq_index_add",
      "q224_top_passages_upgraded", "q225_ann_pq_torn_repair",
      "q226_release_late_arrivals", "q227_release_keepers_ooo")
      .filter(samples.contains)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = mins.map(_._2).sum
    val execJson =
      if (execStats.isEmpty) ""
      else names.filter(execStats.contains)
        .map(n => "\"" + n + "\":" + execStats(n).json)
        .mkString(""","exec":{""", ",", "}")
    val planJson =
      if (planSigs.isEmpty) ""
      else names.filter(planSigs.contains)
        .map(n => "\"" + n + "\":" + planSigs(n).json)
        .mkString(""","plan":{""", ",", "}")
    val calibJson = "[" + calib.map(fmt).mkString(",") + "]"
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"samples":$samplesJson,"passes":$passes,"failed":$failed,"calib":$calibJson,"session_cached":$sessionCached$execJson$planJson,"sf":"$sfDir"}"""
    println(json)
    // The stdout line is the driver contract, but its capture truncates
    // (BENCH_r05/r06 lost every per-query number past ~q99 to a 2000-char
    // stdout tail) — so the FULL artifact is also written to a file and
    // committed, making the bench record self-contained.
    // SUBSET runs (SPARK_GRAFT_BENCH_ONLY) write a scratch file instead:
    // a 4-query adjudication must never clobber the committed
    // full-registry record (it did, twice, in round 11 — both times the
    // subset artifact then slipped into a commit and the real record
    // had to be dug out of git history).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "BENCH_SUBSET_LAST.json" else "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    // …and, for FULL runs, a non-clobbering copy under bench_history/:
    // BENCH_LAST.json is overwritten every round, so historical
    // per-query records were recoverable only via git archaeology (the
    // r14 verdict had to `git show HEAD:BENCH_LAST.json` to diff
    // rounds). One ~50 KB file per full run, monotonically numbered,
    // makes the committed record book self-contained.
    if (only.isEmpty)
      try {
        val hist = java.nio.file.Paths.get("bench_history")
        java.nio.file.Files.createDirectories(hist)
        // next index = max(existing run-NNNN) + 1, never a file COUNT:
        // a deleted historical run or an unrelated file in the dir would
        // make count() collide with (or skip) an existing index and
        // silently overwrite a historical record — defeating the
        // archive's non-clobbering purpose. CREATE_NEW backstops any
        // residual collision loudly instead of clobbering.
        val runRe = """run-(\d{4})\.json""".r
        val n = {
          val it = java.nio.file.Files.list(hist)
          try scala.jdk.CollectionConverters.IteratorHasAsScala(it.iterator()).asScala
            .flatMap(p => runRe.unapplySeq(p.getFileName.toString)
              .flatMap(_.headOption).map(_.toInt))
            .foldLeft(-1)(math.max) + 1
          finally it.close()
        }
        java.nio.file.Files.write(hist.resolve(f"run-$n%04d.json"),
          (json + "\n").getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
      } catch { case e: Exception =>
        System.err.println(s"[bench] could not archive run: ${e.getMessage}") }
    spark.stop()
    // The driver records only a 2000-char stdout TAIL, which front-
    // truncates the full record above (samples+exec is ~50 KB) — that is
    // why BENCH_r10/r11 carry `parsed: null`. So the canonical TOTALS
    // record is re-emitted here, compact (<300 chars, fits any tail
    // intact) and as the LAST pre-exit stdout line of this JVM (after
    // spark.stop(), so no shutdown logging can trail it). Full per-query
    // detail lives in the committed file above.
    val compact = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${names.size},"passes":$passes,"n_failed":${failedSet.size},"full":"$outPath","sf":"$sfDir"}"""
    println(compact)
    // …and the same compact record as a tiny committed SIDECAR: sbt's
    // own "[success] Total time" line trails the JVM's stdout, so even
    // a last-line tail parse misses the record above (BENCH_r12 still
    // carried `parsed: null`). A <300-byte overwrite-per-run file needs
    // no tail surgery at all. Subset runs skip it — the totals sidecar
    // describes the FULL registry only (the BENCH_LAST clobber lesson).
    if (only.isEmpty)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_TOTALS.json"),
        (compact + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write BENCH_TOTALS.json: ${e.getMessage}") }
    Console.out.flush()
  }
}
