package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.stats.{TreeInput, TreeStatsIterative}

/** Empirical order-of-magnitude scale probe (dev tool, not engine code).
  *
  * Every 100 TB claim in PLANS.md is a design argument measured only at
  * sf0.1; the two claims that can ONLY be validated by growing the data
  * are candidate-volume economics (sum-of-capped-bucket²) and skew
  * behavior. This tool synthesizes fixture-shaped corpora at 1× and 10×
  * the sf0.1 size — SAME vocabulary (read from the real sf0.1
  * documents), same token-length distribution, same planted near-dup
  * rate at both scales — and times the heavy families at both, printing
  * one JSON line per (family, scale) plus the wall-time scaling
  * exponent alpha = log10(t10/t1). Linear-work families should land
  * near alpha = 1 (or below it while fixed per-stage costs still
  * dominate at the small end); anything approaching alpha = 2 is a
  * quadratic term the df-caps were supposed to bound — a bug.
  *
  * Determinism: content is a pure function of row id via xxhash64, so
  * both scales and both passes see identical data with no RNG state.
  */
object ScaleProbe {

  /** Fixture-shaped documents: n docs, 20-89 tokens from the real
    * corpus vocabulary, planted near-dup pairs at one pair per 40 rows
    * (2.5% of rows are a planted copy: ids 40k+1 copy 40k's text with
    * one appended token — shingle overlap ~ 1). */
  def synthDocs(spark: SparkSession, n: Long, vocab: Seq[String]): DataFrame = {
    val v = vocab.toArray
    val vLit = array(v.toIndexedSeq.map(lit): _*)
    // content seed: near-dup pairs share it, so texts match except tail
    val seed = when(col("id") % 40 === 1, col("id") - 1).otherwise(col("id"))
    val len = (pmod(xxhash64(seed, lit("len")), lit(70)) + 20).cast("int")
    val toks = transform(sequence(lit(1), len),
      j => element_at(vLit, (pmod(xxhash64(seed, j), lit(v.length)) + 1).cast("int")))
    val tail = when(col("id") % 40 === 1,
      concat(lit(" "), element_at(vLit,
        (pmod(xxhash64(col("id"), lit("tail")), lit(v.length)) + 1).cast("int"))))
      .otherwise(lit(""))
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(array_join(toks, " "), tail).as("text"),
      element_at(array(lit("en"), lit("de"), lit("fr"), lit("es"), lit("zh")),
        (pmod(xxhash64(col("id"), lit("lang")), lit(5)) + 1).cast("int")).as("lang"))
  }

  /** Open-vocabulary variant of [[synthDocs]] (round-18): each token is
    * suffixed with a seed-keyed hash bucket drawn from an n/5-sized
    * space, so the effective vocabulary GROWS WITH THE CORPUS — the
    * shape of a real crawl — instead of the fixture's ~31 closed words
    * whose shingle/fingerprint collisions saturate pair miners at 100×
    * (rows100/rows10 read ~20-90× on the closed corpus: output-bound
    * fixture artifacts, not operator scaling). The planted near-twin
    * pairs (1 in 40, seed-shared text, one-token tail) survive
    * unchanged, so pair output stays linear and non-empty at every
    * scale while unrelated documents share almost nothing. */
  def synthDocsOpen(spark: SparkSession, n: Long, vocab: Seq[String]): DataFrame = {
    val v = vocab.toArray
    val vLit = array(v.toIndexedSeq.map(lit): _*)
    val seed = when(col("id") % 40 === 1, col("id") - 1).otherwise(col("id"))
    val len = (pmod(xxhash64(seed, lit("len")), lit(70)) + 20).cast("int")
    val toks = transform(sequence(lit(1), len),
      j => concat(
        element_at(vLit, (pmod(xxhash64(seed, j), lit(v.length)) + 1).cast("int")),
        lit("_"),
        pmod(xxhash64(seed, j, lit("open")), lit(math.max(n / 5L, 1L))).cast("string")))
    val tail = when(col("id") % 40 === 1,
      concat(lit(" "), element_at(vLit,
        (pmod(xxhash64(col("id"), lit("tail")), lit(v.length)) + 1).cast("int"))))
      .otherwise(lit(""))
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(array_join(toks, " "), tail).as("text"),
      element_at(array(lit("en"), lit("de"), lit("fr"), lit("es"), lit("zh")),
        (pmod(xxhash64(col("id"), lit("lang")), lit(5)) + 1).cast("int")).as("lang"))
  }

  /** Planted MEGA-BOILERPLATE corpus: every document shares one ~80-char
    * passage (site chrome at crawl scale) between unique prefix/tail —
    * the adversarial shape for the winnow anchor join (one fingerprint
    * group of n rows → n²/2 clique pairs). Prices the round-12
    * hot-anchor cap. */
  def synthBoiler(spark: SparkSession, n: Long, vocab: Seq[String]): DataFrame = {
    val shared = vocab.take(14).mkString(" ")
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(
        expr("repeat(cast(id as string), 6)"), lit(s" lead $shared tail "),
        expr("repeat(cast(id as string), 5)")).as("text"))
  }

  /** Fixture-shaped embeddings: n vectors of `dim` floats in [-1, 1],
    * 5% planted exact-dup pairs (cos = 1 survives quantization). */
  def synthEmb(spark: SparkSession, n: Long, dim: Int): DataFrame = {
    val seed = when(col("id") % 40 === 1, col("id") - 1).otherwise(col("id"))
    val vec = transform(sequence(lit(1), lit(dim)),
      d => ((pmod(xxhash64(seed, d), lit(2001)) - 1000) / 1000.0).cast("float"))
    spark.range(n).select(col("id").as("vec_id"), vec.as("embedding"))
  }

  /** Fixture-shaped chain forest: n nodes in 10-node per-group chains
    * (the q58 wide/shallow production shape), same modular stat
    * columns as eventsAsTweets. */
  def synthChains(spark: SparkSession, n: Long): org.apache.spark.sql.Dataset[TreeInput] = {
    import spark.implicits._
    spark.range(n).select(
      col("id").as("tweet_id"),
      (col("id") % 10).as("author_id"),
      when(col("id") % 10 =!= 0 && col("id") % 3 =!= 0, col("id") - 1)
        .as("in_reply_to"),
      lit(null).cast("long").as("retweet_of"),
      when(col("id") % 10 =!= 0 && col("id") % 3 === 0, col("id") - 1)
        .as("quotes"),
      (col("id") % 7).as("reply_count"), (col("id") % 5).as("quote_count"),
      (col("id") % 11).as("like_count"), (col("id") % 3).as("retweet_count"),
      expr("id div 10").as("group_id")).as[TreeInput]
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val vocab = spark.read.parquet(s"$sf01/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t")).distinct()
      .orderBy("t").collect().map(_.getString(0)).toSeq

    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
    def fmt(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    // strategy fingerprints ride each timed family (drains are outside
    // the clock): alpha says the COST scaled; sig1 == sig10 says it was
    // the SAME PLAN doing it — a broadcast threshold crossing or a
    // strategy shift at 10× shows up as sig_match=false and must be
    // adjudicated (it may be legitimate AQE sizing, but never silent).
    val collector = new PlanSig.Collector
    spark.listenerManager.register(collector)
    // ADVICE r16: the reported fingerprint must be the one from the
    // TIMED best pass (timeMin reports min wall), and a plan that flaps
    // across passes at ONE scale must be visible. timeMin fingerprints
    // every pass, keeps the best pass's, and records whether any two
    // real-plan passes at this scale disagreed — read via lastSigFlap
    // immediately after the call (single-threaded probe loop).
    var lastSigFlap = false
    var probeTag = "probe"
    def timeMin(f: => Long): (Double, Long, PlanSig.Fingerprint) = {
      var best = Double.MaxValue; var rows = 0L
      var bestFp: PlanSig.Fingerprint = null
      var bestRealFp: PlanSig.Fingerprint = null
      var bestRealDt = Double.MaxValue
      val sigsSeen = scala.collection.mutable.Map
        .empty[String, PlanSig.Fingerprint]
      for (_ <- 1 to passes) {
        collector.reset()
        val t0 = System.nanoTime(); rows = f
        val dt = (System.nanoTime() - t0) / 1e9
        val fp = collector.takeFingerprint() // after the clock stops
        if (fp.nPlans > 0) {
          sigsSeen.getOrElseUpdate(fp.sig, fp): Unit
          // the fastest pass that captured a REAL plan — substitution
          // candidate when the best (timed) pass raced the bus
          if (dt < bestRealDt) { bestRealDt = dt; bestRealFp = fp }
        }
        if (dt < best || bestFp == null) { best = math.min(best, dt); bestFp = fp }
      }
      lastSigFlap = sigsSeen.size > 1
      // ADVICE r17: the best pass can race the listener bus (nPlans==0)
      // while other passes captured real plans — reporting the empty
      // fingerprint would read sig_match=false (or an empty plan json)
      // purely from bus timing. Substitute the fingerprint of the
      // FASTEST real-plan pass (ADVICE r18 item 2: under a flap the
      // lexicographically-smallest sig could name a plan other than
      // the one closest to the timed best — tracking the fp alongside
      // dt keeps the reported plan the nearest witness to the reported
      // time); a cross-pass flap is still reported via lastSigFlap.
      if (bestFp != null && bestFp.nPlans == 0 && bestRealFp != null)
        bestFp = bestRealFp
      // adjudication dump (the VarianceProbe discipline): when passes
      // at ONE scale disagree, write each distinct fingerprint's exact
      // per-action signature strings to /tmp so the flapping node can
      // be diffed directly instead of re-deriving it by hand
      if (lastSigFlap) sigsSeen.foreach { case (sig, sfp) =>
        val p = java.nio.file.Paths.get(s"/tmp/scaleprobe-flap-$probeTag-$sig.txt")
        java.nio.file.Files.write(p,
          sfp.actionSigs.mkString("\n\n").getBytes("UTF-8"))
        println(s"[scaleprobe] flap dump $p")
      }
      (best, rows, bestFp)
    }
    // driver-only timing (ADVICE r17): for primitives that fire NO
    // listener events (sidecar FS reads), timeMin's expectPlans drain
    // would stall the full 2 s empty-window bound per pass — pure dead
    // probe wall. No fingerprint is meaningful for a driver-side read.
    def timeMinDriver(f: => Long): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to passes) {
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    // materialize inputs once per scale so input synthesis isn't timed
    val d1 = synthDocs(spark, 5000L, vocab).localCheckpoint(true)
    val d10 = synthDocs(spark, 50000L, vocab).localCheckpoint(true)
    val e1 = synthEmb(spark, 2000L, 64).localCheckpoint(true)
    val e10 = synthEmb(spark, 20000L, 64).localCheckpoint(true)
    val c1 = synthChains(spark, 100000L).toDF().localCheckpoint(true)
    val c10 = synthChains(spark, 1000000L).toDF().localCheckpoint(true)
    val mb1 = synthBoiler(spark, 3000L, vocab).localCheckpoint(true)
    val mb10 = synthBoiler(spark, 30000L, vocab).localCheckpoint(true)
    val do1 = synthDocsOpen(spark, 5000L, vocab).localCheckpoint(true)
    val do10 = synthDocsOpen(spark, 50000L, vocab).localCheckpoint(true)
    import spark.implicits._

    val families: Seq[(String, DataFrame => Long, DataFrame, DataFrame)] = Seq(
      ("jaccard_pairs",
        (d: DataFrame) => Dedup.ngramJaccardPairs(d, n = 5, tau = 0.5).count(),
        d1, d10),
      ("simhash64_pairs",
        (d: DataFrame) => Dedup.simhashHammingPairs(d, maxDist = 3, bits = 64, nBands = 4).count(),
        d1, d10),
      // open-vocabulary twins of the two 100×-saturated arms (round-18):
      // same operators, a corpus whose vocabulary grows with n — their
      // three-point fits price the OPERATOR where the closed-vocab rows
      // above price fixture collision saturation (kept for continuity)
      ("simhash64_open_pairs",
        (d: DataFrame) => Dedup.simhashHammingPairs(d, maxDist = 3, bits = 64, nBands = 4).count(),
        do1, do10),
      ("paragraph_dedup_open",
        (d: DataFrame) => TextAnalysis.dedupParagraphs(d, chunkTok = 16, maxDist = 3)
          .where(col("n_removed_chunks") > 0).count(),
        do1, do10),
      ("shared_spans",
        (d: DataFrame) => TextAnalysis.sharedSpans(d, k = 8).count(),
        d1, d10),
      ("fuzzy_dedup_e2e",
        (d: DataFrame) => {
          val cand = Dedup.minhashCandidates(d, n = 3)
            .select(col("doc_a"), col("doc_b"))
          val ver = Dedup.jaccardVerifyPairs(d, cand, n = 3, tau = 0.5)
          Dedup.clusterPairsBy(d, ver.select(col("doc_a").as("a"), col("doc_b").as("b")),
            length(col("text"))).where(col("doc_id") === col("canonical_id")).count()
        }, d1, d10),
      ("cosine_lsh_pairs",
        (e: DataFrame) => Similarity.cosineDupPairs(e, tau = 0.40, dim = 64).count(),
        e1, e10),
      // the PRODUCTION preset (8×8, tau 0.8 — q195): candidate volume is
      // band-pruned ~30×, so unlike the output-bound fixture-tau row
      // above this one prices the scale path the docs point at
      ("cosine_lsh_production",
        (e: DataFrame) => Similarity.cosineDupPairs(e, tau = 0.80, dim = 64,
          bits = Similarity.ProductionLshBits,
          bands = Similarity.ProductionLshBands).count(),
        e1, e10),
      // the CORPUS preset (16×32 multi-mask, round-18): same family at
      // the bits-grows-with-n point of the tuning rule — its 100× arm
      // is the measured answer to cosine_lsh_production's bucket-
      // saturation tail (whose t100 reads ~27× the t10 on linear
      // output: candidate volume n²/2^bits with bits pinned)
      ("cosine_lsh_corpus",
        (e: DataFrame) => Similarity.cosineDupPairs(e, tau = 0.90, dim = 64,
          bits = Similarity.CorpusLshBits,
          bands = Similarity.CorpusLshBands).count(),
        e1, e10),
      ("ann_ivfpq_probe",
        (e: DataFrame) => Similarity.ivfpqTopK(e, dim = 64, nCoarse = 16,
          nQueries = 8, k = 5).count(),
        e1, e10),
      ("tree_stats_iterative",
        (c: DataFrame) => TreeStatsIterative.compute(c.as[TreeInput]).toDF().count(),
        c1, c10),
      ("span_cut_rewrite",
        (d: DataFrame) => TextAnalysis.cutSharedSpans(d, k = 8)
          .where(col("n_removed") > 0).count(),
        d1, d10),
      // byte-exact longest matches (q196): anchor volume is one row per
      // corpus character BY DESIGN — alpha ≈ 1 is this operator's honest
      // floor (the Lee et al. price), with the k-gram span family above
      // as the sub-linear tier
      ("exact_substring",
        (d: DataFrame) => TextAnalysis.exactSubstringPairs(d, minLen = 40).count(),
        d1, d10),
      // winnowed tier (q197): same output as exact_substring at the
      // guarantee floor, fingerprint volume ~2/(w+1) of the anchor
      // relation — the sub-linear path the q196 scaladoc points to
      ("winnow_substring",
        (d: DataFrame) => TextAnalysis.winnowedSubstringPairs(d, k = 20, w = 21)
          .count(),
        d1, d10),
      // removal half (q198): winnowed pairs + per-doc interval union +
      // reassembly — the rollup rides the pair pass's economics
      ("substring_cut",
        (d: DataFrame) => TextAnalysis.exactSubstringCut(d, minLen = 40)
          .count(),
        d1, d10),
      // executed release edit (q202): ONE winnowed pass (checkpointed,
      // match-sized) feeding both the policy and cut branches, then the
      // corpus-sized assembly joins
      ("substring_release",
        (d: DataFrame) => TextAnalysis.substringRelease(d, minLen = 40)
          .count(),
        d1, d10),
      // byte-resolution split-leak check (q203): winnowed pairs +
      // inline hash splits + per-eval-doc interval union
      ("substring_leak",
        (d: DataFrame) => TextAnalysis.substringLeak(d, minLen = 40).count(),
        d1, d10),
      ("crossmodal_dedup",
        (d: DataFrame) => {
          val ap = graft.ext.Multimodal.audioDupPairs(d, maxDist = 4, nBands = 8)
            .select(col("doc_a").as("a"), col("doc_b").as("b"))
          val tp = Dedup.simhashHammingPairs(d, maxDist = 3, bits = 64, nBands = 4)
            .select(col("doc_a").as("a"), col("doc_b").as("b"))
          Dedup.clusterPairsBy(d, ap.unionByName(tp).distinct(), length(col("text")))
            .where(col("doc_id") === col("canonical_id")).count()
        }, d1, d10),
      ("paragraph_dedup",
        (d: DataFrame) => TextAnalysis.dedupParagraphs(d, chunkTok = 16, maxDist = 3)
          .where(col("n_removed_chunks") > 0).count(),
        d1, d10),
      // the CAPPED production counterpart (round-19, q232): same
      // operator, chunk band buckets over maxBandDf=256 emit the star
      // instead of the clique. On THIS closed-vocabulary corpus the
      // 100× decade is exactly the regime the cap exists for — the
      // uncapped twin above reads alpha3 ≈ 1.0 on collision-saturated
      // buckets; the capped row prices the same corpus with the
      // bucket-linear guard armed (the anchor_cap_star discipline on
      // the banded SimHash join)
      ("paragraph_dedup_capped",
        (d: DataFrame) => TextAnalysis.dedupParagraphs(d, chunkTok = 16,
          maxDist = 3, maxBandDf = 256)
          .where(col("n_removed_chunks") > 0).count(),
        d1, d10),
      // the cap's DESIGN-POINT row (the anchor_cap_star analogue): the
      // planted mega-boilerplate corpus, where one near-identical
      // chunk rides EVERY document — uncapped, its band buckets are
      // corpus-sized and the clique is quadratic (unpriceable at 100×
      // by design); capped, pair volume is bucket-LINEAR (one star per
      // over-cap bucket) and output grows exactly with the planted
      // boilerplate mass
      ("paragraph_dedup_cap_star",
        (d: DataFrame) => TextAnalysis.dedupParagraphs(d, chunkTok = 16,
          maxDist = 3, maxBandDf = 256)
          .where(col("n_removed_chunks") > 0).count(),
        mb1, mb10),
      ("semantic_dedup",
        (e: DataFrame) => {
          val pairs = Similarity.semanticDupPairs(e, tau = 0.40, k = 8, iters = 2)
            .select(col("vec_a").as("a"), col("vec_b").as("b"))
          val v = Similarity.prepared(e)
          Dedup.clusterPairsBy(
            v.select(col("vec_id").as("doc_id"), col("q")),
            pairs, Similarity.dotL(col("q"), col("q")))
            .where(col("doc_id") === col("canonical_id")).count()
        }, e1, e10),
      ("boilerplate_score",
        (d: DataFrame) => TextAnalysis.boilerplateScore(d, n = 8)
          .where(col("dup_ppm") > 0).count(),
        d1, d10),
      ("bloom_dedup",
        (d: DataFrame) => Dedup.dedupAgainstBloom(
          d.where(col("doc_id") % 7 === 3),
          d.where(col("doc_id") % 7 =!= 3)).count(),
        d1, d10),
      ("minhash_calibration",
        (d: DataFrame) => Dedup.minhashCalibration(d, n = 3).count(),
        d1, d10),
      ("within_doc_dedup",
        (d: DataFrame) => TextAnalysis.dedupParagraphsWithinDoc(d, chunkTok = 16)
          .where(col("n_removed_chunks") >= 0).count(),
        d1, d10),
      ("temperature_mix",
        (d: DataFrame) => graft.ext.Sampling.sampleToTemperature(
          d.select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          "doc_id", "lang", "n_tokens", totalBudget = 100000L).count(),
        d1, d10),
      ("balanced_shards",
        (d: DataFrame) => graft.ext.Sampling.balancedShards(
          d.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", nShards = 64, nStripes = 32).count(),
        d1, d10),
      ("trained_langid",
        (d: DataFrame) => TextAnalysis.trainedLangId(d).count(),
        d1, d10),
      ("dsir_importance",
        (d: DataFrame) => {
          // synthDocs has no source column; a deterministic 20-way
          // split stands in for the feed id (shape, not semantics)
          val withSrc = d.withColumn("source",
            concat(lit("src"), pmod(xxhash64(col("doc_id")), lit(20)).cast("string")))
          val toks = withSrc.select(col("doc_id"), col("source"),
              explode(split(col("text"), " ")).as("tok"))
            .select(col("doc_id"), col("source"),
              (Dedup.hash64(col("tok")) % 256).cast("int").as("bucket"))
          def ppm(src: DataFrame) =
            src.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
              .select(col("bucket"), expr("cnt * 1000000 div sum(cnt) over ()").as("w"))
          val wts = ppm(toks.where(col("source").isin("src0", "src1", "src2", "src3")))
            .withColumnRenamed("w", "wr")
            .join(ppm(toks).withColumnRenamed("w", "wc"), Seq("bucket"), "full")
            .select(col("bucket"), (coalesce(col("wr"), lit(0L))
              - coalesce(col("wc"), lit(0L))).as("w"))
          toks.groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
            .join(broadcast(wts), "bucket")
            .groupBy(col("doc_id")).agg(sum(col("cnt") * col("w")).as("s"))
            .where(col("s") > 0).count()
        }, d1, d10),
      ("source_overlap",
        (d: DataFrame) => {
          val withSrc = d.withColumn("source",
            concat(lit("src"), pmod(xxhash64(col("doc_id")), lit(20)).cast("string")))
          val h = withSrc.select(col("source"), md5(col("text")).as("h")).distinct()
          h.select(col("source").as("sa"), col("h"))
            .join(h.select(col("source").as("sb"), col("h")), Seq("h"))
            .where(col("sa") < col("sb"))
            .groupBy(col("sa"), col("sb")).count().count()
        }, d1, d10),
      ("edit_distance_verify",
        (d: DataFrame) => {
          val p = d.select(col("doc_id"), substring(col("text"), 1, 16).as("blk"),
            substring(col("text"), 1, 48).as("t"))
          p.select(col("blk"), col("doc_id").as("doc_a"), col("t").as("ta"))
            .join(p.select(col("blk"), col("doc_id").as("doc_b"), col("t").as("tb")),
              Seq("blk"))
            .where(col("doc_a") < col("doc_b"))
            .where(levenshtein(col("ta"), col("tb")) <= 8).count()
        }, d1, d10),
      ("vocab_growth",
        (d: DataFrame) => {
          val toks = d.select(col("doc_id"),
              explode(split(col("text"), " ")).as("tok"))
            .select(col("doc_id"), Dedup.hash64(col("tok")).as("th"))
          toks.groupBy(col("th")).agg(min(col("doc_id")).as("fd"))
            .select(length(expr("conv(fd + 1, 10, 2)")).as("b"))
            .groupBy(col("b")).count().count()
        }, d1, d10),
      // winnow (k, w) sweep — q207's companion: the production preset
      // (k=20, w=21, floor 40) is priced by winnow_substring above;
      // these rows price the smaller floors a heavy below-floor match
      // mass would argue for. Expect: fingerprint density 2/(w+1)
      // rises as w shrinks, candidate volume rises as k shrinks (more
      // k-gram collisions), so both knobs trade recall floor against
      // join volume — the sweep turns that into measured seconds.
      ("winnow_kw_floor30",
        (d: DataFrame) => TextAnalysis.winnowedSubstringPairs(d, k = 15, w = 16)
          .count(),
        d1, d10),
      ("winnow_kw_floor20",
        (d: DataFrame) => TextAnalysis.winnowedSubstringPairs(d, k = 10, w = 11)
          .count(),
        d1, d10),
      // fixed k=20, narrow window: floor 30 via density (2/(w+1) doubles)
      // rather than anchor-length — isolates the two knobs
      ("winnow_kw_k20w11",
        (d: DataFrame) => TextAnalysis.winnowedSubstringPairs(d, k = 20, w = 11)
          .count(),
        d1, d10),
      // hot-anchor cap on the planted mega-boilerplate corpus (every doc
      // shares one passage): the capped star must scale ~linearly in the
      // duplication count where the clique is quadratic — alpha near 1
      // is the proof the q213 guard holds at crawl scale
      ("anchor_cap_star",
        (d: DataFrame) => TextAnalysis.winnowedSubstringPairs(
          d, k = 20, w = 21, maxAnchorDf = 64).count(),
        mb1, mb10))

    // SPARK_GRAFT_PROBE_ONLY=fam1,fam2 — subset filter for targeted
    // probes of a new family without re-running the full table
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Third probe point (VERDICT r17 item 4): a 2-point alpha cannot
    // distinguish flat-with-offset (job-launch floor dominating both
    // scales) from genuinely sublinear cost growth — the difference
    // that decides the 100 TB extrapolation. For the cheap PRODUCTION
    // families (dedup tiers, ANN probe, substring probes, samplers) a
    // 100× input is affordable (est. <20 s each from the 2-point fit),
    // so their rows carry t1/t10/t100 and `alpha3` — the least-squares
    // slope of log10(t) over the three decades, = log10(t100/t1)/2 for
    // equally spaced points. Reference arms and super-linear
    // output-bound rows (cosine fixture-tau, winnow floor sweeps,
    // tree_stats) stay 2-point: their 100× cost is the blowup the
    // production presets exist to avoid pricing.
    val hundredFams = Set("jaccard_pairs", "simhash64_pairs",
      "cosine_lsh_production", "cosine_lsh_corpus", "ann_ivfpq_probe",
      "bloom_dedup",
      "within_doc_dedup", "paragraph_dedup", "paragraph_dedup_capped",
      "paragraph_dedup_cap_star", "winnow_substring",
      "substring_cut", "substring_leak", "temperature_mix",
      "balanced_shards", "trained_langid", "anchor_cap_star",
      "simhash64_open_pairs", "paragraph_dedup_open")
    // Reading the substring-tier 100× rows: synthDocs draws from the
    // fixture's ~31-word closed vocabulary, so at 500k docs EVERY
    // k-gram is corpus boilerplate and the UNCAPPED winnow/cut/leak
    // arms price fixture match-density saturation (rows100/rows10 ≈
    // 20×), not operator scaling — the honest 100× production row is
    // anchor_cap_star (maxAnchorDf=64, the q213 guard) on the planted
    // mega-boilerplate corpus, where the cap bounds exactly this.
    lazy val d100 = synthDocs(spark, 500000L, vocab).localCheckpoint(true)
    lazy val e100 = synthEmb(spark, 200000L, 64).localCheckpoint(true)
    lazy val mb100 = synthBoiler(spark, 300000L, vocab).localCheckpoint(true)
    lazy val do100 = synthDocsOpen(spark, 500000L, vocab).localCheckpoint(true)
    val out = new StringBuilder("{")
    families.filter(f => only.forall(_.contains(f._1)))
      .zipWithIndex.foreach { case ((name, f, in1, in10), i) =>
      probeTag = s"$name-1x"
      val (t1, r1, fp1) = timeMin(f(in1)); val flap1 = lastSigFlap
      probeTag = s"$name-10x"
      val (t10, r10, fp10) = timeMin(f(in10)); val flap10 = lastSigFlap
      val alpha = math.log10(t10 / t1)
      // empty fingerprints (listener-bus race, nPlans=0) must not read
      // as a match: md5("") == md5("") is not plan identity
      val sigMatch = fp1 != null && fp10 != null &&
        fp1.nPlans > 0 && fp10.nPlans > 0 && fp1.sig == fp10.sig
      if (i > 0) out ++= ","
      out ++= s""""$name":{"t1":${fmt(t1)},"t10":${fmt(t10)},"rows1":$r1,"rows10":$r10,"alpha":${fmt(alpha)},"sig_match":$sigMatch"""
      if (flap1 || flap10)
        out ++= s""","sig_flap":true"""
      if (!sigMatch && fp1 != null && fp10 != null)
        out ++= s""","plan1":${fp1.json},"plan10":${fp10.json}"""
      var line100 = ""
      if (hundredFams.contains(name)) {
        probeTag = s"$name-100x"
        val in100 = if (in10 eq e10) e100
          else if (in10 eq mb10) mb100
          else if (in10 eq do10) do100 else d100
        val (t100, r100, fp100) = timeMin(f(in100)); val flap100 = lastSigFlap
        val alpha3 = math.log10(t100 / t1) / 2.0
        val sig100 = fp10 != null && fp100 != null &&
          fp10.nPlans > 0 && fp100.nPlans > 0 && fp10.sig == fp100.sig
        out ++= s""","t100":${fmt(t100)},"rows100":$r100,"alpha3":${fmt(alpha3)},"sig_match100":$sig100"""
        if (flap100) out ++= s""","sig_flap100":true"""
        if (!sig100 && fp10 != null && fp100 != null)
          out ++= s""","plan100":${fp100.json}"""
        line100 = s" t100=${fmt(t100)}s ($r100 rows) alpha3=${fmt(alpha3)}" +
          s" sig_match100=$sig100" + (if (flap100) " SIG_FLAP100" else "")
      }
      out ++= "}"
      println(s"[scaleprobe] $name t1=${fmt(t1)}s ($r1 rows) t10=${fmt(t10)}s ($r10 rows) alpha=${fmt(alpha)} sig_match=$sigMatch" +
        (if (flap1 || flap10) " SIG_FLAP" else "") + line100)
    }
    // BPE training: the hybrid claim is that wall-clock NO LONGER scales
    // with nMerges × per-job fixed cost (each merge round is an in-memory
    // update after the one corpus-scale histogram aggregate) — so 10×
    // the merges must cost far less than 10× the time, while the
    // RELATIONAL form prices one sequential Spark job per round. Also
    // probe corpus scaling at fixed merges (histogram job dominates).
    // clique price reference at the SMALL scale only (3000-doc clique =
    // ~4.5M pairs; the 30k clique would be 450M — exactly the blowup
    // the cap exists to avoid pricing)
    if (only.forall(_.contains("anchor_cap_clique"))) {
      val (tc, rc, _) = timeMin(
        TextAnalysis.winnowedSubstringPairs(mb1, k = 20, w = 21).count())
      if (out.length > 1) out ++= ","
      out ++= s""""anchor_cap_clique":{"t1":${fmt(tc)},"rows1":$rc}"""
      println(s"[scaleprobe] anchor_cap_clique t1=${fmt(tc)}s ($rc rows, 3000-doc clique reference)")
    }
    // Heap-sizing row (VERDICT r18 item 6): the 48 g driver-memory
    // rule shipped as an anecdote ("the 8 g default OOMs a 32-thread
    // SHJ build at 500k synthetic docs"); this block turns it into a
    // measured number — peak execution memory vs the JVM heap for the
    // heaviest SHJ-build family (jaccard_pairs: 4 ShuffledHashJoins
    // over the exploded shingle index) at the 100× decade. Gated: runs
    // only when explicitly selected, it re-prices a ~90 s arm purely
    // for the memory telemetry.
    if (only.exists(_.contains("mem_100x"))) {
      val heap = Runtime.getRuntime.maxMemory()
      val (rows, m) = ExecStats.measure(spark) {
        Dedup.ngramJaccardPairs(d100, n = 5, tau = 0.5).count()
      }
      if (out.length > 1) out ++= ","
      out ++= s""""mem_100x":{"family":"jaccard_pairs","rows":$rows""" +
        s""","heap_max_bytes":$heap,"exec":${m.json}}"""
      println(s"[scaleprobe] mem_100x jaccard_pairs rows=$rows " +
        s"heap=${heap / (1L << 20)}MB peak_exec=${m.peakExecMemBytes / (1L << 20)}MB " +
        s"shuffle_read=${m.shuffleReadBytes / (1L << 20)}MB " +
        s"spill_disk=${m.spillDiskBytes}")
    }
    if (only.forall(_.contains("bpe_train_hybrid"))) {
      val (th40, _, _) = timeMin(TextAnalysis.bpeTrain(d1, nMerges = 40).count())
      val (th400, _, _) = timeMin(TextAnalysis.bpeTrain(d1, nMerges = 400).count())
      val (th40x10, _, _) = timeMin(TextAnalysis.bpeTrain(d10, nMerges = 40).count())
      val (tr40, _, _) = timeMin(TextAnalysis.bpeTrainRelational(d1, nMerges = 40).count())
      val aM = math.log10(th400 / th40)
      if (out.length > 1) out ++= ","
      out ++= s""""bpe_train_hybrid":{"t_m40":${fmt(th40)},"t_m400":${fmt(th400)}"""
      out ++= s""","alpha_vs_merges":${fmt(aM)},"t10_m40":${fmt(th40x10)}"""
      out ++= s""","alpha_vs_corpus":${fmt(math.log10(th40x10 / th40))}"""
      out ++= s""","relational_t_m40":${fmt(tr40)}}"""
      println(s"[scaleprobe] bpe_train_hybrid m40=${fmt(th40)}s m400=${fmt(th400)}s " +
        s"alpha_vs_merges=${fmt(aM)} corpus10x_m40=${fmt(th40x10)}s relational_m40=${fmt(tr40)}s")
    }
    // Production-WIDTH BPE probe: a 32k-merge vocabulary over an OPEN
    // vocabulary. The fixture's 31-word vocabulary saturates the merge
    // loop after a handful of merges, so this probe synthesizes a
    // Zipf-ish corpus (64 hot words + a hapax-rich ~1.1M-word long
    // tail drawn from a 3M-word domain via xxhash64 (Poisson collisions: ~20% of tail words recur), ~2M tokens) and measures
    // wall-clock + the driver-histogram row count at minCount 1 vs 2 —
    // minCount is THE knob that bounds driver memory on an
    // open-vocabulary crawl, and the probe records what it buys
    // (histogram shrink) and costs (merges trained on fewer words'
    // pair counts).
    if (only.forall(_.contains("bpe_train_32k"))) {
      import org.apache.spark.sql.functions.{col, collect_list, concat, concat_ws, count, length, lit, pmod, when}
      val words = spark.range(0L, 2000000L).select(
        (col("id") / 50L).cast("long").as("d"),
        concat(lit("t"),
          when(col("id") % 3 === 0, pmod(col("id") * 31L, lit(64L)))
            .otherwise(pmod(xxhash64(col("id")), lit(3000000L)))
          ).as("w"))
      val corpus = words.groupBy(col("d"))
        .agg(concat_ws(" ", collect_list(col("w"))).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count()
      def histRows(minCount: Long): Long = corpus
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(col("text"), " ")).as("w"))
        .where(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .where(col("n") >= minCount).count()
      val (h1, h2) = (histRows(1L), histRows(2L))
      val t0 = System.nanoTime()
      val m1 = TextAnalysis.bpeTrain(corpus, nMerges = 32768, minCount = 1L).count()
      val t32k1 = (System.nanoTime() - t0) / 1e9
      val t1b = System.nanoTime()
      val m2 = TextAnalysis.bpeTrain(corpus, nMerges = 32768, minCount = 2L).count()
      val t32k2 = (System.nanoTime() - t1b) / 1e9
      corpus.unpersist(blocking = false)
      if (out.length > 1) out ++= ","
      out ++= s""""bpe_train_32k":{"t_minCount1":${fmt(t32k1)},"t_minCount2":${fmt(t32k2)}"""
      out ++= s""","hist_minCount1":$h1,"hist_minCount2":$h2"""
      out ++= s""","merges_minCount1":$m1,"merges_minCount2":$m2}"""
      println(s"[scaleprobe] bpe_train_32k minCount1=${fmt(t32k1)}s ($h1 hist rows, $m1 merges) " +
        s"minCount2=${fmt(t32k2)}s ($h2 hist rows, $m2 merges)")
    }
    // Incremental-graph thesis measured: with a FIXED batch, the
    // per-batch cost of closure/CC maintenance must stay ~flat as the
    // settled corpus grows 10× (the delta path streams the settled
    // relation once past a broadcast batch — no corpus shuffle), while
    // the full recompute grows at least linearly. Chains of 20 per
    // group; the batch is the last-2 edges of the first 5k chains at
    // BOTH scales.
    if (only.forall(_.contains("incremental_graph"))) {
      import org.apache.spark.sql.functions.{col, xxhash64 => xh}
      def chainEdges(n: Long): DataFrame = spark.range(n)
        .where(col("id") % 20 =!= 0)
        .select(col("id"), (col("id") - 1).as("parent"))
      val isBatch = (col("id") % 20 >= 18) && (col("id") < 100000L)
      def closureProbe(n: Long): (Double, Double) = {
        val e = chainEdges(n).localCheckpoint(true)
        val batch = e.where(isBatch).localCheckpoint(true)
        val settled = graft.graph.Closure
          .resolveRoots(e.where(!isBatch)).localCheckpoint(true)
        val (tInc, _, _) = timeMin(
          graft.graph.Closure.addEdgesDelta(settled, batch).count())
        val (tFull, _, _) = timeMin(graft.graph.Closure.resolveRoots(e).count())
        (tInc, tFull)
      }
      def ccEdges(n: Long): DataFrame = spark.range(n).select(
        pmod(xh(col("id"), lit("a")), lit(n / 2)).as("a"),
        pmod(xh(col("id"), lit("b")), lit(n / 2)).as("b"))
        .where(col("a") =!= col("b"))
      def ccProbe(n: Long): (Double, Double) = {
        val e = ccEdges(n).localCheckpoint(true)
        val batch = e.limit(5000).localCheckpoint(true)
        val old = e.exceptAll(batch).localCheckpoint(true)
        val lab = graft.graph.ConnectedComponents.run(old).localCheckpoint(true)
        val (tInc, _, _) = timeMin(
          graft.graph.ConnectedComponents.addEdgesDelta(lab, batch).count())
        val (tFull, _, _) = timeMin(graft.graph.ConnectedComponents.run(e).count())
        (tInc, tFull)
      }
      val (ci1, cf1) = closureProbe(500000L)
      val (ci10, cf10) = closureProbe(5000000L)
      val (gi1, gf1) = ccProbe(100000L)
      val (gi10, gf10) = ccProbe(1000000L)
      if (out.length > 1) out ++= ","
      out ++= s""""closure_add":{"t_inc1":${fmt(ci1)},"t_inc10":${fmt(ci10)}"""
      out ++= s""","alpha_inc":${fmt(math.log10(ci10 / ci1))}"""
      out ++= s""","t_full1":${fmt(cf1)},"t_full10":${fmt(cf10)}"""
      out ++= s""","alpha_full":${fmt(math.log10(cf10 / cf1))}},"""
      out ++= s""""cc_add":{"t_inc1":${fmt(gi1)},"t_inc10":${fmt(gi10)}"""
      out ++= s""","alpha_inc":${fmt(math.log10(gi10 / gi1))}"""
      out ++= s""","t_full1":${fmt(gf1)},"t_full10":${fmt(gf10)}"""
      out ++= s""","alpha_full":${fmt(math.log10(gf10 / gf1))}}"""
      println(s"[scaleprobe] closure_add inc ${fmt(ci1)}->${fmt(ci10)}s " +
        s"(alpha ${fmt(math.log10(ci10 / ci1))}) full ${fmt(cf1)}->${fmt(cf10)}s " +
        s"(alpha ${fmt(math.log10(cf10 / cf1))})")
      println(s"[scaleprobe] cc_add inc ${fmt(gi1)}->${fmt(gi10)}s " +
        s"(alpha ${fmt(math.log10(gi10 / gi1))}) full ${fmt(gf1)}->${fmt(gf10)}s " +
        s"(alpha ${fmt(math.log10(gf10 / gf1))})")
    }

    // incremental substring dedup (q205): FIXED batch probed against the
    // persisted fingerprint index of a growing corpus, vs the full
    // winnowed pass over corpus ∪ batch — the same inc-vs-full framing
    // as the graph block (index build is the untimed artifact cost)
    if (only.forall(_.contains("incremental_substring"))) {
      import org.apache.spark.sql.functions.col
      def subProbe(n: Long): (Double, Double) = {
        val all = synthDocs(spark, n, vocab).localCheckpoint(true)
        val bcond = col("doc_id") < 5000L && col("doc_id") % 5 === 1
        val batch = all.where(bcond).localCheckpoint(true)
        val corpus = all.where(!bcond).localCheckpoint(true)
        val idx = java.nio.file.Files.createTempDirectory("subidx").toString
        TextAnalysis.saveSubstringIndex(corpus, s"$idx/fp", minLen = 40)
        val (tInc, _, _) = timeMin(TextAnalysis.substringPairsAgainstIndex(
          batch, corpus, s"$idx/fp", minLen = 40).count())
        val (tFull, _, _) = timeMin(
          TextAnalysis.winnowedSubstringPairs(all, k = 20, w = 21).count())
        (tInc, tFull)
      }
      val (si1, sf1) = subProbe(5000L)
      val (si10, sf10) = subProbe(50000L)
      if (out.length > 1) out ++= ","
      out ++= s""""substring_indexed":{"t_inc1":${fmt(si1)},"t_inc10":${fmt(si10)}"""
      out ++= s""","alpha_inc":${fmt(math.log10(si10 / si1))}"""
      out ++= s""","t_full1":${fmt(sf1)},"t_full10":${fmt(sf10)}"""
      out ++= s""","alpha_full":${fmt(math.log10(sf10 / sf1))}}"""
      println(s"[scaleprobe] substring_indexed inc ${fmt(si1)}->${fmt(si10)}s " +
        s"(alpha ${fmt(math.log10(si10 / si1))}) full ${fmt(sf1)}->${fmt(sf10)}s " +
        s"(alpha ${fmt(math.log10(sf10 / sf1))})")
    }
    // Incremental ANN maintenance (round-13, q219's scale shape): with
    // a FIXED batch of new vectors, ivfpqIndexAdd must stay ~flat as
    // the settled index grows 10× (assignment is batch × broadcast
    // codebooks; the append touches only the buckets the batch lands
    // in), while a full rebuild retrains + recodes the whole corpus.
    if (only.forall(_.contains("incremental_ann"))) {
      import org.apache.spark.sql.functions.col
      def annProbe(n: Long): (Double, Double) = {
        val all = synthEmb(spark, n, 64).localCheckpoint(true)
        val batch = all.where(col("vec_id") % 40 === 7).limit(500)
          .localCheckpoint(true)
        val settled = all.join(batch.select(col("vec_id")), Seq("vec_id"),
          "left_anti").localCheckpoint(true)
        val idx = java.nio.file.Files.createTempDirectory("annadd").toString
        Similarity.buildIvfpqIndex(settled, dim = 64, nCoarse = 16,
          m = 4, kSub = 16, iters = 1, path = idx)
        // single-shot timing: a second add would append the batch twice
        // (callers own vec_id uniqueness), so no timeMin here
        val t0 = System.nanoTime()
        Similarity.ivfpqIndexAdd(idx, batch, dim = 64, m = 4)
        spark.read.parquet(s"$idx/codes").count()
        val tAdd = (System.nanoTime() - t0) / 1e9
        val idx2 = java.nio.file.Files.createTempDirectory("annfull").toString
        val t1 = System.nanoTime()
        Similarity.buildIvfpqIndex(all, dim = 64, nCoarse = 16,
          m = 4, kSub = 16, iters = 1, path = idx2)
        spark.read.parquet(s"$idx2/codes").count()
        val tFull = (System.nanoTime() - t1) / 1e9
        (tAdd, tFull)
      }
      val (ai1, af1) = annProbe(20000L)
      val (ai10, af10) = annProbe(200000L)
      if (out.length > 1) out ++= ","
      out ++= s""""ann_index_add":{"t_add1":${fmt(ai1)},"t_add10":${fmt(ai10)}"""
      out ++= s""","alpha_add":${fmt(math.log10(ai10 / ai1))}"""
      out ++= s""","t_full1":${fmt(af1)},"t_full10":${fmt(af10)}"""
      out ++= s""","alpha_full":${fmt(math.log10(af10 / af1))}}"""
      println(s"[scaleprobe] ann_index_add add ${fmt(ai1)}->${fmt(ai10)}s " +
        s"(alpha ${fmt(math.log10(ai10 / ai1))}) full ${fmt(af1)}->${fmt(af10)}s " +
        s"(alpha ${fmt(math.log10(af10 / af1))})")
    }
    // Flat-PQ guarded add (round-15, q222's scale shape): no inverted
    // file to prune by, so the replay guard pays one column-pruned scan
    // of the 2-bytes-per-vector codes — the same read class every
    // flat-PQ probe already pays. With a FIXED batch the add must stay
    // ~flat as the settled corpus grows 10× (scan-bound at worst),
    // while the rebuild retrains + recodes the whole corpus.
    if (only.forall(_.contains("pq_index_add"))) {
      import org.apache.spark.sql.functions.col
      def pqAddProbe(n: Long): (Double, Double) = {
        val all = synthEmb(spark, n, 64).localCheckpoint(true)
        val batch = all.where(col("vec_id") % 40 === 7).limit(500)
          .localCheckpoint(true)
        val settled = all.join(batch.select(col("vec_id")), Seq("vec_id"),
          "left_anti").localCheckpoint(true)
        val idx = java.nio.file.Files.createTempDirectory("pqadd").toString
        Similarity.buildPqIndex(settled, dim = 64, m = 4, kSub = 16,
          iters = 1, path = idx)
        // single-shot: the guarded add settles the batch on first run,
        // so a second timing pass would measure the (cheaper) no-op
        val t0 = System.nanoTime()
        Similarity.pqIndexAddBatch(idx, batch, dim = 64, m = 4)
        spark.read.parquet(s"$idx/codes").count()
        val tAdd = (System.nanoTime() - t0) / 1e9
        val idx2 = java.nio.file.Files.createTempDirectory("pqfull").toString
        val t1 = System.nanoTime()
        Similarity.buildPqIndex(all, dim = 64, m = 4, kSub = 16,
          iters = 1, path = idx2)
        spark.read.parquet(s"$idx2/codes").count()
        val tFull = (System.nanoTime() - t1) / 1e9
        (tAdd, tFull)
      }
      val (pi1, pf1) = pqAddProbe(20000L)
      val (pi10, pf10) = pqAddProbe(200000L)
      if (out.length > 1) out ++= ","
      out ++= s""""pq_index_add":{"t_add1":${fmt(pi1)},"t_add10":${fmt(pi10)}"""
      out ++= s""","alpha_add":${fmt(math.log10(pi10 / pi1))}"""
      out ++= s""","t_full1":${fmt(pf1)},"t_full10":${fmt(pf10)}"""
      out ++= s""","alpha_full":${fmt(math.log10(pf10 / pf1))}}"""
      println(s"[scaleprobe] pq_index_add add ${fmt(pi1)}->${fmt(pi10)}s " +
        s"(alpha ${fmt(math.log10(pi10 / pi1))}) full ${fmt(pf1)}->${fmt(pf10)}s " +
        s"(alpha ${fmt(math.log10(pf10 / pf1))})")
    }

    // Session-store economics (round-13): the expensive build-once
    // artifacts and their maintained reads, priced at 1×/10× corpus.
    // The claim under test: BUILD cost is corpus-linear (alpha ≈ 1, or
    // below while fixed per-job costs dominate the small end) and a
    // READ-after-build is a store fold priced well under its build —
    // the amortization contract every session_cached bench row states.
    if (only.forall(_.contains("session_stores"))) {
      import org.apache.spark.sql.functions.col
      def slices(n: Long) = Seq(
        col("doc_id") < n / 3,
        col("doc_id") >= n / 3 && col("doc_id") < 2 * n / 3,
        col("doc_id") >= 2 * n / 3)
      def subProbe(n: Long): (Double, Double, Double) = {
        val docs = synthDocs(spark, n, vocab).localCheckpoint(true)
        val st = java.nio.file.Files.createTempDirectory("ssp_sub").toString + "/store"
        val t0 = System.nanoTime()
        slices(n).zipWithIndex.foreach { case (p, b) =>
          graft.streaming.StreamIngest.substringIndexBatch(
            docs.where(p), st, b.toLong, 40, 20)
        }
        val tBuild = (System.nanoTime() - t0) / 1e9
        val (tTop, _, _) = timeMin(graft.streaming.StreamIngest
          .readTopPassages(spark, st, 40, 2, 20).count())
        val (tPairs, _, _) = timeMin(graft.streaming.StreamIngest
          .readSubstringPairs(spark, st).count())
        (tBuild, tTop, tPairs)
      }
      def relProbe(n: Long): (Double, Double) = {
        val docs = synthDocs(spark, n, vocab).localCheckpoint(true)
        val root = java.nio.file.Files.createTempDirectory("ssp_rel").toString
        TextAnalysis.langIdWeights(docs).write.parquet(s"$root/weights")
        val t0 = System.nanoTime()
        slices(n).zipWithIndex.foreach { case (p, b) =>
          graft.streaming.StreamIngest.releaseBatch(
            docs.where(p), s"$root/store", s"$root/weights", b.toLong, 40, 20)
        }
        val tBuild = (System.nanoTime() - t0) / 1e9
        val (tRead, _, _) = timeMin(graft.streaming.StreamIngest
          .readReleaseDecisions(spark, s"$root/store").count())
        (tBuild, tRead)
      }
      val (sb1, st1, sp1) = subProbe(2000L)
      val (sb10, st10, sp10) = subProbe(20000L)
      val (rb1, rr1) = relProbe(2000L)
      val (rb10, rr10) = relProbe(20000L)
      if (out.length > 1) out ++= ","
      out ++= s""""substring_store":{"t_build1":${fmt(sb1)},"t_build10":${fmt(sb10)}"""
      out ++= s""","alpha_build":${fmt(math.log10(sb10 / sb1))}"""
      out ++= s""","t_top1":${fmt(st1)},"t_top10":${fmt(st10)},"alpha_top":${fmt(math.log10(st10 / st1))}"""
      out ++= s""","t_pairs1":${fmt(sp1)},"t_pairs10":${fmt(sp10)}},"""
      out ++= s""""release_store":{"t_build1":${fmt(rb1)},"t_build10":${fmt(rb10)}"""
      out ++= s""","alpha_build":${fmt(math.log10(rb10 / rb1))}"""
      out ++= s""","t_read1":${fmt(rr1)},"t_read10":${fmt(rr10)},"alpha_read":${fmt(math.log10(rr10 / rr1))}}"""
      println(s"[scaleprobe] substring_store build ${fmt(sb1)}->${fmt(sb10)}s " +
        s"(alpha ${fmt(math.log10(sb10 / sb1))}) top-read ${fmt(st1)}->${fmt(st10)}s " +
        s"pairs-read ${fmt(sp1)}->${fmt(sp10)}s")
      println(s"[scaleprobe] release_store build ${fmt(rb1)}->${fmt(rb10)}s " +
        s"(alpha ${fmt(math.log10(rb10 / rb1))}) read ${fmt(rr1)}->${fmt(rr10)}s " +
        s"(alpha ${fmt(math.log10(rr10 / rr1))})")
    }

    // Long-stream store maintenance (round-13): 64 micro-batches through
    // the REAL substring batch body + compaction tick. The claims under
    // test: (a) file counts stay BOUNDED (~compactEvery file-sets + the
    // rewrite target) instead of growing one file-set per store per
    // batch forever; (b) the maintained reads after 64 batches price a
    // store fold, not 64 re-lists; (c) the counts fold keeps the report
    // exact across ticks (asserted, not just timed).
    if (only.forall(_.contains("store_longstream"))) {
      import org.apache.spark.sql.functions.col
      val nB = 64; val per = 120L
      val all = synthDocs(spark, nB * per, vocab).localCheckpoint(true)
      val stC = java.nio.file.Files.createTempDirectory("ssp_ls").toString + "/store"
      val t0 = System.nanoTime()
      (0 until nB).foreach { b =>
        val batch = all.where(col("doc_id") >= b * per && col("doc_id") < (b + 1) * per)
        graft.streaming.StreamIngest.substringIndexBatch(batch, stC, b.toLong, 40, 20)
        if (b > 0 && b % 16 == 0)
          graft.streaming.StreamIngest.compactSubstringStores(spark, stC, b.toLong, 4)
      }
      val tStream = (System.nanoTime() - t0) / 1e9
      def nFiles(st: String): Long = {
        // Files.walk streams hold open DirectoryStreams — close them
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$stC/$st"))
        try {
          val it = s.iterator()
          var n = 0L
          while (it.hasNext) { if (it.next().toString.endsWith(".parquet")) n += 1 }
          n
        } finally s.close()
      }
      val files = Seq("fp", "texts", "pairs", "counts").map(s => s -> nFiles(s))
      val (tTop, topRows, _) = timeMin(graft.streaming.StreamIngest
        .readTopPassages(spark, stC, 40, 2, 20).count())
      // exactness across ticks: the folded+topped-up counts report must
      // equal the one-shot rollup over everything delivered
      val want = TextAnalysis.topDuplicatedPassages(all, 40, 2, 20)
        .collect().map(_.toString).toSet
      val got = graft.streaming.StreamIngest.readTopPassages(spark, stC, 40, 2, 20)
        .collect().map(_.toString).toSet
      require(got == want, s"long-stream counts fold diverged: got ${got.size} want ${want.size}")
      if (out.length > 1) out ++= ","
      out ++= s""""store_longstream":{"batches":$nB,"t_stream":${fmt(tStream)}"""
      out ++= files.map { case (s, n) => s""","files_$s":$n""" }.mkString
      out ++= s""","t_top":${fmt(tTop)},"top_rows":$topRows,"report_exact":true}"""
      println(s"[scaleprobe] store_longstream $nB batches in ${fmt(tStream)}s; files " +
        files.map { case (s, n) => s"$s=$n" }.mkString(" ") +
        s"; top-read ${fmt(tTop)}s (exact=${got == want})")
    }
    // Lineage-guard primitive pricing (round-17, VERDICT r16 item 3):
    // the foreign-lineage guard used to run one narrow-column max agg
    // over the WHOLE texts store per maintenance batch — corpus-width,
    // so its cost grows with everything ever settled. The settled-
    // watermark sidecar read is O(1) in store size. Price BOTH
    // primitives at 1× and 10× store size: the old guard's alpha is
    // the scaling liability the sidecar removes; the sidecar's alpha
    // must be ~0 (and its absolute cost ~ms — driver-side FS read).
    if (only.forall(_.contains("lineage_guard"))) {
      import org.apache.spark.sql.functions.col
      def mkStore(n: Long): String = {
        val d = java.nio.file.Files.createTempDirectory("lg").toString + "/store"
        synthDocs(spark, n, vocab)
          .select(col("doc_id"), col("text"), (col("doc_id") % 64).as("batch_id"))
          .write.parquet(s"$d/texts")
        graft.streaming.StreamIngest.writeSettledWatermark(spark, d, 63L)
        d
      }
      val (s1, s10) = (mkStore(50000L), mkStore(500000L))
      def aggMax(d: String): Long =
        spark.read.parquet(s"$d/texts").agg(max(col("batch_id"))).head().getLong(0)
      def wmRead(d: String): Long =
        graft.streaming.StreamIngest.readSettledWatermark(spark, d).get
      probeTag = "lineage_guard" // label any flap dump correctly (ADVICE r17)
      val (tA1, _, _) = timeMin(aggMax(s1))
      val (tA10, _, _) = timeMin(aggMax(s10))
      // driver-side FS reads fire no listener events — timing them via
      // timeMin would stall the 2 s expectPlans bound per pass
      val tW1 = timeMinDriver(wmRead(s1))
      val tW10 = timeMinDriver(wmRead(s10))
      if (out.length > 1) out ++= ","
      out ++= s""""lineage_guard":{"t_agg1":${fmt(tA1)},"t_agg10":${fmt(tA10)}"""
      out ++= s""","alpha_agg":${fmt(math.log10(tA10 / tA1))}"""
      out ++= s""","t_wm1":${fmt(tW1)},"t_wm10":${fmt(tW10)}"""
      out ++= s""","alpha_wm":${fmt(math.log10(tW10 / tW1))}}"""
      println(s"[scaleprobe] lineage_guard agg ${fmt(tA1)}->${fmt(tA10)}s " +
        s"(alpha ${fmt(math.log10(tA10 / tA1))}) wm ${fmt(tW1)}->${fmt(tW10)}s " +
        s"(alpha ${fmt(math.log10(tW10 / tW1))})")
    }

    // Long-horizon ANN maintenance (round-15): 64 guarded micro-batch
    // adds with the compaction tick every 16 — the claim under test is
    // that per-batch add cost does NOT grow with batches processed
    // (the guard probes settled ids in only the touched buckets, and
    // the tick bounds the codes file count so the listing can't become
    // the bottleneck), and that the post-tick store is code-for-code
    // identical to one bulk add (ticks and batch boundaries are
    // invisible to the arithmetic).
    if (only.forall(_.contains("ann_longstream"))) {
      import org.apache.spark.sql.functions.col
      val nB = 64; val per = 250L; val seed = 20000L
      val all = synthEmb(spark, seed + nB * per, 64).localCheckpoint(true)
      val settled = all.where(col("vec_id") < seed)
      val streamed = all.where(col("vec_id") >= seed)
      val idx = java.nio.file.Files.createTempDirectory("annls").toString
      val ctl = java.nio.file.Files.createTempDirectory("annlsc").toString
      Similarity.buildIvfpqIndex(settled, dim = 64, nCoarse = 16,
        m = 4, kSub = 16, iters = 1, path = idx)
      Similarity.buildIvfpqIndex(settled, dim = 64, nCoarse = 16,
        m = 4, kSub = 16, iters = 1, path = ctl)
      Similarity.ivfpqIndexAdd(ctl, streamed, dim = 64, m = 4)
      val t0 = System.nanoTime()
      (0 until nB).foreach { b =>
        val lo = seed + b * per
        Similarity.ivfpqIndexAddBatch(idx,
          all.where(col("vec_id") >= lo && col("vec_id") < lo + per),
          dim = 64, m = 4)
        if (b > 0 && b % 16 == 0)
          Similarity.compactCodes(spark, idx, filesTarget = 4)
      }
      val tStream = (System.nanoTime() - t0) / 1e9
      def nFiles(p: String): Long = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$p/codes"))
        try {
          val it = s.iterator()
          var n = 0L
          while (it.hasNext) { if (it.next().toString.endsWith(".parquet")) n += 1 }
          n
        } finally s.close()
      }
      def rel(p: String) = spark.read.parquet(s"$p/codes")
        .selectExpr("vec_id", "cast(m AS BIGINT) AS m", "cluster",
          "cast(bucket AS BIGINT) AS bucket")
        .collect().map(_.toString).toSet
      val exact = rel(idx) == rel(ctl)
      require(exact, "long-stream ANN store diverged from the bulk add")
      val (tProbe, probeRows, _) = timeMin(Similarity.ivfpqTopKFromIndex(
        idx, all, dim = 64, nQueries = 8, k = 5, m = 4,
        nprobe = 2, shortlist = 64).count())
      if (out.length > 1) out ++= ","
      out ++= s""""ann_longstream":{"batches":$nB,"t_stream":${fmt(tStream)}"""
      out ++= s""","files_codes":${nFiles(idx)},"files_codes_ctl":${nFiles(ctl)}"""
      out ++= s""","t_probe":${fmt(tProbe)},"probe_rows":$probeRows,"store_exact":true}"""
      println(s"[scaleprobe] ann_longstream $nB batches in ${fmt(tStream)}s; " +
        s"files codes=${nFiles(idx)} (ctl=${nFiles(ctl)}); probe ${fmt(tProbe)}s " +
        s"(exact=$exact)")
    }
    out ++= "}"
    val path = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/tmp/scaleprobe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (out.toString + "\n").getBytes("UTF-8"))
    println(out.toString)
    spark.stop()
  }
}
