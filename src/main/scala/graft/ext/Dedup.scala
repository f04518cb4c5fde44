package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (content-hash groupBy), n-gram Jaccard similarity join,
  * MinHash+LSH banding, and SimHash fingerprints.
  *
  * Scale design (100 TB): every variant is a pure shuffle-on-key plan —
  * content hash, shingle, or band signature — so work distributes evenly
  * and nothing funnels through the driver. The LSH band join is the scale
  * path: candidate generation is O(sum of bucket sizes squared) on tiny
  * buckets instead of O(n²) all-pairs.
  *
  * All hashes derive from md5 (standard everywhere) so the DuckDB oracle
  * can reproduce them bit-for-bit: hash64(s) = first 15 hex chars of
  * md5 as a 60-bit integer.
  */
object Dedup {

  /** 60-bit integer hash from md5 — reproducible in any engine. Computed
    * by the fused codegen expression [[graft.functions.Md5Prefix64]]
    * (callers must register it on the session first); bit-identical to
    * the spelled-out form below, which remains as the cross-engine
    * specification and parity-test reference. */
  def hash64(c: Column): Column = call_function("md5_prefix64", c)

  /** The same hash via built-ins — the form the DuckDB oracle mirrors. */
  def hash64Spec(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Second INDEPENDENT 60-bit hash stream (md5 of a prefixed copy) for
    * fingerprint widths beyond one hash's 60 bits. */
  def hash64b(c: Column): Column = hash64(concat(lit("#"), c))

  /** Distinct word n-gram shingles over an ALREADY-MATERIALIZED token
    * array column. The tokens must be a plain attribute, not an inline
    * `split(...)` expression: a lambda body re-evaluates its non-attribute
    * subtrees once per array element, which turns shingling into
    * O(positions × tokenize) — 10× slower on real documents.
    */
  def wordShingles(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array()))

  /** Exact dedup: first-wins (min id) per identical text. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))

  /** (doc_id, shingle) inverted-index relation. Input widened first —
    * shingling is CPU-bound fan-out and a single-row-group source would
    * run it in one task; no-op on an already-wide input. */
  def shingleIndex(docs: DataFrame, n: Int): DataFrame =
    graft.util.Scale.widen(docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(wordShingles(col("toks"), n)).as("sh"))

  /** Eval-set decontamination: drop every training document that shares
    * ANY word n-gram with the evaluation corpus — the guard against
    * benchmark leakage that every LLM training pipeline runs before
    * training. Eval sets are small (thousands of prompts), so their
    * distinct shingle dictionary BROADCASTS; the training side is one
    * shingle explode + broadcast semi-join + anti-join on doc_id — no
    * shuffle of the corpus at all when the contaminated-id set is also
    * broadcast-sized, one shuffle otherwise. If the eval relation is a
    * subset of `docs`, the eval documents themselves are removed too
    * (they share their own shingles).
    *
    * The final anti-join is deliberately left to AQE: the
    * contaminated-id side is bounded by CONTAMINATION VOLUME (worst
    * case corpus-scale — a forced broadcast is an OOM hazard at
    * 100 TB), while a forced sort-merge would shuffle the corpus even
    * when contamination is tiny. The price of measure-and-choose is a
    * rare plan-identity race (AQE sometimes finalizes the stage before
    * the SMJ→BHJ conversion round) — the adjudicated
    * q108-anti-join-conversion-race class,
    * bench_history/q108-joinaudit-r18.txt.
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, n: Int): DataFrame = {
    val evalSh = broadcast(shingleIndex(evalDocs, n).select(col("sh")).distinct())
    val contaminated = shingleIndex(docs, n).join(evalSh, "sh")
      .select(col("doc_id")).distinct()
    docs.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Contamination AUDIT — the report a decontamination run ships with:
    * per EVAL document, how many corpus documents share at least one
    * word n-gram with it and how many of its shingles leak. Answers
    * "which benchmark items are compromised and how badly" where
    * [[decontaminate]] silently drops; the eval doc itself is excluded
    * (it trivially shares its own shingles when the eval set is a
    * corpus subset). Eval docs with NO leaks are absent from the
    * report (inner shingle join) — the report lists findings, not the
    * roster.
    *
    * Scale shape: same economics as [[decontaminate]] — the eval
    * shingle relation broadcasts (eval sets are small), the corpus
    * side is one shingle explode, and the aggregate runs over
    * MATCH-volume rows only. The two exact distincts plan one Expand
    * over that match-volume relation (2× its rows through the
    * exchange) — bounded by contamination volume, never corpus size.
    */
  def contaminationReport(docs: DataFrame, evalDocs: DataFrame, n: Int): DataFrame = {
    val evalSh = broadcast(shingleIndex(evalDocs, n)
      .select(col("doc_id").as("eval_id"), col("sh")))
    shingleIndex(docs, n).join(evalSh, "sh")
      .where(col("doc_id") =!= col("eval_id"))
      .groupBy(col("eval_id"))
      .agg(countDistinct(col("doc_id")).as("n_contaminated_docs"),
        countDistinct(col("sh")).as("n_leaked_shingles"))
  }

  /** [[decontaminate]] for eval sets too large to broadcast as a hash
    * relation: the eval shingle dictionary is folded into a BLOOM FILTER
    * (Spark's own `BloomFilterAggregate`, the runtime-filter machinery,
    * here used as a first-class operator), which costs bits-per-item
    * instead of hashed-relation bytes. The corpus index is prefiltered
    * by `might_contain` under the one-row broadcast — still no corpus
    * shuffle — and only the SURVIVORS (true hits + the fpp tail) take
    * the exact shuffled semi-join that removes false positives. Output
    * is therefore EXACTLY [[decontaminate]]'s (same oracle); the bloom
    * only prunes where the exact join must look.
    */
  /** Registers Spark's internal bloom aggregate/probe expressions under
    * stable names — shared by [[decontaminateBloom]] and
    * [[dedupAgainstBloom]]. */
  private def registerBloomFns(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)),
      "scala_udf")
  }

  def decontaminateBloom(docs: DataFrame, evalDocs: DataFrame, n: Int,
                         expectedItems: Long = 1000000L,
                         numBits: Long = 8000000L): DataFrame = {
    val spark = docs.sparkSession
    registerBloomFns(spark)
    // materialized once: the dictionary feeds BOTH the bloom aggregate
    // (an immediate driver action) and the exact confirm join — without
    // the checkpoint the full eval shingling would run twice
    val evalSh = shingleIndex(evalDocs, n).select(col("sh")).distinct()
      .localCheckpoint(true)
    // the aggregation is distributed (partial blooms merged); the final
    // sketch (numBits/8 bytes) is pulled to the driver and embedded as a
    // constant — might_contain requires a foldable filter, and a
    // bits-sized literal IS the broadcast (same pattern as
    // DataFrameStatFunctions.bloomFilter)
    val bf = evalSh.agg(call_function("graft_bloom_agg",
        xxhash64(col("sh")), lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val candidates = shingleIndex(docs, n)
      .where(call_function("graft_bloom_contains", lit(bf), xxhash64(col("sh"))))
      .select(col("doc_id"), col("sh"))
    val confirmed = candidates.hint("shuffle_hash")
      .join(evalSh.hint("shuffle_hash"), Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.join(confirmed, Seq("doc_id"), "left_anti")
  }

  /** Stop-shingle document-frequency cap. A shingle shared by more than
    * this many documents is corpus boilerplate; its inverted-index bucket
    * would contribute df² candidate pairs (one hot shingle = one
    * quadratic bucket at 100 TB). Hot shingles are excluded from
    * CANDIDATE GENERATION only — Jaccard scores are still computed over
    * the full shingle sets, so every emitted score is exact. Recall: a
    * qualifying pair is missed only when EVERY shingle it shares is hot,
    * i.e. the entire overlap is boilerplate shared by > maxDf docs. */
  val DefaultMaxShingleDf = 128

  /** Near-dup pairs by exact n-gram Jaccard >= tau.
    *
    * All equi-joins, every bucket capped: the COLD (df <= maxDf)
    * inverted-index self-join counts shared cold shingles in one
    * aggregate — sum-of-bucket² over capped buckets only. The hot
    * shingles' contribution is added back per candidate pair from
    * per-doc HOT-SHINGLE SETS (`array_intersect` of two small arrays —
    * a document carries at most a handful of boilerplate shingles), so
    * the intersection is exact; only pairs whose ENTIRE overlap is hot
    * are missed (see [[DefaultMaxShingleDf]]).
    *
    * Plan discipline: the heavy self-join lineage appears exactly ONCE,
    * always on the STREAMING side. Every enrichment join is hinted
    * SHUFFLE_HASH — if the planner instead broadcast the (row-wise
    * tiny) pair side, the whole self-join subtree would re-execute
    * inside each broadcast build, serially. The dictionary joins are
    * likewise shuffle-based so all shingle-keyed consumers share one
    * reused Exchange of the shingling subtree.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, tau: Double,
                        maxDf: Int = DefaultMaxShingleDf): DataFrame =
    shingleIntersections(docs, n, maxDf)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** One-sided CONTAINMENT near-dup pairs — |A∩B| / min(|A|, |B|): the
    * subset detector Jaccard structurally misses (a short doc fully
    * quoted inside a long one scores jaccard ≈ |A|/|B| → arbitrarily
    * low, but containment = 1). The standard second threshold of
    * production fuzzy dedup; same capped candidate generation and exact
    * intersection counts as [[ngramJaccardPairs]] (shared helper), so
    * the same scale economics hold.
    */
  def ngramContainmentPairs(docs: DataFrame, n: Int, tau: Double,
                            maxDf: Int = DefaultMaxShingleDf): DataFrame =
    shingleIntersections(docs, n, maxDf)
      .withColumn("containment",
        col("inter").cast("double") / least(col("na"), col("nb")))
      .where(col("containment") >= tau)
      .select(col("doc_a"), col("doc_b"), col("containment"))

  /** Shared two-phase pair engine behind [[ngramJaccardPairs]] and
    * [[ngramContainmentPairs]]: capped candidate generation + exact
    * intersection counts over FULL shingle sets. Returns
    * (doc_a, doc_b, inter, na, nb) for every candidate pair. */
  private def shingleIntersections(docs: DataFrame, n: Int,
                                   maxDf: Int): DataFrame = {
    val sh = shingleIndex(docs, n)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val dfRel = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val cold = sh.join(
      dfRel.where(col("df") <= maxDf).select(col("sh")).hint("shuffle_hash"), "sh")
    // pin the self-join input partitioning: its INPUT bytes are small
    // (AQE would coalesce to 1 partition) but its OUTPUT is
    // sum-of-bucket² rows — parallelism must follow the output side, so
    // a user-numbered repartition (which AQE never coalesces) keeps the
    // explosive stage wide
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    val coldP = cold.repartition(p, col("sh"))
    val interCold = coldP.as("a").join(coldP.as("b"), "sh")
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("ic"))
    val hotSets = sh.join(
        dfRel.where(col("df") > maxDf).select(col("sh")).hint("shuffle_hash"), "sh")
      .groupBy(col("doc_id")).agg(collect_set(col("sh")).as("hs"))
    val inter = interCold
      .join(hotSets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
        .hint("shuffle_hash"), Seq("doc_a"), "left")
      .join(hotSets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
        .hint("shuffle_hash"), Seq("doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        (col("ic") + size(array_intersect(
          coalesce(col("hs_a"), array()), coalesce(col("hs_b"), array())))).as("inter"))
    inter
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("na"))
        .hint("shuffle_hash"), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"))
        .hint("shuffle_hash"), "doc_b")
  }

  /** Signature length k and band count b (rows per band r = k/b).
    * These are ENGINE-WIDE constants generated into both the Spark
    * operators and their DuckDB oracle SQL from this one source —
    * change them here and every oracle regenerates consistently.
    * k = 8 / b = 4 (r = 2) is the fixture economy: the S-curve
    * P(collide) = 1 − (1 − j^r)^b at r = 2 is recall-heavy, which is
    * what small fixtures need to populate candidate relations.
    * Production corpora run k = 128 / b = 16 / r = 8 (the
    * Gopher/RefinedWeb class settings) for a sharp threshold near
    * j ≈ (1/b)^(1/r); nothing in the plan shapes depends on k — the
    * signature is one groupBy with k aggregate expressions and the
    * band relation k/r rows per doc — so the constants scale without
    * structural change, and q161's calibration report + q174's band
    * load forecast are exactly the tools for re-tuning them. */
  val MinhashK = 8     // signature length
  val MinhashBands = 4 // bands of 2 rows each

  /** MinHash signatures: k independent hash functions h_i(s) =
    * hash64(i || ':' || s), minimum over the doc's shingles — computed as
    * k aggregate expressions in ONE groupBy (no k-times row blowup).
    */
  def minhashSignatures(docs: DataFrame, n: Int): DataFrame = {
    graft.functions.Md5Prefix64.register(docs.sparkSession)
    val sh = shingleIndex(docs, n)
    val mins = (0 until MinhashK).map(i =>
      min(hash64(concat(lit(s"$i:"), col("sh")))).as(s"mh$i"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: docs sharing any band signature (band = 2
    * consecutive minhashes). Returns (doc_a, doc_b, n_bands) where
    * n_bands is the number of colliding bands.
    */
  /** (doc_id, band, m0, m1) LSH band relation of [[minhashSignatures]] —
    * the collision key for banding joins. */
  def minhashBands(docs: DataFrame, n: Int): DataFrame = {
    val sig = minhashSignatures(docs, n)
    val bandStructs = (0 until MinhashBands).map(b =>
      struct(lit(b).as("band"), col(s"mh${2 * b}").as("m0"), col(s"mh${2 * b + 1}").as("m1")))
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.m0").as("m0"), col("bs.m1").as("m1"))
  }

  def minhashCandidates(docs: DataFrame, n: Int): DataFrame = {
    val bands = minhashBands(docs, n)
    bands.as("a").join(bands.as("b"), Seq("band", "m0", "m1"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** MinHash ESTIMATOR CALIBRATION report — the measurement an operator
    * reads before trusting LSH-banded dedup at a new tau: for every
    * banded candidate pair, the signature-estimated Jaccard (matching
    * components / k, resolution 1/k at k = [[MinhashK]]) is compared
    * against the EXACT shingle Jaccard, rolled up per estimator level.
    * Emits (n_eq, est_ppm, n_pairs, mean_true_ppm) — the empirical
    * calibration curve; a level whose mean_true_ppm sits far below
    * est_ppm is the false-positive mass the verify stage
    * ([[jaccardVerifyPairs]]) will discard.
    *
    * All arithmetic is exact integer (per-pair ppm by truncating
    * division, then an integer mean) — no FP-summation-order hazard.
    * Zero-intersection candidates (pure band collisions) are KEPT at
    * inter = 0: they are precisely the false positives being measured,
    * so the intersection join is left-outer where the verify stage's
    * is inner.
    *
    * Scale shape: candidate-volume-sized throughout (the banding join's
    * own output); signatures and set sizes join back per-doc; output is
    * ≤ k+1 rows at any corpus scale.
    */
  def minhashCalibration(docs: DataFrame, n: Int): DataFrame = {
    val cand = minhashCandidates(docs, n).select(col("doc_a"), col("doc_b"))
    val sig = minhashSignatures(docs, n)
    val sh = shingleIndex(docs, n)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")).hint("shuffle_hash"),
        "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")).hint("shuffle_hash"),
        Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    val nEq = (0 until MinhashK).map(i =>
      when(col(s"a.mh$i") === col(s"b.mh$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand
      .join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("na"))
        .hint("shuffle_hash"), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"))
        .hint("shuffle_hash"), "doc_b")
      .join(inter.hint("shuffle_hash"), Seq("doc_a", "doc_b"), "left")
      .withColumn("_i", coalesce(col("inter"), lit(0L)))
      .select(nEq.as("n_eq"),
        expr("_i * 1000000 div (na + nb - _i)").as("jacc_ppm"))
      .groupBy(col("n_eq"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("jacc_ppm")).as("_sum"))
      .select(col("n_eq"), expr(s"n_eq * 1000000 div $MinhashK").as("est_ppm"),
        col("n_pairs"), expr("_sum div n_pairs").as("mean_true_ppm"))
  }

  /** Exact n-gram Jaccard RESCORE of an arbitrary candidate pair
    * relation `cand` = (doc_a, doc_b): emits the candidates whose true
    * Jaccard (over the full n-gram shingle sets, computed exactly) is
    * >= tau, with the score attached — the verify stage between a
    * recall-oriented candidate generator ([[minhashCandidates]] LSH
    * banding) and clustering. Every emitted score is exact; candidates
    * sharing no shingle at all (LSH false positives) drop out of the
    * intersection join, which is correct for any tau > 0.
    *
    * Scale shape: all equi-joins — candidates join the shingle index on
    * doc_a (pair-volume × shingles-per-doc rows), then on (doc_b, sh)
    * to count the intersection in one aggregate; per-doc set sizes join
    * back by doc id. Work is candidate-volume-sized, never corpus²; the
    * SHUFFLE_HASH hints keep the (row-wise tiny but expensive-lineage)
    * pair side streaming, same discipline as [[ngramJaccardPairs]].
    */
  def jaccardVerifyPairs(docs: DataFrame, cand: DataFrame, n: Int,
                         tau: Double): DataFrame = {
    val sh = shingleIndex(docs, n)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // Distinct first: a duplicated (doc_a, doc_b) row in cand would
    // multiply the intersection count (jaccard > 1, false-passing tau),
    // so the "arbitrary candidate relation" contract requires dedup here
    // rather than trusting every caller.
    val inter = cand.select(col("doc_a"), col("doc_b")).distinct()
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")).hint("shuffle_hash"),
        "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")).hint("shuffle_hash"),
        Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("na"))
        .hint("shuffle_hash"), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"))
        .hint("shuffle_hash"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Incremental dedup: clean a NEW batch against an EXISTING corpus —
    * the shape every continuously-ingesting training pipeline needs
    * (yesterday's corpus is fixed; today's crawl must not re-add what is
    * already there, exactly or nearly). Two anti-join tiers:
    *
    *  1. exact — batch rows whose content hash exists in the corpus;
    *  2. near — surviving batch rows sharing ANY minhash LSH band with a
    *     corpus row.
    *
    * Both tiers are equi-joins keyed on hash/band — batch×corpus work is
    * proportional to collisions, never |batch|·|corpus|, and the corpus
    * side is only ever scanned, not rewritten. Returns the batch rows
    * that survive both tiers.
    */
  def dedupAgainst(newDocs: DataFrame, corpus: DataFrame, n: Int): DataFrame = {
    val corpusHashes = corpus.select(md5(col("text")).as("_h")).distinct()
    val exactKept = newDocs.withColumn("_h", md5(col("text")))
      .join(corpusHashes, Seq("_h"), "left_anti").drop("_h")
    val collided = minhashBands(exactKept, n)
      .join(minhashBands(corpus, n), Seq("band", "m0", "m1"), "left_semi")
      .select(col("doc_id")).distinct()
    exactKept.join(collided, Seq("doc_id"), "left_anti")
  }

  /** Persist the incremental-dedup INDEX — the q105/q127 artifact
    * discipline applied to [[dedupAgainst]]: at 100 TB the corpus side
    * of incremental dedup must not be re-fingerprinted on every batch
    * (that is a full corpus scan per crawl cycle); instead the two
    * probe relations are written ONCE as columnar artifacts — the
    * distinct content-hash set and the distinct minhash band set (both
    * dedup-key-sized, partial-aggregated map-side) — and every future
    * batch probes the loaded artifact with ZERO corpus scans.
    * Incremental maintenance is append-only: a cleaned batch's own
    * hashes/bands append to the same directories. */
  def saveDedupIndex(corpus: DataFrame, n: Int, path: String): Unit = {
    corpus.select(md5(col("text")).as("h")).distinct()
      .write.mode("overwrite").parquet(path + "/hashes")
    minhashBands(corpus, n).select(col("band"), col("m0"), col("m1"))
      .distinct().write.mode("overwrite").parquet(path + "/bands")
  }

  /** [[dedupAgainst]] against a LOADED index ([[saveDedupIndex]]) —
    * identical semantics (same oracle gates both, q73/q134), but the
    * corpus never appears in the plan: both tiers anti/semi-join the
    * persisted artifacts on their keys. */
  def dedupAgainstIndex(newDocs: DataFrame, n: Int, path: String): DataFrame = {
    val spark = newDocs.sparkSession
    val exactKept = newDocs.withColumn("_h", md5(col("text")))
      .join(spark.read.parquet(path + "/hashes").withColumnRenamed("h", "_h"),
        Seq("_h"), "left_anti").drop("_h")
    val collided = minhashBands(exactKept, n)
      .join(spark.read.parquet(path + "/bands"),
        Seq("band", "m0", "m1"), "left_semi")
      .select(col("doc_id")).distinct()
    exactKept.join(collided, Seq("doc_id"), "left_anti")
  }

  /** Bloom-accelerated EXACT-tier incremental dedup: the corpus content
    * hashes fold into a bloom filter (the [[decontaminateBloom]]
    * machinery pointed at the dedup problem), and batch rows split on
    * one broadcast-free probe:
    *
    *  - `might_contain` = false → DEFINITELY new (blooms have no false
    *    negatives): the row is kept with ZERO join work;
    *  - `might_contain` = true → maybe-dup (true dups + the fpp tail):
    *    only these rows take the exact anti-join that removes false
    *    positives.
    *
    * Output is therefore EXACTLY `batch ⟕̸ corpusHashes` — the same
    * relation a plain hash anti-join computes (one oracle gates both) —
    * but the shuffled anti-join's probe side shrinks from |batch| to
    * |collisions| + fpp·|batch|. At 100 TB that is the difference
    * between shuffling every crawl document and shuffling only the
    * suspected-duplicate sliver; the bloom itself costs bits-per-item
    * (1.2 GB per 10⁹ corpus docs at the default sizing) and rides as a
    * foldable literal, the runtime-filter broadcast pattern.
    */
  def dedupAgainstBloom(newDocs: DataFrame, corpus: DataFrame,
                        expectedItems: Long = 1000000L,
                        numBits: Long = 8000000L): DataFrame = {
    val spark = newDocs.sparkSession
    registerBloomFns(spark)
    // materialized once: the hash set feeds BOTH the bloom aggregate (an
    // immediate driver action) and the exact confirm anti-join
    val corpusHashes = corpus.select(md5(col("text")).as("_h")).distinct()
      .localCheckpoint(true)
    val bf = corpusHashes.agg(call_function("graft_bloom_agg",
        xxhash64(col("_h")), lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val hashed = newDocs.withColumn("_h", md5(col("text")))
    val mightBeDup =
      call_function("graft_bloom_contains", lit(bf), xxhash64(col("_h")))
    val definitelyNew = hashed.where(!mightBeDup)
    val confirmedNew = hashed.where(mightBeDup)
      .join(corpusHashes, Seq("_h"), "left_anti")
    definitelyNew.unionByName(confirmedNew).drop("_h")
  }

  /** Exact Hamming near-dup pairs over [[simhash]] fingerprints, as an
    * equi-join: the `bits`-wide fingerprint splits into `nBands` equal
    * bands, and by pigeonhole any pair within Hamming distance
    * maxDist (< band count) agrees on at least one whole band — so the
    * band join generates a candidate SUPERSET and `bit_count(xor)`
    * filters it to exactly the pairs a brute-force all-pairs scan would
    * emit (the q77/q92 oracles ARE that brute force). Fingerprints ride
    * through the band join, so no rescore join is needed. Candidate
    * volume is sum-of-band-bucket², the same scale economics as the
    * MinHash bands.
    *
    * Width presets: the 16-bit/4-nibble default keeps the generated
    * oracle SQL small for the fixture queries but saturates quickly
    * (2¹⁶ buckets can't separate a large corpus — every pair collides
    * somewhere). The PRODUCTION preset is bits=64, nBands=4 (16-bit
    * bands, registered as q92): 2⁶⁴ fingerprint space, so surviving
    * pairs are true near-dups, and each band's 2¹⁶-value domain still
    * spreads the band join evenly at corpus scale.
    */
  def simhashHammingPairs(docs: DataFrame, maxDist: Int = 3,
                          bits: Int = SimhashBits, nBands: Int = 4,
                          maxBandDf: Int = 0): DataFrame =
    fingerprintHammingPairs(
      simhash(docs, bits).withColumnRenamed("simhash", "fp"),
      maxDist, bits, nBands, maxBandDf)

  /** The banded Hamming pair join over an ARBITRARY fingerprint relation
    * `fps` = (doc_id, fp) with fp a ≤64-bit long — the machinery behind
    * [[simhashHammingPairs]] (text SimHash, q33/q77/q92), reused
    * verbatim by the perceptual image-dHash path
    * ([[graft.ext.Multimodal.imageDupPairs]], q102). Emits
    * (doc_a, doc_b, dist) for every pair within `maxDist`, exactly as
    * brute force would (pigeonhole: maxDist < nBands ⇒ any such pair
    * shares a whole band; `bit_count(xor)` then filters the candidate
    * superset exactly). Fingerprints ride through the band join — no
    * rescore join; the Hamming filter runs inside the join's codegen
    * stage, BEFORE the pair-dedup aggregate.
    *
    * `maxBandDf` — the HOT-BUCKET cap (0 = uncapped, the exact clique
    * semantics every oracle states; the default, so every pre-r19
    * caller's plan is byte-unchanged). The band join is quadratic PER
    * BUCKET: a nav-bar/license chunk repeated across ~10⁶ documents
    * puts ~10⁶ identical fingerprints under every one of its band
    * values and the clique emits ~nBands·10¹² candidate rows — the
    * q213 hot-anchor blowup in banded-fingerprint form. With the cap,
    * buckets larger than `maxBandDf` rows emit a STAR around the
    * bucket's deterministic representative (min (doc_id, fp)) instead
    * of the clique — bucket-LINEAR volume, the q213 discipline.
    *
    * The capped contract (spec-pinned in ExtSpec on a planted
    * mega-boilerplate fixture): every star pair is a clique pair
    * (capped output ⊆ uncapped), and within an over-cap bucket every
    * member still pairs with the representative, so for IDENTICAL
    * fingerprints — the case the cap exists for, dist(rep, member)=0 —
    * the first-wins CUT SET of a consumer like
    * [[graft.ext.TextAnalysis.dedupParagraphs]] is preserved exactly
    * (rep is the bucket minimum, so no member escapes and keep-first
    * keeps exactly the representative). What the star under-reports is
    * member×member pairing AROUND a hot core at distance > 0 from the
    * representative — such a pair is missed only if EVERY band it
    * shares is over-cap; pairs also colliding in any cold band are
    * still found by that band's clique.
    */
  def fingerprintHammingPairs(fps: DataFrame, maxDist: Int,
                              bits: Int, nBands: Int,
                              maxBandDf: Int = 0): DataFrame = {
    require(maxDist < nBands, s"pigeonhole guarantee needs maxDist < $nBands")
    require(bits % nBands == 0, s"bits=$bits must split into $nBands equal bands")
    val bw = bits / nBands
    require(bw < 63, s"band width $bw too wide for a long mask")
    val mask = (1L << bw) - 1
    val sh = fps.select(col("doc_id"), col("fp")).localCheckpoint(false)
    val bandVals = (0 until nBands).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("fp"), bw * b).bitwiseAND(lit(mask)).as("v")))
    val bands = sh.select(col("doc_id"), col("fp"),
      explode(array(bandVals: _*)).as("bv"))
      .select(col("doc_id"), col("fp"),
        col("bv.band").as("band"), col("bv.v").as("v"))
    // Hamming filter BEFORE the dedup aggregate: a candidate pair
    // appears once per shared band (≤ nBands times), but only ~1% of
    // random pairs survive the distance cut — filtering first shrinks
    // the distinct's shuffle input by that factor, and the filter is
    // evaluated inside the join's codegen stage.
    def clique(b: DataFrame): DataFrame =
      b.as("x").join(b.as("y"), Seq("band", "v"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          expr("cast(bit_count(x.fp ^ y.fp) AS BIGINT)").as("dist"))
    // Uncapped fast path (r20): emit each qualifying pair from its
    // FIRST shared band only — the matched band must be the LOWEST
    // all-zero band of fp ^ fp' ([[graft.functions.FirstZeroBand]],
    // one xor + a short loop per candidate row; a declarative AND
    // chain re-evaluates the xor per term because join conditions get
    // no subexpression elimination). Each pair then appears exactly
    // once, so the result needs NO pair-dedup aggregate: the
    // `.distinct()` exchange (22 MB shuffle on q77 at sf0.1, the
    // operator's only exchange besides the band join) disappears while
    // the emitted SET is unchanged (guide §2.4 — remove shuffles
    // outright). The capped branch keeps the distinct: there a pair
    // can surface from a cold clique AND a hot star in different
    // bands, and the cold/hot split makes "first shared band"
    // unavailable per branch.
    def cliqueFirstBand(b: DataFrame): DataFrame = {
      graft.functions.FirstZeroBand.register(b.sparkSession)
      val firstBand = call_function("first_zero_band",
        expr("x.fp ^ y.fp"), lit(bw), lit(nBands))
      // conjunct order matters: the id cut (1 compare) and the Hamming
      // cut (xor + popcount) run per CANDIDATE row; the first-band
      // kernel (xor + band loop) only on the survivors — codegen
      // short-circuits And left-to-right, and for tight thresholds the
      // Hamming cut kills ~everything (q103: 12.4M candidates → a few
      // hundred survivors at sf0.1)
      b.as("x").join(b.as("y"), Seq("band", "v"))
        .where(col("x.doc_id") < col("y.doc_id") &&
          expr(s"bit_count(x.fp ^ y.fp) <= $maxDist") &&
          firstBand === col("band"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          expr("cast(bit_count(x.fp ^ y.fp) AS BIGINT)").as("dist"))
    }
    if (maxBandDf <= 0) {
      // lay the band relation out by its join key (the q107/q196
      // discipline): the self-join's two identical subtrees canonicalize
      // to ONE reused exchange, the join inherits p-way parallelism
      // instead of streaming the AQE-coalesced (bytes-tiny,
      // compute-heavy) relation on one task, and no underestimated
      // generate-exploded relation can get mis-chosen for broadcast at
      // scale (the q196 estimate-undershoot argument). p follows
      // spark.sql.shuffle.partitions — the scale-parameterized knob.
      val p = fps.sparkSession.sessionState.conf.numShufflePartitions
      return cliqueFirstBand(bands.repartition(p, col("band"), col("v")))
    }
    val candidates =
      if (maxBandDf <= 0) clique(bands)
      else {
        // bucket populations, then the q213 cold/hot split: the df
        // relation is bucket-count-sized; shuffle_hash keeps the
        // exploded band relation on the streaming side (the q31/q196
        // estimate-undershoot discipline) and lets the (band, v)
        // exchange layout reuse across the split joins
        val dfRel = bands.groupBy(col("band"), col("v"))
          .agg(count(lit(1)).as("df"))
        val cold = bands.join(dfRel.where(col("df") <= maxBandDf)
          .select(col("band"), col("v")).hint("shuffle_hash"),
          Seq("band", "v"))
        val hot = bands.join(dfRel.where(col("df") > maxBandDf)
          .select(col("band"), col("v")).hint("shuffle_hash"),
          Seq("band", "v"))
        // star around the bucket's min (doc_id, fp): rep_id is the
        // bucket minimum, so rep_id < doc_id needs no dedup logic and
        // the representative is arrival-order-independent
        val rep = hot.groupBy(col("band"), col("v"))
          .agg(min(struct(col("doc_id"), col("fp"))).as("r"))
          .select(col("band"), col("v"),
            col("r").getField("doc_id").as("rep_id"),
            col("r").getField("fp").as("rep_fp"))
        val star = hot.join(rep.hint("shuffle_hash"), Seq("band", "v"))
          .where(col("doc_id") > col("rep_id"))
          .select(col("rep_id").as("doc_a"), col("doc_id").as("doc_b"),
            expr("cast(bit_count(rep_fp ^ fp) AS BIGINT)").as("dist"))
        clique(cold).unionByName(star)
      }
    candidates
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** Cluster ANY near-dup pair relation over a universe of ids:
    * connected components → (doc_id, canonical_id, cluster_size). The
    * canonical survivor is the minimum id of each cluster (first-wins,
    * like the exact path); ids with no pair form singleton clusters.
    *
    * `ids` is a one-column (`doc_id`) universe; `pairs` a two-column
    * (`a`, `b`) edge relation — any candidate generator composes here:
    * [[ngramJaccardPairs]], [[minhashCandidates]], or
    * [[graft.ext.Similarity.cosineDupPairs]] output renamed to (a, b).
    */
  def clusterPairs(ids: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = graft.graph.ConnectedComponents.run(pairs.select(col("a"), col("b")))
    val labeled = ids.select(col("doc_id"))
      .join(cc, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("canonical_id"))
    val sizes = labeled.groupBy(col("canonical_id").as("_c"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, labeled("canonical_id") === col("_c"))
      .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
  }

  /** [[clusterPairs]] with an explicit SURVIVOR POLICY: the canonical
    * document of each cluster is the member maximizing `quality`
    * (ties → smallest doc_id), instead of the hardcoded min-id. Training
    * pipelines usually keep the longest / highest-quality copy of a
    * near-dup cluster, not the one with the smallest id — pass e.g.
    * `length(col("text"))` or a quality-score column.
    *
    * `docs` must carry `doc_id` plus whatever columns `quality` reads.
    * Scale shape: unchanged from [[clusterPairs]] — the CC label is
    * still the min-id component; the policy adds one groupBy on the
    * cluster label (max_by partial-aggregates map-side) and one
    * label-keyed join back.
    */
  def clusterPairsBy(docs: DataFrame, pairs: DataFrame, quality: Column): DataFrame = {
    val cc = graft.graph.ConnectedComponents.run(pairs.select(col("a"), col("b")))
    val labeled = docs
      .join(cc, col("doc_id") === col("id"), "left")
      .withColumn("_cl", coalesce(col("component"), col("doc_id")))
    // survivor = max over the cluster of (quality, -doc_id) — highest
    // quality wins, smallest id breaks ties; struct ordering is
    // lexicographic so one partial-aggregable max_by carries the policy
    val survivors = labeled.groupBy(col("_cl"))
      .agg(max_by(col("doc_id"), struct(quality.as("_q"), (-col("doc_id")).as("_nid")))
          .as("canonical_id"),
        count(lit(1)).as("cluster_size"))
    labeled.join(survivors.hint("shuffle_hash"), "_cl")
      .select(col("doc_id"), col("canonical_id"), col("cluster_size"))
  }

  /** End-to-end near-dedup over documents: capped Jaccard pairs →
    * connected components (see [[clusterPairs]] to cluster a different
    * pair source, e.g. embedding-cosine pairs).
    */
  def nearDupClusters(docs: DataFrame, n: Int, tau: Double,
                      maxDf: Int = DefaultMaxShingleDf): DataFrame =
    clusterPairs(docs,
      ngramJaccardPairs(docs, n, tau, maxDf)
        .select(col("doc_a").as("a"), col("doc_b").as("b")))

  val SimhashBits = 16

  /** SimHash fingerprint over word tokens (with multiplicity): bit j of
    * the fingerprint is set iff sum over tokens of (+1/-1 for bit j of
    * the token hash) is positive.
    *
    * Widths up to 64 are supported: bits 0–59 read the primary 60-bit
    * md5 hash, bits 60+ read the independent [[hash64b]] stream (one
    * extra md5 per token, only computed when needed). Bit 63's weight is
    * `1L << 63` = Long.MinValue — the two's-complement bit pattern is
    * exactly the intended bit, and the left-fold sum cannot overflow
    * even under ANSI mode (the positive terms total ≤ 2⁶³−1 before the
    * single negative term is added; the DuckDB oracle sums in hugeint
    * and casts back, landing on the same signed value).
    */
  def simhash(docs: DataFrame, bits: Int = SimhashBits): DataFrame = {
    require(bits >= 1 && bits <= 64, s"simhash width $bits outside [1, 64]")
    graft.functions.Md5Prefix64.register(docs.sparkSession)
    // NOT widened (r20): measured — the widen exchange cost q33 +0.4 s
    // and q92 +0.3 s against a ~0.5 s single-task simhash scan; the
    // heavy consumers (q77's pair join) got their parallelism from the
    // band-relation repartition instead. See OPTIMIZATION_r20.md.
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val tok =
      if (bits > 60)
        toks.select(col("doc_id"), hash64(col("token")).as("h"),
          hash64b(col("token")).as("h2"))
      else toks.select(col("doc_id"), hash64(col("token")).as("h"))
    def bitOf(j: Int): Column =
      if (j < 60) shiftright(col("h"), j).bitwiseAND(lit(1L))
      else shiftright(col("h2"), j - 60).bitwiseAND(lit(1L))
    val bitSums = (0 until bits).map(j => sum(bitOf(j) * 2 - 1).as(s"s$j"))
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }
}
