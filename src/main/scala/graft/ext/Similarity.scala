package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline; the IVF variant
  * is the 100 TB scale path: vectors are bucketed by nearest centroid, a
  * query probes only its centroid's bucket, so the scored candidate set
  * shrinks by ~#centroids and the buckets shuffle-partition evenly.
  *
  * Determinism: embeddings are quantized to integer thousandths before
  * scoring, so dot products are exact integer sums (order-independent)
  * and the resulting cosine is the same IEEE double in any engine — the
  * DuckDB oracle reproduces scores bit-for-bit. Ranking ties break on
  * vec_id.
  */
object Similarity {

  /** float vector -> exact integer-thousandths vector. */
  def quantize(e: Column): Column = transform(e, x => round(x * 1000).cast("long"))

  /** Exact integer dot product — graft.functions.LongDot, a codegen'd
    * Catalyst expression (the HOF formulation `aggregate(zip_with(...))`
    * is interpreted and dominates all-pairs join runtime). */
  def dotL(a: Column, b: Column): Column = call_function("long_dot", a, b)

  /** embeddings + q (quantized) + norm columns. Input widened first: the
    * quantize/norm/signature chain is CPU-bound fan-out work, and a
    * narrow source (one parquet row-group at fixture scale) would pin it
    * all on one task; at cluster scale the widen is a no-op. */
  def prepared(embeddings: DataFrame): DataFrame = {
    graft.functions.LongDot.register(embeddings.sparkSession)
    graft.util.Scale.widen(embeddings)
      .withColumn("q", quantize(col("embedding")))
      .withColumn("norm", sqrt(dotL(col("q"), col("q")).cast("double")))
  }

  private def cosine(qa: Column, na: Column, qb: Column, nb: Column): Column =
    dotL(qa, qb).cast("double") / (na * nb)

  /** All near-duplicate pairs with cosine >= tau via brute-force
    * self-join — a CARTESIAN plan, kept ONLY as the fixture-scale oracle
    * baseline that [[cosineDupPairs]] (the LSH-prefiltered scale path)
    * is verified against. Do not call this at scale.
    */
  def cosineDupPairsExact(embeddings: DataFrame, tau: Double): DataFrame = {
    val e = prepared(embeddings)
    val a = e.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("norm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("qa"), col("na"), col("qb"), col("nb")))
      .where(col("cos") >= tau)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** SemDeDup-shape near-dup pairs: k-means partitions the embedding
    * space first, and cosine comparison runs ONLY within a cluster —
    * the published semantic-dedup recipe, and the third candidate-
    * pruning geometry beside sign-bit LSH ([[cosineDupPairs]]) and the
    * IVF probe: candidate volume is Σ_c n_c² (cluster-bucketed), never
    * n². Recall differs from LSH by construction — a true pair split
    * across a centroid boundary is missed, the documented SemDeDup
    * trade — so this is a POLICY variant, not a drop-in replacement;
    * the q137 oracle replays training + assignment + within-cluster
    * pairs exactly, so what the policy emits is still hash-verified.
    *
    * Scale shape: assignment is the q49 trainer (broadcast centroids,
    * map-side argmin); the pair source is one equi-join on the cluster
    * id with the quantized cosine evaluated in the join's codegen
    * stage. At production k (thousands of centroids over billions of
    * vectors) cluster buckets are the candidate economics that make
    * embedding dedup feasible at all.
    *
    * CONTRACT — k must scale with the corpus. At fixed k the candidate
    * volume Σ n_c² grows as n²/k (a 10× scale probe on a uniform
    * corpus measured exactly this: clusters bloat, CC merges nearly
    * everything — PLANS.md "Round-8 third-wave additions"). The
    * production setting is k ∝ n at constant expected cluster size
    * (SemDeDup's regime), keeping Σ n_c² ≈ n·c̄; the fixture's k=8 is
    * a small-scale convenience, not a recommendation.
    */
  def semanticDupPairs(embeddings: DataFrame, tau: Double, k: Int,
                       iters: Int): DataFrame =
    semanticDupPairsFrom(embeddings,
      graft.ext.KMeans.cluster(embeddings, k, iters)
        .select(col("vec_id"), col("cluster")), tau)

  /** [[semanticDupPairs]] with the Lloyd fit session-cached per
    * `corpusKey` (KMeans.sessionCluster) — the train-once/probe-many
    * split: composite consumers (the q147 cascade, repeated q137 runs)
    * price assignment + pair geometry, not retraining. Deterministic
    * fit ⇒ identical output to the uncached form (spec-pinned). */
  def semanticDupPairsCached(embeddings: DataFrame, corpusKey: String,
                             tau: Double, k: Int, iters: Int): DataFrame =
    semanticDupPairsFrom(embeddings,
      graft.ext.KMeans.sessionCluster(embeddings, corpusKey, k, iters)
        .select(col("vec_id"), col("cluster")), tau)

  private def semanticDupPairsFrom(embeddings: DataFrame, assign: DataFrame,
                                   tau: Double): DataFrame = {
    val e = prepared(embeddings).join(assign, "vec_id")
    val a = e.select(col("cluster"), col("vec_id").as("vec_a"),
      col("q").as("qa"), col("norm").as("na"))
    val b = e.select(col("cluster"), col("vec_id").as("vec_b"),
      col("q").as("qb"), col("norm").as("nb"))
    a.join(b, Seq("cluster"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("qa"), col("na"), col("qb"), col("nb")))
      .where(col("cos") >= tau)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** Sign-bit LSH parameters for [[cosineDupPairs]]: `CosineLshBits`
    * hyperplanes per band × `CosineLshBands` bands. More bits per band →
    * smaller buckets (more pruning); more bands → higher recall.
    *
    * Tuning rule (sign-LSH collision probability per plane is
    * p = 1 − acos(cos)/π, so a pair at cosine c is a candidate with
    * probability `recall(c) = 1 − (1 − p^bits)^bands`):
    *  - tau 0.4 (this fixture's oracle gate): p ≈ 0.63 — only WIDE
    *    banding keeps recall ≈ 1, hence the 2×16 default; expect near
    *    zero pruning of random pairs (p_rand = 0.5 per plane).
    *  - tau ≥ 0.8 (production near-dup): use [[ProductionLshBits]] ×
    *    [[ProductionLshBands]] (8×8). Theory: recall ≈ 0.75 at exactly
    *    c = 0.8, ≥ 0.93 at c = 0.9, while a random pair survives with
    *    probability 1 − (1 − 2⁻⁸)⁸ ≈ 0.03 — ~30× candidate pruning.
    *    The floor is property-tested in ExtSpec ("production-tau LSH
    *    recall").
    *  - tau ≥ 0.9 at CORPUS scale: use [[CorpusLshBits]] ×
    *    [[CorpusLshBands]] (16×32, 512 planes on 8 masks). The knob the
    *    100× probe forced (round-18): candidate volume is
    *    ~ bands · n²/2^bits — any FIXED bits makes it quadratic in n
    *    (the 8×8 preset read alpha≈0.09 at 1×→10× and then 27× wall in
    *    the 10×→100× decade on LINEAR output growth, pure bucket
    *    saturation). The production rule is therefore 2^bits ≳ n/64
    *    (constant expected bucket occupancy; bits grows with log n)
    *    with bands set by the recall floor: at 16×32,
    *    recall ≈ 0.94 at c = 0.9 and ≥ 0.999 at c = 0.95, while a
    *    random pair survives ≈ 32·2⁻¹⁶ ≈ 5·10⁻⁴ — ~64× fewer
    *    candidates than 8×8 at equal n. Floor property-tested in
    *    ExtSpec ("corpus-tau LSH recall").
    *  - each preset keeps bits ≤ 63; bits × bands may exceed 64 —
    *    whole bands are chunked onto ⌈bands/(64 div bits)⌉
    *    [[SignMask64]] masks with GLOBAL plane numbering (see
    *    bandedFlat), so ≤ 64-plane presets are bit-identical to the
    *    historical single-mask form.
    */
  val CosineLshBits = 2
  val CosineLshBands = 16

  /** Production preset for tau ≥ 0.8 — see the tuning rule above. */
  val ProductionLshBits = 8
  val ProductionLshBands = 8

  /** Corpus-scale preset for tau ≥ 0.9 — see the tuning rule above. */
  val CorpusLshBits = 16
  val CorpusLshBands = 32

  /** Deterministic ±1 hyperplane components — sign from the low bit of
    * the first md5 byte of "h:plane:dim", so any engine (and any rerun)
    * derives the identical hyperplane family. Driver-side constant,
    * shipped to executors as [[graft.functions.SignMask64]]'s referenced
    * plane matrix.
    */
  private[ext] def hyperplane(plane: Int, dim: Int): Seq[Long] =
    (0 until dim).map { d =>
      val md = java.security.MessageDigest.getInstance("MD5")
      if ((md.digest(s"h:$plane:$d".getBytes("UTF-8"))(0) & 1) == 0) 1L else -1L
    }

  /** LSH candidate pairs for cosine similarity: each vector gets
    * bits×bands sign bits — ALL of them from one codegen'd
    * [[graft.functions.SignMask64]] evaluation (the per-plane
    * `long_dot(q, <literal>)` composition embedded every hyperplane in
    * the generated code; 32 planes made the projection method enormous
    * and its compilation the dominant fixed cost). Vectors sharing all
    * bits of any band are candidates; band keys are bit-slices of the
    * mask, so the shuffle key is (band, int). Pure equi-join, no
    * cartesian anywhere.
    */
  /** The banded LSH relation behind [[cosineLshCandidates]] /
    * [[cosineDupPairs]]: one row per (vector, band) carrying the listed
    * payload columns, keyed by (band, kb) and repartitioned on that key.
    *
    * Key = the band's bits masked IN PLACE (no shift needed: equality of
    * the masked value ⟺ equality of the band's bits). All bits×bands
    * sign bits come from ONE codegen'd [[graft.functions.SignMask64]]
    * evaluation (the per-plane `long_dot(q, <literal>)` composition
    * embedded every hyperplane in the generated code; 32 planes made the
    * projection method enormous and its compilation the dominant fixed
    * cost).
    *
    * The repartition pins the self-join input partitioning (same trick
    * as the Jaccard path): the join's INPUT is small so AQE would
    * coalesce it to one task, but its OUTPUT is sum-of-bucket² rows — a
    * user-numbered repartition keeps the explosive stage wide.
    */
  private def bandedFlat(e: DataFrame, dim: Int, bits: Int, bands: Int,
                         payload: Seq[String]): DataFrame = {
    // MULTI-MASK banding (round-18): one SignMask64 holds ≤ 64 planes,
    // which capped bits × bands at 64 — and a fixed plane budget is
    // exactly what the 100× probe exposed as the quadratic tail
    // (candidate volume ~ bands · n²/2^bits: with bits pinned at 8 the
    // constant is fixed while n² grows). Whole bands are chunked onto
    // ⌈bands / (64 div bits)⌉ masks; plane numbering stays GLOBAL
    // (band b reads planes [b·bits, (b+1)·bits)), so ≤ 64-plane presets
    // produce bit-identical keys to the single-mask form and the
    // DuckDB oracle generator (cosineLshOracleSql, global indexing)
    // covers every width unchanged.
    require(bits >= 1 && bits <= 63, s"1 <= bits <= 63, got $bits")
    val bandsPerMask = math.max(64 / bits, 1)
    val nMasks = (bands + bandsPerMask - 1) / bandsPerMask
    val maskCols = (0 until nMasks).map { mi =>
      val bandLo = mi * bandsPerMask
      val bandHi = math.min(bands, bandLo + bandsPerMask)
      val planes = Array.tabulate((bandHi - bandLo) * bits)(i =>
        hyperplane(bandLo * bits + i, dim).toArray)
      graft.functions.SignMask64.signMask(
        e.sparkSession, s"${bits}x${bands}x${dim}m$mi", planes)(col("q"))
        .as(s"m$mi")
    }
    val bandStructs = (0 until bands).map { b =>
      val mi = b / bandsPerMask
      val off = (b % bandsPerMask) * bits
      struct(lit(b).as("band"),
        col(s"m$mi").bitwiseAND(lit(((1L << bits) - 1) << off)).as("kb"))
    }
    val p = e.sparkSession.sessionState.conf.numShufflePartitions
    e.select((Seq(col("vec_id")) ++ payload.map(col) ++ maskCols): _*)
      .select(col("vec_id") +: payload.map(col) :+ explode(array(bandStructs: _*)).as("bs"): _*)
      .select(Seq(col("vec_id"), col("bs.band").as("band"), col("bs.kb").as("kb"))
        ++ payload.map(col): _*)
      .repartition(p, col("band"), col("kb"))
  }

  /** LSH candidate pairs for cosine similarity: vectors sharing all bits
    * of any band are candidates. Pure equi-join on (band, kb), no
    * cartesian anywhere; the two flat subtrees canonicalize identically,
    * so the signature computation runs ONCE and the second side reads a
    * ReusedExchange (shuffle_hash — a broadcast would re-execute the
    * subtree into the hashed relation).
    */
  def cosineLshCandidates(embeddings: DataFrame, dim: Int,
                          bits: Int = CosineLshBits,
                          bands: Int = CosineLshBands): DataFrame = {
    val flat = bandedFlat(prepared(embeddings), dim, bits, bands, Seq.empty)
    flat.select(col("vec_id").as("vec_a"), col("band"), col("kb"))
      .hint("shuffle_hash")
      .join(flat.select(col("vec_id").as("vec_b"), col("band"), col("kb"))
        .hint("shuffle_hash"),
        Seq("band", "kb"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct()
  }

  /** Near-duplicate pairs with cosine >= tau — the scale path: banded
    * LSH equi-join with the quantized vectors carried THROUGH the join
    * (the MLlib `approxSimilarityJoin` shape), cosine computed inline on
    * the join output, tau filter applied BEFORE the pair dedup. Every
    * emitted score is identical to [[cosineDupPairsExact]]'s (same
    * integer dot product both times a pair collides, so the final
    * distinct sees bit-identical rows) and only recall is probabilistic
    * (tunable via bits/bands).
    *
    * Why inline instead of candidates-then-rescore-joins: the tau filter
    * runs inside the band-join stage, so the only exchange after the
    * (reused) flat shuffle carries SURVIVING pairs — at any tau worth
    * the name that is orders of magnitude smaller than the candidate
    * set. The id-only variant shuffled the full candidate set three
    * times (distinct + two vector-attach joins). The cost is carrying
    * the vector payload through one bands-wide exchange — bands×|e|
    * vector bytes, the same coin MLlib pays, and a narrow stage at any
    * scale.
    */
  def cosineDupPairs(embeddings: DataFrame, tau: Double, dim: Int,
                     bits: Int = CosineLshBits,
                     bands: Int = CosineLshBands): DataFrame = {
    val flat = bandedFlat(prepared(embeddings), dim, bits, bands, Seq("q", "norm"))
    flat.select(col("vec_id").as("vec_a"), col("band"), col("kb"),
        col("q").as("qa"), col("norm").as("na"))
      .hint("shuffle_hash")
      .join(flat.select(col("vec_id").as("vec_b"), col("band"), col("kb"),
          col("q").as("qb"), col("norm").as("nb"))
        .hint("shuffle_hash"),
        Seq("band", "kb"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("qa"), col("na"), col("qb"), col("nb")))
      .where(col("cos") >= tau)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .distinct()
  }

  /** DuckDB oracle for [[cosineDupPairs]] at ANY (bits, bands) preset —
    * the banded sign-LSH replayed STRUCTURALLY: per-plane sign bits from
    * the same deterministic [[hyperplane]] family (±1 literal arrays
    * generated into the SQL), per-band keys, the band equi-join, the
    * inline cosine gate, the pair distinct. Because the oracle mirrors
    * the banding itself (not the brute-force pair set), equality holds
    * at ANY preset regardless of LSH recall — which is exactly what
    * lets the PRODUCTION 8×8 preset be driver-priced: the fixture-tau
    * brute-force oracle (q46) only works because 2×16 banding recalls
    * everything at tau 0.4. The band key here is the band's bits as a
    * small integer rather than the engine's masked-in-place long —
    * equality of either representation partitions pairs identically.
    * `vSql` overrides the vector source CTE body (must yield
    * (vec_id, embedding)) — the q195 twin injection rides it. */
  def cosineLshOracleSql(dim: Int, tau: Double, bits: Int, bands: Int,
                         vSql: String = "SELECT vec_id, embedding FROM embeddings"): String = {
    val cosExpr = "list_dot_product(a.q, b.q) / " +
      "(sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)))"
    val bandArms = (0 until bands).map { b =>
      val key = (0 until bits).map { i =>
        val plane = hyperplane(b * bits + i, dim).mkString("[", ",", "]")
        s"(CASE WHEN list_dot_product(q, $plane::DOUBLE[]) >= 0" +
          s" THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, q, $b AS band, $key AS kb FROM e"
    }.mkString("\nUNION ALL\n")
    s"""WITH v AS ($vSql),
       |e AS (SELECT vec_id,
       |  list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
       |  FROM v),
       |bnd AS ($bandArms)
       |SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, $cosExpr AS cos
       |FROM bnd a JOIN bnd b ON a.band = b.band AND a.kb = b.kb
       |  AND a.vec_id < b.vec_id
       |WHERE $cosExpr >= $tau""".stripMargin
  }

  /** Brute-force cosine top-k: queries = vec_id < nQueries (broadcast),
    * ranked per query by (cos desc, vec_id).
    */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // zero-norm vectors produce NaN cosine, and NaN sorts ABOVE every
    // real score in descending order — exclude them from both sides
    val e = prepared(embeddings).where(col("norm") > 0)
    val queries = broadcast(e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("norm").as("qn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    e.join(queries, col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qq"), col("qn"), col("q"), col("norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** ANN RECALL@k report — the measurement that justifies (or rejects)
    * an approximate index before it serves a 100 TB corpus: per query,
    * how many of the exact top-k ([[bruteForceTopK]], the ground truth)
    * the approximate result list recovered, in exact integer ppm.
    * `truth` and `got` are any two (q_id, vec_id) relations — the same
    * calibration discipline as [[Dedup.minhashCalibration]], applied to
    * the vector side. Truth drives the aggregate (a query the index
    * returned nothing for scores 0, not absent).
    *
    * Scale shape: both inputs are query-count × k rows by construction
    * (top-k-bounded), so the join and rollup are metadata-sized at any
    * corpus scale; only producing the inputs touches the corpus.
    */
  def recallReport(got: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val g = got.select(col("q_id"), col("vec_id")).distinct()
      .withColumn("_m", lit(1L))
    truth.select(col("q_id"), col("vec_id"))
      .join(g, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("_m"), lit(0L))).as("hits"))
      .select(col("q_id"), col("hits"),
        expr(s"hits * 1000000 div $k").as("recall_ppm"))
  }

  /** Int8-quantized top-k: shortlist by int8 codes, exact rerank.
    *
    * The memory-bound ANN architecture at 100 TB: each vector is coded
    * to `array<tinyint>` with a per-vector max-abs scale (code_i =
    * round(x_i / s · 127)), so the scoring scan streams 1 byte per
    * dimension — 8× less than the exact int-thousandths form — and the
    * kernel is the codegen'd [[graft.functions.ByteDot]] primitive loop.
    * Ranking proxy: dot(cq, cv) · s_v / ‖v‖ (the query-side factors are
    * rank-invariant per query). The top-`shortlist` candidates per query
    * then fetch their FULL-precision vectors (an equi-join that shuffles
    * only shortlist×queries rows, never the corpus) and exact-rerank
    * with the same integer cosine as [[bruteForceTopK]] — identical
    * scores, so the final top-k equals brute force whenever the
    * shortlist covers it (the standard SCaNN/FAISS rescoring contract;
    * q59 proves equality on the fixture against q35's oracle).
    */
  def int8TopK(embeddings: DataFrame, nQueries: Int, k: Int,
               shortlist: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.ByteDot.register(embeddings.sparkSession)
    val e = prepared(embeddings).where(col("norm") > 0)
    val coded = e
      .withColumn("_mx", array_max(transform(col("embedding"), x => abs(x))).cast("double"))
      .withColumn("code",
        transform(col("embedding"), x => round(x.cast("double") / col("_mx") * 127).cast("byte")))
    // codes-only relation — the bytes the shortlist scan actually streams
    val codes = coded.select(col("vec_id"), col("code"),
      (col("_mx") / col("norm")).as("_rescale"))
    val queries = broadcast(coded.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("code").as("q_code")))
    val wS = Window.partitionBy(col("q_id")).orderBy(col("approx").desc, col("vec_id"))
    val short = codes.join(queries, col("vec_id") =!= col("q_id"))
      .withColumn("approx",
        call_function("byte_dot", col("q_code"), col("code")).cast("double") * col("_rescale"))
      .withColumn("_srn", row_number().over(wS))
      .where(col("_srn") <= shortlist)
      .select(col("q_id"), col("vec_id"))
    // exact rerank: full-precision vectors fetched for shortlist rows only
    val full = e.select(col("vec_id"), col("q"), col("norm"))
    val qFull = broadcast(e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("norm").as("qn")))
    val wK = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    short.join(full, Seq("vec_id"))
      .join(qFull, Seq("q_id"))
      .withColumn("cos", cosine(col("qq"), col("qn"), col("q"), col("norm")))
      .withColumn("rank", row_number().over(wK).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Product-quantization top-k: PQ-coded ADC shortlist, exact rerank.
    *
    * The compressed-codebook ANN architecture (FAISS IVFPQ's PQ half):
    * the vector space splits into `m` subspaces of dim/m dimensions;
    * each subspace trains its own `kSub`-centroid codebook
    * ([[KMeans]] — deterministic Lloyd's, exact integer arithmetic),
    * and a vector's code is its per-subspace nearest-centroid ids —
    * m·log2(kSub) bits per vector (here 4 codes of 16 ⇒ 2 bytes vs 256
    * bytes of floats). Scoring is asymmetric distance computation: per
    * query, a lookup table of dot(q_sub, centroid) for every
    * (subspace, centroid) — m·kSub entries, broadcast — and a
    * candidate's approximate dot is the sum of its m table hits; no
    * per-pair vector arithmetic at all. The top-`shortlist` candidates
    * fetch full-precision vectors (shortlist×queries rows, never the
    * corpus) and exact-rerank with the same integer cosine as
    * [[bruteForceTopK]] — the SCaNN/FAISS rescoring contract: emitted
    * scores are exact, and the top-k equals brute force whenever the
    * shortlist covers it. The q100 oracle replays the FULL algorithm
    * ([[KMeans.pqOracleSql]]), so the compression arithmetic is
    * hash-verified independently of data-dependent recall.
    *
    * Scale shape: codebook training touches corpus×kSub per subspace
    * under a broadcast with map-side argmin collapse (see [[KMeans]]);
    * the ADC scan is codes ⋈ broadcast LUT — linear in corpus size with
    * map-side partial sums; everything downstream is query-sized.
    */
  def pqTopK(embeddings: DataFrame, dim: Int, nQueries: Int, k: Int,
             m: Int = 4, kSub: Int = 16, iters: Int = 1,
             shortlist: Int = 64): DataFrame = {
    val e = prepared(embeddings).where(col("norm") > 0)
    val (cents, codes) = pqEncode(e, dim, m, kSub, iters)
    pqProbe(e, cents, codes, dim, m, nQueries, k, shortlist)
  }

  /** PQ train + encode over a [[prepared]] norm-filtered relation.
    * All subspace codebooks train in ONE Lloyd pass per round: the
    * (vec_id, m, subvector) relation keys every aggregate by m, so
    * adding subspaces adds rows, not training runs (slice∘quantize ==
    * quantize∘slice, so these subvectors are exactly what independent
    * per-subspace training would see).
    * @return (cents (m, c_id, cvec, cc), codes (vec_id, m, cluster)) */
  private def pqEncode(e: DataFrame, dim: Int, m: Int, kSub: Int,
                       iters: Int): (DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val subDim = dim / m
    val subVecs = (0 until m).map(i =>
      e.select(col("vec_id"), lit(i).as("m"),
        slice(col("q"), i * subDim + 1, subDim).as("q")))
      .reduce(_ unionByName _)
    KMeans.fitClusterMulti(subVecs, kSub, iters)
  }

  /** PQ ADC scoring + exact rerank against trained/loaded codebooks and
    * codes — shared by the in-memory path ([[pqTopK]]) and the
    * persisted-index path ([[pqTopKFromIndex]]), so the two cannot
    * drift. `e` provides queries AND the full-precision rerank side. */
  private def pqProbe(e: DataFrame, cents: DataFrame, codes: DataFrame,
                      dim: Int, m: Int, nQueries: Int, k: Int,
                      shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val subDim = dim / m
    val qsubs = (0 until m).map(i =>
      e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), lit(i).as("m"),
          slice(col("q"), i * subDim + 1, subDim).as("qv")))
      .reduce(_ unionByName _)
    // ADC lookup table: every (query, subspace, centroid) dot — exact
    // integers, m·kSub·nQueries rows, broadcast
    val lut = broadcast(qsubs.join(cents, Seq("m"))
      .select(col("q_id"), col("m"), col("c_id"),
        dotL(col("qv"), col("cvec")).as("d")))
    val wS = Window.partitionBy(col("q_id")).orderBy(col("approx").desc, col("vec_id"))
    val short = codes
      .join(lut, codes("m") === lut("m") && codes("cluster") === lut("c_id"))
      .where(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d")).as("approx"))
      .withColumn("_srn", row_number().over(wS))
      .where(col("_srn") <= shortlist)
      .select(col("q_id"), col("vec_id"))
    // exact rerank: full-precision vectors fetched for shortlist rows only
    val full = e.select(col("vec_id"), col("q"), col("norm"))
    val qFull = broadcast(e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("norm").as("qn")))
    val wK = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    short.join(full, Seq("vec_id"))
      .join(qFull, Seq("q_id"))
      .withColumn("cos", cosine(col("qq"), col("qn"), col("q"), col("norm")))
      .withColumn("rank", row_number().over(wK).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** IVFPQ top-k — the full FAISS-style composition of the two verified
    * halves: IVF coarse bucketing ([[ivfTopK]] / q36/q50) and PQ codes +
    * ADC ([[pqTopK]] / q100). This is the architecture a 100 TB vector
    * corpus actually deploys: the inverted file bounds WHICH vectors are
    * scored (only `nprobe` buckets per query), the product quantizer
    * bounds WHAT is read per scored vector (m·log2(kSub) bits of code,
    * no float vectors), and the exact rerank restores true scores on the
    * shortlist.
    *
    * Steps, all exact integer arithmetic (the q101 oracle replays every
    * one, so the composition is hash-verified end-to-end):
    *  1. coarse codebook: [[KMeans.fitCluster]] over the norm-filtered
    *     corpus — `nCoarse` centroids by exact integer squared-Euclidean
    *     Lloyd's (the FAISS coarse-assignment metric), yielding one
    *     bucket id per vector;
    *  2. residual encode: r = q − centroid(bucket), elementwise long
    *     subtraction (`zip_with` — codegen'd). PQ on RESIDUALS is the
    *     defining IVFPQ trick: residuals concentrate near 0, so the same
    *     kSub centroids quantize them far better than raw vectors;
    *  3. PQ codebooks: [[KMeans.fitClusterMulti]] on the m residual
    *     subspaces — ONE Lloyd pass trains all m codebooks;
    *  4. query probes: each query ranks coarse centroids by the SAME
    *     integer squared-Euclidean metric (tie: centroid id) and probes
    *     its `nprobe` nearest buckets; the per-(query, bucket) constant
    *     dot(q, centroid) rides along;
    *  5. ADC: dot(q, v) ≈ dot(q, c_b) + Σ_m LUT[m, code_v[m]] where
    *     LUT[m, c] = dot(q_sub_m, pqCentroid(m, c)) — the LUT is
    *     m·kSub·nQueries rows, broadcast; candidates come from the
    *     bucket equi-join (probed buckets only — the IVF win), their
    *     codes from a vec_id equi-join, so the scored row count is
    *     candidates×m and no vector arithmetic happens per pair;
    *  6. exact rerank of the top-`shortlist` per query, identical to
    *     [[bruteForceTopK]]'s cosine — emitted scores are exact.
    *
    * Scale shape: training is broadcast-argmin (see [[KMeans]]); the
    * encode step materializes the coded corpus once (the FAISS "add"
    * phase — at production this relation IS the persisted index);
    * probing and scoring are equi-joins with map-side partial sums; the
    * only data-sized exchanges carry one row per vector (assignment) and
    * candidates×m rows (ADC), both bounded by nprobe/kSub knobs.
    */
  def ivfpqTopK(embeddings: DataFrame, dim: Int, nCoarse: Int, nQueries: Int,
                k: Int, m: Int = 4, kSub: Int = 16, iters: Int = 1,
                nprobe: Int = 2, shortlist: Int = 64): DataFrame = {
    val e = prepared(embeddings).where(col("norm") > 0)
    val (coarseCents, pqCents, codes) = ivfpqEncode(e, dim, nCoarse, m, kSub, iters)
    ivfpqProbe(e, coarseCents, pqCents, codes, dim, m, nQueries, k, nprobe, shortlist)
  }

  /** IVFPQ steps 1–3 (train + encode) over a [[prepared]] norm-filtered
    * relation: coarse codebook, residual PQ codebooks, and the coded
    * corpus — `codes` = (vec_id, bucket, m, cluster), the per-subspace
    * long form of "2 bytes per vector + its inverted-file bucket".
    * @return (coarseCents (c_id, cvec, cc), pqCents (m, c_id, cvec, cc),
    *         codes) */
  private def ivfpqEncode(e: DataFrame, dim: Int, nCoarse: Int,
                          m: Int, kSub: Int, iters: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val subDim = dim / m
    // 1. coarse codebook + one bucket id per vector (integer-L2 argmin)
    val (coarseCents, coarseCodes) = KMeans.fitCluster(e, nCoarse, iters)
    // 2. residual encode — materialized once: every downstream consumer
    //    (m subspace slices, the code relation) reads it, and at
    //    production it feeds the persisted index artifact
    val encoded = e.select(col("vec_id"), col("q"))
      .join(coarseCodes, "vec_id")
      .join(broadcast(coarseCents.select(col("c_id").as("cluster"), col("cvec"))),
        "cluster")
      .select(col("vec_id"), col("cluster").as("bucket"),
        zip_with(col("q"), col("cvec"), (x, y) => x - y).as("r"))
      .localCheckpoint(true)
    // 3. PQ codebooks over residual subspaces — one Lloyd pass trains all m
    val subVecs = (0 until m).map(i =>
      encoded.select(col("vec_id"), lit(i).as("m"),
        slice(col("r"), i * subDim + 1, subDim).as("q")))
      .reduce(_ unionByName _)
    val (pqCents, pqCodes) = KMeans.fitClusterMulti(subVecs, kSub, iters)
    val codes = pqCodes.join(encoded.select(col("vec_id"), col("bucket")), "vec_id")
    (coarseCents, pqCents, codes)
  }

  /** IVFPQ steps 4–6 (probe + ADC + rerank) against trained/loaded index
    * relations — shared by the in-memory path ([[ivfpqTopK]]) and the
    * persisted-index path ([[ivfpqTopKFromIndex]]), so the two cannot
    * drift. `e` provides queries AND the full-precision rerank vectors
    * (the index stores only codes — the FAISS convention; refine reads
    * the corpus). */
  private def ivfpqProbe(e: DataFrame, coarseCents: DataFrame,
                         pqCents: DataFrame, codes: DataFrame,
                         dim: Int, m: Int, nQueries: Int, k: Int,
                         nprobe: Int, shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val subDim = dim / m
    // 4. probe lists: nprobe nearest coarse centroids per query, same
    //    integer-L2 order as assignment; dot(q, centroid) rides along
    val qv = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
        dotL(col("q"), col("q")).as("qxx"))
    val wP = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("c_id"))
    val probes = broadcast(qv.crossJoin(broadcast(coarseCents))
      .withColumn("dist",
        col("qxx") + col("cc") - dotL(col("qq"), col("cvec")) * 2)
      .withColumn("prn", row_number().over(wP))
      .where(col("prn") <= nprobe)
      .select(col("q_id"), col("c_id").as("bucket"),
        dotL(col("qq"), col("cvec")).as("qc")))
    // 5. ADC: broadcast LUT of per-subspace residual dots, candidates
    //    from the probed-bucket equi-join, approx = qc + Σ_m LUT hits
    val qsubs = (0 until m).map(i =>
      qv.select(col("q_id"), lit(i).as("m"),
        slice(col("qq"), i * subDim + 1, subDim).as("qs")))
      .reduce(_ unionByName _)
    val lut = broadcast(qsubs.join(pqCents, Seq("m"))
      .select(col("q_id").as("l_qid"), col("m").as("l_m"),
        col("c_id").as("l_cid"), dotL(col("qs"), col("cvec")).as("d")))
    val wS = Window.partitionBy(col("q_id")).orderBy(col("approx").desc, col("vec_id"))
    val short = codes
      .join(probes, Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .join(lut, col("q_id") === col("l_qid") && col("m") === col("l_m")
        && col("cluster") === col("l_cid"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(first(col("qc")).as("qc"), sum(col("d")).as("rd"))
      .withColumn("approx", col("qc") + col("rd"))
      .withColumn("_srn", row_number().over(wS))
      .where(col("_srn") <= shortlist)
      .select(col("q_id"), col("vec_id"))
    // 6. exact rerank: full-precision vectors fetched for shortlist rows only
    val full = e.select(col("vec_id"), col("q"), col("norm"))
    val qFull = broadcast(e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"), col("norm").as("qn")))
    val wK = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    short.join(full, Seq("vec_id"))
      .join(qFull, Seq("q_id"))
      .withColumn("cos", cosine(col("qq"), col("qn"), col("q"), col("norm")))
      .withColumn("rank", row_number().over(wK).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Train an IVFPQ index ONCE and persist its artifacts — the
    * production deploy shape (FAISS train/add vs search): codebooks are
    * kilobytes of parquet, and the coded corpus (2 bytes of PQ code per
    * vector + its bucket) is written PARTITIONED BY BUCKET, so a probe
    * reads only nprobe/nCoarse of the index via parquet partition
    * pruning — the I/O analog of the inverted file. Layout:
    * `path/coarse`, `path/pq`, `path/codes/bucket=N/`. */
  def buildIvfpqIndex(embeddings: DataFrame, dim: Int, nCoarse: Int,
                      m: Int = 4, kSub: Int = 16, iters: Int = 1,
                      path: String = null): Unit = {
    require(path != null, "buildIvfpqIndex needs a target path")
    val e = prepared(embeddings).where(col("norm") > 0)
    val (coarseCents, pqCents, codes) = ivfpqEncode(e, dim, nCoarse, m, kSub, iters)
    coarseCents.write.mode("overwrite").parquet(s"$path/coarse")
    pqCents.write.mode("overwrite").parquet(s"$path/pq")
    codes.write.mode("overwrite").partitionBy("bucket").parquet(s"$path/codes")
    writeIndexMeta(e.sparkSession, path, dim, m)
  }

  // ── index artifact meta: (dim, m) drift guard ─────────────────────────
  // The substring store's _meta.json discipline for ANN artifacts: an
  // add or probe run with a different dim or m than the index was built
  // with silently mis-codes (kSub is derived as pqCents.count()/m, the
  // subspace slices shift, and ADC sums become garbage with no error
  // anywhere). Builders persist (dim, m) beside the artifact; adds and
  // probes REQUIRE a match when the sidecar exists. Artifacts built
  // before the sidecar landed have none — callers are then trusted,
  // the old contract. Temp-file + rename so the visible file is absent
  // or complete (single-writer build contract).
  private def writeIndexMeta(spark: SparkSession, path: String,
                             dim: Int, m: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_meta.json")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path/._meta.json.${java.util.UUID.randomUUID}.tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(s"""{"dim":$dim,"m":$m}""".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) fs.delete(tmp, false): Unit
  }

  private def checkIndexMeta(spark: SparkSession, path: String,
                             dim: Int, m: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val re = """"dim"\s*:\s*(\d+).*"m"\s*:\s*(\d+)""".r
      re.findFirstMatchIn(txt).foreach { mm =>
        val (sd, sm) = (mm.group(1).toInt, mm.group(2).toInt)
        require(sd == dim && sm == m,
          s"index $path was built with (dim=$sd, m=$sm); " +
            s"refusing to use it with (dim=$dim, m=$m)")
      }
    }
  }

  /** Incrementally ADD vectors to a [[buildIvfpqIndex]] artifact — the
    * streaming-ingest path (FAISS `add` on a trained index): the
    * persisted codebooks are FROZEN (kilobytes, broadcast), each new
    * vector coarse-assigns, residual-encodes, and PQ-assigns against
    * them ([[KMeans.assignTo]]/[[assignToMulti]] — the same
    * exact-integer argmin the trainer used), and the new codes APPEND
    * to the bucket-partitioned codes relation (each micro-batch touches
    * only the partitions its vectors land in). No retraining, no
    * rewrite of existing codes; callers own vec_id uniqueness across
    * batches, and codebook drift (when the corpus distribution moves)
    * is handled by rebuilding the index — the standard operational
    * contract. Composable into `foreachBatch` for continuous embedding
    * ingest. */
  def ivfpqIndexAdd(path: String, newVectors: DataFrame, dim: Int,
                    m: Int = 4): Unit = {
    val spark = newVectors.sparkSession
    // recovery-before-append (the substringIndexBatch discipline): an
    // append arriving inside a hard-crashed compaction's swap window
    // would otherwise CREATE a batch-only codes dir, and the retried
    // compaction's residue cleanup would then delete the staged full
    // copy — every settled code silently lost
    graft.ingest.Sinks.recoverCompact(spark, s"$path/codes")
    checkIndexMeta(spark, path, dim, m)
    val coarseCents = spark.read.parquet(s"$path/coarse")
    // codebook size from the artifact itself (k rows; driver-side
    // count of a kilobyte relation)
    val nCoarse = coarseCents.count().toInt
    val e = prepared(newVectors).where(col("norm") > 0)
    val buckets = KMeans.assignTo(e.select(col("vec_id"), col("q")),
      coarseCents, nCoarse)
      .withColumnRenamed("cluster", "bucket")
    ivfpqEncodeAssigned(path, e, buckets, coarseCents, dim, m)
      .write.mode("append").partitionBy("bucket").parquet(s"$path/codes")
  }

  /** The encode half of the add path — residual against the assigned
    * coarse centroid, per-subspace PQ assignment — factored so
    * [[ivfpqIndexAdd]] and the replay-guarded [[ivfpqIndexAddBatch]]
    * share ONE assignment pass instead of computing it twice per
    * micro-batch. Returns the (vec_id, m, cluster, bucket) code rows;
    * callers own the append (the guarded path filters already-landed
    * subspace rows of torn vectors before writing). */
  private def ivfpqEncodeAssigned(path: String, e: DataFrame, buckets: DataFrame,
                                  coarseCents: DataFrame, dim: Int,
                                  m: Int): DataFrame = {
    val spark = e.sparkSession
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val subDim = dim / m
    val pqCents = spark.read.parquet(s"$path/pq")
    val kSub = (pqCents.count() / m).toInt
    val encoded = e.select(col("vec_id"), col("q"))
      .join(buckets, "vec_id")
      .join(broadcast(coarseCents.select(col("c_id").as("bucket"), col("cvec"))),
        "bucket")
      .select(col("vec_id"), col("bucket"),
        zip_with(col("q"), col("cvec"), (x, y) => x - y).as("r"))
    val subVecs = (0 until m).map(i =>
      encoded.select(col("vec_id"), lit(i).as("m"),
        slice(col("r"), i * subDim + 1, subDim).as("q")))
      .reduce(_ unionByName _)
    KMeans.assignToMulti(subVecs, pqCents, kSub)
      .join(encoded.select(col("vec_id"), col("bucket")), "vec_id")
  }

  /** EXACTLY-ONCE form of [[ivfpqIndexAdd]] for at-least-once
    * delivery (round-13): the bare add appends unconditionally
    * ("callers own vec_id uniqueness"), which a replayed micro-batch
    * violates — duplicate code rows double the ADC residual sums and
    * corrupt every later ranking. This form dedups WITHIN the batch,
    * coarse-assigns ONCE (batch × broadcast codebook — the frozen
    * codebooks make assignment replay-independent), reads the vec_ids
    * already coded in ONLY the buckets the batch lands in (the probe
    * path's partition-pruned, column-pruned scan), and encodes the
    * unsettled remainder off the same assignment: a replayed batch
    * finds itself settled and appends nothing.
    *
    * Settled means a COMPLETE code set (round-15): every vector owns m
    * code rows, and a torn append — a crash that leaves a strict
    * subset of them visible — must not read as settled, or the vector
    * stays permanently half-coded and ADC sums over fewer than m
    * subspaces silently skew rankings. The guard therefore counts
    * distinct subspaces per vec_id; a torn vector re-encodes on replay
    * (frozen codebooks make the codes bit-identical) and only its
    * MISSING (vec_id, m) rows append, so the store keeps exactly one
    * row per (vector, subspace) with no read-side dedup needed. The
    * repair anti-join runs only when a torn vector is actually present
    * — the common path appends exactly as before. Returns the number
    * of vectors encoded (new + repaired). */
  def ivfpqIndexAddBatch(path: String, batch: DataFrame, dim: Int,
                         m: Int = 4): Long = {
    val spark = batch.sparkSession
    // recovery-before-read/append — see ivfpqIndexAdd
    graft.ingest.Sinks.recoverCompact(spark, s"$path/codes")
    checkIndexMeta(spark, path, dim, m)
    val e = prepared(batch.dropDuplicates("vec_id")).where(col("norm") > 0)
      .select(col("vec_id"), col("q")).localCheckpoint(true)
    if (e.isEmpty) return 0L
    val coarseCents = spark.read.parquet(s"$path/coarse")
    val nCoarse = coarseCents.count().toInt
    val assigned = KMeans.assignTo(e, coarseCents, nCoarse)
      .withColumnRenamed("cluster", "bucket")
      .localCheckpoint(true) // feeds the probe AND the encode
    // driver-side bucket-id collect: ≤ min(|batch|, nCoarse) rows —
    // metadata-sized, the ivfpqTopKFromIndex probe-list discipline
    val hit = assigned.select(col("bucket")).distinct()
      .collect().map(_.getLong(0))
    val codesProbed = spark.read.parquet(s"$path/codes")
      .where(col("bucket").isin(hit.toIndexedSeq: _*))
    // per-vector subspace counts, batch-sized (semi-join first so the
    // checkpoint materializes ≤|batch| rows); feeds the settled
    // anti-join AND the torn count
    val present = codesProbed
      .join(e.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .groupBy(col("vec_id")).agg(countDistinct(col("m")).as("nc"))
      .localCheckpoint(true)
    val needIds = e.select(col("vec_id"))
      .join(present.where(col("nc") >= m).select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      .localCheckpoint(true) // counted AND re-joined below
    val n = needIds.count()
    if (n > 0) {
      val rows = ivfpqEncodeAssigned(path,
        e.join(needIds, Seq("vec_id"), "left_semi"),
        assigned.join(needIds, Seq("vec_id"), "left_semi"),
        coarseCents, dim, m)
      val torn = present.where(col("nc") < m).count()
      val out =
        if (torn == 0) rows
        else rows.join(codesProbed.select(col("vec_id"), col("m")),
          Seq("vec_id", "m"), "left_anti")
      out.write.mode("append").partitionBy("bucket").parquet(s"$path/codes")
    }
    n
  }

  /** Probe a [[buildIvfpqIndex]] artifact: identical results to
    * [[ivfpqTopK]] at the same parameters (training is deterministic and
    * the probe logic is the SAME code), but the corpus-sized work reads
    * the persisted codes with the probed buckets pushed down as
    * PARTITION FILTERS — the driver-side probe-list collect is
    * nQueries×nprobe rows (metadata-sized, same discipline as
    * StreamIngest's date collect). `embeddings` supplies queries and the
    * full-precision rerank side. */
  def ivfpqTopKFromIndex(path: String, embeddings: DataFrame, dim: Int,
                         nQueries: Int, k: Int, m: Int = 4,
                         nprobe: Int = 2, shortlist: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    // a reader arriving inside a hard-crashed compaction's swap window
    // must restore the staged codes, not observe them absent
    graft.ingest.Sinks.recoverCompact(spark, s"$path/codes")
    checkIndexMeta(spark, path, dim, m)
    val e = prepared(embeddings).where(col("norm") > 0)
    val coarseCents = spark.read.parquet(s"$path/coarse")
    val pqCents = spark.read.parquet(s"$path/pq")
    // probed buckets as LITERALS so the codes scan partition-prunes;
    // recomputing the tiny probe ranking here costs one broadcast of a
    // k-row centroid table
    val qv = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
        dotL(col("q"), col("q")).as("qxx"))
    val wP = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("dist"), col("c_id"))
    val probedBuckets = qv.crossJoin(broadcast(coarseCents))
      .withColumn("dist",
        col("qxx") + col("cc") - dotL(col("qq"), col("cvec")) * 2)
      .withColumn("prn", row_number().over(wP))
      .where(col("prn") <= nprobe)
      .select(col("c_id")).distinct()
      .collect().map(_.getLong(0))
    val codes = spark.read.parquet(s"$path/codes")
      .where(col("bucket").isin(probedBuckets.toIndexedSeq: _*))
    ivfpqProbe(e, coarseCents, pqCents, codes, dim, m, nQueries, k, nprobe, shortlist)
  }

  /** Train a plain-PQ index ONCE and persist its artifacts (codebooks +
    * coded corpus) — [[buildIvfpqIndex]]'s flat sibling for corpora
    * scanned whole per query (no inverted file, so no partition
    * pruning; the win is the 2-bytes-per-vector scan). Layout:
    * `path/pq`, `path/codes`. */
  def buildPqIndex(embeddings: DataFrame, dim: Int, m: Int = 4,
                   kSub: Int = 16, iters: Int = 1,
                   path: String = null): Unit = {
    require(path != null, "buildPqIndex needs a target path")
    val e = prepared(embeddings).where(col("norm") > 0)
    val (cents, codes) = pqEncode(e, dim, m, kSub, iters)
    cents.write.mode("overwrite").parquet(s"$path/pq")
    codes.write.mode("overwrite").parquet(s"$path/codes")
    writeIndexMeta(e.sparkSession, path, dim, m)
  }

  /** EXACTLY-ONCE incremental add for a [[buildPqIndex]] artifact —
    * the flat sibling of [[ivfpqIndexAddBatch]] (round-13): new vectors
    * PQ-code against the FROZEN per-subspace codebooks and append to
    * the codes relation; the replay guard scans the codes relation (the
    * flat index has no bucket partitioning to prune by, so the probe is
    * one column-pruned scan of the 2-bytes-per-vector codes — the same
    * read class every flat-PQ query already pays). Dedups within the
    * batch too. Settled means a COMPLETE code set (round-15, see
    * [[ivfpqIndexAddBatch]]): a torn append re-encodes on replay and
    * appends only its missing (vec_id, m) rows, so the store keeps
    * exactly one row per (vector, subspace). Returns the number of
    * vectors encoded (new + repaired). */
  def pqIndexAddBatch(path: String, batch: DataFrame, dim: Int,
                      m: Int = 4): Long = {
    val spark = batch.sparkSession
    // recovery-before-read/append — see ivfpqIndexAdd
    graft.ingest.Sinks.recoverCompact(spark, s"$path/codes")
    checkIndexMeta(spark, path, dim, m)
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val subDim = dim / m
    val e = prepared(batch.dropDuplicates("vec_id")).where(col("norm") > 0)
      .select(col("vec_id"), col("q")).localCheckpoint(true)
    if (e.isEmpty) return 0L
    val codesAll = spark.read.parquet(s"$path/codes")
    // per-vector subspace counts, batch-sized; feeds the settled
    // anti-join AND the torn count (see ivfpqIndexAddBatch)
    val present = codesAll
      .join(e.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .groupBy(col("vec_id")).agg(countDistinct(col("m")).as("nc"))
      .localCheckpoint(true)
    val needIds = e.select(col("vec_id"))
      .join(present.where(col("nc") >= m).select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      .localCheckpoint(true) // counted AND re-joined below
    val n = needIds.count()
    if (n > 0) {
      val pqCents = spark.read.parquet(s"$path/pq")
      val kSub = (pqCents.count() / m).toInt
      val f = e.join(needIds, Seq("vec_id"), "left_semi")
      val subVecs = (0 until m).map(i =>
        f.select(col("vec_id"), lit(i).as("m"),
          slice(col("q"), i * subDim + 1, subDim).as("q")))
        .reduce(_ unionByName _)
      val rows = KMeans.assignToMulti(subVecs, pqCents, kSub)
      val torn = present.where(col("nc") < m).count()
      val out =
        if (torn == 0) rows
        else rows.join(codesAll.select(col("vec_id"), col("m")),
          Seq("vec_id", "m"), "left_anti")
      out.write.mode("append").parquet(s"$path/codes")
    }
    n
  }

  /** Probe a [[buildPqIndex]] artifact: identical results to [[pqTopK]]
    * at the same parameters (training is deterministic, probe logic is
    * the same code), with training amortized away — the latency a
    * deployed ANN service actually serves. */
  def pqTopKFromIndex(path: String, embeddings: DataFrame, dim: Int,
                      nQueries: Int, k: Int, m: Int = 4,
                      shortlist: Int = 64): DataFrame = {
    val spark = embeddings.sparkSession
    // reader-side swap-window recovery — see ivfpqTopKFromIndex
    graft.ingest.Sinks.recoverCompact(spark, s"$path/codes")
    checkIndexMeta(spark, path, dim, m)
    val e = prepared(embeddings).where(col("norm") > 0)
    pqProbe(e, spark.read.parquet(s"$path/pq"),
      spark.read.parquet(s"$path/codes"), dim, m, nQueries, k, shortlist)
  }

  /** Bound a maintained index's codes file count: an append-per-batch
    * store gains one file set per batch (per touched bucket for the
    * IVFPQ layout) FOREVER — at production batch cadence the listing
    * itself becomes the probe bottleneck. Rows-preserved rewrite at
    * `filesTarget` write tasks through the crash-safe
    * [[graft.ingest.Sinks.compact]] swap (bucket partitioning — and
    * with it the probe's partition pruning — is preserved for the
    * IVFPQ layout). Single writer by construction when driven from
    * [[graft.streaming.StreamIngest.maintainAnnIndex]]'s sequential
    * foreachBatch; the replay guards are unaffected (settled vec_ids
    * are preserved exactly), and every reader/appender in this file
    * recovers a hard-crashed swap before touching the store. */
  def compactCodes(spark: SparkSession, path: String, filesTarget: Int = 8,
                   bucketed: Boolean = true): Unit =
    graft.ingest.Sinks.compact(spark, s"$path/codes", filesTarget,
      partitionCols = if (bucketed) Seq("bucket") else Nil): Unit

  // ── session-scoped index artifacts ───────────────────────────────────
  // Index training is an amortized OFFLINE job in production — a probe
  // query should pay probe cost, not retraining. These helpers train an
  // index at most once per JVM session per (corpus, params) and hand
  // back the artifact path; everything lands under one scratch root
  // that a shutdown hook reaps, so repeated driver/bench runs leave no
  // orphaned artifacts in /tmp.
  private lazy val indexScratchRoot: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_idx")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(p.toFile)
    }
    p.toString
  }
  private val indexSeq = new java.util.concurrent.atomic.AtomicLong(0)
  private val sessionIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A fresh scratch dir under the shutdown-reaped session root — for
    * callers that deliberately rebuild per invocation (q105 measures
    * the train+persist path itself). */
  def scratchIndexDir(prefix: String): String =
    s"$indexScratchRoot/$prefix-${indexSeq.incrementAndGet()}"

  /** [[buildPqIndex]] memoized per (corpus key, params) for this JVM
    * session; returns the artifact path. */
  def sessionPqIndex(embeddings: DataFrame, corpusKey: String, dim: Int,
                     m: Int = 4, kSub: Int = 16, iters: Int = 1): String =
    sessionIndexes.computeIfAbsent(s"pq|$corpusKey|$dim|$m|$kSub|$iters", _ => {
      val p = scratchIndexDir("pq")
      buildPqIndex(embeddings, dim, m, kSub, iters, p)
      p
    })

  /** [[buildIvfpqIndex]] memoized per (corpus key, params) for this JVM
    * session; returns the artifact path. */
  def sessionIvfpqIndex(embeddings: DataFrame, corpusKey: String, dim: Int,
                        nCoarse: Int, m: Int = 4, kSub: Int = 16,
                        iters: Int = 1): String =
    sessionIndexes.computeIfAbsent(
      s"ivfpq|$corpusKey|$dim|$nCoarse|$m|$kSub|$iters", _ => {
        val p = scratchIndexDir("ivfpq")
        buildIvfpqIndex(embeddings, dim, nCoarse, m, kSub, iters, p)
        p
      })

  /** IVF-style top-k. Centroids = the first nCentroids vectors — a
    * deterministic stand-in for a k-means codebook (the fixture has no
    * training step; swapping in k-means centroids changes only the
    * `cents` relation, every downstream shape is identical). Every
    * vector is assigned to its nearest centroid (argmax cosine, ties on
    * centroid id); a query probes its `nprobe` nearest centroid buckets.
    *
    * Scale shape: the vector×centroid scoring happens under a BROADCAST
    * join and collapses map-side via a partial `max_by` aggregate — the
    * n×c scored rows never shuffle (the old formulation window-ranked
    * them through an n×c exchange); the exchange carries one row per
    * vector. Probing is an equi-join on the bucket id.
    */
  def ivfTopK(embeddings: DataFrame, nCentroids: Int, nQueries: Int, k: Int,
              nprobe: Int = 1, trainIters: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // see bruteForceTopK: zero-norm vectors would rank first with NaN
    val e = prepared(embeddings).where(col("norm") > 0)
    // codebook: first-n stand-in, or a real Lloyd's codebook when
    // trainIters > 0 (KMeans.fit) — every downstream shape is identical
    val centsBase =
      if (trainIters > 0)
        KMeans.fit(embeddings, nCentroids, trainIters)
          .where(col("cc") > 0)
          .select(col("c_id"), col("cvec").as("cq"),
            sqrt(col("cc").cast("double")).as("cn"))
      else e.where(col("vec_id") < nCentroids)
        .select(col("vec_id").as("c_id"), col("q").as("cq"), col("norm").as("cn"))
    val cents = broadcast(centsBase)
    val scored = e.join(cents)
      .withColumn("ccos", cosine(col("cq"), col("cn"), col("q"), col("norm")))
    // argmax(ccos desc, c_id asc) as a partial-aggregable max_by: the
    // key struct orders by score, then by NEGATED centroid id so the
    // smallest id wins ties — same total order the oracle's
    // row_number(ORDER BY ccos DESC, c_id) uses
    val assigned = scored
      .groupBy(col("vec_id"))
      .agg(first(col("q")).as("q"), first(col("norm")).as("norm"),
        max_by(col("c_id"), struct(col("ccos"), (-col("c_id")).as("nc"))).as("cluster"))
    // query probe lists are tiny (nQueries × nCentroids) — window-rank
    // AFTER filtering to query vectors, then broadcast
    val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_id"))
    val probes = broadcast(scored.where(col("vec_id") < nQueries)
      .withColumn("prn", row_number().over(wProbe))
      .where(col("prn") <= nprobe)
      .select(col("vec_id").as("q_id"), col("q").as("qq"),
        col("norm").as("qn"), col("c_id").as("cluster")))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(probes,
        Seq("cluster"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qq"), col("qn"), col("q"), col("norm")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Element-wise mean pooling of embeddings per group (centroid
    * features, label prototypes, chunk→document pooling). Emitted in
    * EXPLODED scalar form — (group, pos, n_vecs, sum_q, mean_q) — so the
    * aggregation is a plain (group, pos) hash aggregate with map-side
    * partial sums: no array-typed aggregation state, no
    * order-of-summation nondeterminism (quantized longs sum exactly;
    * the mean is one final division). Rebuilding an array column is one
    * sort_array(collect_list) per group downstream if needed.
    */
  def meanPool(embeddings: DataFrame, groupCol: String): DataFrame =
    graft.util.Scale.widen(embeddings)
      .select(col(groupCol), posexplode(quantize(col("embedding"))))
      .groupBy(col(groupCol), col("pos"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("col")).as("sum_q"))
      .select(col(groupCol), col("pos").cast("long").as("pos"),
        col("n_vecs"), col("sum_q"),
        (col("sum_q").cast("double") / col("n_vecs")).as("mean_q"))
}
