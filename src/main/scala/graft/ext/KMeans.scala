package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed Lloyd's k-means over an embedding column —
  * the real training step behind [[Similarity.ivfTopK]]'s codebook
  * (whose first-n-vectors "centroids" are a stand-in when no training
  * has run).
  *
  * Every arithmetic step is exact and order-independent so the DuckDB
  * oracle reproduces assignments bit-for-bit:
  *  - vectors quantized to integer thousandths ([[Similarity.quantize]]);
  *  - assignment = argmin of exact integer squared Euclidean distance,
  *    encoded as `min(dist * k + c_id)` (ties break on the smaller
  *    centroid id) and decoded with `% k` — a single partial-aggregable
  *    `min`, no window;
  *  - centroid update = element-wise integer sums and a truncating
  *    integer division (both engines truncate toward zero);
  *  - empty clusters keep their previous centroid.
  *
  * Scale shape: centroids are k×dim (broadcast); assignment is a
  * broadcast cross-join collapsed map-side by the `min` partial
  * aggregate, so the n×k scored rows never shuffle. The update explodes
  * dim positions per vector but partial-aggregates (cluster, pos) sums
  * map-side — the exchange carries k×dim rows per partition, not n×dim.
  * Fixed iteration count (no convergence probe): deterministic,
  * SQL-unrollable, and the standard practice for IVF codebooks.
  */
object KMeans {

  /** Quantized vectors + squared norm: (vec_id, q, xx). Widened first —
    * see [[Similarity.prepared]]. */
  private def vecs(embeddings: DataFrame): DataFrame = {
    graft.functions.LongDot.register(embeddings.sparkSession)
    graft.util.Scale.widen(embeddings)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .withColumn("xx", Similarity.dotL(col("q"), col("q")))
  }

  /** (vec_id, q, cluster) — nearest centroid per vector, exact integer
    * argmin, smallest-centroid-id tie-break. `cents`: (c_id, cvec, cc)
    * with c_id in [0, k). */
  private def assignAgainst(v: DataFrame, cents: DataFrame, k: Int): DataFrame = {
    // dist = xx + cc - 2*q.cvec >= 0, so the (dist, c_id) encoding is
    // non-negative and min/% decode is safe
    val dist = col("xx") + col("cc") - Similarity.dotL(col("q"), col("cvec")) * 2
    v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), (dist * k + col("c_id")).as("enc"))
      .groupBy(col("vec_id"))
      .agg(first(col("q")).as("q"), min(col("enc")).as("enc"))
      .withColumn("cluster", col("enc") % k)
      .drop("enc")
  }

  /** Trained centroids after `iters` Lloyd rounds: (c_id, cvec, cc).
    * Init = the first k vectors by vec_id (ids assumed dense from 0, the
    * same convention as [[Similarity.ivfTopK]]'s stand-in codebook). */
  def fit(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val v = persistedVecs(embeddings)
    // the returned centroids are eagerly checkpointed each round, so the
    // training vectors can be released as soon as the rounds finish
    val cents = fitVecs(v, k, iters)
    v.unpersist(blocking = false)
    cents
  }

  /** Lloyd's iterates over the same vectors every round, so they are
    * quantized once and persisted (memory, spill to disk) — the MLlib
    * convention for iterative training input; without it every round
    * re-runs the scan + quantize chain. */
  private def persistedVecs(embeddings: DataFrame): DataFrame =
    vecs(embeddings).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private def fitVecs(v: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = v.where(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("q").as("cvec"), col("xx").as("cc"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val assigned = assignAgainst(v, cents, k)
      val upd = assigned
        .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "qv")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("pos"), expr("s div n").as("m"))
        .groupBy(col("cluster"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("cvec"))
      // empty clusters (no assigned vectors) keep their previous centroid
      cents = cents.select(col("c_id"), col("cvec").as("cv0"))
        .join(upd, col("c_id") === col("cluster"), "left")
        .select(col("c_id"), coalesce(col("cvec"), col("cv0")).as("cvec"))
        .withColumn("cc", Similarity.dotL(col("cvec"), col("cvec")))
        .localCheckpoint(true)
    }
    cents
  }

  /** ([[fit]]'s centroids, final assignment) off one persisted vector
    * relation — for consumers that need BOTH the codebook and the codes
    * (product quantization reads centroid vectors at scoring time). */
  def fitCluster(embeddings: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val v = persistedVecs(embeddings)
    val cents = fitVecs(v, k, iters)
    v.unpersist(blocking = false)
    (cents, assignAgainst(v, cents, k).select(col("vec_id"), col("cluster")))
  }

  /** Multi-codebook Lloyd's for product quantization: trains ALL
    * subspace codebooks simultaneously — the subspace id `m` rides the
    * grouping keys, so each round is ONE assignment pass and ONE update
    * pass over the (vec_id, m, q) relation instead of one training run
    * per subspace (m× fewer jobs and scans; the arithmetic per
    * subspace is IDENTICAL to [[fit]], since every aggregate and the
    * argmin are keyed by m — the per-subspace oracle chains verify
    * exactly this equivalence).
    *
    * @param v0 (vec_id, m, q) QUANTIZED subvectors, m in [0, nSub)
    * @return (cents (m, c_id, cvec, cc), codes (vec_id, m, cluster))
    */
  private[ext] def fitClusterMulti(v0: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    val v = v0
      .withColumn("xx", Similarity.dotL(col("q"), col("q")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def assign(cents: DataFrame): DataFrame =
      v.join(broadcast(cents), Seq("m"))
        .select(col("vec_id"), col("m"), col("q"),
          ((col("xx") + col("cc") - Similarity.dotL(col("q"), col("cvec")) * 2)
            * k + col("c_id")).as("enc"))
        .groupBy(col("vec_id"), col("m"))
        .agg(first(col("q")).as("q"), min(col("enc")).as("enc"))
        .withColumn("cluster", col("enc") % k)
        .drop("enc")
    var cents = v.where(col("vec_id") < k)
      .select(col("m"), col("vec_id").as("c_id"), col("q").as("cvec"), col("xx").as("cc"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val upd = assign(cents)
        .select(col("m"), col("cluster"), posexplode(col("q")).as(Seq("pos", "qv")))
        .groupBy(col("m"), col("cluster"), col("pos"))
        .agg(sum(col("qv")).as("s"), count(lit(1)).as("cnt"))
        .select(col("m"), col("cluster"), col("pos"), expr("s div cnt").as("mean"))
        .groupBy(col("m"), col("cluster"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("mean")))),
          x => x.getField("mean")).as("cvec"))
        .select(col("m").as("u_m"), col("cluster"), col("cvec").as("u_cvec"))
      cents = cents.select(col("m"), col("c_id"), col("cvec").as("cv0"))
        .join(upd, col("m") === col("u_m") && col("c_id") === col("cluster"), "left")
        .select(col("m"), col("c_id"),
          coalesce(col("u_cvec"), col("cv0")).as("cvec"))
        .withColumn("cc", Similarity.dotL(col("cvec"), col("cvec")))
        .localCheckpoint(true)
    }
    val codes = assign(cents).select(col("vec_id"), col("m"), col("cluster"))
    v.unpersist(blocking = false)
    (cents, codes)
  }

  /** Assignment against a FROZEN codebook (no training) — the
    * index-add path: new vectors join an existing [[fit]] codebook
    * without touching it. `vecs` = (vec_id, q) quantized; `cents` =
    * (c_id, cvec, cc) with c_id in [0, k). Same exact-integer argmin
    * and tie-break as training-time assignment (shared code). */
  def assignTo(vecs: DataFrame, cents: DataFrame, k: Int): DataFrame =
    assignAgainst(vecs.withColumn("xx", Similarity.dotL(col("q"), col("q"))),
      cents, k)
      .select(col("vec_id"), col("cluster"))

  /** [[assignTo]] for a multi-subspace codebook (`m` rides the keys):
    * `subVecs` = (vec_id, m, q); `cents` = (m, c_id, cvec, cc). Returns
    * (vec_id, m, cluster) — the PQ codes of new vectors under frozen
    * per-subspace codebooks. */
  def assignToMulti(subVecs: DataFrame, cents: DataFrame, k: Int): DataFrame =
    subVecs
      .withColumn("xx", Similarity.dotL(col("q"), col("q")))
      .join(broadcast(cents), Seq("m"))
      .select(col("vec_id"), col("m"),
        ((col("xx") + col("cc") - Similarity.dotL(col("q"), col("cvec")) * 2)
          * k + col("c_id")).as("enc"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("enc")).as("enc"))
      .withColumn("cluster", col("enc") % k)
      .select(col("vec_id"), col("m"), col("cluster"))

  /** Nearest-class-centroid classifier over a LABELED embedding table —
    * the supervised twin of [[assignTo]] (Rocchio / prototype
    * classification, the standard cheap router for domain-tagging a
    * corpus from a small labeled seed set). Class prototypes are the
    * element-wise truncating integer means of each label's quantized
    * vectors (the [[fit]] update arithmetic, so the DuckDB oracle
    * replays them bit-for-bit), and every vector is assigned to the
    * nearest prototype by the same exact-integer squared-Euclidean
    * argmin + smallest-label tie-break encoding as training-time
    * assignment.
    *
    * Labels must lie in [0, k) — the same dense-id contract as every
    * codebook in this file ([[assignTo]]'s `c_id`), enforced loudly via
    * `assert_true` on the prototype build.
    *
    * Scale shape: ONE pass builds the prototypes (posexplode partial-
    * aggregated map-side — the exchange carries k×dim rows per
    * partition, not n×dim) and ONE pass classifies (broadcast k-row
    * prototype relation, n×k scored rows collapsed map-side by the
    * `min` partial aggregate; the label rides the aggregation, so no
    * join-back touches the corpus). Returns (vec_id, label, pred,
    * correct).
    */
  def classifyNearestCentroid(embeddings: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"class count must be positive, got $k")
    graft.functions.LongDot.register(embeddings.sparkSession)
    val v = graft.util.Scale.widen(embeddings)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        Similarity.quantize(col("embedding")).as("q"))
    val cents = v
      .select(when(col("label") >= 0 && col("label") < k, col("label"))
          .otherwise(raise_error(concat(lit(s"label outside [0, $k): "),
            col("label").cast("string")))).as("label"),
        posexplode(col("q")).as(Seq("pos", "qv")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("qv")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"), expr("s div n").as("m"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cvec"))
      .select(col("label").as("c_id"), col("cvec"))
      .withColumn("cc", Similarity.dotL(col("cvec"), col("cvec")))
    // assignAgainst's (dist, c_id) min-encoding with the true label
    // riding the aggregate — no corpus-sized join-back
    val dist = col("xx") + col("cc") - Similarity.dotL(col("q"), col("cvec")) * 2
    v.withColumn("xx", Similarity.dotL(col("q"), col("q")))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), (dist * k + col("c_id")).as("enc"))
      .groupBy(col("vec_id"))
      .agg(first(col("label")).as("label"), min(col("enc")).as("enc"))
      .select(col("vec_id"), col("label"), (col("enc") % k).as("pred"),
        (col("label") === col("enc") % k).as("correct"))
  }

  /** (vec_id, cluster): final assignment against [[fit]]'s centroids —
    * one persisted vector relation shared by training and assignment. */
  def cluster(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val v = persistedVecs(embeddings)
    // training runs eagerly here (each round localCheckpoints), so the
    // cache pays off across Lloyd rounds; release it before returning —
    // the lazy assignment pass just recomputes the narrow quantize scan
    // once instead of leaking a cached relation for the session lifetime
    val cents = fitVecs(v, k, iters)
    v.unpersist(blocking = false)
    assignAgainst(v, cents, k)
      .select(col("vec_id"), col("cluster"))
  }

  // ── session-scoped assignment artifact ─────────────────────────────
  // Lloyd training is an amortized OFFLINE job in production (the
  // Similarity.sessionIvfpqIndex discipline): a query consuming cluster
  // assignments should pay assignment-read cost, not retraining. The
  // fit is DETERMINISTIC (integer arithmetic, fixed init), so the cache
  // is semantically invisible — the memoization spec pins both.
  private val sessionAssign = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]()

  /** Number of actual training runs [[sessionCluster]] has paid this
    * session — exposed so the memoization spec can pin train-once. */
  private[graft] val sessionFitCount =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** [[cluster]] memoized per (corpus key, CONTENT fingerprint, k,
    * iters) for this JVM session: the (vec_id, cluster) assignment
    * persists to a scratch parquet once and later callers read the
    * artifact (two index-sized columns, never a retrain).
    *
    * The key folds in a content fingerprint (row count + order-free
    * hash over vec_id AND the embedding VALUES — one aggregate scan of
    * the two columns training itself reads, negligible next to any
    * training run) so the cache stays invisible even if the data under
    * a corpus key changes mid-session (fixture regeneration, tests
    * sharing a SparkSession) — including a regeneration that keeps the
    * same vec_ids but rewrites the vectors, which a vec_id-only hash
    * would miss and serve stale assignments for. The fit itself runs
    * OUTSIDE any map lock: `putIfAbsent` installs a future in O(1) and
    * losers block on the future, not on a ConcurrentHashMap bin held
    * for the duration of a multi-second Spark job. */
  def sessionCluster(embeddings: DataFrame, corpusKey: String,
                     k: Int, iters: Int): DataFrame = {
    val fp = embeddings
      .agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(vec_id, embedding))"), lit(0L)))
      .head()
    val key = s"km|$corpusKey|${fp.getLong(0)}:${fp.getLong(1)}|$k|$iters"
    val holder = new java.util.concurrent.CompletableFuture[String]
    val fut = Option(sessionAssign.putIfAbsent(key, holder)).getOrElse {
      try {
        sessionFitCount.incrementAndGet()
        val p = Similarity.scratchIndexDir("km")
        cluster(embeddings, k, iters).write.parquet(p)
        holder.complete(p)
      } catch { case e: Throwable =>
        sessionAssign.remove(key, holder)
        holder.completeExceptionally(e)
        throw e
      }
      holder
    }
    embeddings.sparkSession.read.parquet(fut.join())
  }

  /** DuckDB oracle for [[cluster]] — the identical unrolled computation
    * (exact integer dot products are representable in doubles, so
    * list_dot_product round-trips exactly). Generated from the same
    * constants as the Spark plan to prevent drift. */
  private def assignCteSql(k: Int, cents: String, vName: String = "v"): String = {
    val ldp = "list_dot_product"
    def distSql(q: String, cv: String) =
      s"cast($ldp($q, $q) + $ldp($cv, $cv) - 2 * $ldp($q, $cv) AS BIGINT)"
    s"""SELECT vec_id, q, min(${distSql("v.q", "c.cvec")} * $k + c.c_id) % $k AS cluster
       |  FROM $vName v, $cents c GROUP BY vec_id, q""".stripMargin
  }

  /** The shared CTE chain `v, c0, a0, s0, u0, c1, … c{iters}` that
    * reproduces [[fit]] in DuckDB (composable: [[clusterOracleSql]],
    * the IVF-over-trained-codebook oracle, and [[pqOracleSql]]'s
    * per-subspace chains all build on it). `sfx` suffixes every CTE
    * name so several chains can share one WITH; `vSql` overrides the
    * vector source (e.g. a subvector slice of a shared base CTE). */
  private[ext] def fitCtesSql(k: Int, iters: Int, dim: Int,
                              sfx: String = "", vSql: Option[String] = None): String = {
    val iterCtes = (0 until iters).map { i =>
      // integer sums are exact in DOUBLE (values far below 2^53); cast
      // back to BIGINT before // so both engines truncate toward zero
      s"""a$i$sfx AS (${assignCteSql(k, s"c$i$sfx", s"v$sfx")}),
         |s$i$sfx AS (SELECT cluster, i AS pos, cast(sum(q[i]) AS BIGINT) AS s, count(*) AS n
         |  FROM a$i$sfx, range(1, ${dim + 1}) t(i) GROUP BY cluster, i),
         |u$i$sfx AS (SELECT cluster, list(s // n ORDER BY pos) AS cvec FROM s$i$sfx GROUP BY cluster),
         |c${i + 1}$sfx AS (SELECT c.c_id, coalesce(u.cvec, c.cvec) AS cvec
         |  FROM c$i$sfx c LEFT JOIN u$i$sfx u ON u.cluster = c.c_id)""".stripMargin
    }.mkString(",\n")
    val vBody = vSql.getOrElse(
      s"""SELECT vec_id,
         |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
         |  FROM embeddings""".stripMargin)
    s"""v$sfx AS ($vBody),
       |c0$sfx AS (SELECT vec_id AS c_id, q AS cvec FROM v$sfx WHERE vec_id < $k),
       |$iterCtes""".stripMargin
  }

  /** DuckDB oracle for [[Similarity.pqTopK]] — the FULL algorithm
    * replayed: per-subspace k-means chains over slices of a shared
    * norm-filtered base, final assignment codes, the ADC lookup table,
    * the approx-dot shortlist (same tie-breaks), and the exact cosine
    * rerank. Because the oracle mirrors the shortlist itself, equality
    * holds at ANY corpus scale regardless of PQ recall — what is
    * verified is the compression arithmetic, bit for bit. */
  def pqOracleSql(dim: Int, nQueries: Int, topK: Int,
                  m: Int, kSub: Int, iters: Int, shortlist: Int): String = {
    val subDim = dim / m
    def lo(i: Int) = i * subDim + 1
    def hi(i: Int) = i * subDim + subDim
    val chains = (0 until m).map { i =>
      fitCtesSql(kSub, iters, subDim, sfx = s"_$i",
        vSql = Some(s"SELECT vec_id, q[${lo(i)}:${hi(i)}] AS q FROM eb"))
    }.mkString(",\n")
    val codeCtes = (0 until m).map { i =>
      s"codes_$i AS (${assignCteSql(kSub, s"c$iters" + s"_$i", s"v_$i")})"
    }.mkString(",\n")
    val codesUnion = (0 until m).map(i =>
      s"SELECT vec_id, $i AS m, cluster FROM codes_$i").mkString(" UNION ALL ")
    val lutUnion = (0 until m).map(i =>
      s"""SELECT q.vec_id AS q_id, $i AS m, c.c_id,
         |  cast(list_dot_product(q.q[${lo(i)}:${hi(i)}], c.cvec) AS BIGINT) AS d
         |  FROM eb q, c${iters}_$i c WHERE q.vec_id < $nQueries""".stripMargin)
      .mkString(" UNION ALL ")
    val cos =
      "list_dot_product(qv.q, xv.q) / (sqrt(list_dot_product(qv.q, qv.q)) * sqrt(list_dot_product(xv.q, xv.q)))"
    s"""WITH eb AS (SELECT vec_id, q FROM (SELECT vec_id,
       |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
       |    FROM embeddings) WHERE list_dot_product(q, q) > 0),
       |$chains,
       |$codeCtes,
       |codes AS ($codesUnion),
       |lut AS ($lutUnion),
       |approx AS (
       |  SELECT l.q_id, c.vec_id, cast(sum(l.d) AS BIGINT) AS approx
       |  FROM codes c JOIN lut l ON l.m = c.m AND l.c_id = c.cluster
       |  WHERE c.vec_id != l.q_id GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY approx DESC, vec_id) AS srn
       |    FROM approx) WHERE srn <= $shortlist),
       |scored AS (
       |  SELECT s.q_id, s.vec_id, $cos AS cos
       |  FROM short s JOIN eb qv ON qv.vec_id = s.q_id JOIN eb xv ON xv.vec_id = s.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id, cos, cast(rank AS BIGINT) AS rank FROM ranked WHERE rank <= $topK""".stripMargin
  }

  /** DuckDB oracle for the INCREMENTAL flat-PQ index path (q222):
    * per-subspace codebooks trained ONLY on rows satisfying
    * `trainWhere` (the settled corpus the index was built on), EVERY
    * vector coded against those frozen codebooks (the add path), then
    * the identical ADC shortlist + exact rerank as [[pqOracleSql]] —
    * the flat sibling of [[ivfpqIncrementalOracleSql]]. */
  def pqIncrementalOracleSql(dim: Int, nQueries: Int, topK: Int,
                             m: Int, kSub: Int, iters: Int,
                             shortlist: Int, trainWhere: String): String = {
    val subDim = dim / m
    def lo(i: Int) = i * subDim + 1
    def hi(i: Int) = i * subDim + subDim
    val chains = (0 until m).map { i =>
      fitCtesSql(kSub, iters, subDim, sfx = s"_$i",
        vSql = Some(
          s"SELECT vec_id, q[${lo(i)}:${hi(i)}] AS q FROM eb WHERE $trainWhere"))
    }.mkString(",\n")
    val vallCtes = (0 until m).map { i =>
      s"vall_$i AS (SELECT vec_id, q[${lo(i)}:${hi(i)}] AS q FROM eb)"
    }.mkString(",\n")
    val codeCtes = (0 until m).map { i =>
      s"codes_$i AS (${assignCteSql(kSub, s"c$iters" + s"_$i", s"vall_$i")})"
    }.mkString(",\n")
    val codesUnion = (0 until m).map(i =>
      s"SELECT vec_id, $i AS m, cluster FROM codes_$i").mkString(" UNION ALL ")
    val lutUnion = (0 until m).map(i =>
      s"""SELECT q.vec_id AS q_id, $i AS m, c.c_id,
         |  cast(list_dot_product(q.q[${lo(i)}:${hi(i)}], c.cvec) AS BIGINT) AS d
         |  FROM eb q, c${iters}_$i c WHERE q.vec_id < $nQueries""".stripMargin)
      .mkString(" UNION ALL ")
    val cos =
      "list_dot_product(qv.q, xv.q) / (sqrt(list_dot_product(qv.q, qv.q)) * sqrt(list_dot_product(xv.q, xv.q)))"
    s"""WITH eb AS (SELECT vec_id, q FROM (SELECT vec_id,
       |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
       |    FROM embeddings) WHERE list_dot_product(q, q) > 0),
       |$chains,
       |$vallCtes,
       |$codeCtes,
       |codes AS ($codesUnion),
       |lut AS ($lutUnion),
       |approx AS (
       |  SELECT l.q_id, c.vec_id, cast(sum(l.d) AS BIGINT) AS approx
       |  FROM codes c JOIN lut l ON l.m = c.m AND l.c_id = c.cluster
       |  WHERE c.vec_id != l.q_id GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY approx DESC, vec_id) AS srn
       |    FROM approx) WHERE srn <= $shortlist),
       |scored AS (
       |  SELECT s.q_id, s.vec_id, $cos AS cos
       |  FROM short s JOIN eb qv ON qv.vec_id = s.q_id JOIN eb xv ON xv.vec_id = s.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id, cos, cast(rank AS BIGINT) AS rank FROM ranked WHERE rank <= $topK""".stripMargin
  }

  /** DuckDB oracle for [[Similarity.ivfpqTopK]] — the FULL IVFPQ
    * composition replayed: the coarse k-means chain (integer-L2
    * assignment), residual encoding (elementwise subtraction of the
    * assigned coarse centroid), the m per-subspace k-means chains over
    * RESIDUAL slices, PQ codes, the nprobe probe lists (same integer-L2
    * order), the ADC approximation dot(q,c_b) + Σ LUT with candidates
    * restricted to probed buckets, the shortlist, and the exact cosine
    * rerank. Like [[pqOracleSql]], the oracle mirrors the shortlist
    * itself, so equality verifies the composition arithmetic bit-for-bit
    * at any corpus scale, independent of data-dependent recall. */
  def ivfpqOracleSql(dim: Int, nCoarse: Int, nQueries: Int, topK: Int,
                     m: Int, kSub: Int, iters: Int,
                     nprobe: Int, shortlist: Int): String =
    s"""WITH ${ivfpqRankedCtes(dim, nCoarse, nQueries, m, kSub, iters, nprobe, shortlist)}
       |SELECT q_id, vec_id, cos, cast(rank AS BIGINT) AS rank FROM ranked WHERE rank <= $topK""".stripMargin

  /** The full IVFPQ CTE chain up to `ranked(q_id, vec_id, cos, rank)` —
    * shared by [[ivfpqOracleSql]] (the ranking gate, q101/q105) and
    * [[ivfpqRecallOracleSql]] (the q215 calibration gate), so both
    * gates replay ONE arithmetic. Leaves `eb(vec_id, q)` in scope for
    * brute-force companion CTEs. */
  private def ivfpqRankedCtes(dim: Int, nCoarse: Int, nQueries: Int,
                              m: Int, kSub: Int, iters: Int,
                              nprobe: Int, shortlist: Int): String = {
    val subDim = dim / m
    def lo(i: Int) = i * subDim + 1
    def hi(i: Int) = i * subDim + subDim
    val ldp = "list_dot_product"
    val coarseChain = fitCtesSql(nCoarse, iters, dim, sfx = "_cv",
      vSql = Some("SELECT vec_id, q FROM eb"))
    val pqChains = (0 until m).map { i =>
      fitCtesSql(kSub, iters, subDim, sfx = s"_$i",
        vSql = Some(s"SELECT vec_id, r[${lo(i)}:${hi(i)}] AS q FROM res"))
    }.mkString(",\n")
    val codeCtes = (0 until m).map { i =>
      s"codes_$i AS (${assignCteSql(kSub, s"c$iters" + s"_$i", s"v_$i")})"
    }.mkString(",\n")
    val codesUnion = (0 until m).map(i =>
      s"SELECT vec_id, $i AS m, cluster FROM codes_$i").mkString(" UNION ALL ")
    val lutUnion = (0 until m).map(i =>
      s"""SELECT q.vec_id AS q_id, $i AS m, c.c_id,
         |  cast($ldp(q.q[${lo(i)}:${hi(i)}], c.cvec) AS BIGINT) AS d
         |  FROM eb q, c${iters}_$i c WHERE q.vec_id < $nQueries""".stripMargin)
      .mkString(" UNION ALL ")
    val cos =
      s"$ldp(qv.q, xv.q) / (sqrt($ldp(qv.q, qv.q)) * sqrt($ldp(xv.q, xv.q)))"
    s"""eb AS (SELECT vec_id, q FROM (SELECT vec_id,
       |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
       |    FROM embeddings) WHERE $ldp(q, q) > 0),
       |$coarseChain,
       |cvassign AS (${assignCteSql(nCoarse, s"c${iters}_cv", "v_cv")}),
       |res AS (
       |  SELECT a.vec_id, a.cluster AS bucket,
       |    list(a.q[i] - c.cvec[i] ORDER BY i) AS r
       |  FROM cvassign a JOIN c${iters}_cv c ON c.c_id = a.cluster,
       |       range(1, ${dim + 1}) t(i)
       |  GROUP BY a.vec_id, a.cluster),
       |$pqChains,
       |$codeCtes,
       |codes AS ($codesUnion),
       |probes AS (SELECT q_id, c_id AS bucket, qc FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS prn
       |    FROM (
       |      SELECT q.vec_id AS q_id, c.c_id,
       |        cast($ldp(q.q, q.q) + $ldp(c.cvec, c.cvec)
       |          - 2 * $ldp(q.q, c.cvec) AS BIGINT) AS dist,
       |        cast($ldp(q.q, c.cvec) AS BIGINT) AS qc
       |      FROM eb q, c${iters}_cv c WHERE q.vec_id < $nQueries))
       |  WHERE prn <= $nprobe),
       |lut AS ($lutUnion),
       |cand AS (
       |  SELECT p.q_id, r.vec_id, p.qc FROM res r JOIN probes p ON p.bucket = r.bucket
       |  WHERE r.vec_id != p.q_id),
       |approx AS (
       |  SELECT cand.q_id, cand.vec_id, any_value(cand.qc) + sum(l.d) AS approx
       |  FROM cand JOIN codes c ON c.vec_id = cand.vec_id
       |            JOIN lut l ON l.q_id = cand.q_id AND l.m = c.m AND l.c_id = c.cluster
       |  GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY approx DESC, vec_id) AS srn
       |    FROM approx) WHERE srn <= $shortlist),
       |scored AS (
       |  SELECT s.q_id, s.vec_id, $cos AS cos
       |  FROM short s JOIN eb qv ON qv.vec_id = s.q_id JOIN eb xv ON xv.vec_id = s.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)""".stripMargin
  }

  /** DuckDB oracle for the IVFPQ RECALL GATE (q215): the shared
    * [[ivfpqRankedCtes]] ranking at a fixed (nprobe, shortlist)
    * operating point, the brute-force top-`topK` ranking over the same
    * `eb` relation, and the per-query recall join — the q164 discipline
    * extended to the persisted-index probe path. */
  def ivfpqRecallOracleSql(dim: Int, nCoarse: Int, nQueries: Int, topK: Int,
                           m: Int, kSub: Int, iters: Int,
                           nprobe: Int, shortlist: Int): String = {
    val ldp = "list_dot_product"
    s"""WITH ${ivfpqRankedCtes(dim, nCoarse, nQueries, m, kSub, iters, nprobe, shortlist)},
       |it AS (SELECT q_id, vec_id FROM ranked WHERE rank <= $topK),
       |bsc AS (SELECT qs.vec_id AS q_id, e2.vec_id,
       |    $ldp(qs.q, e2.q)
       |      / (sqrt($ldp(qs.q, qs.q)) * sqrt($ldp(e2.q, e2.q))) AS cos
       |  FROM eb qs JOIN eb e2 ON qs.vec_id < $nQueries AND e2.vec_id != qs.vec_id),
       |bt AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM bsc)
       |  WHERE rank <= $topK)
       |SELECT b.q_id,
       |  cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |  cast(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // $topK AS BIGINT) AS recall_ppm
       |FROM bt b LEFT JOIN it i ON b.q_id = i.q_id AND b.vec_id = i.vec_id
       |GROUP BY b.q_id""".stripMargin
  }

  /** DuckDB oracle for the INCREMENTAL index path (q219): codebooks
    * trained ONLY on the rows satisfying `trainWhere` (the settled
    * corpus the index was built on — FAISS train), every vector —
    * settled AND later-added — coarse-assigned, residual-encoded and
    * PQ-coded against those FROZEN codebooks (FAISS add), then the
    * identical probe/ADC/shortlist/rerank chain as [[ivfpqOracleSql]].
    * The assignment arithmetic is [[assignCteSql]] either way (the
    * engine shares the argmin between training-time assignment and
    * `assignTo`), so train-then-add must be hash-equal to this chain —
    * which is exactly the law the driver gate proves. */
  def ivfpqIncrementalOracleSql(dim: Int, nCoarse: Int, nQueries: Int,
                                topK: Int, m: Int, kSub: Int, iters: Int,
                                nprobe: Int, shortlist: Int,
                                trainWhere: String): String = {
    val subDim = dim / m
    def lo(i: Int) = i * subDim + 1
    def hi(i: Int) = i * subDim + subDim
    val ldp = "list_dot_product"
    val coarseChain = fitCtesSql(nCoarse, iters, dim, sfx = "_cv",
      vSql = Some(s"SELECT vec_id, q FROM eb WHERE $trainWhere"))
    val pqChains = (0 until m).map { i =>
      fitCtesSql(kSub, iters, subDim, sfx = s"_$i",
        vSql = Some(
          s"SELECT vec_id, r[${lo(i)}:${hi(i)}] AS q FROM res WHERE $trainWhere"))
    }.mkString(",\n")
    // ALL-vector residual slices for code assignment (the add path):
    // the training chains above see only the settled rows
    val vallCtes = (0 until m).map { i =>
      s"vall_$i AS (SELECT vec_id, r[${lo(i)}:${hi(i)}] AS q FROM res)"
    }.mkString(",\n")
    val codeCtes = (0 until m).map { i =>
      s"codes_$i AS (${assignCteSql(kSub, s"c$iters" + s"_$i", s"vall_$i")})"
    }.mkString(",\n")
    val codesUnion = (0 until m).map(i =>
      s"SELECT vec_id, $i AS m, cluster FROM codes_$i").mkString(" UNION ALL ")
    val lutUnion = (0 until m).map(i =>
      s"""SELECT q.vec_id AS q_id, $i AS m, c.c_id,
         |  cast($ldp(q.q[${lo(i)}:${hi(i)}], c.cvec) AS BIGINT) AS d
         |  FROM eb q, c${iters}_$i c WHERE q.vec_id < $nQueries""".stripMargin)
      .mkString(" UNION ALL ")
    val cos =
      s"$ldp(qv.q, xv.q) / (sqrt($ldp(qv.q, qv.q)) * sqrt($ldp(xv.q, xv.q)))"
    s"""WITH eb AS (SELECT vec_id, q FROM (SELECT vec_id,
       |    list_transform(embedding, x -> cast(round(x::DOUBLE * 1000) AS BIGINT))::DOUBLE[] AS q
       |    FROM embeddings) WHERE $ldp(q, q) > 0),
       |$coarseChain,
       |cvassign AS (${assignCteSql(nCoarse, s"c${iters}_cv", "eb")}),
       |res AS (
       |  SELECT a.vec_id, a.cluster AS bucket,
       |    list(a.q[i] - c.cvec[i] ORDER BY i) AS r
       |  FROM cvassign a JOIN c${iters}_cv c ON c.c_id = a.cluster,
       |       range(1, ${dim + 1}) t(i)
       |  GROUP BY a.vec_id, a.cluster),
       |$pqChains,
       |$vallCtes,
       |$codeCtes,
       |codes AS ($codesUnion),
       |probes AS (SELECT q_id, c_id AS bucket, qc FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY dist, c_id) AS prn
       |    FROM (
       |      SELECT q.vec_id AS q_id, c.c_id,
       |        cast($ldp(q.q, q.q) + $ldp(c.cvec, c.cvec)
       |          - 2 * $ldp(q.q, c.cvec) AS BIGINT) AS dist,
       |        cast($ldp(q.q, c.cvec) AS BIGINT) AS qc
       |      FROM eb q, c${iters}_cv c WHERE q.vec_id < $nQueries))
       |  WHERE prn <= $nprobe),
       |lut AS ($lutUnion),
       |cand AS (
       |  SELECT p.q_id, r.vec_id, p.qc FROM res r JOIN probes p ON p.bucket = r.bucket
       |  WHERE r.vec_id != p.q_id),
       |approx AS (
       |  SELECT cand.q_id, cand.vec_id, any_value(cand.qc) + sum(l.d) AS approx
       |  FROM cand JOIN codes c ON c.vec_id = cand.vec_id
       |            JOIN lut l ON l.q_id = cand.q_id AND l.m = c.m AND l.c_id = c.cluster
       |  GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY approx DESC, vec_id) AS srn
       |    FROM approx) WHERE srn <= $shortlist),
       |scored AS (
       |  SELECT s.q_id, s.vec_id, $cos AS cos
       |  FROM short s JOIN eb qv ON qv.vec_id = s.q_id JOIN eb xv ON xv.vec_id = s.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id, cos, cast(rank AS BIGINT) AS rank FROM ranked WHERE rank <= $topK""".stripMargin
  }

  def clusterOracleSql(k: Int, iters: Int, dim: Int): String =
    s"""WITH ${assignCtesSql(k, iters, dim)}
       |SELECT vec_id, cast(cluster AS BIGINT) AS cluster FROM final""".stripMargin

  /** The fit + final-assignment CTE chain for EXTERNAL oracle
    * composition — ends with `final(vec_id, q, cluster)` in scope
    * (also defines `v`, `c0..cN`, the per-round CTEs). q137 joins
    * within-cluster pairs off it; callers must avoid those names. */
  def assignCtesSql(k: Int, iters: Int, dim: Int): String =
    s"""${fitCtesSql(k, iters, dim)},
       |final AS (${assignCteSql(k, s"c$iters")})""".stripMargin

  /** DuckDB oracle for `Similarity.ivfTopK(…, trainIters)` at nprobe=1:
    * the [[fitCtesSql]] codebook, then the same cosine
    * assignment/probe/rescore shape as the first-n-codebook IVF oracle. */
  def ivfKmeansOracleSql(k: Int, iters: Int, dim: Int,
                         nQueries: Int, topK: Int): String = {
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
    s"""WITH ${fitCtesSql(k, iters, dim)},
       |e AS (SELECT vec_id, q FROM v WHERE list_dot_product(q, q) > 0),
       |cf AS (SELECT c_id, cvec::DOUBLE[] AS cq FROM c$iters
       |       WHERE list_dot_product(cvec, cvec) > 0),
       |assign AS (
       |  SELECT vec_id, q, cluster FROM (
       |    SELECT e.vec_id, e.q, c.c_id AS cluster,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cos("c.cq", "e.q")} DESC, c.c_id) AS arn
       |    FROM e, cf c)
       |  WHERE arn = 1),
       |scored AS (
       |  SELECT qs.vec_id AS q_id, x.vec_id, ${cos("qs.q", "x.q")} AS cos
       |  FROM assign qs JOIN assign x
       |    ON qs.vec_id < $nQueries AND x.cluster = qs.cluster AND x.vec_id != qs.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id, cos, cast(rank AS BIGINT) AS rank FROM ranked WHERE rank <= $topK""".stripMargin
  }
}
