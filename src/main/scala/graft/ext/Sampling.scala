package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines:
  * held-out train/val/test splits and per-stratum downsampling, both
  * driven by the cross-engine md5-prefix hash of a salted id (so the
  * same row lands in the same split on any engine, any run, any
  * partitioning — the property `rand()`-based sampling lacks).
  *
  * Scale shape: a pure narrow projection/filter per row — no shuffle,
  * no state; the salt string makes independent samples ("split" vs a
  * later "ablation" sample) statistically unrelated.
  */
object Sampling {

  /** Salted 60-bit row hash — the shared primitive: non-negative, so
    * modulo and ordering behave identically in both engines. */
  def rowHash(df: DataFrame, id: Column, salt: String): Column = {
    graft.functions.Md5Prefix64.register(df.sparkSession)
    Dedup.hash64(concat(lit(salt + ":"), id.cast("string")))
  }

  /** The identical hash in DuckDB SQL — oracle building block. */
  def rowHashSql(idExpr: String, salt: String): String =
    s"cast(concat('0x', substr(md5(concat('$salt:', cast($idExpr AS VARCHAR))), 1, 15)) AS BIGINT)"

  /** bucket in [0, 100): hash64("salt:id") % 100. */
  def bucket(df: DataFrame, id: Column, salt: String): Column =
    rowHash(df, id, salt) % 100

  /** The identical bucket in DuckDB SQL — oracle building block. */
  def bucketSql(idExpr: String, salt: String): String =
    s"${rowHashSql(idExpr, salt)} % 100"

  /** Adds a `split` column: 'train' for bucket < trainPct, 'val' for
    * the next valPct buckets, 'test' for the rest. */
  def assignSplits(df: DataFrame, idCol: String, trainPct: Int = 80,
                   valPct: Int = 10, salt: String = "split"): DataFrame = {
    val b = bucket(df, col(idCol), salt)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Keeps each row with probability ratePct(stratum)/100 (deterministic
    * by hash); strata not in the map use defaultPct. Rates are applied
    * per stratum value — the standard rebalancing step (e.g. downsample
    * over-represented languages) ahead of training. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       ratePct: Seq[(String, Int)], defaultPct: Int,
                       salt: String = "strat"): DataFrame = {
    val rate = ratePct.foldLeft(lit(defaultPct)) { case (acc, (v, p)) =>
      when(col(stratumCol) === v, p).otherwise(acc)
    }
    df.where(bucket(df, col(idCol), salt) < rate)
  }

  /** Oracle CASE expression matching [[stratifiedSample]]'s rate fold. */
  def rateSql(stratumExpr: String, ratePct: Seq[(String, Int)],
              defaultPct: Int): String =
    ratePct.foldLeft(defaultPct.toString) { case (acc, (v, p)) =>
      s"(CASE WHEN $stratumExpr = '$v' THEN $p ELSE $acc END)"
    }

  /** Keeps each row with probability `weightPct`/100 where the weight is
    * any per-row integer expression in [0, 100] (quality score, length
    * tier, source trust) — importance sampling with the same
    * deterministic-hash contract as the other samplers: per-row stable
    * under any subset/partitioning, reproducible cross-engine. Rows at
    * weight 100 always survive; weight 0 never does. Pure narrow
    * filter, zero shuffles. */
  def weightedSample(df: DataFrame, idCol: String, weightPct: Column,
                     salt: String = "weight"): DataFrame =
    df.where(bucket(df, col(idCol), salt) < weightPct)

  /** Cap every group at EXACTLY `k` survivors (fewer only if the group
    * is smaller), chosen deterministically: rows rank by their salted
    * hash (ties broken on id) and the first k per group survive — the
    * per-class balancing cap every training-data recipe has (e.g. "at
    * most N documents per over-represented language"), where the RATE
    * samplers above can only cap in expectation. Same cross-engine
    * reproducibility contract: stable under any partitioning, any
    * engine, any subset.
    *
    * Scale shape: one hash exchange on the group key for the rank
    * window. An exact per-group k has no shuffle-free form, but the
    * window's sort input can be pre-pruned map-side at high ratios by
    * a bucket filter (keep ~2k expected first via [[bucket]], then
    * rank) — composition left to callers because correctness of the
    * prune depends on group-size floors only the caller knows. */
  /** A working-column name guaranteed absent from `df` — withColumn
    * would silently overwrite (and the final drop destroy) a caller
    * column of the same name otherwise. */
  private def freshCol(df: DataFrame, base: String): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !df.columns.contains(n)).get

  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int,
                  salt: String = "cap"): DataFrame = {
    require(k >= 1, s"capPerGroup needs k >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(rowHash(df, col(idCol), salt), col(idCol))
    val rk = freshCol(df, "_rk")
    df.withColumn(rk, row_number().over(w))
      .where(col(rk) <= k).drop(rk)
  }

  /** Sample each domain down to a TOKEN budget — the data-mixing step
    * of a pretraining recipe: corpus composition is specified in tokens
    * per domain ("300B web, 40B code, ..."), not document counts, so
    * the cap must track a running token total, where [[capPerGroup]]
    * counts rows. Rows take the same deterministic salted-hash order as
    * every sampler here, a per-domain running sum of `tokenCol`
    * accumulates, and a row survives iff its INCLUSIVE running total
    * fits the domain's budget — so the kept set is the maximal
    * deterministic prefix not exceeding the budget (a row never
    * partially survives; domains under budget keep everything; budget 0
    * or an unlisted domain with defaultBudget 0 keeps nothing).
    *
    * Scale shape: one hash exchange on the domain key for the running-
    * sum window — identical to [[capPerGroup]]'s, and the same
    * SeqPack-style prefix-sum discipline. Cross-engine reproducible:
    * the oracle replays hash order and window arithmetic exactly.
    */
  def sampleToTokenBudget(df: DataFrame, idCol: String, domainCol: String,
                          tokenCol: String, budgets: Seq[(String, Long)],
                          defaultBudget: Long = 0L,
                          salt: String = "mix"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(rowHash(df, col(idCol), salt), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (v, b)) =>
      when(col(domainCol) === v, b).otherwise(acc)
    }
    val cum = freshCol(df, "_cum")
    df.withColumn(cum, sum(col(tokenCol).cast("long")).over(w))
      .where(col(cum) <= budget).drop(cum)
  }

  /** Oracle CASE expression matching [[sampleToTokenBudget]]'s budget
    * fold. */
  def budgetSql(domainExpr: String, budgets: Seq[(String, Long)],
                defaultBudget: Long): String =
    budgets.foldLeft(defaultBudget.toString) { case (acc, (v, b)) =>
      s"(CASE WHEN $domainExpr = '$v' THEN $b ELSE $acc END)"
    }

  /** Sample to target domain PROPORTIONS — the recipe form data-mixing
    * is actually specified in ("30% web, 20% code, ..."), where
    * [[sampleToTokenBudget]] wants absolute token counts. The largest
    * corpus honoring the proportions from the available data is the
    * WATER-FILLING solution: with integer weights w_d (summing to W)
    * and per-domain availability avail_d, the total is
    * T = min_d floor(avail_d · W / w_d) — the binding domain is kept
    * whole(-ish) and every other domain is cut to budget_d =
    * floor(w_d · T / W). All arithmetic is exact integer (truncating
    * division on positives == floor), so any engine rederives the same
    * budgets; rows then take the standard deterministic hash-ordered
    * prefix cut. Domains not in `weights` are dropped — the recipe
    * DEFINES the corpus. Degenerate inputs (a listed domain with no
    * rows) make T = 0 and the result empty, the faithful reading of
    * "30% of nothing".
    *
    * Scale shape: one |domains|-row aggregate (collected — metadata,
    * same class as the ingestPrep budget read-back) + capPerGroup's
    * single window exchange. The oracle rederives avail/T/budgets in
    * SQL rather than trusting the driver's numbers.
    */
  def sampleToProportions(df: DataFrame, idCol: String, domainCol: String,
                          tokenCol: String, weights: Seq[(String, Long)],
                          salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"positive weights required: $weights")
    val w = weights.toMap
    val totalW = weights.map(_._2).sum
    val listed = df.where(col(domainCol).isin(weights.map(_._1): _*))
    val avail = listed.groupBy(col(domainCol))
      .agg(sum(col(tokenCol).cast("long")).as("_avail"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = weights.map { case (d, wd) =>
      avail.getOrElse(d, 0L) * totalW / wd
    }.min
    val budgets = weights.map { case (d, wd) => d -> wd * t / totalW }
    sampleToTokenBudget(listed, idCol, domainCol, tokenCol, budgets, 0L, salt)
  }

  /** Water-filling CTEs for [[sampleToProportions]]'s oracle: ends with
    * `budget(domain, b)` in scope, derived IN SQL from the same integer
    * arithmetic (`//` floor division; positives only). `srcSql` must
    * expose (domain, tokens) per row. */
  def proportionBudgetCtes(srcSql: String, domainExpr: String,
                           tokenExpr: String,
                           weights: Seq[(String, Long)]): String = {
    val totalW = weights.map(_._2).sum
    val wCase = weights.foldLeft("NULL") { case (acc, (v, wd)) =>
      s"(CASE WHEN domain = '$v' THEN $wd ELSE $acc END)"
    }
    val domList = weights.map(w => s"'${w._1}'").mkString(", ")
    s"""wsrc AS (SELECT $domainExpr AS domain, $tokenExpr AS tokens
       |         FROM ($srcSql) WHERE $domainExpr IN ($domList)),
       |avail AS (SELECT w.domain, coalesce(a.avail, 0) AS avail, w.wd FROM
       |  (SELECT domain, $wCase AS wd FROM (SELECT unnest([$domList]) AS domain)) w
       |  LEFT JOIN (SELECT domain, cast(sum(tokens) AS BIGINT) AS avail
       |             FROM wsrc GROUP BY domain) a USING (domain)),
       |tmax AS (SELECT min(avail * $totalW // wd) AS t FROM avail),
       |budget AS (SELECT domain, wd * (SELECT t FROM tmax) // $totalW AS b
       |           FROM avail)""".stripMargin
  }

  /** Exact integer square root (floor) — the α = 1/2 temperature
    * weight. Math.sqrt seeds the estimate; the correction loop makes
    * the result exact for any non-negative long, independent of FP
    * rounding. */
  private[ext] def isqrt(a: Long): Long = {
    require(a >= 0L, s"isqrt of negative $a")
    // 3037000499 = isqrt(Long.MaxValue): past it (r+1)² overflows, so
    // the bound doubles as the overflow guard for the correction loop
    val cap = 3037000499L
    var r = math.sqrt(a.toDouble).toLong.min(cap).max(0L)
    while (r > 0 && r * r > a) r -= 1
    while (r < cap && (r + 1) * (r + 1) <= a) r += 1
    r
  }

  /** TEMPERATURE-sampled multilingual mixing (the mC4 / XLM recipe at
    * α = 1/2): each domain's share of the token budget is proportional
    * to avail_d^α rather than avail_d, flattening the head so
    * low-resource languages are over-represented relative to their raw
    * counts. α = 1/2 is implemented with EXACT integer square roots —
    * w_d = isqrt(avail_d), budget_d = floor(T · w_d / Σw) — so both
    * engines rederive identical budgets with no FP-summation-order
    * hazard (the oracle's floor(sqrt(bigint)) agrees with exact isqrt
    * for avail ≪ 2^52 ≈ 4·10^15 tokens — comfortably above 100 TB of
    * text; other α would need a cross-engine pow contract and is out
    * of scope). Rows then take the standard deterministic hash-ordered
    * prefix cut, so a domain whose budget exceeds its availability is
    * simply kept whole (temperature UPSAMPLING — repeating epochs for
    * low-resource languages — is the training loop's job, not the
    * corpus cut's).
    *
    * Scale shape: one |domains|-row aggregate (collected — metadata,
    * the sampleToProportions pattern) + sampleToTokenBudget's single
    * window exchange. The window carries every listed-domain row even
    * though only ~budget tokens survive; when T ≪ avail at 100 TB,
    * pre-filter each domain to a generous hash-prefix superset of its
    * budget (the same hash stream, so the prefix cut is unchanged)
    * before the window — the standard refinement if that exchange
    * ever dominates.
    */
  def sampleToTemperature(df: DataFrame, idCol: String, domainCol: String,
                          tokenCol: String, totalBudget: Long,
                          salt: String = "temp"): DataFrame = {
    require(totalBudget > 0L, s"positive budget required: $totalBudget")
    val avail = df.groupBy(col(domainCol))
      .agg(sum(col(tokenCol).cast("long")).as("_avail"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val weights = avail.map { case (d, a) => d -> isqrt(a) }
    val totalW = weights.map(_._2).sum
    require(totalW > 0L, "all domains empty — nothing to mix")
    // budget_d = floor(T·w_d / Σw) in BigInt: the product T·w_d
    // overflows Long already at T ≈ 2·10¹² tokens × w_d ≈ 5·10⁶ (a
    // ~100 TB domain's isqrt) — exactly the production scale this
    // recipe targets. The quotient is ≤ T, so the final toLong is safe;
    // the oracle widens the same product to HUGEINT (see
    // [[temperatureBudgetCtes]]) so both engines stay exact.
    val budgets = weights.collect {
      case (d, wd) if wd > 0L =>
        d -> (BigInt(totalBudget) * wd / totalW).toLong
    }.toSeq
    sampleToTokenBudget(df.where(col(domainCol).isin(
      budgets.map(_._1): _*)), idCol, domainCol, tokenCol, budgets, 0L, salt)
  }

  /** Temperature-budget CTEs for [[sampleToTemperature]]'s oracle:
    * ends with `tbudget(domain, b)` in scope, rederiving isqrt weights
    * and budgets IN SQL from the same integer arithmetic. `srcSql`
    * must expose (domain, tokens) per row. */
  def temperatureBudgetCtes(srcSql: String, domainExpr: String,
                            tokenExpr: String, totalBudget: Long): String =
    s"""tsrc AS (SELECT $domainExpr AS domain, $tokenExpr AS tokens
       |         FROM ($srcSql)),
       |tavail AS (SELECT domain, cast(sum(tokens) AS BIGINT) AS avail
       |           FROM tsrc GROUP BY domain),
       |tw AS (SELECT domain, cast(floor(sqrt(avail)) AS BIGINT) AS wd
       |       FROM tavail),
       |tbudget AS (SELECT domain,
       |              cast(cast($totalBudget AS HUGEINT) * wd
       |                   // (SELECT sum(wd) FROM tw) AS BIGINT) AS b
       |            FROM tw WHERE wd > 0)""".stripMargin

  /** Deterministic global SHUFFLE-SHARD of a corpus — the final step
    * before training: every row gets a shard in [0, nShards) and a
    * dense position within its shard, both pure functions of the row
    * id (two INDEPENDENT salted hash streams, so shard assignment and
    * within-shard order are statistically unrelated), reproducible on
    * any engine under any partitioning. Emits the input plus
    * (shard, pos) with pos 0-based dense per shard.
    *
    * Scale shape: one hash exchange on shard for the position window —
    * shards are the parallel unit downstream, so this exchange IS the
    * final layout write's partitioning (write partitionBy(shard) reuses
    * it); nShards sizes files for the training reader, the same knob
    * as ZOrder.writeZOrderedN's `files`.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    salt: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    // "shard"/"pos" are RESERVED output names: withColumn would silently
    // overwrite same-named input columns, corrupting the caller's data.
    require(!df.columns.contains("shard") && !df.columns.contains("pos"),
      "shuffleShards reserves output columns 'shard' and 'pos'; " +
        "rename or drop them on the input first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(rowHash(df, col(idCol), salt + ":order"), col(idCol))
    df.withColumn("shard", pmod(rowHash(df, col(idCol), salt), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** TOKEN-BALANCED shards — the anti-straggler layout: distributed
    * training wants every rank's shard to carry the same TOKEN mass,
    * and [[shuffleShards]]' hash assignment only concentrates to that
    * by law of large numbers (relative imbalance ~ 1/√(docs/shard) —
    * fine at millions of docs per shard, a straggler risk below that).
    * This variant makes balance a construction: docs partition into
    * log2-length buckets × hash stripes, and each (bucket, stripe)
    * cell ROUND-ROBINS its docs across all shards in salted-hash
    * order. Every cell hands each shard an equal count (±1) of docs
    * whose token counts differ by < 2× (the bucket width), so the
    * per-shard mass differs by at most (#cells × bucket max) — a
    * deterministic bound, no tail risk, reproducible on any engine.
    *
    * Scale shape: ONE window exchange on (bucket, stripe) —
    * bounded-cardinality keys (≈ log(maxLen) × nStripes cells) whose
    * per-cell rank work is a counter. Each cell's round-robin leaves a
    * ±1-doc remainder, so the worst-case shard spread is
    * Σ_cells max-doc-tokens-in-cell — nStripes is therefore the
    * PARALLELISM vs BALANCE knob (more stripes = more parallel cells =
    * a proportionally wider additive bound; nStripes = 1 gives the
    * tightest layout and one task per length bucket). Deterministic
    * for a FIXED corpus on any engine/partitioning — but rank-based,
    * so unlike [[shuffleShards]] it is NOT subset-stable: editing the
    * corpus reassigns docs within the affected cells. Re-shard after
    * edits and let the manifest (q165's discipline) version the
    * layout.
    */
  def balancedShards(df: DataFrame, idCol: String, tokenCol: String,
                     nShards: Int, nStripes: Int = 32,
                     salt: String = "bshard"): DataFrame = {
    require(nShards >= 1 && nStripes >= 1,
      s"positive nShards/nStripes required: $nShards/$nStripes")
    require(!df.columns.contains("shard"),
      "balancedShards reserves output column 'shard'")
    val bucket = expr(s"cast(floor(log2(greatest($tokenCol, 1))) AS BIGINT)")
    val stripe = pmod(rowHash(df, col(idCol), salt + ":stripe"),
      lit(nStripes.toLong))
    val bCol = freshCol(df, "_bkt")
    val sCol = freshCol(df, "_str")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bCol), col(sCol))
      .orderBy(rowHash(df, col(idCol), salt + ":order"), col(idCol))
    // Each cell's round-robin starts at a cell-keyed hash OFFSET: with
    // a common start, every cell's remainder docs (rank ≥ n·⌊size/n⌋)
    // would land on shards 0,1,… — a systematic low-shard bias that
    // ADDS across cells. Rotating per cell spreads the remainders.
    val cellOff = Dedup.hash64(concat(lit(salt + ":off:"),
      col(bCol).cast("string"), lit(":"), col(sCol).cast("string")))
    df.withColumn(bCol, bucket).withColumn(sCol, stripe)
      .withColumn("shard",
        pmod(row_number().over(w).cast("long") - 1 + cellOff,
          lit(nShards.toLong)))
      .drop(bCol, sCol)
  }

  /** [[balancedShards]]' assignment in DuckDB SQL (oracle twin): an
    * expression for `shard` given the source exposes (idExpr,
    * tokenExpr) columns. */
  def balancedShardSql(idExpr: String, tokenExpr: String, nShards: Int,
                       nStripes: Int, salt: String = "bshard"): String = {
    val b = s"cast(floor(log2(greatest($tokenExpr, 1))) AS BIGINT)"
    val s2 = s"${rowHashSql(idExpr, salt + ":stripe")} % $nStripes"
    val off = "cast(concat('0x', substr(md5(concat(" +
      s"'$salt:off:', cast($b AS VARCHAR), ':', cast($s2 AS VARCHAR)" +
      ")), 1, 15)) AS BIGINT)"
    s"""(row_number() OVER (
       |    PARTITION BY $b, $s2
       |    ORDER BY ${rowHashSql(idExpr, salt + ":order")}, $idExpr) - 1
       |  + $off) % $nShards""".stripMargin
  }

  /** CURRICULUM-ordered shards: [[shuffleShards]]' layout with the
    * within-shard order keyed by a curriculum column FIRST (ascending —
    * tier 0 = served earliest), hash-shuffled within each tier. The
    * training reader streams each shard in `pos` order and sees
    * easy/high-quality tiers before hard ones — curriculum learning as
    * a pure layout property, no reader-side logic. Shard assignment is
    * the same independent salted hash stream as [[shuffleShards]], so
    * tiers are balanced across shards by construction.
    *
    * Scale shape: identical to [[shuffleShards]] — one hash exchange on
    * shard which IS the layout write's partitioning.
    */
  def curriculumShards(df: DataFrame, idCol: String, nShards: Int,
                       curriculum: Column, salt: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("shard") && !df.columns.contains("pos"),
      "curriculumShards reserves output columns 'shard' and 'pos'; " +
        "rename or drop them on the input first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(curriculum, rowHash(df, col(idCol), salt + ":order"), col(idCol))
    df.withColumn("shard", pmod(rowHash(df, col(idCol), salt), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** THE TRAINING-READY EXPORT: write [[shuffleShards]]' layout to disk
    * as the artifact a training run actually consumes — a hive-
    * partitioned parquet tree `path/shard=N/` whose files, within each
    * shard, hold rows in shuffled `pos` order. Returns the read-back
    * DataFrame so callers (q129) can probe the PERSISTED layout, the
    * q128/q105 write-the-artifact-in-query discipline.
    *
    * Scale shape — the claim at [[shuffleShards]] made real: NO
    * repartition sits between the window and the write, so the window's
    * single hash exchange on `shard` IS the write partitioning — each
    * task owns whole shards and `partitionBy(shard)` emits exactly one
    * file per (shard, task) instead of nShards slivers per task
    * (PlanSpec pins the one-exchange plan). Within a task, WindowExec
    * emits rows in its required sort order (shard, order-hash, id) =
    * (shard, pos) order, so files are laid down in reading order and a
    * training reader streams them sequentially; `maxRecordsPerFile` is
    * the file-size knob (same as [[graft.ingest.Sinks.mart]]'s) when
    * one file per shard is too coarse at 100 TB.
    */
  def writeTrainingShards(df: DataFrame, idCol: String, nShards: Int,
                          path: String, salt: String = "shard",
                          maxRecordsPerFile: Long = 0L): DataFrame = {
    val sharded = shuffleShards(df, idCol, nShards, salt)
    val w = sharded.write.mode("overwrite")
    (if (maxRecordsPerFile > 0L) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).partitionBy("shard").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** The running-total window in DuckDB SQL — oracle building block for
    * [[sampleToTokenBudget]] (same hash order, same inclusive frame). */
  def cumTokensSql(idExpr: String, domainExpr: String, tokenExpr: String,
                   salt: String): String =
    s"""sum($tokenExpr) OVER (PARTITION BY $domainExpr
       |  ORDER BY ${rowHashSql(idExpr, salt)}, $idExpr
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
}
