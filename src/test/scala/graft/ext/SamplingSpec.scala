package graft.ext

import graft.SparkSuite

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = (0L until 2000L).toDF("doc_id")
    .withColumn("lang",
      org.apache.spark.sql.functions.expr("element_at(array('en','en','en','de','fr'), cast(doc_id % 5 AS INT) + 1)"))

  test("splits are exhaustive, disjoint, and near the 80/10/10 target") {
    val counts = Sampling.assignSplits(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > 1500 && counts("train") < 1700, counts)
    assert(counts("val") > 120 && counts("val") < 280, counts)
  }

  test("split assignment is per-row stable regardless of input subset") {
    // the defining property vs rand(): a row's split never depends on
    // which other rows are present
    val full = Sampling.assignSplits(docs, "doc_id")
      .where($"doc_id" < 100).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val subset = Sampling.assignSplits(docs.where($"doc_id" < 100), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(full == subset)
  }

  test("stratified rates bind per stratum; unlisted stratum uses default") {
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Seq("en" -> 10, "de" -> 90), defaultPct = 50)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1200 en @10%, 400 de @90%, 400 fr @50% — wide tolerance, the
    // point is the ORDERING en << fr << de despite en being 3x larger
    assert(byLang("en") < byLang("fr") && byLang("fr") < byLang("de"), byLang)
    // different salts give uncorrelated samples: same rates, different rows
    val kept2 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Seq("en" -> 10, "de" -> 90), defaultPct = 50, salt = "other")
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = kept2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids != ids2)
  }

  test("capPerGroup keeps exactly k per large group, all of small groups, stable under repartition") {
    // en: 1200 docs, de/fr: 400 each — cap at 500: en capped exactly,
    // de/fr untouched
    val capped = Sampling.capPerGroup(docs, "doc_id", "lang", k = 500)
    val sizes = capped.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(sizes == Map("en" -> 500L, "de" -> 400L, "fr" -> 400L))
    // deterministic: same survivors regardless of physical layout
    val again = Sampling.capPerGroup(docs.repartition(7), "doc_id", "lang", k = 500)
      .select("doc_id").as[Long].collect().toSet
    assert(again == capped.select("doc_id").as[Long].collect().toSet)
    // a different salt draws a genuinely different sample
    val other = Sampling.capPerGroup(docs, "doc_id", "lang", k = 500, salt = "cap2")
      .select("doc_id").as[Long].collect().toSet
    assert(other != again)
  }

  test("token-budget mix: maximal within-budget prefix, under-budget domains whole, layout-stable") {
    import org.apache.spark.sql.functions._
    val toks = docs.withColumn("n_tokens", lit(10L) + $"doc_id" % 7)
    // en ~12k+ tokens, de/fr ~5k each: budget en=600, default=100000
    val kept = Sampling.sampleToTokenBudget(toks, "doc_id", "lang",
      "n_tokens", Seq("en" -> 600L), defaultBudget = 100000L)
    val sums = kept.groupBy("lang").agg(sum($"n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    // under-budget domains survive whole
    assert(kept.where($"lang" =!= "en").count() == 800)
    // en: within budget, and MAXIMAL — no surviving prefix extends by
    // one more row (every token count is >= 10)
    assert(sums("en") <= 600L && sums("en") > 600L - 17L, sums)
    // deterministic under any physical layout
    val again = Sampling.sampleToTokenBudget(toks.repartition(7), "doc_id",
      "lang", "n_tokens", Seq("en" -> 600L), defaultBudget = 100000L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
    // budget 0 keeps nothing; a pre-existing _cum column survives intact
    assert(Sampling.sampleToTokenBudget(toks, "doc_id", "lang", "n_tokens",
      Nil, defaultBudget = 0L).count() == 0)
    val shadow = toks.withColumn("_cum", lit(42L))
    val out = Sampling.sampleToTokenBudget(shadow, "doc_id", "lang",
      "n_tokens", Seq("en" -> 600L), defaultBudget = 100000L)
    assert(out.columns.contains("_cum") &&
      out.select("_cum").distinct().as[Long].collect().toSeq == Seq(42L))
  }

  test("weighted sample: weight 100 always keeps, 0 never, mid-weights scale") {
    import org.apache.spark.sql.functions._
    val weighted = docs.withColumn("w",
      when($"doc_id" % 4 === 0, 100).when($"doc_id" % 4 === 1, 0).otherwise(30))
    val kept = Sampling.weightedSample(weighted, "doc_id", col("w"))
      .collect().map(r => r.getLong(0)).toSet
    assert((0L until 2000L by 4).forall(kept.contains))       // w=100
    assert((1L until 2000L by 4).forall(id => !kept.contains(id))) // w=0
    val mid = kept.count(_ % 4 >= 2)
    assert(mid > 200 && mid < 400, s"~30% of 1000 expected, got $mid")
    // subset stability: same contract as the other samplers
    val sub = Sampling.weightedSample(weighted.where($"doc_id" < 500),
      "doc_id", col("w")).collect().map(_.getLong(0)).toSet
    assert(sub == kept.filter(_ < 500))
  }

  test("proportional mix: water-filling budgets bind the scarce domain, unlisted domains drop") {
    import org.apache.spark.sql.functions.col
    // en has 1000 tokens available, de only 60; target 1:1 — de binds:
    // T = min(1000*2/1, 60*2/1) = 120, budgets = 60/60
    val rows = ((0L until 100L).map(i => (i, "en", 10L)) ++
      (100L until 106L).map(i => (i, "de", 10L)) ++
      (200L until 210L).map(i => (i, "fr", 10L))) // unlisted → dropped
    val df = rows.toDF("doc_id", "lang", "n_tokens")
    val kept = Sampling.sampleToProportions(df, "doc_id", "lang", "n_tokens",
      Seq("en" -> 1L, "de" -> 1L))
    val byLang = kept.groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 60L, "de" -> 60L), byLang)
    // a listed domain with NO rows makes T = 0 — "30% of nothing"
    assert(Sampling.sampleToProportions(df, "doc_id", "lang", "n_tokens",
      Seq("en" -> 1L, "zh" -> 1L)).count() == 0)
    // weights scale-invariant: 2:2 == 1:1
    val kept22 = Sampling.sampleToProportions(df, "doc_id", "lang", "n_tokens",
      Seq("en" -> 2L, "de" -> 2L)).select("doc_id").as[Long].collect().toSet
    assert(kept22 == kept.select("doc_id").as[Long].collect().toSet)
  }

  test("shuffle shards: dense 0-based positions per shard, independent hash streams, subset-stable order") {
    val n = 2000L
    val out = Sampling.shuffleShards((0L until n).toDF("doc_id"), "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == n)
    assert(out.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions dense per shard
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length.toLong),
        s"shard $s positions not dense")
    }
    // shard sizes roughly balanced (hash-uniform)
    val sizes = out.groupBy(_._2).map(_._2.length)
    assert(sizes.min > 180 && sizes.max < 320, sizes.toSeq.sorted)
    // within-shard ORDER is subset-stable: dropping other rows preserves
    // the relative order of the survivors (the rand()-shuffle property
    // deterministic hashing buys)
    val subset = Sampling.shuffleShards(
      (0L until n).filter(_ % 3 == 0).toDF("doc_id"), "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fullOrder = out.filter(_._1 % 3 == 0).groupBy(_._2)
      .map { case (s, rs) => s -> rs.sortBy(_._3).map(_._1).toSeq }
    val subOrder = subset.groupBy(_._2)
      .map { case (s, rs) => s -> rs.sortBy(_._3).map(_._1).toSeq }
    assert(fullOrder == subOrder)
  }

  test("writeTrainingShards: round trip is lossless, pos dense per shard, files laid in pos order") {
    import org.apache.spark.sql.functions.{col, max => smax, count => scount}
    val df = (1L to 500L).toDF("doc_id").withColumn("payload", col("doc_id") * 7)
    val path = java.nio.file.Files.createTempDirectory("graft_shards")
      .toString + "/layout"
    val back = Sampling.writeTrainingShards(df, "doc_id", nShards = 4, path)
    // lossless round trip
    assert(back.count() == 500)
    assert(back.select("doc_id").as[Long].collect().toSet == (1L to 500L).toSet)
    // pos is dense 0..n-1 within every shard
    val dense = back.groupBy(col("shard"))
      .agg(scount(org.apache.spark.sql.functions.lit(1)).as("n"), smax(col("pos")).as("mx"))
      .as[(Int, Long, Long)].collect()
    assert(dense.length == 4 && dense.forall { case (_, n, mx) => mx == n - 1 })
    // the files-in-reading-order claim: within every physical parquet
    // file, rows sit in ascending pos (the window's sort order survives
    // the write, so a trainer streams files sequentially)
    val shardDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 4)
    for (sd <- shardDirs; f <- sd.listFiles() if f.getName.endsWith(".parquet")) {
      val pos = spark.read.parquet(f.getAbsolutePath)
        .select("pos").as[Long].collect()
      assert(pos.sameElements(pos.sorted), s"file ${f.getName} not in pos order")
    }
  }

  test("isqrt is exact on boundaries, perfect squares, and large longs") {
    for (a <- Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 17L,
        (1L << 31) - 1, 1L << 31, (1L << 45) + 12345L,
        3037000499L * 3037000499L /* largest long square */)) {
      val r = Sampling.isqrt(a)
      assert(r * r <= a, s"isqrt($a) = $r overshoots")
      assert((r + 1) * (r + 1) > a || (r + 1) > 3037000499L,
        s"isqrt($a) = $r undershoots")
    }
    intercept[IllegalArgumentException](Sampling.isqrt(-1L))
  }

  test("temperature mix flattens the head: low-resource share exceeds proportional share") {
    // en is 3/5 of rows; α = 1/2 budgets give it sqrt-weight only
    val withTok = docs.withColumn("n_tokens",
      org.apache.spark.sql.functions.lit(10L))
    val kept = Sampling.sampleToTemperature(withTok, "doc_id", "lang",
      "n_tokens", totalBudget = 5000L)
    val byLang = kept.groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // proportional shares: en 60%, de 20%, fr 20%. Temperature shares:
    // sqrt(12000):sqrt(4000):sqrt(4000) ≈ 46%:27%:27% — de/fr must rise
    // above their proportional 20% of the 5000 budget (1000), en fall
    // below 3000.
    assert(byLang("de") > 1000L && byLang("fr") > 1000L, byLang)
    assert(byLang("en") < 3000L, byLang)
    // every domain stays within its derived budget
    assert(byLang.values.sum <= 5000L, byLang)
  }

  test("temperature mix keeps a domain whole when its budget exceeds availability") {
    // one giant domain, one tiny: the tiny domain's sqrt-share budget
    // exceeds what it has — the prefix cut just keeps all of it
    val d = ((0L until 900L).map(i => (i, "big", 100L)) ++
      (900L until 903L).map(i => (i, "small", 1L)))
      .toDF("doc_id", "lang", "n_tokens")
    val kept = Sampling.sampleToTemperature(d, "doc_id", "lang",
      "n_tokens", totalBudget = 50000L)
    val small = kept.where($"lang" === "small").count()
    assert(small == 3L, s"small domain cut to $small of 3")
  }

  test("curriculum shards: within every shard all tier-0 positions precede tier-1, shard stream unchanged") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val d = docs.withColumn("tier",
      when(col("doc_id") % 3 === 0, lit(0L)).otherwise(lit(1L)))
    // output columns: doc_id, lang, tier, shard, pos → (id, shard, pos, tier)
    val got = Sampling.curriculumShards(d, "doc_id", nShards = 4, col("tier"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2)))
    val byShard = got.groupBy(_._2)
    byShard.foreach { case (shard, rows) =>
      val maxT0 = rows.filter(_._4 == 0L).map(_._3).maxOption.getOrElse(-1L)
      val minT1 = rows.filter(_._4 == 1L).map(_._3).minOption.getOrElse(Long.MaxValue)
      assert(maxT0 < minT1, s"shard $shard: tier-0 max pos $maxT0 >= tier-1 min pos $minT1")
    }
    // shard assignment is the SAME independent hash stream as
    // shuffleShards — the curriculum only reorders within shards
    val plain = Sampling.shuffleShards(docs, "doc_id", nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cur = got.map(t => t._1 -> t._2).toMap
    assert(plain == cur)
  }

  test("balanced shards bound token imbalance where hash shards carry tail risk") {
    import org.apache.spark.sql.functions.{col, expr}
    // heavy-tailed lengths: 960 small docs (~20 tok), 40 big (~2000 tok)
    val d = (0L until 1000L).map { i =>
      (i, if (i % 25 == 3) 2000L + i % 7 else 20L + i % 11)
    }.toDF("doc_id", "n_tokens")
    val got = Sampling.balancedShards(d, "doc_id", "n_tokens",
      nShards = 8, nStripes = 4)
    val mass = got.groupBy("shard").agg(expr("sum(n_tokens)").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mass.keySet == (0L until 8L).toSet, mass)
    // the documented bound: each cell's round-robin remainder is ±1
    // doc, so worst-case spread ≤ Σ_cells max-doc-tokens-in-cell
    // (cells = 2 populated buckets × 4 stripes here)
    val bound = 4 * 2006L + 4 * 30L
    val (mx, mn) = (mass.values.max, mass.values.min)
    assert(mx - mn <= bound, s"spread ${mx - mn} > bound $bound: $mass")
    // nStripes = 1 (the tight-layout knob): one cell per bucket, so
    // the spread collapses to one doc per bucket — near-perfect here
    val tight = Sampling.balancedShards(d, "doc_id", "n_tokens",
        nShards = 8, nStripes = 1)
      .groupBy("shard").agg(expr("sum(n_tokens)").as("m"))
      .collect().map(_.getLong(1))
    assert(tight.max - tight.min <= 2006L + 30L,
      s"tight layout spread ${tight.max - tight.min}")
    // deterministic: same corpus, same assignment
    val again = Sampling.balancedShards(d.repartition(13), "doc_id",
      "n_tokens", nShards = 8, nStripes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val first = got.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(first == again)
  }

  test("band-load histogram pair mass equals the banding join's collision count") {
    import org.apache.spark.sql.functions.{col, count, expr, lit}
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq((1L, base), (2L, base), (3L, base),
      (4L, "other words entirely here now")).toDF("doc_id", "text")
    val hist = Dedup.minhashBands(d, n = 3)
      .groupBy(col("band"), col("m0"), col("m1"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_buckets"))
      .select(expr("sum(sz * (sz - 1) div 2 * n_buckets)").as("p"))
      .collect().head.getLong(0)
    val collisions = Dedup.minhashCandidates(d, n = 3)
      .agg(expr("sum(n_bands)")).collect().head.getLong(0)
    assert(hist == collisions,
      s"forecast $hist != actual banding collisions $collisions")
  }

  test("contamination report: counts leaks per eval doc, excludes self, omits clean eval docs") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "alpha beta gamma delta"),          // shares "alpha beta gamma" with eval 10
      (2L, "zzz alpha beta gamma"),            // also shares it
      (3L, "completely different text here"),  // clean
      (10L, "alpha beta gamma prompt words"),  // eval doc (in corpus)
      (11L, "isolated eval content nothing shared")) // clean eval doc
      .toDF("doc_id", "text")
    val eval = docs.where(col("doc_id") >= 10L)
    val rep = Dedup.contaminationReport(docs, eval, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // eval 10 leaks its "alpha beta gamma" shingle into docs 1 and 2;
    // eval 11 is clean and absent; eval 10's self-match excluded
    assert(rep == Map(10L -> ((2L, 1L))), rep)
  }
}
