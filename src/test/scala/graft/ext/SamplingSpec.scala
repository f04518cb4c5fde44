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
}
