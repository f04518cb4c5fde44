package graft.mart

import java.nio.file.Files

import graft.SparkSuite

class TextIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark join spark filter"),
    (2L, "join merge sort"),
    (3L, "spark  scan"), // double space → empty token dropped
    (4L, "unrelated words only")
  ).toDF("doc_id", "text")

  test("index carries term frequencies and drops empty tokens") {
    val idx = TextIndex.build(docs).as[(String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(idx(("spark", 1L)) == 2) // tf, not just presence
    assert(idx(("join", 2L)) == 1)
    assert(!idx.keySet.exists(_._1.isEmpty))
  }

  test("conjunctive search returns only docs containing every term") {
    val hits = TextIndex.search(TextIndex.build(docs), Seq("spark", "join"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 3L)) // doc 1: spark×2 + join×1
  }

  test("ranked search scores tf·idf with the exact integer idf and ranks deterministically") {
    // corpus: 4 docs. df(spark)=2, df(join)=2, df(scan)=1; N=4
    // idf = (N*1000) div df → spark/join 2000, scan 4000
    val got = TextIndex.rankedSearch(TextIndex.build(docs),
      Seq("spark", "join", "scan"), topK = 10)
      .as[(Long, Long, Long)].collect().toList
    val want = List(
      (1L, 2L * 2000 + 1L * 2000, 1L), // spark×2 + join×1 = 6000
      (3L, 1L * 2000 + 1L * 4000, 2L), // spark×1 + scan×1 = 6000, id tiebreak
      (2L, 1L * 2000, 3L))             // join×1
    assert(got == want)
  }

  test("ranked search with no matching terms is empty, no crash") {
    assert(TextIndex.rankedSearch(TextIndex.build(docs),
      Seq("absent", "tokens"), topK = 5).count() == 0)
  }

  test("ranked search topK truncates below the cut") {
    val got = TextIndex.rankedSearch(TextIndex.build(docs),
      Seq("spark", "join", "scan"), topK = 1)
      .as[(Long, Long, Long)].collect().toList
    assert(got.map(_._1) == List(1L) && got.head._3 == 1L)
  }

  test("bm25: integer formula matches a driver-side evaluation; length norm + saturation behave") {
    // d1: term once, short; d2: term once, LONG; d3: term many times, short
    val d = Seq(
      (1L, "needle alpha beta"),
      (2L, "needle " + Seq.fill(37)("filler").mkString(" ")),
      (3L, Seq.fill(8)("needle").mkString(" ") + " gamma"),
      (4L, "unrelated content entirely")
    ).toDF("doc_id", "text")
    val idx = TextIndex.build(d)
    val got = TextIndex.bm25Search(idx, Seq("needle"), topK = 10)
      .as[(Long, Long, Long)].collect().toList

    // driver-side replay of the exact spec
    val tfs = Map(1L -> 1L, 2L -> 1L, 3L -> 8L)
    val dls = Map(1L -> 3L, 2L -> 38L, 3L -> 9L, 4L -> 3L)
    val n = 4L; val tl = dls.values.sum; val a = (10L * tl) / n
    val idf = (n * 1000L) / 3L // df(needle) = 3
    def score(id: Long) = {
      val tf = tfs(id); val dl = dls(id)
      (idf * 22L * tf * a) / (10L * a * tf + 3L * a + 90L * dl)
    }
    val want = tfs.keys.map(id => (id, score(id)))
      .toList.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1L) }
    assert(got == want)
    // length normalization: equal tf, longer doc scores strictly lower
    assert(score(1L) > score(2L))
    // saturation: 8× the tf yields far less than 8× the score
    assert(score(3L) < 8L * score(1L))
    // but more evidence still ranks higher
    assert(score(3L) > score(1L))
  }

  test("bm25 past the long bound: DECIMAL widening reproduces exact BigInt scores, no silent overflow") {
    // token frequencies sized so the per-term product idf·22·tf·A lands
    // near 10³⁴ — far past 2⁶³, where the old long formula wrapped
    // SILENTLY. bm25Search takes the index relation directly, so the
    // pathological corpus is three synthetic posting rows, not 10⁷ docs.
    val idx = Seq(
      (1L, "needle", 100000000000000L), // 10^14
      (1L, "hay", 200000000000000L),
      (2L, "needle", 50000000000000L),
      (3L, "hay", 300000000000000L)
    ).toDF("doc_id", "token", "tf")
    val got = TextIndex.bm25Search(idx, Seq("needle"), topK = 10)
      .as[(Long, Long, Long)].collect().toList

    // exact replay in BigInt — the arithmetic the engine must reproduce
    val tfs = Map(1L -> BigInt("100000000000000"), 2L -> BigInt("50000000000000"))
    val dls = Map(1L -> BigInt("300000000000000"), 2L -> BigInt("50000000000000"))
    val n = BigInt(3)
    val tl = BigInt("650000000000000") // corpus token total
    val a = (BigInt(10) * tl) / n
    val idf = (n * 1000) / 2 // df(needle) = 2
    def score(id: Long): BigInt = {
      val tf = tfs(id); val dl = dls(id)
      (idf * 22 * tf * a) / (BigInt(10) * a * tf + 3 * a + 90 * dl)
    }
    // the fixture bites: the numerator really is beyond the long range
    assert(idf * 22 * tfs(1L) * a > BigInt(Long.MaxValue))
    val want = tfs.keys.map(id => (id, score(id).toLong)).toList
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1L) }
    assert(got == want)
  }

  test("rrf fusion: agreement across rankers beats a single high rank; exact contributions") {
    val l1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val l2 = Seq((20L, 1L), (30L, 2L), (40L, 3L)).toDF("doc_id", "rank")
    val got = TextIndex.rrfFuse(Seq(l1, l2), kRrf = 60, topK = 10)
      .as[(Long, Long, Long, Long)].collect().toList
    def c(r: Long) = 1000000L / (60L + r)
    val want = List(
      (20L, c(2) + c(1), 2L), (30L, c(3) + c(2), 2L),
      (10L, c(1), 1L), (40L, c(3), 1L))
      .sortBy { case (id, s, _) => (-s, id) }
      .zipWithIndex.map { case ((id, s, n), i) => (id, s, n, i + 1L) }
    assert(got == want)
    // consensus (ranks 2+1) outranks a lone rank-1
    assert(got.head._1 == 20L)
  }

  test("bm25 with absent terms and rrf over an empty list are empty, no crash") {
    assert(TextIndex.bm25Search(TextIndex.build(docs),
      Seq("absent", "tokens"), topK = 5).count() == 0)
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "rank")
    val l1 = Seq((10L, 1L)).toDF("doc_id", "rank")
    val fused = TextIndex.rrfFuse(Seq(l1, empty), kRrf = 60, topK = 5)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(fused == List((10L, 1000000L / 61L, 1L, 1L)))
    assert(TextIndex.rrfFuse(Seq(empty), topK = 5).count() == 0)
  }

  test("vocabulary prunes by minCount, caps size, assigns dense ids in rank order") {
    val many = Seq(
      (1L, "a a a a b b b c c d"),
      (2L, "a b c e")
    ).toDF("doc_id", "text")
    val vocab = TextIndex.vocabulary(TextIndex.build(many), minCount = 2L, maxSize = 2)
      .as[(String, Long, Long)].collect().toList
    // counts: a=5 b=4 c=3 d=1 e=1 → minCount 2 keeps a,b,c; cap 2 keeps a,b
    assert(vocab == List(("a", 5L, 0L), ("b", 4L, 1L)))
  }

  test("trigram substring search equals a direct contains() scan") {
    val corpus = Seq(
      (1L, "spark joins the batch"),           // 1: "spark joins" ⊃ needle
      (2L, "sparkling spark join spark join"), // 2 occurrences
      (3L, "park join"),                       // shares trigrams, no match
      (4L, "spa rk join")                      // broken by the space
    ).toDF("doc_id", "text")
    val got = TextIndex.substringSearch(
      TextIndex.trigramIndex(corpus), corpus, "spark join")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
    // boundary: needle shorter than a trigram is rejected loudly
    val e = intercept[IllegalArgumentException] {
      TextIndex.substringSearch(TextIndex.trigramIndex(corpus), corpus, "sp")
    }
    assert(e.getMessage.contains("3"))
  }

  test("persisted trigram index answers probes with a tri-pushed scan") {
    val corpus = Seq((1L, "spark join here"), (2L, "nothing else")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("tri_index").toString + "/idx"
    TextIndex.persist(TextIndex.trigramIndex(corpus), path, cluster = "tri")
    val reread = spark.read.parquet(path)
    val q = TextIndex.substringSearch(reread, corpus, "spark join")
    assert(q.as[(Long, Long)].collect().toMap == Map(1L -> 1L))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("In(tri,"), plan)
  }

  test("persisted mart answers searches with a token-pushed scan") {
    val path = Files.createTempDirectory("text_index").toString + "/idx"
    TextIndex.persist(TextIndex.build(docs), path)
    val reread = spark.read.parquet(path)
    val q = TextIndex.search(reread, Seq("spark", "join"))
    assert(q.as[(Long, Long)].collect().toMap == Map(1L -> 3L))
    // the term filter must reach the parquet scan — repeated searches
    // probe the index, they do not rescan text
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("In(token, [join,spark]"), plan)
  }

  test("tfidf keywords: distinctive tokens outrank common ones, k bounds each doc") {
    // "spark" appears in 3 of 4 docs (low idf), "merge" in 1 (high idf)
    val kw = TextIndex.tfidfKeywords(TextIndex.build(docs), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getString(1)).toMap
    // doc 2: unique "merge"/"sort" (idf 4000) outrank shared "join"
    // (idf 2000); the tie between them breaks on token bytes
    assert(kw((2L, 1L)) == "merge" && kw((2L, 2L)) == "sort", kw)
    // doc 1: spark tf=2·2000 ties filter tf=1·4000 at 4000 — bytewise
    // tie-break puts "filter" first; shared "join" (2000) is cut
    assert(kw((1L, 1L)) == "filter" && kw((1L, 2L)) == "spark", kw)
    // no doc emits more than topK rows
    val counts = TextIndex.tfidfKeywords(TextIndex.build(docs), topK = 2)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 2L))
  }
}
