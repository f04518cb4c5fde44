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
}
