package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The session release spine (gates → deduped → edited) must be a pure
  * materialization: byte-equal to the inline chain it replaced in
  * q190/q206/q212, built exactly once per (fixture, session). */
class ReleaseSpineSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("spine store equals the inline gate/dedup/edit chain and builds once") {
    val docs = graft.util.Tables.documents(spark, dir)
    val spine = ReleaseSpine.store(spark, dir)

    // gates: one row per corpus document, parity with the inline flags
    val inlineGates = ReleaseSpine.gateFlags(docs)
    val storedGates = spark.read.parquet(s"$spine/gates")
    assert(storedGates.count() == docs.count())
    assert(rows(storedGates) == rows(inlineGates))

    // deduped: parity with the inline gate+keeper chain
    val inlineDeduped = ReleaseSpine.dedupedOf(docs, inlineGates)
    val storedDeduped = spark.read.parquet(s"$spine/deduped")
    assert(rows(storedDeduped) == rows(inlineDeduped))
    assert(storedDeduped.count() < docs.count()) // the gates actually gate

    // edited: parity with substringRelease over the deduped corpus
    val inlineEdited = TextAnalysis.substringRelease(
      inlineDeduped.select("doc_id", "text"), minLen = 40)
    val storedEdited = spark.read.parquet(s"$spine/edited")
    assert(rows(storedEdited) == rows(inlineEdited))

    // second touch serves the same store without rebuilding
    val before = graft.util.SessionStore.buildCount.get()
    val again = ReleaseSpine.store(spark, dir)
    assert(again == spine)
    assert(graft.util.SessionStore.buildCount.get() == before)
  }
}
