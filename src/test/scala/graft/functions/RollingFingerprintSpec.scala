package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** RollingFingerprint vs the declarative explode-per-position form it
  * replaced (independent formulation of the same hash), plus short-text
  * null semantics and a codegen-path check.
  */
class RollingFingerprintSpec extends SparkSuite {
  import spark.implicits._

  private val B = RollingFingerprint.Base
  private val M = RollingFingerprint.Mod
  private val G = RollingFingerprint.Gram

  /** Reference: plain Scala over codepoints. */
  private def naive(text: String): Option[(Long, Long)] = {
    val cps = text.codePoints().toArray
    if (cps.length < G) return None
    val hs = cps.sliding(G).map { w =>
      w.zipWithIndex.map { case (c, j) =>
        c.toLong * RollingFingerprint.Powers(j) }.sum % M
    }.toSeq
    Some((hs.min, hs.distinct.size.toLong))
  }

  private def viaSpark(texts: Seq[String]): Map[String, Option[(Long, Long)]] = {
    val fp = RollingFingerprint.rollingFp(spark)(col("text"))
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("text"), fp.as("fp"))
      .collect()
      .map { r =>
        val t = r.getString(0)
        val v = if (r.isNullAt(1)) None
          else Some((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)))
        t -> v
      }.toMap
  }

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaa",           // degenerate: all grams identical
    "abcdefgh",                   // exactly one gram
    "abcdefg",                    // one short of a gram -> null
    "",                           // empty -> null
    "héllo wörld with ünïcode œ", // multi-byte codepoints
    "数据库 query engine 数据库 engine", // CJK codepoints
    ('a' to 'z').mkString * 20)   // long repetitive text

  test("matches an independent naive implementation on varied texts") {
    val got = viaSpark(samples)
    for (t <- samples) assert(got(t) == naive(t), s"mismatch on ${t.take(30)}")
  }

  test("interpreted eval matches codegen eval") {
    // wholestage off forces the interpreted/fallback path
    val key = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val off = viaSpark(samples)
      spark.conf.set(key, "true")
      val on = viaSpark(samples)
      assert(off == on)
    } finally spark.conf.set(key, before)
  }

  test("fingerprint() drops sub-gram docs and emits (doc_id, fp_min, n_grams)") {
    val docs = Seq((1L, "abcdefgh ijklmnop"), (2L, "tiny")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.fingerprint(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val exp = naive("abcdefgh ijklmnop").get
    assert((out.head.getLong(1), out.head.getLong(2)) == exp)
  }
}
