package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite

class KMeansSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def embDf(vs: Seq[Seq[Float]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        vs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }),
      schema)

  test("two tight groups separate after training even from bad init") {
    // vec 0 and 1 (the init centroids) are BOTH in group A; Lloyd must
    // still pull one centroid over to group B
    val a = Seq(0.1f, 0.1f); val b = Seq(0.9f, 0.95f)
    def jitter(base: Seq[Float], d: Float) = base.map(_ + d)
    val vs = Seq(a, jitter(a, 0.01f), b, jitter(b, 0.01f), jitter(a, -0.01f),
      jitter(b, -0.01f), jitter(b, 0.02f))
    val got = KMeans.cluster(embDf(vs), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val groupA = Set(0L, 1L, 4L).map(got)
    val groupB = Set(2L, 3L, 5L, 6L).map(got)
    assert(groupA.size == 1 && groupB.size == 1 && groupA != groupB,
      s"expected clean separation, got $got")
  }

  test("empty cluster keeps its previous centroid (k survives)") {
    // vec 2 duplicates vec 0, so in round 1 centroid 2 ties with
    // centroid 0 everywhere and wins nothing (smaller id breaks ties);
    // the codebook must keep it, unchanged, rather than dropping to k-1
    val vs = Seq(Seq(0f, 0f), Seq(1f, 1f), Seq(0f, 0f), Seq(0.05f, 0f), Seq(0.9f, 1f))
    val cents = KMeans.fit(embDf(vs), k = 3, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(cents.size == 3)
    assert(cents(2L) == Seq(0L, 0L))       // carried over verbatim
    assert(cents(0L) != Seq(0L, 0L))       // cluster 0 DID move (mean of 3 pts)
  }

  test("deterministic across runs") {
    val vs = (0 until 40).map(i => Seq((i % 7) * 0.1f, (i % 5) * 0.2f, i * 0.01f))
    def run() = KMeans.cluster(embDf(vs), k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    assert(run() == run())
  }

  test("sessionCluster trains once per key and equals the uncached fit") {
    val vs = (0 until 30).map(i => Seq((i % 3) * 1.0f, (i % 4) * 0.5f))
    val df = embDf(vs)
    val key = s"memo-test-${System.nanoTime()}" // fresh key per spec run
    val before = KMeans.sessionFitCount.get()
    def cached() = KMeans.sessionCluster(df, key, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    val first = cached()
    assert(KMeans.sessionFitCount.get() == before + 1)
    // second call reads the artifact — NO second training run
    assert(cached() == first)
    assert(KMeans.sessionFitCount.get() == before + 1)
    // the cache is semantically invisible: identical to a fresh fit
    val fresh = KMeans.cluster(df, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    assert(first == fresh)
    // a different key is a different artifact (no cross-corpus aliasing)
    val other = KMeans.sessionCluster(df, key + "-b", k = 3, iters = 2)
    assert(other.count() == 30L)
    assert(KMeans.sessionFitCount.get() == before + 2)
  }

  test("sessionCluster fingerprint covers embedding VALUES, not just vec_ids") {
    // fixture regeneration that keeps the same vec_ids but rewrites the
    // vectors must MISS the cache and retrain — a vec_id-only
    // fingerprint would serve the stale assignment (round-10 advice)
    val key = s"content-fp-${System.nanoTime()}"
    val vsA = (0 until 30).map(i => Seq((i % 3) * 1.0f, (i % 4) * 0.5f))
    val vsB = vsA.map(v => v.map(_ + 2.0f)) // same ids, different values
    val before = KMeans.sessionFitCount.get()
    def run(vs: Seq[Seq[Float]]) = KMeans.sessionCluster(embDf(vs), key, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    val a = run(vsA)
    assert(KMeans.sessionFitCount.get() == before + 1)
    val b = run(vsB)
    assert(KMeans.sessionFitCount.get() == before + 2,
      "regenerated embedding values under the same ids must retrain")
    // and the retrained assignment equals a fresh fit on the new data
    assert(b == KMeans.cluster(embDf(vsB), k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap)
    // re-asking with the ORIGINAL data is its own cache entry — no retrain
    assert(run(vsA) == a)
    assert(KMeans.sessionFitCount.get() == before + 2)
  }

  private implicit class ToSorted(xs: Array[(Long, Long)]) {
    def toSortedMap: Seq[(Long, Long)] = xs.sortBy(_._1).toSeq
  }
}
