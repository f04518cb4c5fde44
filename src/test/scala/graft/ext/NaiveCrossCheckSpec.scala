package graft.ext

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Seeded-random cross-checks of the distributed operators against
  * independent pure-Scala reference implementations — the same
  * naive-vs-engine discipline TreeStatsProps applies, for the ops whose
  * engine side needs a SparkSession.
  *
  * Vector components are multiples of 1/100 so quantization to integer
  * thousandths is exact on both sides (no round-half ambiguity).
  */
class NaiveCrossCheckSpec extends SparkSuite {
  import spark.implicits._

  // ── k-means ────────────────────────────────────────────────────────

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def naiveKMeans(vs: Seq[Array[Long]], k: Int, iters: Int): Map[Long, Long] = {
    var cents: Vector[Array[Long]] = (0 until k).map(i => vs(i).clone).toVector
    def assign(): Seq[Int] = vs.map { v =>
      (0 until k).minBy(c => {
        val d = v.zip(cents(c)).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, c.toLong)
      })
    }
    for (_ <- 0 until iters) {
      val a = assign()
      val upd = a.zipWithIndex.groupBy(_._1).map { case (c, members) =>
        val rows = members.map(m => vs(m._2))
        c -> rows.head.indices.map(j => rows.map(_(j)).sum / rows.size).toArray
      }
      cents = (0 until k).map(c => upd.getOrElse(c, cents(c))).toVector
    }
    assign().zipWithIndex.map { case (c, i) => i.toLong -> c.toLong }.toMap
  }

  test("KMeans.cluster matches a pure-Scala Lloyd reference on random data") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val n = 30 + rnd.nextInt(40)
      val dim = 4 + rnd.nextInt(5)
      val k = 2 + rnd.nextInt(4)
      val iters = 1 + rnd.nextInt(3)
      val floats = Seq.fill(n)(Array.fill(dim)((rnd.nextInt(201) - 100) / 100.0f))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          floats.zipWithIndex.map { case (v, i) => Row(i.toLong, v.toSeq) }),
        embSchema)
      val got = KMeans.cluster(df, k, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = naiveKMeans(floats.map(_.map(x => Math.round(x * 1000.0))), k, iters)
      assert(got == want, s"seed=$seed n=$n dim=$dim k=$k iters=$iters")
    }
  }

  // ── n-gram Jaccard ─────────────────────────────────────────────────

  private def naiveJaccard(docs: Seq[(Long, String)], n: Int, tau: Double) = {
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = (sa & sb).size if inter > 0
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= tau
    } yield (a, b) -> j).toMap

  }

  test("ngramJaccardPairs (uncapped) matches a naive all-pairs reference") {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    for (seed <- 1 to 6) {
      val rnd = new Random(100 + seed)
      val docs = (0L until (10L + rnd.nextInt(15))).map { i =>
        i -> Seq.fill(4 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.ngramJaccardPairs(df, n = 2, tau = 0.3, maxDf = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val want = naiveJaccard(docs, n = 2, tau = 0.3)
      assert(got.keySet == want.keySet, s"seed=$seed")
      assert(got.forall { case (k, v) => math.abs(v - want(k)) < 1e-12 }, s"seed=$seed")
    }
  }

  // ── shared spans ───────────────────────────────────────────────────

  /** Reference: maximal matching-token runs ≥ k per (pair, diagonal) —
    * the definition sharedSpans' gram-join + islands merge must equal. */
  private def naiveSpans(docs: Seq[(Long, Array[String])], k: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
    for {
      (ida, ta) <- docs; (idb, tb) <- docs if ida < idb
      d <- -(tb.length - 1) to (ta.length - 1)
    } {
      var i = math.max(0, d)
      val end = math.min(ta.length, tb.length + d)
      while (i < end) {
        if (ta(i) == tb(i - d)) {
          var j = i
          while (j < end && ta(j) == tb(j - d)) j += 1
          if (j - i >= k) out += ((ida, idb, i.toLong, (i - d).toLong, (j - i).toLong))
          i = j
        } else i += 1
      }
    }
    out.toSet
  }

  test("sharedSpans matches the naive maximal-run reference on random small-vocab docs") {
    val words = Vector("a", "b", "c", "d", "e", "f")
    for (seed <- 1 to 5) {
      val rnd = new Random(300 + seed)
      val phrase = Array.fill(6 + rnd.nextInt(5))(words(rnd.nextInt(words.size)))
      val docs = (0L until 10L).map { i =>
        // small vocab → incidental runs; half the docs embed a shared
        // phrase at a random offset → guaranteed long spans too
        val base = Array.fill(15 + rnd.nextInt(15))(words(rnd.nextInt(words.size)))
        val toks = if (i % 2 == 0) {
          val at = rnd.nextInt(base.length)
          base.take(at) ++ phrase ++ base.drop(at)
        } else base
        i -> toks
      }
      val df = docs.map { case (i, t) => (i, t.mkString(" ")) }.toDF("doc_id", "text")
      val got = TextAnalysis.sharedSpans(df, k = 4, maxDf = Int.MaxValue)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == naiveSpans(docs, k = 4), s"seed=$seed")
    }
  }

  // ── BPE training ───────────────────────────────────────────────────

  /** Textbook BPE over a word histogram: count adjacent pairs weighted
    * by word frequency, merge the (freq desc, left, right)-best pair
    * with a greedy left scan, repeat. */
  private def naiveBpe(words0: Map[String, Long], nMerges: Int)
      : Seq[(Long, String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] =
      words0.toSeq.map { case (w, n) => w.split("").toVector -> n }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0L
    var done = false
    while (r < nMerges && !done) {
      val freqs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        freqs((syms(i), syms(i + 1))) += n
      val best = freqs.toSeq.sortBy { case ((l, rr), f) => (-f, l, rr) }.headOption
      best match {
        case Some(((l, rr), f)) if f >= 2 =>
          out += ((r, l, rr, f))
          words = words.map { case (syms, n) =>
            syms.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == l && x == rr)
                acc.init :+ (l + rr)
              else acc :+ x
            } -> n
          }
        case _ => done = true
      }
      r += 1
    }
    out.toSeq
  }

  test("bpeTrain matches the textbook reference on random corpora, exactly and in order") {
    val words = Vector("banana", "bandana", "ananas", "cabana", "nab", "ban")
    for (seed <- 1 to 4) {
      val rnd = new Random(500 + seed)
      val docs = (0L until 40L).map { i =>
        i -> Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")
      }
      val hist = docs.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, ws) => w -> ws.size.toLong }
      val got = TextAnalysis.bpeTrain(docs.toDF("doc_id", "text"), nMerges = 12)
        .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
      assert(got == naiveBpe(hist, 12), s"seed=$seed")
    }
  }

  test("bpeTrain (hybrid in-memory) == bpeTrainRelational on random corpora, incl. early stop") {
    val words = Vector("banana", "bandana", "ananas", "cabana", "nab", "ban")
    for (seed <- 1 to 4) {
      val rnd = new Random(700 + seed)
      val docs = (0L until 25L).map { i =>
        i -> Seq.fill(2 + rnd.nextInt(9))(words(rnd.nextInt(words.size))).mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      // nMerges = 60 overshoots what these corpora support, so both
      // paths must stop early at the SAME rank with the SAME table
      val hy = TextAnalysis.bpeTrain(df, nMerges = 60)
        .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
      val rel = TextAnalysis.bpeTrainRelational(df, nMerges = 60)
        .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
      assert(hy == rel, s"seed=$seed")
      assert(hy.nonEmpty && hy.length < 60, s"seed=$seed: expected early stop")
    }
  }

  test("bpeSegment matches naive application and reconstructs every word losslessly") {
    val words = Vector("banana", "bandana", "ananas", "cabana", "nab", "ban")
    val rnd = new Random(900)
    val docs = (0L until 30L).map { i =>
      i -> Seq.fill(2 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    val hist = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val merges = naiveBpe(hist, 10).map { case (_, l, r, _) => (l, r) }
    def applyNaive(w: String): Vector[String] =
      merges.foldLeft(w.split("").toVector) { case (syms, (l, r)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
          else acc :+ x
        }
      }
    val got = TextAnalysis.bpeSegment(docs.toDF("doc_id", "text"), merges)
      .as[(Long, Long, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    for ((id, text) <- docs) {
      val pieces = text.split(" ").toVector.flatMap(applyNaive)
      assert(got(id) == (pieces.length.toLong, pieces.mkString("|")), s"doc $id")
      // lossless: pieces concatenate back to the original words
      assert(pieces.mkString == text.replace(" ", ""), s"doc $id")
    }
  }

  test("capped jaccard emits a subset of the uncapped pairs with identical scores") {
    val words = Vector("w1", "w2", "w3", "boiler", "plate")
    val rnd = new Random(7)
    val docs = (0L until 25L).map { i =>
      // every doc shares the "boiler plate" bigram — a guaranteed hot shingle
      i -> (Seq.fill(3 + rnd.nextInt(8))(words(rnd.nextInt(3))) ++ Seq("boiler", "plate")).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    def run(maxDf: Int) = Dedup.ngramJaccardPairs(df, n = 2, tau = 0.2, maxDf = maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = run(5)
    val full = run(Int.MaxValue)
    assert(capped.keySet.subsetOf(full.keySet))
    assert(capped.forall { case (k, v) => v == full(k) })  // scores EXACT, not approximated
  }
}
