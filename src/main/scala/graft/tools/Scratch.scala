package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway micro-isolation harness for optimization work: times named
  * sub-pipelines of the hot operators with the noop sink (guide §1.4) so
  * per-stage cost is attributed before anything is changed. Not part of
  * any query path.
  *
  * Usage: runMain graft.tools.Scratch <sfDir> <case...>
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cases = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.util.Tables

    def docs = Tables.documents(spark, sfDir)

    def time(name: String)(df: => DataFrame): Unit =
      if (cases.isEmpty || cases.exists(name.startsWith)) {
        // warm-up then 3 timed runs, report min
        def once(): Double = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once()
        val ts = (1 to 3).map(_ => once())
        println(f"[scratch] $name%-32s min ${ts.min}%7.3f s  (${ts.map(t => f"$t%.3f").mkString(", ")})")
      }

    // ── q77 decomposition ────────────────────────────────────────────
    time("simhash16") { graft.ext.Dedup.simhash(docs, 16) }
    time("simhash64") { graft.ext.Dedup.simhash(docs, 64) }
    time("q77_full") { graft.ext.Dedup.simhashHammingPairs(docs, maxDist = 3) }
    time("tokens_only") {
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    }
    time("tokens_md5") {
      graft.functions.Md5Prefix64.register(spark)
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .select(col("doc_id"), graft.ext.Dedup.hash64(col("token")).as("h"))
    }

    // ── q142 / cleanSignals decomposition ────────────────────────────
    time("cleansig_full") { graft.ext.TextAnalysis.cleanSignals(docs) }
    time("cleansig_langonly") {
      docs.select(col("doc_id"),
        graft.ext.TextAnalysis.langGuessExpr(col("text")).as("lang_guess"))
    }
    time("cleansig_reponly") { graft.ext.TextAnalysis.repetitionScore(docs, 2) }
    time("cleansig_pii") {
      val piiCounts = graft.ext.TextAnalysis.PiiPatterns.map { case (name, re, _) =>
        regexp_count(col("text"), lit(re)).cast("long").as(s"n_$name") }
      docs.select(col("doc_id") +: piiCounts: _*)
    }

    // ── q189 / trained router decomposition ──────────────────────────
    time("router_weights") { graft.ext.TextAnalysis.langIdWeights(docs) }
    time("router_full") { graft.ext.TextAnalysis.trainedLangId(docs) }

    // ── KMeans / IVFPQ decomposition ──────────────────────────────────
    def emb = Tables.table(spark, sfDir, "embeddings")
    time("km_fit") { graft.ext.KMeans.fit(emb, 8, 1) }
    time("km_cluster") { graft.ext.KMeans.cluster(emb, 8, 1) }
    time("km_ivfpq_topk") {
      graft.ext.Similarity.ivfpqTopK(emb, dim = 64, nCoarse = 8,
        nQueries = 8, k = 5, m = 4, kSub = 16, iters = 1,
        nprobe = 2, shortlist = 32)
    }
    if (cases.isEmpty || cases.exists("km_ivfpq_build".startsWith)) {
      def once(): Double = {
        val p = graft.ext.Similarity.scratchIndexDir("scratch") + "/idx" +
          System.nanoTime()
        val t0 = System.nanoTime()
        graft.ext.Similarity.buildIvfpqIndex(emb, dim = 64, nCoarse = 8,
          m = 4, kSub = 16, iters = 1, path = p)
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = (1 to 3).map(_ => once())
      println(f"[scratch] km_ivfpq_build                   min ${ts.min}%7.3f s  (${ts.map(t => f"$t%.3f").mkString(", ")})")
    }

    spark.stop()
  }
}
