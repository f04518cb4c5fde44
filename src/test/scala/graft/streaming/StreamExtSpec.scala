package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.ext.{Sampling, TextAnalysis}

/** The extension operators compose with Structured Streaming: split
  * assignment, stratified sampling, and quality scoring are pure
  * projections/filters, so the same code runs unchanged on a stream and
  * produces row-identical output. The per-row-stable hash sampling is
  * what makes this possible — rand() sampling could never pass.
  */
class StreamExtSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType)))

  private def docJson(id: Long, lang: String): String =
    s"""{"doc_id": $id, "lang": "$lang", "text": "the quick data table row value scan doc$id"}"""

  /** split → stratified sample → quality score: the streaming-safe
    * corpus-cleaning chain (all narrow ops). */
  private def transform(docs: DataFrame): DataFrame =
    TextAnalysis.qualityScore(
      Sampling.stratifiedSample(
        Sampling.assignSplits(docs, "doc_id"),
        "doc_id", "lang", Seq("en" -> 80, "de" -> 40), defaultPct = 60))

  test("split+sample+quality chain: stream output == batch output") {
    val src = Files.createTempDirectory("ext_stream_src").toString
    Files.write(java.nio.file.Paths.get(s"$src/f1.json"),
      (0L until 40L).map(i => docJson(i, if (i % 3 == 0) "en" else "de"))
        .mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(s"$src/f2.json"),
      (40L until 80L).map(i => docJson(i, if (i % 2 == 0) "en" else "fr"))
        .mkString("\n").getBytes)

    val q = transform(spark.readStream.schema(schema).json(src))
      .writeStream.format("memory").queryName("ext_stream").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()

    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1).toSeq
    val streamed = canon(spark.table("ext_stream"))
    val batch = canon(transform(spark.read.schema(schema).json(src)))
    assert(streamed.nonEmpty && streamed.size < 80)   // sampling really dropped rows
    assert(streamed == batch)
  }

  test("continuous ANN ingest: foreachBatch(ivfpqIndexAdd) extends a deployed index per micro-batch") {
    import graft.ext.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    def vec(): Array[Float] = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val seedVecs = (0L until 60L).map(i => (i, vec()))
    // vector 99 = a jittered copy of vector 0 — after ingest it must
    // surface as query 0's nearest neighbor through the PERSISTED index
    val streamVecs = (60L until 99L).map(i => (i, vec())) :+
      (99L, seedVecs.head._2.map(x => x + 0.01f))
    val idx = Files.createTempDirectory("stream_ivfpq").toString + "/idx"
    Similarity.buildIvfpqIndex(seedVecs.toDF("vec_id", "embedding"),
      dim = 16, nCoarse = 4, m = 4, kSub = 16, iters = 1, path = idx)

    val embSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def vecJson(id: Long, v: Array[Float]): String =
      s"""{"vec_id": $id, "embedding": [${v.mkString(",")}]}"""
    val src = Files.createTempDirectory("stream_ivfpq_src").toString
    val chk = Files.createTempDirectory("stream_ivfpq_chk").toString
    // the engine-level stream: replay-guarded adds (ivfpqIndexAddBatch),
    // so at-least-once delivery lands exactly-once in the codes
    val q = StreamIngest.maintainAnnIndex(spark, src, chk, idx, dim = 16, m = 4)
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      streamVecs.take(20).map((vecJson _).tupled).mkString("\n").getBytes)
    q.processAllAvailable()
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      streamVecs.drop(20).map((vecJson _).tupled).mkString("\n").getBytes)
    q.processAllAvailable()
    // REDELIVER batch 2's content (a new file, same vectors): the
    // guard must suppress every re-arrived vector
    Files.write(java.nio.file.Paths.get(s"$src/b2_replay.json"),
      streamVecs.drop(20).map((vecJson _).tupled).mkString("\n").getBytes)
    q.processAllAvailable(); q.stop()

    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.count() == 100L * 4) // seed 60 + streamed 40, m=4 codes each
    assert(codes.select("vec_id").distinct().count() == 100L,
      "replayed vectors were double-coded")
    val corpus = (seedVecs ++ streamVecs).toDF("vec_id", "embedding")
    val top = Similarity.ivfpqTopKFromIndex(idx, corpus, dim = 16,
      nQueries = 1, k = 3, m = 4, nprobe = 4, shortlist = 100)
      .where($"q_id" === 0L && $"rank" === 1L)
      .select("vec_id").as[Long].collect()
    assert(top.toSeq == Seq(99L), s"streamed near-dup not found: ${top.toSeq}")
  }

  test("maintained ANN index: compaction bounds files, preserves codes and guards; swap crash recovers") {
    import graft.ext.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    def vec(): Array[Float] = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val seedVecs = (0L until 60L).map(i => (i, vec()))
    val streamVecs = (60L until 100L).map(i => (i, vec()))
    val idx = Files.createTempDirectory("cmp_ivfpq").toString + "/idx"
    val ctl = Files.createTempDirectory("cmp_ivfpq_ctl").toString + "/idx"
    for (p <- Seq(idx, ctl))
      Similarity.buildIvfpqIndex(seedVecs.toDF("vec_id", "embedding"),
        dim = 16, nCoarse = 4, m = 4, kSub = 16, iters = 1, path = p)
    // control: every streamed vector lands in ONE bulk add, no
    // compaction — integer Lloyd's is deterministic, so both indexes
    // share identical frozen codebooks and must agree code-for-code
    Similarity.ivfpqIndexAdd(ctl, streamVecs.toDF("vec_id", "embedding"),
      dim = 16, m = 4)
    def vecJson(id: Long, v: Array[Float]): String =
      s"""{"vec_id": $id, "embedding": [${v.mkString(",")}]}"""
    val src = Files.createTempDirectory("cmp_src").toString
    val chk = Files.createTempDirectory("cmp_chk").toString
    val q = StreamIngest.maintainAnnIndex(spark, src, chk, idx,
      dim = 16, m = 4, compactEvery = 2, filesTarget = 2)
    // four 10-vector batches (bids 0-3; the tick fires at bid 2), then
    // a verbatim REDELIVERY of the last batch (bid 4 — tick fires
    // again): the replay guard must see the batch settled in the
    // POST-REWRITE store
    streamVecs.grouped(10).zipWithIndex.foreach { case (g, i) =>
      Files.write(java.nio.file.Paths.get(s"$src/b$i.json"),
        g.map((vecJson _).tupled).mkString("\n").getBytes)
      q.processAllAvailable()
    }
    Files.write(java.nio.file.Paths.get(s"$src/b_replay.json"),
      streamVecs.drop(30).map((vecJson _).tupled).mkString("\n").getBytes)
    q.processAllAvailable(); q.stop()
    def rel(p: String) = spark.read.parquet(s"$p/codes")
      .select($"vec_id", $"m".cast("long"), $"cluster", $"bucket".cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    assert(rel(idx).length == 100 * 4, "replay double-coded across the rewrite")
    assert(rel(idx).toSet == rel(ctl).toSet,
      "compacted streamed index diverged from the bulk-add control")
    // file count is BOUNDED by the tick, not by batches processed:
    // appends since the last tick (none here) + <= one file per bucket
    def parquetFiles(p: String): Int = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$p/codes"))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    assert(parquetFiles(idx) <= 8,
      s"codes store kept ${parquetFiles(idx)} files after compaction")
    // probe parity through the compacted store
    val corpus = (seedVecs ++ streamVecs).toDF("vec_id", "embedding")
    def probe(p: String) = Similarity.ivfpqTopKFromIndex(p, corpus, dim = 16,
      nQueries = 4, k = 3, m = 4, nprobe = 4, shortlist = 100)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(probe(idx) == probe(ctl))
    // hard-crashed swap window: codes staged aside, live dir absent —
    // readers and the guarded add must both restore before touching
    val hconf = spark.sparkContext.hadoopConfiguration
    val codesP = new org.apache.hadoop.fs.Path(s"$idx/codes")
    val fs = codesP.getFileSystem(hconf)
    assert(fs.rename(codesP, new org.apache.hadoop.fs.Path(s"$idx/codes._compact_old")))
    assert(!fs.exists(codesP))
    assert(probe(idx) == probe(ctl), "reader did not recover the staged swap")
    assert(fs.exists(codesP))
    assert(fs.rename(codesP, new org.apache.hadoop.fs.Path(s"$idx/codes._compact_old")))
    assert(Similarity.ivfpqIndexAddBatch(idx,
      streamVecs.drop(30).toDF("vec_id", "embedding"), dim = 16, m = 4) == 0L,
      "guarded add did not recover the staged swap before its settled probe")
    assert(rel(idx).toSet == rel(ctl).toSet)
  }

  test("maintained flat-PQ index: streamed guarded adds + compaction equal one bulk add") {
    import graft.ext.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    def vec(): Array[Float] = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val seedVecs = (0L until 60L).map(i => (i, vec()))
    val streamVecs = (60L until 100L).map(i => (i, vec()))
    val idx = Files.createTempDirectory("cmp_pq").toString + "/idx"
    val ctl = Files.createTempDirectory("cmp_pq_ctl").toString + "/idx"
    for (p <- Seq(idx, ctl))
      Similarity.buildPqIndex(seedVecs.toDF("vec_id", "embedding"),
        dim = 16, m = 4, kSub = 16, iters = 1, path = p)
    assert(Similarity.pqIndexAddBatch(ctl,
      streamVecs.toDF("vec_id", "embedding"), dim = 16, m = 4) == 40L)
    def vecJson(id: Long, v: Array[Float]): String =
      s"""{"vec_id": $id, "embedding": [${v.mkString(",")}]}"""
    val src = Files.createTempDirectory("cmp_pq_src").toString
    val chk = Files.createTempDirectory("cmp_pq_chk").toString
    val q = StreamIngest.maintainPqIndex(spark, src, chk, idx,
      dim = 16, m = 4, compactEvery = 2, filesTarget = 2)
    streamVecs.grouped(10).zipWithIndex.foreach { case (g, i) =>
      Files.write(java.nio.file.Paths.get(s"$src/b$i.json"),
        g.map((vecJson _).tupled).mkString("\n").getBytes)
      q.processAllAvailable()
    }
    // redelivery against the post-rewrite store (tick fired at bid 2;
    // this is bid 4 — it ticks again after the no-op append)
    Files.write(java.nio.file.Paths.get(s"$src/b_replay.json"),
      streamVecs.drop(30).map((vecJson _).tupled).mkString("\n").getBytes)
    q.processAllAvailable(); q.stop()
    def rel(p: String) = spark.read.parquet(s"$p/codes")
      .select($"vec_id", $"m".cast("long"), $"cluster")
      .as[(Long, Long, Long)].collect()
    assert(rel(idx).length == 100 * 4, "replay double-coded across the rewrite")
    assert(rel(idx).toSet == rel(ctl).toSet)
    def parquetFiles(p: String): Int = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$p/codes"))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    assert(parquetFiles(idx) <= 4,
      s"flat codes store kept ${parquetFiles(idx)} files after compaction")
    val corpus = (seedVecs ++ streamVecs).toDF("vec_id", "embedding")
    def probe(p: String) = Similarity.pqTopKFromIndex(p, corpus, dim = 16,
      nQueries = 4, k = 3, m = 4, shortlist = 100)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(probe(idx) == probe(ctl))
  }
}
