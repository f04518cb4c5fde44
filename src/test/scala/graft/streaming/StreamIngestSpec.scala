package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** Structured-streaming ingest: checkpointed file source + keyed dedup in
  * foreachBatch = the reference crawler's resume + INSERT IGNORE contract
  * (at-least-once delivery, effectively-exactly-once storage).
  */
class StreamIngestSpec extends SparkSuite {

  private def eventJson(id: Long, user: Long): String =
    s"""{"event_id": $id, "ts": "2024-01-01T00:0$user:00.000Z", "user_id": $user, "event_type": "click", "value": 1.5, "props": "{}"}"""

  test("incremental ingest with duplicate replays stays exactly-once on event_id") {
    val src = Files.createTempDirectory("stream_src").toString
    val chk = Files.createTempDirectory("stream_chk").toString
    val out = Files.createTempDirectory("stream_out").toString + "/data"

    Files.write(java.nio.file.Paths.get(s"$src/batch1.json"),
      Seq(eventJson(1, 1), eventJson(2, 1), eventJson(2, 2)).mkString("\n").getBytes)
    val q1 = StreamIngest.ingest(spark, src, chk, out)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == 2) // in-batch dup dropped

    // new file: one genuinely new event + one replay of event 1
    Files.write(java.nio.file.Paths.get(s"$src/batch2.json"),
      Seq(eventJson(1, 3), eventJson(5, 3)).mkString("\n").getBytes)
    val q2 = StreamIngest.ingest(spark, src, chk, out)
    q2.processAllAvailable(); q2.stop()

    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L)) // replayed key not duplicated
  }

  test("per-batch dedup scans only the batch's date partitions, not the whole sink") {
    import org.apache.spark.sql.functions.{col, to_date}
    import spark.implicits._
    val out = Files.createTempDirectory("pruned_out").toString + "/data"
    def row(id: Long, day: Int) =
      (id, java.sql.Timestamp.valueOf(f"2023-12-$day%02d 00:00:00"), 1L, "click", 1.5, "{}")
    // sink holds 28 historical date partitions
    (1 to 28).map(d => row(100L + d, d))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("dt", to_date(col("ts")))
      .write.partitionBy("dt").parquet(out)
    // batch touches ONE date: a replay of event 101 plus a new event
    val batch = Seq(row(101L, 1), row(999L, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val toWrite = StreamIngest.notYetWritten(batch, out)
    assert(toWrite.collect().map(_.getAs[Long]("event_id")).toSeq == Seq(999L))
    // the sink-side scan must carry a dt partition filter — the dedup
    // read is pruned to the batch's dates, not O(sink lifetime)
    val plan = toWrite.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\(dt#\\d+ (=|IN) ".r
    assert(pf.findFirstIn(plan).isDefined, s"no dt partition pruning in:\n$plan")
  }

  test("streaming near-dedup: later micro-batches drop exact AND near corpus matches; parity with batch dedupAgainst") {
    import spark.implicits._
    val src = Files.createTempDirectory("nd_src").toString
    val chk = Files.createTempDirectory("nd_chk").toString
    val out = Files.createTempDirectory("nd_out").toString + "/corpus"
    def docJson(id: Long, text: String): String =
      s"""{"doc_id": $id, "text": "$text"}"""
    def run(): Unit = {
      val q = StreamIngest.ingestNearDedup(spark, src, chk, out, n = 3)
      q.processAllAvailable(); q.stop()
    }
    val t1 = "the quick brown fox jumps over the lazy dog today"
    val t2 = "completely different corpus content about spark queries"
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      Seq(docJson(1, t1), docJson(2, t2)).mkString("\n").getBytes)
    run()
    assert(spark.read.parquet(out).count() == 2)

    // batch 2: an exact dup, a NEAR dup (shares LSH bands with t1), a fresh doc
    val near = s"oh $t1"
    val fresh = "entirely novel text with no overlap whatsoever anywhere else"
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      Seq(docJson(10, t1), docJson(11, near), docJson(12, fresh)).mkString("\n").getBytes)
    run()
    val ids = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 12L), "exact and near dups must be dropped")

    // stream == batch parity: the same micro-batch cleaned by the batch
    // operator against the same pre-batch corpus keeps exactly doc 12
    val batchKept = graft.ext.Dedup.dedupAgainst(
        Seq((10L, t1), (11L, near), (12L, fresh)).toDF("doc_id", "text"),
        Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"), n = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(batchKept == Seq(12L))

    // batch 3: a replay-shaped re-send of doc 12's text under a new id
    // collides with its own appended copy — still exactly-once
    Files.write(java.nio.file.Paths.get(s"$src/b3.json"),
      Seq(docJson(20, fresh), docJson(21, "some genuinely new third batch material here")).mkString("\n").getBytes)
    run()
    val ids3 = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(ids3 == Seq(1L, 2L, 12L, 21L))
  }

  test("watermark-scoped dedup: suppresses in-window duplicates (cross-date too), re-admits after eviction") {
    val src = Files.createTempDirectory("wm_src").toString
    val chk = Files.createTempDirectory("wm_chk").toString
    val out = Files.createTempDirectory("wm_out").toString + "/data"
    def ev(id: Long, ts: String): String =
      s"""{"event_id": $id, "ts": "$ts", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"}"""
    def run(): Unit = {
      val q = StreamIngest.ingestWatermarked(spark, src, chk, out, lateness = "1 day")
      q.processAllAvailable(); q.stop()
    }
    // batch 1: events 1, 2 at T0
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      Seq(ev(1, "2024-01-01T00:00:00Z"), ev(2, "2024-01-01T01:00:00Z")).mkString("\n").getBytes)
    run()
    // batch 2: duplicate of 2 (same ts — in window, suppressed) + a
    // NEXT-DAY duplicate of 1 (still within the 1-day lateness of its
    // first occurrence — suppressed even though its dt differs, the case
    // the per-date anti-join path admits) + event 99 three days out,
    // which advances the watermark past every batch-1 key's expiry
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      Seq(ev(2, "2024-01-01T01:00:00Z"), ev(1, "2024-01-01T20:00:00Z"),
        ev(99, "2024-01-04T00:00:00Z")).mkString("\n").getBytes)
    run()
    // batch 3: event 1 again, after watermark eviction → re-admitted
    Files.write(java.nio.file.Paths.get(s"$src/b3.json"),
      ev(1, "2024-01-04T02:00:00Z").getBytes)
    run()
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 1L, 2L, 99L),
      s"expected in-window dups suppressed and post-eviction re-admit, got $ids")
  }

  test("null-timestamp rows stay inside the exactly-once contract on replay") {
    import org.apache.spark.sql.functions.{col, to_date}
    import spark.implicits._
    val out = Files.createTempDirectory("nullts_out").toString + "/data"
    def row(id: Long, ts: java.sql.Timestamp) = (id, ts, 1L, "click", 1.5, "{}")
    val d1 = java.sql.Timestamp.valueOf("2023-12-01 00:00:00")
    // sink already holds one dated row and one null-ts row (default partition)
    Seq(row(1L, d1), row(2L, null))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("dt", to_date(col("ts")))
      .write.partitionBy("dt").parquet(out)
    // replayed batch: both existing rows (incl. the null-ts one) + one new null-ts
    val batch = Seq(row(1L, d1), row(2L, null), row(3L, null))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ids = StreamIngest.notYetWritten(batch, out)
      .collect().map(_.getAs[Long]("event_id")).toSeq
    assert(ids == Seq(3L), s"replayed null-ts row escaped dedup: $ids")
  }

  test("flatMapGroupsWithState keeps per-user session state across micro-batches") {
    import spark.implicits._
    val src = Files.createTempDirectory("stream_state").toString
    def ev(id: Long, minute: Int): String =
      s"""{"event_id": $id, "ts": "2024-01-01T0${minute / 60}:${f"${minute % 60}%02d"}:00.000Z", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"}"""
    // batch 1: two events 5 minutes apart (one session)
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      Seq(ev(1, 0), ev(2, 5)).mkString("\n").getBytes)
    val stream = spark.readStream.schema(StreamIngest.eventSchema).json(src).as[Event]
    val q = StreamIngest.sessionCounters(stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    q.processAllAvailable()
    // batch 2: one event 90 minutes later → new session, state carried over
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"), ev(3, 95).getBytes)
    q.processAllAvailable(); q.stop()
    val last = spark.sql("select * from sess_out").as[UserSessionUpdate]
      .collect().maxBy(_.events)
    assert(last == UserSessionUpdate(1L, sessions = 2L, events = 3L))
  }

  test("stream-static broadcast enrichment equals the batch join") {
    import spark.implicits._
    val src = Files.createTempDirectory("stream_e").toString
    Files.write(java.nio.file.Paths.get(s"$src/a.json"),
      (1 to 12).map(i => eventJson(i, i % 4)).mkString("\n").getBytes)
    val dim = Seq((0L, "free"), (1L, "pro"), (2L, "team")).toDF("user_id", "tier")
    val stream = spark.readStream.schema(StreamIngest.eventSchema).json(src)
    val q = StreamIngest.enriched(stream, dim, "user_id")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("select * from enrich_out").collect().toSet
    val batch = StreamIngest.enriched(
        spark.read.schema(StreamIngest.eventSchema).json(src), dim, "user_id")
      .select("event_id", "user_id", "tier").collect().toSet
    assert(streamed == batch)
    // user 3 has no dim row — left join keeps it with a null tier
    assert(streamed.exists(r => r.getLong(1) == 3L && r.isNullAt(2)))
  }

  test("stream-stream attribution join equals batch; matches cross micro-batches; window bound holds") {
    val cdir = Files.createTempDirectory("stream_clicks").toString
    val bdir = Files.createTempDirectory("stream_buys").toString
    def ev(id: Long, user: Long, minute: Int): String =
      s"""{"event_id": $id, "ts": "2024-01-01T10:${"%02d".format(minute)}:00.000Z", "user_id": $user, "event_type": "e", "value": 1.0, "props": "{}"}"""
    // batch 1: clicks for users 1 and 2; user 1 purchases in-window
    Files.write(java.nio.file.Paths.get(s"$cdir/a.json"),
      Seq(ev(1, 1, 0), ev(2, 2, 0)).mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(s"$bdir/a.json"),
      Seq(ev(101, 1, 10)).mkString("\n").getBytes)
    val clicks = spark.readStream.schema(StreamIngest.eventSchema).json(cdir)
    val buys = spark.readStream.schema(StreamIngest.eventSchema).json(bdir)
    val q = StreamIngest.attributionJoin(clicks, buys)
      .select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2: user 2's purchase arrives a MICRO-BATCH later but inside
    // the event-time window (buffered click state must match it); user
    // 1's second purchase is outside the 30-minute window
    Files.write(java.nio.file.Paths.get(s"$bdir/b.json"),
      Seq(ev(102, 2, 20), ev(103, 1, 45)).mkString("\n").getBytes)
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("select * from attr_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // unified API: the same function over batch reads is the oracle
    val batch = StreamIngest.attributionJoin(
        spark.read.schema(StreamIngest.eventSchema).json(cdir),
        spark.read.schema(StreamIngest.eventSchema).json(bdir))
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 101L), (2L, 102L))) // 103 outside the window
  }

  test("streaming windowed aggregation matches batch window boundaries") {
    val src = Files.createTempDirectory("stream_w").toString
    Files.write(java.nio.file.Paths.get(s"$src/a.json"),
      (1 to 10).map(i => eventJson(i, i % 3)).mkString("\n").getBytes)
    val stream = spark.readStream.schema(StreamIngest.eventSchema).json(src)
    val q = StreamIngest.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("select * from win_out").collect().toSet
    val batch = graft.ext.EventWindows
      .tumbling(spark.read.schema(StreamIngest.eventSchema).json(src))
      .select("wstart", "event_type", "n").collect().toSet
    assert(streamed == batch)
  }

  test("continuous prep ingest: gate/dedup/decontaminate/budget per batch; stream == sequential batch; corpus never rewritten") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val src = Files.createTempDirectory("prep_src").toString
    val chk = Files.createTempDirectory("prep_chk").toString
    val out = Files.createTempDirectory("prep_out").toString + "/corpus"
    // eval set with distinctive vocabulary (decontamination source)
    val evalDocs = Seq((1000L, "zeta yota kappa sigma omega rho")).toDF("doc_id", "text")
    val budgets = Seq("en" -> 50L)
    val defaultBudget = 40L
    // pick doc ids that land in the TRAIN split, so the only reason a
    // doc can be absent from the corpus is the mechanism under test
    val trainIds = graft.ext.Sampling
      .assignSplits(spark.range(1, 80).toDF("doc_id"), "doc_id")
      .where(col("split") === "train").select("doc_id").as[Long].collect()
    val Seq(id1, id2, id3, id4, id5, id6, id7, id8) = trainIds.take(8).toSeq
    // gate-passing text: >= 20 tokens, long words (quality >= 0.55),
    // marker interleaved (language guess) without repeated-marker grams
    def mkText(marker: String, seed: String): String =
      (1 to 17).map(i => s"${seed}word$i")
        .patch(2, Seq(marker), 0).patch(7, Seq(marker), 0)
        .patch(12, Seq(marker), 0).mkString(" ")
    val e1 = mkText("the", "aa"); val e2 = mkText("the", "bb")
    val e3 = mkText("the", "cc"); val d1 = mkText("der", "dd")
    val near = "oh oh " + e1
    val leak = mkText("the", "ee") + " zeta yota kappa"
    def docJson(id: Long, text: String) = s"""{"doc_id": $id, "text": "$text"}"""
    def run(): Unit = {
      val q = StreamIngest.ingestPrep(spark, src, chk, out, evalDocs,
        budgets, defaultBudget, n = 3)
      q.processAllAvailable(); q.stop()
    }
    // batch 1: two en docs, 20 tokens each — both fit the 50-token budget
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      Seq(docJson(id1, e1), docJson(id2, e2)).mkString("\n").getBytes)
    run()
    val corpus1 = spark.read.parquet(out)
    assert(corpus1.select("doc_id").as[Long].collect().toSet == Set(id1, id2))
    val files1 = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap
    // batch 2: exact dup of e1 (dropped), near-dup of e1 (dropped), an
    // eval-leaking doc (dropped), a short doc (gate-dropped), a fresh en
    // doc (BUDGET-dropped: 50 - 40 spent = 10 < 20 tokens), a de doc
    // (kept under the 40-token default budget)
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      Seq(docJson(id3, e1), docJson(id4, near), docJson(id5, leak),
        docJson(id6, "too short"), docJson(id7, e3), docJson(id8, d1))
        .mkString("\n").getBytes)
    run()
    val corpus2 = spark.read.parquet(out)
    assert(corpus2.select("doc_id").as[Long].collect().toSet == Set(id1, id2, id8),
      "only the de doc survives batch 2")
    // corpus is probed, never rewritten: batch-1 files still there, same bytes
    val files2 = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap
    assert(files1.forall { case (n, len) => files2.get(n).contains(len) },
      "batch-1 corpus files must survive batch 2 untouched")
    // stream == sequential batch application of Prep.prepBatch with the
    // same budget-depletion arithmetic
    val b1df = Seq((id1, e1), (id2, e2)).toDF("doc_id", "text")
    val c1 = graft.ext.Prep.prepBatch(b1df, None, evalDocs, budgets, defaultBudget)
    val spent = c1.groupBy(col("lang_guess"))
      .agg(org.apache.spark.sql.functions.sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val remaining = (budgets.map(_._1) ++ spent.keys).distinct.map { d =>
      d -> math.max(0L, budgets.toMap.getOrElse(d, defaultBudget) - spent.getOrElse(d, 0L))
    }
    val b2df = Seq((id3, e1), (id4, near), (id5, leak),
      (id6, "too short"), (id7, e3), (id8, d1)).toDF("doc_id", "text")
    val c2 = graft.ext.Prep.prepBatch(b2df, Some(c1), evalDocs, remaining, defaultBudget)
    val sequential = (c1.select("doc_id", "text").as[(Long, String)].collect() ++
      c2.select("doc_id", "text").as[(Long, String)].collect()).toSet
    assert(corpus2.select("doc_id", "text").as[(Long, String)].collect().toSet == sequential)
    // replay: re-delivering batch 2 appends nothing (exact tier suppresses)
    Files.write(java.nio.file.Paths.get(s"$src/b3.json"),
      Seq(docJson(id3, e1), docJson(id4, near), docJson(id5, leak),
        docJson(id6, "too short"), docJson(id7, e3), docJson(id8, d1))
        .mkString("\n").getBytes)
    run()
    assert(spark.read.parquet(out).count() == 3, "replay must append nothing")
    // the stats sidecar (what budget depletion reads — batch-count-
    // sized, not a corpus re-aggregate) agrees with the corpus ground
    // truth, and rebuildPrepStats reproduces it exactly
    def statTotals(dir: String) = spark.read.parquet(dir)
      .groupBy("lang_guess")
      .agg(org.apache.spark.sql.functions.sum("tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpusTotals = spark.read.parquet(out).groupBy("lang_guess")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statTotals(StreamIngest.prepStatsDir(out)) == corpusTotals)
    StreamIngest.rebuildPrepStats(spark, out)
    assert(statTotals(StreamIngest.prepStatsDir(out)) == corpusTotals)
  }

  test("continuous shard export: pos dense per shard across batches; exactly-once on replay; stream == sequential") {
    import org.apache.spark.sql.functions.{col, count, lit, max => smax}
    import spark.implicits._
    val src = Files.createTempDirectory("shexp_src").toString
    val chk = Files.createTempDirectory("shexp_chk").toString
    val out = Files.createTempDirectory("shexp_out").toString + "/layout"
    def docJson(id: Long) = s"""{"doc_id": $id, "text": "t$id"}"""
    def run(): Unit = {
      val q = StreamIngest.exportShards(spark, src, chk, out, nShards = 4)
      q.processAllAvailable(); q.stop()
    }
    def denseOk(dir: String): Unit = {
      val d = spark.read.parquet(dir).groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), smax(col("pos")).as("mx"))
        .as[(Int, Long, Long)].collect()
      assert(d.nonEmpty && d.forall { case (_, n, mx) => mx == n - 1 },
        d.mkString(","))
    }
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"),
      (1L to 30L).map(docJson).mkString("\n").getBytes)
    run()
    assert(spark.read.parquet(out).count() == 30)
    denseOk(out)
    val files1 = new java.io.File(out).listFiles
      .filter(_.isDirectory).flatMap(_.listFiles)
      .filter(_.getName.endsWith(".parquet")).map(f => f.getPath -> f.length).toMap
    // batch 2: 30 fresh docs PLUS redeliveries of 5 and 10 — the layout
    // anti-join must suppress the replays, positions must CONTINUE
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"),
      ((31L to 60L) ++ Seq(5L, 10L)).map(docJson).mkString("\n").getBytes)
    run()
    val l2 = spark.read.parquet(out)
    assert(l2.count() == 60)
    assert(l2.select("doc_id").as[Long].collect().toSet == (1L to 60L).toSet)
    denseOk(out)
    // append-only: batch-1 files survive batch 2 byte-identical
    val files2 = new java.io.File(out).listFiles
      .filter(_.isDirectory).flatMap(_.listFiles)
      .filter(_.getName.endsWith(".parquet")).map(f => f.getPath -> f.length).toMap
    assert(files1.forall { case (p, len) => files2.get(p).contains(len) })
    // direct redelivery of an entire already-appended batch: zero rows
    val replayed = StreamIngest.appendShardBatch(
      Seq(5L, 10L).map(i => (i, s"t$i")).toDF("doc_id", "text"), out, nShards = 4)
    assert(replayed == 0L && spark.read.parquet(out).count() == 60)
    // stream == the same batch sequence applied through appendShardBatch
    val out2 = Files.createTempDirectory("shexp_out2").toString + "/layout"
    StreamIngest.appendShardBatch((1L to 30L).map(i => (i, s"t$i")).toDF("doc_id", "text"), out2, 4)
    StreamIngest.appendShardBatch(((31L to 60L) ++ Seq(5L, 10L)).map(i => (i, s"t$i")).toDF("doc_id", "text"), out2, 4)
    def layoutSet(dir: String) = spark.read.parquet(dir)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(layoutSet(out) == layoutSet(out2))
    // the sidecar's next-pos agrees with ground truth, and rebuild
    // reproduces it (crash-recovery contract)
    def nextPos(dir: String) = spark.read.parquet(StreamIngest.shardStatsDir(dir))
      .groupBy("shard").agg(org.apache.spark.sql.functions.sum("n").as("t"))
      .as[(Int, Long)].collect().toMap
    val ground = spark.read.parquet(out).groupBy(col("shard"))
      .agg((smax(col("pos")) + 1).as("t")).as[(Int, Long)].collect().toMap
    assert(nextPos(out) == ground)
    StreamIngest.rebuildShardStats(spark, out)
    assert(nextPos(out) == ground)
    // continuous MANIFEST: per-batch sidecar rows fold (sum/xor
    // additivity) to exactly the manifest of the persisted layout —
    // and the suppressed replay left it untouched
    def mset(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "n_docs", "n_tokens", "checksum")
        .as[(Int, Long, Long, Long)].collect().toSet
    val folded = mset(StreamIngest.readManifest(spark, out).get)
    assert(folded == mset(StreamIngest.manifestOf(spark.read.parquet(out))))
    // crash recovery: rebuild from the layout reproduces the sidecar fold
    StreamIngest.rebuildManifest(spark, out)
    assert(mset(StreamIngest.readManifest(spark, out).get) == folded)
    // sequential-batch path produced the identical manifest
    assert(mset(StreamIngest.readManifest(spark, out2).get) == folded)
  }

  test("continuous quality monitor: per-batch funnels aggregate to the batch funnel (additivity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("qm_src").toString
    val chk = Files.createTempDirectory("qm_chk").toString
    val stats = Files.createTempDirectory("qm_out").toString + "/funnel"
    def dj(id: Long, lang: String, text: String): String =
      s"""{"doc_id": $id, "lang": "$lang", "text": "$text"}"""
    val fill = (1 to 25).map(i => s"w$i").mkString(" ")
    val b1 = Seq(
      dj(1, "de", "the the the " + fill),            // lang_mismatch
      dj(2, "en", "the w1 w2"),                       // too_short
      dj(3, "en", "the " + "p1 p2 " * 15))            // repetitive
    val b2 = Seq(
      dj(4, "en", "the " + (1 to 23).map(i => s"a$i").mkString(" ") + " user@x.com"), // pii
      dj(5, "en", "the " + (1 to 24).map(i => s"b$i").mkString(" ")))                 // kept
    Files.write(java.nio.file.Paths.get(s"$src/b1.json"), b1.mkString("\n").getBytes)
    val q = StreamIngest.monitorQuality(spark, src, chk, stats)
    q.processAllAvailable()
    Files.write(java.nio.file.Paths.get(s"$src/b2.json"), b2.mkString("\n").getBytes)
    q.processAllAvailable(); q.stop()
    def monitoredNow() = StreamIngest.readQualityFunnel(spark, stats)
      .as[(String, String, Long, Long)].collect().toSet
    val monitored = monitoredNow()
    // additivity: summing the per-batch funnels == the batch operator
    // over the union of both batches
    val all = Seq(
      (1L, "de", "the the the " + fill),
      (2L, "en", "the w1 w2"),
      (3L, "en", "the " + "p1 p2 " * 15),
      (4L, "en", "the " + (1 to 23).map(i => s"a$i").mkString(" ") + " user@x.com"),
      (5L, "en", "the " + (1 to 24).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val direct = graft.ext.Prep.filterFunnel(all)
      .as[(String, String, Long, Long)].collect().toSet
    assert(monitored == direct)
    // at-least-once: a batch that crashed after its append but before
    // the checkpoint commit replays and re-appends an IDENTICAL
    // summary — the read-side distinct must fold it (round-15; the
    // bare sum double-counted the batch)
    graft.ext.Prep.filterFunnel(
        Seq((4L, "en", "the " + (1 to 23).map(i => s"a$i").mkString(" ") + " user@x.com"),
          (5L, "en", "the " + (1 to 24).map(i => s"b$i").mkString(" ")))
          .toDF("doc_id", "lang", "text"))
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(1L))
      .coalesce(1).write.mode("append").parquet(stats)
    assert(monitoredNow() == direct, "replayed funnel summary was double-counted")
    // the monitor's batch_id column localizes regressions to a batch
    val perBatch = spark.read.parquet(stats).select("batch_id")
      .as[Long].collect().toSet
    assert(perBatch.size == 2)
  }

  test("sessionCounters: event-time timeout bounds state and closed generations match batch sessionization") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("sess_bound").toString
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ev(id: Long, user: Long, minute: Long): String =
      s"""{"event_id": $id, "ts": "${t0.plusSeconds(minute * 60)}", "user_id": $user, "event_type": "click", "value": 1.0, "props": "{}"}"""
    val stream = spark.readStream.schema(StreamIngest.eventSchema).json(src).as[Event]
    val q = StreamIngest.sessionCounters(stream, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_bound_out")
      .outputMode("update").start()
    // event-time-ordered batches; the 30-min watermark trails each
    // batch's max ts, so earlier users' state times out as later
    // batches arrive. u1 RETURNS at minute 240 — long after its gen-1
    // state evicted — starting a second generation.
    val batches = Seq(
      Seq(ev(1, 1, 0), ev(2, 1, 5)),
      Seq(ev(3, 2, 60), ev(4, 2, 65)),
      Seq(ev(5, 3, 120), ev(6, 3, 125)),
      Seq(ev(7, 4, 180), ev(8, 4, 185)),
      Seq(ev(9, 1, 240)),
      Seq(ev(10, 5, 300), ev(11, 5, 305)),
      // flusher: pushes the watermark past every real user's timeout,
      // then one more batch so the timeouts actually process
      Seq(ev(90, 99, 10000)),
      Seq(ev(91, 99, 10060)))
    batches.zipWithIndex.foreach { case (b, i) =>
      Files.write(java.nio.file.Paths.get(s"$src/b$i.json"),
        b.mkString("\n").getBytes)
      q.processAllAvailable()
    }
    // bounded state: only users whose last event is within one gap of
    // the watermark survive — never the whole population (6 users seen)
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    q.stop()
    assert(stateRows <= 2, s"state store holds $stateRows rows — unbounded?")
    val updates = spark.sql("select * from sess_bound_out").as[UserSessionUpdate]
      .collect().toSeq
    // every real generation CLOSED (emit-and-evict), so lifetime totals
    // are exactly the sum of closed emissions per user
    val closedTotals = updates.filter(u => u.closed && u.user_id != 99L)
      .groupBy(_.user_id)
      .map { case (u, rows) => u -> (rows.map(_.sessions).sum, rows.map(_.events).sum) }
    // batch sessionizer over the same events (same 30-min gap)
    val batchEvents = batches.flatten.map { j =>
      val id = "\"event_id\": (\\d+)".r.findFirstMatchIn(j).get.group(1).toLong
      val ts = "\"ts\": \"([^\"]+)\"".r.findFirstMatchIn(j).get.group(1)
      val user = "\"user_id\": (\\d+)".r.findFirstMatchIn(j).get.group(1).toLong
      (id, java.sql.Timestamp.from(java.time.Instant.parse(ts)), user, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batchTotals = graft.ext.EventWindows.sessions(batchEvents)
      .where(col("user_id") =!= 99L)
      .groupBy(col("user_id"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("s"),
        org.apache.spark.sql.functions.sum("n").as("e"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, s, e) => u -> (s, e) }.toMap
    assert(closedTotals == batchTotals,
      s"stream generations $closedTotals != batch sessionization $batchTotals")
    // the multi-generation user really did split into two generations
    assert(updates.count(u => u.closed && u.user_id == 1L) == 2)
  }

  test("maintainComponents: streamed upserts fold to the batch CC; re-delivered edges are idempotent") {
    import spark.implicits._
    val src = Files.createTempDirectory("cc_src").toString
    val chk = Files.createTempDirectory("cc_chk").toString
    val out = Files.createTempDirectory("cc_out").toString + "/labels"
    def write(name: String, es: Seq[(Long, Long)]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$src/$name"),
        es.map { case (a, b) => s"""{"a": $a, "b": $b}""" }.mkString("\n").getBytes)
      ()
    }
    val q = StreamIngest.maintainComponents(spark, src, chk, out)
    val b1 = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L, 50L -> 51L)
    val b2 = Seq(3L -> 10L, 20L -> 21L) // bridges {1,2,3}–{10,11}
    write("b1.json", b1); q.processAllAvailable()
    write("b2.json", b2); q.processAllAvailable()
    def labels() = StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap
    val want = graft.graph.ConnectedComponents.run((b1 ++ b2).toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(labels() == want)
    // the bridge actually merged across batches
    assert(labels()(11L) == 1L)
    // idempotence law: re-delivered edges recompute their delta against
    // the already-merged labeling — same values, fold unchanged
    write("b3.json", b2); q.processAllAvailable(); q.stop()
    assert(labels() == want)
    // the store is append-only: settled rows were upserted, not rewritten
    // (the log holds per-batch rows; untouched {50,51} has ONE log row)
    val log = spark.read.parquet(out)
    assert(log.where(org.apache.spark.sql.functions.col("id") === 50L).count() == 1L)
  }

  test("maintainComponents: compaction bounds the log; labels and replay law survive it") {
    import spark.implicits._
    val src = Files.createTempDirectory("ccc_src").toString
    val chk = Files.createTempDirectory("ccc_chk").toString
    val out = Files.createTempDirectory("ccc_out").toString + "/labels"
    def write(name: String, es: Seq[(Long, Long)]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$src/$name"),
        es.map { case (a, b) => s"""{"a": $a, "b": $b}""" }.mkString("\n").getBytes)
      ()
    }
    // compactEvery=2: batches 0,1 append; batch 2 appends then compacts
    val q = StreamIngest.maintainComponents(spark, src, chk, out, compactEvery = 2)
    val batches = Seq(
      Seq(1L -> 2L, 10L -> 11L),
      Seq(2L -> 3L, 20L -> 21L),   // chains {1,2,3}
      Seq(3L -> 10L))              // bridges {1,2,3}–{10,11}; triggers compaction
    batches.zipWithIndex.foreach { case (b, i) =>
      write(s"b$i.json", b); q.processAllAvailable()
    }
    def labels() = StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap
    val want = graft.graph.ConnectedComponents.run(batches.flatten.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(labels() == want)
    // post-compaction the log IS the fold: exactly one row per id —
    // the unbounded-history window the round-9 advice flagged is gone
    val log = spark.read.parquet(out)
    assert(log.count() == want.size.toLong)
    assert(log.select("id").distinct().count() == want.size.toLong)
    // replay law still holds across a compaction boundary
    write("b3.json", batches(2)); q.processAllAvailable(); q.stop()
    assert(labels() == want)
  }

  test("maintainSubstringIndex: cross-batch matches accumulate, replay appends nothing, settled index files stay untouched") {
    import spark.implicits._
    val src = Files.createTempDirectory("ssi_src").toString
    val chk = Files.createTempDirectory("ssi_chk").toString
    val out = Files.createTempDirectory("ssi_out").toString + "/store"
    def write(name: String, docs: Seq[(Long, String)]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$src/$name"),
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }
          .mkString("\n").getBytes)
      ()
    }
    val pa = (1 to 10).map(i => s"shared$i").mkString(" ")   // 78 chars
    val pb = (1 to 10).map(i => s"twinxx$i").mkString(" ")
    val b1 = Seq(
      1L -> s"$pa alpha filler one with enough unique tail text here",
      2L -> "completely unrelated long passage without any shared spans at all")
    val b2 = Seq(
      3L -> s"prefix words then $pa and its own different ending text",
      4L -> s"$pb with a unique continuation for document number four",
      5L -> s"$pb plus another distinct tail for document number five")
    val q = StreamIngest.maintainSubstringIndex(spark, src, chk, out)
    write("b1.json", b1); q.processAllAvailable()
    // snapshot the settled index files — later batches must not touch them
    val fpDir = java.nio.file.Paths.get(s"$out/fp")
    def fpFiles() = java.nio.file.Files.walk(fpDir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
    val afterB1 = fpFiles()
    assert(afterB1.nonEmpty)
    write("b2.json", b2); q.processAllAvailable()
    def pairs() = StreamIngest.readSubstringPairs(spark, out)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // parity law: the accumulated log == the one-shot winnowed pass over
    // ALL docs restricted to CROSS-BATCH pairs — (1,3) is cross-batch;
    // (4,5) shares pb but is WITHIN b2 and must not be reported
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val batchOf = (b1.map(_._1 -> 1) ++ b2.map(_._1 -> 2)).toMap
    val oneShotAll: Set[(Long, Long)] = graft.ext.TextAnalysis
      .winnowedSubstringPairs(all, k = 20, w = 21)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val oneShot = oneShotAll.filter { case (a, b) => batchOf(a) != batchOf(b) }
    assert(oneShot == Set(1L -> 3L), s"fixture sanity: $oneShot")
    assert(pairs() == oneShot)
    // b1's settled index files are byte-stable across the b2 append
    afterB1.foreach { case (f, sig) =>
      assert(fpFiles().get(f).contains(sig), s"settled index file $f changed")
    }
    // replay law: re-delivering b2's content appends NOTHING anywhere
    def counts() = (
      spark.read.parquet(s"$out/fp").count(),
      spark.read.parquet(s"$out/texts").count(),
      StreamIngest.readSubstringPairs(spark, out).count())
    val before = counts()
    write("b3.json", b2); q.processAllAvailable(); q.stop()
    assert(counts() == before, s"replay changed the store: $before -> ${counts()}")
    assert(pairs() == oneShot)
    // CONTINUOUS BOILERPLATE REPORT: readTopPassages over the store
    // equals the one-shot q211 rollup over all settled docs — and
    // unlike the cross-batch pairs log, it sees WITHIN-batch
    // duplication too (the pb pair), since the index is batch-agnostic
    val fromIndex = StreamIngest.readTopPassages(spark, out, len = 40,
        minDocs = 2, k = 50)
      .as[(String, Long, Long)].collect().toSet
    val oneShotPassages = graft.ext.TextAnalysis
      .topDuplicatedPassages(all, len = 40, minDocs = 2, k = 50)
      .as[(String, Long, Long)].collect().toSet
    assert(fromIndex == oneShotPassages,
      s"index report ${fromIndex.size} rows != one-shot ${oneShotPassages.size}")
    assert(fromIndex.nonEmpty) // pa and pb windows both qualify
  }

  test("maintained boilerplate counts: store fold == one-shot == fp-fallback; double-append folds") {
    import spark.implicits._
    val out = Files.createTempDirectory("ssi_cnt").toString + "/store"
    val pa = (1 to 10).map(i => s"shared$i").mkString(" ")
    val b1 = Seq(
      1L -> s"$pa alpha filler one with enough unique tail text here",
      2L -> "completely unrelated long passage without any shared spans at all")
    val b2 = Seq(
      3L -> s"prefix words then $pa and its own different ending text",
      4L -> s"$pa duplicated again with its own unique ending number four")
    StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), out, 0L, 40, 20)
    StreamIngest.substringIndexBatch(b2.toDF("doc_id", "text"), out, 1L, 40, 20)
    val want = graft.ext.TextAnalysis.topDuplicatedPassages(
        (b1 ++ b2).toDF("doc_id", "text"), len = 40, minDocs = 2, k = 50)
      .as[(String, Long, Long)].collect().toSet
    assert(want.nonEmpty && want.exists(_._2 == 3L)) // pa spans 3 docs
    def got() = StreamIngest.readTopPassages(spark, out, len = 40,
      minDocs = 2, k = 50).as[(String, Long, Long)].collect().toSet
    assert(got() == want)
    // the counts path is a PURE store fold: prove it never touches the
    // corpus texts or the fp index by hiding both — the report must
    // still be exact from the sidecar alone
    val hconf = spark.sparkContext.hadoopConfiguration
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$out/$s")
    val fs = p("counts").getFileSystem(hconf)
    assert(fs.rename(p("texts"), p("_hidden_texts")))
    assert(fs.rename(p("fp"), p("_hidden_fp")))
    assert(got() == want, "counts path read something beyond the sidecar")
    assert(fs.rename(p("_hidden_texts"), p("texts")))
    assert(fs.rename(p("_hidden_fp"), p("fp")))
    // a pre-r13 store (no counts sidecar) falls back to the
    // fp-candidate path and still reports exactly
    assert(fs.rename(p("counts"), p("_hidden_counts")))
    assert(got() == want, "fp-fallback path diverged from the one-shot")
    assert(fs.rename(p("_hidden_counts"), p("counts")))
    // crash-window double-append: a replayed batch re-appends IDENTICAL
    // delta rows (batch_id included) — the read-side distinct folds them
    val cnt = s"$out/counts"
    val nBefore = spark.read.parquet(cnt).count()
    spark.read.parquet(cnt).where($"batch_id" === 1L).localCheckpoint(true)
      .write.mode("append").parquet(cnt)
    assert(spark.read.parquet(cnt).count() > nBefore) // dup rows landed
    assert(got() == want, "double-appended deltas were double-counted")
  }

  test("counts sidecar upgrade-in-place: a pre-sidecar store backfills before the fold path is trusted") {
    import spark.implicits._
    val out = Files.createTempDirectory("ssi_upg").toString + "/store"
    val pa = (1 to 10).map(i => s"shared$i").mkString(" ")
    val b1 = Seq(
      1L -> s"$pa alpha filler one with enough unique tail text here",
      2L -> s"$pa duplicated early with its own unique ending number two")
    val b2 = Seq(
      3L -> s"prefix words then $pa and its own different ending text")
    StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), out, 0L, 40, 20)
    // simulate the pre-r15 state this fix exists for: texts settled,
    // the counts sidecar ABSENT, meta WITHOUT the completeness flag
    val hconf = spark.sparkContext.hadoopConfiguration
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$out/$s")
    val fs = p("counts").getFileSystem(hconf)
    fs.delete(p("counts"), true)
    val metaOut = fs.create(p("_meta.json"), true)
    try metaOut.write("""{"minLen":40,"k":20}""".getBytes("UTF-8"))
    finally metaOut.close()
    // a genuine pre-r15 store also has no r16 completeness sidecar
    fs.delete(p("_counts_complete.json"), false)
    assert(StreamIngest.readSubstringMeta(spark, out).contains((40, 20)))
    assert(!StreamIngest.readCountsComplete(spark, out))
    def got() = StreamIngest.readTopPassages(spark, out, len = 40,
      minDocs = 2, k = 50).as[(String, Long, Long)].collect().toSet
    // a READ before maintenance resumes must not trust the missing
    // sidecar: candidate fallback, still exact
    val wantB1 = graft.ext.TextAnalysis.topDuplicatedPassages(
        b1.toDF("doc_id", "text"), len = 40, minDocs = 2, k = 50)
      .as[(String, Long, Long)].collect().toSet
    assert(wantB1.nonEmpty && got() == wantB1)
    // reproduce the pre-fix DAMAGE: a post-upgrade batch that appended
    // only its own delta, leaving a PARTIAL sidecar — the backfill must
    // REPLACE it, not compound it (its rows carry a different batch_id,
    // so a read-side distinct cannot fold them away)
    graft.ext.TextAnalysis.passageCountsOf(b2.toDF("doc_id", "text"), 40)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(99L))
      .write.mode("append").parquet(s"$out/counts")
    // post-fix maintenance batch: backfill from settled texts, set the
    // flag, then append this batch's own delta
    StreamIngest.substringIndexBatch(b2.toDF("doc_id", "text"), out, 1L, 40, 20)
    assert(StreamIngest.readCountsComplete(spark, out))
    val want = graft.ext.TextAnalysis.topDuplicatedPassages(
        (b1 ++ b2).toDF("doc_id", "text"), len = 40, minDocs = 2, k = 50)
      .as[(String, Long, Long)].collect().toSet
    assert(got() == want)
    // and the fold really is complete FROM THE SIDECAR ALONE: hide the
    // texts and fp stores — pre-upgrade documents must still be counted
    assert(fs.rename(p("texts"), p("_h_texts")))
    assert(fs.rename(p("fp"), p("_h_fp")))
    assert(got() == want, "upgraded store undercounts pre-upgrade docs")
    assert(fs.rename(p("_h_texts"), p("texts")))
    assert(fs.rename(p("_h_fp"), p("fp")))
  }

  test("counts flag is create-only: _meta.json never rewritten, a lost flag degrades but floor validation survives") {
    import spark.implicits._
    // ADVICE r15: the old flag flip rewrote _meta.json delete-then-
    // rename; a crash in the window left the meta ABSENT, silently
    // disabling the minLen-floor require for every later reader. The
    // r16 format keeps the meta immutable and installs the flag as a
    // separate create-only sidecar — the ONLY torn state is "flag
    // absent", which degrades to the candidate path, never to a
    // validation bypass.
    val out = Files.createTempDirectory("ssi_flag").toString + "/store"
    val pa = (1 to 10).map(i => s"flagshared$i").mkString(" ")
    val b1 = Seq(
      1L -> s"$pa alpha doc with a sufficiently unique trailing text one",
      2L -> s"$pa beta doc carrying its own unique trailing text two")
    StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), out, 0L, 40, 20)
    assert(StreamIngest.readSubstringMeta(spark, out).contains((40, 20)))
    assert(StreamIngest.readCountsComplete(spark, out))
    // crash simulation: the create-only install's only possible torn
    // state — the flag never landed
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$out/$s")
    val fs = p("").getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(p("_counts_complete.json"), false))
    assert(!StreamIngest.readCountsComplete(spark, out))
    // the meta survived (it was never touched) → below-floor reads are
    // STILL refused — the exact hazard the r15 format had
    assert(StreamIngest.readSubstringMeta(spark, out).contains((40, 20)))
    intercept[IllegalArgumentException] {
      StreamIngest.readTopPassages(spark, out, len = 30)
    }
    // the degraded read (candidate fallback) stays exact
    val want = graft.ext.TextAnalysis.topDuplicatedPassages(
        b1.toDF("doc_id", "text"), len = 40, minDocs = 2, k = 50)
      .as[(String, Long, Long)].collect().toSet
    assert(StreamIngest.readTopPassages(spark, out, len = 40, minDocs = 2,
      k = 50).as[(String, Long, Long)].collect().toSet == want)
    // the next maintenance batch re-establishes completeness
    val b2 = Seq(3L -> s"gamma then $pa and its own unique trailing text")
    StreamIngest.substringIndexBatch(b2.toDF("doc_id", "text"), out, 1L, 40, 20)
    assert(StreamIngest.readCountsComplete(spark, out))
    val want2 = graft.ext.TextAnalysis.topDuplicatedPassages(
        (b1 ++ b2).toDF("doc_id", "text"), len = 40, minDocs = 2, k = 50)
      .as[(String, Long, Long)].collect().toSet
    assert(StreamIngest.readTopPassages(spark, out, len = 40, minDocs = 2,
      k = 50).as[(String, Long, Long)].collect().toSet == want2)
  }

  test("readTopPassages folds the counts sidecar once per store content; a mutation invalidates") {
    import spark.implicits._
    // VERDICT r15 item 2: every reader of one store re-shuffled the
    // same counts relation per query (q216 + q224). The fold is now a
    // session artifact keyed on the sidecar's content fingerprint —
    // consumers with different minDocs/k share it; any append or
    // compaction tick moves the fingerprint and re-folds.
    val out = Files.createTempDirectory("ssi_fold").toString + "/store"
    val pa = (1 to 10).map(i => s"foldshared$i").mkString(" ")
    val b1 = Seq(
      1L -> s"$pa alpha doc with a sufficiently unique trailing text one",
      2L -> s"$pa beta doc carrying its own unique trailing text two",
      3L -> s"$pa gamma doc carrying another unique trailing text three")
    StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), out, 0L, 40, 20)
    def top(minDocs: Int) = StreamIngest.readTopPassages(spark, out,
      len = 40, minDocs = minDocs, k = 50)
      .as[(String, Long, Long)].collect().toSet
    val before = graft.util.SessionStore.buildCount.get()
    val got2 = top(2)
    val got3 = top(3)
    assert(graft.util.SessionStore.buildCount.get() - before == 1,
      "two same-content readers paid more than one counts fold")
    def want(rows: Seq[(Long, String)], minDocs: Int) =
      graft.ext.TextAnalysis.topDuplicatedPassages(
          rows.toDF("doc_id", "text"), len = 40, minDocs = minDocs, k = 50)
        .as[(String, Long, Long)].collect().toSet
    assert(got2 == want(b1, 2) && got3 == want(b1, 3))
    // a store mutation (new batch) must invalidate the cached fold
    val b2 = Seq(4L -> s"delta then $pa and its own unique trailing text")
    StreamIngest.substringIndexBatch(b2.toDF("doc_id", "text"), out, 1L, 40, 20)
    assert(top(2) == want(b1 ++ b2, 2),
      "stale session fold served after a store mutation")
    assert(graft.util.SessionStore.buildCount.get() - before == 2)
  }

  test("an all-empty-parts torn texts state heals: the lineage guard skips, the batch proceeds") {
    import spark.implicits._
    // a torn append's visible subset can be ONLY the empty task files
    // (tasks that held zero rows committed before the crash): the
    // texts relation then reads zero rows. max(batch_id) over it is
    // NULL — the guard must skip (nothing settled, nothing to guard),
    // not NPE, and the replayed batch must rebuild the store whole.
    val out = Files.createTempDirectory("ssi_empty").toString + "/store"
    val pa = (1 to 10).map(i => s"emptybp$i").mkString(" ")
    val b0 = Seq(
      1L -> s"$pa doc one with its own sufficiently unique tail words",
      2L -> s"$pa doc two with different sufficiently unique tail words")
    StreamIngest.substringIndexBatch(b0.toDF("doc_id", "text"), out, 0L, 40, 20)
    // simulate the all-empty-parts tear (schema preserved, zero rows)
    val tx = spark.read.parquet(s"$out/texts")
    tx.where(org.apache.spark.sql.functions.lit(false))
      .write.mode("overwrite").parquet(s"$out/texts")
    assert(spark.read.parquet(s"$out/texts").count() == 0L)
    // the replay must proceed (no NPE) and resettle both documents
    StreamIngest.substringIndexBatch(b0.toDF("doc_id", "text"), out, 0L, 40, 20)
    assert(spark.read.parquet(s"$out/texts").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L))
    // and the report over the healed store is exact
    val want = graft.ext.TextAnalysis.topDuplicatedPassages(
        b0.toDF("doc_id", "text"), len = 40, minDocs = 2, k = 50)
      .as[(String, Long, Long)].collect().toSet
    assert(StreamIngest.readTopPassages(spark, out, len = 40, minDocs = 2,
      k = 50).as[(String, Long, Long)].collect().toSet == want)
  }

  test("legacy texts store upgrades in place: rows stamped, guard activates, reads stay exact") {
    import spark.implicits._
    // VERDICT r16 item 4: pre-r15 stores keep appending unstamped
    // two-column texts (parquet dirs must stay schema-uniform), leaving
    // the torn-texts-append exposure open and the lineage guard dead.
    // upgradeLegacyTextsStore stamps every settled row with the -1
    // sentinel in place; afterwards the store must behave exactly like
    // a stamped one.
    val out = Files.createTempDirectory("ssi_upgrade").toString + "/store"
    val pa = (1 to 10).map(i => s"upgradebp$i").mkString(" ")
    val b1 = Seq(
      1L -> s"$pa legacy doc one with its own unique trailing words",
      2L -> s"$pa legacy doc two with different unique trailing words")
    StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), out, 0L, 40, 20)
    // fabricate the legacy shape: drop the stamp column, remove the
    // watermark sidecar (legacy stores predate both)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val legacy = spark.read.parquet(s"$out/texts").drop("batch_id")
      .localCheckpoint(true)
    legacy.write.mode("overwrite").parquet(s"$out/texts")
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_settled_wm.json"), false)
    assert(StreamIngest.readSettledWatermark(spark, out).isEmpty)

    assert(StreamIngest.upgradeLegacyTextsStore(spark, out),
      "an unstamped store must be rewritten")
    val stamped = spark.read.parquet(s"$out/texts")
    assert(stamped.columns.contains("batch_id"))
    assert(stamped.select("batch_id").as[Long].collect().toSet == Set(-1L),
      "every settled row carries the legacy sentinel")
    assert(StreamIngest.readSettledWatermark(spark, out).contains(-1L))
    assert(!StreamIngest.upgradeLegacyTextsStore(spark, out),
      "a second run must be a no-op")

    // post-upgrade maintenance appends STAMPED rows and probes the
    // migrated rows as settled — the cross-batch pairs land
    val b2 = Seq(3L -> s"fresh doc three leads then $pa unique tail words")
    StreamIngest.substringIndexBatch(b2.toDF("doc_id", "text"), out, 7L, 40, 20)
    val pairs = StreamIngest.readSubstringPairs(spark, out)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(pairs == Set((1L, 3L), (2L, 3L)), s"migrated rows must be probed: $pairs")
    assert(StreamIngest.readSettledWatermark(spark, out).contains(7L))
    // and the foreign-lineage guard is now LIVE on the upgraded store
    val ex = intercept[IllegalArgumentException] {
      StreamIngest.substringIndexBatch(
        Seq(4L -> s"doc four then $pa with unique tail words four")
          .toDF("doc_id", "text"), out, 2L, 40, 20)
    }
    assert(ex.getMessage.contains("lineage"))
    // a torn/garbled watermark sidecar must fall back to the exact
    // corpus max — never to a skipped guard — and heal itself
    val wmPath = new org.apache.hadoop.fs.Path(s"$out/_settled_wm.json")
    val os = fs.create(wmPath, true)
    os.write("{garbage".getBytes("UTF-8")); os.close()
    assert(StreamIngest.readSettledWatermark(spark, out).isEmpty)
    val ex2 = intercept[IllegalArgumentException] {
      StreamIngest.substringIndexBatch(
        Seq(5L -> s"doc five then $pa with unique tail words five")
          .toDF("doc_id", "text"), out, 2L, 40, 20)
    }
    assert(ex2.getMessage.contains("lineage"))
    assert(StreamIngest.readSettledWatermark(spark, out).contains(7L),
      "the fallback must heal the sidecar to the exact corpus max")
  }

  test("migration torn between the swap renames heals and completes on re-run") {
    import spark.implicits._
    // the only mid-migration crash window that leaves the texts dir
    // ABSENT: compact staged the original aside (`._compact_old`) and
    // died before installing the rewrite. recoverCompact — run by the
    // migration itself AND by every batch/reader — restores the
    // unstamped original, and the re-run completes the rewrite.
    val out = Files.createTempDirectory("ssi_upgrade_torn").toString + "/store"
    val pa = (1 to 10).map(i => s"tornupbp$i").mkString(" ")
    val b1 = Seq(
      1L -> s"$pa torn doc one with its own unique trailing words",
      2L -> s"$pa torn doc two with different unique trailing words")
    StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), out, 0L, 40, 20)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val legacy = spark.read.parquet(s"$out/texts").drop("batch_id")
      .localCheckpoint(true)
    legacy.write.mode("overwrite").parquet(s"$out/texts")
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_settled_wm.json"), false)
    // crash simulation: original staged aside, rewrite never landed
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$out/texts"),
      new org.apache.hadoop.fs.Path(s"$out/texts._compact_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/texts")))

    assert(StreamIngest.upgradeLegacyTextsStore(spark, out),
      "the re-run must recover the staged copy and complete the rewrite")
    val stamped = spark.read.parquet(s"$out/texts")
    assert(stamped.select("doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "no settled row may be lost across the crash window")
    assert(stamped.select("batch_id").as[Long].collect().toSet == Set(-1L))
    assert(StreamIngest.readSettledWatermark(spark, out).contains(-1L))
  }

  test("pairs probe exclusion is delivery-scoped; foreign-lineage batch ids are refused") {
    import spark.implicits._
    // ADVICE r15: the old probe excluded the corpus on batch_id alone.
    // Batch ids are only unique within one checkpoint lineage — a bid
    // collision with genuinely settled documents silently dropped them
    // from the probe and their cross-batch pairs were never logged
    // (pairs append once per batch: the gap is permanent).
    val out = Files.createTempDirectory("ssi_lineage").toString + "/store"
    val pa = (1 to 10).map(i => s"lineagebp$i").mkString(" ")
    val b0 = Seq(
      1L -> s"$pa settled doc one with its own unique trailing words",
      2L -> s"$pa settled doc two with different unique trailing words")
    val b1 = Seq(
      3L -> s"fresh doc three leads then $pa and unique tail words three")
    StreamIngest.substringIndexBatch(b0.toDF("doc_id", "text"), out, 0L, 40, 20)
    // second delivery REUSES bid 0 (legal: a replay boundary carries
    // the max settled bid). Docs 1/2 are stamped batch_id=0 — under the
    // old bid-only exclusion they vanish from the probe and the cross
    // pairs (3,1)/(3,2) are silently lost; the delivery-scoped
    // composite keeps them probed.
    StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), out, 0L, 40, 20)
    val pairs = StreamIngest.readSubstringPairs(spark, out)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(pairs == Set((1L, 3L), (2L, 3L)),
      s"cross-batch pairs lost under bid collision: $pairs")
    // and a bid BELOW the settled max can only be a foreign lineage —
    // refused loudly instead of corrupting the pair log
    StreamIngest.substringIndexBatch(
      Seq(4L -> s"doc four then $pa with unique tail words four")
        .toDF("doc_id", "text"), out, 2L, 40, 20)
    val ex = intercept[IllegalArgumentException] {
      StreamIngest.substringIndexBatch(
        Seq(5L -> s"doc five then $pa with unique tail words five")
          .toDF("doc_id", "text"), out, 1L, 40, 20)
    }
    assert(ex.getMessage.contains("lineage"))
  }

  test("lineage guard cross-checks the exact corpus max at the bid == watermark boundary") {
    import spark.implicits._
    // ADVICE r17: the sidecar is written LAST in a batch, so a crash
    // after the texts append leaves it one batch stale — and a FOREIGN
    // lineage whose restarted bid equals that stale value would slip
    // past a sidecar-only guard where the old exact-max scan refused.
    // The guard therefore cross-checks the exact corpus max exactly at
    // bid == watermark (the one ambiguous boundary) and heals the
    // sidecar forward.
    val out = Files.createTempDirectory("ssi_wmstale").toString + "/store"
    val pa = (1 to 10).map(i => s"wmstalebp$i").mkString(" ")
    StreamIngest.substringIndexBatch(
      Seq(1L -> s"$pa settled doc one with its own unique trailing words")
        .toDF("doc_id", "text"), out, 0L, 40, 20)
    StreamIngest.substringIndexBatch(
      Seq(2L -> s"$pa settled doc two with different unique tail words")
        .toDF("doc_id", "text"), out, 1L, 40, 20)
    // simulate the crash window: texts for bid=1 are settled but the
    // flag-lands-last sidecar write never happened
    StreamIngest.writeSettledWatermark(spark, out, 0L)
    // foreign bid == stale watermark: a sidecar-only guard admits it;
    // the boundary cross-check must refuse (corpus max is 1 > 0)
    val ex = intercept[IllegalArgumentException] {
      StreamIngest.substringIndexBatch(
        Seq(3L -> s"foreign doc three then $pa unique tail words three")
          .toDF("doc_id", "text"), out, 0L, 40, 20)
    }
    assert(ex.getMessage.contains("lineage"))
    // ... and the cross-check healed the sidecar to the exact max
    assert(StreamIngest.readSettledWatermark(spark, out).contains(1L),
      "the boundary cross-check must heal the stale sidecar forward")
    // a legit same-lineage replay (bid == true settled max) still
    // passes the boundary: cross-check sees corpus max == bid
    StreamIngest.substringIndexBatch(
      Seq(4L -> s"replay doc four then $pa unique tail words four")
        .toDF("doc_id", "text"), out, 1L, 40, 20)
    assert(StreamIngest.readSettledWatermark(spark, out).contains(1L))
  }

  test("substring store: torn appends heal — fp completes, counts never double, pairs stay cross-batch") {
    import spark.implicits._
    // a parquet append that dies mid-job-commit leaves a strict SUBSET
    // of its task files visible; the batch body's writes are sequential
    // jobs (pairs → fp → counts → texts), so a valid torn state is a
    // torn job with every earlier job complete and every later job
    // absent. Three stores, each torn in a different job, must all
    // heal to the untorn control on replay.
    val pa = (1 to 10).map(i => s"crossbp$i").mkString(" ")
    val pb = (1 to 10).map(i => s"withinbp$i").mkString(" ")
    val b0 = Seq(
      1L -> s"$pa early doc one with its own unique trailing words here",
      2L -> s"$pa early doc two with different unique trailing words")
    val b1 = Seq(
      3L -> s"$pa later doc three then $pb and unique tail three",
      4L -> s"also four leads $pa then $pb and unique tail four",
      5L -> s"doc five shares nothing with anyone and has a long tail")
    def run(store: String, batch: Seq[(Long, String)], bid: Long): Unit =
      StreamIngest.substringIndexBatch(batch.toDF("doc_id", "text"),
        store, bid, 40, 20)
    def rewrite(dir: String)(f: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      val cur = spark.read.parquet(dir).localCheckpoint(true)
      f(cur).write.mode("overwrite").parquet(dir)
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    // control: both batches, no tearing
    val ctl = Files.createTempDirectory("ssi_torn_ctl").toString + "/store"
    run(ctl, b0, 0L); run(ctl, b1, 1L)
    def state(store: String) = (
      spark.read.parquet(s"$store/fp").select("doc_id", "pos", "h")
        .as[(Long, Int, Long)].collect().toSet,
      spark.read.parquet(s"$store/texts").select("doc_id", "text")
        .as[(Long, String)].collect().toSet,
      spark.read.parquet(s"$store/counts").distinct()
        .groupBy($"passage").agg(
          org.apache.spark.sql.functions.sum($"n_docs").as("n_docs"),
          org.apache.spark.sql.functions.sum($"n_occ").as("n_occ"))
        .as[(String, Long, Long)].collect().toSet,
      StreamIngest.readSubstringPairs(spark, store)
        .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet,
      StreamIngest.readTopPassages(spark, store, len = 40, minDocs = 2, k = 50)
        .as[(String, Long, Long)].collect().toSet)
    val want = state(ctl)
    // fixture sanity: pb is WITHIN-batch only — it must not be in the
    // pairs log; pa crosses batches for docs 3 and 4
    assert(want._4 == Set(1L -> 3L, 2L -> 3L, 1L -> 4L, 2L -> 4L), want._4)
    assert(want._5.exists(_._1.contains("crossbp")), want._5)

    // S1: fp TORN (half of doc 3's rows), counts and texts of b1 absent
    val s1 = Files.createTempDirectory("ssi_torn1").toString + "/store"
    run(s1, b0, 0L); run(s1, b1, 1L)
    val doc3fp = spark.read.parquet(s"$s1/fp").where($"doc_id" === 3L).count()
    assert(doc3fp >= 2, s"fixture needs >=2 fingerprints for doc 3, got $doc3fp")
    rewrite(s"$s1/fp")(df => df.where($"doc_id" =!= 3L || $"pos" <
      df.where($"doc_id" === 3L).agg(
        org.apache.spark.sql.functions.max($"pos")).head().getInt(0)))
    rewrite(s"$s1/counts")(_.where($"batch_id" === 0L))
    rewrite(s"$s1/texts")(_.where($"doc_id" < 3L))
    run(s1, b1, 1L) // replay
    assert(state(s1) == want, "S1 (torn fp) did not heal to the control")

    // S2: counts TORN (doc 5's rows missing), texts of b1 absent
    val s2 = Files.createTempDirectory("ssi_torn2").toString + "/store"
    run(s2, b0, 0L); run(s2, b1, 1L)
    rewrite(s"$s2/counts")(df =>
      df.where($"batch_id" === 0L || $"doc_id" =!= 5L))
    rewrite(s"$s2/texts")(_.where($"doc_id" < 3L))
    run(s2, b1, 1L)
    assert(state(s2) == want, "S2 (torn counts) did not heal to the control")

    // S3: texts TORN — docs 3 and 5 visible, doc 4 missing. The replay
    // probes only doc 4; without the batch-stamp corpus exclusion it
    // would log the WITHIN-batch pair (3,4) via pa/pb, and without
    // per-doc count deltas it would re-count doc 4's passages
    val s3 = Files.createTempDirectory("ssi_torn3").toString + "/store"
    run(s3, b0, 0L); run(s3, b1, 1L)
    rewrite(s"$s3/texts")(_.where($"doc_id" =!= 4L))
    run(s3, b1, 1L)
    assert(state(s3) == want, "S3 (torn texts) did not heal to the control")
  }

  test("substring store: randomized torn states all heal (8 seeded trials)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    // fuzz over the valid torn-state space: the batch body's writes are
    // sequential jobs (pairs → fp → counts → texts), so a crash tears
    // ONE job (random row subset survives), completes every earlier
    // job, and leaves every later job absent. Whatever the tear, the
    // replay must converge the store to the untorn control.
    def state(store: String) = (
      spark.read.parquet(s"$store/fp").select("doc_id", "pos", "h")
        .as[(Long, Int, Long)].collect().toSet,
      spark.read.parquet(s"$store/texts").select("doc_id")
        .as[Long].collect().toSet,
      spark.read.parquet(s"$store/counts").distinct()
        .groupBy($"passage").agg(
          org.apache.spark.sql.functions.sum($"n_docs").as("n_docs"),
          org.apache.spark.sql.functions.sum($"n_occ").as("n_occ"))
        .as[(String, Long, Long)].collect().toSet,
      StreamIngest.readSubstringPairs(spark, store)
        .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet,
      StreamIngest.readTopPassages(spark, store, len = 40, minDocs = 2, k = 50)
        .as[(String, Long, Long)].collect().toSet)
    def rewrite(dir: String)(f: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      val cur = spark.read.parquet(dir).localCheckpoint(true)
      f(cur).write.mode("overwrite").parquet(dir)
    }
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed * 7919)
      val blocks = (0 to 2).map(b =>
        (1 to 10).map(i => s"s${seed}b$b$i").mkString(" "))
      def doc(id: Long): (Long, String) = {
        val blk = blocks(rnd.nextInt(3))
        (id, s"u${rnd.nextInt(100)} $blk tail${rnd.nextInt(100)} of doc $id")
      }
      val b0 = (1L to 6L).map(doc)
      val b1 = (7L to 12L).map(doc)
      val ctl = Files.createTempDirectory(s"tfz_ctl$seed").toString + "/store"
      val tst = Files.createTempDirectory(s"tfz_tst$seed").toString + "/store"
      for (st <- Seq(ctl, tst)) {
        StreamIngest.substringIndexBatch(b0.toDF("doc_id", "text"), st, 0L, 40, 20)
        StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), st, 1L, 40, 20)
      }
      val want = state(ctl)
      val b1ids = b1.map(_._1).toSet
      def keepRow(): Boolean = rnd.nextBoolean()
      val tornJob = Seq("pairs", "fp", "counts", "texts")(rnd.nextInt(4))
      // tear tornJob (random surviving row subset of batch 1's
      // contribution), truncate every later job's batch-1 rows
      val later = Seq("pairs", "fp", "counts", "texts")
        .dropWhile(_ != tornJob).drop(1)
      val keepIds = b1ids.filter(_ => keepRow())
      tornJob match {
        case "pairs" => rewrite(s"$tst/pairs")(df =>
          df.where($"batch_id" =!= 1L ||
            ($"doc_a".isin(keepIds.toSeq: _*) || $"doc_b".isin(keepIds.toSeq: _*))))
        case "fp" => rewrite(s"$tst/fp")(df =>
          df.where(!$"doc_id".isin(b1ids.toSeq: _*) ||
            $"doc_id".isin(keepIds.toSeq: _*) || $"pos" % 2 === 0))
        case "counts" => rewrite(s"$tst/counts")(df =>
          df.where($"batch_id" =!= 1L || $"doc_id".isin(keepIds.toSeq: _*)))
        case "texts" => rewrite(s"$tst/texts")(df =>
          df.where($"batch_id" =!= 1L || $"doc_id".isin(keepIds.toSeq: _*)))
      }
      later.foreach {
        case "pairs" => rewrite(s"$tst/pairs")(_.where($"batch_id" =!= 1L))
        case "fp" => rewrite(s"$tst/fp")(
          _.where(!c("doc_id").isin(b1ids.toSeq: _*)))
        case "counts" => rewrite(s"$tst/counts")(_.where($"batch_id" =!= 1L))
        case "texts" => rewrite(s"$tst/texts")(_.where($"batch_id" =!= 1L))
      }
      StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), tst, 1L, 40, 20)
      assert(state(tst) == want,
        s"seed $seed: torn $tornJob (kept $keepIds) did not heal")
    }
  }

  test("release store: torn hashes/gates appends heal on replay (seeded trials)") {
    import spark.implicits._
    // the releaseBatch job sequence is late → within-pairs → sub-store
    // → hashes → gates; the sub-store's internal tears are covered by
    // the substring fuzz, so this drives the two release-grain torn
    // states: torn hashes (gates absent) and torn gates (all earlier
    // complete). The heal relies on: gates re-append only missing docs
    // (deterministic per doc under frozen weights), duplicate hashes
    // rows fold in the keeper min, the sub-store guards itself, and
    // the late read max-folds.
    val filler = (1 to 30).map(i => s"uniq$i").mkString(" ")
    def rw(dir: String)(f: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      val cur = spark.read.parquet(dir).localCheckpoint(true)
      f(cur).write.mode("overwrite").parquet(dir)
    }
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 104729)
      val docs = (1L to 14L).map { i =>
        val text =
          if (i % 5 == 0) s"twin text $filler"
          else s"doc $i body ${rnd.nextInt(50)} $filler"
        (i, "en", text)
      }.toDF("doc_id", "lang", "text").localCheckpoint(true)
      val root = Files.createTempDirectory(s"rfz$seed").toString
      graft.ext.TextAnalysis.langIdWeights(docs).write.parquet(s"$root/w")
      val b0 = docs.where($"doc_id" <= 7L)
      val b1 = docs.where($"doc_id" > 7L)
      val b1ids = (8L to 14L).toSeq
      val keep = b1ids.filter(_ => rnd.nextBoolean())
      def state(store: String) = (
        StreamIngest.readReleaseDecisions(spark, store)
          .as[(Long, String)].collect().toMap,
        spark.read.parquet(s"$store/gates").distinct().count(),
        spark.read.parquet(s"$store/hashes")
          .groupBy($"h").agg(org.apache.spark.sql.functions.min($"doc_id"))
          .as[(String, Long)].collect().toSet,
        spark.read.parquet(s"$store/sub/texts").select("doc_id")
          .as[Long].collect().toSet)
      val ctl = Files.createTempDirectory(s"rfz_ctl$seed").toString + "/s"
      StreamIngest.releaseBatch(b0, ctl, s"$root/w", 0L, 40, 20)
      StreamIngest.releaseBatch(b1, ctl, s"$root/w", 1L, 40, 20)
      val want = state(ctl)
      for (torn <- Seq("hashes", "gates")) {
        val st = Files.createTempDirectory(s"rfz_$torn$seed").toString + "/s"
        StreamIngest.releaseBatch(b0, st, s"$root/w", 0L, 40, 20)
        StreamIngest.releaseBatch(b1, st, s"$root/w", 1L, 40, 20)
        torn match {
          case "gates" => rw(s"$st/gates")(df =>
            df.where(!$"doc_id".isin(b1ids: _*) || $"doc_id".isin(keep: _*)))
          case "hashes" =>
            rw(s"$st/hashes")(df =>
              df.where(!$"doc_id".isin(b1ids: _*) || $"doc_id".isin(keep: _*)))
            rw(s"$st/gates")(df => df.where(!$"doc_id".isin(b1ids: _*)))
        }
        StreamIngest.releaseBatch(b1, st, s"$root/w", 1L, 40, 20) // replay
        assert(state(st) == want,
          s"seed $seed: torn $torn (kept $keep) did not heal")
      }
    }
  }

  test("substring meta creation is race-safe: concurrent same-grain creators never wedge or clobber") {
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("ssi_race").toString + "/store"
    // first-contact creation raced from many threads: install is
    // rename-first (never delete-then-rename), so a winner's VALID meta
    // cannot be destroyed by a racing loser; losers validate the
    // winner's grain and proceed. Pre-r15 the delete window could
    // destroy a concurrent creator's freshly-renamed valid meta.
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        try StreamIngest.checkOrWriteSubstringMeta(spark, out, 40, 20)
        catch { case t: Throwable => errs.add(t); () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty,
      s"concurrent creators threw: ${errs.asScala.map(_.getMessage).toList}")
    assert(StreamIngest.readSubstringMeta(spark, out).contains((40, 20)))
    // a different-grain creator is refused AND the valid meta survives
    intercept[IllegalArgumentException] {
      StreamIngest.checkOrWriteSubstringMeta(spark, out, 30, 15)
    }
    assert(StreamIngest.readSubstringMeta(spark, out).contains((40, 20)))
  }

  test("counts additivity is partition-independent: random batchings all fold to the one-shot") {
    import spark.implicits._
    // the law the maintained report rests on: for ANY partition of the
    // corpus into batches, summing per-batch passage rollups equals the
    // one-shot rollup (docs are batch-disjoint ⇒ countDistinct terms
    // sum exactly). Deterministic seeds, 3 random batchings.
    // four shared ~70-char blocks (site chrome) between unique ends —
    // every block's windows are duplicated across ~15 docs
    val blocks = (0 to 3).map(b => (1 to 10).map(i => s"chrome$b$i").mkString(" "))
    def docText(id: Long): String = {
      val rnd = new scala.util.Random(id * 2654435761L)
      s"u${rnd.nextInt(1000)} head ${blocks((id % 4).toInt)} tail " +
        (1 to 4).map(_ => s"x${rnd.nextInt(1000)}").mkString(" ")
    }
    val docs = (1L to 60L).map(i => (i, docText(i)))
    val want = graft.ext.TextAnalysis.topDuplicatedPassages(
        docs.toDF("doc_id", "text"), len = 40, minDocs = 2, k = 100)
      .as[(String, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val nB = 2 + rnd.nextInt(4) // 2..5 batches
      val assign = docs.map { case (id, t) => (rnd.nextInt(nB), id, t) }
      val out = Files.createTempDirectory(s"cnt_prop$seed").toString + "/store"
      (0 until nB).foreach { b =>
        val rows = assign.filter(_._1 == b).map(x => (x._2, x._3))
        if (rows.nonEmpty)
          StreamIngest.substringIndexBatch(rows.toDF("doc_id", "text"),
            out, b.toLong, 40, 20)
      }
      val got = StreamIngest.readTopPassages(spark, out, len = 40,
        minDocs = 2, k = 100).as[(String, Long, Long)].collect().toSet
      assert(got == want, s"seed $seed ($nB batches): fold != one-shot")
    }
  }

  test("substring index: replay of the fp-appended/texts-missing crash window is exactly-once") {
    import spark.implicits._
    val out = Files.createTempDirectory("ssi_crash").toString + "/store"
    val minLen = 40; val k = 20
    val pa = (1 to 10).map(i => s"shared$i").mkString(" ") // 78 chars
    val b1 = Seq(
      1L -> s"$pa alpha filler one with enough unique tail text here",
      2L -> "completely unrelated long passage without any shared spans at all")
    val b2 = Seq(
      3L -> s"prefix words then $pa and its own different ending text",
      4L -> s"$pa duplicated again within batch two unique ending four")
    // settle batch 1 the normal way
    StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), out, 0L, minLen, k)
    // first attempt at batch 2 CRASHES between the fp append and the
    // texts write: pairs written once, fps appended once, texts absent —
    // exactly the window where the old probe re-found the batch's own
    // fingerprints in the index and emitted self/within-batch pairs
    val b2df = b2.toDF("doc_id", "text")
    val settled = spark.read.parquet(s"$out/texts")
    graft.ext.TextAnalysis.substringPairsAgainstIndex(
        b2df, settled, s"$out/fp", minLen, k)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(1L))
      .write.mode("append").parquet(s"$out/pairs")
    graft.ext.TextAnalysis.appendSubstringIndex(b2df, s"$out/fp", minLen, k)
    val fpAfterCrash = spark.read.parquet(s"$out/fp").count()
    // REPLAY the whole batch (the guard keys on texts, which is missing)
    StreamIngest.substringIndexBatch(b2df, out, 1L, minLen, k)
    // fp append was idempotent: nothing landed a second time
    assert(spark.read.parquet(s"$out/fp").count() == fpAfterCrash,
      "replay duplicated fingerprints in the index")
    // no self-pairs, no within-batch pairs: the replayed probe excluded
    // the batch's own crashed-in fingerprints from the index side, so
    // the double-append carries identical rows and distinct() folds it
    val pairs = StreamIngest.readSubstringPairs(spark, out)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set(1L -> 3L, 1L -> 4L), s"pairs after replay: $pairs")
    // texts settled on replay; a further re-delivery is a full no-op
    assert(spark.read.parquet(s"$out/texts").count() == 4)
    val fpN = spark.read.parquet(s"$out/fp").count()
    val prN = spark.read.parquet(s"$out/pairs").count()
    StreamIngest.substringIndexBatch(b2df, out, 1L, minLen, k)
    assert(spark.read.parquet(s"$out/fp").count() == fpN)
    assert(spark.read.parquet(s"$out/pairs").count() == prN)
  }

  test("substring store self-describes: parameter drift and below-floor reads are refused") {
    import spark.implicits._
    val out = Files.createTempDirectory("ssi_meta").toString + "/store"
    val docs = Seq(1L -> ("x" * 60), 2L -> ("y" * 60)).toDF("doc_id", "text")
    StreamIngest.substringIndexBatch(docs, out, 0L, 40, 20)
    assert(StreamIngest.readSubstringMeta(spark, out).contains((40, 20)))
    // resuming maintenance with different winnow parameters fails fast
    // instead of silently mixing guarantee floors in one store
    intercept[IllegalArgumentException] {
      StreamIngest.substringIndexBatch(docs, out, 1L, 30, 15)
    }
    // a below-floor report request is refused instead of returning a
    // silently incomplete report (windows shorter than the floor are
    // not guaranteed a shared fingerprint in the index)
    intercept[IllegalArgumentException] {
      StreamIngest.readTopPassages(spark, out, len = 39)
    }
    // at the floor the report runs (empty here: no shared passages)
    assert(StreamIngest.readTopPassages(spark, out, len = 40).count() == 0)
  }

  test("substring index: opt-in compaction bounds file counts without changing any relation") {
    import spark.implicits._
    val root = Files.createTempDirectory("ssi_cmp").toString
    val (srcA, chkA, outA) = (s"$root/srcA", s"$root/chkA", s"$root/a/store")
    val (srcB, chkB, outB) = (s"$root/srcB", s"$root/chkB", s"$root/b/store")
    Files.createDirectories(java.nio.file.Paths.get(srcA))
    Files.createDirectories(java.nio.file.Paths.get(srcB))
    val pa = (1 to 10).map(i => s"shared$i").mkString(" ")
    def write(dir: String, name: String, docs: Seq[(Long, String)]): Unit = {
      Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }
          .mkString("\n").getBytes)
      ()
    }
    val batches = Seq(
      Seq(1L -> s"$pa alpha filler one with enough unique tail text here",
        2L -> "completely unrelated long passage without any shared spans at all"),
      Seq(3L -> s"prefix words then $pa and its own different ending text"),
      Seq(4L -> s"$pa duplicated again with its own unique ending number four"),
      Seq(5L -> s"another novel long document with no duplicated span inside it"))
    // twin stores: A compacts every 2 batches, B never
    val qa = StreamIngest.maintainSubstringIndex(spark, srcA, chkA, outA,
      compactEvery = 2, filesTarget = 1)
    val qb = StreamIngest.maintainSubstringIndex(spark, srcB, chkB, outB)
    batches.zipWithIndex.foreach { case (b, i) =>
      write(srcA, s"b$i.json", b); qa.processAllAvailable()
      write(srcB, s"b$i.json", b); qb.processAllAvailable()
    }
    def rel(out: String) = (
      spark.read.parquet(s"$out/fp").collect().map(_.mkString("|")).toSet,
      spark.read.parquet(s"$out/texts").collect().map(_.mkString("|")).toSet,
      StreamIngest.readSubstringPairs(spark, out)
        .select("doc_a", "doc_b", "pos_a", "pos_b", "match_len")
        .collect().map(_.mkString("|")).toSet)
    assert(rel(outA) == rel(outB), "compaction changed a relation")
    // the maintained boilerplate report agrees on both stores — A's
    // counts deltas were FOLDED at the tick (one summed row per
    // passage, batch-id restamped) and topped up by later batches
    def report(out: String) = StreamIngest.readTopPassages(spark, out,
      len = 40, minDocs = 2, k = 50).collect().map(_.mkString("|")).toSet
    assert(report(outA) == report(outB), "counts fold changed the report")
    assert(spark.read.parquet(s"$outA/counts").count() <
      spark.read.parquet(s"$outB/counts").count(),
      "compaction did not fold the counts deltas")
    def files(out: String, st: String) =
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$out/$st"))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
    // A's stores were rewritten at the tick (batch 2), then gained the
    // post-tick appends; B holds one file-set per contributing batch
    assert(files(outA, "fp") < files(outB, "fp"),
      s"fp: ${files(outA, "fp")} !< ${files(outB, "fp")}")
    // replay after a compaction is still a full no-op
    val before = rel(outA)
    val beforeReport = report(outA)
    write(srcA, "replay.json", batches(2)); qa.processAllAvailable()
    qa.stop(); qb.stop()
    assert(rel(outA) == before)
    assert(report(outA) == beforeReport)
  }

  test("substring index: compaction crash-mid-swap + batch replay does not truncate the guard store") {
    import spark.implicits._
    val out = Files.createTempDirectory("ssi_cswap").toString + "/store"
    val minLen = 40; val k = 20
    val pa = (1 to 10).map(i => s"shared$i").mkString(" ")
    val b1 = Seq(
      1L -> s"$pa alpha filler one with enough unique tail text here",
      2L -> "completely unrelated long passage without any shared spans at all")
    val b2 = Seq(3L -> s"prefix words then $pa and its own different ending text")
    StreamIngest.substringIndexBatch(b1.toDF("doc_id", "text"), out, 0L, minLen, k)
    StreamIngest.substringIndexBatch(b2.toDF("doc_id", "text"), out, 1L, minLen, k)
    val wantPairs = StreamIngest.readSubstringPairs(spark, out)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(wantPairs == Set(1L -> 3L))
    val fpN = spark.read.parquet(s"$out/fp").count()
    // simulate the compaction HARD CRASH between rename(path, old) and
    // rename(tmp, path) on the replay-guard store: texts absent, the
    // only full copy staged at ._compact_old. The crash also
    // uncommitted batch 1, so the stream replays it.
    val hconf = spark.sparkContext.hadoopConfiguration
    val tx = new org.apache.hadoop.fs.Path(s"$out/texts")
    val fs = tx.getFileSystem(hconf)
    val staged = new org.apache.hadoop.fs.Path(s"$out/texts._compact_old")
    assert(fs.rename(tx, staged) && !fs.exists(tx))
    // the replayed batch must RESTORE the guard before consulting it —
    // pre-r13 it recreated `texts` batch-only here, and the retried
    // compaction then deleted the staged full copy (total loss of b1)
    StreamIngest.substringIndexBatch(b2.toDF("doc_id", "text"), out, 1L, minLen, k)
    assert(spark.read.parquet(s"$out/texts").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L, 3L),
      "replay after crash-mid-swap truncated the texts guard store")
    assert(!fs.exists(staged))
    assert(spark.read.parquet(s"$out/fp").count() == fpN,
      "replay duplicated fingerprints")
    assert(StreamIngest.readSubstringPairs(spark, out)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet == wantPairs)
    // the RETRIED compaction now runs clean over the recovered store
    graft.ingest.Sinks.compact(spark, s"$out/texts", filesTarget = 1)
    assert(spark.read.parquet(s"$out/texts").count() == 3)
    // and a READER arriving inside the same window also self-heals
    assert(fs.rename(tx, staged))
    assert(StreamIngest.readTopPassages(spark, out, len = 40, minDocs = 2,
      k = 20).count() >= 1)
    assert(fs.exists(tx) && !fs.exists(staged))
    // the PAIRS sidecar gets the same treatment: crash its compaction
    // mid-swap, then both the reader and a replayed batch self-heal
    val pr = new org.apache.hadoop.fs.Path(s"$out/pairs")
    val prStaged = new org.apache.hadoop.fs.Path(s"$out/pairs._compact_old")
    assert(fs.rename(pr, prStaged))
    assert(StreamIngest.readSubstringPairs(spark, out)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet == wantPairs)
    assert(fs.exists(pr) && !fs.exists(prStaged))
    // and the COUNTS sidecar (the boilerplate report's store)
    val cn = new org.apache.hadoop.fs.Path(s"$out/counts")
    val cnStaged = new org.apache.hadoop.fs.Path(s"$out/counts._compact_old")
    assert(fs.rename(cn, cnStaged))
    assert(StreamIngest.readTopPassages(spark, out, len = 40, minDocs = 2,
      k = 20).count() >= 1)
    assert(fs.exists(cn) && !fs.exists(cnStaged))
  }

  test("release store: compaction crash-mid-swap + batch replay preserves the gates guard") {
    import spark.implicits._
    val root = Files.createTempDirectory("mrel_cswap").toString
    val out = s"$root/store"; val wdir = s"$root/weights"
    val filler = (1 to 30).map(i => s"unique$i").mkString(" ")
    val docs = Seq(
      (3L, "en", s"first document body $filler"),
      (4L, "en", s"training document one $filler"),
      (6L, "en", s"training document two $filler"),
      (11L, "en", s"second document body $filler"))
      .toDF("doc_id", "lang", "text")
    graft.ext.TextAnalysis.langIdWeights(docs).write.parquet(wdir)
    StreamIngest.releaseBatch(docs.where($"doc_id" <= 6L), out, wdir,
      0L, minLen = 40, k = 20)
    StreamIngest.releaseBatch(docs.where($"doc_id" > 6L), out, wdir,
      1L, minLen = 40, k = 20)
    val want = StreamIngest.readReleaseDecisions(spark, out)
      .as[(Long, String)].collect().toMap
    assert(want.size == 4)
    // crash the gates compaction mid-swap, then replay batch 1
    val hconf = spark.sparkContext.hadoopConfiguration
    val g = new org.apache.hadoop.fs.Path(s"$out/gates")
    val fs = g.getFileSystem(hconf)
    val staged = new org.apache.hadoop.fs.Path(s"$out/gates._compact_old")
    assert(fs.rename(g, staged))
    StreamIngest.releaseBatch(docs.where($"doc_id" > 6L), out, wdir,
      1L, minLen = 40, k = 20)
    assert(spark.read.parquet(s"$out/gates").select("doc_id")
      .as[Long].collect().toSet == Set(3L, 4L, 6L, 11L),
      "replay after crash-mid-swap truncated the gates guard store")
    assert(StreamIngest.readReleaseDecisions(spark, out)
      .as[(Long, String)].collect().toMap == want)
    // the HASHES sidecar (the exact-dedup fate log) gets the same
    // treatment: crash its compaction mid-swap, reader self-heals
    val h = new org.apache.hadoop.fs.Path(s"$out/hashes")
    val hStaged = new org.apache.hadoop.fs.Path(s"$out/hashes._compact_old")
    assert(fs.rename(h, hStaged))
    assert(StreamIngest.readReleaseDecisions(spark, out)
      .as[(Long, String)].collect().toMap == want)
    assert(fs.exists(h) && !fs.exists(hStaged))
  }

  test("maintainRelease: compaction pre-folds hashes; decisions and replay law survive the tick") {
    import spark.implicits._
    val root = Files.createTempDirectory("mrel_cmp").toString
    val filler = (1 to 30).map(i => s"unique$i").mkString(" ")
    val docs = Seq(
      (3L, "en", s"twin text $filler"),          // late-arriving SMALLEST twin
      (4L, "en", s"training document one $filler"),
      (6L, "en", s"training document two $filler"),
      (11L, "en", s"twin text $filler"),
      (13L, "en", s"solo document $filler"),
      (15L, "en", s"twin text $filler"))         // in-batch twin of 11 —
      .toDF("doc_id", "lang", "text")            // gives the fold rows to merge
    graft.ext.TextAnalysis.langIdWeights(docs).write.parquet(s"$root/weights")
    // twin stores: A compacts after batch 0, B never; the smaller twin
    // (id 3) arrives AFTER A's tick, so the read-time keeper min-fold
    // must span folded rows AND post-tick deltas
    def drive(out: String, tick: Boolean): Unit = {
      StreamIngest.releaseBatch(docs.where($"doc_id" > 3L), out,
        s"$root/weights", 0L, minLen = 40, k = 20)
      if (tick) StreamIngest.compactReleaseStores(spark, out, 0L, 1)
      StreamIngest.releaseBatch(docs.where($"doc_id" === 3L), out,
        s"$root/weights", 1L, minLen = 40, k = 20)
      ()
    }
    drive(s"$root/a", tick = true)
    drive(s"$root/b", tick = false)
    def dec(out: String) = StreamIngest.readReleaseDecisions(spark, out)
      .as[(Long, String)].collect().toMap
    val (a, b) = (dec(s"$root/a"), dec(s"$root/b"))
    assert(a == b, s"compaction changed decisions: $a vs $b")
    // the keeper law held across the boundary: late-arriving smallest
    // twin survives, both folded first arrivals are dedup casualties
    assert(a(11L) == "dedup_exact" && a(15L) == "dedup_exact"
      && a(3L) != "dedup_exact", a.toString)
    // hashes was genuinely pre-folded at the tick: A carries one row
    // per distinct hash from batch 0 plus batch 1's delta; B one row
    // per gated document
    assert(spark.read.parquet(s"$root/a/hashes").count() <
      spark.read.parquet(s"$root/b/hashes").count())
    // replay after the tick is still a full no-op
    val before = Seq("gates", "hashes", "sub/texts")
      .map(d => spark.read.parquet(s"$root/a/$d").count())
    StreamIngest.releaseBatch(docs.where($"doc_id" === 3L), s"$root/a",
      s"$root/weights", 1L, minLen = 40, k = 20)
    assert(Seq("gates", "hashes", "sub/texts")
      .map(d => spark.read.parquet(s"$root/a/$d").count()) == before)
    assert(dec(s"$root/a") == b)
  }

  test("sink compaction: a racing reader's restore mid-swap is detected, never nested") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cmp_race").toString + "/sink"
    (1L to 40L).map(i => (i, s"row$i")).toDF("id", "v")
      .repartition(8).write.parquet(dir)
    val want = spark.read.parquet(dir).collect().map(_.mkString("|")).toSet
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hconf)
    // the race residue: a compactor staged the sink aside, a reader's
    // recoverCompact restored it, and the compactor's swap rename then
    // NESTED its rewrite inside the live sink before it crashed —
    // exactly the compactComponentLog TOCTOU, on the generic compactor
    val nested = new org.apache.hadoop.fs.Path(path,
      path.getName + "._compact_tmp")
    spark.read.parquet(dir).repartition(1).write.parquet(nested.toString)
    assert(fs.exists(nested))
    // recovery cleans the residue before any read
    graft.ingest.Sinks.recoverCompact(spark, dir)
    assert(!fs.exists(nested))
    assert(spark.read.parquet(dir).collect().map(_.mkString("|")).toSet == want)
    // and a fresh compaction over the recovered sink runs clean
    val (nb, na) = graft.ingest.Sinks.compact(spark, dir, filesTarget = 1)
    assert(nb >= 8L && na == 1L)
    assert(spark.read.parquet(dir).collect().map(_.mkString("|")).toSet == want)
  }

  test("recovery cleans the RESTORE-side nesting residue too (._compact_old / ._fold_old)") {
    import spark.implicits._
    // the mirror race: a recoverer loses its existence probe to a
    // COMPLETING compaction, and its rename(old, path) nests the staged
    // pre-compaction copy inside the live store — rename returns true,
    // so nothing failed loudly; the nested non-partition subdir breaks
    // every later parquet read until recovery cleans it
    val dir = Files.createTempDirectory("cmp_race2").toString + "/sink"
    (1L to 20L).map(i => (i, s"row$i")).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    val want = spark.read.parquet(dir).collect().map(_.mkString("|")).toSet
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hconf)
    val nestedOld = new org.apache.hadoop.fs.Path(path,
      path.getName + "._compact_old")
    spark.read.parquet(dir).repartition(1).write.parquet(nestedOld.toString)
    graft.ingest.Sinks.recoverCompact(spark, dir)
    assert(!fs.exists(nestedOld))
    assert(spark.read.parquet(dir).collect().map(_.mkString("|")).toSet == want)
    // same shape on the component log's custom swap
    val out = Files.createTempDirectory("ccr_nest2").toString + "/labels"
    val edges = Seq(1L -> 2L, 5L -> 6L).toDF("a", "b")
    graft.graph.ConnectedComponents.run(edges)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(0L))
      .write.parquet(out)
    val wantL = StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap
    val lp = new org.apache.hadoop.fs.Path(out)
    val nestedFold = new org.apache.hadoop.fs.Path(lp, lp.getName + "._fold_old")
    StreamIngest.readComponents(spark, out).withColumn("batch_id",
      org.apache.spark.sql.functions.lit(3L)).write.parquet(nestedFold.toString)
    assert(StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap == wantL)
    assert(!fs.exists(nestedFold))
  }

  test("substring store: an empty _meta.json crash residue is replaced, not a permanent wedge") {
    import spark.implicits._
    val out = Files.createTempDirectory("ssi_metacrash").toString + "/store"
    val docs = Seq(1L -> ("x" * 60)).toDF("doc_id", "text")
    // crash residue: _meta.json created but never written (empty file)
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(s"$out/_meta.json")
    val fs = p.getFileSystem(hconf)
    fs.create(p, false).close()
    assert(StreamIngest.readSubstringMeta(spark, out).isEmpty)
    // pre-r13 this threw FileAlreadyExists on EVERY batch forever; now
    // the unparseable residue is replaced via temp-file + rename
    StreamIngest.substringIndexBatch(docs, out, 0L, 40, 20)
    assert(StreamIngest.readSubstringMeta(spark, out).contains((40, 20)))
    // and the written meta still enforces the drift guard
    intercept[IllegalArgumentException] {
      StreamIngest.substringIndexBatch(docs, out, 1L, 30, 15)
    }
  }

  test("component log: a fold nested by the compaction TOCTOU race is cleaned on read") {
    import spark.implicits._
    val out = Files.createTempDirectory("ccr_nest").toString + "/labels"
    val edges = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L).toDF("a", "b")
    graft.graph.ConnectedComponents.run(edges)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(0L))
      .write.parquet(out)
    val want = StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap
    // the race residue: a compactor lost the existence-check race to a
    // recovering reader, its rename NESTED the fold inside the restored
    // live store, and it crashed before its own residue check —
    // leaving a non-partition subdir that breaks plain parquet reads
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(out)
    val fs = path.getFileSystem(hconf)
    val nested = new org.apache.hadoop.fs.Path(path, path.getName + "._fold_tmp")
    StreamIngest.readComponents(spark, out).withColumn("batch_id",
      org.apache.spark.sql.functions.lit(7L)).write.parquet(nested.toString)
    assert(fs.exists(nested))
    // the read-side recovery cleans the residue before folding
    assert(StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap == want)
    assert(!fs.exists(nested))
    // and the next compaction runs clean
    StreamIngest.compactComponentLog(spark, out, bid = 2L)
    assert(StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap == want)
  }

  test("maintainRelease: streamed decision log equals the one-shot q212 chain; replay is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{max, min}
    val dir = "/root/testdata/sf0.001"
    val docs = graft.util.Tables.documents(spark, dir)
      .select("doc_id", "lang", "text")
    val root = Files.createTempDirectory("mrel").toString
    val (src, chk, out, wdir) =
      (s"$root/src", s"$root/chk", s"$root/store", s"$root/weights")
    assert(new java.io.File(src).mkdirs())
    // production shape: the router model is trained once and frozen
    graft.ext.TextAnalysis.langIdWeights(docs).write.parquet(wdir)
    val (lo, hi) = docs.agg(min($"doc_id"), max($"doc_id"))
      .as[(Long, Long)].head()
    val c1 = lo + (hi - lo) / 3; val c2 = lo + 2 * (hi - lo) / 3
    // id-ordered batches — the parity contract's crawl-order clause
    def deliver(name: String, pred: org.apache.spark.sql.Column): Unit = {
      val stage = s"$root/stage_$name"
      docs.where(pred).coalesce(1).write.json(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".json")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$src/$name.json"))
      ()
    }
    val q = StreamIngest.maintainRelease(spark, src, chk, out, wdir)
    deliver("b1", $"doc_id" <= c1); q.processAllAvailable()
    deliver("b2", $"doc_id" > c1 && $"doc_id" <= c2); q.processAllAvailable()
    deliver("b3", $"doc_id" > c2); q.processAllAvailable()
    def decisions() = StreamIngest.readReleaseDecisions(spark, out)
      .as[(Long, String)].collect().toMap
    val got = decisions()
    val want = graft.SparkEntry.queries("q212_release_decisions")(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got.size == want.size)
    assert(got == want, {
      val diff = want.keySet.filter(k => got.get(k) != want.get(k)).take(5)
      s"fates diverge at ${diff.map(k => (k, got.get(k), want.get(k)))}"
    })
    // replay: re-delivering batch 3's content appends nothing anywhere
    def counts() = (
      Seq("gates", "hashes", "sub/fp", "sub/texts")
        .map(d => spark.read.parquet(s"$out/$d").count()),
      StreamIngest.readSubstringPairs(spark, s"$out/sub").count())
    val before = counts()
    deliver("b4", $"doc_id" > c2); q.processAllAvailable(); q.stop()
    assert(counts() == before, s"replay changed stores: $before -> ${counts()}")
    assert(decisions() == want)
    // id-ordered delivery (and the replay) produce ZERO late-twin
    // events — the out-of-order counter stays empty
    assert(StreamIngest.readLateArrivals(spark, out).count() == 0L)
  }

  test("maintainRelease: out-of-order arrival degrades gracefully — exact-dedup fates stay exact") {
    import spark.implicits._
    // the parity contract requires id-ordered batches; this pins what
    // the scaladoc PROMISES for the out-of-order case: the hash log
    // records every gated doc, so the read-time keeper min-fold still
    // picks the GLOBAL min id (arrival-order-independent), while
    // substring admission keeps the first-arrived twin (append-only
    // greedy, the ingestPrep caveat)
    val root = Files.createTempDirectory("mrel_ooo").toString
    val out = s"$root/store"; val wdir = s"$root/weights"
    val filler = (1 to 30).map(i => s"unique$i").mkString(" ")
    // even ids (4, 6) are the router's TRAINING half (the marker
    // augmentation rides on the lang column); odd ids get predictions.
    // Docs 3 and 11 share EXACT text; the LARGER id arrives first.
    val docs = Seq(
      (3L, "en", s"twin text $filler"),
      (11L, "en", s"twin text $filler"),
      (13L, "en", s"solo document $filler"),
      (4L, "en", s"training document one $filler"),
      (6L, "en", s"training document two $filler"))
      .toDF("doc_id", "lang", "text")
    graft.ext.TextAnalysis.langIdWeights(docs).write.parquet(wdir)
    // batch 0 delivers ids {4, 6, 11, 13}; batch 1 the smaller twin 3
    StreamIngest.releaseBatch(docs.where($"doc_id" > 3L), out, wdir,
      0L, minLen = 40, k = 20)
    StreamIngest.releaseBatch(docs.where($"doc_id" === 3L), out, wdir,
      1L, minLen = 40, k = 20)
    val fates = StreamIngest.readReleaseDecisions(spark, out, totalBudget = 6000L)
      .as[(Long, String)].collect().toMap
    // keeper fold is global-min: doc 3 survives dedup despite arriving
    // late; the first-arrived twin 11 is the one attributed dedup_exact
    assert(fates(11L) == "dedup_exact", fates.toString)
    assert(fates(3L) != "dedup_exact" && fates(3L) != "gate_lang",
      fates.toString)
    assert(fates(13L) != "dedup_exact" && fates(13L) != "gate_lang")
    // substring store kept the FIRST-ARRIVED twin's text (id 11):
    // admission anti-joins on the text hash, so the late smaller id
    // never re-enters the index
    val storedIds = spark.read.parquet(s"$out/sub/texts")
      .select("doc_id").as[Long].collect().toSet
    assert(storedIds.contains(11L) && !storedIds.contains(3L), storedIds.toString)
    // round-15 observability: the divergence is COUNTED — batch 1
    // delivered exactly one later-arriving smaller id (3) whose
    // first-arrived twin (11) owns the substring index
    assert(StreamIngest.readLateArrivals(spark, out)
      .as[(Long, Long)].collect().toSet == Set(1L -> 1L))
    // round-18: the same sidecar row carries the batch's keeper count,
    // so the FRACTION folds without re-scanning any store — batch 1's
    // single keeper (doc 3) arrived late: 1/1 = 1,000,000 ppm
    assert(StreamIngest.readLateFractions(spark, out)
      .as[(Long, Long, Long, Long)].collect().toSet ==
      Set((1L, 1L, 1L, 1000000L)))
    // pre-r18 stores have 2-col late files: the fraction reader must
    // surface null keepers/ppm for them, never guess — simulate by
    // rewriting the log without the denominator column
    val lateDir = s"$out/late"
    val legacy = spark.read.parquet(lateDir)
      .select("batch_id", "n_late_smaller_id").collect()
    val fs2 = new org.apache.hadoop.fs.Path(lateDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs2.delete(new org.apache.hadoop.fs.Path(lateDir), true)
    spark.createDataFrame(spark.sparkContext.parallelize(legacy.toSeq),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_late_smaller_id",
            org.apache.spark.sql.types.LongType))))
      .write.parquet(lateDir)
    val legacyRow = StreamIngest.readLateFractions(spark, out).collect().head
    assert(legacyRow.getLong(0) == 1L && legacyRow.getLong(1) == 1L)
    assert(legacyRow.isNullAt(2) && legacyRow.isNullAt(3),
      s"legacy 2-col late rows must read null keepers/ppm: $legacyRow")
  }

  test("component log: crash after a completed swap leaves a stale _fold_old that stays benign") {
    import spark.implicits._
    val out = Files.createTempDirectory("ccr_stale").toString + "/labels"
    val edges = Seq(1L -> 2L, 2L -> 3L, 7L -> 8L).toDF("a", "b")
    graft.graph.ConnectedComponents.run(edges)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(0L))
      .write.parquet(out)
    val want = StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap
    // crash window: compaction completed its swap (path healthy with
    // the folded log) but died before deleting the staged-aside copy
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(out)
    val fs = path.getFileSystem(hconf)
    val old = new org.apache.hadoop.fs.Path(out + "._fold_old")
    StreamIngest.readComponents(spark, out).withColumn("batch_id",
      org.apache.spark.sql.functions.lit(9L)).write.parquet(old.toString)
    // reads see the healthy store; recovery is a no-op (path exists)
    assert(StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap == want)
    StreamIngest.recoverComponentLog(spark, out) // must not throw
    assert(fs.exists(path) && fs.exists(old))
    // the next compaction folds clean and clears the residue
    StreamIngest.compactComponentLog(spark, out, bid = 2L)
    assert(StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap == want)
    assert(!fs.exists(old))
  }

  test("component log: a hard crash between the compaction renames is recovered on read") {
    import spark.implicits._
    val out = Files.createTempDirectory("ccr_out").toString + "/labels"
    // build a small labeling the batch way (no stream needed — the
    // crash window is a pure file-store shape)
    val edges = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L).toDF("a", "b")
    graft.graph.ConnectedComponents.run(edges)
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(0L))
      .write.parquet(out)
    val want = StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap
    assert(want.nonEmpty)
    // simulate the hard-crash window: compactComponentLog staged the
    // log aside (rename path -> _fold_old) and died before renaming the
    // fold into place — outDir absent, only copy at _fold_old, plus a
    // stale _fold_tmp from the interrupted write
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(out)
    val fs = path.getFileSystem(hconf)
    val old = new org.apache.hadoop.fs.Path(out + "._fold_old")
    val tmp = new org.apache.hadoop.fs.Path(out + "._fold_tmp")
    StreamIngest.readComponents(spark, out).withColumn("batch_id",
      org.apache.spark.sql.functions.lit(1L)).write.parquet(tmp.toString)
    assert(fs.rename(path, old))
    assert(!fs.exists(path) && fs.exists(old))
    // WITHOUT recovery this read would fold an EMPTY labeling and the
    // store would silently restart from scratch; the read-side recovery
    // restores the staged-aside log first
    val recovered = StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap
    assert(recovered == want, s"recovered labeling $recovered != $want")
    assert(fs.exists(path) && !fs.exists(old))
    // and a subsequent compaction runs clean over the recovered store
    // (deleting the stale tmp on its way)
    StreamIngest.compactComponentLog(spark, out, bid = 2L)
    assert(StreamIngest.readComponents(spark, out)
      .as[(Long, Long)].collect().toMap == want)
    assert(!fs.exists(tmp) && !fs.exists(old))
  }

  test("manifest on a text-less layout: absent, signalled, and rebuild-safe") {
    import spark.implicits._
    val out = Files.createTempDirectory("mf_notext").toString + "/layout"
    val n = StreamIngest.appendShardBatch(
      (1L to 20L).map(i => (i, i * 10)).toDF("doc_id", "weight"), out, 2)
    assert(n == 20L)
    // no text column → no manifest sidecar; readManifest signals None
    // instead of crashing on the missing path
    assert(StreamIngest.readManifest(spark, out).isEmpty)
    // rebuild on a text-less layout must not throw (no unresolved-column
    // error) and must leave no sidecar behind
    StreamIngest.rebuildManifest(spark, out)
    assert(StreamIngest.readManifest(spark, out).isEmpty)
    // a stale sidecar from a mis-use is REMOVED by rebuild, not trusted
    (0 to 1).map(s => (s, 1L, 1L, 1L))
      .toDF("shard", "n_docs", "n_tokens", "checksum")
      .write.parquet(StreamIngest.manifestDir(out))
    assert(StreamIngest.readManifest(spark, out).isDefined)
    StreamIngest.rebuildManifest(spark, out)
    assert(StreamIngest.readManifest(spark, out).isEmpty)
  }
}
