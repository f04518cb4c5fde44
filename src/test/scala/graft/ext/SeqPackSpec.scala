package graft.ext

import graft.SparkSuite

class SeqPackSpec extends SparkSuite {
  import spark.implicits._

  private def docs = (0L until 300L).map(i => (i, Seq.fill((i % 17 + 1).toInt)("w").mkString(" ")))
    .toDF("doc_id", "text")

  test("packing is gapless: start offsets are the running token totals per shard") {
    val out = SeqPack.pack(docs, "doc_id", "text", shards = 4, seqLen = 32)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSet.subsetOf((0L until 4L).toSet))
    for ((shard, rows) <- out.groupBy(_._1)) {
      // absolute start position = seq_id*32 + offset; sorted starts must
      // be exactly the prefix sums of the token counts in that order
      val sorted = rows.map { case (_, seq, off, n) => (seq * 32 + off, n) }.sortBy(_._1)
      val starts = sorted.scanLeft(0L)(_ + _._2).dropRight(1)
      assert(sorted.map(_._1).toSeq == starts.toSeq, s"shard $shard not gapless")
      assert(rows.forall { case (_, _, off, _) => off >= 0 && off < 32 })
    }
  }

  test("packSequences materializes the exact per-shard token stream (roundtrip law)") {
    val d = (0L until 120L).map(i =>
      (i, (0 until (i % 13 + 1).toInt).map(j => s"d${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val addr = SeqPack.pack(d, "doc_id", "text", shards = 4, seqLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2) * 32 + r.getLong(3))).toSeq
    val texts = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val seqs = SeqPack.packSequences(d, "doc_id", "text", shards = 4, seqLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    for (shard <- seqs.map(_._1).distinct) {
      // stitching the sequences in order reproduces the shard's whole
      // token stream in the deterministic (hash, id) layout order
      val expect = addr.filter(_._2 == shard).sortBy(_._3)
        .map(t => texts(t._1)).mkString(" ")
      val rows = seqs.filter(_._1 == shard).sortBy(_._2)
      assert(rows.map(_._4).mkString(" ") == expect, s"shard $shard stream")
      // every sequence but the shard's last is exactly full
      rows.dropRight(1).foreach(r => assert(r._3 == 32L, s"shard $shard seq ${r._2}"))
      assert(rows.last._3 <= 32L && rows.last._3 > 0L)
    }
  }

  test("adding a document only perturbs its own shard") {
    val base = SeqPack.pack(docs, "doc_id", "text", shards = 4, seqLen = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val extra = docs.union(Seq((999L, "a b c")).toDF("doc_id", "text"))
    val withExtra = SeqPack.pack(extra, "doc_id", "text", shards = 4, seqLen = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val newShard = withExtra(999L)._1
    val moved = base.filter { case (id, v) => withExtra(id) != v }
    assert(moved.keys.forall(id => base(id)._1 == newShard),
      s"docs outside shard $newShard moved: ${moved.keys.take(5)}")
  }
}
