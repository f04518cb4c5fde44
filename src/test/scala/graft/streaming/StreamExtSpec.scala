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
}
