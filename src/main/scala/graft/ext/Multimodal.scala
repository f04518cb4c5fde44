package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media blob with typed metadata. */
case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

/** Decoded (stub) features for one media blob. */
case class MediaFeatures(doc_id: Long, width: Long, height: Long,
                         channels: Long, luma: Long, n_bytes: Long)

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, decoded partition-wise.
  *
  * The Spark-side plumbing is real — binary column, schema, partitioning,
  * per-partition batch iteration via `Dataset.mapPartitions` (the JVM
  * analog of `mapInPandas`/`mapInArrow`: one invocation per partition,
  * streaming over rows, no per-row UDF dispatch). The DECODE STEP IS A
  * STUB: this container has no image/audio codecs, so `decodeStub`
  * derives deterministic fake features from the raw bytes; a real
  * deployment swaps `decodeStub`'s body for an actual codec call without
  * touching the plan shape.
  */
object Multimodal {

  /** documents → media table: utf-8 bytes of `text` standing in for an
    * encoded image; at 100 TB this is the column layout (binary + type
    * tag) that parquet stores row-group-columnar, so metadata-only
    * queries never read the blobs.
    */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      lit("image/stub").as("media_type"))

  /** STUB decode — deterministic features from bytes (see class doc). */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { r =>
        val b = r.media
        MediaFeatures(
          doc_id = r.doc_id,
          width = 16L + b.length % 64,
          height = 16L + r.doc_id % 32,
          channels = 3L,
          luma = if (b.nonEmpty) (b(0) & 0xff).toLong else 0L,
          n_bytes = b.length.toLong)
      }
    }
  }

  /** Full pipeline: docs → binary media → stub-decoded feature table. */
  def mediaFeatures(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    decodeStub(toMedia(docs).as[MediaRow]).toDF()
  }
}
