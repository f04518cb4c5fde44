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

  /** dHash grid: 9 sample columns × [[DhashRows]] rows → 8×8 = 64
    * difference bits. The classic perceptual-hash geometry. */
  val DhashCols = 9
  val DhashRows = 8

  /** 64-bit perceptual dHash (difference hash) over the DECODED farbfeld
    * pixels — the standard image near-dup fingerprint: sample the image
    * down to a [[DhashCols]]×[[DhashRows]] luma grid (nearest-neighbor
    * point sampling at integer coordinates x = gx·w div 9,
    * y = gy·h div 8 — deterministic integer arithmetic, no float
    * resampling), then bit (gy·8 + gx) is set iff
    * grid(gx,gy) < grid(gx+1,gy). Comparing NEIGHBORING samples makes
    * the hash invariant to global brightness shifts and robust to
    * rescaling — the property that makes dHash a near-dup fingerprint
    * rather than a checksum. Luma = the 16-bit red channel (grayscale
    * blobs; a color codec would mix r/g/b here).
    *
    * Runs in the decode `mapPartitions` (binary codec — the justified
    * exception, same as [[decodeFarbfeld]]); everything downstream of
    * the (doc_id, fp) relation is relational. Bit 63 uses `1L << 63` =
    * Long.MinValue — the two's-complement pattern IS the intended bit,
    * same convention as `Dedup.simhash`.
    */
  def dhash64(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val bb = ByteBuffer.wrap(r.media)
      val magic = new Array[Byte](8)
      bb.get(magic)
      require(java.util.Arrays.equals(magic, Magic),
        s"doc ${r.doc_id}: not a farbfeld blob")
      val w = bb.getInt
      val h = bb.getInt
      def luma(x: Int, y: Int): Int =
        bb.getShort(16 + 8 * (y * w + x)) & 0xffff
      var fp = 0L
      var gy = 0
      while (gy < DhashRows) {
        val y = gy * h / DhashRows
        var gx = 0
        while (gx < DhashCols - 1) {
          if (luma(gx * w / DhashCols, y) < luma((gx + 1) * w / DhashCols, y))
            fp |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      (r.doc_id, fp)
    }).toDF("doc_id", "fp")
  }

  /** Perceptual image near-dup pairs: encode → decode+dHash → the SAME
    * banded Hamming machinery as text SimHash
    * ([[Dedup.fingerprintHammingPairs]]) — (doc_a, doc_b, dist) for
    * every image pair within `maxDist` bits, exactly as brute force
    * (pigeonhole guarantee). At 100 TB the blobs stay columnar and only
    * the 8-byte fingerprints enter the band join.
    *
    * Threshold/banding tradeoff (inherent to banded Hamming, not this
    * implementation): production image dedup uses TIGHT thresholds
    * (maxDist 3–7 of 64 ⇒ 16/8-bit bands, strong candidate pruning —
    * same economics as q92's text preset). A LOOSE threshold needs
    * nBands > maxDist, so bands get narrow and prune little — q103
    * registers maxDist=12/nBands=16 because the fixture's images are
    * synthetic codepoint noise whose nearest pairs sit at distance ~9;
    * the banding is still exact (pigeonhole holds at any width), it
    * just prunes less at thresholds that loose. */
  def imageDupPairs(docs: DataFrame, maxDist: Int = 3, nBands: Int = 4): DataFrame =
    Dedup.fingerprintHammingPairs(dhash64(encodeFarbfeld(docs)),
      maxDist, bits = 64, nBands = nBands)

  /** The `hashes` replay shared by [[dhashOracleSql]] and
    * [[imageDupPairsOracleSql]] — grid sampling + difference bits +
    * signed-64 bit sum, generated from the same constants as the Scala
    * decode path. */
  private def dhashCtes: String = {
    val gc = DhashCols
    val gr = DhashRows
    s"""dims AS (SELECT doc_id, text, length(text) AS ncp,
       |    (8 + length(text) % 16) AS w, (4 + doc_id % 8) AS h FROM documents),
       |grid AS (SELECT doc_id, gx, gy,
       |    CASE WHEN ncp = 0 THEN 0 ELSE
       |      unicode(substr(text,
       |        ((((gy * h) // $gr) * w + ((gx * w) // $gc)) % ncp) + 1, 1)) % 65536
       |    END AS luma
       |  FROM dims, range(0, $gc) tx(gx), range(0, $gr) ty(gy)),
       |bits AS (SELECT a.doc_id, a.gy * 8 + a.gx AS pos
       |  FROM grid a JOIN grid b
       |    ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
       |  WHERE a.gx < ${gc - 1} AND a.luma < b.luma),
       |hashes AS (SELECT d.doc_id,
       |    coalesce(cast(sum(CASE WHEN pos = 63 THEN -9223372036854775808
       |                           ELSE (1::BIGINT << pos) END) AS BIGINT), 0) AS fp
       |  FROM dims d LEFT JOIN bits USING (doc_id) GROUP BY d.doc_id)""".stripMargin
  }

  /** The [[dhashCtes]] chain for EXTERNAL oracle composition (ends with
    * `hashes(doc_id, fp)` in scope; defines `dims`, `grid`, `bits`,
    * `hashes` — callers must avoid those names). q126 unions the image
    * pair source with the text-simhash one. */
  def dhashCtesSql: String = dhashCtes

  /** DuckDB oracle for [[dhash64]]∘[[encodeFarbfeld]] over `documents`:
    * every fingerprint reproduced bit-for-bit from the text (the
    * farbfeld pixel at index j is codepoint(j mod ncp) mod 2¹⁶ by
    * [[encodeFarbfeld]]'s construction, so the sampled luma grid is
    * derivable without parsing binary). */
  def dhashOracleSql: String =
    s"""WITH $dhashCtes
       |SELECT doc_id, fp FROM hashes""".stripMargin

  /** DuckDB oracle for [[imageDupPairs]]: the [[dhashCtes]] replay, then
    * brute-force all pairs on `bit_count(xor)` — the same
    * banded-vs-brute-force contract as q77/q92. */
  def imageDupPairsOracleSql(maxDist: Int): String =
    s"""WITH $dhashCtes
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  cast(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS dist
       |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $maxDist""".stripMargin

  // ── audio modality: REAL canonical WAV (RIFF/PCM) blobs ─────────────

  /** Audio render parameters — deterministic from the document, like
    * [[renderDims]]: mono 16-bit PCM at 8 kHz, `100 + doc_id % 50`
    * samples, sample j = (codepoint(j mod ncp) mod 2¹⁶) − 32768
    * (silence for empty text). */
  val WavRate = 8000
  private[ext] def wavSamples(docId: Long): Int =
    (100 + docId % 50).toInt

  /** documents → REAL canonical 44-byte-header RIFF/WAVE PCM blobs —
    * the audio analog of [[encodeFarbfeld]]: a published container
    * simple enough to need no codec library, written little-endian as
    * the spec requires. */
  def encodeWav(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val cps = text.codePoints().toArray
        val n = wavSamples(docId)
        val dataSize = n * 2
        val bb = ByteBuffer.allocate(44 + dataSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1)                   // PCM, mono
          .putInt(WavRate).putInt(WavRate * 2)       // byte rate = rate·block
          .putShort(2).putShort(16)                  // block align, bits
          .put("data".getBytes("US-ASCII")).putInt(dataSize)
        var j = 0
        while (j < n) {
          val v = if (cps.isEmpty) 0 else (cps(j % cps.length) % 65536) - 32768
          bb.putShort(v.toShort)
          j += 1
        }
        MediaRow(docId, bb.array(), "audio/wav")
      })
  }

  /** REAL WAV parse: walk the RIFF chunk list to locate `fmt ` and
    * `data`, so any spec-valid 16-bit PCM file parses — extended fmt
    * chunks (18/40-byte WAVEFORMATEXTENSIBLE headers), LIST/fact/cue
    * metadata chunks in any position, and odd-sized chunks (word-
    * aligned per the spec) — not just [[encodeWav]]'s canonical 44-byte
    * layout. Returns (sampleRate, dataOffset, nSamples). */
  private def parseWav(docId: Long, bytes: Array[Byte]): (Int, Int, Int) = {
    val bb = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && ascii(0) == "RIFF",
      s"doc $docId: not a RIFF blob")
    require(ascii(8) == "WAVE", s"doc $docId: not a WAVE blob")
    var pos = 12
    var rate = -1
    while (pos + 8 <= bytes.length) {
      val id = ascii(pos)
      val size = bb.getInt(pos + 4)
      if (id == "fmt ") rate = bb.getInt(pos + 12)
      else if (id == "data") {
        require(rate > 0, s"doc $docId: data chunk before fmt ")
        return (rate, pos + 8, size / 2)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    throw new IllegalArgumentException(s"doc $docId: missing data chunk")
  }

  /** REAL WAV parse + frame-level feature extraction: header fields
    * (magic-checked chunk walk — see [[parseWav]]), duration, and
    * per-frame ENERGY (Σ sample², exact long — the classic audio
    * activity feature) over `frameLen`-sample frames; the tail partial
    * frame counts with its actual length.
    * Emits (doc_id, sample_rate, n_samples, frame, frame_n, energy) —
    * one row per frame, relational from here on (silence trimming,
    * activity windows, segment joins are plain filters/windows
    * downstream). Runs in `mapPartitions` — binary codec, the justified
    * exception, same as [[decodeFarbfeld]]. */
  def wavFrameEnergies(media: Dataset[MediaRow], frameLen: Int = 25): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val (rate, off, n) = parseWav(r.doc_id, r.media)
      val bb = ByteBuffer.wrap(r.media).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until (n + frameLen - 1) / frameLen).map { f =>
        val len = math.min(frameLen, n - f * frameLen)
        var e = 0L
        var j = 0
        while (j < len) {
          val s = bb.getShort(off + 2 * (f * frameLen + j)).toLong
          e += s * s
          j += 1
        }
        (r.doc_id, rate.toLong, n.toLong, f.toLong, len.toLong, e)
      }
    }).toDF("doc_id", "sample_rate", "n_samples", "frame", "frame_n", "energy")
  }

  /** Audio fingerprint geometry: 65 equal sample buckets → 64
    * consecutive-energy difference bits — [[dhash64]]'s 1-D analog. */
  val AudioFpBuckets = 65

  /** 64-bit perceptual audio fingerprint over the DECODED sample
    * stream: partition the samples into [[AudioFpBuckets]] equal
    * buckets (bucket of sample j = j·65 div n — every sample lands in
    * exactly one bucket), take each bucket's exact energy Σ s², and set
    * bit i iff E(i) < E(i+1). Comparing NEIGHBORING bucket energies
    * makes the fingerprint invariant to amplitude scaling (energies
    * scale by c², preserving every inequality) and robust to
    * resampling — the same property that makes dHash a near-dup
    * fingerprint rather than a checksum. All-integer arithmetic, so
    * the oracle replays every bit. Buckets are all non-empty when
    * n ≥ 65 (the fixture renders ≥ 100 samples); shorter clips leave
    * trailing zero-energy buckets, which compare as equal (no bit).
    * Runs in the decode `mapPartitions` — only 8-byte fingerprints
    * enter any shuffle, same shape as [[dhash64]]. */
  def audioFingerprint64(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (_, off, n) = parseWav(r.doc_id, r.media)
      val bb = ByteBuffer.wrap(r.media).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val e = new Array[Long](AudioFpBuckets)
      var j = 0
      while (j < n) {
        val s = bb.getShort(off + 2 * j).toLong
        e((j.toLong * AudioFpBuckets / n).toInt) += s * s
        j += 1
      }
      var fp = 0L
      var i = 0
      while (i < AudioFpBuckets - 1) {
        if (e(i) < e(i + 1)) fp |= 1L << i
        i += 1
      }
      (r.doc_id, fp)
    }).toDF("doc_id", "fp")
  }

  /** Perceptual audio near-dup pairs: encode → decode+fingerprint → the
    * SAME banded Hamming machinery as text SimHash and image dHash
    * ([[Dedup.fingerprintHammingPairs]]) — (doc_a, doc_b, dist) for
    * every pair within `maxDist` bits, exactly as brute force
    * (pigeonhole guarantee). Completes the modality triple: one shared
    * banded joiner, three fingerprint front-ends. */
  def audioDupPairs(docs: DataFrame, maxDist: Int = 4, nBands: Int = 8): DataFrame =
    Dedup.fingerprintHammingPairs(audioFingerprint64(encodeWav(docs)),
      maxDist, bits = 64, nBands = nBands)

  /** The fingerprint replay shared by [[audioFpOracleSql]] and
    * [[audioDupPairsOracleSql]] — sample stream from the text (the
    * [[encodeWav]] render rule), bucket energies, difference bits,
    * signed-64 bit sum; same conventions as [[dhashCtes]]. */
  private def audioFpCtes: String = {
    val nb = AudioFpBuckets
    s"""d AS (SELECT doc_id, text, length(text) AS ncp,
       |    cast(100 + doc_id % 50 AS BIGINT) AS n FROM documents),
       |samp AS (SELECT doc_id, n, j, CASE WHEN ncp = 0 THEN 0 ELSE
       |      unicode(substr(text, (j % ncp) + 1, 1)) % 65536 - 32768 END AS s
       |  FROM d, range(0, 200) t(j) WHERE j < n),
       |eb AS (SELECT doc_id, (j * $nb) // n AS b, sum(s * s) AS e
       |  FROM samp GROUP BY doc_id, (j * $nb) // n),
       |abits AS (SELECT a.doc_id, a.b AS pos
       |  FROM eb a JOIN eb b ON b.doc_id = a.doc_id AND b.b = a.b + 1
       |  WHERE a.b < ${nb - 1} AND a.e < b.e),
       |hashes AS (SELECT d.doc_id,
       |    coalesce(cast(sum(CASE WHEN pos = 63 THEN -9223372036854775808
       |                           ELSE (1::BIGINT << pos) END) AS BIGINT), 0) AS fp
       |  FROM d LEFT JOIN abits USING (doc_id) GROUP BY d.doc_id)""".stripMargin
  }

  /** The [[audioFpCtes]] chain for EXTERNAL oracle composition (ends
    * with `hashes(doc_id, fp)`; defines `d`, `samp`, `eb`, `abits`,
    * `hashes` — callers must avoid those names). q126 unions the audio
    * pair source with the text-simhash one. */
  def audioFpCtesSql: String = audioFpCtes

  /** DuckDB oracle for [[audioFingerprint64]]∘[[encodeWav]]. */
  def audioFpOracleSql: String =
    s"""WITH $audioFpCtes
       |SELECT doc_id, fp FROM hashes""".stripMargin

  /** DuckDB oracle for [[audioDupPairs]]: fingerprint replay + brute-
    * force `bit_count(xor)` pairs — banded == brute force, the
    * q77/q92/q103 contract. */
  def audioDupPairsOracleSql(maxDist: Int): String =
    s"""WITH $audioFpCtes
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  cast(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS dist
       |FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $maxDist""".stripMargin

  /** Deterministic corruption injector (audit-harness twin of q64's
    * PII injection): selected docs get their first magic byte flipped,
    * others lose their trailing 8 bytes — the two corruption classes a
    * binary-column integrity audit must separate (wrong format vs
    * short read). Magic-flip wins when a doc matches both rules. */
  def corruptSome(media: Dataset[MediaRow], flipMod: Long, flipRes: Long,
                  truncMod: Long, truncRes: Long): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.doc_id % flipMod == flipRes) {
        val b = r.media.clone(); b(0) = (b(0) ^ 0xff).toByte
        MediaRow(r.doc_id, b, r.media_type)
      } else if (r.doc_id % truncMod == truncRes)
        MediaRow(r.doc_id, r.media.take(r.media.length - 8), r.media_type)
      else r
    })
  }

  /** Decode-validation audit over a binary image column: a STRICT
    * farbfeld parse per blob — magic check, header read, payload-length
    * reconciliation — emitting (doc_id, status) with status ∈
    * ok | bad_magic | truncated. This is the K3 quarantine discipline
    * applied to media columns: at 100 TB a pipeline must COUNT and
    * ROUTE corrupt blobs (a hundred bad files in a billion must not
    * fail the job, and silently skipping them falsifies the dataset
    * card), so validation is a first-class relational operator whose
    * output joins/aggregates like any other. `mapPartitions` — binary
    * codec, the justified exception; blobs stay columnar and only the
    * verdict enters the plan. */
  def validateFarbfeld(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val b = r.media
      val status =
        if (b.length < 16 ||
          !java.util.Arrays.equals(java.util.Arrays.copyOf(b, 8), Magic))
          "bad_magic"
        else {
          val bb = ByteBuffer.wrap(b); bb.position(8)
          val w = bb.getInt; val h = bb.getInt
          if (b.length != 16 + 8 * w * h) "truncated" else "ok"
        }
      (r.doc_id, status)
    }).toDF("doc_id", "status")
  }

  // ── video modality: frame container + frame sampling ────────────────

  /** Frames per document — deterministic like the other render rules. */
  private[ext] def videoFrames(docId: Long): Int = (3 + docId % 4).toInt

  /** documents → multi-frame video blobs: a minimal container (magic
    * "gfv1", big-endian u32 frame count) holding CONCATENATED farbfeld
    * frames — frame f is the document's image with every 16-bit channel
    * offset by f (a deterministic "animation"), each frame a complete,
    * independently-decodable farbfeld unit. Opaque binary column with
    * typed metadata, exactly like image/audio. */
  def encodeVideo(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val cps = text.codePoints().toArray
        val (w, h) = renderDims(cps.length.toLong, docId)
        val nf = videoFrames(docId)
        val frameBytes = 16 + 8 * w * h
        val bb = ByteBuffer.allocate(8 + nf * frameBytes)
        bb.put("gfv1".getBytes("US-ASCII")).putInt(nf)
        for (f <- 0 until nf) {
          bb.put(Magic).putInt(w).putInt(h)
          var j = 0
          while (j < w * h) {
            val base = if (cps.isEmpty) 0 else cps(j % cps.length) % 65536
            val v = (base + f) % 65536
            bb.putShort(v.toShort).putShort(v.toShort).putShort(v.toShort)
            bb.putShort(0xffff.toShort)
            j += 1
          }
        }
        MediaRow(docId, bb.array(), "video/gfv1")
      })
  }

  /** FRAME SAMPLING — the video analog of image decode: parse the
    * container, decode every `everyK`-th frame (each a full farbfeld
    * parse, magic-checked), and emit one feature row per sampled frame
    * (doc_id, frame_idx, width, height, luma of the frame's first
    * pixel). The pattern a video pipeline runs before any model sees
    * pixels: blobs stay columnar, only sampled-frame features enter
    * the relational plan. `mapPartitions` — binary codec, the
    * justified exception. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val bb = ByteBuffer.wrap(r.media)
      val magic = new Array[Byte](4); bb.get(magic)
      require(new String(magic, "US-ASCII") == "gfv1",
        s"doc ${r.doc_id}: not a gfv1 container")
      val nf = bb.getInt
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      var f = 0
      while (f < nf) {
        val fm = new Array[Byte](8); bb.get(fm)
        require(java.util.Arrays.equals(fm, Magic),
          s"doc ${r.doc_id}: frame $f is not farbfeld")
        val w = bb.getInt
        val h = bb.getInt
        if (f % everyK == 0) {
          val luma = if (w * h > 0) (bb.getShort(bb.position()) & 0xffff).toLong else 0L
          frames += ((r.doc_id, f.toLong, w.toLong, h.toLong, luma))
        }
        bb.position(bb.position() + 8 * w * h) // skip pixel payload
        f += 1
      }
      frames
    }).toDF("doc_id", "frame_idx", "width", "height", "luma")
  }

  /** DuckDB oracle for [[sampleFrames]]∘[[encodeVideo]] over
    * `documents` — dims/frame-count/luma replayed from the text and
    * the render rules. */
  def frameSampleOracleSql(everyK: Int): String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS ncp,
       |    cast(8 + length(text) % 16 AS BIGINT) AS w,
       |    cast(4 + doc_id % 8 AS BIGINT) AS h,
       |    cast(3 + doc_id % 4 AS BIGINT) AS nf FROM documents)
       |SELECT doc_id, f AS frame_idx, w AS width, h AS height,
       |  cast(((CASE WHEN ncp = 0 THEN 0
       |              ELSE unicode(substr(text, 1, 1)) % 65536 END) + f) % 65536
       |    AS BIGINT) AS luma
       |FROM d, range(0, 8) t(f)
       |WHERE f < nf AND f % $everyK = 0""".stripMargin

  /** DuckDB oracle for [[wavFrameEnergies]]∘[[encodeWav]] over
    * `documents`: the sample stream is deterministic in the text (like
    * [[dhashCtes]]), so frames replay via a range join + group-by —
    * every header field and energy hash-verified. */
  def wavFramesOracleSql(frameLen: Int): String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS ncp,
       |    cast(100 + doc_id % 50 AS BIGINT) AS n FROM documents),
       |samp AS (SELECT doc_id, n, j, CASE WHEN ncp = 0 THEN 0 ELSE
       |      unicode(substr(text, (j % ncp) + 1, 1)) % 65536 - 32768 END AS s
       |  FROM d, range(0, 200) t(j) WHERE j < n)
       |SELECT doc_id, cast($WavRate AS BIGINT) AS sample_rate, n AS n_samples,
       |  j // $frameLen AS frame,
       |  count(*) AS frame_n, cast(sum(s * s) AS BIGINT) AS energy
       |FROM samp GROUP BY doc_id, n, j // $frameLen""".stripMargin
}
