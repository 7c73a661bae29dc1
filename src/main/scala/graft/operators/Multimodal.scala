package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as a partition-local batch operator.
  *
  * The container has no ffmpeg/libjpeg, so the byte-fold queries use a
  * clearly-marked deterministic stand-in (`fakeDecode`) for the codec call;
  * everything around it — the schema shape (binary payload + metadata
  * struct), the `mapPartitions` batch boundary (the Scala analogue of a
  * Pandas-UDF `mapInPandas` batch), partitioning, and the feature schema —
  * is real and tested. Four routes exercise the seam with REAL codecs
  * that ship in the JDK: `pngDecode` (genuine PNG via `javax.imageio` —
  * zlib inflate + chunk CRC), `jpegDecode` (genuine lossy JPEG — DCT +
  * quantization + huffman entropy coding, pinned by tolerance booleans
  * since lossy output has no exact oracle), `wavDecode` (genuine
  * RIFF/WAVE via `javax.sound.sampled` — container chunk walk + fmt header
  * decode), and `mjpegFrames` (motion-JPEG video: container walk +
  * stride-sampled REAL JPEG frame decode), all inside the same
  * partition-local boundary. `fakeDecode` remains only as the generic
  * any-codec seam for formats no JDK codec covers.
  *
  * Scale notes: decode is a narrow per-partition op (no shuffle); binary
  * payloads never enter a shuffle — features are extracted first and the
  * payload dropped, which is the only workable pattern at 100 TB of media.
  */
object Multimodal {

  /** Typed rows for the partition-local decode path. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String)
  final case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Long,
      checksum: Long, head_byte: Int, mean_byte_x100: Long)

  /** The media table is synthesized from `documents` (text bytes stand in
    * for an encoded image/audio payload; `kind` cycles deterministically).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        col("text").cast(BinaryType).as("payload"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        struct(
          length(col("text").cast(BinaryType)).as("n_bytes"),
          col("source").as("origin")).as("meta"))

  /** STUB — deterministic fake decode. A real deployment decodes the codec
    * here (libjpeg/ffmpeg via JNI, or hand off to a Python worker); the
    * container has no codecs, so features are computed from raw bytes in a
    * reproducible way. The ??? marks the real-decode seam:
    *
    *   def realDecode(payload: Array[Byte]): DecodedFrame = ???
    */
  def fakeDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      var sum = 0L; var chk = 0L
      var i = 0
      while (i < r.payload.length) {
        val b = r.payload(i) & 0xff
        sum += b
        chk = (chk * 131 + b) % 1000000007L
        i += 1
      }
      val n = r.payload.length.toLong
      MediaFeatures(
        doc_id = r.doc_id, kind = r.kind, n_bytes = n, checksum = chk,
        head_byte = if (n > 0) r.payload(0) & 0xff else -1,
        mean_byte_x100 = if (n > 0) sum * 100 / n else -1L)
    }

  /** Partition-local batch decode — the mapInPandas-shaped boundary. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("payload"), col("kind"))
      .as[MediaRow]
      .mapPartitions(fakeDecode _)
  }

  // ------------------------------------------------------------------
  // multimodal_features: byte length / sha256 / first byte are pure SQL on
  // the binary payload → full DuckDB oracle (sha256 of the UTF-8 bytes).
  val features: Q = Q(
    "multimodal_features",
    (s, dir) => mediaTable(s, dir)
      .select(
        col("doc_id"), col("kind"),
        length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("sha"),
        ascii(col("payload").cast(StringType)).as("head_code"),
        // frame sampling: fixed 64-byte frames; count + fingerprint frame 0
        ceil(length(col("payload")) / lit(64.0)).cast(IntegerType).as("n_frames"),
        sha2(substring(col("payload").cast(StringType), 1, 64).cast(BinaryType), 256)
          .as("frame0_sha"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
      |  sha256(text) AS sha,
      |  CAST(ascii(text) AS INT) AS head_code,
      |  CAST(ceil(octet_length(CAST(text AS BLOB)) / 64.0) AS INT) AS n_frames,
      |  sha256(substr(text, 1, 64)) AS frame0_sha
      |FROM documents ORDER BY doc_id""".stripMargin))

  // multimodal_decode: the mapPartitions path. The JVM-side decode math
  // (polynomial checksum fold, integer byte mean) is restated in SQL —
  // payloads are ASCII text bytes, so ascii(substr(...)) enumerates the
  // exact byte values and list_reduce replays the same fold — upgrading
  // this from a rows-only check to a full hash-verified oracle.
  val decode: Q = Q(
    "multimodal_decode",
    (s, dir) => decodeFeatures(mediaTable(s, dir)).toDF().orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, length(text) + 1),
      |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |    (a, b) -> (a * 131 + b) % 1000000007) AS checksum,
      |  CASE WHEN length(text) = 0 THEN -1
      |       ELSE CAST(ascii(substr(text, 1, 1)) AS INT) END AS head_byte,
      |  CASE WHEN length(text) = 0 THEN -1
      |       ELSE CAST(list_sum(list_transform(range(1, length(text) + 1),
      |         i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))) * 100
      |       // length(text) AS BIGINT) END AS mean_byte_x100
      |FROM documents ORDER BY doc_id""".stripMargin))

  // ------------------------------------------------------------------
  // Frame sampling: every `stride` bytes take a `frameLen`-byte frame — the
  // video-keyframe shape (decode → sample every Nth frame). flatMap-style
  // mapPartitions: one input row fans out to a variable number of frames,
  // exactly how a real frame extractor iterates a container. Narrow map, no
  // shuffle; frames inherit the scan's partitioning.
  final case class Frame(
      doc_id: Long, frame_idx: Int, n_bytes: Int, head_code: Int, tail_code: Int)

  def sampleFrames(rows: Iterator[MediaRow],
      frameLen: Int = 64, stride: Int = 128): Iterator[Frame] =
    rows.flatMap { r =>
      val n = r.payload.length
      val count = (n + stride - 1) / stride
      (0 until count).iterator.map { i =>
        val off = i * stride
        val len = math.min(frameLen, n - off)
        Frame(r.doc_id, i, len,
          r.payload(off) & 0xff, r.payload(off + len - 1) & 0xff)
      }
    }

  val frames: Q = Q(
    "multimodal_frames",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      mediaTable(s, dir).select(col("doc_id"), col("payload"), col("kind"))
        .as[MediaRow]
        .mapPartitions(rs => sampleFrames(rs))
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH f AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    unnest(range(0, CAST(ceil(length(text) / 128.0) AS BIGINT))) AS fi
      |  FROM documents)
      |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |  CAST(least(64, n - fi * 128) AS INT) AS n_bytes,
      |  CAST(ascii(substr(text, fi * 128 + 1, 1)) AS INT) AS head_code,
      |  CAST(ascii(substr(text, fi * 128 + least(64, n - fi * 128), 1)) AS INT)
      |    AS tail_code
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin))

  // ------------------------------------------------------------------
  // Resize/downsample: keep every 4th byte (the image-thumbnail /
  // audio-decimation shape). The partition-local function builds the real
  // downsampled buffer; the query reports its invariants.
  final case class Resized(
      doc_id: Long, n_in: Long, n_out: Long, head_code: Int, tail_code: Int)

  def resize(rows: Iterator[MediaRow], factor: Int = 4): Iterator[Resized] =
    rows.map { r =>
      val out = r.payload.indices.collect {
        case i if i % factor == 0 => r.payload(i)
      }.toArray
      if (out.isEmpty) // empty payload: same -1 sentinels as fakeDecode
        Resized(r.doc_id, 0L, 0L, -1, -1)
      else
        Resized(r.doc_id, r.payload.length.toLong, out.length.toLong,
          out.head & 0xff, out.last & 0xff)
    }

  val resizeQ: Q = Q(
    "multimodal_resize",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      mediaTable(s, dir).select(col("doc_id"), col("payload"), col("kind"))
        .as[MediaRow]
        .mapPartitions(rs => resize(rs))
        .toDF()
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_in,
      |  CAST((length(text) + 3) // 4 AS BIGINT) AS n_out,
      |  CASE WHEN length(text) = 0 THEN -1
      |       ELSE CAST(ascii(substr(text, 1, 1)) AS INT) END AS head_code,
      |  CASE WHEN length(text) = 0 THEN -1
      |       ELSE CAST(ascii(substr(text, ((length(text) + 3) // 4 - 1) * 4 + 1, 1)) AS INT)
      |  END AS tail_code
      |FROM documents ORDER BY doc_id""".stripMargin))

  // ------------------------------------------------------------------
  // Audio energy windowing: the audio-route feature extractor — treat the
  // payload as unsigned 8-bit PCM, tumble 100-sample windows, emit
  // integer-exact sum-of-squares energy + peak amplitude per window (the
  // VAD/silence-trim front end of an audio training pipeline). Runs only
  // on kind='audio' rows — modality routing on the metadata column —
  // and stays a narrow flatMap like frame sampling.
  final case class AudioWindow(
      doc_id: Long, win_idx: Int, n_samples: Int, energy: Long, peak: Int)

  def audioEnergy(rows: Iterator[MediaRow], win: Int = 100): Iterator[AudioWindow] =
    rows.flatMap { r =>
      val n = r.payload.length
      (0 until (n + win - 1) / win).iterator.map { i =>
        val off = i * win
        val len = math.min(win, n - off)
        var e = 0L; var p = 0; var j = 0
        while (j < len) {
          val v = (r.payload(off + j) & 0xff) - 128 // center unsigned PCM
          e += v.toLong * v
          if (math.abs(v) > p) p = math.abs(v)
          j += 1
        }
        AudioWindow(r.doc_id, i, len, e, p)
      }
    }

  val audioEnergyQ: Q = Q(
    "multimodal_audio_energy",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      mediaTable(s, dir)
        .filter(col("kind") === "audio")
        .select(col("doc_id"), col("payload"), col("kind"))
        .as[MediaRow]
        .mapPartitions(rs => audioEnergy(rs))
        .toDF()
        .orderBy(col("doc_id"), col("win_idx"))
    },
    Some("""WITH f AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    unnest(range(0, (length(text) + 99) // 100)) AS wi
      |  FROM documents WHERE doc_id % 3 = 1),
      |w AS (
      |  SELECT doc_id, wi, CAST(least(100, n - wi * 100) AS INT) AS len, text
      |  FROM f)
      |SELECT doc_id, CAST(wi AS INT) AS win_idx, len AS n_samples,
      |  CAST(list_sum(list_transform(range(1, len + 1),
      |    j -> CAST((ascii(substr(text, wi * 100 + j, 1)) - 128)
      |       * (ascii(substr(text, wi * 100 + j, 1)) - 128) AS BIGINT)))
      |    AS BIGINT) AS energy,
      |  CAST(list_max(list_transform(range(1, len + 1),
      |    j -> abs(ascii(substr(text, wi * 100 + j, 1)) - 128))) AS INT) AS peak
      |FROM w ORDER BY doc_id, win_idx""".stripMargin))

  // ------------------------------------------------------------------
  // REAL codec path: `javax.imageio` ships in the JDK, so the decode seam
  // that the byte-fold queries stub is exercised for real here — a
  // deterministic grayscale image is synthesized per document, encoded to
  // genuine PNG bytes (zlib-compressed, CRC-checked IDAT chunks), then
  // decoded back through `ImageIO.read` and feature-extracted from the
  // DECODED raster. The oracle recomputes every output from the pixel
  // formula alone, so a decoder that returned anything but the true pixel
  // values would hash-mismatch. Same 100 TB shape as the stubs: encode +
  // decode are one narrow mapPartitions pass, payloads never shuffle.
  object PngCodec {
    def width(docId: Long): Int = 8 + (docId % 9).toInt // 8..16
    def height(docId: Long): Int = 8 + (docId % 7).toInt // 8..14
    def pixel(docId: Long, x: Int, y: Int): Int =
      ((docId * 31 + x * 7 + y * 13) % 256).toInt

    /** Encode an arbitrary grayscale pixel field as real PNG bytes (the
      * [[JpegCodec.encodeGray]] twin — lets callers encode variants of
      * the synthetic image, e.g. the brightness-shifted near-copies the
      * perceptual-hash dedup pairs up). */
    def encodeGray(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, px(x, y)); x += 1 }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }

    /** Encode the synthetic image for `docId` as real PNG bytes. */
    def encode(docId: Long): Array[Byte] =
      encodeGray(width(docId), height(docId), (x, y) => pixel(docId, x, y))
  }

  final case class PngFeatures(
      doc_id: Long, width: Int, height: Int, png_bytes_min: Int,
      pixel_sum: Long, checksum: Long,
      thumb_w: Int, thumb_h: Int, thumb_sum: Long, n_px_ok: Int)

  /** Partition-local: encode → real ImageIO decode → features from the
    * decoded raster (row-major fold, x fastest), plus a nearest-neighbor
    * 2× downsample taken from the DECODED pixels (the thumbnail shape).
    * `n_px_ok` counts decoded pixels equal to the generator formula — the
    * oracle pins it to width*height, so the round trip must be lossless.
    * `png_bytes_min` sanity-pins that a real container was parsed: any
    * PNG is at least the 8-byte signature + IHDR + IDAT + IEND (≥ 57).
    */
  def pngDecodeFeatures(ids: Iterator[Long]): Iterator[PngFeatures] = {
    javax.imageio.ImageIO.setUseCache(false) // no disk-backed stream cache
    ids.map { id =>
      val bytes = PngCodec.encode(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val w = img.getWidth; val h = img.getHeight
      val r = img.getRaster
      var sum = 0L; var chk = 0L; var ok = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = r.getSample(x, y, 0)
          sum += v
          chk = (chk * 131 + v) % 1000000007L
          if (v == PngCodec.pixel(id, x, y)) ok += 1
          x += 1
        }
        y += 1
      }
      val tw = w / 2; val th = h / 2
      var tsum = 0L
      y = 0
      while (y < th) {
        var x = 0
        while (x < tw) { tsum += r.getSample(x * 2, y * 2, 0); x += 1 }
        y += 1
      }
      PngFeatures(id, w, h, if (bytes.length >= 57) 1 else 0,
        sum, chk, tw, th, tsum, ok)
    }
  }

  val pngDecode: Q = Q(
    "multimodal_png_decode",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(pngDecodeFeatures _)
        .toDF()
        .orderBy(col("doc_id"))
    },
    Some("""WITH g AS (
      |  SELECT doc_id,
      |    8 + CAST(doc_id % 9 AS INT) AS width,
      |    8 + CAST(doc_id % 7 AS INT) AS height
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, width, height,
      |    list_transform(range(0, CAST(width * height AS BIGINT)),
      |      i -> (doc_id * 31 + (i % width) * 7 + (i // width) * 13) % 256)
      |      AS px
      |  FROM g)
      |SELECT doc_id, width, height, 1 AS png_bytes_min,
      |  CAST(list_sum(px) AS BIGINT) AS pixel_sum,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), px),
      |    (a, b) -> (a * 131 + b) % 1000000007) AS BIGINT) AS checksum,
      |  width // 2 AS thumb_w, height // 2 AS thumb_h,
      |  CAST(list_sum(list_transform(
      |    range(0, CAST((width // 2) * (height // 2) AS BIGINT)),
      |    i -> (doc_id * 31 + ((i % (width // 2)) * 2) * 7
      |          + ((i // (width // 2)) * 2) * 13) % 256)) AS BIGINT)
      |    AS thumb_sum,
      |  width * height AS n_px_ok
      |FROM p ORDER BY doc_id""".stripMargin))

  // -- Real WAV codec path -------------------------------------------------
  // The audio analogue of `pngDecode`: `javax.sound.sampled` ships in the
  // JDK, so the audio seam can be exercised with a REAL container too. A
  // deterministic PCM16 mono waveform is synthesized per document, encoded
  // to genuine RIFF/WAVE bytes via `AudioSystem.write`, then parsed back
  // through `AudioSystem.getAudioInputStream` and feature-extracted from
  // the DECODED samples (energy, peak, zero-crossing rate — the VAD /
  // silence-trim front end of an audio training pipeline). The oracle
  // recomputes every output from the sample formula alone, so a decoder
  // that returned anything but the true PCM values would hash-mismatch.
  // Same 100 TB shape as the image path: encode + decode are one narrow
  // mapPartitions pass, payloads never shuffle.
  object WavCodec {
    val sampleRate = 8000
    def nSamples(docId: Long): Int = 400 + (docId % 201).toInt // 400..600
    /** Deterministic int16 sample in [-2000, 2000]. */
    def sample(docId: Long, i: Int): Int =
      ((docId * 37 + i.toLong * 17) % 4001).toInt - 2000

    /** Encode the synthetic waveform for `docId` as real WAV bytes. */
    def encode(docId: Long): Array[Byte] = {
      val n = nSamples(docId)
      val pcm = new Array[Byte](n * 2) // little-endian signed 16-bit mono
      var i = 0
      while (i < n) {
        val s = sample(docId, i)
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
  }

  final case class WavFeatures(
      doc_id: Long, n_samples: Int, sample_rate: Int, wav_bytes_min: Int,
      energy: Long, peak: Int, zero_crossings: Int, checksum: Long, n_ok: Int)

  /** Partition-local: encode → real RIFF/WAVE parse → features from the
    * decoded PCM. `n_ok` counts decoded samples equal to the generator
    * formula — the oracle pins it to n_samples, so the round trip must be
    * lossless. `wav_bytes_min` pins that a real container was parsed: any
    * WAV is at least the 44-byte RIFF+fmt+data header. `sample_rate` comes
    * from the DECODED format header, not the constant.
    */
  def wavDecodeFeatures(ids: Iterator[Long]): Iterator[WavFeatures] =
    ids.map { id =>
      val bytes = WavCodec.encode(id)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val rate = fmt.getSampleRate.toInt
      val pcm = ais.readAllBytes()
      ais.close()
      val n = pcm.length / 2
      var energy = 0L; var peak = 0; var zc = 0; var chk = 0L; var ok = 0
      var prevNonNeg = true
      var i = 0
      while (i < n) {
        // decoded little-endian signed 16-bit
        val s = ((pcm(i * 2) & 0xff) | (pcm(i * 2 + 1).toInt << 8)).toShort.toInt
        energy += s.toLong * s
        val a = math.abs(s); if (a > peak) peak = a
        val nonNeg = s >= 0
        if (i > 0 && nonNeg != prevNonNeg) zc += 1
        prevNonNeg = nonNeg
        chk = (chk * 131 + (s + 2000)) % 1000000007L
        if (s == WavCodec.sample(id, i)) ok += 1
        i += 1
      }
      WavFeatures(id, n, rate, if (bytes.length >= 44) 1 else 0,
        energy, peak, zc, chk, ok)
    }

  val wavDecode: Q = Q(
    "multimodal_wav_decode",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(wavDecodeFeatures _)
        .toDF()
        .orderBy(col("doc_id"))
    },
    Some("""WITH g AS (
      |  SELECT doc_id, 400 + CAST(doc_id % 201 AS INT) AS n_samples
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, n_samples,
      |    list_transform(range(0, CAST(n_samples AS BIGINT)),
      |      i -> CAST((doc_id * 37 + i * 17) % 4001 AS INT) - 2000) AS sm
      |  FROM g)
      |SELECT doc_id, n_samples, 8000 AS sample_rate, 1 AS wav_bytes_min,
      |  CAST(list_sum(list_transform(sm, x -> CAST(x AS BIGINT) * x))
      |    AS BIGINT) AS energy,
      |  CAST(list_max(list_transform(sm, x -> abs(x))) AS INT) AS peak,
      |  CAST(list_sum(list_transform(range(1, CAST(n_samples AS BIGINT)),
      |    i -> CASE WHEN (sm[CAST(i AS INT)] >= 0) <> (sm[CAST(i AS INT) + 1] >= 0)
      |              THEN 1 ELSE 0 END)) AS INT) AS zero_crossings,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(sm, x -> CAST(x + 2000 AS BIGINT))),
      |    (a, b) -> (a * 131 + b) % 1000000007) AS BIGINT) AS checksum,
      |  n_samples AS n_ok
      |FROM p ORDER BY doc_id""".stripMargin))

  // -- Real JPEG codec path ------------------------------------------------
  // The LOSSY companion to `pngDecode`: the JDK's ImageIO ships a pure-Java
  // JPEG reader/writer, so the lossy-image seam is exercised with a real
  // DCT codec and zero new dependencies. Lossy means the oracle cannot
  // replay pixel values — so this pins like `q_approx_stats_pinned`:
  // decoded-vs-source error is computed IN-ENGINE and the oracle pins the
  // tolerance booleans TRUE (plus the exact dims, which JPEG preserves).
  // The synthetic image is a smooth two-axis gradient (no mod-256 wraps —
  // sharp edges are exactly what DCT quantization mangles); at quality
  // 0.95 the measured worst case over the id range is max|err| = 1,
  // MAE < 0.3, so the pinned bounds (max ≤ 8, MAE ≤ 2.0) have ~8× margin
  // while still catching any broken decode path (a channel swap, a stride
  // bug, or a failed inverse DCT all blow well past them).
  // Same 100 TB shape as the PNG path: encode + decode + feature-extract
  // in one narrow mapPartitions pass, payloads never shuffle.
  object JpegCodec {
    val Quality = 0.95f
    def width(docId: Long): Int = 16 + (docId % 9).toInt // 16..24
    def height(docId: Long): Int = 16 + (docId % 7).toInt // 16..22
    /** Smooth gradient: x-ramp to 160 + y-ramp to 80 + per-doc bias < 16,
      * max 255 with integer division — reproducible in DuckDB as
      * `(x*160)//(w-1) + (y*80)//(h-1) + id%16`. */
    def pixel(docId: Long, w: Int, h: Int, x: Int, y: Int): Int =
      (x * 160) / (w - 1) + (y * 80) / (h - 1) + (docId % 16).toInt

    /** Encode the synthetic image for `docId` as real JPEG bytes at the
      * pinned quality. */
    def encode(docId: Long): Array[Byte] = {
      val w = width(docId); val h = height(docId)
      encodeGray(w, h, (x, y) => pixel(docId, w, h, x, y))
    }

    /** Encode an arbitrary grayscale formula as real JPEG bytes at the
      * pinned quality (MODE_EXPLICIT — the default write path would pick
      * 0.75 and shrink the error margin). Shared by the still path and the
      * motion-JPEG frame writer. */
    def encodeGray(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, px(x, y)); x += 1
        }
        y += 1
      }
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(Quality)
      val baos = new java.io.ByteArrayOutputStream()
      val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try {
        writer.setOutput(out)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally { writer.dispose(); out.close() }
      baos.toByteArray
    }
  }

  // -- Motion-JPEG container: the video route, made real ------------------
  // No video codec ships in the JDK, but motion-JPEG needs none: a video
  // stream of independently-coded JPEG frames in a trivial container
  // (magic + frame count + frame lengths + concatenated JPEG payloads —
  // the payload layout AVI/MJPG and MJPEG-over-HTTP use). Every frame is a
  // REAL lossy JPEG through the same ImageIO DCT codec as `jpegDecode`, so
  // the former "exotic codec stand-in" route now walks a real container
  // AND decodes real frames. Frame-stride sampling decodes ONLY the
  // sampled frames — unsampled payload bytes are sliced past, never handed
  // to a decoder, which is the partial-decode contract a 100 TB video
  // pipeline lives by (decode cost ∝ sampled frames, not stored frames).
  // Per-frame brightness steps by 16 per frame index, so an off-by-one in
  // the sampling stride shifts every pixel by ~16 and blows the ≤6 error
  // bound (measured codec error on the smooth gradient is ≤2).
  object MjpegCodec {
    val Magic: Array[Byte] = "MJPG".getBytes("US-ASCII")
    def nFrames(docId: Long): Int = 3 + (docId % 4).toInt // 3..6
    /** Flatter gradient than the still path so the +16/frame brightness
      * ramp stays in 8-bit range at every frame:
      * max = 96 + 48 + 15 + 5*16 = 239 < 255. */
    def pixel(docId: Long, w: Int, h: Int, f: Int, x: Int, y: Int): Int =
      (x * 96) / (w - 1) + (y * 48) / (h - 1) + (docId % 16).toInt + f * 16

    def encode(docId: Long): Array[Byte] = {
      val w = JpegCodec.width(docId); val h = JpegCodec.height(docId)
      val n = nFrames(docId)
      val frames = (0 until n).map { f =>
        JpegCodec.encodeGray(w, h, (x, y) => pixel(docId, w, h, f, x, y))
      }
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(out)
      d.write(Magic); d.writeInt(n)
      frames.foreach(fr => d.writeInt(fr.length))
      frames.foreach(d.write)
      d.flush()
      out.toByteArray
    }
  }

  final case class MjpegFeatures(
      doc_id: Long, n_frames: Int, n_sampled: Int,
      container_ok: Boolean, dims_ok: Boolean,
      max_err_le_6: Boolean, mae_x100_le_150: Boolean)

  /** Partition-local: encode → container walk → STRIDE-2 frame sample →
    * real JPEG decode of sampled frames only → error metrics vs the frame
    * formula. Unsampled frames are skipped by offset arithmetic. */
  def mjpegDecodeFeatures(ids: Iterator[Long]): Iterator[MjpegFeatures] = {
    javax.imageio.ImageIO.setUseCache(false)
    ids.map(id => scoreMjpeg(id, MjpegCodec.encode(id)))
  }

  /** Container walk + sampled decode + scoring, separated from the encode
    * so corruption tests can feed damaged bytes. A bad magic flags
    * `container_ok` and skips decoding rather than throwing — one damaged
    * asset must not kill the partition (the dead-letter principle). */
  private[operators] def scoreMjpeg(id: Long, bytes: Array[Byte]): MjpegFeatures = {
      def dead = MjpegFeatures(id, 0, 0, container_ok = false,
        dims_ok = false, max_err_le_6 = false, mae_x100_le_150 = false)
      if (bytes.length < MjpegCodec.Magic.length + 4) return dead
      val in = java.nio.ByteBuffer.wrap(bytes)
      val magicOk = MjpegCodec.Magic.forall(b => in.get() == b)
      if (!magicOk) return dead
      val n = in.getInt
      // a corrupted frame COUNT or length table must flag the asset, not
      // kill the partition: bound n by what the buffer can hold before
      // allocating, bound every slice before decoding — the dead-letter
      // principle the scaladoc promises, for every field, not just magic
      if (n < 0 || n > (bytes.length - 12) / 4) return dead
      val lens = Array.fill(n)(in.getInt)
      val containerOk = magicOk &&
        lens.sum == bytes.length - (8 + 4 * n) && lens.forall(_ > 125)
      val w0 = JpegCodec.width(id); val h0 = JpegCodec.height(id)
      var off = 8 + 4 * n
      var dimsOk = true; var maxErr = 0; var sumErr = 0L; var nPix = 0L
      var sampled = 0
      var decodeFailed = false
      (0 until n).foreach { f =>
        if (!decodeFailed && f % 2 == 0) { // stride-2 sample: decode this frame
          if (off < 0 || lens(f) <= 0 ||
              off.toLong + lens(f) > bytes.length) decodeFailed = true
          else {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes, off, lens(f)))
            if (img == null) decodeFailed = true // undecodable slice
            else if (img.getWidth != w0 || img.getHeight != h0) {
              // wrong-dimension frame: flag it, but DON'T walk a w0×h0
              // grid over a smaller raster (getSample would throw)
              dimsOk = false; sampled += 1
            } else {
              val r = img.getRaster
              var y = 0
              while (y < h0) {
                var x = 0
                while (x < w0) {
                  val d = math.abs(
                    r.getSample(x, y, 0) - MjpegCodec.pixel(id, w0, h0, f, x, y))
                  sumErr += d; if (d > maxErr) maxErr = d
                  x += 1
                }
                y += 1
              }
              nPix += w0.toLong * h0; sampled += 1
            }
          }
        }
        off += lens(f) // unsampled frames: slice past, never decoded
      }
      MjpegFeatures(id, n, sampled,
        container_ok = containerOk && !decodeFailed,
        dims_ok = dimsOk && !decodeFailed,
        max_err_le_6 = maxErr <= 6,
        mae_x100_le_150 = sumErr * 100L <= 150L * nPix)
  }

  val mjpegFrames: Q = Q(
    "multimodal_mjpeg_frames",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(mjpegDecodeFeatures _)
        .toDF()
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |  3 + CAST(doc_id % 4 AS INT) AS n_frames,
      |  CAST((3 + doc_id % 4 + 1) // 2 AS INT) AS n_sampled,
      |  TRUE AS container_ok, TRUE AS dims_ok,
      |  TRUE AS max_err_le_6, TRUE AS mae_x100_le_150
      |FROM documents ORDER BY doc_id""".stripMargin))

  final case class JpegFeatures(
      doc_id: Long, width: Int, height: Int,
      jpeg_sig_ok: Boolean, jpeg_container_ok: Boolean, dims_ok: Boolean,
      max_err_le_8: Boolean, mae_x100_le_200: Boolean)

  /** Partition-local: encode → real ImageIO JPEG decode → error metrics
    * against the generator formula from the DECODED raster.
    * `jpeg_sig_ok` pins the container markers (SOI `FFD8` … EOI `FFD9` —
    * a real entropy-coded stream was written, not a raw dump);
    * `jpeg_container_ok` pins a plausible encoded size (≥ 125 bytes: SOI +
    * JFIF APP0 + quant/huffman tables + scan); `dims_ok` pins the decoded
    * frame header; the two error booleans pin the lossy round trip inside
    * the measured-margin bounds documented on [[JpegCodec]].
    */
  def jpegDecodeFeatures(ids: Iterator[Long]): Iterator[JpegFeatures] = {
    javax.imageio.ImageIO.setUseCache(false) // no disk-backed stream cache
    ids.map { id =>
      val w0 = JpegCodec.width(id); val h0 = JpegCodec.height(id)
      val bytes = JpegCodec.encode(id)
      val sigOk = bytes.length >= 4 &&
        bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte &&
        bytes(bytes.length - 2) == 0xff.toByte &&
        bytes(bytes.length - 1) == 0xd9.toByte
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val w = img.getWidth; val h = img.getHeight
      val r = img.getRaster
      var sumErr = 0L; var maxErr = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d = math.abs(
            r.getSample(x, y, 0) - JpegCodec.pixel(id, w0, h0, x, y))
          sumErr += d; if (d > maxErr) maxErr = d
          x += 1
        }
        y += 1
      }
      JpegFeatures(id, w, h,
        jpeg_sig_ok = sigOk,
        jpeg_container_ok = bytes.length >= 125,
        dims_ok = w == w0 && h == h0,
        max_err_le_8 = maxErr <= 8,
        mae_x100_le_200 = sumErr * 100L <= 200L * w0 * h0)
    }
  }

  val jpegDecode: Q = Q(
    "multimodal_jpeg_decode",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(jpegDecodeFeatures _)
        .toDF()
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |  16 + CAST(doc_id % 9 AS INT) AS width,
      |  16 + CAST(doc_id % 7 AS INT) AS height,
      |  TRUE AS jpeg_sig_ok, TRUE AS jpeg_container_ok, TRUE AS dims_ok,
      |  TRUE AS max_err_le_8, TRUE AS mae_x100_le_200
      |FROM documents ORDER BY doc_id""".stripMargin))

  // -- Perceptual-hash image dedup (dHash over the real PNG round trip) ----
  // The image member of the dedup family: a 56-bit difference hash from an
  // 8×8 nearest-neighbor downsample of the DECODED raster (bit r·7+c = 1
  // iff grid(r,c) < grid(r,c+1) — brightness-invariant by construction,
  // the property that makes it a NEAR-dup hash where a byte hash is
  // exact-only). The corpus is documents ∪ brightness-shifted copies
  // (+2, clamped at 255, id + 4e6) — each copy round-trips through a real
  // PNG encode/decode, and because +2 preserves almost every neighbor
  // comparison (only clamp-equalized pairs flip), original and copy land
  // within hamming ≤ 3.
  //
  // Candidate generation is the SimHash banding discipline: 4 bands × 14
  // bits; hamming ≤ 3 across 4 bands pigeonholes ≥ 1 clean band, so the
  // band equi-join provably generates EVERY qualifying pair (banded+filter
  // ≡ all-pairs+filter — which is why the oracle's identical band join is
  // exact, not approximate) at Σ_bucket |bucket|² cost, never corpus².
  // 56 bits, not 64: DuckDB raises on 1::BIGINT << 63 (the simhash60
  // lesson), and 8 rows × 7 comparisons is the natural dHash grid anyway.
  //
  // 100 TB shape: encode+decode+hash is one mapPartitions (payloads never
  // shuffle — only the 8-byte hash does); the band join shuffles 4 rows
  // of 24 bytes per image; the pigeonhole bound keeps the pair stage
  // linear in true near-dup density.
  final case class PhashRow(vid: Long, dhash: Long)

  private val PhashBands = 4
  private val PhashBandBits = 14
  private val PhashMaxHamming = 3

  /** 56-bit dHash from a decoded grayscale raster: 8 sample rows × 7
    * adjacent-column comparisons on an 8×8 sampling grid. The ONE
    * definition shared by the image ([[phashRows]]), video-frame
    * ([[videoFrameHashes]]), and cross-modal ([[crossModalHashes]])
    * pipelines — a grid change applied to one would silently desynchronize
    * the three banded indexes (and their oracles' replayed formulas). */
  private def dhash56(r: java.awt.image.Raster, w: Int, h: Int): Long = {
    var dh = 0L
    var row = 0
    while (row < 8) {
      val gy = row * h / 8
      var c = 0
      while (c < 7) {
        val p1 = r.getSample(c * w / 8, gy, 0)
        val p2 = r.getSample((c + 1) * w / 8, gy, 0)
        if (p1 < p2) dh |= 1L << (row * 7 + c)
        c += 1
      }
      row += 1
    }
    dh
  }

  /** Banded near-pair generation over a (id, dhash) frame: 4×14-band
    * bucket join (pigeonhole-exact for hamming ≤ [[PhashMaxHamming]]) +
    * exact hamming verification. Returns (id_a, id_b, hamming),
    * unordered — shared by the image, cross-modal, and audio pipelines
    * (the video pipeline bands per frame and aggregates, so it keeps its
    * own join). */
  private def bandedNearPairs(hashes: DataFrame, idCol: String): DataFrame = {
    val banded = withBands(hashes)
    banded
      .select(col("band"), col("bv"), col(idCol).as("id_a"),
        col("dhash").as("ha"))
      .join(banded.select(col("band"), col("bv"), col(idCol).as("id_b"),
        col("dhash").as("hb")), Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ha"), col("hb")).distinct()
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast(IntegerType))
      .filter(col("hamming") <= PhashMaxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Append exploded (band, bv) columns — 4 bands × 14 bits of the `dhash`
    * column, the shared banded-index layout of the three phash pipelines.
    * Keeps every existing column (Catalyst prunes unused ones). */
  private def withBands(df: DataFrame): DataFrame = {
    val keep = df.columns.toSeq.map(col)
    df.select(keep :+ explode(array((0 until PhashBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), b * PhashBandBits)
            .bitwiseAND(lit((1L << PhashBandBits) - 1)).as("bv"))): _*))
        .as("bb"): _*)
      .select(keep :+ col("bb.band").as("band") :+ col("bb.bv").as("bv"): _*)
  }

  /** Pixel field for the phash corpus — deliberately NOT [[PngCodec.pixel]]:
    * that linear gradient makes every synthetic image perceptually
    * near-identical (adjacent-sample differences are a constant mod 256),
    * which measured 200k qualifying pairs at sf0.01 — a correct hash over
    * a degenerate corpus. The quadratic cross-term makes doc_id matter
    * beyond mod-256 (a pure `(d·C + …) % 256` field repeats its image
    * every ≤256 docs and pair counts go quadratic at sf0.1 — measured),
    * so distinct docs get perceptually distinct images: banding then
    * yields exactly the 500/5000 planted pairs + a handful of background
    * collisions at both SFs. */
  private[operators] def phashPixel(did: Long, x: Int, y: Int): Int =
    (((did + x * 1009L + y * 9176L + 1) * (did * 2 + x + y + 7)) % 1000003L
      % 256).toInt

  def phashRows(ids: Iterator[Long]): Iterator[PhashRow] = {
    javax.imageio.ImageIO.setUseCache(false)
    ids.flatMap { id =>
      Seq((id, 0), (id + 4000000L, 2)).map { case (vid, shift) =>
        val w = PngCodec.width(id); val h = PngCodec.height(id)
        val bytes = PngCodec.encodeGray(w, h,
          (x, y) => math.min(phashPixel(id, x, y) + shift, 255))
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        PhashRow(vid, dhash56(img.getRaster, w, h))
      }
    }
  }

  val phashDedup: Q = Q(
    "multimodal_phash_dedup",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      // hashes feed both band-join sides — checkpoint, or the whole
      // encode/decode pipeline runs once per side (no-shared-subplans)
      val hashes = Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(phashRows _).toDF()
        .localCheckpoint(true)
      bandedNearPairs(hashes, "vid")
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH base AS (
      |  SELECT doc_id AS vid, doc_id AS did, 0 AS shift FROM documents
      |  UNION ALL SELECT doc_id + 4000000, doc_id, 2 FROM documents),
      |g AS (
      |  SELECT vid, did, shift,
      |    8 + CAST(did % 9 AS INT) AS w, 8 + CAST(did % 7 AS INT) AS h
      |  FROM base),
      |hs AS (
      |  SELECT vid,
      |    CAST(list_sum(list_transform(range(0, 56), i ->
      |      CASE WHEN
      |        least(((did + ((i % 7) * w // 8) * 1009
      |                + ((i // 7) * h // 8) * 9176 + 1)
      |               * (did * 2 + ((i % 7) * w // 8)
      |                  + ((i // 7) * h // 8) + 7)) % 1000003 % 256
      |              + shift, 255)
      |        <
      |        least(((did + (((i % 7) + 1) * w // 8) * 1009
      |                + ((i // 7) * h // 8) * 9176 + 1)
      |               * (did * 2 + (((i % 7) + 1) * w // 8)
      |                  + ((i // 7) * h // 8) + 7)) % 1000003 % 256
      |              + shift, 255)
      |      THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END))
      |      AS BIGINT) AS dhash
      |  FROM g),
      |banded AS (
      |  SELECT vid, dhash, t.b,
      |    (dhash >> (t.b * $PhashBandBits)) & ${(1L << PhashBandBits) - 1} AS bv
      |  FROM hs, unnest([0, 1, 2, 3]) AS t(b)),
      |pairs AS (
      |  SELECT DISTINCT a.vid AS id_a, b2.vid AS id_b,
      |    a.dhash AS ha, b2.dhash AS hb
      |  FROM banded a
      |  JOIN banded b2 ON a.b = b2.b AND a.bv = b2.bv AND a.vid < b2.vid)
      |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
      |FROM pairs
      |WHERE bit_count(xor(ha, hb)) <= $PhashMaxHamming
      |ORDER BY id_a, id_b""".stripMargin))

  // -- Audio framing over the real WAV decode ------------------------------
  // The decode → frame-explode shape of a real audio pipeline: parse the
  // RIFF/WAVE container once, window the DECODED PCM into fixed 160-sample
  // frames (20 ms at 8 kHz, the standard VAD hop), and emit one row per
  // frame with energy / peak / zero-crossings / an activity boolean.
  // Complements `multimodal_wav_decode` (whole-clip features) with the
  // frame-level fan-OUT: one input row becomes ceil(n/160) output rows,
  // all computed inside the same narrow mapPartitions pass — the payload
  // never shuffles, only the small per-frame feature rows do. The oracle
  // recomputes every frame from the sample formula with list slicing, so
  // a mis-strided window or an off-by-one frame boundary hash-mismatches.
  private val FrameWin = 160
  private val ActivePerSample = 1300000L // ~mean sample energy (4001²/12)

  final case class AudioFrame(
      doc_id: Long, frame_id: Int, n: Int, energy: Long, peak: Int,
      zero_crossings: Int, active: Boolean)

  def wavFrames(ids: Iterator[Long], win: Int = FrameWin): Iterator[AudioFrame] =
    ids.flatMap { id =>
      val bytes = WavCodec.encode(id)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcm = ais.readAllBytes()
      ais.close()
      val n = pcm.length / 2
      def sampleAt(i: Int): Int =
        ((pcm(i * 2) & 0xff) | (pcm(i * 2 + 1).toInt << 8)).toShort.toInt
      (0 until (n + win - 1) / win).map { f =>
        val lo = f * win
        val hi = math.min(lo + win, n)
        var energy = 0L; var peak = 0; var zc = 0
        var i = lo
        var prevNonNeg = true
        while (i < hi) {
          val s = sampleAt(i)
          energy += s.toLong * s
          val a = math.abs(s); if (a > peak) peak = a
          val nonNeg = s >= 0
          if (i > lo && nonNeg != prevNonNeg) zc += 1
          prevNonNeg = nonNeg
          i += 1
        }
        AudioFrame(id, f, hi - lo, energy, peak, zc,
          energy >= (hi - lo).toLong * ActivePerSample)
      }
    }

  val audioFraming: Q = Q(
    "multimodal_audio_framing",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(ids => wavFrames(ids))
        .toDF()
        .orderBy(col("doc_id"), col("frame_id"))
    },
    Some(s"""WITH g AS (
      |  SELECT doc_id, 400 + CAST(doc_id % 201 AS INT) AS n_samples
      |  FROM documents),
      |p AS (
      |  SELECT doc_id,
      |    list_transform(range(0, CAST(n_samples AS BIGINT)),
      |      i -> CAST((doc_id * 37 + i * 17) % 4001 AS INT) - 2000) AS sm,
      |    n_samples
      |  FROM g),
      |fr AS (
      |  SELECT doc_id, CAST(f AS INT) AS frame_id,
      |    sm[CAST(f * $FrameWin + 1 AS INT) :
      |       CAST(least(f * $FrameWin + $FrameWin, n_samples) AS INT)] AS fs
      |  FROM p, unnest(range(0, (n_samples + $FrameWin - 1) // $FrameWin))
      |    AS u(f))
      |SELECT doc_id, frame_id,
      |  CAST(len(fs) AS INT) AS n,
      |  CAST(list_sum(list_transform(fs, x -> CAST(x AS BIGINT) * x))
      |    AS BIGINT) AS energy,
      |  CAST(list_max(list_transform(fs, x -> abs(x))) AS INT) AS peak,
      |  CAST(COALESCE(list_sum(list_transform(range(1, len(fs)),
      |    i -> CASE WHEN (fs[CAST(i AS INT)] >= 0) <> (fs[CAST(i AS INT) + 1] >= 0)
      |              THEN 1 ELSE 0 END)), 0) AS INT) AS zero_crossings,
      |  list_sum(list_transform(fs, x -> CAST(x AS BIGINT) * x))
      |    >= len(fs) * $ActivePerSample AS active
      |FROM fr ORDER BY doc_id, frame_id""".stripMargin))

  // -- Video-level near-duplicate detection --------------------------------
  // The video axis of the dedup family: a re-encoded/brightness-shifted
  // copy of a clip must collapse onto its original even though no byte of
  // the two containers matches. Pipeline: container walk → real PNG codec
  // decode of EVERY frame → per-frame 56-bit dHash → banded LSH join
  // FRAME-ALIGNED (same frame index, same band value) → exact hamming ≤ 3
  // verify per frame → per-pair aggregation; a pair is video_near when
  // near frames reach a majority of the longer clip. Frames are LOSSLESS
  // PNG inside the MJPG-style length-table container (magic VPNG), so —
  // unlike the JPEG tolerance pins of `multimodal_mjpeg_frames` — the
  // whole pipeline is exactly replicable in the oracle: decoded samples
  // equal the generator formula bit-for-bit and DuckDB recomputes every
  // dhash from it (the `multimodal_phash_dedup` discipline lifted to one
  // hash per FRAME).
  //
  // Planted structure: 8 member docs per video group (gid = doc_id div 8)
  // encode the same per-(gid, frame) pseudorandom pixel field (the
  // [[phashPixel]] non-degenerate family, frame-salted as gid·11 + f)
  // under a member brightness shift (doc_id mod 8) mod 3 — within the
  // hamming tolerance per frame with overwhelming probability; distinct
  // groups get perceptually unrelated frames, so the band join stays
  // Σ bucket², never corpus².
  //
  // 100 TB shape: decode + hash is one narrow mapPartitions — payload
  // bytes never shuffle, 8-byte frame hashes do (≤6 per video); the
  // frame-aligned band join prunes harder than image banding (collision
  // needs same f AND same band value); verification and the pair
  // aggregate are linear in candidate volume.
  object VpngCodec {
    val Magic: Array[Byte] = "VPNG".getBytes("US-ASCII")
    def nFrames(gid: Long): Int = 3 + (gid % 4).toInt // 3..6, group-level
    def encode(gid: Long, shift: Int): Array[Byte] = {
      val w = PngCodec.width(gid); val h = PngCodec.height(gid)
      val frames = (0 until nFrames(gid)).map { f =>
        PngCodec.encodeGray(w, h, (x, y) =>
          math.min(phashPixel(gid * 11 + f, x, y) + shift, 255))
      }
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(out)
      d.write(Magic); d.writeInt(frames.length)
      frames.foreach(fr => d.writeInt(fr.length))
      frames.foreach(d.write)
      d.flush()
      out.toByteArray
    }
  }

  final case class VideoFrameHash(doc_id: Long, f: Int, n_frames: Int, dhash: Long)

  /** Partition-local: encode the member's container → walk the length
    * table → real ImageIO PNG decode per frame → 56-bit dHash from the
    * DECODED raster. A malformed container fails loudly: unlike the
    * tolerance-scored MJPEG path, this corpus is generated in-process and
    * a walk error here is a code bug, not a bad asset. */
  def videoFrameHashes(ids: Iterator[Long]): Iterator[VideoFrameHash] = {
    javax.imageio.ImageIO.setUseCache(false)
    ids.flatMap { id =>
      val gid = id / 8
      val shift = (id % 8).toInt % 3
      val bytes = VpngCodec.encode(gid, shift)
      val in = java.nio.ByteBuffer.wrap(bytes)
      VpngCodec.Magic.foreach(b => require(in.get() == b,
        s"video_neardup: bad container magic for doc $id"))
      val n = in.getInt
      val lens = Array.fill(n)(in.getInt)
      var off = 8 + 4 * n
      (0 until n).map { f =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes, off, lens(f)))
        off += lens(f)
        VideoFrameHash(id, f, n,
          dhash56(img.getRaster, img.getWidth, img.getHeight))
      }
    }
  }

  val videoNearDup: Q = Q(
    "multimodal_video_neardup",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      // frame hashes feed both band-join sides AND the per-doc length
      // lookup — checkpoint, or the whole encode/decode runs per use
      val hashes = Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(videoFrameHashes _).toDF()
        .localCheckpoint(true)
      val nfs = hashes.groupBy(col("doc_id"))
        .agg(first(col("n_frames")).as("nf"))
      val banded = withBands(hashes)
      val nearFrames = banded
        .select(col("f"), col("band"), col("bv"),
          col("doc_id").as("id_a"), col("dhash").as("ha"))
        .join(banded.select(col("f"), col("band"), col("bv"),
          col("doc_id").as("id_b"), col("dhash").as("hb")),
          Seq("f", "band", "bv"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("f"), col("ha"), col("hb"))
        .distinct() // one row per near frame, however many bands collided
        .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= PhashMaxHamming)
      nearFrames.groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_near_frames"))
        .join(nfs.select(col("doc_id").as("id_a"), col("nf").as("n_frames_a")),
          "id_a")
        .join(nfs.select(col("doc_id").as("id_b"), col("nf").as("n_frames_b")),
          "id_b")
        .select(col("id_a"), col("id_b"),
          col("n_frames_a"), col("n_frames_b"), col("n_near_frames"),
          (lit(2) * col("n_near_frames") >=
            greatest(col("n_frames_a"), col("n_frames_b"))).as("video_near"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH g AS (
      |  SELECT doc_id, doc_id // 8 AS gid,
      |    CAST(doc_id % 8 AS INT) % 3 AS shift,
      |    3 + CAST((doc_id // 8) % 4 AS INT) AS nf,
      |    8 + CAST((doc_id // 8) % 9 AS INT) AS w,
      |    8 + CAST((doc_id // 8) % 7 AS INT) AS h
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, gid, shift, nf, w, h, CAST(t.f AS INT) AS f,
      |    gid * 11 + t.f AS did
      |  FROM g, unnest(range(0, nf)) AS t(f)),
      |hs AS (
      |  SELECT doc_id, f, nf,
      |    CAST(list_sum(list_transform(range(0, 56), i ->
      |      CASE WHEN
      |        least(((did + ((i % 7) * w // 8) * 1009
      |                + ((i // 7) * h // 8) * 9176 + 1)
      |               * (did * 2 + ((i % 7) * w // 8)
      |                  + ((i // 7) * h // 8) + 7)) % 1000003 % 256
      |              + shift, 255)
      |        <
      |        least(((did + (((i % 7) + 1) * w // 8) * 1009
      |                + ((i // 7) * h // 8) * 9176 + 1)
      |               * (did * 2 + (((i % 7) + 1) * w // 8)
      |                  + ((i // 7) * h // 8) + 7)) % 1000003 % 256
      |              + shift, 255)
      |      THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END))
      |      AS BIGINT) AS dhash
      |  FROM fr),
      |banded AS (
      |  SELECT doc_id, f, dhash, t.b,
      |    (dhash >> (t.b * $PhashBandBits)) & ${(1L << PhashBandBits) - 1} AS bv
      |  FROM hs, unnest([0, 1, 2, 3]) AS t(b)),
      |nearf AS (
      |  SELECT id_a, id_b, f FROM (
      |    SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, a.f,
      |      a.dhash AS ha, b2.dhash AS hb
      |    FROM banded a
      |    JOIN banded b2 ON a.f = b2.f AND a.b = b2.b AND a.bv = b2.bv
      |      AND a.doc_id < b2.doc_id)
      |  WHERE bit_count(xor(ha, hb)) <= $PhashMaxHamming),
      |agg AS (
      |  SELECT id_a, id_b, COUNT(*) AS n_near FROM nearf GROUP BY id_a, id_b)
      |SELECT agg.id_a, agg.id_b,
      |  CAST(ga.nf AS INT) AS n_frames_a, CAST(gb.nf AS INT) AS n_frames_b,
      |  CAST(agg.n_near AS BIGINT) AS n_near_frames,
      |  2 * agg.n_near >= greatest(ga.nf, gb.nf) AS video_near
      |FROM agg
      |JOIN g ga ON ga.doc_id = agg.id_a
      |JOIN g gb ON gb.doc_id = agg.id_b
      |ORDER BY agg.id_a, agg.id_b""".stripMargin))

  // -- Cross-modal alignment dedup -----------------------------------------
  // The pair-level "same image, different caption" signal a multimodal
  // curation pipeline needs (web-scraped image-caption corpora are full of
  // one image re-posted under many captions; keeping all copies leaks the
  // image across train/eval splits while the caption-only dedup axes see
  // nothing). Each document row is an (image, caption) pair: the image is
  // the REAL PNG codec path keyed by the doc's image GROUP (gid = doc_id
  // div 10, brightness-shifted per member — the planted cross-doc near-dup
  // structure), the caption is the doc's text. Candidates come from the
  // IMAGE side's banded phash index (4×14-bit bands, pigeonhole-exact for
  // hamming ≤ 3 — never all-pairs); each image-near pair is then verified
  // on the CAPTION side with exact word-3-gram Jaccard (threshold 1/2,
  // integer form 3·|∩| ≥ |a|+|b|), classifying every pair as
  // aligned (caption_near) or MISALIGNED — the curation signal.
  //
  // 100 TB shape: encode+decode+dhash is one narrow mapPartitions
  // (payloads never shuffle, an 8-byte hash does); the band join is the
  // phashDedup discipline (Σ bucket² cost); caption verification touches
  // candidates × doc shingles, linear in candidate volume. The caption
  // stats join stays NARROW per pair (two longs), the prefix-filter
  // broadcast lesson.
  final case class CrossModalHash(doc_id: Long, dhash: Long)

  /** Per-doc image hash: group gid = doc_id/10 draws the pixel field and
    * dimensions; member shift (doc_id%10)%3 perturbs brightness within the
    * hamming tolerance (the phashDedup planted-pair construction, made
    * cross-document). Real PNG encode → ImageIO decode → 56-bit dHash. */
  def crossModalHashes(ids: Iterator[Long]): Iterator[CrossModalHash] = {
    javax.imageio.ImageIO.setUseCache(false)
    ids.map { id =>
      val gid = id / 10
      val shift = (id % 10).toInt % 3
      val w = PngCodec.width(gid); val h = PngCodec.height(gid)
      val bytes = PngCodec.encodeGray(w, h,
        (x, y) => math.min(phashPixel(gid, x, y) + shift, 255))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      CrossModalHash(id, dhash56(img.getRaster, w, h))
    }
  }

  /** Cross-modal pairs of `(doc_id, text)` rows: image-near candidates
    * from the banded phash index, caption alignment by exact 3-gram
    * Jaccard. Exposed for the planted spec. `keyOf` maps a caption
    * 3-gram to its join key — 8-byte xxhash64 by default (r16, the
    * dedup_tfidf_cosine scale key: the shingle checkpoint and both
    * intersection-join sides carry a long instead of a ~30-byte string;
    * output carries only counts, spec-pinned ≡ the string key), identity
    * for the exact twin. */
  private[graft] def crossModalPairs(baseIn: DataFrame,
      keyOf: (Column, Column, Column) => Column =
        (a, b, c) => xxhash64(a, b, c)): DataFrame = {
    val s = baseIn.sparkSession
    import s.implicits._
    // single-split corpus → spread the hash synthesis + caption shingle
    // maps across the cores first (the shingleDf discipline)
    val base = baseIn.repartition(s.sparkContext.defaultParallelism)
    val hashes = base.select(col("doc_id")).as[Long]
      .mapPartitions(crossModalHashes _).toDF()
      .localCheckpoint(true) // feeds both band-join sides
    val pairs = bandedNearPairs(hashes, "doc_id")
      .localCheckpoint(true) // feeds the caption join twice + the output
    // caption side: per-doc DISTINCT word 3-grams (array_distinct before
    // the explode — narrow; the prefix-filter lesson)
    val t = split(col("text"), " ")
    val shingle = transform(sequence(lit(1), size(t) - 2),
      i => keyOf(element_at(t, i), element_at(t, i + 1),
        element_at(t, i + 2)))
    val sh = base.filter(size(t) >= 3)
      .select(col("doc_id"), explode(array_distinct(shingle)).as("s"))
      .localCheckpoint(true)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("id_a"), col("s")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")),
        Seq("id_a"), "left")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")),
        Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"), col("hamming"),
        coalesce(col("c"), lit(0L)).as("n_common"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      // aligned: J >= 1/2 on non-empty caption shingle sets; a pair of
      // too-short captions is NOT "aligned" by vacuity
      .withColumn("caption_near",
        (col("n_a") + col("n_b") > 0) &&
          (lit(3) * col("n_common") >= col("n_a") + col("n_b")))
      .withColumn("misaligned", !col("caption_near"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val crossModal: Q = Q(
    "multimodal_crossmodal_dedup",
    (s, dir) => crossModalPairs(
      Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))),
    Some(s"""WITH g AS (
      |  SELECT doc_id, doc_id // 10 AS gid,
      |    CAST(doc_id % 10 AS INT) % 3 AS shift,
      |    8 + CAST((doc_id // 10) % 9 AS INT) AS w,
      |    8 + CAST((doc_id // 10) % 7 AS INT) AS h
      |  FROM documents),
      |hs AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(0, 56), i ->
      |      CASE WHEN
      |        least(((gid + ((i % 7) * w // 8) * 1009
      |                + ((i // 7) * h // 8) * 9176 + 1)
      |               * (gid * 2 + ((i % 7) * w // 8)
      |                  + ((i // 7) * h // 8) + 7)) % 1000003 % 256
      |              + shift, 255)
      |        <
      |        least(((gid + (((i % 7) + 1) * w // 8) * 1009
      |                + ((i // 7) * h // 8) * 9176 + 1)
      |               * (gid * 2 + (((i % 7) + 1) * w // 8)
      |                  + ((i // 7) * h // 8) + 7)) % 1000003 % 256
      |              + shift, 255)
      |      THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END))
      |      AS BIGINT) AS dhash
      |  FROM g),
      |banded AS (
      |  SELECT doc_id, dhash, t.b,
      |    (dhash >> (t.b * $PhashBandBits)) & ${(1L << PhashBandBits) - 1} AS bv
      |  FROM hs, unnest([0, 1, 2, 3]) AS t(b)),
      |pairs AS (
      |  SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
      |  FROM (
      |    SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
      |      a.dhash AS ha, b2.dhash AS hb
      |    FROM banded a
      |    JOIN banded b2 ON a.b = b2.b AND a.bv = b2.bv
      |      AND a.doc_id < b2.doc_id)
      |  WHERE bit_count(xor(ha, hb)) <= $PhashMaxHamming),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS s
      |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 3),
      |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT p.id_a, p.id_b, COUNT(*) AS c
      |  FROM pairs p
      |    JOIN sh a ON a.doc_id = p.id_a
      |    JOIN sh b ON b.doc_id = p.id_b AND b.s = a.s
      |  GROUP BY p.id_a, p.id_b)
      |SELECT p.id_a, p.id_b, p.hamming,
      |  COALESCE(i.c, 0) AS n_common,
      |  COALESCE(za.n, 0) AS n_a, COALESCE(zb.n, 0) AS n_b,
      |  COALESCE(za.n, 0) + COALESCE(zb.n, 0) > 0
      |    AND 3 * COALESCE(i.c, 0) >= COALESCE(za.n, 0) + COALESCE(zb.n, 0)
      |    AS caption_near,
      |  NOT (COALESCE(za.n, 0) + COALESCE(zb.n, 0) > 0
      |    AND 3 * COALESCE(i.c, 0) >= COALESCE(za.n, 0) + COALESCE(zb.n, 0))
      |    AS misaligned
      |FROM pairs p
      |LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
      |LEFT JOIN sz za ON za.doc_id = p.id_a
      |LEFT JOIN sz zb ON zb.doc_id = p.id_b
      |ORDER BY p.id_a, p.id_b""".stripMargin))

  // -- Audio near-dup --------------------------------------------------------
  // The audio axis of the near-dup family (images: phashDedup; video:
  // videoNearDup): per-doc audio through the REAL WAV codec — encode via
  // AudioSystem.write, parse back via getAudioInputStream — then a 56-bit
  // energy-contour fingerprint from the DECODED PCM: 57 equal 7-sample
  // window SUMS, bit j = (sum_j < sum_{j+1}). Adjacent-window comparison
  // is the audio analogue of dHash's adjacent-pixel comparison, and for
  // the same reason it is EXACTLY invariant to a constant DC offset
  // (equal-length windows shift by the same amount) — the perturbation
  // the planted members carry (gid = doc_id div 8 draws the waveform,
  // shift = (doc_id mod 8) mod 3 offsets it), so same-group fingerprints
  // are bit-identical and the 4×14-band join finds every planted pair at
  // hamming 0 with zero cross-group collisions on this corpus (the
  // quadratic cross-term waveform — the phashPixel lesson — keeps
  // distinct groups' contours distinct). The hamming ≤ 3 budget is the
  // standard tolerance dial for perturbations that DON'T cancel
  // (resampling jitter, codec noise). Whole pipeline oracle-replayed from
  // the sample formula: a decoder returning anything but the true PCM
  // values would hash-mismatch.
  //
  // 100 TB shape: encode+decode+fingerprint is one narrow mapPartitions
  // (payloads never shuffle — 8 bytes per clip do); the band join is the
  // phashDedup discipline (Σ bucket² cost).
  object AudioFpCodec {
    val Windows = 57
    val WinLen = 7
    val NSamples: Int = Windows * WinLen // 399 — within every clip length
    /** Quadratic cross-term waveform (1-d phashPixel): distinct groups get
      * genuinely distinct energy contours — a linear sawtooth here made
      * fingerprints collide corpus-wide (measured 1.05M qualifying pairs
      * at sf0.1 vs the planted 17.5k). */
    def baseSample(gid: Long, i: Int): Int =
      (((gid + i * 1009L + 1) * (gid * 2 + i + 7)) % 1000003L % 4001L).toInt - 2000
    /** Member waveform: base + DC shift (cancels exactly in the window
      * comparisons; int16 range is safe at ±2002). */
    def memberSample(gid: Long, shift: Int, i: Int): Int =
      baseSample(gid, i) + shift

    /** Real RIFF/WAVE bytes for one member clip. */
    def encode(gid: Long, shift: Int): Array[Byte] = {
      val pcm = new Array[Byte](NSamples * 2)
      var i = 0
      while (i < NSamples) {
        val s = memberSample(gid, shift, i)
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        WavCodec.sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, NSamples.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
  }

  final case class AudioFpRow(doc_id: Long, dhash: Long)

  /** Partition-local: encode the member's clip → real WAV parse → 56-bit
    * energy-contour fingerprint from the DECODED samples. */
  def audioFingerprints(ids: Iterator[Long]): Iterator[AudioFpRow] =
    ids.map { id =>
      val gid = id / 8
      val shift = (id % 8).toInt % 3
      val bytes = AudioFpCodec.encode(gid, shift)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcm = ais.readAllBytes()
      ais.close()
      require(pcm.length / 2 == AudioFpCodec.NSamples,
        s"audio_neardup: decoded ${pcm.length / 2} samples for doc $id")
      def s(i: Int): Int =
        ((pcm(i * 2) & 0xff) | (pcm(i * 2 + 1).toInt << 8)).toShort.toInt
      val sums = new Array[Long](AudioFpCodec.Windows)
      var i = 0
      while (i < AudioFpCodec.NSamples) {
        sums(i / AudioFpCodec.WinLen) += s(i)
        i += 1
      }
      var fp = 0L
      var j = 0
      while (j < AudioFpCodec.Windows - 1) {
        if (sums(j) < sums(j + 1)) fp |= 1L << j
        j += 1
      }
      AudioFpRow(id, fp)
    }

  val audioNearDup: Q = Q(
    "multimodal_audio_neardup",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      // fingerprints feed both band-join sides — checkpoint, or the whole
      // encode/decode pipeline runs once per side (no-shared-subplans)
      val hashes = Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions(audioFingerprints _).toDF()
        .localCheckpoint(true)
      bandedNearPairs(hashes, "doc_id")
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH g AS (
      |  SELECT doc_id, doc_id // 8 AS gid,
      |    CAST(doc_id % 8 AS INT) % 3 AS shift
      |  FROM documents),
      |sums AS (
      |  SELECT doc_id, list_transform(range(0, ${AudioFpCodec.Windows}), j ->
      |    list_sum(list_transform(range(0, ${AudioFpCodec.WinLen}), k ->
      |      ((gid + (j * ${AudioFpCodec.WinLen} + k) * 1009 + 1)
      |       * (gid * 2 + (j * ${AudioFpCodec.WinLen} + k) + 7))
      |      % 1000003 % 4001 - 2000 + shift))) AS sm
      |  FROM g),
      |hs AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(0, ${AudioFpCodec.Windows - 1}), j ->
      |      CASE WHEN sm[CAST(j AS INT) + 1] < sm[CAST(j AS INT) + 2]
      |           THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END))
      |      AS BIGINT) AS dhash
      |  FROM sums),
      |banded AS (
      |  SELECT doc_id, dhash, t.b,
      |    (dhash >> (t.b * $PhashBandBits)) & ${(1L << PhashBandBits) - 1} AS bv
      |  FROM hs, unnest([0, 1, 2, 3]) AS t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
      |    a.dhash AS ha, b2.dhash AS hb
      |  FROM banded a
      |  JOIN banded b2 ON a.b = b2.b AND a.bv = b2.bv
      |    AND a.doc_id < b2.doc_id)
      |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
      |FROM cand WHERE bit_count(xor(ha, hb)) <= $PhashMaxHamming
      |ORDER BY id_a, id_b""".stripMargin))

  val all: Seq[Q] =
    Seq(features, decode, frames, resizeQ, audioEnergyQ, pngDecode, wavDecode,
      jpegDecode, mjpegFrames, phashDedup, audioFraming, crossModal,
      videoNearDup, audioNearDup)
}
