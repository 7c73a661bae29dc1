package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as a partition-local batch operator.
  *
  * The container has no image/audio codecs, so the actual decode is a
  * clearly-marked deterministic stub (`fakeDecode`); everything around it —
  * the schema shape (binary payload + metadata struct), the
  * `mapPartitions` batch boundary (the Scala analogue of a Pandas-UDF
  * `mapInPandas` batch), partitioning, and the feature schema — is real and
  * tested. Swap `fakeDecode` for a JNI/codec call and nothing else changes.
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

  // multimodal_decode: the mapPartitions path (rows-only — checksum math is
  // engine-local; unit tests pin exact expected values on fixtures).
  val decode: Q = Q(
    "multimodal_decode",
    (s, dir) => decodeFeatures(mediaTable(s, dir)).toDF().orderBy(col("doc_id")),
    None)

  val all: Seq[Q] = Seq(features, decode)
}
