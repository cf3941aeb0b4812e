package graft.functions

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (LLM-pipeline tier): media as opaque
  * `binary` payloads + typed metadata struct, with decode/feature-extract
  * as per-partition batch functions.
  *
  * The image/audio codec libraries are not in this container, so
  * `decodeStub` is a DETERMINISTIC FAKE standing in for the real decoder
  * (e.g. JNI/ONNX). Everything around it — the binary column, the
  * metadata schema, the per-partition handle lifecycle in
  * `decodeBatchPartitions` (open the expensive decoder once per
  * partition, stream rows through it), the UDF signature — is the real
  * production shape; swapping the stub for a codec changes no plumbing.
  *
  * `documents.text` bytes play the media payload (the fixtures carry no
  * real media; using the driver's own table keeps the DuckDB oracle
  * runnable: octet_length/md5 agree byte-for-byte on the cast).
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  case class MediaMeta(width: Int, height: Int, checksum: String)
  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class Decoded(doc_id: Long, width: Int, height: Int, checksum: String)

  /** STUB decoder — deterministic fake for the absent codec. Width/height
    * derive from the bytes; checksum is md5 hex (oracle-friendly). */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val w = if (payload.isEmpty) 0 else (payload(0) & 0xff) % 64 + 1
    val h = payload.length % 48 + 1
    MediaMeta(w, h, hex)
  }

  /** The media table: binary payload + metadata struct columns. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Production decode shape: mapPartitions so the (expensive) decoder is
    * constructed once per partition and rows stream through in batches —
    * the Scala analog of mapInPandas batch decode. */
  def decodeBatchPartitions(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one decoder handle per partition (stub here; codec/ONNX session in prod)
      val decode: Array[Byte] => MediaMeta = decodeStub
      rows.map { r =>
        val m = decode(r.payload)
        Decoded(r.doc_id, m.width, m.height, m.checksum)
      }
    }
  }

  /** Metadata projection over the binary column (pure columnar). */
  val mediaMetaQ: Q = (s, d) =>
    mediaTable(s, d).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("payload_bytes"))

  /** Decode through the per-partition batch path; output is
    * SQL-checkable because the stub is deterministic. */
  val mediaDecodeQ: Q = (s, d) => {
    import s.implicits._
    val media = mediaTable(s, d).select(col("doc_id"), col("payload")).as[MediaRow]
    decodeBatchPartitions(media).toDF()
  }

  val queries: Map[String, Q] = Map(
    "q30_media_meta" -> mediaMetaQ,
    "q31_media_decode" -> mediaDecodeQ,
  )

  val oracles: Map[String, String] = Map(
    "q30_media_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        | octet_length(CAST(text AS BLOB)) AS payload_bytes
        |FROM documents""".stripMargin,
    "q31_media_decode" ->
      """SELECT doc_id,
        | CASE WHEN length(text) = 0 THEN 0
        |      ELSE ascii(substring(text,1,1)) % 64 + 1 END AS width,
        | octet_length(CAST(text AS BLOB)) % 48 + 1 AS height,
        | md5(text) AS checksum
        |FROM documents""".stripMargin,
  )
}
