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
    * derive from the bytes; checksum is md5 hex (oracle-friendly). Total
    * on null (treated as empty bytes) so library callers outside the
    * routed pipelines can't NPE on a null media column. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val p = if (payload == null) Array.emptyByteArray else payload
    val w = if (p.isEmpty) 0 else (p(0) & 0xff) % 64 + 1
    MediaMeta(w, p.length % 48 + 1, Scalars.md5Hex(p))
  }

  /** ImageIO's default read path caches every stream through a TEMP FILE
    * (one create+delete per row in the hot decode loop — and in a
    * container with a read-only/full tmpdir, an IOException per row that
    * the undecodable-payload catch would silently fold into "drop every
    * row"). Memory caching removes both the churn and that environment
    * failure mode. JVM-global, set once on first use. */
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decoder — javax.imageio ships with the JDK, so PNG/BMP/
    * GIF/JPEG payloads decode to their true pixel dimensions with no
    * external dependency. Returns None for bytes no registered reader
    * accepts (callers split those to an error side, P4-style). Checksum
    * is md5 of the payload, same contract as the stub. */
  def decodeImage(payload: Array[Byte]): Option[MediaMeta] = {
    imageIoMemCache
    // ImageIO returns null for unrecognized bytes but THROWS for
    // recognized-yet-corrupt payloads (valid magic, truncated body) —
    // both are "not decodable" for the caller, so both map to None.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    Option(img).map(i =>
      MediaMeta(i.getWidth, i.getHeight, Scalars.md5Hex(payload)))
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
    * the Scala analog of mapInPandas batch decode. `decoder` is a
    * FACTORY invoked inside each partition: a real codec/ONNX session
    * holds non-serializable native state, so only the factory closure
    * ships to executors and the handle itself is opened per partition —
    * a bare `Array[Byte] => ...` parameter could never deliver that
    * lifecycle (the handle it closed over would fail task
    * serialization). Rows the decoder rejects — including null payloads,
    * which no codec can open — are dropped here (the error-split
    * variant routes them separately). Default factory yields the stub;
    * pass `() => decodeImage` for real image bytes — MediaDecodeSpec
    * drives real PNGs/BMPs through this exact path. */
  def decodeBatchPartitions(media: Dataset[MediaRow],
      decoder: () => Array[Byte] => Option[MediaMeta] =
        () => p => Some(decodeStub(p))): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one decoder handle per partition (codec/ONNX session in prod)
      val decode = decoder()
      rows.flatMap { r =>
        Option(r.payload).flatMap(decode)
          .map(m => Decoded(r.doc_id, m.width, m.height, m.checksum))
      }
    }
  }

  /** P4-style error split for the decode path: one pass tags each row
    * with its decode result, then the two filters prune to the side they
    * keep — rejected payloads are ROUTED (doc_id + payload preserved for
    * a dead-letter sink), not silently dropped as in the plain
    * decodeBatchPartitions. The tagged intermediate is persisted so the
    * decoder runs ONCE per row even when both sides are consumed (and a
    * non-deterministic production decoder cannot route a row to
    * both/neither side). The returned handle is the CACHED tagged
    * intermediate itself — `.unpersist()` it once both sides are
    * materialized (unpersisting the derived datasets would be a no-op:
    * their flatMapped plans never match the cache entry), otherwise LRU
    * eviction reclaims the pinned payload bytes eventually. */
  def decodeSplit(media: Dataset[MediaRow],
      decoder: () => Array[Byte] => Option[MediaMeta] =
        () => p => Some(decodeStub(p)))
      : (Dataset[Decoded], Dataset[MediaRow], Dataset[_]) = {
    import media.sparkSession.implicits._
    val tagged = media.mapPartitions { rows =>
      val decode = decoder() // one handle per partition (see factory note above)
      rows.map(r => (r.doc_id, r.payload,
        Option(r.payload).flatMap(decode))) // null payload → rejected side
    }.persist()
    val ok = tagged.flatMap { case (id, _, m) =>
      m.map(x => Decoded(id, x.width, x.height, x.checksum))
    }
    val rejected = tagged.flatMap { case (id, payload, m) =>
      if (m.isEmpty) Some(MediaRow(id, payload)) else None
    }
    (ok, rejected, tagged)
  }

  /** STUB frame sampler: split the payload into `n` evenly-spaced
    * fixed-size byte windows ("frames"). Real codec variant decodes
    * keyframes; plumbing (binary→array<binary>) is identical. */
  def frameSample(payload: Array[Byte], n: Int, frameLen: Int): Array[Array[Byte]] = {
    if (payload == null || payload.isEmpty || n <= 0) return Array.empty
    val step = math.max(1, payload.length / n)
    (0 until n).map { i =>
      val start = math.min(i * step, math.max(0, payload.length - 1))
      payload.slice(start, math.min(start + frameLen, payload.length))
    }.filter(_.nonEmpty).toArray
  }

  /** STUB resize: truncate/zero-pad the payload to `size` bytes (real
    * variant is the codec's scale op; output stays binary). */
  def resizeStub(payload: Array[Byte], size: Int): Array[Byte] =
    java.util.Arrays.copyOf(payload, size)

  /** STUB feature extractor: deterministic float vector from payload
    * chunks (chunk checksums scaled to [-1, 1]) — the media→embedding
    * bridge into the similarity tier. Real variant runs a vision/audio
    * model per partition (see decodeBatchPartitions for the handle
    * lifecycle). */
  def featuresFromPayload(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    if (payload == null || payload.isEmpty) return out
    val chunk = math.max(1, payload.length / dims)
    var d = 0
    while (d < dims) {
      var h = 1125899906842597L // FNV-ish seed
      var i = d * chunk
      val end = math.min(i + chunk, payload.length)
      while (i < end) { h = h * 31 + (payload(i) & 0xff); i += 1 }
      out(d) = (Math.floorMod(h, 2000003L).toFloat / 1000001.5f) - 1.0f
      d += 1
    }
    out
  }

  case class MediaFeatures(doc_id: Long, n_frames: Int, features: Array[Float])

  /** Full media pipeline: frame-sample → resize → feature-extract, per
    * partition (one decoder/model handle per partition). */
  def featureBatchPartitions(media: Dataset[MediaRow], nFrames: Int = 4,
      frameLen: Int = 64, dims: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val frames = frameSample(r.payload, nFrames, frameLen)
        // an empty payload samples no frames, but the oracle's fixed
        // nFrames×frameLen zero-padded grid still FOLDS (zero bytes →
        // seed-derived features, nonzero norm); mirror it or the two
        // engines diverge on empty documents (n_frames stays 0)
        val padded =
          if (frames.isEmpty) Array.fill(nFrames)(new Array[Byte](frameLen))
          else frames.map(resizeStub(_, frameLen))
        val feats = featuresFromPayload(padded.flatten, dims)
        MediaFeatures(r.doc_id, frames.length, feats)
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

  /** Media features through the per-partition pipeline — media →
    * embedding bridge, end to end (ApproxSpec pins the values). The
    * stub hash IS DuckDB-expressible: the oracle below replays
    * frame-sample → zero-pad → per-chunk FNV fold with HUGEINT
    * arithmetic mod 2^64 (JVM longs wrap silently; SQL must simulate)
    * and float32 scaling, so even this query hash-compares. */
  val mediaFeaturesQ: Q = (s, d) => {
    import s.implicits._
    val media = mediaTable(s, d).select(col("doc_id"), col("payload")).as[MediaRow]
    featureBatchPartitions(media).toDF()
      .select(col("doc_id"), col("n_frames"),
        round(SimilarityOps.norm(col("features").cast("array<double>")), 4).as("feature_norm"))
  }

  val queries: Map[String, Q] = Map(
    "q30_media_meta" -> mediaMetaQ,
    "q31_media_decode" -> mediaDecodeQ,
    "q49_media_features" -> mediaFeaturesQ,
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
    // Replays featureBatchPartitions in SQL: 4 frames at starts
    // min(i*step, len-1), zero-padded to 64 bytes each (fixtures are
    // ASCII, so ascii(substr) == the payload byte), then per 16-byte
    // chunk the FNV-ish fold h = h*31 + b in HUGEINT mod 2^64 (the JVM
    // wraps longs silently; SQL must do it explicitly), Java floorMod
    // via the signed reinterpretation, float32 scale to [-1,1), and the
    // double left-fold norm rounded to 4 — the same rounding the Spark
    // side applies to this aggregate.
    "q49_media_features" ->
      """WITH d AS (
        |  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS len,
        |         greatest(1, octet_length(CAST(text AS BLOB)) // 4) AS step
        |  FROM documents),
        |flat AS (
        |  SELECT doc_id, len,
        |    flatten(list_transform(range(4), i ->
        |      list_transform(range(64), j ->
        |        CASE WHEN least(i*step, len-1) + j < len
        |          THEN ascii(substr(text, least(i*step, len-1) + j + 1, 1))
        |          ELSE 0 END))) AS bytes
        |  FROM d),
        |feat AS (
        |  SELECT doc_id, len,
        |    list_transform(range(16), dd ->
        |      list_reduce(
        |        list_prepend(1125899906842597::HUGEINT,
        |          list_transform(list_slice(bytes, dd*16 + 1, dd*16 + 16),
        |            b -> b::HUGEINT)),
        |        (h, b) -> (h * 31 + b) % 18446744073709551616::HUGEINT)) AS hs
        |  FROM flat),
        |vals AS (
        |  SELECT doc_id, len,
        |    list_transform(hs, h ->
        |      ((((CASE WHEN h >= 9223372036854775808::HUGEINT
        |           THEN h - 18446744073709551616::HUGEINT ELSE h END) % 2000003)
        |         + 2000003) % 2000003)::BIGINT) AS ms
        |  FROM feat)
        |SELECT doc_id,
        |  CASE WHEN len > 0 THEN 4 ELSE 0 END AS n_frames,
        |  round(sqrt(list_reduce(
        |    list_prepend(0.0::DOUBLE,
        |      list_transform(ms, m -> ((m::REAL / 1000001.5::REAL) - 1.0::REAL)::DOUBLE
        |                              * ((m::REAL / 1000001.5::REAL) - 1.0::REAL)::DOUBLE)),
        |    (a, x) -> a + x)), 4) AS feature_norm
        |FROM vals""".stripMargin,
  )
}
