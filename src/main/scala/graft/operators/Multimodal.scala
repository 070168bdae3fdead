package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Queries.Q
import graft.Tables._

/** Multimodal column handling — media as opaque `binary` payloads with
  * typed metadata (BASELINE.json north star).
  *
  * The Spark-side plumbing is the real thing: binary columns through
  * scan/shuffle/sink, a typed metadata projection, and a batched
  * per-partition decode stage shaped like a real codec call
  * (`mapPartitions` over a typed Dataset — the JVM analogue of
  * `mapInPandas`: one iterator per partition, so a decoder library would
  * be initialized once per partition/batch, not per row). The decode
  * ITSELF is a clearly-marked deterministic stand-in — media codecs are
  * not available in this environment — but its signature, schema, and
  * batch shape are what a libjpeg/ffmpeg-backed version would use.
  *
  * documents.text bytes stand in for media payloads; mime is derived
  * deterministically so results are oracle-stable.
  */
object Multimodal {

  /** One media row: payload + the metadata a lake would carry. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Decoded features a real codec stage would emit. */
  final case class DecodedMedia(
      doc_id: Long, mime: String, width: Int, height: Int,
      n_frames: Int, checksum: Long)

  // ---------------------------------------------------------------------
  // M1: multimodal metadata projection — binary payload, byte length,
  // mime tag, magic-bytes prefix. Pure per-row codegen'd projection. The
  // in-flight column IS BinaryType (MultimodalSpec pins that); only the
  // REGISTERED OUTPUT is hex-encoded, because the driver's comparator
  // sorts result columns in pandas and raw bytes aren't sortable there
  // (CORRECTNESS_r02: `unhashable type: 'bytearray'`).
  // ---------------------------------------------------------------------

  /** The binary media frame every multimodal stage consumes: payload as a
    * true BinaryType column + mime tag. This is the in-flight shape
    * (scan → shuffle → codec); m1 hex-encodes it only at the result edge.
    */
  def mediaFrame(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      // true first-4-BYTES prefix (not characters): Spark's substring
      // is byte-wise on BINARY; only DuckDB needs the hex round-trip
      // (it can't slice BLOBs directly)
      substring(col("text").cast("binary"), 1, 4).as("magic"))

  val m1MultimodalMeta = Q(
    "m1_multimodal_meta",
    (s, d) =>
      mediaFrame(s, d).select(
        col("doc_id"),
        hex(col("payload")).as("payload_hex"),
        col("n_bytes"),
        col("mime"),
        hex(col("magic")).as("magic_hex")),
    Some("""SELECT doc_id, hex(encode(text)) AS payload_hex,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CASE WHEN doc_id % 3 = 0 THEN 'image/png'
           WHEN doc_id % 3 = 1 THEN 'audio/wav'
           ELSE 'video/mp4' END AS mime,
      substring(hex(encode(text)), 1, 8) AS magic_hex
      FROM documents"""))

  /** 60-bit payload checksum: md5 of the UPPERCASE hex encoding of the
    * bytes, first 15 hex digits as a long — the same portable-h60 identity
    * the engine uses everywhere (functions/Portable.scala), computed here
    * in plain JVM code because the decode stage is imperative. DuckDB
    * replays it as `CAST('0x' || substring(md5(hex(blob)), 1, 15) AS
    * BIGINT)`, which is what makes the decode stage oracle-checkable.
    */
  def payloadChecksum(payload: Array[Byte]): Long = {
    val hexStr = payload.map(b => f"${b & 0xff}%02X").mkString
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(hexStr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hx = dig.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15)
    java.lang.Long.parseLong(hx, 16)
  }

  /** The batched decode stage. STUB: a production build links a codec
    * (libjpeg/ffmpeg) here and decodes `r.payload` for real; this
    * environment has no media libraries, so features are derived
    * deterministically from the payload bytes. The dataflow — typed rows
    * in, one iterator per partition, features out — is the real shape.
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[DecodedMedia] =
    rows.map { r =>
      val n = r.payload.length
      val checksum = payloadChecksum(r.payload)
      r.mime match {
        case "image/png" =>
          DecodedMedia(r.doc_id, r.mime, 64 + n % 576, 64 + n % 416, 1,
            checksum)
        case "audio/wav" =>
          DecodedMedia(r.doc_id, r.mime, 0, 0, n / 4, checksum)
        case _ =>
          DecodedMedia(r.doc_id, r.mime, 320, 240, n / 16, checksum)
      }
    }

  /** Typed decode pipeline: metadata projection → per-partition decode. */
  def decoded(s: SparkSession, d: String): Dataset[DecodedMedia] = {
    import s.implicits._
    mediaFrame(s, d)
      .select(col("doc_id"), col("payload"), col("mime"))
      .as[MediaRow]
      .mapPartitions(decodeBatch)
  }

  // ---------------------------------------------------------------------
  // M2: the decode stage as a registered query. The decode is imperative
  // (mapPartitions), but every output feature is a pure function of the
  // payload bytes, so the oracle restates the feature math relationally
  // over hex(encode(text)) — the stub's determinism buys a full
  // rows+schema+hash check, not just rows-only.
  // ---------------------------------------------------------------------
  val m2MultimodalDecode = Q(
    "m2_multimodal_decode",
    (s, d) => decoded(s, d).toDF(),
    Some("""WITH m AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image/png'
               WHEN doc_id % 3 = 1 THEN 'audio/wav'
               ELSE 'video/mp4' END AS mime,
          octet_length(encode(text)) AS n,
          CAST(concat('0x',
            substring(md5(hex(encode(text))), 1, 15)) AS BIGINT) AS checksum
        FROM documents)
      SELECT doc_id, mime,
        CAST(CASE WHEN mime = 'image/png' THEN 64 + n % 576
                  WHEN mime = 'audio/wav' THEN 0
                  ELSE 320 END AS INTEGER) AS width,
        CAST(CASE WHEN mime = 'image/png' THEN 64 + n % 416
                  WHEN mime = 'audio/wav' THEN 0
                  ELSE 240 END AS INTEGER) AS height,
        CAST(CASE WHEN mime = 'image/png' THEN 1
                  WHEN mime = 'audio/wav' THEN n // 4
                  ELSE n // 16 END AS INTEGER) AS n_frames,
        checksum
      FROM m"""))

  // ---------------------------------------------------------------------
  // M3: frame sampling as a relational op — every 4th frame index of
  // each video payload becomes a row (the shape a frame-extraction
  // stage feeds to a vision encoder). The frame count derives from the
  // payload bytes exactly as the decode stub does, so the explode is
  // oracle-replayable; a real build would carry the frame's byte range
  // alongside the index.
  // ---------------------------------------------------------------------
  val m3FrameSample = Q(
    "m3_frame_sample",
    (s, d) =>
      documents(s, d)
        .filter(col("doc_id") % 3 === 2) // the video/mp4 slice of m1
        .select(col("doc_id"),
          expr("CAST(length(CAST(text AS BINARY)) div 16 AS INT)")
            .as("n_frames"))
        .filter(col("n_frames") > 0)
        .select(col("doc_id"), col("n_frames"),
          explode(expr("sequence(0, n_frames - 1, 4)")).as("frame_idx")),
    Some("""SELECT doc_id, n_frames,
        CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx
      FROM (SELECT doc_id,
              CAST(octet_length(encode(text)) // 16 AS INTEGER) AS n_frames
            FROM documents WHERE doc_id % 3 = 2) t
      WHERE n_frames > 0"""))

  /** All multimodal queries, registration order. */
  def all: Seq[Q] = Seq(m1MultimodalMeta, m2MultimodalDecode, m3FrameSample)
}
