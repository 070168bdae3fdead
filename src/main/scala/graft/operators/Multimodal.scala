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
  * `mapInPandas`: one iterator per partition, so a decoder library is
  * initialized once per partition/batch, not per row). PNG and WAV are
  * decoded FOR REAL: `containerize` wraps the payload bytes in
  * spec-conformant containers (PNG magic + CRC32-checked IHDR/IDAT;
  * RIFF/WAVE chunk list) and `decodeBatch` parses them back — magic
  * verification, big-endian header reads, CRC validation, chunk walks.
  * Only the video branch remains a deterministic stand-in (no ISO-BMFF
  * demuxer in this environment), clearly marked at its match arm.
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

  // ---------------------------------------------------------------------
  // Real media containers. The testdata carries text, not media; a real
  // lake carries PNG/WAV/MP4 containers. `containerize` synthesizes a
  // byte-exact container around the text bytes (spec-conformant PNG with
  // CRC32-checked chunks; spec-conformant RIFF/WAVE), and the decode
  // stage downstream PARSES those containers for real — magic
  // verification, big-endian IHDR width/height, CRC validation, chunk
  // walk to the media data. Synthesis is deterministic in the payload
  // bytes, which is what keeps the DuckDB oracle replayable.
  // ---------------------------------------------------------------------

  private val PNG_MAGIC: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue
  }

  private def be32(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt((v & 0xffffffffL).toInt).array()

  private def readBe32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def readLe32(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)

  private def readLe16(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val body = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ data
    be32(data.length.toLong) ++ body ++ be32(crc32(body))
  }

  /** A spec-conformant PNG container: magic, CRC-checked IHDR
    * (8-bit RGBA, non-interlaced), the media bytes as one IDAT, IEND.
    * The IDAT payload is carried verbatim (a real encoder would
    * zlib-compress filtered scanlines; carrying raw bytes keeps the
    * container byte-deterministic without a compressor in the loop).
    */
  def pngContainer(data: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val ihdr = be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, 6, 0, 0, 0) // bit depth, RGBA, deflate, adaptive, none
    PNG_MAGIC ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", data) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** A spec-conformant RIFF/WAVE container: 16 kHz stereo 16-bit PCM
    * (block align 4), the media bytes as the data chunk.
    */
  def wavContainer(data: Array[Byte]): Array[Byte] = {
    def le32(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt((v & 0xffffffffL).toInt).array()
    def le16(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    def ascii(s: String) =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val sampleRate = 16000
    val channels = 2
    val bitsPerSample = 16
    val blockAlign = channels * bitsPerSample / 8
    val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate.toLong) ++
      le32(sampleRate.toLong * blockAlign) ++ le16(blockAlign) ++
      le16(bitsPerSample)
    // RIFF chunks pad to even length; the pad byte is not counted in len
    val pad: Array[Byte] =
      if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    val body = ascii("WAVE") ++
      ascii("fmt ") ++ le32(fmt.length.toLong) ++ fmt ++
      ascii("data") ++ le32(data.length.toLong) ++ data ++ pad
    ascii("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** Wrap a raw payload in its mime's container. MP4 stays raw: an
    * ISO-BMFF box synthesizer/parser is out of scope here, so the video
    * branch of the decoder remains the one acknowledged stub.
    */
  def containerize(r: MediaRow): MediaRow = r.mime match {
    case "image/png" =>
      val n = r.payload.length
      MediaRow(r.doc_id,
        pngContainer(r.payload, 64 + n % 576, 64 + n % 416), r.mime)
    case "audio/wav" => MediaRow(r.doc_id, wavContainer(r.payload), r.mime)
    case _ => r
  }

  /** Decoded PNG header + media bytes. */
  final case class PngDecoded(width: Int, height: Int, idat: Array[Byte])

  /** A genuine PNG parse: verifies the 8-byte magic, requires IHDR
    * first with length 13, reads big-endian width/height, validates
    * every chunk's CRC32, and walks the chunk list concatenating IDAT
    * payloads until IEND. Throws on any malformed byte — decoder
    * behavior, not formula lookup.
    */
  def decodePng(bytes: Array[Byte]): PngDecoded = {
    require(bytes.length >= 8 && bytes.take(8).sameElements(PNG_MAGIC),
      "not a PNG: bad magic")
    var off = 8
    var width = -1
    var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 8 <= bytes.length, "truncated PNG: no chunk header")
      val len = readBe32(bytes, off).toInt
      require(len >= 0, "PNG chunk length overflow")
      require(off + 12 + len <= bytes.length, "truncated PNG chunk")
      val tag = new String(bytes, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val body = java.util.Arrays.copyOfRange(bytes, off + 4, off + 8 + len)
      require(crc32(body) == readBe32(bytes, off + 8 + len),
        s"PNG chunk $tag: CRC mismatch")
      tag match {
        case "IHDR" =>
          require(off == 8 && len == 13, "PNG IHDR must be first, len 13")
          width = readBe32(bytes, off + 8).toInt
          height = readBe32(bytes, off + 12).toInt
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk: skip
      }
      off += 12 + len
    }
    require(width > 0 && height > 0, "PNG missing IHDR")
    PngDecoded(width, height, idat.toByteArray)
  }

  /** Decoded WAV header + media bytes. */
  final case class WavDecoded(blockAlign: Int, data: Array[Byte])

  /** A genuine RIFF/WAVE parse: verifies RIFF/WAVE tags, walks the
    * little-endian chunk list, reads block align from `fmt ` and the
    * media bytes from `data`.
    */
  def decodeWav(bytes: Array[Byte]): WavDecoded = {
    def tag(off: Int) = new String(bytes, off, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a WAV: bad RIFF/WAVE header")
    var off = 12
    var blockAlign = -1
    var data: Array[Byte] = null
    while (off + 8 <= bytes.length) {
      val len = readLe32(bytes, off + 4).toInt
      require(len >= 0, "WAV chunk length overflow")
      require(off + 8 + len <= bytes.length, "truncated WAV chunk")
      tag(off) match {
        case "fmt " =>
          require(len >= 14, "WAV fmt chunk too short")
          blockAlign = readLe16(bytes, off + 20)
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
        case _ => ()
      }
      // odd-length chunks are followed by a pad byte not counted in len
      off += 8 + len + (len % 2)
    }
    require(blockAlign > 0 && data != null, "WAV missing fmt/data chunk")
    WavDecoded(blockAlign, data)
  }

  /** The batched decode stage: a real parser over real containers for
    * PNG (magic + CRC-checked IHDR/IDAT walk) and WAV (RIFF chunk walk);
    * features and checksum come from the PARSED header and media bytes.
    * The video branch is the one remaining stub — a production build
    * links an ISO-BMFF/ffmpeg demuxer there; its features derive
    * deterministically from the raw bytes so the oracle replays them.
    * Dataflow: typed rows in, one iterator per partition (decoder state
    * initialized once per partition, not per row), features out.
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[DecodedMedia] =
    rows.map { r =>
      r.mime match {
        case "image/png" =>
          val p = decodePng(r.payload)
          DecodedMedia(r.doc_id, r.mime, p.width, p.height, 1,
            payloadChecksum(p.idat))
        case "audio/wav" =>
          val w = decodeWav(r.payload)
          DecodedMedia(r.doc_id, r.mime, 0, 0,
            w.data.length / w.blockAlign, payloadChecksum(w.data))
        case _ => // STUB: video demuxer not available in this environment
          DecodedMedia(r.doc_id, r.mime, 320, 240, r.payload.length / 16,
            payloadChecksum(r.payload))
      }
    }

  /** Typed decode pipeline: metadata projection → containerize → a
    * per-partition genuine decode. Containerize and decode fuse into one
    * narrow stage; no shuffle at any scale.
    */
  def decoded(s: SparkSession, d: String): Dataset[DecodedMedia] = {
    import s.implicits._
    mediaFrame(s, d)
      .select(col("doc_id"), col("payload"), col("mime"))
      .as[MediaRow]
      .mapPartitions(it => decodeBatch(it.map(containerize)))
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
