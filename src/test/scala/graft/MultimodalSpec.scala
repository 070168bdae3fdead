package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedMedia, MediaRow}

/** Multimodal plumbing: binary payloads, typed metadata, batched decode. */
class MultimodalSpec extends SparkSuite {

  test("M1: payload bytes round-trip the binary column unchanged") {
    import org.apache.spark.sql.types.BinaryType
    val frame = Multimodal.mediaFrame(spark, sf)
    // the in-flight schema is REAL binary — only m1's registered output
    // hex-encodes (driver comparator can't sort raw bytes)
    assert(frame.schema("payload").dataType === BinaryType)
    assert(frame.schema("magic").dataType === BinaryType)
    val rows = frame
      .select(col("doc_id"), col("payload"), col("n_bytes"), col("magic"))
      .limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      assert(payload.length.toLong === r.getAs[Long]("n_bytes"))
      assert(r.getAs[Array[Byte]]("magic").toSeq === payload.take(4).toSeq)
    }
  }

  test("M1: hex result edge is the exact encoding of the binary frame") {
    val hexed = Multimodal.m1MultimodalMeta.fn(spark, sf)
      .select("doc_id", "payload_hex", "magic_hex").limit(20).collect()
    val raw = Multimodal.mediaFrame(spark, sf)
      .select("doc_id", "payload", "magic").limit(20)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("payload"), r.getAs[Array[Byte]]("magic")))
      .toMap
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02X").mkString
    hexed.foreach { r =>
      val (p, m) = raw(r.getLong(0))
      assert(r.getString(1) === hx(p))
      assert(r.getString(2) === hx(m))
    }
  }

  test("M2: payloadChecksum matches the portable-h60 SQL identity") {
    // the imperative JVM checksum must equal what the oracle computes:
    // CAST('0x' || substring(md5(hex(bytes)), 1, 15) AS BIGINT)
    val bytes = "hello world".getBytes("UTF-8")
    val hexStr = bytes.map(b => f"${b & 0xff}%02X").mkString
    val viaSql = spark.sql(
      s"SELECT conv(substring(md5('$hexStr'), 1, 15), 16, 10)")
      .head().getString(0).toLong
    assert(Multimodal.payloadChecksum(bytes) === viaSql)
  }

  test("M2: decode stage is deterministic and dispatches on mime") {
    // mirror the production pipeline in decoded(): raw payload →
    // containerize → decodeBatch parses the real container back
    val bytes = "hello world".getBytes("UTF-8") // 11 bytes
    def run(mime: String) = Multimodal.decodeBatch(
      Iterator(Multimodal.containerize(MediaRow(1L, bytes, mime)))).toSeq.head
    val img = run("image/png")
    val aud = run("audio/wav")
    val vid = run("video/mp4")
    // PNG: containerize synthesizes a (64+n%576)×(64+n%416) header and
    // the decoder reads it back from the parsed IHDR; IDAT == payload
    assert(img === DecodedMedia(1L, "image/png", 64 + 11, 64 + 11, 1,
      Multimodal.payloadChecksum(bytes)))
    // WAV: block align 4 from the parsed fmt chunk; data == payload
    assert(aud.n_frames === 11 / 4 && aud.width === 0 && aud.height === 0)
    // video stays raw (acknowledged stub): fixed 320×240, len/16 frames
    assert(vid === vid.copy(width = 320, height = 240))
    assert(vid.n_frames === 11 / 16)
    // the parsed-out media bytes equal the original payload in every
    // branch, so the checksum is mime-independent; decode is pure
    assert(Set(img.checksum, aud.checksum, vid.checksum).size === 1)
    assert(run("image/png") === img)
  }

  test("M2: container parsers reject malformed input with clear errors") {
    val bytes = "hello world".getBytes("UTF-8")
    // raw (uncontainerized) bytes are not a valid container
    intercept[IllegalArgumentException](Multimodal.decodePng(bytes))
    intercept[IllegalArgumentException](Multimodal.decodeWav(bytes))
    // a flipped IDAT byte must fail the CRC check
    val png = Multimodal.pngContainer(bytes, 75, 75)
    val corrupt = png.clone()
    corrupt(8 + 25 + 8 + 2) = (corrupt(8 + 25 + 8 + 2) ^ 0x1).toByte
    val crcErr =
      intercept[IllegalArgumentException](Multimodal.decodePng(corrupt))
    assert(crcErr.getMessage.contains("CRC"))
  }

  test("M2: WAV walk honors odd-chunk padding and short-fmt guard") {
    // odd-length data chunk: container emits a pad byte, decoder skips it
    val odd = "hello".getBytes("UTF-8") // 5 bytes → padded data chunk
    val wav = Multimodal.wavContainer(odd)
    assert(wav.length % 2 === 0)
    val w = Multimodal.decodeWav(wav)
    assert(w.data.toSeq === odd.toSeq && w.blockAlign === 4)
    // a truncated fmt chunk is a clear parse error, not an index crash
    def le32(v: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def ascii(s: String) = s.getBytes("US-ASCII")
    val shortFmt = ascii("WAVE") ++ ascii("fmt ") ++ le32(4) ++
      Array[Byte](1, 0, 2, 0)
    val bad = ascii("RIFF") ++ le32(shortFmt.length) ++ shortFmt
    val e = intercept[IllegalArgumentException](Multimodal.decodeWav(bad))
    assert(e.getMessage.contains("fmt chunk too short"))
  }

  test("M2: distributed decode covers every document exactly once") {
    val docs = Tables.documents(spark, sf).count()
    val out = Multimodal.decoded(spark, sf)
    assert(out.count() === docs)
    assert(out.select("doc_id").distinct().count() === docs)
  }
}
