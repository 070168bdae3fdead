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
    val bytes = "hello world".getBytes("UTF-8")
    val img = Multimodal.decodeBatch(
      Iterator(MediaRow(1L, bytes, "image/png"))).toSeq.head
    val aud = Multimodal.decodeBatch(
      Iterator(MediaRow(1L, bytes, "audio/wav"))).toSeq.head
    val vid = Multimodal.decodeBatch(
      Iterator(MediaRow(1L, bytes, "video/mp4"))).toSeq.head
    assert(img === DecodedMedia(1L, "image/png", 64 + 11, 64 + 11, 1,
      img.checksum))
    assert(aud.n_frames === 11 / 4 && aud.width === 0)
    assert(vid === vid.copy(width = 320, height = 240))
    // same bytes ⇒ same checksum across mimes; decode is pure
    assert(Set(img.checksum, aud.checksum, vid.checksum).size === 1)
    assert(Multimodal.decodeBatch(
      Iterator(MediaRow(1L, bytes, "image/png"))).toSeq.head === img)
  }

  test("M2: distributed decode covers every document exactly once") {
    val docs = Tables.documents(spark, sf).count()
    val out = Multimodal.decoded(spark, sf)
    assert(out.count() === docs)
    assert(out.select("doc_id").distinct().count() === docs)
  }
}
