package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedMedia, MediaRow}

/** Multimodal plumbing: binary payloads, typed metadata, batched decode. */
class MultimodalSpec extends SparkSuite {

  test("M1: payload bytes round-trip the binary column unchanged") {
    val rows = Multimodal.m1MultimodalMeta.fn(spark, sf)
      .select(col("doc_id"), col("payload"), col("n_bytes"), col("magic"))
      .limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      assert(payload.length.toLong === r.getAs[Long]("n_bytes"))
      assert(r.getAs[Array[Byte]]("magic").toSeq === payload.take(4).toSeq)
    }
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
