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
    val jpg = run("image/jpeg")
    val aud = run("audio/wav")
    val vid = run("video/mp4")
    // PNG: containerize synthesizes a (64+n%576)×(64+n%416) header and
    // the decoder reads it back from the parsed IHDR; IDAT == payload
    assert(img === DecodedMedia.ok(1L, "image/png", 64 + 11, 64 + 11, 1,
      Multimodal.payloadChecksum(bytes)))
    // JPEG: (96+n%544)×(96+n%384) read back from the parsed SOF0
    assert(jpg === DecodedMedia.ok(1L, "image/jpeg", 96 + 11, 96 + 11, 1,
      Multimodal.payloadChecksum(bytes)))
    // WAV: block align 4 from the parsed fmt chunk; data == payload
    assert(aud.n_frames.contains(11 / 4) && aud.width.contains(0) &&
      aud.height.contains(0))
    // MP4: tkhd 16.16 width/height and mvhd duration read back from the
    // parsed boxes; mdat == payload
    assert(vid === vid.copy(width = Some(320 + 11), height = Some(240 + 11)))
    assert(vid.n_frames.contains(11 / 16))
    // the parsed-out media bytes equal the original payload in every
    // branch, so the checksum is mime-independent; decode is pure
    assert(Set(img.checksum, jpg.checksum, aud.checksum, vid.checksum)
      .size === 1)
    assert(run("image/png") === img)
  }

  test("M2: JPEG marker walk splits/rejoins COM segments and rejects damage") {
    // a payload past the 65533-byte COM cap must split across segments
    // and re-join byte-exactly in stream order
    val big = Array.tabulate(70000)(i => (i * 31).toByte)
    val jpeg = Multimodal.jpegContainer(big, 1024, 768)
    val j = Multimodal.decodeJpeg(jpeg)
    assert(j.width === 1024 && j.height === 768, "SOF0 be16 round-trip")
    assert(j.data.toSeq === big.toSeq, "COM segments re-join the payload")
    // raw bytes are not a JPEG
    intercept[IllegalArgumentException](
      Multimodal.decodeJpeg("hello world".getBytes("UTF-8")))
    // a clobbered marker prefix is a parse error, not a misread
    val corrupt = jpeg.clone()
    corrupt(2) = 0x00 // APP0's 0xFF marker prefix
    val e = intercept[IllegalArgumentException](
      Multimodal.decodeJpeg(corrupt))
    assert(e.getMessage.contains("marker"))
    // a truncated stream (EOI sliced off) is a clear error
    intercept[IllegalArgumentException](
      Multimodal.decodeJpeg(jpeg.dropRight(2)))
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

  test("M2: BMFF walk reads tkhd/mvhd/mdat box fields and rejects damage") {
    val bytes = (0 until 333).map(_.toByte).toArray // odd, >16 frames
    val mp4 = Multimodal.mp4Container(bytes, 1920, 1080, 77)
    // container structure: ftyp first, brand isom
    assert(new String(mp4, 4, 4, "US-ASCII") === "ftyp")
    assert(new String(mp4, 8, 4, "US-ASCII") === "isom")
    val v = Multimodal.decodeMp4(mp4)
    assert(v.width === 1920 && v.height === 1080, "16.16 tkhd round-trip")
    assert(v.nFrames === 77, "mvhd duration at timescale=fps is frames")
    assert(v.mdat.toSeq === bytes.toSeq, "mdat carries the payload")
    // raw bytes are not a BMFF file
    intercept[IllegalArgumentException](Multimodal.decodeMp4(bytes))
    // a corrupted box size must be a clear parse error, not a misread:
    // clobber the moov size field (first box after ftyp)
    val ftypSize = ((mp4(0) & 0xff) << 24) | ((mp4(1) & 0xff) << 16) |
      ((mp4(2) & 0xff) << 8) | (mp4(3) & 0xff)
    val corrupt = mp4.clone()
    corrupt(ftypSize + 3) = (corrupt(ftypSize + 3) ^ 0x40).toByte
    val e =
      intercept[IllegalArgumentException](Multimodal.decodeMp4(corrupt))
    assert(e.getMessage.contains("BMFF"))
    // a file whose moov lacks tkhd is incomplete, not silently defaulted
    val noTrak = Multimodal.decodeMp4 _
    val stripped = {
      // rebuild with an empty moov: ftyp ++ moov(len 8) ++ mdat
      val ftyp = java.util.Arrays.copyOfRange(mp4, 0, ftypSize)
      val mdatOnly = Multimodal.mp4Container(bytes, 1, 1, 0)
        .drop(ftypSize) // moov ++ mdat of a fresh container
      val moovSize = ((mdatOnly(0) & 0xff) << 24) |
        ((mdatOnly(1) & 0xff) << 16) | ((mdatOnly(2) & 0xff) << 8) |
        (mdatOnly(3) & 0xff)
      val mdat = mdatOnly.drop(moovSize)
      ftyp ++ Array[Byte](0, 0, 0, 8) ++ "moov".getBytes("US-ASCII") ++ mdat
    }
    val e2 = intercept[IllegalArgumentException](noTrak(stripped))
    assert(e2.getMessage.contains("missing"))
  }

  test("M2: distributed decode covers every document exactly once") {
    val docs = Tables.documents(spark, sf).count()
    val out = Multimodal.decoded(spark, sf)
    assert(out.count() === docs)
    assert(out.select("doc_id").distinct().count() === docs)
    // the synthetic lake is well-formed: zero error rows
    assert(out.filter(col("err").isNotNull).count() === 0)
  }

  test("M2: malformed payloads route to err rows; good rows survive") {
    // the task-survival contract: parsers throw, decodeBatch converts
    // each throw to a null-featured row with the message in err — one
    // corrupt object must not kill the partition's task
    val bytes = "hello world".getBytes("UTF-8")
    val goodPng = Multimodal.pngContainer(bytes, 75, 75)
    val truncated = goodPng.take(goodPng.length / 2)
    val crcBad = goodPng.clone()
    crcBad(8 + 25 + 8 + 2) = (crcBad(8 + 25 + 8 + 2) ^ 0x1).toByte
    val overlen = Multimodal.jpegContainer(bytes, 200, 100).clone()
    // APP0's length field (bytes 4..5) rewritten to point past the
    // buffer — the overlength-segment case
    overlen(4) = 0x7f; overlen(5) = 0xff.toByte
    val out = Multimodal.decodeBatch(Iterator(
      MediaRow(1L, goodPng, "image/png"),
      MediaRow(2L, truncated, "image/png"),
      MediaRow(3L, crcBad, "image/png"),
      MediaRow(4L, overlen, "image/jpeg"))).toSeq
    val byId = out.map(r => r.doc_id -> r).toMap
    assert(byId(1L) === DecodedMedia.ok(1L, "image/png", 75, 75, 1,
      Multimodal.payloadChecksum(bytes)),
      "a good row in the same batch must decode normally")
    assert(byId(2L).err.exists(_.contains("truncated PNG")) &&
      byId(2L).width.isEmpty && byId(2L).checksum.isEmpty)
    assert(byId(3L).err.exists(_.contains("CRC")) &&
      byId(3L).n_frames.isEmpty)
    assert(byId(4L).err.exists(_.contains("truncated JPEG segment")))
    assert(out.forall(r => r.err.isDefined ^ r.checksum.isDefined),
      "every row is exactly one of: decoded, quarantined")
  }

  test("M2: baseline JPEG profile — fill bytes, TEM/RSTn, SOS entropy") {
    // a real baseline JFIF stream: fill bytes before markers, a
    // standalone TEM marker, and an SOS whose entropy-coded data
    // contains 0xFF00 byte stuffing and an in-stream restart marker —
    // the walk must reach SOF0's dims and the EOI (r11 advice: the
    // parser now covers the profile its doc claims, not only this
    // repo's COM-carrying containers)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def seg(m: Int, body: Array[Byte]) =
      Array(0xff.toByte, m.toByte) ++ be16(body.length + 2) ++ body
    val sof = seg(0xc0, Array[Byte](8, 0, 120, 0, 80, 1)) // h=120 w=80
    val sos = seg(0xda, Array[Byte](1, 1, 0))
    val entropy = Array[Byte](0x12, 0xff.toByte, 0x00, 0x34,
      0xff.toByte, 0xd3.toByte, 0x56)
    val jpeg = Array(0xff.toByte, 0xd8.toByte) ++
      Array(0xff.toByte) ++ sof ++ // extra 0xFF = fill byte before SOF0
      Array(0xff.toByte, 0x01.toByte) ++ // standalone TEM
      sos ++ entropy ++ Array(0xff.toByte, 0xd9.toByte)
    val d = Multimodal.decodeJpeg(jpeg)
    assert(d.width === 80 && d.height === 120)
    // an unterminated entropy stream is still a clear error
    val cut = jpeg.dropRight(2)
    val e = intercept[IllegalArgumentException](Multimodal.decodeJpeg(cut))
    assert(e.getMessage.contains("entropy"))
  }

  test("M2b: each planted fixture truncation individually fails to parse") {
    // m2b's oracle restates ok/quarantined counts purely arithmetically
    // from doc_id % 7, which silently assumes EVERY half-truncated
    // container is rejected by its parser. Assert that invariant doc by
    // doc over the real fixture, so a future containerize tweak that
    // leaves some half-prefix parseable surfaces as a named test
    // failure here, not an oracle-hash red (r12 advice).
    import spark.implicits._
    val planted = Multimodal.mediaFrame(spark, sf)
      .select(col("doc_id"), col("payload"), col("mime"))
      .as[MediaRow]
      .collect()
      .filter(_.doc_id % 7 == 0)
    assert(planted.nonEmpty, "fixture must contain doc_id % 7 == 0 rows")
    planted.foreach { r =>
      val c = Multimodal.containerize(r)
      val cut = MediaRow(c.doc_id, c.payload.take(c.payload.length / 2), c.mime)
      val dec = Multimodal.decodeBatch(Iterator(cut)).next()
      assert(dec.err.isDefined,
        s"doc ${r.doc_id} (${r.mime}, ${c.payload.length} B) " +
          "still parsed after half-truncation")
    }
  }

  test("M4: perceptual hash groups account for every image; identical " +
      "rasters collide; a flipped byte can flip the hash") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.m4MediaPhash.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact accounting: Σ n_dups == images whose raster clears the
    // sample floor (no image silently dropped by the hash stage)
    val nImages = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0 &&
        length(col("text").cast("binary")) >=
          Multimodal.PHASH_SAMPLES)
      .count()
    assert(out.map(_._3).sum === nImages)
    out.foreach { case (_, keep, n) => assert(n >= 1 && keep >= 0) }
    // driver-side recompute: the Scala hash of a decoded raster equals
    // the registered query's group key for that doc
    def dhash(b: Array[Byte]): Long = {
      val n = b.length
      val s = (0 until Multimodal.PHASH_SAMPLES)
        .map(j => b((j.toLong * n / Multimodal.PHASH_SAMPLES).toInt)
          & 0xff)
      (0 until Multimodal.PHASH_SAMPLES - 1).foldLeft(0L) { (acc, i) =>
        acc | (if (s(i + 1) > s(i)) 1L << i else 0L)
      }
    }
    // identical rasters always collide (the dedup guarantee)...
    val raster = Array.tabulate(64)(i => (i * 7 % 251).toByte)
    assert(dhash(raster) === dhash(raster.clone()))
    // ...and the hash genuinely reads the bytes: flipping a sampled
    // byte to invert one comparison flips the corresponding bit
    val mutated = raster.clone()
    val p1 = (1L * raster.length / Multimodal.PHASH_SAMPLES).toInt
    mutated(p1) = 0.toByte // sample 1 now strictly below sample 0/2
    assert(dhash(mutated) !== dhash(raster),
      "hash blind to a sampled-byte change")
  }

  test("M5: window energies are the exact integer PCM arithmetic; " +
      "sub-window and non-wav docs are excluded; clipping detection " +
      "fires on full-scale samples") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // planted fixture: doc 1 = exactly one 64-sample window of
    // alternating 'abcd' samples; doc 7 = 96 samples (one full window,
    // 32 spilled); doc 4 = 50 samples (NO full window -> excluded);
    // doc 3 = an image doc (mime excluded)
    val docs = Seq(
      (1L, "abcd" * 32), (7L, "ab" * 96), (4L, "x" * 100), (3L, "y" * 200)
    ).map { case (id, t) => (id, t, "en", "s1") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("m5fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.m5AudioEnergy.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === Set(1L, 7L),
      "only wav docs with a full 64-sample window report")
    // doc 1: samples alternate 97+256*98 and 99+256*100
    val sAB = 97L + 256 * 98; val sCD = 99L + 256 * 100
    val e1 = 32 * (sAB * sAB) + 32 * (sCD * sCD)
    assert(out(1L) === ((1L, e1, e1, 0L)))
    // doc 7: 96 samples -> one window of 64 identical 'ab' samples
    assert(out(7L) === ((1L, 64 * sAB * sAB, 64 * sAB * sAB, 0L)))
    // clipping arithmetic on raw bytes (UTF-8 payloads can't reach full
    // scale, so prove the detector on hand-built PCM): 0xFF 0x7F =
    // +32767, 0x00 0x80 = -32768 — both must count as clipped under the
    // operator's signed-16-LE rule
    def signed(lo: Int, hi: Int): Int = {
      val v = (lo & 0xff) + 256 * (hi & 0xff)
      if (v >= 32768) v - 65536 else v
    }
    assert(signed(0xFF, 0x7F) === 32767 && signed(0x00, 0x80) === -32768)
    assert(signed(97, 98) === sAB.toInt, "the spec's own sample rule " +
      "matches the operator's on in-range bytes")
  }

  test("M6: cut detection is the exact frame-slice dHash arithmetic; " +
      "static video reports zero cuts; planted transition is found at " +
      "its frame index") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // video docs are doc_id % 3 == 2. doc 2: 3 frames — two identical
    // flat frames then an alternating frame (one cut, at frame 2);
    // doc 5: all-flat 4 frames (zero cuts); doc 8: ramp bytes per
    // frame with different phases; doc 1 is audio (excluded)
    val docs = Seq(
      (2L, "a" * 32 + "ab" * 8),
      (5L, "z" * 64),
      (8L, (0 until 48).map(i => ('a' + (i * (i / 16 + 1)) % 26).toChar)
        .mkString),
      (1L, "b" * 64)
    ).map { case (id, t) => (id, t, "en", "s1") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("m6fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.m6SceneCut.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out.keySet === Set(2L, 5L, 8L), "only the video slice reports")
    // independent recompute: frame split + 16-bit dHash + hamming
    def dHash(b: Array[Byte]): Long = {
      val n = b.length
      val s = (0 until 17).map(j => b((j.toLong * n / 17).toInt) & 0xff)
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (if (s(i + 1) > s(i)) 1L << i else 0L))
    }
    def expect(text: String): (Long, Long, Long, Long) = {
      val bytes = text.getBytes("UTF-8")
      val nf = bytes.length / 16
      val hashes = (0 until nf).map { i =>
        val a = (i.toLong * bytes.length / nf).toInt
        val b = ((i + 1).toLong * bytes.length / nf).toInt
        dHash(java.util.Arrays.copyOfRange(bytes, a, b))
      }
      val hams = hashes.zip(hashes.tail).map { case (p, c) =>
        java.lang.Long.bitCount(p ^ c).toLong }
      val cuts = hams.zipWithIndex.filter(_._1 >= Multimodal.CUT_TAU)
      (nf.toLong, cuts.size.toLong,
        if (hams.isEmpty) -1L else hams.max,
        cuts.headOption.map(_._2 + 1L).getOrElse(-1L))
    }
    assert(out(2L) === expect("a" * 32 + "ab" * 8), "planted-cut video")
    assert(out(2L)._2 === 1L, "exactly one cut")
    assert(out(2L)._4 === 2L, "the cut is at the alternating frame")
    assert(out(5L) === expect("z" * 64), "static video")
    assert(out(5L)._2 === 0L, "static video has zero cuts")
    assert(out(5L)._3 === 0L, "static video max hamming is 0")
    assert(out(8L) === expect(
      (0 until 48).map(i => ('a' + (i * (i / 16 + 1)) % 26).toChar)
        .mkString), "ramp video matches the recompute bit for bit")
  }

  test("E7: a re-uploaded video dups its original via keyframe " +
      "ownership; unrelated content stays clean; election is exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // doc 2: a 6-shot video; docs 5 and 11: byte-identical re-uploads
    // (both must elect 2 — the OLDEST copy — as owner, not each
    // other); doc 8: unrelated digits; doc 1: audio (excluded)
    val original = "a" * 32 + "ab" * 8 + "qqqqrrrrssssttt!" +
      "z" * 16 + "mnopmnopmnopmnop" + "!" * 16
    val docs = Seq(
      (2L, original), (5L, original), (11L, original),
      (8L, (0 until 96).map(i => ('0' + (i * 7) % 10).toChar).mkString),
      (1L, "b" * 64)
    ).map { case (id, t) => (id, t, "en", "s1") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("e7fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.e7KeyframeDedup.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(out.keySet === Set(2L, 5L, 8L, 11L),
      "every video emits a row, dup or not")
    // independent replay: frames -> dHash -> keyframes -> ownership
    def dHash(b: Array[Byte]): Long = {
      val n = b.length
      val s = (0 until 17).map(j => b((j.toLong * n / 17).toInt) & 0xff)
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (if (s(i + 1) > s(i)) 1L << i else 0L))
    }
    def keyframes(text: String): Seq[Long] = {
      val bytes = text.getBytes("UTF-8")
      val nf = bytes.length / 16
      val hs = (0 until nf).map { i =>
        val a = (i.toLong * bytes.length / nf).toInt
        val b = ((i + 1).toLong * bytes.length / nf).toInt
        dHash(java.util.Arrays.copyOfRange(bytes, a, b))
      }
      hs.head +: hs.zip(hs.tail).collect {
        case (p, c) if java.lang.Long.bitCount(p ^ c) >=
          Multimodal.CUT_TAU => c
      }
    }
    val kf = Map(2L -> keyframes(original), 5L -> keyframes(original),
      11L -> keyframes(original),
      8L -> keyframes((0 until 96).map(i =>
        ('0' + (i * 7) % 10).toChar).mkString))
    assert(kf(2L).size >= 3, "fixture must produce a multi-shot video")
    val owner = kf.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    for ((id, hs) <- kf) {
      val sh = hs.map(owner).filter(_ < id)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val best = if (sh.isEmpty) (-1L, 0L)
        else sh.toSeq.minBy { case (o, n) => (-n, o) }
      val isDup = best._2 * 2 >= hs.size
      assert(out(id) === ((hs.size.toLong, best._1, best._2, isDup)),
        s"video $id election mismatch")
    }
    // the headline semantics, stated directly
    assert(out(5L)._4 && out(5L)._2 === 2L, "re-upload 5 dups 2")
    assert(out(11L)._4 && out(11L)._2 === 2L,
      "re-upload 11 elects the OLDEST copy, not 5")
    assert(!out(8L)._4, "unrelated video stays clean")
    assert(out(5L)._3 === out(5L)._1,
      "an identical copy shares every keyframe")
  }

  test("M7: audio fingerprint survives container re-encoding, breaks on " +
      "a contour change, and elects min-doc owners per family") {
    import spark.implicits._
    def le32(v: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def ascii(s: String) = s.getBytes("US-ASCII")
    // 8 windows of alternating energy (128 bytes = 64 samples each)
    val textA = ("a" * 128 + "Z" * 128) * 4
    // near-miss: the final low/high window pair swapped — the
    // contour's tail comparisons flip (a flattened tail would NOT:
    // strict-greater scores equal and less identically)
    val textC = ("a" * 128 + "Z" * 128) * 3 + "Z" * 128 + "a" * 128
    val pcm = textA.getBytes("UTF-8")
    // re-encoding: same PCM data chunk, DIFFERENT container — an
    // ancillary LIST chunk spliced before data (decoders skip unknown
    // chunks; a byte hash of the file would split the pair)
    val wav1 = Multimodal.wavContainer(pcm)
    val fmtBody = java.util.Arrays.copyOfRange(wav1, 20, 20 + 16)
    val body = ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ fmtBody ++
      ascii("LIST") ++ le32(4) ++ ascii("INFO") ++
      ascii("data") ++ le32(pcm.length) ++ pcm
    val wav2 = ascii("RIFF") ++ le32(body.length) ++ body
    assert(!wav1.sameElements(wav2), "the two encodings differ as bytes")
    val fpA1 = Multimodal.audioFingerprint(Multimodal.decodeWav(wav1).data)
    val fpA2 = Multimodal.audioFingerprint(Multimodal.decodeWav(wav2).data)
    assert(fpA1.isDefined && fpA1 === fpA2,
      "identical PCM must fingerprint identically across encodings")
    val fpC = Multimodal.audioFingerprint(textC.getBytes("UTF-8"))
    assert(fpC.isDefined && fpC != fpA1,
      "a contour change must break the fingerprint")
    // query-level election over a planted corpus: 1 and 4 share PCM
    // (owner = min = 1), 7 is the near-miss, 3 is an image (excluded)
    val docs = Seq((1L, textA), (4L, textA), (7L, textC), (3L, textA))
      .map { case (id, t) => (id, t, "en", "s1") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("m7fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.m7AudioDedup.fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out.keySet === Set(1L, 4L, 7L), "audio docs only")
    assert(out(1L) === ((fpA1.get, 1L, 2L, false)),
      "the oldest copy owns its family")
    assert(out(4L) === ((fpA1.get, 1L, 2L, true)),
      "the re-encoded twin is the dup, owned by the original")
    assert(out(7L) === ((fpC.get, 7L, 1L, false)),
      "the near-miss stays its own singleton family")
  }

  test("E5: the media pipeline accounts for every document exactly once " +
      "and quarantines exactly the planted set") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.e5MediaPipeline.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = Tables.documents(spark, sf).count()
    // conservation: every document lands in exactly one disposition
    assert(out.map(_._3).sum === total)
    assert(out.map(_._2).toSet.subsetOf(
      Set("quarantined", "low_quality", "duplicate", "curated")))
    // the quarantine is exactly the planted doc_id % 7 == 0 set, per mime
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0)
      .select(when(col("doc_id") % 3 === 0,
        when(col("doc_id") % 2 === 0, "image/png")
          .otherwise("image/jpeg"))
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))
      .groupBy("mime").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quarantined = out.filter(_._2 == "quarantined")
      .map(t => t._1 -> t._3).toMap
    assert(quarantined === planted,
      s"quarantine $quarantined != planted $planted")
    // the curated lake really exists, partitioned by mime
    val lake = new java.io.File(
      graft.sources.Ingest.lakeRoot + "/e5_curated")
    assert(lake.isDirectory &&
      lake.listFiles.exists(_.getName.startsWith("mime=")),
      "curated sink missing its mime partitions")
  }

  test("E6: pair dispositions conserve the image slice exactly, " +
      "and every disposition path fires on a planted fixture") {
    import spark.implicits._
    // 42 docs → image slice = doc_id % 3 == 0 (14 pairs). Planted:
    //   0, 21  → % 7 == 0, decode quarantined (whatever the caption)
    //   3,6,9  → IDENTICAL passing captions → one paired + two dups
    //   12     → 8-byte payload (< PHASH_SAMPLES) → image_low_quality
    //   15     → 8 words but zero stop words → caption_low_quality
    //   rest   → distinct passing captions → paired
    val goodCap = "the quick brown fox jumps over a lazy dog number"
    val words = Seq("garden", "harbor", "market", "valley", "forest",
      "castle", "desert", "meadow", "island", "canyon", "temple",
      "bridge", "tunnel", "planet")
    def text(id: Long): String = id match {
      case 3 | 6 | 9 => goodCap
      case 12 => "tiny pic"
      case 15 => "alpha beta gamma delta epsilon zeta eta theta"
      case _ =>
        val i = (id / 3).toInt % words.size
        s"the ${words(i)} keeper walks to a " +
          s"${words((i + 5) % words.size)} gate before the morning light"
    }
    val dir = java.nio.file.Files.createTempDirectory("e6fix").toString
    (0L until 42L).map(id => (id, text(id), "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.e6PairCuration.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(5),
        if (r.isNullAt(4)) -1L else r.getLong(4))).sortBy(_._1)
    // exact conservation: every image doc exactly once, nothing else
    assert(rows.map(_._1).toSeq === (0L until 42L by 3L).toSeq,
      "pair rows must partition the image slice")
    // independent recompute of every disposition (the referencePr
    // discipline): phash via phashOf on the raw caption bytes (the
    // decoded raster IS the payload for these containers), caption
    // rules in plain Scala — the operator must agree row for row,
    // INCLUDING any legitimate perceptual collisions beyond the
    // planted {3,6,9} family (dHash collapses near-identical bytes by
    // design, which is what the r14 first draft of this test learned)
    val img = (0L until 42L by 3L)
    def capOkOf(s0: String): Boolean = {
      val t = s0.toLowerCase.split(" ", -1)
      val nw = t.length.toLong
      val stops = Set("the", "a", "of", "and", "to")
      val nStop = t.count(stops)
      val nAlpha = t.count(_.exists(c => c >= 'a' && c <= 'z'))
      val nSym = s0.count(".,;:!?#".contains(_)).toLong
      nw >= Multimodal.CAP_MIN_WORDS && nw <= Multimodal.CAP_MAX_WORDS &&
        nStop >= 2 && nAlpha * 5 >= nw * 4 && nSym * 10 <= nw
    }
    val phOf = img.map { id =>
      val b = text(id).getBytes("UTF-8")
      id -> (if (id % 7 == 0) None
        else if (b.length < Multimodal.PHASH_SAMPLES) None
        else Some(Multimodal.phashOf(b)))
    }.toMap
    val survivors = img.filter(id =>
      id % 7 != 0 && phOf(id).isDefined && capOkOf(text(id)))
    val keeperOf = survivors.groupBy(phOf(_).get)
      .flatMap { case (_, ids) => ids.map(_ -> ids.min) }
    val expected = img.map { id =>
      val disp =
        if (id % 7 == 0) ("image_quarantined", -1L)
        else if (phOf(id).isEmpty) ("image_low_quality", -1L)
        else if (!capOkOf(text(id))) ("caption_low_quality", -1L)
        else if (keeperOf(id) == id) ("paired", id)
        else ("duplicate_image", keeperOf(id))
      (id, disp._1, disp._2)
    }
    assert(rows.toSeq === expected,
      s"dispositions diverge from the independent recompute")
    // and the fixture itself is non-degenerate: every path fired
    val fired = rows.map(_._2).toSet
    assert(fired === Set("image_quarantined", "image_low_quality",
      "caption_low_quality", "paired", "duplicate_image"),
      s"fixture must exercise every disposition: $fired")
  }

  test("E6: every doc_id % 7 image payload FAILS decode after the " +
      "half-truncation (quarantine-path non-vacuity)") {
    // e6's oracle routes doc_id % 7 == 0 straight to image_quarantined,
    // but the ENGINE actually attempts decoding the half-truncated
    // container inside try/catch. If a truncated prefix ever parsed,
    // the disposition AND the phash (truncated bytes vs the oracle's
    // full-byte hex) would silently diverge — so assert, over the real
    // sf fixture and through the exact decoders e6 calls, that the
    // truncation is rejected doc for doc (ADVICE r15 #2; the M2b
    // counterpart covers decodeBatch, not e6's direct decode path).
    import spark.implicits._
    val planted = Multimodal.mediaFrame(spark, sf)
      .filter(col("mime").like("image/%") && col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("payload"), col("mime"))
      .as[MediaRow]
      .collect()
    assert(planted.nonEmpty, "fixture must contain %7 image rows")
    planted.foreach { r0 =>
      val c0 = Multimodal.containerize(r0)
      val cut = c0.payload.take(c0.payload.length / 2)
      val parsed =
        try {
          c0.mime match {
            case "image/png" => Multimodal.decodePng(cut).idat
            case _ => Multimodal.decodeJpeg(cut).data
          }
          true
        } catch { case scala.util.control.NonFatal(_) => false }
      assert(!parsed, s"doc ${r0.doc_id} (${r0.mime}, " +
        s"${c0.payload.length} B container) still parsed after " +
        "half-truncation — e6's quarantine disposition would diverge")
    }
  }
}
