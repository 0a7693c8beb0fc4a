package graft

/** Multimodal plumbing: the typed mapPartitions decode path and the
  * columnar metadata projection must agree row-for-row. */
class MultimodalSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("typed decode path matches the columnar metadata projection") {
    import spark.implicits._
    val typed = Multimodal.decodeAll(Multimodal.mediaFiles(spark, d))
      .collect().map(m => (m.doc_id, m.byte_len, m.format, m.width, m.height,
        m.n_frames, m.sample_rate, m.n_channels))
      .sortBy(_._1)
    val columnar = Multimodal.mediaMetadata(spark, d)
      .as[(Long, Long, String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(typed.toSeq == columnar.toSeq)
  }

  // --- real container headers, hand-built byte-for-byte ---

  private def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
  private def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def pngBytes(w: Long, h: Long): Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13L) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0L) // bit depth…interlace + (unvalidated) CRC

  private def jpegBytes(w: Int, h: Int): Array[Byte] =
    Array(0xff, 0xd8).map(_.toByte) ++ // SOI
      Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++ // APP0, 14 payload bytes
      ("JFIF".getBytes :+ 0.toByte) ++ Array.fill[Byte](9)(0) ++
      Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++ // SOF0, 3 components
      be16(h) ++ be16(w) ++ Array[Byte](3) ++ Array.fill[Byte](9)(1) ++
      Array(0xff, 0xd9).map(_.toByte) // EOI

  private def wavBytes(rate: Long, channels: Int, dataBytes: Int): Array[Byte] = {
    val block = channels * 2 // 16-bit samples
    "RIFF".getBytes ++ le32(36L + dataBytes) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16L) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * block) ++ le16(block) ++ le16(16) ++
      "data".getBytes ++ le32(dataBytes.toLong) ++ Array.fill[Byte](dataBytes)(0)
  }

  test("real PNG/JPEG/WAV headers decode for real: dimensions and sample rate from the bytes") {
    import spark.implicits._
    val files = Seq(
      Multimodal.MediaFile(1L, pngBytes(640L, 480L), "fixture"),
      Multimodal.MediaFile(2L, jpegBytes(1920, 1080), "fixture"),
      Multimodal.MediaFile(3L, wavBytes(44100L, 2, 4 * 100), "fixture"),
      Multimodal.MediaFile(4L, "not media at all".getBytes, "fixture"))
    val out = Multimodal.decodeAll(files.toDS().repartition(2))
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).format == "png" && out(1L).width == 640L && out(1L).height == 480L)
    assert(out(2L).format == "jpeg" && out(2L).width == 1920L && out(2L).height == 1080L)
    assert(out(3L).format == "wav" && out(3L).sample_rate == 44100L &&
      out(3L).n_channels == 2L && out(3L).n_frames == 100L)
    Seq(1L, 2L, 3L).foreach(id => assert(out(id).decode_status == "ok"))
    // unrecognized payloads fall back to the deterministic pseudo-decode
    assert(out(4L) == Multimodal.FakeCodec.decode(4L, "not media at all".getBytes))
    assert(out(4L).decode_status == "fallback")
  }

  test("a JPEG with a standalone TEM marker (0x01) before SOF still parses") {
    import spark.implicits._
    // SOI, TEM (standalone — NO length word follows), then SOF0
    val tem = Array(0xff, 0xd8).map(_.toByte) ++
      Array(0xff, 0x01).map(_.toByte) ++
      Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(77) ++ be16(99) ++ Array[Byte](3) ++ Array.fill[Byte](9)(1) ++
      Array(0xff, 0xd9).map(_.toByte)
    val out = Multimodal.decodeAll(Seq(Multimodal.MediaFile(1L, tem, "f")).toDS())
      .collect().head
    assert(out.format == "jpeg" && out.width == 99L && out.height == 77L &&
      out.decode_status == "ok",
      s"TEM mis-parsed as a length-prefixed segment: $out")
  }

  test("a WAV truncated mid-data keeps its real header metadata, frames clamped") {
    import spark.implicits._
    // declared data size 1000, only 40 bytes actually present (block=2)
    val full = wavBytes(16000L, 1, 1000)
    val cut = full.take(44 + 40)
    val out = Multimodal.decodeAll(Seq(Multimodal.MediaFile(1L, cut, "f")).toDS())
      .collect().head
    assert(out.format == "wav" && out.sample_rate == 16000L && out.n_channels == 1L)
    assert(out.n_frames == 40L / 2L) // clamped to the bytes that exist
  }

  test("truncated or corrupt media headers fall back instead of throwing") {
    import spark.implicits._
    // adversarial chunk size: 0xFFFFFFF8 as u32 would overflow Int and
    // stall the chunk walk (or index negatively) if not range-checked
    val bogusWav = "RIFF".getBytes ++ le32(36L) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ Array(0xf8, 0xff, 0xff, 0xff).map(_.toByte) ++
      Array.fill[Byte](16)(0)
    val files = Seq(
      Multimodal.MediaFile(1L, pngBytes(640L, 480L).take(12), "fixture"), // cut inside IHDR
      Multimodal.MediaFile(2L, jpegBytes(10, 10).take(3), "fixture"),
      Multimodal.MediaFile(3L, wavBytes(8000L, 1, 16).take(20), "fixture"),
      Multimodal.MediaFile(4L, Array[Byte](), "fixture"),
      Multimodal.MediaFile(5L, bogusWav, "fixture"))
    val out = Multimodal.decodeAll(files.toDS()).collect()
    assert(out.length == 5) // total, no exceptions, no hang
    out.foreach(m => assert(m.sample_rate == 0L || m.format == "wav"))
    // a payload bearing real-media magic whose header fails surfaces as
    // corrupt:<fmt> — a decode PROBLEM — while no-magic payloads are a
    // plain fallback
    val st = out.map(m => m.doc_id -> m.decode_status).toMap
    assert(st(1L) == "corrupt:png" && st(2L) == "corrupt:jpeg" &&
      st(3L) == "corrupt:wav" && st(4L) == "fallback" && st(5L) == "corrupt:wav", st)
  }

  test("payloads survive the binary round-trip intact") {
    import spark.implicits._
    val back = Multimodal.mediaFiles(spark, d)
      .map(f => (f.doc_id, new String(f.payload, "UTF-8")))
      .toDF("doc_id", "text2")
    val bad = back.join(Tables.documents(spark, d), "doc_id")
      .filter(org.apache.spark.sql.functions.col("text2") =!=
        org.apache.spark.sql.functions.col("text")).count()
    assert(bad == 0)
  }

  test("decode is distributed: runs once per row across partitions") {
    val files = Multimodal.mediaFiles(spark, d).repartition(8)
    val metas = Multimodal.decodeAll(files)
    assert(metas.rdd.getNumPartitions == 8)
    assert(metas.count() == Tables.documents(spark, d).count())
  }

  test("q166 frame-sample plan ≡ local schedule recompute; uniform-sampling laws hold") {
    val d = "/root/testdata/sf0.001"
    val meta = Multimodal.mediaMetadata(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5))) // (doc_id, format, width, height, n_frames)
    val k = Multimodal.FrameSamples
    val exp = meta.flatMap { case (id, fmt, w, h, nf) =>
      (0L until k.toLong).map { s =>
        val idx = s * (nf - 1) / (k - 1)
        (id, fmt, nf, s, idx, 64L + idx * w * h * 3L)
      }
    }.sortBy(r => (r._1, r._4)).toSeq
    val got = Multimodal.frameSamplePlan(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == exp && got.nonEmpty)
    // uniform-sampling laws: exactly k slots per item; slot 0 is frame
    // 0 and the last slot is the LAST frame (endpoints-inclusive);
    // indexes are non-decreasing in slot and inside [0, n_frames)
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.size == k)
      assert(sorted.head._5 == 0L)
      assert(sorted.last._5 == sorted.head._3 - 1)
      assert(sorted.map(_._5) == sorted.map(_._5).sorted)
      assert(sorted.forall(r => r._5 >= 0 && r._5 < r._3))
    }
  }
  test("q225 tile grid ≡ local ceil-division recompute; coverage laws hold") {
    val d = "/root/testdata/sf0.001"
    val meta = Multimodal.mediaMetadata(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4)))
    val T = Multimodal.TileSide
    val exp = meta.map { case (id, fmt, w, h) =>
      val (tx, ty) = ((w + T - 1) / T, (h + T - 1) / T)
      (id, fmt, w, h, tx, ty, tx * ty, tx * T - w, ty * T - h,
        tx * ty * Multimodal.PatchesPerTile, tx * ty * T * T * 3L)
    }.sortBy(_._1).toSeq
    val got = Multimodal.tileGridPlan(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9), r.getLong(10))).toSeq
    assert(got == exp && got.nonEmpty)
    // coverage laws: the grid covers the image with padding < one tile
    got.foreach { r =>
      assert(r._5 * T >= r._3 && r._8 < T && r._8 >= 0)
      assert(r._6 * T >= r._4 && r._9 < T && r._9 >= 0)
    }
    // the corpus's pseudo-dims must actually exercise multi-tile grids
    assert(got.exists(_._7 > 1))
  }

  test("q226 audio chunks: virtual path ≡ local recompute; parsed WAV metadata drives the real path") {
    val d = "/root/testdata/sf0.001"
    val (w, hop) = (Multimodal.AudioWindowMs, Multimodal.AudioHopMs)
    def localPlan(id: Long, bl: Long, sr: Long, ch: Long) = {
      val ns = math.max(bl - 64, 0) / (2 * ch)
      val dur = 1000 * ns / sr
      if (dur <= 0) Nil
      else {
        val nc = 1 + (math.max(dur - w, 0) + hop - 1) / hop
        (0L until nc).map { c =>
          val (st, en) = (c * hop, math.min(c * hop + w, dur))
          (id, sr, ch, dur, c, st, en,
            64 + (st * sr / 1000) * 2 * ch, ((en - st) * sr / 1000) * 2 * ch)
        }
      }
    }
    val bl = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("doc_id", "octet_length(CAST(text AS BINARY)) AS bl")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    val exp = bl.flatMap { case (id, b) => localPlan(id, b, 16000L, 1L) }
      .sortBy(r => (r._1, r._5)).toSeq
    val got = Multimodal.audioChunkPlan(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).toSeq
    assert(got == exp && got.nonEmpty)
    // overlapping-window laws: chunk c starts at c*hop; consecutive
    // chunks overlap by (window - hop) except a clamped tail
    assert(got.forall(r => r._6 == r._5 * hop && r._7 <= r._4))

    // the REAL path: a meta row with parsed WAV fields (44.1 kHz
    // stereo) must drive the arithmetic with those values, not the
    // virtual defaults
    import spark.implicits._
    val meta = Seq((7L, 64L + 44100L * 4 * 2, 44100L, 2L))
      .toDF("doc_id", "byte_len", "sample_rate", "n_channels")
    val real = Multimodal.audioChunkPlanDf(meta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).toSeq
    val expReal = localPlan(7L, 64L + 44100L * 4 * 2, 44100L, 2L).toSeq
    assert(real == expReal)
    // 2 seconds of stereo audio at a 10ms/8ms schedule = 250 chunks
    assert(real.head._4 == 2000L && real.size == 250)
  }
}
