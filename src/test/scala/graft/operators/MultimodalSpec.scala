package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media column + batched decode produce deterministic metadata") {
    val df = Seq((1L, "hello"), (2L, "a longer payload here")).toDF("id", "text")
    val meta = Multimodal.decodePipeline(spark, df, "id", "text")
      .as[Multimodal.MediaMeta].collect().sortBy(_.id)
    assert(meta(0).n_bytes == 5L)
    assert(meta(0).checksum == "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    assert(meta(0).width == 5L && meta(0).height == 5L)
    assert(meta(1).n_bytes == 21L)
    assert(meta.forall(_.media_type == "text/plain"))
  }

  test("dHash56: closed-form gradients; near-dups pair, distinct images don't") {
    import org.apache.spark.sql.functions.col
    def grid(px: Int => Int): Array[Byte] =
      (Array(0x47, 0x52) ++ (0 until 63).map(px)).map(_.toByte)
    // strictly increasing pixels: every gradient bit set → 2^56 − 1;
    // strictly decreasing: none set → 0
    val sigs = Seq((1L, grid(identity)), (2L, grid(k => 200 - k)))
      .toDF("id", "media")
      .select(col("id"), Multimodal.dHash56(col("media")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == (1L << 56) - 1, s"got ${sigs(1L)}")
    assert(sigs(2L) == 0L)
    // base grid alternates 10/20; clones 11/12 flip one interior cell
    // (≤ 2 bits away); 13 is the reversed ramp (far from everything)
    def alt(k: Int) = if (k % 2 == 0) 10 else 20
    val rows = Seq(
      (10L, grid(alt)),
      (11L, grid(k => if (k == 30) 25 else alt(k))),
      (12L, grid(k => if (k == 40) 25 else alt(k))),
      (13L, grid(k => 200 - k))).toDF("id", "media")
    val pairs = Multimodal.dhashNearDups(rows, "id", "media",
        maxHamming = 6)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3)
      .toMap
    assert(pairs.keySet == Set((10L, 11L), (10L, 12L), (11L, 12L)),
      s"got ${pairs.keySet}")
    assert(pairs.values.forall(h => h >= 1 && h <= 4), s"got $pairs")
  }

  test("incomingDhashDups: stored-band probe, first-band dedup, bucket cap") {
    import org.apache.spark.sql.functions.col
    def grid(px: Int => Int): Array[Byte] =
      (Array(0x47, 0x52) ++ (0 until 63).map(px)).map(_.toByte)
    def alt(k: Int) = if (k % 2 == 0) 10 else 20
    val stored = Multimodal.dhashBands(
      Seq((1L, grid(alt)), (2L, grid(k => 200 - k))).toDF("id", "media"),
      "id", "media")
    // incoming 100 is one cell off the stored base; 101 matches nothing
    val batch = Seq(
      (100L, grid(k => if (k == 30) 25 else alt(k))),
      (101L, grid(k => (k * 37) % 251))).toDF("id", "media")
    val got = Multimodal.incomingDhashDups(stored, batch, "id", "media",
        maxHamming = 6)
      .as[(Long, Long, Long)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == Set((100L, 1L)), s"got ${got.toSeq}")
    assert(got.head._3 >= 1 && got.head._3 <= 4)
    // a stored bucket over the cap is dropped whole: three identical
    // stored images (bucket size 3) vanish at maxBucketSize = 2
    val hot = Multimodal.dhashBands(
      Seq((1L, grid(alt)), (2L, grid(alt)), (3L, grid(alt)))
        .toDF("id", "media"), "id", "media")
    assert(Multimodal.incomingDhashDups(hot,
      batch.filter(col("id") === 100L), "id", "media",
      maxHamming = 6, maxBucketSize = 2).isEmpty)
  }

  test("imageMeta parses real PNG/GIF/BMP headers; classifies JPEG; rejects junk") {
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val rows = Seq(
      // 1×1 PNG (real header: signature + IHDR length/type + dims + rest)
      (1L, bytes("89504E470D0A1A0A0000000D494844520000000100000001080600000000")),
      // GIF89a, logical screen 2×3 (LE u16)
      (2L, bytes("47494638396102000300F700")),
      // BMP, BITMAPINFOHEADER, 4×6 (LE i32 at 18/22)
      (3L, bytes("424D4600000000000000360000002800000004000000060000000100")),
      // top-down BMP: height −6 stored as LE i32 two's complement
      (4L, bytes("424D4600000000000000360000002800000004000000FAFFFFFF0100")),
      // JPEG JFIF: classified, dims NULL (variable-offset SOF)
      (5L, bytes("FFD8FFE000104A46494600")),
      // junk
      (6L, bytes("DEADBEEF")),
      // BITMAPCOREHEADER (DIB size 12, u16 dims at 18/20): classified bmp,
      // dims NULL — the 18/22 i32 layout does NOT apply and a blind read
      // would return plausible-but-wrong numbers
      (7L, bytes("424D20000000000000001A0000000C000000040006000100180000000000")),
      // truncated BMP (magic + 6 bytes): bmp, dims NULL, no parse error
      (8L, bytes("424D460000000000")),
      // truncated PNG (signature only): png, dims NULL
      (9L, bytes("89504E470D0A1A0A")),
      // PNG header followed by a payload much longer than the 32-byte
      // hexed prefix: dims still parse (the parse never reads past 26)
      (10L, bytes("89504E470D0A1A0A0000000D49484452000000070000000B0806000000" +
        "00" * 4096))
    ).toDF("id", "media")
    val got = Multimodal.withImageMeta(rows, "media")
      .select($"id", $"format", $"width", $"height")
      .as[(Long, String, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(got(0) == ((1L, "png", Some(1L), Some(1L))))
    assert(got(1) == ((2L, "gif", Some(2L), Some(3L))))
    assert(got(2) == ((3L, "bmp", Some(4L), Some(6L))))
    assert(got(3) == ((4L, "bmp", Some(4L), Some(-6L))),
      "top-down BMP height must parse as signed")
    assert(got(4) == ((5L, "jpeg", None, None)))
    assert(got(5) == ((6L, "unknown", None, None)))
    assert(got(6) == ((7L, "bmp", None, None)),
      "BITMAPCOREHEADER must not be read with the INFOHEADER layout")
    assert(got(7) == ((8L, "bmp", None, None)), "truncated BMP → NULL dims")
    assert(got(8) == ((9L, "png", None, None)), "truncated PNG → NULL dims")
    assert(got(9) == ((10L, "png", Some(7L), Some(11L))),
      "large payload after the header parses from the 32-byte prefix")
  }

  test("audioMeta parses canonical WAV; classifies MP4; rejects junk and drift") {
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val rows = Seq(
      // canonical 44.1kHz stereo 16-bit WAV header
      (1L, bytes("524946462408000057415645666D7420100000000100" +
        "0200" + "44AC0000" + "10B10200" + "0400" + "1000")),
      // WAV whose fmt chunk is NOT at byte 12 (JUNK chunk first): must
      // classify wav with NULL fields, not misread the junk as fields
      (2L, bytes("52494646240800005741564564A74120100000000100" +
        "0200" + "44AC0000" + "10B10200" + "0400" + "1000")),
      // truncated WAV (RIFF+WAVE only)
      (3L, bytes("524946462408000057415645")),
      // MP4 ftyp box (isom)
      (4L, bytes("000000186674797069736F6D")),
      // junk
      (5L, bytes("DEADBEEFDEADBEEF"))
    ).toDF("id", "media")
    val got = rows.select($"id", Multimodal.audioMeta($"media").as("m"))
      .select($"id", $"m.format", $"m.channels", $"m.sample_rate",
        $"m.bits_per_sample")
      .as[(Long, String, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, "wav", Some(2L), Some(44100L), Some(16L))))
    assert(got(1) == ((2L, "wav", None, None, None)),
      "non-canonical fmt placement must yield NULL fields, not a misread")
    assert(got(2) == ((3L, "wav", None, None, None)))
    assert(got(3) == ((4L, "mp4", None, None, None)))
    assert(got(4) == ((5L, "unknown", None, None, None)))
  }

  test("videoMeta parses canonical AVI; classifies MP4/MKV; rejects junk and drift") {
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val rows = Seq(
      // canonical AVI: 640×360, 250 frames, 33333 µs/frame (~30 fps)
      (1L, bytes("52494646" + "00100000" + "41564920" +
        "4C495354" + "C4000000" + "6864726C" + "61766968" + "38000000" +
        "35820000" + "00000000" + "00000000" + "10000000" +
        "FA000000" + "00000000" + "01000000" + "00000000" +
        "80020000" + "68010000")),
      // AVI whose header list is NOT the canonical layout (no LIST/hdrl at
      // 12): classify avi with NULL fields, never misread other bytes
      (2L, bytes("52494646" + "00100000" + "41564920" +
        "4A554E4B" + "C4000000" + "6864726C" + "61766968" + "38000000" +
        "35820000" + "00000000" + "00000000" + "10000000" +
        "FA000000" + "00000000" + "01000000" + "00000000" +
        "80020000" + "68010000")),
      // truncated AVI (RIFF+AVI form only)
      (3L, bytes("52494646" + "00100000" + "41564920")),
      // canonical header cut one byte short of dwHeight: NULL fields
      (4L, bytes("52494646" + "00100000" + "41564920" +
        "4C495354" + "C4000000" + "6864726C" + "61766968" + "38000000" +
        "35820000" + "00000000" + "00000000" + "10000000" +
        "FA000000" + "00000000" + "01000000" + "00000000" +
        "80020000" + "680100")),
      // MP4 ftyp box, MKV EBML magic, junk
      (5L, bytes("000000186674797069736F6D")),
      (6L, bytes("1A45DFA3A342868101")),
      (7L, bytes("DEADBEEFDEADBEEF")),
      // corrupt width with the u32 top bit set: NULL width, rest parses
      (8L, bytes("52494646" + "00100000" + "41564920" +
        "4C495354" + "C4000000" + "6864726C" + "61766968" + "38000000" +
        "35820000" + "00000000" + "00000000" + "10000000" +
        "FA000000" + "00000000" + "01000000" + "00000000" +
        "FFFFFFFF" + "68010000"))
    ).toDF("id", "media")
    val got = rows.select($"id", Multimodal.videoMeta($"media").as("m"))
      .select($"id", $"m.format", $"m.width", $"m.height", $"m.n_frames",
        $"m.usec_per_frame")
      .as[(Long, String, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, "avi", Some(640L), Some(360L), Some(250L), Some(33333L))))
    assert(got(1) == ((2L, "avi", None, None, None, None)),
      "non-canonical header layout must yield NULL fields, not a misread")
    assert(got(2) == ((3L, "avi", None, None, None, None)))
    assert(got(3) == ((4L, "avi", None, None, None, None)),
      "header shorter than 72 bytes must not half-parse")
    assert(got(4) == ((5L, "mp4", None, None, None, None)))
    assert(got(5) == ((6L, "mkv", None, None, None, None)))
    assert(got(6) == ((7L, "unknown", None, None, None, None)))
    assert(got(7) == ((8L, "avi", None, Some(360L), Some(250L), Some(33333L))),
      "a u32 field with the top bit set is corrupt → NULL, not negative")
  }

  test("batch boundary: batchSize smaller than partition still covers all rows") {
    val df = (1L to 200L).map(i => (i, s"payload-$i")).toDF("id", "text")
    val media = Multimodal.withMediaColumn(df, "id", "text")
      .as[Multimodal.MediaRecord]
    val out = Multimodal.extractMetadata(media, batchSize = 7).collect()
    assert(out.length == 200)
    assert(out.map(_.id).toSet == (1L to 200L).toSet)
  }

  test("sampleFrameIndices: all frames under budget, exact uniform spread over") {
    val rows = Seq(1L -> 5L, 2L -> 9000L, 3L -> 8L, 4L -> 0L)
      .toDF("id", "nf")
      .select($"id",
        Multimodal.sampleFrameIndices($"nf", 8).as("idx"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(rows(1L) == (0L until 5L), "nf <= k takes every frame")
    assert(rows(3L) == (0L until 8L))
    assert(rows(2L) == (0 until 8).map(j => j * 9000L / 8),
      "k evenly-spaced exact indices")
    assert(rows(2L).distinct == rows(2L), "indices strictly increasing")
    assert(rows(4L).isEmpty, "no frames → nothing to sample")
    // NULL count (mp4/mkv/truncated containers) samples nothing
    val nullRow = Seq(Tuple1(1L)).toDF("id")
      .select(Multimodal.sampleFrameIndices(
        org.apache.spark.sql.functions.lit(null).cast("long"), 8))
      .as[Seq[Long]].head()
    assert(nullRow.isEmpty)
  }

  test("frame extraction stub parses the header bytes it is handed") {
    // the canonical 72-byte AVI from the videoMeta test: w 640, h 360,
    // nf 250, us 33333 — the stub must read those fields from the BYTES
    val hdr =
      "52494646" + "00100000" + "41564920" + "4C495354" + "C4000000" +
      "6864726C" + "61766968" + "38000000" + "35820000" + "00000000" +
      "00000000" + "10000000" + "FA000000" + "00000000" + "01000000" +
      "00000000" + "80020000" + "68010000"
    val media = hdr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val got = Multimodal.frameStub(Multimodal.FrameRecord(7L, media, 3L))
    assert(got.ts_usec == 3L * 33333L)
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("72:640:360:250:33333:3".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got.frame_sig == want)
    // short header: refuse with zeroed fields, never a misread
    val short = Multimodal.frameStub(
      Multimodal.FrameRecord(8L, media.take(40), 2L))
    assert(short.ts_usec == 0L)
  }

  test("byteEntropy: constant = 0, alternation = ln 2, uniform = ln n, " +
      "prefix bound, empty and NULL blobs") {
    def r6(x: Double): Double = BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Seq(
      (1L, Array.fill[Byte](64)(0xAB.toByte)),              // constant
      (2L, Array.tabulate[Byte](64)(i =>                    // 00/FF alt
        if (i % 2 == 0) 0x00.toByte else 0xFF.toByte)),
      (3L, Array.tabulate[Byte](64)(i => i.toByte)),        // 64 distinct
      // 100 bytes: first 64 constant, tail varied — the bound must hide
      // the tail
      (4L, Array.fill[Byte](64)(0x11.toByte) ++
        Array.tabulate[Byte](36)(i => i.toByte)),
      (5L, Array.empty[Byte]),
      (6L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "blob")
    val got = Multimodal.byteEntropy(rows, "id", "blob", prefixBytes = 64)
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 64L && got(0).getLong(2) == 1L &&
      got(0).getDouble(3) == 0.0)
    assert(got(1).getDouble(3) ==
      r6(-(32.0 / 64 * math.log(32.0 / 64)) * 2))
    assert(got(2).getLong(2) == 64L &&
      got(2).getDouble(3) == r6((0 until 64).map(_ =>
        -(1.0 / 64) * math.log(1.0 / 64)).sum))
    assert(got(3).getLong(1) == 64L && got(3).getLong(2) == 1L &&
      got(3).getDouble(3) == 0.0,
      "the prefix bound must hide the varied tail")
    assert(got(4).getLong(1) == 0L && got(4).getLong(2) == 0L &&
      got(4).isNullAt(3), "empty blob emits NULL entropy")
    assert(got(5).isNullAt(3), "NULL blob emits NULL entropy")
  }
}
