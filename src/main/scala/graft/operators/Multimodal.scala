package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride along as
  * opaque `binary` columns with a typed metadata struct, and per-record
  * decode/feature-extraction runs as partition-local batched processing —
  * the Spark-side plumbing (schema, batching, partitioning) is real; the
  * actual media decode is a STUB (this container has no image/audio codecs),
  * clearly marked below, producing deterministic pseudo-metadata derived
  * from the bytes so the pipeline is testable end-to-end.
  *
  * Scale shape: `mapPartitions` with an internal micro-batch (`batchSize`)
  * mirrors how a real decoder (GPU/native lib) wants its inputs — amortized
  * per-batch setup, bounded memory, no driver involvement. Decoded metadata
  * lands as ordinary columns, so downstream filtering/aggregation is plain
  * Catalyst.
  */
object Multimodal {

  /** A record carrying an opaque media payload. */
  case class MediaRecord(id: Long, media_type: String, media: Array[Byte])

  /** Extracted metadata (what a real decoder would emit: dimensions,
    * duration, sample rate...; here: deterministic stand-ins).
    */
  case class MediaMeta(id: Long, media_type: String, n_bytes: Long,
      checksum: String, width: Long, height: Long)

  /** Project a frame to a media-record shape — (id, media_type, media) —
    * by encoding an existing column's bytes (stand-in for reading real
    * blobs; real ingest would read binaryFile sources). Other columns are
    * NOT carried: [[MediaRecord]] is the decoder's input contract; callers
    * keeping sidecar columns join decode output back on `id`
    * (see [[decodePipeline]]).
    */
  def withMediaColumn(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String = "text/plain"): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      lit(mediaType).as("media_type"),
      encode(col(payloadCol), "UTF-8").as("media"))

  // =====================================================================
  // REAL DECODE: vectorized image-header parsing. No codec library needed —
  // image dimensions live at fixed offsets in PNG/GIF/BMP headers, so the
  // parse is pure codegen'd column math (hex slice + base-16 conv) that
  // runs at scan speed on 100 TB of binary payloads. JPEG is classified by
  // magic but carries NULL dimensions: its SOF marker sits at a variable
  // offset (an entropy-coded marker scan needs a real decoder, and a
  // columnar "search for FFC0" would false-positive inside compressed
  // data — wrong metadata is worse than absent metadata).
  // =====================================================================

  /** `struct(format, width, height)` parsed from the leading bytes of a
    * binary column:
    *  - PNG  — 8-byte signature, IHDR width/height big-endian u32 at
    *    bytes 16/20;
    *  - GIF  — "GIF8" magic, logical-screen width/height little-endian u16
    *    at bytes 6/8;
    *  - BMP  — "BM" magic, width/height little-endian i32 at bytes 18/22
    *    (signed: top-down bitmaps store a negative height). The dimension
    *    read is gated on the DIB header-size field at byte 14: only the
    *    BITMAPINFOHEADER family (40/52/56/64/108/124) shares the 18/22
    *    layout — a BITMAPCOREHEADER (size 12, u16 dims at 18/20) or a
    *    truncated header would otherwise parse plausible-but-wrong
    *    dimensions, the exact failure the JPEG note above forbids. Those
    *    classify as "bmp" with NULL dimensions;
    *  - JPEG — classified (`FFD8FF`), dimensions NULL (see above);
    *  - anything else — format "unknown", dimensions NULL.
    *
    * Only the first 32 bytes are hex-encoded (every parsed offset ends by
    * byte 26): hexing the whole payload would allocate a string 2× the
    * payload per row and overflow the max byte-array size on ≥1 GB blobs.
    */
  // hex-char position of byte b is 2·b + 1 (1-based substring); all
  // helpers operate on an UPPERCASE hex prefix of the payload
  private def be32(h: Column, pos: Int): Column =
    conv(substring(h, pos, 8), 16, 10).cast("long")
  private def le16(h: Column, pos: Int): Column =
    conv(concat(substring(h, pos + 2, 2), substring(h, pos, 2)), 16, 10)
      .cast("long")
  private def le32(h: Column, pos: Int): Column = {
    val u = conv(concat(substring(h, pos + 6, 2), substring(h, pos + 4, 2),
      substring(h, pos + 2, 2), substring(h, pos, 2)), 16, 10).cast("long")
    when(u >= 2147483648L, u - 4294967296L).otherwise(u)
  }

  def imageMeta(bin: Column): Column = {
    val h = upper(hex(substring(bin, 1, 32)))
    def be32(pos: Int): Column = Multimodal.be32(h, pos)
    def le16(pos: Int): Column = Multimodal.le16(h, pos)
    def le32(pos: Int): Column = Multimodal.le32(h, pos)
    val noDim = lit(null).cast("long")
    def meta(f: String, w: Column, hgt: Column): Column =
      struct(lit(f).as("format"), w.as("width"), hgt.as("height"))
    val dibSize = le32(29) // DIB header size, byte 14
    val bmpDims = length(bin) >= 26 &&
      dibSize.isin(40L, 52L, 56L, 64L, 108L, 124L)
    when(h.startsWith("89504E470D0A1A0A") && length(bin) >= 24,
        meta("png", be32(33), be32(41)))
      .when(h.startsWith("89504E470D0A1A0A"), meta("png", noDim, noDim))
      .when(h.startsWith("47494638") && length(bin) >= 10,
        meta("gif", le16(13), le16(17)))
      .when(h.startsWith("47494638"), meta("gif", noDim, noDim))
      .when(h.startsWith("424D") && bmpDims, meta("bmp", le32(37), le32(45)))
      .when(h.startsWith("424D"), meta("bmp", noDim, noDim))
      .when(h.startsWith("FFD8FF"), meta("jpeg", noDim, noDim))
      .otherwise(meta("unknown", noDim, noDim))
  }

  /** `struct(format, channels, sample_rate, bits_per_sample)` parsed from
    * the leading bytes of a binary column:
    *  - WAV — "RIFF" magic + "WAVE" form type; fields read ONLY from a
    *    canonical layout ("fmt " chunk directly at byte 12, ≥ 36 bytes):
    *    channels LE u16 at 22, sample rate LE u32 at 24, bits/sample LE
    *    u16 at 34. A WAV whose fmt chunk sits elsewhere (extension
    *    chunks before it) classifies as "wav" with NULL fields — a
    *    chunk-walk needs a real parser, and misread audio rates are worse
    *    than absent ones (same doctrine as JPEG in [[imageMeta]]);
    *  - MP4 — "ftyp" box tag at bytes 4–7: classified, fields NULL (box
    *    structure is variable);
    *  - anything else — "unknown", fields NULL.
    *
    * Only the first 36 bytes are hexed (every parsed offset ends by 36).
    */
  def audioMeta(bin: Column): Column = {
    val h = upper(hex(substring(bin, 1, 36)))
    val noF = lit(null).cast("long")
    def meta(f: String, ch: Column, sr: Column, bps: Column): Column =
      struct(lit(f).as("format"), ch.as("channels"), sr.as("sample_rate"),
        bps.as("bits_per_sample"))
    val isWav = h.startsWith("52494646") &&
      substring(h, 17, 8) === lit("57415645")
    val canonicalFmt = substring(h, 25, 8) === lit("666D7420") &&
      length(bin) >= 36
    when(isWav && canonicalFmt,
        meta("wav", le16(h, 45), le32(h, 49), le16(h, 69)))
      .when(isWav, meta("wav", noF, noF, noF))
      .when(substring(h, 9, 8) === lit("66747970"),
        meta("mp4", noF, noF, noF))
      .otherwise(meta("unknown", noF, noF, noF))
  }

  /** `struct(format, width, height, n_frames, usec_per_frame)` parsed from
    * the leading bytes of a binary column — the video face of the
    * [[imageMeta]]/[[audioMeta]] family:
    *  - AVI — "RIFF" magic + "AVI " form type; fields read ONLY from the
    *    canonical layout (LIST/hdrl at byte 12 with the "avih" main header
    *    directly at byte 24, ≥ 72 bytes): µs/frame LE u32 at 32, total
    *    frames LE u32 at 48, width/height LE u32 at 64/68. An AVI whose
    *    header list is laid out differently classifies as "avi" with NULL
    *    fields — a chunk-walk needs a real parser, and a misread frame
    *    count is worse than an absent one (the [[imageMeta]] JPEG
    *    doctrine);
    *  - MP4 — "ftyp" box tag at bytes 4–7: classified, fields NULL;
    *  - MKV — EBML magic `1A45DFA3`: classified, fields NULL (EBML is
    *    variable-length-coded throughout);
    *  - anything else — "unknown", fields NULL.
    *
    * Only the first 72 bytes are hexed (every parsed offset ends by 72).
    * Frame *content* (decode, frame sampling) stays behind the batched
    * stub decoder below — this parses container metadata only.
    */
  def videoMeta(bin: Column): Column = {
    val h = upper(hex(substring(bin, 1, 72)))
    val noF = lit(null).cast("long")
    def meta(f: String, w: Column, hgt: Column, nf: Column,
        us: Column): Column =
      struct(lit(f).as("format"), w.as("width"), hgt.as("height"),
        nf.as("n_frames"), us.as("usec_per_frame"))
    // AVI header fields are u32 (unlike BMP's deliberately-signed dims);
    // a value with the top bit set means a corrupt/adversarial header —
    // NULL, not a negative dimension
    def leU32(pos: Int): Column = {
      val v = le32(h, pos)
      when(v < 0, noF).otherwise(v)
    }
    val isAvi = h.startsWith("52494646") &&
      substring(h, 17, 8) === lit("41564920")
    // canonical: LIST at 12, "hdrl" at 20, "avih" fourcc at 24
    val canonicalHdrl = substring(h, 25, 8) === lit("4C495354") &&
      substring(h, 41, 8) === lit("6864726C") &&
      substring(h, 49, 8) === lit("61766968") && length(bin) >= 72
    when(isAvi && canonicalHdrl,
        meta("avi", leU32(129), leU32(137), leU32(97), leU32(65)))
      .when(isAvi, meta("avi", noF, noF, noF, noF))
      .when(substring(h, 9, 8) === lit("66747970"),
        meta("mp4", noF, noF, noF, noF))
      .when(h.startsWith("1A45DFA3"), meta("mkv", noF, noF, noF, noF))
      .otherwise(meta("unknown", noF, noF, noF, noF))
  }

  /** Append parsed `format`/`width`/`height` columns from a binary column. */
  def withImageMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("__meta", imageMeta(col(binCol)))
      .withColumn("format", col("__meta.format"))
      .withColumn("width", col("__meta.width"))
      .withColumn("height", col("__meta.height"))
      .drop("__meta")

  /** 56-bit difference hash (dHash — the gradient perceptual hash of
    * Krawetz 2013's writeup) over a decoded 7×9 grayscale grid: bit
    * (i·8+j) is set iff pixel (i,j) < pixel (i,j+1) — the hash encodes
    * horizontal GRADIENTS, so re-encoded/brightness-shifted copies of
    * one image land within a few bits. 56 bits (not the classic 64)
    * keeps the signature strictly positive in a signed 64-bit engine —
    * `1 << 63` overflows DuckDB-class integer arithmetic, and 4×14-bit
    * bands split evenly.
    *
    * DECODE IS THE STUB BOUNDARY: a real codec would resize+grayscale
    * the payload to 7×9; here the grid IS the payload — one byte per
    * cell after a 2-byte magic, read via ONE bounded 65-byte prefix hex
    * (the imageMeta convention: never hex whole blobs). Pure codegen
    * column math inside the scan; payloads shorter than 65 bytes yield
    * NULL (conv of an empty slice), which callers must filter or feed
    * complete grids.
    */
  def dHash56(bin: Column): Column = {
    val h = hex(substring(bin, 1, 65))
    def px(i: Int, j: Int): Column =
      conv(substring(h, 5 + 2 * (i * 9 + j), 2), 16, 10).cast("long")
    (for (i <- 0 until 7; j <- 0 until 8) yield
      when(px(i, j) < px(i, j + 1), shiftleft(lit(1L), i * 8 + j))
        .otherwise(lit(0L))).reduce(_ + _)
  }

  /** Perceptual near-duplicate image pairs by banded [[dHash56]] —
    * the multimodal member of the dedup family (exact/minhash/simhash/
    * embedding text dedup ↔ THIS for images): two payloads whose decoded
    * grids differ in a few cells hash within `maxHamming` bits and are
    * caught without any pairwise scan of the corpus.
    *
    * Shape is the SimHash-banding discipline: 4 bands of 14 bits each —
    * a pair within Hamming distance 3 shares at least one band exactly
    * (pigeonhole), larger distances degrade gracefully; candidates join
    * per (band, key) with the hot-bucket count cap (2..maxBucketSize,
    * mirrored by any oracle); each pair is emitted ONLY in its FIRST
    * matching band (the q103 one-emission rule — no distinct() stage);
    * verification is one `bit_count(xor)` over the rode-along
    * signatures. All exact integer math, nothing rounded.
    *
    * Output: (a_id, b_id, hamming BIGINT) for verified pairs.
    */
  /** Deterministic synthetic image FIXTURE for the dHash gates: a 7×9
    * grayscale grid as a 65-byte payload ("GR" magic + one byte per
    * cell) — scene pixels are md5 of (sceneId % 200, cell), ONE variant
    * cell (position and content from `variantId`) perturbs each image,
    * so same-scene images sit a few dHash bits apart. Fully
    * md5-recomputable by a SQL oracle; shared by the batch (q242/q244)
    * and streaming (q245) gates.
    */
  def sceneGridPayload(sceneId: Column, variantId: Column): Column = {
    val scene = (sceneId % 200).cast("string")
    val cells = for (i <- 0 until 7; j <- 0 until 9) yield
      when(variantId % 7 === i && variantId % 9 === j,
        substring(md5(concat(lit("pv:"), variantId.cast("string"))), 1, 2))
        .otherwise(substring(md5(concat(lit("px:"), scene,
          lit(s":$i:$j"))), 1, 2))
    unhex(concat((lit("4752") +: cells.toSeq): _*))
  }

  private def dhashBandKey(sig: Column, b: Int): Column =
    shiftright(sig, 14 * b).bitwiseAND(lit(16383L))

  private def dhashFirstBandOnly: Column = (0 until 3).map { bp =>
    (col("band") <= bp) ||
      (dhashBandKey(col("__sa"), bp) =!= dhashBandKey(col("__sb"), bp))
  }.reduce(_ && _)

  /** Banded [[dHash56]] rows — (id, sig, band, key), 4 bands × 14 bits:
    * the storable screening artifact (write partitioned by `band`; an
    * incoming probe then touches only its own bands' partitions) and
    * the shared first stage of [[dhashNearDups]] / [[incomingDhashDups]].
    *
    * `buckets >= 1` appends a `key_bucket` layout column (`key %
    * buckets` — the key is a uniform 14-bit slice, so any power of two
    * dividing 16384 buckets bias-free): write the artifact partitioned
    * by (band, key_bucket) and [[incomingDhashDups]] prunes the stored
    * scan to the batch's own bucket set (the ScaleKnobs sub-bucket
    * contract: layout-only, result-invariant — spec-pinned at two
    * widths). Pass [[ScaleKnobs.sigBuckets]] of the binary frame to
    * derive the count from optimizer stats.
    */
  def dhashBands(df: DataFrame, idCol: String, binCol: String,
      buckets: Int = -1): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
        dHash56(col(binCol)).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(array((0 until 4).map(b =>
          dhashBandKey(col("sig"), b)): _*)).as(Seq("band", "key")))
    if (buckets < 1) base
    else {
      require(16384 % buckets == 0,
        s"dhash key buckets must divide 16384 (14-bit keys), got $buckets")
      base.withColumn("key_bucket", (col("key") % buckets).cast("int"))
    }
  }

  def dhashNearDups(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 6, maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    require(maxBucketSize >= 2,
      s"maxBucketSize must be >= 2, got $maxBucketSize")
    // one hashing pass: the banded signature build (63 codegen'd md5
    // cells + bit math per image) feeds the bucket census AND both
    // sides of the band self-join — unmaterialized, the plan re-hashed
    // the corpus 3x (r17 plan audit)
    val bands = Materialize.corpusScale(dhashBands(df, idCol, binCol))
    val ok = bands.groupBy("band", "key").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2 && col("__c") <= maxBucketSize)
      .select("band", "key")
    val el = bands.join(ok, Seq("band", "key"))
    el.select(col("band"), col("key"), col("id").as("a_id"),
        col("sig").as("__sa"))
      .join(el.select(col("band"), col("key"), col("id").as("b_id"),
        col("sig").as("__sb")), Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .filter(dhashFirstBandOnly)
      .select(col("a_id"), col("b_id"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Ingest-time perceptual screening of an incoming image batch
    * against STORED [[dhashBands]] — the multimodal member of the
    * q204 incremental-dedup family: the corpus's banded signatures are
    * a parquet artifact partitioned by `band`, and an arriving batch
    * pays only its own hashing plus a band-keyed probe — the corpus
    * bytes are never re-decoded.
    *
    * Stored buckets over `maxBucketSize` are dropped WHOLE at probe
    * time (the hot-bucket rule — a degenerate bucket carries no
    * near-dup signal and would make the probe quadratic); each
    * (incoming, stored) pair is emitted only in its FIRST matching
    * band; verification is one bit_count(xor). Exact integer math
    * throughout.
    *
    * Output: (a_id = incoming, b_id = stored, hamming BIGINT).
    */
  def incomingDhashDups(stored: DataFrame, batch: DataFrame,
      idCol: String, binCol: String, maxHamming: Int = 6,
      maxBucketSize: Int = 1000, corpusBuckets: Int = -1): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    require(maxBucketSize >= 2,
      s"maxBucketSize must be >= 2, got $maxBucketSize")
    // stored-layout pruning (the incomingNearDups cap-and-switch shape):
    // a key_bucket-partitioned artifact scans only the batch's own
    // buckets. Deriving them re-hashes the batch once (dHash56 is pure
    // codegen over a bounded prefix — cheaper than a checkpoint); the
    // collect is ≤ corpusBuckets ints.
    val storedLive =
      if (corpusBuckets >= 1 && stored.columns.contains("key_bucket")) {
        val bks = dhashBands(batch, idCol, binCol, corpusBuckets)
          .select(col("key_bucket")).distinct().collect()
          .map(_.getInt(0)).toSeq
        if (bks.size < corpusBuckets)
          stored.filter(col("key_bucket").isin(bks: _*))
        else stored
      } else stored
    val okStored = storedLive.groupBy("band", "key")
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") <= maxBucketSize)
      .select("band", "key")
    val el = storedLive.join(okStored, Seq("band", "key"))
    dhashBands(batch, idCol, binCol)
      .select(col("band"), col("key"), col("id").as("a_id"),
        col("sig").as("__sa"))
      .join(el.select(col("band").cast("int").as("band"), col("key"),
        col("id").as("b_id"), col("sig").as("__sb")), Seq("band", "key"))
      .filter(dhashFirstBandOnly)
      .select(col("a_id"), col("b_id"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // =====================================================================
  // STUB DECODER — replace with a real codec (JNI/ffmpeg/ImageIO) when the
  // runtime has one. Deterministic by construction: every value derives
  // from the payload bytes only, so tests and oracles can recompute it.
  // =====================================================================
  private[operators] def decodeStub(r: MediaRecord): MediaMeta = {
    val md = MessageDigest.getInstance("MD5")
    val checksum = md.digest(r.media).map("%02x".format(_)).mkString
    val n = r.media.length.toLong
    // a real decoder would parse headers; the stub derives fake dimensions
    MediaMeta(r.id, r.media_type, n, checksum, n % 640, n % 480)
  }

  /** Batched partition-local "decode": the production shape for media
    * feature extraction. Batches exist so a real decoder can amortize
    * per-batch setup (codec contexts, GPU transfer); the stub just maps.
    */
  def extractMetadata(records: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaMeta] = {
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would happen here
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** A (video, frame) decode request — the input contract of the frame
    * extraction boundary.
    */
  case class FrameRecord(id: Long, media: Array[Byte], frame_idx: Long)

  /** One sampled frame's decode output: presentation timestamp + a
    * deterministic frame signature (what a real pipeline would replace
    * with pixels/embeddings).
    */
  case class FrameSample(id: Long, frame_idx: Long, ts_usec: Long,
      frame_sig: String)

  /** Uniform frame-sample indices from a frame count: all frames when
    * `nFrames` ≤ k, else the k evenly-spaced indices ⌊j·nFrames/k⌋
    * (j = 0..k−1) — the standard fixed-budget video sampling policy.
    * Exact integer math (subtract the modulus before dividing — the
    * house keep-count rule, so any engine replays the identical index
    * set); empty array for NULL/non-positive counts (audio containers,
    * truncated headers). Pure column math inside the scan.
    */
  def sampleFrameIndices(nFrames: Column, k: Int): Column = {
    require(k >= 1, s"k must be positive, got $k")
    when(nFrames.isNull || nFrames <= 0, array().cast("array<long>"))
      .otherwise(when(nFrames <= k, sequence(lit(0L), nFrames - 1))
        .otherwise(transform(sequence(lit(0L), lit(k - 1L)), { j =>
          val num = j * nFrames
          ((num - num % k) / k).cast("long")
        })))
  }

  /** Batched partition-local frame extraction — [[extractMetadata]]'s
    * shape at FRAME grain: a real implementation would seek the codec to
    * each requested index and emit pixels; the STUB parses the container's
    * real header fields from the raw bytes (LE u32 µs/frame at 32, frame
    * count at 48, width/height at 64/68 — the [[videoMeta]] AVI layout;
    * headers under 72 bytes refuse with zeroed fields rather than
    * misread) and derives a deterministic signature
    * md5("len:w:h:nframes:usec:idx") plus the frame's presentation
    * timestamp idx·µs — so the gate proves the BYTES flowed through the
    * boundary, not just the row count.
    */
  def extractFrames(requests: Dataset[FrameRecord],
      batchSize: Int = 64): Dataset[FrameSample] = {
    require(batchSize >= 1, s"batchSize must be positive, got $batchSize")
    import requests.sparkSession.implicits._
    requests.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup/seek state would happen here
        batch.iterator.map(frameStub)
      }
    }
  }

  private def leU32At(b: Array[Byte], pos: Int): Long =
    (b(pos) & 0xffL) | ((b(pos + 1) & 0xffL) << 8) |
      ((b(pos + 2) & 0xffL) << 16) | ((b(pos + 3) & 0xffL) << 24)

  private[operators] def frameStub(r: FrameRecord): FrameSample = {
    val b = r.media
    val (us, nf, w, h) =
      if (b.length >= 72)
        (leU32At(b, 32), leU32At(b, 48), leU32At(b, 64), leU32At(b, 68))
      else (0L, 0L, 0L, 0L)
    val md = MessageDigest.getInstance("MD5")
    val sig = md.digest(
        s"${b.length}:$w:$h:$nf:$us:${r.frame_idx}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    FrameSample(r.id, r.frame_idx, r.frame_idx * us, sig)
  }

  /** Full plumbing demo: frame → media column → batched decode → metadata
    * columns. The decode output carries (id, media_type, n_bytes, checksum,
    * width, height); join it back on `id` when the original frame's other
    * columns are needed downstream.
    */
  def decodePipeline(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    import spark.implicits._
    val media = withMediaColumn(df, idCol, payloadCol).as[MediaRecord]
    extractMetadata(media).toDF()
  }

  /** Byte-entropy audit of a binary column — the blob-side quality
    * screen beside [[imageMeta]]'s header decode: Shannon entropy (nats)
    * of the byte histogram over a BOUNDED prefix. Compressed/encrypted
    * payloads sit near ln 256 ≈ 5.55; truncated/zero-padded or
    * constant-fill corruption collapses toward 0 — the "is this blob
    * real media or filler" number a multimodal ingest checks per batch.
    *
    * Only `prefixBytes` are hexed (the [[imageMeta]] allocation rule).
    * Per-row HOF math over self-materialized arrays (round-4 rule):
    * byte list from hex pairs, SORTED distinct values (fixed ascending
    * accumulation order on both engines), per-byte exact counts, and a
    * sequential fold of −(c/n)·ln(c/n) that rounds once (+1e-9, 6 — the
    * q97 doctrine). Empty/NULL blobs emit NULL entropy. Zero shuffle.
    *
    * Output: (idCol, n_bytes, n_distinct, entropy).
    */
  def byteEntropy(df: DataFrame, idCol: String, binCol: String,
      prefixBytes: Int = 64): DataFrame = {
    require(prefixBytes >= 1, s"prefixBytes must be positive, got $prefixBytes")
    val hexed = upper(hex(substring(col(binCol), 1, prefixBytes)))
    val withBytes = df
      .select(col(idCol), hexed.as("__h"))
      .select(col(idCol),
        (length(col("__h")) / 2).cast("long").as("n_bytes"),
        col("__h"))
      .select(col(idCol), col("n_bytes"),
        // sequence(1, 0) counts DOWN — empty/NULL blobs get the typed
        // empty array instead
        when(col("n_bytes") > 0,
            transform(sequence(lit(1), col("n_bytes").cast("int")),
              i => col("__h").substr(i * 2 - 1, lit(2))))
          .otherwise(array().cast("array<string>")).as("__b"))
      .select(col(idCol), col("n_bytes"), col("__b"),
        array_sort(array_distinct(col("__b"))).as("__d"))
      .select(col(idCol), col("n_bytes"), col("__d"),
        transform(col("__d"), b =>
          size(filter(col("__b"), x => x === b)).cast("double")).as("__c"))
    withBytes.select(col(idCol), col("n_bytes"),
      size(col("__d")).cast("long").as("n_distinct"),
      when(col("n_bytes") > 0, round(
          aggregate(col("__c"), lit(0.0), (acc, c) =>
            acc - (c / col("n_bytes")) * log(c / col("n_bytes")))
          + lit(1e-9), 6))
        .otherwise(lit(null).cast("double")).as("entropy"))
  }
}
