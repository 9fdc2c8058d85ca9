package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the Spark-side plumbing for
  * decode/feature-extract stages.
  *
  * All three kinds have REAL pure-JVM decode kernels (encode→parse
  * roundtrip, no codec libraries needed): image = 24-bit BMP
  * ([[decodeBmp]]), audio = RIFF/WAVE PCM16 ([[decodeWav]]), video =
  * RIFF/AVI with raw RGB24 frames ([[decodeAvi]]). [[decodeStub]]
  * remains for payloads in formats the container can't parse (the
  * place a production codec call plugs in). Everything around the
  * kernels — the schema, the batch iterator shape (mapPartitions
  * over rows, the Scala analogue of the arrow-batched mapInPandas
  * plumbing), partition sizing — is real and tested, so swapping a
  * richer decoder in is a one-function change.
  *
  * Scale posture: payloads are opaque and *never* shuffled — feature
  * extraction is a map stage; only the (tiny) extracted metadata
  * ever enters joins/aggregations. Partition sizing: binary columns
  * dominate row size, so `spark.sql.files.maxPartitionBytes` governs
  * decode parallelism, not row count.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType, nullable = false),   // opaque bytes
    StructField("meta_codec", StringType, nullable = true),
    StructField("meta_bytes", LongType, nullable = false)))

  /** Synthesize a deterministic media table from the documents table
    * (payload = utf-8 bytes of the text — a stand-in for real blobs
    * with realistic size skew). */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      col("text").cast("binary").as("payload"),
      concat(lit("codec_"), pmod(col("doc_id"), lit(4))).as("meta_codec"),
      length(col("text")).cast("long").as("meta_bytes"))
  }

  /** STUB decode kernel: deterministic fake features from payload
    * bytes. A real deployment replaces the body with a codec call
    * (the signature and batching stay identical). Used only for
    * payloads outside the three real kernels' formats
    * ([[decodeBmp]], [[decodeWav]], [[decodeAvi]]). */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val s = payload.foldLeft(17)((a, b) => a * 31 + (b & 0xff)) & 0x7fffffff
    (64 + s % 1920, 64 + (s / 7) % 1080, 1 + n % 240)
  }

  // ---- real image kernel: BMP (pure JVM, no codec libraries) ----

  /** Write a real, well-formed 24-bit BMP: BITMAPFILEHEADER (14 B) +
    * BITMAPINFOHEADER (40 B) + bottom-up pixel rows padded to 4-byte
    * multiples, deterministic xorshift pixel noise from `seed`. */
  def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(dataSize)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var s = seed | 1L
    while (buf.hasRemaining) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      buf.put((s >>> 56).toByte)
    }
    buf.array()
  }

  /** REAL image decode: parse the BMP headers from the payload bytes
    * — magic, little-endian dimension fields, bit depth — and check
    * the pixel-array size is consistent with the declared geometry.
    * Returns (width, height, bitsPerPixel); malformed input throws.
    * (One genuinely decodable format keeps the whole media path
    * honest end-to-end; other codecs stay behind [[decodeStub]].) */
  def decodeBmp(payload: Array[Byte]): (Int, Int, Int) = {
    require(payload.length >= 54 &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      "not a BMP payload")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val pixelOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    require(width > 0 && height > 0 && bpp % 8 == 0, "bad BMP geometry")
    val rowSize = ((width * bpp / 8 + 3) / 4) * 4
    require(payload.length >= pixelOffset + rowSize * height,
      "truncated BMP pixel array")
    (width, height, bpp)
  }

  private def isBmp(payload: Array[Byte]): Boolean =
    payload.length >= 54 &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte

  /** Cheap magic-byte sniff for the standard containers ImageIO
    * decodes here (PNG/JPEG/GIF/TIFF) — gate before [[decodeImage]]
    * in generic dispatch so arbitrary non-image payloads keep
    * falling to [[decodeStub]] instead of paying an ImageIO reader
    * probe per row. */
  private def imageIoSniffs(p: Array[Byte]): Boolean =
    p.length >= 8 && (
      ((p(0) & 0xff) == 0x89 && p(1) == 'P'.toByte && p(2) == 'N'.toByte) ||
      ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) || // JPEG SOI
      (p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte) ||
      (p(0) == 'I'.toByte && p(1) == 'I'.toByte && (p(2) & 0xff) == 42) ||
      (p(0) == 'M'.toByte && p(1) == 'M'.toByte && (p(3) & 0xff) == 42))

  /** Average-hash (aHash) perceptual fingerprint over the DECODED
    * pixel array of a 24-bit BMP: the image maps onto an 8×8 cell
    * grid, bit c = "cell c is at least as bright as the image
    * average". Near-identical images land within small hamming
    * distance, which is what image dedup at corpus scale blocks on —
    * content hashing (md5) catches only byte-identical files.
    *
    * INTEGER-exact by construction: cell brightness is the SUM of
    * byte values (not a float mean) and the threshold comparison is
    * `64·cellsum ≥ Σ cellsums` — no float boundary for a 1-ulp
    * cross-engine divergence to flip a bit, so the DuckDB oracle
    * replays the hash bit-for-bit (incl. the xorshift64 pixel
    * stream of the synthetic encoder). Rows are taken in STORED
    * (bottom-up) order; the vertical flip is consistent across all
    * images, so distances are unaffected. */
  def aHash(payload: Array[Byte]): Long = {
    val (w, h, bpp) = decodeBmp(payload)
    require(bpp == 24, "aHash expects a 24-bit BMP")
    val off = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val cellSums = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = off + y * rowSize + x * 3
        cellSums((y * 8 / h) * 8 + (x * 8 / w)) +=
          (payload(p) & 0xff) + (payload(p + 1) & 0xff) +
            (payload(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val total = cellSums.sum
    (0 until 64).foldLeft(0L)((acc, c) =>
      if (64L * cellSums(c) >= total) acc | (1L << c) else acc)
  }

  final case class ImageHash(media_id: Long, width: Int, height: Int,
                             phash: Long)

  /** Per-image perceptual hashes — typed mapPartitions like
    * [[extractFeatures]] (byte decoding is genuinely imperative);
    * one map stage, no shuffle. */
  def imageHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (w, h, _) = decodeBmp(payload)
        ImageHash(id, w, h, aHash(payload))
      }.toDF()
  }

  /** Nearest-neighbor resize of a 24-bit BMP to (ow, oh) — the
    * thumbnail / input-normalization step of an image pipeline.
    * INTEGER-exact: the source index for output (x, y) is
    * ((x·w) / ow, (y·h) / oh) in integer math and bytes are copied
    * untouched, so there is no interpolation arithmetic for a
    * cross-engine ulp to diverge on and the oracle replays the
    * resampling bit-for-bit. Returns a real, well-formed BMP
    * re-encoded at the new geometry (headers + row padding). */
  def resizeBmp(payload: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val (w, h, bpp) = decodeBmp(payload)
    require(bpp == 24, "resize expects a 24-bit BMP")
    require(ow > 0 && oh > 0, "bad target geometry")
    val off = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val oRowSize = ((ow * 3 + 3) / 4) * 4
    val dataSize = oRowSize * oh
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + dataSize).putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(ow).putInt(oh)
    out.putShort(1).putShort(24)
    out.putInt(0).putInt(dataSize)
    out.putInt(2835).putInt(2835).putInt(0).putInt(0)
    val arr = out.array()
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        val s = off + sy * rowSize + sx * 3
        val d = 54 + y * oRowSize + x * 3
        arr(d) = payload(s); arr(d + 1) = payload(s + 1)
        arr(d + 2) = payload(s + 2)
        x += 1
      }
      y += 1
    }
    arr
  }

  final case class ResizedImage(media_id: Long, width: Int, height: Int,
                                out_w: Int, out_h: Int, out_bytes: Long,
                                checksum: Long)

  /** Per-image nearest-neighbor thumbnails — typed mapPartitions
    * like [[imageHashes]] (byte resampling is genuinely imperative);
    * one map stage, no shuffle. The position-weighted pixel checksum
    * Σ (rowpos+1)·byte over the RESIZED pixel array pins every byte
    * of the resample to the oracle (a plain sum would miss pixel
    * permutations). */
  def resizeImages(media: DataFrame, ow: Int = 16, oh: Int = 12): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (w, h, _) = decodeBmp(payload)
        val resized = resizeBmp(payload, ow, oh)
        val (rw, rh, rbpp) = decodeBmp(resized) // roundtrip sanity
        require(rw == ow && rh == oh && rbpp == 24, "resize roundtrip")
        val oRowSize = ((ow * 3 + 3) / 4) * 4
        var sum = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow * 3) {
            val pos = y * oRowSize + x
            sum += (pos + 1).toLong * (resized(54 + pos) & 0xff)
            x += 1
          }
          y += 1
        }
        ResizedImage(id, w, h, ow, oh, resized.length.toLong, sum)
      }.toDF()
  }

  /** Per-channel image statistics over the DECODED pixel array —
    * the normalization card image ML prep needs (per-channel
    * mean/std feed every normalize transform) and the cheap
    * broken-decode detector (a channel mean pinned at 0 or 255
    * flags truncated or constant frames). Sums are integer-exact
    * over the unsigned bytes (BGR order, padding skipped), so the
    * oracle replays them bit-for-bit over the synthetic encoder's
    * xorshift stream; means are derived from the sums.
    *
    * Scale: typed mapPartitions at the binary-decode boundary (the
    * one justified non-Catalyst stage, same as the other decode
    * ops) — one pass per payload, six accumulators, no shuffle. */
  def channelStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (w, h, bpp) = decodeBmp(payload)
        // the pixel walk below strides 3 bytes/pixel — reject any
        // other depth loudly rather than mis-summing it silently
        require(bpp == 24, s"channelStats expects 24bpp BMP, got $bpp (media_id=$id)")
        val rowSize = ((w * bpp / 8 + 3) / 4) * 4
        val off = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
        var sb = 0L; var sg = 0L; var sr = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = off + y * rowSize + x * 3
            sb += payload(p) & 0xff
            sg += payload(p + 1) & 0xff
            sr += payload(p + 2) & 0xff
            x += 1
          }
          y += 1
        }
        (id, w, h, sb, sg, sr)
      }
      .toDF("media_id", "width", "height", "sum_b", "sum_g", "sum_r")
      .withColumn("_n", (col("width") * col("height")).cast("double"))
      .select(col("media_id"), col("width"), col("height"),
        col("sum_b"), col("sum_g"), col("sum_r"),
        round(col("sum_b") / col("_n"), 6).as("mean_b"),
        round(col("sum_g") / col("_n"), 6).as("mean_g"),
        round(col("sum_r") / col("_n"), 6).as("mean_r"))
  }

  /** Variance-of-Laplacian sharpness per image — the standard
    * blurry-image gate (OpenCV's classic blur detector restated):
    * integer grayscale g = (b+g+r)/3 per pixel, 4-neighbor Laplacian
    * lap = 4·g(x,y) − g(x±1,y) − g(x,y±1) over INTERIOR pixels, and
    * Var(lap) — a sharp image has strong second derivatives, a blurred
    * one doesn't. `blurry` flags rounded Var(lap) < `thresh`.
    *
    * Everything to the variance is exact integer arithmetic
    * (|lap| ≤ 1020, n ≤ 10⁴ ⇒ n·Σlap² and (Σlap)² both < 2⁵³), so
    * Var = (n·Σlap² − (Σlap)²)/n² divides identical integers on both
    * engines. Typed mapPartitions at the binary-decode boundary like
    * [[channelStats]] (no Catalyst expression decodes a container);
    * per-image work is w·h ints, no shuffle. */
  def blurStats(media: DataFrame, thresh: Double = 50.0): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (w, h, bpp) = decodeBmp(payload)
        require(bpp == 24, s"blurStats expects 24bpp BMP, got $bpp (media_id=$id)")
        val rowSize = ((w * bpp / 8 + 3) / 4) * 4
        val off = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
        val gray = Array.ofDim[Int](h, w)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = off + y * rowSize + x * 3
            gray(y)(x) = ((payload(p) & 0xff) + (payload(p + 1) & 0xff) +
              (payload(p + 2) & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        var n = 0L; var sl = 0L; var sl2 = 0L
        y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val lap = 4 * gray(y)(x) - gray(y)(x - 1) - gray(y)(x + 1) -
              gray(y - 1)(x) - gray(y + 1)(x)
            n += 1; sl += lap; sl2 += lap.toLong * lap
            x += 1
          }
          y += 1
        }
        (id, w, h, n, sl, sl2)
      }
      .toDF("media_id", "width", "height", "n_interior",
        "sum_lap", "sum_lap2")
      // floor-truncate, not round: a ratio of exact integers can land
      // exactly ON a 7th-decimal .5 where the engines' rounding modes
      // split (the Temporal.madFrame lesson); floor of the identical
      // double has no halfway case
      .withColumn("lap_var", floor(
        (col("n_interior") * col("sum_lap2") -
          col("sum_lap") * col("sum_lap")).cast("double") /
          (col("n_interior") * col("n_interior")) * 1000000.0) / 1000000.0)
      .select(col("media_id"), col("width"), col("height"),
        col("n_interior"), col("lap_var"),
        (col("lap_var") < thresh).cast("int").as("blurry"))
  }

  /** Byte-histogram Shannon entropy per image — the cheap
    * flat/synthetic-image detector next to [[blurStats]] (a
    * single-color banner scores 0 bits, a photo ~7.5+, a screenshot
    * in between — the thresholds multimodal curation stacks cut on):
    * counts over the 256 pixel-byte values (padding excluded,
    * integer-exact), H = −Σ (c/n)·log₂(c/n) floor-truncated at 1e-6.
    * One decode-bounded pass; the per-image state is 256 longs. */
  def imageEntropy(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (w, h, bpp) = decodeBmp(payload)
        require(bpp == 24, s"imageEntropy expects 24bpp BMP (media_id=$id)")
        val rowSize = ((w * bpp / 8 + 3) / 4) * 4
        val off = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(10)
        val counts = new Array[Long](256)
        var y = 0
        while (y < h) {
          var i = 0
          while (i < w * 3) {
            counts((payload(off + y * rowSize + i) & 0xff).toInt) += 1
            i += 1
          }
          y += 1
        }
        val n = (w.toLong * h * 3).toDouble
        var hBits = 0.0
        var b = 0
        while (b < 256) {
          if (counts(b) > 0) {
            val p = counts(b) / n
            hBits -= p * (math.log(p) / math.log(2.0))
          }
          b += 1
        }
        val distinct = counts.count(_ > 0).toLong
        (id, w, h, distinct, math.floor(hBits * 1e6) / 1e6)
      }
      .toDF("media_id", "width", "height", "distinct_bytes",
        "entropy_bits")
  }

  /** Near-dup candidate pairs over ANY (media_id, 64-bit fp) frame —
    * the simhash half-block machinery verbatim (same fingerprint
    * shape, same hot-block cap, same xor/bit_count verify): blocking
    * on either 32-bit half, never all-pairs. */
  def fingerprintNearDups(fps: DataFrame, fpCol: String,
                          maxHamming: Int = 8,
                          maxBlock: Int = 1000): DataFrame =
    Dedup.simhashCandidates(
      fps.select(
        col("media_id").as("doc_id"),
        col(fpCol).as("simhash_v"),
        col(fpCol).bitwiseAND(lit(0xffffffffL)).as("fp_lo"),
        shiftrightunsigned(col(fpCol), 32).as("fp_hi")),
      maxHamming, maxBlock)

  /** Perceptual image near-dups (blocked, never all-pairs). */
  def imageNearDups(media: DataFrame, maxHamming: Int = 8,
                    maxBlock: Int = 1000): DataFrame =
    fingerprintNearDups(imageHashes(media), "phash", maxHamming, maxBlock)

  /** Guaranteed-recall fingerprint near-dups: multi-index blocking
    * with maxHamming+1 fields — every pair within the hamming bound
    * is found (pigeonhole; see [[Dedup.simhashCandidatesMulti]]),
    * where the 2-half scheme misses pairs whose diffs straddle both
    * halves. The right default for tight image-phash thresholds. */
  def fingerprintNearDupsExact(fps: DataFrame, fpCol: String,
                               maxHamming: Int = 4,
                               maxBlock: Int = 1000): DataFrame =
    Dedup.simhashCandidatesMulti(
      fps.select(col("media_id").as("doc_id"), col(fpCol).as("simhash_v")),
      maxHamming, maxHamming + 1, maxBlock)

  /** Energy-envelope audio fingerprint over DECODED PCM16 samples —
    * the audio analogue of [[aHash]]: the interleaved sample stream
    * maps onto 64 windows, bit w = "window w carries at least the
    * average energy" (energy = Σ |sample|, an integer — the same
    * no-float-boundary discipline as aHash, so the oracle replays it
    * bit-exactly from the xorshift stream). Matches time-aligned
    * near-identical audio; a shifted copy needs an alignment search
    * on top, exactly as for real chromaprints. */
  def audioFingerprint(payload: Array[Byte]): Long = {
    val (nCh, _, nSamples) = decodeWav(payload)
    val total = (nSamples * nCh).toInt
    val winSums = new Array[Long](64)
    var k = 0
    while (k < total) {
      val p = 44 + 2 * k
      val v = (payload(p) & 0xff) | (payload(p + 1).toInt << 8)
      winSums(k * 64 / total) += math.abs(v)
      k += 1
    }
    val tot = winSums.sum
    (0 until 64).foldLeft(0L)((a, w) =>
      if (64L * winSums(w) >= tot) a | (1L << w) else a)
  }

  /** Prefix cap for [[videoFingerprint]]: bounded work per clip
    * regardless of clip length (real fingerprinters sample the first
    * seconds / keyframes, not every byte of a 2-hour file) — and it
    * bounds the oracle's xorshift replay depth. */
  val VideoFpPrefixBytes = 4096

  /** Brightness-envelope video fingerprint over DECODED RGB24 frame
    * bytes — the video analogue of [[audioFingerprint]]: the (capped)
    * frame-data stream maps onto 64 windows, bit = window at least
    * as bright as average (integer byte sums; bit-exact oracle).
    * The stream is continuous across frames in STORED order, so the
    * envelope captures temporal + coarse spatial structure. */
  def videoFingerprint(payload: Array[Byte]): Long = {
    val (w, h, nFrames, _) = decodeAvi(payload)
    val frameSize = w * h * 3
    val total = math.min(nFrames.toLong * frameSize,
      VideoFpPrefixBytes.toLong).toInt
    val winSums = new Array[Long](64)
    var k = 0
    while (k < total) {
      val p = 100 + (k / frameSize) * (8 + frameSize) + 8 + (k % frameSize)
      winSums((k.toLong * 64 / total).toInt) += (payload(p) & 0xff)
      k += 1
    }
    val tot = winSums.sum
    (0 until 64).foldLeft(0L)((a, c) =>
      if (64L * winSums(c) >= tot) a | (1L << c) else a)
  }

  /** Video quality / scene-change card — the trio-closing check next
    * to [[blurStats]] (image) and [[audioQuality]] (audio): per-frame
    * brightness sums over the full frames inside the
    * [[VideoFpPrefixBytes]] cap, consecutive-frame deltas, and a
    * scene change wherever |Δsum| > `sceneThresh`·frameSize — an
    * INTEGER comparison (per-byte mean delta over the threshold), no
    * float boundary anywhere; a static clip scores zero changes and
    * near-zero avg delta, a hard cut spikes. avg_delta reports the
    * per-byte mean |Δ|, floor-truncated at 1e-6 (ratio of exact
    * integers). */
  def videoQuality(media: DataFrame, sceneThresh: Int = 10): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (w, h, nFrames, _) = decodeAvi(payload)
        val frameSize = w * h * 3
        val useFrames =
          math.min(nFrames.toLong, VideoFpPrefixBytes.toLong / frameSize)
            .toInt
        val sums = new Array[Long](math.max(useFrames, 0))
        var f = 0
        while (f < useFrames) {
          val base = 100 + f * (8 + frameSize) + 8
          var i = 0; var s = 0L
          while (i < frameSize) { s += payload(base + i) & 0xff; i += 1 }
          sums(f) = s
          f += 1
        }
        var sumAbs = 0L; var changes = 0L
        var k = 1
        while (k < useFrames) {
          val d = math.abs(sums(k) - sums(k - 1))
          sumAbs += d
          if (d > sceneThresh.toLong * frameSize) changes += 1
          k += 1
        }
        (id, w, h, nFrames, useFrames.toLong, sumAbs, changes,
          frameSize.toLong)
      }
      .toDF("media_id", "width", "height", "n_frames", "frames_scored",
        "_sum_abs", "scene_changes", "_fs")
      .select(col("media_id"), col("width"), col("height"),
        col("n_frames"), col("frames_scored"),
        when(col("frames_scored") > 1,
          floor(col("_sum_abs").cast("double") /
            ((col("frames_scored") - 1) * col("_fs")) * 1000000.0)
            / 1000000.0).otherwise(lit(0.0)).as("avg_delta"),
        col("scene_changes"))
  }

  final case class VideoFp(media_id: Long, width: Int, height: Int,
                           n_frames: Int, vfp: Long)

  /** Per-clip video fingerprints — typed map, one stage, no shuffle. */
  def videoFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (w, h, n, _) = decodeAvi(payload)
        VideoFp(id, w, h, n, videoFingerprint(payload))
      }.toDF()
  }

  /** Audio quality gates per clip — the standard pre-training audio
    * curation checks (a silent or clipped recording is a wasted
    * training token, and both are cheap integer tests over PCM16):
    * silence fraction (|s| < `silenceThresh`), clipping fraction
    * (|s| ≥ `clipThresh`, near full-scale ±32767), and RMS level.
    * Everything to the divisions is exact integer arithmetic
    * (Σ|s|² ≤ n·2³⁰ < 2⁵³ for any realistic clip), fractions and RMS
    * floor-truncate at 1e-6 — ratios of exact integers land on
    * rounding midpoints (the established trunc₆ discipline).
    *
    * Scale: typed map at the decode boundary, one pass per clip, no
    * shuffle. */
  def audioQuality(media: DataFrame, silenceThresh: Int = 1000,
                   clipThresh: Int = 32700): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (nCh, _, nSamples) = decodeWav(payload)
        val total = (nSamples * nCh).toInt
        var silent = 0L; var clipped = 0L; var s2 = 0L
        var k = 0
        while (k < total) {
          val p = 44 + 2 * k
          val raw = (payload(p) & 0xff) | (payload(p + 1).toInt << 8)
          val v = math.abs(if (raw >= 32768) raw - 65536 else raw)
          if (v < silenceThresh) silent += 1
          if (v >= clipThresh) clipped += 1
          s2 += v.toLong * v
          k += 1
        }
        (id, nCh, total.toLong, silent, clipped, s2)
      }
      .toDF("media_id", "n_channels", "n_samples", "n_silent",
        "n_clipped", "sum_sq")
      .select(col("media_id"), col("n_channels"), col("n_samples"),
        col("n_silent"), col("n_clipped"),
        (floor(col("n_silent").cast("double") / col("n_samples")
          * 1000000.0) / 1000000.0).as("silence_frac"),
        (floor(col("n_clipped").cast("double") / col("n_samples")
          * 1000000.0) / 1000000.0).as("clip_frac"),
        (floor(sqrt(col("sum_sq").cast("double") / col("n_samples"))
          * 1000000.0) / 1000000.0).as("rms_level"))
  }

  final case class AudioFp(media_id: Long, n_channels: Int,
                           n_samples: Long, afp: Long)

  /** Per-clip audio fingerprints — typed map, one stage, no shuffle. */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (nCh, _, nSamples) = decodeWav(payload)
        AudioFp(id, nCh, nSamples, audioFingerprint(payload))
      }.toDF()
  }

  /** Synthetic media table whose image payloads are REAL encoded
    * BMPs (dimensions derived from doc_id, so an oracle can replay
    * the expected decode output without parsing bytes). */
  def syntheticBmpMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 16 + (id % 64).toInt
      val h = 16 + (id % 48).toInt
      val payload = encodeBmp(w, h, id)
      (id, "image", payload, "bmp24", payload.length.toLong)
    }.toDF("media_id", "kind", "payload", "meta_codec", "meta_bytes")
  }

  // ---- real audio kernel: WAV/PCM16 (pure JVM, no codec libraries) ----

  /** Write a real, well-formed RIFF/WAVE file: RIFF header (12 B) +
    * canonical "fmt " PCM chunk (24 B) + "data" chunk header (8 B) +
    * 16-bit little-endian samples of deterministic xorshift noise. */
  def encodeWav(nChannels: Int, sampleRate: Int, nSamples: Int,
                seed: Long): Array[Byte] = {
    val dataSize = nSamples * nChannels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                                   // PCM fmt chunk size
    buf.putShort(1)                                  // audio format: PCM
    buf.putShort(nChannels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * nChannels * 2)           // byte rate
    buf.putShort((nChannels * 2).toShort)            // block align
    buf.putShort(16)                                 // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var s = seed | 1L
    while (buf.hasRemaining) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      buf.put((s >>> 56).toByte)
    }
    buf.array()
  }

  /** REAL audio decode: parse the RIFF/WAVE headers from the payload
    * bytes (canonical chunk layout) — magic, PCM fmt fields, data
    * size — cross-checking block-align/byte-rate consistency and
    * that the sample data is present. Returns (nChannels,
    * sampleRate, nSamples); malformed input throws. */
  def decodeWav(payload: Array[Byte]): (Int, Int, Long) = {
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => payload(off + i) == s.charAt(i).toByte)
    require(payload.length >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE"),
      "not a WAV payload")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(ascii(12, "fmt ") && buf.getInt(16) == 16,
      "missing canonical PCM fmt chunk")
    require(buf.getShort(20) == 1, "not PCM audio")
    val nCh = buf.getShort(22).toInt
    val rate = buf.getInt(24)
    val bits = buf.getShort(34).toInt
    require(nCh > 0 && rate > 0 && bits == 16, "bad WAV geometry")
    require(buf.getShort(32).toInt == nCh * 2, "inconsistent block align")
    require(buf.getInt(28) == rate * nCh * 2, "inconsistent byte rate")
    require(ascii(36, "data"), "missing data chunk")
    val dataSize = buf.getInt(40)
    require(dataSize >= 0 && payload.length >= 44 + dataSize &&
      dataSize % (nCh * 2) == 0, "truncated WAV sample data")
    (nCh, rate, dataSize.toLong / (nCh * 2))
  }

  /** Synthetic media table whose audio payloads are REAL encoded
    * WAVs (geometry derived from doc_id, so an oracle can replay the
    * expected decode output without parsing bytes). */
  def syntheticWavMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val nCh = 1 + (id % 2).toInt
      val rate = Array(8000, 16000, 22050, 44100)((id % 4).toInt)
      val n = 256 + (id % 1024).toInt
      val payload = encodeWav(nCh, rate, n, id)
      (id, "audio", payload, "pcm_s16le", payload.length.toLong)
    }.toDF("media_id", "kind", "payload", "meta_codec", "meta_bytes")
  }

  /** Nearest-neighbor PCM16 frame resample of a WAV payload to
    * exactly `outFrames` frames — the audio analogue of
    * [[resizeBmp]] and the length-normalization step of audio ML
    * pipelines (fixed-window models consume equal-length clips).
    * INTEGER-exact: output frame j copies source frame
    * (j·n) ⁄ outFrames byte-for-byte (all channels), so there is no
    * interpolation arithmetic for a cross-engine ulp to diverge on
    * and the oracle replays the resample bit-for-bit. Returns a
    * real, well-formed WAV at the same channel count and nominal
    * rate. */
  def resampleWav(payload: Array[Byte], outFrames: Int): Array[Byte] = {
    require(outFrames > 0, "bad target length")
    val (nCh, rate, n) = decodeWav(payload)
    val block = nCh * 2
    val dataSize = outFrames * block
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16).putShort(1).putShort(nCh.toShort).putInt(rate)
    buf.putInt(rate * block).putShort(block.toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    val arr = buf.array()
    var j = 0
    while (j < outFrames) {
      val sj = (j.toLong * n / outFrames).toInt
      var c = 0
      while (c < block) {
        arr(44 + j * block + c) = payload(44 + sj * block + c)
        c += 1
      }
      j += 1
    }
    arr
  }

  final case class ResampledAudio(media_id: Long, n_channels: Int,
                                  in_frames: Long, out_frames: Int,
                                  out_bytes: Long, checksum: Long)

  /** Per-clip length normalization — typed mapPartitions like
    * [[resizeImages]] (byte resampling is genuinely imperative);
    * one map stage, no shuffle. The position-weighted byte checksum
    * Σ (datapos+1)·byte over the RESAMPLED data pins every byte of
    * the resample to the oracle. */
  def resampleAudio(media: DataFrame, outFrames: Int = 200): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val (nCh, _, n) = decodeWav(payload)
        val out = resampleWav(payload, outFrames)
        val (rCh, _, rn) = decodeWav(out) // roundtrip sanity
        require(rCh == nCh && rn == outFrames, "resample roundtrip")
        var sum = 0L
        var p = 0
        val dataSize = outFrames * nCh * 2
        while (p < dataSize) {
          sum += (p + 1).toLong * (out(44 + p) & 0xff)
          p += 1
        }
        ResampledAudio(id, nCh, n, outFrames, out.length.toLong, sum)
      }.toDF()
  }

  /** Typed rows leaving the audio decode stage. */
  final case class AudioFeatures(media_id: Long, n_channels: Int,
                                 sample_rate: Int, n_samples: Long,
                                 duration_ms: Long, meta_bytes: Long)

  /** Audio feature extraction: the same per-partition iterator shape
    * as [[extractFeatures]], dispatching on the container magic
    * (r12): WAV through the byte-exact parser, AIFF/AU through the
    * JDK's javax.sound readers, and MP3/FLAC/OGG — recognized but
    * with NO JVM decoder — through the DOCUMENTED deterministic stub
    * (the seam a real deployment plugs a codec library into; the gap
    * is explicit at [[audioContainer]], never a silent wrong decode).
    * Duration is derived feature math (floor ms) on the decoded
    * geometry. */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload", "meta_bytes").as[MediaIn]
      .mapPartitions { rows =>
        rows.map { m =>
          val (nCh, rate, n) = audioContainer(m.payload) match {
            case "wav" | "aiff" | "au" => decodeAudio(m.payload)
            case _ =>
              // STUB fall-through (documented): fake-but-deterministic
              // geometry keeps the pipeline plumbing real and testable
              // for the out-of-JVM-scope codecs
              val (w, h, f) = decodeStub(m.payload)
              (1 + w % 2, 8000 * (1 + h % 4), f.toLong * 160L)
          }
          AudioFeatures(m.media_id, nCh, rate, n,
            n * 1000L / rate, m.meta_bytes)
        }
      }
      .toDF()
  }

  // ---- real-CONTAINER audio dispatch: WAV/AIFF/AU via javax.sound --
  // (r12: the audio analogue of the r11 image-container dispatch)

  /** Magic-byte sniff for audio containers at the dispatch point.
    * "wav"/"aiff"/"au" are decodable inside the JVM (javax.sound's
    * WAVE/AIFF/AU readers). "mp3" (ID3 tag or MPEG frame sync),
    * "flac" ("fLaC") and "ogg" ("OggS") are RECOGNIZED but have NO
    * JDK decoder — the real crawl formats a deployment must plug an
    * external codec library in for, at the same [[decodeStub]] seam;
    * they fall to the stub EXPLICITLY here (a documented gap, never
    * a silent wrong decode). */
  def audioContainer(p: Array[Byte]): String = {
    def ascii(off: Int, s: String): Boolean = p.length >= off + s.length &&
      s.indices.forall(i => p(off + i) == s.charAt(i).toByte)
    if (ascii(0, "RIFF") && ascii(8, "WAVE")) "wav"
    else if (ascii(0, "FORM") && (ascii(8, "AIFF") || ascii(8, "AIFC"))) "aiff"
    else if (ascii(0, ".snd")) "au"
    else if (ascii(0, "ID3") ||
      (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xe0) == 0xe0)) "mp3"
    else if (ascii(0, "fLaC")) "flac"
    else if (ascii(0, "OggS")) "ogg"
    else "unknown"
  }

  /** Decode WAV/AIFF/AU to (nChannels, sampleRate, nFrames): WAV
    * through the byte-exact [[decodeWav]] parser, AIFF/AU through
    * `javax.sound.sampled.AudioSystem` — the same cross-decoder
    * discipline as the image containers (one synthetic PCM stream
    * encoded into every container decodes to the same samples,
    * asserted in PipelineSpec). MP3/FLAC/OGG throw the documented
    * no-JVM-decoder error; generic dispatch catches the gap at
    * [[audioContainer]] and falls to the stub instead. */
  def decodeAudio(payload: Array[Byte]): (Int, Int, Long) =
    audioContainer(payload) match {
      case "wav" => decodeWav(payload)
      case "aiff" | "au" =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val f = in.getFormat
          require(f.getSampleSizeInBits == 16, "bad audio geometry")
          (f.getChannels, math.round(f.getSampleRate),
            in.getFrameLength)
        } finally in.close()
      case other => throw new IllegalArgumentException(
        s"no JVM decoder for audio container '$other' " +
          "(MP3/FLAC/OGG need an external codec library)")
    }

  /** Encode the SAME xorshift PCM16 sample stream as [[encodeWav]]
    * into a real AIFF or AU container via javax.sound (sample bytes
    * are big-endian inside those containers; sample VALUES are
    * identical to the WAV's — exactly what the cross-decoder spec
    * asserts). `fileType` ∈ {"aiff", "au"}. */
  def encodeViaJavaSound(nChannels: Int, sampleRate: Int, nSamples: Int,
                         seed: Long, fileType: String): Array[Byte] = {
    val dataSize = nSamples * nChannels * 2
    // the WAV generator's byte stream, then LE pairs → BE pairs so
    // the 16-bit sample values match across containers
    val le = new Array[Byte](dataSize)
    var s = seed | 1L
    var i = 0
    while (i < dataSize) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      le(i) = (s >>> 56).toByte
      i += 1
    }
    val be = new Array[Byte](dataSize)
    i = 0
    while (i < dataSize) { be(i) = le(i + 1); be(i + 1) = le(i); i += 2 }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, nChannels, nChannels * 2,
      sampleRate.toFloat, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(be), fmt, nSamples.toLong)
    val tpe = fileType match {
      case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
      case "au"   => javax.sound.sampled.AudioFileFormat.Type.AU
      case t => throw new IllegalArgumentException(s"bad container $t")
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, tpe, baos)
    baos.toByteArray
  }

  /** PCM16 sample values of a WAV/AIFF/AU payload, interleaved, via
    * the JDK decoder — the cross-decoder comparison surface (WAV
    * additionally cross-checks the hand parser vs the JDK reader). */
  def pcmSamples(payload: Array[Byte]): Array[Short] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val f = in.getFormat
      val bytes = in.readAllBytes()
      val out = new Array[Short]((bytes.length / 2).toInt)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < out.length) { out(i) = bb.getShort(); i += 1 }
      out
    } finally in.close()
  }

  // ---- real video kernel: RIFF/AVI + raw RGB24 frames (pure JVM) ----

  /** Write a real, minimal RIFF/AVI container: RIFF header, one
    * `hdrl` LIST holding the 56-byte `avih` main header, and a
    * `movi` LIST of `00db` (uncompressed DIB) frame chunks of raw
    * RGB24 with deterministic xorshift noise. `fps` must divide 10⁶
    * (AVI stores the integer frame period in microseconds). */
  def encodeAvi(width: Int, height: Int, fps: Int, nFrames: Int,
                seed: Long): Array[Byte] = {
    require(1000000 % fps == 0, s"fps $fps must divide 1e6")
    val frameSize = width * height * 3
    val moviSize = 4 + nFrames * (8 + frameSize)
    val total = 100 + nFrames * (8 + frameSize)
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
    buf.put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(68)
    buf.put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")).putInt(56)
    buf.putInt(1000000 / fps)              // dwMicroSecPerFrame
    buf.putInt(frameSize * fps)            // dwMaxBytesPerSec
    buf.putInt(0).putInt(0)                // padding granularity, flags
    buf.putInt(nFrames)                    // dwTotalFrames
    buf.putInt(0).putInt(1)                // initial frames, streams
    buf.putInt(frameSize)                  // suggested buffer size
    buf.putInt(width).putInt(height)
    buf.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    buf.put("LIST".getBytes("US-ASCII")).putInt(moviSize)
    buf.put("movi".getBytes("US-ASCII"))
    var s = seed | 1L
    for (_ <- 0 until nFrames) {
      buf.put("00db".getBytes("US-ASCII")).putInt(frameSize)
      var i = 0
      while (i < frameSize) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        buf.put((s >>> 56).toByte)
        i += 1
      }
    }
    buf.array()
  }

  /** REAL video decode: parse the RIFF/AVI headers — magic pair,
    * `hdrl`/`avih` layout, geometry and frame count — cross-checking
    * the RIFF size, the `movi` list size against the frame chunks,
    * and the first frame chunk's `00db` magic + RGB24 size. Returns
    * (width, height, nFrames, fps); malformed input throws. */
  def decodeAvi(payload: Array[Byte]): (Int, Int, Int, Int) = {
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => payload(off + i) == s.charAt(i).toByte)
    require(payload.length >= 100 && ascii(0, "RIFF") && ascii(8, "AVI "),
      "not an AVI payload")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt(4) == payload.length - 8, "inconsistent RIFF size")
    require(ascii(12, "LIST") && ascii(20, "hdrl") &&
      ascii(24, "avih") && buf.getInt(28) == 56, "missing avih header")
    val usPerFrame = buf.getInt(32)
    val nFrames = buf.getInt(48)
    val width = buf.getInt(64)
    val height = buf.getInt(68)
    require(width > 0 && height > 0 && nFrames > 0 && usPerFrame > 0 &&
      1000000 % usPerFrame == 0, "bad AVI geometry")
    val frameSize = width * height * 3
    require(ascii(88, "LIST") && ascii(96, "movi") &&
      buf.getInt(92) == 4 + nFrames * (8 + frameSize),
      "inconsistent movi list")
    require(ascii(100, "00db") && buf.getInt(104) == frameSize,
      "bad first frame chunk")
    require(payload.length >= 100 + nFrames * (8 + frameSize),
      "truncated AVI frame data")
    (width, height, nFrames, 1000000 / usPerFrame)
  }

  /** Synthetic media table whose video payloads are REAL encoded
    * AVIs (geometry derived from doc_id, so an oracle can replay the
    * expected decode output without parsing bytes). */
  def syntheticAviMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 16).toInt
      val h = 8 + (id % 12).toInt
      val fps = Array(10, 20, 25, 50)((id % 4).toInt)
      val n = 4 + (id % 28).toInt
      val payload = encodeAvi(w, h, fps, n, id)
      (id, "video", payload, "rawvideo_rgb24", payload.length.toLong)
    }.toDF("media_id", "kind", "payload", "meta_codec", "meta_bytes")
  }

  /** Typed rows leaving the video decode stage. */
  final case class VideoFeatures(media_id: Long, width: Int, height: Int,
                                 n_frames: Int, fps: Int,
                                 duration_ms: Long, meta_bytes: Long)

  /** Video feature extraction: the same per-partition iterator shape
    * as [[extractFeatures]], with the REAL AVI kernel. */
  def extractVideoFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload", "meta_bytes").as[MediaIn]
      .mapPartitions { rows =>
        rows.map { m =>
          val (w, h, n, fps) = decodeAvi(m.payload)
          VideoFeatures(m.media_id, w, h, n, fps,
            n * 1000L / fps, m.meta_bytes)
        }
      }
      .toDF()
  }

  /** Typed rows entering / leaving the decode stage. */
  final case class MediaIn(media_id: Long, kind: String,
                           payload: Array[Byte], meta_bytes: Long)
  final case class MediaFeatures(media_id: Long, kind: String, width: Int,
                                 height: Int, n_frames: Int, meta_bytes: Long)

  /** Feature extraction: typed `Dataset.mapPartitions` over payload
    * batches (the iterator shape a real arrow-batched decoder needs:
    * one initialization per partition, streaming rows, no collect).
    * Staying on the Dataset API — not `df.rdd` — keeps the stage
    * inside the Catalyst plan, so upstream filters/pruning still
    * push through and the object (de)serialization is codegen'd. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload", "meta_bytes").as[MediaIn]
      .mapPartitions { rows =>
        // per-partition init would open the decoder context here
        rows.map { m =>
          val (w, h, f) =
            if (m.kind == "image" && isBmp(m.payload)) {
              // real kernel: parse the actual bytes; a still image
              // is one frame
              val (bw, bh, _) = decodeBmp(m.payload)
              (bw, bh, 1)
            } else if (m.kind == "image" && imageIoSniffs(m.payload)) {
              // real STANDARD containers (PNG/JPEG/GIF/TIFF — r11):
              // whatever the ImageIO registry recognizes decodes for
              // real; only unrecognized bytes fall to the stub
              val img = decodeImage(m.payload)
              (img.getWidth, img.getHeight, 1)
            } else decodeStub(m.payload)
          MediaFeatures(m.media_id, m.kind, w, h, f, m.meta_bytes)
        }
      }
      .toDF()
  }

  /** Resize planning: aspect-fit target dimensions for decoded
    * media — the real geometry math (fit the (width, height) box
    * into maxSide preserving aspect, never upscale); the pixel
    * resample itself belongs to the stubbed decode kernel. Runs on
    * the (tiny) feature frame, not payloads. */
  def resizePlan(features: DataFrame, maxSide: Int = 512): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"),
      lit(1.0))
    features.select(
      col("media_id"), col("width"), col("height"),
      round(col("width") * scale, 0).cast("int").as("out_width"),
      round(col("height") * scale, 0).cast("int").as("out_height"),
      round(scale, 6).as("scale"))
  }

  /** Frame sampling plan for video rows: every `stride`-th frame
    * index as an array column — pure column algebra, the decode of
    * each sampled frame being the stubbed stage. */
  def sampleFrames(features: DataFrame, stride: Int = 30): DataFrame =
    features.where(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_idx"))

  // ---- real-FORMAT image kernels: PNG + JPEG via javax.imageio ----
  // (pure JDK — the codecs every real crawl's images actually use,
  // plugged into the same typed-mapPartitions boundary as the
  // synthetic BMP/WAV/AVI kernels)

  /** Encode the xorshift pixel stream as a REAL PNG through
    * `javax.imageio` — the first standard container on the media
    * path. Pixel (x, y)'s (r, g, b) are bytes 3(y·w+x)+0..2 of the
    * xorshift64 stream seeded `seed|1` (the BMP generator's stream
    * minus padding and bottom-up rows: PNG has neither, so the
    * byte→pixel map is the identity and the oracle replay is
    * simpler than the BMP one). PNG is lossless, so
    * [[decodeImage]] returns these exact bytes and channel sums
    * replay bit-for-bit in DuckDB. The container bytes themselves
    * are encoder-version-dependent and are never asserted on —
    * only the decoded pixels are. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed | 1L
    def nb(): Int = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      ((s >>> 56) & 0xffL).toInt
    }
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = nb(); val g = nb(); val b = nb()
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** REAL standard-container decode (PNG, JPEG, GIF, BMP — whatever
    * the JDK's ImageIO registry recognizes). Malformed or truncated
    * payloads throw loudly (ImageIO signals them as null).
    * `setUseCache(false)` keeps the reader on heap buffers — the
    * default FILE-backed stream cache would write every payload to
    * executor temp disk, a silent 2× I/O tax at 100 TB. */
  def decodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "unrecognized or corrupt image container")
    img
  }

  /** Deterministic PNG media table (mirrors [[syntheticBmpMedia]];
    * smaller geometry keeps the oracle's per-byte xorshift replay
    * cheap). Encode runs in the map stage — at 100 TB the payloads
    * arrive from storage instead and this synthesizer disappears. */
  def syntheticPngMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 24).toInt
      val h = 8 + (id % 16).toInt
      val payload = encodePng(w, h, id)
      (id, "image", payload, "png", payload.length.toLong)
    }.toDF("media_id", "kind", "payload", "meta_codec", "meta_bytes")
  }

  /** Channel statistics over REAL-container images (PNG or anything
    * ImageIO reads): decode, walk getRGB, integer channel sums —
    * the [[channelStats]] card with the production codec in place
    * of the synthetic BMP parser. Same scale posture: payloads
    * never shuffle, only the tiny stats rows do. */
  def imageChannelStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val img = decodeImage(payload)
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        (id, w, h, sr, sg, sb)
      }
      .toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .withColumn("_n", (col("width") * col("height")).cast("double"))
      .select(col("media_id"), col("width"), col("height"),
        col("sum_r"), col("sum_g"), col("sum_b"),
        round(col("sum_r") / col("_n"), 6).as("mean_r"),
        round(col("sum_g") / col("_n"), 6).as("mean_g"),
        round(col("sum_b") / col("_n"), 6).as("mean_b"))
  }

  /** Encode the xorshift byte stream as a REAL GIF through
    * `javax.imageio` — the third standard container. GIF is
    * palette-indexed (≤256 colors), so the deterministic image is
    * 8-bit GRAYSCALE: pixel (x, y) = stream byte y·w+x painted
    * through an explicit 256-gray IndexColorModel. Indexed-in,
    * indexed-out makes the roundtrip lossless (no quantizer runs),
    * so decoded gray sums replay the xorshift chain bit-for-bit in
    * the oracle — one byte per pixel this time, no channel
    * interleave. */
  def encodeGif(width: Int, height: Int, seed: Long): Array[Byte] = {
    val grays = new Array[Byte](256)
    var i = 0
    while (i < 256) { grays(i) = i.toByte; i += 1 }
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var s = seed | 1L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        raster.setSample(x, y, 0, ((s >>> 56) & 0xffL).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", baos)
    baos.toByteArray
  }

  /** Deterministic GIF media table (the PNG table's geometry). */
  def syntheticGifMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 24).toInt
      val h = 8 + (id % 16).toInt
      val payload = encodeGif(w, h, id)
      (id, "image", payload, "gif", payload.length.toLong)
    }.toDF("media_id", "kind", "payload", "meta_codec", "meta_bytes")
  }

  /** Grayscale statistics over REAL-container images — the GIF leg
    * of [[imageChannelStats]]: decode through the real codec, sum
    * the (equal) channel values once. */
  def grayStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val img = decodeImage(payload)
        val w = img.getWidth; val h = img.getHeight
        var sg = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sg += img.getRGB(x, y) & 0xff // gray: r = g = b
            x += 1
          }
          y += 1
        }
        (id, w, h, sg)
      }
      .toDF("media_id", "width", "height", "sum_gray")
      .select(col("media_id"), col("width"), col("height"), col("sum_gray"),
        round(col("sum_gray") /
          (col("width") * col("height")).cast("double"), 6).as("mean_gray"))
  }

  /** Encode the SAME xorshift pixel stream as [[encodePng]] into a
    * REAL TIFF container (the JDK ships a TIFF plugin since 9) —
    * lossless like PNG, so two different containers carrying the
    * same image must decode to identical channel statistics, and
    * the `mm_tiff` gate entry reuses the `mm_png` oracle VERBATIM:
    * the strongest cross-container check available (any
    * container-specific decode defect breaks the shared replay). */
  def encodeTiff(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed | 1L
    def nb(): Int = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      ((s >>> 56) & 0xffL).toInt
    }
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = nb(); val g = nb(); val b = nb()
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "tiff", baos)
    require(ok, "no TIFF writer registered in this JVM")
    baos.toByteArray
  }

  /** Deterministic TIFF media table (the PNG table's geometry and
    * pixels, different container). */
  def syntheticTiffMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 24).toInt
      val h = 8 + (id % 16).toInt
      val payload = encodeTiff(w, h, id)
      (id, "image", payload, "tiff", payload.length.toLong)
    }.toDF("media_id", "kind", "payload", "meta_codec", "meta_bytes")
  }

  /** Encode a smooth deterministic gradient as a REAL JPEG (r ramps
    * with x, g with y, b constant — low-frequency content keeps
    * codec error small and version-stable). JPEG is lossy, so no
    * bit-exact pixel oracle exists; the contract [[jpegDrift]]
    * checks is geometry (preserved exactly) plus bounded channel
    * drift. */
  def encodeJpeg(width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = if (width == 1) 0 else x * 255 / (width - 1)
        val g = if (height == 1) 0 else y * 255 / (height - 1)
        img.setRGB(x, y, (r << 16) | (g << 8) | 128)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Deterministic JPEG media table (geometry family as
    * [[syntheticPngMedia]]). */
  def syntheticJpegMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 24).toInt
      val h = 8 + (id % 16).toInt
      val payload = encodeJpeg(w, h)
      (id, "image", payload, "jpeg", payload.length.toLong)
    }.toDF("media_id", "kind", "payload", "meta_codec", "meta_bytes")
  }

  /** The lossy-codec contract card: decode each JPEG through the
    * real codec, recompute the encoder's expected channel sums from
    * the geometry (the gradient is a function of (w, h) alone) and
    * flag whether every channel's mean drifted less than `tol`
    * levels. Geometry is asserted through the OUTPUT (the oracle
    * pins width/height exactly and `drift_ok = true`, so a codec
    * regression fails the gate rather than hiding in a tolerance
    * column). */
  def jpegDrift(media: DataFrame, tol: Double = 8.0): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val img = decodeImage(payload)
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var er = 0L; var eg = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            er += (if (w == 1) 0 else x * 255 / (w - 1))
            eg += (if (h == 1) 0 else y * 255 / (h - 1))
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        val ok = math.abs(sr - er) / n <= tol &&
          math.abs(sg - eg) / n <= tol &&
          math.abs(sb - 128L * w * h) / n <= tol
        (id, w, h, ok)
      }
      .toDF("media_id", "width", "height", "drift_ok")
  }
}
