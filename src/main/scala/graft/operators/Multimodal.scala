package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as partition-local batch transforms.
  *
  * Image PIXEL decode is REAL: `javax.imageio` ships with the JDK and
  * decodes PNG/JPEG/GIF/BMP headlessly ([[decodeImage]] → luminance →
  * aHash/dHash perceptual fingerprints for near-dup detection via
  * [[graft.operators.Dedup.hammingPairs]]). Only codecs genuinely absent
  * from the JDK (video, compressed audio) keep the deterministic-fake
  * path ([[decodeImageMeta]]'s fallback, [[frameSamples]]); the
  * Spark-side shape is identical either way: binary columns survive
  * Parquet round-trips, decode runs via `mapPartitions` so per-partition
  * decoder state is initialized once per task, and output schemas are
  * fixed `StructType`s.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("header_hex", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Attach a binary payload column derived from text (stand-in for real
    * media bytes in the driver-provided corpus).
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** STUB media decode: deterministic pseudo-metadata from the payload
    * bytes. A real implementation replaces `decodeOne` with a codec call;
    * everything around it (batching, schema, null-safety) stays.
    */
  def decodeImageMeta(df: DataFrame, idCol: String = "doc_id",
                      payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = input.queryExecution.toRdd.mapPartitions { it =>
      // per-partition decoder init would go here (codec context, model...)
      it.map { ir =>
        val id = ir.getLong(0)
        val bytes = ir.getBinary(1)
        decodeOne(id, bytes)
      }
    }
    spark.createDataFrame(rdd.map(t => Row(t._1, t._2, t._3, t._4, t._5, t._6)),
      imageMetaSchema)
  }

  /** The decoder: REAL container-header parsing (PNG/GIF/BMP/JPEG
    * dimensions from byte offsets — no codec library needed) with the
    * deterministic fake as the fallback for unrecognized payloads (the
    * synthetic corpus's text-derived bytes). Pixel decoding stays stubbed.
    */
  private def decodeOne(id: Long, bytes: Array[Byte]): (Long, Int, String, Int, Int, Int) = {
    val n = bytes.length
    val header = bytes.take(4).map(b => f"$b%02X").mkString
    ImageHeader.parse(bytes) match {
      case Some((_, w, h)) => (id, n, header, w, h, 1)
      case None => (id, n, header, n % 640, (n * 7) % 480, n % 16 + 1)
    }
  }

  // -------------------------------------------------------------------
  // REAL pixel decode — `javax.imageio` ships with the JDK and decodes
  // PNG/JPEG/GIF/BMP headlessly, so pixel-level work needs no external
  // codec library. Everything below decodes actual pixels.
  // -------------------------------------------------------------------

  val imagePixelSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("ahash", LongType, nullable = true),
    StructField("dhash", LongType, nullable = true)))

  /** Decode image payloads to pixels and compute 64-bit perceptual
    * fingerprints — the image analogue of text SimHash, feeding the
    * same banded-Hamming near-dup machinery
    * ([[graft.operators.Dedup.hammingPairs]]):
    *
    *   - `ahash`: average hash — luminance downsampled (exact integer
    *     area average) to 8×8, bit = cell ≥ grid mean;
    *   - `dhash`: difference hash — 9×8 grid, bit = right neighbor
    *     strictly brighter (row-major, gradient-direction signature;
    *     the standard near-dup fingerprint, stable under rescale and
    *     re-encode).
    *
    * Runs via `mapPartitions`: ImageIO reader lookup and the disabled
    * disk cache are per-partition state, one InternalRow pass, no
    * serialization of pixel buffers across tasks — only the 6 scalar
    * outputs move. Undecodable payloads (truncated, not an image)
    * yield NULL format/hash columns, never a task failure: at corpus
    * scale a crawl batch ALWAYS contains broken bytes.
    */
  def decodeImage(df: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = input.queryExecution.toRdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no tmp-file churn per decode
      it.map { ir =>
        val id = ir.getLong(0)
        val bytes = ir.getBinary(1)
        decodePixelsOne(id, bytes)
      }
    }
    spark.createDataFrame(
      rdd.map(t => Row(t._1, t._2, t._3, t._4, t._5, t._6)), imagePixelSchema)
  }

  /** (id, sig) projection of [[decodeImage]] for
    * [[graft.operators.Dedup.hammingPairs]] — `sig` is the dHash.
    */
  def imagePHash(df: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame =
    decodeImage(df, idCol, payloadCol)
      .select(col("doc_id").as("id"), col("dhash").as("sig"))

  private def decodePixelsOne(id: Long, bytes: Array[Byte])
      : (Long, String, Integer, Integer, java.lang.Long, java.lang.Long) = {
    // NonFatal, not IOException: imageio plugins throw RuntimeExceptions
    // (IndexOutOfBounds, IllegalArgument, CMMException) on malformed
    // JPEG/GIF bytes, and the scaladoc promise is "never a task failure"
    try {
      if (bytes == null) (id, null, null, null, null, null)
      else {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) (id, null, null, null, null, null)
        else {
          val lum = luminanceGrid(img)
          val fmt = ImageHeader.parse(bytes).map(_._1).getOrElse("unknown")
          (id, fmt, img.getWidth, img.getHeight,
            aHash64(lum): java.lang.Long, dHash64(lum): java.lang.Long)
        }
      }
    } catch {
      case scala.util.control.NonFatal(_) => (id, null, null, null, null, null)
    }
  }

  /** Integer luminance (0..255, ITU-R 601 weights in exact integer
    * arithmetic) of every pixel, row-major.
    */
  private def luminanceGrid(img: java.awt.image.BufferedImage): Array[Array[Int]] = {
    val w = img.getWidth; val h = img.getHeight
    val g = Array.ofDim[Int](h, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF; val gr = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
        g(y)(x) = (r * 299 + gr * 587 + b * 114) / 1000
        x += 1
      }
      y += 1
    }
    g
  }

  /** Exact integer area-average downsample to `gw`×`gh`: cell (i, j)
    * averages source pixels x ∈ [i·w/gw, (i+1)·w/gw), floor division —
    * deterministic on every JVM (no Graphics2D rendering pipeline, no
    * float resampling kernels).
    */
  private[operators] def areaAverage(lum: Array[Array[Int]], gw: Int, gh: Int): Array[Array[Int]] = {
    val h = lum.length; val w = lum(0).length
    val out = Array.ofDim[Int](gh, gw)
    var j = 0
    while (j < gh) {
      val y0 = j * h / gh; val y1 = math.max((j + 1) * h / gh, y0 + 1)
      var i = 0
      while (i < gw) {
        val x0 = i * w / gw; val x1 = math.max((i + 1) * w / gw, x0 + 1)
        var s = 0L; var y = y0
        while (y < y1) { var x = x0; while (x < x1) { s += lum(y)(x); x += 1 }; y += 1 }
        out(j)(i) = (s / ((y1 - y0).toLong * (x1 - x0))).toInt
        i += 1
      }
      j += 1
    }
    out
  }

  private def aHash64(lum: Array[Array[Int]]): Long = {
    val g = areaAverage(lum, 8, 8)
    var s = 0L
    var j = 0; while (j < 8) { var i = 0; while (i < 8) { s += g(j)(i); i += 1 }; j += 1 }
    val mean = s / 64
    var bits = 0L; var k = 0
    j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) { if (g(j)(i) >= mean) bits |= (1L << k); k += 1; i += 1 }
      j += 1
    }
    bits
  }

  private def dHash64(lum: Array[Array[Int]]): Long = {
    val g = areaAverage(lum, 9, 8)
    var bits = 0L; var k = 0
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) { if (g(j)(i + 1) > g(j)(i)) bits |= (1L << k); k += 1; i += 1 }
      j += 1
    }
    bits
  }

  /** PIXEL-LEVEL verification of image near-dup candidate pairs — the
    * stage after [[imagePHash]] + banded Hamming at corpus scale: a
    * 64-bit dHash over ~10^10 cross-pairs surfaces a handful of
    * structural collisions (measured: 8 at 100k images, NOTES r12)
    * that only pixels can adjudicate. Joins each (id1, id2) candidate
    * back to its payloads, decodes BOTH, and compares exact-integer
    * 9×8 area-average luminance grids by mean absolute difference
    * (resize-invariant for cell-aligned content, brightness-sensitive
    * — exactly what the gradient-direction dHash ignores). Keeps pairs
    * with `mean_abs_diff <= maxMeanAbsDiff`.
    *
    * Shape: candidate-sized, never corpus-squared — two hash joins of
    * the (bounded) candidate list against the image table, pixel work
    * only on candidates. Undecodable sides drop the pair (cannot
    * verify ⇒ not a confirmed duplicate).
    */
  def verifyImagePairs(pairs: DataFrame, images: DataFrame,
                       maxMeanAbsDiff: Double,
                       idCol: String = "doc_id",
                       payloadCol: String = "payload"): DataFrame = {
    val img = images.select(col(idCol).as("_vid"), col(payloadCol).as("_vp"))
    val dist = udf((a: Array[Byte], b: Array[Byte]) => gridDistance(a, b))
    pairs
      .join(img.withColumnRenamed("_vid", "id1").withColumnRenamed("_vp", "_p1"), Seq("id1"))
      .join(img.withColumnRenamed("_vid", "id2").withColumnRenamed("_vp", "_p2"), Seq("id2"))
      .withColumn("mean_abs_diff", dist(col("_p1"), col("_p2")))
      .filter(col("mean_abs_diff").isNotNull &&
        col("mean_abs_diff") <= maxMeanAbsDiff)
      .select(col("id1"), col("id2"), col("mean_abs_diff"))
  }

  /** Mean absolute luminance difference between two images on the 9×8
    * exact-integer area-average grid (the dHash grid, so cell-aligned
    * resizes compare exactly); null when either side fails to decode.
    */
  private[graft] def gridDistance(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    def grid(bytes: Array[Byte]): Option[Array[Array[Int]]] =
      Option(bytes).flatMap(bs =>
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bs))))
        .map(img => areaAverage(luminanceGrid(img), 9, 8))
    try {
      (grid(a), grid(b)) match {
        case (Some(ga), Some(gb)) =>
          var s = 0L
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 9) { s += math.abs(ga(j)(i) - gb(j)(i)); i += 1 }
            j += 1
          }
          java.lang.Double.valueOf(s.toDouble / 72.0)
        case _ => null
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** [[syntheticImage]] with every cell level shifted by `delta` — the
    * designed dHash COLLISION for verification harnesses: gradient
    * directions (and the mean-relative aHash bits) are unchanged, so
    * every perceptual hash matches the unshifted image exactly, while
    * pixels differ by exactly `delta` everywhere.
    */
  def syntheticImageShifted(docId: Long, delta: Int,
                            format: String = "png"): Array[Byte] = {
    val cells = Array.tabulate(8, 9) { (j, i) =>
      var z = docId * 0x9E3779B97F4A7C15L + (j * 9 + i + 1) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (if (((z ^ (z >>> 31)) & 1L) == 0L) 40 else 200) + delta
    }
    val lum = Array.tabulate(32, 36)((y, x) => cells(y / 4)(x / 4))
    encodeGray(lum, format)
  }

  /** Decode → exact-integer area-average resize → lossless re-encode
    * (PNG) — the deterministic pixel transform behind the planted
    * image-near-dup gates; returns null when the payload is not
    * decodable.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) return null
    val lum = areaAverage(luminanceGrid(img), w, h)
    encodeGray(lum, "png")
  }

  /** Deterministic synthetic image for planted-pair harnesses: a
    * 36×32 grayscale pattern, piecewise-constant on the 9×8 dHash grid
    * (4×4-pixel cells), each cell 40 or 200 from a doc-seeded avalanche
    * bit. Cell-aligned constancy makes the perceptual hashes EXACTLY
    * invariant under cell-aligned resize (18×16) and lossless
    * re-encode, while independent seeds give unrelated images ~24/64
    * expected dHash Hamming distance — planted twins and non-pairs are
    * separated by construction, not by luck.
    */
  def syntheticImage(docId: Long, format: String = "png"): Array[Byte] = {
    val cells = Array.tabulate(8, 9) { (j, i) =>
      // splitmix64-style avalanche over (docId, cell)
      var z = docId * 0x9E3779B97F4A7C15L + (j * 9 + i + 1) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      if (((z ^ (z >>> 31)) & 1L) == 0L) 40 else 200
    }
    val lum = Array.tabulate(32, 36)((y, x) => cells(y / 4)(x / 4))
    encodeGray(lum, format)
  }

  private def encodeGray(lum: Array[Array[Int]], format: String): Array[Byte] = {
    val h = lum.length; val w = lum(0).length
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = lum(y)(x) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  // -------------------------------------------------------------------
  // REAL audio decode — WAV/PCM is a self-describing container (RIFF
  // chunk walk + raw little-endian samples), so pixel-grade decode
  // needs no codec library here either. Compressed audio (mp3/aac)
  // would need one and stays out of scope.
  // -------------------------------------------------------------------

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_samples", IntegerType, nullable = true),
    StructField("energy_hash", LongType, nullable = true)))

  /** Decode PCM16 WAV payloads and compute a 64-bit ENERGY-ENVELOPE
    * fingerprint — the audio analogue of the image dHash, feeding the
    * same banded-Hamming machinery
    * ([[graft.operators.Dedup.hammingPairs]]): the sample stream splits
    * into 64 equal time segments, each segment's mean |amplitude| is
    * compared against the global mean — bit = louder than average.
    * Amplitude-relative and time-proportional, so the fingerprint
    * survives resampling and volume scaling (the common re-encode
    * transforms); undecodable or non-PCM16 payloads yield NULLs, never
    * task failures.
    */
  def decodeAudio(df: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = input.queryExecution.toRdd.mapPartitions { it =>
      it.map { ir =>
        val id = ir.getLong(0)
        parsePcm16(ir.getBinary(1)) match {
          case Some((ch, rate, samples)) =>
            Row(id, ch, rate, samples.length,
              envelopeHash64(samples): java.lang.Long)
          case None => Row(id, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, audioSchema)
  }

  /** (id, sig) projection of [[decodeAudio]] for
    * [[graft.operators.Dedup.hammingPairs]].
    */
  def audioPHash(df: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame =
    decodeAudio(df, idCol, payloadCol)
      .select(col("doc_id").as("id"), col("energy_hash").as("sig"))

  /** RIFF/WAVE chunk walk → (channels, sampleRate, interleaved PCM16
    * samples). Same traversal as [[AudioHeader.parse]] plus the data
    * payload; None for anything that is not canonical PCM16.
    */
  private[graft] def parsePcm16(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xFFFFFFFFL
    try {
      if (b.length < 12 ||
        !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      var i = 12
      var rate = 0; var channels = 0; var bitsPer = 0; var fmtCode = 0
      var dataOff = -1; var dataLen = 0
      while (i + 8 <= b.length) {
        val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(i + 4)
        if (id == "fmt " && i + 24 <= b.length) {
          fmtCode = le16(i + 8)
          channels = le16(i + 10)
          rate = le32(i + 12).toInt
          bitsPer = le16(i + 22)
        } else if (id == "data") {
          dataOff = i + 8
          dataLen = math.min(size, (b.length - dataOff).toLong).toInt
        }
        val next = i.toLong + 8L + size + (size & 1L)
        if (next <= i || next > b.length.toLong) i = b.length
        else i = next.toInt
      }
      if (fmtCode != 1 || bitsPer != 16 || channels <= 0 || rate <= 0 ||
        dataOff < 0) return None
      val n = dataLen / 2
      val samples = new Array[Short](n)
      var k = 0
      while (k < n) {
        samples(k) = (u8(dataOff + 2 * k) | (b(dataOff + 2 * k + 1) << 8)).toShort
        k += 1
      }
      Some((channels, rate, samples))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** 64-bit energy-envelope fingerprint: bit s = mean |amplitude| of
    * time segment s strictly above the global mean of the 64 segment
    * energies. Exact integer sums throughout (no float accumulation),
    * and both sides of the compare scale linearly with volume and are
    * invariant to sample rate when the content is time-aligned — the
    * basis of the planted resample-twin gate.
    */
  private[operators] def envelopeHash64(samples: Array[Short]): Long = {
    val n = samples.length
    if (n < 64) return 0L
    val seg = new Array[Long](64)
    val cnt = new Array[Long](64)
    var i = 0
    while (i < n) {
      val s = i.toLong * 64 / n
      seg(s.toInt) += math.abs(samples(i).toLong)
      cnt(s.toInt) += 1
      i += 1
    }
    // compare per-segment mean vs global mean in exact cross-multiplied
    // integer form: seg(s)/cnt(s) > total/n  <=>  seg(s)*n > total*cnt(s)
    var total = 0L
    var s = 0
    while (s < 64) { total += seg(s); s += 1 }
    var bits = 0L
    s = 0
    while (s < 64) {
      // seg(s) <= cnt(s)*32767 and cnt ~ n/64, so seg(s)*n ~ 2^9*n^2
      // overflows Long past n ~ 2^27 samples (~50 min at 44.1 kHz) —
      // a real clip length. Compare the products in 128 bits
      // (multiplyHigh + unsigned-low tiebreak); both sides are
      // non-negative so the signed-hi compare is exact.
      val hi1 = Math.multiplyHigh(seg(s), n.toLong)
      val lo1 = seg(s) * n.toLong
      val hi2 = Math.multiplyHigh(total, cnt(s))
      val lo2 = total * cnt(s)
      val gt = hi1 > hi2 ||
        (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
      if (gt) bits |= (1L << s)
      s += 1
    }
    bits
  }

  /** Deterministic synthetic WAV for planted-pair harnesses: 8 kHz
    * PCM16 mono, 64 aligned time segments of amplitude 2 000 or 18 000
    * from doc-seeded avalanche bits (alternating-sign square wave, so
    * |amplitude| is exactly the segment level at ANY sample rate).
    * Segment-aligned constancy makes [[envelopeHash64]] EXACTLY
    * invariant under the integer-factor resample twin
    * ([[resampleWav]]), while independent seeds give unrelated clips
    * ~32/64 expected Hamming distance.
    */
  def syntheticWav(docId: Long, samplesPerSeg: Int = 50): Array[Byte] = {
    val n = 64 * samplesPerSeg
    val pcm = new Array[Short](n)
    var s = 0
    while (s < 64) {
      var z = docId * 0x9E3779B97F4A7C15L + (s + 1) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      val amp: Short = if (((z ^ (z >>> 31)) & 1L) == 0L) 2000 else 18000
      var k = 0
      while (k < samplesPerSeg) {
        val i = s * samplesPerSeg + k
        pcm(i) = if (i % 2 == 0) amp else (-amp).toShort
        k += 1
      }
      s += 1
    }
    encodeWav(pcm, 8000)
  }

  /** Integer-factor decimation resample (every `factor`-th sample, rate
    * divided accordingly) — the deterministic audio transform behind
    * the planted twin gate; returns null when the payload is not
    * decodable PCM16.
    */
  def resampleWav(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, "factor must be >= 1")
    parsePcm16(bytes) match {
      case None => null
      case Some((_, rate, samples)) =>
        val out = Array.tabulate(samples.length / factor)(i => samples(i * factor))
        encodeWav(out, rate / factor)
    }
  }

  private def encodeWav(pcm: Array[Short], rate: Int): Array[Byte] = {
    val dataLen = pcm.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    pcm.foreach(buf.putShort)
    buf.array()
  }

  /** STUB resize: deterministic target-box scaling metadata (a real
    * implementation would transform pixels; the fit math is real).
    */
  def resizeStub(meta: DataFrame, maxW: Int, maxH: Int): DataFrame =
    meta.withColumn("scale",
        least(lit(maxW) / greatest(col("width"), lit(1)),
          lit(maxH) / greatest(col("height"), lit(1)), lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))

  val videoMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("container", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true)))

  /** REAL video container metadata decode ([[VideoHeader]]): MP4
    * ISO-BMFF box walk and AVI RIFF header walk, pure JVM bytes — the
    * dimensions/duration/track-count a curation pipeline filters on
    * (drop sub-360p, cap duration, require a video track). Frame PIXEL
    * decode stays on the fake path ([[frameSamples]]) — no JVM-bundled
    * video codec exists. Same shape as [[decodeImage]]: one
    * `mapPartitions` InternalRow pass, only scalar outputs move,
    * unparseable payloads yield NULL columns, never a task failure.
    */
  def decodeVideoMeta(df: DataFrame, idCol: String = "doc_id",
                      payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = input.queryExecution.toRdd.mapPartitions { it =>
      it.map { ir =>
        val id = ir.getLong(0)
        val bytes = if (ir.isNullAt(1)) null else ir.getBinary(1)
        VideoHeader.parse(bytes) match {
          case Some((c, w, h, ms, tr)) =>
            Row(id, c, Int.box(w), Int.box(h), Long.box(ms), Int.box(tr))
          case None => Row(id, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, videoMetaSchema)
  }

  val imageExifSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("orientation", IntegerType, nullable = true)))

  /** REAL image EXIF decode ([[ExifHeader]]): container format +
    * dimensions from the header parsers plus the EXIF orientation from
    * the APP1 TIFF IFD — header-only byte walks, no pixel decode. At
    * 100 TB this IS the image-curation fast path: dimensions gate
    * (drop sub-256px) and rotation normalization (orientation ≠ 1
    * means the stored pixels are sideways/flipped — train on them
    * unrotated and augmentation statistics silently skew) both come
    * from the first few hundred bytes of each file, ~1000× less IO and
    * CPU than decoding pixels to learn the same facts. Orientation is
    * NULL for formats without EXIF (PNG/GIF/BMP) and for JPEGs that
    * lack APP1; unparseable payloads yield all-NULL columns, never a
    * task failure.
    */
  def imageExif(df: DataFrame, idCol: String = "doc_id",
                payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = input.queryExecution.toRdd.mapPartitions { it =>
      it.map { ir =>
        val id = ir.getLong(0)
        val bytes = if (ir.isNullAt(1)) null else ir.getBinary(1)
        if (bytes == null) Row(id, null, null, null, null)
        else ImageHeader.parse(bytes) match {
          case Some((fmt, w, h)) =>
            val o = if (fmt == "jpeg") ExifHeader.orientation(bytes) else None
            Row(id, fmt, Int.box(w), Int.box(h), o.map(Int.box).orNull)
          case None => Row(id, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, imageExifSchema)
  }

  /** Uniform frame-sampling TIMESTAMP plan over [[decodeVideoMeta]]
    * output: for each video, the `nFrames` midpoint-uniform seek
    * points ts_i = ((2i+1)·duration) div (2n) ms — the deterministic
    * manifest a decode worker applies (frame PIXEL extraction stays
    * stubbed like [[frameSamples]]; no JVM codec exists here, and the
    * Spark-side shape — schema, narrow explode, exact integer
    * timestamp math — is the real deliverable). Midpoint spacing keeps
    * every seek strictly inside [0, duration) and never lands two
    * samples on the same keyframe bucket for n ≤ duration. Rows with
    * NULL or non-positive duration (non-videos, parse failures) drop.
    * Narrow explode over the metadata table: no shuffle.
    */
  def frameTimestamps(meta: DataFrame, nFrames: Int,
                      idCol: String = "doc_id",
                      durationCol: String = "duration_ms"): DataFrame = {
    require(nFrames >= 1 && nFrames <= 10000, "nFrames in [1, 10000]")
    meta.filter(col(durationCol).isNotNull && col(durationCol) > 0)
      .select(col(idCol), col(durationCol).cast("long").as("_dur"))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .select(col(idCol), col("frame_idx").cast("int").as("frame_idx"),
        expr(s"(2L * frame_idx + 1L) * _dur div ${2L * nFrames}")
          .as("ts_ms"))
  }

  /** STUB frame sampling: one row per sampled "frame" with a content
    * digest of its byte slice — the Spark plumbing (explode shape, per-
    * frame keys) is real; a codec would replace the digest with pixels.
    */
  def frameSamples(df: DataFrame, nFrames: Int, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val len = length(col(textCol))
    val width = greatest(floor(len / nFrames).cast("int"), lit(1))
    df.select(col(idCol), posexplode(transform(
        sequence(lit(0), lit(nFrames - 1)),
        i => md5(col(textCol).substr(lit(1) + i * width, width)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_md5")
      .filter(col("frame_md5").isNotNull)
  }
}
