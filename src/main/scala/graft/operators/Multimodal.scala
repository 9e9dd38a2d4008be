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
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) (id, null, null, null, null, null)
      else {
        val lum = luminanceGrid(img)
        val fmt = ImageHeader.parse(bytes).map(_._1).getOrElse("unknown")
        (id, fmt, img.getWidth, img.getHeight,
          aHash64(lum): java.lang.Long, dHash64(lum): java.lang.Long)
      }
    } catch { case _: java.io.IOException => (id, null, null, null, null, null) }
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

  /** STUB resize: deterministic target-box scaling metadata (a real
    * implementation would transform pixels; the fit math is real).
    */
  def resizeStub(meta: DataFrame, maxW: Int, maxH: Int): DataFrame =
    meta.withColumn("scale",
        least(lit(maxW) / greatest(col("width"), lit(1)),
          lit(maxH) / greatest(col("height"), lit(1)), lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))

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
