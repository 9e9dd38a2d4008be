package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as partition-local batch transforms.
  *
  * The actual media decoding (image/audio/video libraries) is STUBBED with
  * a deterministic fake — this container has no codec libraries — but the
  * Spark-side shape is real: binary columns survive Parquet round-trips,
  * the decode runs via `mapPartitions` so per-partition decoder state
  * (a real pipeline's codec context / model session) is initialized once
  * per task, and output schemas are fixed `StructType`s.
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
