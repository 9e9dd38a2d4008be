package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Single-pass sketch expressions over a token/shingle array.
  *
  * Both compute their sketch in one traversal of the row's array — no
  * explode, no per-shingle shuffle — so the only shuffle in a dedup
  * pipeline is the band/bucket exchange that follows. This is the Spark-
  * preferred shape for row-local sketches: a custom Catalyst expression
  * beats exploding `numPerm × numShingles` rows by orders of magnitude at
  * 100 TB.
  */
private[graft] object SketchUtil {
  /** xxh64 of a UTF-8 string with the given seed. */
  def hash(s: String, seed: Long): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes (big-endian) of md5(bytes), as the signed-Long carrier
    * of an unsigned 64-bit value. md5 is the one hash every engine
    * renders identically (hex string, bytes in order), so a sketch built
    * on it is replayable — e.g. DuckDB's
    * `('0x' || substr(md5(s), 1, 16))::UBIGINT` yields these exact bits.
    */
  def md5U64(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  def md5U64(s: String): Long =
    md5U64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The unsigned value of `u` as a Double (correctly rounded), matching
    * a C-family engine's uint64 -> double cast.
    */
  def u64ToDouble(u: Long): Double =
    if (u >= 0) u.toDouble
    else new java.math.BigInteger(java.lang.Long.toUnsignedString(u)).doubleValue()
}

/** MinHash signature of a string array: `sig[p] = min over elements of
  * xxh64(elem, seed=p)`. Null/empty arrays yield Long.MaxValue slots so
  * empty docs never collide with real content.
  */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends NullAbsorbingUnaryKernel {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def computeAny(v: Any): Any = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          var p = 0
          while (p < numPerm) {
            val h = XXH64.hashUTF8String(s, p.toLong)
            if (h < sig(p)) sig(p) = h
            p += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

object MinHashSignature {
  def apply(c: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), numPerm))
}

/** 64-bit SimHash over a string array: per-element hash, signed bit-vote
  * accumulation, sign -> bit (Charikar, STOC'02).
  *
  * The per-token hash defaults to md5-first-8-bytes so the whole sketch
  * is a pure function of a primitive every engine computes identically —
  * the DuckDB oracle replays signatures (and therefore the Hamming pair
  * set) exactly. `algo = "xxh64"` swaps in the ~10x faster
  * non-cryptographic hash for throughput-bound pipelines where
  * cross-engine auditability is not needed; the sketch quality is the
  * same (both are uniform on tokens).
  */
case class SimHash64(child: Expression, algo: String = "md5")
    extends NullAbsorbingUnaryKernel {
  require(algo == "md5" || algo == "xxh64", s"unknown simhash algo $algo")

  override def dataType: DataType = LongType

  override def computeAny(v: Any): Any = {
    val votes = new Array[Int](64)
    val useMd5 = algo == "md5"
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h = if (useMd5) SketchUtil.md5U64(s.getBytes)
                  else XXH64.hashUTF8String(s, 0L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object SimHash64 {
  def apply(c: Column): Column = apply(c, "md5")
  def apply(c: Column, algo: String): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c), algo))
}
