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

/** 64-bit SimHash over a string array: per-element xxh64, signed bit-vote
  * accumulation, sign -> bit (Charikar, STOC'02).
  */
case class SimHash64(child: Expression) extends NullAbsorbingUnaryKernel {

  override def dataType: DataType = LongType

  override def computeAny(v: Any): Any = {
    val votes = new Array[Int](64)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val h = XXH64.hashUTF8String(arr.getUTF8String(i), 0L)
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
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}
