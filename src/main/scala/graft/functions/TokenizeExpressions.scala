package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass tokenizers.
  *
  * Semantics match `lower(text)` split on `[^a-z0-9]+` with empties
  * removed (the same token definition as [[graft.operators.TextAnalysis
  * .tokens]] and the DuckDB oracle fragment) — but computed in one scan
  * with no per-token interpreted lambda evaluations, which matters when a
  * document has thousands of tokens.
  */
private[graft] object TokenizeUtil {
  /** Ordered token list of the lowercased text. */
  def tokenize(text: String): java.util.ArrayList[UTF8String] = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val out = new java.util.ArrayList[UTF8String](s.length / 6 + 4)
    val sb = new java.lang.StringBuilder(24)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out.add(UTF8String.fromString(sb.toString)); sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
    out
  }
}

/** Sorted distinct token set of a text column, as `array<string>`.
  * Sorted output enables merge-scan set operations downstream
  * (see [[SortedJaccardSim]]).
  */
case class TokenSet(child: Expression) extends NullSafeUnaryKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def computeAny(v: Any): Any = {
    val toks = TokenizeUtil.tokenize(v.asInstanceOf[UTF8String].toString)
    val set = new java.util.TreeSet[UTF8String]()
    val it = toks.iterator()
    while (it.hasNext) set.add(it.next())
    new GenericArrayData(set.toArray)
  }

  override def prettyName: String = "token_set"
  override protected def withNewChildInternal(c: Expression): TokenSet = copy(child = c)
}

object TokenSet {
  def apply(c: Column): Column = ColumnBridge.column(TokenSet(ColumnBridge.expression(c)))
}

/** Sorted distinct word n-gram shingles of a text column. */
case class WordShingles(child: Expression, n: Int) extends NullSafeUnaryKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def computeAny(v: Any): Any = {
    val toks = TokenizeUtil.tokenize(v.asInstanceOf[UTF8String].toString)
    val set = new java.util.TreeSet[UTF8String]()
    if (toks.size() < n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < toks.size()) {
        if (i > 0) sb.append(' ')
        sb.append(toks.get(i).toString)
        i += 1
      }
      set.add(UTF8String.fromString(sb.toString))
    } else {
      var i = 0
      while (i + n <= toks.size()) {
        val sb = new java.lang.StringBuilder(32)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks.get(i + j).toString)
          j += 1
        }
        set.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(set.toArray)
  }

  override def prettyName: String = "word_shingles"
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

object WordShingles {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
}

/** Jaccard similarity of two SORTED DISTINCT string arrays via merge scan:
  * zero allocation per pair, UTF8String binary comparisons (= code-point
  * order). Produces the same value as [[ArrayJaccardSim]] on set inputs.
  * Codegen'd via [[ArrayPairKernel]] — this runs once per candidate pair,
  * the hottest inner loop in the dedup family.
  */
case class SortedJaccardSim(left: Expression, right: Expression) extends ArrayPairKernel {

  override def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
                       b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override def prettyName: String = "sorted_jaccard_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccardSim =
    copy(left = l, right = r)
}

object SortedJaccardSim {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedJaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Containment similarity |A ∩ B| / |A| of two SORTED DISTINCT string
  * arrays (Broder's containment): the asymmetric near-dup measure that
  * catches a document EMBEDDED in a larger one, where Jaccard is diluted
  * by the size difference. Same zero-allocation merge scan as
  * [[SortedJaccardSim]]; empty left side scores 0.
  */
case class SortedContainmentSim(left: Expression, right: Expression) extends ArrayPairKernel {

  override def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
                       b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    inter.toDouble / na.toDouble
  }

  override def prettyName: String = "sorted_containment_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedContainmentSim =
    copy(left = l, right = r)
}

object SortedContainmentSim {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedContainmentSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Ordered token list (with duplicates) — the multiset input for SimHash
  * and shingle construction.
  */
case class TokenArray(child: Expression) extends NullSafeUnaryKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def computeAny(v: Any): Any = {
    val toks = TokenizeUtil.tokenize(v.asInstanceOf[UTF8String].toString)
    new GenericArrayData(toks.toArray)
  }

  override def prettyName: String = "token_array"
  override protected def withNewChildInternal(c: Expression): TokenArray = copy(child = c)
}

object TokenArray {
  def apply(c: Column): Column = ColumnBridge.column(TokenArray(ColumnBridge.expression(c)))
}

/** Content-defined chunking (Gear/FastCDC-style) of a text column into
  * a SORTED DISTINCT `array<long>` of 64-bit chunk content hashes —
  * the shifted-duplicate primitive: boundaries depend only on a rolling
  * hash of the local bytes, so two documents sharing a long region chunk
  * it IDENTICALLY regardless of where the region starts in each
  * (fixed-size windows lose alignment after one inserted byte). The
  * dedup join then runs on chunk-hash equality
  * ([[graft.operators.Dedup.cdcOverlapPairs]]).
  *
  * Parameters: a boundary fires when `avgBits` MIDDLE bits (16..16+avgBits)
  * of the gear hash are zero (expected chunk ≈ minLen + 2^avgBits bytes)
  * and the chunk has at least `minLen` bytes; `maxLen` force-splits runs
  * with no natural boundary. The mask position matters: in
  * h = Σ g(bᵢ)≪k, bit j mixes only the last ~j bytes, so a LOW-bit mask
  * makes the boundary a function of the last couple of bytes — on
  * near-periodic content the condition can be identically false for an
  * entire document and force-splits never re-align (measured: 2/294
  * planted twins shared ZERO chunks). Middle bits give a ~16–21-byte
  * effective window — the content-defined property this operator exists
  * for. Operates on UTF-8 bytes; hashes are FNV-1a 64.
  */
case class CdcChunkHashes(child: Expression, avgBits: Int, minLen: Int,
                          maxLen: Int) extends NullSafeUnaryKernel {
  require(avgBits >= 1 && avgBits <= 20, "avgBits in [1, 20]")
  require(minLen >= 1 && maxLen > minLen, "need 1 <= minLen < maxLen")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val mask: Long = ((1L << avgBits) - 1) << 16

  override def computeAny(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val out = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + CdcChunkHashes.Gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if (((h & mask) == 0L && len >= minLen) || len >= maxLen) {
        out.add(fnv64(bytes, start, i + 1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) out.add(fnv64(bytes, start, bytes.length))
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next().longValue; k += 1 }
    new GenericArrayData(arr)
  }

  private def fnv64(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) { h = (h ^ (b(i) & 0xFFL)) * 0x100000001B3L; i += 1 }
    h
  }

  override def prettyName: String = "cdc_chunk_hashes"
  override protected def withNewChildInternal(c: Expression): CdcChunkHashes =
    copy(child = c)
}

object CdcChunkHashes {
  /** 256-entry gear table from a splitmix64 avalanche of the byte value
    * — fixed constants, so chunk boundaries are reproducible everywhere.
    */
  private[functions] val Gear: Array[Long] = Array.tabulate(256) { b =>
    var z = (b + 1).toLong * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def apply(c: Column, avgBits: Int = 5, minLen: Int = 16,
            maxLen: Int = 64): Column =
    ColumnBridge.column(CdcChunkHashes(ColumnBridge.expression(c),
      avgBits, minLen, maxLen))
}
