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
