package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-distance kernels for fuzzy matching / entity resolution.
  *
  * Spark ships only `levenshtein` and `soundex`; record-linkage
  * pipelines lean on the richer classics — true Damerau-Levenshtein
  * (transpositions as a first-class edit) and Jaro-Winkler (prefix-
  * boosted token similarity, the standard name-matching score). Both
  * are implemented here as codegen'd Catalyst expressions so they stay
  * inside whole-stage codegen in the fuzzy-join hot path (a blocked
  * candidate-pair verify runs these millions of times per task at
  * crawl scale — a Scala UDF would box every row).
  *
  * Semantics deliberately match DuckDB's `damerau_levenshtein` /
  * `jaro_winkler_similarity` so the oracle is a genuinely independent
  * implementation, verified value-for-value:
  *   - distances computed over UTF-8 BYTES, not code points (calibrated:
  *     DuckDB gives damerau_levenshtein('héllo','hello') = 2 — the
  *     2-byte é counts as one substitution plus one insertion);
  *   - true Damerau (unrestricted transposition: DL('ca','abc') = 2,
  *     where the restricted OSA variant gives 3);
  *   - Jaro-Winkler: either input empty → 0.0, Winkler prefix boost
  *     (p = 0.1, prefix capped at 4) applied only when jaro > 0.7.
  *
  * The byte alphabet makes the true-DL "last occurrence" table a flat
  * 256-slot array — no per-row hash map.
  */
object StringDistanceKernels extends Serializable {

  /** True Damerau-Levenshtein distance over UTF-8 bytes. O(n·m) time
    * and memory; callers guard length (the fuzzy-join path caps
    * candidate strings well below the ~8 KB where the matrix would
    * matter). Public algorithm per Damerau (1964) as formulated with
    * the `da`/`db` last-match bookkeeping (e.g. Wikipedia,
    * "Damerau-Levenshtein distance", "distance with adjacent
    * transpositions").
    */
  def damerau(aStr: UTF8String, bStr: UTF8String): Int = {
    val a = aStr.getBytes
    val b = bStr.getBytes
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val maxDist = n + m
    val da = new Array[Int](256)
    // (n+2) x (m+2) matrix, flattened; row stride m+2
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = maxDist
    var i = 0
    while (i <= n) { d((i + 1) * w) = maxDist; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = maxDist; d(w + j + 1) = j; j += 1 }
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a(i - 1) & 0xff
      j = 1
      while (j <= m) {
        val bj = b(j - 1) & 0xff
        val k = da(bj)
        val l = db
        val cost = if (ai == bj) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(ai) = i
      i += 1
    }
    d((n + 1) * w + m + 1)
  }

  /** Jaro-Winkler similarity over UTF-8 bytes (Winkler 1990, public
    * formulation). Match window = max(|a|,|b|)/2 - 1 (floor, min 0);
    * transpositions counted over matched sequences; prefix boost
    * p = 0.1 over at most 4 leading bytes, applied only when the base
    * Jaro score exceeds 0.7 (DuckDB-calibrated: jw('aXXXXX','aYYYYY')
    * stays at its unboosted 0.4444).
    */
  def jaroWinkler(aStr: UTF8String, bStr: UTF8String): Double = {
    val a = aStr.getBytes
    val b = bStr.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - transpositions / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  private[functions] def checkStrings(l: Expression, r: Expression,
                                      name: String): TypeCheckResult =
    if (l.dataType == StringType && r.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$name needs (string, string), got " +
          s"(${l.dataType.simpleString}, ${r.dataType.simpleString})")
}

/** `damerau_levenshtein(a, b)` — true (unrestricted-transposition)
  * Damerau-Levenshtein edit distance; see [[StringDistanceKernels]].
  * Codegen emits one static-kernel call per row, keeping the fuzzy
  * verify stage inside whole-stage codegen.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    StringDistanceKernels.checkStrings(left, right, prettyName)

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistanceKernels.damerau(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the STATIC FORWARDER class (no MODULE$): scalac emits static
    // damerau/jaroWinkler methods on the plain class name for top-level
    // objects, and Janino resolves those; `Kernels$.MODULE$` does not
    // exist under the name Janino sees (caught live: the ...MODULE$ form
    // failed to compile and silently fell back to interpreted eval)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringDistanceKernels.damerau($a, $b);")

  override def prettyName: String = "damerau_levenshtein"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DamerauLevenshtein = copy(left = l, right = r)
}

object DamerauLevenshtein {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `jaro_winkler(a, b)` — Jaro-Winkler similarity in [0, 1]; see
  * [[StringDistanceKernels]] for the exact (DuckDB-matching) semantics.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    StringDistanceKernels.checkStrings(left, right, prettyName)

  override def nullSafeEval(l: Any, r: Any): Any =
    StringDistanceKernels.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static forwarder, not MODULE$ — see DamerauLevenshtein.doGenCode
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringDistanceKernels.jaroWinkler($a, $b);")

  override def prettyName: String = "jaro_winkler"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinkler = copy(left = l, right = r)
}

object JaroWinkler {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
