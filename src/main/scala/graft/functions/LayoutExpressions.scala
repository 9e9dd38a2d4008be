package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Layout-key kernels.
  *
  * The Hilbert xy2d construction is an inherently ITERATIVE
  * rotate/reflect loop: expressed as built-in Column operators it either
  * re-embeds each level's expression ~4× into the next (one nested
  * Column: the analysis tree grows 4^bits — bits = 10 hangs the
  * analyzer) or leans on the optimizer not to re-inline a chain of
  * projections (fragile, and still seconds of plan time; measured
  * 3.5 s warm for a 2 000-row query). A 15-line codegen'd loop is the
  * honest shape: one virtual call per row, whole-stage codegen intact.
  * The DuckDB oracle replays the same loop as `bits` unrolled CTE
  * levels — mechanically generated from the same constants.
  */
case class HilbertKey2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_key needs (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** The public xy2d loop (Wikipedia, "Hilbert curve"): quadrant
    * (3·rx) xor ry, reflect with n−1−v and swap when ry = 0. Inputs
    * masked to `bits` bits; result in [0, 4^bits).
    */
  def compute(xIn: Long, yIn: Long): Long = {
    val n1 = (1L << bits) - 1
    var x = xIn & n1
    var y = yIn & n1
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.valueOf(compute(l.asInstanceOf[Long], r.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("kernel", this, classOf[HilbertKey2].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override def prettyName: String = "hilbert_key"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertKey2 =
    copy(left = l, right = r)
}

object HilbertKey2 {
  def apply(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertKey2(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))
}

/** 3-D Hilbert index via Skilling's transpose construction (John
  * Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707,
  * 2004 — the standard public N-dimensional algorithm): per-level
  * invert/exchange against axis 0, Gray encode across axes, then
  * bit-interleave the transposed axes into one index. Same
  * codegen-kernel shape as [[HilbertKey2]] (the unrolled-expression
  * alternative grows the analysis tree ~8^bits here — even worse than
  * the 2-D case that hung the analyzer at bits = 10). Result in
  * [0, 8^bits); `bits` ≤ 20 keeps it inside a non-negative Long.
  */
case class HilbertKey3(first: Expression, second: Expression,
                       third: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(bits >= 1 && bits <= 20, "bits must be in [1, 20]")

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_key3 needs (bigint, bigint, bigint), got " +
          children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  def compute(xIn: Long, yIn: Long, zIn: Long): Long = {
    val n1 = (1L << bits) - 1
    val xs = Array(xIn & n1, yIn & n1, zIn & n1)
    val m = 1L << (bits - 1)
    // inverse undo: invert (axis-0 reflect) or exchange with axis 0
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((xs(i) & q) != 0L) xs(0) ^= p
        else { val t = (xs(0) ^ xs(i)) & p; xs(0) ^= t; xs(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    xs(1) ^= xs(0); xs(2) ^= xs(1)
    var t = 0L
    q = m
    while (q > 1) { if ((xs(2) & q) != 0L) t ^= q - 1; q >>= 1 }
    xs(0) ^= t; xs(1) ^= t; xs(2) ^= t
    // interleave the transpose: MSB-first across axes
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      d = (d << 1) | ((xs(0) >> k) & 1L)
      d = (d << 1) | ((xs(1) >> k) & 1L)
      d = (d << 1) | ((xs(2) >> k) & 1L)
      k -= 1
    }
    d
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    java.lang.Long.valueOf(compute(a.asInstanceOf[Long],
      b.asInstanceOf[Long], c.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("kernel", this, classOf[HilbertKey3].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $self.compute($a, $b, $c);")
  }

  override def prettyName: String = "hilbert_key3"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HilbertKey3 =
    copy(first = f, second = s, third = t)
}

object HilbertKey3 {
  def apply(x: Column, y: Column, z: Column, bits: Int): Column =
    ColumnBridge.column(HilbertKey3(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")),
      ColumnBridge.expression(z.cast("long")), bits))
}
