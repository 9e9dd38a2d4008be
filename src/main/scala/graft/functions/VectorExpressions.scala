package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native kernels for hot pairwise array math.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`,
  * `array_intersect`) evaluate interpreted per element, which costs
  * milliseconds per pair on 64-dim vectors — these expressions do the same
  * arithmetic in one tight JVM loop per row (microseconds), preserving the
  * exact left-to-right IEEE operation order so results stay bit-identical
  * to both the HOF formulation and DuckDB's `list_dot_product` fold.
  *
  * Each kernel implements `doGenCode` (not `CodegenFallback`): the
  * generated code hands the two ArrayData values straight to the compiled
  * `compute` method — one virtual call per row, no InternalRow
  * materialization, no boxing, and the surrounding join/filter stage stays
  * inside whole-stage codegen. (CodegenFallback would force the stage to
  * build a row and re-evaluate the child subtree interpreted per row —
  * measured ~3.5 us/pair of pure overhead on the Jaccard verification
  * path.)
  */
trait ArrayPairKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Tight-loop kernel; called from interpreted eval AND generated code. */
  def compute(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("kernel", this, classOf[ArrayPairKernel].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }
}

case class CosineSim(left: Expression, right: Expression) extends ArrayPairKernel {

  private def toDoubles(v: ArrayData, side: Expression): Array[Double] = {
    val n = v.numElements()
    val out = new Array[Double](n)
    val et = side.dataType.asInstanceOf[ArrayType].elementType
    var i = 0
    et match {
      case DoubleType => while (i < n) { out(i) = v.getDouble(i); i += 1 }
      case FloatType => while (i < n) { out(i) = v.getFloat(i).toDouble; i += 1 }
      case _ => throw new IllegalArgumentException(s"cosine over $et")
    }
    out
  }

  override def compute(l: ArrayData, r: ArrayData): Double = {
    val a = toDoubles(l, left)
    val b = toDoubles(r, right)
    val n = math.min(a.length, b.length)
    // three separate left folds, matching sqrt(dot(a,a))*sqrt(dot(b,b))
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) { dot += a(i) * b(i); i += 1 }
    i = 0
    while (i < a.length) { aa += a(i) * a(i); i += 1 }
    i = 0
    while (i < b.length) { bb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }

  override def prettyName: String = "cosine_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Set Jaccard similarity of two string arrays (duplicates ignored):
  * |A ∩ B| / |A ∪ B| as a double, 0.0 when both sides are empty.
  * Semantics equal `size(array_intersect)/size(array_union)` on
  * pre-distinct arrays and DuckDB's
  * `len(list_intersect)/len(list_distinct(a||b))`.
  */
case class ArrayJaccardSim(left: Expression, right: Expression) extends ArrayPairKernel {

  override def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[String](math.max(a.numElements() * 2, 8))
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i).toString)
      i += 1
    }
    val setB = new java.util.HashSet[String](math.max(b.numElements() * 2, 8))
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) setB.add(b.getUTF8String(i).toString)
      i += 1
    }
    var inter = 0
    val it = setB.iterator()
    while (it.hasNext) if (setA.contains(it.next())) inter += 1
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override def prettyName: String = "array_jaccard_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayJaccardSim =
    copy(left = l, right = r)
}

object ArrayJaccardSim {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayJaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Left-fold dot product of two numeric arrays (float or double elements),
  * widened to double — the native-kernel twin of the `aggregate`/`zip_with`
  * HOF formulation.
  */
case class DotProduct(left: Expression, right: Expression) extends ArrayPairKernel {

  private def get(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case _ => throw new IllegalArgumentException(s"dot over $et")
  }

  override def compute(a: ArrayData, b: ArrayData): Double = {
    val ea = left.dataType.asInstanceOf[ArrayType].elementType
    val eb = right.dataType.asInstanceOf[ArrayType].elementType
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += get(a, i, ea) * get(b, i, eb); i += 1 }
    dot
  }

  override def prettyName: String = "dot_product"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** The `nProbe` centroid indices nearest to the vector by cosine, best
  * first, ties to the lowest index — the IVF coarse-quantizer probe list.
  *
  * The centroid matrix is a CONSTRUCTOR FIELD, not a plan literal: the
  * literal formulation (nCells x dim `lit` leaves, one `array(...)` per
  * centroid) explodes the expression tree, and Janino spends seconds
  * compiling the generated class per query — measured as the dominant
  * cost of the whole IVF path at 16x64. Here the matrix rides along as
  * one reference object, the kernel is a compiled double loop, and the
  * query plan stays flat regardless of nCells x dim.
  */
case class NearestCells(child: org.apache.spark.sql.catalyst.expressions.Expression,
                        centroids: Array[Array[Double]], nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** Matches the plan-literal formulation exactly: cosine as three
    * left folds, sort by (java.lang.Double.compare on -cos, cell index)
    * — NaN cosines (zero vectors) sort last, ties break low-index-first.
    */
  def compute(v: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    et match {
      case DoubleType => while (i < n) { x(i) = v.getDouble(i); i += 1 }
      case FloatType => while (i < n) { x(i) = v.getFloat(i).toDouble; i += 1 }
      case other => throw new IllegalArgumentException(s"nearest_cells over $other")
    }
    var aa = 0.0
    i = 0
    while (i < n) { aa += x(i) * x(i); i += 1 }
    val na = math.sqrt(aa)
    val neg = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      val m = math.min(n, ctr.length)
      var dot = 0.0; var bb = 0.0
      i = 0
      while (i < m) { dot += x(i) * ctr(i); i += 1 }
      i = 0
      while (i < ctr.length) { bb += ctr(i) * ctr(i); i += 1 }
      neg(c) = -(dot / (na * math.sqrt(bb)))
      c += 1
    }
    val idx = Array.range(0, centroids.length)
    val boxed = idx.sortBy(c0 => (neg(c0), c0))(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOfRange(boxed, 0, math.min(nProbe, boxed.length)))
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override def prettyName: String = "nearest_cells"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): NearestCells =
    copy(child = c)
}

object NearestCells {
  def apply(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(vec), centroids, nProbe))
}

/** Random-hyperplane LSH bucket key: bit `b` of the result is set when
  * the vector's dot product with `planes(b)` is >= 0 (Charikar STOC'02
  * sign sketch). Like [[NearestCells]], the plane matrix is a constructor
  * reference object, not nBits x dim plan literals — the literal form's
  * generated code grows with the matrix and Janino compilation dominates
  * (the measured IVF pathology). Dots fold left-to-right in double with
  * exact float promotion, so an engine replaying the same plane values
  * reproduces every bucket bit-exactly.
  */
case class HyperplaneKey64(child: org.apache.spark.sql.catalyst.expressions.Expression,
                           planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes.length <= 64, "at most 64 hyperplane bits per key")

  override def dataType: DataType = LongType

  def compute(v: ArrayData): Long = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    et match {
      case DoubleType => while (i < n) { x(i) = v.getDouble(i); i += 1 }
      case FloatType => while (i < n) { x(i) = v.getFloat(i).toDouble; i += 1 }
      case other => throw new IllegalArgumentException(s"hyperplane_key over $other")
    }
    var key = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val m = math.min(n, p.length)
      var dot = 0.0
      i = 0
      while (i < m) { dot += x(i) * p(i); i += 1 }
      if (dot >= 0) key |= (1L << b)
      b += 1
    }
    key
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneKey", this, classOf[HyperplaneKey64].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override def prettyName: String = "hyperplane_key64"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): HyperplaneKey64 =
    copy(child = c)
}

object HyperplaneKey64 {
  def apply(vec: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(HyperplaneKey64(ColumnBridge.expression(vec), planes))
}

/** Random Fourier features (Rahimi–Recht, NeurIPS'07): feature `j` of the
  * result is cos(w_j · x + b_j). Like [[HyperplaneKey64]], the weight
  * matrix and bias vector are constructor reference objects, not
  * nFeatures × dim plan literals (the measured Janino-blowup pathology).
  * Dots fold left-to-right in double with exact float promotion and the
  * cosine is `java.lang.Math.cos` — the same call Spark's builtin `cos`
  * compiles to — so an engine replaying the same weights reproduces every
  * feature bit-exactly (the [[graft.operators.Similarity.mmdDrift]]
  * oracle contract).
  */
case class RffFeatures(child: org.apache.spark.sql.catalyst.expressions.Expression,
                       weights: Array[Array[Double]], biases: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(weights.length == biases.length, "one bias per feature")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def compute(v: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    et match {
      case DoubleType => while (i < n) { x(i) = v.getDouble(i); i += 1 }
      case FloatType => while (i < n) { x(i) = v.getFloat(i).toDouble; i += 1 }
      case other => throw new IllegalArgumentException(s"rff_features over $other")
    }
    val out = new Array[Double](weights.length)
    var j = 0
    while (j < weights.length) {
      val w = weights(j)
      val m = math.min(n, w.length)
      var dot = 0.0
      i = 0
      while (i < m) { dot += x(i) * w(i); i += 1 }
      out(j) = java.lang.Math.cos(dot + biases(j))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("rffFeatures", this, classOf[RffFeatures].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override def prettyName: String = "rff_features"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): RffFeatures =
    copy(child = c)
}

object RffFeatures {
  def apply(vec: Column, weights: Array[Array[Double]], biases: Array[Double]): Column =
    ColumnBridge.column(RffFeatures(ColumnBridge.expression(vec), weights, biases))
}

/** Affine matrix projection kernel: out_j = (Σ_i (x_i − means_i)·rows_j_i)
  * · scales_j, rounded at 9 dp. One reference-object codegen kernel (the
  * [[RffFeatures]] pattern) instead of k×dim plan literals (the measured
  * Janino-blowup pathology) — the PCA/whitening hot path of
  * [[graft.operators.Similarity.pcaProject]].
  */
case class ProjectVec(child: org.apache.spark.sql.catalyst.expressions.Expression,
                      rows: Array[Array[Double]], means: Array[Double],
                      scales: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(rows.length == scales.length, "one scale per output row")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def compute(v: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    et match {
      case DoubleType => while (i < n) { x(i) = v.getDouble(i); i += 1 }
      case FloatType => while (i < n) { x(i) = v.getFloat(i).toDouble; i += 1 }
      case other => throw new IllegalArgumentException(s"project_vec over $other")
    }
    val out = new Array[Double](rows.length)
    var j = 0
    while (j < rows.length) {
      val w = rows(j)
      val m = math.min(math.min(n, w.length), means.length)
      var dot = 0.0
      i = 0
      while (i < m) { dot += (x(i) - means(i)) * w(i); i += 1 }
      val s = dot * scales(j)
      out(j) =
        if (s.isNaN || s.isInfinite) s
        else BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("projectVec", this, classOf[ProjectVec].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override def prettyName: String = "project_vec"
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): ProjectVec =
    copy(child = c)
}

object ProjectVec {
  def apply(vec: Column, rows: Array[Array[Double]], means: Array[Double],
            scales: Array[Double]): Column =
    ColumnBridge.column(ProjectVec(ColumnBridge.expression(vec), rows, means, scales))
}
