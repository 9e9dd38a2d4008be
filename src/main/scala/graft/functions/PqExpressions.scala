package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jegou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", PAMI 2011).
  *
  * A PQ codebook is m independent sub-quantizers: the vector splits
  * into m contiguous sub-vectors and each is replaced by the index of
  * its nearest (L2) centroid among that subspace's ksub centroids —
  * compressing a 64-dim float vector to m bytes (m=4, ksub<=256 →
  * 64x smaller than float32). Search then runs over CODES with
  * asymmetric distance computation (ADC, §IV.A): per query, one
  * m x ksub lookup table of exact query-to-centroid squared distances;
  * per candidate, m table lookups — no decompression, no float vector
  * ever re-materialized.
  *
  * Like [[NearestCells]], the codebook matrix is a CONSTRUCTOR FIELD
  * riding as a single codegen reference object, not m x ksub x subdim
  * plan literals (the measured Janino-compile pathology), and every
  * kernel implements real `doGenCode` so encode/scan stages stay inside
  * whole-stage codegen. All arithmetic folds left-to-right in double
  * with exact float promotion, so distances — and therefore codes and
  * ADC ranks — are reproducible bit-for-bit across layouts and engines.
  */
private[graft] object PqKernel {
  /** Read a float/double array cell as double. */
  def get(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case DoubleType => arr.getDouble(i)
    case FloatType  => arr.getFloat(i).toDouble
    case other      => throw new IllegalArgumentException(s"pq over $other")
  }

  /** Squared L2 between vec[off..off+len) and ctr[0..len), left fold. */
  def sqDist(v: ArrayData, et: DataType, off: Int, ctr: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < ctr.length) {
      val diff = get(v, off + i, et) - ctr(i)
      d += diff * diff
      i += 1
    }
    d
  }
}

/** The m PQ codes of a vector: for each subspace j, the index of the
  * nearest (squared-L2, ties to the lowest index) of `codebooks(j)`'s
  * centroids. Sub-vector j spans the `codebooks(j).head.length`
  * dimensions starting where subspace j-1 ended.
  */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need >= 1 centroid per subspace")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  def compute(v: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val codes = new Array[Int](codebooks.length)
    var off = 0
    var j = 0
    while (j < codebooks.length) {
      val book = codebooks(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val d = PqKernel.sqDist(v, et, off, book(c))
        if (d < bestD) { bestD = d; best = c } // strict: ties keep lowest c
        c += 1
      }
      codes(j) = best
      off += book.head.length
      j += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override def prettyName: String = "pq_codes"
  override protected def withNewChildInternal(c: Expression): PqCodes =
    copy(child = c)
}

object PqCodes {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(vec), codebooks))
}

/** Per-subspace PQ reconstruction error: entry j is the squared L2
  * distance from the vector's subspace-j sub-vector to its NEAREST
  * centroid of `codebooks(j)` — the exact quantization error the
  * [[PqCodes]] assignment incurs (same argmin, same left-fold distance
  * arithmetic, so error and code always agree). The staleness signal a
  * PQ index monitor aggregates: when the data distribution drifts off
  * the codebook, these distances rise before recall visibly degrades.
  */
case class PqSubspaceErrors(child: Expression,
                            codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need >= 1 centroid per subspace")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def compute(v: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val errs = new Array[Double](codebooks.length)
    var off = 0
    var j = 0
    while (j < codebooks.length) {
      val book = codebooks(j)
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val d = PqKernel.sqDist(v, et, off, book(c))
        if (d < bestD) bestD = d
        c += 1
      }
      errs(j) = bestD
      off += book.head.length
      j += 1
    }
    new GenericArrayData(errs)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("pqSubErrs", this, classOf[PqSubspaceErrors].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override def prettyName: String = "pq_subspace_errors"
  override protected def withNewChildInternal(c: Expression): PqSubspaceErrors =
    copy(child = c)
}

object PqSubspaceErrors {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqSubspaceErrors(ColumnBridge.expression(vec), codebooks))
}

/** The ADC lookup table of a QUERY vector, flattened row-major:
  * entry j*ksub + c is the exact squared L2 distance from the query's
  * subspace-j sub-vector to centroid c of `codebooks(j)`. Computed once
  * per query row; every candidate afterwards costs m array reads
  * ([[PqAdcDist]]), which is the whole point of ADC.
  */
case class PqAdcLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need >= 1 centroid per subspace")
  private val ksub = codebooks.map(_.length).max

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def compute(v: ArrayData): ArrayData = {
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val lut = new Array[Double](codebooks.length * ksub)
    var off = 0
    var j = 0
    while (j < codebooks.length) {
      val book = codebooks(j)
      var c = 0
      while (c < book.length) {
        lut(j * ksub + c) = PqKernel.sqDist(v, et, off, book(c))
        c += 1
      }
      off += book.head.length
      j += 1
    }
    new GenericArrayData(lut)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdcLut", this, classOf[PqAdcLut].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override def prettyName: String = "pq_adc_lut"
  override protected def withNewChildInternal(c: Expression): PqAdcLut =
    copy(child = c)
}

object PqAdcLut {
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcLut(ColumnBridge.expression(vec), codebooks))
}

/** ADC distance: sum_j lut[j*ksub + codes[j]] — the approximate squared
  * L2 between the LUT's query and the candidate the codes compress.
  * m additions per pair, left fold, the hot inner loop of a PQ scan.
  */
case class PqAdcDist(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  require(ksub >= 1, "ksub must be >= 1")

  override def dataType: DataType = DoubleType

  def compute(lut: ArrayData, codes: ArrayData): Double = {
    var d = 0.0
    var j = 0
    val m = codes.numElements()
    while (j < m) { d += lut.getDouble(j * ksub + codes.getInt(j)); j += 1 }
    d
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(
      compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdcDist", this, classOf[PqAdcDist].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.compute($l, $r);")
  }

  override def prettyName: String = "pq_adc_dist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDist =
    copy(left = l, right = r)
}

object PqAdcDist {
  def apply(lut: Column, codes: Column, ksub: Int): Column =
    ColumnBridge.column(
      PqAdcDist(ColumnBridge.expression(lut), ColumnBridge.expression(codes), ksub))
}
