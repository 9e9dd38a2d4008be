package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._

/** Codegen plumbing for single-input native kernels (tokenizers,
  * sketches): the generated code hands the child value straight to the
  * compiled `computeAny` — one virtual call per row, no CodegenFallback
  * InternalRow materialization, and the surrounding scan/projection
  * stage stays inside whole-stage codegen.
  */

/** Null-propagating variant: null in, null out (standard SQL function
  * semantics — pairs with `nullSafeEval`).
  */
trait NullSafeUnaryKernel extends UnaryExpression {
  /** Kernel; never receives null. */
  def computeAny(v: Any): Any

  override def nullSafeEval(v: Any): Any = computeAny(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("kernel", this, classOf[NullSafeUnaryKernel].getName)
    val bt = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($bt) $self.computeAny($v);")
  }
}

/** Null-absorbing variant: the kernel decides what a null input means
  * (e.g. an empty document still has a well-defined sketch), so the
  * output is never null.
  */
trait NullAbsorbingUnaryKernel extends UnaryExpression {
  /** Kernel; receives null when the child evaluates to null. */
  def computeAny(v: Any): Any

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = computeAny(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("kernel", this, classOf[NullAbsorbingUnaryKernel].getName)
    val childGen = child.genCode(ctx)
    val bt = CodeGenerator.boxedType(dataType)
    val jt = CodeGenerator.javaType(dataType)
    val code =
      code"""
         |${childGen.code}
         |$jt ${ev.value} = ($bt) $self.computeAny(
         |  ${childGen.isNull} ? null : (Object) ${childGen.value});
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }
}
