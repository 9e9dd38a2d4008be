package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built, serialized
  * [[org.apache.spark.util.sketch.BloomFilter]], carried to executors as
  * an expression field (codegen references the deserialized filter as a
  * reference object — the bytes never appear in generated source, so no
  * Janino blowup however large the filter). One `mightContainLong` call
  * per row inside whole-stage codegen.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends NullSafeUnaryKernel {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType

  override def computeAny(v: Any): Any = bloom.mightContainLong(v.asInstanceOf[Long])

  override def prettyName: String = "bloom_might_contain_long"
  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)
}
