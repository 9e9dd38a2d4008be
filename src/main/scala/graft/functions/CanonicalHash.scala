package graft.functions

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeType

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Canonical, order-insensitive, type-insensitive row hash.
  *
  * Semantics follow the reference engine's `get_row_hash`
  * (reference: lotad/utils.py:19-77):
  *
  *  - objects/structs/maps: keys sorted (code-point order), values hashed
  *    recursively, then xxh64 of the compact JSON `{"k":"<hash>",...}`;
  *  - arrays: element hashes sorted, then xxh64 of the compact JSON list
  *    — array ORDER does not affect the hash;
  *  - strings beginning with `{`, `[` or the URL-encoded `%7B` are parsed
  *    as JSON and hashed structurally (reference: lotad/utils.py:9-16,52-55);
  *  - every other scalar collapses to its Python `str()` rendering, so
  *    `1`, `"1"` and `1.0`-vs-`"1.0"` compare type-insensitively
  *    (reference: lotad/utils.py:76-77).
  *
  * Unlike the reference (a per-row Python UDF behind a DuckDB FFI), this is
  * a JVM Catalyst expression evaluated inline in the task: no FFI, no
  * driver round-trip, and it consumes Spark's InternalRow directly — no
  * `to_json` round-trip is needed for typed columns.
  */
object CanonicalHash {

  private val mapper = new ObjectMapper()

  private val HEX = "0123456789abcdef".toCharArray

  /** xxh64 (seed 0) hexdigest, matching `xxhash.xxh64(..).hexdigest()`. */
  def xxh64Hex(bytes: Array[Byte]): String = {
    val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 0L)
    val out = new Array[Char](16)
    var i = 0
    while (i < 16) {
      out(i) = HEX(((h >>> ((15 - i) * 4)) & 0xf).toInt)
      i += 1
    }
    new String(out)
  }

  /** Append `s` as a JSON string literal (orjson-compatible escaping:
    * minimal ASCII escapes, raw UTF-8 for non-ASCII).
    */
  private def appendJsonString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case c if c < ' ' =>
          sb.append("\\u00")
          sb.append(HEX((c >> 4) & 0xf))
          sb.append(HEX(c & 0xf))
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Hash a canonicalized object: sorted (key -> canonical-value-string)
    * pairs serialized as compact JSON, then xxh64.
    */
  private def hashObject(sorted: Seq[(String, String)]): String = {
    val sb = new StringBuilder
    sb.append('{')
    var first = true
    sorted.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      appendJsonString(sb, k)
      sb.append(':')
      appendJsonString(sb, v)
    }
    sb.append('}')
    xxh64Hex(sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Hash a canonicalized list: element canonical strings SORTED then
    * serialized as a compact JSON list, then xxh64. Sorting makes array
    * order irrelevant (reference: lotad/utils.py:66-74).
    */
  private def hashList(elems: Array[String]): String = {
    java.util.Arrays.sort(elems, PyFormat.cpOrdering)
    val sb = new StringBuilder
    sb.append('[')
    var i = 0
    while (i < elems.length) {
      if (i > 0) sb.append(',')
      appendJsonString(sb, elems(i))
      i += 1
    }
    sb.append(']')
    xxh64Hex(sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  private def looksLikeJson(s: String): Boolean =
    s.startsWith("{") || s.startsWith("[") || s.startsWith("%7B")

  /** Canonical string for a plain string value: parse-and-recurse when it
    * looks like (possibly URL-encoded) JSON, else the string itself.
    */
  def canonicalString(s: String): String = {
    if (!looksLikeJson(s)) return s
    val candidate = if (s.startsWith("%7B")) PyFormat.urlUnquote(s) else s
    try canonicalJson(mapper.readTree(candidate))
    catch { case _: Exception => s }
  }

  /** Canonical string of a parsed JSON node. */
  def canonicalJson(node: JsonNode): String = node.getNodeType match {
    case JsonNodeType.OBJECT =>
      val keys = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = node.fieldNames()
      while (it.hasNext) keys += it.next()
      val sorted = keys.sortWith(PyFormat.cpCompare(_, _) < 0)
      hashObject(sorted.map(k => k -> canonicalJson(node.get(k))).toSeq)
    case JsonNodeType.ARRAY =>
      val out = new Array[String](node.size())
      var i = 0
      while (i < out.length) { out(i) = canonicalJson(node.get(i)); i += 1 }
      hashList(out)
    case JsonNodeType.STRING  => canonicalString(node.textValue())
    case JsonNodeType.BOOLEAN => if (node.booleanValue()) "True" else "False"
    case JsonNodeType.NULL    => "None"
    case JsonNodeType.NUMBER =>
      if (node.isIntegralNumber) node.bigIntegerValue().toString
      else PyFormat.pyDouble(node.doubleValue())
    case _ => node.asText()
  }

  private def tsString(micros: Long): String = {
    val inst = java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    val ldt = java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    val us = ldt.getNano / 1000
    if (us == 0) base else f"$base.$us%06d"
  }

  private def dateString(days: Int): String =
    java.time.LocalDate.ofEpochDay(days.toLong).toString

  /** Canonical string of a Spark internal value of the given type. */
  def canonicalSpark(value: Any, dt: DataType): String = {
    if (value == null) return "None"
    dt match {
      case StringType => canonicalString(value.asInstanceOf[UTF8String].toString)
      case BooleanType => if (value.asInstanceOf[Boolean]) "True" else "False"
      case ByteType | ShortType | IntegerType | LongType => value.toString
      case FloatType => PyFormat.pyDouble(value.asInstanceOf[Float].toDouble)
      case DoubleType => PyFormat.pyDouble(value.asInstanceOf[Double])
      case _: DecimalType => PyFormat.pyDouble(value.asInstanceOf[Decimal].toDouble)
      case DateType => dateString(value.asInstanceOf[Int])
      case TimestampType | TimestampNTZType => tsString(value.asInstanceOf[Long])
      case BinaryType =>
        java.util.Base64.getEncoder.encodeToString(value.asInstanceOf[Array[Byte]])
      case st: StructType =>
        val row = value.asInstanceOf[InternalRow]
        val pairs = st.fields.zipWithIndex.map { case (f, i) =>
          f.name -> canonicalSpark(row.get(i, f.dataType), f.dataType)
        }
        hashObject(pairs.sortWith((a, b) => PyFormat.cpCompare(a._1, b._1) < 0).toSeq)
      case at: ArrayType =>
        val arr = value.asInstanceOf[ArrayData]
        val out = new Array[String](arr.numElements())
        var i = 0
        while (i < out.length) {
          out(i) = canonicalSpark(arr.get(i, at.elementType), at.elementType)
          i += 1
        }
        hashList(out)
      case mt: MapType =>
        val m = value.asInstanceOf[MapData]
        val ks = m.keyArray()
        val vs = m.valueArray()
        val pairs = (0 until m.numElements()).map { i =>
          canonicalSpark(ks.get(i, mt.keyType), mt.keyType) ->
            canonicalSpark(vs.get(i, mt.valueType), mt.valueType)
        }
        hashObject(pairs.sortWith((a, b) => PyFormat.cpCompare(a._1, b._1) < 0))
      case _ => value.toString
    }
  }
}

/** `get_row_hash` as a Catalyst expression. Input may be any type; a
  * struct input yields the row hash the reference produces for
  * `get_row_hash(to_json(row))`. CodegenFallback keeps the surrounding
  * plan in whole-stage codegen with only this expression interpreted.
  */
case class CanonicalRowHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    UTF8String.fromString(CanonicalHash.canonicalSpark(v, child.dataType))
  }

  override def prettyName: String = "get_row_hash"

  override protected def withNewChildInternal(newChild: Expression): CanonicalRowHash =
    copy(child = newChild)
}

object CanonicalRowHash {
  /** Column API: `canonical_hash(struct(cols...))`. */
  def apply(c: Column): Column = ColumnBridge.column(
    CanonicalRowHash(ColumnBridge.expression(c)))

  /** Register as SQL function `get_row_hash` (reference: lotad/connection.py:133). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "get_row_hash", exprs => CanonicalRowHash(exprs.head), "scala_udf")
}
