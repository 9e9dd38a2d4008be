package graft.functions

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeType

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
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
  def xxh64Hex(bytes: Array[Byte]): String = xxh64Hex(bytes, bytes.length)

  def xxh64Hex(bytes: Array[Byte], len: Int): String = {
    val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, len, 0L)
    val out = new Array[Char](16)
    var i = 0
    while (i < 16) {
      out(i) = HEX(((h >>> ((15 - i) * 4)) & 0xf).toInt)
      i += 1
    }
    new String(out)
  }

  /** Growable byte buffer for zero-Formatter, single-copy JSON assembly. */
  private final class ByteBuf(init: Int) {
    var arr = new Array[Byte](init)
    var len = 0
    def reset(): Unit = len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length)
        arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, len + n))
    def add(b: Int): Unit = { ensure(1); arr(len) = b.toByte; len += 1 }
    def addBytes(src: Array[Byte]): Unit = {
      ensure(src.length); System.arraycopy(src, 0, arr, len, src.length); len += src.length
    }
    /** Append `s` with orjson-compatible JSON string escaping, UTF-8 encoded. */
    def addEscaped(s: String): Unit = {
      ensure(s.length + 8)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < 0x80) {
          if (c == '"') { add('\\'); add('"') }
          else if (c == '\\') { add('\\'); add('\\') }
          else if (c >= ' ') add(c)
          else c match {
            case '\b' => add('\\'); add('b')
            case '\t' => add('\\'); add('t')
            case '\n' => add('\\'); add('n')
            case '\f' => add('\\'); add('f')
            case '\r' => add('\\'); add('r')
            case _ =>
              add('\\'); add('u'); add('0'); add('0')
              add(HEX((c >> 4) & 0xf)); add(HEX(c & 0xf))
          }
          i += 1
        } else {
          val cp = s.codePointAt(i)
          if (cp < 0x800) {
            add(0xc0 | (cp >> 6)); add(0x80 | (cp & 0x3f))
          } else if (cp < 0x10000) {
            add(0xe0 | (cp >> 12))
            add(0x80 | ((cp >> 6) & 0x3f))
            add(0x80 | (cp & 0x3f))
          } else {
            add(0xf0 | (cp >> 18))
            add(0x80 | ((cp >> 12) & 0x3f))
            add(0x80 | ((cp >> 6) & 0x3f))
            add(0x80 | (cp & 0x3f))
          }
          i += Character.charCount(cp)
        }
      }
    }
  }

  /** Direct byte writer for a field value inside the row-JSON assembly:
    * scalars emit their canonical bytes with no intermediate String where
    * practical; nested/JSON-ish values fall back to the generic canon.
    */
  private type CanonW = (Any, ByteBuf) => Unit

  private def addAscii(buf: ByteBuf, s: String): Unit = {
    var i = 0
    while (i < s.length) { buf.add(s.charAt(i)); i += 1 }
  }

  private def addPad(buf: ByteBuf, v: Int, width: Int): Unit = {
    var div = 1
    var i = 1
    while (i < width) { div *= 10; i += 1 }
    if (v >= div * 10) { addAscii(buf, v.toString); return } // wider than field
    while (div > 0) {
      buf.add('0' + (v / div) % 10)
      div /= 10
    }
  }

  /** Python `str(float)` written directly into the buffer: same rendering
    * as [[PyFormat.pyDouble]] (a property spec asserts equality) but with
    * zero allocation beyond the JDK's `Double.toString` — no substring /
    * StringBuilder / re-encode per value, which matters when hashing
    * billions of double fields.
    */
  private[functions] def addPyDouble(buf: ByteBuf, d: Double): Unit = {
    if (java.lang.Double.isNaN(d)) { addAscii(buf, "nan"); return }
    if (d == Double.PositiveInfinity) { addAscii(buf, "inf"); return }
    if (d == Double.NegativeInfinity) { addAscii(buf, "-inf"); return }
    if (d == 0.0) { addAscii(buf, if (1.0 / d < 0) "-0.0" else "0.0"); return }
    if (d < 0) buf.add('-')
    val s = java.lang.Double.toString(math.abs(d))
    val eIdx = s.indexOf('E')
    // significant-digit range [dStart, dEnd) within s (may contain one
    // '.', skipped on emission) and the decimal exponent of the leading digit
    var dStart = 0
    var dEnd = 0
    var fde = 0
    if (eIdx >= 0) {
      fde = java.lang.Integer.parseInt(s, eIdx + 1, s.length, 10)
      dEnd = eIdx
    } else {
      val dot = s.indexOf('.')
      if (s.charAt(0) != '0') { dEnd = s.length; fde = dot - 1 }
      else {
        var i = dot + 1
        while (i < s.length && s.charAt(i) == '0') i += 1
        dStart = i; dEnd = s.length; fde = -(i - dot)
      }
    }
    // trim trailing zeros of the significant digits (crossing the '.' when
    // everything after it is zero); the leading digit always survives
    var e = dEnd
    var trimming = true
    while (trimming && e > dStart + 1) {
      val c = s.charAt(e - 1)
      if (c == '0' || c == '.') e -= 1 else trimming = false
    }
    var n = 0
    var di = dStart
    while (di < e) { if (s.charAt(di) != '.') n += 1; di += 1 }
    // emit `cnt` digits starting at `from`, skipping '.', return next pos
    def emitDigits(from: Int, cnt: Int): Int = {
      var i = from
      var c = cnt
      while (c > 0) {
        val ch = s.charAt(i)
        if (ch != '.') { buf.add(ch); c -= 1 }
        i += 1
      }
      i
    }
    if (fde >= 16 || fde < -4) { // scientific d.dddde[+-]XX
      val i = emitDigits(dStart, 1)
      if (n > 1) { buf.add('.'); emitDigits(i, n - 1) }
      buf.add('e')
      if (fde >= 0) buf.add('+') else buf.add('-')
      val ae = math.abs(fde)
      if (ae < 100) addPad(buf, ae, 2) else addAscii(buf, ae.toString)
    } else if (fde >= 0) { // fixed, >= 1
      if (n > fde + 1) {
        val i = emitDigits(dStart, fde + 1)
        buf.add('.')
        emitDigits(i, n - fde - 1)
      } else {
        emitDigits(dStart, n)
        var i = n
        while (i <= fde) { buf.add('0'); i += 1 }
        addAscii(buf, ".0")
      }
    } else { // fixed, < 1: 0.00ddd
      addAscii(buf, "0.")
      var i = -1
      while (i > fde) { buf.add('0'); i -= 1 }
      emitDigits(dStart, n)
    }
  }

  private def writerFor(dt: DataType): CanonW = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      (v, buf) =>
        if (v == null) addAscii(buf, "None")
        else addAscii(buf, v.toString)
    case BooleanType =>
      (v, buf) =>
        if (v == null) addAscii(buf, "None")
        else addAscii(buf, if (v.asInstanceOf[Boolean]) "True" else "False")
    case DoubleType =>
      (v, buf) =>
        if (v == null) addAscii(buf, "None")
        else addPyDouble(buf, v.asInstanceOf[Double])
    case FloatType =>
      (v, buf) =>
        if (v == null) addAscii(buf, "None")
        else addPyDouble(buf, v.asInstanceOf[Float].toDouble)
    case TimestampType | TimestampNTZType =>
      (v, buf) =>
        if (v == null) addAscii(buf, "None")
        else {
          val micros = v.asInstanceOf[Long]
          val days = Math.floorDiv(micros, 86400000000L)
          val rem = Math.floorMod(micros, 86400000000L)
          val ld = java.time.LocalDate.ofEpochDay(days)
          val secOfDay = (rem / 1000000L).toInt
          val us = (rem % 1000000L).toInt
          addPad(buf, ld.getYear, 4); buf.add('-')
          addPad(buf, ld.getMonthValue, 2); buf.add('-')
          addPad(buf, ld.getDayOfMonth, 2); buf.add(' ')
          addPad(buf, secOfDay / 3600, 2); buf.add(':')
          addPad(buf, (secOfDay / 60) % 60, 2); buf.add(':')
          addPad(buf, secOfDay % 60, 2)
          if (us != 0) { buf.add('.'); addPad(buf, us, 6) }
        }
    case StringType =>
      (v, buf) =>
        if (v == null) addAscii(buf, "None")
        else {
          val u = v.asInstanceOf[UTF8String]
          val n = u.numBytes()
          val b0 = if (n > 0) u.getByte(0) else 0
          if (b0 == '{' || b0 == '[' || b0 == '%')
            buf.addEscaped(canonicalString(u.toString)) // may parse as JSON
          else {
            // fast path: escape-scan the raw UTF-8 bytes (multi-byte
            // sequences have the high bit set and pass through untouched)
            var i = 0
            while (i < n) {
              val b = u.getByte(i)
              if (b < 0 || (b >= 0x20 && b != '"' && b != '\\')) buf.add(b)
              else if (b == '"') { buf.add('\\'); buf.add('"') }
              else if (b == '\\') { buf.add('\\'); buf.add('\\') }
              else b match {
                case 0x08 => buf.add('\\'); buf.add('b')
                case 0x09 => buf.add('\\'); buf.add('t')
                case 0x0a => buf.add('\\'); buf.add('n')
                case 0x0c => buf.add('\\'); buf.add('f')
                case 0x0d => buf.add('\\'); buf.add('r')
                case _ =>
                  buf.add('\\'); buf.add('u'); buf.add('0'); buf.add('0')
                  buf.add(HEX((b >> 4) & 0xf)); buf.add(HEX(b & 0xf))
              }
              i += 1
            }
          }
        }
    case other =>
      val c = compile(other)
      (v, buf) => buf.addEscaped(c(v))
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

  private def pad(sb: java.lang.StringBuilder, v: Int, width: Int): Unit = {
    var div = 1
    var i = 1
    while (i < width) { div *= 10; i += 1 }
    while (div > 1 && v < div) { sb.append('0'); div /= 10 }
    if (v > 0 || div == 1) sb.append(v)
  }

  private def tsString(micros: Long): String = {
    val days = Math.floorDiv(micros, 86400000000L)
    val rem = Math.floorMod(micros, 86400000000L)
    val ld = java.time.LocalDate.ofEpochDay(days)
    val secOfDay = (rem / 1000000L).toInt
    val us = (rem % 1000000L).toInt
    val sb = new java.lang.StringBuilder(26)
    pad(sb, ld.getYear, 4); sb.append('-')
    pad(sb, ld.getMonthValue, 2); sb.append('-')
    pad(sb, ld.getDayOfMonth, 2); sb.append(' ')
    pad(sb, secOfDay / 3600, 2); sb.append(':')
    pad(sb, (secOfDay / 60) % 60, 2); sb.append(':')
    pad(sb, secOfDay % 60, 2)
    if (us != 0) { sb.append('.'); pad(sb, us, 6) }
    sb.toString
  }

  private def dateString(days: Int): String =
    java.time.LocalDate.ofEpochDay(days.toLong).toString

  /** Canonical string of a Spark internal value of the given type
    * (convenience wrapper; hot paths use [[compile]]).
    */
  def canonicalSpark(value: Any, dt: DataType): String = compile(dt)(value)

  type Canon = Any => String

  /** Compile a per-DataType canonicalizer once, so the per-row hot path is
    * free of type dispatch: struct field order is pre-sorted, field-name
    * JSON fragments are pre-escaped, and scalar paths are direct closures.
    */
  def compile(dt: DataType): Canon = {
    val c = compileNonNull(dt)
    v => if (v == null) "None" else c(v)
  }

  private def compileNonNull(dt: DataType): Canon = dt match {
    case StringType => v => canonicalString(v.asInstanceOf[UTF8String].toString)
    case BooleanType => v => if (v.asInstanceOf[Boolean]) "True" else "False"
    case ByteType | ShortType | IntegerType | LongType => v => v.toString
    case FloatType => v => PyFormat.pyDouble(v.asInstanceOf[Float].toDouble)
    case DoubleType => v => PyFormat.pyDouble(v.asInstanceOf[Double])
    case _: DecimalType => v => PyFormat.pyDouble(v.asInstanceOf[Decimal].toDouble)
    case DateType => v => dateString(v.asInstanceOf[Int])
    case TimestampType | TimestampNTZType => v => tsString(v.asInstanceOf[Long])
    case BinaryType =>
      v => java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]])
    case st: StructType =>
      // pre-sort fields; pre-render `,"name":"` fragments as UTF-8 bytes;
      // assemble the row JSON in a reused thread-local byte buffer — no
      // StringBuilder, no String, no second UTF-8 encode per row. Scalar
      // field values write their bytes directly (see writerFor).
      val fields = st.fields.zipWithIndex
        .map { case (f, i) => (f.name, i, writerFor(f.dataType), f.dataType) }
        .sortWith((a, b) => PyFormat.cpCompare(a._1, b._1) < 0)
      val keyFrags = fields.zipWithIndex.map { case ((name, _, _, _), i) =>
        val sb = new StringBuilder
        if (i > 0) sb.append(',')
        appendJsonString(sb, name)
        sb.append(':').append('"')
        sb.toString.getBytes(StandardCharsets.UTF_8)
      }
      val local = ThreadLocal.withInitial[ByteBuf](() => new ByteBuf(256))
      v => {
        val row = v.asInstanceOf[InternalRow]
        val buf = local.get()
        buf.reset()
        buf.add('{')
        var i = 0
        while (i < fields.length) {
          buf.addBytes(keyFrags(i))
          val (_, ord, writer, fdt) = fields(i)
          writer(row.get(ord, fdt), buf)
          buf.add('"')
          i += 1
        }
        buf.add('}')
        xxh64Hex(buf.arr, buf.len)
      }
    case at: ArrayType =>
      val elemCanon = compile(at.elementType)
      val et = at.elementType
      v => {
        val arr = v.asInstanceOf[ArrayData]
        val out = new Array[String](arr.numElements())
        var i = 0
        while (i < out.length) {
          out(i) = elemCanon(arr.get(i, et))
          i += 1
        }
        hashList(out)
      }
    case mt: MapType =>
      val kCanon = compile(mt.keyType)
      val vCanon = compile(mt.valueType)
      v => {
        val m = v.asInstanceOf[MapData]
        val ks = m.keyArray()
        val vs = m.valueArray()
        val pairs = (0 until m.numElements()).map { i =>
          kCanon(ks.get(i, mt.keyType)) -> vCanon(vs.get(i, mt.valueType))
        }
        hashObject(pairs.sortWith((a, b) => PyFormat.cpCompare(a._1, b._1) < 0))
      }
    case _ => v => v.toString
  }
}

/** `get_row_hash` as a Catalyst expression. Input may be any type; a
  * struct input yields the row hash the reference produces for
  * `get_row_hash(to_json(row))`.
  *
  * `doGenCode` (rather than CodegenFallback) keeps the CHILD inside
  * whole-stage codegen too: the struct is materialized by generated code
  * and handed to the compiled canonicalizer in one virtual call per row,
  * instead of CodegenFallback's interpreted re-evaluation of the whole
  * subtree (boxed per-field InternalRow access).
  */
case class CanonicalRowHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  @transient private lazy val canon = CanonicalHash.compile(child.dataType)

  /** Called from both interpreted eval and generated code. */
  def hash(v: Any): UTF8String = UTF8String.fromString(canon(v))

  override def eval(input: InternalRow): Any = hash(child.eval(input))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    // reference the expression itself: serializable, and `canon` is
    // @transient lazy so the thread-local buffers are rebuilt per executor
    val self = ctx.addReferenceObj("rowHash", this, classOf[CanonicalRowHash].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |UTF8String ${ev.value} = $self.hash(${childGen.isNull} ? null : (Object) ${childGen.value});
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
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
