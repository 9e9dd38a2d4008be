package graft.types

import org.apache.spark.sql.types._

/** Canonical, dialect-neutral type rendering + two-tier type equivalence.
  *
  * The reference compares schemas as uppercase type-name strings with a
  * fallback "generic type" lookup that maps dialect-specific names to the
  * least precise common type (reference: lotad/connection.py:184-211,
  * lotad/data/README.md:1-7). We render Spark `DataType`s to DuckDB-style
  * uppercase names so drift reports read the same, and provide the generic
  * mapping as a pure function.
  */
object TypeRender {

  /** DuckDB-style uppercase rendering of a Spark DataType. */
  def render(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "VARCHAR"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP WITH TIME ZONE"
    case TimestampNTZType => "TIMESTAMP"
    case CalendarIntervalType => "INTERVAL"
    case a: ArrayType => s"${render(a.elementType)}[]"
    case m: MapType => s"MAP(${render(m.keyType)}, ${render(m.valueType)})"
    case s: StructType =>
      s.fields.map(f => s""""${f.name}" ${render(f.dataType)}""")
        .mkString("STRUCT(", ", ", ")")
    case other => other.sql.toUpperCase
  }

  /** Least-precise generic type for cross-dialect equivalence. Accepts
    * any uppercase rendered type name (ours or another dialect's).
    */
  def genericType(t: String): String = {
    val u = t.toUpperCase.trim
    if (u.startsWith("STRUCT") || u.startsWith("MAP") || u.startsWith("UNION") ||
        u.startsWith("LIST") || u.startsWith("ARRAY") || u.endsWith("[]") || u == "JSON")
      "JSON"
    else if (u.startsWith("DECIMAL") || u.startsWith("NUMERIC") ||
             u == "FLOAT" || u == "REAL" || u == "DOUBLE" || u == "DOUBLE PRECISION" ||
             u == "MONEY")
      "DOUBLE"
    else if (u.endsWith("INT") || u.startsWith("INT") || u == "INTEGER" ||
             u == "SERIAL" || u == "BIGSERIAL" || u == "SMALLSERIAL")
      "BIGINT"
    else if (u.startsWith("TIMESTAMP") || u == "DATETIME" || u.startsWith("TIME"))
      if (u.startsWith("TIME ") || u == "TIME") "TIME" else "TIMESTAMP"
    else if (u == "DATE") "DATE"
    else if (u == "BOOLEAN" || u == "BOOL" || u == "BIT") "BOOLEAN"
    else if (u == "BLOB" || u == "BYTEA" || u == "BINARY" || u == "VARBINARY") "BLOB"
    else if (u.startsWith("VARCHAR") || u.startsWith("CHAR") || u == "TEXT" ||
             u == "STRING" || u == "UUID" || u == "ENUM" || u.startsWith("ENUM") ||
             u == "XML" || u == "INET" || u == "CIDR" || u == "MACADDR")
      "VARCHAR"
    else u
  }

  /** Two-tier equivalence: exact rendered match, else generic match
    * (reference: lotad/connection.py:184-211).
    */
  def equivalent(t1: String, t2: String): Boolean =
    t1 == t2 || genericType(t1) == genericType(t2)

  def isNested(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => true
    case _ => false
  }

  def isDateLike(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
}
