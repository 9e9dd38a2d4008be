package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** A "side" of a comparison: a named catalog of tables.
  *
  * Plays the role of an attached database in the reference
  * (reference: lotad/connection.py:115-140) — but instead of funneling
  * foreign databases through one engine's ATTACH, a side is any catalog
  * Spark can read: a directory of Parquet tables, a JDBC database, or an
  * in-memory map (tests). Table discovery + schema introspection are
  * dynamic per run, like the reference's information_schema scans
  * (reference: lotad/connection.py:148-162).
  */
trait Side {
  /** Identifier used in `observed_in` metadata and reports. */
  def id: String
  /** Sorted table names present on this side. */
  def listTables(): Seq[String]
  def table(name: String): DataFrame
  def schema(name: String): StructType = table(name).schema
}

/** A directory holding one `<table>.<format>` file/dir per table, for any
  * Spark batch source format (`parquet`, `orc`, `json`, `csv`, ...).
  * CSV/JSON get header + schema inference so dynamic introspection works
  * like the reference's information_schema scans.
  */
case class FormatSide(spark: SparkSession, dir: String, format: String, id: String)
    extends Side {
  private val ext = s".$format"
  // schema-inferring formats (csv/json) scan the file at load() time; cache
  // the resolved DataFrame per table so repeated table() calls don't re-infer
  private val tableCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  override def listTables(): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(ext))
      .map(_.stripSuffix(ext))
      .sorted
  }
  override def table(name: String): DataFrame =
    tableCache.computeIfAbsent(name, { n =>
      val reader = spark.read.format(format)
      val tuned = format match {
        case "csv" => reader.option("header", "true").option("inferSchema", "true")
        case "json" => reader // schema inferred by the source
        case _ => reader
      }
      tuned.load(s"$dir/$n$ext")
    })
}

/** A directory holding one `<table>.parquet` per table. */
final case class ParquetSide(spark: SparkSession, dir: String, id: String) extends Side {
  private val inner = FormatSide(spark, dir, "parquet", id)
  override def listTables(): Seq[String] = inner.listTables()
  override def table(name: String): DataFrame = inner.table(name)
}

/** In-memory side for tests and programmatic use. */
final case class MemorySide(id: String, tables: Map[String, DataFrame]) extends Side {
  override def listTables(): Seq[String] = tables.keys.toSeq.sorted
  override def table(name: String): DataFrame = tables(name)
}

/** A live JDBC database as a side (Postgres & friends — the reference
  * reaches them via DuckDB scanner extensions; we read them directly).
  * Requires the JDBC driver on the classpath.
  */
final case class JdbcSide(spark: SparkSession, url: String, props: java.util.Properties,
                          schemaName: String, id: String) extends Side {
  override def listTables(): Seq[String] = {
    val q = s"""(SELECT table_name FROM information_schema.tables
                WHERE table_schema = '$schemaName') AS t"""
    spark.read.jdbc(url, q, props).collect().map(_.getString(0)).toSeq.sorted
  }
  override def table(name: String): DataFrame =
    spark.read.jdbc(url, s"$schemaName.$name", props)
}
