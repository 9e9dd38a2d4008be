package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import graft.operators.{DiffConfig, TableRules}
import graft.sources.{JdbcSide, ParquetSide, Side}

import org.apache.spark.sql.SparkSession

/** One side's connection details (reference: lotad/connection.py:53-83).
  * `databaseType` selects the Spark source: `parquet` (a directory of
  * `<table>.parquet`) or `jdbc` (a live database via Spark's JDBC source).
  */
final case class SideDetails(
    databaseType: String,
    path: String = "",
    user: String = "",
    password: String = "",
    schema: String = "") {

  def toSide(spark: SparkSession, id: String): Side = databaseType.toLowerCase match {
    case "parquet" | "duckdb" => ParquetSide(spark, path, id)
    case f @ ("csv" | "json" | "orc") => graft.sources.FormatSide(spark, path, f, id)
    case t @ ("jdbc" | "postgresql" | "sqlite" | "derby") =>
      val props = new java.util.Properties()
      if (user.nonEmpty) props.setProperty("user", user)
      if (password.nonEmpty) props.setProperty("password", password)
      // postgres organizes user tables under a schema (default public);
      // sqlite/derby-style embedded DBs use no schema filter by default
      val effectiveSchema =
        if (schema.isEmpty && t == "postgresql") "public" else schema
      JdbcSide(spark, path, props, effectiveSchema, id)
    case other => throw new IllegalArgumentException(s"unsupported database_type: $other")
  }
}

/** YAML config with the reference's field names (reference:
  * lotad/config.py:166-188), so a lotad config ports by changing only the
  * connection details. Shape:
  *
  * {{{
  * db1_details: {database_type: parquet, path: /data/side1}
  * db2_details: {database_type: parquet, path: /data/side2}
  * output_path: ./drift_out
  * target_tables: ["orders.*"]
  * ignore_tables: ["tmp_.*"]
  * ignore_dates: false
  * table_configs:
  *   - table_name: orders
  *     rules:
  *       - {rule_type: ignore_column, rule_value: updated_at}
  *     query: "SELECT ... FROM orders ..."
  * }}}
  */
final case class GraftConfig(
    db1Details: SideDetails,
    db2Details: SideDetails,
    outputPath: String = "drift_analysis",
    targetTables: Seq[String] = Seq.empty,
    ignoreTables: Seq[String] = Seq.empty,
    ignoreDates: Boolean = false,
    tableConfigs: Map[String, TableRules] = Map.empty) {

  def diffConfig: DiffConfig =
    DiffConfig(targetTables, ignoreTables, ignoreDates, tableConfigs)
}

object GraftConfig {

  def load(path: String): GraftConfig =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  def parse(yaml: String): GraftConfig = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readValue(yaml, classOf[java.util.Map[String, Object]])
    def str(m: java.util.Map[String, Object], k: String, dflt: String = ""): String =
      Option(m.get(k)).map(_.toString).getOrElse(dflt)
    def strList(k: String): Seq[String] = root.get(k) match {
      case l: java.util.List[_] => l.toArray.toSeq.map(_.toString)
      case null => Seq.empty
      case o => Seq(o.toString)
    }
    def side(k: String): SideDetails = root.get(k) match {
      case m: java.util.Map[_, _] =>
        val mm = m.asInstanceOf[java.util.Map[String, Object]]
        SideDetails(str(mm, "database_type", "parquet"), str(mm, "path"),
          str(mm, "user"), str(mm, "password"), str(mm, "schema", "public"))
      case _ => throw new IllegalArgumentException(s"missing $k")
    }
    val tableConfigs: Map[String, TableRules] = root.get("table_configs") match {
      case l: java.util.List[_] =>
        l.toArray.toSeq.map { tc =>
          val m = tc.asInstanceOf[java.util.Map[String, Object]]
          val name = str(m, "table_name")
          val ignores: Set[String] = m.get("rules") match {
            case rl: java.util.List[_] =>
              rl.toArray.toSeq.flatMap { r =>
                val rm = r.asInstanceOf[java.util.Map[String, Object]]
                if (str(rm, "rule_type") == "ignore_column") Some(str(rm, "rule_value"))
                else None
              }.toSet
            case _ => Set.empty
          }
          val query = Option(m.get("query")).map(_.toString).filter(_.nonEmpty)
          name -> TableRules(ignores, query)
        }.toMap
      case _ => Map.empty
    }
    GraftConfig(
      db1Details = side("db1_details"),
      db2Details = side("db2_details"),
      outputPath = str(root, "output_path", "drift_analysis"),
      targetTables = strList("target_tables"),
      ignoreTables = strList("ignore_tables"),
      ignoreDates = root.get("ignore_dates") match {
        case b: java.lang.Boolean => b.booleanValue()
        case s: String => s.toBoolean
        case _ => false
      },
      tableConfigs = tableConfigs)
  }
}
