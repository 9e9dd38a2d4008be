package graft

import graft.config.GraftConfig
import graft.operators.TableRules
import graft.sources.MemorySide

class ConfigSpec extends SparkSpecBase {
  import spark.implicits._

  private val yaml =
    """db1_details:
      |  database_type: parquet
      |  path: /data/side1
      |db2_details:
      |  database_type: parquet
      |  path: /data/side2
      |output_path: ./out
      |target_tables:
      |  - "orders.*"
      |ignore_tables:
      |  - "tmp_.*"
      |ignore_dates: true
      |table_configs:
      |  - table_name: orders
      |    rules:
      |      - rule_type: ignore_column
      |        rule_value: updated_at
      |      - rule_type: ignore_column
      |        rule_value: run_id
      |    query: "SELECT * FROM orders WHERE id > 5"
      |""".stripMargin

  test("YAML config parses with reference field names") {
    val cfg = GraftConfig.parse(yaml)
    assert(cfg.db1Details.path == "/data/side1")
    assert(cfg.outputPath == "./out")
    assert(cfg.targetTables == Seq("orders.*"))
    assert(cfg.ignoreTables == Seq("tmp_.*"))
    assert(cfg.ignoreDates)
    assert(cfg.tableConfigs("orders") ==
      TableRules(Set("updated_at", "run_id"), Some("SELECT * FROM orders WHERE id > 5")))
    val dc = cfg.diffConfig
    assert(dc.tableSelected("ORDERS_2024") && !dc.tableSelected("tmp_x") && !dc.tableSelected("customer"))
  }

  test("minimal config defaults") {
    val cfg = GraftConfig.parse(
      "db1_details: {database_type: parquet, path: /a}\ndb2_details: {database_type: parquet, path: /b}")
    assert(!cfg.ignoreDates && cfg.targetTables.isEmpty && cfg.outputPath == "drift_analysis")
  }

  test("suggestIgnores flags never-overlapping columns only") {
    val a = Seq((1L, "u1", "shared_a"), (2L, "u2", "shared_b")).toDF("id", "run_id", "name")
    val b = Seq((1L, "v9", "shared_a"), (2L, "v8", "shared_b")).toDF("id", "run_id", "name")
    val out = GraftApp.suggestIgnores(spark,
      MemorySide("db1", Map("t" -> a)), MemorySide("db2", Map("t" -> b)),
      GraftConfig.parse(
        "db1_details: {database_type: parquet, path: /a}\ndb2_details: {database_type: parquet, path: /b}"))
    assert(out.length == 1)
    assert(out.head.contains("rule_value: run_id"))
    assert(!out.head.contains("rule_value: id") && !out.head.contains("rule_value: name"))
  }
}
