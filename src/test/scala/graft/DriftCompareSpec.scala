package graft

import graft.operators._
import graft.sources.MemorySide
import graft.types.TypeRender
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mirrors the reference's mutation-based test matrix
  * (reference: test/data_drift_test.py, test/db_schema_drift_test.py,
  * test/db_table_drift_test.py): db2 is the source of truth, db1 gets one
  * mutation, and we assert the exact drift artifacts.
  */
class DriftCompareSpec extends SparkSpecBase {
  import spark.implicits._

  private def base(): DataFrame = Seq(
    (1L, "alice", 10.5, """{"k": 1, "j": 2}""", Seq(1, 2, 3)),
    (2L, "bob", 20.0, """{"k": 2, "j": 3}""", Seq(4, 5, 6)),
    (3L, "carol", 30.25, """{"k": 3, "j": 4}""", Seq(7, 8, 9))
  ).toDF("id", "name", "score", "props", "tags")

  private def cmp(db1: DataFrame, db2: DataFrame, config: DiffConfig = DiffConfig()) =
    new DriftCompare(spark, MemorySide("db1", Map("t" -> db1)),
      MemorySide("db2", Map("t" -> db2)), config)

  private def driftCounts(c: DriftCompare): (Long, Long) = {
    val d = c.dataDrift("t").get
    val m = d.groupBy("observed_in").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (m.getOrElse("db1", 0L), m.getOrElse("db2", 0L))
  }

  test("no mutation: no drift of any kind") {
    val c = cmp(base(), base())
    assert(c.schemaDrift("t").isEmpty)
    assert(c.missingTableDrift().isEmpty)
    assert(driftCounts(c) == ((0L, 0L)))
  }

  test("dropped column: schema drift only, no data drift") {
    val c = cmp(base().drop("score"), base())
    val sd = c.schemaDrift("t")
    assert(sd == Seq(SchemaDriftRow("t", "score", "db1", None, "db2", Some("DOUBLE"))))
    assert(driftCounts(c) == ((0L, 0L))) // intersection columns only
  }

  test("retyped column: schema drift row, but NO data drift (type-insensitive hash)") {
    val c = cmp(base().withColumn("id", col("id").cast("string")), base())
    val sd = c.schemaDrift("t")
    assert(sd == Seq(SchemaDriftRow("t", "id", "db1", Some("VARCHAR"), "db2", Some("BIGINT"))))
    assert(driftCounts(c) == ((0L, 0L)))
  }

  test("equivalent types (INTEGER vs BIGINT) produce no schema drift") {
    val c = cmp(base().withColumn("id", col("id").cast("int")), base())
    assert(c.schemaDrift("t").isEmpty)
  }

  test("deleted row: drift only on the surviving side") {
    val c = cmp(base().filter($"id" =!= 2), base())
    assert(driftCounts(c) == ((0L, 1L)))
    val d = c.dataDrift("t").get
    assert(d.select("id").as[Long].collect().toSeq == Seq(2L))
    assert(d.columns.sorted.toSeq ==
      Seq("hashed_row", "id", "name", "observed_in", "props", "score", "tags"))
  }

  test("updated value: both versions appear in drift") {
    val mut = base().withColumn("score", when($"id" === 2, lit(99.9)).otherwise($"score"))
    val c = cmp(mut, base())
    assert(driftCounts(c) == ((1L, 1L)))
  }

  test("JSON key order and array order are NOT drift") {
    val mut = base()
      .withColumn("props", regexp_replace($"props", """\{"k": (\d), "j": (\d)\}""", """{"j": $2, "k": $1}"""))
      .withColumn("tags", reverse($"tags"))
    val c = cmp(mut, base())
    assert(driftCounts(c) == ((0L, 0L)))
  }

  test("ignored column suppresses drift") {
    val mut = base().withColumn("name", concat($"name", lit("_x")))
    val cfg = DiffConfig(tableRules = Map("t" -> TableRules(ignoreColumns = Set("name"))))
    assert(driftCounts(cmp(mut, base(), cfg)) == ((0L, 0L)))
    assert(driftCounts(cmp(mut, base())) == ((3L, 3L)))
  }

  test("ignore_dates suppresses date/timestamp drift and schema presence") {
    val withTs = base().withColumn("updated_at",
      to_timestamp(lit("2024-01-01 00:00:00")))
    val mut = withTs.withColumn("updated_at",
      when($"id" === 1, to_timestamp(lit("2025-06-06 06:06:06"))).otherwise($"updated_at"))
    val cfg = DiffConfig(ignoreDates = true)
    assert(driftCounts(cmp(mut, withTs, cfg)) == ((0L, 0L)))
    assert(driftCounts(cmp(mut, withTs)) == ((1L, 1L)))
  }

  test("missing table drift") {
    val c = new DriftCompare(spark,
      MemorySide("db1", Map("t" -> base(), "extra1" -> base())),
      MemorySide("db2", Map("t" -> base(), "extra2" -> base())))
    assert(c.missingTableDrift() == Seq(
      MissingTableRow("extra1", "db1", "db2"),
      MissingTableRow("extra2", "db2", "db1")))
    assert(c.sharedTables() == Seq("t"))
  }

  test("table include/exclude regex, case-insensitive, anchored") {
    val cfg = DiffConfig(ignoreTables = Seq("EXTRA"))
    val c = new DriftCompare(spark,
      MemorySide("db1", Map("t" -> base(), "extra1" -> base())),
      MemorySide("db2", Map("t" -> base())), cfg)
    assert(c.missingTableDrift().isEmpty)
    val cfg2 = DiffConfig(targetTables = Seq("nope"))
    val c2 = new DriftCompare(spark, MemorySide("db1", Map("t" -> base())),
      MemorySide("db2", Map("t" -> base())), cfg2)
    assert(c2.sharedTables().isEmpty)
  }

  test("custom query replaces the table scan, CTEs allowed") {
    val mut = base().withColumn("score", when($"id" === 2, lit(99.9)).otherwise($"score"))
    val cfg = DiffConfig(tableRules = Map("t" -> TableRules(
      customQuery = Some("WITH x AS (SELECT id, name FROM t) SELECT * FROM x"))))
    val c = cmp(mut, base(), cfg)
    val d = c.dataDrift("t").get
    assert(d.columns.sorted.toSeq == Seq("hashed_row", "id", "name", "observed_in"))
    assert(d.count() == 0) // score excluded by the query -> no drift
  }

  test("custom query shapes: WHERE, JOIN, subquery (reference custom_query_test.py)") {
    // WHERE: restrict both sides to id <= 2; a mutation at id 3 vanishes
    val mut3 = base().withColumn("score", when($"id" === 3, lit(77.7)).otherwise($"score"))
    val whereCfg = DiffConfig(tableRules = Map("t" -> TableRules(
      customQuery = Some("SELECT id, name, score FROM t WHERE id <= 2"))))
    assert(driftCounts(cmp(mut3, base(), whereCfg)) == ((0L, 0L)))
    // but a mutation inside the predicate window IS seen
    val mut2 = base().withColumn("score", when($"id" === 2, lit(77.7)).otherwise($"score"))
    assert(driftCounts(cmp(mut2, base(), whereCfg)) == ((1L, 1L)))

    // JOIN: query joins a second table of the same side
    val dim = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "grp")
    def sides(id: String, t: DataFrame) =
      MemorySide(id, Map("t" -> t, "dim" -> dim))
    val joinCfg = DiffConfig(tableRules = Map("t" -> TableRules(
      customQuery = Some(
        "SELECT t.id, t.name, dim.grp FROM t JOIN dim ON t.id = dim.id"))))
    val cJoin = new DriftCompare(spark, sides("db1", mut2), sides("db2", base()), joinCfg)
    // score excluded by the join projection -> no drift
    assert(cJoin.dataDrift("t").get.count() == 0)

    // subquery: scalar subquery in the projection
    val subCfg = DiffConfig(tableRules = Map("t" -> TableRules(
      customQuery = Some(
        "SELECT id, name, (SELECT max(id) FROM t) AS max_id FROM t"))))
    val cSub = cmp(base().filter($"id" =!= 3), base(), subCfg)
    // max_id differs between sides (2 vs 3), so EVERY row drifts
    val (d1, d2) = driftCounts(cSub)
    assert(d1 == 2L && d2 == 3L)
  }

  test("within-side duplicates collapse (set semantics)") {
    val dup = base().union(base()) // every row twice on db1
    val c = cmp(dup, base())
    assert(driftCounts(c) == ((0L, 0L)))
  }

  test("bag-semantics extension sees multiplicity drift the set diff cannot") {
    val dup = base().union(base().filter($"id" === 2))
    val c = cmp(dup, base())
    assert(driftCounts(c) == ((0L, 0L))) // set view: no drift
    val bag = c.dataDriftBag("t").get.collect()
    assert(bag.length == 1)
    val r = bag(0)
    assert(r.getAs[Long]("id") == 2L &&
      r.getAs[Long]("n_db1") == 2L && r.getAs[Long]("n_db2") == 1L)
  }

  test("dataDriftBagAuto dispatches by width and both paths agree") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    def firstAggWidths(df: org.apache.spark.sql.DataFrame): Seq[Int] =
      df.queryExecution.optimizedPlan.collect {
        case a: Aggregate => a.groupingExpressions.length
      }
    // narrow table (5 cols): plain path, grouping = cols + hash
    val narrow = cmp(base().union(base().filter($"id" === 2)), base())
    val narrowBag = narrow.dataDriftBagAuto("t").get
    assert(firstAggWidths(narrowBag).contains(5 + 1))
    // wide table (15 cols): hashed path — some aggregate groups on the
    // 16-byte hash ALONE, so the big shuffle never carries row values
    def widen(df: org.apache.spark.sql.DataFrame) =
      (1 to 10).foldLeft(df)((d, i) => d.withColumn(s"pad$i", $"id" * i))
    val wide = new DriftCompare(spark,
      MemorySide("db1", Map("t" -> widen(base().union(base().filter($"id" === 2))))),
      MemorySide("db2", Map("t" -> widen(base()))))
    val wideBag = wide.dataDriftBagAuto("t").get
    assert(firstAggWidths(wideBag).contains(1))
    // identical answer on both physical shapes
    val viaPlain = wide.dataDriftBag("t").get.drop("hashed_row")
      .orderBy("id").collect().toSeq
    val viaAuto = wideBag.drop("hashed_row").orderBy("id").collect().toSeq
    assert(viaAuto == viaPlain)
  }

  test("compareAll end-to-end with report") {
    val mut = base().filter($"id" =!= 3).drop("tags")
    val c = new DriftCompare(spark,
      MemorySide("db1", Map("t" -> mut, "only1" -> base())),
      MemorySide("db2", Map("t" -> base())))
    val r = c.compareAll(parallelism = 2)
    assert(r.missingTables.map(_.tableName) == Seq("only1"))
    assert(r.schemaDrift.map(_.columnName) == Seq("tags"))
    assert(r.summary == Seq(DataDriftSummaryRow("t", "db1", 0L, "db2", 1L)))
    val rep = DriftOutput.report(r)
    assert(rep.contains("\"only1\" not found in \"db2\"") && rep.contains("\"tags\"")
      && rep.contains("db2 - 1"))
  }

  test("summaryDf drift counts are LongType (no 2^31 overflow) and survive > Int.MaxValue") {
    import org.apache.spark.sql.types.LongType
    val big = Int.MaxValue.toLong + 7L
    val df = DriftOutput.summaryDf(spark,
      Seq(DataDriftSummaryRow("t", "db1", big, "db2", 0L)))
    assert(df.schema("rows_only_in_db1").dataType == LongType)
    assert(df.schema("rows_only_in_db2").dataType == LongType)
    assert(df.select("rows_only_in_db1").head().getLong(0) == big)
  }
}

class TypeRenderSpec extends org.scalatest.funsuite.AnyFunSuite {
  import org.apache.spark.sql.types._
  test("rendering matches DuckDB-style names") {
    assert(TypeRender.render(LongType) == "BIGINT")
    assert(TypeRender.render(StringType) == "VARCHAR")
    assert(TypeRender.render(ArrayType(FloatType)) == "FLOAT[]")
    assert(TypeRender.render(TimestampNTZType) == "TIMESTAMP")
  }
  test("generic equivalence: least precise common type") {
    assert(TypeRender.equivalent("BIGINT", "INTEGER"))
    assert(TypeRender.equivalent("VARCHAR", "TEXT"))
    assert(TypeRender.equivalent("DOUBLE", "DECIMAL(18,2)"))
    assert(TypeRender.equivalent("STRUCT(\"a\" BIGINT)", "JSON"))
    assert(!TypeRender.equivalent("BIGINT", "VARCHAR"))
    assert(!TypeRender.equivalent("DATE", "TIMESTAMP"))
  }
}

/** Nested columns ride through the diff as JSON text (P1 projection), so
  * structural reordering must not read as drift while value changes must
  * (reference: test/data_drift_test.py:307-437 nested/JSON cases).
  */
class NestedTypesDriftSpec extends SparkSpecBase {
  import graft.sources.MemorySide
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def nested() = Seq(1L, 2L).toDF("id")
    .withColumn("owner", struct(lit("ann").as("name"), lit(30).as("age")))
    .withColumn("jobs", array(
      struct(lit("eng").as("role"), lit(100).as("pay")),
      struct(lit("mgr").as("role"), lit(200).as("pay"))))
    .withColumn("attrs", map(lit("x"), lit(1), lit("y"), lit(2)))

  test("nested struct/array/map columns: no drift for identical values") {
    val c = new DriftCompare(spark,
      MemorySide("db1", Map("t" -> nested())),
      MemorySide("db2", Map("t" -> nested())))
    val d = c.dataDrift("t").get
    assert(d.count() == 0)
  }

  test("map key order is not drift; array-of-struct order IS order-insensitive via hash") {
    val reordered = Seq(1L, 2L).toDF("id")
      .withColumn("owner", struct(lit("ann").as("name"), lit(30).as("age")))
      .withColumn("jobs", array(
        struct(lit("mgr").as("role"), lit(200).as("pay")),
        struct(lit("eng").as("role"), lit(100).as("pay"))))
      .withColumn("attrs", map(lit("y"), lit(2), lit("x"), lit(1)))
    val c = new DriftCompare(spark,
      MemorySide("db1", Map("t" -> reordered)),
      MemorySide("db2", Map("t" -> nested())))
    assert(c.dataDrift("t").get.count() == 0)
  }

  test("nested value change IS drift; drift table holds JSON text columns") {
    val mut = nested().withColumn("owner",
      when($"id" === 2, struct(lit("bob").as("name"), lit(31).as("age")))
        .otherwise(struct(lit("ann").as("name"), lit(30).as("age"))))
    val c = new DriftCompare(spark,
      MemorySide("db1", Map("t" -> mut)),
      MemorySide("db2", Map("t" -> nested())))
    val d = c.dataDrift("t").get
    assert(d.count() == 2) // both versions of id=2
    assert(d.schema("owner").dataType.typeName == "string") // JSON-folded
    assert(d.filter($"owner".contains("bob")).count() == 1)
  }
}

/** Golden-string parity with the reference's Jinja rendering: the expected
  * strings below were produced by rendering
  * lotad/reports/db_comparison_report.j2 with Jinja2 over the same rows.
  */
class ReportParitySpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators._

  private val full = DriftResult(
    schemaDrift = Seq(
      SchemaDriftRow("customer", "extra", "db1", None, "db2", Some("DOUBLE")),
      SchemaDriftRow("customer", "name", "db1", Some("VARCHAR"), "db2", Some("INTEGER"))),
    missingTables = Seq(MissingTableRow("only_db1", "db1", "db2")),
    dataDrift = Map.empty,
    summary = Seq(DataDriftSummaryRow("orders", "db1", 1L, "db2", 2L)))

  test("full report matches the Jinja rendering byte for byte") {
    val expected =
      "Database Comparison Report\n\nMissing Table Summary\n\"only_db1\" not found in \"db2\"\n\n" +
      "Schema Drift Summary\n\n\"customer\".\"extra\"\n    \"db1\" \"None\"\n    \"db2\" \"DOUBLE\"\n\n" +
      "\"customer\".\"name\"\n    \"db1\" \"VARCHAR\"\n    \"db2\" \"INTEGER\"\n\n" +
      "Data Drift Summary\nFormat:\n    my_table\n        db1 - records only in db1\n" +
      "        db2 - records only in db2\n\norders\n    db1 - 1\n    db2 - 2"
    assert(DriftOutput.report(full) == expected)
  }

  test("empty result renders only the header, no trailing newline") {
    assert(DriftOutput.report(DriftResult(Nil, Nil, Map.empty, Nil)) ==
      "Database Comparison Report")
  }

  test("data-drift-only report omits the other sections") {
    val r = full.copy(schemaDrift = Nil, missingTables = Nil)
    assert(DriftOutput.report(r) ==
      "Database Comparison Report\n\nData Drift Summary\nFormat:\n    my_table\n" +
      "        db1 - records only in db1\n        db2 - records only in db2\n\n" +
      "orders\n    db1 - 1\n    db2 - 2")
  }
}
