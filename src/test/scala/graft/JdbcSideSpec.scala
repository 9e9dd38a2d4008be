package graft

import graft.operators.DriftCompare
import graft.sources.JdbcSide

/** End-to-end JDBC side test against embedded Apache Derby (the JDBC
  * driver available offline in /opt/spark/jars) — the heterogeneous-
  * backend claim of the reference (lotad/connection.py:287-312) exercised
  * for real: table discovery via DatabaseMetaData, Spark JDBC scans, and
  * a full drift comparison with row + schema mutations, mirroring the
  * reference's mutation matrix on its sqlite/duckdb backends.
  */
class JdbcSideSpec extends SparkSpecBase {

  private def withDb(name: String)(ddl: java.sql.Statement => Unit): String = {
    val url = s"jdbc:derby:memory:$name"
    val conn = java.sql.DriverManager.getConnection(url + ";create=true")
    try {
      val st = conn.createStatement()
      try ddl(st) finally st.close()
    } finally conn.close()
    url
  }

  private lazy val url1 = withDb("graft_db1") { st =>
    st.execute("""CREATE TABLE "orders" ("o_id" INT, "amount" DOUBLE, "status" VARCHAR(8))""")
    st.execute("""INSERT INTO "orders" VALUES (1, 10.5, 'OPEN'), (2, 20.0, 'DONE'), (3, 30.25, 'OPEN')""")
    st.execute("""CREATE TABLE "customer" ("c_id" INT, "name" VARCHAR(20))""")
    st.execute("""INSERT INTO "customer" VALUES (1, 'alice'), (2, 'bob')""")
    st.execute("""CREATE TABLE "only_db1" ("x" INT)""")
  }

  private lazy val url2 = withDb("graft_db2") { st =>
    // row mutation: order 2 amount changed; order 4 added
    st.execute("""CREATE TABLE "orders" ("o_id" INT, "amount" DOUBLE, "status" VARCHAR(8))""")
    st.execute("""INSERT INTO "orders" VALUES (1, 10.5, 'OPEN'), (2, 21.0, 'DONE'), (3, 30.25, 'OPEN'), (4, 40.0, 'NEW')""")
    // schema mutation: name retyped to INT, extra column added
    st.execute("""CREATE TABLE "customer" ("c_id" INT, "name" INT, "extra" DOUBLE)""")
    st.execute("""INSERT INTO "customer" VALUES (1, 7, 0.5)""")
  }

  private def sides = {
    val s1 = JdbcSide(spark, url1, new java.util.Properties(), "APP", "db1")
    val s2 = JdbcSide(spark, url2, new java.util.Properties(), "APP", "db2")
    (s1, s2)
  }

  test("listTables via DatabaseMetaData finds created tables") {
    val (s1, s2) = sides
    assert(s1.listTables() == Seq("customer", "only_db1", "orders"))
    assert(s2.listTables() == Seq("customer", "orders"))
  }

  test("table() reads through Spark's JDBC source with quoted identifiers") {
    val (s1, _) = sides
    val df = s1.table("orders")
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("o_id", "amount", "status"))
  }

  test("quoting rejects malicious identifiers") {
    val (s1, _) = sides
    intercept[IllegalArgumentException](s1.table("""x" AS y --"""))
  }

  test("full drift comparison across two live JDBC databases") {
    val (s1, s2) = sides
    val c = new DriftCompare(spark, s1, s2)

    val missing = c.missingTableDrift()
    assert(missing.map(m => (m.tableName, m.observedIn, m.missingIn)) ==
      Seq(("only_db1", "db1", "db2")))

    val schemaDrift = c.schemaDrift("customer")
    val drifted = schemaDrift.map(r =>
      (r.columnName, r.db1ColumnType, r.db2ColumnType)).toSet
    assert(drifted.contains(("extra", None, Some("DOUBLE"))))
    assert(drifted.exists { case (cn, t1, t2) =>
      cn == "name" && t1.contains("VARCHAR") && t2.contains("INTEGER") })

    val drift = c.dataDrift("orders").get.collect()
    // order 2 differs on both sides; order 4 exists only in db2
    val byside = drift.groupBy(_.getAs[String]("observed_in"))
      .view.mapValues(_.map(_.getAs[Int]("o_id")).toSet).toMap
    assert(byside("db1") == Set(2))
    assert(byside("db2") == Set(2, 4))
  }

  test("DSv2 catalog pushes GROUP BY aggregates into the remote database") {
    url1 // force fixture creation
    JdbcSide.registerCatalog(spark, "graftjdbc", "jdbc:derby:memory:graft_db1")
    // unquoted Derby identifiers are uppercase; ours were created quoted
    val df = JdbcSide.catalogTable(spark, "graftjdbc", "APP", "orders")
      .groupBy("status")
      .agg(org.apache.spark.sql.functions.sum("amount").as("total"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(rows == Set(("OPEN", 40.75, 2L), ("DONE", 20.0, 1L)))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregates: [SUM(") && p.contains("COUNT("),
      s"expected the aggregate compiled into Derby's scan:\n$p")
    assert(p.contains("PushedGroupByExpressions:"),
      s"expected the group-by pushed to the remote side:\n$p")
  }
}
