package graft.operators

import java.util.regex.Pattern

import graft.functions.{CanonicalRowHash, PyFormat}
import graft.sources.Side
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-table comparison rules (reference: lotad/config.py:60-163). */
final case class TableRules(
    ignoreColumns: Set[String] = Set.empty,
    customQuery: Option[String] = None)

/** Diff run configuration (reference: lotad/config.py:166-188). */
final case class DiffConfig(
    targetTables: Seq[String] = Seq.empty,
    ignoreTables: Seq[String] = Seq.empty,
    ignoreDates: Boolean = false,
    tableRules: Map[String, TableRules] = Map.empty) {

  private def anchored(p: String, s: String): Boolean =
    Pattern.compile(p, Pattern.CASE_INSENSITIVE).matcher(s).lookingAt()

  /** Regex include/exclude of table names, case-insensitive, anchored at
    * the start like Python `re.match` (reference: lotad/db_compare.py:196-202).
    */
  def tableSelected(name: String): Boolean = {
    if (ignoreTables.exists(anchored(_, name))) return false
    if (targetTables.nonEmpty) targetTables.exists(anchored(_, name)) else true
  }

  def rules(table: String): TableRules =
    tableRules.getOrElse(table, TableRules())
}

final case class SchemaDriftRow(
    tableName: String, columnName: String,
    db1: String, db1ColumnType: Option[String],
    db2: String, db2ColumnType: Option[String])

final case class MissingTableRow(tableName: String, observedIn: String, missingIn: String)

final case class DataDriftSummaryRow(
    tableName: String, db1: String, rowsOnlyInDb1: Long, db2: String, rowsOnlyInDb2: Long)

/** Results of a full comparison run. */
final case class DriftResult(
    schemaDrift: Seq[SchemaDriftRow],
    missingTables: Seq[MissingTableRow],
    dataDrift: Map[String, DataFrame],
    summary: Seq[DataDriftSummaryRow])

/** The drift comparator: schema drift, missing-table drift, and hash-based
  * row-level data drift between two sides.
  *
  * Spark-first design notes (vs the reference's per-table DuckDB sessions,
  * reference: lotad/db_compare.py:305-377):
  *  - the symmetric hash diff is a single-pass run-scan (see
  *    [[HashRunScan]]): each side is scanned and hashed once, the union
  *    shuffles once on `hashed_row`, and single-side runs stream out with
  *    inline dedup — half the IO of a dual anti-join and no trailing
  *    distinct shuffle.
  *  - projections are declared on the DataFrame, so Catalyst pushes column
  *    pruning into the Parquet scan (only intersection columns are read).
  *  - set semantics are preserved exactly: presence is per-hash, and the
  *    output drops duplicate rows like the reference's UNION
  *    (reference: lotad/queries/duckdb/db_compare_create_tmp_table_merge.sql:28-45).
  */
final class DriftCompare(
    spark: SparkSession,
    side1: Side,
    side2: Side,
    config: DiffConfig = DiffConfig()) {

  require(side1.id != side2.id, "sides must have distinct ids")

  import spark.implicits._

  def sharedTables(): Seq[String] = {
    val t1 = side1.listTables().toSet
    val t2 = side2.listTables().toSet
    t1.intersect(t2).toSeq.sorted.filter(config.tableSelected)
  }

  /** Tables present on exactly one side (reference: lotad/db_compare.py:118-147). */
  def missingTableDrift(): Seq[MissingTableRow] = {
    val t1 = side1.listTables().filter(config.tableSelected).toSet
    val t2 = side2.listTables().filter(config.tableSelected).toSet
    val only1 = (t1 -- t2).toSeq.sorted.map(MissingTableRow(_, side1.id, side2.id))
    val only2 = (t2 -- t1).toSeq.sorted.map(MissingTableRow(_, side2.id, side1.id))
    only1 ++ only2
  }

  private def effectiveSchema(side: Side, table: String): Seq[StructField] = {
    val ignores = config.rules(table).ignoreColumns.map(_.toLowerCase)
    side.schema(table).fields.toSeq
      .filterNot(f => ignores.contains(f.name.toLowerCase))
      .filterNot(f => config.ignoreDates && TypeRender.isDateLike(f.dataType))
  }

  /** Column-level drift for one shared table: columns missing on one side
    * or type-inequivalent after generic-type normalization
    * (reference: lotad/db_compare.py:35-116).
    */
  def schemaDrift(table: String): Seq[SchemaDriftRow] = {
    val s1 = effectiveSchema(side1, table).map(f => f.name -> TypeRender.render(f.dataType)).toMap
    val s2 = effectiveSchema(side2, table).map(f => f.name -> TypeRender.render(f.dataType)).toMap
    val missing2 = (s1.keySet -- s2.keySet).toSeq.sorted.map { c =>
      SchemaDriftRow(table, c, side1.id, Some(s1(c)), side2.id, None)
    }
    val missing1 = (s2.keySet -- s1.keySet).toSeq.sorted.map { c =>
      SchemaDriftRow(table, c, side1.id, None, side2.id, Some(s2(c)))
    }
    val mismatched = s1.keySet.intersect(s2.keySet).toSeq.sorted.flatMap { c =>
      if (!TypeRender.equivalent(s1(c), s2(c)))
        Some(SchemaDriftRow(table, c, side1.id, Some(s1(c)), side2.id, Some(s2(c))))
      else None
    }
    missing2 ++ missing1 ++ mismatched
  }

  /** Normalized projection: intersection columns only, sorted, nested
    * types as JSON text, cross-side type mismatches cast to string
    * (reference: lotad/db_compare.py:267-302).
    */
  private def normalizedProjection(df1: DataFrame, df2: DataFrame): (DataFrame, DataFrame) = {
    val f1 = df1.schema.fields.map(f => f.name -> f.dataType).toMap
    val f2 = df2.schema.fields.map(f => f.name -> f.dataType).toMap
    val shared = f1.keySet.intersect(f2.keySet).toSeq
      .sortWith(PyFormat.cpCompare(_, _) < 0)
    def proj(df: DataFrame, mine: Map[String, DataType], other: Map[String, DataType]) =
      df.select(shared.map { c =>
        val dt = mine(c)
        if (TypeRender.isNested(dt)) to_json(col(s"`$c`")).as(c)
        else if (TypeRender.render(dt) != TypeRender.render(other(c))) col(s"`$c`").cast("string").as(c)
        else col(s"`$c`")
      }: _*)
    (proj(df1, f1, f2), proj(df2, f2, f1))
  }

  private def dropIgnored(df: DataFrame, table: String): DataFrame = {
    val ignores = config.rules(table).ignoreColumns.map(_.toLowerCase)
    val keep = df.schema.fields
      .filterNot(f => ignores.contains(f.name.toLowerCase))
      .filterNot(f => config.ignoreDates && TypeRender.isDateLike(f.dataType))
    df.select(keep.map(f => col(s"`${f.name}`")): _*)
  }

  private def sideInput(side: Side, table: String): DataFrame =
    config.rules(table).customQuery match {
      case Some(q) => runCustomQuery(side, q)
      case None => side.table(table)
    }

  /** Run a user query against one side: every table of the side is exposed
    * as a temp view, then plain `spark.sql` — no string rewriting, unlike
    * the reference's regex-qualified attach aliases
    * (reference: lotad/db_compare.py:223-264). CTEs are consequently legal.
    */
  def runCustomQuery(side: Side, query: String): DataFrame = synchronized {
    val names = side.listTables()
    try {
      names.foreach(n => side.table(n).createOrReplaceTempView(n))
      spark.sql(query) // analyzed eagerly; safe to drop the views after
    } finally {
      names.foreach(n => spark.catalog.dropTempView(n))
    }
  }

  /** Row-level drift for one shared table: rows (by canonical hash) present
    * on exactly one side. Output columns: intersection columns (sorted) +
    * `observed_in` + `hashed_row`
    * (reference: lotad/queries/duckdb/db_compare_create_tmp_table_merge.sql).
    * Returns None when the sides share no columns
    * (reference: lotad/db_compare.py:337-339).
    */
  /** Kept for API compatibility; the run-scan diff holds no session state. */
  def cleanup(): Unit = ()

  def dataDrift(table: String): Option[DataFrame] = {
    val in1 = dropIgnored(sideInput(side1, table), table)
    val in2 = dropIgnored(sideInput(side2, table), table)
    val (p1, p2) = normalizedProjection(in1, in2)
    if (p1.schema.isEmpty) return None
    val cols = p1.columns
    def tag(df: DataFrame, id: String) = df
      .withColumn("observed_in", lit(id))
      .withColumn("hashed_row", CanonicalRowHash(struct(cols.map(c => col(s"`$c`")): _*)))
    // Single-pass plan: each side is scanned and hashed exactly once, the
    // union shuffles once on hashed_row, and a streaming run-scan emits
    // single-side runs. This beats the dual anti-join formulation (which
    // reads and hashes every side twice — once as full left, once as the
    // hash-only build) and needs no trailing dropDuplicates shuffle: the
    // run-scan dedups as it goes.
    Some(HashRunScan(tag(p1, side1.id).unionByName(tag(p2, side2.id))))
  }

  /** Drift localization extension (not in the reference): roll the
    * [[dataDrift]] rows up into key-range buckets — (bucket_lo,
    * observed_in, n_rows) for bucket_lo = floor(key / width) · width —
    * so an operator staring at 40M drifted rows can see WHERE the drift
    * lives (one ingest day? one key shard? uniform?) before reading a
    * single row. At 100 TB this is the triage step that decides whether
    * to re-run one partition's load or diff the whole table.
    *
    * Shape: one map-side-combinable aggregate over the drift output —
    * the bucket count is bounded by key-range/width, and the drift rows
    * already carry the key column (the diff projects the full
    * intersection), so no re-join against either side.
    */
  def driftLocalize(drift: DataFrame, keyCol: String, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    // bucket_lo = floor-to-width in pure INTEGER arithmetic (pmod is
    // non-negative for any sign, so this is a true floor, and no key
    // ever round-trips through a double)
    val k = col(keyCol).cast("long")
    drift
      .withColumn("bucket_lo", k - pmod(k, lit(width)))
      .groupBy("bucket_lo", "observed_in")
      .agg(count(lit(1)).as("n_rows"))
  }

  /** Distribution-drift extension (not in the reference): per shared
    * NUMERIC column of `table`, the Population Stability Index between
    * the two sides ([[Distribution.psi]]) — row/schema diffs answer
    * "which rows changed"; this answers "has the column's SHAPE moved"
    * even when every individual row legitimately churned. Ignored and
    * date-excluded columns are dropped first, like every other compare.
    */
  def distributionDrift(table: String, nBins: Int = 10): Option[DataFrame] = {
    val in1 = dropIgnored(sideInput(side1, table), table)
    val in2 = dropIgnored(sideInput(side2, table), table)
    val numeric = in1.schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name)
      .intersect(in2.schema.fields
        .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
        .map(_.name))
      .sorted
    if (numeric.isEmpty) None
    else Some(Distribution.psiAll(in1, in2, numeric.toIndexedSeq, nBins))
  }

  /** Bag-semantics extension (not in the reference, which is strictly
    * set-based — see SURVEY §2 fine print): rows whose per-side
    * MULTIPLICITY differs. A row occurring twice on one side and once on
    * the other is invisible to [[dataDrift]] but reported here with its
    * per-side counts. One hash-aggregate shuffle; grouping includes the
    * raw columns so hash collisions cannot merge distinct rows.
    */
  def dataDriftBag(table: String): Option[DataFrame] = {
    val in1 = dropIgnored(sideInput(side1, table), table)
    val in2 = dropIgnored(sideInput(side2, table), table)
    val (p1, p2) = normalizedProjection(in1, in2)
    if (p1.schema.isEmpty) return None
    val cols = p1.columns
    def tag(df: DataFrame, id: String) = df.withColumn("observed_in", lit(id))
    val u = tag(p1, side1.id).unionByName(tag(p2, side2.id))
      .withColumn("hashed_row", CanonicalRowHash(struct(cols.map(c => col(s"`$c`")): _*)))
    Some(u
      .groupBy((cols.map(c => col(s"`$c`")) :+ col("hashed_row")): _*)
      .agg(
        count(when(col("observed_in") === side1.id, 1)).as("n_db1"),
        count(when(col("observed_in") === side2.id, 1)).as("n_db2"))
      .filter(col("n_db1") =!= col("n_db2")))
  }

  /** Hash-keyed twin of [[dataDriftBag]] for wide tables at scale: the
    * multiplicity aggregation groups on `hashed_row` ALONE, so the shuffle
    * carries (16-byte hash, two counts) per distinct row instead of the
    * full row width — on a 100-column table that is ~two orders of
    * magnitude less shuffle volume. Row values are attached afterwards by
    * re-scanning one pass and broadcast-joining the (tiny) differing-hash
    * set, then collapsing the identical copies per hash.
    *
    * Trade-off vs [[dataDriftBag]]: two scans instead of one, in exchange
    * for shuffling hashes instead of rows — the right trade whenever row
    * width x row count dwarfs a rescan (always, at the 100 TB design
    * point; parquet scans parallelize freely, shuffles do not). Correctness
    * rests on the canonical hash being collision-free across the table's
    * distinct rows (128-bit md5: p ~ n^2 / 2^129).
    *
    * The differing-hash set is joined back WITHOUT a broadcast hint: its
    * size is data-dependent (two heavily-diverged sides approach full
    * distinct-row cardinality, past any broadcast/driver limit), so the
    * strategy is left to AQE, which broadcasts exactly when the measured
    * build side is small and falls back to a shuffled hash join otherwise.
    */
  /** Default bag diff: dispatches on the normalized projection's width.
    * Narrow tables take the one-scan [[dataDriftBag]] (the full-row
    * shuffle is cheap when rows are a handful of columns); at or above
    * `wideThreshold` columns the shuffle volume of the full row dwarfs a
    * second parquet scan and [[dataDriftBagHashed]] wins — the 100 TB
    * design point for fact tables. Both produce identical rows, so the
    * choice is purely a physical-plan decision.
    */
  def dataDriftBagAuto(table: String, wideThreshold: Int = 12): Option[DataFrame] = {
    val in1 = dropIgnored(sideInput(side1, table), table)
    val in2 = dropIgnored(sideInput(side2, table), table)
    val (p1, _) = normalizedProjection(in1, in2)
    if (p1.schema.size >= wideThreshold) dataDriftBagHashed(table)
    else dataDriftBag(table)
  }

  def dataDriftBagHashed(table: String): Option[DataFrame] = {
    val in1 = dropIgnored(sideInput(side1, table), table)
    val in2 = dropIgnored(sideInput(side2, table), table)
    val (p1, p2) = normalizedProjection(in1, in2)
    if (p1.schema.isEmpty) return None
    val cols = p1.columns
    def tag(df: DataFrame, id: String) = df
      .withColumn("observed_in", lit(id))
      .withColumn("hashed_row", CanonicalRowHash(struct(cols.map(c => col(s"`$c`")): _*)))
    val u = tag(p1, side1.id).unionByName(tag(p2, side2.id))
    val counts = u
      .groupBy("hashed_row")
      .agg(
        count(when(col("observed_in") === side1.id, 1)).as("n_db1"),
        count(when(col("observed_in") === side2.id, 1)).as("n_db2"))
      .filter(col("n_db1") =!= col("n_db2"))
    // attach row values: rescan, keep only differing hashes (AQE picks
    // broadcast when the differing set is small — the common case — and
    // degrades to a shuffled join when sides diverge heavily), collapse
    // the identical copies per hash
    val rep = u.join(counts, "hashed_row")
      .groupBy("hashed_row")
      .agg(first(col(s"`${cols.head}`")).as(cols.head),
        (cols.tail.map(c => first(col(s"`$c`")).as(c)) ++
          Seq(first("n_db1").as("n_db1"), first("n_db2").as("n_db2"))): _*)
    Some(rep.select((cols.map(c => col(s"`$c`")) ++
      Seq(col("hashed_row"), col("n_db1"), col("n_db2"))): _*))
  }

  /** Per-table drift counts by side (reference:
    * lotad/queries/duckdb/drift_analysis_extend_data_drift_summary.sql).
    */
  def summarize(table: String, drift: DataFrame): DataDriftSummaryRow = {
    val counts = drift.groupBy("observed_in").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    DataDriftSummaryRow(table, side1.id, counts.getOrElse(side1.id, 0L),
      side2.id, counts.getOrElse(side2.id, 0L))
  }

  /** Full comparison across the catalog. Per-table diffs are independent
    * Spark jobs and run concurrently (reference fans out one OS process
    * per table, lotad/db_compare.py:192-217; we submit concurrent jobs in
    * one session instead).
    */
  def compareAll(parallelism: Int = Runtime.getRuntime.availableProcessors().min(8)): DriftResult = {
    import scala.concurrent._
    import scala.concurrent.duration._
    val shared = sharedTables()
    val schema = shared.flatMap(schemaDrift)
    val missing = missingTableDrift()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(parallelism, 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results =
      try {
        val futs = shared.map { t =>
          Future {
            dataDrift(t).map { df =>
              val cached = df.persist()
              val s = summarize(t, cached)
              (t, cached, s)
            }
          }
        }
        Await.result(Future.sequence(futs), 24.hours).flatten
      } finally pool.shutdown()
    val withRows = results.filter { case (_, _, s) => s.rowsOnlyInDb1 + s.rowsOnlyInDb2 > 0 }
    DriftResult(
      schemaDrift = schema,
      missingTables = missing,
      dataDrift = withRows.map { case (t, df, _) => t -> df }.toMap,
      summary = withRows.map(_._3))
  }
}

/** Writers + report for drift results (reference: lotad/data_analysis.py). */
object DriftOutput {

  /** The reference wraps summary values in literal double quotes
    * (reference: lotad/data_analysis.py:106-141); reproduced for parity.
    */
  private def q(s: String): String = "\"" + s + "\""

  def schemaDriftDf(spark: SparkSession, rows: Seq[SchemaDriftRow]): DataFrame = {
    val data = rows.map(r => Row(q(r.tableName), q(r.columnName), q(r.db1),
      q(r.db1ColumnType.map(_.replace("'", "")).getOrElse("None")),
      q(r.db2), q(r.db2ColumnType.map(_.replace("'", "")).getOrElse("None"))))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), StructType(Seq(
      StructField("table_name", StringType), StructField("column_name", StringType),
      StructField("db1", StringType), StructField("db1_column_type", StringType),
      StructField("db2", StringType), StructField("db2_column_type", StringType))))
  }

  def missingTablesDf(spark: SparkSession, rows: Seq[MissingTableRow]): DataFrame = {
    val data = rows.map(r => Row(q(r.tableName), q(r.observedIn), q(r.missingIn)))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), StructType(Seq(
      StructField("table_name", StringType), StructField("observed_in", StringType),
      StructField("missing_in", StringType))))
  }

  /** Drift counts are LongType: a 100 TB table can drift by more than
    * 2^31 rows, and an Int column would overflow exactly when the report
    * matters most.
    */
  def summaryDf(spark: SparkSession, rows: Seq[DataDriftSummaryRow]): DataFrame = {
    val data = rows.map(r => Row(r.tableName, r.db1, r.rowsOnlyInDb1, r.db2, r.rowsOnlyInDb2))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), StructType(Seq(
      StructField("table_name", StringType), StructField("db1", StringType),
      StructField("rows_only_in_db1", LongType), StructField("db2", StringType),
      StructField("rows_only_in_db2", LongType))))
  }

  /** Write the whole result as a directory of Parquet tables: one per
    * drifted table plus the three summary tables — the Spark analog of the
    * reference's result DuckDB file (reference: lotad/data_analysis.py:143-168).
    */
  def write(spark: SparkSession, result: DriftResult, outDir: String): Unit = {
    result.dataDrift.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$t")
    }
    schemaDriftDf(spark, result.schemaDrift).write.mode("overwrite")
      .parquet(s"$outDir/lotad_table_schema_drift")
    missingTablesDf(spark, result.missingTables).write.mode("overwrite")
      .parquet(s"$outDir/lotad_missing_table_drift")
    summaryDf(spark, result.summary).write.mode("overwrite")
      .parquet(s"$outDir/lotad_db_data_drift_summary")
  }

  /** Text report, byte-identical to the reference's Jinja rendering
    * (reference: lotad/reports/db_comparison_report.j2 +
    * data_analysis.py:202-211): empty sections are omitted entirely,
    * missing-table and schema-drift values carry the stored literal
    * quote-wrapping, the data-drift summary does not, rows sort like the
    * reference's ORDER BY clauses, and the output has no trailing newline.
    * The `db1`/`db2` arguments are accepted for call-site compatibility
    * but the rendered identifiers come from the result rows, as in the
    * reference (it renders the stored db ids).
    */
  def report(result: DriftResult, db1: String = "", db2: String = ""): String = {
    val sb = new StringBuilder
    sb.append("Database Comparison Report")
    if (result.missingTables.nonEmpty) {
      sb.append("\n\nMissing Table Summary")
      result.missingTables.sortBy(_.tableName).foreach { r =>
        sb.append(s"\n${q(r.tableName)} not found in ${q(r.missingIn)}")
      }
    }
    if (result.schemaDrift.nonEmpty) {
      sb.append("\n\nSchema Drift Summary")
      result.schemaDrift.sortBy(r => (r.tableName, r.columnName)).foreach { r =>
        sb.append(s"\n\n${q(r.tableName)}.${q(r.columnName)}")
        sb.append(s"\n    ${q(r.db1)} ${q(r.db1ColumnType.map(_.replace("'", "")).getOrElse("None"))}")
        sb.append(s"\n    ${q(r.db2)} ${q(r.db2ColumnType.map(_.replace("'", "")).getOrElse("None"))}")
      }
    }
    if (result.summary.nonEmpty) {
      sb.append("\n\nData Drift Summary")
      sb.append("\nFormat:")
      sb.append("\n    my_table")
      sb.append("\n        db1 - records only in db1")
      sb.append("\n        db2 - records only in db2")
      result.summary.sortBy(_.tableName).foreach { r =>
        sb.append(s"\n\n${r.tableName}")
        sb.append(s"\n    ${r.db1} - ${r.rowsOnlyInDb1}")
        sb.append(s"\n    ${r.db2} - ${r.rowsOnlyInDb2}")
      }
    }
    sb.toString
  }
}
