package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the validation
  * gate an ingest pipeline runs before promoting a batch (the pattern
  * popularized by Great Expectations / Deequ, rebuilt Spark-first).
  * Each rule compiles to an aggregate metric; the report is one row per
  * rule: (rule, column, metric, threshold, ok).
  *
  * Scale shape: ALL row-wise rules (null fraction, range, regex,
  * custom predicate) fold into ONE aggregation pass — per-rule
  * violation counters are conditional sums with map-side partial
  * aggregation, so the scan count does not grow with the rule count.
  * Exact uniqueness rules share ONE additional aggregation carrying a
  * `countDistinct` per checked column (kept OUT of the shared agg:
  * mixing DISTINCT with the plain row-rule aggregates would Expand the
  * FULL scan; the unique branch Expands only its own key columns —
  * see NOTES); approximate uniqueness (HLL) rides the shared pass.
  * Referential integrity adds one left-anti join per foreign key, the
  * minimum possible. The report is assembled as ONE lazy unioned plan
  * — every branch is an independent subtree of a single action, so
  * Spark schedules their stages concurrently and NOTHING round-trips
  * through the driver (no per-rule jobs, no collects).
  */
object Expectations {

  sealed trait Rule { def name: String; def colName: String }
  /** Null fraction of `colName` must be <= maxNullFrac. */
  final case class NotNull(colName: String, maxNullFrac: Double = 0.0) extends Rule {
    val name = "not_null"
  }
  /** All non-null values in [lo, hi]; at most maxViolations outside. */
  final case class InRange(colName: String, lo: Double, hi: Double,
                           maxViolations: Long = 0L) extends Rule {
    val name = "in_range"
  }
  /** All non-null values match the RE2-compatible pattern. */
  final case class MatchesRegex(colName: String, pattern: String,
                                maxViolations: Long = 0L) extends Rule {
    val name = "matches_regex"
  }
  /** Column values are unique (ndv == non-null count). Exact: shuffles
    * the full distinct value set — the right gate for key columns at
    * ingest-batch scale. For 100 TB-wide uniqueness checks prefer
    * [[UniqueApprox]].
    */
  final case class Unique(colName: String, name: String = "unique") extends Rule
  /** Column is unique within `tolerance` (estimated duplicate fraction
    * (count − ndv̂)/count ≤ tolerance), with ndv̂ from a single-pass HLL
    * sketch (`approx_count_distinct`, relative sd `rsd`). No distinct
    * shuffle — the sketch merges map-side like any partial aggregate,
    * and (being non-DISTINCT) it folds into the SHARED aggregation pass
    * with the row rules, so the check is free of extra scans too. The
    * practical default at 100 TB; set tolerance ≳ 2·rsd so sketch noise
    * alone can't fail a genuinely-unique column.
    */
  final case class UniqueApprox(colName: String, tolerance: Double = 0.1,
                                rsd: Double = 0.05) extends Rule {
    require(tolerance >= 0 && tolerance < 1, "tolerance in [0, 1)")
    val name = "unique_approx"
  }
  /** All non-null values come from the accepted set (dbt's
    * `accepted_values` test, including its quote:false numeric form:
    * pass values in the COLUMN'S native type — strings for string
    * columns, numbers for numeric ones — and the IN comparison runs on
    * that type, never through a string render). Folds into the shared
    * row-rule pass — one conditional count, no extra scan.
    */
  final case class InSet(colName: String, accepted: Set[Any],
                         maxViolations: Long = 0L) extends Rule {
    require(accepted.nonEmpty, "accepted set must be non-empty")
    val name = "in_set"
  }
  /** Every non-null value exists in `dim`'s `dimCol` (foreign key). */
  final case class RefIntegrity(colName: String, dim: DataFrame, dimCol: String,
                                maxOrphans: Long = 0L) extends Rule {
    val name = "ref_integrity"
  }
  /** The column's distribution must stay within KS distance `maxD` of
    * the same column in `ref` (yesterday's batch, the training-time
    * snapshot) — the distribution-drift gate as a first-class
    * expectation: the suite that checks nulls and ranges also checks
    * SHAPE. Metric is the two-sample KS D from [[Stats.ksTest]]'s
    * machinery (one count pass per side, bounded distinct-value
    * windows, integer-exact gap max).
    */
  final case class Drift(colName: String, ref: DataFrame, maxD: Double,
                         precision: Int = 9, scale: Int = 2) extends Rule {
    require(maxD >= 0 && maxD <= 1, "maxD in [0, 1]")
    val name = "drift"
  }

  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")

    // one report row as a struct of the final schema; `ok` derives from
    // metric <= threshold in-plan so every branch is purely declarative
    def reportRow(rule: String, colName: String, metric: Column,
                  threshold: Double): Column =
      struct(lit(rule).as("rule"), lit(colName).as("column"),
        metric.as("metric"), lit(threshold).as("threshold"),
        (metric <= lit(threshold)).as("ok"))
    def explodeRows(agg: DataFrame, rows: Seq[Column]): DataFrame =
      agg.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))

    // coalesce: sum over an EMPTY relation is NULL — an empty batch must
    // report zero violations, not a null-poisoned ok column
    val rowRules: Seq[(Rule, Column)] = rules.collect {
      case r: NotNull => r -> coalesce(
        sum(when(col(r.colName).isNull, 1L).otherwise(0L)), lit(0L))
      case r: InRange => r -> coalesce(sum(when(col(r.colName).isNotNull &&
        (col(r.colName) < r.lo || col(r.colName) > r.hi), 1L).otherwise(0L)), lit(0L))
      case r: MatchesRegex => r -> coalesce(sum(when(col(r.colName).isNotNull &&
        !col(r.colName).rlike(r.pattern), 1L).otherwise(0L)), lit(0L))
      case r: InSet => r -> coalesce(sum(when(col(r.colName).isNotNull &&
        !col(r.colName).isin(r.accepted.toSeq: _*), 1L)
        .otherwise(0L)), lit(0L))
    }
    // approx-uniqueness folds into the same pass: HLL sketches are plain
    // (non-DISTINCT) partial aggregates, so adding them costs no Expand
    // and no extra scan — two agg columns per rule (non-null count, ndv̂)
    val approxUnique: Seq[UniqueApprox] = rules.collect { case r: UniqueApprox => r }
    val approxAggs = approxUnique.zipWithIndex.flatMap { case (r, i) =>
      Seq(count(col(r.colName)).as(s"_uc$i"),
        approx_count_distinct(col(r.colName), r.rsd).as(s"_ud$i"))
    }
    val sharedBranch: Option[DataFrame] =
      if (rowRules.isEmpty && approxUnique.isEmpty) None else Some {
        val sharedAggs = (count(lit(1)).as("_n") +:
          rowRules.zipWithIndex.map { case ((_, c), i) => c.as(s"_v$i") }) ++ approxAggs
        val agg = df.agg(sharedAggs.head, sharedAggs.tail: _*)
        val rowReports = rowRules.zipWithIndex.map { case ((r, _), i) =>
          val viol = col(s"_v$i")
          r match {
            case NotNull(c, maxFrac) =>
              reportRow(r.name, c, when(col("_n") === 0L, 0.0)
                .otherwise(viol.cast("double") / col("_n")), maxFrac)
            case InRange(c, _, _, maxV) =>
              reportRow(r.name, c, viol.cast("double"), maxV.toDouble)
            case MatchesRegex(c, _, maxV) =>
              reportRow(r.name, c, viol.cast("double"), maxV.toDouble)
            case InSet(c, _, maxV) =>
              reportRow(r.name, c, viol.cast("double"), maxV.toDouble)
            case _ => sys.error("unreachable")
          }
        }
        // HLL can overestimate ndv past the true count — clamp at 0 so a
        // clean column never reports a negative duplicate fraction
        val approxReports = approxUnique.zipWithIndex.map { case (r, i) =>
          reportRow(r.name, r.colName,
            when(col(s"_uc$i") === 0L, 0.0).otherwise(greatest(lit(0.0),
              (col(s"_uc$i") - col(s"_ud$i")).cast("double") / col(s"_uc$i"))),
            r.tolerance)
        }
        explodeRows(agg, rowReports ++ approxReports)
      }
    // ALL exact-uniqueness rules share one aggregation: a count +
    // countDistinct pair per checked column. Multiple DISTINCT columns
    // Expand this branch's scan (one replica per distinct group), but the
    // branch projects only the checked key columns, and one Expanded scan
    // beats one full job per rule
    val uniqueRules = rules.collect { case r: Unique => r }
    val uniqueBranch: Option[DataFrame] =
      if (uniqueRules.isEmpty) None else Some {
        val aggs = uniqueRules.zipWithIndex.flatMap { case (r, i) =>
          Seq(count(col(r.colName)).as(s"_qc$i"),
            countDistinct(col(r.colName)).as(s"_qd$i"))
        }
        // distinct column list: two Unique rules naming the same column
        // would project duplicate names and make every later reference
        // ambiguous (the per-rule aggregates read the shared column)
        val agg = df.select(uniqueRules.map(_.colName).distinct.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
        explodeRows(agg, uniqueRules.zipWithIndex.map { case (r, i) =>
          reportRow(r.name, r.colName,
            (col(s"_qc$i") - col(s"_qd$i")).cast("double"), 0.0)
        })
      }
    // one anti-join branch per foreign key — the parent prunes to its key
    // column and broadcasts when dimension-sized
    val refBranches = rules.collect { case r: RefIntegrity =>
      val orphanAgg = foreignKeyViolations(
        df.select(col(r.colName)), r.colName, r.dim, r.dimCol)
        .agg(count(lit(1)).as("_o"))
      explodeRows(orphanAgg, Seq(
        reportRow(r.name, r.colName, col("_o").cast("double"),
          r.maxOrphans.toDouble)))
    }
    // one KS branch per drift rule; an UNDEFINED comparison (either
    // side has no non-null values — exactly the broken-upstream case a
    // drift gate exists to catch) reports MAXIMAL drift, never a
    // null-poisoned ok column
    val driftBranches = rules.collect { case r: Drift =>
      val d = Stats.ksTestFrames(df, r.ref, r.colName, r.precision, r.scale)
      explodeRows(d, Seq(
        reportRow(r.name, r.colName, coalesce(col("d"), lit(1.0)), r.maxD)))
    }
    (sharedBranch.toSeq ++ uniqueBranch.toSeq ++ refBranches ++ driftBranches)
      .reduce(_ unionByName _)
  }

  /** Fully-on-cluster, cross-engine-REPLAYABLE approximate-uniqueness
    * gate: the [[UniqueApprox]] check rebuilt on [[Hll]]'s md5-register
    * sketch instead of Spark's internal `approx_count_distinct`, so an
    * external engine (the DuckDB oracle) reproduces the estimated
    * duplicate fraction bit-for-bit. One `(rule, column, metric,
    * threshold, ok)` row per input `(column, tolerance)` pair; metric is
    * the clamped estimated duplicate fraction `max(0, (n − ndv̂)/n)`
    * rounded to 6 dp. Each column costs one scan folded into a 2^p-key
    * register aggregation — no distinct shuffle, nothing on the driver.
    */
  def uniqueApproxGate(df: DataFrame, checks: Seq[(String, Double)],
                       p: Int = 6): DataFrame = {
    require(checks.nonEmpty, "at least one (column, tolerance) check")
    checks.map { case (c, tol) =>
      val nonNull = df.filter(col(c).isNotNull)
      val n = nonNull.agg(count(lit(1)).as("_n"))
      val est = Hll.estimate(Hll.registers(nonNull, c, p), p)
      n.crossJoin(est)
        .select(
          lit("unique_approx").as("rule"),
          lit(c).as("column"),
          round(greatest(lit(0.0),
            (col("_n").cast("double") - col("est")) / col("_n").cast("double")),
            6).as("metric"),
          lit(tol).as("threshold"))
        .withColumn("ok", col("metric") <= col("threshold"))
    }.reduce(_ unionByName _)
  }

  /** Referential-integrity check: child rows whose non-null `childKey`
    * has no match in `parent.parentKey` — the FK-violation complement
    * of a left-semi join. One anti join on the key; the parent side
    * prunes to its key column, broadcasts when dimension-sized, and at
    * 100 TB the check costs exactly one keyed exchange (or none with a
    * broadcast/bloom parent). NULL child keys are NOT violations —
    * SQL's FK semantics skip them.
    */
  def foreignKeyViolations(child: DataFrame, childKey: String,
                           parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")

  /** Functional-dependency audit: values of `detCol` that map to MORE
    * than one distinct `depCol` value — empty output means
    * `detCol -> depCol` holds. One grouped countDistinct (partial-agg
    * friendly; the exchange carries one row per determinant value).
    */
  def functionalDependencyViolations(df: DataFrame, detCol: String,
                                     depCol: String): DataFrame =
    df.groupBy(detCol)
      .agg(countDistinct(depCol).as("n_distinct"))
      .filter(col("n_distinct") > 1)
}
