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
  * Uniqueness adds one `countDistinct` aggregation (kept OUT of the
  * shared agg: mixing DISTINCT with plain aggregates forces an Expand
  * plan — see NOTES). Referential integrity adds one left-anti join
  * per foreign key, the minimum possible. Nothing collects but the
  * per-rule 1-row metrics.
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
  /** Column values are unique (ndv == non-null count). */
  final case class Unique(colName: String) extends Rule { val name = "unique" }
  /** Every non-null value exists in `dim`'s `dimCol` (foreign key). */
  final case class RefIntegrity(colName: String, dim: DataFrame, dimCol: String,
                                maxOrphans: Long = 0L) extends Rule {
    val name = "ref_integrity"
  }

  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val spark = df.sparkSession
    import spark.implicits._

    val rowRules: Seq[(Rule, Column)] = rules.collect {
      case r: NotNull => r -> sum(when(col(r.colName).isNull, 1L).otherwise(0L))
      case r: InRange => r -> sum(when(col(r.colName).isNotNull &&
        (col(r.colName) < r.lo || col(r.colName) > r.hi), 1L).otherwise(0L))
      case r: MatchesRegex => r -> sum(when(col(r.colName).isNotNull &&
        !col(r.colName).rlike(r.pattern), 1L).otherwise(0L))
    }
    val sharedAggs = count(lit(1)).as("_n") +:
      rowRules.zipWithIndex.map { case ((_, c), i) => c.as(s"_v$i") }
    val shared = df.agg(sharedAggs.head, sharedAggs.tail: _*).head()
    val n = shared.getAs[Long]("_n")

    val rowReport = rowRules.zipWithIndex.map { case ((r, _), i) =>
      val viol = shared.getAs[Long](s"_v$i")
      r match {
        case NotNull(c, maxFrac) =>
          val frac = if (n == 0) 0.0 else viol.toDouble / n
          (r.name, c, frac, maxFrac, frac <= maxFrac)
        case InRange(c, _, _, maxV) =>
          (r.name, c, viol.toDouble, maxV.toDouble, viol <= maxV)
        case MatchesRegex(c, _, maxV) =>
          (r.name, c, viol.toDouble, maxV.toDouble, viol <= maxV)
        case _ => sys.error("unreachable")
      }
    }
    val uniqueReport = rules.collect { case r: Unique =>
      val row = df.agg(count(col(r.colName)).as("c"),
        countDistinct(col(r.colName)).as("d")).head()
      val dupes = row.getAs[Long]("c") - row.getAs[Long]("d")
      (r.name, r.colName, dupes.toDouble, 0.0, dupes == 0L)
    }
    val refReport = rules.collect { case r: RefIntegrity =>
      val orphans = df.select(col(r.colName)).filter(col(r.colName).isNotNull)
        .join(r.dim.select(col(r.dimCol).as(r.colName)).distinct(),
          Seq(r.colName), "left_anti")
        .count()
      (r.name, r.colName, orphans.toDouble, r.maxOrphans.toDouble,
        orphans <= r.maxOrphans)
    }
    (rowReport ++ uniqueReport ++ refReport)
      .toDF("rule", "column", "metric", "threshold", "ok")
  }
}
