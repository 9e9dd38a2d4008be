package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk audits for curated release data: k-anonymity
  * (every quasi-identifier combination must describe at least k rows)
  * and l-diversity (every quasi-identifier group must contain at least
  * l distinct sensitive values) — the two standard gates a training
  * corpus with user-derived columns must pass before leaving the
  * trusted boundary. Both are pure aggregation shapes: one
  * map-side-combined count over the quasi key, then every later stage
  * runs on the group table (bounded by quasi-combination cardinality,
  * never row count).
  */
object Privacy {

  private def quasi(df: DataFrame, quasiCols: Seq[String]): Seq[Column] =
    quasiCols.map(c => col(c).cast("string").as(c))

  /** k-anonymity audit: one row per VIOLATING quasi-identifier group
    * (group size < k), carrying the group size plus the global risk
    * summary on every row — total groups, violating groups, rows at
    * risk, and the table's anonymity level (the minimum group size,
    * i.e. the largest k the table actually satisfies).
    *
    * NULL quasi values count as a value (an attacker sees the NULL
    * too), so groups are keyed null-safely by the grouped aggregation
    * itself. At 100 TB: one grouped count (map-side combined), one
    * bounded summary aggregate broadcast back — no stage ever carries
    * more than the group table.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one quasi column")
    require(k >= 2, "k must be >= 2 (k = 1 is vacuous)")
    val groups = df.groupBy(quasi(df, quasiCols): _*)
      .agg(count(lit(1)).as("n"))
    val summary = groups.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating"),
      sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"),
      min("n").as("anonymity"))
    groups.filter(col("n") < k)
      .crossJoin(broadcast(summary))
  }

  /** Keyed deterministic pseudonymization of identifier columns:
    * each value v becomes sha256(salt || ':' || v) — referential
    * integrity survives (the same user pseudonymizes identically in
    * every table sharing the salt, so joins still work), re-running is
    * idempotent, and recovery requires the salt (keep it out of the
    * released data). The GDPR-style pseudonymization step before a
    * corpus leaves the trusted boundary; combine with [[kAnonymity]]
    * on the REMAINING quasi columns — pseudonymizing the key does not
    * anonymize the row.
    *
    * Shape: a pure per-row projection — codegen'd sha2, no shuffle,
    * no state; NULLs stay NULL (there is nothing to hide). At 100 TB
    * this is scan-speed.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    require(salt.nonEmpty, "an empty salt makes pseudonyms dictionary-attackable")
    val target = cols.toSet
    df.select(df.columns.map { c =>
      if (target(c))
        when(col(c).isNotNull,
          sha2(concat(lit(salt), lit(":"), col(c).cast("string")), 256))
          .as(c)
      else col(c)
    }: _*)
  }

  /** l-diversity audit: one row per quasi-identifier group whose
    * sensitive column takes FEWER than l distinct values (a k-anonymous
    * group with one shared diagnosis still leaks it), with the global
    * summary on every row — total groups, violating groups, rows at
    * risk, and the minimum diversity actually achieved.
    *
    * Shape: one exact distinct-count aggregation keyed on the quasi
    * combination (two-level partial aggregation over (quasi, sensitive)
    * pairs — never a row-level shuffle wider than the pair table), then
    * the bounded group table drives everything else. NULL sensitive
    * values are excluded from the diversity count (a NULL reveals
    * nothing) but still count toward the group's row total.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity needs at least one quasi column")
    require(l >= 2, "l must be >= 2 (l = 1 is vacuous)")
    val groups = df.groupBy(quasi(df, quasiCols): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("diversity"))
    val summary = groups.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("diversity") < l, 1L).otherwise(0L)).as("n_violating"),
      sum(when(col("diversity") < l, col("n")).otherwise(0L)).as("rows_at_risk"),
      min("diversity").as("min_diversity"))
    groups.filter(col("diversity") < l)
      .crossJoin(broadcast(summary))
  }
}
