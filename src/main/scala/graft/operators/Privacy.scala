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

  /** t-closeness audit (categorical sensitive column): one row per
    * quasi-identifier group whose sensitive-value distribution sits
    * MORE than `t` total-variation distance from the global
    * distribution — the gate after [[lDiversity]] (a group can be
    * diverse yet skewed: 90% one diagnosis where the population has
    * 10% still leaks), with the global summary on every row.
    *
    * TVD(g) = ½ Σ_v |p_g(v) − p(v)|, with the mass of values ABSENT
    * from the group added analytically (Σ_{v∉g} p(v) =
    * 1 − Σ_{v∈g} p(v) — the [[graft.operators.Stats.mutualInfo]]
    * absent-cell policy; enumerating every (group, value) cell would
    * square the cell table for nothing).
    *
    * Exactness: every per-value term is the exact integer
    * |c_gv·n − c_v·n_g| (cross-multiplied — no per-term division),
    * summed in DECIMAL(38,0); ONE double division per group at the
    * end, rounded at 6 dp. NULL sensitive values are excluded from
    * the distributions ([[lDiversity]]'s convention: a NULL reveals
    * nothing).
    *
    * Shape: one (quasi, sensitive) pair count (map-side combined),
    * then every stage runs on the pair/group tables — bounded by
    * quasi×sensitive cardinality, never row count; the value and
    * grand totals attach by broadcast.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness needs at least one quasi column")
    require(t > 0 && t < 1, "t must be in (0, 1)")
    val qCols = quasiCols.map(col)
    val pairs = df.filter(col(sensitiveCol).isNotNull)
      .groupBy(quasi(df, quasiCols) :+
        col(sensitiveCol).cast("string").as("_s"): _*)
      .agg(count(lit(1)).as("_cgv"))
    val groupTot = pairs.groupBy(qCols: _*).agg(sum("_cgv").as("n"))
    val valTot = pairs.groupBy("_s").agg(sum("_cgv").as("_cv"))
    val tot = pairs.agg(sum("_cgv").as("_nn"))
    val dec = "decimal(38,0)"
    val groups = pairs
      .join(broadcast(valTot), "_s")
      .join(groupTot, quasiCols)
      .crossJoin(broadcast(tot))
      .groupBy(qCols: _*)
      .agg(max("n").as("n"), max("_nn").as("_nn"),
        sum(abs(col("_cgv").cast(dec) * col("_nn") -
          col("_cv").cast(dec) * col("n"))).as("_sumabs"),
        sum(col("_cv").cast(dec)).as("_sumcv"))
      .withColumn("tvd", round(
        (col("_sumabs") + col("n").cast(dec) * (col("_nn") - col("_sumcv")))
          .cast("double") /
          (lit(2.0) * col("n") * col("_nn")), 6))
      .select(qCols :+ col("n") :+ col("tvd"): _*)
    val summary = groups.agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("tvd") > t, 1L).otherwise(0L)).as("n_violating"),
      sum(when(col("tvd") > t, col("n")).otherwise(0L)).as("rows_at_risk"),
      max("tvd").as("max_tvd"))
    groups.filter(col("tvd") > t)
      .crossJoin(broadcast(summary))
  }
}
