package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot change-data-capture: classify every primary key
  * as added / removed / changed / unchanged and attribute *which*
  * columns changed. This is the row-level drill-down the reference's
  * drift summary points users at (reference: lotad/data_analysis.py's
  * per-table row diff) expressed as a keyed CDC operator instead of a
  * whole-row hash diff: when the table HAS a reliable primary key, the
  * per-column attribution is strictly more actionable than "row hash
  * differs".
  *
  * Scale design: one full-outer shuffle join on the key — the minimum
  * possible for keyed reconciliation — and all per-column comparisons
  * are codegen'd null-safe equality expressions evaluated inside the
  * join's output projection. No driver collect, no second pass; at
  * 100 TB both sides shuffle once on a high-cardinality key (no skew
  * by construction: keys are unique per side).
  */
object ChangeCapture {

  /** Per-key change manifest between `oldDf` and `newDf`.
    *
    * Output: (pk, change_type, changed_cols, n_changed) where
    * `change_type` ∈ added | removed | changed | unchanged,
    * `changed_cols` is the comma-joined sorted list of shared non-key
    * columns whose values differ null-safely (empty unless `changed`),
    * and `n_changed` is its length. Columns present in only one
    * snapshot are schema drift, not row drift — they're reported by
    * the schema-diff operator and ignored here.
    */
  def rowChanges(oldDf: DataFrame, newDf: DataFrame, pk: String): DataFrame = {
    val shared = oldDf.columns.filter(c => c != pk && newDf.columns.contains(c)).toSeq
    val o = oldDf.select(
      (col(pk) +: lit(true).as("_old_present") +: shared.map(c => col(c).as(s"_old_$c"))): _*)
    val n = newDf.select(
      (col(pk) +: lit(true).as("_new_present") +: shared.map(c => col(c).as(s"_new_$c"))): _*)
    val j = o.join(n, Seq(pk), "full_outer")
    // one WHEN per shared column: its name when the two sides differ
    // null-safely, else null — array_compact drops the nulls
    val diffs = array_compact(array(shared.map(c =>
      when(not(col(s"_old_$c") <=> col(s"_new_$c")), lit(c))): _*))
    val changeType = when(col("_old_present").isNull, lit("added"))
      .when(col("_new_present").isNull, lit("removed"))
      .when(size(diffs) > 0, lit("changed"))
      .otherwise(lit("unchanged"))
    j.select(
      col(pk),
      changeType.as("change_type"),
      when(changeType === "changed", concat_ws(",", array_sort(diffs)))
        .otherwise(lit("")).as("changed_cols"),
      when(changeType === "changed", size(diffs)).otherwise(lit(0))
        .cast("long").as("n_changed"))
  }

  /** MERGE INTO semantics (the lakehouse upsert):
    * `WHEN MATCHED AND deleteWhen THEN DELETE` /
    * `WHEN MATCHED THEN UPDATE SET *` /
    * `WHEN NOT MATCHED THEN INSERT *`, composed from key joins instead
    * of a table rewrite. Matching is on `pk`, which must be unique in
    * `source` (MERGE's own precondition — a key matching twice is
    * ambiguous). SQL MERGE raises a cardinality violation there; so
    * does this operator (one small-side agg job, skippable for a
    * pre-deduplicated feed via `verifySourceUnique = false` — unlike
    * real MERGE the violation would otherwise emit duplicates
    * SILENTLY, so the check defaults on). Per the standard clause
    * order, an UNMATCHED source row satisfying `deleteWhen` still
    * inserts (the delete clause only guards matched rows).
    *
    * PRECONDITION: `pk` must also be unique in `target`. SQL MERGE
    * updates EACH matching target row; this join formulation instead
    * replaces all N rows of a duplicated target key with the single
    * source image — silently shrinking target cardinality. Merge
    * targets are key-unique in any sane lakehouse table and verifying
    * costs a FULL extra scan of the big side (the merge itself touches
    * the target only once), so unlike the small-side source check this
    * guard is OPT-IN: pass `verifyTargetUnique = true` when ingesting
    * into a target of unknown provenance.
    *
    * `deleteWhen` resolves against the SOURCE row image (the new
    * values), not the target's: "delete keys the feed marks dead" —
    * the CDC-tombstone reading. A guard on the OLD image (SQL's
    * `WHEN MATCHED AND t.col = …` referencing the target) needs the
    * old row joined in; pre-join `target` yourself for that form.
    *
    * Scale shape: the big side (`target`) is touched by exactly one
    * anti join on the key; the update/insert split runs on the small
    * side. When `source` fits the broadcast threshold every one of the
    * three joins broadcasts it and the merge is shuffle-free on the
    * target — the reason this beats the full-outer-join formulation,
    * which would exchange the entire target unconditionally.
    */
  /** Column-level drift profile: which COLUMNS carry the change —
    * per shared column, how many key-matched rows differ in it, plus
    * one row each for added/removed key counts. The "what broke in last
    * night's load" triage view that [[rowChanges]]' per-row output is
    * too wide to answer at 100 TB: a billion changed rows collapse to
    * one row per column.
    *
    * Shape: the [[rowChanges]] full-outer join (one exchange per side),
    * then ONE unconditional aggregation — per-column counts come from
    * `sum(case)` over the diff flags, so no explode, no second pass,
    * and the output is bounded by column count + 2.
    */
  def columnDriftProfile(oldDf: DataFrame, newDf: DataFrame, pk: String): DataFrame = {
    val changes = rowChanges(oldDf, newDf, pk)
    val shared = oldDf.columns.filter(c => c != pk && newDf.columns.contains(c)).toSeq
    val perCol = shared.map(c =>
      sum(when(array_contains(split(col("changed_cols"), ","), c), 1L)
        .otherwise(0L)).as(c))
    val agg = changes.agg(
      sum(when(col("change_type") === "added", 1L).otherwise(0L)).as("_added"),
      (sum(when(col("change_type") === "removed", 1L).otherwise(0L)).as("_removed")
        +: perCol): _*)
    // unpivot the single summary row into (column, n_rows)
    val pairs = Seq(("(added rows)", "_added"), ("(removed rows)", "_removed")) ++
      shared.map(c => (c, c))
    val stack = explode(array(pairs.map { case (label, c) =>
      struct(lit(label).as("column"), col(s"`$c`").as("n_rows"))
    }: _*)).as("kv")
    agg.select(stack).select(col("kv.column"), col("kv.n_rows"))
      .filter(col("n_rows") > 0)
  }

  def mergeInto(target: DataFrame, source: DataFrame, pk: String,
                deleteWhen: Option[org.apache.spark.sql.Column] = None,
                verifySourceUnique: Boolean = true,
                verifyTargetUnique: Boolean = false): DataFrame = {
    require(source.columns.toSet == target.columns.toSet,
      s"mergeInto needs identical column sets; " +
        s"source-only: ${source.columns.toSet.diff(target.columns.toSet)}, " +
        s"target-only: ${target.columns.toSet.diff(source.columns.toSet)}")
    def requireUnique(df: DataFrame, side: String, why: String): Unit = {
      val dup = df.groupBy(pk).count().filter(col("count") > 1)
        .select(pk).limit(1).collect()
      require(dup.isEmpty,
        s"mergeInto $side has duplicate $pk (e.g. ${dup.headOption.map(_.get(0))}): $why")
    }
    if (verifySourceUnique) requireUnique(source, "source",
      "a key matching twice is ambiguous (SQL MERGE cardinality violation)")
    if (verifyTargetUnique) requireUnique(target, "target",
      "SQL MERGE updates each matching row; this formulation would " +
        "collapse the duplicated key to one row, shrinking the target")
    val ordered = source.select(target.columns.map(col).toIndexedSeq: _*)
    val targetKeys = target.select(pk)
    val matched = ordered.join(targetKeys, Seq(pk), "left_semi")
    val inserts = ordered.join(targetKeys, Seq(pk), "left_anti")
    val updates = deleteWhen
      .map(c => matched.filter(!coalesce(c, lit(false))))
      .getOrElse(matched)
    target.join(ordered.select(pk), Seq(pk), "left_anti")
      .unionByName(updates)
      .unionByName(inserts)
  }

  /** Log compaction: the latest record per key from an append-only
    * event/changelog table — ordered by `tsCol` with `tieCol` breaking
    * equal timestamps, so the winner is deterministic and the operator
    * is oracle-able. The everyday "current state from a CDC stream /
    * event log" materialization.
    *
    * Shape: one shuffle on the key + per-key local sort for
    * `row_number` — the minimum for exact per-key argmax. Map-side
    * pre-aggregation can't apply to whole-row winners, but the window
    * sorts within partitions only (no global sort), and key cardinality
    * at 100 TB spreads uniformly. For the timestamp-only form a
    * max-struct aggregation would save the sort; the window form keeps
    * EVERY column without packing them into a struct aggregate.
    */
  def compactLatest(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_rk")
  }

  /** Slowly-changing-dimension (type 2) history from an append-only
    * change log: each record becomes a version row with
    * `valid_from` = its own timestamp, `valid_to` = the next version's
    * timestamp (null while current), plus `version` (1-based per key)
    * and `is_current`. Ties on the timestamp break by `tieCol`, same
    * ordering contract as [[compactLatest]].
    *
    * Shape: one shuffle on the key + within-partition sort; both window
    * functions (lead, row_number) share the single window spec, so
    * Catalyst evaluates them in one Window operator over one sort.
    */
  def scdHistory(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
