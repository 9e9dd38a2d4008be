package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance matching: the entity-resolution primitive for
  * dirty catalogs (typo'd names, OCR noise). Semantics are explicitly
  * *blocked* — only pairs sharing a caller-chosen blocking key are
  * compared, the standard ER trade: recall is bounded by how robust the
  * blocking key is to the expected corruption (pick a fragment the
  * corruption can't touch, e.g. an unedited token), and in exchange the
  * candidate space drops from |L|x|R| to the sum of block products.
  *
  * Scale design: one shuffle on the blocking key; the edit-distance
  * kernel is Spark's codegen'd `levenshtein` WITH the threshold
  * argument, which early-exits the DP at O(len x maxEdits) instead of
  * O(len^2) and so stays cheap even when blocks are large. A
  * `|len(l) - len(r)| <= maxEdits` prefilter (a necessary condition for
  * edit distance) discards most candidates before the kernel runs.
  */
object FuzzyJoin {

  /** Pairs (l_id, r_id, l_key, r_key, dist) with dist <= maxEdits,
    * compared only within equal `blockOf(key)` blocks.
    */
  def fuzzyJoin(left: DataFrame, leftId: String, leftKey: String,
                right: DataFrame, rightId: String, rightKey: String,
                blockOf: Column => Column, maxEdits: Int): DataFrame = {
    val l = left.select(col(leftId).cast("long").as("l_id"),
      col(leftKey).as("l_key")).withColumn("blk", blockOf(col("l_key")))
    val r = right.select(col(rightId).cast("long").as("r_id"),
      col(rightKey).as("r_key")).withColumn("blk", blockOf(col("r_key")))
    l.join(r, Seq("blk"))
      .filter(abs(length(col("l_key")) - length(col("r_key"))) <= maxEdits)
      // threshold form returns -1 once the running distance exceeds it
      .withColumn("dist", levenshtein(col("l_key"), col("r_key"), maxEdits))
      .filter(col("dist") >= 0)
      .select("l_id", "r_id", "l_key", "r_key", "dist")
  }

  /** Entity resolution over one table: fuzzy self-match within blocks,
    * connected components over the match edges, entity_id = min id in
    * the cluster. Every input id appears exactly once (singletons are
    * their own entity).
    */
  def resolveEntities(df: DataFrame, idCol: String, keyCol: String,
                      blockOf: Column => Column, maxEdits: Int): DataFrame = {
    val pairs = fuzzyJoin(df, idCol, keyCol, df, idCol, keyCol, blockOf, maxEdits)
      .filter(col("l_id") < col("r_id"))
      .select(col("l_id").as("id1"), col("r_id").as("id2"))
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as("_cc_id"), col("component").as("_cc_component"))
    df.select(col(idCol).cast("long").as(idCol))
      .join(comp, col(idCol) === col("_cc_id"), "left")
      .select(col(idCol), coalesce(col("_cc_component"), col(idCol)).as("entity_id"))
  }
}
