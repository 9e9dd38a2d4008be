package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: salting for hot keys.
  *
  * AQE's skew-join split handles most runtime skew, but salting is the
  * deterministic-plan tool when a key's volume exceeds what one task can
  * hold (the classic null-key / power-law-user problem at 100 TB). Both
  * operators produce results identical to their unsalted equivalents —
  * the salt only changes the partitioning.
  */
object Skew {

  /** Two-phase (salted) aggregation: a partial aggregate over
    * (keys, salt) spreads a hot key over `salts` reducers, then a final
    * aggregate merges the partials. Exposed shape: sum + count of
    * `valueCol` (DECIMAL-exact, rendered as DOUBLE).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(col(valueCol), monotonically_increasing_id()), lit(salts))
    df.withColumn("_salt", salt)
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).cast("double").as("sum_value"),
        sum(col("_pcnt")).as("n"))
  }

  /** Salted equi-join against a small-to-medium right side: the left side
    * gets a per-row salt, the right side is replicated `salts` times, and
    * the join key becomes (keys..., salt) — a single hot left key now
    * lands on `salts` reducers. Join OUTPUT is identical to the plain
    * equi-join; only the exchange layout changes.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*), lit(salts)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(saltedRight, keys :+ "_salt").drop("_salt")
  }

  /** Convenience: a deterministic per-row salt column in [0, salts). */
  def rowSalt(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts))

  /** Skew diagnostics for a prospective join/aggregation key: the
    * `topN` heaviest keys with their share of the table and a suggested
    * salt factor (ceil(key count / mean per-key count) capped at
    * `maxSalt`) — the report a platform runs BEFORE the 100 TB join to
    * decide whether a key needs [[saltedJoin]] or can ride on AQE's
    * skew split. One map-side-combined count aggregation plus a
    * TakeOrdered top-N; the 1-row global stats broadcast back, so
    * nothing but `topN` rows leaves the cluster. Exact integer counts;
    * share rounded 6 dp.
    */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 10,
                 maxSalt: Int = 64): DataFrame = {
    require(topN >= 1 && maxSalt >= 1, "topN and maxSalt must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val stats = counts.agg(sum("n").as("_total"), count(lit(1)).as("_nkeys"))
    counts.crossJoin(broadcast(stats))
      .withColumn("share", round(col("n").cast("double") / col("_total"), 6))
      .withColumn("suggested_salt",
        least(ceil(col("n") * col("_nkeys") / col("_total")), lit(maxSalt.toLong))
          .cast("long"))
      .select(col(keyCol), col("n"), col("share"), col("suggested_salt"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topN)
  }
}
