package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Left as-of join — an operator Spark's built-ins lack as a unit: for
  * each left row, attach the single latest right row whose time is `<=`
  * the left row's time, matched on equality keys.
  *
  * Implementation is the union-tag-window pattern, the scale-correct
  * formulation: both inputs are tagged and unioned, shuffled ONCE on the
  * join keys, sorted by (time, tag), and the right payload is carried
  * forward with `last(_, ignoreNulls)` over an unbounded-preceding row
  * frame. No range-condition join (which Spark would execute as a
  * broadcast nested loop or an exploding theta join), no per-key
  * collect — skew in either input is handled like any shuffle.
  *
  * Right rows must be unique per (keys, time); pre-aggregate otherwise
  * (ties would make "the" latest row ambiguous). Unmatched left rows keep
  * null right columns (left-join semantics).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String): DataFrame = {
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTime)
    val rightCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    val leftPayloadType = StructType(
      leftCols.map(c => StructField(c, left.schema(c).dataType)))
    val rightPayloadType = StructType(
      StructField("_rt", right.schema(rightTime).dataType) +:
        rightCols.map(c => StructField(c, right.schema(c).dataType)))

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"),
        lit(0).as("_src"),
        struct(col(rightTime).as("_rt") +: rightCols.map(col): _*).as("_rv"),
        lit(null).cast(leftPayloadType).as("_lv")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("_t"),
        lit(1).as("_src"),
        lit(null).cast(rightPayloadType).as("_rv"),
        struct(leftCols.map(col): _*).as("_lv")): _*)

    // right rows sort before left rows at equal time (_src 0 < 1), so the
    // match is inclusive: right.time <= left.time
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("_match", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_src") === 1)
      .select(
        keys.map(col) ++
          Seq(col("_t").as(leftTime)) ++
          leftCols.map(c => col(s"_lv.`$c`").as(c)) ++
          Seq(col("_match._rt").as(s"asof_$rightTime")) ++
          rightCols.map(c => col(s"_match.`$c`").as(c)): _*)
  }
}
