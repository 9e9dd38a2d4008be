package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Statistical screens for feature columns: the pairwise Pearson
  * correlation matrix (redundant-feature detection before training) and
  * the chi-square independence test between two categoricals (leakage /
  * confounding detection). Both are single-aggregation shapes whose
  * floating-point outputs are engine-replayable by construction:
  * the correlation moments accumulate as EXACT decimal sums (order-
  * insensitive, so re-partitioning cannot change a bit) and the final
  * double arithmetic runs once per pair over those exact sums; the
  * chi-square folds per-cell contributions rounded at 6 dp through an
  * exact decimal sum, so the statistic does not depend on cell order.
  */
object Stats {

  /** Pairwise Pearson correlation over `cols` (all cast to double, rows
    * with ANY null in `cols` dropped so every pair sees the same n —
    * the listwise-deletion convention).
    *
    * Shape: ONE aggregation computes every first/second moment —
    * count, per-column sums, and the upper-triangle cross-product sums
    * (k + k(k+1)/2 decimal aggregates for k columns) — with map-side
    * partial combine; exactly one 1-row collect, and the k×k output is
    * built driver-side (model-sized, like the profile operators). At
    * 100 TB this is a single linear scan; no shuffle wider than the
    * moment vector.
    *
    * Exactness: values are canonicalized to DECIMAL(18,4) before any
    * sum (double→decimal cast parity is the repo-wide oracle pattern);
    * sums and cross-sums are therefore EXACT, and
    * r = (n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx²) · sqrt(n·Syy − Sy²))
    * is evaluated in double with one fixed operation order from those
    * exact moments — bit-reproducible across engines, then rounded at
    * 6 dp (the last-ulp guard). Degenerate (zero-variance) columns
    * yield NULL r.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val spark = df.sparkSession
    val dec = "decimal(18,4)"
    val clean = df.filter(cols.map(c => col(c).isNotNull).reduce(_ && _))
    def s(c: String): Column = sum(col(c).cast(dec)).as(s"_s_$c")
    def sxy(a: String, b: String): Column =
      sum(col(a).cast(dec) * col(b).cast(dec)).as(s"_p_${a}_$b")
    val pairs = for {
      i <- cols.indices; j <- i until cols.size
    } yield (cols(i), cols(j))
    val aggs = Seq(count(lit(1)).as("_n")) ++ cols.map(s) ++
      pairs.map { case (a, b) => sxy(a, b) }
    val r = clean.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("_n").toDouble
    def sd(name: String): Double =
      Option(r.getAs[java.math.BigDecimal](name)).map(_.doubleValue).getOrElse(0.0)
    val out = for {
      i <- cols.indices; j <- (i + 1) until cols.size
      a = cols(i); b = cols(j)
    } yield {
      val sx = sd(s"_s_$a"); val sy = sd(s"_s_$b")
      val sxx = sd(s"_p_${a}_$a"); val syy = sd(s"_p_${b}_$b")
      val sxy = sd(s"_p_${a}_$b")
      val den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
      val rr: java.lang.Double =
        if (den == 0.0) null
        else {
          val v = (n * sxy - sx * sy) / den
          // same rounding as Spark's round(col, 6) / DuckDB's round(x, 6)
          // (HALF_UP over the shortest decimal rendering of the double)
          java.math.BigDecimal.valueOf(v)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
        }
      Row(a, b, n.toLong, rr)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("col1", StringType, nullable = false),
        StructField("col2", StringType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("r", DoubleType, nullable = true))))
  }

  /** Chi-square independence test between two categorical columns.
    * Returns one row per observed contingency cell —
    * (rowVal, colVal, observed, expected, contrib) — plus the global
    * statistic and degrees of freedom on every row (broadcast 1-row
    * join), so the output is both the test result and the cell-level
    * diagnostic of WHERE the dependence lives.
    *
    * Shape: one hash aggregation to the observed cell table (bounded by
    * category-pair cardinality, map-side combined), two bounded margin
    * aggregates re-joined by broadcast, one decimal total — no shuffle
    * ever carries more than the cell table. Cross-engine exactness:
    * expected = rowTot·colTot/n and the cell contribution
    * (o−e)²/e are double ops in one fixed order, each rounded at 6 dp;
    * the statistic is the EXACT decimal sum of the rounded
    * contributions, so summation order cannot move it. dof counts
    * OBSERVED margins ((R−1)(C−1)) — absent categories don't get rows.
    */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol).cast("string").as("row_val"),
        col(colCol).cast("string").as("col_val"))
      .agg(count(lit(1)).as("observed"))
    val rowTot = cells.groupBy("row_val").agg(sum("observed").as("_rt"))
    val colTot = cells.groupBy("col_val").agg(sum("observed").as("_ct"))
    val tot = cells.agg(sum("observed").as("_n"),
      countDistinct("row_val").as("_nr"), countDistinct("col_val").as("_nc"))
    val scored = cells
      .join(broadcast(rowTot), "row_val")
      .join(broadcast(colTot), "col_val")
      .crossJoin(broadcast(tot))
      .withColumn("expected",
        round(col("_rt").cast("double") * col("_ct") / col("_n"), 6))
      .withColumn("contrib",
        round((col("observed") - col("expected")) *
          (col("observed") - col("expected")) / col("expected"), 6))
    val stat = scored.agg(
      sum(col("contrib").cast("decimal(18,6)")).cast("double").as("chi2"),
      ((max("_nr") - 1) * (max("_nc") - 1)).as("dof"))
    scored
      .crossJoin(broadcast(stat))
      .select(col("row_val"), col("col_val"), col("observed"),
        col("expected"), col("contrib"), col("chi2"), col("dof"))
  }
}
