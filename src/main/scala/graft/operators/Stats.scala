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
    * Shape: ONE aggregation computes every first/second moment with
    * map-side partial combine; exactly one 1-row collect, and the k×k
    * output is built driver-side (model-sized, like the profile
    * operators). At 100 TB this is a single linear scan; no shuffle
    * wider than the moment vector.
    *
    * Exactness: values are canonicalized to DECIMAL(precision, scale)
    * (double→decimal cast parity is the repo-wide oracle pattern) and
    * every moment accumulates as EXACT integer component sums (see the
    * limb-split note in the body), so sums and cross-sums are exact and
    * r = (n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx²) · sqrt(n·Syy − Sy²))
    * is evaluated in double with one fixed operation order from those
    * exact moments — bit-reproducible across engines and across any
    * partitioning, then rounded at 6 dp (the last-ulp guard).
    * Degenerate (zero-variance) columns yield NULL r.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String],
                 precision: Int = 9, scale: Int = 2): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    require(precision <= 9,
      "precision > 9 breaks the exact split-long accumulation bounds")
    val spark = df.sparkSession
    val dec = s"decimal($precision,$scale)"
    // Canonicalize each column ONCE (the double→decimal cast is the
    // expensive op), then accumulate every moment as LONG sums: a
    // cross-product of two ≤10^9-unit values needs 128-bit headroom
    // that decimal aggregates buy with per-row variable-length buffer
    // rewrites (~10x the scan cost, measured at 10x sf0.1), so instead
    // each unit value splits into three 10-bit limbs u = a·2^20 + b·2^10
    // + c and every moment is reassembled driver-side from EXACT long
    // component sums — integer arithmetic, so partitioning/order cannot
    // change a bit, and all 63 aggregates (for 4 columns) sit in the
    // codegen'd mutable-buffer fast path. Largest per-row component is
    // 3·2^20, giving ~2^41 (≈ 2·10^12) row capacity at precision 9.
    // the 10^scale factor as a typed narrow decimal literal: a long
    // literal would promote the product past precision 18 and off the
    // compact (long-backed) decimal fast path
    val tenScale = lit(java.math.BigDecimal.valueOf(math.pow(10, scale).toLong))
    val clean = df.filter(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        (col(c).cast(dec) * tenScale).cast("long").as(c)): _*)
    // limb extraction: / on longs is double division in Spark SQL, but
    // |u| ≤ 10^9 < 2^53 so u/2^k is exact and the long cast truncates
    // toward zero consistently for both signs
    def limbA(c: String): Column = (col(c) / (1L << 20)).cast("long")
    def limbB(c: String): Column =
      ((col(c) - limbA(c) * (1L << 20)) / (1L << 10)).cast("long")
    def limbC(c: String): Column =
      col(c) - limbA(c) * (1L << 20) - limbB(c) * (1L << 10)
    val pairs = for {
      i <- cols.indices; j <- i until cols.size
    } yield (cols(i), cols(j))
    // Σx·y components by power of 2^10: (aa)·2^40 + (ab+ba)·2^30 +
    // (ac+bb+ca)·2^20 + (bc+cb)·2^10 + cc
    def pairAggs(a: String, b: String): Seq[Column] = Seq(
      sum(limbA(a) * limbA(b)).as(s"_p4_${a}_$b"),
      sum(limbA(a) * limbB(b) + limbB(a) * limbA(b)).as(s"_p3_${a}_$b"),
      sum(limbA(a) * limbC(b) + limbB(a) * limbB(b) + limbC(a) * limbA(b))
        .as(s"_p2_${a}_$b"),
      sum(limbB(a) * limbC(b) + limbC(a) * limbB(b)).as(s"_p1_${a}_$b"),
      sum(limbC(a) * limbC(b)).as(s"_p0_${a}_$b"))
    def colAggs(c: String): Seq[Column] = Seq(
      sum(limbA(c)).as(s"_s2_$c"), sum(limbB(c)).as(s"_s1_$c"),
      sum(limbC(c)).as(s"_s0_$c"))
    val aggs = Seq(count(lit(1)).as("_n")) ++ cols.flatMap(colAggs) ++
      pairs.flatMap((pairAggs _).tupled)
    val r = clean.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("_n").toDouble
    def bd(name: String): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(Option(r.getAs[java.lang.Long](name))
        .map(_.longValue).getOrElse(0L))
    def shifted(name: String, bits: Int): java.math.BigDecimal =
      bd(name).multiply(java.math.BigDecimal.valueOf(2).pow(bits))
    val unit = java.math.BigDecimal.ONE.movePointLeft(scale)
    // Σx in value units, exactly: (Σa·2^20 + Σb·2^10 + Σc)·10^-scale
    def sd(c: String): Double =
      shifted(s"_s2_$c", 20).add(shifted(s"_s1_$c", 10)).add(bd(s"_s0_$c"))
        .multiply(unit).doubleValue
    def pd(a: String, b: String): Double =
      shifted(s"_p4_${a}_$b", 40).add(shifted(s"_p3_${a}_$b", 30))
        .add(shifted(s"_p2_${a}_$b", 20)).add(shifted(s"_p1_${a}_$b", 10))
        .add(bd(s"_p0_${a}_$b"))
        .multiply(unit).multiply(unit).doubleValue
    val out = for {
      i <- cols.indices; j <- (i + 1) until cols.size
      a = cols(i); b = cols(j)
    } yield {
      val sx = sd(a); val sy = sd(b)
      val sxx = pd(a, a); val syy = pd(b, b)
      val sxy = pd(a, b)
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


  /** Welch's unequal-variance t-test between every pair of groups —
    * the segment-comparison screen (A/B readouts, cohort differences)
    * that does not assume equal variances. Returns one row per ordered
    * group pair (g1 < g2): (g1, g2, n1, n2, mean1, mean2, t, df_w)
    * with the Welch–Satterthwaite degrees of freedom.
    *
    * Shape: ONE grouped aggregation computes exact per-group moments —
    * count plus the same three-limb long component sums as
    * [[corrMatrix]] (all on the codegen mutable-buffer fast path; one
    * scan at any scale) — the bounded group table collects to the
    * driver (guarded at 1000 groups: a t-test compares named cohorts,
    * not a high-cardinality key), and the pair table is built there.
    *
    * Exactness: moments reassemble exactly from the integer component
    * sums, then mean/variance/t/df evaluate in double with one fixed
    * operation order — bit-reproducible across engines and across any
    * partitioning — and round at 6 dp. Values canonicalize to
    * DECIMAL(precision, scale) first (scale 2 default; lossless for
    * 2-dp measures). Groups with n < 2 are dropped (variance needs
    * n−1); a zero pooled standard error yields NULL t/df.
    */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
             precision: Int = 9, scale: Int = 2): DataFrame = {
    require(precision <= 9,
      "precision > 9 breaks the exact split-long accumulation bounds")
    val spark = df.sparkSession
    val dec = s"decimal($precision,$scale)"
    val tenScale = lit(java.math.BigDecimal.valueOf(math.pow(10, scale).toLong))
    val clean = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        (col(valueCol).cast(dec) * tenScale).cast("long").as("u"))
    def limbA: Column = (col("u") / (1L << 20)).cast("long")
    def limbB: Column = ((col("u") - limbA * (1L << 20)) / (1L << 10)).cast("long")
    def limbC: Column = col("u") - limbA * (1L << 20) - limbB * (1L << 10)
    val grouped = clean.groupBy("g").agg(
      count(lit(1)).as("_n"),
      sum(limbA).as("_s2"), sum(limbB).as("_s1"), sum(limbC).as("_s0"),
      sum(limbA * limbA).as("_p4"),
      sum(limbA * limbB + limbB * limbA).as("_p3"),
      sum(limbA * limbC + limbB * limbB + limbC * limbA).as("_p2"),
      sum(limbB * limbC + limbC * limbB).as("_p1"),
      sum(limbC * limbC).as("_p0"))
    val rows = grouped.limit(1001).collect()
    require(rows.length <= 1000,
      "welchT compares named cohorts; >1000 groups looks like a key column")
    val unit = java.math.BigDecimal.ONE.movePointLeft(scale)
    def two(bits: Int) = java.math.BigDecimal.valueOf(2).pow(bits)
    case class G(g: String, n: Long, s: Double, p: Double)
    val gs = rows.map { r =>
      def bd(f: String) = java.math.BigDecimal.valueOf(r.getAs[Long](f))
      val s = bd("_s2").multiply(two(20)).add(bd("_s1").multiply(two(10)))
        .add(bd("_s0")).multiply(unit).doubleValue
      val p = bd("_p4").multiply(two(40)).add(bd("_p3").multiply(two(30)))
        .add(bd("_p2").multiply(two(20))).add(bd("_p1").multiply(two(10)))
        .add(bd("_p0")).multiply(unit).multiply(unit).doubleValue
      G(r.getAs[String]("g"), r.getAs[Long]("_n"), s, p)
    }.filter(_.n >= 2).sortBy(_.g)
    def r6(v: Double): Double = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val out = for {
      i <- gs.indices; j <- (i + 1) until gs.length
      g1 = gs(i); g2 = gs(j)
    } yield {
      // fixed op order, mirrored verbatim by the SQL oracle
      val mean1 = g1.s / g1.n; val mean2 = g2.s / g2.n
      val var1 = (g1.n * g1.p - g1.s * g1.s) / (g1.n * (g1.n - 1)).toDouble
      val var2 = (g2.n * g2.p - g2.s * g2.s) / (g2.n * (g2.n - 1)).toDouble
      val a = var1 / g1.n; val b = var2 / g2.n
      val (t, dfw): (java.lang.Double, java.lang.Double) =
        if (a + b <= 0.0) (null, null)
        else (r6((mean1 - mean2) / math.sqrt(a + b)),
          r6((a + b) * (a + b) / (a * a / (g1.n - 1) + b * b / (g2.n - 1))))
      Row(g1.g, g2.g, g1.n, g2.n, r6(mean1), r6(mean2), t, dfw)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("g1", StringType, nullable = false),
        StructField("g2", StringType, nullable = false),
        StructField("n1", LongType, nullable = false),
        StructField("n2", LongType, nullable = false),
        StructField("mean1", DoubleType, nullable = false),
        StructField("mean2", DoubleType, nullable = false),
        StructField("t", DoubleType, nullable = true),
        StructField("df_w", DoubleType, nullable = true))))
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
