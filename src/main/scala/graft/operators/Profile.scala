package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Per-column table profiling (the data-quality scan every ingest
  * pipeline runs before training): row count, null count, distinct
  * count, and min/max rendered as strings.
  *
  * Two variants with the standard exactness/scale trade:
  *   - [[profileExact]]: one job; the multi-column `count(DISTINCT ...)`
  *     rewrites to an Expand (input replicated x ncols before the
  *     aggregate) — exact, fine to a few hundred GB, and the form the
  *     DuckDB oracle can mirror.
  *   - [[profileApprox]]: one pass, NO Expand — HLL sketches
  *     (`approx_count_distinct`, rsd 2%) for distinct counts. This is
  *     the 100 TB path: linear scan, map-side partials, constant state
  *     per column.
  * Both collect exactly one aggregate row to the driver and emit one
  * output row per column.
  */
object Profile {

  private val outSchema = StructType(Seq(
    StructField("col_name", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("ndv", LongType, nullable = false),
    StructField("min_str", StringType, nullable = true),
    StructField("max_str", StringType, nullable = true)))

  private def build(df: DataFrame, distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    val cols = df.columns.toSeq
    val aggs = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      Seq(
        count(col(s"`$c`")).as(s"_cnt_$c"),
        distinctAgg(c).as(s"_ndv_$c"),
        min(col(s"`$c`")).cast("string").as(s"_min_$c"),
        max(col(s"`$c`")).cast("string").as(s"_max_$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("_n")
    val rows = cols.map { c =>
      Row(c, n, n - r.getAs[Long](s"_cnt_$c"), r.getAs[Long](s"_ndv_$c"),
        r.getAs[String](s"_min_$c"), r.getAs[String](s"_max_$c"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), outSchema)
  }

  /** Exact profile (Expand-based distinct counts; oracle-comparable). */
  def profileExact(df: DataFrame): DataFrame =
    build(df, c => countDistinct(col(s"`$c`")))

  /** Equi-width histogram of a numeric column: `nBins` buckets over
    * [min, max], bucket i covering [min + i·w, min + (i+1)·w) with
    * w = (max−min)/nBins and the max value folded into the last bucket.
    * Returns (bucket, lo, hi, n) with empty buckets omitted.
    *
    * Shape: one scan for the global (min, max) 1-row aggregate,
    * broadcast back over a second scan that buckets and hash-aggregates
    * on ≤ nBins keys — map-side combine collapses every partition to at
    * most nBins rows, so the shuffle is O(nBins·partitions) regardless
    * of input size. Both scans are column-pruned to `valueCol`. The
    * bucket arithmetic (floor((v−min)·nBins/(max−min)), same
    * association order) is replayed verbatim by SQL oracles: every op
    * is an exact IEEE double op, so bucketing agrees cross-engine.
    * Degenerate case max = min → single bucket 0.
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val v = col(valueCol).cast("double")
    val bounds = df.filter(v.isNotNull)
      .agg(min(v).as("_mn"), max(v).as("_mx"))
    val bucket = when(col("_mx") === col("_mn"), lit(0L))
      .otherwise(least(
        floor((v - col("_mn")) * nBins / (col("_mx") - col("_mn"))).cast("long"),
        lit(nBins - 1L)))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(bounds))
      .groupBy(bucket.as("bucket"), col("_mn"), col("_mx"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (col("_mn") + col("bucket") * (col("_mx") - col("_mn")) / nBins).as("lo"),
        (col("_mn") + (col("bucket") + 1) * (col("_mx") - col("_mn")) / nBins).as("hi"),
        col("n"))
  }

  /** Per-group Tukey-fence outlier flags: a value is an outlier when it
    * falls outside [q1 − k·IQR, q3 + k·IQR] of ITS group — the standard
    * robust screen for broken sensors / bad parses before aggregation.
    *
    * Shape: one group-keyed aggregation computes the two exact
    * interpolated quartiles (group-count-bounded output), broadcast or
    * hash re-joined over the rows for the flag — two passes, no window,
    * no global sort. Cross-engine note: the fences involve interpolated
    * quartiles and one multiply, so engines can differ in the last ulp;
    * a value would have to land within that ulp of a fence to flip a
    * flag (none do in the synthetic corpus — the comparison-only output
    * keeps the fence values themselves out of the result).
    */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  idCol: String, k: Double = 1.5): DataFrame = {
    require(k > 0, "k must be positive")
    val v = col(valueCol).cast("double")
    val th = df.filter(v.isNotNull).groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.25D)").as("_q1"),
        expr(s"percentile($valueCol, 0.75D)").as("_q3"))
    df.filter(v.isNotNull)
      .join(th, groupCol)
      .withColumn("is_outlier",
        v < col("_q1") - (col("_q3") - col("_q1")) * k ||
          v > col("_q3") + (col("_q3") - col("_q1")) * k)
      .select(col(groupCol), col(idCol), v.as("value"), col("is_outlier"))
  }

  /** Single-pass approximate profile (HLL distinct counts, rsd 2%). */
  def profileApprox(df: DataFrame): DataFrame =
    build(df, c => approx_count_distinct(col(s"`$c`"), 0.02))

  /** Percentile-rank (cume_dist) transform WITHOUT a global sort-window:
    * pct_rank(v) = #{rows ≤ v} / n — the rank-normalization feature
    * transform (quality-score calibration, curriculum ordering). A
    * `cume_dist() OVER (ORDER BY v)` would single-task the table; here
    * the exact CDF comes from the bounded distinct-value count table
    * (map-side-combined; the window runs over values, not rows) and
    * re-attaches by an AQE-chosen join on the value — ties share one
    * CDF row, so equal values always get equal ranks.
    *
    * Cross-engine exactness: the rank is one integer-over-integer
    * double division rounded at 6 dp.
    */
  def percentileRank(df: DataFrame, idCol: String, valueCol: String): DataFrame =
    percentileRankBy(df, idCol, valueCol, Nil)

  /** [[percentileRank]] within groups: pct_rank relative to the row's
    * OWN group distribution (per-language length calibration, per-source
    * quality normalization). Same bounded distinct-value CDF shape —
    * the window partitions by (group), ordered over the group's
    * distinct VALUES (never its rows), and the re-attach joins on
    * (group, value) with AQE choosing the strategy.
    */
  def percentileRankBy(df: DataFrame, idCol: String, valueCol: String,
                       groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    // the CDF side renames its group keys (_g0.._gn): it derives from
    // `df` itself, and a join back on the shared names would be an
    // ambiguous self-join
    val gAlias = groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"_g$i") }
    val gRef = groupCols.indices.map(i => col(s"_g$i"))
    val counts = df.filter(v.isNotNull).groupBy(gAlias :+ v.as("_v"): _*)
      .agg(count(lit(1)).as("_cnt"))
    val cum = Window.partitionBy(gRef: _*).orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(gRef: _*)
    val cdf = counts
      .withColumn("_cum", sum("_cnt").over(cum))
      .withColumn("_tot", sum("_cnt").over(tot))
      .select(gRef ++ Seq(col("_v"), col("_cum"), col("_tot")): _*)
    df.filter(v.isNotNull)
      .join(cdf, groupCols.zipWithIndex
        // <=> (null-safe): NULL-group rows must rank within their own
        // partition, matching SQL window cume_dist semantics — a plain
        // === would silently drop them from the output
        .map { case (c, i) => df(c) <=> col(s"_g$i") }
        .foldLeft(v === col("_v"))(_ && _))
      .select(Seq(df(idCol)) ++ groupCols.map(df(_)) ++ Seq(v.as("value"),
        round(col("_cum").cast("double") / col("_tot"), 6).as("pct_rank")): _*)
  }

  /** Winsorize a numeric column at the [loBp, hiBp] basis-point
    * percentiles (100 bp = 1%): values below the loBp-th percentile
    * clip up to it, values above the hiBp-th clip down — the standard
    * heavy-tail taming step before moment-based statistics or model
    * features (unlike trimming, every row survives).
    *
    * Percentile definition: the smallest value whose cumulative count
    * reaches the target mass (inverted-CDF / "lower" interpolation) —
    * always an OBSERVED value, integer-exact, no cross-engine float
    * interpolation. Shape: one map-side-combined distinct-value count,
    * one cumulative window over that bounded table (single partition BY
    * DESIGN — distinct values, not rows), a 1-row edge frame broadcast
    * back over the data. The full-data passes are the count and the
    * final clip — both linear, no global sort of the rows themselves
    * (ntile would sort all 100 TB).
    *
    * Values canonicalize to DECIMAL(18, `scale`) micro-units (a raw
    * long cast would TRUNCATE fractional inputs — a (0,1) score column
    * would collapse to one distinct value 0); outputs are doubles at
    * the original scale. Capacity |v| < 10^(18−scale−…): with the
    * default scale 6, |v| < 10^12.
    */
  def winsorize(df: DataFrame, idCol: String, valueCol: String,
                loBp: Int, hiBp: Int, scale: Int = 6): DataFrame = {
    require(0 <= loBp && loBp < hiBp && hiBp <= 10000,
      "basis points must satisfy 0 <= loBp < hiBp <= 10000")
    import org.apache.spark.sql.expressions.Window
    val unitsPerValue = math.pow(10, scale)
    val v = (expr(s"try_cast(`$valueCol` AS decimal(18,$scale))") *
      lit(java.math.BigDecimal.valueOf(unitsPerValue.toLong))).cast("long")
    val counts = df.filter(v.isNotNull).groupBy(v.as("_v"))
      .agg(count(lit(1)).as("_n"))
    val cum = Window.orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cross-scaled integer compare (cum·10⁴ ≥ bp·total): exact at any
    // scale under DECIMAL(38,0), no double percent arithmetic
    val scaled = counts
      .withColumn("_cum", sum("_n").over(cum).cast("decimal(38,0)") * 10000)
      .withColumn("_tot",
        sum("_n").over(Window.partitionBy()).cast("decimal(38,0)"))
    val edges = scaled.agg(
      min(when(col("_cum") >= col("_tot") * loBp, col("_v"))).as("_lo"),
      min(when(col("_cum") >= col("_tot") * hiBp, col("_v"))).as("_hi"))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(edges))
      .select(col(idCol),
        (v.cast("double") / unitsPerValue).as("value"),
        (least(greatest(v, col("_lo")), col("_hi")).cast("double") /
          unitsPerValue).as("winsorized"))
  }

  /** Key-skew profile: the top-`topN` heaviest keys with their share of
    * the table, plus the Shannon entropy of the whole key distribution
    * and its normalized form (entropy / ln(#keys) ∈ [0,1]) — the first
    * thing to check before choosing a partition/join key (normalized
    * entropy near 1 ⇒ uniform, safe; near 0 ⇒ a few keys dominate,
    * expect stragglers and reach for salting or a broadcast).
    *
    * Shape: one map-side-combined count per key; every later stage
    * (entropy fold, total, top-N) runs over the COUNT table (bounded by
    * key cardinality, not rows) — the top-N is TakeOrderedAndProject
    * (per-partition heaps) and the two 1-row summaries broadcast back.
    * Cross-engine exactness: per-key entropy contributions
    * −(c/t)·ln(c/t) are one fixed double expression rounded at 6 dp and
    * folded through an EXACT decimal sum, so key order cannot move the
    * statistic; shares and the normalized entropy round at 6 dp.
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN > 0, "topN must be positive")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum("cnt").as("_tot"), count(lit(1)).as("_k"))
    val p = col("cnt").cast("double") / col("_tot")
    val ent = counts.crossJoin(broadcast(tot))
      .select(round(-p * log(p), 6).as("_contrib"))
      .agg(sum(col("_contrib").cast("decimal(18,6)")).cast("double").as("_ent"))
    counts.crossJoin(broadcast(tot))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
      .crossJoin(broadcast(ent))
      .select(col("key"), col("cnt"), round(p, 6).as("share"),
        col("_k").as("n_keys"), col("_ent").as("entropy"),
        when(col("_k") > 1, round(col("_ent") / log(col("_k").cast("double")), 6))
          .as("norm_entropy"))
  }

  /** Equi-depth binning + per-bin stats WITHOUT ntile's global sort:
    * ntile(n) OVER (ORDER BY v) single-partitions the table, so instead
    * the bin edges come from the exact distinct-value CDF — one bounded
    * aggregation collapses the data to (value, count) pairs (map-side
    * combined; output bounded by value cardinality, the right shape for
    * the discrete metrics curricula bin on), a window over that bounded
    * set derives edge_i = min{v : cum · n >= i · total}, and bin(v) =
    * #{edges < v} assigns bins via a broadcast of the (n-1)-row edge
    * list. Rows with equal values always land in the same bin (which
    * ntile does NOT guarantee), bins differ in size only through ties,
    * and the whole construction is integer-exact and engine-replayable.
    *
    * Returns one row per bin: (bin, n_rows, min_v, max_v, avg_v) with
    * avg as an exact DECIMAL sum divided once, rounded at 6 dp.
    */
  def quantileBins(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins > 1, "nBins must be > 1")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    val counts = df.filter(v.isNotNull).groupBy(v.as("v"))
      .agg(count(lit(1)).as("n"))
    val cum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val edges = counts
      .withColumn("cum", sum("n").over(cum))
      .withColumn("tot", sum("n").over(Window.partitionBy()))
      .select(col("v"), col("cum"), col("tot"))
      .join(broadcast(df.sparkSession.range(1, nBins).select(col("id").as("i"))),
        col("cum") * nBins >= col("i") * col("tot"))
      .groupBy("i").agg(min("v").as("edge"))
      .select("edge")
    val edgeList = array_sort(collect_list("edge"))
    val edgeDf = edges.agg(edgeList.as("_edges"))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(edgeDf))
      .withColumn("bin",
        aggregate(col("_edges"), lit(0),
          (acc, e) => acc + when(v > e, 1).otherwise(0)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"), min(v).as("min_v"), max(v).as("max_v"),
        round(sum(v.cast("decimal(18,2)")).cast("double") / count(lit(1)), 6)
          .as("avg_v"))
  }

  /** Co-missingness patterns (R's `md.pattern` for a data lake): one
    * row per observed NULL-combination of `cols`, with count and share.
    * Missingness is rarely independent across columns — the pattern
    * table is how you see that (e.g. `value,props` missing TOGETHER
    * means an upstream join failed, not two flaky fields), which
    * decides impute-vs-drop before training.
    *
    * Shape: one grouped aggregation to at most 2^|cols| pattern rows
    * (cap |cols| ≤ 12 — the guard keeps the pattern space bounded);
    * the share folds from a window over that bounded table.
    */
  def missingnessPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 12,
      s"missingnessPatterns: ${cols.size} columns — the pattern space " +
        "is 2^|cols|; profile at most 12 at a time")
    val pattern = concat_ws(",",
      cols.map(c => when(col(c).isNull, lit(c))): _*)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    df.groupBy(when(pattern === "", lit("(complete)")
      ).otherwise(pattern).as("missing_cols"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        round(col("n").cast("double") / sum("n").over(all), 6))
  }
}
