package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier trained with distributed batch gradient
  * descent — the "small linear model over cheap features, applied to
  * everything" pattern behind fastText-style corpus quality filters
  * (features from [[TextAnalysis.qualityFeatures]], weak labels from a
  * curated seed set), rebuilt Spark-first.
  *
  * Same design point as [[Similarity.kmeansFitDistributed]]: the MODEL
  * (a dim+1 weight vector) lives on the driver, the DATA never leaves
  * the cluster. The projected feature frame (features + label only, not
  * the source rows) is persisted MEMORY_AND_DISK across iterations —
  * the standard iterative-training layout (MLlib warns when its GD input
  * is uncached); at 100 TB the projection is the narrow slice actually
  * trained on and spills to local disk rather than re-reading the
  * source. Each GD iteration is ONE pass: for moderate dims the
  * gradient is dim+1 column sums in a single two-stage (partial/final)
  * 1-row aggregate — no explode, no keyed shuffle; past `WideAggMaxDim`
  * it falls back to exploding feature positions into a
  * map-side-combined aggregation with at most dim+1 groups. Either way
  * the reduction is model-sized at any corpus size. Prediction is a
  * narrow codegen'd pass (the weight vector rides in the
  * [[graft.functions.DotProduct]] kernel's plan).
  *
  * Deterministic given the data up to float-sum order (~1e-13 in the
  * gradient); predictions are stable wherever |w.x| exceeds that, so a
  * margin-filtered evaluation is layout-independent.
  */
object Classifier {

  /** Augment features with the leading 1.0 bias term (codegen'd array
    * cast, no interpreted HOF lambda in the per-row path).
    */
  private def augmented(vec: Column): Column =
    concat(array(lit(1.0)), vec.cast("array<double>"))

  /** w rides as ONE array literal (a codegen reference object), not
    * dim+1 inlined scalar literals: the generated source is then
    * byte-identical across GD iterations, so the codegen cache reuses
    * the compiled class instead of paying a Janino compile per step.
    */
  private def marginCol(vec: Column, w: Array[Double]): Column =
    graft.functions.DotProduct(augmented(vec), typedlit(w.toSeq))

  /** Fit logistic weights (bias first) by full-batch GD: up to `iters`
    * passes at learning rate `lr` (scaled by 1/n), stopping early when
    * the mean-gradient norm drops under `tol` (each pass is a full
    * corpus scan — not spending passes after convergence matters at
    * 100 TB). `labelCol` must be 0/1.
    */
  /** Past this dimension, one agg row of dim+1 sum columns stops being
    * the cheap plan (codegen width, row size) and the exploded
    * model-sized groupBy takes over.
    */
  val WideAggMaxDim = 256

  def fitLogistic(df: DataFrame, vecCol: String, labelCol: String,
                  iters: Int = 30, lr: Double = 5.0,
                  tol: Double = 1e-4): Array[Double] = {
    require(iters >= 1 && lr > 0, "iters >= 1, lr > 0")
    val feats = df
      .select(col(vecCol).cast("array<double>").as("_x"),
        col(labelCol).cast("double").as("_y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = feats.select(size(col("_x"))).head().getInt(0)
      var w = new Array[Double](dim + 1)
      var it = 0
      var converged = false
      while (it < iters && !converged) {
        val resid = (lit(1.0) / (lit(1.0) + exp(-marginCol(col("_x"), w)))) -
          col("_y")
        // per-iteration gradient, accumulated (g_0..g_dim, n) on the driver
        val grads = new Array[Double](dim + 1)
        var n = 0.0
        if (dim + 1 <= WideAggMaxDim) {
          // single 1-row aggregate: g_i = sum(r * x_i), bias x_0 = 1
          val sums = sum(col("_r")).as("_g0") +:
            (1 to dim).map(i =>
              sum(col("_r") * element_at(col("_x"), i)).as(s"_g$i")) :+
            count(lit(1)).as("_n")
          val row = feats.select(resid.as("_r"), col("_x"))
            .agg(sums.head, sums.tail: _*).head()
          n = row.getAs[Long]("_n").toDouble
          var i = 0
          while (i <= dim) { grads(i) = row.getDouble(i); i += 1 }
        } else {
          val stats = feats
            .select(resid.as("r"), posexplode(augmented(col("_x"))).as(Seq("i", "x")))
            .groupBy("i").agg(sum(col("r") * col("x")).as("g"), count(lit(1)).as("n"))
            .collect() // dim+1 rows: model-sized, never corpus-sized
          n = stats.head.getAs[Long]("n").toDouble
          stats.foreach(row => grads(row.getInt(0)) = row.getAs[Double]("g"))
        }
        var gNorm2 = 0.0
        var i = 0
        while (i <= dim) {
          val gi = grads(i) / n
          w(i) -= lr * gi
          gNorm2 += gi * gi
          i += 1
        }
        converged = math.sqrt(gNorm2) < tol
        it += 1
      }
      w
    } finally { feats.unpersist(); () }
  }

  /** Narrow scoring pass: (idCol, margin, pred) with pred = margin > 0. */
  def predictLogistic(df: DataFrame, idCol: String, vecCol: String,
                      w: Array[Double]): DataFrame =
    df.select(col(idCol), marginCol(col(vecCol), w).as("margin"),
      (marginCol(col(vecCol), w) > 0).as("pred"))

  /** Best single split of a numeric feature against a binary label —
    * the CART stump / feature-screening primitive: over every distinct
    * feature value v, the weighted Gini impurity of the partition
    * (x ≤ v | x > v), returning the argmin split with both the split
    * and baseline impurities (their gap is the feature's one-split
    * usefulness).
    *
    * Shape: one fold to the distinct-value table, cumulative
    * pos/count windows over it, a TakeOrdered(1) argmin — the corpus
    * never sorts, candidates = distinct values (pre-bin wide-
    * cardinality features; the guard names it). Impurities quantize at
    * 9 dp so the argmin tie-breaks identically (then toward the
    * smaller split) in any engine.
    */
  def bestSplit(df: DataFrame, featureCol: String, label: Column,
                maxCandidates: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(featureCol).cast("double")
    val cells = df.filter(v.isNotNull)
      .groupBy(v.as("_v"))
      .agg(count(lit(1)).as("_c"),
        sum(when(label, 1L).otherwise(0L)).as("_p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val g = cells.agg(count(lit(1)).as("k"), sum("_c").as("n"),
        sum("_p").as("p")).head()
      val (k, n, p) = (g.getLong(0), g.getLong(1), g.getLong(2))
      require(k <= maxCandidates,
        s"bestSplit: $k distinct values > maxCandidates=$maxCandidates " +
          "— bin the feature first (quantile_bins / floor(v/width))")
      require(k >= 2, "bestSplit needs at least 2 distinct values")
      val cum = Window.orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def gini(pos: Column, cnt: Column): Column = {
        val pr = pos.cast("double") / cnt
        lit(1.0) - pr * pr - (lit(1.0) - pr) * (lit(1.0) - pr)
      }
      val nl = sum("_c").over(cum)
      val pl = sum("_p").over(cum)
      val nr = lit(n) - nl
      val pr = lit(p) - pl
      val weighted = round(
        nl.cast("double") / lit(n.toDouble) * gini(pl, nl) +
          nr.cast("double") / lit(n.toDouble) * gini(pr, nr), 9)
      val base = java.math.BigDecimal.valueOf {
        val q = p.toDouble / n
        1.0 - q * q - (1.0 - q) * (1.0 - q)
      }.setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
      val row = cells
        .withColumn("_nl", nl).withColumn("_gini", weighted)
        .filter(col("_nl") < n) // the empty right partition is no split
        .orderBy(col("_gini"), col("_v"))
        .limit(1)
        .select(col("_v"), col("_nl"), col("_gini"))
        .head()
      val spark = df.sparkSession
      import spark.implicits._
      Seq((row.getDouble(0), row.getLong(1), n - row.getLong(1),
        row.getDouble(2), base,
        java.math.BigDecimal.valueOf(base - row.getDouble(2))
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue))
        .toDF("split_value", "n_left", "n_right", "gini_split",
          "gini_base", "gini_gain")
    } finally { cells.unpersist(blocking = false) }
  }
}
