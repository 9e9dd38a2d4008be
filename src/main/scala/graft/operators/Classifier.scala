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
  * the cluster. Each GD iteration is ONE pass: the per-row residual
  * (sigmoid(w.x) - y) multiplies into the exploded feature positions and
  * reduces through a map-side-combined aggregation keyed on the feature
  * index — at most dim+1 groups, so the shuffle is model-sized at any
  * corpus size. Prediction is a narrow codegen'd pass (the weight vector
  * rides in the [[graft.functions.DotProduct]] kernel's plan).
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

  private def marginCol(vec: Column, w: Array[Double]): Column =
    graft.functions.DotProduct(augmented(vec), array(w.map(lit): _*))

  /** Fit logistic weights (bias first) by full-batch GD: up to `iters`
    * passes at learning rate `lr` (scaled by 1/n), stopping early when
    * the mean-gradient norm drops under `tol` (each pass is a full
    * corpus scan — not spending passes after convergence matters at
    * 100 TB). `labelCol` must be 0/1.
    */
  def fitLogistic(df: DataFrame, vecCol: String, labelCol: String,
                  iters: Int = 30, lr: Double = 5.0,
                  tol: Double = 1e-4): Array[Double] = {
    require(iters >= 1 && lr > 0, "iters >= 1, lr > 0")
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    var w = new Array[Double](dim + 1)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val resid = (lit(1.0) / (lit(1.0) + exp(-marginCol(col(vecCol), w)))) -
        col(labelCol).cast("double")
      val stats = df
        .select(resid.as("r"), posexplode(augmented(col(vecCol))).as(Seq("i", "x")))
        .groupBy("i").agg(sum(col("r") * col("x")).as("g"), count(lit(1)).as("n"))
        .collect() // dim+1 rows: model-sized, never corpus-sized
      val n = stats.head.getAs[Long]("n").toDouble
      var gNorm2 = 0.0
      stats.foreach { row =>
        val i = row.getInt(0)
        val gi = row.getAs[Double]("g") / n
        w(i) -= lr * gi
        gNorm2 += gi * gi
      }
      converged = math.sqrt(gNorm2) < tol
      it += 1
    }
    w
  }

  /** Narrow scoring pass: (idCol, margin, pred) with pred = margin > 0. */
  def predictLogistic(df: DataFrame, idCol: String, vecCol: String,
                      w: Array[Double]): DataFrame =
    df.select(col(idCol), marginCol(col(vecCol), w).as("margin"),
      (marginCol(col(vecCol), w) > 0).as("pred"))
}
