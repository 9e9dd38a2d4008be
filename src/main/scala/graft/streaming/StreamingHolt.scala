package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One smoothed point emitted by [[StreamingHolt]] — the same columns
  * the batch [[graft.operators.Stats.holtSmooth]] row carries.
  */
final case class HoltOut(
    series_key: String, t: Long, value: Double,
    level: Double, trend: Double,
    fitted: java.lang.Double, residual: java.lang.Double)

private[streaming] final case class HoltState(
    level: Double, trend: Double, nSeen: Long,
    pendingT: Long, pendingV: Double)

/** Streaming twin of [[graft.operators.Stats.holtSmooth]]: per-key Holt
  * level+trend state updated in event order via `mapGroupsWithState`
  * (Update mode) — the live forecast-baseline for thousands of metric
  * series at once, where the batch operator's one-series driver fold
  * cannot go. State is three doubles + a one-point buffer per key
  * (the t₁ row cannot emit until y₂ fixes the initial trend, exactly
  * like the batch init l₁ = y₁, b₁ = y₂ − y₁).
  *
  * Same 9 dp-per-step quantization as the batch operator, so on an
  * in-order stream the emitted trajectory is bit-identical to
  * `holtSmooth` over the same rows (spec-proven). Out-of-order points
  * WITHIN a micro-batch are sorted before folding; across batches the
  * recursion has already consumed its past — feed a watermarked,
  * de-duplicated stream for exact parity (the same in-order trade the
  * other stateful twins document).
  */
object StreamingHolt {

  private def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  def apply(points: DataFrame, alpha: Double, beta: Double,
            keyCol: String = "series_key", tCol: String = "t",
            valueCol: String = "v"): Dataset[HoltOut] = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta in (0,1), got $beta")
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col(keyCol).cast("string").as("k"),
        col(tCol).cast("long").as("t"), col(valueCol).cast("double").as("v"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[HoltState]) => {
          val sorted = rows.map(r => (r._2, r._3)).toSeq.sortBy(_._1)
          val out = Seq.newBuilder[HoltOut]
          var st = state.getOption.getOrElse(HoltState(0, 0, 0L, 0L, 0))
          sorted.foreach { case (t, y) =>
            if (st.nSeen == 0L) {
              // buffer the first point: its trend needs y2
              st = HoltState(0, 0, 1L, t, y)
            } else if (st.nSeen == 1L) {
              val l1 = r9(st.pendingV); val b1 = r9(y - st.pendingV)
              out += HoltOut(key, st.pendingT, st.pendingV, l1, b1, null, null)
              val fitted = r9(l1 + b1)
              val l2 = r9(alpha * y + (1.0 - alpha) * (l1 + b1))
              val b2 = r9(beta * (l2 - l1) + (1.0 - beta) * b1)
              out += HoltOut(key, t, y, l2, b2,
                Double.box(fitted), Double.box(r6(y - fitted)))
              st = HoltState(l2, b2, 2L, 0L, 0)
            } else {
              val fitted = r9(st.level + st.trend)
              val lNew = r9(alpha * y + (1.0 - alpha) * (st.level + st.trend))
              val bNew = r9(beta * (lNew - st.level) + (1.0 - beta) * st.trend)
              out += HoltOut(key, t, y, lNew, bNew,
                Double.box(fitted), Double.box(r6(y - fitted)))
              st = HoltState(lNew, bNew, st.nSeen + 1, 0L, 0)
            }
          }
          state.update(st)
          out.result()
        })
      .flatMap(identity)
  }
}
