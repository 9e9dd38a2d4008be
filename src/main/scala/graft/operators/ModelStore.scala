package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Shared persistence shape for model-sized parquet artifacts (PQ
  * codebooks, IVF centroids, BPE merge tables): a single file — the
  * payloads are kilobytes — with overwrite semantics on save, and a
  * driver-side collect on load (models are driver objects by design;
  * sort-order reconstruction stays with each caller, whose key shape
  * differs).
  */
private[graft] object ModelStore {

  def save(df: DataFrame, path: String): Unit =
    df.repartition(1).write.mode("overwrite").parquet(path)

  def loadRows(spark: SparkSession, path: String, cols: String*): Array[Row] =
    spark.read.parquet(path).select(cols.head, cols.tail: _*).collect()
}
