package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading helpers for the driver-provided testdata layout
  * (TESTDATA.md: one `<name>.parquet` per table under a scale-factor dir).
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's Parquet reader
    * rejects; read `ts` as nanos-since-epoch Long and convert to a
    * microsecond timestamp column.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
