package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading helpers for the driver-provided testdata layout
  * (TESTDATA.md: one `<name>.parquet` per table under a scale-factor dir).
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has carried two `ts` encodings across driver drops:
    * TIMESTAMP(NANOS) (which Spark's Parquet reader only accepts as a
    * nanos-since-epoch Long under the legacy flag) and TIMESTAMP(MICROS)
    * (read natively, as NTZ when isAdjustedToUTC=false). Normalize either
    * to a session-TZ TimestampType column — identical instants under the
    * UTC session timezone every entrypoint sets.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
