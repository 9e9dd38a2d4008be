package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: does AQE partition coalescing apply on the
  * localCheckpoint / .rdd materialization path?
  */
object ProbeCoalesce {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("PROBE_PF", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.range(10000L).selectExpr("id % 100 AS k", "id AS v")
      .groupBy("k").count()
    println(s"[probe] count-path result partitions: " +
      s"${df.queryExecution.toRdd.getNumPartitions}")
    val ck = df.localCheckpoint(eager = true)
    println(s"[probe] localCheckpoint partitions: " +
      s"${ck.rdd.getNumPartitions}")
    val j = ck.join(spark.range(100).toDF("k"), "k").groupBy("k").count()
    println(s"[probe] downstream-of-checkpoint partitions: " +
      s"${j.queryExecution.toRdd.getNumPartitions}")
    spark.stop()
  }
}
