package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables.t
    val dir = "/root/testdata/sf0.1"
    val clean = t(spark, dir, "part").select(col("p_partkey"),
      concat(lower(col("p_name")), lit(" #"), col("p_partkey")).as("nm"))
    val dirty = clean.select(col("p_partkey").as("d_key"),
      when(col("p_partkey") % 5 === 0, concat(lit("x"), expr("substr(nm, 2)")))
        .otherwise(col("nm")).as("nm"))
    // replicate editJoin key generation, count raw key matches
    val e = 1; val k = 2
    def base(n: org.apache.spark.sql.Column) = floor(n / lit(k)).cast("int")
    def rem(n: org.apache.spark.sql.Column) = (n % lit(k)).cast("int")
    def segLen(i: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      base(n) + when(i >= lit(k) - rem(n), lit(1)).otherwise(lit(0))
    def segStart(i: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      i * base(n) + greatest(i - (lit(k) - rem(n)), lit(0))
    val l = dirty.select(col("d_key").as("l_id"), col("nm").as("l_key"))
      .withColumn("n", length(col("l_key"))).filter(col("n") >= k)
      .withColumn("i", explode(sequence(lit(0), lit(e))))
      .withColumn("seg", col("l_key").substr(segStart(col("i"), col("n")) + 1, segLen(col("i"), col("n"))))
    val r = clean.select(col("p_partkey").as("r_id"), col("nm").as("r_key"))
      .withColumn("rl", length(col("r_key")))
      .withColumn("n2", explode(sequence(col("rl") - e, col("rl") + e)))
      .filter(col("n2") >= k)
      .withColumn("i2", explode(sequence(lit(0), lit(e))))
      .withColumn("d", explode(sequence(lit(-e), lit(e))))
      .withColumn("s", segStart(col("i2"), col("n2")) + col("d"))
      .withColumn("sl", segLen(col("i2"), col("n2")))
      .filter(col("s") >= 0 && col("s") + col("sl") <= col("rl"))
      .withColumn("seg2", col("r_key").substr(col("s") + 1, col("sl")))
    val t0 = System.nanoTime()
    val raw = l.join(r, col("n") === col("n2") && col("i") === col("i2") && col("seg") === col("seg2"))
      .count()
    println(f"raw key matches: $raw, ${(System.nanoTime()-t0)/1e9}%.2f s")
    val t1 = System.nanoTime()
    val lcount = l.count(); val rcount = r.count()
    println(f"left keys: $lcount, right keys: $rcount, ${(System.nanoTime()-t1)/1e9}%.2f s")
  }
}
