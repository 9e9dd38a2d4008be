// scratch driver for manual verification (not part of the library)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.CanonicalRowHash

object HashDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CanonicalRowHash.register(spark)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // hash real JSON strings from events.props, and whole rows
    ev.selectExpr("event_id", "props", "get_row_hash(props) AS props_hash",
        "get_row_hash(struct(event_id, user_id, event_type)) AS row_hash")
      .show(5, false)
    // invariance on real data: hash(struct(a,b)) == hash(struct(b,a))
    val cmp = ev.selectExpr(
      "get_row_hash(struct(event_id, user_id)) = get_row_hash(struct(user_id, event_id)) AS same")
      .groupBy("same").count()
    cmp.show()
    // anti-join smoke on lineitem using hashed_row (the engine's core op)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val h1 = li.filter("l_orderkey % 97 != 0").withColumn("hashed_row", CanonicalRowHash(struct(li.columns.sorted.map(col): _*)))
    val h2 = li.filter("l_orderkey % 89 != 0").withColumn("hashed_row", CanonicalRowHash(struct(li.columns.sorted.map(col): _*)))
    val only1 = h1.join(h2.select("hashed_row"), Seq("hashed_row"), "left_anti").count()
    val only2 = h2.join(h1.select("hashed_row"), Seq("hashed_row"), "left_anti").count()
    val expected1 = li.filter("l_orderkey % 97 != 0 AND l_orderkey % 89 = 0").count()
    val expected2 = li.filter("l_orderkey % 89 != 0 AND l_orderkey % 97 = 0").count()
    println(s"only-in-side1: $only1 (expected $expected1), only-in-side2: $only2 (expected $expected2)")
    spark.stop()
  }
}
