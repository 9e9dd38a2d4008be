package graft
import org.apache.spark.sql.SparkSession
object TimeFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q_fuzzy_match", "q_entity_resolution"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
  }
}
