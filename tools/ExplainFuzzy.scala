package graft
import org.apache.spark.sql.SparkSession
object ExplainFuzzy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q_fuzzy_match")(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
  }
}
