package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch profiler for the iterative-graph queries: counts jobs/stages
  * and prints per-phase wall for q_hits-shaped work. Dev-only.
  */
object ProbeHits {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("PROBE_PF", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("PROBE_CACHE_AQE", "false"))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("PROBE_OPEN_COST", "4194304"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var stageWallMs = 0L
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
        taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
        stageLog.add((sc.stageInfo.stageId,
          sc.stageInfo.name.takeWhile(_ != '\n').take(60),
          sc.stageInfo.numTasks, sc.stageInfo.taskMetrics.executorRunTime))
        for {
          s <- sc.stageInfo.submissionTime
          c <- sc.stageInfo.completionTime
        } stageWallMs += c - s
      }
    })
    // warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.range(4000000L).selectExpr("id % 1000 AS k", "id AS v")
      .groupBy("k").count().count()
    val name = sys.env.getOrElse("PROBE_QUERY", "q_hits")
    (1 to 3).foreach { r =>
      Thread.sleep(500)
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L; stageWallMs = 0L
      stageLog.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      println(f"[probe] $name round $r: construct ${(t1 - t0) / 1e9}%.2f s, " +
        f"count ${(t2 - t1) / 1e9}%.2f s, jobs $jobs, stages $stages, " +
        f"tasks $tasks, taskTime ${taskTimeMs / 1e3}%.2f s, " +
        f"stageWall ${stageWallMs / 1e3}%.2f s")
      if (sys.env.contains("PROBE_STAGES") && r == 3) {
        import scala.jdk.CollectionConverters._
        stageLog.asScala.toSeq.sortBy(-_._4).take(15).foreach {
          case (id, nm, nt, ms) =>
            println(f"[stage] $id%5d tasks=$nt%5d time=${ms / 1e3}%8.2f s  $nm")
        }
      }
    }
    spark.stop()
  }
}
