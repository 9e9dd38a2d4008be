package graft

import graft.config.{GraftConfig, SideDetails}
import graft.operators.{DriftCompare, DriftOutput}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** CLI entry point, mirroring the reference's `lotad run` / `lotad setup`
  * surface (reference: lotad/cli.py:25-108):
  *
  * {{{
  * graft.GraftApp run --config cfg.yaml
  * graft.GraftApp run --db1 /data/side1 --db2 /data/side2 [--output DIR]
  *     [--ignore-dates] [--target-tables re1,re2] [--ignore-tables re1,re2]
  * graft.GraftApp suggest-ignores --db1 ... --db2 ...   # wizard analog
  * }}}
  */
object GraftApp {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 1).collect {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") =>
        k.stripPrefix("--") -> v
    }.toMap ++ args.filter(a => a == "--ignore-dates").map(_ => "ignore-dates" -> "true").toMap

  private def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("run")
    val opts = parseArgs(args.drop(1))
    val config: GraftConfig = opts.get("config") match {
      case Some(path) =>
        val base = GraftConfig.load(path)
        base.copy(
          ignoreDates = opts.get("ignore-dates").map(_.toBoolean).getOrElse(base.ignoreDates),
          targetTables = opts.get("target-tables").map(_.split(",").toSeq).getOrElse(base.targetTables),
          ignoreTables = opts.get("ignore-tables").map(_.split(",").toSeq).getOrElse(base.ignoreTables),
          outputPath = opts.getOrElse("output", base.outputPath))
      case None =>
        GraftConfig(
          db1Details = SideDetails("parquet", opts.getOrElse("db1",
            sys.error("--config or --db1/--db2 required"))),
          db2Details = SideDetails("parquet", opts.getOrElse("db2",
            sys.error("--db2 required"))),
          outputPath = opts.getOrElse("output", "drift_analysis"),
          targetTables = opts.get("target-tables").map(_.split(",").toSeq).getOrElse(Seq.empty),
          ignoreTables = opts.get("ignore-tables").map(_.split(",").toSeq).getOrElse(Seq.empty),
          ignoreDates = opts.get("ignore-dates").exists(_.toBoolean))
    }
    val spark = buildSession()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val s1 = config.db1Details.toSide(spark, "db1")
      val s2 = config.db2Details.toSide(spark, "db2")
      cmd match {
        case "run" =>
          val t0 = System.nanoTime()
          val comparator = new DriftCompare(spark, s1, s2, config.diffConfig)
          val result = comparator.compareAll()
          DriftOutput.write(spark, result, config.outputPath)
          comparator.cleanup()
          println(DriftOutput.report(result, config.db1Details.path, config.db2Details.path))
          println(f"completed in ${(System.nanoTime() - t0) / 1e9}%.1f sec; " +
            s"results in ${config.outputPath}")
        case "suggest-ignores" =>
          suggestIgnores(spark, s1, s2, config).foreach(println)
        case other =>
          sys.error(s"unknown command: $other (expected run | suggest-ignores)")
      }
    } finally spark.stop()
  }

  /** Wizard analog (reference: lotad/config_wizard.py:33-147): for each
    * shared column of each shared table, sample up to 10k distinct values
    * on db1 and count matches on db2; zero overlap on a non-empty sample
    * means the column never agrees across sides (UUID PKs, run ids...) and
    * is suggested as an `ignore_column` rule. Emits YAML fragments.
    */
  def suggestIgnores(spark: SparkSession, s1: graft.sources.Side,
                     s2: graft.sources.Side, config: GraftConfig): Seq[String] = {
    val comparator = new DriftCompare(spark, s1, s2, config.diffConfig)
    comparator.sharedTables().flatMap { table =>
      val t1 = s1.table(table)
      val t2 = s2.table(table)
      val sharedCols = t1.schema.fields.filter { f =>
        t2.schema.fields.exists(g => g.name == f.name && g.dataType == f.dataType)
      }
      val ignorable = sharedCols.flatMap { f =>
        val c = f.name
        val sample = t1.select(col(s"`$c`")).filter(col(s"`$c`").isNotNull)
          .distinct().limit(10000)
        val overlap = t2.join(sample, Seq(c), "left_semi").limit(1).count()
        if (overlap == 0 && !sample.isEmpty) Some(c) else None
      }
      if (ignorable.isEmpty) Nil
      else Seq(s"- table_name: $table\n  rules:" +
        ignorable.sorted.map(c => s"\n    - {rule_type: ignore_column, rule_value: $c}").mkString)
    }
  }
}
