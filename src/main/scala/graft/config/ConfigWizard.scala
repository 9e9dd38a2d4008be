package graft.config

import graft.sources.Side

import org.apache.spark.sql.SparkSession

/** Prompt abstraction so the wizard is drivable from tests (the reference
  * leans on questionary/inquirer TTY widgets; we take a thin seam instead).
  */
trait PromptIO {
  def select(message: String, choices: Seq[String]): String
  def text(message: String, default: String = ""): String
  def confirm(message: String, default: Boolean = false): Boolean
  def echo(message: String): Unit
}

/** Console prompts: numbered menu on stdin/stdout. */
final class ConsoleIO extends PromptIO {
  override def select(message: String, choices: Seq[String]): String = {
    println(message)
    choices.zipWithIndex.foreach { case (c, i) => println(s"  ${i + 1}) $c") }
    while (true) {
      print("> ")
      val line = Option(scala.io.StdIn.readLine()).getOrElse(return choices.last)
      line.trim.toIntOption match {
        case Some(i) if i >= 1 && i <= choices.length => return choices(i - 1)
        case _ => choices.find(_.equalsIgnoreCase(line.trim)).foreach(return _)
      }
    }
    choices.last
  }
  override def text(message: String, default: String): String = {
    print(s"$message${if (default.nonEmpty) s" [$default]" else ""}: ")
    Option(scala.io.StdIn.readLine()).map(_.trim).filter(_.nonEmpty).getOrElse(default)
  }
  override def confirm(message: String, default: Boolean): Boolean =
    select(message, Seq("yes", "no")) == "yes"
  override def echo(message: String): Unit = println(message)
}

/** Scripted prompts for specs: answers consumed in order, echo captured. */
final class ScriptedIO(answers: Seq[String]) extends PromptIO {
  private val it = answers.iterator
  val echoed = new StringBuilder
  override def select(message: String, choices: Seq[String]): String = it.next()
  override def text(message: String, default: String): String = {
    val a = it.next(); if (a.isEmpty) default else a
  }
  override def confirm(message: String, default: Boolean): Boolean = it.next() == "yes"
  override def echo(message: String): Unit = echoed.append(message).append('\n')
}

/** Interactive config wizard, mirroring the reference's menu loop and
  * mutators (reference: lotad/config_wizard.py:380-429 menu,
  * :101-147 generate_ignored_columns, :149-283 attribute mutators).
  * Every mutator persists the config immediately via [[GraftConfig.write]].
  *
  * `sidesOverride` lets tests inject in-memory sides; production resolves
  * sides from the config's connection details.
  */
final class ConfigWizard(
    spark: SparkSession,
    io: PromptIO,
    configPath: String,
    initial: GraftConfig,
    sidesOverride: Option[(Side, Side)] = None) {

  private var config: GraftConfig = initial
  def current: GraftConfig = config

  private def sides: (Side, Side) = sidesOverride.getOrElse(
    (config.db1Details.toSide(spark, "db1"), config.db2Details.toSide(spark, "db2")))

  private def persist(): Unit = {
    GraftConfig.write(config, configPath)
    io.echo("Config updated successfully.\n")
  }

  /** Merge zero-overlap column suggestions into table_configs, keeping
    * existing rules (reference: config_wizard.py:101-147).
    */
  def generateIgnoredColumns(): Unit = {
    val (s1, s2) = sides
    val suggestions = graft.GraftApp.suggestIgnoreColumns(spark, s1, s2, config)
    var tc = config.tableConfigs
    suggestions.foreach { case (table, cols) =>
      val existing = tc.getOrElse(table, graft.operators.TableRules())
      tc = tc.updated(table, existing.copy(
        ignoreColumns = existing.ignoreColumns ++ cols))
    }
    config = config.copy(tableConfigs = tc)
  }

  def runGenerateIgnoredColumns(): Unit = {
    io.echo(
      "This will create or append the columns to ignore for all tables.\n" +
      "Works by finding all columns with no matching values.\n" +
      "Useful for non-deterministic columns like a uuid primary key.\n" +
      "Will NOT remove any ignore column rules already in the config.")
    if (io.confirm("Proceed?")) {
      generateIgnoredColumns()
      persist()
    } else io.echo("Ignored columns were not generated. Going back.")
  }

  private def commaList(message: String, current: Seq[String]): Seq[String] =
    io.text(message, current.mkString(", "))
      .replace(" ", "").replace("\n", "").split(",").toSeq.filter(_.nonEmpty)

  def updateIgnoreTables(): Unit = {
    io.echo("A diff will be performed on all tables EXCEPT these. " +
      "Supports regex. NOT case sensitive.")
    config = config.copy(ignoreTables =
      commaList("Provide a comma separated list of tables to ignore.", config.ignoreTables))
    persist()
  }

  def updateTargetTables(): Unit = {
    io.echo("A diff will only be provided on these tables. " +
      "Supports regex. NOT case sensitive.")
    config = config.copy(targetTables =
      commaList("Provide a comma separated list of target tables.", config.targetTables))
    persist()
  }

  def updateOutputPath(): Unit = {
    config = config.copy(outputPath =
      io.text("Path where the diff results will be written.", config.outputPath)
        .replace(" ", "").replace("\n", ""))
    persist()
  }

  def updateIgnoreDates(): Unit = {
    io.echo("If set to true all date columns will be ignored when performing " +
      "the diff. Useful to set true for databases that work in a pipeline " +
      "that always alters multiple date values on every run.")
    config = config.copy(ignoreDates =
      io.select("Ignore all date columns?", Seq("yes", "no")) == "yes")
    persist()
  }

  def updateCustomQuery(): Unit = {
    val (s1, s2) = sides
    val shared = s1.listTables().toSet.intersect(s2.listTables().toSet).toSeq.sorted
    if (shared.isEmpty) { io.echo("No shared tables found between the databases.\n"); return }
    val table = io.select("Select a table to add/update custom query for:", shared)
    val existing = config.tableConfigs.get(table).flatMap(_.customQuery).getOrElse("")
    val raw = io.text("Enter the custom query:", existing)
    try {
      val q = QueryValidation.normalize(table, raw)
      val tr = config.tableConfigs.getOrElse(table, graft.operators.TableRules())
      config = config.copy(tableConfigs =
        config.tableConfigs.updated(table, tr.copy(customQuery = Some(q))))
      persist()
    } catch {
      case e: IllegalArgumentException =>
        io.echo(s"Unable to set custom query due to: ${e.getMessage}")
    }
  }

  private val choiceMap: Seq[(String, () => Unit)] = Seq(
    "Generate ignored columns for tables." -> (() => runGenerateIgnoredColumns()),
    "Set the list of ignored tables." -> (() => updateIgnoreTables()),
    "Set the list of target tables." -> (() => updateTargetTables()),
    "Set the path where the diff results will be written." -> (() => updateOutputPath()),
    "Set ignore date behavior for config." -> (() => updateIgnoreDates()),
    "Set a custom query for a table." -> (() => updateCustomQuery()),
    "Done." -> (() => ()))

  /** The menu loop (reference: config_wizard.py:cli_start). */
  def run(): GraftConfig = {
    var done = false
    while (!done) {
      val sel = io.select("What would you like to do next?", choiceMap.map(_._1))
      if (sel == "Done.") done = true
      else choiceMap.find(_._1 == sel).foreach(_._2())
    }
    config
  }
}

object ConfigWizard {
  /** Load-or-create flow (reference: config_wizard.py:cli_start): an
    * existing config is loaded; otherwise connection details are prompted
    * and the new config persisted before the menu loop starts.
    */
  def loadOrCreate(io: PromptIO, configPath: String): GraftConfig =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(configPath)))
      GraftConfig.load(configPath)
    else {
      io.echo("It doesn't look like this config exists yet. " +
        "Let me get a bit more information.")
      def side(which: String): SideDetails = {
        val t = io.select(s"What type of database is $which?",
          Seq("parquet", "csv", "json", "orc", "jdbc", "postgresql", "sqlite", "derby"))
        val path = io.text(s"What is the $which path/URL?")
        val user = if (Set("jdbc", "postgresql").contains(t)) io.text(s"User for $which?") else ""
        val password = if (user.nonEmpty) io.text(s"Password for $which?") else ""
        SideDetails(t, path, user, password)
      }
      val cfg = GraftConfig(
        db1Details = side("db1"),
        db2Details = side("db2"),
        ignoreDates = io.confirm("Should all date columns be ignored?"))
      GraftConfig.write(cfg, configPath)
      cfg
    }
}
