package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import graft.operators.{DiffConfig, TableRules}
import graft.sources.{JdbcSide, ParquetSide, Side}

import org.apache.spark.sql.SparkSession

/** One side's connection details (reference: lotad/connection.py:53-83).
  * `databaseType` selects the Spark source: `parquet` (a directory of
  * `<table>.parquet`) or `jdbc` (a live database via Spark's JDBC source).
  */
final case class SideDetails(
    databaseType: String,
    path: String = "",
    user: String = "",
    password: String = "",
    schema: String = "",
    passfile: String = "") {

  /** Password precedence mirrors the reference (connection.py:290-294):
    * an explicit `password` wins; otherwise `passfile` is read AT
    * CONNECT TIME (libpq semantics — the file can rotate between runs).
    * Accepted shapes:
    *
    *   - pgpass files (`host:port:db:user:password` lines, `*`
    *     wildcards, `\:`/`\\` escapes): the FIRST line whose four key
    *     fields all match this side's host/port/database/user is
    *     selected — a multi-entry pgpass file (the normal use of the
    *     format) resolves per-connection, exactly as libpq does with
    *     the path the reference hands it. A key component the JDBC
    *     URL does not expose (an embedded Derby path has no host) or
    *     an empty `user` matches any field value.
    *   - plain one-line secret files (no `:` in the line) — accepted
    *     as the whole password.
    *
    * libpq's permission rule applies: a passfile readable by group or
    * others is IGNORED with a stderr warning, never silently used
    * (skipped on filesystems without POSIX permissions).
    */
  private[graft] def resolvedPassword: String =
    if (password.nonEmpty || passfile.isEmpty) password
    else {
      val p = java.nio.file.Paths.get(passfile)
      if (!SideDetails.passfilePermissionsOk(p)) {
        System.err.println(
          s"WARNING: passfile $passfile has group/other access; " +
            "permissions should be u=rw (0600) or less — file ignored")
        ""
      } else {
        val lines = java.nio.file.Files.readAllLines(p)
          .toArray.toSeq.map(_.toString.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#"))
        val entries = lines.flatMap(SideDetails.parsePgpassLine)
        if (entries.isEmpty)
          // plain one-line secret file (no pgpass-shaped line at all)
          lines.headOption.filterNot(_.contains(':')).getOrElse("")
        else {
          val (h, pt, db) = SideDetails.jdbcKeyParts(path, databaseType)
          val u = Option(user).filter(_.nonEmpty)
          def ok(field: String, actual: Option[String]): Boolean =
            field == "*" || actual.forall(_ == field)
          entries.collectFirst {
            case (fh, fp, fd, fu, pw)
                if ok(fh, h) && ok(fp, pt) && ok(fd, db) && ok(fu, u) => pw
          }.getOrElse("")
        }
      }
    }

  def toSide(spark: SparkSession, id: String): Side = databaseType.toLowerCase match {
    case "parquet" | "duckdb" => ParquetSide(spark, path, id)
    case f @ ("csv" | "json" | "orc") => graft.sources.FormatSide(spark, path, f, id)
    case t @ ("jdbc" | "postgresql" | "sqlite" | "derby") =>
      val props = new java.util.Properties()
      if (user.nonEmpty) props.setProperty("user", user)
      val pw = resolvedPassword
      if (pw.nonEmpty) props.setProperty("password", pw)
      // postgres organizes user tables under a schema (default public);
      // sqlite/derby-style embedded DBs use no schema filter by default
      val effectiveSchema =
        if (schema.isEmpty && t == "postgresql") "public" else schema
      JdbcSide(spark, path, props, effectiveSchema, id)
    case other => throw new IllegalArgumentException(s"unsupported database_type: $other")
  }
}

object SideDetails {

  /** libpq's ~/.pgpass rule: refuse a file readable/writable by group
    * or others. Non-POSIX filesystems (no permission concept) pass.
    */
  private[config] def passfilePermissionsOk(p: java.nio.file.Path): Boolean =
    try {
      import java.nio.file.attribute.PosixFilePermission._
      val perms = java.nio.file.Files.getPosixFilePermissions(p)
      !Seq(GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
        OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE).exists(perms.contains)
    } catch { case _: UnsupportedOperationException => true }

  /** One pgpass line → (host, port, database, user, password), honoring
    * `\:` and `\\` escapes in every field; None when the line has fewer
    * than five fields (then it is not pgpass-shaped).
    */
  private[config] def parsePgpassLine(
      line: String): Option[(String, String, String, String, String)] = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    // the first four fields end at unescaped ':'; the fifth (password)
    // is the remainder, so a trailing unescaped ':' stays in it
    while (i < line.length && fields.size < 4) {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < line.length) { sb.append(line.charAt(i + 1)); i += 2 }
      else if (c == ':') { fields += sb.toString; sb.clear(); i += 1 }
      else { sb.append(c); i += 1 }
    }
    if (fields.size < 4) None
    else {
      sb.clear()
      while (i < line.length) {
        val c = line.charAt(i)
        if (c == '\\' && i + 1 < line.length) { sb.append(line.charAt(i + 1)); i += 2 }
        else { sb.append(c); i += 1 }
      }
      Some((fields(0), fields(1), fields(2), fields(3), sb.toString))
    }
  }

  /** The (host, port, database) key a pgpass entry must match, parsed
    * from a network-style JDBC URL (`jdbc:postgresql://host[:port]/db`).
    * When the URL has no explicit port, the DIALECT default is
    * substituted before matching — libpq semantics: a default-port
    * connection matches the pgpass `5432` entry exactly, it does NOT
    * take the first entry of any port (so a file listing 5433 before
    * 5432 still resolves the 5432 credential). The dialect comes from
    * the URL subprotocol (`jdbc:postgresql:`), falling back to the
    * config's database_type, so `database_type: jdbc` with a postgres
    * URL gets the same treatment. Components with no sensible value —
    * an unknown dialect's port, or a non-network URL like embedded
    * Derby — come back None and match any pgpass field.
    */
  private[config] def jdbcKeyParts(url: String, databaseType: String)
      : (Option[String], Option[String], Option[String]) = {
    val net = "jdbc:([a-z0-9]+)://([^/:?;]+)(?::(\\d+))?/([^?;]+).*".r
    // only dialects whose URL shape the `net` regex can actually parse:
    // oracle (jdbc:oracle:thin:@//…) and sqlserver (;databaseName=…)
    // never match it, so listing their ports here would be dead config
    // promising a substitution that cannot fire
    val defaultPorts = Map("postgresql" -> "5432", "mysql" -> "3306",
      "mariadb" -> "3306")
    url match {
      case net(scheme, h, p, d) =>
        val dialect =
          if (defaultPorts.contains(scheme)) scheme else databaseType.toLowerCase
        val port = Option(p).orElse(defaultPorts.get(dialect))
        (Some(h), port, Some(d))
      case _ => (None, None, None)
    }
  }
}

/** YAML config with the reference's field names (reference:
  * lotad/config.py:166-188), so a lotad config ports by changing only the
  * connection details. Shape:
  *
  * {{{
  * db1_details: {database_type: parquet, path: /data/side1}
  * db2_details: {database_type: parquet, path: /data/side2}
  * output_path: ./drift_out
  * target_tables: ["orders.*"]
  * ignore_tables: ["tmp_.*"]
  * ignore_dates: false
  * table_configs:
  *   - table_name: orders
  *     rules:
  *       - {rule_type: ignore_column, rule_value: updated_at}
  *     query: "SELECT ... FROM orders ..."
  * }}}
  */
final case class GraftConfig(
    db1Details: SideDetails,
    db2Details: SideDetails,
    outputPath: String = "drift_analysis",
    targetTables: Seq[String] = Seq.empty,
    ignoreTables: Seq[String] = Seq.empty,
    ignoreDates: Boolean = false,
    tableConfigs: Map[String, TableRules] = Map.empty) {

  def diffConfig: DiffConfig =
    DiffConfig(targetTables, ignoreTables, ignoreDates, tableConfigs)
}

/** Early validation of per-table custom queries (reference:
  * lotad/config.py:141-163 rejects malformed SQL at config time; the CTE
  * ban there is deliberately NOT carried over — temp-view execution makes
  * CTEs legal here, see DriftCompare.runCustomQuery).
  */
object QueryValidation {
  /** Normalize (strip blank/padded lines, like the reference) and parse-
    * check a custom query; fails fast naming the table.
    */
  def normalize(table: String, query: String): String = {
    val cleaned = query.split("\n").map(_.trim).filter(_.nonEmpty).mkString("\n")
    try {
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parsePlan(cleaned)
      cleaned
    } catch {
      case e: Exception => throw new IllegalArgumentException(
        s"table $table: unable to parse custom query: ${e.getMessage}")
    }
  }
}

object GraftConfig {

  def load(path: String): GraftConfig = {
    val cfg = parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    applyEnvPasswords(cfg, path)
  }

  // ---- secrets side-channel: passwords live in a .env next to the config,
  //      keyed by config-path md5 so multiple configs in one directory
  //      cannot collide (reference: lotad/config.py:208-233) ----

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private[graft] def envPrefix(configPath: String): String = s"graft_${md5Hex(configPath)}"

  private def envPath(configPath: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(configPath).toAbsolutePath.getParent
    p.resolve(".env")
  }

  private def parseEnvFile(p: java.nio.file.Path): Map[String, String] =
    if (!java.nio.file.Files.exists(p)) Map.empty
    else java.nio.file.Files.readAllLines(p).toArray.toSeq.map(_.toString)
      .filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }
      .toMap

  /** Overlay passwords from the config's .env side-channel, if present. */
  private[graft] def applyEnvPasswords(cfg: GraftConfig, configPath: String): GraftConfig = {
    val env = parseEnvFile(envPath(configPath))
    val prefix = envPrefix(configPath)
    def overlay(d: SideDetails, which: String): SideDetails =
      env.get(s"${prefix}_password_$which").map(p => d.copy(password = p)).getOrElse(d)
    cfg.copy(db1Details = overlay(cfg.db1Details, "db1"),
      db2Details = overlay(cfg.db2Details, "db2"))
  }

  /** Upsert `key=value` in an env file (reference: lotad/config.py:28-57). */
  private[graft] def addToEnv(key: String, value: String, p: java.nio.file.Path): Unit = {
    val existing =
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.readString(p)
      else ""
    val lines = existing.split("\n", -1).toBuffer
    val idx = lines.indexWhere(_.startsWith(s"$key="))
    if (idx >= 0) lines(idx) = s"$key=$value"
    else {
      while (lines.nonEmpty && lines.last.isEmpty) lines.remove(lines.length - 1)
      lines += s"$key=$value"
    }
    val out = lines.mkString("\n")
    java.nio.file.Files.writeString(p, if (out.endsWith("\n")) out else out + "\n")
  }

  /** Persist the config as YAML at `path` (reference: lotad/config.py:278-287):
    * passwords are never written to the YAML — they go to the `.env`
    * side-channel; keys render alphabetically (PyYAML sort_keys) and
    * falsy values are dropped, matching the reference's `dict()`.
    */
  def write(cfg: GraftConfig, path: String): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(cfg))
    val prefix = envPrefix(path)
    if (cfg.db1Details.password.nonEmpty)
      addToEnv(s"${prefix}_password_db1", cfg.db1Details.password, envPath(path))
    if (cfg.db2Details.password.nonEmpty)
      addToEnv(s"${prefix}_password_db2", cfg.db2Details.password, envPath(path))
  }

  private def yamlScalar(s: String): String =
    if (s.isEmpty) "''"
    else if (s.matches("[A-Za-z0-9_./*+-]+") &&
             !Set("true", "false", "null", "yes", "no").contains(s.toLowerCase)) s
    else "'" + s.replace("'", "''") + "'"

  /** Render as YAML (keys alphabetical, 2-space indent, `|` blocks for
    * multiline strings — the shape PyYAML's dump produces for the
    * reference's config dict).
    */
  def render(cfg: GraftConfig): String = {
    val sb = new StringBuilder
    def sideBlock(key: String, d: SideDetails): Unit = {
      sb.append(key).append(":\n")
      sb.append("  database_type: ").append(yamlScalar(d.databaseType)).append('\n')
      // passfile IS written to the YAML (it is a pointer, not a secret —
      // the reference's dict() deletes only `password`)
      if (d.passfile.nonEmpty)
        sb.append("  passfile: ").append(yamlScalar(d.passfile)).append('\n')
      if (d.path.nonEmpty) sb.append("  path: ").append(yamlScalar(d.path)).append('\n')
      if (d.schema.nonEmpty) sb.append("  schema: ").append(yamlScalar(d.schema)).append('\n')
      if (d.user.nonEmpty) sb.append("  user: ").append(yamlScalar(d.user)).append('\n')
    }
    sideBlock("db1_details", cfg.db1Details)
    sideBlock("db2_details", cfg.db2Details)
    if (cfg.ignoreDates) sb.append("ignore_dates: true\n")
    if (cfg.ignoreTables.nonEmpty) {
      sb.append("ignore_tables:\n")
      cfg.ignoreTables.sorted.foreach(t => sb.append("- ").append(yamlScalar(t)).append('\n'))
    }
    if (cfg.outputPath.nonEmpty)
      sb.append("output_path: ").append(yamlScalar(cfg.outputPath)).append('\n')
    if (cfg.tableConfigs.nonEmpty) {
      sb.append("table_configs:\n")
      cfg.tableConfigs.toSeq.sortBy(_._1).foreach { case (table, rules) =>
        var lead = "- "
        def item(line: String): Unit = { sb.append(lead).append(line).append('\n'); lead = "  " }
        rules.customQuery.foreach { q =>
          if (q.contains("\n")) {
            item("query: |-")
            q.split("\n").foreach(l => sb.append("    ").append(l).append('\n'))
          } else item(s"query: ${yamlScalar(q)}")
        }
        if (rules.ignoreColumns.nonEmpty) {
          item("rules:")
          rules.ignoreColumns.toSeq.sorted.foreach { c =>
            sb.append(lead).append("- rule_type: ignore_column\n")
            sb.append(lead).append("  rule_value: ").append(yamlScalar(c)).append('\n')
          }
        }
        item(s"table_name: ${yamlScalar(table)}")
      }
    }
    if (cfg.targetTables.nonEmpty) {
      sb.append("target_tables:\n")
      cfg.targetTables.sorted.foreach(t => sb.append("- ").append(yamlScalar(t)).append('\n'))
    }
    sb.toString
  }

  def parse(yaml: String): GraftConfig = {
    val mapper = new ObjectMapper(new YAMLFactory())
    val root = mapper.readValue(yaml, classOf[java.util.Map[String, Object]])
    def str(m: java.util.Map[String, Object], k: String, dflt: String = ""): String =
      Option(m.get(k)).map(_.toString).getOrElse(dflt)
    def strList(k: String): Seq[String] = root.get(k) match {
      case l: java.util.List[_] => l.toArray.toSeq.map(_.toString)
      case null => Seq.empty
      case o => Seq(o.toString)
    }
    def side(k: String): SideDetails = root.get(k) match {
      case m: java.util.Map[_, _] =>
        val mm = m.asInstanceOf[java.util.Map[String, Object]]
        SideDetails(str(mm, "database_type", "parquet"), str(mm, "path"),
          str(mm, "user"), str(mm, "password"), str(mm, "schema"),
          str(mm, "passfile"))
      case _ => throw new IllegalArgumentException(s"missing $k")
    }
    val tableConfigs: Map[String, TableRules] = root.get("table_configs") match {
      case l: java.util.List[_] =>
        l.toArray.toSeq.map { tc =>
          val m = tc.asInstanceOf[java.util.Map[String, Object]]
          val name = str(m, "table_name")
          val ignores: Set[String] = m.get("rules") match {
            case rl: java.util.List[_] =>
              rl.toArray.toSeq.flatMap { r =>
                val rm = r.asInstanceOf[java.util.Map[String, Object]]
                if (str(rm, "rule_type") == "ignore_column") Some(str(rm, "rule_value"))
                else None
              }.toSet
            case _ => Set.empty
          }
          val query = Option(m.get("query")).map(_.toString).filter(_.nonEmpty)
            .map(QueryValidation.normalize(name, _)) // fail fast on bad SQL
          name -> TableRules(ignores, query)
        }.toMap
      case _ => Map.empty
    }
    GraftConfig(
      db1Details = side("db1_details"),
      db2Details = side("db2_details"),
      outputPath = str(root, "output_path", "drift_analysis"),
      targetTables = strList("target_tables"),
      ignoreTables = strList("ignore_tables"),
      ignoreDates = root.get("ignore_dates") match {
        case b: java.lang.Boolean => b.booleanValue()
        case s: String => s.toBoolean
        case _ => false
      },
      tableConfigs = tableConfigs)
  }
}
