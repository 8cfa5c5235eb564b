package graft.server

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantReadWriteLock
import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine behind both frontends: one shared SparkSession, dialect
  * rewrites, statement intercepts, the DML hard parts (SURVEY §7.3) and
  * the catalog bootstrap (SURVEY A25).
  *
  * Concurrency model mirrors the reference (one process, many client
  * threads, shared storage): Catalyst planning happens on the calling
  * connection thread; per-table ReentrantReadWriteLock gives
  * statement-level atomicity for the copy-on-write UPDATE/DELETE, the
  * single-writer discipline DuckDB gets from its own MVCC
  * (README.md:21-27 — cross-statement transactions are out of contract,
  * like the reference which always reports status 'I', pg_conn.go:122).
  */
final class Engine(val spark: SparkSession) {

  import Engine._

  /** schema.table -> lock for copy-on-write writers. */
  private val tableLocks = new ConcurrentHashMap[String, ReentrantReadWriteLock]()
  private def lockFor(t: String) =
    tableLocks.computeIfAbsent(t.toLowerCase, _ => new ReentrantReadWriteLock())

  /** users: username -> SCRAM verifier (duckserver.users analog,
    * reference pg_server.go:95-97,116-130). */
  val users = new ConcurrentHashMap[String, String]()

  /** Declared constraints per table (SURVEY §7.3 phase 10: DuckDB
    * enforces PK/UNIQUE/NOT NULL natively; Spark accepts none — we
    * record them at CREATE TABLE and enforce on the ingest paths). */
  case class Constraints(pk: Seq[String], unique: Seq[Seq[String]], notNull: Seq[String]) {
    def isEmpty: Boolean = pk.isEmpty && unique.isEmpty && notNull.isEmpty
  }
  private val constraints = new ConcurrentHashMap[String, Constraints]()

  private def constraintsOf(table: String): Option[Constraints] = {
    val key = if (table.contains(".")) table.toLowerCase else s"main.${table.toLowerCase}"
    Option(constraints.get(key)).filterNot(_.isEmpty)
  }

  /** Validate a batch of new rows (as a DataFrame with target-table
    * column names) against the table's declared constraints. Throws on
    * violation — before anything is written. All checks are aggregates
    * or semi-joins: at scale the PK check shuffles once on the key. */
  private def enforceConstraints(table: String, newData: DataFrame): Unit =
    constraintsOf(table).foreach { c =>
      import org.apache.spark.sql.functions.{col, count, lit}
      (c.notNull ++ c.pk).distinct.foreach { nn =>
        if (newData.filter(col(nn).isNull).limit(1).count() > 0)
          throw new IllegalArgumentException(
            s"""null value in column "$nn" violates not-null constraint""")
      }
      val keySets = (if (c.pk.nonEmpty) Seq(c.pk) else Nil) ++ c.unique
      keySets.foreach { keys =>
        val kc = keys.map(col)
        if (newData.groupBy(kc: _*).agg(count(lit(1)).as("n"))
            .filter(col("n") > 1).limit(1).count() > 0)
          throw new IllegalArgumentException(
            s"duplicate key in inserted rows violates unique constraint (${keys.mkString(", ")})")
        if (newData.join(spark.table(table).select(kc: _*), keys, "left_semi")
            .limit(1).count() > 0)
          throw new IllegalArgumentException(
            s"duplicate key value violates unique constraint (${keys.mkString(", ")})")
      }
    }

  // -- statement execution ---------------------------------------------------

  /** Execute one statement; returns (df-or-null, commandTag). DDL/DML
    * run eagerly; SELECT-ish statements return a lazy DataFrame the
    * caller pumps with toLocalIterator. */
  def execute(sql0: String): ExecResult = {
    val sql = sql0.trim.stripSuffix(";").trim
    if (sql.isEmpty) return ExecResult(null, "EMPTY")

    createUserRe.findFirstMatchIn(sql) match {
      case Some(m) =>
        users.put(m.group(1).toLowerCase, graft.server.pg.Scram.encryptPassword(m.group(2)))
        return ExecResult(null, "CREATE ROLE")
      case None =>
    }
    if (sql.equalsIgnoreCase("discard all")) return ExecResult(null, "DISCARD ALL")
    if (txnRe.matches(sql)) // accepted as no-ops, status stays 'I' like the reference
      return ExecResult(null, sql.split("\\s+").head.toUpperCase)
    if (showTxnReadOnlyRe.matches(sql))
      return ExecResult(spark.sql("SELECT 'off' AS transaction_read_only"), "SELECT 1")
    if (swallowedSetRe.matches(sql))
      return ExecResult(spark.sql("SELECT 1 LIMIT 0"), "SET")

    createTableRe.findFirstMatchIn(sql).foreach { m =>
      return createTableWithConstraints(m.group(1), m.group(2), Option(m.group(3)).getOrElse(""))
    }
    insertStmtRe.findFirstMatchIn(sql).foreach { m =>
      val table = m.group(1)
      if (constraintsOf(table).isDefined) {
        val cols = Option(m.group(2)).map(_.split(",").map(_.trim).toSeq)
          .getOrElse(spark.table(table).schema.fieldNames.toSeq)
        val srcSql = m.group(3).trim
        val src = if (srcSql.toLowerCase.startsWith("values")) spark.sql(s"SELECT * FROM $srcSql")
          else spark.sql(rewrite(srcSql))
        enforceConstraints(table, src.toDF(cols: _*))
      }
    }
    updateRe.findFirstMatchIn(sql).foreach { m =>
      return copyOnWriteUpdate(m.group(1), m.group(2), Option(m.group(3)))
    }
    deleteRe.findFirstMatchIn(sql).foreach { m =>
      return copyOnWriteDelete(m.group(1), Option(m.group(2)))
    }
    copyToRe.findFirstMatchIn(sql).foreach { m =>
      return copyTo(m.group(1), m.group(2), Option(m.group(3)).getOrElse(""))
    }
    copyFromFileRe.findFirstMatchIn(sql).foreach { m =>
      return copyFromFile(m.group(1), m.group(2), Option(m.group(3)).getOrElse(""))
    }
    describeQueryRe.findFirstMatchIn(sql).foreach { m =>
      val schema = spark.sql(rewrite(m.group(1))).schema
      import spark.implicits._
      val df = schema.fields.toSeq
        .map(f => (f.name, graft.functions.DuckTypeNames.of(f.dataType),
          if (f.nullable) "YES" else "NO"))
        .toDF("column_name", "column_type", "null")
      return ExecResult(df, "SELECT")
    }

    var rewritten = rewrite(sql)
    if (rewritten.toLowerCase.contains("information_schema.")) {
      refreshInformationSchema()
      rewritten = infoSchemaRe.replaceAllIn(rewritten, m => s"__is_${m.group(1).toLowerCase}")
    }
    if (rewritten.toLowerCase.contains("pg_catalog.") || pgRelRe.findFirstIn(rewritten).isDefined) {
      refreshPgCatalog()
      rewritten = pgCompat(rewritten)
    }
    excludeRe.findFirstMatchIn(rewritten).foreach { m =>
      val excluded = m.group(1).split(",").map(_.trim.toLowerCase).toSet
      val cols = spark.table(m.group(2)).schema.fieldNames
        .filterNot(c => excluded(c.toLowerCase))
        .map(c => s"`$c`").mkString(", ")
      rewritten = rewritten.substring(0, m.start) + s"SELECT $cols FROM ${m.group(2)}" +
        rewritten.substring(m.end)
    }
    val df = spark.sql(rewritten)
    val verb = sql.split("\\s+").head.toUpperCase
    verb match {
      case "SELECT" | "WITH" | "VALUES" | "TABLE" | "SHOW" | "DESCRIBE" | "DESC" | "EXPLAIN" | "PIVOT" =>
        ExecResult(df, "SELECT")
      case "INSERT" =>
        df.collect() // force the write
        // written-row count from the write command's SQL metrics; the
        // executed plan of an eager command is CommandResultExec whose
        // write plan hangs off commandPhysicalPlan, not children
        val n = try {
          val root = df.queryExecution.executedPlan match {
            case c: org.apache.spark.sql.execution.CommandResultExec => c.commandPhysicalPlan
            case p => p
          }
          root.collectFirst {
            case p if p.metrics.contains("numOutputRows") =>
              p.metrics("numOutputRows").value
          }.getOrElse(0L)
        } catch { case _: Throwable => 0L }
        ExecResult(null, s"INSERT 0 $n")
      case _ =>
        df.collect()
        ExecResult(null, verb)
    }
  }

  /** Dialect-level string rewrites (SURVEY §4.2-§4.3: read_* TVF
    * aliasing; the rest of the dialect layer lives in GraftFunctions). */
  def rewrite(sql: String): String = {
    var s = sql
    s = readParquetRe.replaceAllIn(s, m => Regex.quoteReplacement(s"parquet.`${m.group(1)}`"))
    s = readCsvRe.replaceAllIn(s, m => Regex.quoteReplacement(s"csv.`${m.group(1)}`"))
    s = readJsonRe.replaceAllIn(s, m => Regex.quoteReplacement(s"json.`${m.group(1)}`"))
    s
  }

  // -- DML hard parts (SURVEY §7.3) -----------------------------------------

  /** UPDATE t SET a=e[, …] [WHERE p] → materialize SELECT with CASE
    * projection, then overwrite — Spark cannot read and overwrite the
    * same table in one job, so the new image goes through a staging
    * table (the copy in copy-on-write). */
  private def copyOnWriteUpdate(table: String, setClause: String, where: Option[String]): ExecResult = {
    val lock = lockFor(table).writeLock()
    lock.lock()
    try {
      val cols = spark.table(table).schema.fieldNames
      val sets = splitTopLevel(setClause, ',').map { a =>
        val Array(c, e) = a.split("=", 2).map(_.trim)
        c.toLowerCase -> e
      }.toMap
      val pred = where.getOrElse("true")
      val proj = cols.map { c =>
        sets.get(c.toLowerCase) match {
          case Some(e) => s"CASE WHEN ($pred) THEN ($e) ELSE `$c` END AS `$c`"
          case None => s"`$c`"
        }
      }.mkString(", ")
      val touched = spark.sql(s"SELECT count(*) FROM $table WHERE ($pred)").head().getLong(0)
      stageAndSwap(table, s"SELECT $proj FROM $table")
      ExecResult(null, s"UPDATE $touched")
    } finally lock.unlock()
  }

  private def copyOnWriteDelete(table: String, where: Option[String]): ExecResult = {
    val lock = lockFor(table).writeLock()
    lock.lock()
    try {
      val pred = where.getOrElse("true")
      val removed = spark.sql(s"SELECT count(*) FROM $table WHERE ($pred)").head().getLong(0)
      stageAndSwap(table, s"SELECT * FROM $table WHERE NOT ($pred) OR ($pred) IS NULL")
      ExecResult(null, s"DELETE $removed")
    } finally lock.unlock()
  }

  private def stageAndSwap(table: String, select: String): Unit = {
    val stage = table.replace('.', '_') + "__cow"
    spark.sql(s"DROP TABLE IF EXISTS $stage")
    spark.sql(s"CREATE TABLE $stage AS $select")
    try spark.sql(s"INSERT OVERWRITE TABLE $table SELECT * FROM $stage").collect()
    finally spark.sql(s"DROP TABLE IF EXISTS $stage")
  }

  /** information_schema.{schemata,tables,columns} (SURVEY §2-B.9 🔧):
    * Spark has no information_schema, and static views would go stale —
    * queries naming it get the views rebuilt from the live catalog and
    * the reference rewritten to the temp-view names. Catalog
    * introspection is driver-side metadata only (no jobs). */
  private def refreshInformationSchema(): Unit = {
    import spark.implicits._
    val dbs = spark.catalog.listDatabases().collect().map(_.name)
    dbs.toSeq.map(d => ("spark", d)).toDF("catalog_name", "schema_name")
      .createOrReplaceTempView("__is_schemata")
    val tables = dbs.flatMap { d =>
      spark.catalog.listTables(d).collect().filterNot(_.isTemporary).map(t =>
        ("spark", d, t.name, t.tableType match {
          case "VIEW" => "VIEW"
          case _ => "BASE TABLE"
        }))
    }
    tables.toSeq.toDF("table_catalog", "table_schema", "table_name", "table_type")
      .createOrReplaceTempView("__is_tables")
    val columns = tables.flatMap { case (_, d, t, _) =>
      try spark.catalog.listColumns(s"$d.$t").collect().zipWithIndex.map { case (c, i) =>
        ("spark", d, t, c.name, i + 1, c.dataType,
          if (c.nullable) "YES" else "NO")
      }
      catch { case _: Throwable => Array.empty[(String, String, String, String, Int, String, String)] }
    }
    columns.toSeq.toDF("table_catalog", "table_schema", "table_name",
      "column_name", "ordinal_position", "data_type", "is_nullable")
      .createOrReplaceTempView("__is_columns")
  }

  /** CREATE TABLE with PG/DuckDB constraint syntax: Spark's parser
    * rejects PRIMARY KEY / UNIQUE / NOT NULL, so they are parsed out
    * here, recorded, and the stripped DDL executed (SURVEY §2-B.9). */
  private def createTableWithConstraints(table: String, colSpec: String, rest: String): ExecResult = {
    var pk = Seq.empty[String]
    var unique = Seq.empty[Seq[String]]
    var notNull = Seq.empty[String]
    val kept = splitTopLevel(colSpec, ',').flatMap { item0 =>
      val item = item0.trim
      val lower = item.toLowerCase
      if (lower.startsWith("primary key")) {
        pk = item.substring(item.indexOf('(') + 1, item.lastIndexOf(')'))
          .split(",").map(_.trim.toLowerCase).toSeq
        None
      } else if (lower.startsWith("unique")) {
        unique :+= item.substring(item.indexOf('(') + 1, item.lastIndexOf(')'))
          .split(",").map(_.trim.toLowerCase).toSeq
        None
      } else if (lower.startsWith("foreign key") || lower.startsWith("check")) {
        None // recorded-but-unenforced class: dropped (documented divergence)
      } else {
        val colName = item.split("\\s+").head.toLowerCase
        var cleaned = item
        if (lower.contains("primary key")) {
          pk = Seq(colName)
          cleaned = cleaned.replaceAll("(?i)\\s+primary\\s+key", "")
        }
        if (cleaned.toLowerCase.contains("not null")) {
          notNull :+= colName
          cleaned = cleaned.replaceAll("(?i)\\s+not\\s+null", "")
        } else if (cleaned.toLowerCase.matches(".*\\bunique\\b.*")) {
          unique :+= Seq(colName)
        }
        cleaned = cleaned.replaceAll("(?i)\\s+unique\\b", "")
        Some(cleaned)
      }
    }
    spark.sql(s"CREATE TABLE $table (${kept.mkString(", ")}) $rest")
    val key = if (table.contains(".")) table.toLowerCase else s"main.${table.toLowerCase}"
    constraints.put(key, Constraints(pk, unique, notNull))
    ExecResult(null, "CREATE TABLE")
  }

  /** Minimal pg_catalog emulation — enough for psql \dt / \dn / \dv
    * (the reference gets its pg_catalog from DuckDB; SURVEY A25). */
  private def refreshPgCatalog(): Unit = {
    import spark.implicits._
    val dbs = spark.catalog.listDatabases().collect().map(_.name).sorted
    val nsOid = dbs.zipWithIndex.map { case (d, i) => d -> (1000 + i) }.toMap
    dbs.map(d => (nsOid(d), d, 0)).toSeq.toDF("oid", "nspname", "nspowner")
      .createOrReplaceTempView("pg_namespace")
    val rels = dbs.flatMap { d =>
      spark.catalog.listTables(d).collect().filterNot(_.isTemporary)
        .zipWithIndex.map { case (t, i) =>
          (2000 + nsOid(d) * 100 + i, t.name,
            nsOid(d), if (t.tableType == "VIEW") "v" else "r", 0, 0)
        }
    }
    rels.toSeq.toDF("oid", "relname", "relnamespace", "relkind", "relowner", "relam")
      .createOrReplaceTempView("pg_class")
    Seq((0, "heap")).toDF("oid", "amname").limit(0)
      .createOrReplaceTempView("pg_am")
  }

  /** psql-dialect → Spark SQL: strip pg_catalog qualification, regex
    * operators `~`/`!~` → regexp_like. (Double-quoted identifiers are
    * handled by spark.sql.ansi.doubleQuotedIdentifiers.) */
  private def pgCompat(sql0: String): String = {
    var s = sql0.replaceAll("(?i)pg_catalog\\.", "")
    s = notTildeRe.replaceAllIn(s, m => Regex.quoteReplacement(
      s"NOT regexp_like(${m.group(1)}, ${m.group(2)})"))
    s = tildeRe.replaceAllIn(s, m => Regex.quoteReplacement(
      s"regexp_like(${m.group(1)}, ${m.group(2)})"))
    s
  }

  /** COPY (query|table) TO 'file' (FORMAT csv|parquet|json …) —
    * statement intercept → DataFrameWriter (SURVEY §2-B.1 🔧). */
  private def copyTo(src: String, path: String, opts: String): ExecResult = {
    val df =
      if (src.trim.startsWith("(")) spark.sql(rewrite(src.trim.stripPrefix("(").stripSuffix(")")))
      else spark.table(src.trim)
    val format = formatOf(opts, path)
    val n = df.count()
    val w = df.coalesce(1).write.mode("overwrite")
    format match {
      case "csv" => w.option("header", optFlag(opts, "header")).csv(path)
      case "json" => w.json(path)
      case _ => w.parquet(path)
    }
    ExecResult(null, s"COPY $n")
  }

  /** COPY table FROM 'file' (FORMAT …) → read + insertInto. */
  private def copyFromFile(table: String, path: String, opts: String): ExecResult = {
    val target = spark.table(table)
    val format = formatOf(opts, path)
    val reader = spark.read.schema(target.schema)
    val df = format match {
      case "csv" => reader.option("header", optFlag(opts, "header")).csv(path)
      case "json" => reader.json(path)
      case _ => reader.parquet(path)
    }
    val lock = lockFor(table).readLock()
    lock.lock()
    try {
      val n = df.count()
      df.write.insertInto(table)
      ExecResult(null, s"COPY $n")
    } finally lock.unlock()
  }

  private def formatOf(opts: String, path: String): String = {
    val o = opts.toLowerCase
    if (o.contains("parquet")) "parquet"
    else if (o.contains("json")) "json"
    else if (o.contains("csv")) "csv"
    else if (path.endsWith(".parquet")) "parquet"
    else if (path.endsWith(".json")) "json"
    else "csv"
  }
  private def optFlag(opts: String, name: String): String =
    if (opts.toLowerCase.contains(name)) "true" else "false"

  // -- ingest (micro-batched Appender analog, SURVEY A15/A20) ---------------

  /** Append a batch of parsed rows to a table. One Spark job per batch;
    * visibility at completion = the reference's Appender Flush. */
  def appendBatch(table: String, columns: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    if (rows.isEmpty) return
    val lock = lockFor(table).readLock() // appends can interleave; COW writers exclude
    lock.lock()
    try {
      val target = spark.table(table)
      val schema = org.apache.spark.sql.types.StructType(
        columns.map(c => target.schema(target.schema.fieldIndex(c))))
      val rdd = spark.sparkContext.parallelize(
        rows.map(org.apache.spark.sql.Row.fromSeq), math.max(1, rows.size / 65536))
      var df = spark.createDataFrame(rdd, schema)
      // project + null-fill the column subset to the full table schema
      val full = target.schema.fieldNames.map { c =>
        if (columns.exists(_.equalsIgnoreCase(c))) org.apache.spark.sql.functions.col(c)
        else org.apache.spark.sql.functions.lit(null).cast(target.schema(c).dataType).as(c)
      }
      val aligned = df.select(full.toIndexedSeq: _*)
      enforceConstraints(table, aligned)
      aligned.write.insertInto(table)
    } finally lock.unlock()
  }
}

object Engine {
  case class ExecResult(df: DataFrame, tag: String)

  // intercepts (case-insensitive), mirroring reference pg_conn.go:274-307
  private val createUserRe =
    """(?is)^\s*create\s+user\s+(\S+)\s+with\s+password\s+'([^']*)'\s*$""".r
  private val txnRe = """(?is)^\s*(begin|commit|rollback|start\s+transaction|end)\b.*""".r
  private val showTxnReadOnlyRe = """(?is)^\s*show\s+transaction_read_only\s*$""".r
  private val swallowedSetRe =
    """(?is)^\s*set\s+(extra_float_digits|application_name|search_path|datestyle|client_min_messages)\b.*""".r
  private val updateRe =
    """(?is)^\s*update\s+([\w.]+)\s+set\s+(.+?)(?:\s+where\s+(.+))?\s*$""".r
  private val createTableRe =
    """(?is)^\s*create\s+table\s+(?!if\s)([\w.]+)\s*\((.*(?:primary\s+key|unique|not\s+null|foreign\s+key|check\s*\().*)\)\s*(using\s+\w+)?\s*$""".r
  private val insertStmtRe =
    """(?is)^\s*insert\s+into\s+([\w.]+)\s*(?:\(([^)]*)\))?\s*(values\b.+|select\b.+|with\b.+)$""".r
  private val deleteRe =
    """(?is)^\s*delete\s+from\s+([\w.]+)(?:\s+where\s+(.+))?\s*$""".r

  private val copyToRe =
    """(?is)^\s*copy\s+(\([^)]+\)|[\w.]+)\s+to\s+'([^']+)'\s*(?:\(([^)]*)\)|with\s*\(([^)]*)\))?\s*$""".r
  private val copyFromFileRe =
    """(?is)^\s*copy\s+([\w.]+)\s+from\s+'([^']+)'\s*(?:\(([^)]*)\)|with\s*\(([^)]*)\))?\s*$""".r
  private val describeQueryRe = """(?is)^\s*describe\s+((?:select|with|values)\b.+)$""".r
  private val infoSchemaRe = """(?i)information_schema\.(schemata|tables|columns)""".r
  private val pgRelRe = """(?i)\bpg_(class|namespace|am)\b""".r
  private val notTildeRe = """([\w.]+)\s+!~\s+('(?:[^']*)')""".r
  private val tildeRe = """([\w.]+)\s+~\s+('(?:[^']*)')""".r
  private val excludeRe =
    """(?i)select\s+\*\s+exclude\s*\(([^)]*)\)\s+from\s+([\w.]+)""".r

  private val readParquetRe = """(?i)(?:read_parquet|parquet_scan)\s*\(\s*'([^']+)'\s*\)""".r
  private val readCsvRe = """(?i)(?:read_csv_auto|read_csv)\s*\(\s*'([^']+)'\s*\)""".r
  private val readJsonRe = """(?i)read_json_auto\s*\(\s*'([^']+)'\s*\)""".r

  /** Split on a separator, ignoring separators inside quotes/parens. */
  def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case `sep` if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Statement splitter for multi-statement simple queries (Q8 fixed:
    * split, not error). */
  def splitStatements(sql: String): Seq[String] = splitTopLevel(sql, ';')

  /** Bootstrap the catalog: database `main` with the fixture tables as
    * external parquet tables + compat views (SURVEY A25). */
  def bootstrap(spark: SparkSession, sfDir: String): Engine = {
    val engine = new Engine(spark)
    // fresh in-memory catalog ⇒ fresh warehouse (stale table dirs from
    // a previous process would collide with re-created managed tables)
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    if (wh.getPath.contains("/target/")) { // safety: only ever wipe our own dir
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (wh.exists()) rm(wh)
    }
    spark.sql("CREATE DATABASE IF NOT EXISTS main")
    graft.engine.Tables.names.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS main.${t}_raw")
      spark.sql(s"CREATE TABLE main.${t}_raw USING parquet LOCATION '$sfDir/$t.parquet'")
      // events carries TIMESTAMP(NANOS) read as long; view normalizes
      val body =
        if (t == "events")
          s"SELECT event_id, CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ) AS ts, " +
            s"user_id, event_type, value, props FROM main.${t}_raw"
        else s"SELECT * FROM main.${t}_raw"
      spark.sql(s"CREATE OR REPLACE VIEW main.$t AS $body")
    }
    spark.sql("USE main")
    // catalog-compat views (reference pg_server.go:35-76)
    val oidRows = Seq(
      16 -> "bool", 20 -> "int8", 21 -> "int2", 23 -> "int4", 25 -> "text",
      700 -> "float4", 701 -> "float8", 1700 -> "numeric", 1082 -> "date",
      1114 -> "timestamp", 1184 -> "timestamptz", 114 -> "json", 17 -> "bytea")
      .map { case (o, n) => s"($o, '$n')" }.mkString(", ")
    spark.sql(s"CREATE OR REPLACE VIEW pg_type AS SELECT * FROM VALUES $oidRows AS t(oid, typname)")
    spark.sql("CREATE OR REPLACE VIEW pg_matviews AS SELECT '' AS matviewname WHERE false")
    // psql meta-command helpers (always-true visibility, fixed owner)
    spark.udf.register("pg_table_is_visible", (_: Long) => true)
    spark.udf.register("pg_get_userbyid", (_: Long) => "spark")
    engine
  }
}
