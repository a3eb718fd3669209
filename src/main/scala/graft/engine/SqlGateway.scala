package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** The `db/db.go:49-117` equivalent: a two-method SQL passthrough —
  * `execute(sql)` for writes, `query(sql)` for reads — backed by
  * `spark.sql` instead of an embedded DuckDB.
  *
  * Semantics preserved from the reference (SURVEY.md §4.2):
  *  - **writes are serialized** (Raft applies one statement at a time,
  *    `store/store.go:242-256`) → a single writer lock here;
  *  - **reads are lock-free and concurrent** (`store/store.go:196-199`);
  *  - **`PRIMARY KEY` / `NOT NULL` are enforced on insert** — DuckDB
  *    enforces them natively (`cmd/cli/client.go:101`); Spark does not, so
  *    the gateway rewrites the DDL, remembers the constraints, and checks
  *    them with an anti-join before appending (SURVEY.md §7.4 item 2);
  *  - **UPDATE/DELETE** (named as supported, reference `README.md:36`)
  *    are read-filter-rewrite commands over the managed table — Spark has
  *    no DML on plain parquet (SURVEY.md §7.4 item 1);
  *  - **rows_affected** is computed around each write (`db/db.go:57-64`).
  *
  * Scale note: constraint checks and DML rewrites are full DataFrame plans
  * (anti-joins / filters), not driver loops — they distribute like any
  * other query. The writer lock serializes *statements*, not partitions.
  *
  * Storage model: gateway tables are parquet tables whose data lives under
  * a per-table **versioned directory** (`<warehouse>/<t>__graft/v<N>`).
  * UPDATE/DELETE write the rewritten table to `v<N+1>` and then atomically
  * repoint the catalog (`ALTER TABLE ... SET LOCATION`) — a concurrent
  * reader keeps reading the fully-intact `v<N>` files, giving the same
  * snapshot isolation DuckDB MVCC gives the reference's readers, and a
  * mid-write failure leaves the live table untouched. The previous version
  * is retained (like the reference's `retainSnapshotCount = 2`,
  * `store/store.go:22`) and GC'd one rewrite later.
  */
class SqlGateway(val spark: SparkSession) {
  private val writeLock = new Object
  /** table → (primary-key columns, not-null columns) */
  private[engine] val constraints = new TrieMap[String, (Seq[String], Seq[String])]
  /** table → CHECK expressions (SQL text; enforced on insert/update like
    * DuckDB — a row violates only when the expression is FALSE, NULL
    * passes, per the SQL standard). */
  private[engine] val checks = new TrieMap[String, Seq[String]]
  /** table → current data-directory version (versioned-location tables). */
  private val versions = new TrieMap[String, Int]

  private val CreateRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([\w.]+)\s*\((.*)\)\s*""".r
  private val CtasRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([\w.]+)\s+AS\s+(.*)""".r
  private val InsertPrefixRe =
    """(?is)\s*INSERT\s+(?:OR\s+(REPLACE|IGNORE)\s+)?INTO\s+([\w.]+)\s*(.*)""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+([\w.]+)\s+SET\s+(.*)\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*))?\s*""".r
  // DuckDB's join-form DELETE (`DELETE FROM t [AS a] USING u WHERE ...`,
  // reachable via db/db.go:52); the USING clause text is split at the
  // top-level WHERE by the handler (it may contain an alias)
  private val DeleteUsingRe =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+(.*)""".r
  private val DropRe = """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*""".r
  // snapshot statements, reachable through the same passthrough a client
  // uses in the reference (`store/store.go:263` sends `EXPORT DATABASE
  // '<dir>' (FORMAT PARQUET)`, `store/store.go:314` `IMPORT DATABASE
  // '<dir>'` — both are plain SQL text to `db.Query`)
  private val ExportDbRe =
    """(?is)\s*EXPORT\s+DATABASE\s+'([^']+)'(?:\s*\(\s*FORMAT\s+PARQUET\s*\))?\s*""".r
  private val ImportDbRe = """(?is)\s*IMPORT\s+DATABASE\s+'([^']+)'\s*""".r
  private val AlterRenameRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*""".r
  private val AlterDropColRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+(?:COLUMN\s+)?(\w+)\s*""".r
  // COPY, reachable through the reference's passthrough like every other
  // DuckDB statement (`db/db.go:52`, `db/db.go:70`): `COPY t TO 'p'
  // (FORMAT ...)`, `COPY (SELECT ...) TO 'p' (...)`, `COPY t FROM 'p'
  // (...)`. DuckDB writes ONE file; the Spark-idiomatic equivalent is a
  // directory of part files (what a cluster can write in parallel), and
  // COPY FROM reads either shape.
  private val CopyQueryToRe =
    """(?is)\s*COPY\s+\((.+)\)\s+TO\s+'([^']+)'\s*(?:\(\s*(.*?)\s*\))?\s*""".r
  private val CopyTableToRe =
    """(?is)\s*COPY\s+([\w.]+)\s+TO\s+'([^']+)'\s*(?:\(\s*(.*?)\s*\))?\s*""".r
  private val CopyFromRe =
    """(?is)\s*COPY\s+([\w.]+)\s+FROM\s+'([^']+)'\s*(?:\(\s*(.*?)\s*\))?\s*""".r

  /** Write path (reference `db/db.go:49-65`). */
  def execute(sql: String): ExecuteResult = writeLock.synchronized {
    sql match {
      case CtasRe(ine, table, query) => ctas(table, query, ine != null)
      case CreateRe(ine, table, colSpec) => createTable(table, colSpec, ine != null)
      case InsertPrefixRe(orMode, table, rest) =>
        // DuckDB upsert surface: `ON CONFLICT DO NOTHING` keeps the
        // non-conflicting rows; `ON CONFLICT DO UPDATE SET ...` merges
        // (the SET expressions may reference `excluded.<col>` = the
        // incoming row, DuckDB semantics). `INSERT OR IGNORE` / `INSERT OR
        // REPLACE` are DuckDB sugar for DO NOTHING / replace-whole-row.
        val OnConflictNothingRe =
          """(?is)(.*?)\s+ON\s+CONFLICT\s*(?:\([^)]*\))?\s+DO\s+NOTHING\s*""".r
        val OnConflictUpdateRe =
          """(?is)(.*?)\s+ON\s+CONFLICT\s*(?:\([^)]*\))?\s+DO\s+UPDATE\s+SET\s+(.*)""".r
        Option(orMode).map(_.toUpperCase) match {
          case Some("IGNORE") =>
            val (cols, source) = parseInsertBody(rest.trim)
            insert(table, cols, source, skipConflicts = true)
          case Some("REPLACE") =>
            // replace the whole conflicting row: DO UPDATE SET <every
            // non-PK column> = excluded.<col> (matching DuckDB's OR REPLACE)
            val (cols, source) = parseInsertBody(rest.trim)
            val (pk, _) = constraints.getOrElse(table.toLowerCase, (Nil, Nil))
            if (pk.isEmpty)
              throw new IllegalArgumentException(
                s"INSERT OR REPLACE requires a PRIMARY KEY on $table")
            val nonPk = spark.table(table).columns
              .filterNot(c => pk.exists(_.equalsIgnoreCase(c)))
            if (nonPk.isEmpty) insert(table, cols, source, skipConflicts = true)
            else insert(table, cols, source,
              upsertSet = Some(nonPk.map(c => s"$c = excluded.$c").mkString(", ")))
          case _ =>
            rest.trim match {
              case OnConflictUpdateRe(body, sets) =>
                val (cols, source) = parseInsertBody(body.trim)
                insert(table, cols, source, upsertSet = Some(sets.trim))
              case OnConflictNothingRe(body) =>
                val (cols, source) = parseInsertBody(body.trim)
                insert(table, cols, source, skipConflicts = true)
              case body =>
                val (cols, source) = parseInsertBody(body)
                insert(table, cols, source)
            }
        }
      case UpdateRe(table, rest) =>
        // split SET-list from FROM/WHERE at the first *top-level* keyword —
        // a regex split would match 'where' inside a string literal. A
        // top-level FROM marks DuckDB's join-form UPDATE.
        splitAtTopLevelKw(rest, "from") match {
          case (setClause, Some(fromRest)) =>
            val (fromClause, where) = splitAtTopLevelWhere(fromRest)
            updateFrom(table, setClause, fromClause, where)
          case (_, None) =>
            val (setClause, where) = splitAtTopLevelWhere(rest)
            update(table, setClause, where)
        }
      case DeleteUsingRe(table, tAlias, usingRest) =>
        val (usingClause, where) = splitAtTopLevelWhere(usingRest)
        deleteUsing(table, Option(tAlias), usingClause, where)
      case DeleteRe(table, where) => delete(table, Option(where))
      case DropRe(table) => dropTable(table)
      case ExportDbRe(dir) =>
        ExecuteResult(Snapshot.exportDatabase(this, dir).size.toLong)
      case ImportDbRe(dir) =>
        ExecuteResult(Snapshot.importDatabase(this, dir).size.toLong)
      case AlterRenameRe(table, from, to) =>
        alterRenameColumn(table, from, to)
      case AlterDropColRe(table, colName) =>
        alterDropColumn(table, colName)
      case CopyQueryToRe(query, path, optSpec) =>
        copyTo(spark.sql(rewriteReadFunctions(query)), path, optSpec)
      case CopyTableToRe(table, path, optSpec) =>
        copyTo(spark.table(table), path, optSpec)
      case CopyFromRe(table, path, optSpec) =>
        copyFrom(table, path, optSpec)
      case other =>
        // Any INSERT reaches InsertPrefixRe above; an INSERT variant we
        // can't parse must FAIL here, not silently skip PK/NOT NULL
        // enforcement via raw passthrough (DuckDB checks every insert path)
        if (other.trim.take(6).equalsIgnoreCase("INSERT"))
          throw new IllegalArgumentException(
            s"unsupported INSERT form (would bypass constraint checks): ${other.trim}")
        spark.sql(rewriteReadFunctions(other))
        ExecuteResult(0L)
    }
  }

  private val SummarizeRe = """(?is)\s*SUMMARIZE\s+([\w.]+)\s*""".r
  // DESCRIBE/DESC only — Spark's own SHOW TABLES/DATABASES etc. must keep
  // passing through to spark.sql untouched
  private val DescribeRe = """(?is)\s*(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?([\w.]+)\s*""".r
  private val PivotRe =
    """(?is)\s*PIVOT\s+([\w.]+)\s+ON\s+([\w.]+)\s+USING\s+(\w+)\s*\(\s*([\w.*]+)\s*\)(?:\s+GROUP\s+BY\s+(.*?))?\s*""".r
  private val UnpivotRe =
    """(?is)\s*UNPIVOT\s+([\w.]+)\s+ON\s+(.*?)\s+INTO\s+NAME\s+(\w+)\s+VALUE\s+(\w+)\s*""".r

  /** Read path (reference `db/db.go:67-117`): local, lock-free. The
    * dialect's top-level analysis statements rewrite to their Spark
    * equivalents before `spark.sql`:
    *  - `SUMMARIZE t` → per-column profile union (one partial+final
    *    aggregation per column, min/max rendered as strings);
    *  - `PIVOT t ON c USING agg(x) [GROUP BY g,...]` → `groupBy.pivot.agg`
    *    (two-phase: distinct pivot values, then the pivoted aggregate —
    *    grouping defaults to every other column, DuckDB semantics);
    *  - `UNPIVOT t ON a,b,... INTO NAME k VALUE v` → `Dataset.unpivot`;
    *  - `read_parquet/read_csv/read_json('path')` table functions →
    *    temp views over the file sources ([[rewriteReadFunctions]]). */
  def query(sql: String): QueryResult = Results.fromDataFrame(queryDf(sql))

  /** The read path as a DataFrame (what [[query]] wraps) — also the hook
    * the registered oracle queries use to exercise the SQL-text surface. */
  def queryDf(sql: String): DataFrame = sql match {
    case SummarizeRe(table) => summarize(spark.table(table))
    case DescribeRe(table) => describe(table)
    case PivotRe(table, on, fn, arg, grp) =>
      pivotStatement(table, on, fn, arg, Option(grp))
    case UnpivotRe(table, onList, nameCol, valueCol) =>
      val df = spark.table(table)
      val values = splitTopLevel(onList).map(c => col(c.trim))
      val valueNames = splitTopLevel(onList).map(_.trim.toLowerCase).toSet
      val ids = df.columns.filterNot(c => valueNames.contains(c.toLowerCase)).map(col)
      df.unpivot(ids.toArray, values.toArray, nameCol, valueCol)
    case _ => spark.sql(rewriteReadFunctions(sql))
  }

  // --- DuckDB file-reading table functions (a client's most common ad-hoc
  //     idiom, reachable through the reference passthrough `db/db.go:70`):
  //     `SELECT * FROM read_parquet('f.parquet')`, `read_csv(...)`,
  //     `read_json(...)`. Spark has no SQL-text table functions over bare
  //     paths, so each call site is rewritten to a temp view over the
  //     matching `sources/FileSources`-style reader before `spark.sql`.
  //     The scan stays a plain DataFrame source: pushdown and pruning work
  //     exactly as on a registered table.

  // path argument: one quoted path (globs pass through to the reader,
  // which expands them exactly like DuckDB) or a bracketed list
  // ['a','b',...] — DuckDB's multi-file form
  private val ReadFnRe =
    ("""(?i)(?<![\w.])read_(parquet|csv|csv_auto|json|json_auto)\s*\(\s*""" +
      """('[^']+'|\[\s*'[^']+'(?:\s*,\s*'[^']+')*\s*\])\s*((?:,[^)\[\]]*)?)\)""").r
  private val PathLitRe = """'([^']+)'""".r
  private val readViewCounter = new java.util.concurrent.atomic.AtomicLong

  /** Replace every `read_*('path'[, opts])` outside string literals with a
    * temp view name registered over that file. Quote parity decides
    * "outside": the path argument's own quotes sit INSIDE the match, so a
    * match starting at even parity is real syntax, not text in a literal. */
  private[engine] def rewriteReadFunctions(sql: String): String = {
    val matches = ReadFnRe.findAllMatchIn(sql).toList
    if (matches.isEmpty) return sql
    val sb = new StringBuilder
    var last = 0
    matches.foreach { m =>
      val outside = sql.substring(0, m.start).count(_ == '\'') % 2 == 0
      if (outside && m.start >= last) {
        val kind = m.group(1).toLowerCase
        val paths = PathLitRe.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
        val opts = Option(m.group(3)).getOrElse("")
        val df = readFunction(kind, paths, opts)
        val view = s"graft_read_${readViewCounter.incrementAndGet()}"
        df.createOrReplaceTempView(view)
        sb.append(sql.substring(last, m.start)).append(view)
        last = m.end
      }
    }
    sb.append(sql.substring(last))
    sb.toString
  }

  /** One file-function call → DataFrame. CSV/JSON accept DuckDB's common
    * named options (`header=`, `delim=`/`sep=`); types are inferred like
    * DuckDB's sniffer (ad-hoc reads — registered tables carry schemas). */
  private def readFunction(kind: String, path: Seq[String], optsText: String): DataFrame =
    kind match {
      case "parquet" => spark.read.parquet(path: _*)
      case "csv" | "csv_auto" =>
        var header = true
        var delim = ","
        splitTopLevel(optsText.stripPrefix(",")).map(_.trim).filter(_.nonEmpty).foreach { o =>
          val kv = o.split("=", 2).map(_.trim)
          kv(0).toLowerCase match {
            case "header" => header = kv(1).toLowerCase != "false" && kv(1) != "0"
            case "delim" | "sep" | "delimiter" =>
              delim = kv(1).stripPrefix("'").stripSuffix("'")
            case "auto_detect" => () // inference is already the default here
            case other =>
              throw new IllegalArgumentException(s"read_csv: unsupported option $other")
          }
        }
        spark.read.option("header", header.toString).option("delimiter", delim)
          .option("inferSchema", "true").csv(path: _*)
      case "json" | "json_auto" => spark.read.json(path: _*)
      case other => throw new IllegalArgumentException(s"read_$other unsupported")
    }

  /** `DESCRIBE t` — DuckDB's column listing (reachable through
    * `db/db.go:70`): (column_name, column_type, "null", key, default,
    * extra). Declared DuckDB type names come from the same field metadata
    * that powers DatabaseTypeName fidelity; YES/NO nullability and the PRI
    * key flag come from the gateway's constraint registry. Pure metadata —
    * no scan. */
  private def describe(table: String): DataFrame = {
    val df = spark.table(table)
    val (pk, notNull) = constraints.getOrElse(tableKey(table), (Nil, Nil))
    val rows = df.schema.fields.map { f =>
      val nn = notNull.exists(_.equalsIgnoreCase(f.name))
      (f.name, Results.duckTypeName(f),
        if (nn) "NO" else "YES",
        if (pk.exists(_.equalsIgnoreCase(f.name))) "PRI" else null,
        null: String, null: String)
    }
    spark.createDataFrame(rows.toSeq)
      .toDF("column_name", "column_type", "null", "key", "default", "extra")
  }

  private def pivotStatement(table: String, on: String, fn: String, arg: String,
      grp: Option[String]): DataFrame = {
    val df = spark.table(table)
    val aggExpr = fn.toLowerCase match {
      case "sum" => sum(col(arg))
      case "count" => if (arg == "*") count(lit(1)) else count(col(arg))
      case "min" => min(col(arg))
      case "max" => max(col(arg))
      case "avg" => avg(col(arg))
      case other => throw new IllegalArgumentException(s"PIVOT USING $other unsupported")
    }
    val groupCols = grp match {
      case Some(g) => splitTopLevel(g).map(c => col(c.trim))
      case None => // DuckDB default: group by every non-pivot, non-value column
        df.columns
          .filterNot(c => c.equalsIgnoreCase(on) || c.equalsIgnoreCase(arg))
          .map(col).toSeq
    }
    df.groupBy(groupCols: _*).pivot(on).agg(aggExpr)
  }

  private def summarize(df: org.apache.spark.sql.DataFrame): DataFrame = {
    val profiles = df.schema.fields.map { f =>
      df.agg(
        count(lit(1)).as("count"),
        countDistinct(col(f.name)).as("approx_unique"),
        count(when(col(f.name).isNull, 1)).as("null_count"),
        min(col(f.name)).cast("string").as("min"),
        max(col(f.name)).cast("string").as("max"))
        .select(lit(f.name).as("column_name"), lit(f.dataType.sql).as("column_type"),
          col("min"), col("max"), col("approx_unique"), col("null_count"), col("count"))
    }
    profiles.reduce(_.unionByName(_))
  }

  // --- storage layout helpers (versioned data directories) --------------

  private def tableKey(table: String): String = table.toLowerCase

  /** Per-table root for versioned data dirs — distinct from the managed
    * location Spark would pick, so the two never collide. */
  private def tableRoot(table: String): String = {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
    s"$wh/${tableKey(table).replace('.', '_')}__graft"
  }

  private def deleteDir(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Create the catalog entry for `table` over the parquet dir `loc` with
    * an explicit schema. Goes through the catalog API, not DDL text,
    * because `schema.toDDL` drops field METADATA — which carries declared
    * DuckDB types ([[Results.DuckTypeKey]]) through DML rewrites and
    * snapshot round trips (parquet footers persist it too). */
  private def createCatalogEntry(table: String,
      schema: org.apache.spark.sql.types.StructType, loc: String): Unit = {
    spark.catalog.createTable(table, "parquet", schema,
      Map("path" -> loc))
    ()
  }

  /** Create `table` populated from `df`, versioned from birth (v0). Used
    * by CTAS and by snapshot import. */
  private[engine] def createFromData(table: String, df: DataFrame): Unit = {
    val loc = s"${tableRoot(table)}/v0"
    deleteDir(tableRoot(table))
    df.write.parquet(loc)
    createCatalogEntry(table, df.schema, loc)
    versions(tableKey(table)) = 0
  }

  private[engine] def dropTable(table: String): ExecuteResult = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    constraints.remove(tableKey(table))
    checks.remove(tableKey(table))
    versions.remove(tableKey(table))
    // DROP TABLE leaves the files of a LOCATION-backed table in place —
    // remove our versioned data dirs so a re-CREATE starts empty
    deleteDir(tableRoot(table))
    ExecuteResult(0L)
  }

  // --- CREATE TABLE AS SELECT: DuckDB runs the query and reports the row
  //     count; a CTAS table carries no declared constraints.
  private def ctas(table: String, query: String, ifNotExists: Boolean): ExecuteResult = {
    if (ifNotExists && spark.catalog.tableExists(table)) return ExecuteResult(0L)
    createFromData(table, spark.sql(rewriteReadFunctions(query)))
    constraints.remove(tableKey(table))
    ExecuteResult(spark.table(table).count())
  }

  // --- CREATE TABLE: strip constraint syntax Spark's parser rejects,
  //     normalize DuckDB-isms (TEXT), map the DuckDB-only types Spark
  //     lacks (UUID/TIME/TIMESTAMPTZ/HUGEINT/ENUM) onto storage types with
  //     the declared name stamped into field metadata for DatabaseTypeName
  //     fidelity (db/db.go:89-93), and remember the constraints.
  private def createTable(table: String, colSpec: String, ifNotExists: Boolean): ExecuteResult = {
    // IF NOT EXISTS on an existing table is a no-op (DuckDB semantics) —
    // and must NOT overwrite the live table's constraint metadata
    if (ifNotExists && spark.catalog.tableExists(table)) return ExecuteResult(0L)
    var pk = Vector.empty[String]
    var notNull = Vector.empty[String]
    var checkExprs = Vector.empty[String]
    val cleaned = splitTopLevel(colSpec).flatMap { raw =>
      val item = raw.trim
      val pkTable = """(?is)PRIMARY\s+KEY\s*\(([^)]*)\)""".r
      val checkTable = """(?is)CHECK\s*\((.*)\)\s*""".r
      item match {
        case pkTable(cols) =>
          pk ++= cols.split(",").map(_.trim.toLowerCase); None
        case checkTable(e) => // table-level CHECK (expr)
          checkExprs :+= e.trim; None
        case _ =>
          val parts = item.split("\\s+", 2)
          val name = parts(0)
          var spec = if (parts.length > 1) parts(1) else ""
          if ("""(?i).*\bPRIMARY\s+KEY\b.*""".r.matches(spec)) {
            pk :+= name.toLowerCase
            spec = spec.replaceAll("(?i)\\bPRIMARY\\s+KEY\\b", " ")
          }
          if ("""(?i).*\bNOT\s+NULL\b.*""".r.matches(spec)) {
            notNull :+= name.toLowerCase
            spec = spec.replaceAll("(?i)\\bNOT\\s+NULL\\b", " ")
          }
          // column-level CHECK (expr) — same enforcement as table-level
          val colCheck = """(?is)(.*?)\bCHECK\s*\((.*)\)\s*(.*)""".r
          spec match {
            case colCheck(pre, e, post) =>
              checkExprs :+= e.trim
              spec = (pre + " " + post).trim
            case _ => ()
          }
          spec = spec.replaceAll("(?i)\\bTEXT\\b", "STRING").trim
          Some((name, spec))
      }
    }
    // DuckDB type-surface corners reachable through the reference
    // passthrough (SURVEY §1.2 via db/db.go:70) with no Spark native type:
    // store in the closest Spark type, declare the DuckDB name in metadata.
    def cornerType(spec: String): Option[(String, String)] = {
      val u = spec.trim.toUpperCase
      u match {
        case "UUID" => Some(("STRING", "UUID"))
        case "TIME" => Some(("STRING", "TIME"))
        case "TIMESTAMPTZ" | "TIMESTAMP WITH TIME ZONE" =>
          Some(("TIMESTAMP", "TIMESTAMP WITH TIME ZONE"))
        case "HUGEINT" => Some(("DECIMAL(38,0)", "HUGEINT"))
        case "BIT" | "BITSTRING" => Some(("STRING", "BIT"))
        case e if e.startsWith("ENUM") => Some(("STRING", spec.trim))
        // tagged UNION(tag TYPE, ...): DuckDB renders a union value as its
        // active member cast to VARCHAR at the database/sql boundary, so
        // string storage reproduces the wire value; the declared member
        // list survives verbatim in DatabaseTypeName (db/db.go:89-93).
        case e if e.startsWith("UNION(") => Some(("STRING", spec.trim))
        case _ => None
      }
    }
    val fields = cleaned.map { case (name, spec) =>
      cornerType(spec) match {
        case Some((storage, duckName)) =>
          org.apache.spark.sql.types.StructField(name,
            org.apache.spark.sql.types.DataType.fromDDL(storage),
            nullable = true,
            new org.apache.spark.sql.types.MetadataBuilder()
              .putString(Results.DuckTypeKey, duckName).build())
        case None =>
          org.apache.spark.sql.types.StructField(name,
            org.apache.spark.sql.types.DataType.fromDDL(spec), nullable = true)
      }
    }
    val loc = s"${tableRoot(table)}/v0"
    deleteDir(tableRoot(table)) // stale files from a prior incarnation must not resurface
    createCatalogEntry(table, org.apache.spark.sql.types.StructType(fields), loc)
    versions(tableKey(table)) = 0
    if (pk.nonEmpty || notNull.nonEmpty)
      constraints(tableKey(table)) = (pk, (notNull ++ pk).distinct)
    else constraints.remove(tableKey(table))
    if (checkExprs.nonEmpty) checks(tableKey(table)) = checkExprs
    else checks.remove(tableKey(table))
    ExecuteResult(0L)
  }

  /** `INSERT INTO t <rest>` → (optional column list, source query text).
    * The column list is only a column list when something follows its
    * closing paren; `INSERT INTO t (SELECT ...)` is a paren-wrapped source
    * (legal in DuckDB) and must still flow through the CHECKED insert path
    * — the old first-`)` regex let it fall through to raw passthrough,
    * silently skipping PK/NOT NULL enforcement. */
  private def parseInsertBody(rest: String): (Option[String], String) =
    if (rest.startsWith("(")) {
      val close = matchingParen(rest)
      val inside = rest.substring(1, close).trim
      val after = rest.substring(close + 1).trim
      if (after.isEmpty) (None, inside) else (Some(inside), after)
    } else (None, rest)

  /** Index of the `)` closing the paren at position 0 (quote-aware). */
  private def matchingParen(s: String): Int = {
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr =>
          depth -= 1
          if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses in INSERT: $s")
  }

  /** Find the first `kw` keyword outside quotes/parens and split there. */
  private def splitAtTopLevelKw(s: String, kw: String): (String, Option[String]) = {
    var depth = 0; var inStr = false
    var i = 0
    val k = kw.length
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case c if !inStr && depth == 0 &&
            Character.toLowerCase(c) == kw.charAt(0) &&
            i + k <= s.length && s.substring(i, i + k).equalsIgnoreCase(kw) &&
            (i == 0 || s.charAt(i - 1).isWhitespace) &&
            (i + k == s.length || s.charAt(i + k).isWhitespace) =>
          return (s.substring(0, i).trim, Some(s.substring(i + k).trim))
        case _ => ()
      }
      i += 1
    }
    (s.trim, None)
  }

  private def splitAtTopLevelWhere(s: String): (String, Option[String]) =
    splitAtTopLevelKw(s, "where")

  /** Split a column-spec / SET list on top-level commas — aware of paren
    * depth AND single-quoted string literals (a comma inside 'x, y' must
    * not split). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0; var inStr = false; val cur = new StringBuilder
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case ',' if depth == 0 && !inStr => out += cur.toString; cur.clear()
      case c =>
        if (!inStr) { if (c == '(') depth += 1 else if (c == ')') depth -= 1 }
        cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** Throw if any row of `df` violates a registered CHECK of `table`.
    * SQL semantics: a row fails only when the expression is FALSE — NULL
    * passes (`expr === false` is NULL for NULL, dropped by the filter).
    * One distributed filter per check; no driver loop. */
  private def enforceChecks(table: String, df: DataFrame): Unit =
    checks.getOrElse(tableKey(table), Nil).foreach { e =>
      if (df.filter(expr(e) === lit(false)).limit(1).count() > 0)
        throw new IllegalArgumentException(
          s"CHECK constraint failed: $table CHECK ($e)")
    }

  /** True iff `colName` appears as an identifier in any CHECK of `table` —
    * the guard ALTER RENAME/DROP uses (DuckDB refuses to mutate a column a
    * CHECK depends on). */
  private def checkReferences(table: String, colName: String): Boolean =
    checks.getOrElse(tableKey(table), Nil).exists(e =>
      ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(colName) + "(?![\\w])").r
        .findFirstIn(e).isDefined)

  // --- INSERT with constraint enforcement (anti-join uniqueness check).
  //     skipConflicts = ON CONFLICT DO NOTHING: PK collisions (in-batch
  //     dups keep the first occurrence; existing keys drop) are filtered
  //     instead of rejected — rows_affected counts what actually landed.
  private def insert(table: String, cols: Option[String], source: String,
      skipConflicts: Boolean = false, upsertSet: Option[String] = None): ExecuteResult = {
    val batchSql = cols match {
      case Some(c) => s"SELECT * FROM (${valuesToSelect(source, c)})"
      case None => valuesToSelect(source, "")
    }
    var batch = spark.sql(rewriteReadFunctions(batchSql))
    val target = spark.table(table)
    // align batch columns to target schema (explicit column list or position)
    batch = cols match {
      case Some(c) =>
        val given = c.split(",").map(_.trim)
        val renamed = batch.toDF(given.toIndexedSeq: _*)
        val missing = target.columns.filterNot(t => given.exists(_.equalsIgnoreCase(t)))
        missing.foldLeft(renamed)((df, m) =>
          df.withColumn(m, lit(null).cast(target.schema(m).dataType)))
          .select(target.columns.map(col).toIndexedSeq: _*)
      case None => batch.toDF(target.columns.toIndexedSeq: _*)
    }
    batch = target.columns.foldLeft(batch)((df, c) =>
      df.withColumn(c, col(c).cast(target.schema(c).dataType)))

    // stage once: the batch feeds the constraint checks AND the write.
    // __pos records each row's in-batch position (monotonic id: partition
    // index ≪ 33 | row-in-partition, which preserves a VALUES list's
    // literal order) so ON CONFLICT DO NOTHING can keep the FIRST
    // occurrence of a duplicated key deterministically
    val stagedPos = batch
      .withColumn("__pos", monotonically_increasing_id())
      .localCheckpoint(true)
    val staged = stagedPos.drop("__pos")
    val (pk, notNull) = constraints.getOrElse(table.toLowerCase, (Nil, Nil))
    // one aggregate job: row count + per-column null counts + in-batch dups
    val aggs = count(lit(1)).as("__n") +:
      notNull.map(c => count(when(col(c).isNull, 1)).as(s"__null_$c")) :+
      (if (pk.nonEmpty)
        (count(lit(1)) - countDistinct(col(pk.head), pk.tail.map(col): _*))
          .as("__pk_dups")
      else count(when(lit(false), 1)).as("__pk_dups"))
    val stats = staged.agg(aggs.head, aggs.tail: _*).collect().head
    notNull.foreach { c =>
      if (stats.getAs[Long](s"__null_$c") > 0)
        throw new IllegalArgumentException(s"NOT NULL constraint failed: $table.$c")
    }
    enforceChecks(table, staged) // CHECK holds on every ingest path, like DuckDB
    if (upsertSet.isDefined) return upsertMerge(table, target, staged, pk, stats, upsertSet.get)
    if (pk.nonEmpty && !skipConflicts) {
      if (stats.getAs[Long]("__pk_dups") > 0)
        throw new IllegalArgumentException(
          s"PRIMARY KEY constraint failed (duplicate in batch): $table(${pk.mkString(",")})")
      if (staged.join(target, pk.toSeq, "left_semi").limit(1).count() > 0)
        throw new IllegalArgumentException(
          s"PRIMARY KEY constraint failed (key exists): $table(${pk.mkString(",")})")
    }
    if (pk.nonEmpty && skipConflicts) {
      // keep the FIRST in-batch occurrence per key (min __pos), matching
      // the documented DO NOTHING semantics — dropDuplicates keeps an
      // arbitrary row
      val firstW = org.apache.spark.sql.expressions.Window
        .partitionBy(pk.map(col): _*).orderBy(col("__pos").asc)
      val surviving = stagedPos
        .withColumn("__rn", row_number().over(firstW))
        .filter(col("__rn") === 1).drop("__pos", "__rn")
        .join(target, pk.toSeq, "left_anti")
        .localCheckpoint(eager = true)
      val n = surviving.count()
      surviving.write.mode("append").insertInto(table)
      ExecuteResult(n)
    } else {
      staged.write.mode("append").insertInto(table)
      ExecuteResult(stats.getAs[Long]("__n"))
    }
  }

  /** `ON CONFLICT DO UPDATE SET ...`: a distributed full-outer merge on
    * the PK — target-only rows pass through, new rows insert, conflicting
    * rows take the SET expressions (with `excluded.<col>` bound to the
    * incoming row, DuckDB semantics) — written through the versioned
    * atomic swap, so readers never see a half-merged table.
    * rows_affected = batch size (inserted + updated), as in DuckDB. */
  private def upsertMerge(table: String, target: DataFrame, staged: DataFrame,
      pk: Seq[String], stats: org.apache.spark.sql.Row, sets: String): ExecuteResult = {
    if (pk.isEmpty)
      throw new IllegalArgumentException(
        s"ON CONFLICT DO UPDATE requires a PRIMARY KEY on $table")
    if (stats.getAs[Long]("__pk_dups") > 0)
      throw new IllegalArgumentException(
        s"ON CONFLICT DO UPDATE: duplicate key within the batch is ambiguous: $table")
    val known = target.columns.map(_.toLowerCase).toSet
    val assignments = splitTopLevel(sets).map { a =>
      val Array(c, e) = a.split("=", 2)
      val colName = c.trim.toLowerCase
      if (!known.contains(colName))
        throw new IllegalArgumentException(s"upsert $table: unknown column ${c.trim}")
      // bind DuckDB's `excluded.<col>` to the staged batch's aliased cols
      (colName, rewriteExcluded(e.trim))
    }.toMap
    val ex = staged.select(staged.columns.map(c => col(c).as(s"__ex_$c")).toIndexedSeq: _*)
    val cond = pk.map(k => col(k) === col(s"__ex_$k")).reduce(_ && _)
    val merged = target.join(ex, cond, "full").select(target.columns.map { c =>
      val updated = assignments.get(c.toLowerCase)
        .map(e => expr(e).cast(target.schema(c).dataType))
        .getOrElse(col(c))
      when(col(s"__ex_${pk.head}").isNull, col(c)) // target-only row
        .when(col(pk.head).isNull, col(s"__ex_$c")) // brand-new row
        .otherwise(updated) // conflict → SET expressions
        .as(c)
    }.toIndexedSeq: _*)
    enforceChecks(table, merged) // upserted + merged rows must satisfy CHECK
    overwriteTable(table, merged)
    ExecuteResult(stats.getAs[Long]("__n"))
  }

  /** Rewrite `excluded.<col>` → `__ex_<col>` — but ONLY outside
    * single-quoted string literals, and only at identifier boundaries: a
    * plain replaceAll would also rewrite `'see excluded.x'` inside a SET
    * string value, silently corrupting the stored text. */
  private[engine] def rewriteExcluded(e: String): String = {
    val kw = "excluded"
    val out = new StringBuilder
    var i = 0; var inStr = false
    while (i < e.length) {
      val c = e.charAt(i)
      if (c == '\'') { inStr = !inStr; out += c; i += 1 }
      else if (!inStr && (c == 'e' || c == 'E') &&
          i + kw.length <= e.length &&
          e.substring(i, i + kw.length).equalsIgnoreCase(kw) &&
          (i == 0 || { val p = e.charAt(i - 1); !(p.isLetterOrDigit || p == '_') })) {
        // require the dot (with optional whitespace) to follow — bare
        // `excluded` that is not a qualifier is left untouched
        var j = i + kw.length
        while (j < e.length && e.charAt(j).isWhitespace) j += 1
        if (j < e.length && e.charAt(j) == '.') {
          j += 1
          while (j < e.length && e.charAt(j).isWhitespace) j += 1
          out ++= "__ex_"; i = j
        } else { out += c; i += 1 }
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** `VALUES (...),(...)` → runnable SELECT; pass SELECT/TABLE through. */
  private def valuesToSelect(source: String, cols: String): String = {
    val s = source.trim
    if (s.toUpperCase.startsWith("VALUES")) s"SELECT * FROM ($s)"
    else s
  }

  // --- ALTER TABLE vs the constraint registry (VERDICT r3 item 7): Spark's
  //     v1 parquet tables support neither RENAME COLUMN nor DROP COLUMN, and
  //     a raw passthrough would anyway leave `constraints` naming a column
  //     that no longer exists — a stale PK that breaks every later INSERT.
  //     Both statements are full read-rewrite-swap commands here (same
  //     versioned-dir machinery as UPDATE/DELETE), with the registry updated
  //     in the same locked step.

  private def alterRenameColumn(table: String, from: String, to: String): ExecuteResult = {
    val target = spark.table(table)
    val actual = target.columns.find(_.equalsIgnoreCase(from)).getOrElse(
      throw new IllegalArgumentException(s"ALTER $table: unknown column $from"))
    if (target.columns.exists(_.equalsIgnoreCase(to)))
      throw new IllegalArgumentException(s"ALTER $table: column $to already exists")
    // renaming a column a CHECK references would orphan the expression
    // text (DuckDB rewrites it; refusing is the honest subset)
    if (checkReferences(table, from))
      throw new IllegalArgumentException(
        s"ALTER $table: column $from is referenced by a CHECK constraint")
    replaceSchema(table, target.withColumnRenamed(actual, to))
    constraints.updateWith(tableKey(table)) {
      case Some((pk, nn)) =>
        def ren(cols: Seq[String]) =
          cols.map(c => if (c.equalsIgnoreCase(from)) to.toLowerCase else c)
        Some((ren(pk), ren(nn)))
      case None => None
    }
    ExecuteResult(0L)
  }

  private def alterDropColumn(table: String, colName: String): ExecuteResult = {
    val target = spark.table(table)
    val actual = target.columns.find(_.equalsIgnoreCase(colName)).getOrElse(
      throw new IllegalArgumentException(s"ALTER $table: unknown column $colName"))
    val (pk, _) = constraints.getOrElse(tableKey(table), (Nil, Nil))
    // DuckDB refuses to drop a key column while the constraint stands —
    // silently un-keying the table would be worse than erroring
    if (pk.exists(_.equalsIgnoreCase(colName)))
      throw new IllegalArgumentException(
        s"ALTER $table: cannot drop PRIMARY KEY column $colName")
    if (checkReferences(table, colName))
      throw new IllegalArgumentException(
        s"ALTER $table: cannot drop column $colName referenced by a CHECK constraint")
    replaceSchema(table, target.drop(actual))
    constraints.updateWith(tableKey(table)) {
      case Some((p, nn)) => Some((p, nn.filterNot(_.equalsIgnoreCase(colName))))
      case None => None
    }
    ExecuteResult(0L)
  }

  // --- COPY (reference passthrough surface; DuckDB Copy semantics:
  //     rows_affected = rows copied, COPY FROM obeys table constraints)

  /** Parse a DuckDB COPY option list into (spark format, reader/writer
    * options). Defaults mirror DuckDB: no FORMAT means CSV, and DuckDB's
    * CSV writer emits a header unless HEADER false. */
  private def copyOptions(spec: String): (String, Map[String, String], Seq[String]) = {
    var format = "csv"
    var partitionBy = Seq.empty[String]
    val opts = scala.collection.mutable.Map("header" -> "true")
    Option(spec).toSeq.flatMap(splitTopLevel).map(_.trim).filter(_.nonEmpty).foreach { o =>
      val parts = o.split("\\s+", 2)
      parts(0).toUpperCase match {
        case "FORMAT" => format = parts(1).trim.toLowerCase
        case "HEADER" =>
          opts("header") =
            if (parts.length == 1) "true"
            else (parts(1).trim.toLowerCase != "false" && parts(1).trim != "0").toString
        case "DELIMITER" | "DELIM" | "SEP" =>
          opts("delimiter") = parts(1).trim.stripPrefix("'").stripSuffix("'")
        case "PARTITION_BY" =>
          // DuckDB's hive-layout export: PARTITION_BY (a, b) or PARTITION_BY a
          partitionBy = parts(1).trim.stripPrefix("(").stripSuffix(")")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case _ => throw new IllegalArgumentException(s"unsupported COPY option: $o")
      }
    }
    format match {
      case "parquet" | "json" => (format, Map.empty, partitionBy)
      case "csv" => ("csv", opts.toMap, partitionBy)
      case f => throw new IllegalArgumentException(s"unsupported COPY format: $f")
    }
  }

  /** `COPY <t|(query)> TO 'path' (...)`: distributed export — every
    * partition writes its own part file (the 100 TB posture; DuckDB's
    * single file would serialize the write through one thread). Staged
    * via persist so the count and the write share one computation. */
  private def copyTo(df: DataFrame, path: String, optSpec: String): ExecuteResult = {
    val (fmt, opts, partitionBy) = copyOptions(optSpec)
    val staged = df.persist()
    try {
      val n = staged.count()
      // PARTITION_BY → hive directory layout (key=value dirs), the pruning
      // lever a partition-key filter uses to skip whole directories
      staged.write.format(fmt).options(opts)
        .partitionBy(partitionBy: _*).mode("overwrite").save(path)
      ExecuteResult(n)
    } finally staged.unpersist()
  }

  /** `COPY t FROM 'path' (...)`: reads the file(s) and routes through the
    * same constraint-checked [[insert]] path as INSERT — PK and NOT NULL
    * hold on every ingest path, exactly as DuckDB enforces them on COPY. */
  private def copyFrom(table: String, path: String, optSpec: String): ExecuteResult = {
    val (fmt, opts, _) = copyOptions(optSpec)
    val target = spark.table(table) // errors like DuckDB if the table is absent
    val reader = spark.read.format(fmt).options(opts)
    val src = fmt match {
      // CSV carries no types: read against the target schema (DuckDB
      // casts CSV text to the table's column types the same way)
      case "csv" => reader.schema(target.schema).load(path)
      case _ => reader.load(path)
    }
    val view = s"graft_copy_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    src.createOrReplaceTempView(view)
    try insert(table, None, s"SELECT * FROM $view")
    finally spark.catalog.dropTempView(view)
  }

  /** Schema-changing table rewrite (ALTER): write the new contents to the
    * next versioned dir, then drop + recreate the catalog entry against it.
    * The catalog swap is two metadata ops, not one — a reader that resolves
    * the name in that window fails (readers already resolved keep their
    * `v<N>` snapshot, whose files stay on disk). DDL is not a hot path;
    * writers are serialized by the gateway lock. */
  private def replaceSchema(table: String, df: DataFrame): Unit =
    versions.get(tableKey(table)) match {
      case Some(cur) =>
        val next = cur + 1
        val loc = s"${tableRoot(table)}/v$next"
        deleteDir(loc)
        df.write.parquet(loc)
        spark.sql(s"DROP TABLE $table")
        createCatalogEntry(table, df.schema, loc)
        versions(tableKey(table)) = next
        if (next >= 2) deleteDir(s"${tableRoot(table)}/v${next - 2}")
      case None =>
        val staged = df.localCheckpoint(eager = true)
        spark.sql(s"DROP TABLE $table")
        createFromData(table, staged)
    }

  // --- UPDATE: read-filter-rewrite (write temp, swap via overwrite).
  private def update(table: String, setClause: String, where: Option[String]): ExecuteResult = {
    val target = spark.table(table)
    val pred = where.map(expr).getOrElse(lit(true))
    val assignments = splitTopLevel(setClause).map { a =>
      val Array(c, e) = a.split("=", 2)
      (c.trim, expr(e.trim))
    }
    // a SET target that names no table column is an error (SQL engines
    // raise unknown-column; silently dropping it would "succeed" a typo)
    val known = target.columns.map(_.toLowerCase).toSet
    assignments.foreach { case (c, _) =>
      if (!known.contains(c.toLowerCase))
        throw new IllegalArgumentException(s"UPDATE $table: unknown column $c")
    }
    val affected = target.filter(pred).count()
    // SQL UPDATE evaluates every SET expression against the OLD row
    // (UPDATE t SET a = b, b = a swaps) — so build one simultaneous
    // projection instead of folding withColumn (which would let later
    // assignments see already-updated values)
    val byName = assignments.map { case (c, e) => c.toLowerCase -> e }.toMap
    val updated = target.select(target.columns.map { c =>
      byName.get(c.toLowerCase) match {
        case Some(e) =>
          when(pred, e.cast(target.schema(c).dataType)).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }.toIndexedSeq: _*)
    enforceChecks(table, updated.filter(pred)) // rewritten rows must still satisfy CHECK
    overwriteTable(table, updated)
    ExecuteResult(affected)
  }

  /** `FROM u` / `USING u` clause text → (source DataFrame, alias). Accepts
    * `u`, `u a`, `u AS a`. */
  private def sourceClause(clause: String): (DataFrame, String) = {
    val (name, alias) = clause.trim.split("\\s+").toList match {
      case n :: Nil => (n, n.split("\\.").last)
      case n :: a :: Nil => (n, a)
      case n :: as_ :: a :: Nil if as_.equalsIgnoreCase("AS") => (n, a)
      case _ => throw new IllegalArgumentException(
        s"unsupported FROM/USING clause (single table [AS alias] only): $clause")
    }
    (spark.table(name), alias)
  }

  // --- UPDATE ... FROM (DuckDB's join-form update, reachable through the
  //     reference passthrough `db/db.go:52`): each target row matching at
  //     least one source row under WHERE takes the SET expressions, which
  //     may reference the matched source row's columns. One distributed
  //     plan: tag target rows with a row id, join on the predicate, keep
  //     ONE deterministic match per target row (DuckDB's own pick among
  //     multiple matches is unspecified; sorting by the source row makes
  //     ours stable), left-join the per-row SET values back, swap via the
  //     versioned-dir rewrite. No driver loop anywhere.
  private def updateFrom(table: String, setClause: String, fromClause: String,
      where: Option[String]): ExecuteResult = {
    val target = spark.table(table)
    val (src, srcAlias) = sourceClause(fromClause)
    val tAlias = table.split("\\.").last
    val actualByLower = target.columns.map(c => c.toLowerCase -> c).toMap
    val assignments = splitTopLevel(setClause).map { a =>
      val Array(c, e) = a.split("=", 2)
      val cn = c.trim.toLowerCase
      if (!actualByLower.contains(cn))
        throw new IllegalArgumentException(s"UPDATE $table: unknown column ${c.trim}")
      cn -> e.trim
    }
    // pin row ids: the id column feeds two plans (hit count + merge-back)
    // and must not be re-derived differently on re-execution
    val t = target.withColumn("__rid", monotonically_increasing_id())
      .localCheckpoint(eager = true)
    val cond = where.map(expr).getOrElse(lit(true))
    val pickW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__rid"))
      .orderBy(src.columns.map(c => col(s"$srcAlias.$c")).toIndexedSeq: _*)
    // SET expressions evaluate against the OLD target row + matched source
    // row (both visible in the join), exactly like simple UPDATE's
    // simultaneous projection
    val hits = t.alias(tAlias).join(src.alias(srcAlias), cond, "inner")
      .withColumn("__rn", row_number().over(pickW)).filter(col("__rn") === 1)
      .select(col("__rid").as("__hit_rid") +: assignments.map { case (cn, e) =>
        expr(e).cast(target.schema(actualByLower(cn)).dataType).as(s"__set_$cn")
      }.toIndexedSeq: _*)
      .localCheckpoint(eager = true)
    val affected = hits.count()
    val updated = t.join(hits, col("__rid") === col("__hit_rid"), "left")
      .select(target.columns.map { c =>
        val cn = c.toLowerCase
        if (assignments.exists(_._1 == cn))
          when(col("__hit_rid").isNotNull, col(s"__set_$cn")).otherwise(col(c)).as(c)
        else col(c)
      }.toIndexedSeq: _*)
    enforceChecks(table, updated) // merged rows must still satisfy CHECK
    overwriteTable(table, updated)
    ExecuteResult(affected)
  }

  // --- DELETE ... USING (DuckDB's join-form delete): drop every target
  //     row with at least one WHERE-matching source row. A left-anti join
  //     IS that semantics (NULL predicate → no match → row kept, as SQL
  //     requires); the affected count is the matching left-semi.
  private def deleteUsing(table: String, tAliasOpt: Option[String],
      usingClause: String, where: Option[String]): ExecuteResult = {
    val w = where.getOrElse(throw new IllegalArgumentException(
      s"DELETE FROM $table USING ... requires a WHERE clause"))
    val target = spark.table(table)
    val (src, srcAlias) = sourceClause(usingClause)
    val tAlias = tAliasOpt.getOrElse(table.split("\\.").last)
    val pred = expr(w)
    val affected = target.alias(tAlias)
      .join(src.alias(srcAlias), pred, "left_semi").count()
    val remaining = target.alias(tAlias).join(src.alias(srcAlias), pred, "left_anti")
    overwriteTable(table, remaining)
    ExecuteResult(affected)
  }

  // --- DELETE: read-filter-rewrite.
  private def delete(table: String, where: Option[String]): ExecuteResult = {
    val target = spark.table(table)
    where match {
      case None =>
        val n = target.count()
        overwriteTable(table, target.limit(0))
        ExecuteResult(n)
      case Some(w) =>
        // SQL deletes rows where the predicate is TRUE; rows where it is
        // NULL are KEPT — `!pred` alone would drop them (NULL stays NULL)
        val pred = coalesce(expr(w), lit(false))
        val n = target.filter(pred).count()
        overwriteTable(table, target.filter(!pred))
        ExecuteResult(n)
    }
  }

  /** Atomic table rewrite. For versioned tables (anything created through
    * the gateway): write the new contents COMPLETELY to `v<N+1>` — the
    * rewrite plan reads the live `v<N>` files, so no self-read staging is
    * needed — then repoint the catalog in one metadata operation. A reader
    * resolved against `v<N>` keeps its intact snapshot (the reference gets
    * the same isolation from DuckDB MVCC); a failure mid-write leaves the
    * live table untouched. `v<N-1>` is GC'd (retain current + previous,
    * mirroring the reference's `retainSnapshotCount = 2`).
    *
    * Tables that bypassed the gateway DDL path (raw passthrough) have no
    * version dir; they fall back to checkpoint + in-place overwrite, which
    * is atomic only against failure after the checkpoint, not against
    * concurrent reads — the versioned path is the supported one. */
  private def overwriteTable(table: String, df: DataFrame): Unit =
    versions.get(tableKey(table)) match {
      case Some(cur) =>
        val next = cur + 1
        val loc = s"${tableRoot(table)}/v$next"
        deleteDir(loc) // leftovers of a previously failed rewrite attempt
        df.write.parquet(loc)
        spark.sql(s"ALTER TABLE $table SET LOCATION '$loc'")
        spark.catalog.refreshTable(table)
        versions(tableKey(table)) = next
        if (next >= 2) deleteDir(s"${tableRoot(table)}/v${next - 2}")
      case None =>
        val staged = df.localCheckpoint(eager = true)
        staged.write.mode("overwrite").insertInto(table)
    }
}
