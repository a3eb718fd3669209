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
  */
class SqlGateway(val spark: SparkSession) {
  private val writeLock = new Object
  /** table → (primary-key columns, not-null columns) */
  private[engine] val constraints = new TrieMap[String, (Seq[String], Seq[String])]

  private val CreateRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.*)\)\s*""".r
  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+([\w.]+)\s*(\([^)]*\))?\s*(VALUES.*|SELECT.*|TABLE.*|FROM.*)""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+([\w.]+)\s+SET\s+(.*)\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*))?\s*""".r
  private val DropRe = """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*""".r

  /** Write path (reference `db/db.go:49-65`). */
  def execute(sql: String): ExecuteResult = writeLock.synchronized {
    sql match {
      case CreateRe(table, colSpec) => createTable(table, colSpec)
      case InsertRe(table, cols, source) =>
        insert(table, Option(cols).map(_.stripPrefix("(").stripSuffix(")")), source)
      case UpdateRe(table, rest) =>
        // split SET-list from WHERE at the first *top-level* WHERE — a
        // regex split would match 'where' inside a string literal
        val (setClause, where) = splitAtTopLevelWhere(rest)
        update(table, setClause, where)
      case DeleteRe(table, where) => delete(table, Option(where))
      case DropRe(table) =>
        spark.sql(s"DROP TABLE IF EXISTS $table")
        constraints.remove(table.toLowerCase)
        ExecuteResult(0L)
      case other =>
        spark.sql(other)
        ExecuteResult(0L)
    }
  }

  /** Read path (reference `db/db.go:67-117`): local, lock-free. */
  def query(sql: String): QueryResult = Results.fromDataFrame(spark.sql(sql))

  // --- CREATE TABLE: strip constraint syntax Spark's parser rejects,
  //     normalize DuckDB-isms (TEXT), and remember the constraints.
  private def createTable(table: String, colSpec: String): ExecuteResult = {
    var pk = Vector.empty[String]
    var notNull = Vector.empty[String]
    val cleaned = splitTopLevel(colSpec).flatMap { raw =>
      val item = raw.trim
      val pkTable = """(?is)PRIMARY\s+KEY\s*\(([^)]*)\)""".r
      item match {
        case pkTable(cols) =>
          pk ++= cols.split(",").map(_.trim.toLowerCase); None
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
          spec = spec.replaceAll("(?i)\\bTEXT\\b", "STRING").trim
          Some(s"$name $spec")
      }
    }
    spark.sql(s"CREATE TABLE $table (${cleaned.mkString(", ")}) USING parquet")
    if (pk.nonEmpty || notNull.nonEmpty)
      constraints(table.toLowerCase) = (pk, (notNull ++ pk).distinct)
    ExecuteResult(0L)
  }

  /** Find the first WHERE keyword outside quotes/parens and split there. */
  private def splitAtTopLevelWhere(s: String): (String, Option[String]) = {
    var depth = 0; var inStr = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case c if !inStr && depth == 0 && (c == 'w' || c == 'W') &&
            i + 5 <= s.length && s.substring(i, i + 5).equalsIgnoreCase("where") &&
            (i == 0 || s.charAt(i - 1).isWhitespace) &&
            (i + 5 == s.length || s.charAt(i + 5).isWhitespace) =>
          return (s.substring(0, i).trim, Some(s.substring(i + 5).trim))
        case _ => ()
      }
      i += 1
    }
    (s.trim, None)
  }

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

  // --- INSERT with constraint enforcement (anti-join uniqueness check).
  private def insert(table: String, cols: Option[String], source: String): ExecuteResult = {
    val batchSql = cols match {
      case Some(c) => s"SELECT * FROM (${valuesToSelect(source, c)})"
      case None => valuesToSelect(source, "")
    }
    var batch = spark.sql(batchSql)
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

    // stage once: the batch feeds the constraint checks AND the write
    val staged = batch.localCheckpoint(true)
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
    if (pk.nonEmpty) {
      if (stats.getAs[Long]("__pk_dups") > 0)
        throw new IllegalArgumentException(
          s"PRIMARY KEY constraint failed (duplicate in batch): $table(${pk.mkString(",")})")
      if (staged.join(target, pk.toSeq, "left_semi").limit(1).count() > 0)
        throw new IllegalArgumentException(
          s"PRIMARY KEY constraint failed (key exists): $table(${pk.mkString(",")})")
    }
    staged.write.mode("append").insertInto(table)
    ExecuteResult(stats.getAs[Long]("__n"))
  }

  /** `VALUES (...),(...)` → runnable SELECT; pass SELECT/TABLE through. */
  private def valuesToSelect(source: String, cols: String): String = {
    val s = source.trim
    if (s.toUpperCase.startsWith("VALUES")) s"SELECT * FROM ($s)"
    else s
  }

  // --- UPDATE: read-filter-rewrite (write temp, swap via overwrite).
  private def update(table: String, setClause: String, where: Option[String]): ExecuteResult = {
    val target = spark.table(table)
    val pred = where.map(expr).getOrElse(lit(true))
    val assignments = splitTopLevel(setClause).map { a =>
      val Array(c, e) = a.split("=", 2)
      (c.trim, expr(e.trim))
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
    overwriteTable(table, updated)
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

  /** Materialize then overwrite — the parquet table can't be rewritten
    * from a plan that reads itself, so stage through a checkpoint. */
  private def overwriteTable(table: String, df: DataFrame): Unit = {
    val staged = df.localCheckpoint(eager = true)
    staged.write.mode("overwrite").insertInto(table)
  }
}
