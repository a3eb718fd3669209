package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.engine.{ExecuteResult, QueryResult, Results, Snapshot, SqlGateway}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** JSON-over-HTTP façade mirroring the reference service's endpoints
  * (reference `http/service.go:82-94`):
  *
  *   - `POST /db/execute`  — write statement  (`http/service.go:196-227`)
  *   - `GET|POST /db/query` — read statement  (`http/service.go:249-288`)
  *   - `GET /status`        — engine status   (`http/service.go:144-193`)
  *   - `POST /join`         — mutating cluster join: validates and
  *     registers `{"id", "addr"}` in the leader's membership roster with
  *     the reference's exact validation/idempotence/conflict semantics
  *     (`http/service.go:98-141`, `store/store.go:201-234`); roster
  *     surfaces in `/status` as `nodes`
  *
  * Request body `{"sql": "..."}` (`http/service.go:16-18`); responses carry
  * `results` or `error` plus `time` in fractional milliseconds, matching
  * `Response{Result, Error, Took}` (`http/service.go:20-24`, `:241`).
  * `?pretty` pretty-prints (`http/service.go:301-307`).
  *
  * Leader-redirect parity (`http/service.go:231-234`): the reference
  * accepts writes only on the Raft leader; a follower answers
  * `301 Moved Permanently` with the leader's URL in `Location`, and the
  * reference CLI re-POSTs there (`cmd/cli/client.go:52-63`). Our
  * distribution model keeps ONE writing gateway (Spark executors are the
  * scale-out; SURVEY §3.3), but the same read-scaling deployment exists
  * here as read-replica service instances: construct with
  * `leaderUrl = Some(...)` and the instance serves `/db/query` locally
  * while answering writes with the identical 301 + `Location` contract,
  * so a reference client pointed at any replica keeps working unchanged.
  */
class Service(gateway: SqlGateway, port: Int = 0,
              leaderUrl: Option[String] = None, nodeId: String = "node0",
              followLog: Boolean = false) {
  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)
  // cluster membership (id → addr), owned by the leader — the engine's
  // twin of the reference's Raft voter configuration, which starts with
  // the bootstrapping node as sole member (`store/store.go:149-156`) and
  // grows via /join (`store/store.go:201-234`). Replicas here are
  // snapshot-synced read nodes (ReplicaSpec), so membership is a served
  // roster, not a quorum — but the join/validation/idempotence contract
  // is kept identical so a reference operator's tooling works unchanged.
  private val members = new java.util.concurrent.ConcurrentHashMap[String, String]()
  // --- continuous replica sync (r8): the leader's committed-write log —
  // the engine's twin of the reference's Raft log (`store/store.go:242-250`
  // Apply ships every Execute to every node). Each successful /db/execute
  // appends its statement at a 1-based index; a log-following replica
  // (`followLog = true`) pulls the suffix past its applied index over
  // `GET /log?since=N` and replays it on its local gateway BEFORE serving
  // a read — snapshot hydration + log replay, exactly Raft's recovery
  // shape (`store/store.go:257-320` restore, then entries). Pull-on-read
  // gives deterministic read-your-leader-writes freshness with no
  // background thread; `markSynced` seats the replica's index at the
  // snapshot's log position after hydration.
  private val stmtLog = new java.util.concurrent.CopyOnWriteArrayList[String]()
  private val lastApplied = new java.util.concurrent.atomic.AtomicLong(0L)
  private val syncLock = new Object
  server.createContext("/db/execute", handler(handleExecute))
  server.createContext("/db/query", handler(handleQuery))
  server.createContext("/status", handler(handleStatus))
  server.createContext("/join", handler(handleJoin))
  server.createContext("/log", handler(handleLog))
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)

  def start(): Int = {
    server.start()
    // the bootstrapping node is its own first member (store/store.go:149-156)
    if (leaderUrl.isEmpty)
      members.put(nodeId, s"http://localhost:${server.getAddress.getPort}")
    server.getAddress.getPort
  }
  def stop(): Unit = { server.stop(0); pool.shutdown() }
  def boundPort: Int = server.getAddress.getPort

  private def handler(f: HttpExchange => (Int, String)): HttpHandler =
    (ex: HttpExchange) => {
      val (code, body) = try f(ex)
      catch { case e: Throwable => (500, obj("error" -> Json.str(e.getMessage))) }
      val pretty = Option(ex.getRequestURI.getQuery).exists(
        _.split("&").exists(p => p == "pretty" || p.startsWith("pretty=")))
      val out = (if (pretty) Json.prettyPrint(body) else body)
        .getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    }

  /** Missing/empty SQL is a client error → HTTP 400, matching the
    * reference's error contract (engine errors stay 200-with-error-field). */
  private class BadRequest(msg: String) extends RuntimeException(msg)

  private def bodySql(ex: HttpExchange): Option[String] = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    Json.extractField(body, "sql")
  }

  private def requireSql(opt: Option[String]): String = {
    val sql = opt.getOrElse(throw new BadRequest("missing sql field"))
    if (sql.trim.isEmpty) throw new BadRequest("empty sql") else sql
  }

  private def readSql(ex: HttpExchange): String = requireSql(bodySql(ex))

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e6)
  }

  private def handleExecute(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "POST") return (405, obj("error" -> "\"POST only\""))
    // read replica: redirect the write to the leader, reference-style —
    // 301 with Location, body carries the target for non-following clients
    leaderUrl.foreach { base =>
      val target = s"$base/db/execute"
      ex.getResponseHeaders.add("Location", target)
      return (301, obj("error" -> Json.str("not leader"),
        "leader" -> Json.str(target)))
    }
    try {
      val sql = readSql(ex)
      val (res, ms) = timed(gateway.execute(sql))
      stmtLog.add(sql) // committed → logged (an erroring statement never is)
      (200, obj("results" -> executeJson(res), "time" -> Json.num(ms)))
    } catch {
      case e: BadRequest => (400, obj("error" -> Json.str(e.getMessage)))
      case e: Exception => (200, obj("error" -> Json.str(e.getMessage), "time" -> "0"))
    }
  }

  /** The leader's log position (index of the last committed write). A
    * snapshot shipped at this moment pairs with this index — pass it to
    * the replica's [[markSynced]] so replay starts past the snapshot. */
  def logIndex: Long = stmtLog.size.toLong

  /** Seat this (replica) service's applied-log position — called after
    * snapshot hydration with the leader's [[logIndex]] at export time. */
  def markSynced(idx: Long): Unit = lastApplied.set(idx)

  /** `GET /log?since=N` → the committed statements with index > N, as
    * numbered string fields (`"s<idx>": "<sql>"`) plus `last_index`. */
  private def handleLog(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "GET") return (405, obj("error" -> "\"GET only\""))
    val since = Option(ex.getRequestURI.getQuery).flatMap(_.split("&")
      .find(_.startsWith("since=")).map(_.drop(6)))
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
    val upTo = stmtLog.size.toLong // snapshot the bound; the list only grows
    val entries = (since + 1) to upTo
    (200, obj(entries.map(i =>
      s"s$i" -> Json.str(stmtLog.get((i - 1).toInt))) :+
      ("last_index" -> upTo.toString): _*))
  }

  /** Pull the leader's log suffix past our applied index and replay it
    * locally. Serialized under [[syncLock]] so concurrent reads replay
    * each statement exactly once and in log order. */
  private def syncFromLeader(): Unit = if (followLog) leaderUrl.foreach { base =>
    syncLock.synchronized {
      val conn = java.net.URI.create(s"$base/log?since=${lastApplied.get}")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body = try new String(conn.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8) finally conn.disconnect()
      val entries = Json.stringFields(body).collect {
        case (k, sql) if k.startsWith("s") && k.drop(1).nonEmpty &&
            k.drop(1).forall(_.isDigit) => k.drop(1).toLong -> sql
      }.toSeq.sortBy(_._1)
      entries.foreach { case (i, sql) =>
        if (i > lastApplied.get) { gateway.execute(sql); lastApplied.set(i) }
      }
    }
  }

  private def handleQuery(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "POST" && ex.getRequestMethod != "GET")
      return (405, obj("error" -> "\"GET or POST only\""))
    try {
      // the reference handleQuery reads the {"sql":...} body on BOTH GET
      // and POST (http/service.go) — on GET, ?q= wins, body is fallback
      val sql = if (ex.getRequestMethod == "GET") {
        val qParam = Option(ex.getRequestURI.getQuery).flatMap(q => q.split("&")
          .find(_.startsWith("q=")).map(p =>
            java.net.URLDecoder.decode(p.drop(2), "UTF-8")))
        requireSql(qParam.orElse(bodySql(ex)))
      } else readSql(ex)
      syncFromLeader() // log-following replica: catch up before serving
      val (res, ms) = timed(gateway.query(sql))
      (200, obj("results" -> queryJson(res), "time" -> Json.num(ms)))
    } catch {
      case e: BadRequest => (400, obj("error" -> Json.str(e.getMessage)))
      case e: Exception => (200, obj("error" -> Json.str(e.getMessage), "time" -> "0"))
    }
  }

  private def handleStatus(ex: HttpExchange): (Int, String) = {
    // role mirrors the reference's raft state field (leader serves writes,
    // follower names its leader — http/service.go:144-193)
    val role = Seq("role" -> (if (leaderUrl.isEmpty) "leader" else "follower")) ++
      leaderUrl.map("leader" -> _) ++
      (if (leaderUrl.isEmpty) Seq("log_index" -> logIndex.toString)
       else Seq("applied_index" -> lastApplied.get.toString))
    // membership roster — the reference surfaces its Raft configuration
    // through store.Stats() in /status; same observability here
    import scala.jdk.CollectionConverters._
    val nodes = Seq("nodes" ->
      members.asScala.toSeq.sortBy(_._1).map { case (i, a) => s"$i=$a" }.mkString(","))
    val st = Snapshot.status(gateway) ++ role ++ nodes
    (200, obj(st.toSeq.sortBy(_._1).map { case (k, v) => k -> Json.str(v) }: _*))
  }

  /** Mutating cluster join, matching the reference contract end to end:
    * body is `{"id": ..., "addr": ...}` with EXACTLY two parameters
    * (`http/service.go:109-132` — missing/extra fields → 400); a member
    * re-joining with the same id+addr is an idempotent no-op, while a
    * conflicting id OR addr evicts the stale entry before the add
    * (`store/store.go:210-226` remove-then-AddVoter). Only the leader
    * mutates membership — on a follower the reference's AddVoter fails
    * and store.Join surfaces the error as HTTP 500 (it does NOT redirect
    * joins the way it redirects writes), so a follower answers 500 here. */
  private def handleJoin(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "POST") return (405, obj("error" -> "\"POST only\""))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val fields = Json.stringFields(body)
    if (fields.size != 2)
      return (400, obj("error" ->
        Json.str(s"invalid join request: expected 2 parameters, got ${fields.size}")))
    val addr = fields.getOrElse("addr",
      return (400, obj("error" -> Json.str("missing 'addr' in join request"))))
    val id = fields.getOrElse("id",
      return (400, obj("error" -> Json.str("missing 'id' in join request"))))
    if (leaderUrl.isDefined)
      return (500, obj("error" ->
        Json.str("node is not the leader; send join requests to the leader")))
    if (addr != members.get(id)) { // same id+addr → nothing to do (idempotent)
      members.entrySet.removeIf(
        new java.util.function.Predicate[java.util.Map.Entry[String, String]] {
          def test(e: java.util.Map.Entry[String, String]): Boolean =
            e.getKey == id || e.getValue == addr
        })
      members.put(id, addr)
    }
    (200, obj("id" -> Json.str(id), "addr" -> Json.str(addr)))
  }

  private def executeJson(r: ExecuteResult): String =
    obj("rows_affected" -> r.rowsAffected.toString)

  private def queryJson(r: QueryResult): String = {
    val base = Seq(
      "columns" -> Json.arr(r.columns.map(Json.str)),
      "types" -> Json.arr(r.types.map(Json.str)),
      "values" -> Json.arr(r.values.map(row => Json.arr(row.map(Json.value)))))
    // reference shape untouched unless the row cap actually hit
    obj((if (r.truncated) base :+ ("truncated" -> "true") else base): _*)
  }

  private def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${Json.str(k)}: $v" }.mkString("{", ", ", "}")
}

/** Minimal JSON encode/extract — the service speaks a fixed shape, so a
  * hand-rolled encoder keeps the build dependency-free (the container
  * resolves nothing beyond Spark + scalatest). */
object Json {
  def str(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def num(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  def arr(items: Seq[String]): String = items.mkString("[", ", ", "]")

  def value(v: Any): String = v match {
    case null => "null"
    case s: String => str(s)
    case b: Boolean => b.toString
    case b: Array[Byte] => str(b.map("%02x".format(_)).mkString)
    case d: java.lang.Double if d.isNaN || d.isInfinite => str(d.toString)
    case f: java.lang.Float if f.isNaN || f.isInfinite => str(f.toString)
    case n: java.lang.Number => n.toString
    case d: java.sql.Date => str(d.toString)
    case t: java.sql.Timestamp => str(t.toString)
    case seq: scala.collection.Seq[_] => arr(seq.toSeq.map(value))
    case row: org.apache.spark.sql.Row => arr(row.toSeq.map(value))
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => s"${str(String.valueOf(k))}: ${value(mv)}" }
        .mkString("{", ", ", "}")
    case other => str(String.valueOf(other))
  }

  /** All top-level string fields of a flat JSON object — the join body's
    * shape (the reference unmarshals it into a `map[string]string`,
    * `http/service.go:108-115`, so non-string values are a client error
    * there too; here they simply don't count toward the field total). */
  def stringFields(json: String): Map[String, String] = {
    val re = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
    re.findAllMatchIn(json)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
  }

  /** Extract a string field from a one-level JSON object (the request
    * shape is fixed: `{"sql": "..."}`, `http/service.go:16-18`). */
  def extractField(json: String, field: String): Option[String] = {
    val re = ("\"" + field + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    re.findFirstMatchIn(json).map(m => unescape(m.group(1)))
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' if i + 5 < s.length =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  def prettyPrint(json: String): String = {
    val sb = new StringBuilder
    var indent = 0
    var inStr = false
    var escaped = false
    json.foreach { c =>
      if (inStr) {
        sb += c
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true; sb += c
        case '{' | '[' => indent += 1; sb += c; sb += '\n'; sb ++= "  " * indent
        case '}' | ']' => indent -= 1; sb += '\n'; sb ++= "  " * indent; sb += c
        case ',' => sb += c; sb += '\n'; sb ++= "  " * indent
        case ' ' => ()
        case other => sb += other
      }
    }
    sb.toString
  }
}
