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
  *   - `POST /join`         — cluster join; Spark owns cluster membership,
  *     so this reports that fact instead of mutating a Raft config
  *     (`http/service.go:98-141`, SURVEY.md §3.3)
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
              leaderUrl: Option[String] = None) {
  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/db/execute", handler(handleExecute))
  server.createContext("/db/query", handler(handleQuery))
  server.createContext("/status", handler(handleStatus))
  server.createContext("/join", handler(handleJoin))
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)

  def start(): Int = { server.start(); server.getAddress.getPort }
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
      val (res, ms) = timed(gateway.execute(readSql(ex)))
      (200, obj("results" -> executeJson(res), "time" -> Json.num(ms)))
    } catch {
      case e: BadRequest => (400, obj("error" -> Json.str(e.getMessage)))
      case e: Exception => (200, obj("error" -> Json.str(e.getMessage), "time" -> "0"))
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
      leaderUrl.map("leader" -> _)
    val st = Snapshot.status(gateway) ++ role
    (200, obj(st.toSeq.sortBy(_._1).map { case (k, v) => k -> Json.str(v) }: _*))
  }

  private def handleJoin(ex: HttpExchange): (Int, String) =
    // Spark is the distribution layer; there is no Raft config to mutate
    // (SURVEY.md §3.3). Report topology instead of redirecting.
    (200, obj(
      "message" -> Json.str("cluster membership is managed by Spark"),
      "master" -> Json.str(gateway.spark.sparkContext.master)))

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
