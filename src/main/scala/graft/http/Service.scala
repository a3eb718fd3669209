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
  *
  * Automatic leader failover (r12): the reference's headline
  * fault-tolerance claim comes from hashicorp/raft — kill the leader of
  * a 3-node cluster and a follower is elected, writes continue
  * (`store/store.go:114` raft.NewRaft; `README.md:12`). This engine
  * reproduces the BEHAVIOR with a deterministic election instead of a
  * vote protocol: (1) every committed write push-replicates to the
  * roster's log-following replicas before the client is acked —
  * AppendEntries' shape, so a surviving follower holds every
  * acknowledged statement; (2) followers health-check the leader
  * (`healthCheckMs` background tick, or [[checkLeader]] called
  * explicitly) and cache the roster from its /status; (3) on leader
  * death every follower computes the same winner — the alive candidate
  * with the highest applied index, ties to the lowest node id (Raft's
  * own up-to-date-first rule) — the winner promotes in place (serves
  * writes from its replicated state, log position seated at its applied
  * index) and the rest repoint their 301 target. No quorum is needed
  * because writes never fork: the old leader is dead and the new one is
  * the single writer by the same deterministic rule on every node.
  */
class Service(gateway: SqlGateway, port: Int = 0,
              leaderUrl: Option[String] = None, nodeId: String = "node0",
              followLog: Boolean = false,
              logDir: Option[String] = None,
              snapshotEvery: Int = 0,
              healthCheckMs: Int = 0) {
  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)
  /** The CURRENT leader (None = this node). Seeded from the constructor;
    * rewritten by failover ([[checkLeader]]/promotion). Every redirect,
    * role report and join guard reads this, never the constructor value. */
  private val currentLeader =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](leaderUrl)
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
  // r9 durability parity: with `logDir` set, the log persists as JSONL
  // (the reference persists its Raft log in BoltDB, `store/store.go:
  // 101-111`), SNAPSHOT truncates it with retention 2 (`store/store.go:
  // 22,257-269`), and a leader restart recovers state as snapshot-restore
  // + suffix replay — Raft's exact boot sequence. `stmtLog` holds only
  // the suffix past `baseIndex` (= entries folded into the newest
  // snapshot); absolute index of list slot j is baseIndex + j + 1.
  private val stmtLog = new java.util.concurrent.CopyOnWriteArrayList[String]()
  private val baseIndex = new java.util.concurrent.atomic.AtomicLong(0L)
  private val lastApplied = new java.util.concurrent.atomic.AtomicLong(0L)
  private val syncLock = new Object
  private val logLock = new Object
  private def logFile = logDir.map(d => java.nio.file.Paths.get(d, "stmtlog.jsonl"))
  private def snapRoot = logDir.map(d => java.nio.file.Paths.get(d, "snapshots"))
  server.createContext("/db/execute", handler(handleExecute))
  server.createContext("/db/query", handler(handleQuery))
  server.createContext("/status", handler(handleStatus))
  server.createContext("/join", handler(handleJoin))
  server.createContext("/log", handler(handleLog))
  server.createContext("/replicate", handler(handleReplicate))
  server.createContext("/snapshot", snapshotHandler)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)

  /** Background leader health-checker (follower-side failover driver);
    * one [[checkLeader]] round per tick. Daemon — never blocks exit. */
  private val checker: Option[Thread] =
    if (healthCheckMs <= 0) None
    else Some {
      val t = new Thread(() => {
        var running = true
        while (running) {
          try { Thread.sleep(healthCheckMs); checkLeader() }
          catch {
            case _: InterruptedException => running = false
            case _: Throwable => () // a flaky probe must not kill the loop
          }
        }
      }, s"graft-health-$nodeId")
      t.setDaemon(true); t
    }

  def start(): Int = {
    if (leaderUrl.isEmpty) recoverFromDisk()
    server.start()
    // the bootstrapping node is its own first member (store/store.go:149-156)
    if (leaderUrl.isEmpty)
      members.put(nodeId, s"http://localhost:${server.getAddress.getPort}")
    checker.foreach(_.start())
    server.getAddress.getPort
  }
  def stop(): Unit = {
    checker.foreach(_.interrupt())
    server.stop(0); pool.shutdown()
    snapshotLock.synchronized {
      cachedZip.foreach { case (_, p) => retireZip(p) }
      cachedZip = None
    }
  }
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

  // ------------------------------------------------------------------
  // Leader failover machinery (r12) — see the class scaladoc.

  private def fetchBody(url: String): Option[String] =
    try {
      val conn = java.net.URI.create(url).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(1000); conn.setReadTimeout(2000)
      try Some(new String(conn.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8))
      finally conn.disconnect()
    } catch { case _: Exception => None }

  /** This node's advertised address: the roster entry it joined under,
    * else its bound localhost address (single-box deployments). */
  private def selfAddr: String =
    Option(members.get(nodeId))
      .getOrElse(s"http://localhost:${server.getAddress.getPort}")

  /** One follower health-check round, callable deterministically (the
    * `healthCheckMs` thread calls it per tick). Leader alive → refresh
    * the cached roster from its /status (the roster IS the electorate —
    * a follower can only fail over to nodes it has seen listed). Leader
    * dead → run the election. No-op on the leader itself. */
  def checkLeader(): Unit = currentLeader.get().foreach { base =>
    fetchBody(s"$base/status") match {
      case Some(body) =>
        Json.extractField(body, "nodes").foreach { roster =>
          roster.split(",").filter(_.contains("=")).foreach { e =>
            val Array(id, addr) = e.split("=", 2)
            members.put(id, addr)
          }
        }
      case None =>
        // one failed probe is not death: a GC pause / slow catalog call /
        // dropped packet on a LIVE leader must not fork the cluster.
        // Re-probe after a grace pause; only a second failure elects.
        Thread.sleep(500)
        if (fetchBody(s"$base/status").isEmpty) electAfterLeaderDeath(base)
    }
  }

  /** Deterministic election (Raft's up-to-date-first rule without the
    * vote round — safe because the electorate and the rule are identical
    * on every node): probe the cached roster minus the dead leader; if a
    * candidate already promoted, follow it; otherwise the alive candidate
    * with the highest applied index wins, ties to the LOWEST node id.
    * Winner == self → promote in place; else repoint the 301 target. An
    * empty roster (never health-checked while the leader lived) stays
    * put — the next tick retries. */
  private def electAfterLeaderDeath(dead: String): Unit = syncLock.synchronized {
    if (currentLeader.get().isEmpty) return // already promoted
    import scala.jdk.CollectionConverters._
    val candidates = members.asScala.toSeq.filterNot(_._2 == dead)
    val alive = candidates.flatMap { case (id, addr) =>
      if (id == nodeId) Some((id, addr, lastApplied.get, false))
      else fetchBody(s"$addr/status").map { body =>
        val applied = Json.extractField(body, "applied_index")
          .orElse(Json.extractField(body, "log_index"))
          .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(-1L)
        (id, addr, applied, Json.extractField(body, "role").contains("leader"))
      }
    }
    if (alive.isEmpty) return
    alive.find(_._4) match {
      case Some((_, addr, _, _)) =>
        members.entrySet.removeIf(
          new java.util.function.Predicate[java.util.Map.Entry[String, String]] {
            def test(e: java.util.Map.Entry[String, String]): Boolean =
              e.getValue == dead
          })
        currentLeader.set(Some(addr))
      case None =>
        val (wid, waddr, _, _) =
          alive.sortBy { case (id, _, applied, _) => (-applied, id) }.head
        members.entrySet.removeIf(
          new java.util.function.Predicate[java.util.Map.Entry[String, String]] {
            def test(e: java.util.Map.Entry[String, String]): Boolean =
              e.getValue == dead
          })
        if (wid == nodeId) promote()
        else currentLeader.set(Some(waddr))
    }
  }

  /** Become the leader. A follower maintains the SAME (baseIndex,
    * stmtLog) invariants as a leader — every applied statement is
    * retained past its hydration base (see [[followerApplied]]) — so
    * promotion changes only role state: the log position is already
    * seated at lastApplied, and a LAGGING survivor can still pull the
    * entries it missed from the new leader's retained suffix (without
    * this a promoted node would answer snapshot_required with no
    * snapshot to offer — the laggard could never catch up). */
  private def promote(): Unit = {
    logLock.synchronized { rewriteLogFile() }
    members.put(nodeId, selfAddr)
    currentLeader.set(None)
  }

  /** Record a follower-applied statement in the retained log suffix —
    * keeps `baseIndex + stmtLog.size == lastApplied` so the node can
    * serve /log (and survive promotion) like a leader. */
  private def followerApplied(idx: Long, sql: String): Unit =
    logLock.synchronized {
      if (baseIndex.get + stmtLog.size == idx - 1) stmtLog.add(sql)
      else { // discontinuity (fresh hydration raced in): reseat the base
        stmtLog.clear(); baseIndex.set(idx - 1); stmtLog.add(sql)
      }
      lastApplied.set(idx)
    }

  /** Pending pushes, enqueued UNDER logLock (so queue order = log order)
    * and drained OUTSIDE it — a slow or dead follower's connect timeout
    * must never stall readers, snapshot cuts, or the next writer on
    * logLock (r12 review finding). [[pushLock]] serializes drains so
    * statements still arrive at each follower in log order. */
  private val pushQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
  private val pushLock = new Object

  /** Push committed statements to every roster follower — the
    * AppendEntries twin (`store/store.go:242-250` Apply replicates every
    * Execute). Best-effort with short timeouts: an unreachable follower
    * catches up through the pull path (/log, or snapshot install) on its
    * next read — exactly a lagging Raft follower's recovery.
    * Non-log-following replicas acknowledge and ignore. */
  private def drainPushes(): Unit = pushLock.synchronized {
    val self = s"http://localhost:${server.getAddress.getPort}"
    import scala.jdk.CollectionConverters._
    var next = pushQueue.poll()
    while (next != null) {
      val (idx, sql) = next
      members.asScala.toSeq.foreach { case (id, addr) =>
        if (id != nodeId && addr != self) {
          try {
            val conn = java.net.URI.create(s"$addr/replicate").toURL
              .openConnection().asInstanceOf[java.net.HttpURLConnection]
            conn.setConnectTimeout(1000); conn.setReadTimeout(2000)
            conn.setRequestMethod("POST"); conn.setDoOutput(true)
            conn.getOutputStream.write(obj("i" -> Json.str(idx.toString),
              "sql" -> Json.str(sql),
              "from" -> Json.str(selfAddr)).getBytes(StandardCharsets.UTF_8))
            conn.getResponseCode
            conn.disconnect()
          } catch { case _: Exception => () }
        }
      }
      next = pushQueue.poll()
    }
  }

  /** Receive a pushed statement (leader → follower). Applies only in
    * exact log order: duplicates are acked idempotently, a gap answers
    * 409 and the follower recovers through the pull path instead (the
    * push is an optimization over pull, never a second source of truth). */
  private def handleReplicate(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "POST") return (405, obj("error" -> "\"POST only\""))
    if (!followLog) return (200, obj("applied" -> Json.str("ignored")))
    if (currentLeader.get().isEmpty) // promoted: a zombie ex-leader's push
      return (409, obj("error" -> Json.str("not a follower")))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    // only the CURRENT leader's pushes apply: a follower that repointed
    // during failover must not interleave a zombie ex-leader's statements
    // with the new leader's (the promoted node's 409 above only protects
    // itself — this protects the rest of the fleet)
    Json.extractField(body, "from").foreach { from =>
      if (!currentLeader.get().contains(from))
        return (409, obj("error" -> Json.str(
          s"push from $from but my leader is ${currentLeader.get().getOrElse("-")}")))
    }
    val idx = Json.extractField(body, "i")
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .getOrElse(return (400, obj("error" -> Json.str("missing index"))))
    val sql = Json.extractField(body, "sql")
      .getOrElse(return (400, obj("error" -> Json.str("missing sql"))))
    syncLock.synchronized {
      if (idx <= lastApplied.get) (200, obj("applied" -> Json.str("duplicate")))
      else if (idx == lastApplied.get + 1) {
        gateway.execute(sql)
        followerApplied(idx, sql)
        (200, obj("applied" -> Json.str(idx.toString)))
      } else (409, obj("error" -> Json.str(
        s"log gap: expected ${lastApplied.get + 1}, got $idx")))
    }
  }

  // ------------------------------------------------------------------

  private def handleExecute(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "POST") return (405, obj("error" -> "\"POST only\""))
    // read replica: redirect the write to the leader, reference-style —
    // 301 with Location, body carries the target for non-following clients
    currentLeader.get().foreach { base =>
      val target = s"$base/db/execute"
      ex.getResponseHeaders.add("Location", target)
      return (301, obj("error" -> Json.str("not leader"),
        "leader" -> Json.str(target)))
    }
    try {
      val sql = readSql(ex)
      // execute + append under logLock so a concurrent snapshot CUT can't
      // capture state whose last write is missing from the log; the
      // follower push is ENQUEUED under the lock (queue order = log
      // order) but sent after release — a dead follower's timeout never
      // blocks the lock
      val (res, ms) = timed {
        val r = logLock.synchronized {
          val r0 = gateway.execute(sql)
          appendLog(sql) // committed → logged (an erroring one never is)
          pushQueue.add((logIndex, sql))
          r0
        }
        drainPushes()
        r
      }
      // threshold snapshot OUTSIDE logLock: the cut re-acquires it only for
      // the capture instant, so other writers flow during the export.
      // Never mid-transaction — truncation across a BEGIN would orphan the
      // suffix's COMMIT on replay; the next post-COMMIT write triggers it.
      // Best-effort: the statement above already committed AND logged, so a
      // snapshot problem (a BEGIN racing in between the inTransaction
      // checks, an export failure) must never turn this response into an
      // error — a client retrying on error would double-apply the write.
      if (snapshotEvery > 0 && stmtLog.size >= snapshotEvery &&
          !gateway.inTransaction)
        try takeSnapshot(skipIfOpenTxn = true)
        catch { case _: Exception => () } // next threshold crossing retries
      (200, obj("results" -> executeJson(res), "time" -> Json.num(ms)))
    } catch {
      case e: BadRequest => (400, obj("error" -> Json.str(e.getMessage)))
      case e: Exception => (200, obj("error" -> Json.str(e.getMessage), "time" -> "0"))
    }
  }

  /** The leader's log position (index of the last committed write). A
    * snapshot shipped at this moment pairs with this index — pass it to
    * the replica's [[markSynced]] so replay starts past the snapshot. */
  def logIndex: Long = baseIndex.get + stmtLog.size

  private def appendLog(sql: String): Unit = {
    stmtLog.add(sql)
    val idx = baseIndex.get + stmtLog.size
    logFile.foreach { p =>
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        (s"""{"i": "$idx", "sql": ${Json.str(sql)}}""" + "\n")
          .getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  /** Snapshot dirs under `logDir/snapshots`, as (index, path), ascending. */
  private def listSnapshots: Seq[(Long, java.nio.file.Path)] =
    snapRoot.toSeq.flatMap { root =>
      if (!java.nio.file.Files.isDirectory(root)) Nil
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(root).iterator.asScala.toSeq.flatMap { p =>
          val n = p.getFileName.toString
          if (n.startsWith("snap_")) scala.util.Try(n.drop(5).toLong).toOption
            .map(_ -> p) else None
        }.sortBy(_._1)
      }
    }

  /** Serializes snapshot takers and GET /snapshot streaming against each
    * other. NEVER held while waiting on a write: lock order is
    * snapshotLock → logLock, and writers take logLock alone. */
  private val snapshotLock = new Object

  /** One cached zip of the newest snapshot dir (immutable once published),
    * guarded by [[snapshotLock]]; replaced when a newer snapshot lands.
    * Streaming happens OUTSIDE the lock, so the file is refcounted: a
    * replacement (or stop) retires the old zip, and the last reader's
    * release deletes it — deleting eagerly would truncate a concurrent
    * reader's download mid-stream. */
  private var cachedZip: Option[(Long, java.nio.file.Path)] = None
  private val zipReaders =
    scala.collection.mutable.HashMap[java.nio.file.Path, Int]()
  private val zipRetired =
    scala.collection.mutable.HashSet[java.nio.file.Path]()

  /** Under [[snapshotLock]]: retire `p` — delete now if unreferenced,
    * else defer to the last reader's [[releaseZip]]. */
  private def retireZip(p: java.nio.file.Path): Unit =
    if (zipReaders.getOrElse(p, 0) > 0) zipRetired += p
    else java.nio.file.Files.deleteIfExists(p)

  private def releaseZip(p: java.nio.file.Path): Unit =
    snapshotLock.synchronized {
      val left = zipReaders.getOrElse(p, 1) - 1
      if (left <= 0) {
        zipReaders.remove(p)
        if (zipRetired.remove(p)) java.nio.file.Files.deleteIfExists(p)
      } else zipReaders(p) = left
    }

  /** Take a snapshot: capture a consistent cut (log index + pinned table
    * versions — the versioned storage gives snapshot isolation) under
    * logLock for an instant, release it, export the pinned cut with
    * writers flowing, publish atomically as `snap_<idx>`, retention 2
    * (`store/store.go:22` retainSnapshotCount), then truncate the log
    * through the snapshot index (`store/store.go:257-269` — Raft compacts
    * entries folded into the snapshot). Matches the reference's ASYNC
    * persist (hashicorp FileSnapshotStore, `store/store.go:101` — Raft
    * never blocks appliers on snapshot IO). Returns the snapshot's log
    * index. Requires `logDir`. */
  def takeSnapshot(): Long = takeSnapshot(skipIfOpenTxn = false)

  /** As [[takeSnapshot]]; `skipIfOpenTxn` makes an open transaction at the
    * cut instant a no-op (returns -1) instead of an error — the threshold
    * path uses it so a BEGIN racing in after handleExecute's outer check
    * can't error an already-committed statement's response. */
  def takeSnapshot(skipIfOpenTxn: Boolean): Long = snapshotLock.synchronized {
    val root = snapRoot.getOrElse(throw new IllegalStateException(
      "snapshotting requires a logDir"))
    java.nio.file.Files.createDirectories(root)
    // the cut: log index + table-version pins, captured with writers held
    // out only for this block
    val (idx, cutOpt) = logLock.synchronized {
      // a cut mid-transaction would compact the log across its BEGIN —
      // the restored suffix would replay COMMIT with no transaction open
      if (gateway.inTransaction) {
        if (skipIfOpenTxn) return -1L
        throw new IllegalStateException(
          "cannot snapshot during an open transaction")
      }
      val i = logIndex
      if (java.nio.file.Files.exists(root.resolve(s"snap_$i"))) (i, None)
      else (i, Some(Snapshot.captureCut(gateway)))
    }
    cutOpt.foreach { cut =>
      // export outside every lock writers touch; publish via atomic rename
      // so GET /snapshot and recovery never see a half-written dir
      val tmp = root.resolve(s".tmp_snap_$idx")
      try {
        deleteRecursively(tmp)
        Snapshot.exportCut(cut, tmp.toString)
        java.nio.file.Files.move(tmp, root.resolve(s"snap_$idx"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case e: Throwable => deleteRecursively(tmp); throw e }
      finally gateway.releasePins(cut.pins)
    }
    listSnapshots.dropRight(2).foreach { case (_, p) => deleteRecursively(p) }
    // compact: exactly the entries ≤ idx now live in the snapshot —
    // statements executed during the export keep their log suffix
    logLock.synchronized {
      while (stmtLog.size > 0 && baseIndex.get < idx) {
        stmtLog.remove(0); baseIndex.incrementAndGet()
      }
      rewriteLogFile()
    }
    idx
  }

  /** Rewrite the persisted log to exactly the in-memory suffix. */
  private def rewriteLogFile(): Unit = logFile.foreach { p =>
    java.nio.file.Files.createDirectories(p.getParent)
    val sb = new StringBuilder
    var i = baseIndex.get
    stmtLog.forEach { sql =>
      i += 1
      sb.append(s"""{"i": "$i", "sql": ${Json.str(sql)}}""").append('\n')
    }
    java.nio.file.Files.write(p, sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Leader boot recovery — Raft's exact sequence (`store/store.go:
    * 101-114` snapshot store + BoltDB log feed NewRaft): restore the
    * newest on-disk snapshot, then replay the persisted log suffix past
    * its index. A fresh `logDir` (or none) recovers nothing. */
  private def recoverFromDisk(): Unit = logLock.synchronized {
    if (logDir.isEmpty) return
    val snaps = listSnapshots
    val snapIdx = snaps.lastOption.map { case (idx, p) =>
      Snapshot.importDatabase(gateway, p.toString); idx
    }.getOrElse(0L)
    baseIndex.set(snapIdx)
    stmtLog.clear()
    logFile.filter(java.nio.file.Files.exists(_)).foreach { p =>
      val entries = new String(java.nio.file.Files.readAllBytes(p),
        StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
        .flatMap { line =>
          for {
            i <- Json.extractField(line, "i").flatMap(s =>
              scala.util.Try(s.toLong).toOption)
            sql <- Json.extractField(line, "sql")
          } yield (i, sql)
        }.filter(_._1 > snapIdx).sortBy(_._1)
      entries.foreach { case (_, sql) =>
        gateway.execute(sql)
        stmtLog.add(sql)
      }
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.list(p).iterator.asScala.toSeq
        .foreach(deleteRecursively)
    java.nio.file.Files.deleteIfExists(p)
  }

  /** Seat this (replica) service's applied-log position — called after
    * snapshot hydration with the leader's [[logIndex]] at export time.
    * Also seats the retained-suffix base: everything ≤ idx is folded into
    * the hydrated state, the suffix tracks what this node applies next. */
  def markSynced(idx: Long): Unit = logLock.synchronized {
    stmtLog.clear(); baseIndex.set(idx); lastApplied.set(idx)
  }

  /** `GET /log?since=N` → the committed statements with index > N, as
    * numbered string fields (`"s<idx>": "<sql>"`) plus `last_index`. A
    * `since` that predates the truncation point answers
    * `snapshot_required` instead — the replica must install the newest
    * snapshot first (Raft: a follower whose next index was compacted away
    * gets InstallSnapshot, `store/store.go:271-320` Restore). */
  private def handleLog(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "GET") return (405, obj("error" -> "\"GET only\""))
    val since = Option(ex.getRequestURI.getQuery).flatMap(_.split("&")
      .find(_.startsWith("since=")).map(_.drop(6)))
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
    logLock.synchronized { // consistent (base, suffix) vs a concurrent compaction
      val base = baseIndex.get
      if (since < base) {
        val snapIdx = listSnapshots.lastOption.map(_._1).getOrElse(base)
        return (200, obj("snapshot_required" -> Json.str("true"),
          "snapshot_index" -> Json.str(snapIdx.toString),
          "last_index" -> logIndex.toString))
      }
      val upTo = logIndex
      val entries = (since + 1) to upTo
      (200, obj(entries.map(i =>
        s"s$i" -> Json.str(stmtLog.get((i - base - 1).toInt))) :+
        ("last_index" -> upTo.toString): _*))
    }
  }

  /** `POST /snapshot` (leader) → take one now, answer its index.
    * `GET /snapshot` → the newest snapshot dir as a zip stream with its
    * log index in `X-Snapshot-Index` — the wire twin of Raft's
    * InstallSnapshot payload (`store/store.go:322-371` fsmSnapshot
    * Persist streams a tar of the EXPORT DATABASE dir). */
  private def snapshotHandler: HttpHandler = (ex: HttpExchange) => {
    try ex.getRequestMethod match {
      case "POST" =>
        if (currentLeader.get().isDefined) {
          val out = obj("error" -> Json.str("not leader"))
            .getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(500, out.length)
          ex.getResponseBody.write(out)
        } else {
          val idx = takeSnapshot()
          val out = obj("index" -> Json.str(idx.toString))
            .getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, out.length)
          ex.getResponseBody.write(out)
        }
      case "GET" =>
        // zip to a LOCAL file under snapshotLock (retention deletion in
        // takeSnapshot can't remove the dir mid-zip; atomic-rename publish
        // already guarantees any listed dir is complete), then stream with
        // the lock RELEASED — a slow replica download must not block the
        // next takeSnapshot, which now runs synchronously on a writer's
        // request thread after its statement commits. A snapshot dir is
        // immutable, so the zip is built ONCE per index and cached: N
        // replicas polling the same snapshot pay one zip, not N, and the
        // writer-thread taker queues behind at most one build.
        val zipped: Option[(Long, java.nio.file.Path)] =
          snapshotLock.synchronized {
            listSnapshots.lastOption.map { case (idx, dir) =>
              val path = cachedZip match {
                case Some((ci, p)) if ci == idx &&
                    java.nio.file.Files.exists(p) => p
                case prior =>
                  val tmp = java.nio.file.Files.createTempFile(
                    "graft-snap", ".zip")
                  try {
                    val zos = new java.util.zip.ZipOutputStream(
                      java.nio.file.Files.newOutputStream(tmp))
                    try { zipDir(dir, dir, zos) } finally zos.close()
                  } catch { case e: Throwable => // never leak a partial zip
                    java.nio.file.Files.deleteIfExists(tmp); throw e
                  }
                  prior.foreach { case (_, old) => retireZip(old) }
                  cachedZip = Some((idx, tmp))
                  tmp
              }
              // reader pin taken under the lock — released after streaming
              zipReaders(path) = zipReaders.getOrElse(path, 0) + 1
              (idx, path)
            }
          }
        zipped match {
          case None => ex.sendResponseHeaders(404, -1)
          case Some((idx, tmp)) =>
            try {
              ex.getResponseHeaders.add("Content-Type", "application/zip")
              ex.getResponseHeaders.add("X-Snapshot-Index", idx.toString)
              ex.sendResponseHeaders(200, java.nio.file.Files.size(tmp))
              java.nio.file.Files.copy(tmp, ex.getResponseBody)
            } finally releaseZip(tmp)
        }
      case _ => ex.sendResponseHeaders(405, -1)
    } catch { case e: Throwable =>
      val out = obj("error" -> Json.str(e.getMessage))
        .getBytes(StandardCharsets.UTF_8)
      try { ex.sendResponseHeaders(500, out.length)
        ex.getResponseBody.write(out) } catch { case _: Throwable => () }
    } finally ex.close()
  }

  private def zipDir(root: java.nio.file.Path, p: java.nio.file.Path,
      zos: java.util.zip.ZipOutputStream): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.list(p).iterator.asScala.toSeq.sortBy(_.toString)
        .foreach(zipDir(root, _, zos))
    else {
      zos.putNextEntry(new java.util.zip.ZipEntry(
        root.relativize(p).toString))
      java.nio.file.Files.copy(p, zos)
      zos.closeEntry()
    }
  }

  /** Pull the leader's log suffix past our applied index and replay it
    * locally. Serialized under [[syncLock]] so concurrent reads replay
    * each statement exactly once and in log order. */
  private def syncFromLeader(): Unit =
    if (followLog) currentLeader.get().foreach { base =>
    syncLock.synchronized {
      def pull(): String = {
        val conn = java.net.URI.create(s"$base/log?since=${lastApplied.get}")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        try new String(conn.getInputStream.readAllBytes(),
          StandardCharsets.UTF_8) finally conn.disconnect()
      }
      var body = try pull() catch {
        case e: java.io.IOException =>
          // the leader died between health checks: fail over NOW, then
          // either serve as the new leader (nothing to pull) or pull from
          // the elected one. If NO election is possible (no cached roster
          // — the node never health-checked a live leader), the read must
          // stay LOUD: silently serving stale local state would hide the
          // partition from the client (r12 review finding)
          electAfterLeaderDeath(base)
          currentLeader.get() match {
            case None => return
            case Some(next) if next != base =>
              return syncFromLeader() // repointed: pull from the new leader
            case _ => throw e
          }
      }
      // our suffix was compacted away — install the newest snapshot,
      // seat the applied index at its log position, then pull again
      if (Json.extractField(body, "snapshot_required").contains("true")) {
        installSnapshot(base)
        body = pull()
      }
      val entries = Json.stringFields(body).collect {
        case (k, sql) if k.startsWith("s") && k.drop(1).nonEmpty &&
            k.drop(1).forall(_.isDigit) => k.drop(1).toLong -> sql
      }.toSeq.sortBy(_._1)
      entries.foreach { case (i, sql) =>
        if (i > lastApplied.get) { gateway.execute(sql); followerApplied(i, sql) }
      }
    }
  }

  /** Fetch `GET /snapshot` (zip + `X-Snapshot-Index`), unpack, IMPORT
    * DATABASE, and seat [[lastApplied]] at the snapshot's log index —
    * the reference's Restore (`store/store.go:271-320`: untar the
    * shipped archive, `IMPORT DATABASE` it, state replaced wholesale). */
  private def installSnapshot(base: String): Unit = {
    val conn = java.net.URI.create(s"$base/snapshot")
      .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
    var tmp: java.nio.file.Path = null
    try {
      val idx = Option(conn.getHeaderField("X-Snapshot-Index"))
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .getOrElse(throw new IllegalStateException(
          "leader offered no snapshot to install"))
      tmp = java.nio.file.Files.createTempDirectory("graft-install")
      val zis = new java.util.zip.ZipInputStream(conn.getInputStream)
      var e = zis.getNextEntry
      while (e != null) {
        val target = tmp.resolve(e.getName).normalize()
        if (!target.startsWith(tmp)) // zip-slip guard
          throw new IllegalArgumentException(s"bad zip entry: ${e.getName}")
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.copy(zis, target)
        e = zis.getNextEntry
      }
      gateway.execute(s"IMPORT DATABASE '$tmp'")
      logLock.synchronized {
        stmtLog.clear(); baseIndex.set(idx); lastApplied.set(idx)
      }
    } finally {
      conn.disconnect()
      if (tmp != null) deleteRecursively(tmp) // unpacked zip, now imported
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
    // follower names its leader — http/service.go:144-193); read from the
    // LIVE leader ref so a promoted follower reports its new role
    val lead = currentLeader.get()
    val role = Seq("role" -> (if (lead.isEmpty) "leader" else "follower")) ++
      lead.map("leader" -> _) ++
      (if (lead.isEmpty) Seq("log_index" -> logIndex.toString)
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
    if (currentLeader.get().isDefined)
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
    case t: java.time.LocalTime => // DuckDB renders seconds always
      str(f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d" +
        (if (t.getNano == 0) ""
         else ("." + f"${t.getNano}%09d").reverse.dropWhile(_ == '0').reverse))
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
