package graft

import graft.engine.SqlGateway
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** The reference serializes writes through single-threaded Raft Apply
  * (`store/store.go:242-256`) while reads stay concurrent
  * (`store/store.go:196-199`). The gateway preserves that: concurrent
  * writers interleave safely (constraint checks stay consistent), readers
  * run during writes. */
class ConcurrencySpec extends SparkTestBase {
  lazy val gw = new SqlGateway(spark)

  test("16 concurrent writers all commit; PK checks stay consistent") {
    gw.execute("DROP TABLE IF EXISTS conc")
    gw.execute("CREATE TABLE conc (id integer not null primary key, who text)")
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(16)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (1 to 16).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try gw.execute(s"INSERT INTO conc VALUES ($i, 'w$i')")
          catch { case t: Throwable => failures.add(t) }
          finally done.countDown()
        }
      })
    }
    start.countDown()
    assert(done.await(300, TimeUnit.SECONDS))
    pool.shutdown()
    assert(failures.isEmpty, s"writer failures: ${failures.toArray.mkString}")
    assert(gw.query("SELECT count(*) AS n FROM conc").values.head.head == 16L)
    // every id exactly once (no lost/duplicated writes under the lock)
    val dups = gw.query("SELECT id FROM conc GROUP BY id HAVING count(*) > 1")
    assert(dups.values.isEmpty)
  }

  test("conflicting concurrent inserts: exactly one wins the PK race") {
    gw.execute("DROP TABLE IF EXISTS conc2")
    gw.execute("CREATE TABLE conc2 (id integer not null primary key, who text)")
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(4)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    (1 to 4).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try gw.execute(s"INSERT INTO conc2 VALUES (7, 'racer$i')")
          catch { case _: IllegalArgumentException => errs.incrementAndGet() }
          finally done.countDown()
        }
      })
    }
    start.countDown()
    assert(done.await(300, TimeUnit.SECONDS))
    pool.shutdown()
    assert(errs.get() == 3, s"expected 3 PK rejections, got ${errs.get()}")
    assert(gw.query("SELECT count(*) AS n FROM conc2").values.head.head == 1L)
  }

  test("reads keep an intact snapshot during UPDATE rewrites (versioned swap)") {
    gw.execute("DROP TABLE IF EXISTS conc4")
    gw.execute("CREATE TABLE conc4 (id integer, v integer)")
    gw.execute("INSERT INTO conc4 VALUES " + (1 to 200).map(i => s"($i, 0)").mkString(", "))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          // pre-swap readers see the old version, post-swap the new one —
          // never a partially-deleted table (the old in-place overwrite
          // could surface FileNotFound or a row count below 200 here)
          try {
            val n = gw.query("SELECT count(*) AS n FROM conc4").values.head.head
              .asInstanceOf[Long]
            if (n != 200L) throw new AssertionError(s"saw partial table: $n rows")
          } catch { case t: Throwable => failures.add(t); stop.set(true) }
        }
      })
    }
    readers.foreach(_.start())
    (1 to 5).foreach(i => gw.execute(s"UPDATE conc4 SET v = $i"))
    stop.set(true)
    readers.foreach(_.join())
    assert(failures.isEmpty, s"reader failures: ${failures.toArray.mkString}")
    assert(gw.query("SELECT min(v) AS m, max(v) AS x FROM conc4").values.head == Seq(5, 5))
  }

  test("reads run while a writer holds the lock") {
    gw.execute("DROP TABLE IF EXISTS conc3")
    gw.execute("CREATE TABLE conc3 (id integer, v integer)")
    gw.execute("INSERT INTO conc3 VALUES (1, 1)")
    val writer = new Thread(() =>
      (2 to 5).foreach(i => gw.execute(s"INSERT INTO conc3 VALUES ($i, $i)")))
    writer.start()
    // reads must return consistent snapshots mid-write, never error
    (1 to 10).foreach { _ =>
      val n = gw.query("SELECT count(*) AS n FROM conc3").values.head.head
        .asInstanceOf[Long]
      assert(n >= 1L && n <= 5L)
    }
    writer.join()
    assert(gw.query("SELECT count(*) AS n FROM conc3").values.head.head == 5L)
  }

  test("concurrent view queries during CREATE/DROP VIEW never corrupt the " +
       "registry (copy-on-write reads, r10)") {
    gw.execute("DROP TABLE IF EXISTS conc4")
    gw.execute("CREATE TABLE conc4 (id integer)")
    gw.execute("INSERT INTO conc4 VALUES (1), (2), (3)")
    gw.execute("CREATE VIEW conc4_keep AS SELECT id * 2 AS d FROM conc4")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // churner: registers and drops OTHER views (plus mutations bumping the
    // generation) while readers query the stable one — the pre-fix
    // LinkedHashMap could throw or corrupt under this interleaving
    val churner = new Thread(() => try {
      (1 to 20).foreach { i =>
        gw.execute(s"CREATE VIEW conc4_tmp$i AS SELECT id + $i AS v FROM conc4")
        gw.execute(s"INSERT INTO conc4 VALUES (${100 + i})")
        gw.execute(s"DROP VIEW conc4_tmp$i")
      }
    } catch { case t: Throwable => errors.add(t) })
    val pool = Executors.newFixedThreadPool(6)
    churner.start()
    (1 to 6).foreach { _ =>
      pool.submit(new Runnable { def run(): Unit = {
        while (!stop.get()) {
          try {
            val s = gw.query("SELECT sum(d) AS s FROM conc4_keep")
              .values.head.head.asInstanceOf[Long]
            assert(s >= 12L) // 2+4+6, growing as the churner inserts
          } catch { case t: Throwable => errors.add(t); stop.set(true) }
        }
      }})
    }
    churner.join()
    stop.set(true)
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(errors.isEmpty, String.valueOf(errors.peek()))
    assert(gw.query("SELECT count(*) AS n FROM conc4").values.head.head == 23L)
    gw.execute("DROP VIEW conc4_keep"); gw.execute("DROP TABLE conc4")
  }
}
