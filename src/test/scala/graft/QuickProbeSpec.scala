package graft

import graft.engine.SqlGateway

/** Scratch harness for iterating on gateway statements (not part of the
  * measured corpus; keep tiny). */
class QuickProbeSpec extends SparkTestBase {
  lazy val gw = new SqlGateway(spark)

  test("probe") {
    val stmts = sys.env.get("GRAFT_PROBE_SQL").toSeq.flatMap(_.split(";;;"))
    stmts.foreach { s0 =>
      val s = s0.trim
      if (s.nonEmpty) {
        try {
          val lead = s.split("""[\s(]""", 2)(0).toLowerCase
          if (Set("create", "insert", "drop", "update", "delete", "alter", "prepare", "deallocate", "set", "reset", "checkpoint", "vacuum", "copy", "analyze", "comment", "use", "begin", "commit", "rollback", "truncate", "import", "export").contains(lead)) {
            gw.execute(s); info(s"OK   $s => (executed)")
          } else {
            val r = gw.queryDf(s).collect().map(_.toSeq).toSeq
            info(s"OK   $s => $r")
          }
        } catch {
          case e: Throwable =>
            info(s"ERR  $s => ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(2).mkString(" | ")}")
        }
      }
    }
  }
}
