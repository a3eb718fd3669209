package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Global plan lint over EVERY registered query: the two patterns that
  * kill a plan at 100 TB must not appear anywhere, asserted on the real
  * physical plans rather than assumed per-query.
  *
  *  - `CartesianProductExec`: an unkeyed corpus×corpus pair join. Bounded
  *    broadcast cross joins compile to BroadcastNestedLoopJoin and stay
  *    legal; a CartesianProduct means both sides were big.
  *  - A `Window` fed by an `Exchange SinglePartition`: global row
  *    numbering through one task (the q33 anti-pattern). Whitelisted only
  *    where the window provably runs over metadata-sized input (x33: one
  *    row per SOURCE after aggregation).
  */
class PlanLintSpec extends SparkTestBase {

  private val singlePartitionWindowWhitelist = Set(
    // |sources| rows — per-source aggregate metadata. ALSO runtime-guarded
    // in the query itself (assert_true rrank ≤ bound), so this whitelist
    // can't silently cover a corpus-sized regression (r5 verdict item 6)
    "x33_mixture_allocation"
  )

  private def windowOverSinglePartition(plan: SparkPlan): Boolean =
    plan.collect { case w: WindowExec => w }.exists { w =>
      w.collect { case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e }
        .nonEmpty
    }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name plans no cartesian product") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"$name plans a CartesianProduct")
    }
  }

  SparkEntry.queries.keys.filterNot(singlePartitionWindowWhitelist).foreach { name =>
    test(s"$name plans no window over a single-partition exchange") {
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      assert(!windowOverSinglePartition(plan),
        s"$name runs a Window over Exchange SinglePartition")
    }
  }
}
