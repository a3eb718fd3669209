package graft.ops

import org.apache.spark.sql.SparkSession

/** Per-query physical-plan profile: which registered queries run with
  * adaptive execution (AQE) and which run their statically-planned shape.
  *
  * Why this exists (r5 verdict item 1, measured by tools/FloorProbe at
  * sf0.1): across the 106-query suite the total *task* time is ~63 s of
  * CPU — under 2 s of wall on 32 cores — while measured wall is ~26 s.
  * The gap is per-action scheduling floor, and AQE is the largest single
  * contributor: each materialized shuffle stage becomes its own Spark job
  * (260 jobs AQE-on vs 152 off for the same 94 queries), each carrying
  * 30–70 ms of driver re-planning + scheduling. For queries whose physical
  * shape AQE cannot improve — every growing-side join already broadcast-
  * hinted or pre-partitioned by [[graft.Tables.pin]], aggregation
  * partitioning fixed by `spark.sql.shuffle.partitions`, no skew risk at
  * any scale because the keyed layout is pinned — that cost buys nothing.
  * The within-session A/B (min over passes, same JIT/cache/box state)
  * showed AQE-off winning 40–400 ms on each query below, ~3.6 s total,
  * while LOSING up to 0.6 s on runtime-shaped queries (q18's two-level
  * histogram, x20/x34's CC superstep width, q16, x26, x31) — so this is a
  * per-query decision, not a global switch.
  *
  * 100 TB posture: AQE stays the DEFAULT (skew joins, partition coalescing
  * and runtime join re-planning matter when stage statistics are genuinely
  * unknown). A query earns a `static` pin only when its plan is fully
  * determined at analysis time: bounded dims under explicit `broadcast()`
  * hints, shuffles keyed by the pinned table layout, no data-dependent
  * strategy left for AQE to choose. Those properties hold at any SF — the
  * pin is the same statement DuckDB's static planner makes implicitly for
  * every query it runs. `SPARK_GRAFT_STATIC_PLANS=false` restores AQE
  * everywhere for A/Bs.
  */
object PlanProfile {
  /** Short ids (prefix before first '_') of queries measured faster — and
    * justified safe — under their static plan. Everything else keeps AQE.
    *
    * r10 re-probe (floorprobe_r10_{a,b}, the first probe sessions run
    * WITH the suite-sized codegen cache — earlier probes partly measured
    * Janino recompiles, not plan shape): 22 pins KEPT (both sessions
    * AQE-off faster), 9 UNPINNED on sign flips (q04 −0.70/+0.06,
    * q05 −1.69/+0.09, q07, q11, q13 −0.09/+0.61, q14 −0.22/+2.53, q36,
    * q50, x32 — session A ran on a decaying-load box, so its uniform
    * negatives don't count without B's agreement), 7 newly PINNED on
    * double-negative deltas ≥0.04: q22/q42/q57 map-only scans
    * (−0.050/−0.051, −0.055/−0.056, −0.110/−0.040), q44 broadcast right
    * join (−0.216/−0.055), x19 IVF cell-pair equi-joins (−1.06/−0.089),
    * x38 asof (−0.104/−0.045), x44 map-only CDC (−0.183/−0.120).
    *
    * r15 re-probe (floorprobe_r15_{a,b}, optimization round): 25 pins
    * KEPT, 5 UNPINNED on sign flips (q22 −0.015/+0.003, x10
    * +0.002/−0.007, x18 +0.006/−0.019, x44 −0.079/+0.001, x45
    * −0.002/+0.009 — all inside floor noise, the sign-flip rule stands),
    * 1 newly PINNED: q55 (−0.055/−0.064 at sf0.1, and the pin also wins
    * at 10× — 0.151 vs 0.217 s: distinct/join/agg all keyed user_id on
    * the pinned events layout, no data-dependent strategy left for AQE).
    * q05 measured double-negative at sf0.1 too (−0.181/−0.089) but the
    * 10× A/B REJECTED the pin (pinned 1.94 vs AQE 0.97 s — supA/cA join
    * keying is genuinely an AQE/stats decision as the query's own
    * comment documents, so the plan is NOT analysis-time-static and the
    * sf0.1 win is a local-floor artifact, not a scale-safe pin). */
  val staticPlan: Set[String] = Set(
    "q03", "q15", "q19", "q26", "q27", "q34", "q35", "q39", "q41",
    "q42", "q44", "q51", "q55", "q57", "q59",
    "x02", "x03", "x04", "x07", "x08", "x17", "x19", "x27",
    "x30", "x34", "x38"
  )

  /** The pre-r9 pin set, kept for A/B reference only. */
  private val staticPlanR8: Set[String] = Set(
    // single fixed-key hash-agg over the pinned layout; AQE's only move
    // (post-shuffle coalescing) is already static via shuffle.partitions.
    // r7 probe adds the rest of the fixed-key agg family (q11 rollup,
    // q12 cube, q13 having, q25 histogram quantiles, q27 fixed-value
    // pivot, q38 grouping sets): Expand + hash-agg with keys known at
    // analysis time, both sessions negative
    // r8 probe UNpins q25 (+0.073/+0.072 — AQE-on faster in BOTH
    // sessions; the histogram-quantile shuffle benefits from runtime
    // coalescing)
    "q01", "q06", "q14", "q26", "q28", "q39", "q48",
    "q11", "q12", "q13", "q27", "q38",
    // join trees with every strategy pinned: bounded dims broadcast-hinted,
    // growing sides pre-partitioned (q05 star, q03 top-k fusion,
    // q54/q55/q56 funnel/retention/sessionize on the events layout).
    // r7 probe adds q04/q08 (orders ⋈ lineitem-agg, both sides on the
    // SAME pinned orderkey partitioning — zero strategy left to choose),
    // q09 (bounded-aggregate cross demo), q10 (one-shuffle set-op bag
    // algebra over staged inputs), q15 (1-row scalar-subquery broadcast).
    // q44 was pinned through r6 but its r7 probes disagreed (−0.20 vs
    // +0.05) — mixed evidence restores the AQE default.
    "q03", "q05", "q22", "q54", "q55", "q56",
    "q04", "q08", "q09", "q10", "q15",
    // window/dialect queries over one fixed partitioning (q45 QUALIFY,
    // q46 DISTINCT ON, q47 star modifiers, q58 frame EXCLUDE, q20 dates,
    // q23 asof rewrite, q50's unrolled month spine, q59 read_* scan).
    // r7 adds q16/q17 (ranking/analytic windows on the pinned user_id
    // layout), q58b bounded EXCLUDE, and the map-only scans q19/q21 —
    // all double-confirmed negative
    "q20", "q23", "q45", "q46", "q47", "q50", "q58", "q59",
    "q16", "q17", "q19", "q21", "q58b",
    // extension family: shingle/fingerprint pipelines keyed once (x02/
    // x04 dedup, x10 brute top-k, x11 IVF probe over the persisted index,
    // x18 binned range join, x19 cell-pair pruning, x27 postings).
    // r7 UNpins on mixed probe evidence — the protocol's sign-flip rule:
    // x03 (−0.28/+0.05), x30 (+0.98/−0.01), x32 (+0.25/−0.35); their
    // band-bucket / LM / decontamination join widths are genuinely
    // runtime-shaped, so AQE keeps them (same reasoning as x34 in r6).
    "x02", "x04", "x10", "x11", "x18", "x19", "x27",
    // consistent wins across BOTH FloorProbe sessions (same sign both
    // times): fully-static scans and single-agg shapes —
    // q35 VALUES inline, q41/q42/q43 map-only string/regex scans, q07
    // broadcast semi/anti, q36 keyed time-window agg, q49 broadcast
    // lateral top-k, q57 type corners, x07 map-only lang-id, x17 fixed
    // salting demo, x44 map-only CDC chunking, x45 keyed gap-fill
    // windows on the pinned layout. x15 (one sketch aggregation) was
    // pinned r6 but its r7 probes split (+0.03/−0.02, pure floor noise
    // on a 0.1 s query) — the sign-flip rule unpins it.
    "q07", "q35", "q36", "q41", "q42", "q43", "q49", "q57",
    "x07", "x17", "x44", "x45",
    // r8 two-session probe (floorprobe_r8_{a,b}): consistent AQE-off wins
    // in BOTH sessions — q34 (−0.032/−0.039), q51 (−0.040/−0.043),
    // x03 (−0.054/−0.091), x30 (−0.043/−0.052), x32 (−0.235/−0.211),
    // x34 (−0.056/−0.051). x03/x30/x32 were unpinned in r7 on that
    // round's SPLIT probes; this round both sessions agree, and the r8
    // plan changes make their shuffles statically shaped enough that
    // AQE's stage re-planning is pure materialization overhead. The
    // sign-flip rule still applies next round: any split → unpin again.
    "q34", "q51", "x03", "x30", "x32", "x34"
  )

  private def enabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_STATIC_PLANS", "true") == "true"

  def isStatic(name: String): Boolean =
    enabled && staticPlan.contains(name.takeWhile(_ != '_'))

  /** Run `action` (which must materialize the query — noop/parquet write)
    * under the query's plan profile. Conf is flipped around the ACTION,
    * not the frame build, because `spark.sql.adaptive.enabled` is read at
    * physical planning time. */
  def withProfile[T](spark: SparkSession, name: String)(action: => T): T =
    if (isStatic(name)) Det.withAqeOff(spark)(action) else action
}
