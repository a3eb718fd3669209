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
    * justified safe — under their static plan. Everything else keeps AQE. */
  val staticPlan: Set[String] = Set(
    // single fixed-key hash-agg over the pinned layout; AQE's only move
    // (post-shuffle coalescing) is already static via shuffle.partitions
    "q01", "q06", "q14", "q26", "q28", "q39", "q48",
    // join trees with every strategy pinned: bounded dims broadcast-hinted,
    // growing sides pre-partitioned (q05 star, q44 right, q03 top-k fusion,
    // q54/q55/q56 funnel/retention/sessionize on the events layout)
    "q03", "q05", "q22", "q44", "q54", "q55", "q56",
    // window/dialect queries over one fixed partitioning (q45 QUALIFY,
    // q46 DISTINCT ON, q47 star modifiers, q58 frame EXCLUDE, q20 dates,
    // q23 asof rewrite, q50's unrolled month spine, q59 read_* scan)
    "q20", "q23", "q45", "q46", "q47", "q50", "q58", "q59",
    // extension family: shingle/fingerprint pipelines keyed once (x02/x03/
    // x04 dedup, x10 brute top-k, x11 IVF probe over the persisted index,
    // x18 binned range join, x19 cell-pair pruning, x27 postings, x30
    // unigram LM, x32 decontamination). x34 was pinned in r6a but its two
    // probe runs disagreed (−0.06 vs +0.28 s) — mixed evidence keeps the
    // AQE default (the manifest assembly joins CC output whose size is
    // genuinely runtime-shaped).
    "x02", "x03", "x04", "x10", "x11", "x18", "x19", "x27", "x30", "x32",
    // consistent wins across BOTH FloorProbe sessions (r6a and r6b, same
    // sign both times): fully-static scans and single-agg shapes —
    // q35 VALUES inline, q41/q42/q43 map-only string/regex scans, q07
    // broadcast semi/anti, q36 keyed time-window agg, q49 broadcast
    // lateral top-k, q57 type corners, x07 map-only lang-id, x15 one
    // sketch aggregation, x17 fixed salting demo, x44 map-only CDC
    // chunking, x45 keyed gap-fill windows on the pinned layout
    "q07", "q35", "q36", "q41", "q42", "q43", "q49", "q57",
    "x07", "x15", "x17", "x44", "x45"
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
