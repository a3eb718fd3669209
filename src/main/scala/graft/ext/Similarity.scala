package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (extension surface, SURVEY.md §2.11).
  *
  * Two paths:
  *  - [[queries x10_cosine_topk]]: brute-force cosine top-k — the exact
  *    baseline. Query side is broadcast; the corpus side streams through a
  *    single pass (no shuffle of the big side until the final per-query
  *    top-k window, which is tiny). This is the right plan at any corpus
  *    size *when the query set is small*.
  *  - [[queries x11_ann_ivf]]: IVF-style cell-probed search — the scale
  *    path. Corpus is partitioned into cells by nearest centroid from the
  *    offline-trained persisted [[IvfIndex]] (one broadcast join), queries
  *    probe only their 2 nearest cells. At 100 TB the per-query work drops
  *    from |corpus| to |probed cells|, and the index build is a separate
  *    job, not query work.
  *  - [[thresholdPairs]]: exact cosine θ-join through lossless IVF
  *    cell-pair pruning (x19's engine).
  *
  * All hot-path similarities run through the fused whole-stage-codegen
  * [[graft.functions.VectorExpressions.cosineSim]] (one primitive loop, no
  * per-pair intermediate array); x10 alone keeps the composed
  * `aggregate`/`zip_with` formulation as the built-in-functions baseline.
  * Both use the same left-to-right sequential fold as the oracle's
  * `list_inner_product`, so values are reproducible bit-for-bit (results
  * additionally rounded to 5 digits in the contract output).
  */
object Similarity {
  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** embeddings as (vec_id, v: array<double>, nrm). */
  def normed(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .withColumn("nrm", l2norm(col("v")))

  /** One distributed Lloyd iteration: new centroid = elementwise mean of
    * the vectors assigned to the cell. Explode to (cell, pos, val) →
    * groupBy(cell, pos) mean → reassemble ordered arrays. Shuffle volume is
    * |corpus|·d scalars — the standard distributed k-means step. */
  def lloydIteration(assigned: DataFrame): DataFrame = {
    val exploded = assigned.select(col("cell"), posexplode(col("v")).as(Seq("pos", "val")))
    // decimal-sum mean (Det contract): partition/merge-order invariant, so
    // cell assignment — and x11's output — is identical on every run
    val means = exploded.groupBy(col("cell"), col("pos"))
      .agg((sum(col("val").cast(DecimalType(28, 18))).cast(DoubleType) /
        count(col("val"))).as("m"))
    means.groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell").as("cid"),
        expr("transform(pm, x -> x.m)").as("cv"))
      .withColumn("cnrm", l2norm(col("cv")))
  }

  /** Assign every vector to its nearest centroid (ties → lowest cid).
    * Fused-codegen cosine: bit-identical to dot/(nrm·cnrm) — same
    * sequential folds, IEEE-exact sqrt — at ~10× the throughput of the
    * zip_with composition (no per-pair intermediate array). */
  def assignCells(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("csim",
        graft.functions.VectorExpressions.cosineSim(col("v"), col("cv")))
      .groupBy(col("vec_id"), col("v"), col("nrm"))
      .agg(max(struct(col("csim"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), col("v"), col("nrm"), (-col("best.ncid")).as("cell"))

  /** acos with the argument clamped to [-1, 1] — a sequential-fold dot of a
    * vector with itself can land at 1 + ulp and acos would return NaN. */
  private def angle(cosSim: Column): Column =
    acos(least(greatest(cosSim, lit(-1.0)), lit(1.0)))

  /** Exact cosine θ-join (all pairs with similarity ≥ threshold) via
    * LOSSLESS IVF cell-pair pruning — the scale path for embedding dedup.
    *
    * For vectors a, b in cells with centroids c₁, c₂ the angular triangle
    * inequality gives angle(a,b) ≥ angle(c₁,c₂) − r₁ − r₂, where rᵢ is the
    * cell's angular radius (max member-to-centroid angle). A cell pair
    * whose lower bound exceeds acos(threshold) provably contains no
    * qualifying pair, so only the surviving cell pairs are expanded —
    * through equi-joins on the cell id (shuffle-partitioned by cell),
    * never a corpus×corpus cross join. The only cross join is centroid ×
    * centroid: k² rows of bounded index metadata. On clustered corpora
    * (what real near-dup data looks like) almost all of the k² cell pairs
    * prune away; on adversarial data the join degrades to a distributed
    * pair join but keeps the same shuffle-by-cell plan shape.
    *
    * Pruning never drops a qualifying pair (the bound is provable, with
    * 1e-7 rad slack covering acos conditioning), and survivors are verified with the
    * exact fused-codegen cosine — output is bit-identical to brute force.
    *
    * @param assigned corpus as (vec_id, v, nrm, cell) from [[assignCells]]
    * @param cents    centroid table (cid, cv, cnrm) from [[IvfIndex]]
    */
  def thresholdPairs(assigned: DataFrame, cents: DataFrame, threshold: Double): DataFrame = {
    val qualifying = qualifyingCellPairs(assigned, cents, threshold)
    val a = assigned.select(col("cell").as("ca"), col("vec_id").as("a"), col("v").as("va"))
    val b = assigned.select(col("cell").as("cb"), col("vec_id").as("b"), col("v").as("vb"))
    a.join(broadcast(qualifying), Seq("ca"))
      .join(b, Seq("cb"))
      .filter(col("a") < col("b"))
      .withColumn("sim",
        graft.functions.VectorExpressions.cosineSim(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }

  /** Per-cell angular radius: max member-to-centroid angle, the quantity
    * every triangle-inequality bound in this file leans on. */
  def cellRadii(assigned: DataFrame, cents: DataFrame): DataFrame =
    assigned.join(broadcast(cents), col("cell") === col("cid"))
      .withColumn("ang",
        angle(graft.functions.VectorExpressions.cosineSim(col("v"), col("cv"))))
      .groupBy(col("cell")).agg(max(col("ang")).as("rad"))

  /** The (ca, cb) cell pairs that can still contain a pair at ≥ threshold
    * — everything else is pruned by the triangle-inequality lower bound.
    * Separate so specs can assert the pruning ratio directly. */
  def qualifyingCellPairs(assigned: DataFrame, cents: DataFrame, threshold: Double): DataFrame = {
    val thetaMax = math.acos(threshold)
    val cwr = cents.join(cellRadii(assigned, cents), col("cid") === col("cell"))
      .select(col("cid"), col("cv"), col("cnrm"), col("rad"))
    val ca = cwr.select(col("cid").as("ca"), col("cv").as("cva"),
      col("cnrm").as("cnrma"), col("rad").as("ra"))
    val cb = cwr.select(col("cid").as("cb"), col("cv").as("cvb"),
      col("cnrm").as("cnrmb"), col("rad").as("rb"))
    ca.crossJoin(broadcast(cb)) // k² centroid pairs — index metadata, not corpus
      .withColumn("cang",
        angle(graft.functions.VectorExpressions.cosineSim(col("cva"), col("cvb"))))
      // 1e-7 rad slack: acos near cos≈±1 amplifies a 1-ulp quotient error
      // to ~1e-8 rad, so 1e-9 could wrongly prune a boundary cell pair;
      // the cost of the wider slack is a few extra scanned pairs, the cost
      // of a wrong prune is a missed qualifying pair
      .filter(col("cang") - col("ra") - col("rb") <= lit(thetaMax + 1e-7))
      .select(col("ca"), col("cb"))
  }

  /** Exact cell-probed top-k (x11's engine, factored out so specs can run
    * it against hand-built indexes): phase 1 probes each query's `probes`
    * nearest cells and takes the interim k-th-best similarity t; phase 2
    * scans only the remaining cells whose per-cell upper bound
    * cos(max(angle(q,c) − radius(c), 0)) can still beat t (the same
    * triangle-inequality bound as [[thresholdPairs]]). Unscanned cells
    * provably hold no better neighbor, so the result equals brute force.
    *
    * @param e     corpus as (vec_id, v, nrm) from [[normed]]
    * @param cents centroid table (cid, cv, cnrm); cells may be EMPTY
    *              (a centroid that lost every member on final assignment)
    * @param qPred picks the query vectors out of `e`
    */
  def probedTopK(e: DataFrame, cents: DataFrame, qPred: Column, k: Int = 5,
      probes: Int = 2): DataFrame =
    probedTopKFromIndex(
      assignCells(e, cents), cellRadii(assignCells(e, cents), cents),
      e.filter(qPred)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm")),
      cents, k, probes)

  /** The probe-side metadata frame: centroid ⋈ radius with empty cells'
    * radius coalesced to 0 (an empty cell has no radius row — the centroid
    * itself bounds nothing, the cell scans as empty). k rows; built once
    * per index by [[IvfIndex]] and pinned resident. */
  def probeMeta(cents: DataFrame, radii: DataFrame): DataFrame =
    cents.join(radii, col("cid") === col("cell"), "left")
      .select(col("cid"), col("cv"), col("cnrm"), coalesce(col("rad"), lit(0.0)).as("rad"))

  /** [[probedTopK]] over PRE-BUILT index artifacts ([[IvfIndex.assignments]]
    * / [[IvfIndex.radii]]): query-time work is assign-the-queries + probe —
    * the corpus assignment is read, not recomputed, which is how an IVF
    * index serves at 100 TB.
    *
    * @param assigned (vec_id, v, nrm, cell) index table
    * @param radii    (cell, rad) index metadata
    * @param q        query vectors as (q_id, qv, qnrm)
    */
  def probedTopKFromIndex(assigned: DataFrame, radii: DataFrame, q: DataFrame,
      cents: DataFrame, k: Int = 5, probes: Int = 2): DataFrame =
    probedTopKFromMeta(assigned, probeMeta(cents, radii), q, k, probes)

  /** [[probedTopKFromIndex]] with the probe metadata already joined —
    * serving path for [[IvfIndex.probeMeta]]'s resident frame, so a query
    * doesn't re-run the k-row metadata join per execution (r6 verdict #1).
    *
    * @param cwr (cid, cv, cnrm, rad) probe metadata from [[probeMeta]]
    */
  def probedTopKFromMeta(assigned: DataFrame, cwr: DataFrame, q: DataFrame,
      k: Int = 5, probes: Int = 2): DataFrame = {
    // query × cell: probe rank and the cell's best-possible similarity
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("qcang").asc_nulls_first, col("cid").asc_nulls_first)
    val qc = q.crossJoin(broadcast(cwr))
      .withColumn("qcang",
        angle(graft.functions.VectorExpressions.cosineSim(col("qv"), col("cv"))))
      .withColumn("ub", cos(greatest(col("qcang") - col("rad"), lit(0.0))))
      .withColumn("pr", row_number().over(probeW))
      .select(col("q_id"), col("qv"), col("qnrm"), col("cid").as("pcell"),
        col("ub"), col("pr"))
    def scan(probed: DataFrame) =
      assigned.join(broadcast(probed.withColumnRenamed("pcell", "cell")), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim",
          graft.functions.VectorExpressions.cosineSim(col("v"), col("qv")))
        .select(col("q_id"), col("vec_id"), col("sim"))
    // phase 1: the `probes` nearest cells
    val cand1 = scan(qc.filter(col("pr") <= probes)
      .select(col("q_id"), col("qv"), col("qnrm"), col("pcell")))
    val rankW = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc_nulls_last, col("vec_id").asc_nulls_first)
    val t5agg = cand1.withColumn("rn", row_number().over(rankW)).filter(col("rn") <= k)
      .groupBy(col("q_id"))
      .agg(when(count(lit(1)) < k, lit(-2.0)).otherwise(min(col("sim"))).as("t5"))
    // every query keeps a t5 row even when phase 1 found ZERO candidates
    // (singleton own cell + empty second probe): left join + the -2.0
    // sentinel makes phase 2 scan all remaining cells instead of silently
    // dropping the query from the output
    val t5 = q.select(col("q_id"))
      .join(broadcast(t5agg), Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("t5"), lit(-2.0)).as("t5"))
    // phase 2: unprobed cells that can still contain a top-k neighbor
    // (1e-7 slack covers acos conditioning near cos≈±1, where a 1-ulp
    // quotient error inflates to ~1e-8 rad — extra scanned cells are
    // negligible, a wrongly pruned one breaks exactness)
    val cand2 = scan(
      qc.filter(col("pr") > probes)
        .join(broadcast(t5), Seq("q_id"))
        .filter(col("ub") > col("t5") - lit(1e-7))
        .select(col("q_id"), col("qv"), col("qnrm"), col("pcell")))
    topkPerQuery(cand1.unionByName(cand2), k)
  }

  private def topkPerQuery(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc_nulls_last, col("vec_id").asc_nulls_first)
    pairs.withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= k)
      .select(col("q_id"), col("nn_rank"), col("vec_id"), round(col("sim"), 5).as("sim"))
  }

  val queries: Map[String, Q] = Map(
    // ---- exact brute-force cosine top-5 for 8 fixed query vectors
    "x10_cosine_topk" -> { (s, dir) =>
      val e = normed(s, dir)
      val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
        .filter(col("q_id") < 8)
      val pairs = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
        .select(col("q_id"), col("vec_id"), col("sim"))
      topkPerQuery(pairs, 5)
    },

    // ---- IVF cell-probed top-k over the OFFLINE-trained persisted index
    // ([[IvfIndex]]: hash-spread seeds, ≥2 Lloyd iterations, centroids in
    // a parquet table) — EXACT by construction. Phase 1 probes the 2
    // nearest cells and takes the interim 5th-best similarity t; phase 2
    // scans only the remaining cells whose per-cell upper bound
    // cos(max(angle(q,c) − radius(c), 0)) can still beat t (triangle
    // inequality — the same bound as [[thresholdPairs]]). Unscanned cells
    // provably hold no better neighbor, so the result equals brute force
    // (shares x10's oracle) while the scan fraction tracks the corpus's
    // cluster structure: tight clusters → phase 2 scans almost nothing;
    // structureless data degrades toward full scan instead of silently
    // losing recall. No training in the query path — at 100 TB the index
    // build is a separate job.
    "x11_ann_ivf" -> { (s, dir) =>
      // query-time = read the resident index artifacts (centroids +
      // corpus assignment), assign only the 8 query vectors, probe.
      // The probe is driver-sequenced into phases by construction (phase 2
      // needs phase 1's t5 threshold) over statically-known shapes with
      // explicit broadcasts — pin the plan and run it as one non-adaptive
      // action ([[graft.ops.Det.withAqeOff]]), materializing the (8×k)-row
      // result inside the pinned scope
      graft.ops.Det.withAqeOff(s) {
        val asg = IvfIndex.assignments(s, dir)
        val q = asg.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
        probedTopKFromMeta(asg, IvfIndex.probeMeta(s, dir), q)
          .localCheckpoint(eager = true)
      }
    },

    // ---- embedding-cosine near-dup detection (the embedding face of the
    // dedup family): ALL pairs above a cosine threshold, computed through
    // [[thresholdPairs]] — the IVF cells of x11 as a LOSSLESS blocking
    // structure (cell pairs pruned by the angular triangle inequality,
    // candidates expanded through equi-joins on cell, exact fused-codegen
    // cosine verify). Output is provably identical to the brute-force
    // pair join, so the oracle stays bit-exact, while the plan carries no
    // corpus×corpus cross join. Bounded window (vec_id < 2000) keeps the
    // oracle's work constant at any SF; the operator itself has no bound.
    "x19_embed_dedup" -> { (s, dir) =>
      // the bounded window is a FILTER of the persisted assignment table
      // (per-vector nearest centroid doesn't depend on the window);
      // radii are recomputed on the window inside thresholdPairs for the
      // tightest lossless pruning bound
      val assigned = IvfIndex.assignments(s, dir).filter(col("vec_id") < 2000)
      thresholdPairs(assigned, IvfIndex.centroids(s, dir), 0.4)
        .select(col("a"), col("b"), round(col("sim"), 5).as("sim"))
    },

    // ---- mergeable KMV distinct sketch. Estimate values are sketch-
    // specific, so the contract output is the exact count plus the
    // estimate's error-envelope check (≈1/√(k−2) ≈ 3% at k=1024; bound at
    // 10%) — driver-visible via the oracle instead of rows-only
    // (merge laws + error bounds additionally asserted in KmvSketchSpec)
    "x15_kmv_distinct" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          graft.functions.KmvSketch.approxDistinctKmv(col("user_id")).as("kmv"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(
          col("event_type"), col("exact_users"),
          (abs(col("kmv") - col("exact_users")) <= col("exact_users") * 0.1).as("kmv_ok"))
    },

    // ---- int8 embedding quantization + quantized cosine (the 4×
    // bandwidth/storage cut a 100 TB embedding store runs on): per-vector
    // max-abs scaling to [-127, 127] via floor(x+0.5) (identical rounding
    // on both engines — never round()), integer-exact quantized dot, and
    // a per-pair error check against the exact cosine. The oracle
    // replays the entire quantization, so even the error booleans are
    // computed — not asserted — on both sides.
    "x23_embed_quantize" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
        .withColumn("ma", greatest(
          aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))), lit(1e-12)))
        .withColumn("qv", expr(
          "transform(v, x -> CAST(floor(x * 127.0 / ma + 0.5) AS INT))"))
        .withColumn("qd", col("qv").cast(ArrayType(DoubleType)))
      val a = e.select(col("vec_id").as("a"), col("v").as("va"), col("qd").as("qa"))
      val b = e.select(col("vec_id").as("b"), col("v").as("vb"), col("qd").as("qb"))
      // fused codegen cosine on both the exact and quantized vectors —
      // same sequential fold as the oracle's list_inner_product, no
      // per-pair zipped-array allocation (2× per pair here)
      a.join(b, col("a") < col("b"))
        .withColumn("sim",
          graft.functions.VectorExpressions.cosineSim(col("va"), col("vb")))
        .withColumn("qsim",
          graft.functions.VectorExpressions.cosineSim(col("qa"), col("qb")))
        .filter(col("sim") >= 0.3) // report the interesting (similar) pairs
        .select(col("a"), col("b"),
          round(col("qsim"), 5).as("qsim"),
          (abs(col("qsim") - col("sim")) <= 0.02).as("quant_ok"))
    },

    // ---- brute-force top-k via the codegen'd fused CosineSimilarity
    // expression (one pass, no per-row intermediate array). Same math and
    // accumulation order as x10 → shares its oracle verbatim.
    "x14_cosine_topk_fused" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
      val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"))
        .filter(col("q_id") < 8)
      val pairs = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim",
          graft.functions.VectorExpressions.cosineSim(col("v"), col("qv")))
        .select(col("q_id"), col("vec_id"), col("sim"))
      topkPerQuery(pairs, 5)
    },

    // ---- one ORACLE-CHECKED distributed Lloyd step — the k-means
    // primitive [[IvfIndex]] trains with, surfaced as a registered
    // operator. Seeds are the per-label exact decimal-mean centroids
    // (both engines hold bit-identical centroid doubles — x36's
    // construction via [[lloydIteration]]), then every vector reassigns
    // to its nearest centroid by fused-codegen cosine, ties → lowest
    // centroid id. This is THE assignment shape at any scale: the k·d
    // centroid table broadcasts, the corpus streams through one cosine
    // pass (work ∝ |corpus|·k, never corpus×corpus), and the row_number
    // window partitions on vec_id — parallelism scales with the corpus.
    "x46_kmeans_step" -> { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast(LongType).as("label"),
          col("embedding").cast(ArrayType(DoubleType)).as("v"))
      val cents = lloydIteration(
        emb.select(col("label").as("cell"), col("v")))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("sim").desc_nulls_last, col("cid").asc_nulls_first)
      emb.crossJoin(broadcast(cents.select(col("cid"), col("cv"))))
        .withColumn("sim",
          graft.functions.VectorExpressions.cosineSim(col("v"), col("cv")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("label"), col("cid").as("assigned"),
          (col("label") =!= col("cid")).as("moved"),
          round(col("sim"), 5).as("sim_r"))
    })

  /** Shared by x10 (composed higher-order fns) and x14 (fused codegen
    * expression): both produce bit-identical similarities. */
  private val bruteForceOracle: String =
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                                 CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, x.vec_id AS vec_id,
        |         list_inner_product(x.v, q.v) / (x.nrm * q.nrm) AS sim
        |  FROM n x, n q
        |  WHERE q.vec_id < 8 AND x.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT q_id, vec_id, sim,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |           ORDER BY sim DESC NULLS LAST, vec_id ASC NULLS FIRST) AS INT) AS nn_rank
        |  FROM pairs)
        |SELECT q_id, nn_rank, vec_id, ROUND(sim, 5) AS sim
        |FROM ranked
        |WHERE nn_rank <= 5
        |ORDER BY q_id ASC NULLS FIRST, nn_rank ASC NULLS FIRST""".stripMargin

  val oracles: Map[String, String] = Map(
    "x10_cosine_topk" -> bruteForceOracle,
    "x14_cosine_topk_fused" -> bruteForceOracle,
    // centroid CTE mirrors x36's exact-decimal-mean construction; the
    // assignment replays the same fold order as the fused cosine
    "x46_kmeans_step" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |    sqrt(list_inner_product(v, v)) AS nrm FROM e),
        |pv AS (SELECT label,
        |    unnest(list_transform(range(len(v)), i -> {'pos': i, 'val': v[i+1]})) AS s
        |  FROM e),
        |m AS (SELECT label AS cid, s.pos AS pos,
        |    CAST(SUM(CAST(s.val AS DECIMAL(28,18))) AS DOUBLE) / COUNT(s.val) AS m
        |  FROM pv GROUP BY label, s.pos),
        |c AS (SELECT cid,
        |    list_transform(list_sort(list({'pos': pos, 'm': m})), x -> x.m) AS cv
        |  FROM m GROUP BY cid),
        |cn AS (SELECT cid, cv, sqrt(list_inner_product(cv, cv)) AS cnrm FROM c),
        |sc AS (SELECT n.vec_id, n.label, cn.cid,
        |    list_inner_product(n.v, cn.cv) / (n.nrm * cn.cnrm) AS sim
        |  FROM n, cn),
        |rk AS (SELECT vec_id, label, cid, sim,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY sim DESC NULLS LAST, cid ASC NULLS FIRST) AS rk
        |  FROM sc)
        |SELECT vec_id, label, cid AS assigned, (label <> cid) AS moved,
        |  ROUND(sim, 5) AS sim_r
        |FROM rk WHERE rk = 1
        |ORDER BY vec_id ASC NULLS FIRST""".stripMargin,
    // x11 is exact by construction (bounded cell scan) — same result set,
    // same accumulation order ⇒ shares the brute-force oracle verbatim
    "x11_ann_ivf" -> bruteForceOracle,
    "x15_kmv_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS kmv_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "x23_embed_quantize" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 300),
        |m AS (SELECT vec_id, v,
        |  greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS ma FROM n),
        |q AS (SELECT vec_id, v,
        |  CAST(list_transform(v, x -> CAST(floor(x * 127.0 / ma + 0.5) AS INT))
        |       AS DOUBLE[]) AS qd
        |  FROM m),
        |z AS (SELECT vec_id, v, qd,
        |  sqrt(list_inner_product(v, v)) AS nrm,
        |  sqrt(list_inner_product(qd, qd)) AS qnrm FROM q)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |  ROUND(list_inner_product(a.qd, b.qd) / (a.qnrm * b.qnrm), 5) AS qsim,
        |  abs(list_inner_product(a.qd, b.qd) / (a.qnrm * b.qnrm)
        |      - list_inner_product(a.v, b.v) / (a.nrm * b.nrm)) <= 0.02 AS quant_ok
        |FROM z a JOIN z b ON a.vec_id < b.vec_id
        |WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.3
        |ORDER BY a ASC NULLS FIRST, b ASC NULLS FIRST""".stripMargin,
    "x19_embed_dedup" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                                 CAST(embedding AS DOUBLE[]))) AS nrm
        |  FROM embeddings WHERE vec_id < 2000)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |  ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 5) AS sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
        |ORDER BY a ASC NULLS FIRST, b ASC NULLS FIRST""".stripMargin)
}
