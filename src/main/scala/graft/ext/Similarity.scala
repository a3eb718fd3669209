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
  *    path. Corpus is partitioned into cells by nearest centroid (one
  *    broadcast join), queries probe only their 2 nearest cells. At 100 TB
  *    the per-query work drops from |corpus| to |probed cells|.
  *
  * All dot products run as codegen'd higher-order functions over
  * `array<double>` (sequential fold — same summation order as the oracle's
  * `list_inner_product`, so values are reproducible bit-for-bit; results
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

  /** Assign every vector to its nearest centroid (ties → lowest cid). */
  def assignCells(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("csim", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .groupBy(col("vec_id"), col("v"), col("nrm"))
      .agg(max(struct(col("csim"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("vec_id"), col("v"), col("nrm"), (-col("best.ncid")).as("cell"))

  private def topkPerQuery(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc_nulls_last, col("vec_id").asc_nulls_first)
    pairs.withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= k)
      .select(col("q_id"), col("nn_rank"), col("vec_id"), round(col("sim"), 5).as("sim"))
      .orderBy(col("q_id").asc_nulls_first, col("nn_rank").asc_nulls_first)
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

    // ---- IVF cell-probe ANN: 16 seed centroids refined with one Lloyd
    // iteration, 2-cell probe, top-5. Rows-only check (ANN recall < 1 by
    // design; recall vs x10 asserted in ExtensionsSpec).
    "x11_ann_ivf" -> { (s, dir) =>
      // the normed corpus feeds seed selection + two assignment passes —
      // checkpoint once instead of recomputing parquet-scan+norms 3×
      val e = normed(s, dir).localCheckpoint(true)
      val seeds = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      val cents = lloydIteration(assignCells(e, seeds)).localCheckpoint(true)
      val assigned = assignCells(e, cents)
      // queries probe their 2 nearest cells
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
      val probeW = Window.partitionBy(col("q_id"))
        .orderBy(col("psim").desc_nulls_last, col("cid").asc_nulls_first)
      val probes = q.crossJoin(broadcast(cents))
        .withColumn("psim", dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm")))
        .withColumn("pr", row_number().over(probeW))
        .filter(col("pr") <= 2)
        .select(col("q_id"), col("qv"), col("qnrm"), col("cid").as("cell"))
      val pairs = assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
        .select(col("q_id"), col("vec_id"), col("sim"))
      topkPerQuery(pairs, 5)
    },

    // ---- embedding-cosine near-dup detection (the embedding face of the
    // dedup family): all pairs above a cosine threshold, exact within a
    // bounded window (vec_id < 2000 — constant work at any SF). The scale
    // path replaces the pair join with the IVF cells of x11 as a blocking
    // structure (candidates = same cell), same verify step.
    "x19_embed_dedup" -> { (s, dir) =>
      // fused codegen CosineSimilarity: no per-pair zipped-array
      // allocation (2M pairs × 64 dims — the composed higher-order
      // version was 7× slower here), bit-identical results
      val e = Tables(s, dir, "embeddings").filter(col("vec_id") < 2000)
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
      val a = e.select(col("vec_id").as("a"), col("v").as("va"))
      val b = e.select(col("vec_id").as("b"), col("v").as("vb"))
      a.crossJoin(broadcast(b)).filter(col("a") < col("b"))
        .withColumn("sim",
          graft.functions.VectorExpressions.cosineSim(col("va"), col("vb")))
        .filter(col("sim") >= 0.4)
        .select(col("a"), col("b"), round(col("sim"), 5).as("sim"))
        .orderBy(col("a").asc_nulls_first, col("b").asc_nulls_first)
    },

    // ---- mergeable KMV distinct sketch (rows-only: sketch estimates are
    // definitionally engine-specific; accuracy asserted in KmvSketchSpec)
    "x15_kmv_distinct" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          graft.functions.KmvSketch.approxDistinctKmv(col("user_id")).as("kmv_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy(col("event_type").asc_nulls_first)
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
