package graft

import graft.ext.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** Scale-path guarantees of the similarity family: the IVF-blocked
  * threshold join is LOSSLESS (bit-identical to brute force), actually
  * prunes on clustered data, never plans a corpus×corpus cartesian
  * product, and the probed ANN keeps high recall against exact search. */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  /** 10 tight clusters of 30 vectors in R^8: cluster c = unit axis e_{c mod 8}
    * rotated slightly per member (deterministic jitter). */
  private lazy val clustered = {
    val rows = for {
      c <- 0 until 10
      m <- 0 until 30
    } yield {
      val base = Array.fill(8)(0.0)
      base(c % 8) = 1.0
      base((c + 3) % 8) = if (c < 8) 0.05 else 0.9 // two clusters share an axis pair
      val jit = base.zipWithIndex.map { case (x, i) =>
        x + 0.01 * math.sin((c * 31 + m * 7 + i) * 0.7)
      }
      (c * 100L + m, jit.toSeq)
    }
    rows.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
      .localCheckpoint(true)
  }

  private lazy val cents = {
    val seeds = clustered
      .orderBy(xxhash64(col("vec_id")).asc_nulls_first, col("vec_id").asc_nulls_first)
      .limit(12)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    var c = seeds
    for (_ <- 1 to 3)
      c = Similarity.lloydIteration(Similarity.assignCells(clustered, c)).localCheckpoint(true)
    c
  }

  test("thresholdPairs is lossless: identical pair set + sims as brute force") {
    val assigned = Similarity.assignCells(clustered, cents).localCheckpoint(true)
    val blocked = Similarity.thresholdPairs(assigned, cents, 0.95)
      .select($"a", $"b", round($"sim", 9).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = clustered.select($"vec_id".as("a"), $"v".as("va"))
    val b = clustered.select($"vec_id".as("b"), $"v".as("vb"))
    val brute = a.crossJoin(b).filter($"a" < $"b")
      .withColumn("sim", graft.functions.VectorExpressions.cosineSim($"va", $"vb"))
      .filter($"sim" >= 0.95)
      .select($"a", $"b", round($"sim", 9).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
    assert(blocked == brute)
  }

  test("cell-pair pruning eliminates most of the k² pairs on clustered data") {
    val assigned = Similarity.assignCells(clustered, cents).localCheckpoint(true)
    val k = cents.count()
    val surviving = Similarity.qualifyingCellPairs(assigned, cents, 0.95).count()
    // tight clusters at a high threshold: only same/adjacent cells survive
    assert(surviving < k * k / 2,
      s"pruning kept $surviving of ${k * k} cell pairs — blocking is not blocking")
  }

  test("x19 plan has no cartesian product — candidates flow through equi-joins") {
    val plan = ext.Similarity.queries("x19_embed_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("probedTopK keeps a query whose two probed cells hold no candidates") {
    // degenerate index: q (vec_id 0) alone in its cell, the second-nearest
    // centroid owns an EMPTY cell, and every other vector sits in a far
    // third cell. Phase 1 then yields ZERO candidates for q — the -2.0
    // sentinel fallback must widen phase 2 to the far cell instead of
    // silently dropping q from the output.
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val corpus = ((0L, at(0.0)) +:
      (10 to 20).map(i => (i.toLong, at(85.0 + (i - 10)))))
      .toDF("vec_id", "v")
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    val cents = Seq((0L, at(0.0)), (1L, at(40.0)), (2L, at(90.0)))
      .toDF("cid", "cv")
      .withColumn("cnrm", sqrt(aggregate(col("cv"), lit(0.0), (acc, x) => acc + x * x)))
    // fixture sanity: cell 1 really is empty, cell 0 really is {q}
    val byCell = Similarity.assignCells(corpus, cents)
      .groupBy($"cell").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCell.get(1L).isEmpty && byCell(0L) == 1L, byCell.toString)
    val got = Similarity.probedTopK(corpus, cents, $"vec_id" === 0)
      .orderBy($"nn_rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    // q must survive with the true top-5 (cos is maximal at the smallest
    // angle; 85°..95° sorted by closeness to 0° → ids 10, 11, 12, 13, 14)
    assert(got.toSeq == Seq((1, 10L), (2, 11L), (3, 12L), (4, 13L), (5, 14L)))
  }

  test("x11 bounded-probe ANN is exact: equals x10 row for row (recall 1.0)") {
    // neither query declares an ORDER BY, so compare as (q_id, rank)-keyed
    // sets — the driver's oracle compare is row-order-insensitive too
    def keyed(name: String) =
      ext.Similarity.queries(name)(spark, sfDir)
        .orderBy(col("q_id"), col("nn_rank")).collect().map(_.toSeq).toSeq
    assert(keyed("x11_ann_ivf") == keyed("x10_cosine_topk"))
  }
}
