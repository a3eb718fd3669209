package graft.ext

import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline-trained IVF centroid index over the `embeddings` corpus
  * (extension surface, SURVEY.md §2.11).
  *
  * Round-1's x11 trained its centroids inside the query: seeds `vec_id < 16`
  * and ONE Lloyd iteration per run. That is not how an IVF index exists at
  * 100 TB — the index is built once by an offline k-means job and persisted;
  * queries only assign + probe. This object is that build:
  *
  *  - **seeding**: the k corpus vectors with the smallest
  *    `xxhash64(vec_id)` — a deterministic spread sample independent of id
  *    density/ordering (first-k-ids was a toy), selected by
  *    TakeOrderedAndProject, one distributed pass;
  *  - **training**: `iters` (≥2) distributed Lloyd iterations; the
  *    centroid means use decimal sums ([[graft.ops.Det]] contract) so the
  *    trained index — and every query served from it — is bit-identical at
  *    any partitioning/executor count;
  *  - **persistence**: centroids land in a parquet table; queries reload
  *    them from storage (memoized per session+corpus+params), exactly the
  *    shape of a production index-build pipeline.
  */
object IvfIndex {
  // keyed by the session OBJECT (identity equality — identityHashCode keys
  // can collide across live sessions); stopped sessions pruned on access
  private val cache = new ConcurrentHashMap[(SparkSession, String, Int, Int), String]()

  /** The trained centroid table (cid, cv: array<double>, cnrm), building
    * and persisting it on first use for a given (session, corpus, k, iters). */
  def centroids(s: SparkSession, dir: String, k: Int = 16, iters: Int = 2): DataFrame = {
    cache.keySet.removeIf(
      new java.util.function.Predicate[(SparkSession, String, Int, Int)] {
        def test(key: (SparkSession, String, Int, Int)): Boolean =
          key._1.sparkContext.isStopped
      })
    val path = cache.computeIfAbsent(
      (s, dir, k, iters),
      new JFunction[(SparkSession, String, Int, Int), String] {
        def apply(key: (SparkSession, String, Int, Int)): String = train(s, dir, k, iters)
      })
    s.read.parquet(path)
  }

  private val assignCache = new ConcurrentHashMap[(SparkSession, String, Int, Int), String]()

  /** Persisted corpus→cell ASSIGNMENT table (vec_id, v, nrm, cell) — the
    * other half of a real IVF index (vectors stored grouped by cell):
    * queries read the artifact and assign only the query vectors, instead
    * of re-assigning the whole corpus per query. Built lazily once per
    * (session, corpus, k, iters), like [[centroids]]. */
  def assignments(s: SparkSession, dir: String, k: Int = 16, iters: Int = 2): DataFrame = {
    val path = assignCache.computeIfAbsent(
      (s, dir, k, iters),
      new JFunction[(SparkSession, String, Int, Int), String] {
        def apply(key: (SparkSession, String, Int, Int)): String = {
          val a = Similarity.assignCells(
            Similarity.normed(s, dir), centroids(s, dir, k, iters))
          val out = java.nio.file.Files
            .createTempDirectory("graft-ivf-assign").toString + "/assigned"
          a.write.mode("overwrite").parquet(out)
          out
        }
      })
    s.read.parquet(path)
  }

  /** Per-cell angular radii of the persisted assignment — index metadata
    * (k rows), derived on read (one aggregate over the assignment table). */
  def radii(s: SparkSession, dir: String, k: Int = 16, iters: Int = 2): DataFrame =
    Similarity.cellRadii(assignments(s, dir, k, iters), centroids(s, dir, k, iters))

  /** One full offline index build; returns the centroid table's location. */
  private def train(s: SparkSession, dir: String, k: Int, iters: Int): String = {
    val e = Similarity.normed(s, dir).localCheckpoint(eager = true)
    var cents = e
      .orderBy(xxhash64(col("vec_id")).asc_nulls_first, col("vec_id").asc_nulls_first)
      .limit(k)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    for (_ <- 1 to iters)
      cents = Similarity.lloydIteration(Similarity.assignCells(e, cents))
        .localCheckpoint(eager = true)
    val out = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/centroids"
    cents.write.mode("overwrite").parquet(out)
    out
  }
}
