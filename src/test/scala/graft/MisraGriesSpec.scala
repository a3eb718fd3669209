package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitter sketch laws: never overestimates, error
  * bounded by N/(k+1) for EVERY term, heavy terms always present — and all
  * of it invariant to how the input is partitioned (the mergeability
  * property partial aggregation depends on). */
class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  // skewed synthetic stream: term_i appears ~ (37 - i)² times
  private lazy val terms: Seq[String] =
    (0 until 37).flatMap(i => Seq.fill((37 - i) * (37 - i))(s"t$i"))

  private def checkLaws(numPartitions: Int, k: Int): Unit = {
    val df = spark.sparkContext.parallelize(terms, numPartitions).toDF("term")
    val sk = df.agg(MisraGries.topkSketch($"term", k).as("mg"))
      .select(explode($"mg").as(Seq("term", "est")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = terms.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = terms.size.toLong
    val bound = n.toDouble / (k + 1)
    assert(sk.size <= k, s"sketch kept ${sk.size} > k=$k entries")
    sk.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overestimated: $est > ${exact(t)}")
    }
    exact.foreach { case (t, c) =>
      val est = sk.getOrElse(t, 0L)
      assert(c - est <= bound, s"$t error ${c - est} > N/(k+1)=$bound")
      if (c > bound) assert(sk.contains(t), s"heavy term $t (count $c) missing")
    }
  }

  test("MG guarantees hold at k=32 regardless of partitioning") {
    Seq(1, 4, 32).foreach(p => checkLaws(p, 32))
  }

  test("MG guarantees hold at small capacity (k=8) under heavy pruning") {
    Seq(2, 16).foreach(p => checkLaws(p, 8))
  }
}
