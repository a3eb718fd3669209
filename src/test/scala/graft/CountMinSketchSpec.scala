package graft

import graft.functions.CountMinSketch
import org.apache.spark.sql.functions._

/** Count–min sketch laws: never underestimates, overestimate bounded by
  * ε·N at the sketch's width, and — because the counters are purely
  * additive — the finished sketch is BIT-IDENTICAL under any partitioning
  * (strictly stronger than MG's order-dependent counters). The SQL-side
  * [[CountMinSketch.estimate]] replay must agree with a JVM-side replay of
  * the same md5 bucketing. */
class CountMinSketchSpec extends SparkTestBase {
  import spark.implicits._

  // skewed synthetic stream: term_i appears ~ (23 - i)² times
  private lazy val terms: Seq[String] =
    (0 until 23).flatMap(i => Seq.fill((23 - i) * (23 - i))(s"t$i"))

  private def sketchOf(numPartitions: Int): Seq[Long] = {
    val df = spark.sparkContext.parallelize(terms, numPartitions).toDF("term")
    df.agg(CountMinSketch.sketch($"term").as("cms"))
      .collect()(0).getSeq[Long](0)
  }

  test("CMS sketch is bit-identical under any partitioning") {
    val s1 = sketchOf(1)
    assert(s1.length == CountMinSketch.DefaultWidth * CountMinSketch.DefaultDepth)
    Seq(3, 16).foreach(p => assert(sketchOf(p) == s1, s"partitioning $p diverged"))
    assert(s1.sum == terms.size.toLong * CountMinSketch.DefaultDepth)
  }

  test("CMS point estimates never underestimate and respect the eps*N bound") {
    val df = spark.sparkContext.parallelize(terms, 7).toDF("term")
    val sk = df.agg(CountMinSketch.sketch($"term").as("cms"))
    val exact = terms.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val probe = exact.keys.toSeq.toDF("term").crossJoin(sk)
      .select($"term", CountMinSketch.estimate($"cms", $"term").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = math.E / CountMinSketch.DefaultWidth * terms.size
    exact.foreach { case (t, c) =>
      val est = probe(t)
      assert(est >= c, s"$t underestimated: $est < $c")
      assert(est - c <= bound, s"$t overestimate ${est - c} > eps*N=$bound")
    }
  }

  test("arithmetic bucket equals the md5-hex-parse definition (incl. non-ASCII)") {
    // One tricky term per singleton sketch: the single increment must land in
    // the bucket the SQL-side definition (parseLong(hex.take(15),16) % width)
    // computes, for every depth row. Covers empty, non-ASCII, and separator
    // collisions ("1#x" as a term vs d=1 prefix).
    val tricky = Seq("", "héllo wörld", "日本語テキスト", "1#x", "emoji 🎉🎉", "a" * 300)
    val md = java.security.MessageDigest.getInstance("MD5")
    tricky.foreach { t =>
      val sk = Seq(t).toDF("term")
        .agg(CountMinSketch.sketch($"term").as("cms"))
        .collect()(0).getSeq[Long](0)
      (0 until CountMinSketch.DefaultDepth).foreach { d =>
        md.reset()
        val hex = md.digest(s"$d#$t".getBytes("UTF-8"))
          .take(8).map(b => f"$b%02x").mkString
        val want = (java.lang.Long.parseLong(hex.substring(0, 15), 16) %
          CountMinSketch.DefaultWidth).toInt
        assert(sk(d * CountMinSketch.DefaultWidth + want) == 1L,
          s"term '$t' depth $d: increment not at hex-parse bucket $want")
      }
    }
  }

  test("estimate of an absent term is bounded by eps*N (pure collision mass)") {
    val df = spark.sparkContext.parallelize(terms, 4).toDF("term")
    val sk = df.agg(CountMinSketch.sketch($"term").as("cms"))
    val ghost = sk.select(CountMinSketch.estimate($"cms", lit("never-seen")).as("est"))
      .collect()(0).getLong(0)
    assert(ghost >= 0 && ghost <= math.E / CountMinSketch.DefaultWidth * terms.size)
  }
}
