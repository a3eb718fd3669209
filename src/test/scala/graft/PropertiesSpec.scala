package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic laws over generated DataFrames (SURVEY.md §5.2 item 3):
  * partitioning invariance, filter/projection commutation, dedup
  * idempotence, sort-limit stability, join commutativity. Uses raw
  * ScalaCheck generators (the scalatest bridge isn't in the offline
  * cache) with fixed seeds for reproducibility. */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val rowGen = Gen.listOfN(60,
    Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(-100, 100), Gen.alphaStr.map(_.take(5))))

  private def datasets(n: Int): Seq[List[(Long, Int, String)]] =
    (0 until n).flatMap(i => rowGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("aggregation is partitioning-invariant (decimal-sum determinism)") {
    datasets(6).foreach { data =>
      val df = data.toDF("k", "v", "s")
      def agg(parts: Int) = df.repartition(parts)
        .groupBy($"k")
        .agg(sum($"v".cast("decimal(18,0)")).cast("long").as("sv"), count(lit(1)).as("n"))
        .orderBy($"k")
        .collect().toSeq
      assert(agg(1) == agg(7))
    }
  }

  test("filter commutes with projection") {
    datasets(6).foreach { data =>
      val df = data.toDF("k", "v", "s")
      val a = df.filter($"v" > 0).select($"k", $"v").orderBy($"k", $"v").collect().toSeq
      val b = df.select($"k", $"v").filter($"v" > 0).orderBy($"k", $"v").collect().toSeq
      assert(a == b)
    }
  }

  test("dropDuplicates is idempotent") {
    datasets(6).foreach { data =>
      val df = data.toDF("k", "v", "s")
      val once = df.dropDuplicates("k")
      assert(once.count() == once.dropDuplicates("k").count())
      assert(once.count() == df.select($"k").distinct().count())
    }
  }

  test("orderBy+limit(n) is a prefix of orderBy+limit(n+m) under total order") {
    datasets(6).foreach { data =>
      val df = data.toDF("k", "v", "s")
      val total = df.orderBy($"v".asc, $"k".asc, $"s".asc)
      val small = total.limit(5).collect().toSeq
      val large = total.limit(15).collect().toSeq
      assert(large.take(small.length) == small)
    }
  }

  test("inner join is commutative on row multisets") {
    val ds = datasets(8)
    ds.grouped(2).filter(_.size == 2).foreach { case Seq(d1, d2) =>
      val a = d1.toDF("k", "v", "s")
      val b = d2.toDF("k", "v2", "s2").select($"k", $"v2")
      val ab = a.join(b, "k").select($"k", $"v", $"v2")
      val ba = b.join(a, "k").select($"k", $"v", $"v2")
      assert(ab.exceptAll(ba).isEmpty && ba.exceptAll(ab).isEmpty)
    }
  }

  test("IVF cell-pair pruning is LOSSLESS on random vector corpora") {
    // the angular-triangle bound must never drop a qualifying pair, for
    // ANY corpus/centroid/threshold combination — random-vector stress
    // beyond the clustered fixture in SimilaritySpec
    val vecGen = Gen.listOfN(80, Gen.listOfN(6, Gen.chooseNum(-50, 50).map(_ / 10.0)))
    (0 until 3).foreach { i =>
      val vs = vecGen.apply(Gen.Parameters.default, Seed(1000L + i)).get
        .zipWithIndex.collect { case (v, id) if v.exists(_ != 0.0) => (id.toLong, v) }
      val e = vs.toDF("vec_id", "v")
        .withColumn("nrm", sqrt(aggregate($"v", lit(0.0), (a, x) => a + x * x)))
        .localCheckpoint(true)
      val seeds = e.orderBy(xxhash64($"vec_id").asc, $"vec_id".asc).limit(5)
        .select($"vec_id".as("cid"), $"v".as("cv"), $"nrm".as("cnrm"))
      val cents = ext.Similarity.lloydIteration(
        ext.Similarity.assignCells(e, seeds)).localCheckpoint(true)
      val assigned = ext.Similarity.assignCells(e, cents).localCheckpoint(true)
      val threshold = 0.6 + 0.1 * i
      val blocked = ext.Similarity.thresholdPairs(assigned, cents, threshold)
        .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val x = e.select($"vec_id".as("a"), $"v".as("va"))
      val y = e.select($"vec_id".as("b"), $"v".as("vb"))
      val brute = x.crossJoin(y).filter($"a" < $"b")
        .withColumn("sim", graft.functions.VectorExpressions.cosineSim($"va", $"vb"))
        .filter($"sim" >= threshold)
        .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked == brute, s"seed ${1000 + i} t=$threshold")
    }
  }

  test("distributed positions equal sequential row numbering on random data") {
    datasets(4).foreach { data =>
      val df = data.toDF("k", "v", "s").dropDuplicates("k", "v", "s")
      val got = ops.Positions
        .withGlobalPosition(df, Seq($"k".asc, $"v".asc, $"s".asc), "pos")
        .orderBy($"pos")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      val want = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      assert(got == want)
    }
  }

  test("distributed running total equals sum(w) OVER (ORDER BY keys), nulls skipped") {
    import org.apache.spark.sql.functions.{col, expr, when}
    datasets(4).foreach { data =>
      val df = data.toDF("k", "v", "s").dropDuplicates("k", "v", "s")
        // weight derived from the row, with NULLs sprinkled in — SQL sum
        // semantics say a NULL weight leaves the running total unchanged
        .withColumn("w",
          when(col("v") % 7 === 0, expr("CAST(NULL AS BIGINT)"))
            .otherwise((col("v").cast("bigint") % 100 + 100)))
      val got = ops.Positions
        .withRunningTotal(df, Seq($"k".asc, $"v".asc, $"s".asc), "w", "rt")
        .select($"k", $"v", $"s", $"rt")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          if (r.isNullAt(3)) 0L else r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3))
      var acc = 0L
      val want = rows.map { case (k, v, s, w) => acc += w; (k, v, s, acc) }.toSeq
      assert(got == want)
    }
    // a non-BIGINT weight column is a call-time error, not a deep executor crash
    val bad = Seq((1L, 1, "a")).toDF("k", "w", "s")
    intercept[IllegalArgumentException] {
      ops.Positions.withRunningTotal(bad, Seq($"k".asc), "w", "rt")
    }
  }

  test("union counts add; intersect bounded by both") {
    val ds = datasets(8)
    ds.grouped(2).filter(_.size == 2).foreach { case Seq(d1, d2) =>
      val a = d1.toDF("k", "v", "s").select($"k")
      val b = d2.toDF("k", "v", "s").select($"k")
      assert(a.union(b).count() == a.count() + b.count())
      val i = a.intersect(b).count()
      assert(i <= a.distinct().count() && i <= b.distinct().count())
    }
  }

  test("chargeSum equals the decimal formulation bit-for-bit (random money)") {
    // the r5 high/low-split scaled-long sum must reproduce the decimal
    // chain it replaced EXACTLY (same exact rational, one double
    // rounding), on random 2-dp prices and rates and at any partitioning
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val gen = Gen.listOfN(400, Gen.zip(
      Gen.chooseNum(0L, 30L),                       // group key
      Gen.chooseNum(0L, 9999999L).map(_ / 100.0),   // price, 2dp
      Gen.chooseNum(0L, 99L).map(_ / 100.0),        // discount, 2dp
      Gen.chooseNum(0L, 99L).map(_ / 100.0)))       // tax, 2dp
    (0 until 4).foreach { i =>
      val data = gen.apply(Gen.Parameters.default, Seed(1234L + i)).get
      val df = data.toDF("k", "p", "d", "t").repartition(3 + i)
      val got = df.groupBy($"k")
        .agg(ops.Det.chargeSum($"p", $"d", $"t").as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = df.groupBy($"k")
        .agg(sum($"p".cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(4, 2)) - $"d".cast(DecimalType(4, 2))) *
            (lit(1).cast(DecimalType(4, 2)) + $"t".cast(DecimalType(4, 2))))
          .cast(DoubleType).as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == want) // == on doubles: BIT equality, no tolerance
    }
  }

  test("ScaledLong equals round() on random money at every scale used (property)") {
    // the r6 codegen'd HALF_UP replacement must agree with Spark's
    // BigDecimal-path round() on the fixed-dp envelope Det applies it to:
    // random 2-dp money up to 10^9, 2-dp rates, negatives included
    import org.apache.spark.sql.types.LongType
    val gen = Gen.listOfN(500, Gen.zip(
      Gen.chooseNum(-99999999999L, 99999999999L).map(_ / 100.0), // ±1e9 money
      Gen.chooseNum(-999L, 999L).map(_ / 100.0)))                // rates
    (0 until 4).foreach { i =>
      val data = gen.apply(Gen.Parameters.default, Seed(777L + i)).get
      val df = data.toDF("m", "r")
      Seq(("m", 2), ("m", 4), ("r", 2), ("r", 4)).foreach { case (c, s) =>
        val diff = df.select(
            graft.functions.ScaledLong(col(c), s).as("fast"),
            round(col(c) * math.pow(10, s)).cast(LongType).as("slow"))
          .filter($"fast" =!= $"slow" ||
            ($"fast".isNull !== $"slow".isNull)).count()
        assert(diff == 0, s"col=$c scale=$s seed=${777 + i}")
      }
    }
  }

  test("step slice with step 1 equals the plain slice for random bounds " +
       "(ties DuckSliceStep to the probed DuckSlice algebra)") {
    val gw = new graft.engine.SqlGateway(spark)
    val boundsGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(-8, 8), Gen.chooseNum(-8, 8)))
    val bounds = boundsGen.apply(Gen.Parameters.default, Seed(99L)).get
    bounds.foreach { case (b, e) =>
      val arr = "[10,20,30,40,50]"
      val stepped = gw.query(s"SELECT $arr[$b:$e:1] AS s").values.head.head
      val plain = gw.query(s"SELECT $arr[$b:$e] AS s").values.head.head
      assert(stepped == plain, s"[$b:$e:1] = $stepped vs [$b:$e] = $plain")
    }
    // and step -1 from swapped resolved bounds reverses a forward slice
    // over all-positive in-range bounds (probed: [4:2:-1] = rev([2:4]))
    Seq((1, 3), (2, 5), (3, 3), (5, 1)).foreach { case (b, e) =>
      val arr = "[10,20,30,40,50]"
      val fwd = gw.query(s"SELECT $arr[$e:$b:-1] AS s").values.head.head
      val rev = gw.query(s"SELECT reverse($arr[$b:$e]) AS s").values.head.head
      assert(fwd == rev, s"[$e:$b:-1] = $fwd vs reverse([$b:$e]) = $rev")
    }
  }

  test("connected components of an empty pair list is empty (no iteration blow-up)") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    assert(ext.Dedup.connectedComponents(empty).count() == 0)
  }
}
