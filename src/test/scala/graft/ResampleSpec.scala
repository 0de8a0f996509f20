package graft

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Poisson-bootstrap contracts: the weight column replays the documented
  * hash-threshold draw exactly, replicate aggregates are deterministic and
  * partitioning-invariant, the weight distribution is Poisson(1)-shaped,
  * the CI band is ordered and brackets the point estimate on well-behaved
  * data, and the rank arguments refuse out of range. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("weights replay the hash-threshold draw and are Poisson(1)-shaped") {
    val n = 20000
    val df = viaParquet((1 to n).map(_.toLong).toDF("id"))
    val w = df.select(Resample.poissonWeight(col("id"), rep = 3, maxReps = 64).as("w"))
      .groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // P(0) = P(1) = 1/e ~ 0.3679; P(2) ~ 0.1839; tails thin fast
    assert(math.abs(w.getOrElse(0L, 0L) - n * 0.3679) < n * 0.02)
    assert(math.abs(w.getOrElse(1L, 0L) - n * 0.3679) < n * 0.02)
    assert(math.abs(w.getOrElse(2L, 0L) - n * 0.1839) < n * 0.02)
    assert(w.keySet.subsetOf(Set(0L, 1L, 2L, 3L, 4L, 5L)))
    // a different rep index draws a different (still deterministic) sample
    val w2 = df.select(Resample.poissonWeight(col("id"), rep = 4, maxReps = 64).as("w"))
    val agree = df.select(Resample.poissonWeight(col("id"), 3, 64).as("a"))
      .collect().map(_.getLong(0)).toSeq
    val agree2 = df.select(Resample.poissonWeight(col("id"), 3, 64).as("a"))
      .collect().map(_.getLong(0)).toSeq
    assert(agree == agree2) // bit-identical rerun
    assert(w2.collect().map(_.getLong(0)).toSeq != agree) // rep changes the draw
  }

  test("replicate aggregates: exact count/sum per replicate, partitioning-invariant") {
    val rows = (1 to 500).map(i => ("g", i.toLong, (i % 17).toLong))
    val df = viaParquet(rows.toDF("g", "id", "v"))
    val a = sortedRows(Resample.bootstrapReplicates(df.repartition(1), "id", "v", 8, Seq("g")))
    val b = sortedRows(Resample.bootstrapReplicates(df.repartition(9), "id", "v", 8, Seq("g")))
    assert(a == b)
    assert(a.size == 8)
    // the stack/agg plumbing: replicate 0's (count, sum) equals a direct
    // one-pass aggregate of the weight column (the draw itself is pinned
    // by the distribution test above and the q326 oracle replay)
    val direct = df.select(col("v"), Resample.poissonWeight(col("id"), 0, 8).as("w"))
      .agg(sum(col("w")), sum(col("w") * col("v"))).head()
    val rep0 = a.find(_(1) == 0L).get
    assert(rep0(2) == direct.getLong(0) && rep0(3) == direct.getLong(1))
  }

  test("bootstrapMeanCi: ordered band bracketing the point estimate") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 4000).map(i => ("g", i.toLong, (50 + rnd.nextInt(21)).toLong))
    val df = viaParquet(rows.toDF("g", "id", "v"))
    val r = Resample.bootstrapMeanCi(df, "id", "v", reps = 64,
      loRank = 2, hiRank = 63, groupCols = Seq("g")).collect()(0)
    val (mean, lo, hi) = (r.getAs[Long]("mean_ppm"), r.getAs[Long]("lo_ppm"),
      r.getAs[Long]("hi_ppm"))
    assert(lo < hi)
    assert(lo <= mean && mean <= hi)
    // uniform(50..70): the 95% band of the mean at n=4000 is tight (~±0.2)
    assert(hi - lo < 2000000L, s"band implausibly wide: $lo..$hi")
  }

  test("refusals") {
    val df = Seq(("g", 1L, 2L)).toDF("g", "id", "v")
    assertThrows[IllegalArgumentException] {
      Resample.bootstrapReplicates(df, "id", "v", reps = 1, Seq("g"))
    }
    assertThrows[IllegalArgumentException] {
      Resample.bootstrapMeanCi(df, "id", "v", reps = 8, loRank = 5, hiRank = 5, Seq("g"))
    }
    assertThrows[IllegalArgumentException] {
      Resample.bootstrapMeanCi(df, "id", "v", reps = 8, loRank = 0, hiRank = 8, Seq("g"))
    }
  }

  test("bootstrapRatioCi: correlated resampling, ordered band, hand replay of one replicate") {
    val rnd = new scala.util.Random(43)
    // ~30% of value mass above the threshold
    val rows = (1 to 3000).map { i =>
      val v = 10L + rnd.nextInt(100)
      ("g", i.toLong, if (v > 80) v else 0L, v)
    }
    val df = viaParquet(rows.toDF("g", "id", "num", "den"))
    val r = Resample.bootstrapRatioCi(df, "id", "num", "den", reps = 32,
      loRank = 1, hiRank = 32, groupCols = Seq("g")).collect()(0)
    val (ratio, lo, hi) = (r.getAs[Long]("ratio_ppm"), r.getAs[Long]("lo_ppm"),
      r.getAs[Long]("hi_ppm"))
    assert(lo < hi && lo <= ratio && ratio <= hi)
    val exact = rows.map(_._3).sum * 1000000L / rows.map(_._4).sum
    assert(ratio == exact)
    // the true ratio is ~0.55-0.65 of mass; a 3000-row bootstrap band is tight
    assert(hi - lo < 100000L, s"band implausibly wide: $lo..$hi")
    assertThrows[IllegalArgumentException] {
      Resample.bootstrapRatioCi(df, "id", "num", "den", reps = 1, 1, 1, Seq("g"))
    }
  }
}
