package graft

import org.apache.spark.sql.functions._
import graft.core.Constants._
import graft.operators.MappingKernel

class MappingKernelSpec extends SparkSpec {
  import spark.implicits._

  private def fact =
    Seq(("c1", 10.0), ("c2", 20.0), ("c3", 30.0)).toDF("geography", ValueColumn)

  private def aggMapping = // c1,c2 -> s1 ; c3 -> s2 (many-to-one, fraction 1)
    Seq(("c1", "s1", 1.0), ("c2", "s1", 1.0), ("c3", "s2", 1.0))
      .toDF(FromIdColumn, ToIdColumn, FromFractionColumn)

  private def disaggMapping = // s1 -> a/b at 0.25/0.75
    Seq(("s1", "a", 0.25), ("s1", "b", 0.75), ("s2", "a", 1.0))
      .toDF(FromIdColumn, ToIdColumn, FromFractionColumn)

  test("mapStackedDimension renames to_id and accumulates fraction") {
    val mapped = MappingKernel.mapStackedDimension(fact, "geography", aggMapping)
    assert(mapped.columns.toSet == Set("geography", ValueColumn, FractionColumn))
    val out = mapped.collect().map(r => (r.getAs[String]("geography"), r.getAs[Double](ValueColumn))).toSet
    assert(out == Set(("s1", 10.0), ("s1", 20.0), ("s2", 30.0)))
  }

  test("applyFraction collapses with sum(value*fraction)") {
    val out = MappingKernel
      .mapAndApply(fact, Seq("geography" -> aggMapping, "geography" -> disaggMapping))
      .collect()
      .map(r => (r.getAs[String]("geography"), r.getAs[Double](ValueColumn)))
      .toMap
    // s1 total 30 -> a 7.5, b 22.5 ; s2 total 30 -> a 30
    assert(math.abs(out("a") - 37.5) < 1e-9)
    assert(math.abs(out("b") - 22.5) < 1e-9)
  }

  test("null to_id rows are dropped") {
    val m = Seq(("c1", Some("x"), 1.0), ("c2", None, 1.0))
      .toDF(FromIdColumn, ToIdColumn, FromFractionColumn)
    val mapped = MappingKernel.mapStackedDimension(fact, "geography", m)
    assert(mapped.select("geography").as[String].collect().toSet == Set("x"))
  }

  test("noop mapping detection skips identity mappings") {
    val noop = Seq(("c1", "c1", 1.0), ("c2", "c2", 1.0))
      .toDF(FromIdColumn, ToIdColumn, FromFractionColumn)
    assert(MappingKernel.isNoopMapping(noop))
    assert(!MappingKernel.isNoopMapping(aggMapping))
    val out = MappingKernel.mapDimensions(fact, Seq("geography" -> noop))
    assert(out.columns.sameElements(fact.columns)) // untouched
  }

  test("scaling factor multiplies when non-null, passes through when null") {
    val df = Seq(("a", 10.0, Some(2.0)), ("b", 10.0, None))
      .toDF("k", ValueColumn, ScalingFactorColumn)
    val out = MappingKernel.applyScalingFactor(df)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Double](ValueColumn))).toMap
    assert(out == Map("a" -> 20.0, "b" -> 10.0))
  }

  test("joinLookup joins two-table layout on id and drops it") {
    val ld = Seq((1, 5.0), (2, 7.0)).toDF("id", ValueColumn)
    val lk = Seq((1, "com"), (2, "res")).toDF("id", "sector")
    val out = MappingKernel.joinLookup(ld, lk)
    assert(out.columns.toSet == Set(ValueColumn, "sector"))
    assert(out.count() == 2)
  }

  test("skew repartition hook preserves rows and spreads partitions") {
    val skewed = spark.range(1000).toDF("id")
      .withColumn("geography", lit("hot_key")) // everything on one key
      .withColumn(ValueColumn, col("id").cast("double"))
    val out = MappingKernel.repartitionAfterDisaggregation(skewed, 8, Seq("geography"))
    assert(out.count() == 1000)
    assert(out.rdd.getNumPartitions == 8)
    // the salt must actually spread the hot key across partitions
    val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.count(_ > 0) > 1)
  }

  test("idsToNames replaces ids with record names") {
    val recs = Seq(("c1", "County 1"), ("c2", "County 2"), ("c3", "County 3")).toDF("id", "name")
    val out = MappingKernel.idsToNames(fact, "geography", recs)
    assert(out.select("geography").as[String].collect().toSet ==
      Set("County 1", "County 2", "County 3"))
  }
}
