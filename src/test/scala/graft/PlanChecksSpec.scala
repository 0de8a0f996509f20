package graft

import org.apache.spark.sql.functions._
import graft.core.Constants._
import graft.operators.{DimensionFilter, MappingKernel}
import graft.plans.PlanChecks

/** Plan-quality contracts: these assert the physical properties the 100 TB
  * design depends on, so a regression that silently adds a shuffle or stops
  * a pushdown fails CI, not a cluster run. */
class PlanChecksSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("filter ADT predicates push into the parquet scan") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = DimensionFilter.applyAll(li, Seq(
      DimensionFilter.ExpressionFilter("l_quantity", ">", 30),
      DimensionFilter.BetweenFilter("l_discount", 0.02, 0.08)))
    assert(PlanChecks.filterPushedFor(out, "l_quantity"))
    assert(PlanChecks.filterPushedFor(out, "l_discount"))
  }

  test("column selection prunes the scan schema") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_quantity")
    li.collect()
    val cols = PlanChecks.scanColumns(li)
    assert(cols.nonEmpty && cols.head.toSet == Set("l_returnflag", "l_quantity"))
  }

  test("mapping kernel: N mappings broadcast, exactly one shuffle to collapse") {
    val fact = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_nationkey").cast("string").as("geography"), col("c_acctbal").as(ValueColumn))
    val m1 = Seq(("0", "A", 1.0), ("1", "A", 1.0), ("2", "B", 1.0)).toDF(FromIdColumn, ToIdColumn, FromFractionColumn)
    val m2 = Seq(("A", "X", 0.5), ("B", "X", 0.5)).toDF(FromIdColumn, ToIdColumn, FromFractionColumn)
    val out = MappingKernel.mapAndApply(fact, Seq("geography" -> m1, "geography" -> m2))
    out.collect() // materialize so AQE settles the final plan
    assert(PlanChecks.broadcastJoinCount(out) == 2)
    assert(PlanChecks.shuffleCount(out) == 1)
  }

  test("multi-table star join broadcasts the dimension tables") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val r = spark.read.parquet(s"$sf/region.parquet")
    val out = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name").agg(sum("c_acctbal"))
    out.collect()
    assert(PlanChecks.broadcastJoinCount(out) == 2)
    assert(PlanChecks.shuffleCount(out) == 1) // the groupBy only
  }
}
