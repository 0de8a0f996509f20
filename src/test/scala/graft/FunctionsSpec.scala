package graft

import org.apache.spark.sql.functions._
import graft.core.Constants._
import graft.functions.{Growth, Units}

class UnitsSpec extends SparkSpec {
  import spark.implicits._

  test("energy conversion any→any via base-unit factors") {
    val df = Seq(
      (1.0, "MWh", "kWh", 1000.0),
      (2.0, "GWh", "MWh", 2000.0),
      (1.0, "kWh", "kWh", 1.0),
      (1.0, "TWh", "GWh", 1000.0))
      .toDF(ValueColumn, "from_u", "to_u", "expected")
    val out = df.withColumn("got", Units.convertEnergy(col(ValueColumn), col("from_u"), col("to_u")))
    assert(out.filter(abs(col("got") - col("expected")) > 1e-9).count() == 0)
  }

  test("unknown unit yields null, same-unit short-circuits") {
    val df = Seq((1.0, "furlongs", "kWh")).toDF(ValueColumn, "from_u", "to_u")
    val out = df.withColumn("got", Units.convertEnergy(col(ValueColumn), col("from_u"), col("to_u")))
    assert(out.select("got").collect().head.isNullAt(0))
    val same = Seq((7.0, "weird", "weird")).toDF(ValueColumn, "from_u", "to_u")
      .withColumn("got", Units.convertEnergy(col(ValueColumn), col("from_u"), col("to_u")))
    assert(same.select("got").as[Double].head() == 7.0)
  }

  test("convertUnits orchestration joins unit from metric records") {
    val fact = Seq(("elec", 1.0), ("gas", 1.0)).toDF("metric", ValueColumn)
    val records = Seq(("elec", "MWh"), ("gas", "kWh")).toDF("id", "unit")
    val out = Units.convertUnits(fact, "metric", records, "kWh")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out == Map("elec" -> 1000.0, "gas" -> 1.0))
  }

  test("power family") {
    val df = Seq((3.0, "GW", "MW")).toDF(ValueColumn, "f", "t")
      .withColumn("got", Units.convertPower(col(ValueColumn), col("f"), col("t")))
    assert(df.select("got").as[Double].head() == 3000.0)
  }

  test("exponential growth (1+r)^(year-base)") {
    val init = Seq(("2022", 100.0)).toDF("model_year", ValueColumn)
    val rates = Seq(("2022", 0.5)).toDF("model_year", ValueColumn)
    val out = Growth.applyExponentialGrowthRate(init, rates, Seq("model_year"), "model_year", 2020)
    assert(math.abs(out.select(ValueColumn).as[Double].head() - 225.0) < 1e-9)
  }

  test("annual multiplier") {
    val init = Seq(("a", 10.0), ("b", 20.0)).toDF("k", ValueColumn)
    val mult = Seq(("a", 2.0), ("b", 0.5)).toDF("k", ValueColumn)
    val out = Growth.applyAnnualMultiplier(init, mult, Seq("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out == Map("a" -> 20.0, "b" -> 10.0))
  }
}
