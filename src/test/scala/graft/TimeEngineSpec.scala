package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.core.Constants._
import graft.time._

class TimeEngineSpec extends SparkSpec {
  import spark.implicits._

  test("spine generates inclusive range at interval") {
    val s = TimeSpine.spine(spark, "2024-01-01 00:00:00", "2024-01-01 03:00:00", 3600L)
    assert(s.count() == 4)
    assert(TimeSpine.yearHourlySpine(spark, 2024).count() == 8784) // leap year
    assert(TimeSpine.stepsInYear(2023, 3600L) == 8760)
  }

  test("annualToDatetime preserves yearly totals for TOTAL measurements") {
    val annual = Seq(("g1", "2023", 8760.0), ("g2", "2024", 8784.0))
      .toDF("geography", "model_year", ValueColumn)
    val out = AnnualTime.annualToDatetime(annual, "model_year")
    val perRow = out.groupBy("model_year")
      .agg(count(lit(1)).as("n"), sum(ValueColumn).as("total"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(perRow("2023")._1 == 8760 && math.abs(perRow("2023")._2 - 8760.0) < 1e-6)
    assert(perRow("2024")._1 == 8784 && math.abs(perRow("2024")._2 - 8784.0) < 1e-6)
  }

  test("indexToDatetime computes per-tz UTC timestamps") {
    val df = Seq((0L, "America/New_York"), (1L, "UTC")).toDF("time_index", TimeZoneColumn)
    val out = IndexTime.indexToDatetime(df, "time_index", "2024-01-01 00:00:00", 3600L)
    val got = out.select(col(TimeZoneColumn), col("timestamp").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // NY local midnight = 05:00 UTC (EST); UTC index 1 = 01:00
    assert(got("America/New_York") == "2024-01-01 05:00:00")
    assert(got("UTC") == "2024-01-01 01:00:00")
  }

  test("representative-period expansion fills matching local hours") {
    // template: month=1, every day-of-week, hour=0..23 would be 7×24 rows;
    // use one cell: Jan, Monday (dow=0), hour 5
    val template = Seq(("g1", 1, 0, 5, 42.0))
      .toDF("geography", "month", "day_of_week", "hour", ValueColumn)
    val spine = TimeSpine.spine(spark, "2024-01-01 00:00:00", "2024-01-31 23:00:00", 3600L)
    val tzs = Seq(("g1", "UTC")).toDF("id", "time_zone")
    val out = RepresentativePeriodTime.oneWeekPerMonthByHour(template, spine, "geography", tzs)
    // Jan 2024 has five Mondays (1,8,15,22,29) → 5 rows at hour 5
    assert(out.count() == 5)
    assert(out.select(hour(col("timestamp"))).distinct().as[Int].head() == 5)
  }

  test("weekday/weekend representative expansion") {
    val template = Seq(("g1", 1, true, 12, 1.0), ("g1", 1, false, 12, 2.0))
      .toDF("geography", "month", "is_weekday", "hour", ValueColumn)
    val spine = TimeSpine.spine(spark, "2024-01-01 00:00:00", "2024-01-07 23:00:00", 3600L)
    val tzs = Seq(("g1", "UTC")).toDF("id", "time_zone")
    val out = RepresentativePeriodTime.weekdayWeekendPerMonthByHour(template, spine, "geography", tzs)
    // Jan 1-7 2024: Mon-Fri ×1 at hour 12 (5 rows of 1.0), Sat+Sun (2 rows of 2.0)
    val sums = out.groupBy(ValueColumn).count().collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toMap
    assert(sums == Map(1.0 -> 5L, 2.0 -> 2L))
  }

  test("single-zone and per-geography tz conversion") {
    val df = Seq(("g1", Timestamp.valueOf("2024-06-01 12:00:00")))
      .toDF("geography", "timestamp")
    val single = TimeZones.toSingleZone(df, "timestamp", "America/Denver")
    assert(single.select(col("timestamp").cast("string")).as[String].head() == "2024-06-01 06:00:00")
    val recs = Seq(("g1", "America/New_York")).toDF("id", "time_zone")
    val per = TimeZones.toGeographyLocal(df, "timestamp", "geography", recs)
    assert(per.select(col("timestamp").cast("string")).as[String].head() == "2024-06-01 08:00:00")
  }

  test("per-geography tz conversion fails fast on an uncovered geography id") {
    val df = Seq(
      ("g1", Timestamp.valueOf("2024-06-01 12:00:00")),
      ("g2", Timestamp.valueOf("2024-06-01 12:00:00"))) // no record
      .toDF("geography", "timestamp")
    val recs = Seq(("g1", "America/New_York")).toDF("id", "time_zone")
    val e = intercept[Exception] {
      TimeZones.toGeographyLocal(df, "timestamp", "geography", recs).collect()
    }
    assert(e.getMessage.contains("g2"))
    // a present record with a NULL time_zone must also fail, not convert to UTC
    val nullTz = Seq(("g1", "America/New_York"), ("g2", null.asInstanceOf[String]))
      .toDF("id", "time_zone")
    val e2 = intercept[Exception] {
      TimeZones.toGeographyLocal(df, "timestamp", "geography", nullTz).collect()
    }
    assert(e2.getMessage.contains("g2"))
  }

  test("external-tz localization (naive→UTC) inverts the UTC→local conversions") {
    val df = Seq(
      ("g1", Timestamp.valueOf("2024-06-01 12:00:00")),
      ("g2", Timestamp.valueOf("2024-06-01 12:00:00")))
      .toDF("geography", "timestamp")
    val recs = Seq(("g1", "America/New_York"), ("g2", "Asia/Tokyo")).toDF("id", "time_zone")
    // per-geography: local → UTC → local must round-trip exactly
    val utc = TimeZones.geographyLocalToUtc(df, "timestamp", "geography", recs)
    assert(utc.orderBy("geography").select(col("timestamp").cast("string")).as[String].collect().toSeq ==
      Seq("2024-06-01 16:00:00", "2024-06-01 03:00:00"))
    assert(!utc.columns.contains("time_zone"), "external tz is consumed, not carried")
    val roundTrip = TimeZones.toGeographyLocal(utc, "timestamp", "geography", recs)
    assert(roundTrip.orderBy("geography").select(col("timestamp").cast("string")).as[String].collect().toSeq ==
      Seq("2024-06-01 12:00:00", "2024-06-01 12:00:00"))
    // tz-column and single-zone forms
    val withTz = df.withColumn("tz", lit("America/Denver"))
    assert(TimeZones.localToUtc(withTz, "timestamp", "tz")
      .select(col("timestamp").cast("string")).as[String].head() == "2024-06-01 18:00:00")
    assert(TimeZones.alignedToUtc(df, "timestamp", "America/Denver")
      .select(col("timestamp").cast("string")).as[String].head() == "2024-06-01 18:00:00")
    // uncovered geography fails fast, same contract as toGeographyLocal
    val e = intercept[Exception] {
      TimeZones.geographyLocalToUtc(df, "timestamp", "geography",
        Seq(("g1", "America/New_York")).toDF("id", "time_zone")).collect()
    }
    assert(e.getMessage.contains("g2"))
  }

  test("leap-day adjustments drop the right days") {
    val df = Seq("2024-02-28 10:00:00", "2024-02-29 10:00:00", "2024-12-31 10:00:00", "2024-01-01 10:00:00")
      .map(Timestamp.valueOf).toDF("ts")
    assert(TimeAdjustments.adjustLeapDay(df, "ts", TimeAdjustments.DropFeb29).count() == 3)
    assert(TimeAdjustments.adjustLeapDay(df, "ts", TimeAdjustments.DropDec31).count() == 3)
    assert(TimeAdjustments.adjustLeapDay(df, "ts", TimeAdjustments.DropJan1).count() == 3)
  }

  test("DST: spring-forward hour dropped, fall-back hour duplicated") {
    // US 2024: spring forward Mar 10 02:00 (NY), fall back Nov 3 01:00
    val df = Seq(
      ("2024-03-10 02:30:00", "America/New_York"), // nonexistent
      ("2024-03-10 03:30:00", "America/New_York"), // fine
      ("2024-11-03 01:30:00", "America/New_York"), // ambiguous
      ("2024-11-03 03:30:00", "America/New_York"))
      .map { case (t, z) => (Timestamp.valueOf(t), z) }.toDF("ts", "tz")
    assert(TimeAdjustments.dropSpringForwardHour(df, "ts", "tz").count() == 3)
    assert(TimeAdjustments.duplicateFallBackHour(df, "ts", "tz").count() == 5)
  }

  test("interval arithmetic and fall-back interpolation") {
    val df = Seq("2024-01-01 00:00:00").map(Timestamp.valueOf).toDF("ts")
    val shifted = df.select(TimeAdjustments.addInterval(col("ts"), 90, "MINUTE").cast("string"))
      .as[String].head()
    assert(shifted == "2024-01-01 01:30:00")
    intercept[IllegalArgumentException](TimeAdjustments.addInterval(col("ts"), 1, "FORTNIGHT"))

    // fall-back 2024-11-03 01:30 NY is ambiguous; the measured value stays on
    // the existing row and only the ADDED duplicate carries mean(prev, next)
    val series = Seq(
      ("g", "2024-11-03 00:30:00", 10.0),
      ("g", "2024-11-03 01:30:00", 99.0),
      ("g", "2024-11-03 02:30:00", 30.0))
      .map { case (g, t, v) => (g, Timestamp.valueOf(t), v, "America/New_York") }
      .toDF("g", "ts", "value", "tz")
    val out = TimeAdjustments.interpolateFallBackHour(series, "ts", "tz", "value", Seq("g"))
    assert(out.count() == 4)
    val dupVals = out.filter(hour(col("ts")) === 1).select("value").as[Double].collect().toSeq.sorted
    assert(dupVals == Seq(20.0, 99.0))
  }

  test("batch sessionization: dense per-key session ids and session stats") {
    val events = Seq(
      ("u1", "2024-01-01 10:00:00"),
      ("u1", "2024-01-01 10:20:00"), // same session
      ("u1", "2024-01-01 11:30:00"), // new session (70 min gap)
      ("u2", "2024-01-01 09:00:00"))
      .map { case (u, t) => (u, Timestamp.valueOf(t)) }.toDF("user_id", "ts")
    val assigned = Sessionize.assignSessions(events, "ts", 1800L, Seq("user_id"))
    val ids = assigned.orderBy("user_id", "ts")
      .select("user_id", "session_id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ids == Seq(("u1", 1L), ("u1", 1L), ("u1", 2L), ("u2", 1L)))
    val stats = Sessionize.sessionStats(events, "ts", 1800L, Seq("user_id"))
      .orderBy("user_id", "session_id")
      .select("n_events", "duration_sec").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stats == Seq((2L, 1200.0), (1L, 0.0), (1L, 0.0)))
  }

  test("resample: downsample by measurement type, upsample preserves totals, wrap-around") {
    val hourly = Seq(
      ("g", "2024-01-01 00:00:00", 1.0),
      ("g", "2024-01-01 01:00:00", 3.0),
      ("g", "2024-01-02 00:00:00", 10.0))
      .map { case (g, t, v) => (g, Timestamp.valueOf(t), v) }.toDF("g", "ts", "value")
    val dailyTotal = Resample.downsample(hourly, "ts", 86400L, "total", Seq("g"))
      .orderBy("ts").select("value").as[Double].collect().toSeq
    assert(dailyTotal == Seq(4.0, 10.0))
    val dailyMax = Resample.downsample(hourly, "ts", 86400L, "max", Seq("g"))
      .orderBy("ts").select("value").as[Double].collect().toSeq
    assert(dailyMax == Seq(3.0, 10.0))

    val daily = Seq(("g", Timestamp.valueOf("2024-01-01 00:00:00"), 24.0)).toDF("g", "ts", "value")
    val up = Resample.upsample(daily, "ts", 86400L, 3600L, "total")
    assert(up.count() == 24)
    assert(up.agg(sum("value")).first().getDouble(0) == 24.0)
    val upMean = Resample.upsample(daily, "ts", 86400L, 3600L, "mean")
    assert(upMean.select("value").distinct().as[Double].head() == 24.0)

    // wrap: a stamp one hour past the range end wraps to the range start hour
    val over = Seq(Timestamp.valueOf("2025-01-01 01:00:00")).toDF("ts")
    val wrapped = Resample.wrapTime(over, "ts", "2024-01-01 00:00:00", "2025-01-01 00:00:00")
      .select(col("ts").cast("string")).as[String].head()
    assert(wrapped == "2024-01-01 01:00:00")
  }

  test("time consistency checks") {
    val spine = TimeSpine.spine(spark, "2024-01-01 00:00:00", "2024-01-01 02:00:00", 3600L)
    val good = spine.withColumn("g", lit("a")).withColumnRenamed("timestamp", "ts")
    assert(TimeChecks.timestampsMatchSpine(good, "ts", spine))
    assert(TimeChecks.equalTimeArrayLengths(good, Seq("g")))
    val bad = good.limit(2)
    assert(!TimeChecks.timestampsMatchSpine(bad, "ts", spine))
  }

  test("fused consistency report agrees with the boolean checks in true and false cases") {
    val spine = TimeSpine.spine(spark, "2024-01-01 00:00:00", "2024-01-01 03:00:00", 3600L)
    val good = spine.withColumn("g", lit("a")).withColumnRenamed("timestamp", "ts")
      .unionByName(spine.withColumn("g", lit("b")).withColumnRenamed("timestamp", "ts"))
    // spineFromBounds rebuilds the spine from the data's own min/max lazily
    val goodRow = TimeChecks.report(
      TimeChecks.timestampsMatchSpineCheck(
        good, "ts", TimeChecks.spineFromBounds(good, "ts", 3600L), "spine_ok"),
      TimeChecks.equalTimeArrayLengthsCheck(good, Seq("g"), "equal_counts")).head()
    assert((goodRow.getLong(0), goodRow.getLong(1)) == ((1L, 1L)))
    // drop one row of group b: a spine hole AND unequal group counts
    val bad = good.filter(!(col("g") === "b" && hour(col("ts")) === 2))
    val badRow = TimeChecks.report(
      TimeChecks.timestampsMatchSpineCheck(bad, "ts", spine, "spine_ok"),
      TimeChecks.equalTimeArrayLengthsCheck(bad, Seq("g"), "equal_counts")).head()
    // the hole is per-group, so DISTINCT timestamps still cover the spine —
    // but the group counts diverge; a truncated frame misses the spine too
    assert((badRow.getLong(0), badRow.getLong(1)) == ((1L, 0L)))
    val truncated = TimeChecks.timestampsMatchSpineCheck(
      good.filter(hour(col("ts")) < 2), "ts", spine, "spine_ok").head().getLong(0)
    assert(truncated == 0L)
    // agreement with the boolean forms on the same inputs
    assert(TimeChecks.timestampsMatchSpine(bad, "ts", spine))
    assert(!TimeChecks.equalTimeArrayLengths(bad, Seq("g")))
  }
}
