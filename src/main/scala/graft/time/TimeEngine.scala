package graft.time

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Constants.{TimeZoneColumn, ValueColumn}

/** Time-spine generation: distributed, via `sequence` + `explode` — no
  * driver-side loops, so a century of hourly timestamps is still one row
  * exploded on an executor (ref semantics: chronify spine building used at
  * dsgrid/utils/dataset.py:326-356). */
object TimeSpine {

  /** Hourly (or any interval) timestamp spine [start, end] inclusive. */
  def spine(spark: SparkSession, start: String, end: String, intervalSeconds: Long): DataFrame =
    spark
      .range(1)
      .select(
        explode(
          sequence(
            to_timestamp(lit(start)),
            to_timestamp(lit(end)),
            expr(s"INTERVAL $intervalSeconds SECONDS"))).as("timestamp"))

  /** Full-year hourly spine for a given year (period-beginning convention:
    * first stamp Jan 1 00:00, last Dec 31 23:00). */
  def yearHourlySpine(spark: SparkSession, year: Int): DataFrame =
    spine(spark, s"$year-01-01 00:00:00", s"$year-12-31 23:00:00", 3600L)

  /** Number of interval steps in a year (for ANNUAL total→rate division). */
  def stepsInYear(year: Int, intervalSeconds: Long): Long = {
    val leap = java.time.Year.of(year).isLeap
    (if (leap) 366L else 365L) * 24 * 3600 / intervalSeconds
  }
}

/** Annual time → datetime: cross-join each annual row with the year's
  * timestamp spine; for TOTAL measurements divide the value by the number of
  * steps so the sum over the year is preserved
  * (ref: dsgrid/config/annual_time_dimension_config.py:152-194). */
object AnnualTime {

  /** `df` has a string/int year column; returns df × hourly spine of each
    * year present. The spine is built per distinct year then joined on year —
    * a broadcast join against at most a few hundred year rows, not a
    * crossJoin of the whole fact table. */
  def annualToDatetime(
      df: DataFrame,
      yearColumn: String,
      intervalSeconds: Long = 3600L,
      valueIsTotal: Boolean = true,
      valueColumn: String = ValueColumn,
      timestampColumn: String = "timestamp"): DataFrame = {
    val spark = df.sparkSession
    val years = df.select(col(yearColumn).cast("int").as("__graft_year")).distinct()
    val spine = years
      .select(
        col("__graft_year"),
        explode(
          sequence(
            to_timestamp(format_string("%d-01-01 00:00:00", col("__graft_year"))),
            to_timestamp(format_string("%d-12-31 23:59:59", col("__graft_year"))),
            expr(s"INTERVAL $intervalSeconds SECONDS"))).as(timestampColumn))
    val joined = df.join(
      broadcast(spine),
      df(yearColumn).cast("int") === spine("__graft_year"),
      "inner")
    val out =
      if (valueIsTotal) {
        val steps =
          (when(
            (col("__graft_year") % 4 === 0 && col("__graft_year") % 100 =!= 0) || col("__graft_year") % 400 === 0,
            lit(366L)).otherwise(lit(365L)) * 24L * 3600L) / lit(intervalSeconds)
        joined.withColumn(valueColumn, col(valueColumn) / steps)
      } else joined
    out.drop("__graft_year")
  }
}

/** Index time → datetime: integer index + per-geography time zone →
  * timestamps (ref: dsgrid/config/index_time_dimension_config.py:17-81).
  * The index counts interval steps from a local-clock start in the row's
  * time zone; `to_utc_timestamp` interprets the local stamp per-row. */
object IndexTime {
  def indexToDatetime(
      df: DataFrame,
      indexColumn: String,
      startTimestamp: String, // local wall-clock start, e.g. "2018-01-01 00:00:00"
      intervalSeconds: Long,
      timeZoneColumn: String = TimeZoneColumn,
      timestampColumn: String = "timestamp"): DataFrame = {
    val localTs = timestamp_seconds(
      unix_timestamp(to_timestamp(lit(startTimestamp))) +
        col(indexColumn).cast("long") * lit(intervalSeconds))
    df.withColumn(timestampColumn, to_utc_timestamp(localTs, col(timeZoneColumn)))
      .drop(indexColumn)
  }
}

/** Representative-period → datetime: a (month, day_of_week, hour) or
  * (month, is_weekday, hour) template joined onto a full-year spine whose
  * keys are computed in each geography's local time zone
  * (ref: dsgrid/config/representative_period_time_dimension_config.py:20-190). */
object RepresentativePeriodTime {

  /** Distinct time zones of the geography→tz mapping. When the mapping has
    * optimized down to a LocalRelation (the common case: a small
    * createDataFrame frame), the distinct runs DRIVER-SIDE and the result
    * stays a local relation — zero Spark jobs, and every downstream
    * broadcast of it builds job-free on the driver. That removes the
    * whole distinct-shuffle + broadcast-build stage pair that dominated
    * this operator's wall clock (it is scheduler floor, not data). Scan-
    * backed mappings keep the distributed distinct: the tz set is bounded
    * (~600 IANA zones) but the input may be billions of rows. */
  private def distinctTimeZones(geoTimeZones: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val sel = geoTimeZones.select(col("time_zone").as("__graft_tz"))
    sel.queryExecution.optimizedPlan match {
      case lr: LocalRelation if lr.data.length <= 100000 =>
        val spark = geoTimeZones.sparkSession
        import spark.implicits._
        lr.data
          .map(r => if (r.isNullAt(0)) null else r.getUTF8String(0).toString)
          .distinct.toSeq.toDF("__graft_tz")
      case _ => sel.distinct()
    }
  }

  /** Expand ONE_WEEK_PER_MONTH_BY_HOUR data: join template rows to the spine
    * on (month, day_of_week, hour) computed from the spine timestamp in the
    * row's local tz. `spine` must have a `timestamp` column (UTC);
    * `geoTimeZones` maps geography id → tz name (columns: id, time_zone). */
  def oneWeekPerMonthByHour(
      df: DataFrame,
      spine: DataFrame,
      geographyColumn: String,
      geoTimeZones: DataFrame,
      monthColumn: String = "month",
      dowColumn: String = "day_of_week",
      hourColumn: String = "hour",
      timestampColumn: String = "timestamp"): DataFrame = {
    val tz = broadcast(geoTimeZones.select(col("id").as("__graft_geo_id"), col("time_zone").as("__graft_tz")))
    val withTz = df.join(tz, df(geographyColumn) === col("__graft_geo_id"), "inner").drop("__graft_geo_id")
    // spine × tz-distinct: compute local (month, dow 0=Mon..6=Sun, hour) once
    // per tz. The tz set comes from the mapping (a superset of the joined
    // frame's zones is harmless — the final inner join filters it) so that
    // local mappings keep the whole build exchange-free.
    val tzs = distinctTimeZones(geoTimeZones)
    val localSpine = spine
      .crossJoin(broadcast(tzs))
      .withColumn("__graft_local", from_utc_timestamp(col(timestampColumn), col("__graft_tz")))
      .select(
        col(timestampColumn),
        col("__graft_tz"),
        month(col("__graft_local")).as("__graft_month"),
        ((dayofweek(col("__graft_local")) + 5) % 7).as("__graft_dow"), // Spark: 1=Sun..7=Sat → 0=Mon..6=Sun
        hour(col("__graft_local")).as("__graft_hour"))
    withTz
      .join(
        localSpine,
        withTz("__graft_tz") === localSpine("__graft_tz") &&
          withTz(monthColumn) === localSpine("__graft_month") &&
          withTz(dowColumn) === localSpine("__graft_dow") &&
          withTz(hourColumn) === localSpine("__graft_hour"),
        "inner")
      .drop("__graft_tz", "__graft_month", "__graft_dow", "__graft_hour", monthColumn, dowColumn, hourColumn)
  }

  /** Variant B: (month, is_weekday, hour) template
    * (ONE_WEEKDAY_DAY_AND_ONE_WEEKEND_DAY_PER_MONTH_BY_HOUR). */
  def weekdayWeekendPerMonthByHour(
      df: DataFrame,
      spine: DataFrame,
      geographyColumn: String,
      geoTimeZones: DataFrame,
      monthColumn: String = "month",
      isWeekdayColumn: String = "is_weekday",
      hourColumn: String = "hour",
      timestampColumn: String = "timestamp"): DataFrame = {
    val tz = broadcast(geoTimeZones.select(col("id").as("__graft_geo_id"), col("time_zone").as("__graft_tz")))
    val withTz = df.join(tz, df(geographyColumn) === col("__graft_geo_id"), "inner").drop("__graft_geo_id")
    val tzs = distinctTimeZones(geoTimeZones)
    val localSpine = spine
      .crossJoin(broadcast(tzs))
      .withColumn("__graft_local", from_utc_timestamp(col(timestampColumn), col("__graft_tz")))
      .select(
        col(timestampColumn),
        col("__graft_tz"),
        month(col("__graft_local")).as("__graft_month"),
        (dayofweek(col("__graft_local")).isin(2, 3, 4, 5, 6)).as("__graft_weekday"),
        hour(col("__graft_local")).as("__graft_hour"))
    withTz
      .join(
        localSpine,
        withTz("__graft_tz") === localSpine("__graft_tz") &&
          withTz(monthColumn) === localSpine("__graft_month") &&
          withTz(isWeekdayColumn) === localSpine("__graft_weekday") &&
          withTz(hourColumn) === localSpine("__graft_hour"),
        "inner")
      .drop("__graft_tz", "__graft_month", "__graft_weekday", "__graft_hour", monthColumn, isWeekdayColumn, hourColumn)
  }
}

/** Time-series resampling between interval resolutions, honoring the
  * measurement type (ref: chronify semantics used by the reference's
  * time-dimension mapping, dsgrid/dimension/time.py:95-140 MeasurementType —
  * MEAN for rates like power, TOTAL for quantities like energy, MIN/MAX for
  * extremes). */
object Resample {

  /** Downsample to a coarser interval: floor each timestamp to its target
    * bucket and aggregate by measurement type (TOTAL sums; MEAN averages;
    * MIN/MAX take extremes). One partial-agg-friendly groupBy. */
  def downsample(
      df: DataFrame,
      timestampColumn: String,
      targetIntervalSeconds: Long,
      measurement: String,
      keyColumns: Seq[String],
      valueColumn: String = ValueColumn): DataFrame = {
    val bucket = timestamp_seconds(
      (unix_timestamp(col(timestampColumn)) / targetIntervalSeconds).cast("long") * targetIntervalSeconds)
    val agg = measurement.toLowerCase match {
      case "total" => sum(col(valueColumn))
      case "mean" => avg(col(valueColumn))
      case "min" => min(col(valueColumn))
      case "max" => max(col(valueColumn))
      case other => throw new IllegalArgumentException(s"unsupported measurement type: $other")
    }
    df.withColumn(timestampColumn, bucket)
      .groupBy((timestampColumn +: keyColumns).map(col): _*)
      .agg(agg.as(valueColumn))
  }

  /** Upsample to a finer interval: explode each row into its sub-steps.
    * MEAN/MIN/MAX values carry over unchanged (a rate holds over the whole
    * period); TOTAL divides by the step count so the sum is preserved. */
  def upsample(
      df: DataFrame,
      timestampColumn: String,
      sourceIntervalSeconds: Long,
      targetIntervalSeconds: Long,
      measurement: String,
      valueColumn: String = ValueColumn): DataFrame = {
    require(
      sourceIntervalSeconds % targetIntervalSeconds == 0,
      s"source interval $sourceIntervalSeconds not divisible by target $targetIntervalSeconds")
    val steps = (sourceIntervalSeconds / targetIntervalSeconds).toInt
    val offsets = sequence(lit(0L), lit((steps - 1).toLong))
    val expanded = df
      .withColumn("__graft_off", explode(offsets))
      .withColumn(
        timestampColumn,
        timestamp_seconds(unix_timestamp(col(timestampColumn)) + col("__graft_off") * targetIntervalSeconds))
      .drop("__graft_off")
    measurement.toLowerCase match {
      case "total" => expanded.withColumn(valueColumn, col(valueColumn) / steps)
      case "mean" | "min" | "max" => expanded
      case other => throw new IllegalArgumentException(s"unsupported measurement type: $other")
    }
  }

  /** Wrap timestamps outside [rangeStart, rangeEnd) back into range by
    * whole-range shifts — the reference's wrap_time_allowed semantics for
    * weather-year alignment (ref: dsgrid time mapping wrap_time;
    * chronify wrap-around). */
  def wrapTime(
      df: DataFrame,
      timestampColumn: String,
      rangeStart: String,
      rangeEnd: String): DataFrame = {
    val startS = unix_timestamp(to_timestamp(lit(rangeStart)))
    val endS = unix_timestamp(to_timestamp(lit(rangeEnd)))
    val span = endS - startS
    val ts = unix_timestamp(col(timestampColumn))
    val wrapped = startS + pmod(ts - startS, span)
    df.withColumn(timestampColumn, timestamp_seconds(wrapped))
  }
}

/** Gap-based sessionization of event streams (beyond-parity — the events
  * table is the stream-shaped input a training pipeline sessionizes before
  * per-session quality filtering). One window pass assigns ids, one groupBy
  * aggregates — two shuffles total, both keyed by the entity. */
object Sessionize {

  /** Assign `session_id` per key: a new session starts when the gap since
    * the previous event reaches `gapSeconds` — half-open, matching Spark's
    * streaming session_window (an event exactly `gap` after the previous
    * one opens a NEW session), so batch and streaming sessionization agree
    * on boundary events. Comparison runs in integer microseconds (exact —
    * no double rounding at second boundaries). session_id is the running
    * count of session starts, so ids are dense per key starting at 1. */
  def assignSessions(
      df: DataFrame,
      timestampColumn: String,
      gapSeconds: Long,
      keyColumns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyColumns.map(col): _*).orderBy(col(timestampColumn))
    val micros = unix_micros(col(timestampColumn))
    val prev = lag(micros, 1).over(w)
    val isStart = when(prev.isNull || micros - prev >= gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn(
      "session_id",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-key-and-session summary: event count + duration in seconds. */
  def sessionStats(
      df: DataFrame,
      timestampColumn: String,
      gapSeconds: Long,
      keyColumns: Seq[String]): DataFrame =
    assignSessions(df, timestampColumn, gapSeconds, keyColumns)
      .groupBy((keyColumns :+ "session_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        ((max(unix_micros(col(timestampColumn))) - min(unix_micros(col(timestampColumn)))) / 1e6)
          .as("duration_sec"))
}

/** Time-zone conversion (ref: query_submitter.py:335-457 single-tz;
  * utils/dataset.py:83-120,382-405 per-geography). */
object TimeZones {

  /** Convert a UTC timestamp column to a single named zone's local clock
    * time (naive local stamp + a literal tz column, matching the reference's
    * "naive time + tz column" output form, query/models.py:530-535). */
  def toSingleZone(df: DataFrame, timestampColumn: String, tz: String): DataFrame =
    df.withColumn(timestampColumn, from_utc_timestamp(col(timestampColumn), tz))
      .withColumn(TimeZoneColumn, lit(tz))

  /** Per-geography: join geography records for time_zone, convert each row
    * to its local clock time. Left join + raise_error, not inner: a row
    * whose geography id has no record (or whose record has a null
    * time_zone) must fail fast with a message naming the id, never be
    * silently dropped from the result. The guard costs no extra Spark job. */
  def toGeographyLocal(
      df: DataFrame,
      timestampColumn: String,
      geographyColumn: String,
      geoRecords: DataFrame): DataFrame = {
    val rec = broadcast(geoRecords.select(col("id").as("__graft_geo_id"), col("time_zone").as(TimeZoneColumn)))
    df.join(rec, df(geographyColumn) === col("__graft_geo_id"), "left")
      .drop("__graft_geo_id")
      .withColumn(
        TimeZoneColumn,
        when(
          col(TimeZoneColumn).isNull,
          raise_error(concat(
            lit("toGeographyLocal: geography id '"),
            col(geographyColumn).cast("string"),
            lit("' has no dimension record with a non-null time_zone"))))
          .otherwise(col(TimeZoneColumn)))
      .withColumn(timestampColumn, from_utc_timestamp(col(timestampColumn), col(TimeZoneColumn)))
  }

  // ---------------------------------------------- DATETIME_EXTERNAL_TZ
  // The reference's sixth time representation (dimension/time.py:15-23,
  // DatetimeExternalTimeZoneDimensionModel, config/dimensions.py:747-790):
  // tz-NAIVE timestamps that require localizing through an external time
  // zone — either a per-row tz column resolved from the geography records
  // (local_as_strings / aligned-in-clock-time) or one declared zone for the
  // whole dataset (aligned_in_absolute_time). These are the inverses of
  // toGeographyLocal / toSingleZone: they take naive local clock readings
  // INTO absolute UTC instants, which is what every downstream time op
  // (resample, DST adjust, session spine) expects to operate on.

  /** Localize naive local-clock timestamps to UTC through a tz column
    * already present on the data. Pure column expression — zero shuffle. */
  def localToUtc(df: DataFrame, timestampColumn: String, tzColumn: String): DataFrame =
    df.withColumn(timestampColumn, to_utc_timestamp(col(timestampColumn), col(tzColumn)))

  /** Localize naive timestamps aligned to ONE declared zone to UTC
    * (aligned_in_absolute_time). */
  def alignedToUtc(df: DataFrame, timestampColumn: String, tz: String): DataFrame =
    df.withColumn(timestampColumn, to_utc_timestamp(col(timestampColumn), tz))

  /** Localize naive local-clock timestamps to UTC with the tz resolved from
    * the geography dimension records (`id`, `time_zone`) — broadcast left
    * join + fail-fast on geographies with no usable record, same contract
    * as toGeographyLocal. The tz column is dropped on output: the result is
    * absolute time, the zone is no longer part of the data's meaning. */
  def geographyLocalToUtc(
      df: DataFrame,
      timestampColumn: String,
      geographyColumn: String,
      geoRecords: DataFrame): DataFrame = {
    val rec = broadcast(geoRecords.select(col("id").as("__graft_geo_id"), col("time_zone").as("__graft_ext_tz")))
    df.join(rec, df(geographyColumn) === col("__graft_geo_id"), "left")
      .drop("__graft_geo_id")
      .withColumn(
        "__graft_ext_tz",
        when(
          col("__graft_ext_tz").isNull,
          raise_error(concat(
            lit("geographyLocalToUtc: geography id '"),
            col(geographyColumn).cast("string"),
            lit("' has no dimension record with a non-null time_zone"))))
          .otherwise(col("__graft_ext_tz")))
      .withColumn(timestampColumn, to_utc_timestamp(col(timestampColumn), col("__graft_ext_tz")))
      .drop("__graft_ext_tz")
  }
}

/** Leap-day and daylight-saving adjustments
  * (ref: dsgrid/dimension/time.py:53-92,143-267). */
object TimeAdjustments {

  sealed trait LeapDayAdjustment
  case object DropFeb29 extends LeapDayAdjustment
  case object DropDec31 extends LeapDayAdjustment
  case object DropJan1 extends LeapDayAdjustment

  def adjustLeapDay(df: DataFrame, timestampColumn: String, adjustment: LeapDayAdjustment): DataFrame = {
    val ts = col(timestampColumn)
    adjustment match {
      case DropFeb29 => df.filter(!(month(ts) === 2 && dayofmonth(ts) === 29))
      case DropDec31 => df.filter(!(month(ts) === 12 && dayofmonth(ts) === 31))
      case DropJan1 => df.filter(!(month(ts) === 1 && dayofmonth(ts) === 1))
    }
  }

  /** Spring-forward: in a local-clock series the 02:00 hour doesn't exist on
    * the DST-start date; drop those stamps. Fall-back: the 01:00 hour occurs
    * twice; `duplicateFallBack` re-adds rows for the repeated hour
    * (ref INDEX-time handling: dimension/time.py:71-92,143-187). Operates on
    * a local (NTZ-interpreted) timestamp + tz column. */
  def dropSpringForwardHour(df: DataFrame, timestampColumn: String, tzColumn: String): DataFrame = {
    // A local stamp is nonexistent iff converting local→UTC→local doesn't round-trip.
    val roundTrip = from_utc_timestamp(to_utc_timestamp(col(timestampColumn), col(tzColumn)), col(tzColumn))
    df.filter(roundTrip === col(timestampColumn))
  }

  /** Interval arithmetic: ts ± n units, unit a calendar word
    * (ref: dsgrid/spark/functions.py:326-350). */
  def addInterval(ts: Column, n: Long, unit: String): Column = {
    require(Set("SECOND", "MINUTE", "HOUR", "DAY", "WEEK", "MONTH", "YEAR").contains(unit.toUpperCase),
      s"unsupported interval unit: $unit")
    ts + expr(s"INTERVAL $n ${unit.toUpperCase}")
  }

  /** Fall-back alternative to duplication: fill the repeated hour by linear
    * interpolation between the surrounding values — used for INDEX time where
    * the duplicated local hour would double-count energy
    * (ref interpolate option: dsgrid/dimension/time.py:143-187). The
    * The measured value stays on the existing row; only the ADDED duplicate
    * carries mean(prev, next) (via a window over the per-key series) — the
    * reference's INTERPOLATE fills the inserted hour, it does not overwrite
    * the measurement. */
  def interpolateFallBackHour(
      df: DataFrame,
      timestampColumn: String,
      tzColumn: String,
      valueColumn: String,
      keyColumns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val utc = to_utc_timestamp(col(timestampColumn), col(tzColumn))
    val backLocal = from_utc_timestamp(utc + expr("INTERVAL 1 HOUR"), col(tzColumn))
    val ambiguous = backLocal === col(timestampColumn)
    val w = Window.partitionBy(keyColumns.map(col): _*).orderBy(col(timestampColumn))
    val duplicates = df
      .withColumn(
        "__graft_interp",
        coalesce(
          (lag(col(valueColumn), 1).over(w) + lead(col(valueColumn), 1).over(w)) / 2.0,
          col(valueColumn)))
      .filter(ambiguous)
      .withColumn(valueColumn, col("__graft_interp"))
      .drop("__graft_interp")
    df.unionByName(duplicates)
  }

  def duplicateFallBackHour(df: DataFrame, timestampColumn: String, tzColumn: String): DataFrame = {
    // A local stamp is ambiguous iff adding 1h of real time to its (earlier-
    // offset) UTC instant lands back on the SAME local clock reading. This
    // does not fire for nonexistent spring-forward stamps, which resolve
    // shifted and so never round-trip onto themselves.
    val utc = to_utc_timestamp(col(timestampColumn), col(tzColumn))
    val backLocal = from_utc_timestamp(utc + expr("INTERVAL 1 HOUR"), col(tzColumn))
    val ambiguous = backLocal === col(timestampColumn)
    df.unionByName(df.filter(ambiguous))
  }
}

/** Registration-time time-consistency checks
  * (ref: dataset_schema_handler_base.py:323-452). */
object TimeChecks {

  /** Distinct timestamps in the data must exactly equal the expected spine. */
  def timestampsMatchSpine(df: DataFrame, timestampColumn: String, spine: DataFrame): Boolean = {
    val actual = df.select(col(timestampColumn).as("timestamp")).distinct()
    val expected = spine.select(col("timestamp")).distinct()
    expected.exceptAll(actual).isEmpty && actual.exceptAll(expected).isEmpty
  }

  /** Every dimension combination carries the same number of timestamps. */
  def equalTimeArrayLengths(df: DataFrame, dimColumns: Seq[String]): Boolean =
    graft.operators.Aggregation.groupsHaveEqualCounts(df, dimColumns)

  // ---- lazily-composable forms: each check is a ONE-ROW FRAME, so a
  // whole consistency report runs as a single Spark job instead of one
  // sequential driver action per check (at scale the boolean forms above
  // cost one full scan each; a fused report shares the scheduler trip)

  /** The data's own hourly/daily/... spine, derived INSIDE the plan from
    * its min/max — no driver action to fetch the bounds first. */
  def spineFromBounds(df: DataFrame, timestampColumn: String, intervalSeconds: Long): DataFrame =
    df.agg(min(col(timestampColumn)).as("__graft_min"), max(col(timestampColumn)).as("__graft_max"))
      .select(explode(sequence(
        col("__graft_min"), col("__graft_max"),
        expr(s"INTERVAL $intervalSeconds SECONDS"))).as("timestamp"))

  /** 1-row frame: `outCol` = 1 iff the data's distinct timestamps equal
    * the spine exactly (full-outer anti-coverage count, one aggregate). */
  def timestampsMatchSpineCheck(
      df: DataFrame, timestampColumn: String, spine: DataFrame, outCol: String): DataFrame = {
    val actual = df.select(col(timestampColumn).as("timestamp")).distinct()
      .withColumn("__graft_a", lit(1))
    val expected = spine.select(col("timestamp")).distinct()
      .withColumn("__graft_e", lit(1))
    actual.join(expected, Seq("timestamp"), "full_outer")
      .agg((count(when(col("__graft_a").isNull || col("__graft_e").isNull, 1)) === 0)
        .cast("long").as(outCol))
  }

  /** 1-row frame: `outCol` = 1 iff every dimension combination carries
    * the same number of rows (count-distinct of the group counts). */
  def equalTimeArrayLengthsCheck(df: DataFrame, dimColumns: Seq[String], outCol: String): DataFrame =
    df.groupBy(dimColumns.map(col): _*).count()
      .agg((count_distinct(col("count")) <= 1).cast("long").as(outCol))

  /** Fuse 1-row check frames into one 1-row report (cross joins of
    * scalar aggregates — Catalyst plans them as one job). */
  def report(first: DataFrame, rest: DataFrame*): DataFrame =
    rest.foldLeft(first)(_ crossJoin _)
}
