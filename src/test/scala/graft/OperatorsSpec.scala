package graft

import org.apache.spark.sql.functions._
import graft.core.Constants._
import graft.operators._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def df =
    Seq(("a", 1.0, "US"), ("b", 5.0, "DE"), ("c", 9.0, "US"), ("d", 3.0, "FR"))
      .toDF("id", "v", "geo")

  test("expression / between / column-operator / raw filters compose") {
    val out = DimensionFilter.applyAll(
      df,
      Seq(
        DimensionFilter.ExpressionFilter("v", ">", 1.0),
        DimensionFilter.BetweenFilter("v", 2.0, 9.0),
        DimensionFilter.ColumnOperatorFilter("geo", "isin", Seq("US", "FR")),
        DimensionFilter.RawFilter("id != 'x'")))
    assert(out.select("id").as[String].collect().toSet == Set("c", "d"))
  }

  test("negated operators") {
    val out = DimensionFilter.ColumnOperatorFilter("geo", "isin", Seq("US"), negate = true)(df)
    assert(out.select("id").as[String].collect().toSet == Set("b", "d"))
    val out2 = DimensionFilter.BetweenFilter("v", 2.0, 6.0, negate = true)(df)
    assert(out2.select("id").as[String].collect().toSet == Set("a", "c"))
  }

  test("subset filter semi-joins against union of record sets") {
    val r1 = Seq("US").toDF("id")
    val r2 = Seq("DE").toDF("id")
    val out = DimensionFilter.SubsetFilter("geo", Seq(r1, r2))(df)
    assert(out.select("id").as[String].collect().toSet == Set("a", "b", "c"))
  }

  test("prefilter translates target ids back through the mapping") {
    val mapping = Seq(("US", "north_america"), ("FR", "europe"), ("DE", "europe"))
      .toDF("from_id", "to_id")
    val target = Seq("europe").toDF("id")
    val out = PreFilter.prefilterThroughMapping(df, "geo", mapping, target)
    assert(out.select("id").as[String].collect().toSet == Set("b", "d"))
  }
}

class AggregationSpec extends SparkSpec {
  import spark.implicits._

  private def df =
    Seq(("x", 1.0), ("x", 3.0), ("y", 5.0), ("y", 5.0)).toDF("g", ValueColumn)

  test("whitelisted aggregation by name") {
    val out = Aggregation.aggregate(df, Seq("g"), "sum")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out == Map("x" -> 4.0, "y" -> 10.0))
    intercept[IllegalArgumentException](Aggregation.resolve("system"))
  }

  test("peakRowsPerGroup keeps one deterministic peak row") {
    val e = Seq(("x", 1L, 9.0), ("x", 2L, 9.0), ("y", 3L, 1.0)).toDF("g", "t", ValueColumn)
    val out = Aggregation.peakRowsPerGroup(e, Seq("g"), ValueColumn, tieBreak = Seq("t"))
    assert(out.count() == 2)
    assert(out.filter($"g" === "x").select("t").as[Long].head() == 1L)
  }

  test("peakRowsPerGroupAllTies keeps every tied row") {
    val e = Seq(("x", 1L, 9.0), ("x", 2L, 9.0), ("x", 3L, 1.0)).toDF("g", "t", ValueColumn)
    assert(Aggregation.peakRowsPerGroupAllTies(e, Seq("g"), ValueColumn).count() == 2)
  }

  test("groupsHaveEqualCounts validation") {
    assert(Aggregation.groupsHaveEqualCounts(df, Seq("g")))
    val uneven = Seq(("x", 1.0), ("y", 1.0), ("y", 2.0)).toDF("g", ValueColumn)
    assert(!Aggregation.groupsHaveEqualCounts(uneven, Seq("g")))
  }

  test("trimmedStats drops floor(n*p/100) rows from each end; small groups untrimmed") {
    // g=a: 10 values 1..10 with one extreme outlier swapped in at the top;
    // 10% trim drops exactly the min and the max
    val a = (1L to 9L).map(v => ("a", v * 10, v)) :+ (("a", 101L, 1000000L))
    // g=b: 4 rows — floor(4*10/100)=0, nothing trimmed
    val b = (1L to 4L).map(v => ("b", v * 10, v))
    val d = (a ++ b).toDF("g", "id", "v")
    val out = Aggregation.trimmedStats(d, Seq("g"), "v", 10, tieBreak = col("id"))
      .select("g", "n", "n_kept", "trimmed_sum", "kept_min", "kept_max", "trimmed_mean")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // a: keeps 2..9 → sum 44, mean 5.5; outlier gone
    assert(out === Seq(
      ("a", 10L, 8L, 44L, 2L, 9L, 5.5),
      ("b", 4L, 4L, 10L, 1L, 4L, 2.5)))
    // trim >= 50 is every row from both ends — refused
    intercept[IllegalArgumentException](
      Aggregation.trimmedStats(d, Seq("g"), "v", 50, col("id")))
  }
}

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("pivot then unpivot round-trips stacked data") {
    val stacked = Seq(("a", "m1", 1.0), ("a", "m2", 2.0), ("b", "m1", 3.0), ("b", "m2", 4.0))
      .toDF("geo", "metric", ValueColumn)
    val wide = Reshape.pivot(stacked, "metric", values = Seq("m1", "m2"))
    assert(wide.columns.toSet == Set("geo", "m1", "m2"))
    val back = Reshape.unpivot(wide, Seq("geo"), Seq("m1", "m2"), "metric")
    assert(sortedRows(back.select("geo", "metric", ValueColumn)) ==
      sortedRows(stacked))
  }

  test("unpivotPreservingNulls re-attaches all-null rows with null value") {
    val wide = Seq(("a", Some(1.0), Some(2.0)), ("b", None, None))
      .toDF("geo", "m1", "m2")
    val out = Reshape.unpivotPreservingNulls(wide, Seq("geo"), Seq("m1", "m2"), "metric")
    assert(out.count() == 4)
    assert(out.filter($"geo" === "b" && col(ValueColumn).isNull).count() == 2)
  }
}

class DatasetExprSpec extends SparkSpec {
  import spark.implicits._

  private def ds(vs: (String, Double)*) = vs.toSeq.toDF("k", ValueColumn)

  test("parser handles precedence and parens") {
    import DatasetExpr._
    assert(parse("a + b * c") == BinOp('+', Ref("a"), BinOp('*', Ref("b"), Ref("c"))))
    assert(parse("(a | b) - c") == BinOp('-', BinOp('|', Ref("a"), Ref("b")), Ref("c")))
    // `|` binds loosest (Python precedence, like the reference's evaluator)
    assert(parse("a | b + c") == BinOp('|', Ref("a"), BinOp('+', Ref("b"), Ref("c"))))
    intercept[IllegalArgumentException](parse("a +"))
  }

  test("arithmetic joins on dimension columns") {
    val out = DatasetExpr.evaluate(
      "(a - b) * c",
      Map("a" -> ds("x" -> 10.0), "b" -> ds("x" -> 4.0), "c" -> ds("x" -> 2.0)))
    assert(out.select(ValueColumn).as[Double].head() == 12.0)
  }

  test("union with | and strict misalignment failure") {
    val out = DatasetExpr.evaluate("a | b", Map("a" -> ds("x" -> 1.0), "b" -> ds("y" -> 2.0)))
    assert(out.count() == 2)
    intercept[IllegalArgumentException](
      DatasetExpr.arithmetic(ds("x" -> 1.0), ds("y" -> 2.0), '+'))
  }

  test("as-of join: latest right row at or before each left timestamp, per key") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1.0), // before any change → null
      ("u1", ts("2024-01-02 00:00:00"), 2.0), // exactly at change → inclusive
      ("u1", ts("2024-01-03 12:00:00"), 3.0), // after first, before second
      ("u1", ts("2024-01-05 00:00:01"), 4.0), // after second
      ("u1", ts("2024-01-07 00:00:00"), 5.5), // after the null-tier change
      ("u2", ts("2024-01-04 00:00:00"), 5.0)) // u2 has its own history
      .toDF("user", "ts", "v")
    val changes = Seq(
      ("u1", ts("2024-01-02 00:00:00"), "bronze"),
      ("u1", ts("2024-01-05 00:00:00"), "gold"),
      // the LATEST row wins even when its value is null — per-column
      // last(ignoreNulls) would wrongly carry "gold" forward
      ("u1", ts("2024-01-06 00:00:00"), null.asInstanceOf[String]),
      ("u2", ts("2024-01-01 00:00:00"), "silver"))
      .toDF("user", "cts", "tier")
    val out = graft.operators.AsOfJoin
      .asOfJoin(events, changes, Seq("user"), "ts", "cts")
      .orderBy("user", "ts")
      .select("v", "tier").collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(out == Seq(
      (1.0, null), (2.0, "bronze"), (3.0, "bronze"), (4.0, "gold"), (5.5, null), (5.0, "silver")))
    // single shuffle: the one keyed window exchange
    val plan = graft.operators.AsOfJoin.asOfJoin(events, changes, Seq("user"), "ts", "cts")
    assert(graft.plans.PlanChecks.shuffleCount(plan) == 1)
  }

  test("range join: half-open interval containment via bucketized equi-join") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      ("k", ts("2024-01-10 00:00:00"), 1.0), // == start → in
      ("k", ts("2024-01-11 23:59:59"), 2.0), // inside
      ("k", ts("2024-01-12 00:00:00"), 3.0), // == end → out
      ("k", ts("2024-01-15 00:00:00"), 4.0), // in the long interval only
      ("z", ts("2024-01-10 12:00:00"), 5.0)) // other key, no interval
      .toDF("key", "ts", "v")
    val intervals = Seq(
      ("k", ts("2024-01-10 00:00:00"), ts("2024-01-12 00:00:00"), "short"),
      ("k", ts("2024-01-09 00:00:00"), ts("2024-01-20 00:00:00"), "long")) // spans many buckets
      .toDF("key", "start", "end", "name")
    val out = graft.operators.RangeJoin
      .intervalJoin(events, intervals, Seq("key"), "ts", "start", "end", bucketWidthSeconds = 86400L)
      .select("v", "name").collect().map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(out == Set(
      (1.0, "short"), (2.0, "short"), // half-open: v=3.0 at end excluded
      (1.0, "long"), (2.0, "long"), (3.0, "long"), (4.0, "long")))
  }

  test("interval overlap join: half-open semantics, emit-once across shared buckets, degenerates drop") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val l = Seq(
      ("k", 1L, ts("2024-01-01 00:00:00"), ts("2024-01-20 00:00:00")), // long: many buckets
      ("k", 2L, ts("2024-01-05 00:00:00"), ts("2024-01-06 00:00:00")),
      ("k", 3L, ts("2024-02-01 00:00:00"), ts("2024-02-01 00:00:00")), // degenerate: drops
      ("z", 4L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00"))) // other key
      .toDF("key", "lid", "ls", "le")
    val r = Seq(
      ("k", 10L, ts("2024-01-03 00:00:00"), ts("2024-01-15 00:00:00")), // overlaps 1 over many buckets, and 2
      ("k", 11L, ts("2024-01-20 00:00:00"), ts("2024-01-21 00:00:00")), // touches 1's end: half-open, no match
      ("k", 12L, ts("2024-01-31 00:00:00"), ts("2024-02-02 00:00:00"))) // would hit 3 if not degenerate
      .toDF("key", "rid", "rs", "re")
    val out = graft.operators.RangeJoin
      .intervalOverlapJoin(l, r, Seq("key"), "ls", "le", "rs", "re", bucketWidthSeconds = 86400L)
    val pairs = out.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    // emit-once: (1,10) shares 12 daily buckets — exactly one output row
    assert(pairs.sorted == Seq((1L, 10L), (2L, 10L)))
    assert(!out.queryExecution.executedPlan.toString.contains("Cartesian"))
  }

  test("interval overlap join equals the brute-force overlap join on fuzzed intervals") {
    val rnd = new scala.util.Random(313)
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val s = rnd.nextInt(500).toLong * 3600L // hours grid over ~21 days
      val len = (rnd.nextInt(96) + 1).toLong * 3600L
      (s"k${rnd.nextInt(4)}", i.toLong, new java.sql.Timestamp(s * 1000L),
        new java.sql.Timestamp((s + len) * 1000L))
    }.toDF("key", s"${tag}id", s"${tag}s", s"${tag}e")
    val l = mk(80, "l")
    val r = mk(60, "r")
    for (width <- Seq(3600L, 86400L, 7L * 86400L)) {
      val got = graft.operators.RangeJoin
        .intervalOverlapJoin(l, r, Seq("key"), "ls", "le", "rs", "re", bucketWidthSeconds = width)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = l.join(r, Seq("key"))
        .filter(col("ls") < col("re") && col("rs") < col("le"))
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == want, s"width=$width")
    }
    val e = intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.intervalOverlapJoin(
        l, r.withColumnRenamed("rid", "lid"), Seq("key"), "ls", "le", "rs", "re")
    }
    assert(e.getMessage.contains("collide"))
  }

  test("range join rejects payload column collisions up front") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(("k", ts("2024-01-10 00:00:00"), 1.0)).toDF("key", "ts", "v")
    val intervals = Seq(("k", ts("2024-01-09 00:00:00"), ts("2024-01-12 00:00:00"), 9.0))
      .toDF("key", "start", "end", "v") // 'v' collides with left
    val e = intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.intervalJoin(events, intervals, Seq("key"), "ts", "start", "end")
    }
    assert(e.getMessage.contains("collide"))
    val boundClash = Seq(("k", ts("2024-01-09 00:00:00"), ts("2024-01-12 00:00:00"), "n"))
      .toDF("key", "start", "end", "name")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.RangeJoin.intervalJoin(
        events.withColumn("start", events("ts")), boundClash, Seq("key"), "ts", "start", "end")
    }
    assert(e2.getMessage.contains("interval bound"))
  }
}

class OutliersGapFillSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("MAD outliers: hand-checked median/MAD tagging; nulls never flagged") {
    // group g: values 1,2,3,100 → median 2.5, deviations .5,.5,1.5,97.5
    // → MAD 1.0 → only 100 exceeds 3·MAD
    val d = Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", Some(100.0)), ("g", None)).toDF("k", "v")
    val out = graft.operators.Outliers.madOutliers(d, "v", Seq("k"), k = 3.0)
      .collect().map(r => r.isNullAt(1) -> (if (r.isNullAt(1)) false else r.getDouble(1) == 100.0,
        r.getBoolean(2))).toSeq
    val flagged = out.collect { case (_, (is100, o)) if o => is100 }
    assert(flagged == Seq(true), "exactly the 100.0 row is an outlier")
    // approx path agrees on this tiny frame
    val approx = graft.operators.Outliers.madOutliers(d, "v", Seq("k"), 3.0, approx = true)
    assert(approx.filter(col("is_outlier")).select("v").as[Double].collect().toSeq == Seq(100.0))

    // rows with a NULL group key are preserved (not dropped by the stat
    // joins) and never flagged
    val withNullKey = Seq((Option("g"), Some(1.0)), (Option.empty[String], Some(9.0)))
      .toDF("k", "v")
    val out2 = graft.operators.Outliers.madOutliers(withNullKey, "v", Seq("k"), 3.0)
    assert(out2.count() == 2, "every input row must survive")
    assert(out2.filter(col("k").isNull).select("is_outlier").as[Boolean].head() == false)
  }

  test("LOCF gap fill: imputes interior gaps, leaves leading gaps NULL") {
    val ts = (b: Long, n: Int) => (0 until n).map(i => b * 3600 + i * 60)
    // key a: buckets 0 (2 events) and 2 (1) — bucket 1 imputes to 2;
    // key b: only bucket 2 — buckets 0/1 stay NULL (leading gap)
    val rows = (ts(0, 2) ++ ts(2, 1)).map(s => ("a", s)) ++ ts(2, 3).map(s => ("b", s))
    val d = rows.toDF("k", "sec").withColumn("ts", timestamp_seconds(col("sec")))
    val out = graft.time.GapFill.locfCounts(d, "ts", Seq("k"), 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1) / 3600,
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      ("a", 0L, 2L, 0L), ("a", 1L, 2L, 1L), ("a", 2L, 1L, 0L),
      ("b", 0L, -1L, 1L), ("b", 1L, -1L, 1L), ("b", 2L, 3L, 0L)))
    // empty input → empty grid with the right schema, not a crash
    val empty = graft.time.GapFill.locfCounts(d.filter(lit(false)), "ts", Seq("k"), 3600L)
    assert(empty.columns.toSeq == Seq("k", "bucket_start", "n_filled", "was_filled"))
    assert(empty.count() == 0)
  }
}

class PrivacyVolumeSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Outliers, Privacy}

  test("kAnonymitySuppress drops small groups; report counts l-diversity") {
    val d = Seq(
      ("a", 1L, "s1"), ("a", 1L, "s2"), ("a", 1L, "s1"), // group (a,1): n=3
      ("a", 2L, "s1"),                                   // group (a,2): n=1
      ("b", 1L, "s1"), ("b", 1L, "s1"))                  // group (b,1): n=2, l=1
      .toDF("q1", "q2", "sens")
    val kept = Privacy.kAnonymitySuppress(d, Seq("q1", "q2"), k = 2L)
    assert(kept.count() === 5) // (a,2) suppressed
    val rep = Privacy.kAnonymityReport(d, Seq("q1", "q2"), "sens", k = 2L)
      .select("q1", "q2", "n", "l_diversity", "suppressed")
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    assert(rep === Set(
      ("a", 1L, 3L, 2L, false),
      ("a", 2L, 1L, 1L, true),
      ("b", 1L, 2L, 1L, false)))
  }

  test("kAnonymitySuppress and the report agree on NULL quasi groups (null-safe join)") {
    val d = Seq(
      (Some("x"), "s1"), (Some("x"), "s2"),
      (None, "s1"), (None, "s2"), (None, "s3")) // NULL group of 3
      .toDF("q1", "sens")
    val kept = Privacy.kAnonymitySuppress(d, Seq("q1"), k = 3L)
    // the NULL group has 3 members → releasable; ("x") has 2 → suppressed
    assert(kept.count() === 3)
    assert(kept.filter(col("q1").isNull).count() === 3)
    val rep = Privacy.kAnonymityReport(d, Seq("q1"), "sens", k = 3L)
      .filter(col("q1").isNull).select("suppressed").as[Boolean].head()
    assert(!rep) // audit agrees: not suppressed
  }

  test("volumeAnomalies: trailing exact median over a gappy range frame; cold start never flags") {
    // group g: days 1..5 at 100, day 6 drops to 10; day 9 (gap!) back at 100
    // then day 10 at 40 vs trailing median of {100,10,100}(within 7d)=100
    val counts = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L), (5L, 100L),
      (6L, 10L), (9L, 100L), (10L, 40L))
      .map { case (d, c) => ("g", d, c) }.toDF("g", "day", "cnt")
    val out = Outliers.volumeAnomalies(counts, Seq("g"), "day", "cnt",
        windowDays = 7, dropNum = 1, dropDen = 2, minPrior = 3)
      .select("day", "n_prior", "trailing_median", "is_anomaly")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSeq.sortBy(_._1)
    val byDay = out.map(r => r._1 -> r).toMap
    assert(byDay(1L) === ((1L, 0L, None, false)))          // cold start, no prior
    assert(byDay(3L) === ((3L, 2L, Some(100L), false)))    // < minPrior: never flags
    assert(byDay(6L) === ((6L, 5L, Some(100L), true)))     // 10 < 100/2
    // day 9: window covers days 2..8 → counts {100,100,100,100,10} median 100
    assert(byDay(9L) === ((9L, 5L, Some(100L), false)))
    // day 10: window covers days 3..9 → days 3,4,5,6,9 = {10,100,100,100,100}, median 100
    assert(byDay(10L) === ((10L, 5L, Some(100L), true)))   // 40 < 100/2
  }

  test("tCloseness: hand-computed EMD, identical distribution scores 0, disjoint scores 1e6") {
    // global buckets over groups g/h/i: g = (2,2,0), h = (0,0,4), i = (2,2,4)
    val d = viaParquet((
      Seq.fill(2)(("g", 0L)) ++ Seq.fill(2)(("g", 1L)) ++
        Seq.fill(4)(("h", 2L)) ++
        Seq.fill(2)(("i", 0L)) ++ Seq.fill(2)(("i", 1L)) ++ Seq.fill(4)(("i", 2L)))
      .toDF("grp", "bk"))
    val out = Privacy.tClosenessReport(d, Seq("grp"), col("bk"), tPpm = 300000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // N=16, m=3, global cum = (4, 8, 16)
    // g: n=4, cum=(2,4,4): |2·16−4·4|+|4·16−8·4|+0 = 16+32 = 48 → 48e6/(2·4·16) = 375000
    // h: n=4, cum=(0,0,4): 16+32+0=48 → 375000 (all mass at the far bucket)
    // i: n=8, cum=(2,4,8): |32−32|+|64−64|+0 = 0 → the global mix itself
    assert(out("g") == ((4L, 375000L, true)))
    assert(out("h") == ((4L, 375000L, true)))
    assert(out("i") == ((8L, 0L, false)))
  }

  test("feistelPermute: exact roundtrip across the domain, bijection, key sensitivity") {
    val ids = (Seq(0L, 1L, 2L, 42L, 2147483647L, 2147483648L,
      1234567890123L, (1L << 61) + 12345L, (1L << 62) - 1L) ++
      (1L to 500L)).distinct
    val df = viaParquet(ids.toDF("id"))
    val out = df
      .withColumn("tok", Privacy.feistelPermute(col("id"), "key-a"))
      .withColumn("back", Privacy.feistelInvert(col("tok"), "key-a"))
      .withColumn("tok_b", Privacy.feistelPermute(col("id"), "key-b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.foreach { case (id, tok, back, _) =>
      assert(back == id, s"roundtrip failed for $id -> $tok -> $back")
      assert(tok >= 0L && tok < (1L << 62), s"token $tok out of the 62-bit domain")
    }
    assert(out.map(_._2).distinct.length == out.length, "tokens must be collision-free")
    assert(out.exists { case (_, tok, _, tokB) => tok != tokB }, "keys must matter")
    intercept[IllegalArgumentException](Privacy.feistelPermute(col("id"), "k", rounds = 1))
  }

  test("noisyCounts: geometric noise shape, seed determinism, arithmetic consistency") {
    val df = viaParquet((1 to 4000).map(i => (s"g${i % 400}", i)).toDF("g", "x"))
    val rel = Privacy.noisyCounts(df, Seq("g"), "seedA")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rel.length == 400)
    rel.foreach { case (_, n, noise, noisy) => assert(noisy == n + noise) }
    // two-sided geometric p=1/2: about half the groups draw |noise| = 0,
    // about a quarter |noise| = 1; signs balance. Loose bounds, 400 draws.
    val mags = rel.map(_._3.abs)
    assert(mags.count(_ == 0L) > 140 && mags.count(_ == 0L) < 260)
    assert(mags.count(_ == 1L) > 50 && mags.count(_ == 1L) < 160)
    assert(rel.map(_._3).count(_ > 0L) > 40 && rel.map(_._3).count(_ < 0L) > 40)
    // same seed replays bit-identically; a different seed moves some noise
    val again = Privacy.noisyCounts(df, Seq("g"), "seedA")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(rel.map(r => r._1 -> r._3).toMap == again)
    val other = Privacy.noisyCounts(df, Seq("g"), "seedB")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(rel.exists { case (g, _, noise, _) => other(g) != noise })
    intercept[IllegalArgumentException](Privacy.noisyCounts(df, Nil, "s"))
  }

  test("tCloseness is partitioning-invariant and refuses bad parameters") {
    val rnd = new scala.util.Random(11)
    val d = viaParquet((1 to 400)
      .map(_ => (s"g${rnd.nextInt(5)}", rnd.nextInt(6).toLong)).toDF("grp", "bk"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Privacy.tClosenessReport(df, Seq("grp"), col("bk"), 50000L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(run(d.repartition(1)) == run(d.repartition(7, col("bk"))))
    intercept[IllegalArgumentException](Privacy.tClosenessReport(d, Nil, col("bk"), 1L))
    intercept[IllegalArgumentException](Privacy.tClosenessReport(d, Seq("grp"), col("bk"), -1L))
  }
}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.SkewJoin

  test("salted join equals the plain join; hot key spreads across salts") {
    // one hot key (90% of rows) plus a key missing from the small side
    val big = ((1L to 900L).map(i => (1L, i)) ++ (901L to 1000L).map(i => (i % 7 + 2, i)))
      .toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "v")

    val salted = SkewJoin.saltedEquiJoin(big, small, Seq("k"), salts = 8, saltSource = $"row_id")
    val plain = big.join(small, Seq("k"))
    assert(sortedRows(salted.select("k", "row_id", "v")) ==
      sortedRows(plain.select("k", "row_id", "v")))

    // left join keeps unmatched big rows exactly once
    val saltedLeft = SkewJoin.saltedEquiJoin(
      big, small, Seq("k"), 8, $"row_id", joinType = "left")
    val plainLeft = big.join(small, Seq("k"), "left")
    assert(sortedRows(saltedLeft.select("k", "row_id", "v")) ==
      sortedRows(plainLeft.select("k", "row_id", "v")))

    // the hot key's rows really do land on many salts (the whole point)
    val spread = big.filter($"k" === 1L)
      .withColumn("salt", pmod(xxhash64($"row_id"), lit(8L)))
      .select("salt").distinct().count()
    assert(spread >= 6, s"hot key spread over only $spread salts")

    // right/full would duplicate unmatched small rows — refused up front
    intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(big, small, Seq("k"), 8, $"row_id", joinType = "right")
    }
  }
}

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrenceLift: exact counts, within-basket dedup, support pruning, lift") {
    // 4 baskets: {x,y} together in 2 of 4, x alone once, y alone once;
    // z rides with x once (below minSupport 2); duplicates inside a
    // basket must not inflate counts
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // dup x in basket 1
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")).toDF("b", "item")
    val got = Baskets.cooccurrenceLift(rows, "b", "item", minSupport = 2L)
      .select("item_a", "item_b", "c12", "c1", "c2", "lift_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // c12(x,y)=2, c1(x)=3, c2(y)=3, nb=4 -> lift = 2*4*1e6/9 = 888888
    assert(got == Seq(("x", "y", 2L, 3L, 3L, 888888L)))
    intercept[IllegalArgumentException] {
      Baskets.cooccurrenceLift(rows, "b", "item", minSupport = 0L)
    }
  }

  test("cooccurrenceLift flags independence at ~scale and association above it") {
    // x,y co-occur in EVERY basket -> lift = nb*nb*1e6/(nb*nb) = 1e6... with
    // c12=nb, c1=c2=nb: nb*nb*1e6/(nb*nb) = exactly 1e6 (independence-like
    // saturation); a rarer pair confined to shared baskets scores higher
    val all = (1L to 10L).flatMap(b => Seq((b, "x"), (b, "y"))) ++
      Seq((1L, "p"), (1L, "q"), (2L, "p"), (2L, "q"))
    val got = Baskets.cooccurrenceLift(all.toDF("b", "item"), "b", "item", minSupport = 2L)
      .select("item_a", "item_b", "lift_ppm").as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("x", "y")) == 1000000L)
    assert(got(("p", "q")) == 2L * 10L * 1000000L / 4L, "confined pair lifts 5x")
  }
}
