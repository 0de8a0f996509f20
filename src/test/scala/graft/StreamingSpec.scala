package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked windowed aggregation over a memory stream") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "user", "value")
    val agg = StreamOps.windowedAggregate(
      events, "ts", "1 hour", groupColumns = Seq("user"))
    val q = agg.writeStream.format("memory").queryName("win_agg").outputMode("update").start()
    input.addData(
      (ts("2024-01-01 10:05:00"), "a", 1.0),
      (ts("2024-01-01 10:45:00"), "a", 2.0),
      (ts("2024-01-01 11:05:00"), "a", 4.0),
      (ts("2024-01-01 10:10:00"), "b", 8.0))
    q.processAllAvailable()
    val got = spark.table("win_agg")
      .select(col("user"), hour(col("window.start")).as("h"), col("value"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    q.stop()
    assert(got == Set(("a", 10, 3.0), ("a", 11, 4.0), ("b", 10, 8.0)))
  }

  test("streaming content dedup within watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val deduped = StreamOps.dedupStreamByContent(docs, "text", "ts")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    input.addData(
      (ts("2024-01-01 10:00:00"), 1L, "Hello World"),
      (ts("2024-01-01 10:01:00"), 2L, "hello,  world!"), // same normalized content
      (ts("2024-01-01 10:02:00"), 3L, "different text"))
    q.processAllAvailable()
    val got = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(got == Set(1L, 3L))
  }

  test("streaming sessionization with session_window merges gap-close events") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "user")
    val sessions = StreamOps.sessionize(events, "ts", "30 minutes", Seq("user"), watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions").outputMode("append").start()
    input.addData(
      (ts("2024-01-01 10:00:00"), "a"),
      (ts("2024-01-01 10:10:00"), "a"), // same session (gap 10m)
      (ts("2024-01-01 12:00:00"), "a"), // new session (gap 110m)
      (ts("2024-01-01 10:00:00"), "b"))
    q.processAllAvailable()
    // advance the watermark far enough to close and emit all sessions
    input.addData((ts("2024-01-02 00:00:00"), "z"))
    q.processAllAvailable()
    val got = spark.table("sessions")
      .select(col("user"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .filterNot(_._1 == "z").sorted
    q.stop()
    assert(got == Seq(("a", 1L), ("a", 2L), ("b", 1L)))
  }

  test("running peak per key with mapGroupsWithState") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val peaks = StreamOps.runningPeak(input.toDS())
    val q = peaks.writeStream.format("memory").queryName("peaks").outputMode("update").start()
    input.addData(("a", 1.0), ("a", 5.0), ("b", 2.0))
    q.processAllAvailable()
    input.addData(("a", 3.0), ("b", 7.0))
    q.processAllAvailable()
    val got = spark.table("peaks").as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    q.stop()
    assert(got == Map("a" -> 5.0, "b" -> 7.0))
  }

  test("nearDupIngestGate flags stream docs near-duplicating the static corpus") {
    implicit val sql = spark.sqlContext
    import graft.text.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark streaming state stores")).toDF("doc_id", "text")
    val exSh = Dedup.hashedShingleSets(corpus, "doc_id", "text", 3).localCheckpoint(true)
    val exBk = Dedup.lshBucketsFromSignatures(
      Dedup.minhashSignaturesFromShingles(exSh, "doc_id", 64), "doc_id", 16, 4)
      .localCheckpoint(true)
    val input = MemoryStream[(Long, String)]
    val gated = StreamOps.nearDupIngestGate(
      input.toDF().toDF("doc_id", "text"), exSh, exBk, "doc_id", "text")
    val q = gated.writeStream.format("memory").queryName("gate").outputMode("append").start()
    input.addData(
      (100L, "the quick brown fox jumps over the lazy dog again and"), // near-dup of 1
      (101L, "unrelated text that matches nothing in the corpus at all"))
    q.processAllAvailable()
    val got = spark.table("gate").select("new_id", "existing_id")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(got === Set((100L, 1L)))
  }

  test("stream-stream interval join equals the batch join") {
    implicit val sql = spark.sqlContext
    val li = MemoryStream[(Long, Timestamp, String)]
    val ri = MemoryStream[(Long, Timestamp, String)]
    val l = li.toDF().toDF("k", "ts", "tag")
    val r = ri.toDF().toDF("k", "ts", "tag")
    val joined = StreamOps.intervalJoin(l, r, Seq("k"), "ts", within = "10 minutes",
      watermark = "1 day")
    val q = joined.writeStream.format("memory").queryName("sj").outputMode("append").start()
    val lRows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 10:00:00"), "l3"))
    val rRows = Seq(
      (1L, ts("2024-01-01 10:05:00"), "r1"), // within of l1
      (1L, ts("2024-01-01 11:00:00"), "r2"), // within of neither
      (2L, ts("2024-01-01 09:55:00"), "r3"), // within of l3 (right earlier)
      (3L, ts("2024-01-01 10:00:00"), "r4")) // key never matches
    li.addData(lRows: _*)
    ri.addData(rRows: _*)
    q.processAllAvailable()
    val got = spark.table("sj").select("k", "tag_l", "tag_r")
      .as[(Long, String, String)].collect().toSet
    q.stop()
    val want = (for {
      (lk, lt, ltag) <- lRows
      (rk, rt, rtag) <- rRows
      if lk == rk && math.abs(lt.getTime - rt.getTime) <= 10 * 60 * 1000
    } yield (lk, ltag, rtag)).toSet
    assert(want === Set((1L, "l1", "r1"), (2L, "l3", "r3"))) // sanity of the reference itself
    assert(got === want)
  }

  test("left-outer interval join: nulls emit only once the watermark passes the window") {
    implicit val sql = spark.sqlContext
    val li = MemoryStream[(Long, Timestamp, String)]
    val ri = MemoryStream[(Long, Timestamp, String)]
    val l = li.toDF().toDF("k", "ts", "tag")
    val r = ri.toDF().toDF("k", "ts", "tag")
    val joined = StreamOps.intervalJoin(l, r, Seq("k"), "ts", within = "10 minutes",
      watermark = "1 minute", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("soj").outputMode("append").start()
    // batch 1: one matched left, one unmatched left, plus a right row
    li.addData((1L, ts("2024-01-01 10:00:00"), "lm"), (2L, ts("2024-01-01 10:00:00"), "lu"))
    ri.addData((1L, ts("2024-01-01 10:05:00"), "rm"))
    q.processAllAvailable()
    def rows() = spark.table("soj").select("k", "tag_l", "tag_r")
      .collect().map(r0 => (r0.getLong(0), r0.getString(1), Option(r0.getString(2)))).toSet
    // watermark still at batch-1 horizon: the match emits, the null does NOT yet
    assert(rows() == Set((1L, "lm", Some("rm"))))
    // batch 2 pushes both watermarks past 10:10 + delay → the unmatched left flushes
    li.addData((9L, ts("2024-01-01 11:00:00"), "ltail"))
    ri.addData((9L, ts("2024-01-01 11:00:01"), "rtail"))
    q.processAllAvailable()
    val got = rows()
    q.stop()
    assert(got.contains((2L, "lu", None)), s"unmatched left must flush after watermark: $got")
    // the tail left sits inside the final horizon: matched pair emits, no null for it
    assert(got == Set((1L, "lm", Some("rm")), (2L, "lu", None), (9L, "ltail", Some("rtail"))))
  }

  test("full-outer interval join: BOTH sides null-pad after the watermark, keys coalesce") {
    implicit val sql = spark.sqlContext
    val li = MemoryStream[(Long, Timestamp, String)]
    val ri = MemoryStream[(Long, Timestamp, String)]
    val l = li.toDF().toDF("k", "ts", "tag")
    val r = ri.toDF().toDF("k", "ts", "tag")
    val joined = StreamOps.intervalJoin(l, r, Seq("k"), "ts", within = "10 minutes",
      watermark = "1 minute", joinType = "full_outer")
    val q = joined.writeStream.format("memory").queryName("foj").outputMode("append").start()
    // one matched pair, one unmatched LEFT, one unmatched RIGHT (its key 3
    // exists on no left row — the coalesce projection must still carry it)
    li.addData((1L, ts("2024-01-01 10:00:00"), "lm"), (2L, ts("2024-01-01 10:00:00"), "lu"))
    ri.addData((1L, ts("2024-01-01 10:05:00"), "rm"), (3L, ts("2024-01-01 10:00:00"), "ru"))
    q.processAllAvailable()
    def rows() = spark.table("foj").select("k", "tag_l", "tag_r")
      .collect().map(r0 => (r0.getLong(0), Option(r0.getString(1)), Option(r0.getString(2)))).toSet
    // watermark at the batch-1 horizon: only the match emits
    assert(rows() == Set((1L, Some("lm"), Some("rm"))))
    // push both watermarks past the windows: BOTH unmatched rows flush
    li.addData((9L, ts("2024-01-01 11:00:00"), "ltail"))
    ri.addData((9L, ts("2024-01-01 11:00:01"), "rtail"))
    q.processAllAvailable()
    val got = rows()
    q.stop()
    assert(got == Set(
      (1L, Some("lm"), Some("rm")),
      (2L, Some("lu"), None), // unmatched left, right side null
      (3L, None, Some("ru")), // unmatched right, LEFT side null — key from coalesce
      (9L, Some("ltail"), Some("rtail"))))
  }

  test("idempotent upsert sink: multi-batch counts converge and a batch retry is a no-op") {
    import graft.streaming.StreamOps
    val scratch = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val src = s"$scratch/src"; val serving = s"$scratch/serving"
    // 3 source files -> 3 micro-batches under maxFilesPerTrigger=1
    val rows = (1L to 90L).map(i => (i, if (i % 3 == 0) "a" else "b"))
    rows.toDF("id", "k").repartition(3, col("id")).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    val agg = stream.groupBy(col("k")).agg(count(lit(1)).as("n"))
    StreamOps.idempotentUpsertCounts(agg, serving, s"$scratch/ckpt").awaitTermination()
    val batches = new java.io.File(serving).listFiles().map(_.getName).filter(_.startsWith("batch="))
    assert(batches.length == 3, s"expected 3 micro-batches, got ${batches.toSeq}")
    def state() = StreamOps.readServingCounts(spark, serving, Seq("k"))
      .as[(String, Long)].collect().toMap
    val converged = state()
    assert(converged == Map("a" -> 30L, "b" -> 60L))
    // simulate an at-least-once RETRY of the last batch: rewriting the same
    // batch directory with the same cumulative rows must change nothing
    val lastId = batches.map(_.stripPrefix("batch=").toLong).max
    // (read fully to driver first — Spark cannot read and overwrite one
    // path in a single job, the q71 lesson)
    val replay = spark.read.parquet(s"$serving/batch=$lastId")
      .select("k", "n").as[(String, Long)].collect().toSeq
    replay.toDF("k", "n").write.mode("overwrite").parquet(s"$serving/batch=$lastId")
    assert(state() == converged, "a batch retry must be byte-idempotent")
  }

  test("sliding-window aggregation: each event lands in window/slide overlapping windows") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "user", "value")
    val agg = StreamOps.windowedAggregate(
      events, "ts", "2 hours", Some("1 hour"), groupColumns = Seq("user"), aggName = "count")
    val q = agg.writeStream.format("memory").queryName("win_slide").outputMode("complete").start()
    input.addData(
      (ts("2024-01-01 10:30:00"), "a", 1.0),
      (ts("2024-01-01 11:30:00"), "a", 1.0))
    q.processAllAvailable()
    val got = spark.table("win_slide")
      .select(hour(col("window.start")).as("h"), col("value"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    q.stop()
    // event@10:30 → windows [9,11) and [10,12); event@11:30 → [10,12) and [11,13)
    assert(got == Set((9, 1L), (10, 2L), (11, 1L)))
  }

  test("stateful aggregation runs identically under the RocksDB state-store provider") {
    // the production-scale state path: the in-memory (HDFSBackedStateStore)
    // provider bounds state by executor heap; RocksDB spills to local disk
    // and is what the 100 TB deployment would run. Same pipeline, same
    // results — proven by swapping the provider for one query (the conf is
    // captured at start, so scoping + restore is race-free).
    implicit val sql = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, String, Double)]
      val events = input.toDF().toDF("ts", "user", "value")
      val agg = StreamOps.windowedAggregate(
        events, "ts", "1 hour", groupColumns = Seq("user"))
      val q = agg.writeStream.format("memory").queryName("rocks_agg")
        .outputMode("update").start()
      input.addData(
        (ts("2024-01-01 10:05:00"), "a", 1.0),
        (ts("2024-01-01 10:45:00"), "a", 2.0),
        (ts("2024-01-01 11:05:00"), "a", 4.0),
        (ts("2024-01-01 10:10:00"), "b", 8.0))
      q.processAllAvailable()
      // second batch updates existing RocksDB state (not just first-open)
      input.addData((ts("2024-01-01 10:50:00"), "b", 16.0))
      q.processAllAvailable()
      val got = spark.table("rocks_agg")
        .select(col("user"), hour(col("window.start")).as("h"), col("value"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
      q.stop()
      // update mode re-emits changed windows; the FINAL per-key window state
      // is the max-timestamped emission — assert on the full emission set
      assert(got == Set(("a", 10, 3.0), ("a", 11, 4.0), ("b", 10, 8.0), ("b", 10, 24.0)))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("flagTransitions emits enter/exit flips only, with state across batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Boolean)]
    val trans = StreamOps.flagTransitions(
      input.toDF().toDF("k", "ts", "tie", "flag"), "k", "ts", "tie", "flag")
    val q = trans.writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    // batch 1, deliberately OUT of order within the batch (the operator
    // sorts by (ts, tie)): key 1 enters at 10, exits at 30; key 2 stays out
    input.addData((1L, 30L, 1L, false), (1L, 10L, 1L, true), (1L, 20L, 1L, true),
      (2L, 10L, 1L, false))
    q.processAllAvailable()
    // batch 2: key 1 re-enters (state carried: it was OUT after batch 1);
    // key 2 enters for the first time; a same-ts tie resolves by tie col
    input.addData((1L, 40L, 1L, true), (2L, 40L, 2L, true), (2L, 40L, 1L, false))
    q.processAllAvailable()
    val got = spark.table("trans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    q.stop()
    assert(got == Set((1L, 10L, "enter"), (1L, 30L, "exit"), (1L, 40L, "enter"),
      (2L, 40L, "enter")))
  }

  test("cusumMonitor: raise/clear transitions with two-integer state across batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Long)]
    val mon = StreamOps.cusumMonitor(
      input.toDF().toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v",
      drift = 10L, threshold = 25L)
    val q = mon.writeStream.format("memory").queryName("cusum")
      .outputMode("append").start()
    // batch 1 (out of order; sorted by ts): x−k = +10, +10 → S = 20, no alarm
    input.addData(("a", 20L, 1L, 20L), ("a", 10L, 1L, 20L))
    q.processAllAvailable()
    assert(spark.table("cusum").count() == 0)
    // batch 2: +10 pushes S to 30 > 25 (state carried) → raise at ts 30;
    // a 0-value row (−10) drops S to 20 ≤ 25 → clear at ts 40; the next
    // −10 (S = 10) emits nothing — transitions only
    input.addData(("a", 30L, 1L, 20L), ("a", 40L, 1L, 0L), ("a", 50L, 1L, 0L))
    q.processAllAvailable()
    val got = spark.table("cusum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("s"), r.getString(4)))
    q.stop()
    assert(got.toSet == Set(("a", 30L, 30L, "raise"), ("a", 40L, 20L, "clear")))
  }
}
