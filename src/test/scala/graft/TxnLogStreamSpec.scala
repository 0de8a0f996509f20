package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Streaming source over the transaction-log table: version-offset
  * batching under a rate limit, checkpoint recovery resuming at the exact
  * version, append-only refusal of change commits and the
  * skipChangeCommits escape. */
class TxnLogStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fileOf(root: String, df: DataFrame, name: String): String = {
    val d = s"$root/$name"
    df.coalesce(1).write.mode("overwrite").parquet(d)
    new java.io.File(d).listFiles().find(_.getName.endsWith(".parquet")).get.getAbsolutePath
  }

  private def readVersions(logDir: String, extra: (String, String)*) = {
    val base = spark.readStream
      .format("org.apache.spark.sql.graft.TxnLogStreamProvider")
      .option("logDir", logDir)
    extra.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("version-per-trigger batching: each version is its own micro-batch, in order") {
    val root = java.nio.file.Files.createTempDirectory("txnstream").toString
    val log = s"$root/_log"
    (0 until 3).foreach { v =>
      TxnLog.commit(log, v, Seq(fileOf(root, Seq(v * 10L, v * 10L + 1).toDF("x"), s"f$v")), Nil)
    }
    val batches = scala.collection.concurrent.TrieMap.empty[Long, Seq[Long]]
    val q = readVersions(log, "maxVersionsPerTrigger" -> "1")
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        batches.put(id, df.select("x").collect().map(_.getLong(0)).toSeq.sorted)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(batches.toSeq.sortBy(_._1) == Seq(
      (0L, Seq(0L, 1L)), (1L, Seq(10L, 11L)), (2L, Seq(20L, 21L))))
  }

  test("schema evolution: a batch of pre-evolution files null-fills the new column") {
    val root = java.nio.file.Files.createTempDirectory("txnstream_evo").toString
    val log = s"$root/_log"
    TxnLog.commit(log, 0, Seq(fileOf(root, Seq(1L, 2L).toDF("x"), "f0")), Nil)
    TxnLog.commit(log, 1,
      Seq(fileOf(root, Seq((3L, "a"), (4L, "b")).toDF("x", "y"), "f1")), Nil)
    val batches = scala.collection.concurrent.TrieMap.empty[Long, Seq[(Long, Option[String])]]
    val q = readVersions(log, "maxVersionsPerTrigger" -> "1")
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        batches.put(id, df.select("x", "y").collect()
          .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq.sortBy(_._1))
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // batch 0's files predate y: the stream must emit them null-filled (the
    // unconformed select threw AnalysisException and wedged the offset)
    assert(batches.toSeq.sortBy(_._1) == Seq(
      (0L, Seq((1L, None), (2L, None))),
      (1L, Seq((3L, Some("a")), (4L, Some("b"))))))
  }

  test("checkpoint recovery: a restarted query resumes at the committed version") {
    val root = java.nio.file.Files.createTempDirectory("txnstream_rec").toString
    val log = s"$root/_log"
    TxnLog.commit(log, 0, Seq(fileOf(root, Seq(1L, 2L).toDF("x"), "f0")), Nil)
    TxnLog.commit(log, 1, Seq(fileOf(root, Seq(3L).toDF("x"), "f1")), Nil)
    def drain(): Seq[Seq[Long]] = {
      val got = scala.collection.concurrent.TrieMap.empty[Long, Seq[Long]]
      val q = readVersions(log)
        .writeStream
        .foreachBatch { (df: DataFrame, id: Long) =>
          got.put(id, df.select("x").collect().map(_.getLong(0)).toSeq.sorted)
          ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      try q.processAllAvailable()
      finally q.stop()
      got.toSeq.sortBy(_._1).map(_._2)
    }
    assert(drain() == Seq(Seq(1L, 2L, 3L)))
    // two more versions while the stream is DOWN; restart reads only them
    TxnLog.commit(log, 2, Seq(fileOf(root, Seq(4L).toDF("x"), "f2")), Nil)
    TxnLog.commit(log, 3, Seq(fileOf(root, Seq(5L, 6L).toDF("x"), "f3")), Nil)
    assert(drain() == Seq(Seq(4L, 5L, 6L)))
    // nothing new → no batch at all
    assert(drain() == Nil)
  }

  test("append-only contract: change commits refuse; skipChangeCommits consumes them with zero rows") {
    val root = java.nio.file.Files.createTempDirectory("txnstream_chg").toString
    val log = s"$root/_log"
    val f0 = fileOf(root, Seq(1L, 2L, 3L).toDF("x"), "f0")
    TxnLog.commit(log, 0, Seq(f0), Nil)
    TxnLog.commit(log, 1, Seq(fileOf(root, Seq(4L).toDF("x"), "f1")), Nil)
    // v2 rewrites f0 — a change commit
    TxnLog.commit(log, 2, Seq(fileOf(root, Seq(9L).toDF("x"), "f0b")), Seq(f0))
    TxnLog.commit(log, 3, Seq(fileOf(root, Seq(5L).toDF("x"), "f2")), Nil)
    val strict = readVersions(log).writeStream
      .format("memory").queryName("txn_strict").start()
    val failed =
      try { strict.processAllAvailable(); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true
              case e: Exception if e.getMessage != null && e.getMessage.contains("graft-txnlog") => true }
      finally strict.stop()
    assert(failed)
    val got = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val q = readVersions(log, "skipChangeCommits" -> "true", "maxVersionsPerTrigger" -> "1")
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) => got.put(id, df.count()); () }
      .option("checkpointLocation", s"$root/ckpt2")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // v0, v1, v2 (skipped → 0 rows), v3
    assert(got.toSeq.sortBy(_._1).map(_._2) == Seq(3L, 1L, 0L, 1L))
  }
}
