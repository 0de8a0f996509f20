package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analogues of the batch operators, for the
  * continuous-ingest side of a training-data pipeline (the reference is
  * batch-only — SURVEY §2.12; this module is a beyond-parity extension
  * built on `readStream → transform → writeStream`).
  *
  * Scale notes: every op here is incremental — watermarks bound state;
  * windowed aggregation uses Spark's streaming state store (RocksDB-backed
  * on clusters); dedup state is pruned at the watermark.
  */
object StreamOps {

  /** Watermarked tumbling/sliding-window aggregation of a value column. */
  def windowedAggregate(
      events: DataFrame,
      timestampColumn: String,
      windowDuration: String,
      slideDuration: Option[String] = None,
      watermark: String = "10 minutes",
      groupColumns: Seq[String] = Nil,
      aggName: String = "sum",
      valueColumn: String = graft.core.Constants.ValueColumn): DataFrame = {
    val fn = graft.operators.Aggregation.resolve(aggName)
    val win = slideDuration match {
      case Some(s) => window(col(timestampColumn), windowDuration, s)
      case None => window(col(timestampColumn), windowDuration)
    }
    events
      .withWatermark(timestampColumn, watermark)
      .groupBy(win +: groupColumns.map(col): _*)
      .agg(fn(col(valueColumn)).as(valueColumn))
  }

  /** Streaming gap-based sessionization via Spark's native session_window:
    * per key, events within `gap` of each other merge into one growing
    * session window; the watermark closes sessions and prunes state. The
    * batch analogue is graft.time.Sessionize (lag/sum window — streaming
    * can't use unbounded windows, session_window IS the incremental form). */
  def sessionize(
      events: DataFrame,
      timestampColumn: String,
      gap: String,
      keyColumns: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(timestampColumn, watermark)
      .groupBy(session_window(col(timestampColumn), gap) +: keyColumns.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(
        keyColumns.map(col) ++ Seq(
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events")): _*)

  /** Streaming exact dedup on key columns; state pruned at the watermark
    * (late duplicates beyond it may pass — the standard trade). */
  def dedupWithinWatermark(
      events: DataFrame,
      keyColumns: Seq[String],
      timestampColumn: String,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(timestampColumn, watermark)
      .dropDuplicatesWithinWatermark(keyColumns)

  /** Streaming content-hash dedup of documents: fingerprint then dedup on
    * the fingerprint — the streaming face of Dedup.exactDuplicateGroups. */
  def dedupStreamByContent(
      docs: DataFrame,
      textColumn: String,
      timestampColumn: String,
      watermark: String = "10 minutes"): DataFrame =
    dedupWithinWatermark(
      docs.withColumn("__graft_fp", graft.text.TextFunctions.fingerprint(col(textColumn))),
      Seq("__graft_fp"),
      timestampColumn,
      watermark)
      .drop("__graft_fp")

  /** Per-key running peak via mapGroupsWithState — the streaming face of the
    * peak-load report: emits the running max per key each trigger. */
  def runningPeak[K: Encoder](
      events: Dataset[(K, Double)]): Dataset[(K, Double)] = {
    implicit val doubleEnc: Encoder[Double] = Encoders.scalaDouble
    implicit val tupleEnc: Encoder[(K, Double)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaDouble)
    events
      .groupByKey(_._1)
      .mapGroupsWithState[Double, (K, Double)](GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[(K, Double)], state: GroupState[Double]) =>
          val prev = state.getOption.getOrElse(Double.NegativeInfinity)
          val peak = rows.foldLeft(prev)((m, r) => math.max(m, r._2))
          state.update(peak)
          (key, peak)
      }
  }

  /** Stream-stream inner interval join: match left and right events on the
    * key columns with |tsLeft - tsRight| <= `within`. BOTH sides carry
    * watermarks and the join condition carries the event-time interval
    * bound, which is what lets Spark prune join state (a keyed row is
    * dropped once the other side's watermark passes its interval) — the
    * unbounded-state trap of a bare stream-stream equi-join is the thing
    * this operator exists to avoid. Inner join only here: results are
    * emitted as soon as both sides arrive, and with a watermark delay that
    * covers the data's disorder the streamed result equals the batch join
    * exactly (append-mode deterministic).
    *
    * Column layout: key columns keep their names; non-key columns get
    * `leftSuffix`/`rightSuffix` to avoid collisions. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyColumns: Seq[String],
      timestampColumn: String,
      within: String,
      watermark: String = "10 minutes",
      leftSuffix: String = "_l",
      rightSuffix: String = "_r"): DataFrame = {
    require(keyColumns.nonEmpty, "intervalJoin: no key columns")
    def suffixed(df: DataFrame, suffix: String) = {
      val renamed = df.columns.foldLeft(df) { (d, c) =>
        if (keyColumns.contains(c)) d else d.withColumnRenamed(c, c + suffix)
      }
      renamed.withWatermark(timestampColumn + suffix, watermark)
    }
    val l = suffixed(left, leftSuffix)
    val r = suffixed(right, rightSuffix)
    val tl = col(timestampColumn + leftSuffix)
    val tr = col(timestampColumn + rightSuffix)
    val keysEq = keyColumns.map(k => l(k) === r(k)).reduce(_ && _)
    val bound = tr >= tl - expr(s"INTERVAL $within") && tr <= tl + expr(s"INTERVAL $within")
    l.join(r, keysEq && bound, "inner")
      // project the key columns once (both sides carry them post-join)
      .select(keyColumns.map(l(_)) ++
        l.columns.filterNot(keyColumns.contains).map(l(_)) ++
        r.columns.filterNot(keyColumns.contains).map(r(_)): _*)
  }

  /** Convenience writer: append stream to parquet with a checkpoint — the
    * standard durable sink layout. */
  def toParquet(df: DataFrame, path: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
}
