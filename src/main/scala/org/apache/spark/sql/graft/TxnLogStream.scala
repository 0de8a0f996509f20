package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.TxnLog

/** STREAMING SOURCE over the transaction-log table — the read half of the
  * lakehouse streaming pair (the write half is the exactly-once sink,
  * `TxnLog.appendBatch`): each committed VERSION is a micro-batch unit,
  * offsets are version numbers, and a checkpoint-recovered query resumes
  * from the exact version it last processed — the Delta streaming-source
  * contract (ref `dsgrid` versions configs, not tables; this is scale
  * surface).
  *
  * Semantics:
  *   - append-only reads: a version that CHANGES existing data (removes a
  *     file or commits a deletion vector) REFUSES by default — silently
  *     re-emitting rewritten rows would double-count; with
  *     `skipChangeCommits=true` such versions are consumed with zero rows
  *     (Delta's `skipChangeCommits`);
  *   - `maxVersionsPerTrigger` rate-limits each micro-batch (Delta's
  *     `maxFilesPerTrigger` shape) — backfill over a long history
  *     proceeds in bounded steps;
  *   - each batch reads ONLY the files its versions added — cost ∝ new
  *     data, never table size. The files are read through the ordinary
  *     parquet scan (column pruning and pushdown intact), then re-tagged
  *     as a streaming frame (`internalCreateDataFrame(isStreaming=true)`,
  *     the FileStreamSource pattern — why this lives in the sql bridge
  *     package).
  *
  * V1 Source deliberately: the version→files→DataFrame resolution is
  * driver-side metadata, exactly what the V1 `getBatch` contract wants;
  * the DSv2 MicroBatchStream adds partition-planning machinery this
  * source has no use for (the parquet scan already plans partitions).
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("org.apache.spark.sql.graft.TxnLogStreamProvider")
  *   .option("logDir", "/path/_log")
  *   .option("maxVersionsPerTrigger", "1")
  *   .load()
  * }}} */
class TxnLogStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-txnlog"

  private def logDirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("logDir", parameters.getOrElse("logdir",
      throw new IllegalArgumentException("graft-txnlog: option 'logDir' is required")))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val logDir = logDirOf(parameters)
    val latest = TxnLog.latestVersion(logDir).getOrElse(
      throw new IllegalArgumentException(
        s"graft-txnlog: no commits in $logDir — the source needs version 0 to infer a schema"))
    ("graft-txnlog", schema.getOrElse(
      TxnLog.readAsOf(sqlContext.sparkSession, logDir, latest).schema))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val logDir = logDirOf(parameters)
    val inferred = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new TxnLogSource(
      sqlContext,
      logDir,
      inferred,
      maxVersionsPerTrigger =
        parameters.get("maxVersionsPerTrigger").map(_.toLong).getOrElse(Long.MaxValue),
      skipChangeCommits =
        parameters.get("skipChangeCommits").exists(_.toBoolean))
  }
}

class TxnLogSource(
    sqlContext: SQLContext,
    logDir: String,
    override val schema: StructType,
    maxVersionsPerTrigger: Long,
    skipChangeCommits: Boolean) extends Source {
  require(maxVersionsPerTrigger >= 1,
    s"graft-txnlog: maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")

  private val spark =
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Highest version offered to the engine so far (rate-limit cursor).
    * -1 = nothing offered; recovery re-seeds it from getBatch's start. */
  private var offered: Long = -1L

  private def toVersion(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case SerializedOffset(json) => json.trim.toLong
    case other => throw new IllegalStateException(s"graft-txnlog: alien offset $other")
  }

  /** The offset is the highest version whose rows are INCLUDED. */
  override def getOffset: Option[V1Offset] = {
    val head = TxnLog.latestVersion(logDir).getOrElse(return None)
    // overflow-safe rate step: offered + maxVersionsPerTrigger can wrap
    // when the option is unset (Long.MaxValue)
    val step = math.min(maxVersionsPerTrigger, head - offered)
    if (step > 0) offered += step
    if (offered < 0) None else Some(LongOffset(offered))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val fromExclusive = start.map(toVersion).getOrElse(-1L)
    val toInclusive = toVersion(end)
    // recovery: a restarted query replays getBatch from its checkpoint
    // before ever calling getOffset — keep the rate-limit cursor ahead of
    // everything already committed downstream
    offered = math.max(offered, toInclusive)
    val files = (fromExclusive + 1 to toInclusive).flatMap { v =>
      if (TxnLog.isChangeCommit(logDir, v)) {
        if (!skipChangeCommits) throw new IllegalStateException(
          s"graft-txnlog: version $v of $logDir changes existing data; " +
            "append-only streaming read refuses (set skipChangeCommits=true to skip such versions)")
        Nil
      } else TxnLog.addedFiles(logDir, v)
    }
    val batch =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        // a batch whose files predate a schema-evolution column must
        // null-fill it (mirroring TxnLog.changesBetween's conform step) —
        // selecting a column the batch's merged schema lacks would throw
        // AnalysisException and permanently wedge the stream at this offset
        val read = spark.read.option("mergeSchema", "true").parquet(files: _*)
        val present = read.columns.toSet
        read.select(schema.fields.map { f =>
          (if (present.contains(f.name)) org.apache.spark.sql.functions.col(f.name)
           else org.apache.spark.sql.functions.lit(null))
            .cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
      }
    spark.internalCreateDataFrame(
      batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def commit(end: V1Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"TxnLogSource[$logDir]"
}
