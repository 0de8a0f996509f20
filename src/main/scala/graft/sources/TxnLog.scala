package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transaction-log table layout — the Delta/Iceberg commit-log
  * pattern reduced to its load-bearing core: a table IS a log of versioned
  * commits, each an ordered list of `add` / `remove` file actions; any
  * historical state is recovered by replaying the log to a version. This
  * completes the repo's lakehouse family (SCD2 time travel reads ROW
  * history; this reads FILE-LAYOUT history — compaction, appends and
  * deletes become time-travelable without touching row contents).
  *
  * Scale notes: the log is metadata — one tiny JSON-lines file per commit,
  * written via temp+rename (the atomic-publish move a real lakehouse uses);
  * snapshot resolution reads only the ≤ version log files, never data.
  * Readers get a plain parquet DataFrame over the resolved file set, so
  * every downstream operator (including column pruning and pushdown) works
  * unchanged.
  *
  * Reference scope: the reference registry versions CONFIGS; file-level
  * table versioning is part of the scale extension surface.
  */
object TxnLog {

  private def logFile(logDir: String, version: Long) =
    new java.io.File(logDir, f"_v$version%06d.json")

  /** Append one commit. Versions must be dense from 0 (the contract that
    * makes "latest" unambiguous without a catalog); `adds`/`removes` are
    * absolute file paths. A remove of a file not live at this version
    * REFUSES — it means the caller's view of the table has diverged.
    * `dvs` attach deletion-vector files (see [[deleteMergeOnRead]]) —
    * metadata-only row-level deletes that accumulate until the rows'
    * data files are rewritten. */
  def commit(
      logDir: String,
      version: Long,
      adds: Seq[String],
      removes: Seq[String],
      dvs: Seq[String] = Nil,
      /** opaque markers carried in the commit (e.g. `batch:<id>` for the
        * exactly-once streaming sink) — ignored by file-set replay */
      meta: Seq[String] = Nil): Unit = {
    val dir = new java.io.File(logDir)
    dir.mkdirs()
    require(version == latestVersion(logDir).map(_ + 1).getOrElse(0L),
      s"txn log: version $version is not the next dense version in $logDir")
    if (removes.nonEmpty) {
      val live = liveFiles(logDir, version - 1)
      removes.foreach(f => require(live.contains(f),
        s"txn log: cannot remove $f — not live at version ${version - 1}"))
    }
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val lines =
      adds.map(f => s"""{"action":"add","file":"${esc(f)}"}""") ++
        removes.map(f => s"""{"action":"remove","file":"${esc(f)}"}""") ++
        dvs.map(f => s"""{"action":"dv","file":"${esc(f)}"}""") ++
        meta.map(m => s"""{"action":"meta","file":"${esc(m)}"}""")
    val tmp = java.io.File.createTempFile("_graft_txn", ".json", dir)
    java.nio.file.Files.write(tmp.toPath,
      lines.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // rename is the atomic publish: the commit exists entirely or not at all
    require(tmp.renameTo(logFile(logDir, version)),
      s"txn log: atomic publish of version $version failed")
  }

  def latestVersion(logDir: String): Option[Long] = {
    val files = Option(new java.io.File(logDir).listFiles()).getOrElse(Array.empty)
    val vs = files.filter(_.getName.matches("_v\\d{6}\\.json"))
      .map(_.getName.stripPrefix("_v").stripSuffix(".json").toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def watermarkFile(logDir: String) = new java.io.File(logDir, "_vacuum.json")

  /** Oldest version still readable (0 unless [[vacuum]] raised it). */
  def retainedFrom(logDir: String): Long = {
    val f = watermarkFile(logDir)
    if (!f.exists()) 0L
    else java.nio.file.Files.readString(f.toPath)
      .split("\"retain_from\":")(1).takeWhile(_.isDigit).toLong
  }

  /** The live file set after replaying commits 0..asOf (inclusive). */
  def liveFiles(logDir: String, asOf: Long): Set[String] = {
    val latest = latestVersion(logDir).getOrElse(
      throw new IllegalArgumentException(s"txn log: no commits in $logDir"))
    require(asOf >= 0 && asOf <= latest,
      s"txn log: version $asOf out of range [0, $latest]")
    require(asOf >= retainedFrom(logDir),
      s"txn log: version $asOf was expired by vacuum (oldest retained: ${retainedFrom(logDir)})")
    var live = Set.empty[String]
    (0L to asOf).foreach { v =>
      val lines = java.nio.file.Files.readAllLines(logFile(logDir, v).toPath)
      lines.forEach { line =>
        if (line.nonEmpty) {
          // two-field fixed-shape records: split-level parsing is exact
          val file = line.split("\"file\":\"")(1).stripSuffix("\"}").replace("\\\"", "\"")
            .replace("\\\\", "\\")
          if (line.contains("\"action\":\"add\"")) live += file
          else if (line.contains("\"action\":\"remove\"")) live -= file
          // "dv" actions are row-level metadata — they never change the
          // live DATA file set
        }
      }
    }
    live
  }

  /** Expire snapshots older than `retainFrom` and physically delete the
    * data files no retained version references (ref shape: Delta VACUUM /
    * Iceberg expire_snapshots — the admin affordance that keeps a table
    * from growing forever, the file-level sibling of the registry's
    * deleteVersion). The log itself stays (history metadata is tiny); a
    * `_vacuum.json` watermark makes expired-version reads REFUSE with the
    * oldest retained version named, instead of failing mid-scan on a
    * missing file. Deletion-vector files are always kept: vectors
    * accumulate, so any retained version may depend on one committed
    * before the watermark. The watermark is monotone — vacuuming to an
    * older version than the current watermark refuses. Returns the
    * physically deleted data files (sorted). */
  def vacuum(logDir: String, retainFrom: Long): Seq[String] = {
    val latest = latestVersion(logDir).getOrElse(
      throw new IllegalArgumentException(s"txn log: no commits in $logDir"))
    require(retainFrom >= 0 && retainFrom <= latest,
      s"txn log: retainFrom $retainFrom out of range [0, $latest]")
    require(retainFrom >= retainedFrom(logDir),
      s"txn log: watermark is monotone — already vacuumed to ${retainedFrom(logDir)}")
    val referenced = (retainFrom to latest).flatMap(liveFiles(logDir, _)).toSet
    // every data file ever added, straight from the log
    val allAdds = (0L to latest).flatMap { v =>
      java.nio.file.Files.readAllLines(logFile(logDir, v).toPath)
        .toArray(Array.empty[String]).toSeq
        .filter(_.contains("\"action\":\"add\""))
        .map(_.split("\"file\":\"")(1).stripSuffix("\"}").replace("\\\"", "\"")
          .replace("\\\\", "\\"))
    }.toSet
    val doomed = (allAdds -- referenced).toSeq.sorted
    // publish the watermark FIRST: a reader racing the deletes sees the
    // refusal, never a half-deleted snapshot
    java.nio.file.Files.writeString(watermarkFile(logDir).toPath,
      s"""{"retain_from":$retainFrom}""")
    doomed.foreach(f => new java.io.File(f).delete())
    doomed
  }

  /** Deletion-vector files committed in versions 0..asOf (inclusive). */
  def dvFiles(logDir: String, asOf: Long): Set[String] = {
    val latest = latestVersion(logDir).getOrElse(
      throw new IllegalArgumentException(s"txn log: no commits in $logDir"))
    require(asOf >= 0 && asOf <= latest,
      s"txn log: version $asOf out of range [0, $latest]")
    var dvs = Set.empty[String]
    (0L to asOf).foreach { v =>
      java.nio.file.Files.readAllLines(logFile(logDir, v).toPath).forEach { line =>
        if (line.nonEmpty && line.contains("\"action\":\"dv\"")) {
          dvs += line.split("\"file\":\"")(1).stripSuffix("\"}").replace("\\\"", "\"")
            .replace("\\\\", "\\")
        }
      }
    }
    dvs
  }

  /** Snapshot read AS OF a version: parquet over the resolved file set
    * with SCHEMA MERGING — the table's schema is the union of its live
    * files' schemas, so a column added by a later commit (schema
    * evolution) reads as null from pre-evolution files, the Delta/Iceberg
    * add-column semantics. Footer-union cost is per-file metadata. */
  def readAsOf(spark: SparkSession, logDir: String, asOf: Long): DataFrame = {
    val files = liveFiles(logDir, asOf).toSeq.sorted
    require(files.nonEmpty, s"txn log: version $asOf has no live files")
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Snapshot read with deletion vectors applied — the merge-on-read path:
    * live files scan as usual, then one anti-join against the accumulated
    * (file, pos) delete set drops the dead rows. Row identity is the
    * parquet physical row position (`_metadata.row_index` — stable for a
    * file, and a rewritten file gets a new path so stale DV entries can
    * never hit it). The DV table is deleted-rows-sized metadata; Spark
    * broadcasts it when small, which is the common case. */
  def readAsOfWithDeletes(spark: SparkSession, logDir: String, asOf: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val base = readAsOf(spark, logDir, asOf)
    val dvs = dvFiles(logDir, asOf).toSeq.sorted
    if (dvs.isEmpty) base
    else {
      val dv = spark.read.parquet(dvs: _*)
        .select(col("file").as("__graft_file"), col("pos").as("__graft_pos"))
        .distinct()
      base
        .withColumn("__graft_file", input_file_name())
        .withColumn("__graft_pos", col("_metadata.row_index"))
        .join(dv, Seq("__graft_file", "__graft_pos"), "left_anti")
        .drop("__graft_file", "__graft_pos")
    }
  }

  /** DELETE WHERE, merge-on-read (the Delta deletion-vector / Iceberg v2
    * position-delete path — the complement of [[mergeCopyOnWrite]]): rows
    * of the CURRENT visible snapshot matching `predicate` are recorded as
    * (file, row-position) pairs in a deletion-vector file; NO data file is
    * read-modified-written. Write cost is proportional to the deleted row
    * COUNT, not to the table — which is why row-level deletes on a
    * trillion-row table (GDPR erasure, late-data retraction) run as
    * metadata commits, deferring the rewrite to the next compaction or
    * copy-on-write merge of those files. Returns the committed version. */
  def deleteMergeOnRead(
      spark: SparkSession,
      logDir: String,
      dvOutDir: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val v = latestVersion(logDir).getOrElse(
      throw new IllegalArgumentException(s"txn log: no commits in $logDir"))
    val files = liveFiles(logDir, v).toSeq.sorted
    require(files.nonEmpty, s"txn log: version $v has no live files")
    // predicate applies to the VISIBLE snapshot: rows already dead under an
    // earlier DV must not re-enter the new vector (entry count stays the
    // honest "rows this delete killed")
    val existing = dvFiles(logDir, v).toSeq.sorted
    val marked = spark.read.option("mergeSchema", "true").parquet(files: _*)
      .withColumn("__graft_file", input_file_name())
      .withColumn("__graft_pos", col("_metadata.row_index"))
      .filter(predicate)
    val visible =
      if (existing.isEmpty) marked
      else marked.join(
        spark.read.parquet(existing: _*)
          .select(col("file").as("__graft_file"), col("pos").as("__graft_pos"))
          .distinct(),
        Seq("__graft_file", "__graft_pos"), "left_anti")
    visible.select(col("__graft_file").as("file"), col("__graft_pos").as("pos"))
      .coalesce(1).write.mode("overwrite").parquet(dvOutDir)
    val dvFile = new java.io.File(dvOutDir).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"delete: no parquet written under $dvOutDir"))
      .getAbsolutePath
    commit(logDir, v + 1, adds = Nil, removes = Nil, dvs = Seq(dvFile))
    v + 1
  }

  /** Batch ids already committed via [[appendBatch]] (from `batch:<id>`
    * meta markers). */
  def committedBatchIds(logDir: String): Set[Long] =
    latestVersion(logDir).map { latest =>
      (0L to latest).flatMap { v =>
        java.nio.file.Files.readAllLines(logFile(logDir, v).toPath)
          .toArray(Array.empty[String]).toSeq
          .filter(l => l.contains("\"action\":\"meta\"") && l.contains("batch:"))
          .map(_.split("batch:")(1).takeWhile(_.isDigit).toLong)
      }.toSet
    }.getOrElse(Set.empty)

  /** Exactly-once streaming append: the foreachBatch sink body for
    * ingesting a stream into a txn-log table. Structured Streaming
    * REPLAYS a micro-batch after failure with the SAME batch id; recording
    * the id as a commit marker and skipping already-committed ids makes
    * the table-level append idempotent — the replayed batch becomes a
    * no-op instead of duplicate rows (the same contract q190's serving
    * sink implements with per-batch overwrite, here as an append-only
    * versioned table where every micro-batch stays time-travelable).
    * Returns true when the batch committed, false when skipped. */
  def appendBatch(
      logDir: String,
      dataDir: String,
      batch: DataFrame,
      batchId: Long): Boolean = {
    if (committedBatchIds(logDir).contains(batchId)) return false
    val outDir = s"$dataDir/batch_$batchId"
    batch.coalesce(1).write.mode("overwrite").parquet(outDir)
    val file = new java.io.File(outDir).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"appendBatch: no parquet under $outDir"))
      .getAbsolutePath
    val next = latestVersion(logDir).map(_ + 1).getOrElse(0L)
    commit(logDir, next, adds = Seq(file), removes = Nil, meta = Seq(s"batch:$batchId"))
    true
  }

  /** Change data feed between two versions (Delta CDF / Iceberg
    * changelog-scan shape): the row-level delta derived from the
    * FILE-level log diff — only files that changed hands between the
    * versions (plus files referenced by new deletion vectors) are read;
    * carried files contribute zero IO, so the cost scales with the CHANGE,
    * not the table. A row rewritten verbatim into a new file (the carried
    * part of a copy-on-write merge) cancels in the content-level
    * EXCEPT ALL and correctly emits nothing. Returns rows tagged
    * `change_type` ∈ {insert, delete} — an update appears as its
    * delete + insert pair, multiset-exact via EXCEPT ALL. */
  def changesBetween(
      spark: SparkSession,
      logDir: String,
      fromV: Long,
      toV: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name, lit}
    require(fromV < toV, s"txn log: changesBetween needs fromV < toV, got [$fromV, $toV]")
    val before = liveFiles(logDir, fromV)
    val after = liveFiles(logDir, toV)
    val newDvs = (dvFiles(logDir, toV) -- dvFiles(logDir, fromV)).toSeq.sorted
    // files whose rows can differ: the symmetric file-set difference, plus
    // carried files hit by a NEW deletion vector
    val dvTouched: Set[String] =
      if (newDvs.isEmpty) Set.empty
      else {
        def canon(p: String): String =
          try new java.io.File(new java.net.URI(p).getPath).getAbsolutePath
          catch { case _: Exception => new java.io.File(p).getAbsolutePath }
        val hit = spark.read.parquet(newDvs: _*).select(col("file")).distinct()
          .collect().map(r => canon(r.getString(0))).toSet
        (before ++ after).filter(f => hit.contains(canon(f)))
      }
    val candidates = ((before diff after) ++ (after diff before) ++ dvTouched).toSeq.sorted
    val schema = readAsOf(spark, logDir, toV).schema
    def visibleIn(files: Seq[String], asOf: Long): DataFrame = {
      if (files.isEmpty)
        return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val dvs = dvFiles(logDir, asOf).toSeq.sorted
      val base = spark.read.option("mergeSchema", "true").parquet(files: _*)
      val deduped =
        if (dvs.isEmpty) base
        else base
          .withColumn("__graft_file", input_file_name())
          .withColumn("__graft_pos", col("_metadata.row_index"))
          .join(
            spark.read.parquet(dvs: _*)
              .select(col("file").as("__graft_file"), col("pos").as("__graft_pos"))
              .distinct(),
            Seq("__graft_file", "__graft_pos"), "left_anti")
          .drop("__graft_file", "__graft_pos")
      // conform to the TO-version schema so the EXCEPT ALL is well-typed
      // across a schema evolution: a column the from-side files predate
      // reads as null, exactly how those rows present post-evolution
      deduped.select(schema.fields.map { f =>
        if (deduped.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    }
    val visFrom = visibleIn(candidates.filter(before.contains), fromV)
    val visTo = visibleIn(candidates.filter(after.contains), toV)
    visTo.exceptAll(visFrom).withColumn("change_type", lit("insert"))
      .unionByName(visFrom.exceptAll(visTo).withColumn("change_type", lit("delete")))
  }

  /** MERGE INTO, copy-on-write (the Delta/Iceberg upsert): apply `updates`
    * — unique on `keyCol` — to the latest snapshot. Matched keys replace
    * their row, unmatched keys insert. ONLY files that CONTAIN a matched
    * key are rewritten; every other file carries over by reference with
    * zero data IO — the copy-on-write contract that bounds write
    * amplification to touched files, which is what makes a trillion-row
    * table upsertable (file attribution is one semi-join over
    * input_file_name, the same scan the rewrite needs anyway). The merge
    * publishes as ONE atomic commit (removes = touched, adds = the merged
    * file), so readers see the old or new snapshot, never a mix, and the
    * pre-merge version stays time-travelable.
    *
    * `outDir` receives the merged output (single-file here — the catalog's
    * data scale; a production writer would keep the snapshot's file-size
    * distribution). Returns the committed version. */
  def mergeCopyOnWrite(
      spark: SparkSession,
      logDir: String,
      outDir: String,
      updates: DataFrame,
      keyCol: String): Long = {
    import org.apache.spark.sql.functions.{col, count, input_file_name, lit}
    val v = latestVersion(logDir).getOrElse(
      throw new IllegalArgumentException(s"txn log: no commits in $logDir"))
    val files = liveFiles(logDir, v).toSeq.sorted
    val snap = spark.read.option("mergeSchema", "true").parquet(files: _*)
    require(updates.columns.sorted.sameElements(snap.columns.sorted),
      s"merge: updates schema ${updates.columns.mkString(",")} != table schema ${snap.columns.mkString(",")}")
    val dup = updates.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"merge: duplicate update key '${dup.headOption.map(_.get(0)).orNull}' — one row per key")
    val keys = updates.select(col(keyCol))
    // the merge MUST see the VISIBLE snapshot: reading raw files would
    // resurrect rows a deletion vector killed, both in file attribution
    // (a file whose only match is a dead row isn't touched) and in the
    // rewrite (dead rows must not be copied into the merged file)
    val dvs = dvFiles(logDir, v).toSeq.sorted
    def visible(df: DataFrame): DataFrame = {
      val marked = df
        .withColumn("__graft_file", input_file_name())
        .withColumn("__graft_pos", col("_metadata.row_index"))
      if (dvs.isEmpty) marked
      else marked.join(
        spark.read.parquet(dvs: _*)
          .select(col("file").as("__graft_file"), col("pos").as("__graft_pos"))
          .distinct(),
        Seq("__graft_file", "__graft_pos"), "left_anti")
    }
    def canon(p: String): String =
      try new java.io.File(new java.net.URI(p).getPath).getAbsolutePath
      catch { case _: Exception => new java.io.File(p).getAbsolutePath }
    // which files contain a matched VISIBLE key — driver-bounded by the file count
    val touchedCanon = visible(snap)
      .join(keys, Seq(keyCol), "left_semi")
      .select(col("__graft_file")).distinct().collect()
      .map(r => canon(r.getString(0))).toSet
    val touched = files.filter(f => touchedCanon.contains(canon(f)))
    require(touched.size == touchedCanon.size,
      s"merge: ${touchedCanon.size} matched files but only ${touched.size} resolve to logged paths")
    val merged =
      if (touched.isEmpty) updates
      else {
        val survivors = visible(spark.read.option("mergeSchema", "true").parquet(touched: _*))
          .drop("__graft_file", "__graft_pos")
          .join(keys, Seq(keyCol), "left_anti")
        // conform to the TABLE schema: survivors from pre-evolution files
        // null-fill columns a later commit added (Delta's CoW write shape)
        survivors.select(snap.schema.fields.map { f =>
          if (survivors.columns.contains(f.name)) col(f.name)
          else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*).unionByName(updates)
      }
    merged.coalesce(1).write.mode("overwrite").parquet(outDir)
    val outFile = new java.io.File(outDir).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"merge: no parquet written under $outDir"))
      .getAbsolutePath
    commit(logDir, v + 1, adds = Seq(outFile), removes = touched)
    v + 1
  }
}
