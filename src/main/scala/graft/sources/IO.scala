package graft.sources

import org.apache.spark.sql.{AnalysisException, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Constants, FileSchema}

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Readers: suffix-dispatched scan with optional declared schema and
  * FileSchema renames/ignores
  * (ref behaviors: dsgrid/spark/functions.py:402-494, dsgrid/utils/spark.py:173-277,
  * dsgrid/config/file_schema.py:80-190). */
object Readers {

  /** Parquet scan — Catalyst handles pushdown/pruning; nothing manual. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Header CSV with optional declared schema (infer when absent). */
  def csv(spark: SparkSession, path: String, schema: Option[FileSchema] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema.flatMap(_.toStructType) match {
      case Some(st) => base.schema(st).csv(path)
      case None => base.option("inferSchema", "true").csv(path)
    }
  }

  /** Line-delimited JSON, strict (ref FAILFAST: dsgrid/spark/functions.py:469-484). */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mode", "FAILFAST").json(path)

  /** ORC scan — the other columnar format Spark ships natively (the
    * reference is parquet-only; warehouse interop needs ORC too). Same
    * pushdown/pruning behavior as parquet via the vectorized ORC reader. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Plain-text scan: one row per line, single `value` string column —
    * the lowest-common-denominator corpus interchange format. */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Schema-evolution read: multiple parquet roots written at different
    * schema versions, reconciled by field NAME (`mergeSchema`) — columns
    * absent in older files surface as NULL. This is the scan-side answer
    * to additive schema evolution over years of 100 TB partitions: no
    * rewrite of old data, one footer-merge pass at planning time (footers
    * only — data pages are untouched until the scan). */
  def parquetMerged(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** Suffix dispatch (ref: dsgrid/utils/spark.py:173-277). */
  def read(spark: SparkSession, path: String, schema: Option[FileSchema] = None): DataFrame = {
    val p = path.toLowerCase
    val df =
      if (p.endsWith(".csv")) csv(spark, path, schema)
      else if (p.endsWith(".json")) json(spark, path)
      else parquet(spark, path)
    schema.map(applyFileSchema(df, _)).getOrElse(df)
  }

  /** Read with invalid-file recovery: a corrupt/truncated part file fails
    * the whole scan (lazily, mid-job); sweep the directory for files whose
    * trailing magic isn't PAR1 and delete them before reading — 4 bytes of
    * IO per file, local-FS scratch/cache dirs only, where files are
    * reproducible (ref: dsgrid/utils/spark.py:173-277 deletes corrupt
    * parquet and retries). */
  def readWithRecovery(spark: SparkSession, path: String): DataFrame = {
    val dir = Paths.get(path)
    if (Files.isDirectory(dir)) {
      Files.walk(dir).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet") && isCorruptParquet(p))
        .foreach(Files.delete)
    }
    parquet(spark, path)
  }

  private def isCorruptParquet(p: Path): Boolean = {
    // valid parquet ends with the 4-byte magic "PAR1"
    val size = Files.size(p)
    if (size < 8) return true
    val ch = Files.newByteChannel(p)
    try {
      ch.position(size - 4)
      val buf = java.nio.ByteBuffer.allocate(4)
      ch.read(buf)
      !java.util.Arrays.equals(buf.array(), "PAR1".getBytes("US-ASCII"))
    } finally ch.close()
  }

  /** Apply FileSchema ignore-columns and rename-to-dimension mappings. */
  def applyFileSchema(df: DataFrame, fs: FileSchema): DataFrame = {
    val dropped = if (fs.ignoreColumns.nonEmpty) df.drop(fs.ignoreColumns: _*) else df
    fs.renames.foldLeft(dropped) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
  }

  /** Cross-product generator: map of column → id list to the DataFrame of
    * their cartesian product. The reference stages this through partitioned
    * CSV to dodge a Python-RPC bottleneck (dsgrid/utils/spark.py:736-819,
    * comment :752-770); in-JVM a fold of broadcast crossJoins is exact and
    * distributed — each list is tiny, the product is built on executors. */
  def crossProduct(spark: SparkSession, ids: Seq[(String, Seq[String])]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bc}
    require(ids.nonEmpty, "crossProduct needs at least one column")
    ids.map { case (name, values) =>
      spark.createDataFrame(values.map(Tuple1(_))).toDF(name)
    }.reduce((a, b) => a.crossJoin(bc(b)))
  }

  /** Read a dir of per-table parquet files as named temp views, so callers
    * can run SQL against the TESTDATA layout. */
  def registerDir(spark: SparkSession, dir: String): Unit = {
    val d = Paths.get(dir)
    Files.list(d).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .foreach { f =>
        val name = f.getFileName.toString.stripSuffix(".parquet")
        spark.read.parquet(f.toString).createOrReplaceTempView(name)
      }
  }
}

/** Small text files via the Hadoop FS API (sidecars, format metadata) —
  * one implementation shared by the registry and the Submitter so the
  * tree works on HDFS/S3/local alike. */
object HadoopText {

  def write(spark: SparkSession, path: String, text: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(hp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, path: String): String = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hp)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}

/** Writers: plain + auto-partitioned parquet, header CSV, in-place
  * overwrite, persist-intermediate
  * (ref: dsgrid/utils/spark.py:474-671, dsgrid/spark/functions.py:578-589). */
object Writers {

  def parquet(df: DataFrame, path: String, overwrite: Boolean = true): Unit =
    df.write.mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists).parquet(path)

  /** Write parquet, then if the produced files are badly sized, rewrite with
    * a partition count targeting ~`targetMb` files. Mirrors the reference's
    * algorithm (dsgrid/utils/spark.py:530-630): skip entirely when the file
    * count is already below `minNumPartitions` (coalescing further would
    * reduce parallelism for downstream reads), skip when actual is within
    * `rtolPct`% of desired, coalesce down / repartition up (optionally on
    * columns) otherwise. Two-pass by design: sizes are only knowable after
    * the first write. */
  def parquetAutoPartition(
      spark: SparkSession,
      df: DataFrame,
      path: String,
      targetMb: Int = Constants.MaxPartitionSizeMb,
      rtolPct: Double = 50.0,
      minNumPartitions: Int = Constants.MinWritePartitions,
      columns: Seq[String] = Nil): Unit = {
    parquet(df, path)
    val files = listFiles(Paths.get(path), ".parquet")
    if (files.isEmpty || files.length < minNumPartitions) return
    val totalBytes = files.map(f => Files.size(f)).sum
    val targetBytes = targetMb.toLong * 1024 * 1024
    val desired = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val actual = files.length
    if (math.abs(actual - desired).toDouble / desired * 100 >= rtolPct) {
      val base = spark.read.parquet(path)
      val rewritten =
        if (actual > desired) base.coalesce(desired)
        else if (columns.nonEmpty) base.repartition(desired, columns.map(org.apache.spark.sql.functions.col): _*)
        else base.repartition(desired)
      val tmp = path + ".graft-tmp"
      parquet(rewritten, tmp)
      deleteRecursively(Paths.get(path))
      Files.move(Paths.get(tmp), Paths.get(path))
    }
  }

  /** Hive-style partitioned parquet: one directory level per partition
    * column, so reads filtered on those columns prune whole directories
    * before any IO (PartitionFilters in the scan, not data filters) — the
    * first-line data-skipping lever for time-series at 100 TB (partition by
    * date/year, never by a high-cardinality key). `sortWithin` additionally
    * sorts rows inside each file so parquet row-group min/max stats skip
    * within files for range predicates on those columns. */
  def parquetPartitionedBy(
      df: DataFrame,
      path: String,
      partitionColumns: Seq[String],
      sortWithin: Seq[String] = Nil,
      repartitionFirst: Boolean = true): Unit = {
    require(partitionColumns.nonEmpty, "parquetPartitionedBy needs at least one partition column")
    // Without the repartition every input task opens a writer in EVERY
    // partition directory — tasks × partitions small files and as many
    // commit-time renames (the classic partitioned-write explosion; at
    // q59's 30-day layout it was the single slowest query in the bench).
    // One shuffle on the partition key gives each task whole directories.
    // Opt out for inputs already clustered by the partition columns, or
    // when one giant partition value would serialize into one task.
    val placed =
      if (repartitionFirst)
        df.repartition(partitionColumns.map(org.apache.spark.sql.functions.col): _*)
      else df
    val sorted =
      if (sortWithin.nonEmpty)
        placed.sortWithinPartitions((partitionColumns ++ sortWithin)
          .map(org.apache.spark.sql.functions.col): _*)
      else placed
    sorted.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionColumns: _*)
      .parquet(path)
  }

  /** Header CSV; single file via coalesce(1) when asked. */
  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** Line-delimited JSON sink — the counterpart of Readers.json's strict
    * FAILFAST scan. */
  def json(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode(SaveMode.Overwrite).json(path)
  }

  /** Plain-text sink: writes the single string column as raw lines. */
  def text(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  /** ORC sink — columnar interop with Hive-ecosystem warehouses. */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Warehouse sink: saveAsTable + read back (ref: dsgrid/utils/
    * spark.py:675-733). On a cluster this is the metastore-backed handoff.
    * With the in-memory catalog, a previous session's managed-table
    * location survives on disk while the table itself is forgotten —
    * saveAsTable then fails with LOCATION_ALREADY_EXISTS; drop both the
    * table and any stale location first. */
  def toTable(spark: SparkSession, df: DataFrame, table: String): DataFrame = {
    dropTableAndStaleLocation(spark, table)
    df.write.mode(SaveMode.Overwrite).saveAsTable(table)
    spark.table(table)
  }

  /** Bucketed warehouse sink — the write-once co-location lever at 100 TB:
    * the shuffle happens ONCE at write time, and every later equi-join or
    * aggregation keyed on the bucket columns between same-bucketed tables
    * runs shuffle-free (Spark reads bucket files as pre-hashed partitions).
    * The reference approximates this with repartitioned-parquet conventions;
    * bucketing is the catalog-backed Spark-native form. `sortColumns` adds
    * per-bucket sort so sort-merge joins skip the sort too. */
  def toBucketedTable(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      bucketColumns: Seq[String],
      numBuckets: Int,
      sortColumns: Seq[String] = Nil): DataFrame = {
    require(bucketColumns.nonEmpty, "toBucketedTable needs at least one bucket column")
    dropTableAndStaleLocation(spark, table)
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketColumns.head, bucketColumns.tail: _*)
    val sorted =
      if (sortColumns.nonEmpty) w.sortBy(sortColumns.head, sortColumns.tail: _*) else w
    sorted.saveAsTable(table)
    spark.table(table)
  }

  /** Drop a table AND any stale on-disk location a previous in-memory
    * catalog session left behind (saveAsTable refuses to reuse it).
    * Database-qualified names quote each part separately (backticking the
    * whole of `db.table` would target a table literally named "db.table"
    * in the current database) and resolve the managed location under the
    * warehouse's `<db>.db/<table>` layout. */
  private def dropTableAndStaleLocation(spark: SparkSession, table: String): Unit = {
    val (db, tbl) = table.split('.') match {
      case Array(d, t) => (Some(d), t)
      case _ => (None, table)
    }
    val quoted = db.map(d => s"`$d`.`$tbl`").getOrElse(s"`$tbl`")
    spark.sql(s"DROP TABLE IF EXISTS $quoted")
    val relative = db.map(d => s"${d.toLowerCase}.db/${tbl.toLowerCase}").getOrElse(tbl.toLowerCase)
    val loc = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), relative)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Spark can't overwrite an input path in place: write tmp, swap, re-read
    * (ref: dsgrid/utils/spark.py:474-499). */
  def overwriteInPlace(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val tmp = path + ".graft-tmp"
    parquet(df, tmp)
    deleteRecursively(Paths.get(path))
    Files.move(Paths.get(tmp), Paths.get(path))
    spark.read.parquet(path)
  }

  /** Materialize an intermediate to scratch parquet and read it back — cuts
    * the lineage when a plan grows too complex for Catalyst to handle well
    * (ref: dsgrid/utils/spark.py:502-527). With `reuseExisting`, an
    * already-written intermediate is read back instead of recomputed — the
    * resume path for interrupted mapping plans
    * (ref: dsgrid/query/dataset_mapping_manager.py:51-103). */
  def persistIntermediate(
      spark: SparkSession,
      df: DataFrame,
      scratchDir: String,
      name: String,
      reuseExisting: Boolean = false): DataFrame = {
    val path = s"$scratchDir/$name.parquet"
    if (reuseExisting) {
      // _SUCCESS, not mere existence: an interrupted previous write — the
      // exact scenario resume exists for — leaves a dir without the marker
      // and must be recomputed, not read half-finished
      val marker = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(marker)) return spark.read.parquet(path)
    }
    parquet(df, path)
    spark.read.parquet(path)
  }

  /** Small-file compaction — the table-maintenance pass every long-lived
    * 100 TB dataset needs: streaming/incremental writers leave thousands of
    * KB-sized files whose per-file open/footer/task overhead eventually
    * dominates scan cost. Rewrite `path` in place into
    * ⌈total_bytes / targetFileBytes⌉ files.
    *
    * The file count comes from the INPUT's actual on-disk bytes (Hadoop
    * listing — no data pass), and the rewrite is one `repartition(n)`
    * round-robin shuffle, so output files are near-uniform regardless of
    * input skew. Row content is untouched (compaction is layout, not
    * semantics — the content-identity oracle checks exactly that).
    * Parallelism note: coalesce(n) would avoid the shuffle but caps the
    * read parallelism at n and inherits input skew; for a maintenance pass
    * that runs off the critical path, uniform output wins. */
  def compactFiles(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long): DataFrame = {
    require(targetFileBytes > 0, "compactFiles: targetFileBytes must be positive")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hp).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    overwriteInPlace(spark, spark.read.parquet(path).repartition(n), path)
  }

  private def listFiles(dir: Path, suffix: String): Seq[Path] =
    if (!Files.isDirectory(dir)) Nil
    else Files.walk(dir).iterator().asScala.filter(p => p.toString.endsWith(suffix)).toSeq

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder()).iterator().asScala
        .foreach(Files.delete)
    }
}
