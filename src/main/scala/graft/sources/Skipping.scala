package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-based data skipping — the poor-lakehouse half of what table
  * formats (Delta/Iceberg) do with file-level column stats: keep a tiny
  * (file → min/max) manifest next to the data and plan range reads against
  * the MANIFEST, so a selective query opens only the files whose range
  * intersects the predicate. With range-clustered layout (repartitionByRange
  * or [[graft.operators.Zorder]] for multi-column locality) a point/range
  * query touches O(result) files instead of O(corpus).
  */
object Skipping {

  /** Per-file (min, max, rows) stats for `statsCol` over a parquet
    * directory — one full scan to bootstrap; on an incrementally-written
    * table, append each new file's row at write time instead and never
    * rescan. The manifest is aggregate-sized (one row per FILE), the
    * artifact a driver can hold for millions of files. */
  def buildManifest(spark: SparkSession, path: String, statsCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(statsCol)).as("min_v"),
        max(col(statsCol)).as("max_v"),
        count(lit(1)).as("rows"))

  /** Range read planned against the manifest: only files whose
    * [min_v, max_v] intersects [lo, hi] are opened; the residual filter
    * still applies (stats prune FILES, not rows). The file list is a
    * bounded driver collect — the same catalog-sized metadata every table
    * format resolves on the driver. */
  def readRange(
      spark: SparkSession,
      path: String,
      manifest: DataFrame,
      statsCol: String,
      lo: Double,
      hi: Double): (Seq[String], DataFrame) = {
    require(lo <= hi, s"readRange: empty interval [$lo, $hi]")
    val files = manifest
      .filter(col("min_v") <= hi && col("max_v") >= lo)
      .select("file").collect().map(_.getString(0)).toSeq.sorted
    val df =
      if (files.isEmpty)
        // no file intersects: schema from the base path, zero rows (the
        // constant-false filter folds to an empty relation at plan time)
        spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*).filter(col(statsCol).between(lo, hi))
    (files, df)
  }

  /** Value-level secondary index — the point-lookup complement of the
    * min/max manifest. On a column the layout is NOT clustered by,
    * per-file ranges all overlap and [[readRange]] prunes nothing; the
    * inverted (key → file) index maps each distinct key to exactly the
    * files containing it, so a point lookup opens O(result) files
    * regardless of layout. Index size ∝ distinct (key, file) pairs — a
    * columnar table itself, bucketable by key at scale so the lookup
    * probe is a partition-pruned scan, and maintainable incrementally
    * (append each new file's distinct keys at write time). */
  def buildValueIndex(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col(keyCol).as("key"), input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"))

  /** Point-lookup read planned against the value index: only files
    * containing at least one requested key open; the residual filter
    * still applies (a file holds other keys too). */
  def readKeys(
      spark: SparkSession,
      path: String,
      index: DataFrame,
      keyCol: String,
      keys: Seq[Long]): (Seq[String], DataFrame) = {
    require(keys.nonEmpty, "readKeys: empty key set")
    val files = index
      .filter(col("key").isin(keys.map(Long.box): _*))
      .select("file").distinct().collect().map(_.getString(0)).toSeq.sorted
    val df =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
        .filter(col(keyCol).isin(keys.map(Long.box): _*))
    (files, df)
  }

  /** Per-file Bloom index — the probabilistic third of the skipping triad:
    * range stats need a clustered layout, the exact value index costs
    * O(distinct (key, file) pairs); a per-file Bloom filter is FIXED bytes
    * per file at any key cardinality (Parquet's own optional bloom_filter
    * pages and Delta's deletion-file blooms are this shape). Built in one
    * grouped pass with the zero-shuffle Bloom aggregate — numBits/8 bytes
    * per (file, partition) cross the wire, never keys. Lookups can false
    * POSITIVE (a wasted file open, bounded by fpp) but never false
    * negative — probe and build share [[graft.plans.BloomHash]]'s bit
    * derivation, so no row is ever lost (spec-enforced). */
  def buildBloomIndex(
      spark: SparkSession,
      path: String,
      keyCol: String,
      numBits: Long = 1L << 20,
      numHashFuncs: Int = 5): DataFrame = {
    import org.apache.spark.sql.graft.ExprColumn
    val agg = graft.plans.BloomBuildAgg(
      ExprColumn.expr(xxhash64(col(keyCol))), numBits, numHashFuncs)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(ExprColumn(agg.toAggregateExpression()).as("bits"))
      .withColumn("k", lit(numHashFuncs))
  }

  /** Point-lookup read planned against the per-file Bloom index: the
    * filters are catalog-sized metadata (numBits/8 bytes per file), so
    * the probe runs on the driver; the residual filter still applies. */
  def readKeysBloom(
      spark: SparkSession,
      path: String,
      index: DataFrame,
      keyCol: String,
      keys: Seq[Long]): (Seq[String], DataFrame) = {
    require(keys.nonEmpty, "readKeysBloom: empty key set")
    import spark.implicits._
    // hash exactly as the build did (Spark's xxhash64 over the key column)
    val keyHashes = keys.toDF(keyCol)
      .select(xxhash64(col(keyCol))).as[Long].collect()
    val files = index.select(col("file"), col("bits"), col("k")).collect()
      .filter { r =>
        val bits = r.getSeq[Long](1).toArray
        val k = r.getInt(2)
        keyHashes.exists(h => graft.plans.BloomHash.contains(bits, h, k))
      }
      .map(_.getString(0)).toSeq.sorted
    val df =
      if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(files: _*)
        .filter(col(keyCol).isin(keys.map(Long.box): _*))
    (files, df)
  }
}
