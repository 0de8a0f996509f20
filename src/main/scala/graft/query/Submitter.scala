package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Constants._
import graft.operators.{Aggregation => AggOps, DatasetExpr, DimensionFilter, MappingKernel, Reshape}
import graft.functions.Units
import graft.registry.Registry
import graft.time.TimeZones
import Models._

/** Query execution — the engine's §3 lifecycle as one interpreter over the
  * declarative models (ref: dsgrid/query/query_submitter.py:659-989 +
  * dsgrid/project.py:181-300, re-expressed Spark-first):
  *
  *   per dataset:  read → mapping joins (broadcast) → fraction collapse →
  *                 scaling factor  [stage 4]
  *   combine:      dataset expression over aligned frames  [stage 5]
  *   post-process: filters → aggregations → ids→names → unit convert →
  *                 tz convert → sort → pivot  [stage 6]
  *
  * Differences from the reference, by design:
  *   - no SparkSession restarts between datasets (runtime conf suffices in
  *     one JVM; per-dataset tuning is a repartition, not a new cluster app);
  *   - caching is optional and file-based (`cacheDir`), keyed by the
  *     query's content hash exactly like the reference's two-level cache
  *     (query_submitter.py:133-171) — a cluster points this at shared
  *     scratch storage so repeated queries skip stages 1-5.
  */
final class Submitter(registry: Registry, cacheDir: Option[String] = None) {

  private def spark: SparkSession = registry.spark

  /** Stage 4: one dataset mapped onto the project dimension space;
    * projection datasets then apply their growth-rate dataset. With a
    * `cacheDir`, the mapped result is content-hash cached per dataset —
    * the reference's first cache level (cached_project_mapped_datasets,
    * dsgrid/project.py:418-449); the combined query result is the second. */
  def mapDataset(ref: DatasetRef): DataFrame = cacheDir match {
    case Some(_) =>
      cached("mapped_" + Models.contentHash(ref.toString))(mapDatasetUncached(ref))
    case None => mapDatasetUncached(ref)
  }

  private def mapDatasetUncached(ref: DatasetRef): DataFrame = {
    val base = registry.dataset(ref.datasetId)
    val mappings = ref.mappings.map(m => m.dimension -> registry.mapping(m.mappingName))
    val mappedBase = MappingKernel.applyScalingFactor(MappingKernel.mapAndApply(base, mappings))
    val mapped = ref.growth match {
      case None => mappedBase
      case Some(g) =>
        val growthRates = MappingKernel.mapAndApply(
          registry.dataset(g.datasetId),
          g.mappings.map(m => m.dimension -> registry.mapping(m.mappingName)))
        g.kind match {
          case "exponential" =>
            graft.functions.Growth.applyExponentialGrowthRate(
              mappedBase, growthRates, g.joinColumns, g.modelYearColumn, g.baseYear)
          case "multiplier" =>
            graft.functions.Growth.applyAnnualMultiplier(mappedBase, growthRates, g.joinColumns)
          case other => throw new IllegalArgumentException(s"unknown growth kind: $other")
        }
    }
    if (ref.persist) {
      val dir = cacheDir.getOrElse(sys.props("java.io.tmpdir") + "/graft-cache")
      graft.sources.Writers.persistIntermediate(spark, mapped, dir, s"mapped_${ref.datasetId}")
    } else mapped
  }

  /** Stages 4-5: map every dataset, evaluate the combination expression. */
  def combine(section: DatasetSection): DataFrame = {
    val frames = section.datasets.map(d => d.datasetId -> mapDataset(d)).toMap
    section.expression match {
      case Some(exprText) => DatasetExpr.evaluate(exprText, frames)
      case None => frames.values.reduce(_ unionByName _)
    }
  }

  /** Stage 6: result shaping. */
  def postProcess(df0: DataFrame, r: ResultSection): DataFrame = {
    var df = DimensionFilter.applyAll(df0, r.filters)
    for (sc <- r.supplementalColumns) {
      val m = broadcast(
        registry.mapping(sc.mappingName)
          .filter(col(ToIdColumn).isNotNull)
          .select(col(FromIdColumn).as("__graft_supp_from"), col(ToIdColumn).as(sc.columnName)))
      df = df.join(m, df(sc.dimension) === col("__graft_supp_from"), "left").drop("__graft_supp_from")
    }
    for (agg <- r.aggregations)
      df = AggOps.aggregate(df, agg.groupBy, agg.fn)
    // unit conversion must run BEFORE ids→names: metric records are keyed
    // by id, not display name (ref runs convert in the agg handler first,
    // table_format_handler_base.py:31-113)
    for (unit <- r.toUnit)
      df = Units.convertUnits(df, "metric", registry.dimensionRecords("metric"), unit)
    for (dim <- r.idsToNames)
      df = MappingKernel.idsToNames(df, dim, registry.dimensionRecords(dim))
    for (tz <- r.timeZone if df.columns.contains("timestamp"))
      df = TimeZones.toSingleZone(df, "timestamp", tz)
    for (p <- r.pivotDimension)
      df = Reshape.pivot(df, p)
    if (r.sortBy.nonEmpty) df = df.sort(r.sortBy.map(col): _*)
    df
  }

  /** Full project query; content-hash cached when `cacheDir` is set; the
    * session tz is pinned for the duration when the query requests one. */
  def submit(q: ProjectQuery): DataFrame = {
    def run() = cached(Models.contentHash(Models.canonical(q))) {
      postProcess(combine(q.datasets), q.result)
    }
    q.sessionTimeZone match {
      case Some(tz) =>
        graft.core.GraftSession.withSessionTimeZone(spark, tz) {
          val df = run()
          // plans are lazy — materialize inside the pinned-tz scope (the
          // cached path already wrote parquet; otherwise cut the plan here)
          if (cacheDir.isDefined) df else df.localCheckpoint()
        }
      case None => run()
    }
  }

  /** Dataset query (§3.2): one dataset, mapping + shaping, no combine. */
  def submit(q: DatasetQuery): DataFrame =
    cached(Models.contentHash(Models.canonical(q))) {
      postProcess(mapDataset(q.dataset), q.result)
    }

  /** §3.3: run stages 4-5 of a project query and save the combined table as
    * a composite dataset under the registry; later queries re-read it and
    * apply only post-processing (ref: query_submitter.py:730-834). */
  def createCompositeDataset(id: String, datasets: DatasetSection): Unit =
    combine(datasets).write.mode("overwrite")
      .parquet(s"${registry.root}/composite_datasets/$id/table.parquet")

  /** Promote a query result to a registered derived dataset other queries
    * can consume (ref: dsgrid/query/derived_dataset.py:35-180). */
  def registerDerivedDataset(id: String, q: ProjectQuery): Unit =
    graft.registry.Registry.registerDataset(registry, id, submit(q))

  def submitComposite(id: String, result: ResultSection): DataFrame =
    postProcess(
      spark.read.parquet(s"${registry.root}/composite_datasets/$id/table.parquet"),
      result)

  private def cached(key: String)(build: => DataFrame): DataFrame = cacheDir match {
    case None => build
    case Some(dir) =>
      val path = s"$dir/cached_tables/$key/table.parquet"
      if (registry.hadoopExists(path)) // Hadoop FS API: works on HDFS/S3 too
        spark.read.parquet(path)
      else {
        val df = build
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
  }
}
