package graft.query

import graft.operators.DimensionFilter

/** Declarative query models — the Scala case-class ADT mirroring the
  * reference's pydantic models (ref: dsgrid/query/models.py:579-728
  * ProjectQueryModel / DatasetQueryModel and nested sections). Discriminated
  * unions become sealed traits; everything is data, the Submitter interprets.
  */
object Models {

  /** How a dataset's dimension column maps onto the project dimension space:
    * apply the named mapping tables in order (ref mapping plan,
    * dsgrid/query/dataset_mapping_plan.py). */
  final case class DimensionMappingRef(
      dimension: String, // column name, e.g. "geography"
      mappingName: String) // registry key of the mapping table

  /** Growth-rate composition for a projection dataset: the growth dataset is
    * mapped to project space like any other, then applied to the initial
    * values — exponential `(1+r)^(year-base)` or plain multiplier
    * (ref projection datasets: dsgrid/project.py:302-416,
    * dsgrid/dataset/growth_rates.py). */
  final case class GrowthSpec(
      datasetId: String,
      mappings: Seq[DimensionMappingRef] = Nil,
      joinColumns: Seq[String],
      modelYearColumn: String = "model_year",
      baseYear: Int = 0,
      kind: String = "exponential") // "exponential" | "multiplier"

  /** One source dataset inside a project query (ref
    * StandaloneDatasetModel / projection datasets at models.py). */
  final case class DatasetRef(
      datasetId: String,
      mappings: Seq[DimensionMappingRef] = Nil,
      /** optional persist point after mapping (plan-cut — ref
        * DatasetMappingPlan persist flags) */
      persist: Boolean = false,
      /** present → this is a projection dataset: initial values grown by the
        * referenced growth-rate dataset */
      growth: Option[GrowthSpec] = None)

  /** The dataset-combination section: dataset refs + an expression over
    * their ids (`"a | b"`, `"(a - b) * c"`); default union of all. */
  final case class DatasetSection(
      datasets: Seq[DatasetRef],
      expression: Option[String] = None)

  /** A named aggregation: groupBy these dimension columns, apply `fn` (a
    * whitelisted name) to the value column (ref AggregationModel,
    * models.py:64-158). */
  final case class Aggregation(
      groupBy: Seq[String],
      fn: String = "sum")

  /** Attach a supplemental-dimension column: map the base dimension's ids
    * through a base-to-supplemental mapping and carry the supplemental id in
    * a new column (ref supplemental-column add,
    * dsgrid/dataset/table_format_handler_base.py:31-113). */
  final case class SupplementalColumn(
      dimension: String,
      mappingName: String,
      columnName: String)

  /** Result-shaping section (ref query_submitter postprocess). */
  final case class ResultSection(
      filters: Seq[DimensionFilter] = Nil,
      /** supplemental columns are attached before aggregation so they can be
        * grouped on */
      supplementalColumns: Seq[SupplementalColumn] = Nil,
      aggregations: Seq[Aggregation] = Nil,
      /** replace ids with record names for these dimensions */
      idsToNames: Seq[String] = Nil,
      sortBy: Seq[String] = Nil,
      /** pivot this dimension's records into columns on output */
      pivotDimension: Option[String] = None,
      /** convert the time column to this zone on output */
      timeZone: Option[String] = None,
      /** convert metric values to this unit on output */
      toUnit: Option[String] = None)

  /** A project query: map each dataset to the project dimension space,
    * combine, post-process (ref ProjectQueryModel). `sessionTimeZone` pins
    * the session tz for the query's whole execution (the reference restarts
    * the session with the project tz, query_submitter.py:697-714). */
  final case class ProjectQuery(
      name: String,
      datasets: DatasetSection,
      result: ResultSection = ResultSection(),
      sessionTimeZone: Option[String] = None)

  /** A dataset query: one dataset mapped to target dimensions, no project
    * combine semantics (ref DatasetQueryModel, §3.2). */
  final case class DatasetQuery(
      name: String,
      dataset: DatasetRef,
      result: ResultSection = ResultSection())

  /** Deterministic canonical serialization for content-hash caching
    * (ref: query_submitter.py:133-160 hashes canonical JSON; any stable
    * serialization works — case-class toString is stable for this ADT). */
  def canonical(q: ProjectQuery): String = q.toString
  def canonical(q: DatasetQuery): String = q.toString

  def contentHash(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }
}
