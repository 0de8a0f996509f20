package graft.query

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

import graft.operators.DimensionFilter
import Models._

/** JSON codec for the query-model ADT — the reference's queries are JSON
  * documents validated into pydantic models (ref: dsgrid/query/models.py
  * discriminated unions; `filter_type` discriminator at models.py:35-45).
  * Jackson ships on Spark's classpath; the tree API keeps this dependency-
  * free and explicit about the accepted shape. */
object Json {

  // Accept the JSON5 conveniences the reference's query files actually use
  // (ref: .json5 query documents): // and /* */ comments, trailing commas.
  // Full JSON5 (unquoted keys, single quotes) is not needed by the corpus.
  private val mapper = {
    val m = new ObjectMapper()
    m.enable(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_COMMENTS)
    m.enable(com.fasterxml.jackson.core.json.JsonReadFeature.ALLOW_TRAILING_COMMA.mappedFeature())
    m
  }

  def parseProjectQuery(json: String): ProjectQuery = {
    val n = mapper.readTree(json)
    ProjectQuery(
      name = str(n, "name"),
      datasets = datasetSection(n.get("datasets")),
      result = Option(n.get("result")).map(resultSection).getOrElse(ResultSection()))
  }

  def parseDatasetQuery(json: String): DatasetQuery = {
    val n = mapper.readTree(json)
    DatasetQuery(
      name = str(n, "name"),
      dataset = datasetRef(n.get("dataset")),
      result = Option(n.get("result")).map(resultSection).getOrElse(ResultSection()))
  }

  private def datasetSection(n: JsonNode): DatasetSection =
    DatasetSection(
      datasets = arr(n, "datasets").map(datasetRef),
      expression = optStr(n, "expression"))

  private def datasetRef(n: JsonNode): DatasetRef =
    DatasetRef(
      datasetId = str(n, "dataset_id"),
      mappings = arr(n, "mappings").map(m =>
        DimensionMappingRef(
          str(m, "dimension"),
          str(m, "mapping_name"),
          persist = Option(m.get("persist")).exists(_.asBoolean(false)),
          saltPartitions = Option(m.get("salt_partitions")).filterNot(_.isNull).map(_.asInt()))),
      persist = Option(n.get("persist")).exists(_.asBoolean(false)),
      // pre-mapping dimension filters, expressed in project space (the
      // JSON surface accepts the data-free forms; DataFrame-bearing
      // subset/supplemental filters are programmatic-only)
      filters = arr(n, "filters").map(filter),
      columnRenames = Option(n.get("column_renames")).filterNot(_.isNull).toSeq
        .flatMap(_.properties().asScala.map(e => e.getKey -> e.getValue.asText())),
      growth = Option(n.get("growth")).filterNot(_.isNull).map(g =>
        GrowthSpec(
          datasetId = str(g, "dataset_id"),
          mappings = arr(g, "mappings").map(m =>
            DimensionMappingRef(str(m, "dimension"), str(m, "mapping_name"))),
          joinColumns = arr(g, "join_columns").map(_.asText()),
          modelYearColumn = optStr(g, "model_year_column").getOrElse("model_year"),
          baseYear = Option(g.get("base_year")).map(_.asInt()).getOrElse(0),
          kind = optStr(g, "kind").getOrElse("exponential"))))

  private def resultSection(n: JsonNode): ResultSection =
    ResultSection(
      filters = arr(n, "filters").map(filter),
      supplementalColumns = arr(n, "supplemental_columns").map(s =>
        SupplementalColumn(str(s, "dimension"), str(s, "mapping_name"), str(s, "column_name"))),
      aggregations = arr(n, "aggregations").map(a =>
        Aggregation(
          groupBy = arr(a, "group_by").map(_.asText()),
          fn = optStr(a, "fn").getOrElse("sum"))),
      idsToNames = arr(n, "ids_to_names").map(_.asText()),
      sortBy = arr(n, "sort_by").map(_.asText()),
      pivotDimension = optStr(n, "pivot_dimension"),
      timeZone = optStr(n, "time_zone"), // a zone name, or the literal "geography"
      toUnit = optStr(n, "to_unit"),
      reports = arr(n, "reports").map(report),
      outputRenames = Option(n.get("output_renames")).filterNot(_.isNull).toSeq
        .flatMap(_.properties().asScala.map(e => e.getKey -> e.getValue.asText())))

  /** Discriminated on `report_type` (ref ReportType, models.py:186-196). */
  private def report(n: JsonNode): ReportSpec = str(n, "report_type") match {
    case "peak_load" =>
      PeakLoadReport(
        groupBy = arr(n, "group_by").map(_.asText()),
        keepTies = Option(n.get("keep_ties")).exists(_.asBoolean(false)),
        tieBreak = arr(n, "tie_break").map(_.asText()))
    case other => throw new IllegalArgumentException(s"unknown report_type: $other")
  }

  /** Discriminated on `filter_type`, mirroring the reference's union. */
  private def filter(n: JsonNode): DimensionFilter = str(n, "filter_type") match {
    case "expression" =>
      DimensionFilter.ExpressionFilter(str(n, "column"), str(n, "operator"), value(n.get("value")))
    case "raw" =>
      DimensionFilter.RawFilter(str(n, "expression"))
    case "column_operator" =>
      DimensionFilter.ColumnOperatorFilter(
        str(n, "column"),
        str(n, "operator"),
        arr(n, "values").map(value),
        Option(n.get("negate")).exists(_.asBoolean(false)))
    case "between" =>
      DimensionFilter.BetweenFilter(
        str(n, "column"), value(n.get("lower")), value(n.get("upper")),
        Option(n.get("negate")).exists(_.asBoolean(false)))
    // registry-resolved forms (the reference's subset/supplemental filter
    // documents name dimensions/mappings; the Submitter resolves them)
    case "subset" =>
      DimensionFilter.SubsetDimensionFilter(
        str(n, "column"), arr(n, "record_dimensions").map(_.asText()))
    case "supplemental" =>
      DimensionFilter.SupplementalMappingFilter(str(n, "column"), str(n, "mapping_name"))
    case other => throw new IllegalArgumentException(s"unknown filter_type: $other")
  }

  private def value(n: JsonNode): Any =
    if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else n.asText()

  private def str(n: JsonNode, field: String): String = {
    val v = n.get(field)
    require(v != null && !v.isNull, s"missing required field: $field")
    v.asText()
  }

  private def optStr(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText())

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull).map(_.elements().asScala.toSeq).getOrElse(Nil)
}
