package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The six dimension-filter forms of the reference as a small ADT compiled
  * to `Column` predicates or semi-joins
  * (ref: dsgrid/dimension/dimension_filters.py:91-308). All predicate forms
  * stay declarative so Catalyst pushes them into the parquet scan.
  */
sealed trait DimensionFilter {
  /** Apply to a DataFrame. Predicate filters compile to `.filter`; record
    * filters compile to semi-joins. */
  def apply(df: DataFrame): DataFrame
}

object DimensionFilter {

  /** `(col op value)` with auto-typing (ref :91-114). */
  final case class ExpressionFilter(column: String, operator: String, value: Any) extends DimensionFilter {
    def predicate: Column = {
      val c = col(column)
      val v = lit(value)
      operator match {
        case "==" | "=" => c === v
        case "!=" | "<>" => c =!= v
        case ">" => c > v
        case ">=" => c >= v
        case "<" => c < v
        case "<=" => c <= v
        case other => throw new IllegalArgumentException(s"unsupported operator: $other")
      }
    }
    def apply(df: DataFrame): DataFrame = df.filter(predicate)
  }

  /** Raw user-supplied predicate text (ref :117-141). */
  final case class RawFilter(expression: String) extends DimensionFilter {
    def apply(df: DataFrame): DataFrame = df.filter(expr(expression))
  }

  /** Column-method filters: isin/like/rlike/contains/startswith/endswith/
    * isNull/isNotNull, with negation (ref :144-198). */
  final case class ColumnOperatorFilter(
      column: String,
      operator: String,
      values: Seq[Any] = Nil,
      negate: Boolean = false)
      extends DimensionFilter {
    def predicate: Column = {
      val c = col(column)
      val p = operator match {
        case "isin" => c.isin(values: _*)
        case "like" => c.like(values.head.toString)
        case "rlike" => c.rlike(values.head.toString)
        case "contains" => c.contains(values.head)
        case "startswith" => c.startsWith(values.head.toString)
        case "endswith" => c.endsWith(values.head.toString)
        case "isNull" => c.isNull
        case "isNotNull" => c.isNotNull
        case other => throw new IllegalArgumentException(s"unsupported operator: $other")
      }
      if (negate) !p else p
    }
    def apply(df: DataFrame): DataFrame = df.filter(predicate)
  }

  /** Inclusive range, optionally negated (ref :201-229). */
  final case class BetweenFilter(column: String, lower: Any, upper: Any, negate: Boolean = false)
      extends DimensionFilter {
    def predicate: Column = {
      val p = col(column).between(lit(lower), lit(upper))
      if (negate) !p else p
    }
    def apply(df: DataFrame): DataFrame = df.filter(predicate)
  }

  /** Keep rows whose dimension value is in the union of the given record-id
    * sets — a semi-join, the scalable form of a giant IN list
    * (ref subset filter :232-276, applied at query_submitter.py:595-603). */
  final case class SubsetFilter(column: String, recordSets: Seq[DataFrame]) extends DimensionFilter {
    def apply(df: DataFrame): DataFrame = {
      val ids = recordSets.map(_.select(col("id"))).reduce(_ union _).distinct()
      df.join(broadcast(ids), df(column) === ids("id"), "left_semi")
    }
  }

  /** Keep base records that map to a supplemental dimension: semi-join the
    * data against the from-side of the base-to-supplemental mapping
    * (ref :279-308). */
  final case class SupplementalFilter(column: String, mapping: DataFrame) extends DimensionFilter {
    def apply(df: DataFrame): DataFrame = {
      val fromIds = mapping.filter(col("to_id").isNotNull).select(col("from_id")).distinct()
      df.join(broadcast(fromIds), df(column) === fromIds("from_id"), "left_semi")
    }
  }

  /** Registry-resolved subset filter: names the record-set DIMENSIONS instead
    * of carrying their frames — the JSON-expressible form the reference's
    * query documents use (ref SubsetDimensionFilterModel, :232-276). The
    * Submitter resolves it against its registry; it cannot apply standalone.
    * Data-free, so it canonicalizes for cache keys as-is (the registry
    * content token covers record mutations). */
  final case class SubsetDimensionFilter(column: String, recordDimensions: Seq[String])
      extends DimensionFilter {
    def apply(df: DataFrame): DataFrame =
      throw new IllegalStateException(
        "SubsetDimensionFilter needs registry resolution — submit the query through a Submitter")
  }

  /** Registry-resolved supplemental filter: names the mapping. */
  final case class SupplementalMappingFilter(column: String, mappingName: String)
      extends DimensionFilter {
    def apply(df: DataFrame): DataFrame =
      throw new IllegalStateException(
        "SupplementalMappingFilter needs registry resolution — submit the query through a Submitter")
  }

  def applyAll(df: DataFrame, filters: Seq[DimensionFilter]): DataFrame =
    filters.foldLeft(df)((d, f) => f(d))

  /** The dimension column a filter targets, when it names one (RawFilter is
    * free-form text — no single column). Used by the semantic prefilter to
    * decide which mapping chain to translate through. */
  def targetColumn(f: DimensionFilter): Option[String] = f match {
    case ExpressionFilter(c, _, _) => Some(c)
    case ColumnOperatorFilter(c, _, _, _) => Some(c)
    case BetweenFilter(c, _, _, _) => Some(c)
    case SubsetFilter(c, _) => Some(c)
    case SupplementalFilter(c, _) => Some(c)
    case SubsetDimensionFilter(c, _) => Some(c)
    case SupplementalMappingFilter(c, _) => Some(c)
    case _ => None
  }

  /** Content-determined cache token. The data-free predicate forms are fully
    * described by their case-class fields; the DataFrame-bearing forms
    * (SubsetFilter/SupplementalFilter) must hash the *records*, not the
    * frame's schema-only toString — two filters differing only in record
    * contents would otherwise collide (ref hashes canonical JSON,
    * query_submitter.py:133-160). Record sets are broadcast-small by design,
    * so collecting ids at canonicalization time is bounded. */
  def canonicalToken(f: DimensionFilter): String = {
    // length-prefix every value so separator characters inside ids can't
    // make two different record sets serialize identically
    // (e.g. {"a,b"} vs {"a","b"})
    def esc(v: Any): String = { val s = String.valueOf(v); s"${s.length}:$s" }
    f match {
      case SubsetFilter(c, sets) =>
        val ids = sets.flatMap(_.select(col("id")).collect().map(r => esc(r.get(0)))).sorted
        s"SubsetFilter($c,ids=${ids.mkString(",")})"
      case SupplementalFilter(c, mapping) =>
        val pairs = mapping
          .select(col("from_id"), col("to_id"))
          .collect()
          .map(r => s"${esc(r.get(0))}->${esc(r.get(1))}")
          .sorted
        s"SupplementalFilter($c,map=${pairs.mkString(",")})"
      case dataFree => dataFree.toString
    }
  }

  /** A data-free stand-in carrying a canonical token — used only inside
    * `Models.canonical` so the whole-query toString is content-determined. */
  final case class CanonicalStandIn(token: String) extends DimensionFilter {
    def apply(df: DataFrame): DataFrame = df
  }

  /** Numeric width normalization: the JSON codec renders Int/Short/Byte as
    * Long and Float as Double (JSON has one integral and one floating width),
    * so a parsed-back query carries wide values. Widening here too means a
    * programmatically built query and its rendered-and-reparsed twin share
    * one canonical form — one cache entry, not two. */
  private def widen(v: Any): Any = v match {
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case f: Float => f.toDouble
    case other => other
  }

  /** Replace DataFrame-bearing filters with content-hashed stand-ins and
    * normalize numeric widths in value-bearing forms. */
  def canonicalize(f: DimensionFilter): DimensionFilter = f match {
    case _: SubsetFilter | _: SupplementalFilter => CanonicalStandIn(canonicalToken(f))
    case ExpressionFilter(c, op, v) => ExpressionFilter(c, op, widen(v))
    case ColumnOperatorFilter(c, op, vs, neg) => ColumnOperatorFilter(c, op, vs.map(widen), neg)
    case BetweenFilter(c, lo, hi, neg) => BetweenFilter(c, widen(lo), widen(hi), neg)
    case dataFree => dataFree
  }
}

/** Pre-filtering: push record-id semi-joins below the mapping joins by
  * translating target ids back through the mapping (to_id -> from_id), so a
  * dataset is pruned *before* the expensive work — a semantic pushdown
  * Catalyst cannot do on its own (ref: dataset_schema_handler_base.py:592-646).
  */
object PreFilter {
  def prefilterThroughMapping(df: DataFrame, dimColumn: String, mapping: DataFrame, targetIds: DataFrame): DataFrame =
    prefilterThroughChain(df, dimColumn, Seq(mapping), targetIds)

  /** Translate project-space record ids back to dataset-space ids through a
    * mapping chain (dataset →m1→ … →mN→ project): walk the chain in reverse,
    * semi-joining each mapping's to_id against the surviving id set
    * (ref: dataset_schema_handler_base.py:592-625 _iter_dataset_record_ids).
    * Every step is a broadcast semi-join over a tiny id set — no shuffle. */
  def translateIdsThroughChain(targetIds: DataFrame, chain: Seq[DataFrame]): DataFrame =
    chain.reverse.foldLeft(targetIds.select(col("id")).distinct()) { (ids, m) =>
      m.join(broadcast(ids), m("to_id") === ids("id"), "left_semi")
        .select(col("from_id").as("id"))
        .distinct()
    }

  /** Prune a dataset by project-space ids before any mapping join runs. */
  def prefilterThroughChain(
      df: DataFrame,
      dimColumn: String,
      chain: Seq[DataFrame],
      targetIds: DataFrame): DataFrame = {
    val fromIds = translateIdsThroughChain(targetIds, chain)
    df.join(broadcast(fromIds), df(dimColumn) === fromIds("id"), "left_semi")
  }
}
