package graft.registry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mapping-type taxonomy: what a mapping table MEANS determines what must
  * hold of its records. The reference defines 14 mapping types whose only
  * operational difference is the validation archetype — duplicate-id rules
  * and which grouping the `from_fraction` column must sum to 1 over
  * (dimension_mapping_base.py:14-40 for the types, :200-239 for the
  * type→archetype assignment, registry/dimension_mapping_registry_manager
  * .py:151-206 for the record checks). A mapping whose fractions sum to
  * 1.7 under an aggregation type would silently inflate every downstream
  * fraction application — registration is the one place to catch it.
  *
  * Every check here is a distributed plan over the mapping table; only a
  * 5-row violation sample is ever collected, so validation is safe on
  * arbitrarily large mapping tables.
  */
object MappingTypes {

  // optional from_fraction, sum = 1 per from_id
  val OneToOne = "one_to_one"
  val ManyToOneAggregation = "many_to_one_aggregation"
  val ManyToOneReassignment = "many_to_one_reassignment"
  // optional from_fraction, all fractions exactly 1
  val Duplication = "duplication"
  // required from_fraction, sum = 1 per from_id
  val OneToManyDisaggregation = "one_to_many_disaggregation"
  val ManyToManyAggregation = "many_to_many_aggregation"
  val ManyToManyDisaggregation = "many_to_many_disaggregation"
  // required from_fraction, sum = 1 per to_id
  val OneToManyAssignment = "one_to_many_assignment"
  val ManyToOneAssignment = "many_to_one_assignment"
  val ManyToManyAssignment = "many_to_many_assignment"
  // required from_fraction, no sum check
  val OneToOneExplicitMultipliers = "one_to_one_explicit_multipliers"
  val OneToManyExplicitMultipliers = "one_to_many_explicit_multipliers"
  val ManyToOneExplicitMultipliers = "many_to_one_explicit_multipliers"
  val ManyToManyExplicitMultipliers = "many_to_many_explicit_multipliers"

  /** Validation archetype: duplicate-id permissions, fraction-sum checks,
    * and whether the fraction column must be present (ref
    * DimensionMappingArchetype, dimension_mapping_base.py:43-146). */
  final case class Archetype(
      allowDupFrom: Boolean,
      allowDupTo: Boolean,
      checkSumFromId: Boolean,
      checkSumToId: Boolean,
      fractionRequired: Boolean)

  /** Type → archetype, mirroring the reference's assignment table
    * (dimension_mapping_base.py:205-226). Note many_to_one_assignment maps
    * to the MANY_TO_MANY to-id archetype there too — not a typo here. */
  val archetypes: Map[String, Archetype] = Map(
    OneToOne -> Archetype(allowDupFrom = false, allowDupTo = false, checkSumFromId = true, checkSumToId = false, fractionRequired = false),
    ManyToOneAggregation -> Archetype(allowDupFrom = false, allowDupTo = true, checkSumFromId = true, checkSumToId = false, fractionRequired = false),
    ManyToOneReassignment -> Archetype(allowDupFrom = false, allowDupTo = true, checkSumFromId = true, checkSumToId = false, fractionRequired = false),
    Duplication -> Archetype(allowDupFrom = true, allowDupTo = false, checkSumFromId = false, checkSumToId = false, fractionRequired = false),
    OneToManyDisaggregation -> Archetype(allowDupFrom = true, allowDupTo = false, checkSumFromId = true, checkSumToId = false, fractionRequired = true),
    ManyToManyAggregation -> Archetype(allowDupFrom = true, allowDupTo = true, checkSumFromId = true, checkSumToId = false, fractionRequired = true),
    ManyToManyDisaggregation -> Archetype(allowDupFrom = true, allowDupTo = true, checkSumFromId = true, checkSumToId = false, fractionRequired = true),
    OneToManyAssignment -> Archetype(allowDupFrom = true, allowDupTo = false, checkSumFromId = false, checkSumToId = true, fractionRequired = true),
    ManyToOneAssignment -> Archetype(allowDupFrom = true, allowDupTo = true, checkSumFromId = false, checkSumToId = true, fractionRequired = true),
    ManyToManyAssignment -> Archetype(allowDupFrom = true, allowDupTo = true, checkSumFromId = false, checkSumToId = true, fractionRequired = true),
    OneToOneExplicitMultipliers -> Archetype(allowDupFrom = false, allowDupTo = false, checkSumFromId = false, checkSumToId = false, fractionRequired = true),
    OneToManyExplicitMultipliers -> Archetype(allowDupFrom = true, allowDupTo = false, checkSumFromId = false, checkSumToId = false, fractionRequired = true),
    ManyToOneExplicitMultipliers -> Archetype(allowDupFrom = false, allowDupTo = true, checkSumFromId = false, checkSumToId = false, fractionRequired = true),
    ManyToManyExplicitMultipliers -> Archetype(allowDupFrom = true, allowDupTo = true, checkSumFromId = false, checkSumToId = false, fractionRequired = true))

  /** Validate a mapping table against its declared type. Column convention
    * is the engine's (from_id, to_id, from_fraction?); a missing fraction
    * column means fraction 1.0 per record (ref MappingTableRecordModel
    * default, config/mapping_tables.py:36-39). Throws with a ≤5-row sample
    * on the first violated rule. */
  def validate(
      mappingName: String,
      mappingType: String,
      table: DataFrame,
      fromTolerance: Double = 1e-6,
      toTolerance: Double = 1e-6): Unit = {
    val arch = archetypes.getOrElse(
      mappingType,
      throw new IllegalArgumentException(
        s"mapping '$mappingName': unknown mapping_type '$mappingType'; one of ${archetypes.keys.toSeq.sorted.mkString(", ")}"))
    val fromCol = graft.core.Constants.FromIdColumn
    val toCol = graft.core.Constants.ToIdColumn
    val fracCol = graft.core.Constants.FromFractionColumn
    require(
      table.columns.contains(fromCol) && table.columns.contains(toCol),
      s"mapping '$mappingName': table must have ($fromCol, $toCol[, $fracCol]) columns, got ${table.columns.mkString(", ")}")
    val hasFraction = table.columns.contains(fracCol)
    if (arch.fractionRequired && !hasFraction)
      throw new IllegalArgumentException(
        s"mapping '$mappingName': mapping_type=$mappingType requires an explicit $fracCol column")
    val frac = if (hasFraction) col(fracCol).cast("double") else lit(1.0)

    def failDup(idCol: String): Unit = {
      val dups = table
        .filter(col(idCol).isNotNull)
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .limit(5)
        .collect()
      if (dups.nonEmpty)
        throw new IllegalArgumentException(
          s"mapping '$mappingName': mapping_type=$mappingType does not allow duplicated $idCol records; " +
            s"e.g. ${dups.map(r => s"${r.get(0)} (x${r.getLong(1)})").mkString(", ")}")
    }
    if (!arch.allowDupFrom) failDup(fromCol)
    if (!arch.allowDupTo) failDup(toCol)

    def failSum(groupCol: String, tolerance: Double): Unit = {
      val bad = table
        .groupBy(col(groupCol))
        .agg(sum(frac).as("sum_fraction"))
        .filter(abs(col("sum_fraction") - 1.0) > tolerance)
        .orderBy(col("sum_fraction"), col(groupCol))
        .limit(5)
        .collect()
      if (bad.nonEmpty)
        throw new IllegalArgumentException(
          s"mapping '$mappingName': mapping_type=$mappingType requires sum($fracCol) = 1 per $groupCol " +
            s"(tolerance $tolerance); violations e.g. " +
            bad.map(r => s"$groupCol=${r.get(0)} sum=${r.get(1)}").mkString(", "))
    }
    if (arch.checkSumFromId) failSum(fromCol, fromTolerance)
    if (arch.checkSumToId) failSum(toCol, toTolerance)

    // duplication copies values verbatim into every to_id — a non-one
    // fraction belongs to the explicit-multipliers types instead
    // (ref dimension_mapping_registry_manager.py:197-206)
    if (mappingType == Duplication && hasFraction) {
      val nonOne = table.filter(frac =!= 1.0).limit(5).collect()
      if (nonOne.nonEmpty)
        throw new IllegalArgumentException(
          s"mapping '$mappingName': mapping_type=duplication does not allow non-one $fracCol values " +
            s"(use one_to_many_explicit_multipliers); e.g. ${nonOne.mkString("; ")}")
    }
  }
}
