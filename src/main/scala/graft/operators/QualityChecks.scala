package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification — the Deequ/dbt-tests shape
  * (Schelter et al., VLDB 2018): a suite of named checks over a table is
  * COMPILED INTO ONE AGGREGATION PASS instead of one job per check, which
  * is the difference between auditing a 100 TB table once and scanning it
  * N times. Every check reduces to a (satisfied, total) pair of exact
  * BIGINT counters folded map-side; the suite result is one row per check
  * with the ppm ratio and the threshold verdict.
  *
  * Check vocabulary:
  *   - [[QualityChecks.Completeness]] — non-null fraction of a column;
  *   - [[QualityChecks.Satisfies]] — fraction of rows passing an arbitrary
  *     boolean expression (bounds, patterns, containment, referential
  *     lists — anything expressible as a Column);
  *   - [[QualityChecks.Uniqueness]] — distinct fraction of a key
  *     expression (the one check that is not purely map-side: Spark plans
  *     the mixed distinct/non-distinct aggregate with one Expand, still a
  *     single scan of the input);
  *   - [[QualityChecks.MinSize]] — absolute row-count floor.
  *
  * Thresholds are rationals (num/den) and verdicts are exact-integer
  * cross-multiplications — no float ratio ever decides a gate. */
object QualityChecks {

  sealed trait Check {
    def name: String
    /** threshold as a rational: pass iff satisfied·den ≥ num·total */
    def thresholdNum: Long
    def thresholdDen: Long
    private[operators] def satisfied: Column
    private[operators] def total: Column
  }

  /** Non-null fraction of `column` ≥ num/den. */
  final case class Completeness(name: String, column: String, thresholdNum: Long, thresholdDen: Long)
      extends Check {
    private[operators] def satisfied = count(col(column))
    private[operators] def total = count(lit(1))
  }

  /** Fraction of rows where `predicate` holds ≥ num/den (NULL counts as
    * a violation — a predicate that cannot evaluate did not pass). */
  final case class Satisfies(name: String, predicate: Column, thresholdNum: Long, thresholdDen: Long)
      extends Check {
    private[operators] def satisfied = sum(when(predicate, 1L).otherwise(0L))
    private[operators] def total = count(lit(1))
  }

  /** Distinct fraction of `key` ≥ num/den (1/1 = a strict unique key). */
  final case class Uniqueness(name: String, key: Column, thresholdNum: Long, thresholdDen: Long)
      extends Check {
    private[operators] def satisfied = countDistinct(key)
    private[operators] def total = count(lit(1))
  }

  /** Row count ≥ `minRows`. */
  final case class MinSize(name: String, minRows: Long) extends Check {
    def thresholdNum: Long = minRows
    def thresholdDen: Long = 1L
    private[operators] def satisfied = count(lit(1))
    private[operators] def total = lit(1L)
  }

  /** Run the suite in one aggregation pass. Returns one row per check, in
    * suite order: (check, satisfied, total, ratio_ppm, passed). */
  def verify(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "QualityChecks.verify: empty suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "QualityChecks.verify: duplicate check names")
    checks.foreach(c => require(c.thresholdDen > 0 && c.thresholdNum >= 0,
      s"QualityChecks.verify: bad threshold for ${c.name}"))
    val aggs = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(c.satisfied.cast("long").as(s"__graft_s_$i"), c.total.cast("long").as(s"__graft_t_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val s = col(s"__graft_s_$i")
      val tt = col(s"__graft_t_$i")
      struct(
        lit(c.name).as("check"),
        s.as("satisfied"),
        tt.as("total"),
        // integral div, not floor(double /): a double quotient can round
        // UP across the floor boundary; DuckDB's // never does
        when(tt > 0L, expr(s"(__graft_s_$i * CAST(1000000 AS BIGINT)) div __graft_t_$i"))
          .otherwise(lit(0L)).cast("long").as("ratio_ppm"),
        (s * c.thresholdDen >= lit(c.thresholdNum) * tt).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
