package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Constants._
import graft.operators.{Aggregation, DatasetExpr, DimensionFilter, MappingKernel, Reshape, SetOps}
import graft.functions.{Growth, Units}
import graft.time.{AnnualTime, TimeAdjustments}
import graft.text.{Dedup, TextFunctions}
import graft.ml.Similarity
import graft.multimodal.Multimodal

/** The operator catalog: every query exercises one operator family from
  * SURVEY.md §2 (or a training-data-pipeline extension) against the
  * driver-provided TPC-H-ish tables, and carries an equivalent DuckDB SQL
  * oracle where the semantics are SQL-expressible.
  *
  * Output discipline (driver hash-compares after sorting columns by name):
  *   - integer outputs are BIGINT on both sides;
  *   - double aggregates are rounded identically on both sides;
  *   - results are sorted by their key columns on both sides;
  *   - no raw timestamp outputs (epochs / extracted fields instead).
  */
object Queries {

  /** The catalog record: a named query over a testdata dir plus its DuckDB
    * oracle (see QueryDsl — helpers and the record live there so the
    * per-chunk catalog files in `queries/` can share them). */
  type Q = QueryDsl.Q
  val Q: QueryDsl.Q.type = QueryDsl.Q

  private[graft] def normalizeTs(df: DataFrame): DataFrame = QueryDsl.normalizeTs(df)

  /** Build the shared registries before timed runs (see QueryDsl). */
  def prewarmRegistries(s: SparkSession, dir: String): Unit =
    QueryDsl.prewarmRegistries(s, dir)

  val all: Seq[Q] =
    Catalog1.all ++ Catalog2.all ++ Catalog3.all ++ Catalog4.all ++ Catalog5.all ++ Catalog6.all ++ Catalog7.all ++ Catalog8.all ++ Catalog9.all ++ Catalog9b.all ++ Catalog10.all ++ Catalog11.all ++ Catalog12.all ++ Catalog13.all ++ Catalog14.all ++ Catalog15.all ++ Catalog16.all ++ Catalog17.all
}
