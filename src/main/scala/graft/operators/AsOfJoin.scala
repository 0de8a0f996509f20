package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks up the most recent right row at or
  * before its timestamp, per key — the standard time-series enrichment
  * (tiers, prices, slowly-changing attributes) that Spark has no built-in
  * operator for.
  *
  * Spark-first formulation (prompt §custom-operators option (a): compose
  * existing ops): tag both sides, union them, and carry each right
  * attribute forward with `last(_, ignoreNulls) over (partition by key
  * order by ts, side rows unbounded preceding)` — right rows sort before
  * left rows at equal timestamps, so the match is inclusive. ONE shuffle
  * keyed by the join key, no per-key range scan, no N×M candidate join;
  * at 100 TB this is the same cost as any keyed window. Left rows before
  * the first right row keep null attributes (left-join semantics, like
  * DuckDB's ASOF LEFT JOIN, which is the oracle for q63).
  */
object AsOfJoin {

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyColumns: Seq[String],
      leftTimeColumn: String,
      rightTimeColumn: String): DataFrame = {
    val payload = right.columns.filterNot(c => keyColumns.contains(c) || c == rightTimeColumn).toSeq
    require(payload.nonEmpty, "asOfJoin: right side has no payload columns")
    val leftCols = left.columns.toSeq
    require(
      payload.intersect(leftCols).isEmpty,
      s"asOfJoin: right payload columns collide with left: ${payload.intersect(leftCols).mkString(",")}")

    val ts = "__graft_asof_ts"
    val side = "__graft_asof_side" // right=0 sorts before left=1 at equal ts
    val pack = "__graft_asof_payload"
    // the payload travels as ONE struct: a right row whose payload values
    // are null still contributes a non-null struct, so the window carries
    // the latest ROW's attributes — per-column last() would skip nulls and
    // stitch together values from different right rows
    val l = left
      .withColumn(ts, col(leftTimeColumn))
      .withColumn(side, lit(1))
      .select((leftCols.map(col) ++
        Seq(lit(null).as(pack), col(ts), col(side))): _*)
    val r = right
      .withColumn(ts, col(rightTimeColumn))
      .withColumn(side, lit(0))
      .select((leftCols.map(c => if (keyColumns.contains(c)) col(c) else lit(null).as(c)) ++
        Seq(struct(payload.map(col): _*).as(pack), col(ts), col(side))): _*)

    val w = Window
      .partitionBy(keyColumns.map(col): _*)
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
    payload
      .foldLeft(carried)((df, c) => df.withColumn(c, col(pack).getField(c)))
      .drop(pack, ts, side)
  }
}
