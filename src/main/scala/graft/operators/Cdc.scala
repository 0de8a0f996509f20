package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — the MERGE INTO / upsert kernel every
  * incrementally-maintained 100 TB table needs: fold a batch of keyed
  * change records (inserts/updates/deletes) into a base snapshot,
  * producing the next snapshot.
  *
  * Scale shape: the change batch is first compacted to one winner per key
  * (a window over the batch — which is delta-sized, not base-sized), then
  * a single key-partitioned outer join against the base. Two shuffles of
  * the DELTA plus one of the base; with a small delta AQE broadcasts the
  * compacted changes and the base never shuffles at all. No driver-side
  * state, no iteration.
  *
  * Reference scope: the reference registry overwrites whole datasets
  * (its registry managers); row-level merge is part of graft's pipeline extension
  * family (the Delta/Iceberg MERGE shape, re-expressed as a plain join).
  */
object Cdc {

  /** Apply `changes` to `base`.
    *
    * @param keys     equality key columns (present in both frames)
    * @param opCol    change-operation column in `changes`: 'I' | 'U' | 'D'
    *                 (insert and update are both upserts — last write wins)
    * @param orderBy  change-ordering columns (e.g. change sequence number);
    *                 per key the LAST change in this order wins. Ties must
    *                 be impossible by construction (pass a unique sequence)
    * @return the next snapshot with `base`'s columns: base rows whose key
    *         has no change survive; 'I'/'U' winners replace/insert their
    *         key's row with the change's payload; 'D' winners delete it
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String,
      orderBy: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "applyChanges: no key columns")
    val payload = base.columns.toSeq
    // compact the delta: one winner per key, by change order DESC
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)
    val winners = changes
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
    val keyCols = keys.map(k => winners(k).as(s"__k_$k"))
    val winSel = winners.select(
      keyCols ++
        Seq(winners(opCol).as("__graft_op")) ++
        payload.filterNot(keys.contains).map(c => winners(c).as(s"__c_$c")): _*)
    // one outer join on the keys: unmatched base rows pass through,
    // matched rows take the change payload unless the winner is a delete,
    // unmatched 'I'/'U' changes become inserts
    val joined = base.join(
      winSel,
      keys.map(k => base(k) === winSel(s"__k_$k")).reduce(_ && _),
      "full_outer")
    val out = payload.map { c =>
      if (keys.contains(c))
        coalesce(base(c), winSel(s"__k_$c")).as(c)
      else
        when(col("__graft_op").isNull, base(c))
          .otherwise(winSel(s"__c_$c")).as(c)
    }
    joined
      .filter(col("__graft_op").isNull || col("__graft_op") =!= "D")
      .select(out: _*)
  }
}
