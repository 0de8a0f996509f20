package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the classic fix when one hot key
  * concentrates a shuffle partition and AQE's skew-join split can't help
  * (e.g. the skew is in a join the optimizer planned as broadcast-less
  * sort-merge, or the runtime is pre-AQE).
  *
  * Mechanics: the BIG side appends `salt = pmod(xxhash64(saltSource), s)`
  * — `saltSource` must vary WITHIN a hot key (the big table's own row id
  * column is the usual choice) so the hot key's rows spread across `s`
  * sub-partitions; the SMALL side replicates each row `s` times via a
  * sequence explode. Joining on `keys :+ salt` then yields exactly the
  * plain equi-join's rows (each big row matches its small row at exactly
  * its own salt), with the hot key's work spread over `s` tasks.
  *
  * Inner and left_outer semantics are preserved (each big row still
  * matches, or not, exactly once per small match); right/full would count
  * unmatched small rows `s` times and are rejected.
  *
  * Cost model: ×s duplication of the small side's shuffle — worth it only
  * when the small side is modest and the hot key dominates a task. Prefer
  * `broadcast(small)` when the small side fits in memory; salting is for
  * the in-between regime. */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      saltSource: Column,
      joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must exceed 1 (1 would be a plain join)")
    require(keys.nonEmpty, "saltedEquiJoin needs join keys")
    require(
      Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedEquiJoin preserves inner/left semantics only, got $joinType")
    val b = big.withColumn(
      "__graft_salt", pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val sm = small.withColumn(
      "__graft_salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, keys :+ "__graft_salt", joinType).drop("__graft_salt")
  }
}
