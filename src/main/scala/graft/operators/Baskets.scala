package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity mining: pairwise item co-occurrence with an
  * integer lift score — the classic "customers who bought X also bought Y"
  * prep (and, over document baskets, the term-affinity mining word2phrase
  * generalizes).
  */
object Baskets {

  /** Co-occurring item pairs with exact integer lift:
    *
    *   lift_ppm = (c12 · n_baskets · scale) div (c1 · c2)
    *
    * (> scale ⇒ positively associated). Items are deduplicated within a
    * basket first, so c12 counts BASKETS, not row multiplicity, and the
    * pair (a, b) is emitted once with a < b.
    *
    * Scale shape: the (basket, item) set is materialized once and
    * checkpointed for its three consumers (basket count, singles, pair
    * join); the pair self-join — the only row-EXPANDING stage — is
    * preceded by an EXPLICIT-N repartition on the basket key (AQE sizes
    * by input bytes and cannot see the expansion, the q115 lesson);
    * `minSupport` prunes the tail before lift arithmetic. Overflow-safe
    * by precondition: c12 ≤ n_baskets, so the numerator is bounded by
    * n_baskets²·scale — enforced against 2⁶³. */
  def cooccurrenceLift(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      scale: Long = 1000000L): DataFrame = {
    require(minSupport >= 1, s"cooccurrenceLift: minSupport must be >= 1, got $minSupport")
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("item"))
      .distinct()
      .localCheckpoint(true) // consumed 4x: count, singles, two pair sides
    val nBaskets = items.select(countDistinct(col("b")).as("n_baskets"))
    val nb = nBaskets.head().getLong(0)
    require(nb > 0, "cooccurrenceLift: empty input")
    require(nb <= 3037000499L / math.max(1L, math.sqrt(scale.toDouble).toLong),
      s"cooccurrenceLift: n_baskets=$nb with scale=$scale risks 64-bit overflow")
    val singles = items.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val par = df.sparkSession.sparkContext.defaultParallelism
    val sided = items.repartition(par, col("b"))
    val pairs = sided
      .join(sided.select(col("b"), col("item").as("item_b")), Seq("b"))
      .filter(col("item") < col("item_b"))
      .groupBy(col("item").as("a"), col("item_b").as("bb"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minSupport)
    pairs
      .join(broadcast(singles.select(col("item").as("a"), col("c").as("c1"))), Seq("a"))
      .join(broadcast(singles.select(col("item").as("bb"), col("c").as("c2"))), Seq("bb"))
      .select(
        col("a").as("item_a"), col("bb").as("item_b"),
        col("c12"), col("c1"), col("c2"),
        expr(s"(c12 * ${nb}L * ${scale}L) div (c1 * c2)").as("lift_ppm"))
  }
}
