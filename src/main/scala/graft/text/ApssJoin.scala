package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All-pairs similarity search (APSS) over SPARSE lexical vectors — the
  * token-space sibling of the embedding-space near-dup operators
  * ([[graft.ml.Similarity]]). Documents become integer term-frequency
  * vectors over word n-grams; pairs above a cosine threshold are found by
  * an inverted-index join (Bayardo et al., "Scaling Up All Pairs
  * Similarity Search", WWW'07): each shared gram contributes one candidate
  * row, the dot product is the SUM of tf products over shared grams, and
  * nothing is ever compared all-pairs.
  *
  * Determinism: vectors are integer counts, the dot and the squared norms
  * are integer sums (commutative — any partitioning), and the cosine
  * threshold `cos >= num/den` is evaluated by integer cross-multiplication
  *
  *   den^2 * dot^2 >= num^2 * |a|^2 * |b|^2
  *
  * so there is NO floating point anywhere — the operator is bit-exact and
  * oracle-replayable.
  *
  * Scale design (100 TB corpus):
  *   - grams shuffle as 8-byte xxhash64 keys, never strings (the q87
  *     trade: a 64-bit collision could merge two grams — P ≈ n²/2⁶⁵,
  *     negligible; the oracle replays with raw strings and agrees absent
  *     collisions);
  *   - the document-frequency cap `dfCap` drops grams occurring in more
  *     than `dfCap` documents FROM THE VECTORS (a stopword rule, part of
  *     the operator's semantics, replayed by the oracle) — it bounds the
  *     inverted-index join fanout at dfCap² candidate rows per gram, the
  *     classic APSS guard against a stop-gram generating |corpus|² pairs;
  *   - one explode → one self-join on the gram key → one (a,b) groupBy:
  *     three shuffles total, each keyed on hashes — no skew beyond the
  *     dfCap bound by construction.
  */
object ApssJoin {

  /** Integer TF vectors over word `n`-grams as (id, gram hash, tf) rows,
    * df-capped. Tokenization = trim/lower/whitespace-split (the q77
    * convention). */
  private[graft] def gramVectors(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      dfCap: Long): DataFrame = {
    // materialize tokens first (HOF-lambda CSE house rule)
    val toked = df
      .withColumn("__graft_toks", TextFunctions.tokens(lower(col(textCol))))
      .select(col(idCol), TextFunctions.wordShinglesFromTokens(col("__graft_toks"), n).as("__graft_grams"))
    val tf = toked
      .select(col(idCol), explode(col("__graft_grams")).as("__graft_gram"))
      .groupBy(col(idCol), xxhash64(col("__graft_gram")).as("gram"))
      .agg(count(lit(1)).as("tf"))
    val dfCounts = tf
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("__graft_df"))
      .filter(col("__graft_df") <= dfCap)
    tf.join(dfCounts.select("gram"), Seq("gram"))
  }

  /** Pairs `(id_a < id_b)` with cosine(tfVec_a, tfVec_b) >= num/den over
    * the df-capped gram space, with the exact integer evidence columns
    * (`dot`, `norm2_a`, `norm2_b`). Thresholds must satisfy
    * 0 < num <= den (cosine of count vectors is non-negative). */
  def cosinePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minCosNum: Long = 4L,
      minCosDen: Long = 5L,
      dfCap: Long = 1000L): DataFrame = {
    require(minCosNum > 0 && minCosNum <= minCosDen,
      s"cosinePairs: threshold $minCosNum/$minCosDen not in (0, 1]")
    require(n >= 1, s"cosinePairs: gram size must be >= 1, got $n")
    // vectors feed three consumers (index join ×2, norms) — compute once.
    // The self-join EXPANDS rows (up to dfCap² per gram), so partitioning
    // must match the output, not the input: explicit-N repartition on the
    // join key (exempt from AQE's input-bytes coalescing — the q115
    // lesson), which also co-partitions both join sides.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val vecs = gramVectors(df, idCol, textCol, n, dfCap)
      .repartition(par, col("gram"))
      .cache()
    try {
      val norms = vecs
        .groupBy(col(idCol))
        .agg(sum(col("tf") * col("tf")).as("norm2"))
      val a = vecs.select(col("gram"), col(idCol).as("id_a"), col("tf").as("tf_a"))
      val b = vecs.select(col("gram"), col(idCol).as("id_b"), col("tf").as("tf_b"))
      val dots = a
        .join(b, Seq("gram"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
      val out = dots
        .join(norms.select(col(idCol).as("id_a"), col("norm2").as("norm2_a")), Seq("id_a"))
        .join(norms.select(col(idCol).as("id_b"), col("norm2").as("norm2_b")), Seq("id_b"))
        .filter(
          lit(minCosDen * minCosDen) * col("dot") * col("dot") >=
            lit(minCosNum * minCosNum) * col("norm2_a") * col("norm2_b"))
        .select(col("id_a"), col("id_b"), col("dot"), col("norm2_a"), col("norm2_b"))
      // cut lineage so the result survives the unpersist below
      out.localCheckpoint(true)
    } finally vecs.unpersist()
  }
}
