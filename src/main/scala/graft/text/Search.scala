package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus retrieval and collocation mining over the inverted index — the
  * "find the documents / find the phrases" half of a training-data pipeline
  * (topic-targeted subcorpus selection, phrase-vocabulary induction a la
  * word2phrase). The reference engine has no text-retrieval surface; this is
  * extension territory, built integer-exact so a DuckDB oracle can replay
  * every score bit-for-bit.
  *
  * Scale shape: everything is one explode + hash aggregations keyed by term.
  * The query-term filter lands IMMEDIATELY after the explode as a broadcast
  * semi-join, so only postings of the queried terms ever shuffle — the
  * posting volume is (matching docs x query terms), never the corpus token
  * count. Document frequencies are computed from that same filtered posting
  * set (df is only needed for queried terms), so no full-vocabulary stats
  * job runs at all.
  */
object Search {

  /** Term postings for the queried terms only: (id, term, tf).
    *
    * Tokens are materialized in their own projection before the explode and
    * the explode wraps the attribute in `array_compact` — both per the
    * explode-trap rules (InferFiltersFromGenerate would otherwise inline
    * the tokenizer regexes below the Generate and run them twice). */
  private def queryPostings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String]): DataFrame = {
    val toks = df.select(col(idCol).as("id"), TextFunctions.tokens(lower(col(textCol))).as("toks"))
    toks
      .select(col("id"), explode(array_compact(col("toks"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term"), col("id"))
      .agg(count(lit(1)).cast("long").as("tf"))
  }

  /** Integer floor-log2 of a positive BIGINT column — the bit-stable idf
    * spelling (`length(bin(x)) - 1`; DuckDB's `bin` matches). */
  private def ilog2(x: Column): Column = (length(bin(x)) - 1).cast("long")

  /** Top-k TF-IDF retrieval: score(doc) = sum over distinct query terms of
    * tf(doc, term) * ilog2((n_docs * idfScale) / df(term)), every factor an
    * exact BIGINT (integer division; ilog2 = floor-log2 via `bin`), so
    * scores are engine-independent — no libm log, no float idf. `idfScale`
    * is the fixed-point resolution of the idf (a power of two; at scale s,
    * idf = log2(s) + floor-log2(n/df) exactly, so rankings refine as s
    * grows while staying integer). Ties break on id ascending; k is
    * enforced with orderBy+limit (TakeOrderedAndProject: per-partition
    * top-k heaps, only k rows reach the final single-partition exchange).
    *
    * Returns (id, score) with exactly the k best matches (fewer if fewer
    * docs match any term). */
  def searchTopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      idfScale: Long = 1024L): DataFrame = {
    require(terms.nonEmpty, "searchTopK: no query terms")
    require(k > 0, "searchTopK: k must be positive")
    require(idfScale >= 1, "searchTopK: idfScale must be >= 1")
    // eager checkpoint: the posting set (matching docs x |terms|, small by
    // construction) feeds both the df-stats aggregate and the score join;
    // recomputing it would re-scan the corpus twice, and a cache would pin
    // a frame in a long-lived session past return.
    val posts = queryPostings(df, idCol, textCol, terms.distinct).localCheckpoint(true)
    // (term, id) is unique after the groupBy, so count(*) per term IS the
    // document frequency
    val stats = posts.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df_t"))
    val nDocs = df.agg(count(lit(1)).cast("long").as("n_docs"))
    posts
      .join(broadcast(stats), Seq("term"))
      .crossJoin(broadcast(nDocs))
      // `div`, not `/`: Spark's `/` on BIGINTs is double division
      .withColumn("idf", ilog2(expr(s"(n_docs * ${idfScale}L) div df_t")))
      .groupBy(col("id"))
      .agg(sum(col("tf") * col("idf")).cast("long").as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
      .select(col("id").as(idCol), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. SIGIR'09) of two rankings —
    * the standard hybrid-retrieval combiner (lexical + vector): score(d) =
    * Σ_r 1/(kConst + rank_r(d)) over the rankings that contain d. Rank
    * inputs are (idCol, rankCol) frames, 1-based. Deterministic: each
    * score is a fixed two-term IEEE expression over exact integer ranks
    * (no row-order aggregation), so any engine replays it bit-for-bit.
    * Ties break on id. Both ranking frames are top-k-sized by
    * construction, so the fuse is a broadcast-scale full-outer join. */
  def rrfFuse(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      kConst: Int = 60,
      topK: Int = 100): DataFrame = {
    require(kConst >= 1, "rrfFuse: kConst must be >= 1")
    require(topK >= 1, "rrfFuse: topK must be >= 1")
    val av = a.select(col(idCol).as("id"), col("rank").as("rank_a"))
    val bv = b.select(col(idCol).as("id"), col("rank").as("rank_b"))
    av.join(bv, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kConst) + col("rank_a")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(kConst) + col("rank_b")), lit(0.0)))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(topK)
      .select(col("id").as(idCol), col("rank_a"), col("rank_b"), col("rrf"))
  }

  /** Bigram collocation mining (word2phrase-style, Mikolov et al. 2013):
    * score(w1 w2) = (c12 * T) / (c1 * c2) with T = total corpus tokens —
    * spelled in exact BIGINT integer division so both engines land on the
    * same ranks. Bigrams below `minCount` are pruned BEFORE the unigram
    * join (the usual long-tail guard). Top-k by (score desc, c12 desc,
    * w1, w2).
    *
    * Scale shape: one explode for unigrams, one for bigrams (both over
    * materialized token arrays, `array_compact`-wrapped), hash-aggregated
    * map-side; the unigram vocabulary joins in twice via broadcast (a
    * vocabulary is small relative to a corpus). Overflow guard: c12 * T
    * must fit in a BIGINT — T < ~3e9 with c12 <= T, or pre-shard the
    * corpus and merge counts; ANSI mode turns a violation into a loud
    * error, never a wrap. */
  def collocations(
      df: DataFrame,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1, "collocations: minCount must be >= 1")
    require(k > 0, "collocations: k must be positive")
    val toks = df.select(TextFunctions.tokens(lower(col(textCol))).as("toks"))
    val uni = toks
      .select(explode(array_compact(col("toks"))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("c"))
    // adjacent pairs only (no document-spanning bigrams); docs with < 2
    // tokens contribute none. Struct-valued transform keeps the two words
    // separate — no separator-collision risk from string-joined grams.
    val cnt = size(col("toks"))
    val bi = toks
      .select(explode(array_compact(when(cnt >= 2,
        transform(sequence(lit(1), cnt - 1),
          i => struct(element_at(col("toks"), i).as("w1"),
                      element_at(col("toks"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("long").as("c12"))
      .filter(col("c12") >= minCount)
    val total = uni.agg(sum(col("c")).cast("long").as("t_tokens"))
    bi
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), Seq("w2"))
      .crossJoin(broadcast(total))
      // BIGINT `div` throughout — `/` would be double division
      .withColumn("score", expr("(c12 * t_tokens) div (c1 * c2)"))
      .select(col("w1"), col("w2"), col("c12"), col("score").cast("long").as("score"))
      .orderBy(col("score").desc, col("c12").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Positional proximity search — the POSITION-aware rung above the
    * bag-of-words retrievers (q-family TF-IDF/BM25 see "hash … join" and
    * "join … 500 tokens … hash" as the same doc; a proximity ranker does
    * not): for two query terms, rank documents containing BOTH by the
    * minimum token distance between any occurrence pair.
    *
    * The min-span uses the sorted-union property: over the doc's A/B
    * occurrence positions in token order, the minimum |posA − posB| is
    * realized by some ADJACENT pair with different terms — so one
    * doc-keyed window (lag) replaces the quadratic pair join; cost is
    * linear in occurrences. A coarse `contains` prefilter on the lowered
    * text runs BEFORE tokenization — sound superset, every token is a
    * substring of the lowered text — so the tokenizer only runs on
    * candidate docs. Top-k via orderBy+limit (TakeOrderedAndProject).
    *
    * Returns (id, n_a, n_b, min_span) — the k best by (min_span, id). */
  def proximityMinSpan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      termA: String,
      termB: String,
      k: Int): DataFrame = {
    require(termA != termB, "proximityMinSpan: distinct terms required")
    require(k >= 1, s"proximityMinSpan: k $k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val candidates = df
      .filter(lower(col(textCol)).contains(termA) && lower(col(textCol)).contains(termB))
      .select(col(idCol).as("id"), TextFunctions.tokens(TextFunctions.normalize(col(textCol))).as("__graft_toks"))
    val occ = candidates
      .select(col("id"), posexplode(array_compact(col("__graft_toks"))))
      .filter(col("col").isin(termA, termB))
      .select(col("id"), col("pos").cast("long").as("p"), col("col").as("t"))
    val w = Window.partitionBy("id").orderBy("p")
    val spans = occ
      .withColumn("__graft_pp", lag(col("p"), 1).over(w))
      .withColumn("__graft_pt", lag(col("t"), 1).over(w))
      .withColumn("__graft_span",
        when(col("__graft_pt").isNotNull && col("__graft_pt") =!= col("t"),
          col("p") - col("__graft_pp")))
    spans
      .groupBy("id")
      .agg(
        sum(when(col("t") === termA, 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col("t") === termB, 1L).otherwise(0L)).cast("long").as("n_b"),
        min(col("__graft_span")).cast("long").as("min_span"))
      .filter(col("n_a") > 0L && col("n_b") > 0L)
      .orderBy(col("min_span"), col("id"))
      .limit(k)
  }
}
