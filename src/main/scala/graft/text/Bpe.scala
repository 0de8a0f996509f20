package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ExprColumn

import graft.plans.MergeAdjacentPair

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
  * vocabulary-table formulation that makes byte-pair encoding tractable at
  * corpus scale:
  *
  *   1. ONE corpus-wide shuffle collapses 100 TB of text into a word
  *      frequency table (bounded by the distinct-word vocabulary, not the
  *      corpus) whose symbol arrays start as single characters;
  *   2. each merge round is then a cheap aggregation OVER THE WORD TABLE:
  *      count weighted adjacent symbol pairs (map-side partials), pick the
  *      global argmax (count desc, then lexicographic pair — deterministic),
  *      and apply the rule map-side via [[MergeAdjacentPair]] — the pair
  *      travels as a codegen reference object, so k rounds reuse one
  *      compiled plan shape instead of recompiling Janino source per round.
  *
  * Each round's table is eagerly `localCheckpoint`ed: the next round reads a
  * materialized table instead of replaying the whole merge chain (the same
  * lineage-truncation discipline as k-means and connected components; swap
  * in a durable checkpoint on preemptible clusters).
  *
  * Merges never cross word boundaries and no end-of-word marker is appended
  * (callers wanting GPT-style markers can suffix one before training —
  * symbols are opaque strings here).
  *
  * Reference scope: the reference repo has no tokenizer-training operator;
  * this is part of graft's training-data-pipeline extension family.
  */
object Bpe {

  /** The word-frequency table: normalized whitespace words → (syms, cnt)
    * with `syms` the word split into single-character symbols. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(TextFunctions.tokens(TextFunctions.normalize(col(textCol))).as("__toks"))
      // explode over array_compact(attribute), NOT the raw projected
      // expression: suppresses InferFiltersFromGenerate's size()>0 filter,
      // which pushdown would otherwise inline as a second evaluation of the
      // whole tokenize pipeline (the q78 lesson)
      .select(explode(array_compact(col("__toks"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .select(expr("regexp_extract_all(word, '(.)', 1)").as("syms"), col("cnt"))

  /** Train `numMerges` BPE merge rules. Returns one row per rule:
    * (rank 1-based, l, r, cnt) in learning order. Stops early if no pair
    * occurs at least twice (merging singletons is noise).
    *
    * Two execution paths with IDENTICAL semantics (spec-enforced equal):
    * when the word table fits under `localVocabThreshold` rows, the merge
    * rounds run driver-side over the collected table (one Spark aggregation
    * total — the k-means-centroid pattern: driver math over a bounded
    * aggregate, not a scheduler round-trip per rule); above it, each round
    * is a distributed pair-count aggregation with the rule applied map-side
    * and the table `localCheckpoint`ed per round. Tie-breaks coincide
    * because symbols are ASCII post-`normalize` (Spark binary ordering ==
    * Scala string ordering there). */
  def trainMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      localVocabThreshold: Long = 1L << 17): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    var words = wordTable(df, textCol).localCheckpoint()
    val learned =
      if (words.count() <= localVocabThreshold) {
        val local = words.collect().map(r =>
          (r.getSeq[String](0).toArray, r.getLong(1)))
        trainMergesLocal(local, numMerges)
      } else {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
        var rank = 1
        var exhausted = false
        while (rank <= numMerges && !exhausted) {
          val best = pairCounts(words)
            .orderBy(desc("c"), asc("l"), asc("r"))
            .limit(1)
            .collect()
          best.headOption.filter(_.getLong(2) >= 2L) match {
            case Some(row) =>
              val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
              buf += ((rank, l, r, c))
              val merged = ExprColumn(MergeAdjacentPair(ExprColumn.expr(col("syms")), l, r))
              val next = words.select(merged.as("syms"), col("cnt")).transform(org.apache.spark.sql.graft.CheckpointFresh.apply)
              words = next
              rank += 1
            case None => exhausted = true
          }
        }
        buf.toSeq
      }
    learned.toDF("rank", "l", "r", "cnt")
  }

  /** The driver-side merge loop — the same greedy algorithm, same
    * (count desc, lexicographic) tie-break, same ≥2 stop rule. */
  private def trainMergesLocal(
      table: Array[(Array[String], Long)],
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    var words = table
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .headOption.filter(_._2 >= 2L)
      best match {
        case Some(((l, r), c)) =>
          learned += ((rank, l, r, c))
          words = words.map { case (syms, cnt) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, cnt)
          }
          rank += 1
        case None => done = true
      }
    }
    learned.toSeq
  }

  /** Encode text with an already-learned merge list: one
    * [[graft.plans.BpeEncodeWords]] codegen node over the word array — the
    * whole per-document encode (code-point split, every rule in rank order,
    * flatten) in a single tight JVM loop, the merge table riding as a
    * codegen reference object. Pure map-side projection: encoding 100 TB is
    * a scan, the merge table being driver-small by construction. Adds
    * `bpe_tokens` (array<string>). Bit-equal to [[encodeComposed]]
    * (spec-enforced). */
  def encode(df: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val words = TextFunctions.tokens(TextFunctions.normalize(col(textCol)))
    df.withColumn("bpe_tokens",
      ExprColumn(graft.plans.BpeEncodeWords(ExprColumn.expr(words), merges)))
  }

  /** The composed reference spelling of [[encode]] (interpreted `transform`
    * lambda over chained [[MergeAdjacentPair]] nodes) — kept as the
    * equivalence oracle for the fused expression's spec. */
  def encodeComposed(df: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val words = TextFunctions.tokens(TextFunctions.normalize(col(textCol)))
    val encodedWords = transform(words, w => {
      val chars = regexp_extract_all(w, lit("(.)"), lit(1))
      merges.foldLeft(chars) { case (acc, (l, r)) =>
        ExprColumn(MergeAdjacentPair(ExprColumn.expr(acc), l, r))
      }
    })
    df.withColumn("bpe_tokens", flatten(encodedWords))
  }

  /** Weighted adjacent-pair counts of a word table — the per-round
    * aggregation. Single-symbol words drop out before the fanout. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(
        explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i + 1] AS r))"))
          .as("p"),
        col("cnt"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))
}
