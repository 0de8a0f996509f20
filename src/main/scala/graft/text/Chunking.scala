package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — the RAG / long-context preprocessing step: split
  * each document into overlapping fixed-size token windows with stable,
  * reproducible chunk ids. The training-data sibling of [[Sharding]]
  * (which packs whole documents into shards; this splits single documents
  * into model-window-sized pieces).
  *
  * Chunk layout: with `chunkTokens` = C and `overlapTokens` = V, chunk k
  * starts at token k·(C−V) (0-based) and spans up to C tokens; start
  * positions run while start ≤ max(nTokens − V − 1, 0), so every token is
  * covered, consecutive chunks share exactly V tokens, the final chunk may
  * be short, and no chunk is a suffix-duplicate of its predecessor. A
  * document shorter than C yields exactly one chunk; an empty document
  * yields none.
  *
  * Scale shape: pure map-side — tokenize once per document, one generator
  * over the (tiny) start-position list, per-chunk slice+join projections;
  * no shuffle, no state. Chunk ids are per-document ordinals, so the
  * output is deterministic under any partitioning.
  */
object Chunking {

  /** (idCol, chunk_id, token_start, n_tokens, chunk_text) — one row per
    * chunk. Tokenization is whitespace-split of the raw text (chunking
    * must preserve the original casing/punctuation, unlike the dedup
    * family's normalized pipeline). */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkDocuments: chunkTokens $chunkTokens must be >= 1")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"chunkDocuments: overlapTokens $overlapTokens must be in [0, $chunkTokens)")
    val stride = chunkTokens - overlapTokens
    val toked = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__graft_toks"))
    // the generator child is a sequence EXPRESSION (not a bare attribute),
    // so InferFiltersFromGenerate leaves the tokenize projection alone
    // (the q78 trap); empty documents drop at the explode because the
    // start list of an empty token array is filtered to empty
    val starts = when(size(col("__graft_toks")) > 0,
      sequence(
        lit(0),
        greatest(size(col("__graft_toks")) - overlapTokens - 1, lit(0)),
        lit(stride))).otherwise(array())
    toked
      .select(col(idCol), col("__graft_toks"),
        posexplode(starts).as(Seq("chunk_id", "__graft_start")))
      .withColumn("__graft_chunk",
        slice(col("__graft_toks"), col("__graft_start") + 1, lit(chunkTokens)))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("__graft_start").cast("long").as("token_start"),
        size(col("__graft_chunk")).cast("long").as("n_tokens"),
        array_join(col("__graft_chunk"), " ").as("chunk_text"))
  }
}
