package graft.query

import graft.operators.DimensionFilter

/** Declarative curation-pipeline models: the LLM-data operators (quality
  * features → filters → dedup → split → stats) as a rerunnable JSON
  * document, the same discipline the dsgrid-parity side already has for
  * project/dataset queries (`Models`/`Json`/`Submitter`).
  *
  * The shape mirrors the reference's dataset mapping plan (ref:
  * dsgrid/query/dataset_mapping_plan.py:17-143 — an ordered list of named
  * operations, each with a `persist` flag, plus a plan hash that guards
  * checkpoint reuse): a `CurationPlan` is an ordered list of stages over one
  * input table, each stage a discriminated-union case the
  * [[CurationSubmitter]] interprets against the existing operator registry
  * (`text.TextFunctions` / `text.Dedup` / `text.Sampling` /
  * `operators.Aggregation`). Everything is data — no DataFrames, no
  * lambdas — so a plan round-trips through JSON ([[CurationJson]]) and
  * content-hashes for the two-level cache exactly like `ProjectQuery`.
  */
object CurationModels {

  /** A curation pipeline: stages applied in order to the input table (a
    * parquet table name under the submitter's data directory). */
  final case class CurationPlan(
      name: String,
      input: String,
      stages: Seq[CurationStage])

  /** One pipeline stage. `persist` marks a plan-cut: with a cache
    * directory configured, the frame is written to scratch parquet after
    * this stage and later runs of the SAME plan prefix over UNCHANGED
    * input resume from it (ref MapOperation.persist +
    * MapOperationCheckpoint.mapping_plan_hash,
    * dataset_mapping_plan.py:34-62). */
  sealed trait CurationStage { def persist: Boolean }

  /** Stages that APPEND fixed-name columns implement this: the schema walk
    * refuses the stage when an output column already exists unless the
    * stage declares `overwrite` (column identifiers are case-insensitive
    * in both engines, so a silent replace is a real hazard — the r10
    * cumg/cumG lesson, guarded at validation time per the r15 advisory). */
  sealed trait AddsColumns { def overwrite: Boolean }

  /** Per-document text features, all derived from one materialized token
    * pass (the HOF-lambda CSE rule): feature names from
    * [[CurationModels.FeatureColumns]] — each adds its fixed output column.
    * A feature whose output column already exists REPLACES it (a corpus
    * with a source-provided `lang` column gets the engine's language id) —
    * but only when the stage declares `overwrite`; the schema walk refuses
    * the silent collision otherwise. */
  final case class TextFeaturesStage(
      textColumn: String = "text",
      features: Seq[String],
      overwrite: Boolean = false,
      persist: Boolean = false) extends CurationStage with AddsColumns

  /** Gopher rule-based quality metrics + keep flag
    * ([[graft.text.TextFunctions.gopherQualityColumns]], Rae et al. 2021
    * table A1) appended INLINE — pure per-row expressions, zero joins,
    * the gate runs in the scan stage: adds word_count,
    * mean_word_len, symbol_word_ratio, bullet_line_frac,
    * ellipsis_line_frac, alpha_word_frac, stopword_hits, keep. Compose
    * with a filter stage on `keep` (and drop the metric columns with a
    * select) to materialize the gated corpus. */
  final case class GopherFlagsStage(
      idColumn: String = "doc_id",
      textColumn: String = "text",
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Long = 2L,
      overwrite: Boolean = false,
      persist: Boolean = false) extends CurationStage with AddsColumns

  /** Gopher repetition signals ([[graft.text.TextFunctions
    * .repetitionStats]]) joined back by id: adds dup_line_frac,
    * dup_line_char_frac, top_ngram_char_frac. */
  final case class RepetitionStage(
      idColumn: String = "doc_id",
      textColumn: String = "text",
      ngram: Int = 2,
      overwrite: Boolean = false,
      persist: Boolean = false) extends CurationStage with AddsColumns

  /** Row filter over the data-free `DimensionFilter` forms (expression /
    * raw / column_operator / between) — the same ADT project queries use,
    * so the JSON dialect is shared. Filters apply in order (AND). */
  final case class CurationFilterStage(
      filters: Seq[DimensionFilter],
      persist: Boolean = false) extends CurationStage

  /** Exact dedup: keep the min-id document per normalized-content
    * fingerprint ([[graft.text.Dedup.dropExactDuplicates]]). */
  final case class ExactDedupStage(
      idColumn: String = "doc_id",
      textColumn: String = "text",
      persist: Boolean = false) extends CurationStage

  /** MinHash+LSH near-dedup: drop every document that verified-matches a
    * smaller-id document at or above `threshold`
    * ([[graft.text.Dedup.minhashNearDuplicates]] +
    * [[graft.text.Dedup.dropNearDuplicates]]).
    *
    * With `artifacts` (needs a registry-configured submitter — r16 verdict
    * item 5), the expensive map-side products — hashed shingle sets and
    * LSH band buckets — resolve through [[graft.registry.DerivedArtifacts]]
    * keyed by (input content token + canonical plan prefix + stage
    * params): a re-run of the same plan over unchanged input pays
    * metadata + the candidate join only, never the shingle pass; any
    * input or upstream-stage change rebuilds. Values are identical either
    * way (the artifact is a cache, not a semantic knob). */
  final case class MinHashDedupStage(
      idColumn: String = "doc_id",
      textColumn: String = "text",
      bands: Int = 16,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      artifacts: Boolean = false,
      persist: Boolean = false) extends CurationStage

  /** Benchmark decontamination ([[graft.text.Dedup.ngramOverlap]] — the
    * eval-leakage gate every training corpus needs): drop every document
    * sharing ≥ `minHits` word n-grams with the benchmark table
    * (`benchmarkInput`, a second parquet table under the submitter's data
    * directory — the one stage that reads beside the pipeline's input;
    * it must carry the same id and text column names, validated).
    * Benchmark n-grams broadcast as a distinct 64-bit hash set. */
  final case class DecontaminateStage(
      benchmarkInput: String,
      idColumn: String = "doc_id",
      textColumn: String = "text",
      ngram: Int = 8,
      minHits: Long = 1L,
      persist: Boolean = false) extends CurationStage

  /** Deterministic hash split ([[graft.text.Sampling.splitByHash]]):
    * content-keyed, reproducible across runs/partitionings; weights sum to
    * ≤ 1, the remainder gets a NULL split (held out entirely). */
  final case class SplitStage(
      idColumn: String = "doc_id",
      splits: Seq[(String, Double)],
      splitColumn: String = "split",
      seed: String = "",
      overwrite: Boolean = false,
      persist: Boolean = false) extends CurationStage with AddsColumns

  /** Deterministic Bernoulli sample ([[graft.text.Sampling.hashSample]]). */
  final case class SampleStage(
      idColumn: String = "doc_id",
      fraction: Double,
      seed: String = "",
      persist: Boolean = false) extends CurationStage

  /** Column projection. */
  final case class SelectStage(
      columns: Seq[String],
      persist: Boolean = false) extends CurationStage

  /** groupBy + named aggregations over the whitelisted registry
    * ([[graft.operators.Aggregation.builtins]]), plus `mean_int` — the
    * hash-stable integral mean (sum div count), for pipelines whose stats
    * must match across engines bit-for-bit. `count` counts rows (its
    * `column` is ignored); `count`/`sum`/`mean_int` outputs are BIGINT. */
  final case class AggregateStage(
      groupBy: Seq[String],
      aggregations: Seq[CurationAgg],
      persist: Boolean = false) extends CurationStage

  final case class CurationAgg(fn: String, column: String, alias: String)

  /** Ascending sort — presentation, runs last in most plans. */
  final case class SortStage(
      by: Seq[String],
      persist: Boolean = false) extends CurationStage

  /** SemDeDup semantic near-dedup ([[graft.ml.Similarity
    * .semanticDeduplicate]]): embeddings live in a SECOND table
    * (`embeddingInput`, keyed by `embeddingIdColumn` matched to the
    * pipeline's `idColumn`); rows with no embedding are KEPT (they cannot
    * be semantic duplicates of anything). Centroids are the k lowest-id
    * embedded rows with k = max(4, n div rowsPerCentroid) — k ∝ corpus,
    * the SemDeDup scale contract (the r10 q85 lesson: a fixed k makes
    * every cell grow with the data and the per-cell self-join quadratic). */
  final case class SemanticDedupStage(
      embeddingInput: String,
      idColumn: String = "doc_id",
      embeddingIdColumn: String = "vec_id",
      embeddingColumn: String = "embedding",
      threshold: Double = 0.99,
      rowsPerCentroid: Long = 1000L,
      persist: Boolean = false) extends CurationStage

  /** Cross-corpus line dedup ([[graft.text.Dedup.dropRepeatedLines]],
    * C4-style): every distinct line survives only at its first (min id,
    * position) occurrence; documents reassemble in original line order and
    * docs whose every line was seen earlier drop entirely. Non-text
    * columns are re-attached by id join. */
  final case class LineDedupStage(
      idColumn: String = "doc_id",
      textColumn: String = "text",
      separator: String = "\n",
      persist: Boolean = false) extends CurationStage

  /** Exact-substring duplicate-span removal ([[graft.text.Dedup
    * .removeDuplicateSpans]]): n-token windows appearing more than once
    * corpus-wide are cut from every document; rewrites `textColumn`
    * in place and appends `n_dup_windows`. */
  final case class SpanDedupStage(
      idColumn: String = "doc_id",
      textColumn: String = "text",
      ngram: Int = 8,
      overwrite: Boolean = false,
      persist: Boolean = false) extends CurationStage with AddsColumns

  /** PII redaction ([[graft.text.TextFunctions.redact]]): the shared
    * email/phone/ssn pattern set applied in place to `textColumn` —
    * pure per-row regexp_replace chain, zero joins, runs in the scan
    * stage (the gopher zero-join discipline). */
  final case class PiiRedactStage(
      textColumn: String = "text",
      persist: Boolean = false) extends CurationStage

  /** Per-domain document cap ([[graft.text.Sampling.capPerGroup]] — the
    * CommonCrawl domain-quota step): keep at most `cap` rows per
    * `groupBy` cell, chosen by deterministic content-keyed hash order
    * (stable across corpus refreshes, unlike arrival order). */
  final case class DomainCapStage(
      groupBy: Seq[String],
      cap: Int,
      idColumn: String = "doc_id",
      seed: String = "",
      persist: Boolean = false) extends CurationStage

  /** Quota-balanced sample ([[graft.text.Sampling.quotaBalancedSample]]):
    * n rows total, spread as evenly as the cells allow (base quota
    * n div cells + remainder to the first cells in cell order),
    * content-keyed hash pick within each cell. */
  final case class QuotaSampleStage(
      cellColumns: Seq[String],
      n: Long,
      idColumn: String = "doc_id",
      seed: String = "",
      persist: Boolean = false) extends CurationStage

  /** GPT-style sequence packing manifest ([[graft.text.Sharding
    * .packTrainingSequences]] + [[graft.text.Sharding.sequenceManifest]]):
    * per `groupBy` group, documents are laid end to end in id order, the
    * token stream is cut into `seqLen`-token training sequences, and the
    * stage emits the per-sequence manifest (groupBy*, seq, n_docs,
    * n_tokens) — an AGGREGATING stage, like `aggregate`. Token counts are
    * whitespace-token counts of `textColumn`. */
  final case class TokenPackStage(
      groupBy: Seq[String],
      idColumn: String = "doc_id",
      textColumn: String = "text",
      seqLen: Long = 256L,
      persist: Boolean = false) extends CurationStage

  /** Corpus data card ([[graft.text.DataCard.dataCard]] — r16 verdict
    * item 6): the per-`groupBy`-cell datasheet summary (exact counts,
    * integral means, census rank-pick median, top-language census pick,
    * fingerprint dup rate) as the natural TERMINAL stage of a curation
    * plan — an AGGREGATING stage, like `aggregate`/`token_pack`. */
  final case class DataCardStage(
      textColumn: String = "text",
      langColumn: String = "lang",
      groupBy: Seq[String],
      persist: Boolean = false) extends CurationStage

  /** The JSON discriminator of a stage — one spelling, shared by the
    * codec ([[CurationJson]]) and the dry-run explain surface. */
  def stageType(st: CurationStage): String = st match {
    case _: TextFeaturesStage => "text_features"
    case _: GopherFlagsStage => "gopher_flags"
    case _: RepetitionStage => "repetition"
    case _: CurationFilterStage => "filter"
    case _: ExactDedupStage => "exact_dedup"
    case _: MinHashDedupStage => "minhash_dedup"
    case _: DecontaminateStage => "decontaminate"
    case _: SplitStage => "split"
    case _: SampleStage => "sample"
    case _: SelectStage => "select"
    case _: AggregateStage => "aggregate"
    case _: SortStage => "sort"
    case _: SemanticDedupStage => "semantic_dedup"
    case _: LineDedupStage => "line_dedup"
    case _: SpanDedupStage => "span_dedup"
    case _: PiiRedactStage => "pii_redact"
    case _: DomainCapStage => "domain_cap"
    case _: QuotaSampleStage => "quota_sample"
    case _: TokenPackStage => "token_pack"
    case _: DataCardStage => "data_card"
  }

  /** Output columns [[DataCardStage]] appends after its group keys — the
    * [[graft.text.DataCard.dataCard]] schema, shared by the schema walk
    * and the API card route. */
  val DataCardColumns: Seq[String] = Seq(
    "n_docs", "total_tokens", "mean_tokens", "p50_tokens",
    "n_langs", "top_lang", "top_lang_ppm", "exact_dup_ppm")

  /** feature name → the output column it adds. */
  val FeatureColumns: Map[String, String] = Map(
    "language" -> "lang",
    "stopword_ratio" -> "swr",
    "token_count" -> "n_tokens",
    "quality_score" -> "quality")

  /** Canonical serialization for content-hash caching: the ADT is pure
    * data (no DataFrames anywhere, unlike project-query filters), so
    * case-class toString is stable and deterministic. */
  def canonical(plan: CurationPlan): String = plan.toString

  /** Canonical form of the plan PREFIX ending at stage `i` — the key a
    * stage-`i` persist point is stored under, so a resumed step can only
    * be reused by a plan whose input and stages-so-far are identical (ref
    * MapOperationCheckpoint.mapping_plan_hash guards the same way,
    * dataset_mapping_plan.py:46-62; note the prefix hash is STRICTER than
    * the reference's whole-plan hash — a suffix-only edit keeps graft's
    * prefix checkpoints valid where the reference recomputes). */
  def canonicalPrefix(plan: CurationPlan, i: Int): String =
    plan.copy(name = "", stages = plan.stages.take(i + 1)).toString
}
