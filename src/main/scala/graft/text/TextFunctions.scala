package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, built
  * as pure column expressions (whole-stage codegen, no UDFs) so they run at
  * parquet-scan speed on 100 TB of documents. */
object TextFunctions {

  /** Whitespace tokens. Empty string → empty array. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: count word-piece-like chunks — runs of
    * letters/digits plus standalone punctuation — roughly matching how a BPE
    * tokenizer segments ASCII text; good enough for budget estimation. */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), t => length(trim(t)) > 0))

  /** Character-level n-gram shingles from an ALREADY-MATERIALIZED normalized
    * text column (same HOF-lambda CSE caveat as `wordShinglesFromTokens`). */
  def charShinglesFromNormalized(norm: Column, n: Int): Column = {
    // slide a window: sequence(0, len-n) -> substr
    val len = length(norm)
    when(len < n, array(norm)).otherwise(
      transform(sequence(lit(0), len - lit(n)), i => norm.substr(i + 1, lit(n))))
  }

  /** Character-level n-gram shingles of the normalized text (convenience;
    * materialize `normalize(text)` first in hot paths). */
  def charShingles(text: Column, n: Int): Column =
    charShinglesFromNormalized(normalize(text), n)

  /** Word-level n-gram shingles from an ALREADY-MATERIALIZED token-array
    * column. Catalyst does not common-subexpression-eliminate inside
    * higher-order-function lambdas: if `toks` were the full
    * tokens(normalize(text)) expression it would re-run both regexes once
    * per shingle position (measured 10× the whole minhash pipeline cost at
    * sf0.1). Callers in hot paths must `withColumn` the tokens first. */
  def wordShinglesFromTokens(toks: Column, n: Int): Column = {
    val cnt = size(toks)
    // per-position n fixed element_at lookups + one concat_ws, instead of
    // slice (array copy) + array_join — HOF lambdas run interpreted, so the
    // per-element allocation count is what the stage cost scales with
    when(cnt <= n, array(array_join(toks, " "))).otherwise(
      transform(
        sequence(lit(0), cnt - lit(n)),
        i => concat_ws(" ", (1 to n).map(k => element_at(toks, i + lit(k))): _*)))
  }

  /** Word-level n-gram shingles straight from text — convenience for small
    * data / tests; see `wordShinglesFromTokens` for the hot-path form. */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(normalize(text)), n)

  /** Lowercase, collapse whitespace, strip non-alphanumerics — the usual
    * dedup normalization. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** HTML boilerplate stripping — the first cleaning pass over crawled
    * documents: drop `<script>`/`<style>` blocks wholesale (their CONTENT
    * is code, not text), drop remaining tags, unescape the six common
    * entities (`&amp;` LAST, per the standard rule — `&amp;lt;` must yield
    * the literal `&lt;`, never `<`), collapse whitespace. Pure chained
    * regexp_replace/replace — whole-stage codegen, scan-speed, the shape
    * that runs map-side over 100 TB of crawl. Regex-based by design: a
    * conformant HTML5 parser is not expressible as column ops, and crawl
    * pipelines (C4, RefinedWeb) use exactly this class of extraction. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</\\1\\s*>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val unescaped = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
        "&nbsp;", " "), "&amp;", "&")
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Unicode normalization (NFC by default; NFD / NFKC / NFKD). Mixed-form
    * inputs make byte-identical-looking documents hash differently, so this
    * belongs in front of every dedup signature over non-ASCII corpora. A
    * native codegen expression ([[graft.plans.UnicodeNormalize]]) with an
    * ASCII fast path — NOT a UDF — so it stays inside whole-stage codegen
    * in the scan-stage cleaning pipeline. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graft.ExprColumn
    ExprColumn(graft.plans.UnicodeNormalize(ExprColumn.expr(text), form))
  }

  /** Quality-score features (length / punctuation / stopword / word-length
    * heuristics, Gopher/C4-style). Returns a struct; `qualityScore` collapses
    * to a single [0,1] score. */
  val englishStopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "in", "a", "is", "that", "it", "for",
    "on", "with", "as", "was", "at", "by", "be", "this", "are", "or")

  /** From a materialized lowercase token array (hot-path form — the text
    * variant inlines the tokenize pipeline into three subexpressions). */
  def stopwordRatioFromTokens(toks: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val hits = filter(toks, t => t.isin(stopwords: _*))
    when(size(toks) === 0, lit(0.0)).otherwise(size(hits).cast("double") / size(toks))
  }

  def stopwordRatio(text: Column, stopwords: Seq[String] = englishStopwords): Column =
    stopwordRatioFromTokens(tokens(lower(text)), stopwords)

  def punctuationRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0))
      .otherwise((n - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / n)
  }

  def meanWordLengthFromTokens(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  def meanWordLength(text: Column): Column = meanWordLengthFromTokens(tokens(text))

  /** Composite quality score in [0,1]: rewards mid-range length, low
    * punctuation density, presence of stopwords, sane mean word length. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthOk = when(nTok >= 50 && nTok <= 100000, 1.0).otherwise(nTok / 50.0)
    val punct = punctuationRatio(text)
    val punctOk = when(punct <= 0.2, 1.0).otherwise(greatest(lit(0.0), lit(1.0) - (punct - 0.2) * 5))
    val stop = stopwordRatio(text)
    val stopOk = least(lit(1.0), stop * 10)
    val mwl = meanWordLength(text)
    val mwlOk = when(mwl >= 3 && mwl <= 10, 1.0).otherwise(0.5)
    least(lit(1.0), (lengthOk + punctOk + stopOk + mwlOk) / 4)
  }

  /** Gopher-style repetition signals (Rae et al. 2021 "Scaling Language
    * Models", table A1 — the public repetition filters every web-scale
    * pipeline applies): per document,
    *  - `dup_line_frac`      — fraction of lines that are repeats of an
    *                           already-seen line,
    *  - `dup_line_char_frac` — fraction of line characters inside lines
    *                           occurring more than once,
    *  - `top_ngram_char_frac`— characters covered by the most frequent
    *                           word n-gram (count × gram length) over the
    *                           normalized text length; ties break toward
    *                           the lexicographically LARGEST gram
    *                           (`max(struct(cnt, gram))` — deterministic
    *                           and cheap on both engines).
    * Shape at scale: two explode → groupBy pipelines keyed by (doc, unit)
    * then (doc) — whole-stage codegen with map-side partial aggregation,
    * the same shuffle profile as the line-dedup operator. Documents with
    * no lines/tokens report zero fractions. */
  def repetitionStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lineSep: String = "\n",
      ngram: Int = 2): DataFrame = {
    val ids = df.select(col(idCol))
    val lines = df.select(
      col(idCol),
      explode(filter(split(col(textCol), java.util.regex.Pattern.quote(lineSep)),
        l => length(l) > 0)).as("__graft_line"))
    val perLine = lines
      .groupBy(col(idCol), col("__graft_line"))
      .agg(count(lit(1)).as("__graft_cnt"))
      .withColumn("__graft_chars", length(col("__graft_line")).cast("long"))
    val lineStats = perLine.groupBy(col(idCol)).agg(
      ((sum(col("__graft_cnt")) - count(lit(1))).cast("double") / sum(col("__graft_cnt")))
        .as("dup_line_frac"),
      (sum(when(col("__graft_cnt") > 1, col("__graft_cnt") * col("__graft_chars")).otherwise(0L))
        .cast("double") / sum(col("__graft_cnt") * col("__graft_chars")))
        .as("dup_line_char_frac"))
    val withToks = df.select(col(idCol), normalize(col(textCol)).as("__graft_norm"))
      .withColumn("__graft_toks", tokens(col("__graft_norm")))
      .withColumn("__graft_nlen", length(col("__graft_norm")).cast("long"))
    // no .filter on the expensive projected token column — predicate
    // pushdown would inline the tokenize pipeline below the Project and
    // run it twice (the q78 60× regression); an empty-guard inside the
    // generator child drops tokenless docs with toks evaluated once
    val grams = withToks
      .select(
        col(idCol), col("__graft_nlen"),
        explode(when(size(col("__graft_toks")) > 0,
          wordShinglesFromTokens(col("__graft_toks"), ngram))
          .otherwise(array().cast("array<string>"))).as("__graft_gram"))
    val gramStats = grams
      .groupBy(col(idCol), col("__graft_gram"))
      .agg(count(lit(1)).as("__graft_cnt"), max(col("__graft_nlen")).as("__graft_nlen"))
      .groupBy(col(idCol))
      .agg(
        max(struct(col("__graft_cnt"), col("__graft_gram"))).as("__graft_top"),
        max(col("__graft_nlen")).as("__graft_nlen"))
      .select(
        col(idCol),
        ((col("__graft_top.__graft_cnt") * length(col("__graft_top.__graft_gram")).cast("long"))
          .cast("double") / greatest(col("__graft_nlen"), lit(1L)))
          .as("top_ngram_char_frac"))
    ids
      .join(lineStats, Seq(idCol), "left")
      .join(gramStats, Seq(idCol), "left")
      .na.fill(0.0, Seq("dup_line_frac", "dup_line_char_frac", "top_ngram_char_frac"))
  }

  /** Gopher rule-based quality filter (Rae et al. 2021, table A1): the
    * published web-scale keep/drop rules, each surfaced as its own metric
    * column so pipelines can audit WHY a document dropped:
    *  - word count within [minWords, maxWords],
    *  - mean word length within [minMeanWordLen, maxMeanWordLen],
    *  - symbol-to-word ratio (`#` chars + `...` occurrences) ≤ max,
    *  - fraction of lines starting with a bullet (`- `, `* `, `•`) ≤ max,
    *  - fraction of lines ending with an ellipsis ≤ max,
    *  - fraction of words containing ≥1 alphabetic char ≥ min,
    *  - ≥ minStopwordHits distinct words from the required-stopword set.
    * `keep` = conjunction. Empty documents fail the word-count rule and
    * report zero fractions.
    *
    * Shape at scale: pure per-row column expressions over two materialized
    * arrays (tokens, lines) — map-side, zero shuffle, runs at parquet-scan
    * speed. Mean word length avoids the interpreted HOF fold: the token
    * length sum is `length(text)` minus its whitespace, a codegen'd regex. */
  def gopherQualityFlags(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lineSep: String = "\n",
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Long = 2L,
      requiredStopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with")): DataFrame =
    gopherQualityColumns(df.select(col(idCol), col(textCol)), textCol, lineSep,
      minWords, maxWords, minMeanWordLen, maxMeanWordLen, maxSymbolWordRatio,
      maxBulletLineFrac, maxEllipsisLineFrac, minAlphaWordFrac, minStopwordHits,
      requiredStopwords)
      .select(col(idCol), col("word_count"), col("mean_word_len"),
        col("symbol_word_ratio"), col("bullet_line_frac"), col("ellipsis_line_frac"),
        col("alpha_word_frac"), col("stopword_hits"), col("keep"))

  /** The same Gopher metrics APPENDED to the full frame — the zero-join
    * form a curation stage wants: every metric is a pure per-row column
    * expression, so gating a 100 TB scan must not pay a self-join back by
    * id (two scans + a shuffle) for what one projection computes in the
    * scan stage. `gopherQualityFlags` keeps its (id, metrics) report
    * shape and delegates here; existing columns named like the metrics
    * are replaced. */
  def gopherQualityColumns(
      df: DataFrame,
      textCol: String,
      lineSep: String = "\n",
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Long = 2L,
      requiredStopwords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with")): DataFrame = {
    val txt = col(textCol)
    val base = df
      .withColumn("__graft_text", txt)
      .withColumn("__graft_toks", tokens(txt))
      // lowered tokens as their OWN materialized column (referenced once
      // per required stopword below — never a computed subtree inside a
      // HOF lambda, which Catalyst re-evaluates per element)
      .withColumn("__graft_toks_lower", tokens(lower(txt)))
      .withColumn("__graft_lines",
        filter(split(txt, java.util.regex.Pattern.quote(lineSep)), l => length(l) > 0))
    val t = col("__graft_text")
    val toks = col("__graft_toks")
    val lines = col("__graft_lines")
    val wc = size(toks).cast("long")
    val nLines = size(lines).cast("long")
    // sum of token lengths == total non-whitespace chars (codegen'd)
    val sumLen = length(regexp_replace(t, "\\s+", "")).cast("long")
    val meanWordLen = when(wc === 0, 0.0).otherwise(sumLen.cast("double") / wc)
    val hashCount = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val ellipsisCount = size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0))).cast("long")
    val symbolRatio = when(wc === 0, 0.0).otherwise((hashCount + ellipsisCount).cast("double") / wc)
    val bulletFrac = when(nLines === 0, 0.0).otherwise(
      size(filter(lines, l =>
        l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))).cast("double") / nLines)
    val ellipsisFrac = when(nLines === 0, 0.0).otherwise(
      size(filter(lines, l => l.endsWith("..."))).cast("double") / nLines)
    val alphaFrac = when(wc === 0, 0.0).otherwise(
      size(filter(toks, tok => tok.rlike("[A-Za-z]"))).cast("double") / wc)
    // distinct required stopwords present: one array_contains membership
    // probe per (small, literal) stopword over the materialized lowered
    // tokens — plain codegen'd expressions, no HOF lambda at all
    val stopHits = requiredStopwords
      .map(s => array_contains(col("__graft_toks_lower"), s).cast("long"))
      .reduce(_ + _)
    base
      .withColumn("word_count", wc)
      .withColumn("mean_word_len", meanWordLen)
      .withColumn("symbol_word_ratio", symbolRatio)
      .withColumn("bullet_line_frac", bulletFrac)
      .withColumn("ellipsis_line_frac", ellipsisFrac)
      .withColumn("alpha_word_frac", alphaFrac)
      .withColumn("stopword_hits", stopHits)
      .withColumn("keep",
        (wc >= minWords && wc <= maxWords &&
          meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen &&
          symbolRatio <= maxSymbolWordRatio &&
          bulletFrac <= maxBulletLineFrac &&
          ellipsisFrac <= maxEllipsisLineFrac &&
          alphaFrac >= minAlphaWordFrac &&
          stopHits >= minStopwordHits).cast("long"))
      .drop("__graft_text", "__graft_toks", "__graft_toks_lower", "__graft_lines")
  }

  /** The Gopher metric bundle as ONE struct-valued SQL expression
    * template — the SQL surface of [[gopherQualityColumns]], registered
    * as `gopher_metrics` by [[graft.plans.GraftExtensions]] so a pure-SQL
    * user reaches the same per-row quality metrics
    * (`gopher_metrics(text).word_count`, …); raw metrics only,
    * thresholds are the SQL caller's. `argName` is the placeholder the
    * function builder substitutes with the call's argument expression
    * (a parsed template, because a function registry needs a Catalyst
    * tree — the Column API's node graph only resolves inside a Dataset).
    * Field spellings are pinned value-equal to the column form by
    * Round16OpsSpec; stopword hits fold into one array_intersect (count
    * of DISTINCT required stopwords present — same value as the column
    * form's per-stopword membership sum). */
  def gopherMetricsSql(argName: String): String = {
    val t = argName
    val toks = s"filter(split(trim($t), '\\\\s+'), tok -> length(tok) > 0)"
    val lines = s"filter(split($t, '\\n'), l -> length(l) > 0)"
    val wc = s"CAST(size($toks) AS BIGINT)"
    val nLines = s"CAST(size($lines) AS BIGINT)"
    val sumLen = s"CAST(length(regexp_replace($t, '\\\\s+', '')) AS BIGINT)"
    val hashCount = s"CAST(length($t) - length(regexp_replace($t, '#', '')) AS BIGINT)"
    val ellCount = s"CAST(size(regexp_extract_all($t, '\\\\.\\\\.\\\\.', 0)) AS BIGINT)"
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => s"'$w'").mkString(", ")
    s"""named_struct(
       'word_count', $wc,
       'mean_word_len', CASE WHEN $wc = 0 THEN 0.0D ELSE CAST($sumLen AS DOUBLE) / $wc END,
       'symbol_word_ratio', CASE WHEN $wc = 0 THEN 0.0D
          ELSE CAST($hashCount + $ellCount AS DOUBLE) / $wc END,
       'bullet_line_frac', CASE WHEN $nLines = 0 THEN 0.0D
          ELSE CAST(size(filter($lines, l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '•%')) AS DOUBLE) / $nLines END,
       'ellipsis_line_frac', CASE WHEN $nLines = 0 THEN 0.0D
          ELSE CAST(size(filter($lines, l -> l LIKE '%...')) AS DOUBLE) / $nLines END,
       'alpha_word_frac', CASE WHEN $wc = 0 THEN 0.0D
          ELSE CAST(size(filter($toks, tok -> tok RLIKE '[A-Za-z]')) AS DOUBLE) / $wc END,
       'stopword_hits', CAST(size(array_intersect(array($stopwords),
          filter(split(trim(lower($t)), '\\\\s+'), tok -> length(tok) > 0))) AS BIGINT))"""
  }

  /** Document fingerprint: 64-bit content hash of normalized text (xxhash64,
    * codegen'd) — the exact-dedup key. */
  def fingerprint(text: Column): Column = xxhash64(normalize(text))

  /** Rolling (polynomial) hash of the token sequence — order-sensitive, so
    * reordered near-identical docs fingerprint differently where
    * `fingerprint` would collide. h = sum(hash(tok_i) * 31^i) mod p with
    * p = 2^31-1: all intermediates stay < 2^62, so the arithmetic is safe
    * under ANSI overflow checking (Spark 4 default).
    *
    * This Column form is an interpreted HOF fold — convenience for tiny
    * frames and property tests only. Hot paths use `rollingHashByDoc`,
    * which computes the identical value with posexplode + codegen'd
    * aggregates (measured ~5 s → sub-second at sf0.1 for q34). */
  def rollingHash(text: Column): Column = {
    val m = lit(RollingHashP)
    aggregate(
      tokens(normalize(text)),
      struct(lit(0L).as("h"), lit(1L).as("p")),
      (acc, t) => struct(
        pmod(acc("h") + pmod(xxhash64(t), m) * acc("p"), m).as("h"),
        pmod(acc("p") * 31L, m).as("p")),
      acc => acc("h"))
  }

  private val RollingHashP = 2147483647L // 2^31 - 1
  private val PowBlock = 4096
  // Three 4096-entry power tables decompose any position as
  // pos = lo + 4096·mid + 4096²·hi: 31^pos = low[lo]·mid[mid]·high2[hi].
  // 4096³ = 2^36 exceeds the maximum representable Spark array length, so
  // the decomposition is total — no document can index out of range.
  private def powTable(step: Long): Array[Long] = {
    val a = new Array[Long](PowBlock)
    a(0) = 1L
    for (i <- 1 until PowBlock) a(i) = a(i - 1) * step % RollingHashP
    a
  }
  private lazy val pow31Low: Array[Long] = powTable(31L)
  private lazy val pow31Mid: Array[Long] =
    powTable(pow31Low(PowBlock - 1) * 31L % RollingHashP) // step = 31^4096
  private lazy val pow31High2: Array[Long] =
    powTable(pow31Mid(PowBlock - 1) * (pow31Low(PowBlock - 1) * 31L % RollingHashP) % RollingHashP) // step = 31^(4096²)

  /** Rolling hash per document, MAP-SIDE: one `rolling_hash64` codegen loop
    * over the token array (`plans.RollingHash64`) — no explode, no groupBy,
    * no shuffle; identical values (modular integer sums are order-exact).
    * Empty and null documents hash to 0, matching the aggregate form's
    * posexplode_outer behavior. One row per input row (the aggregate form
    * collapses duplicate ids — with per-document unique ids, identical). */
  def rollingHashByDoc(
      df: DataFrame,
      idColumns: Seq[String],
      textColumn: String,
      out: String): DataFrame = {
    import org.apache.spark.sql.graft.ExprColumn
    val h = ExprColumn(graft.plans.RollingHash64(
      ExprColumn.expr(tokens(normalize(col(textColumn))))))
    df.select(idColumns.map(col) :+ coalesce(h, lit(0L)).as(out): _*)
  }

  /** The aggregate spelling of `rollingHashByDoc` — posexplode the token
    * array, weight each token hash by 31^pos mod p via three
    * broadcast-literal power tables (pos = lo + 4096·mid + 4096²·hi),
    * sum per document. Kept as the equivalence oracle for the map-side
    * expression. */
  def rollingHashByDocAgg(
      df: DataFrame,
      idColumns: Seq[String],
      textColumn: String,
      out: String): DataFrame = {
    val m = lit(RollingHashP)
    val exploded = df
      .withColumn("__graft_toks", tokens(normalize(col(textColumn))))
      .select(idColumns.map(col) :+
        posexplode_outer(col("__graft_toks")).as(Seq("__graft_pos", "__graft_tok")): _*)
    val pos = col("__graft_pos")
    val powLo = element_at(typedLit(pow31Low), (pos % PowBlock).cast("int") + 1)
    val powMid = element_at(typedLit(pow31Mid), ((pos / PowBlock) % PowBlock).cast("int") + 1)
    val powHi = element_at(typedLit(pow31High2), (pos / (PowBlock.toLong * PowBlock)).cast("int") + 1)
    val term = pmod(
      pmod(pmod(pmod(xxhash64(col("__graft_tok")), m) * powLo, m) * powMid, m) * powHi, m)
    exploded
      .withColumn("__graft_term", when(col("__graft_tok").isNull, lit(0L)).otherwise(term))
      .groupBy(idColumns.map(col): _*)
      .agg(pmod(sum(col("__graft_term")), m).as(out))
  }

  /** Language ID by stopword-profile scoring: count distinct profile words
    * present per language, pick the argmax (n-gram-free heuristic — for
    * real pipelines swap in a fastText-style model via mapInPandas). */
  val languageProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "was", "with", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "est", "dans", "que"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "por", "con", "una"),
    "it" -> Seq("il", "di", "che", "la", "e", "per", "un", "non", "sono", "con"))

  /** From a materialized distinct lowercase token array (hot-path form: the
    * text variant inlines tokenization into every profile's intersect).
    *
    * Argmax with strictly-greater replacement, earliest language (sorted
    * order) winning ties, "und" when no profile word matches — expressed as
    * one `greatest` over (score, -index) structs so each profile's
    * `array_intersect` appears EXACTLY ONCE in the plan. (The obvious
    * when-fold nests each partial best inside the next comparison, doubling
    * the expression tree per language — 2^|langs| copies of the intersect
    * subtrees, which explodes codegen size and Janino compile time.) */
  def languageIdFromTokens(toks: Column, profiles: Map[String, Seq[String]] = languageProfiles): Column = {
    val ordered = profiles.toSeq.sortBy(_._1)
    if (ordered.isEmpty) return lit("und") // the fold's seed, pre-rewrite
    val entries = ordered.zipWithIndex.map { case ((_, words), i) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(-i).as("neg_idx"))
    }
    // struct ordering is lexicographic: max score first, then max neg_idx
    // (= smallest index = earliest language) on ties
    val best = if (entries.size == 1) entries.head else greatest(entries: _*)
    val langByIdx = array(ordered.map { case (lang, _) => lit(lang) }: _*)
    when(best.getField("score") > 0,
      element_at(langByIdx, -best.getField("neg_idx") + 1)).otherwise(lit("und"))
  }

  def languageId(text: Column, profiles: Map[String, Seq[String]] = languageProfiles): Column =
    languageIdFromTokens(array_distinct(tokens(lower(text))), profiles)

  /** Segment-level language ID + per-document code-switching detection:
    * split each document into fixed `segTokens`-token windows, identify
    * each window's language, and report per document how many distinct
    * languages appear (ignoring "und") — the filter that catches
    * mixed-language documents a DOCUMENT-level language ID (q30) calls
    * monolingual because one language dominates the global stopword
    * argmax. Returns (idCol, n_segments, n_langs, is_code_switched).
    *
    * Shape: token array materialized once; windows materialized as an
    * array-of-arrays column and exploded through `array_compact` (whose
    * non-attribute child suppresses InferFiltersFromGenerate's
    * double-eval, SPARK-36715), so the per-segment argmax runs codegen'd
    * on exploded rows — not interpreted inside a HOF lambda, which
    * Catalyst cannot compile; one groupBy per document closes it. */
  def codeSwitchStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      segTokens: Int,
      profiles: Map[String, Seq[String]] = languageProfiles): DataFrame = {
    require(segTokens >= 1, s"codeSwitchStats: segTokens must be >= 1, got $segTokens")
    val base = df.select(col(idCol), tokens(lower(col(textCol))).as("__graft_toks"))
    val n = size(col("__graft_toks"))
    val nseg = expr(s"cast((size(__graft_toks) + ${segTokens - 1}) div $segTokens as int)")
    // guard the empty doc: sequence(0, -1) would generate a DESCENDING run
    val segs = when(n === 0, array().cast("array<array<string>>"))
      .otherwise(transform(sequence(lit(0), nseg - 1),
        i => slice(col("__graft_toks"), i * segTokens + 1, lit(segTokens))))
    base
      .select(col(idCol), segs.as("__graft_segs"))
      .select(col(idCol), explode(array_compact(col("__graft_segs"))).as("__graft_seg"))
      .withColumn("__graft_lang",
        languageIdFromTokens(array_distinct(col("__graft_seg")), profiles))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_segments"),
        count_distinct(when(col("__graft_lang") =!= "und", col("__graft_lang")))
          .cast("long").as("n_langs"))
      .withColumn("is_code_switched", col("n_langs") >= 2)
  }

  // ------------------------------------------------- corpus vocabulary

  /** Corpus term statistics: one row per lowercase whitespace token with its
    * total frequency and document frequency — the vocabulary-building pass
    * of a tokenizer/data pipeline.
    *
    * Scale design: explode → one hash-groupBy keyed by token with map-side
    * partial aggregation; hot stopwords are absorbed by the partials, so
    * skew never concentrates raw rows. The distinct-document count is the
    * standard two-phase count-distinct — no per-group set materialization. */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("doc_freq"))

  /** Inverted index with capped posting lists: token → (doc_freq, first
    * `maxPostings` doc ids in id order, comma-joined) — the searchable-
    * corpus artifact behind retrieval and contamination attribution.
    *
    * Scale shape: the cap is enforced BEFORE any list materializes — a
    * row_number window ranks postings per token and `doc_freq` comes from a
    * count over the same window partition, so a stopword with 10^9 postings
    * never builds a 10^9-element array anywhere. Two exchanges total: the
    * per-doc distinct, then the token window; the groupBy reuses the
    * window's hash(token) partitioning. */
  def invertedIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxPostings: Int): DataFrame = {
    require(maxPostings > 0, "maxPostings must be positive")
    import org.apache.spark.sql.expressions.Window
    val perToken = Window.partitionBy(col("token"))
    val ranked = df
      .select(col(idCol).as("__graft_doc"), explode(tokens(lower(col(textCol)))).as("token"))
      .distinct()
      .withColumn("doc_freq", count(lit(1)).over(perToken))
      .withColumn("rn", row_number().over(perToken.orderBy(col("__graft_doc"))))
      .filter(col("rn") <= maxPostings)
    ranked
      .groupBy(col("token"))
      .agg(
        max(col("doc_freq")).as("doc_freq"),
        array_join(
          transform(array_sort(collect_list(col("__graft_doc"))), d => d.cast("string")),
          ",").as("postings"))
  }

  /** BM25 relevance scores of every document against a fixed query-term
    * set (Robertson/Spärck Jones; the Lucene `ln(1 + (N-df+0.5)/(df+0.5))`
    * idf form, always positive) — the ranked-retrieval primitive for
    * corpus search, decontamination attribution, and relevance-weighted
    * sampling.
    *
    * Determinism contract (oracle-friendly): term frequencies and document
    * lengths are exact integers; `avgdl` is an exact long sum divided once
    * in double; the score is a FIXED-ORDER expression sum over the query
    * terms (never a row-order-dependent aggregate of doubles), so both
    * engines evaluate the identical floating-point expression tree.
    *
    * Shape at scale: one pass computes per-doc (length, tf…) map-side; a
    * single 1-row corpus-stats aggregate (N, Σlen, df per term) broadcasts
    * back via cross join; the score is then a pure projection. Two scans
    * total, no wide shuffle. */
  def bm25Scores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Scores: empty query-term set")
    val tfCols = terms.indices.map(i => s"tf${i + 1}")
    val perDoc = df
      .select(col(idCol), tokens(lower(col(textCol))).as("__graft_toks"))
      .select(
        col(idCol) +:
          size(col("__graft_toks")).cast("long").as("__graft_dl") +:
          terms.zipWithIndex.map { case (term, i) =>
            size(filter(col("__graft_toks"), t => t === lit(term))).cast("long").as(tfCols(i))
          }: _*)
    val statCols =
      count(lit(1)).as("__graft_n") +:
        sum(col("__graft_dl")).as("__graft_suml") +:
        terms.indices.map(i =>
          sum((col(tfCols(i)) > 0).cast("long")).as(s"__graft_df${i + 1}"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("__graft_suml").cast("double") / col("__graft_n")
    val score = terms.indices.map { i =>
      val tf = col(tfCols(i)).cast("double")
      val dfT = col(s"__graft_df${i + 1}").cast("double")
      val idf = log(lit(1.0) + (col("__graft_n").cast("double") - dfT + 0.5) / (dfT + 0.5))
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__graft_dl").cast("double") / avgdl))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col(idCol) +: tfCols.map(col) :+ score.as("bm25"): _*)
  }

  // ----------------------------------------------------- PII redaction

  /** Default redaction patterns: emails and 555-prefixed phone-style
    * numbers. Pattern syntax is the RE2-compatible common subset (no
    * backtracking constructs), so the same strings run on Spark (Java
    * regex) and external engines. */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("555-[0-9]{4}", "<PHONE>"))

  /** Apply redaction patterns in order (each a full-text regexp_replace —
    * codegen'd, map-side, no shuffle). */
  def redact(text: Column, patterns: Seq[(String, String)] = piiPatterns): Column =
    patterns.foldLeft(text) { case (t, (p, r)) => regexp_replace(t, p, r) }

  /** Number of matches of `pattern` in `text` (regexp_extract_all length —
    * the redaction-audit counter). */
  def patternHits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  // ------------------------------------- character n-gram language model

  /** Strict character n-gram windows of an ALREADY-MATERIALIZED normalized
    * text attribute: len−n+1 windows, EMPTY array (not a short gram) when
    * the text is shorter than n — a language model must not learn
    * truncated grams. Same lambda-CSE caveat as the other *FromNormalized
    * helpers: `norm` must be a projected attribute, or the whole normalize
    * pipeline re-runs per window position. */
  def charNgramsStrict(norm: Column, n: Int): Column =
    when(length(norm) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), length(norm) - lit(n)),
        i => norm.substr(i + lit(1), lit(n))))

  /** A trained character n-gram model: add-one-smoothed window counts
    * keyed by `plans.LmKernel` window hashes (sorted ascending, aligned
    * with `counts` — the binary-search layout `plans.LmSurprisal` scores
    * against; for n ≤ 3 the hash is injective, so hash keys ARE window
    * identities). The table is BOUNDED by construction — normalized text
    * draws from [a-z0-9 ], so n=3 has at most 37³ ≈ 50k entries whatever
    * the corpus size — which is what makes collecting it to the driver
    * (and shipping it back as a codegen reference object) a fixed cost at
    * 100 TB, like an IVF centroid table. */
  case class CharLm(hashes: Array[Long], counts: Array[Long], total: Long, vocab: Long) {
    require(hashes.length == counts.length, "CharLm: hashes/counts misaligned")
    /** Numerator of every smoothed probability: total + |V|. */
    def numer: Long = total + vocab
  }

  /** Train a character n-gram LM on a reference corpus (the CCNet recipe:
    * train on a trusted slice, score everything). One explode → hash-
    * groupBy with map-side partials over codegen'd window hashes
    * (`plans.CharWindowHashes` — the interpreted transform+substr spelling
    * this replaces was the q90 profile's dominant cost); the result is
    * collected because it is vocabulary-bounded (see [[CharLm]]), not
    * corpus-sized. */
  def trainCharLm(df: DataFrame, textCol: String, n: Int = 3): CharLm = {
    import org.apache.spark.sql.graft.ExprColumn
    val wins = ExprColumn(graft.plans.CharWindowHashes(
      ExprColumn.expr(col("__graft_norm")), n))
    val collected = df
      .select(normalize(col(textCol)).as("__graft_norm"))
      .select(explode(wins).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    CharLm(
      collected.map(_._1),
      collected.map(_._2),
      collected.map(_._2).sum,
      collected.length.toLong)
  }

  /** Per-document LM surprisal under a trained [[CharLm]] — the quality /
    * perplexity-filter primitive (CCNet-style: low average surprisal ≈
    * in-domain text).
    *
    * Determinism contract (oracle-friendly): per-gram surprisal is the
    * INTEGER `floor(log₂((total+|V|) div (cnt+1)))` — pure 64-bit integer
    * arithmetic that any engine reproduces bit-exactly (DuckDB spells it
    * `length(bin(q)) − 1`), unlike a float `ln(p)` whose libm rounding
    * differs across engines. The integer quotient is ≥ 1 by construction
    * (cnt ≤ total < total+|V|). The double `avg_surprisal` is one
    * exact-int ÷ exact-int division — IEEE-exact rounding, deterministic.
    *
    * Shape at scale: the ENTIRE score is one map-side expression
    * (`plans.LmSurprisal`) with the model as a codegen reference object —
    * no explode (L rows per document), no model join, no doc-id groupBy;
    * the plan is scan → project, zero shuffles (spec-enforced). Documents
    * shorter than n score n_grams = 0 / surprisal = 0 / NULL average. */
  def lmSurprisalScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lm: CharLm,
      n: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.ExprColumn
    val scored = ExprColumn(graft.plans.LmSurprisal(
      ExprColumn.expr(col("__graft_norm")), lm.hashes, lm.counts, lm.numer, n))
    df.select(col(idCol), normalize(col(textCol)).as("__graft_norm"))
      .select(col(idCol), scored.as("__graft_sc"))
      .select(
        col(idCol),
        element_at(col("__graft_sc"), 1).as("n_grams"),
        element_at(col("__graft_sc"), 2).as("surprisal"))
      .withColumn("avg_surprisal",
        when(col("n_grams") > 0,
          col("surprisal").cast("double") / col("n_grams").cast("double")))
  }

  /** Vocabulary coverage / OOV audit: the corpus's own top-`vocabSize`
    * tokens (by frequency, ties to the lexicographically smaller token —
    * a total order, so the vocabulary is deterministic) become the
    * vocabulary, and every document is scored for out-of-vocabulary token
    * count — the tokenizer-coverage report run before committing to a
    * vocab size. Returns one row per doc: `total_tokens`, `oov_tokens`,
    * `oov_ppm` (floor ppm; docs with zero tokens are excluded — nothing
    * to cover).
    *
    * Scale shape: the vocabulary is an aggregate top-k (tiny by
    * construction) broadcast into a left join against the exploded
    * tokens; the corpus shuffles once on the token for the frequency
    * count and once on the doc id for the rollup — no global sort ever
    * touches corpus-sized data (the top-k sorts only the aggregated
    * vocabulary). */
  def oovStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"oovStats: vocabSize must be >= 1, got $vocabSize")
    val toks = df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("token"))
    val vocab = toks
      .groupBy(col("token")).agg(count(lit(1)).as("__graft_tf"))
      .orderBy(col("__graft_tf").desc, col("token"))
      .limit(vocabSize)
      .select(col("token"), lit(1).as("__graft_in"))
    toks
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("total_tokens"),
        sum(when(col("__graft_in").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_ppm", expr("(1000000 * oov_tokens) div total_tokens"))
  }

  /** Integer character-entropy quality feature: over the 36 chars
    * [a-z0-9] of the lowercased text,
    *
    *   entropy_bits = Σ_c cnt_c · ⌊log2(total / cnt_c)⌋
    *
    * — a floor-log2 (hence integer-exact, engine-portable) lower bound on
    * total·H(char distribution): near 0 for single-char runs ("aaaa…" —
    * the degenerate filler a length filter can't see), large for diverse
    * text. Adds `char_total` and `entropy_bits`.
    *
    * Scale shape: NO explode — per-char counts come from 36 unrolled
    * `length − length(replace(…))` terms materialized once into an array
    * column, then codegen'd element_at sums; the whole feature is
    * map-side at scan speed, where the char-explode spelling would
    * shuffle ~|text| rows per document. */
  def charEntropyBits(df: DataFrame, textCol: String): DataFrame = {
    val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val n = chars.size
    val cntExprs = chars.map(c =>
      s"CAST(length(__graft_norm) - length(replace(__graft_norm, '$c')) AS BIGINT)")
    def cnt(i: Int) = s"element_at(__graft_cnts, ${i + 1})"
    val entTerms = (0 until n).map { i =>
      s"(CASE WHEN ${cnt(i)} > 0 THEN ${cnt(i)} * (length(bin(char_total div ${cnt(i)})) - 1) ELSE 0 END)"
    }
    df.withColumn("__graft_norm", lower(col(textCol)))
      .withColumn("__graft_cnts", expr(s"array(${cntExprs.mkString(", ")})"))
      .withColumn("char_total", expr((1 to n).map(i => s"element_at(__graft_cnts, $i)").mkString(" + ")))
      .withColumn("entropy_bits",
        expr(s"CAST(CASE WHEN char_total > 0 THEN ${entTerms.mkString(" + ")} ELSE 0 END AS BIGINT)"))
      .drop("__graft_norm", "__graft_cnts")
  }

  /** Tokenizer fertility: BPE-ish pieces per whitespace word, the
    * cross-language cost report (a language at fertility 3× pays 3× the
    * sequence length for the same text). Pure map-side counting — both
    * counts are per-row column expressions. Returns the input plus
    * `n_words` / `n_pieces`. */
  def fertilityCounts(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_words", tokenCount(col(textCol)).cast("long"))
    .withColumn("n_pieces", bpeishTokenCount(col(textCol)).cast("long"))

  /** TextTiling-style topic segmentation (Hearst CL'97, the block-
    * comparison form, integerized): per document, tokens partition into
    * full w-token blocks (the ragged tail drops — only full blocks are
    * comparable units); each internal gap g scores the MULTISET overlap of
    * its two flanking blocks, `sim_g = Σ_tok min(count_left, count_right)`
    * — the integer stand-in for Hearst's cosine, exact BIGINT where the
    * cosine is libm territory. A gap is a topic boundary when it is a
    * STRICT local minimum of the sim series and lies below the per-doc
    * median (the med2 = doubled-median trick of q174, so interpolated
    * medians stay integer: boundary ⇔ 2·sim < med2).
    *
    * Scale shape: one posexplode + one (id, blk, tok) count aggregate;
    * gap similarity is an equi-join of adjacent block rows on (id, tok) —
    * never a text re-scan; the windows run per-document. Documents with
    * fewer than 2 full blocks have no gaps and drop.
    *
    * Returns (idCol, n_gaps, n_boundaries, deepest_gap, min_sim) —
    * deepest_gap = the argmin gap index (1-based; smallest index on ties). */
  def topicBoundaries(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 10): DataFrame = {
    require(w >= 2, s"topicBoundaries: block size $w must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val toked = df.select(col(idCol), tokens(normalize(col(textCol))).as("__graft_toks"))
    val pos = toked
      .select(col(idCol), posexplode(array_compact(col("__graft_toks"))).as(Seq("__graft_p", "__graft_tok")))
      .withColumn("__graft_L", count(lit(1)).over(Window.partitionBy(col(idCol))))
      .filter(col("__graft_p") < (col("__graft_L").cast("long") / w).cast("long") * w)
      .select(col(idCol), (col("__graft_p") / w).cast("long").as("__graft_blk"),
        col("__graft_tok"),
        (col("__graft_L").cast("long") / w).cast("long").as("__graft_nblk"))
    val blkCounts = pos
      .groupBy(col(idCol), col("__graft_blk"), col("__graft_tok"))
      .agg(count(lit(1)).as("__graft_c"), max(col("__graft_nblk")).as("__graft_nblk"))
    val sims = blkCounts.as("l")
      .join(blkCounts.as("r"),
        col("l." + idCol) === col("r." + idCol) &&
          col("l.__graft_tok") === col("r.__graft_tok") &&
          col("r.__graft_blk") === col("l.__graft_blk") + 1)
      .groupBy(col("l." + idCol).as(idCol), col("r.__graft_blk").as("__graft_g"))
      .agg(sum(least(col("l.__graft_c"), col("r.__graft_c"))).as("__graft_sim"))
    // gap spine: zero-overlap gaps must exist with sim 0
    val spine = blkCounts
      .groupBy(col(idCol))
      .agg(max(col("__graft_nblk")).as("__graft_nblk"))
      .filter(col("__graft_nblk") >= 2)
      .select(col(idCol), explode(sequence(lit(1L), col("__graft_nblk") - 1)).as("__graft_g"))
    val dense = spine.join(sims, Seq(idCol, "__graft_g"), "left")
      .withColumn("__graft_sim", coalesce(col("__graft_sim"), lit(0L)))
    val byG = Window.partitionBy(col(idCol)).orderBy(col("__graft_g"))
    val byId = Window.partitionBy(col(idCol))
    val bySim = Window.partitionBy(col(idCol)).orderBy(col("__graft_sim"), col("__graft_g"))
    val MaxL = Long.MaxValue
    val scored = dense
      .withColumn("__graft_m", count(lit(1)).over(byId))
      .withColumn("__graft_rk", row_number().over(bySim))
      .withColumn("__graft_med2",
        max(when(col("__graft_rk") === expr("(__graft_m + 1) div 2"), col("__graft_sim"))).over(byId) +
          max(when(col("__graft_rk") === expr("(__graft_m + 2) div 2"), col("__graft_sim"))).over(byId))
      .withColumn("__graft_isb",
        col("__graft_sim") < coalesce(lag(col("__graft_sim"), 1).over(byG), lit(MaxL)) &&
          col("__graft_sim") < coalesce(lead(col("__graft_sim"), 1).over(byG), lit(MaxL)) &&
          col("__graft_sim") * 2 < col("__graft_med2"))
    scored
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(when(col("__graft_isb"), 1L).otherwise(0L)).as("n_boundaries"),
        min(struct(col("__graft_sim"), col("__graft_g"))).getField("__graft_g").as("deepest_gap"),
        min(col("__graft_sim")).as("min_sim"))
  }

  /** Vocabulary-richness report per group — how much of the vocabulary has
    * the corpus NOT seen yet, the coverage question a corpus-collection
    * loop asks before paying for more crawl:
    *   - Chao1 richness estimate (Chao 1984, bias-corrected form):
    *     vocab + f1(f1−1)/(2(f2+1)) — a LOWER bound on the true distinct
    *     token count, defined even when no token occurs exactly twice;
    *   - Good–Turing unseen mass (Good 1953): P0 = f1/N, the probability
    *     the NEXT token is novel.
    * Both are exact rationals of the frequency-of-frequencies census
    * (f1 = hapax count, f2 = dis legomena), emitted as truncating ppm.
    * Tokens = lowered whitespace tokens (the q77 convention). Scale: one
    * explode → token census groupBy (map-side partial agg) → one
    * census-sized fold; no windows, no joins.
    * Returns (groupCols*, n_tokens, vocab, f1, f2, chao1_ppm,
    * unseen_mass_ppm); a group with no tokens at all has no census rows
    * and therefore no output row (there is no vocabulary to report on). */
  def vocabularyRichness(
      df: DataFrame, textCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "vocabularyRichness: empty groupCols — inject a literal constant group column")
    import org.apache.spark.sql.graft.Idiv
    val gs = groupCols.map(col)
    val census = df
      .withColumn("__graft_toks", tokens(lower(col(textCol))))
      .select((gs :+ explode(array_compact(col("__graft_toks"))).as("__graft_tok")): _*)
      .groupBy((gs :+ col("__graft_tok")): _*)
      .agg(count(lit(1)).as("__graft_c"))
    census
      .groupBy(gs: _*)
      .agg(
        sum(col("__graft_c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("__graft_c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__graft_c") === 2L, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1_ppm",
        col("vocab") * 1000000L +
          Idiv(col("f1").cast("decimal(38,0)") * (col("f1") - 1L) * 1000000L,
            lit(2L) * (col("f2") + 1L)).cast("long"))
      .withColumn("unseen_mass_ppm",
        when(col("n_tokens") === 0L, lit(null).cast("long"))
          .otherwise(Idiv(col("f1") * 1000000L, col("n_tokens")).cast("long")))
  }
}
