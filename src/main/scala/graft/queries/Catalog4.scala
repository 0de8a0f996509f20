package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Constants._
import graft.operators.{Aggregation, DatasetExpr, DimensionFilter, MappingKernel, Reshape, SetOps}
import graft.functions.{Growth, Units}
import graft.time.{AnnualTime, TimeAdjustments}
import graft.text.{Dedup, TextFunctions}
import graft.ml.Similarity
import graft.multimodal.Multimodal

import graft.QueryDsl._

/** Catalog chunk q88-q116 (registration + docs in [[graft.Queries]]). */
private[graft] object Catalog4 {

  /** Incremental ingest dedup: a batch of last-word-clipped copies of every
    * fifth document (jaccard ≈ (m−1)/m ≥ 0.8) screened against the full
    * corpus. The oracle is the complete CROSS-SIDE pair ground truth —
    * new×new and existing×existing pairs must not appear, which is exactly
    * the operator's contract — spelled as an inverted-index join (shared
    * shingle → COUNT = intersection) rather than a CROSS JOIN of
    * list_intersects: identical output, near-linear instead of the
    * 425 s-at-sf0.1 quadratic form (the q29/q69 rewrite, r8). */
  val q88_dedup_incremental = Q(
    "q88_dedup_incremental",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val incoming = d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        array_join(
          slice(split(trim(col("text")), "\\s+"), lit(1),
            size(split(trim(col("text")), "\\s+")) - 1), " ").as("text"))
      Dedup.minhashNearDuplicatesAgainst(
        incoming, d, "doc_id", "text",
        bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
        .select(
          col("new_id").cast("long").as("new_id"),
          col("existing_id").cast("long").as("existing_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("new_id", "existing_id")
    },
    Some("""WITH newdocs AS (
              SELECT doc_id + 2000000 AS doc_id,
                array_to_string(toks[1:len(toks)-1], ' ') AS text
              FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)
              WHERE doc_id % 5 = 0),
            sh_of AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM newdocs)),
            sh_ex AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM documents)),
            nsz AS (SELECT doc_id, len(shingles) AS sz FROM sh_of),
            esz AS (SELECT doc_id, len(shingles) AS sz FROM sh_ex),
            nex AS (SELECT doc_id, unnest(shingles) AS s FROM sh_of),
            eex AS (SELECT doc_id, unnest(shingles) AS s FROM sh_ex),
            inter AS (
              SELECT n.doc_id AS new_id, e.doc_id AS existing_id, COUNT(*) AS ic
              FROM nex n JOIN eex e ON n.s = e.s
              GROUP BY 1, 2),
            pairs AS (
              SELECT new_id, existing_id,
                CAST(ic AS DOUBLE) / (ns.sz + es.sz - ic) AS jaccard
              FROM inter
              JOIN nsz ns ON ns.doc_id = new_id
              JOIN esz es ON es.doc_id = existing_id)
            SELECT CAST(new_id AS BIGINT) AS new_id,
              CAST(existing_id AS BIGINT) AS existing_id,
              ROUND(jaccard, 4) AS jaccard
            FROM pairs WHERE jaccard >= 0.8 ORDER BY new_id, existing_id"""))

  /** Bloom-filter ingest screen (training-data pipeline op): the existing
    * corpus is summarized once into a fixed-size bit array (zero-shuffle
    * typed-imperative aggregate), the batch is filtered map-side by the
    * codegen probe, and only the surviving candidates drive the exact
    * verification joins (both broadcast). Output semantics are EXACT — the
    * Bloom filter is a prefilter, never the answer — so the oracle is a
    * plain normalized-text anti-membership replay. */
  val q89_bloom_screen = Q(
    "q89_bloom_screen",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("text"),
        col("n_chars").cast("long").as("n_chars"))
      // batch: %3==0 rows re-ingest the EXACT text (duplicates — must drop);
      // %3==1 rows carry a unique suffix (novel — must survive)
      val batch = d.filter(col("doc_id") % 3 <= 1).select(
        (col("doc_id") + 3000000L).as("doc_id"),
        when(col("doc_id") % 3 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" novel "), col("doc_id").cast("string"))).as("text"),
        col("n_chars"))
      Dedup.bloomScreen(batch, d, "doc_id", "text")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    },
    Some("""WITH batch AS (
              SELECT doc_id + 3000000 AS doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN text
                          ELSE text || ' novel ' || CAST(doc_id AS VARCHAR) END AS text,
                     n_chars
              FROM documents WHERE doc_id % 3 <= 1),
            ex AS (
              SELECT DISTINCT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
              FROM documents)
            SELECT CAST(b.doc_id AS BIGINT) AS doc_id, CAST(b.n_chars AS BIGINT) AS n_chars
            FROM batch b
            WHERE trim(regexp_replace(regexp_replace(lower(b.text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))
                  NOT IN (SELECT nt FROM ex)
            ORDER BY doc_id"""))

  /** Character-trigram LM surprisal scoring (training-data pipeline op,
    * CCNet-style): train add-one-smoothed trigram counts on a trusted
    * slice (even doc_ids), score every document by integer
    * floor-log₂ surprisal. The per-gram surprisal is pure 64-bit integer
    * arithmetic (`length(bin(q)) − 1`) — bit-exact across engines, unlike
    * a float ln(p) — so the oracle replays it hash-exactly. */
  val q90_lm_score = Q(
    "q90_lm_score",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val lm = TextFunctions.trainCharLm(d.filter(col("doc_id") % 2 === 0), "text")
      TextFunctions.lmSurprisalScores(d, "doc_id", "text", lm)
        .orderBy("doc_id")
    },
    Some("""WITH norm AS (
              SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
              FROM documents),
            doc_grams AS (
              SELECT n.doc_id, substr(n.nt, CAST(u.i AS INTEGER), 3) AS gram
              FROM norm n, UNNEST(range(1, len(n.nt) - 1)) AS u(i)),
            model AS (
              SELECT gram, COUNT(*) AS cnt FROM doc_grams WHERE doc_id % 2 = 0 GROUP BY 1),
            stats AS (
              SELECT CAST(COALESCE(SUM(cnt), 0) + COUNT(*) AS BIGINT) AS numer FROM model),
            scored AS (
              SELECT dg.doc_id,
                     COUNT(*) AS n_grams,
                     SUM(length(bin((SELECT numer FROM stats) // (COALESCE(m.cnt, 0) + 1))) - 1) AS surprisal
              FROM doc_grams dg LEFT JOIN model m USING (gram)
              GROUP BY 1)
            SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
                   CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(COALESCE(s.surprisal, 0) AS BIGINT) AS surprisal,
                   CASE WHEN COALESCE(s.n_grams, 0) > 0
                        THEN CAST(s.surprisal AS DOUBLE) / s.n_grams END AS avg_surprisal
            FROM norm n LEFT JOIN scored s USING (doc_id)
            ORDER BY doc_id"""))

  /** Deterministic train/val/test split (training-data pipeline op): the
    * content-keyed split column with cumulative thresholds 0.7/0.1/0.1 —
    * the remaining 10% stays NULL ("held out entirely"), exercising the
    * under-allocated path. Weights-by-id means assignments survive corpus
    * refreshes with no train/test migration; zero shuffle. */
  val q91_split = Q(
    "q91_split",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling
        .splitByHash(d, "doc_id", Seq("train" -> 0.7, "val" -> 0.1, "test" -> 0.1),
          seed = "r6", uniform = knuthUniform)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("split", "lang")
    },
    Some(s"""WITH u AS (SELECT *, ${knuthUniformSql("doc_id", "r6")} AS uu FROM documents)
             SELECT CASE WHEN uu < 0.7 THEN 'train' WHEN uu < 0.8 THEN 'val'
                         WHEN uu < 0.9 THEN 'test' END AS split,
                    lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM u GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** GPT-style sequence packing (training-data pipeline op): per-source
    * document streams cut into fixed 256-token training sequences, documents
    * spanning boundaries — the pretraining data layout. Output is the
    * per-sequence manifest (docs contributing, slots filled); all integer
    * arithmetic, hash-exact. */
  val q92_seq_pack = Q(
    "q92_seq_pack",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("n_tok", TextFunctions.tokenCount(col("text")).cast("long"))
      val packed = graft.text.Sharding
        .packTrainingSequences(d, "doc_id", "n_tok", seqLen = 256L, partitionCols = Seq("source"))
      graft.text.Sharding.sequenceManifest(packed, "n_tok", 256L, Seq("source"))
        .select(
          col("source"), col("seq").cast("long").as("seq"),
          col("n_docs").cast("long").as("n_docs"), col("n_tokens").cast("long").as("n_tokens"))
        .orderBy("source", "seq")
    },
    Some("""WITH toks AS (
              SELECT source, doc_id,
                     len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS tok
              FROM documents),
            cum AS (
              SELECT source, tok,
                     SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS c
              FROM toks),
            spans AS (
              SELECT source, tok, c - tok AS s,
                     CAST((c - tok) // 256 AS BIGINT) AS first_seq,
                     CAST(CASE WHEN tok > 0 THEN (c - 1) // 256 ELSE (c - tok) // 256 END AS BIGINT) AS last_seq
              FROM cum),
            fanout AS (
              SELECT source, tok, s, u.seq AS seq
              FROM spans, UNNEST(range(first_seq, last_seq + 1)) AS u(seq))
            SELECT source, CAST(seq AS BIGINT) AS seq,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(LEAST(s + tok, (seq + 1) * 256) - GREATEST(s, seq * 256)) AS BIGINT) AS n_tokens
            FROM fanout GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Unicode NFC normalization (training-data pipeline op): the corpus is
    * ASCII, so decomposed accents (e + U+0301) are injected deterministically
    * into every 5th document by BOTH engines, then each normalizes its own
    * injection — Spark via the native codegen expression, DuckDB via
    * `nfc_normalize` — and reports codepoint counts. Composition shrinks
    * exactly one codepoint per injected mark, so `len_raw − len_nfc =
    * n_comp` row-by-row; any normalizer divergence breaks the hash. */
  val q93_unicode_norm = Q(
    "q93_unicode_norm",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val raw = when(col("doc_id") % 5 === 0, regexp_replace(col("text"), "e", "é"))
        .otherwise(col("text"))
      val norm = TextFunctions.unicodeNormalize(col("raw"))
      d.select(col("doc_id").cast("long").as("doc_id"), raw.as("raw"))
        .withColumn("norm", norm)
        .select(
          col("doc_id"),
          length(col("raw")).cast("long").as("len_raw"),
          length(col("norm")).cast("long").as("len_nfc"),
          (length(col("norm")) - length(regexp_replace(col("norm"), "\u00e9", "")))
            .cast("long").as("n_comp"))
        .orderBy("doc_id")
    },
    Some("""WITH raw AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN replace(text, 'e', 'e' || chr(769))
                          ELSE text END AS r
              FROM documents),
            norm AS (SELECT doc_id, r, nfc_normalize(r) AS n FROM raw)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(length(r) AS BIGINT) AS len_raw,
                   CAST(length(n) AS BIGINT) AS len_nfc,
                   CAST(length(n) - length(replace(n, chr(233), '')) AS BIGINT) AS n_comp
            FROM norm ORDER BY doc_id"""))

  /** Distributed BPE tokenizer training (training-data pipeline op): 8 merge
    * rules learned from the corpus via the vocabulary-table formulation —
    * one corpus shuffle, then cheap per-round aggregations with the merge
    * rule applied map-side as a codegen reference object. */
  val q94_bpe_train = Q(
    "q94_bpe_train",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Bpe.trainMerges(d, "text", numMerges = 8)
        .select(
          col("rank").cast("long").as("rank"), col("l"), col("r"),
          col("cnt").cast("long").as("cnt"))
        .orderBy("rank")
    },
    Some(bpeOracleSql(8)))

  /** Real video demux (multimodal pipeline op): the pure-JVM AVI/RIFF
    * demuxer over synthetic uncompressed-DIB payloads — stream metadata +
    * every-2nd-frame sampling with mean luminance. Pseudo-mp4 payloads
    * (no JDK codec) decode as zero frames — data, not errors. All frame
    * means are dyadic (k/256), so the double sums are exact and
    * order-independent: no rounding needed on either side. */
  val q95_video = Q(
    "q95_video",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(s, 300).filter(col("media_type") === "video")
      val info = Multimodal.decodeVideoInfo(media)
      val frames = Multimodal.sampleVideoFrames(media, 2)
      val infoAgg = info.groupBy(col("format")).agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("video_frames")).cast("long").as("total_frames"),
        sum(col("video_width")).cast("long").as("sum_width"))
      val frameAgg = frames.groupBy(col("format")).agg(
        count(lit(1)).cast("long").as("n_sampled"),
        sum(col("frame_mean")).as("mean_sum"))
      infoAgg.join(frameAgg, Seq("format"), "left")
        .select(
          col("format"), col("n"), col("total_frames"), col("sum_width"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("mean_sum"), lit(0.0)).as("mean_sum"))
        .orderBy("format")
    },
    Some("""WITH vid AS (
              SELECT range AS i, (range // 3) AS sub FROM range(300) WHERE range % 3 = 2),
            info AS (
              SELECT i, sub,
                     CASE WHEN i % 6 = 2 THEN 'avi' ELSE 'mp4' END AS format,
                     CASE WHEN i % 6 = 2 THEN 16 + (sub % 3) * 8 ELSE 0 END AS w,
                     CASE WHEN i % 6 = 2 THEN 2 + (sub % 4) ELSE 0 END AS nf
              FROM vid),
            frames AS (
              SELECT 'avi' AS format, ((i * 11 + u.j * 31) % 256) / 256.0 AS fm
              FROM info, UNNEST(range(0, CAST(nf AS BIGINT), 2)) AS u(j)
              WHERE i % 6 = 2),
            ia AS (
              SELECT format, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(nf) AS BIGINT) AS total_frames,
                     CAST(SUM(w) AS BIGINT) AS sum_width
              FROM info GROUP BY 1),
            fa AS (
              SELECT format, CAST(COUNT(*) AS BIGINT) AS n_sampled, SUM(fm) AS mean_sum
              FROM frames GROUP BY 1)
            SELECT i.format, i.n, i.total_frames, i.sum_width,
                   COALESCE(f.n_sampled, 0) AS n_sampled,
                   COALESCE(f.mean_sum, 0.0) AS mean_sum
            FROM ia i LEFT JOIN fa f USING (format) ORDER BY format"""))

  /** Structured Streaming end-to-end with a BATCH ORACLE (SURVEY §2.12
    * extension, first oracle-green streaming row): the events table is
    * re-read as a file STREAM, runs through the watermarked 6-hour tumbling
    * window aggregation, drains under `Trigger.AvailableNow` into a memory
    * sink, and the final table must equal DuckDB's batch group-by of the
    * same bucketing — streaming and batch semantics coincide on bounded
    * input, and any watermark/window bug diverges the hash. Complete output
    * mode deliberately: append would withhold every window not yet past the
    * watermark at end-of-stream (the classic silent-empty-tail trap); at
    * production scale the same pipeline runs append + RocksDB state. */
  val q96_stream_agg = Q(
    "q96_stream_agg",
    (s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // the file stream source monitors a DIRECTORY; expose the single
      // events file through a temp dir via symlink (no copy)
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q96")
      // absolute target: a relative symlink would resolve against the temp
      // dir, not the JVM cwd, and dangle for relative data dirs
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
      val agg = graft.streaming.StreamOps.windowedAggregate(
        stream, "ts", "6 hours", None, watermark = "1 hour",
        groupColumns = Seq("event_type"), aggName = "count", valueColumn = "value")
      val qname = s"graft_q96_${streamRuns.incrementAndGet()}" // bench runs twice
      val query = scopedStreamStart(s)(agg.writeStream.format("memory").queryName(qname)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      query.awaitTermination()
      // the stream is fully drained into the memory sink — the temp dir
      // and symlink are no longer referenced (each bench run would
      // otherwise leak one)
      java.nio.file.Files.deleteIfExists(streamDir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(streamDir)
      s.table(qname).select(
        col("window.start").cast("long").as("win_start"),
        col("event_type"),
        col("value").cast("long").as("n"))
        .orderBy("win_start", "event_type")
    },
    Some("""SELECT CAST((epoch_us(ts) // 21600000000) * 21600 AS BIGINT) AS win_start,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** BPE encoding with the learned merges (training-data pipeline op): the
    * 8 rules from q94 applied corpus-wide as a pure map-side projection
    * (chained codegen merge nodes inside a per-word lambda), then the token
    * histogram. The oracle re-derives the same merges AND the final symbol
    * table in SQL and takes the histogram from the word table — identical
    * numbers through a completely different factoring (per-doc encode vs
    * weighted word-table fanout). */
  val q97_bpe_encode = Q(
    "q97_bpe_encode",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val merges = graft.text.Bpe.trainMerges(d, "text", numMerges = 8)
        .orderBy("rank")
        .collect()
        .map(r => (r.getString(1), r.getString(2)))
        .toSeq
      graft.text.Bpe.encode(d, "text", merges)
        // house rule: explode(array_compact(attribute)), never the bare
        // expensive projected attribute (q78 pushdown-duplication trap)
        .select(explode(array_compact(col("bpe_tokens"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).cast("long").as("cnt"))
        .orderBy("token")
    },
    Some(s"""WITH ${bpeRoundsSql(8)}
             SELECT u.tok AS token, CAST(SUM(cnt) AS BIGINT) AS cnt
             FROM w8, UNNEST(w8.syms) AS u(tok) GROUP BY 1 ORDER BY 1"""))

  /** Per-domain document caps (training-data pipeline op): keep at most 20
    * docs per source, chosen by deterministic content-keyed hash order (the
    * CommonCrawl "domain quota" step — prevents any single domain from
    * dominating the mix; hash order makes the quota stable across corpus
    * refreshes instead of keeping whichever rows arrive first). */
  val q98_domain_cap = Q(
    "q98_domain_cap",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling
        .capPerGroup(d, Seq("source"), 20, orderBy = Seq(
          knuthUniform(col("doc_id"), "cap"), col("doc_id")))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("source")
    },
    Some(s"""WITH ranked AS (
               SELECT source, n_chars,
                      ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY ${knuthUniformSql("doc_id", "cap")}, doc_id) AS rn
               FROM documents)
             SELECT source, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM ranked WHERE rn <= 20 GROUP BY 1 ORDER BY 1"""))

  /** Robust MAD outlier tagging (telemetry-cleaning op): per event type,
    * |value − median| > 3·MAD. Both engines compute median/MAD from
    * identical doubles with the same interpolation rule, so the boundary
    * comparison is deterministic; outputs are exact counts + rounded
    * robust statistics. */
  val q99_mad_outliers = Q(
    "q99_mad_outliers",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.operators.Outliers.madOutliers(e, "value", Seq("event_type"), k = 3.0)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("is_outlier").cast("long")).cast("long").as("n_outliers"))
        .orderBy("event_type")
    },
    Some("""WITH med AS (
              SELECT event_type, MEDIAN(value) AS m FROM events GROUP BY 1),
            mad AS (
              SELECT e.event_type, MEDIAN(ABS(e.value - med.m)) AS d
              FROM events e JOIN med USING (event_type) GROUP BY 1)
            SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN ABS(e.value - med.m) > mad.d * 3.0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM events e JOIN med USING (event_type) JOIN mad ON mad.event_type = e.event_type
            GROUP BY 1 ORDER BY 1"""))

  /** Time-series gap filling (imputation op): hourly per-type event counts
    * on the full observed grid, empty hours LOCF-imputed (~40 gap hours per
    * type at sf0.01); leading gaps stay NULL — imputing them would invent
    * data. The metric is an exact count, so imputed values are
    * engine-deterministic. */
  val q100_gap_fill = Q(
    "q100_gap_fill",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.time.GapFill.locfCounts(e, "ts", Seq("event_type"), bucketSeconds = 3600L)
        .orderBy("event_type", "bucket_start")
    },
    Some("""WITH c AS (
              SELECT event_type, epoch_us(ts) // 3600000000 AS b,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(b) AS lo, MAX(b) AS hi FROM c),
            spine AS (
              SELECT et.event_type, u.b
              FROM (SELECT DISTINCT event_type FROM events) et,
                   bounds, UNNEST(range(bounds.lo, bounds.hi + 1)) AS u(b)),
            j AS (SELECT s.event_type, s.b, c.n
                  FROM spine s LEFT JOIN c ON c.event_type = s.event_type AND c.b = s.b)
            SELECT event_type, CAST(b * 3600 AS BIGINT) AS bucket_start,
                   CAST(last_value(n IGNORE NULLS) OVER (
                     PARTITION BY event_type ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_filled,
                   CAST(n IS NULL AS BIGINT) AS was_filled
            FROM j ORDER BY event_type, bucket_start"""))

  /** Inverted index with capped posting lists (retrieval-infrastructure
    * op): token → doc_freq + first-10 postings in id order. The cap is
    * enforced by a window BEFORE any list materializes — stopword tokens
    * never build corpus-sized arrays. */
  val q101_inverted_index = Q(
    "q101_inverted_index",
    (s, dir) => {
      val d = t(s, dir, "documents")
      TextFunctions.invertedIndex(d, "doc_id", "text", maxPostings = 10)
        .select(col("token"), col("doc_freq").cast("long").as("doc_freq"), col("postings"))
        .orderBy("token")
    },
    Some("""WITH toks AS (
              SELECT DISTINCT doc_id, u.token AS token
              FROM (SELECT doc_id,
                           list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS tk
                    FROM documents) t, UNNEST(t.tk) AS u(token)),
            ranked AS (
              SELECT doc_id, token,
                     ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY token) AS doc_freq
              FROM toks)
            SELECT token, CAST(doc_freq AS BIGINT) AS doc_freq,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
            FROM ranked WHERE rn <= 10 GROUP BY token, doc_freq ORDER BY token"""))

  /** Temperature-based language rebalancing (mT5/XLM-R τ=2): high-resource
    * languages downsample to sqrt-proportional sizes, the rarest keeps
    * 100%. τ=2 on purpose — sqrt is IEEE-correctly-rounded on both engines,
    * unlike a libm pow (the q90 floor-log2 lesson, applied to exponents). */
  val q102_temperature_mix = Q(
    "q102_temperature_mix",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling
        .temperatureSample(d, "doc_id", "lang", seed = "temp", uniform = knuthUniform)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_kept"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("lang")
    },
    Some(s"""WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
             mn AS (SELECT MIN(n) AS nmin FROM cnt),
             rates AS (SELECT lang, SQRT(CAST(nmin AS DOUBLE) / n) AS r FROM cnt, mn)
             SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
                    CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM documents d JOIN rates ON rates.lang = d.lang
             WHERE ${knuthUniformSql("d.doc_id", "temp")} < rates.r
             GROUP BY 1 ORDER BY 1"""))

  /** In-row semi-structured extraction (SURVEY §2.10 family): the events
    * `props` JSON column parsed with a declared schema (`from_json` —
    * codegen'd, unlike a per-field get_json_object re-parse) and aggregated.
    * Exact integer outputs. */
  val q103_json_props = Q(
    "q103_json_props",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.select(
        col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("k")).cast("long").as("n_k"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).cast("long").as("min_k"),
          max(col("k")).cast("long").as("max_k"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
                   CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS n_k,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
                   CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS min_k,
                   CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** Corpus snapshot diff (pipeline-ops op): what changed between two
    * corpus versions — added / removed / changed / unchanged by content
    * comparison under a full outer join. The refresh-audit primitive behind
    * incremental re-processing (only `changed`+`added` re-enter the
    * pipeline). Both engines build the same synthetic "next" snapshot. */
  val q104_snapshot_diff = Q(
    "q104_snapshot_diff",
    (s, dir) => {
      val old = t(s, dir, "documents")
      val next = old
        .filter(col("doc_id") % 5 =!= 0) // every 5th doc removed
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2"))) // every 7th edited
            .otherwise(col("text")))
        .unionByName( // 100 new docs
          old.filter(col("doc_id") < 100).select(
            (col("doc_id") + 1000000L).as("doc_id"), concat(lit("new "), col("text")).as("text"),
            col("lang"), col("source"), col("n_chars")))
      graft.text.Dedup.corpusDiff(old, next, "doc_id", "text")
        .groupBy(col("status"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("status")
    },
    Some("""WITH next AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
              FROM documents WHERE doc_id % 5 <> 0
              UNION ALL
              SELECT doc_id + 1000000, 'new ' || text FROM documents WHERE doc_id < 100),
            d AS (
              SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                          WHEN n.doc_id IS NULL THEN 'removed'
                          WHEN o.text = n.text THEN 'unchanged'
                          ELSE 'changed' END AS status
              FROM documents o FULL OUTER JOIN next n ON o.doc_id = n.doc_id)
            SELECT status, CAST(COUNT(*) AS BIGINT) AS n
            FROM d GROUP BY 1 ORDER BY 1"""))

  /** Salted skew join (SURVEY §2.3 scale family): lineitem ⋈ part through
    * the hot-key salting path — big side salted by its own order key, small
    * side replicated ×8 — and the result must equal the PLAIN equi-join
    * (the oracle). Correctness of the rewrite is the point; the win shows
    * up when one key owns a shuffle partition. */
  val q105_salted_join = Q(
    "q105_salted_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      graft.operators.SkewJoin
        .saltedEquiJoin(
          li.withColumnRenamed("l_partkey", "p_partkey"), p,
          Seq("p_partkey"), salts = 8, saltSource = col("l_orderkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("p_brand")
    },
    Some("""SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l.l_quantity), 2) AS sum_qty
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1 ORDER BY 1"""))

  /** Ordered conversion funnel (product-analytics op): per user, the first
    * view, the first click strictly after it, the first purchase strictly
    * after that — three user-keyed aggregations, each stage filtering on
    * the previous stage's timestamp. Exact timestamp comparisons in
    * microseconds; counts per stage. */
  val q106_funnel = Q(
    "q106_funnel",
    (s, dir) => {
      val e = t(s, dir, "events")
      // each stage frame feeds BOTH its own count and the next stage —
      // localCheckpoint so the events scan + aggregation runs once per
      // stage instead of once per consumer
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts")).localCheckpoint()
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts")).localCheckpoint()
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      val stages = Seq(("1_view", v), ("2_click_after_view", c), ("3_purchase_after_click", p))
      stages.map { case (name, df) =>
        df.agg(count(lit(1)).cast("long").as("n_users")).select(lit(name).as("stage"), col("n_users"))
      }.reduce(_ unionByName _).orderBy("stage")
    },
    Some("""WITH v AS (
              SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1),
            c AS (
              SELECT e.user_id, MIN(e.ts) AS c_ts
              FROM events e JOIN v ON v.user_id = e.user_id
              WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
            p AS (
              SELECT e.user_id, MIN(e.ts) AS p_ts
              FROM events e JOIN c ON c.user_id = e.user_id
              WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
            SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
            UNION ALL SELECT '2_click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
            UNION ALL SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
            ORDER BY stage"""))

  /** Cohort retention (product-analytics op): users grouped by first-seen
    * day, retention = distinct active users at each day offset. Two
    * aggregations (first-seen, distinct user-day activity) joined on the
    * user key. Integer day arithmetic on epoch seconds — exact. */
  val q107_cohort_retention = Q(
    "q107_cohort_retention",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("week", expr("CAST(ts AS LONG) div 86400"))
      val firstSeen = e.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
      val active = e.select(col("user_id"), col("week")).distinct()
      active.join(firstSeen, Seq("user_id"))
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("offset"))
        .agg(countDistinct(col("user_id")).cast("long").as("n_users"))
        .select(col("cohort").cast("long").as("cohort"), col("offset").cast("long").as("offset"), col("n_users"))
        .orderBy("cohort", "offset")
    },
    Some("""WITH w AS (
              SELECT user_id, epoch_us(ts) // 86400000000 AS week FROM events),
            f AS (SELECT user_id, MIN(week) AS cohort FROM w GROUP BY 1),
            a AS (SELECT DISTINCT user_id, week FROM w)
            SELECT CAST(f.cohort AS BIGINT) AS cohort,
                   CAST(a.week - f.cohort AS BIGINT) AS "offset",
                   CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
            FROM a JOIN f ON f.user_id = a.user_id
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Int8 embedding quantization (vector-compression op): per-label counts,
    * the exact integer sum of the first quantized component, and the max
    * per-vector reconstruction error — deterministic via floor-rounding and
    * a fixed-order fold (no row-order double sums). */
  val q108_quantize = Q(
    "q108_quantize",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ml.Quantize.int8(emb, "embedding")
        .groupBy(col("label"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(element_at(col("q8"), 1)).cast("long").as("sum_q0"),
          max(col("recon_err")).as("max_err"))
        .select(col("label").cast("long").as("label"), col("n"), col("sum_q0"), col("max_err"))
        .orderBy("label")
    },
    Some("""WITH s AS (
              SELECT label, embedding,
                     CASE WHEN m > 0 THEN m / 127.0 ELSE 1.0 END AS scale
              FROM (SELECT label, embedding,
                           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
                    FROM embeddings)),
            r AS (
              SELECT label,
                     CAST(LEAST(127, GREATEST(-127, FLOOR(CAST(embedding[1] AS DOUBLE) / scale + 0.5))) AS BIGINT) AS q0,
                     list_reduce(
                       list_prepend(0.0, list_transform(embedding, x ->
                         abs(CAST(x AS DOUBLE)
                             - LEAST(127, GREATEST(-127, FLOOR(CAST(x AS DOUBLE) / scale + 0.5))) * scale))),
                       (acc, x) -> acc + x) AS err
              FROM s)
            SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q0) AS BIGINT) AS sum_q0, MAX(err) AS max_err
            FROM r GROUP BY 1 ORDER BY 1"""))

  /** collect_list through the whitelist aggregation registry (SURVEY §2.4
    * row, previously spec-only): per-region nation names, sorted then
    * joined so the unordered collection is hash-deterministic. */
  val q109_collect_list = Q(
    "q109_collect_list",
    (s, dir) => {
      val n = t(s, dir, "nation")
      Aggregation.aggregate(n, Seq("n_regionkey"), "collect_list", "n_name", Some("names"))
        .select(
          col("n_regionkey").cast("long").as("n_regionkey"),
          array_join(array_sort(col("names")), ",").as("names"))
        .orderBy("n_regionkey")
    },
    Some("""SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
                   string_agg(n_name, ',' ORDER BY n_name) AS names
            FROM nation GROUP BY 1 ORDER BY 1"""))

  /** Invalid-file recovery (SURVEY §2.1 row, previously spec-only): a
    * corrupt .parquet planted next to real part files must be skipped by
    * the recovering reader, and the surviving rows must equal the clean
    * subset — the oracle reads the ORIGINAL table, so any lost or phantom
    * row diverges the hash. */
  val q110_read_recovery = Q(
    "q110_read_recovery",
    (s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
      val out = java.nio.file.Files.createTempDirectory("graft-q110").toString + "/data"
      li.coalesce(2).write.mode("overwrite").parquet(out)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/zz_corrupt.parquet"),
        "not a parquet file".getBytes("UTF-8"))
      graft.sources.Readers.readWithRecovery(s, out)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem WHERE l_orderkey % 10 = 0
            GROUP BY 1 ORDER BY 1"""))

  /** Content hashing (SURVEY §2.10 cache-key row, previously spec-only):
    * the same SHA-256/16-hex fingerprint `query.Models.contentHash` uses
    * for cache keys, applied as a codegen column (`sha2`) — DuckDB's
    * `sha256` replays it byte-for-byte. */
  val q111_content_hash = Q(
    "q111_content_hash",
    (s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 50)
      d.select(
        col("doc_id").cast("long").as("doc_id"),
        substring(sha2(col("text"), 256), 1, 16).as("fp"))
        .orderBy("doc_id")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id, substr(sha256(text), 1, 16) AS fp
            FROM documents WHERE doc_id < 50 ORDER BY doc_id"""))

  /** Schema'd reader with renames/ignores (SURVEY §2.1 row, previously
    * spec-only): customer exported to CSV, re-read through a typed
    * `FileSchema` that renames two columns and drops one; the aggregate
    * must equal the original table under the same aliases. */
  val q112_file_schema = Q(
    "q112_file_schema",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val out = java.nio.file.Files.createTempDirectory("graft-q112").toString + "/c.csv"
      c.coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
      val fs = graft.core.FileSchema(
        columns = Seq(
          ("c_custkey", "bigint"), ("c_name", "string"), ("c_nationkey", "bigint"),
          ("c_acctbal", "double"), ("c_mktsegment", "string")),
        renames = Map("c_mktsegment" -> "segment", "c_acctbal" -> "balance"),
        ignoreColumns = Seq("c_name"))
      graft.sources.Readers
        .applyFileSchema(graft.sources.Readers.csv(s, out, Some(fs)), fs)
        .groupBy(col("segment"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("balance")), 2).as("total_balance"))
        .orderBy("segment")
    },
    Some("""SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(c_acctbal), 2) AS total_balance
            FROM customer GROUP BY 1 ORDER BY 1"""))

  /** Count-Min heavy hitters (sketch family): one-pass 4×512 counter
    * matrix over lineitem part keys — a fixed 16 KiB artifact instead of
    * the per-key shuffle an exact count needs — probed for the top-10
    * exact keys so the `estimate >= exact` guarantee is visible in the
    * output. The sketch's merge is commutative integer addition, so the
    * matrix is DETERMINISTIC under any partitioning and the oracle replays
    * every cell exactly: per-key xxhash64 (via `tools.OracleSql`), the
    * Kirsch–Mitzenmacher buckets, the four bucket sums, and the min. */
  val q113_heavy_hitters = Q(
    "q113_heavy_hitters",
    (s, dir) => {
      import graft.operators.Sketches
      // keys stay BIGINT end to end: the sketch is built from pre-hashed
      // xxhash64(long) values (CountMinAgg's array<long> form) and probed
      // with the same hash — and the oracle replays the fixed-8-byte
      // XXH64 form (~6 SQL stages) instead of the ~40-stage string form
      val keys = t(s, dir, "lineitem").select(col("l_partkey").as("k"))
      val art = Sketches.buildCountMin(keys, array(xxhash64(col("k"))), depth = 4, width = 512)
      keys
        .groupBy("k")
        .agg(count(lit(1)).cast("long").as("exact"))
        .orderBy(col("exact").desc, col("k"))
        .limit(10)
        .withColumn("est", Sketches.countMinEstimate(art, xxhash64(col("k"))))
        .select(col("k").as("partkey"), col("exact"), col("est"))
        .orderBy("partkey")
    },
    Some {
      import graft.tools.OracleSql._
      // group BEFORE hashing: the exact counts ride through the XXH64
      // stages (they pass non-hash columns along), so only distinct keys
      // pay the staged-expression cost
      val keys = "SELECT l_partkey AS k, COUNT(*) AS exact FROM lineitem GROUP BY 1"
      val hashed = xxhash64LongStages(keys, "k", "kh", pfx = "__c")
      val buckets = (0 until 4)
        .map(i => s"CAST(((h1 + $i * h2) % 4294967296) % 512 AS BIGINT) AS g$i")
        .mkString(", ")
      val sums = (0 until 4)
        .map(i => s"s$i AS (SELECT g$i, SUM(exact) AS c FROM b GROUP BY 1)")
        .mkString(",\n            ")
      val joins = (0 until 4).map(i => s"JOIN s$i ON top.g$i = s$i.g$i").mkString(" ")
      s"""WITH wc AS (
            SELECT k, kh, exact FROM ($hashed)),
          hu AS (
            SELECT k, exact,
                   CASE WHEN kh < 0 THEN kh::HUGEINT + 18446744073709551616::HUGEINT
                        ELSE kh::HUGEINT END AS u
            FROM wc),
          b AS (
            SELECT k, exact, $buckets
            FROM (SELECT k, exact, u % 4294967296 AS h1, u // 4294967296 AS h2 FROM hu)),
          $sums,
          top AS (SELECT * FROM b ORDER BY exact DESC, k LIMIT 10)
          SELECT CAST(top.k AS BIGINT) AS partkey, CAST(top.exact AS BIGINT) AS exact,
                 CAST(LEAST(s0.c, s1.c, s2.c, s3.c) AS BIGINT) AS est
          FROM top $joins
          ORDER BY partkey"""
    })

  /** HyperLogLog distinct-order-keys per return flag (sketch family,
    * p=8 → 256 registers): register table + RAW harmonic estimate beside
    * the exact distinct count. The registers are max-merged — order
    * independent — and the estimate folds exact dyadic 2^-M terms in
    * register order from a fixed start, so even the double is bit-stable
    * and the oracle replays it to the last ulp (the libm-dependent
    * small-range correction is deliberately omitted — see
    * `Sketches.hllEstimate`). */
  val q114_hll_distinct = Q(
    "q114_hll_distinct",
    (s, dir) => {
      import graft.operators.Sketches
      // BIGINT keys: xxhash64(long) replays via the fixed-8-byte oracle form
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_orderkey").as("k"))
      val regs = Sketches.hllRegisters(li, Seq("flag"), xxhash64(col("k")), p = 8)
      val est = Sketches.hllEstimate(regs, Seq("flag"), p = 8)
      li.groupBy("flag")
        .agg(countDistinct(col("k")).cast("long").as("exact"))
        .join(est, Seq("flag"))
        .select(col("flag"), col("exact"), col("registers_used"), col("hll_est"))
        .orderBy("flag")
    },
    Some {
      import graft.tools.OracleSql._
      val m = 256
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val scale = alpha * m.toDouble * m.toDouble
      // DISTINCT first: HLL registers are a MAX per (flag, bucket), so
      // duplicate keys cannot change them — and only distinct keys then
      // pay the staged-XXH64 cost (~4× fewer at lineitem granularity)
      val keys = "SELECT DISTINCT l_returnflag AS flag, l_orderkey AS k FROM lineitem"
      val hashed = xxhash64LongStages(keys, "k", "kh", pfx = "__h")
      s"""WITH hu AS (
            SELECT flag,
                   CASE WHEN kh < 0 THEN kh::HUGEINT + 18446744073709551616::HUGEINT
                        ELSE kh::HUGEINT END AS u
            FROM ($hashed)),
          jr AS (
            SELECT flag, CAST(u % $m AS BIGINT) AS j,
                   CASE WHEN u // $m = 0 THEN 57
                        ELSE 57 - length(bin(CAST(u // $m AS BIGINT))) END AS rho
            FROM hu),
          regs AS (SELECT flag, j, MAX(rho) AS mm FROM jr GROUP BY 1, 2),
          folded AS (
            SELECT flag, CAST(COUNT(*) AS BIGINT) AS registers_used,
                   list_reduce(
                     [$m.0 - COUNT(*)] || list(1.0 / (1::BIGINT << mm) ORDER BY j),
                     (a, b) -> a + b) AS sh
            FROM regs GROUP BY 1),
          exact AS (
            SELECT l_returnflag AS flag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact
            FROM lineitem GROUP BY 1)
          SELECT e.flag, e.exact, f.registers_used, $scale / f.sh AS hll_est
          FROM exact e JOIN folded f USING (flag)
          ORDER BY flag"""
    })

  /** Blocked edit-distance near-duplicate pairs (record-linkage classic):
    * candidates only from equal (brand, name-length) blocks, each verified
    * with codegen'd levenshtein <= 1. The oracle is DuckDB's NATIVE
    * levenshtein — an independent implementation of the same metric. */
  val q115_edit_pairs = Q(
    "q115_edit_pairs",
    (s, dir) => {
      val p = t(s, dir, "part").withColumn("len", length(col("p_name")))
      Dedup
        .editDistanceNearDuplicates(p, "p_partkey", "p_name", Seq("p_brand", "len"), maxDistance = 1)
        .select(
          col("id1").cast("long").as("id1"),
          col("id2").cast("long").as("id2"),
          col("distance").cast("long").as("distance"))
        .orderBy("id1", "id2")
    },
    Some("""SELECT CAST(a.p_partkey AS BIGINT) AS id1, CAST(b.p_partkey AS BIGINT) AS id2,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND length(a.p_name) = length(b.p_name)
                 AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 1
            ORDER BY id1, id2"""))

  /** Two-stage salted aggregation over a 3-key hot-group column (skew
    * family, the aggregation twin of q105's salted join): stage 1 spreads
    * each hot key across 8 salt sub-groups, stage 2 folds the partials.
    * All aggregates are exact-typed (BIGINT sums/counts/min/max), so the
    * result is row-identical to the plain spelling — which is exactly what
    * the oracle runs. */
  val q116_salted_agg = Q(
    "q116_salted_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("qty", col("l_quantity").cast("long"))
      Aggregation
        .saltedAggregate(
          li,
          Seq("l_returnflag"),
          Seq(
            ("sum", "qty", "sum_qty"), ("count", "qty", "n"),
            ("min", "qty", "min_qty"), ("max", "qty", "max_qty")),
          salts = 8,
          saltSource = col("l_orderkey"))
        .select(
          col("l_returnflag"), col("sum_qty").cast("long").as("sum_qty"),
          col("n").cast("long").as("n"), col("min_qty").cast("long").as("min_qty"),
          col("max_qty").cast("long").as("max_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(COUNT(l_quantity) AS BIGINT) AS n,
                   CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
                   CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  val all: Seq[Q] = Seq(
    q88_dedup_incremental, q89_bloom_screen, q90_lm_score, q91_split,
    q92_seq_pack, q93_unicode_norm, q94_bpe_train, q95_video,
    q96_stream_agg, q97_bpe_encode, q98_domain_cap, q99_mad_outliers,
    q100_gap_fill, q101_inverted_index, q102_temperature_mix, q103_json_props,
    q104_snapshot_diff, q105_salted_join, q106_funnel, q107_cohort_retention,
    q108_quantize, q109_collect_list, q110_read_recovery, q111_content_hash,
    q112_file_schema, q113_heavy_hitters, q114_hll_distinct, q115_edit_pairs,
    q116_salted_agg)
}
