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

/** Catalog chunk q146-q174 (registration + docs in [[graft.Queries]]). */
private[graft] object Catalog6 {

  /** Per-key time-bucketed rate limiting (abuse throttling / event-stream
    * hygiene): at most 3 events per user per hour, chosen deterministically
    * by (ts, event_id) order — capPerGroup over the time bucket. */
  val q146_rate_limit = Q(
    "q146_rate_limit",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("hour", date_trunc("hour", col("ts")))
      val kept = graft.text.Sampling
        .capPerGroup(e, Seq("user_id", "hour"), 3,
          orderBy = Seq(col("ts"), col("event_id")))
      kept.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_kept"))
        .join(
          e.groupBy(col("event_type"))
            .agg(count(lit(1)).cast("long").as("n_total")),
          Seq("event_type"))
        .select(col("event_type"), col("n_total"), col("n_kept"),
          (col("n_total") - col("n_kept")).cast("long").as("n_dropped"))
        .orderBy("event_type")
    },
    Some("""WITH ranked AS (
              SELECT event_type,
                     ROW_NUMBER() OVER (
                       PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts, event_id) AS rn
              FROM events),
            k AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept
                  FROM ranked WHERE rn <= 3 GROUP BY 1),
            tt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total
                   FROM events GROUP BY 1)
            SELECT tt.event_type, tt.n_total, k.n_kept,
                   CAST(tt.n_total - k.n_kept AS BIGINT) AS n_dropped
            FROM tt JOIN k USING (event_type) ORDER BY 1"""))

  /** Keyed pseudonymization (PII-safe analytics joins): customer keys
    * replaced by salted SHA-256 digests on BOTH tables, then joined on the
    * pseudonym — referential structure preserved, raw keys never co-located
    * with payloads. SHA-256 is standardized byte-exact, so the oracle
    * replays the digests themselves (unlike engine-internal hashes). */
  val q147_pseudonymize = Q(
    "q147_pseudonymize",
    (s, dir) => {
      def pseudo(key: Column): Column =
        sha2(concat(key.cast("string"), lit("|pepper42")), 256)
      val cust = t(s, dir, "customer")
        .select(pseudo(col("c_custkey")).as("pid"), col("c_mktsegment").as("segment"))
      val ords = t(s, dir, "orders")
        .select(pseudo(col("o_custkey")).as("pid"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      cust.join(ords, Seq("pid"))
        .groupBy(col("segment"))
        .agg(
          count(lit(1)).cast("long").as("n_orders"),
          sum(col("cents")).cast("long").as("total_cents"),
          min(col("pid")).as("sample_pid"))
        .orderBy("segment")
    },
    Some("""WITH cust AS (SELECT sha256(CAST(c_custkey AS VARCHAR) || '|pepper42') AS pid,
                                 c_mktsegment AS segment FROM customer),
                 ords AS (SELECT sha256(CAST(o_custkey AS VARCHAR) || '|pepper42') AS pid,
                                 CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
            SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(cents) AS BIGINT) AS total_cents,
                   MIN(pid) AS sample_pid
            FROM cust JOIN ords USING (pid)
            GROUP BY 1 ORDER BY 1"""))

  /** Document chunking into overlapping token windows (RAG / long-context
    * preprocessing): chunk size 8, overlap 3 — so chunk starts step by 5
    * and consecutive chunks share 3 tokens. Output keeps the chunk text
    * itself plus its (start, length) span, so the oracle replays the exact
    * slicing arithmetic relationally (range + list slice in DuckDB). */
  val q148_chunking = Q(
    "q148_chunking",
    (s, dir) => {
      graft.text.Chunking
        .chunkDocuments(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", chunkTokens = 8, overlapTokens = 3)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("chunk_id"), col("token_start"), col("n_tokens"), col("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> len(x) > 0) AS tk
              FROM documents WHERE doc_id < 300),
            starts AS (
              SELECT doc_id, tk,
                     unnest(range(0, greatest(len(tk) - 3 - 1, 0) + 1, 5)) AS st,
                     generate_subscripts(range(0, greatest(len(tk) - 3 - 1, 0) + 1, 5), 1) - 1 AS cid
              FROM toks WHERE len(tk) > 0)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(cid AS BIGINT) AS chunk_id,
                   CAST(st AS BIGINT) AS token_start,
                   CAST(len(tk[st+1 : st+8]) AS BIGINT) AS n_tokens,
                   array_to_string(tk[st+1 : st+8], ' ') AS chunk_text
            FROM starts ORDER BY doc_id, chunk_id"""))

  /** Semi-structured VARIANT ingestion (Spark 4 VariantType): each event
    * serialized to a JSON payload (with a nested object and a sometimes-
    * missing field), parsed into the binary variant encoding, and shredded
    * back into typed columns with `try_variant_get` path extraction —
    * missing paths yield NULL, not errors. The oracle recomputes the same
    * aggregate straight from the base columns, so any parse/extract loss
    * or type coercion drift in the variant round-trip hash-mismatches. */
  val q149_variant_shred = Q(
    "q149_variant_shred",
    (s, dir) => {
      import graft.functions.SemiStructured
      val payloads = t(s, dir, "events").select(
        to_json(struct(
          col("event_type").as("type"),
          struct(
            col("user_id").as("id"),
            (col("user_id") % 7).as("cohort")).as("user"),
          floor(col("value") * 100).cast("long").as("cents"),
          // present only for even event ids — exercises NULL-on-missing
          when(col("event_id") % 2 === 0, col("event_id")).as("trace"))).as("payload"))
      val shredded = SemiStructured.shredJson(payloads, "payload", Seq(
        SemiStructured.Field("etype", "$.type", "string"),
        SemiStructured.Field("cohort", "$.user.cohort", "bigint"),
        SemiStructured.Field("cents", "$.cents", "bigint"),
        SemiStructured.Field("trace", "$.trace", "bigint"),
        SemiStructured.Field("missing", "$.nope.deeper", "string")))
      shredded
        .groupBy(col("etype"), col("cohort"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("cents")).cast("long").as("total_cents"),
          count(col("trace")).cast("long").as("n_traced"),
          count(col("missing")).cast("long").as("n_missing_hits"))
        .orderBy("etype", "cohort")
    },
    Some("""SELECT event_type AS etype,
                   CAST(user_id % 7 AS BIGINT) AS cohort,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                   CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_traced,
                   CAST(0 AS BIGINT) AS n_missing_hits
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** URL canonicalization + first-fetch dedup (crawl-frontier op). URLs are
    * synthesized deterministically from doc_id with every messiness class
    * the canonicalizer handles: mixed-case scheme/host, default ports,
    * `www.` prefixes, trailing slashes, tracking params, unsorted params,
    * fragments. The oracle derives each CANONICAL form independently from
    * the doc_id arithmetic (never replaying the regex pipeline), so it
    * checks the end-to-end mapping, not the implementation. */
  val q150_url_dedup = Q(
    "q150_url_dedup",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"))
      val withUrl = d.withColumn("url", concat(
        when(col("doc_id") % 2 === 0, "HTTP").otherwise("https"),
        lit("://WWW.Site"), (col("doc_id") % 40).cast("string"), lit(".COM"),
        when(col("doc_id") % 4 < 2,
          when(col("doc_id") % 2 === 0, ":80").otherwise(":443")).otherwise(""),
        lit("/Page/"), (col("doc_id") % 25).cast("string"),
        when(col("doc_id") % 5 === 0, "/").otherwise(""),
        when(col("doc_id") % 3 === 0, "?utm_source=feed&b=2&a=1")
          .when(col("doc_id") % 3 === 1, "?a=1&b=2").otherwise(""),
        when(col("doc_id") % 7 === 0, "#frag").otherwise("")))
      // ONE canonicalize pass + ONE aggregation produces both the keeper
      // and the variant count (the ~10-regex chain must not run twice;
      // dedupByCanonicalUrl itself is row-level and spec-covered)
      withUrl
        .withColumn("canonical_url", graft.text.UrlOps.canonicalize(col("url")))
        .groupBy(col("canonical_url"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).cast("long").as("n_variants"))
        .filter(col("n_variants") >= 2)
        .select(col("canonical_url"), col("keeper"), col("n_variants"))
        .orderBy("canonical_url")
    },
    Some("""WITH canon AS (
              SELECT doc_id::BIGINT AS doc_id,
                (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
                || '://site' || CAST(doc_id % 40 AS VARCHAR) || '.com'
                || '/Page/' || CAST(doc_id % 25 AS VARCHAR)
                || (CASE WHEN doc_id % 3 IN (0, 1) THEN '?a=1&b=2' ELSE '' END)
                AS canonical_url
              FROM documents)
            SELECT canonical_url,
                   CAST(MIN(doc_id) AS BIGINT) AS keeper,
                   CAST(COUNT(*) AS BIGINT) AS n_variants
            FROM canon GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1"""))

  /** Inverted-index top-k TF-IDF retrieval: unlike q86 (BM25 scores for
    * every document), this is the RETRIEVAL operator — postings pruned to
    * the query terms immediately after the explode, fixed-point integer
    * idf (floor-log2, bit-stable), and the k best documents via
    * TakeOrderedAndProject (per-partition heaps; only k rows cross the
    * final exchange). 'dup' is the one rare term in the synthetic vocab
    * (df 25/500 vs ~380/500), so the idf spread is real. */
  val q151_tfidf_topk = Q(
    "q151_tfidf_topk",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      graft.text.Search.searchTopK(d, "doc_id", "text",
        terms = Seq("dup", "key", "fast"), k = 200, idfScale = 1024L)
    },
    Some("""WITH d AS (
              SELECT doc_id::BIGINT AS id,
                list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS toks
              FROM documents),
            posts AS (
              SELECT id, u.term AS term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM d, UNNEST(d.toks) AS u(term)
              WHERE u.term IN ('dup', 'key', 'fast') GROUP BY 1, 2),
            stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM posts GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d)
            SELECT id AS doc_id,
                   CAST(SUM(tf * (length(bin((n_docs * 1024) // df_t)) - 1)) AS BIGINT) AS score
            FROM posts JOIN stats USING (term), n
            GROUP BY id, n_docs
            ORDER BY score DESC, doc_id ASC LIMIT 200"""))

  /** Bigram collocation mining (word2phrase): integer PMI-ish score
    * (c12*T) div (c1*c2) in exact BIGINT, long-tail pruned at minCount
    * BEFORE the vocabulary joins, top-k fully tie-broken. */
  val q152_collocations = Q(
    "q152_collocations",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("text"))
      graft.text.Search.collocations(d, "text", minCount = 5L, k = 50)
    },
    Some("""WITH d AS (
              SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS toks
              FROM documents),
            uni AS (
              SELECT u.w AS w, CAST(COUNT(*) AS BIGINT) AS c
              FROM d, UNNEST(d.toks) AS u(w) GROUP BY 1),
            bi AS (
              SELECT toks[i] AS w1, toks[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c12
              FROM d, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
              GROUP BY 1, 2 HAVING COUNT(*) >= 5),
            total AS (SELECT CAST(SUM(c) AS BIGINT) AS t_tokens FROM uni)
            SELECT w1, w2, c12,
                   CAST((c12 * t_tokens) // (u1.c * u2.c) AS BIGINT) AS score
            FROM bi JOIN uni u1 ON bi.w1 = u1.w JOIN uni u2 ON bi.w2 = u2.w, total
            ORDER BY score DESC, c12 DESC, w1 ASC, w2 ASC LIMIT 50"""))

  /** Mergeable fixed-grid histogram quantiles: the corpus is split into two
    * shards (user parity), a histogram artifact built per shard, merged
    * (sum-combine — the persistable-artifact property, like the CM/HLL
    * rows), and p50/p90/p99 read back in pure BIGINT arithmetic. Grid
    * quantiles are DETERMINISTIC — unlike rank-error sketches, the merged
    * artifact hash-matches an oracle that never saw the sharding. */
  val q153_quantile_sketch = Q(
    "q153_quantile_sketch",
    (s, dir) => {
      import graft.operators.Sketches
      val e = t(s, dir, "events").select(
        col("event_type"),
        col("user_id").cast("long").as("user_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      val shardA = Sketches.histogramSketch(
        e.filter(col("user_id") % 2 === 0), Seq("event_type"), "cents", width = 500L)
      val shardB = Sketches.histogramSketch(
        e.filter(col("user_id") % 2 === 1), Seq("event_type"), "cents", width = 500L)
      val merged = Sketches.histogramMerge(shardA, shardB, Seq("event_type"))
      Sketches.histogramQuantiles(merged, Seq("event_type"), Seq(50, 90, 99), width = 500L)
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT event_type,
                CAST(FLOOR(value * 100) AS BIGINT) // 500 AS bucket
              FROM events),
            h AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
            c AS (
              SELECT event_type, bucket, cnt,
                CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum,
                CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
              FROM h)
            SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
                   CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket * 500 END) AS BIGINT) AS p50,
                   CAST(MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bucket * 500 END) AS BIGINT) AS p90,
                   CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket * 500 END) AS BIGINT) AS p99
            FROM c GROUP BY event_type ORDER BY event_type"""))

  /** Stream-stream interval join: even-id events join odd-id events of the
    * same user within ±30 minutes, both sides file streams with event-time
    * watermarks and the interval bound in the join condition (the state-
    * pruning shape — a keyed row leaves the state store once the other
    * side's watermark passes its interval). The watermark delay covers the
    * whole corpus, so the streamed append-mode result equals the batch
    * join exactly and the DuckDB batch replay is a true oracle. */
  val q154_stream_join = Q(
    "q154_stream_join",
    (s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q154")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
        .select(col("user_id").cast("long").as("user_id"), col("event_id"), col("ts"))
        // bounded key subset: the catalog-bench cost of a stream-stream
        // join is state-store volume × micro-batch machinery, and the
        // operator's semantics are fully exercised on a third of the keys
        .filter(col("user_id") < 50)
      val left = stream.filter(col("event_id") % 2 === 0).drop("event_id")
      val right = stream.filter(col("event_id") % 2 === 1).drop("event_id")
      val joined = graft.streaming.StreamOps.intervalJoin(
        left, right, Seq("user_id"), "ts", within = "30 minutes",
        watermark = "3650 days")
      val qname = s"graft_q154_${streamRuns.incrementAndGet()}"
      // a stream-stream join runs TWO keyed state stores and is the
      // heaviest case of the scopedStreamStart rationale (measured 2x
      // on 32 partitions before the scoping)
      val q = scopedStreamStart(s)(
        joined.writeStream.format("memory").queryName(qname)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start())
      q.awaitTermination()
      java.nio.file.Files.deleteIfExists(streamDir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(streamDir)
      s.table(qname)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_pairs"))
        .orderBy("user_id")
    },
    Some("""SELECT CAST(l.user_id AS BIGINT) AS user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM events l JOIN events r
              ON l.user_id = r.user_id
             AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
            WHERE l.event_id % 2 = 0 AND r.event_id % 2 = 1 AND l.user_id < 50
            GROUP BY 1 ORDER BY 1"""))

  /** Containment (asymmetric-Jaccard) dedup: every fourth document gets a
    * 12-token snippet child — full containment (1.0) in the parent while
    * symmetric Jaccard is ~0.1, exactly the pair minhash LSH structurally
    * misses (q29's operator cannot see these; this one exists for them).
    * df-capped inverted-index intersection; the oracle replays shingling,
    * cap, and both direction ratios (exact-int / exact-int division —
    * IEEE-deterministic, no rounding needed). */
  val q155_containment = Q(
    "q155_containment",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val snippets = d.filter(col("doc_id") % 4 === 0).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " ").as("text"))
      val corpus = d.unionByName(snippets)
      Dedup.containmentPairs(corpus, "doc_id", "text",
          shingleSize = 3, threshold = 0.9, dfCap = 1000)
        .select(col("id1"), col("id2"), col("c1_in_2"), col("c2_in_1"), col("containment"))
        .orderBy("id1", "id2")
    },
    Some("""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, array_to_string(toks[1:12], ' ')
              FROM (SELECT doc_id::BIGINT AS doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)
              WHERE doc_id % 4 = 0),
            sh AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM corpus)),
            ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
            df AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 1000),
            cex AS (SELECT doc_id, s FROM ex JOIN df USING (s)),
            sz AS (SELECT doc_id, COUNT(*) AS n FROM cex GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS ic
              FROM cex a JOIN cex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id1, id2,
                   CAST(ic AS DOUBLE) / s1.n AS c1_in_2,
                   CAST(ic AS DOUBLE) / s2.n AS c2_in_1,
                   greatest(CAST(ic AS DOUBLE) / s1.n, CAST(ic AS DOUBLE) / s2.n) AS containment
            FROM inter
            JOIN sz s1 ON s1.doc_id = id1
            JOIN sz s2 ON s2.doc_id = id2
            WHERE greatest(CAST(ic AS DOUBLE) / s1.n, CAST(ic AS DOUBLE) / s2.n) >= 0.9
            ORDER BY id1, id2"""))

  /** Hard-negative mining for contrastive training: per anchor, the top-5
    * most-similar DIFFERENT-label vectors (label inequality inside the
    * join — a same-label near-dup can never become a negative). Oracle is
    * the exhaustive replay with the same fixed-fold cosine. */
  val q156_hard_negatives = Q(
    "q156_hard_negatives",
    (s, dir) => {
      val emb = t(s, dir, "embeddings").select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"),
        col("label").cast("long").as("label"))
      Similarity.hardNegatives(emb.filter(col("vec_id") < 6), emb, k = 5)
        .select(
          col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("neighbor_label"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (
              SELECT vec_id::BIGINT AS vec_id, label::BIGINT AS label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q CROSS JOIN e c
              WHERE q.vec_id < 6 AND q.label <> c.label),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, neighbor_label,
                   ROUND(cos, 4) AS cosine
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Streaming near-dup ingest gate: the q88 incremental-dedup semantics
    * driven through a real file stream — corpus artifacts (hashed shingle
    * sets + LSH buckets) computed once batch-side, each micro-batch
    * screened by two stream-static joins with zero streaming state. Same
    * signatures and band hashing as batch, so the streamed result equals
    * q88 exactly and SHARES its oracle SQL verbatim. */
  val q157_stream_neardup = Q(
    "q157_stream_neardup",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      // persisted-corpus artifacts: eager-checkpointed (feed the signature
      // pipeline AND every micro-batch's verify join; nothing stays cached)
      val exShingles = Dedup.hashedShingleSets(d, "doc_id", "text", 3).localCheckpoint(true)
      val exBuckets = Dedup.lshBucketsFromSignatures(
        Dedup.minhashSignaturesFromShingles(exShingles, "doc_id", 64), "doc_id", 16, 4)
        .localCheckpoint(true)
      val incoming = d.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        array_join(
          slice(split(trim(col("text")), "\\s+"), lit(1),
            size(split(trim(col("text")), "\\s+")) - 1), " ").as("text"))
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q157")
      incoming.coalesce(1).write.mode("overwrite").parquet(s"$streamDir/batch")
      val schema = s.read.parquet(s"$streamDir/batch").schema
      val stream = s.readStream.schema(schema).parquet(s"$streamDir/batch")
      val gated = graft.streaming.StreamOps.nearDupIngestGate(
        stream, exShingles, exBuckets, "doc_id", "text",
        bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
      val qname = s"graft_q157_${streamRuns.incrementAndGet()}"
      val q = scopedStreamStart(s)(gated.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      q.awaitTermination()
      // a pair caught by several bands appears once per band (the gate
      // cannot distinct without unbounded state); collapse batch-side
      s.table(qname)
        .groupBy(col("new_id"), col("existing_id"))
        .agg(round(max(col("jaccard")), 4).as("jaccard"))
        .orderBy("new_id", "existing_id")
    },
    // IDENTICAL semantics to the batch incremental dedup → shared oracle
    Catalog4.q88_dedup_incremental.oracle)

  /** Hybrid retrieval via reciprocal-rank fusion: the lexical ranking
    * (integer-idf TF-IDF, q151's operator) fused with a vector ranking
    * (cosine to the vec_id=0 anchor; embeddings and documents share the
    * id space) by RRF — exact integer ranks, fixed two-term IEEE score,
    * bit-replayable. */
  val q158_hybrid_rrf = Q(
    "q158_hybrid_rrf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val lex = graft.text.Search.searchTopK(d, "doc_id", "text",
        terms = Seq("dup", "key", "fast"), k = 100, idfScale = 1024L)
      val lexRank = lex.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      val emb = t(s, dir, "embeddings").select(
        col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val vecRank = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 0), emb, k = 100)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.text.Search.rrfFuse(lexRank.select(col("doc_id"), col("rank")), vecRank,
          "doc_id", kConst = 60, topK = 30)
        .select(col("doc_id"),
          col("rank_a").cast("long").as("rank_a"),
          col("rank_b").cast("long").as("rank_b"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
    },
    Some("""WITH d AS (
              SELECT doc_id::BIGINT AS id,
                list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), x -> x <> '') AS toks
              FROM documents),
            posts AS (
              SELECT id, u.term AS term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM d, UNNEST(d.toks) AS u(term)
              WHERE u.term IN ('dup', 'key', 'fast') GROUP BY 1, 2),
            stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM posts GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d),
            scored AS (
              SELECT id, CAST(SUM(tf * (length(bin((n_docs * 1024) // df_t)) - 1)) AS BIGINT) AS score
              FROM posts JOIN stats USING (term), n GROUP BY id, n_docs),
            lex AS (
              SELECT id AS doc_id, rank_a FROM (
                SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS BIGINT) AS rank_a
                FROM scored) WHERE rank_a <= 100),
            e AS (SELECT vec_id::BIGINT AS vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings),
            vecscored AS (
              SELECT c.vec_id AS doc_id,
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q CROSS JOIN e c WHERE q.vec_id = 0 AND c.vec_id <> 0),
            vec AS (
              SELECT doc_id, rank_b FROM (
                SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id ASC) AS BIGINT) AS rank_b
                FROM vecscored) WHERE rank_b <= 100),
            fused AS (
              SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, rank_a, rank_b,
                COALESCE(1.0 / (60 + rank_a), 0.0) + COALESCE(1.0 / (60 + rank_b), 0.0) AS rrf
              FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
            SELECT doc_id, rank_a, rank_b, rrf
            FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 30"""))

  /** Token-budget corpus fill: keep the longest documents (chars-desc
    * priority, id tiebreak) until 20k whitespace tokens are spent — the
    * greedy-prefix selection of a pretraining mix. One window cumsum in
    * BIGINT; the oracle replays it. */
  val q159_budget_fill = Q(
    "q159_budget_fill",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"),
        TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
      graft.text.Sampling.fillTokenBudget(d, "toks", budget = 20000L,
          orderBy = Seq(col("n_chars").desc, col("doc_id").asc))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("toks")).cast("long").as("tokens"),
          min(col("n_chars")).cast("long").as("min_chars"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
              SELECT doc_id::BIGINT AS doc_id, lang, n_chars::BIGINT AS n_chars,
                CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS toks
              FROM documents),
            cum AS (
              SELECT *, SUM(toks) OVER (ORDER BY n_chars DESC, doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
              FROM d)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(toks) AS BIGINT) AS tokens,
                   CAST(MIN(n_chars) AS BIGINT) AS min_chars
            FROM cum WHERE c <= 20000 GROUP BY lang ORDER BY lang"""))

  /** HTML boilerplate stripping: documents wrapped in deterministic HTML
    * (style/script blocks with `<`-bearing code, attributes, entities,
    * `&nbsp;` separators on every 7th doc, an entity-laden div on every
    * 3rd), stripped by the chained-regex operator. The oracle derives each
    * CLEANED string independently from the raw text (never replaying the
    * regexes) and compares md5 — an end-to-end mapping check. */
  val q160_html_strip = Q(
    "q160_html_strip",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val html = d.withColumn("html", concat(
        lit("<html><head><style>p { color: red; }</style></head><body>"),
        lit("<script type=\"text/javascript\">var x = 1 < 2;</script>"),
        lit("<p class=\"main\">"),
        when(col("doc_id") % 7 === 0, regexp_replace(col("text"), " ", "&nbsp;"))
          .otherwise(col("text")),
        lit("</p>"),
        when(col("doc_id") % 3 === 0,
          lit("<div>&quot;quoted&quot; &amp;amp; more</div>")).otherwise(lit("")),
        lit("</body></html>")))
      html
        .withColumn("clean", TextFunctions.stripHtml(col("html")))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("long").as("clean_len"))
        .orderBy("doc_id")
    },
    Some("""WITH expected AS (
              SELECT doc_id::BIGINT AS doc_id,
                trim(regexp_replace(text, '\s+', ' ', 'g'))
                  || (CASE WHEN doc_id % 3 = 0 THEN ' "quoted" &amp; more' ELSE '' END)
                  AS clean
              FROM documents)
            SELECT doc_id, md5(clean) AS clean_md5,
                   CAST(length(clean) AS BIGINT) AS clean_len
            FROM expected ORDER BY doc_id"""))

  /** Link-graph extraction from HTML: hrefs pulled from constructed pages
    * (mixed quote styles, messy case/www/ports/tracking params),
    * canonicalized, reduced to host-level in-degree + distinct-URL counts
    * — the crawl-frontier statistics pass. The oracle derives hosts and
    * canonical urls independently from the doc_id arithmetic. */
  val q161_link_extract = Q(
    "q161_link_extract",
    (s, dir) => {
      import graft.text.UrlOps
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val html = d.select(col("doc_id"), concat(
        lit("<p>"), col("text"), lit("</p><a href=\"HTTP://WWW.Site"),
        (col("doc_id") % 40).cast("string"),
        lit(".COM/Page/"), (col("doc_id") % 25).cast("string"),
        lit("?utm_source=x\">link</a>"),
        when(col("doc_id") % 2 === 0, concat(
          lit("<a class='x' href='https://Other"), (col("doc_id") % 10).cast("string"),
          lit(".org/a/'>o</a>"))).otherwise(lit(""))).as("html"))
      // materialize the extracted array, THEN explode(array_compact(...)):
      // the explode-trap rule — pushdown must not inline the regex twice
      html
        .select(col("doc_id"), UrlOps.extractLinks(col("html")).as("links"))
        .select(explode(array_compact(col("links"))).as("url"))
        .select(UrlOps.canonicalize(col("url")).as("canon"))
        .select(UrlOps.host(col("canon")).as("host"), col("canon"))
        .groupBy(col("host"))
        .agg(
          count(lit(1)).cast("long").as("n_links"),
          count_distinct(col("canon")).cast("long").as("n_urls"))
        .orderBy("host")
    },
    Some("""WITH links AS (
              SELECT 'site' || CAST(doc_id % 40 AS VARCHAR) || '.com' AS host,
                     'http://site' || CAST(doc_id % 40 AS VARCHAR) || '.com/Page/'
                       || CAST(doc_id % 25 AS VARCHAR) AS canon
              FROM documents
              UNION ALL
              SELECT 'other' || CAST(doc_id % 10 AS VARCHAR) || '.org',
                     'https://other' || CAST(doc_id % 10 AS VARCHAR) || '.org/a'
              FROM documents WHERE doc_id % 2 = 0)
            SELECT host, CAST(COUNT(*) AS BIGINT) AS n_links,
                   CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_urls
            FROM links GROUP BY 1 ORDER BY 1"""))

  /** Robust trimmed aggregation: per event type, the 10%-trimmed mean of
    * integer cents (drop floor(n/10) rows from each end by value) — the
    * outlier-immune counterpart of q99's MAD detector. Exact BIGINT
    * boundary arithmetic; mean is one exact-int / exact-int division. */
  val q162_trimmed_agg = Q(
    "q162_trimmed_agg",
    (s, dir) => {
      val e = t(s, dir, "events").select(
        col("event_type"), col("event_id").cast("long").as("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      graft.operators.Aggregation.trimmedStats(
          e, Seq("event_type"), "cents", trimPercent = 10, tieBreak = col("event_id"))
        .select(col("event_type"), col("n"), col("n_kept"),
          col("trimmed_sum"), col("kept_min"), col("kept_max"), col("trimmed_mean"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT event_type, event_id::BIGINT AS event_id,
                     CAST(FLOOR(value * 100) AS BIGINT) AS cents
              FROM events),
            ranked AS (
              SELECT event_type, cents,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents ASC, event_id ASC) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM e),
            kept AS (
              SELECT * FROM ranked
              WHERE rn > (n * 10) // 100 AND rn <= n - (n * 10) // 100)
            SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(cents) AS BIGINT) AS trimmed_sum,
                   CAST(MIN(cents) AS BIGINT) AS kept_min,
                   CAST(MAX(cents) AS BIGINT) AS kept_max,
                   CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS trimmed_mean
            FROM kept GROUP BY event_type ORDER BY event_type"""))

  /** k-anonymity release gate: quasi-identifier groups (age bucket ×
    * region × event type) below k=5 are suppressed; the audit reports
    * group counts and l-diversity of a sensitive column per event type —
    * the release-readiness numbers a data steward actually reads. Pure
    * integer counting on both engines. */
  val q163_k_anonymity = Q(
    "q163_k_anonymity",
    (s, dir) => {
      import graft.operators.Privacy
      val e = t(s, dir, "events").select(
        col("event_type"),
        (col("user_id") % 23).cast("long").as("age_bucket"),
        (col("user_id") % 7).cast("long").as("region"),
        (floor(col("value")).cast("long") % 10).as("sensitive"))
      val quasi = Seq("event_type", "age_bucket", "region")
      val report = Privacy.kAnonymityReport(e, quasi, "sensitive", k = 5L)
      val keptRows = Privacy.kAnonymitySuppress(e, quasi, k = 5L)
        .groupBy(col("event_type")).agg(count(lit(1)).cast("long").as("rows_kept"))
      report
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n_groups"),
          sum(when(col("suppressed"), 1L).otherwise(0L)).cast("long").as("n_suppressed"),
          min(when(!col("suppressed"), col("l_diversity"))).cast("long").as("min_l_kept"))
        // LEFT join: an event_type whose every quasi-group is suppressed has
        // no kept rows at all — it must still report, with rows_kept = 0
        .join(keptRows, Seq("event_type"), "left")
        .withColumn("rows_kept", coalesce(col("rows_kept"), lit(0L)))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT event_type,
                     CAST(user_id % 23 AS BIGINT) AS age_bucket,
                     CAST(user_id % 7 AS BIGINT) AS region,
                     CAST(FLOOR(value) AS BIGINT) % 10 AS sensitive
              FROM events),
            g AS (
              SELECT event_type, age_bucket, region,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l
              FROM e GROUP BY 1, 2, 3)
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
                   CAST(MIN(CASE WHEN n >= 5 THEN l END) AS BIGINT) AS min_l_kept,
                   CAST(SUM(CASE WHEN n >= 5 THEN n ELSE 0 END) AS BIGINT) AS rows_kept
            FROM g GROUP BY event_type ORDER BY event_type"""))

  /** Ingest-volume anomaly monitor: per event type and day, flag days
    * whose count drops below half the trailing-7-day EXACT median. A
    * synthetic outage (80% of events dropped on days ≡ 3 mod 11) gives
    * the detector real positives; cold-start days (< 3 prior) never
    * flag. The trailing median is a sorted bounded list — BIGINT
    * arithmetic both engines replay exactly. */
  val q164_volume_anomaly = Q(
    "q164_volume_anomaly",
    (s, dir) => {
      val base = t(s, dir, "events").select(
        col("event_type"), col("event_id").cast("long").as("event_id"),
        unix_date(to_date(col("ts"))).cast("long").as("day"))
      val filt = base.filter(!(col("day") % 11 === 3 && col("event_id") % 5 =!= 0))
      val counts = filt.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      graft.operators.Outliers.volumeAnomalies(
          counts, Seq("event_type"), "day", "cnt",
          windowDays = 7, dropNum = 1, dropDen = 2, minPrior = 3)
        .select(col("event_type"), col("day"), col("cnt"),
          col("n_prior"), col("trailing_median"), col("is_anomaly"))
        .orderBy("event_type", "day")
    },
    Some("""WITH base AS (
              SELECT event_type, event_id::BIGINT AS event_id,
                     CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
              FROM events),
            filt AS (SELECT * FROM base WHERE NOT (day % 11 = 3 AND event_id % 5 <> 0)),
            c AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS cnt FROM filt GROUP BY 1, 2),
            h AS (
              SELECT event_type, day, cnt,
                -- an empty frame yields NULL in DuckDB, not [] — coalesce
                list_sort(COALESCE(list(cnt) OVER (PARTITION BY event_type ORDER BY day
                  RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), CAST([] AS BIGINT[]))) AS hist
              FROM c)
            SELECT event_type, day, cnt,
                   CAST(len(hist) AS BIGINT) AS n_prior,
                   CAST(CASE WHEN len(hist) > 0 THEN hist[(len(hist) + 1) // 2] END AS BIGINT) AS trailing_median,
                   (len(hist) >= 3 AND cnt * 2 < hist[(len(hist) + 1) // 2]) AS is_anomaly
            FROM h ORDER BY event_type, day"""))

  /** Embedding-corpus QA audit before ANN indexing: per label, counts,
    * dimension drift bounds, zero vectors (synthesized on every 97th id —
    * the detector must have positives), and integer-quantized squared-norm
    * stats (BIGINT sums — row-order-proof, unlike double sums). */
  val q165_embedding_audit = Q(
    "q165_embedding_audit",
    (s, dir) => {
      val emb = t(s, dir, "embeddings").select(
        col("label").cast("long").as("label"),
        when(col("vec_id") % 97 === 0,
          transform(col("embedding"), _ => lit(0.0)))
          .otherwise(transform(col("embedding"), x => x.cast("double")))
          .as("embedding"))
      Similarity.embeddingAudit(emb, Seq("label"), "embedding", scale = 1000L)
        .orderBy("label")
    },
    Some("""WITH e AS (
              SELECT label::BIGINT AS label,
                CASE WHEN vec_id % 97 = 0
                     THEN list_transform(embedding, x -> CAST(0.0 AS DOUBLE))
                     ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS v
              FROM embeddings),
            q AS (
              SELECT label, CAST(len(v) AS BIGINT) AS dim,
                     CAST(FLOOR(list_dot_product(v, v) * 1000) AS BIGINT) AS qn
              FROM e)
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   MIN(dim) AS dim_min, MAX(dim) AS dim_max,
                   CAST(SUM(CASE WHEN qn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
                   CAST(SUM(qn) AS BIGINT) AS sum_q_normsq,
                   MIN(qn) AS min_q_normsq, MAX(qn) AS max_q_normsq
            FROM q GROUP BY label ORDER BY label"""))

  /** Code-switching detection: every third document gets a French-stopword
    * sentence appended — invisible to the document-level argmax (q30,
    * English dominates globally) but caught by segment-level language ID
    * over 12-token windows. The oracle replays the same per-segment
    * stopword fold from the same profiles, generated like q30's. */
  val q166_code_switch = Q(
    "q166_code_switch",
    (s, dir) => {
      val french = " le la de et les des un est dans que le la"
      val d = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, french).otherwise("")).as("text2"))
      val stats = TextFunctions.codeSwitchStats(d, "doc_id", "text2", segTokens = 12)
      stats
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("is_code_switched"), 1L).otherwise(0L)).cast("long").as("n_switched"),
          sum(col("n_segments")).cast("long").as("n_segments"))
        .orderBy("source")
    },
    Some {
      val profiles = TextFunctions.languageProfiles.toSeq.sortBy(_._1)
      val scoreDefs = profiles.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        s"len(list_intersect(sd, [$list])) AS s_$lang"
      }.mkString(", ")
      val fold = profiles.foldLeft(("'und'", "0")) { case ((bl, bs), (lang, _)) =>
        (s"(CASE WHEN s_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"(CASE WHEN s_$lang > $bs THEN s_$lang ELSE $bs END)")
      }._1
      s"""WITH d AS (
            SELECT doc_id::BIGINT AS doc_id, source,
              text || (CASE WHEN doc_id % 3 = 0 THEN ' le la de et les des un est dans que le la' ELSE '' END) AS text2
            FROM documents),
          t AS (
            SELECT doc_id, source,
              list_filter(regexp_split_to_array(trim(lower(text2)), '\\s+'), x -> len(x) > 0) AS toks
            FROM d),
          seg AS (
            SELECT doc_id, source, list_distinct(toks[(i*12+1):(i*12+12)]) AS sd
            FROM t, UNNEST(range((len(toks) + 11) // 12)) AS u(i)),
          lang AS (SELECT doc_id, source, $fold AS lang FROM (SELECT doc_id, source, $scoreDefs FROM seg)),
          agg AS (
            SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_seg,
              COUNT(DISTINCT CASE WHEN lang <> 'und' THEN lang END) AS n_langs
            FROM lang GROUP BY 1, 2)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_switched,
                 CAST(SUM(n_seg) AS BIGINT) AS n_segments
          FROM agg GROUP BY 1 ORDER BY 1"""
    })

  /** Chat-template flattening: synthesized 3-turn JSON conversations
    * (user/assistant/user over token slices) rendered to training text
    * with turn stats — the fine-tuning prep step before sequence packing.
    * The oracle derives the EXPECTED rendered strings independently from
    * the token arithmetic (never parsing JSON). */
  val q167_chat_flatten = Q(
    "q167_chat_flatten",
    (s, dir) => {
      import graft.functions.SemiStructured
      val d = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))
      val toks = split(trim(col("text")), "\\s+")
      def seg(from: Int) = array_join(slice(toks, from, 8), " ")
      val convo = d.withColumn("convo_json", to_json(array(
        struct(lit("user").as("role"), seg(1).as("content")),
        struct(lit("assistant").as("role"), seg(9).as("content")),
        struct(lit("user").as("role"), seg(17).as("content")))))
      SemiStructured.flattenChat(convo, "convo_json")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(length(col("chat_text"))).cast("long").as("chars"),
          sum(col("n_turns")).cast("long").as("turns"),
          sum(col("n_user_turns")).cast("long").as("user_turns"),
          count_distinct(col("chat_text")).cast("long").as("distinct_chats"))
        .orderBy("source")
    },
    Some("""WITH d AS (
              SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents),
            r AS (
              SELECT source,
                -- a slice starting past the end is NULL in DuckDB (Spark:
                -- empty) — coalesce each segment to ''
                '### user:' || chr(10) || COALESCE(array_to_string(toks[1:8], ' '), '')
                || chr(10) || '### assistant:' || chr(10) || COALESCE(array_to_string(toks[9:16], ' '), '')
                || chr(10) || '### user:' || chr(10) || COALESCE(array_to_string(toks[17:24], ' '), '')
                AS chat_text
              FROM d)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length(chat_text)) AS BIGINT) AS chars,
                   CAST(COUNT(*) * 3 AS BIGINT) AS turns,
                   CAST(COUNT(*) * 2 AS BIGINT) AS user_turns,
                   CAST(COUNT(DISTINCT chat_text) AS BIGINT) AS distinct_chats
            FROM r GROUP BY 1 ORDER BY 1"""))

  /** k-core extraction (graph breadth): the 4-core of the co-supplier
    * graph (suppliers sharing >= 5 orders) by iterative peeling — the
    * dense-community extraction a spam-ring or co-citation audit runs.
    * The peeling fixed point is unique, so Spark (loop-until-stable with
    * per-round checkpoints) and the oracle (a generated 16-stage peel
    * chain — extra stages past convergence are no-ops) agree exactly;
    * Spark THROWS rather than return a non-fixed-point if 16 rounds ever
    * stop sufficing. */
  val q168_kcore = Q(
    "q168_kcore",
    (s, dir) => {
      val os = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .distinct()
      val a = os.select(col("l_orderkey"), col("l_suppkey").as("sa"))
      val b = os.select(col("l_orderkey"), col("l_suppkey").as("sb"))
      val edges = a
        .join(b, Seq("l_orderkey"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 5)
        .select(col("sa").as("src"), col("sb").as("dst"))
      graft.operators.Graph.kCore(edges, k = 4, maxRounds = 16)
        .select(col("node").cast("long").as("node"), col("deg").cast("long").as("deg"))
        .orderBy("node")
    },
    Some {
      // each round references the previous one several times — MATERIALIZED
      // keeps DuckDB's CTE inlining from expanding the chain exponentially
      val rounds = (1 to 16).map { i =>
        val prev = s"r${i - 1}"
        s"""k$i AS MATERIALIZED (
                    SELECT node FROM (SELECT u AS node FROM $prev UNION ALL SELECT v FROM $prev)
                    GROUP BY node HAVING COUNT(*) >= 4),
            r$i AS MATERIALIZED (
                    SELECT u, v FROM $prev
                    WHERE u IN (SELECT node FROM k$i) AND v IN (SELECT node FROM k$i))"""
      }.mkString(",\n          ")
      s"""WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
          e0 AS (SELECT a.l_suppkey AS sa, b.l_suppkey AS sb, COUNT(*) AS w
                 FROM os a JOIN os b
                   ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
                 GROUP BY 1, 2),
          r0 AS MATERIALIZED (SELECT sa AS u, sb AS v FROM e0 WHERE w >= 5),
          $rounds
          SELECT CAST(node AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS deg
          FROM (SELECT u AS node FROM r16 UNION ALL SELECT v FROM r16)
          GROUP BY node ORDER BY node"""
    })

  /** Deterministic random walks (graph breadth / node2vec-style positive
    * sampling): 4 hops from every node of the order-derived customer
    * graph, next hop = integer-mix argmin over out-neighbors — the PRNG
    * replaced by arithmetic both engines compute bit-identically. Output
    * is per-node visit counts (start position included); the oracle
    * replays all 4 steps as generated CTE stages with a (mix, dst)
    * row_number argmin. */
  val q169_walks = Q(
    "q169_walks",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val edges = o.select(
        col("o_custkey").cast("long").as("src"),
        (col("o_orderkey") % 1500).cast("long").as("dst")).distinct()
      graft.operators.Graph.deterministicWalkVisits(edges, steps = 4)
        .select(col("node").cast("long").as("node"), col("visits").cast("long").as("visits"))
        .orderBy("node")
    },
    Some {
      val steps = (1 to 4).map { i =>
        val prev = s"f${i - 1}"
        s"""f$i AS (
              SELECT start, cand AS cur FROM (
                SELECT f.start, e.dst AS cand,
                       ((f.cur % 2147483647) * 1048573 + $i * 8191
                        + (e.dst % 2147483647) * 524287) % 2147483647 AS mix,
                       ROW_NUMBER() OVER (PARTITION BY f.start
                                          ORDER BY ((f.cur % 2147483647) * 1048573 + $i * 8191
                                                    + (e.dst % 2147483647) * 524287) % 2147483647,
                                                   e.dst) AS rn
                FROM $prev f JOIN e ON f.cur = e.src)
              WHERE rn = 1)"""
      }.mkString(",\n          ")
      s"""WITH e AS (
            SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                   CAST(o_orderkey % 1500 AS BIGINT) AS dst
            FROM orders),
          nodes AS (SELECT DISTINCT node
                    FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
          f0 AS (SELECT node AS start, node AS cur FROM nodes),
          $steps,
          vis AS (SELECT cur FROM f0 UNION ALL SELECT cur FROM f1 UNION ALL
                  SELECT cur FROM f2 UNION ALL SELECT cur FROM f3 UNION ALL
                  SELECT cur FROM f4)
          SELECT CAST(cur AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS visits
          FROM vis GROUP BY 1 ORDER BY 1"""
    })

  /** Preference-cycle audit (RLHF data QA): pairwise preference edges
    * (the earlier line in an order "beats" the next, items = part buckets)
    * checked for intransitive triads — a directed 3-cycle means the
    * judgments cannot come from any consistent ranking. Cycles are counted
    * once each via [[graft.operators.Graph.directedTriangleCycles]]'s
    * (degree, id)-oriented wedge enumeration — hub-safe: a judge/item
    * compared against everything expands O(√m)-bounded oriented wedges,
    * not in-deg×out-deg candidates. The oracle runs the naive 3-way join,
    * which only survives because the oracle's graph is small. */
  val q170_pref_cycles = Q(
    "q170_pref_cycles",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 300).cast("long").as("item"))
      // NOTE (r18 opt): a lead()-window rewrite of this self-join is NOT
      // equivalent here — (l_orderkey, l_linenumber) is not unique in the
      // synthetic lineitem (11,785 dup pairs at sf0.01), and the join's
      // semantics are the full cross product of linenumber n x n+1 rows
      // (measured: the window spelling fails the oracle hash). Kept the
      // join; the win that IS safe: the edge set feeds TWO consumers (the
      // census and the cycle pipeline) and before r18 both re-derived it
      // from lineitem — checkpoint the distinct set once (guide §2.4).
      val a = li.select(
        col("l_orderkey").as("o2"), col("l_linenumber").as("nxt"),
        col("item").as("w_item"))
      val edges = li
        .join(a, col("l_orderkey") === col("o2") && col("nxt") === col("l_linenumber") + 1)
        .filter(col("item") =!= col("w_item"))
        .select(col("item").as("src"), col("w_item").as("dst"))
        .distinct().localCheckpoint(true)
      edges
        .agg(count(lit(1)).cast("long").as("n_edges"))
        .crossJoin(graft.operators.Graph.directedTriangleCycles(edges))
    },
    Some("""WITH li AS (SELECT l_orderkey, l_linenumber,
                               CAST(l_partkey % 300 AS BIGINT) AS item
                        FROM lineitem),
            e AS (SELECT DISTINCT a.item AS src, b.item AS dst
                  FROM li a JOIN li b
                    ON a.l_orderkey = b.l_orderkey
                   AND b.l_linenumber = a.l_linenumber + 1
                  WHERE a.item != b.item)
            SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
                   CAST((SELECT COUNT(*)
                         FROM e e1
                         JOIN e e2 ON e2.src = e1.dst
                                  AND e1.src < e1.dst AND e1.src < e2.dst
                         JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src)
                        AS BIGINT) AS cycles"""))

  /** First-order event transition matrix (clickstream analytics): per
    * user, consecutive event pairs under a TOTAL order (ts, event_id —
    * duplicate timestamps exist, so the tie column is what makes the pair
    * multiset deterministic), aggregated to counts + fixed-point
    * transition probabilities. One user-keyed window shuffle; the per-prev
    * totals re-aggregate the pair counts, never the raw events. */
  val q171_transitions = Q(
    "q171_transitions",
    (s, dir) => {
      import graft.operators.EventAnalytics
      EventAnalytics.transitionMatrix(
          t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")
        .select(
          col("prev_type"), col("cur_type"),
          col("n").cast("long").as("n"),
          col("prob_ppm").cast("long").as("prob_ppm"))
        .orderBy("prev_type", "cur_type")
    },
    Some("""WITH ev AS (
              SELECT user_id, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM events),
            p AS (SELECT prev AS prev_type, event_type AS cur_type,
                         COUNT(*) AS n
                  FROM ev WHERE prev IS NOT NULL GROUP BY 1, 2)
            SELECT prev_type, cur_type, CAST(n AS BIGINT) AS n,
                   CAST((1000000 * n) // SUM(n) OVER (PARTITION BY prev_type)
                        AS BIGINT) AS prob_ppm
            FROM p ORDER BY 1, 2"""))

  /** Seasonal-naive ingest forecast monitor: per event type, daily counts
    * over a DENSE date spine (gap days score as 0 — a silent feed is
    * maximal error, not a missing row), forecast(d) = actual(d-7), scored
    * as integer MAE ppm. The raw volume reduces to (key, day) counts
    * before any window runs — the spine/lag/scoring plan never touches
    * event-sized data. */
  val q172_seasonal_naive = Q(
    "q172_seasonal_naive",
    (s, dir) => {
      import graft.operators.EventAnalytics
      EventAnalytics.seasonalNaiveError(t(s, dir, "events"), "event_type", "ts", period = 7)
        .select(
          col("key").as("event_type"),
          col("days_scored").cast("long").as("days_scored"),
          col("total_actual").cast("long").as("total_actual"),
          col("total_abs_err").cast("long").as("total_abs_err"),
          col("mae_ppm").cast("long").as("mae_ppm"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (
              SELECT event_type AS key, CAST(ts AS DATE) AS day, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
            spine AS (
              SELECT k.key, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY))::DATE AS day
              FROM (SELECT DISTINCT key FROM daily) k, bounds b),
            dense AS (
              SELECT s.key, s.day, COALESCE(d.n, 0) AS actual
              FROM spine s LEFT JOIN daily d ON s.key = d.key AND s.day = d.day),
            scored AS (
              SELECT key, actual,
                     LAG(actual, 7) OVER (PARTITION BY key ORDER BY day) AS fc
              FROM dense)
            SELECT key AS event_type,
                   CAST(COUNT(*) AS BIGINT) AS days_scored,
                   CAST(SUM(actual) AS BIGINT) AS total_actual,
                   CAST(SUM(ABS(actual - fc)) AS BIGINT) AS total_abs_err,
                   CAST(CASE WHEN SUM(actual) > 0
                             THEN (1000000 * SUM(ABS(actual - fc))) // SUM(actual)
                        END AS BIGINT) AS mae_ppm
            FROM scored WHERE fc IS NOT NULL
            GROUP BY 1 ORDER BY 1"""))

  /** Corpus n-gram novelty (boilerplate/template detector): per doc, the
    * fraction of its distinct 3-grams appearing in NO other document, as
    * integer ppm. Spark counts document frequency over 8-byte hashed grams
    * with a COUNT window on the gram key (one shuffle, no join); the
    * oracle replays with raw gram STRINGS as keys — identical grouping
    * absent a 64-bit collision (the q87 convention). Per-source rollup
    * keeps the output compact while pinning every doc's score (sums over
    * exact integers). */
  val q173_novelty = Q(
    "q173_novelty",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"),
        col("source"), col("text"))
      Dedup.corpusNoveltyScores(d, "doc_id", "text", shingleSize = 3)
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("total_grams")).cast("long").as("grams"),
          sum(col("unique_grams")).cast("long").as("unique_grams"),
          sum(col("novelty_ppm")).cast("long").as("ppm_sum"),
          min(col("novelty_ppm")).cast("long").as("ppm_min"))
        .orderBy("source")
    },
    Some {
      import graft.tools.OracleSql._
      s"""WITH d AS (
            SELECT doc_id::BIGINT AS doc_id, source,
                   list_filter(regexp_split_to_array(${normalizeSql("text")}, '\\s+'),
                               x -> len(x) > 0) AS toks
            FROM documents),
          sh AS (
            SELECT doc_id, source,
                   list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(1, len(toks) - 1),
                                         i -> array_to_string(toks[i:i+2], ' ')) END) AS grams
            FROM d),
          ex AS (SELECT doc_id, source, unnest(grams) AS g FROM sh),
          dfc AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY 1),
          scored AS (
            SELECT e.doc_id, e.source, COUNT(*) AS total_grams,
                   SUM(CASE WHEN c.df = 1 THEN 1 ELSE 0 END) AS unique_grams
            FROM ex e JOIN dfc c USING (g) GROUP BY 1, 2)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(total_grams) AS BIGINT) AS grams,
                 CAST(SUM(unique_grams) AS BIGINT) AS unique_grams,
                 CAST(SUM((1000000 * unique_grams) // total_grams) AS BIGINT) AS ppm_sum,
                 CAST(MIN((1000000 * unique_grams) // total_grams) AS BIGINT) AS ppm_min
          FROM scored GROUP BY 1 ORDER BY 1"""
    })

  /** Two-stage domain quality gate (RefinedWeb/CCNet shape): domains are
    * admitted on aggregate evidence (≥ 10 docs AND 2×median(n_chars) ≥
    * 500), then docs within admitted domains must clear their own
    * domain's median. med2 = 2×median keeps the even-count interpolated
    * median integer-exact on both engines. */
  val q174_domain_gate = Q(
    "q174_domain_gate",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling.domainMedianGate(d, "source", "n_chars", minDocs = 10L, minMedian2 = 500L)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_kept"),
          max(col("n_docs")).cast("long").as("n_docs"),
          max(col("med2")).cast("long").as("med2"),
          sum(col("n_chars")).cast("long").as("kept_chars"))
        .orderBy("source")
    },
    Some("""WITH stats AS (
              SELECT source, COUNT(*) AS n_docs,
                     CAST(2 * median(n_chars) AS BIGINT) AS med2
              FROM documents GROUP BY 1),
            ok AS (SELECT * FROM stats WHERE n_docs >= 10 AND med2 >= 500)
            SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(MAX(o.n_docs) AS BIGINT) AS n_docs,
                   CAST(MAX(o.med2) AS BIGINT) AS med2,
                   CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
            FROM documents d JOIN ok o USING (source)
            WHERE 2 * d.n_chars >= o.med2
            GROUP BY 1 ORDER BY 1"""))

  val all: Seq[Q] = Seq(
    q146_rate_limit, q147_pseudonymize, q148_chunking, q149_variant_shred,
    q150_url_dedup, q151_tfidf_topk, q152_collocations, q153_quantile_sketch,
    q154_stream_join, q155_containment, q156_hard_negatives, q157_stream_neardup,
    q158_hybrid_rrf, q159_budget_fill, q160_html_strip, q161_link_extract,
    q162_trimmed_agg, q163_k_anonymity, q164_volume_anomaly, q165_embedding_audit,
    q166_code_switch, q167_chat_flatten, q168_kcore, q169_walks,
    q170_pref_cycles, q171_transitions, q172_seasonal_naive, q173_novelty,
    q174_domain_gate)
}
