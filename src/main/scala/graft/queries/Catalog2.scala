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

/** Catalog chunk q30-q58 (registration + docs in [[graft.Queries]]). */
private[graft] object Catalog2 {

  /** Language-ID heuristic: stopword-profile argmax (rows-only check — the
    * fold-based argmax is replicated in SQL generated from the same
    * profiles). */
  val q30_lang = Q(
    "q30_lang",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.withColumn("toks", array_distinct(TextFunctions.tokens(lower(col("text")))))
        .select(TextFunctions.languageIdFromTokens(col("toks")).as("lang_pred"))
        .groupBy("lang_pred")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("lang_pred")
    },
    Some {
      val profiles = TextFunctions.languageProfiles.toSeq.sortBy(_._1)
      val scoreDefs = profiles.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        s"len(list_intersect(toks, [$list])) AS s_$lang"
      }.mkString(", ")
      // replicate the fold: start (und,0); strictly-greater replaces
      val fold = profiles.foldLeft(("'und'", "0")) { case ((bl, bs), (lang, _)) =>
        (s"(CASE WHEN s_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"(CASE WHEN s_$lang > $bs THEN s_$lang ELSE $bs END)")
      }._1
      s"""SELECT $fold AS lang_pred, CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT $scoreDefs FROM (
            SELECT list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0)) AS toks
            FROM documents))
          GROUP BY 1 ORDER BY 1"""
    })

  /** SimHash near-dup pairs. The oracle replicates the engine-internal
    * xxhash64 bit-for-bit in pure DuckDB SQL (`tools.OracleSql`) and
    * replays the whole pipeline independently: per-token hash → 64 bit
    * votes → signature → rotate-and-block buckets → Hamming verify. */
  val q31_dedup_simhash = Q(
    "q31_dedup_simhash",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val clipped = d.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), lit(1), size(split(trim(col("text")), "\\s+")) - 1), " ")
          .as("text"))
      val corpus = d.unionByName(clipped)
      Dedup
        .simhashNearDuplicates(corpus, "doc_id", "text", maxDistance = 3)
        .select(
          col("id1").cast("long").as("id1"),
          col("id2").cast("long").as("id2"),
          col("distance").cast("long").as("distance"))
        .orderBy("id1", "id2")
    },
    Some {
      import graft.tools.OracleSql._
      val corpus =
        s"""SELECT doc_id::BIGINT AS doc_id, text FROM documents
            UNION ALL
            SELECT doc_id::BIGINT + 1000000 AS doc_id,
                   array_to_string(rt[1:len(rt)-1], ' ') AS text
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS rt FROM documents)"""
      val toks =
        s"""SELECT doc_id, tok FROM (
              SELECT doc_id, unnest(string_split(${normalizeSql("text")}, ' ')) AS tok
              FROM ($corpus)) WHERE len(tok) > 0"""
      val hashed = xxhash64Stages(toks, "tok", "th", pfx = "__t")
      val bitsums = (0 until 64)
        .map(j => s"SUM(CASE WHEN (hu >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
        .mkString(", ")
      val sigexpr = (0 until 64)
        .map(j => s"CASE WHEN b$j > 0 THEN ${java.lang.Long.toUnsignedString(1L << j)}::HUGEINT ELSE 0::HUGEINT END")
        .mkString(" + ")
      s"""WITH hashed AS (
            SELECT doc_id, CASE WHEN th < 0 THEN CAST(th::HUGEINT + 18446744073709551616::HUGEINT AS UBIGINT)
                                ELSE CAST(th AS UBIGINT) END AS hu
            FROM ($hashed)),
          bits AS (SELECT doc_id, $bitsums FROM hashed GROUP BY doc_id),
          sig AS (SELECT doc_id, CAST(($sigexpr) AS UBIGINT) AS sigu FROM bits),
          buckets AS (
            SELECT doc_id, sigu, bb.b AS blk, (sigu >> (16 * bb.b)) & 65535 AS key
            FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) bb(b))
          SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                 CAST(bit_count(xor(a.sigu, b.sigu)) AS BIGINT) AS distance
          FROM buckets a JOIN buckets b ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sigu, b.sigu)) <= 3
          ORDER BY id1, id2"""
    })

  /** IVF nearest neighbors through the k-means|| default seeding path.
    * Probes = cells makes the result EXACT for any centroid set (the
    * q57 trick), so the full kmeans|| → Lloyd → assign → probe pipeline
    * gets a real brute-force DuckDB oracle; the approximate low-probe
    * behavior stays covered by the recall spec (TextMlSpec). */
  val q32_ann_ivf = Q(
    "q32_ann_ivf",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val centroids = Similarity.kmeansCentroids(emb, numCentroids = 8, iterations = 3)
      val cells = Similarity.assignToCentroids(emb, centroids)
      val queries = emb.filter(col("vec_id") < 5)
      Similarity
        .ivfTopK(queries, cells, centroids, k = 5, probes = 8)
        .select(
          col("query_id").cast("long").as("query_id"),
          col("rank").cast("long").as("rank"),
          col("neighbor_id").cast("long").as("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q CROSS JOIN e c
              WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
              CAST(neighbor_id AS BIGINT) AS neighbor_id, ROUND(cos, 4) AS cosine
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Multimodal pipeline over REAL codecs: deterministic solid-gray
    * PNG/BMP/GIF images and silent WAVs (JDK ImageIO + javax.sound)
    * round-trip through header-dims decode, audio-duration decode and
    * block-luminance features. The oracle recomputes every aggregate
    * ANALYTICALLY from the generator's closed-form parameters — if any
    * codec mis-decodes dims, duration or pixel values, the hashes
    * diverge. Fixture values are dyadic (gray/256, frames/8192) so float
    * and double arithmetic agree exactly on both sides. */
  val q33_multimodal = Q(
    "q33_multimodal",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(s, 300)
      val withDims = Multimodal.decodeImageDims(media)
      val withAudio = Multimodal.decodeAudioSeconds(withDims)
      val withFeatures = Multimodal.extractFeatures(withAudio)
      withFeatures
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(avg(col("width")), 2).as("avg_width"),
          round(avg(aggregate(col("features"), lit(0.0), (acc, x) => acc + x)), 4).as("avg_feature_sum"),
          round(avg(col("audio_seconds")), 4).as("avg_audio_secs"))
        .orderBy("media_type")
    },
    Some("""WITH per AS (
              SELECT CASE WHEN range % 3 = 0 THEN 'image'
                          WHEN range % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
                     -- image dims/gray and wav frames replay syntheticMedia's formulas
                     CASE WHEN range % 3 = 0 THEN 8 + ((range // 3) % 5) * 4 ELSE 0 END AS width,
                     -- 16 block features of a solid-gray image each equal gray/256
                     CASE WHEN range % 3 = 0 THEN 16 * (((range * 7) % 256) / 256.0) ELSE 0.0 END AS fsum,
                     CASE WHEN range % 3 = 1 THEN (1 + (range % 5)) / 8.0 ELSE 0.0 END AS secs
              FROM range(300))
            SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(AVG(width), 2) AS avg_width,
                   ROUND(AVG(fsum), 4) AS avg_feature_sum,
                   ROUND(AVG(secs), 4) AS avg_audio_secs
            FROM per GROUP BY 1 ORDER BY 1"""))

  /** Document fingerprinting with an order-sensitive rolling hash: shows
    * reordered text fingerprints differently while the exact-normalized
    * fingerprint would not. Both hashes are oracle-checked: the DuckDB SQL
    * replays xxhash64 bit-for-bit (`tools.OracleSql`) for the content
    * fingerprint and per-token hashes, and rebuilds the positional
    * 31^i-weighted modular sum with a recursive power table. */
  val q34_fingerprint = Q(
    "q34_fingerprint",
    (s, dir) => {
      val d = t(s, dir, "documents")
      // fingerprint rides along as a group key so one explode+groupBy pass
      // computes both hashes (rollingHashByDoc = the codegen'd form)
      val base = d.select(
        col("doc_id").cast("long").as("doc_id"),
        col("text"),
        TextFunctions.fingerprint(col("text")).as("content_fp"))
      TextFunctions
        .rollingHashByDoc(base, Seq("doc_id", "content_fp"), "text", "rolling_fp")
        .orderBy("doc_id")
    },
    Some {
      import graft.tools.OracleSql._
      val base = s"SELECT doc_id::BIGINT AS doc_id, ${normalizeSql("text")} AS norm FROM documents"
      val fp = xxhash64Stages(base, "norm", "content_fp", pfx = "__f")
      val toks =
        s"""SELECT doc_id, tok, p FROM (
              SELECT doc_id, unnest(string_split(norm, ' ')) AS tok,
                     generate_subscripts(string_split(norm, ' '), 1) AS p
              FROM fpc) WHERE len(tok) > 0"""
      // hash DISTINCT tokens, join back (vocab << token stream — the
      // staged XXH64 expression is the oracle's dominant cost)
      val hashedD = xxhash64Stages("SELECT DISTINCT tok FROM tk", "tok", "th", pfx = "__t")
      s"""WITH RECURSIVE fpc AS ($fp),
          tk AS ($toks),
          hd AS ($hashedD),
          hashed AS (SELECT tk.doc_id, tk.p, hd.th FROM tk JOIN hd USING (tok)),
          pw(i, v) AS (
            SELECT 1, 1::BIGINT
            UNION ALL
            SELECT i + 1, (v * 31) % 2147483647 FROM pw
            WHERE i < (SELECT coalesce(max(p), 1) FROM hashed)),
          rolled AS (
            SELECT h.doc_id,
                   CAST(SUM((((h.th % 2147483647) + 2147483647) % 2147483647) * pw.v % 2147483647) % 2147483647 AS BIGINT) AS rolling_fp
            FROM hashed h JOIN pw ON pw.i = h.p
            GROUP BY h.doc_id)
          SELECT f.doc_id, f.content_fp, coalesce(r.rolling_fp, 0) AS rolling_fp
          FROM fpc f LEFT JOIN rolled r ON r.doc_id = f.doc_id
          ORDER BY f.doc_id"""
    })

  /** Index time → datetime (SURVEY §2.9): integer step index + per-row tz
    * → UTC instants. January only, so fixed offsets mirror cleanly in SQL. */
  val q35_index_time = Q(
    "q35_index_time",
    (s, dir) => {
      val sup = t(s, dir, "supplier")
        .select(
          col("s_suppkey"),
          (col("s_suppkey") % 24).cast("long").as("time_index"),
          when(col("s_nationkey") % 3 === 0, "America/New_York")
            .when(col("s_nationkey") % 3 === 1, "America/Denver")
            .otherwise("UTC").as(TimeZoneColumn))
      graft.time.IndexTime
        .indexToDatetime(sup, "time_index", "2024-01-01 00:00:00", 3600L)
        .select(
          col("s_suppkey").cast("long").as("s_suppkey"),
          unix_timestamp(col("timestamp")).as("epoch"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
            CAST(1704067200 + (s_suppkey % 24) * 3600 +
              CASE CAST(s_nationkey % 3 AS INT)
                WHEN 0 THEN 5 * 3600
                WHEN 1 THEN 7 * 3600
                ELSE 0 END AS BIGINT) AS epoch
            FROM supplier ORDER BY s_suppkey"""))

  /** Representative-period expansion (SURVEY §2.9): (month, day_of_week,
    * hour) template joined onto a January hourly spine. */
  val q36_rep_period = Q(
    "q36_rep_period",
    (s, dir) => {
      val template = s.createDataFrame(Seq(
        ("g1", 1, 0, 5, 10.0), // Mondays 05:00
        ("g1", 1, 5, 17, 20.0), // Saturdays 17:00
        ("g1", 1, 6, 0, 30.0))) // Sundays 00:00
        .toDF("geography", "month", "day_of_week", "hour", ValueColumn)
      val spine = graft.time.TimeSpine.spine(s, "2024-01-01 00:00:00", "2024-01-31 23:00:00", 3600L)
      val tzs = s.createDataFrame(Seq(("g1", "UTC"))).toDF("id", "time_zone")
      graft.time.RepresentativePeriodTime
        .oneWeekPerMonthByHour(template, spine, "geography", tzs)
        .select(
          col("geography"),
          unix_timestamp(col("timestamp")).as("epoch"),
          col(ValueColumn))
        .orderBy("epoch")
    },
    Some("""WITH spine AS (
              SELECT ts FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                TIMESTAMP '2024-01-31 23:00:00', INTERVAL 1 HOUR) AS g(ts)),
            template(geography, m, dow, h, value) AS (
              VALUES ('g1', 1, 0, 5, 10.0), ('g1', 1, 5, 17, 20.0), ('g1', 1, 6, 0, 30.0))
            SELECT geography, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch, value
            FROM spine JOIN template
              ON EXTRACT(month FROM ts) = m
             AND (CAST(EXTRACT(dow FROM ts) AS INT) + 6) % 7 = dow
             AND EXTRACT(hour FROM ts) = h
            ORDER BY epoch"""))

  /** Null-preserving unpivot (SURVEY §2.8): expected-missing rows carried as
    * all-null value columns come back as explicit null-value rows. */
  val q37_unpivot_nulls = Q(
    "q37_unpivot_nulls",
    (s, dir) => {
      val p = t(s, dir, "part")
      // engineer: every 5th part is an expected-missing (all-null) row
      val wide = p.select(
        col("p_partkey").cast("long").as("p_partkey"),
        when(col("p_partkey") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("p_retailprice")).as("m1"),
        when(col("p_partkey") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("p_size").cast("double")).as("m2"))
      Reshape
        .unpivotPreservingNulls(wide, Seq("p_partkey"), Seq("m1", "m2"), "attr")
        .orderBy("p_partkey", "attr")
    },
    Some("""SELECT p_partkey, attr, value FROM (
            SELECT CAST(p_partkey AS BIGINT) AS p_partkey, 'm1' AS attr,
              CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_retailprice END AS value
            FROM part
            UNION ALL
            SELECT CAST(p_partkey AS BIGINT), 'm2',
              CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE CAST(p_size AS DOUBLE) END
            FROM part)
            ORDER BY p_partkey, attr"""))

  /** Records-lookup join: ids → display names via broadcast records
    * (SURVEY §2.3 records-lookup; table_format_handler_base ids→names). */
  val q38_names = Q(
    "q38_names",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast("string").as("geography"), col("c_acctbal").as(ValueColumn))
      val records = t(s, dir, "nation")
        .select(col("n_nationkey").cast("string").as("id"), col("n_name").as("name"))
      MappingKernel
        .idsToNames(c, "geography", records)
        .groupBy("geography")
        .agg(round(sum(col(ValueColumn)), 2).as("total"), count(lit(1)).cast("long").as("n"))
        .orderBy("geography")
    },
    Some("""SELECT n_name AS geography, ROUND(SUM(c_acctbal), 2) AS total,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1 ORDER BY 1"""))

  /** Count-distinct per group (SURVEY §2.4). */
  val q39_count_distinct = Q(
    "q39_count_distinct",
    (s, dir) => {
      val e = t(s, dir, "events")
      Aggregation
        .aggregate(e, Seq("event_type"), "count_distinct", valueColumn = "user_id", as = Some("n_users"))
        .select(col("event_type"), col("n_users").cast("long").as("n_users"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** Quality features: punctuation ratio + mean word length (text analysis). */
  val q40_quality_features = Q(
    "q40_quality_features",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.withColumn("toks", TextFunctions.tokens(col("text")))
        .select(
          col("doc_id").cast("long").as("doc_id"),
          round(TextFunctions.punctuationRatio(col("text")), 4).as("punct_ratio"),
          round(TextFunctions.meanWordLengthFromTokens(col("toks")), 4).as("mean_word_len"))
        .orderBy("doc_id")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
            ROUND(CASE WHEN len(text) = 0 THEN 0.0
              ELSE CAST(len(text) - len(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE) / len(text) END, 4) AS punct_ratio,
            ROUND(CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) END, 4) AS mean_word_len
            FROM (SELECT doc_id, text,
              list_filter(regexp_split_to_array(trim(text), '\s+'), x -> len(x) > 0) AS toks
              FROM documents) ORDER BY doc_id"""))

  /** Distributed time-spine generation (SURVEY §2.9): a year's hourly spine
    * via sequence+explode, no driver loop. */
  val q41_spine = Q(
    "q41_spine",
    (s, dir) => {
      graft.time.TimeSpine
        .yearHourlySpine(s, 2024)
        .agg(
          count(lit(1)).cast("long").as("n"),
          min(unix_timestamp(col("timestamp"))).as("first_epoch"),
          max(unix_timestamp(col("timestamp"))).as("last_epoch"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(MIN(FLOOR(EPOCH(ts))) AS BIGINT) AS first_epoch,
            CAST(MAX(FLOOR(EPOCH(ts))) AS BIGINT) AS last_epoch
            FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
              TIMESTAMP '2024-12-31 23:00:00', INTERVAL 1 HOUR) AS g(ts)"""))

  /** Annual multiplier growth (SURVEY §2.10): value * r joined on dims. */
  val q42_annual_multiplier = Q(
    "q42_annual_multiplier",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice").as(ValueColumn))
      val mult = t(s, dir, "orders")
        .select("o_orderpriority").distinct()
        .withColumn(ValueColumn, lit(1.0) + (length(col("o_orderpriority")) % 3) * 0.25)
      Growth
        .applyAnnualMultiplier(o, mult, Seq("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col(ValueColumn)), 2).as("total"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
            ROUND(SUM(o_totalprice * (1.0 + (LENGTH(o_orderpriority) % 3) * 0.25)), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** CSV sink round-trip (SURVEY §2.1 sinks): write header CSV, read back
    * with schema (rows-only — exercises Writers.csv + Readers.csv). */
  val q43_csv_roundtrip = Q(
    "q43_csv_roundtrip",
    (s, dir) => {
      val agg = t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(round(sum(col("o_totalprice")), 2).as("total"))
      val out = s.conf.get("spark.local.dir", "/tmp") + "/graft_csv_roundtrip"
      graft.sources.Writers.csv(agg, out, singleFile = true)
      graft.sources.Readers
        .csv(s, out, Some(graft.core.FileSchema(Seq("o_orderpriority" -> "STRING", "total" -> "DOUBLE"))))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Full declarative pipeline (SURVEY §3): register a project (dataset +
    * mapping + dimension records) into a filesystem registry, then run a
    * ProjectQuery through the Submitter — mapping join, fraction collapse,
    * filter, aggregation, ids→names, sort. */
  val q44_project_query = Q(
    "q44_project_query",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val q = ProjectQuery(
        name = "regional_balances",
        datasets = DatasetSection(Seq(
          DatasetRef("accounts", Seq(DimensionMappingRef("geography", "nation_to_region"))))),
        result = ResultSection(
          filters = Seq(graft.operators.DimensionFilter.ColumnOperatorFilter(
            "sector", "isin", Seq("BUILDING", "MACHINERY", "AUTOMOBILE"))),
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography", "sector"))),
          idsToNames = Seq("sector"),
          sortBy = Seq("geography", "sector")))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(col("geography"), col("sector"), round(col(ValueColumn), 2).as(ValueColumn))
    },
    Some("""SELECT r_name AS geography, LOWER(c_mktsegment) AS sector,
            ROUND(SUM(c_acctbal), 2) AS value
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Two-table dataset layout (SURVEY §1.1/§2.3): load_data carries
    * (id, value); the broadcast lookup join attaches the dimensions. */
  val q45_two_table = Q(
    "q45_two_table",
    (s, dir) => {
      val loadData = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("id"), col("l_extendedprice").as(ValueColumn))
      val lookup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("id"), col("s_nationkey").cast("string").as("geography"))
      MappingKernel
        .joinLookup(loadData, lookup)
        .groupBy(col("geography"))
        .agg(round(sum(col(ValueColumn)), 2).as("total"), count(lit(1)).cast("long").as("n"))
        .select(col("geography").cast("long").as("geography"), col("total"), col("n"))
        .orderBy("geography")
    },
    Some("""SELECT CAST(s_nationkey AS BIGINT) AS geography,
            ROUND(SUM(l_extendedprice), 2) AS total, CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1 ORDER BY 1"""))

  /** Interval resampling with measurement-type semantics (SURVEY §2.9 /
    * chronify): events downsampled to daily buckets, TOTAL measurement. */
  val q46_resample = Q(
    "q46_resample",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.time.Resample
        .downsample(e, "ts", 86400L, "total", Seq("event_type"))
        .select(
          unix_timestamp(col("ts")).as("epoch"),
          col("event_type"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("epoch", "event_type")
    },
    Some("""SELECT CAST(FLOOR(EPOCH(ts) / 86400) * 86400 AS BIGINT) AS epoch, event_type,
            ROUND(SUM(value), 2) AS value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Per-dataset dimension filter, pushed below the mapping joins (SURVEY
    * §2.2 pre-filter; ref ProjectQueryDatasetParamsModel.dimension_filters):
    * the filter is expressed in project space (region names), translated
    * back through the mapping to nation keys, and pruned before mapping. */
  val q47_prefilter = Q(
    "q47_prefilter",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val q = ProjectQuery(
        name = "filtered_regional",
        datasets = DatasetSection(Seq(DatasetRef(
          "accounts",
          mappings = Seq(DimensionMappingRef("geography", "nation_to_region")),
          filters = Seq(DimensionFilter.ColumnOperatorFilter(
            "geography", "isin", Seq("EUROPE", "ASIA")))))),
        result = ResultSection(
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography"))),
          sortBy = Seq("geography")))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(col("geography"), round(col(ValueColumn), 2).as(ValueColumn))
    },
    Some("""SELECT r_name AS geography, ROUND(SUM(c_acctbal), 2) AS value
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name IN ('EUROPE', 'ASIA')
            GROUP BY 1 ORDER BY 1"""))

  /** `time_zone: "geography"` + a peak-load report through the declarative
    * result model (SURVEY §2.9/§2.11; ref models.py:530-535 +
    * report_peak_load.py): per-geography local-time conversion driven by the
    * geography dimension records, then the report picks each geography's
    * peak row. January data → fixed offsets, so DuckDB can replay. */
  val q48_geo_tz_report = Q(
    "q48_geo_tz_report",
    (s, dir) => {
      import graft.query.Models._
      val reg = meterRegistry(s, dir)
      val q = ProjectQuery(
        name = "geo_local_peaks",
        datasets = DatasetSection(Seq(DatasetRef("meter"))),
        result = ResultSection(
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography", "timestamp"))),
          timeZone = Some("geography"),
          reports = Seq(PeakLoadReport(groupBy = Seq("geography"), tieBreak = Seq("timestamp")))))
      val (_, reports) = new graft.query.Submitter(reg).submitWithReports(q)
      reports.head._2.select(
          col("geography"),
          unix_timestamp(col("timestamp")).as("local_epoch"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("geography")
    },
    Some("""WITH sums AS (
              SELECT 'g' || CAST(user_id % 3 AS VARCHAR) AS geography, ts,
                     SUM(value) AS value
              FROM events GROUP BY 1, 2
            ), conv AS (
              -- FLOOR before the cast: Spark's unix_timestamp truncates
              -- fractional seconds, DuckDB's CAST(double) rounds
              SELECT geography,
                     CAST(FLOOR(EPOCH(ts)) AS BIGINT) +
                       CASE geography WHEN 'g0' THEN -5*3600
                                      WHEN 'g1' THEN -7*3600 ELSE 0 END AS local_epoch,
                     value
              FROM sums
            )
            SELECT geography, local_epoch, ROUND(value, 2) AS value FROM conv
            QUALIFY ROW_NUMBER() OVER (PARTITION BY geography
                                       ORDER BY value DESC, local_epoch) = 1
            ORDER BY geography"""))

  /** QueryContext-style column naming (SURVEY §2.2/§3; ref
    * dataset_schema_handler_base.py:497-518): two datasets whose files
    * disagree on the geography column name are renamed per-dataset into one
    * project space and combined. */
  val q49_column_renames = Q(
    "q49_column_renames",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val q = ProjectQuery(
        name = "renamed_union",
        datasets = DatasetSection(Seq(
          DatasetRef("cust_bal", columnRenames = Seq("nation_code" -> "geography")),
          DatasetRef("supp_bal", columnRenames = Seq("geo_id" -> "geography")))),
        result = ResultSection(
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography")))))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(
          col("geography").cast("long").as("geography"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("geography")
    },
    Some("""SELECT CAST(geography AS BIGINT) AS geography, ROUND(SUM(value), 2) AS value
            FROM (
              SELECT CAST(c_nationkey AS VARCHAR) AS geography, c_acctbal AS value FROM customer
              UNION ALL
              SELECT CAST(s_nationkey AS VARCHAR), s_acctbal FROM supplier
            ) GROUP BY 1 ORDER BY 1"""))

  /** Subset-dimension filter (SURVEY §2.2; ref dimension_filters.py:232-276):
    * keep rows whose dimension value is in the union of record-id sets — a
    * broadcast semi-join, the scalable form of a giant IN list. */
  val q50_subset_filter = Q(
    "q50_subset_filter",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val ids = t(s, dir, "nation")
        .filter(col("n_nationkey") % 5 === 0)
        .select(col("n_nationkey").cast("string").as("id"))
      val q = DatasetQuery(
        name = "subset_geo",
        dataset = DatasetRef("accounts"),
        result = ResultSection(
          filters = Seq(DimensionFilter.SubsetFilter("geography", Seq(ids))),
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography")))))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(
          col("geography").cast("long").as("geography"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("geography")
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS geography, ROUND(SUM(c_acctbal), 2) AS value
            FROM customer WHERE c_nationkey % 5 = 0
            GROUP BY 1 ORDER BY 1"""))

  /** Supplemental-dimension filter (SURVEY §2.2; ref
    * dimension_filters.py:279-308): keep base records that map to a
    * supplemental dimension — semi-join against the mapping's from-side. */
  val q51_supplemental_filter = Q(
    "q51_supplemental_filter",
    (s, dir) => {
      import graft.query.Models._
      val reg = coreRegistry(s, dir)
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // base-to-supplemental mapping: nations in AMERICA map, others don't
      val mapping = n.join(r, n("n_regionkey") === r("r_regionkey")).select(
        col("n_nationkey").cast("string").as(FromIdColumn),
        when(col("r_name") === "AMERICA", col("r_name")).as(ToIdColumn))
      val q = DatasetQuery(
        name = "supplemental_geo",
        dataset = DatasetRef("accounts"),
        result = ResultSection(
          filters = Seq(DimensionFilter.SupplementalFilter("geography", mapping)),
          aggregations = Seq(graft.query.Models.Aggregation(groupBy = Seq("geography")))))
      new graft.query.Submitter(reg)
        .submit(q)
        .select(
          col("geography").cast("long").as("geography"),
          round(col(ValueColumn), 2).as(ValueColumn))
        .orderBy("geography")
    },
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS geography, ROUND(SUM(c_acctbal), 2) AS value
            FROM customer
            WHERE c_nationkey IN (
              SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'AMERICA')
            GROUP BY 1 ORDER BY 1"""))

  /** DST adjustments, all three modes (SURVEY §2.9; ref
    * dimension/time.py:143-187): fall-back duplicate (original value kept on
    * both? no — duplicate repeats the measured value), fall-back interpolate
    * (the ADDED row carries mean(prev, next)), spring-forward drop (the
    * nonexistent 02:30 local stamp is removed). Series built from the region
    * table: hour rk of the DST date, value rk²·10. */
  val q52_dst = Q(
    "q52_dst",
    (s, dir) => {
      val base = t(s, dir, "region").select(col("r_regionkey").cast("int").as("rk"))
      def series(start: String) = base.select(
        lit("g").as("g"),
        expr(s"timestampadd(HOUR, rk, TIMESTAMP'$start')").as("ts"),
        (col("rk") * col("rk") * lit(10.0)).as("value"),
        lit("America/New_York").as("tz"))
      val fall = series("2024-11-03 00:30:00")
      val spring = series("2024-03-10 00:30:00")
      val dup = TimeAdjustments.duplicateFallBackHour(fall, "ts", "tz")
        .withColumn("mode", lit("dup"))
      val interp = TimeAdjustments
        .interpolateFallBackHour(fall, "ts", "tz", "value", Seq("g"))
        .withColumn("mode", lit("interp"))
      val drop = TimeAdjustments.dropSpringForwardHour(spring, "ts", "tz")
        .withColumn("mode", lit("spring"))
      dup.unionByName(interp).unionByName(drop)
        .select(
          col("mode"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("value"))
        .orderBy("mode", "ts", "value")
    },
    Some("""WITH base AS (
              SELECT CAST(r_regionkey AS INT) AS rk,
                     TIMESTAMP '2024-11-03 00:30:00' + to_hours(CAST(r_regionkey AS BIGINT)) AS fts,
                     TIMESTAMP '2024-03-10 00:30:00' + to_hours(CAST(r_regionkey AS BIGINT)) AS sts,
                     CAST(r_regionkey * r_regionkey * 10 AS DOUBLE) AS value
              FROM region)
            SELECT 'dup' AS mode, strftime(fts, '%Y-%m-%d %H:%M:%S') AS ts, value FROM base
            UNION ALL SELECT 'dup', '2024-11-03 01:30:00', 10.0
            UNION ALL SELECT 'interp', strftime(fts, '%Y-%m-%d %H:%M:%S'), value FROM base
            UNION ALL SELECT 'interp', '2024-11-03 01:30:00', 20.0
            UNION ALL SELECT 'spring', strftime(sts, '%Y-%m-%d %H:%M:%S'), value FROM base WHERE rk <> 2
            ORDER BY mode, ts, value"""))

  /** Single-zone time conversion (SURVEY §2.9; ref models.py:530-535):
    * convert to one named zone's local clock, carry the tz column. January
    * data → fixed -7 offset for DuckDB. */
  val q53_single_tz = Q(
    "q53_single_tz",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.time.TimeZones.toSingleZone(e, "ts", "America/Denver")
        .groupBy(col(TimeZoneColumn), hour(col("ts")).cast("long").as("local_hour"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("local_hour")
    },
    Some("""SELECT 'America/Denver' AS time_zone,
            CAST((EXTRACT(hour FROM ts) + 24 - 7) % 24 AS BIGINT) AS local_hour,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2 ORDER BY 2"""))

  /** Auto-partitioned parquet sink round-trip (SURVEY §2.1; ref
    * dsgrid/utils/spark.py:530-630): write with the 128MB-target resize
    * algorithm (forced to engage via a 1MB target), re-read, aggregate. */
  val q54_autopartition = Q(
    "q54_autopartition",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val out = java.nio.file.Files.createTempDirectory("graft-q54").toString + "/li.parquet"
      graft.sources.Writers.parquetAutoPartition(
        s, li, out, targetMb = 1, minNumPartitions = 1)
      s.read.parquet(out)
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(l_quantity), 2) AS sum_qty,
            ROUND(SUM(l_extendedprice), 2) AS sum_price
            FROM lineitem"""))

  /** Warehouse/table sink round-trip (SURVEY §2.1; ref
    * dsgrid/utils/spark.py:675-733): saveAsTable + read back via the
    * catalog, then aggregate from the table. */
  val q55_warehouse = Q(
    "q55_warehouse",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val table = graft.sources.Writers.toTable(s, o, "graft_q55_orders")
      table.groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Bucketed-table co-located join (beyond-parity; SURVEY §2.1/§2.3): both
    * sides bucketed on the join key at write time, so the join itself runs
    * with zero exchanges — the write-once shuffle that makes repeated joins
    * cheap at 100 TB (IOSpec carries the shuffle-free plan contract). */
  val q56_bucketed_join = Q(
    "q56_bucketed_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_suppkey"), col("l_quantity"))
      val sup = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val bli = graft.sources.Writers.toBucketedTable(
        s, li, "graft_q56_lineitem", Seq("l_suppkey"), 8)
      val bsup = graft.sources.Writers.toBucketedTable(
        s, sup, "graft_q56_supplier", Seq("s_suppkey"), 8)
      bli.join(bsup, bli("l_suppkey") === bsup("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("total_qty"))
        .select(col("s_nationkey").cast("long").as("s_nationkey"), col("n"), col("total_qty"))
        .orderBy("s_nationkey")
    },
    Some("""SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
            CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(l_quantity), 2) AS total_qty
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1 ORDER BY 1"""))

  /** IVF with probes = cells is EXACT: probing every cell must reproduce the
    * brute-force top-k bit-for-bit — which gives the IVF join/rank path a
    * real DuckDB oracle (q32's default-probe variant stays rows-only because
    * centroid assignment isn't SQL-replicable, but this query checks the
    * same code path end-to-end). */
  val q57_ann_ivf_exhaustive = Q(
    "q57_ann_ivf_exhaustive",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val k = 8
      // cheap seeding on purpose: this query's oracle is INIT-INVARIANT
      // (probes = cells ≡ brute force for any centroid set), so it pins the
      // ivfTopK join/rank path itself; q32 exercises the k-means|| default
      val centroids = Similarity.kmeansCentroids(emb, numCentroids = k, iterations = 2, parallelInit = false)
      val cells = Similarity.assignToCentroids(emb, centroids)
      val queries = emb.filter(col("vec_id") < 5)
      Similarity
        .ivfTopK(queries, cells, centroids, k = 5, probes = k)
        .select(
          col("query_id").cast("long").as("query_id"),
          col("rank").cast("long").as("rank"),
          col("neighbor_id").cast("long").as("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
            scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              FROM e q CROSS JOIN e c
              WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
              CAST(neighbor_id AS BIGINT) AS neighbor_id, ROUND(cos, 4) AS cosine
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Gap-based sessionization of the events stream table (beyond-parity;
    * training pipelines sessionize before per-session quality filters):
    * 30-minute gap per user, then a histogram of sessions per user. Exact
    * integer-microsecond gap comparison on both sides. */
  val q58_sessions = Q(
    "q58_sessions",
    (s, dir) => {
      val e = t(s, dir, "events")
      graft.time.Sessionize
        .assignSessions(e, "ts", 1800L, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"))
        .groupBy(col("n_sessions").cast("long").as("n_sessions"))
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy("n_sessions")
    },
    Some("""WITH marked AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     -- half-open gap (>=), matching session_window semantics
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
                     THEN 1 ELSE 0 END AS is_start
              FROM events),
            per_user AS (
              SELECT user_id, CAST(SUM(is_start) AS BIGINT) AS n_sessions FROM marked GROUP BY user_id)
            SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM per_user GROUP BY 1 ORDER BY 1"""))

  val all: Seq[Q] = Seq(
    q30_lang, q31_dedup_simhash, q32_ann_ivf, q33_multimodal,
    q34_fingerprint, q35_index_time, q36_rep_period, q37_unpivot_nulls,
    q38_names, q39_count_distinct, q40_quality_features, q41_spine,
    q42_annual_multiplier, q43_csv_roundtrip, q44_project_query, q45_two_table,
    q46_resample, q47_prefilter, q48_geo_tz_report, q49_column_renames,
    q50_subset_filter, q51_supplemental_filter, q52_dst, q53_single_tz,
    q54_autopartition, q55_warehouse, q56_bucketed_join, q57_ann_ivf_exhaustive,
    q58_sessions)
}
