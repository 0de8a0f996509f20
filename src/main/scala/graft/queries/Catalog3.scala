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

/** Catalog chunk q59-q87 (registration + docs in [[graft.Queries]]). */
private[graft] object Catalog3 {

  /** Hive-partitioned time-series layout (SURVEY §2.1 sink family): events
    * written partitioned by day, re-read with a one-day predicate that
    * prunes directories (PartitionFilters, zero IO on other days), then
    * aggregated. The first-line data-skipping pattern for 100 TB
    * time-series. */
  val q59_partitioned_write = Q(
    "q59_partitioned_write",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      val out = java.nio.file.Files.createTempDirectory("graft-q59").toString + "/events"
      graft.sources.Writers.parquetPartitionedBy(e, out, Seq("event_date"), sortWithin = Seq("ts"))
      s.read.parquet(out)
        .filter(col("event_date") === "2024-01-15")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          round(sum(col("value")), 2).as("total"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            ROUND(SUM(value), 2) AS total
            FROM events
            WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15'
            GROUP BY 1 ORDER BY 1"""))

  /** End-to-end training-data pipeline (flagship composition): quality
    * filter (stopword ratio) → language filter (en) → exact dedup (keep
    * min-id per normalized content) → per-language corpus stats. Every
    * stage is an operator with its own green oracle (q25/q30/q26/q24);
    * this query checks their COMPOSITION against one SQL replay. */
  val q60_pipeline = Q(
    "q60_pipeline",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      // tokens materialized ONCE (HOF-lambda CSE rule), every feature reads
      // the column
      val base = d
        .withColumn("__toks", TextFunctions.tokens(lower(col("text"))))
        .withColumn("lang", TextFunctions.languageIdFromTokens(array_distinct(col("__toks"))))
        .withColumn("swr", TextFunctions.stopwordRatioFromTokens(col("__toks")))
        .withColumn("n_tokens", size(col("__toks")))
      val filtered = base.filter(col("lang") === "en" && col("swr") >= 0.05)
      // exact dedup WITHIN the filtered set: keep the min doc_id per
      // normalized content (same keep rule as Dedup.dropExactDuplicates,
      // md5 spelled out so the oracle can replay it)
      val w = Window.partitionBy(md5(TextFunctions.normalize(col("text"))))
      val deduped = filtered
        .withColumn("__keep", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("__keep"))
      deduped
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(avg(col("swr")), 4).as("avg_swr"))
    },
    Some {
      val stop = TextFunctions.englishStopwords.map(w => s"'$w'").mkString(", ")
      val profiles = TextFunctions.languageProfiles.toSeq.sortBy(_._1)
      val scoreDefs = profiles.map { case (lang, words) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        s"len(list_intersect(dtoks, [$list])) AS s_$lang"
      }.mkString(", ")
      val fold = profiles.foldLeft(("'und'", "0")) { case ((bl, bs), (lang, _)) =>
        (s"(CASE WHEN s_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"(CASE WHEN s_$lang > $bs THEN s_$lang ELSE $bs END)")
      }._1
      s"""WITH toks AS (
            SELECT doc_id, text,
              list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> len(x) > 0) AS toks
            FROM documents),
          feat AS (
            SELECT doc_id, text, len(toks) AS n_tokens,
              CASE WHEN len(toks) = 0 THEN 0.0
                   ELSE CAST(len(list_filter(toks, t -> list_contains([$stop], t))) AS DOUBLE) / len(toks)
              END AS swr,
              list_distinct(toks) AS dtoks
            FROM toks),
          scored AS (SELECT *, $scoreDefs FROM feat),
          langed AS (SELECT doc_id, text, n_tokens, swr, $fold AS lang FROM scored),
          filtered AS (SELECT * FROM langed WHERE lang = 'en' AND swr >= 0.05),
          deduped AS (
            SELECT * FROM (
              SELECT *, MIN(doc_id) OVER (PARTITION BY
                md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')))) AS keep
              FROM filtered) WHERE doc_id = keep)
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 ROUND(AVG(swr), 4) AS avg_swr
          FROM deduped"""
    })

  /** Moving-average analytics over the time series (SURVEY §2.5 windows):
    * daily totals per event type, then a 3-day trailing mean — the frame
    * syntax both engines define identically. */
  val q61_moving_avg = Q(
    "q61_moving_avg",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir, "events")
      val daily = e
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value")).as("total"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d")).rowsBetween(-2, 0)
      daily
        .select(
          col("event_type"),
          date_format(col("d"), "yyyy-MM-dd").as("d"),
          round(col("total"), 2).as("total"),
          round(avg(col("total")).over(w), 2).as("ma3"))
        .orderBy("event_type", "d")
    },
    Some("""WITH daily AS (
              SELECT event_type, CAST(ts AS DATE) AS d, SUM(value) AS total
              FROM events GROUP BY 1, 2)
            SELECT event_type, strftime(d, '%Y-%m-%d') AS d,
                   ROUND(total, 2) AS total,
                   ROUND(AVG(total) OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3
            FROM daily ORDER BY event_type, d"""))

  /** Statistical aggregates (SURVEY §2.4 registry depth): median +
    * interpolated percentile + stddev + correlation, matched against
    * DuckDB's definitions of the same functions. */
  val q62_stats = Q(
    "q62_stats",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      Aggregation
        .aggregateMany(
          li,
          Seq("l_returnflag"),
          Seq(("median", "l_quantity", "med_qty"), ("stddev", "l_extendedprice", "sd_price")))
        .join(
          li.groupBy(col("l_returnflag"))
            .agg(
              percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
              corr(col("l_quantity"), col("l_extendedprice")).as("qty_price_corr")),
          Seq("l_returnflag"))
        .select(
          col("l_returnflag"),
          round(col("med_qty"), 2).as("med_qty"),
          round(col("p90_qty"), 2).as("p90_qty"),
          round(col("sd_price"), 2).as("sd_price"),
          round(col("qty_price_corr"), 4).as("qty_price_corr"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
            ROUND(MEDIAN(l_quantity), 2) AS med_qty,
            ROUND(QUANTILE_CONT(l_quantity, 0.9), 2) AS p90_qty,
            ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
            ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr
            FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** As-of join (custom operator Spark lacks — prompt §custom-operators):
    * every event picks up its user's most recent tier change at or before
    * the event time; events before the first change keep tier -1. The
    * oracle is DuckDB's NATIVE ASOF LEFT JOIN — an independent
    * implementation of the same semantics. */
  val q63_asof_join = Q(
    "q63_asof_join",
    (s, dir) => {
      val e = t(s, dir, "events")
      val changes = e.select(col("user_id")).distinct()
        .select(
          col("user_id"),
          explode(array(lit("2024-01-05"), lit("2024-01-15"), lit("2024-01-25"))).as("cd"))
        .select(
          col("user_id"),
          to_timestamp(col("cd")).as("cts"),
          ((col("user_id") + dayofmonth(to_timestamp(col("cd")))) % 5).cast("long").as("tier"))
      graft.operators.AsOfJoin
        .asOfJoin(e.select(col("user_id"), col("ts"), col("value")), changes, Seq("user_id"), "ts", "cts")
        .groupBy(coalesce(col("tier"), lit(-1L)).as("tier"))
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy("tier")
    },
    Some("""WITH changes AS (
              SELECT user_id, cts,
                     CAST((user_id + EXTRACT(day FROM cts)) % 5 AS BIGINT) AS tier
              FROM (SELECT DISTINCT user_id FROM events)
              CROSS JOIN (SELECT UNNEST([TIMESTAMP '2024-01-05',
                                         TIMESTAMP '2024-01-15',
                                         TIMESTAMP '2024-01-25']) AS cts))
            SELECT CAST(COALESCE(c.tier, -1) AS BIGINT) AS tier,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(e.value), 2) AS total
            FROM events e ASOF LEFT JOIN changes c
              ON e.user_id = c.user_id AND e.ts >= c.cts
            GROUP BY 1 ORDER BY 1"""))

  /** Range join (custom operator Spark lacks): events matched to the
    * half-open maintenance windows containing them, per event type —
    * bucketized equi-join + exact predicate. Oracle = DuckDB's plain range
    * join (natively optimized there), an independent implementation. */
  val q64_range_join = Q(
    "q64_range_join",
    (s, dir) => {
      val e = t(s, dir, "events")
      val windows = e.select(col("event_type")).distinct()
        .select(
          col("event_type"),
          explode(array(lit("2024-01-08"), lit("2024-01-18"))).as("ws"))
        .select(
          col("event_type"),
          to_timestamp(col("ws")).as("w_start"),
          (to_timestamp(col("ws")) + expr("INTERVAL 3 DAY")).as("w_end"))
      graft.operators.RangeJoin
        .intervalJoin(
          e.select(col("event_type"), col("ts"), col("value")),
          windows, Seq("event_type"), "ts", "w_start", "w_end")
        .groupBy(col("event_type"), date_format(col("w_start"), "yyyy-MM-dd").as("window_start"))
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy("event_type", "window_start")
    },
    Some("""WITH windows AS (
              SELECT event_type, ws AS w_start, ws + INTERVAL 3 DAY AS w_end
              FROM (SELECT DISTINCT event_type FROM events)
              CROSS JOIN (SELECT UNNEST([TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-18']) AS ws))
            SELECT e.event_type, strftime(w.w_start, '%Y-%m-%d') AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(e.value), 2) AS total
            FROM events e JOIN windows w
              ON e.event_type = w.event_type AND e.ts >= w.w_start AND e.ts < w.w_end
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Deterministic stratified sampling (training-data pipeline op): keep
    * 40% of English docs, 15% of everything else, reproducibly — the
    * content-keyed Bernoulli sample a corpus refresh needs (DataFrame
    * .sample is partition-keyed and unstable). Map-side, zero shuffle. */
  val q65_stratified_sample = Q(
    "q65_stratified_sample",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling
        .stratifiedSample(d, "doc_id", "lang", Map("en" -> 0.4), defaultFraction = 0.15,
          seed = "r3", uniform = knuthUniform)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("lang")
    },
    Some(s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM documents
             WHERE ${knuthUniformSql("doc_id", "r3")} < CASE WHEN lang = 'en' THEN 0.4 ELSE 0.15 END
             GROUP BY 1 ORDER BY 1"""))

  /** Token-budget shard packing (training-data pipeline op): exact
    * sequential packing per source along doc_id order, then the shard
    * manifest a trainer schedules from. The window partitions by source —
    * the real partitioning column that keeps the 100 TB case from a
    * global sort. */
  val q66_shard_pack = Q(
    "q66_shard_pack",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val sharded = graft.text.Sharding
        .packBySequence(d, "doc_id", "n_chars", budgetTokens = 50000L, partitionCols = Seq("source"))
      graft.text.Sharding.shardManifest(sharded, "n_chars", extraKeys = Seq("source"))
        .select(col("source"), col("shard"), col("n_docs"), col("total_tokens"))
        .orderBy("source", "shard")
    },
    Some("""WITH cum AS (
              SELECT source, n_chars,
                     SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) AS c
              FROM documents)
            SELECT source, CAST(FLOOR((c - n_chars) / 50000) AS BIGINT) AS shard,
                   CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_tokens
            FROM cum GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Quantile filtering (training-data pipeline op): keep docs at or above
    * the per-language p75 of length — exact percent_rank form (the
    * approx-threshold scale path is spec-covered). */
  val q67_quantile_filter = Q(
    "q67_quantile_filter",
    (s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.Sampling.filterByQuantile(d, "n_chars", 0.75, Seq("lang"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          min(col("n_chars")).cast("long").as("min_chars"),
          sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("lang")
    },
    Some("""WITH pr AS (
              SELECT lang, n_chars,
                     PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS p
              FROM documents)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM pr WHERE p >= 0.75 GROUP BY 1 ORDER BY 1"""))

  /** Weighted corpus mixing (training-data pipeline op): a two-source
    * training mix — every doc of the rarer source, 30% of the dominant
    * one — with per-source independent keep decisions and provenance. */
  val q68_weighted_mix = Q(
    "q68_weighted_mix",
    (s, dir) => {
      val d = t(s, dir, "documents")
      // "web" = the even-numbered src buckets (half the corpus, downsampled
      // to 30%); "curated" = the odd ones, kept whole
      val isWeb = regexp_extract(col("source"), "src(\\d+)", 1).cast("int") % 2 === 0
      val web = d.filter(isWeb)
      val rest = d.filter(!isWeb)
      graft.text.Sampling
        .weightedMix(
          Seq(("web", web, 0.3), ("curated", rest, 1.0)),
          "doc_id", seed = "mix", uniform = knuthUniform)
        .groupBy(col("mix_source"))
        .agg(count(lit(1)).cast("long").as("n"), sum(col("n_chars")).cast("long").as("chars"))
        .orderBy("mix_source")
    },
    Some(s"""SELECT mix_source, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             FROM (
               SELECT 'web' AS mix_source, n_chars FROM documents
               WHERE CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 2 = 0
                 AND ${knuthUniformSql("doc_id", "mix|web")} < 0.3
               UNION ALL
               SELECT 'curated' AS mix_source, n_chars FROM documents
               WHERE CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 2 = 1
                 AND ${knuthUniformSql("doc_id", "mix|curated")} < 1.0)
             GROUP BY 1 ORDER BY 1"""))

  val q69_dedup_clusters = Q(
    "q69_dedup_clusters",
    (s, dir) => {
      val corpus = clippedNearDupCorpus(s, dir)
      val pairs = Dedup
        .minhashNearDuplicates(corpus, "doc_id", "text", bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
      Dedup.duplicateClusters(pairs)
        .groupBy(col("root")).agg(count(lit(1)).as("csize"))
        .groupBy(col("csize").cast("long").as("cluster_size"))
        .agg(count(lit(1)).cast("long").as("n_clusters"))
        .orderBy("cluster_size")
    },
    Some(s"""WITH RECURSIVE $nearDupComponentsCte,
            sizes AS (SELECT root, COUNT(*) AS csize FROM roots GROUP BY root)
            SELECT CAST(csize AS BIGINT) AS cluster_size,
                   CAST(COUNT(*) AS BIGINT) AS n_clusters
            FROM sizes GROUP BY 1 ORDER BY 1"""))

  /** JSON round-trip (SURVEY §2.1 JSON scan, FAILFAST): aggregate, write
    * line-delimited JSON, read it back through the strict reader. The
    * oracle recomputes the aggregate straight from parquet, so a lossy or
    * lenient round-trip would hash-mismatch. */
  val q70_json_roundtrip = Q(
    "q70_json_roundtrip",
    (s, dir) => {
      val agg = t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      val out = s.conf.get("spark.local.dir", "/tmp") + "/graft_json_roundtrip"
      graft.sources.Writers.json(agg, out, singleFile = true)
      graft.sources.Readers.json(s, out)
        .select(col("o_orderstatus"), col("n"), col("total"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1"""))

  /** In-place overwrite (SURVEY §2.1): a parquet dataset is rewritten at
    * its own path (tmp-write + swap + re-read) with a filtered view of
    * itself — Spark cannot read and overwrite one path in a single job. */
  val q71_overwrite_inplace = Q(
    "q71_overwrite_inplace",
    (s, dir) => {
      val scratch = s.conf.get("spark.local.dir", "/tmp") + "/graft_overwrite_inplace"
      graft.sources.Writers.parquet(
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice"), scratch)
      val pruned = graft.sources.Writers
        .overwriteInPlace(s, s.read.parquet(scratch).filter(col("o_totalprice") > 150000.0), scratch)
      pruned
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders WHERE o_totalprice > 150000.0 GROUP BY 1 ORDER BY 1"""))

  /** Persist-intermediate (SURVEY §2.1): a mid-pipeline frame is cut to
    * scratch parquet and read back (lineage truncation), and the second
    * call hits the reuseExisting resume path — both must yield the same
    * bytes the oracle computes directly. */
  val q72_persist_intermediate = Q(
    "q72_persist_intermediate",
    (s, dir) => {
      // scratch keyed by sf dir: reuseExisting must never see another
      // scale factor's intermediate
      val scratch = s.conf.get("spark.local.dir", "/tmp") +
        "/graft_persist_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val perSupp = t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(sum(col("l_quantity")).as("qty"))
      val first = graft.sources.Writers.persistIntermediate(s, perSupp, scratch, "per_supp")
      val resumed = graft.sources.Writers.persistIntermediate(s, perSupp, scratch, "per_supp", reuseExisting = true)
      resumed
        .select(floor(col("qty") / 100.0).cast("long").as("qty_bucket"))
        .groupBy("qty_bucket")
        .agg(count(lit(1)).cast("long").as("n_suppliers"))
        .orderBy("qty_bucket")
    },
    Some("""SELECT CAST(FLOOR(qty / 100.0) AS BIGINT) AS qty_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers
            FROM (SELECT l_suppkey, SUM(l_quantity) AS qty FROM lineitem GROUP BY 1)
            GROUP BY 1 ORDER BY 1"""))

  /** Calendar-interval arithmetic (SURVEY §2.9 interval op): shift
    * timestamps by calendar units (month-end clamping and all) and
    * aggregate on the shifted calendar — both engines must agree on
    * Jan 31 + 1 MONTH. */
  val q73_interval_op = Q(
    "q73_interval_op",
    (s, dir) => {
      val shifted = graft.time.TimeAdjustments.addInterval(
        graft.time.TimeAdjustments.addInterval(col("l_shipdate"), 1, "MONTH"), 2, "WEEK")
      t(s, dir, "lineitem")
        .select(year(shifted).cast("long").as("y"), month(shifted).cast("long").as("m"))
        .groupBy("y", "m")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("y", "m")
    },
    Some("""SELECT CAST(EXTRACT(year FROM d) AS BIGINT) AS y,
                   CAST(EXTRACT(month FROM d) AS BIGINT) AS m,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT l_shipdate + INTERVAL 1 MONTH + INTERVAL 2 WEEK AS d FROM lineitem)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Registration-time time-consistency checks (SURVEY §2.9): spine
    * equality (ship dates cover every day of their span) and
    * equal-time-array-lengths per dimension combo — one true case, one
    * false case, so a check that always answers the same way fails. */
  val q74_time_consistency = Q(
    "q74_time_consistency",
    (s, dir) => {
      import graft.time.TimeChecks
      // the whole report is ONE composed plan (spine bounds derived
      // inside it) — the boolean check forms cost one driver action per
      // check; at scale those are sequential full scans of the spine
      val days = t(s, dir, "lineitem").select(col("l_shipdate").as("timestamp"), col("l_returnflag"))
      TimeChecks.report(
        TimeChecks.timestampsMatchSpineCheck(
          days, "timestamp",
          TimeChecks.spineFromBounds(days, "timestamp", 86400L), "spine_ok"),
        TimeChecks.equalTimeArrayLengthsCheck(
          days.select(col("l_returnflag"), trunc(col("timestamp"), "month").as("m")).distinct(),
          Seq("l_returnflag"), "equal_months"),
        TimeChecks.equalTimeArrayLengthsCheck(
          t(s, dir, "orders")
            .select(col("o_orderpriority"), trunc(col("o_orderdate"), "month").as("m")).distinct(),
          Seq("o_orderpriority"), "equal_priority_months"))
    },
    Some("""SELECT
              CAST(CASE WHEN (SELECT COUNT(DISTINCT l_shipdate) FROM lineitem) =
                             (SELECT date_diff('day', MIN(l_shipdate), MAX(l_shipdate)) + 1 FROM lineitem)
                   THEN 1 ELSE 0 END AS BIGINT) AS spine_ok,
              CAST(CASE WHEN (SELECT COUNT(DISTINCT c) FROM (
                       SELECT l_returnflag, COUNT(DISTINCT date_trunc('month', l_shipdate)) AS c
                       FROM lineitem GROUP BY 1)) = 1
                   THEN 1 ELSE 0 END AS BIGINT) AS equal_months,
              CAST(CASE WHEN (SELECT COUNT(DISTINCT c) FROM (
                       SELECT o_orderpriority, COUNT(DISTINCT date_trunc('month', o_orderdate)) AS c
                       FROM orders GROUP BY 1)) = 1
                   THEN 1 ELSE 0 END AS BIGINT) AS equal_priority_months"""))

  /** Wrap-time (SURVEY §2.9 wrap_time_allowed): fold a month of events
    * into one representative week by whole-range shifts, then histogram by
    * wrapped day — weather-year alignment semantics. */
  val q75_wrap_time = Q(
    "q75_wrap_time",
    (s, dir) => {
      graft.time.Resample
        .wrapTime(t(s, dir, "events"), "ts", "2024-01-01 00:00:00", "2024-01-08 00:00:00")
        .select(dayofmonth(col("ts")).cast("long").as("wrapped_day"))
        .groupBy("wrapped_day")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("wrapped_day")
    },
    // floor() mirrors Spark's unix_timestamp second truncation; a CAST
    // would round half-up and shift boundary events across midnight
    Some("""SELECT CAST(1 + ((CAST(FLOOR(epoch(ts)) AS BIGINT) -
                              CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT)) % 604800) // 86400
                        AS BIGINT) AS wrapped_day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** DATETIME_EXTERNAL_TZ (SURVEY §2.9, the reference's sixth time
    * representation): tz-NAIVE timestamps localized to absolute UTC through
    * a time zone resolved from the geography dimension records — the
    * inverse direction of q21/q48's UTC→local conversion. Wall-clock
    * readings in three zones shift by different whole-hour offsets, so UTC
    * day counts differ per geography; January data keeps the oracle clear
    * of DST ambiguity. */
  val q76_external_tz = Q(
    "q76_external_tz",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .withColumn("geography", concat(lit("g"), pmod(col("user_id"), lit(3)).cast("string")))
      val geoRecords = Seq(
        ("g0", "America/New_York"),
        ("g1", "America/Denver"),
        ("g2", "Asia/Tokyo")).toDF("id", "time_zone")
      graft.time.TimeZones.geographyLocalToUtc(ev, "ts", "geography", geoRecords)
        .select(col("geography"), dayofmonth(col("ts")).cast("long").as("utc_day"))
        .groupBy("geography", "utc_day")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("geography", "utc_day")
    },
    Some("""SELECT geography, CAST(EXTRACT(day FROM utc_ts) AS BIGINT) AS utc_day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT 'g' || CAST(user_id % 3 AS VARCHAR) AS geography,
                         timezone('UTC', timezone(
                           CASE user_id % 3 WHEN 0 THEN 'America/New_York'
                                            WHEN 1 THEN 'America/Denver'
                                            ELSE 'Asia/Tokyo' END, ts)) AS utc_ts
                  FROM events)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Corpus vocabulary (training-data pipeline: tokenizer/vocab building):
    * top-50 lowercase whitespace tokens by total frequency with document
    * frequencies. One explode + one token-keyed groupBy with map-side
    * partials; the top-k sorts only the aggregated vocabulary. */
  val q77_vocab = Q(
    "q77_vocab",
    (s, dir) => {
      val d = t(s, dir, "documents")
      TextFunctions.termFrequencies(d, "doc_id", "text")
        .select(col("token"), col("tf").cast("long").as("tf"),
          col("doc_freq").cast("long").as("doc_freq"))
        .orderBy(col("tf").desc, col("token"))
        .limit(50)
    },
    Some("""SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
            FROM (SELECT doc_id,
                    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                       x -> len(x) > 0)) AS token
                  FROM documents)
            GROUP BY token ORDER BY tf DESC, token LIMIT 50"""))

  /** Benchmark decontamination (training-data pipeline): flag corpus
    * documents sharing word 8-grams with a benchmark set — here the
    * benchmark is the 12-token prefix of every 97th document, so the
    * contaminated set is known and the overlap counts are exact. The
    * benchmark n-gram set broadcasts; the corpus never shuffles raw
    * n-grams. */
  val q78_decontaminate = Q(
    "q78_decontaminate",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val benchmark = d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " ").as("text"))
      Dedup.ngramOverlap(d, benchmark, "doc_id", "text", n = 8, minHits = 1L)
        .select(col("doc_id"), col("n_hits").cast("long").as("n_hits"))
        .orderBy("doc_id")
    },
    Some("""WITH bench AS (
              SELECT array_to_string((regexp_split_to_array(trim(text), '\s+'))[1:12], ' ') AS text
              FROM documents WHERE doc_id % 97 = 0),
            norm_c AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
              FROM documents),
            norm_b AS (
              SELECT list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
              FROM bench),
            cg AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(toks) <= 8 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')) END)) AS ng
              FROM norm_c),
            bg AS (
              SELECT DISTINCT unnest(list_distinct(
                CASE WHEN len(toks) <= 8 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')) END)) AS ng
              FROM norm_b)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM cg JOIN bg USING (ng)
            GROUP BY doc_id HAVING COUNT(*) >= 1
            ORDER BY doc_id"""))

  /** PII redaction audit (training-data pipeline): deterministic synthetic
    * emails/phone strings are appended per doc_id (the synthetic corpus has
    * none), redacted map-side with shared regex patterns, and audited per
    * source. Pure regexp_replace/extract_all column work — no shuffle
    * before the final small per-source aggregate. */
  val q79_redact = Q(
    "q79_redact",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val withPii = d.withColumn("text2", concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call 555-"), lpad(col("doc_id").cast("string"), 4, "0")))
          .otherwise(lit(""))))
      val emailP = TextFunctions.piiPatterns(0)._1
      val phoneP = TextFunctions.piiPatterns(1)._1
      withPii
        .withColumn("redacted", TextFunctions.redact(col("text2")))
        .withColumn("email_hits", TextFunctions.patternHits(col("text2"), emailP))
        .withColumn("phone_hits", TextFunctions.patternHits(col("text2"), phoneP))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("docs"),
          sum(when(col("redacted") =!= col("text2"), 1L).otherwise(0L)).cast("long").as("docs_redacted"),
          sum(col("email_hits")).cast("long").as("emails"),
          sum(col("phone_hits")).cast("long").as("phones"),
          sum(length(col("text2")) - length(col("redacted"))).cast("long").as("chars_removed"))
        .orderBy("source")
    },
    Some {
      // DuckDB regular strings don't process backslash escapes, so the
      // Scala pattern (single backslash before '.') interpolates verbatim
      val emailP = TextFunctions.piiPatterns(0)._1
      val phoneP = TextFunctions.piiPatterns(1)._1
      s"""WITH withpii AS (
            SELECT source, text
              || (CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END)
              || (CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') ELSE '' END) AS text2
            FROM documents),
          red AS (
            SELECT source, text2,
              regexp_replace(regexp_replace(text2, '$emailP', '<EMAIL>', 'g'), '$phoneP', '<PHONE>', 'g') AS redacted,
              len(regexp_extract_all(text2, '$emailP')) AS email_hits,
              len(regexp_extract_all(text2, '$phoneP')) AS phone_hits
            FROM withpii)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
            CAST(SUM(CASE WHEN redacted <> text2 THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
            CAST(SUM(email_hits) AS BIGINT) AS emails,
            CAST(SUM(phone_hits) AS BIGINT) AS phones,
            CAST(SUM(len(text2) - len(redacted)) AS BIGINT) AS chars_removed
          FROM red GROUP BY source ORDER BY source"""
    })

  /** Session-time-zone management (SURVEY §2.9, the last spec-only time
    * row): the SAME column expression (`date_format`) renders different
    * wall-clock fields under a scoped session-zone override
    * (`Core.withSessionTimeZone` — the reference restarts its session for
    * this, query_submitter.py:697-714). The aggregate is materialized
    * INSIDE the scope: session-zone-dependent expressions resolve the conf
    * at execution, so a lazily-returned frame would silently run under the
    * restored zone — exactly the trap the scoped helper exists to prevent. */
  val q80_session_tz = Q(
    "q80_session_tz",
    (s, dir) => {
      // BOTH the frame definition and the collect live inside the scope:
      // time-zone-aware expressions (date_format) capture the session zone
      // at ANALYSIS time, so a frame defined outside would bake in the old
      // zone no matter when it executes.
      val (rows, schema) = graft.core.GraftSession.withSessionTimeZone(s, "America/Denver") {
        val agg = t(s, dir, "events")
          .select(date_format(col("ts"), "HH").cast("long").as("local_hour"))
          .groupBy("local_hour")
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy("local_hour")
        (agg.collect(), agg.schema)
      }
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    },
    Some("""SELECT CAST(EXTRACT(hour FROM timezone('America/Denver', timezone('UTC', ts))) AS BIGINT) AS local_hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** Cross-corpus line dedup (training-data pipeline, C4-style "remove
    * repeated lines"): documents are split into three 8-token lines; a
    * second copy of the corpus shares its first two lines with the
    * original, so those lines must be kept only at their first (min id)
    * occurrence and the copies reassemble to just their distinct tail.
    * Intra-document repeats (empty lines in short docs) dedup too. */
  val q81_line_dedup = Q(
    "q81_line_dedup",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      def ln(from: Int, len: Int) = array_join(slice(col("toks"), from, len), " ")
      val orig = d.select(col("doc_id"),
        concat_ws("\n", ln(1, 8), ln(9, 8), ln(17, 8)).as("text"))
      val copy = d.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws("\n", ln(1, 8), ln(9, 8), ln(17, 7)).as("text"))
      Dedup.dropRepeatedLines(orig.unionByName(copy), "doc_id", "text")
        .orderBy("doc_id")
    },
    Some("""WITH src AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
            corpus AS (
              -- coalesce: DuckDB yields NULL (not []) for fully out-of-range
              -- list slices, where Spark's slice gives an empty array
              SELECT doc_id,
                     coalesce(array_to_string(toks[1:8], ' '), '') || chr(10)
                       || coalesce(array_to_string(toks[9:16], ' '), '') || chr(10)
                       || coalesce(array_to_string(toks[17:24], ' '), '') AS text
              FROM src
              UNION ALL
              SELECT doc_id + 1000000,
                     coalesce(array_to_string(toks[1:8], ' '), '') || chr(10)
                       || coalesce(array_to_string(toks[9:16], ' '), '') || chr(10)
                       || coalesce(array_to_string(toks[17:23], ' '), '') AS text
              FROM src),
            ex AS (
              SELECT doc_id, i - 1 AS pos, parts[i] AS line
              FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
                   UNNEST(range(1, len(parts) + 1)) AS r(i)),
            keep AS (
              SELECT doc_id, pos, line,
                     ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
              FROM ex)
            SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
            FROM keep WHERE rn = 1
            GROUP BY doc_id ORDER BY doc_id"""))

  /** Quality-aware near-dup resolution (training-data pipeline): like q69's
    * cluster construction, but each component keeps its highest-scoring
    * member (score = token count, so the untruncated original beats its
    * clipped copies; ties → min id) instead of the min-id one. The oracle
    * recomputes components with a recursive CTE — independent of the LSH
    * path — and replays the argmax. */
  val q82_dedup_keep_best = Q(
    "q82_dedup_keep_best",
    (s, dir) => {
      val corpus = clippedNearDupCorpus(s, dir)
        .withColumn("score", size(split(trim(col("text")), "\\s+")).cast("long"))
      val pairs = Dedup
        .minhashNearDuplicates(corpus, "doc_id", "text", bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
      Dedup.dropNearDuplicatesKeepBest(corpus, pairs, "doc_id", "score")
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $nearDupComponentsCte,
            scored AS (
              SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS score FROM corpus),
            ranked AS (
              SELECT r.id, ROW_NUMBER() OVER (
                PARTITION BY r.root ORDER BY s.score DESC, r.id ASC) AS rn
              FROM roots r JOIN scored s ON r.id = s.doc_id),
            losers AS (SELECT id FROM ranked WHERE rn > 1)
            SELECT doc_id FROM corpus
            WHERE doc_id NOT IN (SELECT id FROM losers)
            ORDER BY doc_id"""))

  /** Gopher-style repetition quality signals (Rae et al. 2021): duplicate
    * line fraction, duplicate-line char fraction, top word-2-gram char
    * fraction. Corpus: 4 six-token lines per doc, with line 1 REPEATED on
    * even doc_ids — so the dup fractions split the corpus in two and the
    * oracle replays the whole computation (line counts + gram counts with
    * the max-(count, gram) tie-break) relationally. Fractions are integer
    * ratios divided in double on both engines — bit-equal, no rounding. */
  val q83_repetition = Q(
    "q83_repetition",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      def ln(from: Int, len: Int) = array_join(slice(col("toks"), from, len), " ")
      val corpus = d.select(
        col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat_ws("\n", ln(1, 6), ln(7, 6), ln(1, 6), ln(13, 6)))
          .otherwise(concat_ws("\n", ln(1, 6), ln(7, 6), ln(13, 6), ln(19, 6)))
          .as("text"))
      TextFunctions.repetitionStats(corpus, "doc_id", "text", ngram = 2)
        .orderBy("doc_id")
    },
    Some("""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id,
                CASE WHEN doc_id % 2 = 0
                     THEN array_to_string([l1, l2, l1, l4], chr(10))
                     ELSE array_to_string([l1, l2, l4, l5], chr(10)) END AS text
              FROM (
                SELECT doc_id,
                  array_to_string(toks[1:6], ' ') AS l1,
                  array_to_string(toks[7:12], ' ') AS l2,
                  array_to_string(toks[13:18], ' ') AS l4,
                  array_to_string(toks[19:24], ' ') AS l5
                FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents))),
            lines AS (
              SELECT doc_id, line FROM (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM corpus)
              WHERE len(line) > 0),
            per_line AS (
              SELECT doc_id, line, COUNT(*) AS cnt, len(line)::BIGINT AS chars
              FROM lines GROUP BY doc_id, line),
            line_stats AS (
              SELECT doc_id,
                CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / SUM(cnt) AS dup_line_frac,
                CAST(SUM(CASE WHEN cnt > 1 THEN cnt * chars ELSE 0 END) AS DOUBLE)
                  / SUM(cnt * chars) AS dup_line_char_frac
              FROM per_line GROUP BY doc_id),
            normed AS (
              SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
              FROM corpus),
            toked AS (
              SELECT doc_id, len(norm)::BIGINT AS nlen,
                list_filter(string_split(norm, ' '), t -> len(t) > 0) AS toks
              FROM normed),
            grams AS (
              SELECT doc_id, nlen, unnest(
                CASE WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
                     ELSE list_transform(range(len(toks) - 1), i -> toks[i + 1] || ' ' || toks[i + 2]) END
              ) AS gram
              FROM toked WHERE len(toks) > 0),
            gram_counts AS (
              SELECT doc_id, gram, nlen, COUNT(*) AS cnt
              FROM grams GROUP BY doc_id, gram, nlen),
            top_gram AS (
              SELECT doc_id,
                CAST(cnt * len(gram) AS DOUBLE) / GREATEST(nlen, 1) AS top_ngram_char_frac
              FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
                FROM gram_counts)
              WHERE rn = 1)
            SELECT c.doc_id,
              COALESCE(l.dup_line_frac, 0.0) AS dup_line_frac,
              COALESCE(l.dup_line_char_frac, 0.0) AS dup_line_char_frac,
              COALESCE(t.top_ngram_char_frac, 0.0) AS top_ngram_char_frac
            FROM corpus c
            LEFT JOIN line_stats l ON l.doc_id = c.doc_id
            LEFT JOIN top_gram t ON t.doc_id = c.doc_id
            ORDER BY c.doc_id"""))

  /** Gopher rule-based quality filter over a structured corpus: three lines
    * per doc built from the document's tokens, with a `###` symbol token
    * injected on doc_id%7, a bullet prefix on %3, and a trailing ellipsis
    * token on %5 — so every rule (word count, mean word length, symbol
    * ratio, bullet/ellipsis line fractions, alpha fraction, stopword hits)
    * splits the corpus and the oracle replays the whole rule set
    * relationally. All fractions are single int/int divisions in double —
    * bit-equal across engines, no rounding. */
  val q84_gopher_filter = Q(
    "q84_gopher_filter",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      def ln(from: Int, len: Int) = array_join(slice(col("toks"), from, len), " ")
      val corpus = d.select(
        col("doc_id"),
        concat_ws("\n",
          when(col("doc_id") % 7 === 0, concat(ln(1, 6), lit(" ###"))).otherwise(ln(1, 6)),
          when(col("doc_id") % 3 === 0, concat(lit("- "), ln(7, 6))).otherwise(ln(7, 6)),
          when(col("doc_id") % 5 === 0, concat(ln(13, 6), lit(" ..."))).otherwise(ln(13, 6)))
          .as("text"))
      TextFunctions.gopherQualityFlags(
        corpus, "doc_id", "text",
        minWords = 12L, maxWords = 100000L,
        minMeanWordLen = 3.6, maxMeanWordLen = 10.0,
        maxSymbolWordRatio = 0.15,
        maxBulletLineFrac = 0.4, maxEllipsisLineFrac = 0.4,
        minAlphaWordFrac = 0.9, minStopwordHits = 1L)
        .orderBy("doc_id")
    },
    Some("""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id,
                array_to_string([
                  CASE WHEN doc_id % 7 = 0 THEN l1 || ' ###' ELSE l1 END,
                  CASE WHEN doc_id % 3 = 0 THEN '- ' || l2 ELSE l2 END,
                  CASE WHEN doc_id % 5 = 0 THEN l3 || ' ...' ELSE l3 END], chr(10)) AS text
              FROM (
                SELECT doc_id,
                  -- DuckDB: array_to_string of an out-of-bounds slice is NULL
                  -- (Spark's array_join of an empty slice is '') — coalesce
                  -- EVERY line so the bullet/ellipsis decoration matches
                  -- Spark on documents of any length
                  COALESCE(array_to_string(toks[1:6], ' '), '') AS l1,
                  COALESCE(array_to_string(toks[7:12], ' '), '') AS l2,
                  COALESCE(array_to_string(toks[13:18], ' '), '') AS l3
                FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents))),
            arrays AS (
              SELECT doc_id, text,
                list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS toks,
                list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lns
              FROM corpus),
            counts AS (
              SELECT doc_id,
                len(toks)::BIGINT AS wc,
                len(lns)::BIGINT AS nl,
                length(regexp_replace(text, '\s+', '', 'g'))::BIGINT AS sum_len,
                (length(text) - length(regexp_replace(text, '#', '', 'g')))::BIGINT AS hash_cnt,
                len(regexp_extract_all(text, '\.\.\.'))::BIGINT AS ell_cnt,
                len(list_filter(lns, l -> starts_with(l, '- ') OR starts_with(l, '* ')
                                          OR starts_with(l, '•')))::BIGINT AS bullet_lines,
                len(list_filter(lns, l -> ends_with(l, '...')))::BIGINT AS ell_lines,
                len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))::BIGINT AS alpha_words,
                len(list_filter(['the','be','to','of','and','that','have','with'],
                    s -> list_contains(list_transform(toks, t -> lower(t)), s)))::BIGINT AS stop_hits
              FROM arrays),
            metrics AS (
              SELECT doc_id,
                wc AS word_count,
                CASE WHEN wc = 0 THEN 0.0 ELSE sum_len::DOUBLE / wc END AS mean_word_len,
                CASE WHEN wc = 0 THEN 0.0 ELSE (hash_cnt + ell_cnt)::DOUBLE / wc END AS symbol_word_ratio,
                CASE WHEN nl = 0 THEN 0.0 ELSE bullet_lines::DOUBLE / nl END AS bullet_line_frac,
                CASE WHEN nl = 0 THEN 0.0 ELSE ell_lines::DOUBLE / nl END AS ellipsis_line_frac,
                CASE WHEN wc = 0 THEN 0.0 ELSE alpha_words::DOUBLE / wc END AS alpha_word_frac,
                stop_hits AS stopword_hits
              FROM counts)
            SELECT doc_id, word_count, mean_word_len, symbol_word_ratio,
              bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stopword_hits,
              CAST(word_count >= 12 AND word_count <= 100000
                AND mean_word_len >= 3.6 AND mean_word_len <= 10.0
                AND symbol_word_ratio <= 0.15
                AND bullet_line_frac <= 0.4 AND ellipsis_line_frac <= 0.4
                AND alpha_word_frac >= 0.9 AND stopword_hits >= 1 AS BIGINT) AS keep
            FROM metrics
            ORDER BY doc_id"""))

  /** SemDeDup semantic deduplication over the embeddings table augmented
    * with ×2-scaled copies (cosine exactly 1, centroid similarities exactly
    * equal — power-of-2 scaling is IEEE-exact — so every copy resolves by
    * the id tie-break). Centroids are the four lowest-id embeddings, so the
    * oracle replays the whole pipeline: the dot/||c|| argmax assignment
    * with its larger-id tie-break, centroid cosine, and the per-item
    * EXISTS drop rule. All similarity arithmetic is double with identical
    * accumulation order on both engines. */
  val q85_semantic_dedup = Q(
    "q85_semantic_dedup",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val copies = emb.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * 2.0).as("embedding"))
      val corpus = emb.unionByName(copies)
      // SemDeDup's scale contract is k ∝ corpus (the paper runs
      // k ≈ corpus/10k): a FIXED centroid count makes every cell grow
      // with the data and the per-cell self-join grow quadratically —
      // the 5× synthesized scale gate measured exponent 1.74 with k=4
      // pinned. One centroid per ~1000 corpus rows keeps cells bounded
      // (k stays 4 at the driver SFs, so results there are unchanged);
      // the count() is a parquet-footer action, not a data scan.
      val k = math.max(4L, (2L * emb.count()) / 1000L)
      val cents = emb.filter(col("vec_id") < k)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
      Similarity.semanticDeduplicate(corpus, cents, threshold = 0.99)
        .select(
          col("vec_id").cast("long").as("vec_id"),
          col("cluster").cast("long").as("cluster"),
          round(col("centroid_sim"), 4).as("centroid_sim"),
          col("keep"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
            corpus AS (
              SELECT vec_id, v FROM e
              UNION ALL
              SELECT vec_id + 1000000, list_transform(v, x -> x * 2.0) FROM e),
            cents AS (SELECT vec_id AS cid, v AS cv FROM e
                      WHERE vec_id < GREATEST(4, (SELECT 2 * COUNT(*) FROM embeddings) // 1000)),
            assigned AS (
              SELECT c.vec_id, c.v, cid, cv,
                ROW_NUMBER() OVER (
                  PARTITION BY c.vec_id
                  ORDER BY list_dot_product(c.v, cv) / sqrt(list_dot_product(cv, cv)) DESC,
                           cid DESC) AS rn
              FROM corpus c CROSS JOIN cents),
            withsim AS (
              SELECT vec_id, v, cid AS cluster,
                list_dot_product(v, cv) /
                  (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS centroid_sim
              FROM assigned WHERE rn = 1),
            dropped AS (
              SELECT DISTINCT a.vec_id
              FROM withsim a JOIN withsim b
                ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
               AND list_dot_product(a.v, b.v) /
                     (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) > 0.99
               AND (b.centroid_sim < a.centroid_sim OR
                    (b.centroid_sim = a.centroid_sim AND b.vec_id < a.vec_id)))
            SELECT CAST(w.vec_id AS BIGINT) AS vec_id,
              CAST(w.cluster AS BIGINT) AS cluster,
              ROUND(w.centroid_sim, 4) AS centroid_sim,
              CAST(d.vec_id IS NULL AS BIGINT) AS keep
            FROM withsim w LEFT JOIN dropped d ON d.vec_id = w.vec_id
            ORDER BY w.vec_id"""))

  /** BM25 ranked scoring of the documents corpus against a 3-term query.
    * Exact-integer tf/dl/df, avgdl = exact long sum divided once, and the
    * score is a fixed-order expression sum over terms — both engines
    * evaluate the same floating-point tree, so ROUND(,4) is cosmetic, not
    * a tolerance. */
  val q86_bm25 = Q(
    "q86_bm25",
    (s, dir) => {
      TextFunctions.bm25Scores(
        t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"), col("text")),
        "doc_id", "text", terms = Seq("spark", "table", "the"))
        .select(
          col("doc_id"), col("tf1"), col("tf2"), col("tf3"),
          round(col("bm25"), 4).as("bm25"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (
              SELECT doc_id::BIGINT AS doc_id,
                list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0) AS toks
              FROM documents),
            m AS (
              SELECT doc_id, len(toks)::BIGINT AS dl,
                len(list_filter(toks, t -> t = 'spark'))::BIGINT AS tf1,
                len(list_filter(toks, t -> t = 'table'))::BIGINT AS tf2,
                len(list_filter(toks, t -> t = 'the'))::BIGINT AS tf3
              FROM d),
            stats AS (
              SELECT COUNT(*)::BIGINT AS n, SUM(dl)::BIGINT AS suml,
                SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::BIGINT AS df1,
                SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::BIGINT AS df2,
                SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END)::BIGINT AS df3
              FROM m)
            SELECT doc_id, tf1, tf2, tf3,
              ROUND(
                ln(1.0 + (CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
                  * (CAST(tf1 AS DOUBLE) * 2.2)
                  / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(suml AS DOUBLE) / n)))
                + ln(1.0 + (CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
                  * (CAST(tf2 AS DOUBLE) * 2.2)
                  / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(suml AS DOUBLE) / n)))
                + ln(1.0 + (CAST(n AS DOUBLE) - CAST(df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5))
                  * (CAST(tf3 AS DOUBLE) * 2.2)
                  / (CAST(tf3 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(suml AS DOUBLE) / n)))
              , 4) AS bm25
            FROM m, stats ORDER BY doc_id"""))

  /** Exact-substring duplicate-span removal over a corpus where every
    * fourth document is prefixed with the SAME 10-token boilerplate
    * sentence — those documents share the prefix's three 8-token windows
    * (boundary windows mix in natural tokens and stay unique), plus
    * whatever window repeats the small-vocabulary corpus produces
    * naturally. The oracle replays the whole pipeline with raw window
    * STRINGS as keys (Spark groups their xxhash64 — identical flagging
    * absent a 64-bit collision). */
  val q87_span_dedup = Q(
    "q87_span_dedup",
    (s, dir) => {
      val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      val corpus = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"),
        when(col("doc_id") % 4 === 0, concat(lit(boiler + " "), col("text")))
          .otherwise(col("text")).as("text"))
      Dedup.removeDuplicateSpans(corpus, "doc_id", "text", n = 8)
        .orderBy("doc_id")
    },
    Some("""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id,
                CASE WHEN doc_id % 4 = 0
                     THEN 'alpha beta gamma delta epsilon zeta eta theta iota kappa ' || text
                     ELSE text END AS text
              FROM documents),
            d AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS toks
              FROM corpus),
            wins AS (
              SELECT doc_id, i AS pos, array_to_string(toks[i+1:i+8], ' ') AS gram
              FROM d, unnest(range(GREATEST(len(toks) - 7, 0))) AS u(i)),
            dups AS (SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) > 1),
            flagged AS (SELECT w.doc_id, w.pos FROM wins w JOIN dups USING (gram)),
            covered AS (
              SELECT DISTINCT doc_id, pos + j AS cpos
              FROM flagged, unnest(range(8)) AS v(j)),
            toksp AS (
              SELECT doc_id, j AS pos, toks[j+1] AS tok
              FROM d, unnest(range(len(toks))) AS w(j)),
            kept AS (
              SELECT t.doc_id, t.pos, t.tok FROM toksp t
              LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.cpos = t.pos
              WHERE c.doc_id IS NULL),
            rebuilt AS (
              SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS cleaned_text
              FROM kept GROUP BY doc_id),
            counts AS (
              SELECT doc_id, COUNT(*)::BIGINT AS n_dup_windows FROM flagged GROUP BY doc_id)
            SELECT d.doc_id,
              COALESCE(c.n_dup_windows, 0)::BIGINT AS n_dup_windows,
              COALESCE(r.cleaned_text, '') AS cleaned_text
            FROM d
            LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
            LEFT JOIN counts c ON c.doc_id = d.doc_id
            ORDER BY d.doc_id"""))

  val all: Seq[Q] = Seq(
    q59_partitioned_write, q60_pipeline, q61_moving_avg, q62_stats,
    q63_asof_join, q64_range_join, q65_stratified_sample, q66_shard_pack,
    q67_quantile_filter, q68_weighted_mix, q69_dedup_clusters, q70_json_roundtrip,
    q71_overwrite_inplace, q72_persist_intermediate, q73_interval_op, q74_time_consistency,
    q75_wrap_time, q76_external_tz, q77_vocab, q78_decontaminate,
    q79_redact, q80_session_tz, q81_line_dedup, q82_dedup_keep_best,
    q83_repetition, q84_gopher_filter, q85_semantic_dedup, q86_bm25,
    q87_span_dedup)
}
