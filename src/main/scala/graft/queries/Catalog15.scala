package graft

import org.apache.spark.sql.functions._

import graft.QueryDsl._
import graft.text.TextFunctions

/** Catalog chunk q383+ — round-15: the declarative curation-pipeline
  * surface (JSON plan documents → [[graft.query.CurationSubmitter]]) and
  * SQL-surface registration of the remaining scoring expressions.
  * Registration + docs in [[graft.Queries]]. */
private[graft] object Catalog15 {

  /** The q60 flagship curation composition — quality features → language
    * filter → exact dedup → deterministic split → per-split corpus stats —
    * but driven END-TO-END from a declarative JSON document through
    * [[graft.query.CurationJson]] + [[graft.query.CurationSubmitter]] (the
    * same rerunnable-document discipline project queries have; ref:
    * dsgrid/query/dataset_mapping_plan.py:17-143 for the per-stage
    * persist/checkpoint model this mirrors). The Scala side never touches
    * a DataFrame operator directly: parse(document) → submit(plan).
    *
    * The split stage is the engine's production semantic
    * (xxhash64-derived uniform, content-keyed and partition-independent);
    * the oracle replays the full XXH64 chain in SQL via
    * [[graft.tools.OracleSql.xxhash64Stages]]. Split weights are dyadic
    * (0.75/0.125/0.125) so the cumulative thresholds are exact doubles on
    * both engines. Stats per split are exact integers (count, sum,
    * integral mean via div) — no row-order double aggregation. */
  val q383_curation_plan = Q(
    "q383_curation_plan",
    (s, dir) => {
      val document = """{
        "name": "curate_documents",
        "input": "documents",
        "stages": [
          {"stage_type": "text_features",
           "features": ["language", "stopword_ratio", "token_count"],
           "overwrite": true},
          {"stage_type": "filter",
           "filters": [{"filter_type": "raw", "expression": "lang = 'en' AND swr >= 0.05"}]},
          {"stage_type": "exact_dedup", "persist": true},
          {"stage_type": "split",
           "splits": [{"name": "train", "weight": 0.75},
                      {"name": "val", "weight": 0.125},
                      {"name": "test", "weight": 0.125}]},
          {"stage_type": "aggregate", "group_by": ["split"],
           "aggregations": [
             {"fn": "count", "column": "doc_id", "alias": "n_docs"},
             {"fn": "sum", "column": "n_tokens", "alias": "total_tokens"},
             {"fn": "mean_int", "column": "n_tokens", "alias": "mean_tokens"}]},
          {"stage_type": "sort", "by": ["split"]}
        ]
      }"""
      val plan = graft.query.CurationJson.parse(document)
      new graft.query.CurationSubmitter(s, dir).submit(plan)
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
      // Sampling.uniformHash replay: u = pmod(xxhash64(id || '|'), 1e9)/1e9
      val hashed = graft.tools.OracleSql.xxhash64Stages(
        "SELECT doc_id, n_tokens, doc_id::VARCHAR || '|' AS src FROM deduped",
        "src", "h", pfx = "__s")
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
            SELECT doc_id, n_tokens FROM (
              SELECT doc_id, n_tokens, MIN(doc_id) OVER (PARTITION BY
                ${graft.tools.OracleSql.normalizeSql("text")}) AS keep
              FROM filtered) WHERE doc_id = keep),
          hashed AS ($hashed),
          labeled AS (
            SELECT n_tokens,
                   CASE WHEN u < 0.75 THEN 'train'
                        WHEN u < 0.875 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT n_tokens,
                         (((h % 1000000000) + 1000000000) % 1000000000) / 1000000000.0 AS u
                  FROM hashed))
          SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(SUM(n_tokens) // COUNT(*) AS BIGINT) AS mean_tokens
          FROM labeled GROUP BY 1 ORDER BY 1"""
    })

  /** Model-based quality gate driven from SQL TEXT (the q188 route): the
    * r14 verdict noted `hashed_linear_score` was Column-API-only, so a
    * spark.sql user could not reach the model gate — it (plus
    * `nearest_centroid_idx` / `hyperplane_buckets`) is now SQL-registered
    * via GraftExtensions. The gate is spelled as CONDITIONAL AGGREGATION
    * over one scored projection, not filter-then-aggregate: inside one
    * aggregate operator codegen subexpression-elimination computes the
    * score once per row, while a WHERE on the projected score would be
    * pushed below the projection and evaluate the scorer twice (the q78
    * lesson, applied to the SQL surface). Scores are exact BIGINTs (the
    * integer-ramp weight table), so sums hash-match. */
  val q384_sql_model_gate = Q(
    "q384_sql_model_gate",
    (s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("graft_q384_docs")
      s.sql("""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN score >= 0 THEN score END) AS BIGINT) AS kept_score
        FROM (
          SELECT lang,
                 hashed_linear_score(
                   filter(split(trim(lower(text)), '\\s+'), t -> length(t) > 0), 64) AS score
          FROM graft_q384_docs)
        GROUP BY lang ORDER BY lang""")
    },
    Some {
      val hashed = graft.tools.OracleSql.xxhash64Stages(
        "SELECT doc_id, tok AS src FROM toks", "src", "h", pfx = "__m")
      s"""WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                      x -> len(x) > 0)) AS tok
            FROM documents),
          hashed AS ($hashed),
          scores AS (
            SELECT doc_id, SUM((((h % 64) + 64) % 64) % 7 - 3) AS score
            FROM hashed GROUP BY 1),
          perdoc AS (
            SELECT d.lang, s.score
            FROM documents d LEFT JOIN scores s ON d.doc_id = s.doc_id)
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN score >= 0 THEN score END) AS BIGINT) AS kept_score
          FROM perdoc GROUP BY 1 ORDER BY 1"""
    })

  /** Shared corpus registry for the artifact-lifecycle queries: the
    * documents table registered once per (JVM, sf) as `docs_corpus`
    * (validate = false — a text corpus, not a value fact table). */
  private def artifactRegistry(s: org.apache.spark.sql.SparkSession, dir: String) =
    registryMemo.getOrElseUpdate(memoKey(s, dir, "artifacts"), {
      val root = java.nio.file.Files.createTempDirectory("graft-registry-artifacts").toString
      val reg = graft.registry.Registry(s, root)
      graft.registry.Registry.registerDataset(reg, "docs_corpus",
        t(s, dir, "documents").select(col("doc_id"), col("text")), validate = false)
      reg
    })

  /** Incremental ingest dedup with REGISTRY-RESOLVED corpus artifacts
    * ([[graft.registry.DerivedArtifacts.incrementalMinhashNearDuplicates]]):
    * the corpus's minhash shingles + LSH buckets are registered derived
    * datasets with content-hash provenance — built on first touch, pure
    * parquet reads on every later ingest, invalidated when the corpus
    * dataset changes (spec-pinned in DerivedArtifactsSpec). The batch
    * (last-word-dropped copies of every 7th document, the q29 fixture
    * family) pays only its own map-side pass; candidates join cross-side
    * only, so ingest cost scales with the batch, not the corpus. Oracle:
    * exact-Jaccard inverted-index join between batch and corpus shingle
    * sets (the q29 replay). */
  val q385_registry_incremental_dedup = Q(
    "q385_registry_incremental_dedup",
    (s, dir) => {
      val reg = artifactRegistry(s, dir)
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      // batch-id namespace: the next power-of-ten-multiple above max
      // doc_id (metadata-scale scalar), never a fixed 1e6 — a synthesized
      // 5×+ corpus would collide batch ids with corpus ids (r15 ADVICE);
      // at the driver SFs max < 1e6 so the offset stays 1 000 000 and the
      // hash is unchanged
      val off = d.agg(max(col("doc_id"))).head().getLong(0) / 1000000L * 1000000L +
        1000000L
      val batch = d.filter(pmod(col("doc_id"), lit(7L)) === 0L)
        .select(
          (col("doc_id") + off).as("doc_id"),
          array_join(
            slice(split(trim(col("text")), "\\s+"), lit(1),
              size(split(trim(col("text")), "\\s+")) - 1), " ").as("text"))
      graft.registry.DerivedArtifacts
        .incrementalMinhashNearDuplicates(reg, "docs_corpus", batch)
        .select(
          col("new_id").cast("long").as("new_id"),
          col("existing_id").cast("long").as("existing_id"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("new_id", "existing_id")
    },
    Some("""WITH off AS (
              SELECT (max(doc_id) // 1000000 + 1) * 1000000 AS o FROM documents),
            batch AS (
              SELECT doc_id + (SELECT o FROM off) AS doc_id,
                     array_to_string(toks[1:len(toks)-1], ' ') AS text
              FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                    FROM documents)
              WHERE doc_id % 7 = 0),
            sh_c AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM documents)),
            sh_b AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS shingles
              FROM (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), '\s+'), x -> len(x) > 0) AS toks
                FROM batch)),
            size_c AS (SELECT doc_id, len(shingles) AS sz FROM sh_c),
            size_b AS (SELECT doc_id, len(shingles) AS sz FROM sh_b),
            ex_c AS (SELECT doc_id, unnest(shingles) AS s FROM sh_c),
            ex_b AS (SELECT doc_id, unnest(shingles) AS s FROM sh_b),
            inter AS (
              SELECT b.doc_id AS new_id, c.doc_id AS existing_id, COUNT(*) AS ic
              FROM ex_b b JOIN ex_c c ON b.s = c.s
              GROUP BY 1, 2),
            pairs AS (
              SELECT new_id, existing_id,
                     CAST(ic AS DOUBLE) / (sb.sz + sc.sz - ic) AS jaccard
              FROM inter
              JOIN size_b sb ON sb.doc_id = new_id
              JOIN size_c sc ON sc.doc_id = existing_id)
            SELECT CAST(new_id AS BIGINT) AS new_id,
                   CAST(existing_id AS BIGINT) AS existing_id,
                   ROUND(jaccard, 4) AS jaccard
            FROM pairs WHERE jaccard >= 0.8 ORDER BY new_id, existing_id"""))

  /** Friedman test ([[graft.operators.RankStats.friedmanTest]] — the
    * multi-system eval: k = 4 systems scored on 400 blocks per priority,
    * doubled tie-averaged within-block ranks, tie-corrected statistic in
    * exact integers, Markov-bound p. Planted: '1-URGENT' adds a +200·s
    * system lift (simulated: p ≈ 10 836 ppm rejects; the multiplicative
    * (b+7)(s+3) mixing keeps nulls at the p = 10⁶ clamp — an additive
    * constant-offset score had a systematic mod-wrap rank bias, caught by
    * the pre-flight simulation, the q374 lesson). */
  val q386_friedman = Q(
    "q386_friedman",
    (s, dir) => {
      val blocks = t(s, dir, "orders")
        .select(col("o_orderpriority").as("g"), pmod(col("o_orderkey"), lit(400L)).as("b"))
        .distinct()
      val obs = blocks
        .select(col("g"), col("b"), explode(sequence(lit(0L), lit(3L))).as("sy"))
        .withColumn("v",
          pmod((col("b") + 7L) * (col("sy") + 3L) * 48271L, lit(1000L)) +
            when(col("g") === "1-URGENT", col("sy") * 200L).otherwise(0L))
      graft.operators.RankStats.friedmanTest(obs, "b", "sy", "v", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH blocks AS (
              SELECT DISTINCT o_orderpriority AS g, o_orderkey % 400 AS b FROM orders),
            obs AS (
              SELECT g, b, sy,
                     ((b + 7) * (sy + 3) * 48271) % 1000 +
                       CASE WHEN g = '1-URGENT' THEN sy * 200 ELSE 0 END AS v
              FROM blocks, UNNEST([0, 1, 2, 3]) AS t(sy)),
            ranked AS (
              SELECT g, b, sy,
                     2 * (RANK() OVER (PARTITION BY g, b ORDER BY v) - 1) +
                       COUNT(*) OVER (PARTITION BY g, b, v) + 1 AS r2
              FROM obs),
            pert AS (
              SELECT g, sy, SUM(r2) AS R2, COUNT(*) AS n, SUM(r2 * r2) AS a4j
              FROM ranked GROUP BY 1, 2),
            agg AS (
              SELECT g, MAX(n) AS n_blocks, 4 AS k,
                     SUM(CAST(R2 - n * 5 AS HUGEINT) * (R2 - n * 5)) AS num0,
                     SUM(CAST(a4j AS HUGEINT)) AS a4
              FROM pert GROUP BY 1),
            st AS (
              SELECT g, n_blocks, k,
                     CASE WHEN a4 = CAST(n_blocks AS HUGEINT) * 4 * 25 THEN NULL
                          ELSE CAST((3 * num0 * 1000000) //
                            (a4 - CAST(n_blocks AS HUGEINT) * 4 * 25) AS BIGINT)
                     END AS chi2_upm
              FROM agg)
            SELECT g, CAST(n_blocks AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
                   chi2_upm,
                   CASE WHEN chi2_upm IS NULL OR chi2_upm <= 0 THEN 1000000
                        ELSE LEAST(1000000,
                          CAST((2 * 3 * 1000000000000::HUGEINT) // chi2_upm AS BIGINT))
                   END AS p_ppm
            FROM st ORDER BY g"""))

  /** Cochran's Q ([[graft.operators.Agreement.cochranQ]] — k = 3 paired
    * binary classifiers over 477 items per priority (477 breaks the
    * mod-10 cycle so null column totals differ slightly instead of
    * vanishing identically); planted: '1-URGENT' classifier 2 succeeds at
    * 90 % vs the 60 % base (simulated: p ≈ 36 588 ppm rejects, nulls
    * clamp at 10⁶). */
  val q387_cochran_q = Q(
    "q387_cochran_q",
    (s, dir) => {
      val items = t(s, dir, "orders")
        .select(col("o_orderpriority").as("g"), pmod(col("o_orderkey"), lit(477L)).as("i"))
        .distinct()
      val obs = items
        .select(col("g"), col("i"), explode(sequence(lit(0L), lit(2L))).as("j"))
        .withColumn("sc",
          (pmod(col("i") * 31L + col("j") * 17L + 7L, lit(10L)) <
            when(col("g") === "1-URGENT" && col("j") === 2L, 9L).otherwise(6L))
            .cast("long"))
      graft.operators.Agreement.cochranQ(obs, "i", "j", "sc", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH items AS (
              SELECT DISTINCT o_orderpriority AS g, o_orderkey % 477 AS i FROM orders),
            obs AS (
              SELECT g, i, j,
                     CASE WHEN (i * 31 + j * 17 + 7) % 10 <
                       CASE WHEN g = '1-URGENT' AND j = 2 THEN 9 ELSE 6 END
                       THEN 1 ELSE 0 END AS sc
              FROM items, UNNEST([0, 1, 2]) AS t(j)),
            rowt AS (SELECT g, i, SUM(sc) AS li FROM obs GROUP BY 1, 2),
            colt AS (SELECT g, j, SUM(sc) AS cj FROM obs GROUP BY 1, 2),
            ra AS (
              SELECT g, COUNT(*) AS n_items, SUM(li) AS n_success,
                     SUM(CAST(li AS HUGEINT) * li) AS l2
              FROM rowt GROUP BY 1),
            ca AS (SELECT g, SUM(CAST(cj AS HUGEINT) * cj) AS c2 FROM colt GROUP BY 1),
            st AS (
              SELECT ra.g, n_items, 3 AS k, n_success,
                     CASE WHEN 3 * CAST(n_success AS HUGEINT) - l2 = 0 THEN NULL
                          ELSE CAST((2 * (3 * c2 - CAST(n_success AS HUGEINT) * n_success)
                            * 1000000) // (3 * CAST(n_success AS HUGEINT) - l2) AS BIGINT)
                     END AS q_upm
              FROM ra JOIN ca ON ra.g = ca.g)
            SELECT g, CAST(n_items AS BIGINT) AS n_items, CAST(k AS BIGINT) AS k,
                   CAST(n_success AS BIGINT) AS n_success, q_upm,
                   CASE WHEN q_upm IS NULL OR q_upm <= 0 THEN 1000000
                        ELSE LEAST(1000000,
                          CAST((2 * 2 * 1000000000000::HUGEINT) // q_upm AS BIGINT))
                   END AS p_ppm
            FROM st ORDER BY g"""))

  /** Quadratically weighted Cohen's κ ([[graft.operators.Agreement
    * .weightedKappaQuadratic]] — ordinal 0–4 labels per language; rater b
    * echoes rater a except on the 1/7 residue, where it slips 1–3 grades;
    * the expected-disagreement term is a label-grid cross join of the two
    * marginal censuses, exact HUGEINT end to end). */
  val q388_weighted_kappa = Q(
    "q388_weighted_kappa",
    (s, dir) => {
      val d = t(s, dir, "documents").select(
        col("lang"),
        pmod(col("doc_id"), lit(5L)).as("a"),
        when(pmod(col("doc_id"), lit(7L)) === 0L,
          pmod(pmod(col("doc_id"), lit(5L)) + 1L + pmod(col("doc_id"), lit(3L)), lit(5L)))
          .otherwise(pmod(col("doc_id"), lit(5L))).as("b"))
      graft.operators.Agreement.weightedKappaQuadratic(d, "a", "b", Seq("lang"))
        .orderBy("lang")
    },
    Some("""WITH r AS (
              SELECT lang,
                     doc_id % 5 AS a,
                     CASE WHEN doc_id % 7 = 0
                          THEN (doc_id % 5 + 1 + doc_id % 3) % 5
                          ELSE doc_id % 5 END AS b
              FROM documents),
            base AS (
              SELECT lang, COUNT(*) AS n, SUM((a - b) * (a - b)) AS wo_num
              FROM r GROUP BY 1),
            ra AS (SELECT lang, a, COUNT(*) AS rc FROM r GROUP BY 1, 2),
            rb AS (SELECT lang, b, COUNT(*) AS cc FROM r GROUP BY 1, 2),
            we AS (
              SELECT ra.lang,
                     SUM((a - b) * (a - b) * CAST(rc AS HUGEINT) * cc) AS we_num
              FROM ra JOIN rb ON ra.lang = rb.lang GROUP BY 1)
            SELECT base.lang, CAST(n AS BIGINT) AS n, CAST(wo_num AS BIGINT) AS wo_num,
                   CAST(we_num AS BIGINT) AS we_num,
                   CASE WHEN we_num = 0 THEN NULL ELSE
                     CAST(CASE WHEN we_num - CAST(n AS HUGEINT) * wo_num < 0
                               THEN -1 ELSE 1 END *
                       (abs(we_num - CAST(n AS HUGEINT) * wo_num) * 1000000 // we_num)
                       AS BIGINT)
                   END AS kappa_ppm
            FROM base JOIN we ON base.lang = we.lang ORDER BY 1"""))

  /** Mann–Kendall trend monitor ([[graft.operators.Drift.mannKendall]] —
    * the nonparametric monotone-trend test over the daily order-count
    * series per priority; planted: '1-URGENT' gains +3·day (simulated:
    * S ≈ +1121, trend = +1; null series sit under the 1.96 rational). */
  val q389_mann_kendall = Q(
    "q389_mann_kendall",
    (s, dir) => {
      val series = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("g"), pmod(col("o_orderkey"), lit(50L)).as("d"))
        .agg(count(lit(1)).as("c"))
        .withColumn("v",
          col("c") + when(col("g") === "1-URGENT", col("d") * 3L).otherwise(0L))
      graft.operators.Drift.mannKendall(series, "d", "v", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH series AS (
              SELECT g, d, COUNT(*) + CASE WHEN g = '1-URGENT' THEN d * 3 ELSE 0 END AS v
              FROM (SELECT o_orderpriority AS g, o_orderkey % 50 AS d FROM orders)
              GROUP BY g, d),
            sgn AS (
              SELECT a.g,
                     SUM(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END) AS s
              FROM series a JOIN series b ON a.g = b.g AND b.d > a.d
              GROUP BY 1),
            ties AS (
              SELECT g, SUM(tc) AS n,
                     SUM(tc * (tc - 1) * (2 * tc + 5)) AS tsum
              FROM (SELECT g, v, COUNT(*) AS tc FROM series GROUP BY 1, 2)
              GROUP BY 1)
            SELECT ties.g, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s,
                   CAST(n * (n - 1) * (2 * n + 5) - tsum AS BIGINT) AS var18,
                   CAST(CASE WHEN s = 0 OR n < 2 THEN 0
                        WHEN 11250 * CAST(abs(s) - 1 AS HUGEINT) * (abs(s) - 1) >=
                             2401 * (n * (n - 1) * (2 * n + 5) - tsum)
                        THEN CASE WHEN s > 0 THEN 1 ELSE -1 END
                        ELSE 0 END AS BIGINT) AS trend
            FROM ties JOIN sgn ON ties.g = sgn.g ORDER BY 1"""))

  /** Heavyweight-quality curation plan: the Gopher rule gate and the
    * repetition signals as DECLARATIVE stages (gopher_flags → keep filter
    * → repetition → top-bigram filter → per-language stats), the q84/q83
    * operators reached from a JSON document. Thresholds picked against
    * the real documents distribution (word_count median 56 → min_words 40
    * splits ~40/60; top bigram char frac p75 ≈ 0.10 → the 0.1 gate drops
    * the repetitive quartile). All emitted stats are exact integers; the
    * intermediate double metrics are single int/int divisions — bit-equal
    * across engines (the q84 contract) — and never aggregated. */
  val q390_curation_quality_gate = Q(
    "q390_curation_quality_gate",
    (s, dir) => {
      val document = """{
        "name": "curate_quality_gate",
        "input": "documents",
        "stages": [
          {"stage_type": "gopher_flags", "min_words": 40, "max_words": 100000,
           "min_mean_word_len": 3.0, "max_mean_word_len": 10.0,
           "max_symbol_word_ratio": 0.1, "max_bullet_line_frac": 0.9,
           "max_ellipsis_line_frac": 0.3, "min_alpha_word_frac": 0.8,
           "min_stopword_hits": 1},
          {"stage_type": "filter",
           "filters": [{"filter_type": "expression", "column": "keep",
                        "operator": "==", "value": 1}]},
          {"stage_type": "repetition", "ngram": 2},
          {"stage_type": "filter",
           "filters": [{"filter_type": "raw", "expression": "top_ngram_char_frac <= 0.1"}]},
          {"stage_type": "aggregate", "group_by": ["lang"],
           "aggregations": [
             {"fn": "count", "column": "doc_id", "alias": "n_docs"},
             {"fn": "sum", "column": "word_count", "alias": "total_words"},
             {"fn": "mean_int", "column": "word_count", "alias": "mean_words"}]},
          {"stage_type": "sort", "by": ["lang"]}
        ]
      }"""
      val plan = graft.query.CurationJson.parse(document)
      new graft.query.CurationSubmitter(s, dir).submit(plan)
    },
    Some("""WITH arrays AS (
              SELECT doc_id, lang, text,
                list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS toks,
                list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lns
              FROM documents),
            counts AS (
              SELECT doc_id, lang, text,
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
            kept AS (
              SELECT doc_id, lang, text, wc AS word_count FROM counts
              WHERE wc >= 40 AND wc <= 100000
                AND (CASE WHEN wc = 0 THEN 0.0 ELSE sum_len::DOUBLE / wc END) >= 3.0
                AND (CASE WHEN wc = 0 THEN 0.0 ELSE sum_len::DOUBLE / wc END) <= 10.0
                AND (CASE WHEN wc = 0 THEN 0.0 ELSE (hash_cnt + ell_cnt)::DOUBLE / wc END) <= 0.1
                AND (CASE WHEN nl = 0 THEN 0.0 ELSE bullet_lines::DOUBLE / nl END) <= 0.9
                AND (CASE WHEN nl = 0 THEN 0.0 ELSE ell_lines::DOUBLE / nl END) <= 0.3
                AND (CASE WHEN wc = 0 THEN 0.0 ELSE alpha_words::DOUBLE / wc END) >= 0.8
                AND stop_hits >= 1),
            normed AS (
              SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
              FROM kept),
            toked AS (
              SELECT doc_id, len(norm)::BIGINT AS nlen,
                list_filter(string_split(norm, ' '), t -> len(t) > 0) AS ntoks
              FROM normed),
            grams AS (
              SELECT doc_id, nlen, unnest(
                CASE WHEN len(ntoks) <= 2 THEN [array_to_string(ntoks, ' ')]
                     ELSE list_transform(range(len(ntoks) - 1), i -> ntoks[i + 1] || ' ' || ntoks[i + 2]) END
              ) AS gram
              FROM toked WHERE len(ntoks) > 0),
            gram_counts AS (
              SELECT doc_id, gram, nlen, COUNT(*) AS cnt
              FROM grams GROUP BY doc_id, gram, nlen),
            top_gram AS (
              SELECT doc_id,
                CAST(cnt * len(gram) AS DOUBLE) / GREATEST(nlen, 1) AS f
              FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn
                FROM gram_counts)
              WHERE rn = 1),
            surviving AS (
              SELECT k.lang, k.word_count
              FROM kept k LEFT JOIN top_gram t ON t.doc_id = k.doc_id
              WHERE COALESCE(t.f, 0.0) <= 0.1)
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(word_count) AS BIGINT) AS total_words,
                   CAST(SUM(word_count) // COUNT(*) AS BIGINT) AS mean_words
            FROM surviving GROUP BY 1 ORDER BY 1"""))

  /** NN-Descent kNN-graph construction ([[graft.ml.Similarity
    * .nnDescentKnn]] — the graph-based member of the ANN family beside
    * brute/IVF/PQ/LSH): deterministic ring init, two local-join rounds,
    * winners under the (cosine DESC, id ASC) total order. The oracle
    * replays every round as a generated AS-MATERIALIZED CTE chain (the
    * LPA-chain convention); cosines are ROUNDed on output only — doubles
    * order the selection, they are never aggregated (the q27 contract). */
  val q391_nn_descent = Q(
    "q391_nn_descent",
    (s, dir) => {
      graft.ml.Similarity
        .nnDescentKnn(t(s, dir, "embeddings"), k = 5, rounds = 2)
        .select(col("vec_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("vec_id", "rank")
    },
    Some {
      val k = 5
      def cos(vx: String, vy: String) =
        s"list_dot_product($vx.vec, $vy.vec) / " +
          s"(sqrt(list_dot_product($vx.vec, $vx.vec)) * sqrt(list_dot_product($vy.vec, $vy.vec)))"
      def roundSql(i: Int, prev: String): String =
        s"""u$i AS MATERIALIZED (
              SELECT x AS c, y AS w FROM $prev UNION SELECT y, x FROM $prev),
            c$i AS MATERIALIZED (
              SELECT DISTINCT a.w AS x, b.w AS y
              FROM u$i a JOIN u$i b ON a.c = b.c AND a.w <> b.w),
            a$i AS MATERIALIZED (SELECT x, y FROM $prev UNION SELECT x, y FROM c$i),
            s$i AS MATERIALIZED (
              SELECT a$i.x, a$i.y, ${cos("vx", "vy")} AS cs
              FROM a$i JOIN v vx ON vx.vec_id = a$i.x JOIN v vy ON vy.vec_id = a$i.y),
            e$i AS MATERIALIZED (
              SELECT x, y FROM (
                SELECT x, y, ROW_NUMBER() OVER (PARTITION BY x ORDER BY cs DESC, y) AS rn
                FROM s$i) WHERE rn <= $k)"""
      s"""WITH v AS MATERIALIZED (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   list_transform(embedding, e -> CAST(e AS DOUBLE)) AS vec
            FROM embeddings),
          e0 AS MATERIALIZED (
            SELECT vec_id AS x, (vec_id + m) % (SELECT COUNT(*) FROM v) AS y
            FROM v, UNNEST([1, 2, 3, 4, 5]) AS t(m)),
          ${roundSql(1, "e0")},
          ${roundSql(2, "e1")},
          fin AS (
            SELECT e2.x, e2.y, ${cos("vx", "vy")} AS cs
            FROM e2 JOIN v vx ON vx.vec_id = e2.x JOIN v vy ON vy.vec_id = e2.y)
          SELECT x AS vec_id, CAST(rn AS BIGINT) AS rank, y AS neighbor_id,
                 ROUND(cs, 4) AS cosine
          FROM (SELECT x, y, cs,
                       ROW_NUMBER() OVER (PARTITION BY x ORDER BY cs DESC, y) AS rn
                FROM fin) WHERE rn <= $k
          ORDER BY vec_id, rank"""
    })

  /** Hash-derandomized permutation test ([[graft.ml.Regress
    * .permutationTestHashed]] — the assumption-free A/B significance
    * check: 64 deterministic relabelings, mean-difference comparison by
    * exact integer cross-multiplication, add-one p. Planted: arm b gains
    * +60 on '1-URGENT' — p hits the 1/65 floor = 15 384 ppm while the
    * null priorities spread over ~0.1–0.8 (measured on live data; the
    * spread itself was the fix signal — see the operator scaladoc on why
    * the pick hash must be SQUARED). */
  val q392_permutation_test = Q(
    "q392_permutation_test",
    (s, dir) => {
      val d = t(s, dir, "orders").select(
        col("o_orderpriority").as("g"),
        col("o_orderkey").as("k"),
        when(pmod(col("o_orderkey"), lit(2L)) === 1L, "b").otherwise("a").as("arm"),
        (pmod(col("o_orderkey") * 48271L, lit(1000L)) +
          when(col("o_orderpriority") === "1-URGENT" &&
            pmod(col("o_orderkey"), lit(2L)) === 1L, 60L).otherwise(0L)).as("v"))
      graft.ml.Regress
        .permutationTestHashed(d, "k", "v", "arm", "a", "b", Seq("g"), reps = 64)
        .orderBy("g")
    },
    Some("""WITH d AS (
              SELECT o_orderpriority AS g, o_orderkey AS k,
                     (o_orderkey % 2 = 1) AS isb,
                     (o_orderkey * 48271) % 1000 +
                       CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 1
                            THEN 60 ELSE 0 END AS v
              FROM orders),
            obs AS (
              SELECT g,
                     SUM(CASE WHEN NOT isb THEN 1 ELSE 0 END) AS na,
                     SUM(CASE WHEN NOT isb THEN v ELSE 0 END) AS sa,
                     SUM(CASE WHEN isb THEN 1 ELSE 0 END) AS nb,
                     SUM(CASE WHEN isb THEN v ELSE 0 END) AS sb
              FROM d GROUP BY 1),
            reps AS (
              SELECT g, i,
                     SUM(CASE WHEN pick THEN 1 ELSE 0 END) AS nai,
                     SUM(CASE WHEN pick THEN v ELSE 0 END) AS sai,
                     COUNT(*) AS ni, SUM(v) AS si
              FROM (SELECT g, v, i,
                           (h * h) % 2147483647 < 1073741823 AS pick
                    FROM (SELECT g, v, i,
                                 ((k % 2147483647) * 2654435761 + i * 48271 + 1)
                                   % 2147483647 AS h
                          FROM d, UNNEST(range(64)) AS t(i)))
              GROUP BY 1, 2),
            ext AS (
              SELECT r.g,
                     CASE WHEN nai = 0 OR ni - nai = 0 THEN 1
                          WHEN abs(CAST(sai AS HUGEINT) * (ni - nai) -
                                   CAST(si - sai AS HUGEINT) * nai) *
                               (CAST(na AS HUGEINT) * nb) >=
                               abs(CAST(sa AS HUGEINT) * nb -
                                   CAST(sb AS HUGEINT) * na) *
                               (CAST(nai AS HUGEINT) * (ni - nai))
                          THEN 1 ELSE 0 END AS ex
              FROM reps r JOIN obs o ON r.g = o.g)
            SELECT obs.g, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   CAST(abs(CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na)
                     AS BIGINT) AS t_num,
                   x.n_extreme,
                   CAST(((1 + x.n_extreme) * 1000000) // 65 AS BIGINT) AS p_ppm
            FROM obs JOIN (SELECT g, SUM(ex)::BIGINT AS n_extreme FROM ext GROUP BY 1) x
              ON obs.g = x.g
            ORDER BY 1"""))

  /** Vocabulary richness ([[graft.text.TextFunctions.vocabularyRichness]]
    * — bias-corrected Chao1 lower bound + Good–Turing unseen mass over
    * the per-language token census; the "is more crawl worth it" report,
    * exact ppm rationals of the frequency-of-frequencies). */
  val q393_vocab_richness = Q(
    "q393_vocab_richness",
    (s, dir) => {
      graft.text.TextFunctions
        .vocabularyRichness(t(s, dir, "documents"), "text", Seq("lang"))
        .orderBy("lang")
    },
    Some("""WITH toks AS (
              SELECT lang,
                     unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                        x -> len(x) > 0)) AS tok
              FROM documents),
            cen AS (SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
            agg AS (
              SELECT lang, SUM(c) AS n_tokens, COUNT(*) AS vocab,
                     SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
                     SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
              FROM cen GROUP BY 1)
            SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(vocab AS BIGINT) AS vocab,
                   CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
                   CAST(vocab * 1000000 +
                     (CAST(f1 AS HUGEINT) * (f1 - 1) * 1000000) // (2 * (f2 + 1))
                     AS BIGINT) AS chao1_ppm,
                   CAST((f1 * 1000000) // n_tokens AS BIGINT) AS unseen_mass_ppm
            FROM agg ORDER BY 1"""))

  /** Wald–Wolfowitz runs test ([[graft.operators.Drift.runsTest]] — the
    * residual-sign randomness monitor over the 50-day grid per priority;
    * planted: '1-URGENT' is TRUE for the first half only (2 runs →
    * verdict −1 clustering); nulls carry the squared-hash sign (the q392
    * scheme — a plain modular sign ALTERNATED regularly enough to read
    * verdict +1, caught by eyeballing the output) and stay at 0). */
  val q394_runs_test = Q(
    "q394_runs_test",
    (s, dir) => {
      val series = t(s, dir, "orders")
        .select(col("o_orderpriority").as("g"), pmod(col("o_orderkey"), lit(50L)).as("d"))
        .distinct()
        .withColumn("__h", pmod(col("d") * 2654435761L + 1L, lit(2147483647L)))
        .withColumn("b",
          when(col("g") === "1-URGENT", col("d") < 25L)
            .otherwise(pmod(col("__h") * col("__h"), lit(2147483647L)) < 1073741823L))
        .drop("__h")
      graft.operators.Drift.runsTest(series, "d", "b", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH series AS (
              SELECT g, d,
                     CASE WHEN g = '1-URGENT' THEN d < 25
                          ELSE (h * h) % 2147483647 < 1073741823 END AS b
              FROM (SELECT g, d, (d * 2654435761 + 1) % 2147483647 AS h
                    FROM (SELECT DISTINCT o_orderpriority AS g, o_orderkey % 50 AS d
                          FROM orders))),
            runs AS (
              SELECT g, COUNT(*) AS n,
                     SUM(CASE WHEN b THEN 1 ELSE 0 END) AS n_true,
                     SUM(CASE WHEN pb IS NULL OR pb <> b THEN 1 ELSE 0 END) AS runs
              FROM (SELECT g, b, LAG(b) OVER (PARTITION BY g ORDER BY d) AS pb
                    FROM series)
              GROUP BY 1),
            st AS (
              SELECT g, n, n_true, runs,
                     2 * n_true * (n - n_true) AS p,
                     runs * n - n - 2 * n_true * (n - n_true) AS dd
              FROM runs)
            SELECT g, CAST(n AS BIGINT) AS n, CAST(n_true AS BIGINT) AS n_true,
                   CAST(runs AS BIGINT) AS runs,
                   CAST(CASE WHEN n_true = 0 OR n = n_true OR n < 2 THEN 0
                        WHEN 625 * CAST(dd AS HUGEINT) * dd * (n - 1) >=
                             2401 * CAST(p AS HUGEINT) * (p - n)
                        THEN CASE WHEN dd > 0 THEN 1 WHEN dd < 0 THEN -1 ELSE 0 END
                        ELSE 0 END AS BIGINT) AS verdict
            FROM st ORDER BY 1"""))

  /** Kendall's W ([[graft.operators.RankStats.kendallW]] — judge
    * concordance as the normalized Friedman statistic, W = T/(m(k−1)):
    * 6 judges × 10 items per priority; '1-URGENT' judges see a dominant
    * item-quality signal (W = exactly 10⁶ — identical rankings), the
    * null priorities rank pure judge-specific noise (W ≈ 0.09). */
  val q395_kendall_w = Q(
    "q395_kendall_w",
    (s, dir) => {
      val groups = t(s, dir, "orders").select(col("o_orderpriority").as("g")).distinct()
      val obs = groups
        .select(col("g"), explode(sequence(lit(0L), lit(5L))).as("j"))
        .select(col("g"), col("j"), explode(sequence(lit(0L), lit(9L))).as("i"))
        .withColumn("v",
          when(col("g") === "1-URGENT",
            col("i") * 100L + pmod(col("j") * 7L + col("i") * 3L, lit(10L)))
            .otherwise(pmod(col("i") * 13L + col("j") * 29L + 5L, lit(97L))))
      graft.operators.RankStats.kendallW(obs, "j", "i", "v", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH groups AS (SELECT DISTINCT o_orderpriority AS g FROM orders),
            obs AS (
              SELECT g, j, i,
                     CASE WHEN g = '1-URGENT'
                          THEN i * 100 + (j * 7 + i * 3) % 10
                          ELSE (i * 13 + j * 29 + 5) % 97 END AS v
              FROM groups, UNNEST(range(6)) AS tj(j), UNNEST(range(10)) AS ti(i)),
            ranked AS (
              SELECT g, j, i,
                     2 * (RANK() OVER (PARTITION BY g, j ORDER BY v) - 1) +
                       COUNT(*) OVER (PARTITION BY g, j, v) + 1 AS r2
              FROM obs),
            peri AS (
              SELECT g, i, SUM(r2) AS R2, COUNT(*) AS m, SUM(r2 * r2) AS a4j
              FROM ranked GROUP BY 1, 2),
            agg AS (
              SELECT g, MAX(m) AS m, 10 AS k,
                     SUM(CAST(R2 - m * 11 AS HUGEINT) * (R2 - m * 11)) AS num0,
                     SUM(CAST(a4j AS HUGEINT)) AS a4
              FROM peri GROUP BY 1),
            st AS (
              SELECT g, m, k,
                     CASE WHEN a4 = CAST(m AS HUGEINT) * 10 * 121 THEN NULL
                          ELSE CAST((9 * num0 * 1000000) //
                            (a4 - CAST(m AS HUGEINT) * 10 * 121) AS BIGINT)
                     END AS chi2_upm
              FROM agg)
            SELECT g, CAST(m AS BIGINT) AS n_judges, CAST(k AS BIGINT) AS k,
                   CASE WHEN chi2_upm IS NULL THEN NULL
                        ELSE CAST(chi2_upm // (m * 9) AS BIGINT) END AS w_ppm,
                   chi2_upm,
                   CASE WHEN chi2_upm IS NULL OR chi2_upm <= 0 THEN 1000000
                        ELSE LEAST(1000000,
                          CAST((2 * 9 * 1000000000000::HUGEINT) // chi2_upm AS BIGINT))
                   END AS p_ppm
            FROM st ORDER BY g"""))

  /** Page's trend test ([[graft.operators.RankStats.pageTrendTest]] — the
    * DIRECTIONAL Friedman over the q386 block design on a tie-free value
    * grid (v = noise·4 + s makes within-block values provably distinct);
    * '1-URGENT' improves with system order (+800·s lift, trend +1),
    * '5-LOW' degrades (−800·s, trend −1), the rest sit at 0. */
  val q396_page_trend = Q(
    "q396_page_trend",
    (s, dir) => {
      val blocks = t(s, dir, "orders")
        .select(col("o_orderpriority").as("g"), pmod(col("o_orderkey"), lit(400L)).as("b"))
        .distinct()
      val obs = blocks
        .select(col("g"), col("b"), explode(sequence(lit(0L), lit(3L))).as("sy"))
        .withColumn("v",
          pmod((col("b") + 7L) * (col("sy") + 3L) * 48271L, lit(1000L)) * 4L + col("sy") +
            when(col("g") === "1-URGENT", col("sy") * 800L)
              .when(col("g") === "5-LOW", -col("sy") * 800L).otherwise(0L))
      graft.operators.RankStats.pageTrendTest(obs, "b", "sy", "v", Seq("g"))
        .orderBy("g")
    },
    Some("""WITH blocks AS (
              SELECT DISTINCT o_orderpriority AS g, o_orderkey % 400 AS b FROM orders),
            obs AS (
              SELECT g, b, sy,
                     ((b + 7) * (sy + 3) * 48271) % 1000 * 4 + sy +
                       CASE WHEN g = '1-URGENT' THEN sy * 800
                            WHEN g = '5-LOW' THEN -sy * 800 ELSE 0 END AS v
              FROM blocks, UNNEST([0, 1, 2, 3]) AS t(sy)),
            ranked AS (
              SELECT g, b, sy,
                     2 * ROW_NUMBER() OVER (PARTITION BY g, b ORDER BY v) AS r2
              FROM obs),
            agg AS (
              SELECT g, COUNT(DISTINCT b) AS n_blocks, 4 AS k,
                     SUM((sy + 1) * r2) AS l2
              FROM ranked GROUP BY 1),
            st AS (
              SELECT g, n_blocks, k, l2,
                     2 * CAST(l2 AS HUGEINT) - CAST(n_blocks AS HUGEINT) * 4 * 25 AS d
              FROM agg)
            SELECT g, CAST(n_blocks AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
                   CAST(l2 AS BIGINT) AS l2,
                   CAST(CASE WHEN 22500 * d * d >=
                          9604 * CAST(n_blocks AS HUGEINT) * 16 * 25 * 3
                        THEN CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 ELSE 0 END
                        ELSE 0 END AS BIGINT) AS trend
            FROM st ORDER BY g"""))

  val all: Seq[Q] = Seq(
    q383_curation_plan, q384_sql_model_gate, q385_registry_incremental_dedup,
    q386_friedman, q387_cochran_q, q388_weighted_kappa, q389_mann_kendall,
    q390_curation_quality_gate, q391_nn_descent, q392_permutation_test,
    q393_vocab_richness, q394_runs_test, q395_kendall_w, q396_page_trend)
}
