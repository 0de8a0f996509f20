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
           "features": ["language", "stopword_ratio", "token_count"]},
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
      val batch = d.filter(pmod(col("doc_id"), lit(7L)) === 0L)
        .select(
          (col("doc_id") + 1000000L).as("doc_id"),
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
    Some("""WITH batch AS (
              SELECT doc_id + 1000000 AS doc_id,
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

  val all: Seq[Q] = Seq(q383_curation_plan, q384_sql_model_gate, q385_registry_incremental_dedup)
}
