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

/** Catalog chunk q204-q232 (registration + docs in [[graft.Queries]]). */
private[graft] object Catalog8 {

  /** KMV theta-sketch audience overlap: per event-type pair, the union-
    * sketch common count, kept union size, integer Jaccard estimate, and
    * the exact intersection alongside (the expensive raw-key join the
    * sketch replaces — kept here as the fidelity reference, q200-style).
    * Sketch build rides the custom TopK physical operator (map-side
    * bounded heaps); everything after operates on the groups×k bounded
    * sketch frame. Oracle replays the full hash→min-k→union→rank
    * arithmetic through tools.OracleSql's XXH64-in-SQL. */
  val q204_kmv_overlap = Q(
    "q204_kmv_overlap",
    (s, dir) => {
      import graft.operators.Sketches
      val ev = t(s, dir, "events").select(col("event_type"), col("user_id"))
      val sk = Sketches.kmvSketches(ev, "event_type", "user_id", 64)
      val overlap = Sketches.kmvOverlap(sk, 64)
      val d = ev.distinct().cache()
      val exact = d.as("x")
        .join(d.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("g1"), col("y.event_type").as("g2"))
        .agg(count(lit(1)).as("exact_common"))
      val out = overlap.join(exact, Seq("g1", "g2"), "left")
        .select(
          col("g1"), col("g2"),
          col("kmv_common").cast("long").as("kmv_common"),
          col("union_kept").cast("long").as("union_kept"),
          col("jaccard_est_ppm").cast("long").as("jaccard_est_ppm"),
          coalesce(col("exact_common"), lit(0L)).cast("long").as("exact_common"))
        .orderBy("g1", "g2")
      val materialized = out.localCheckpoint(true)
      d.unpersist()
      materialized
    },
    Some {
      import graft.tools.OracleSql._
      val dist = "SELECT DISTINCT event_type AS g, user_id FROM events"
      val hashed = xxhash64LongStages(dist, "user_id", "h")
      s"""WITH hashed AS ($hashed),
            hs AS (SELECT DISTINCT g, h FROM hashed),
            sk AS (SELECT g, h FROM (
                     SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rk
                     FROM hs) WHERE rk <= 64),
            gs AS (SELECT DISTINCT g FROM sk),
            pairs AS (SELECT a.g AS g1, b.g AS g2 FROM gs a JOIN gs b ON a.g < b.g),
            merged AS (SELECT g1, g2, h, COUNT(DISTINCT mg) AS sides FROM (
                         SELECT p.g1, p.g2, s.g AS mg, s.h
                         FROM pairs p JOIN sk s ON s.g = p.g1 OR s.g = p.g2)
                       GROUP BY 1, 2, 3),
            kept AS (SELECT * FROM (
                       SELECT *, ROW_NUMBER() OVER (PARTITION BY g1, g2 ORDER BY h) AS rk
                       FROM merged) WHERE rk <= 64),
            est AS (SELECT g1, g2,
                           CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS kmv_common,
                           CAST(COUNT(*) AS BIGINT) AS union_kept
                    FROM kept GROUP BY 1, 2),
            d AS ($dist),
            exact AS (SELECT x.g AS g1, y.g AS g2, CAST(COUNT(*) AS BIGINT) AS exact_common
                      FROM d x JOIN d y ON x.user_id = y.user_id AND x.g < y.g
                      GROUP BY 1, 2)
          SELECT e.g1, e.g2, e.kmv_common, e.union_kept,
                 CAST((1000000 * e.kmv_common) // e.union_kept AS BIGINT) AS jaccard_est_ppm,
                 COALESCE(x.exact_common, 0) AS exact_common
          FROM est e LEFT JOIN exact x ON e.g1 = x.g1 AND e.g2 = x.g2
          ORDER BY 1, 2"""
    })

  /** Model-based quality gate via the hashing trick: every document scored
    * by a hashed-feature linear classifier — ONE codegen expression
    * ([[graft.plans.HashedLinearScore]]), so the whole corpus is scored
    * map-side at scan speed, the shape a learned quality filter must have
    * at 100 TB. Weights are the deterministic integer ramp (b mod 7) − 3
    * over 4096 buckets, so per-source pass/score aggregates are exact
    * BIGINTs; the oracle replays tokenize→xxhash64→bucket→ramp→sum in SQL. */
  val q205_hash_classifier = Q(
    "q205_hash_classifier",
    (s, dir) => {
      import graft.text.TextFunctions
      import org.apache.spark.sql.graft.ExprColumn
      val d = t(s, dir, "documents")
        .withColumn("toks", TextFunctions.tokens(TextFunctions.normalize(col("text"))))
        .withColumn("score",
          ExprColumn(graft.plans.HashedLinearScore(ExprColumn.expr(col("toks")), 4096)))
      d.groupBy(col("source"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          count(col("score")).cast("long").as("n_scored"),
          sum(when(col("score") > 0, 1L).otherwise(0L)).cast("long").as("n_pass"),
          coalesce(sum(col("score")), lit(0L)).cast("long").as("sum_score"))
        .orderBy("source")
    },
    Some {
      import graft.tools.OracleSql._
      val base = s"SELECT doc_id, source, " +
        s"list_filter(string_split(${normalizeSql("text")}, ' '), t -> len(t) > 0) AS toks " +
        "FROM documents"
      val tk = s"SELECT doc_id, unnest(toks) AS tok FROM ($base)"
      val hashed = xxhash64Stages(tk, "tok", "hv", pfx = "__q205")
      s"""WITH base AS ($base),
            hashed AS ($hashed),
            sc AS (SELECT doc_id,
                          CAST(SUM(((((hv % 4096) + 4096) % 4096) % 7) - 3) AS BIGINT) AS score
                   FROM hashed GROUP BY 1)
          SELECT b.source,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COUNT(sc.score) AS BIGINT) AS n_scored,
                 CAST(SUM(CASE WHEN sc.score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
                 CAST(COALESCE(SUM(sc.score), 0) AS BIGINT) AS sum_score
          FROM base b LEFT JOIN sc ON b.doc_id = sc.doc_id
          GROUP BY 1 ORDER BY 1"""
    })

  /** Column-level lineage report over a four-table revenue pipeline —
    * Catalyst-native governance tooling ([[graft.plans.Lineage]]): the
    * analyzed plan's ExprIds are folded bottom-up into per-output-column
    * source sets, no data touched. The oracle is the hand-derived expected
    * mapping (the strongest form for constructed inputs: the answer comes
    * from the pipeline's definition, not from replaying the extractor). */
  val q206_lineage = Q(
    "q206_lineage",
    (s, dir) => {
      val pipeline = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("n_name").as("nation_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
      graft.plans.Lineage.report(pipeline).orderBy("out_col")
    },
    Some("""SELECT * FROM (VALUES
              ('n_orders', 'orders.o_orderkey'),
              ('n_rows', 'literal'),
              ('nation_name', 'nation.n_name'),
              ('revenue', 'lineitem.l_discount,lineitem.l_extendedprice')
            ) AS v(out_col, sources) ORDER BY out_col"""))

  /** Corpus Zipf-law audit: global word-frequency ranks bucketed by
    * floor-log2(rank) with per-bucket counts and frequency mass — the
    * vocabulary-shape report behind tokenizer and filtering decisions.
    * One word-count aggregate (map-side combine over the corpus), then a
    * single global sort of the VOCABULARY (≪ corpus; the only global
    * stage touches distinct words, never documents). Integer-only via the
    * floor-log2 `length(bin(rank)) − 1` spelling, bit-stable across
    * engines. */
  val q207_zipf = Q(
    "q207_zipf",
    (s, dir) => {
      import graft.text.TextFunctions
      import org.apache.spark.sql.expressions.Window
      val words = t(s, dir, "documents")
        .select(explode(TextFunctions.tokens(TextFunctions.normalize(col("text")))).as("w"))
      val freq = words.groupBy(col("w")).agg(count(lit(1)).as("f"))
      freq
        .withColumn("rank", row_number().over(Window.orderBy(col("f").desc, col("w"))))
        .withColumn("bucket", expr("length(bin(rank)) - 1").cast("long"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).cast("long").as("n_words"),
          sum(col("f")).cast("long").as("freq_mass"),
          max(col("f")).cast("long").as("max_f"),
          min(col("f")).cast("long").as("min_f"))
        .orderBy("bucket")
    },
    Some {
      import graft.tools.OracleSql._
      s"""WITH toks AS (SELECT unnest(list_filter(string_split(${normalizeSql("text")}, ' '),
                                      t -> len(t) > 0)) AS w
                        FROM documents),
            f AS (SELECT w, COUNT(*) AS f FROM toks GROUP BY 1),
            r AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS rank FROM f)
          SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_words,
                 CAST(SUM(f) AS BIGINT) AS freq_mass,
                 CAST(MAX(f) AS BIGINT) AS max_f,
                 CAST(MIN(f) AS BIGINT) AS min_f
          FROM r GROUP BY 1 ORDER BY 1"""
    })

  /** Product-quantization ANN (Jégou '11) — the beyond-IVF scale path:
    * integer-exact PQ end to end ([[graft.ml.Pq]]): floor-quantized grid,
    * 2 integer-Lloyd rounds per subspace (M=8 × K=4 codebooks over 64
    * dims), map-side codegen encoding, broadcast ADC lookup tables, top-5
    * per query via the custom TopK operator, with the exact quantized L2²
    * audited alongside on the result rows. The oracle replays EVERY stage
    * value-exactly in DuckDB — quantization, seeding, both Lloyd rounds
    * (materialized iterated CTEs), encoding, ADC sums, ranking, and the
    * 64-term exact distance. */
  val q208_pq_ann = Q(
    "q208_pq_ann",
    (s, dir) => {
      import graft.ml.Pq
      import graft.operators.TopK
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val M = 8; val K = 4; val SD = 8; val ITERS = 2; val SCALE = 64
      val emb = t(s, dir, "embeddings")
        .select(
          col("vec_id").cast("long").as("vec_id"),
          Pq.quantized(col("embedding"), SCALE).as("qv"))
        .cache() // drives the training iteration and the encode pass
      val cb = Pq.train(emb, "vec_id", "qv", M, K, SD, ITERS)
      val encoded = Pq.encode(emb, "qv", cb)
      val queries = emb.filter(col("vec_id") < 5).collect()
      val qdf = queries.toSeq
        .map(r => (r.getLong(0), Pq.adcTable(r.getSeq[Long](1), cb)))
        .toDF("query_id", "tab")
      val scored = encoded
        .crossJoin(broadcast(qdf))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("adc_dist", Pq.adcDistance(cb))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("adc_dist"))
      val top = TopK.perGroup(
        scored, Seq("query_id"), Seq(("adc_dist", true), ("neighbor_id", true)), 5)
      val ranked = top.withColumn(
        "rank",
        row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("neighbor_id"))))
      val qq = queries.toSeq.map(r => (r.getLong(0), r.getSeq[Long](1))).toDF("query_id", "qq")
      val out = ranked
        .join(emb.select(col("vec_id").as("neighbor_id"), col("qv").as("qn")), "neighbor_id")
        .join(broadcast(qq), "query_id")
        .withColumn("exact_d2",
          expr("aggregate(zip_with(qn, qq, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
        .select(
          col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
          col("adc_dist").cast("long").as("adc_dist"),
          col("exact_d2").cast("long").as("exact_d2"))
        .orderBy("query_id", "rank")
      val materialized = out.localCheckpoint(true)
      emb.unpersist()
      materialized
    },
    Some(pqAdcOracleSql(qFilter = "vec_id < 5")))

  /** The full PQ replay (quantize → seed → Lloyd rounds → encode → ADC →
    * rank → exact distance) as a parameterized oracle builder — shared by
    * q208 and the registry-codebook-artifact query (q401), whose values
    * must be identical because artifact resolution only CACHES the
    * training result. `qFilter` selects the query vectors. */
  private[graft] def pqAdcOracleSql(qFilter: String): String = {
      val M = 8; val K = 4; val SD = 8; val ITERS = 2; val SCALE = 64
      def dist(sv: String, cw: String): String =
        (1 to SD).map(d => s"(($sv[$d] - $cw[$d]) * ($sv[$d] - $cw[$d]))").mkString(" + ")
      val sb = new StringBuilder
      sb ++= s"""WITH q AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * $SCALE) AS BIGINT)) AS qv
                 FROM embeddings),
            ranked0 AS (SELECT vec_id, qv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk FROM q),
            seeds AS MATERIALIZED (
              SELECT CAST(r.range AS INT) AS c, k.qv
              FROM range($K) r JOIN ranked0 k
                ON k.rk = 1 + r.range * ((SELECT COUNT(*) FROM q) // $K)),
            subv AS MATERIALIZED (
              SELECT vec_id, CAST(mr.range AS INT) AS m,
                     list_slice(qv, mr.range * $SD + 1, mr.range * $SD + $SD) AS sv
              FROM q CROSS JOIN range($M) mr),
            cb0 AS MATERIALIZED (
              SELECT CAST(mr.range AS INT) AS m, s.c,
                     list_slice(s.qv, mr.range * $SD + 1, mr.range * $SD + $SD) AS cw
              FROM range($M) mr CROSS JOIN seeds s),"""
      val cwUpdate = (1 to SD)
        .map(d => s"CAST(FLOOR(CAST(SUM(b.sv[$d]) AS DOUBLE) / COUNT(*)) AS BIGINT)")
        .mkString(", ")
      for (i <- 0 until ITERS) {
        sb ++= s"""
            a$i AS MATERIALIZED (
              SELECT vec_id, m, sv, c,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS rn
              FROM (SELECT s.vec_id, s.m, s.sv, cb.c, ${dist("s.sv", "cb.cw")} AS dist
                    FROM subv s JOIN cb$i cb ON cb.m = s.m)),
            cb${i + 1} AS MATERIALIZED (
              SELECT p.m, p.c, CASE WHEN u.cnt IS NULL THEN p.cw ELSE u.cw END AS cw
              FROM cb$i p LEFT JOIN (
                SELECT b.m, b.c, COUNT(*) AS cnt, [$cwUpdate] AS cw
                FROM (SELECT * FROM a$i WHERE rn = 1) b GROUP BY 1, 2) u
                ON u.m = p.m AND u.c = p.c),"""
      }
      val exact64 = (1 to M * SD)
        .map(d => s"(a.qv[$d] - b.qv[$d]) * (a.qv[$d] - b.qv[$d])")
        .mkString(" + ")
      sb ++= s"""
            encode AS MATERIALIZED (
              SELECT vec_id, m, c FROM (
                SELECT s.vec_id, s.m, cb.c,
                       ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                          ORDER BY ${dist("s.sv", "cb.cw")}, cb.c) AS rn
                FROM subv s JOIN cb$ITERS cb ON cb.m = s.m) WHERE rn = 1),
            qsub AS (SELECT vec_id AS query_id, m, sv FROM subv WHERE $qFilter),
            tt AS MATERIALIZED (
              SELECT t.query_id, t.m, cb.c, ${dist("t.sv", "cb.cw")} AS d
              FROM qsub t JOIN cb$ITERS cb ON cb.m = t.m),
            adc AS MATERIALIZED (
              SELECT tt.query_id, e.vec_id AS neighbor_id, CAST(SUM(tt.d) AS BIGINT) AS adc_dist
              FROM encode e JOIN tt ON tt.m = e.m AND tt.c = e.c
              WHERE e.vec_id <> tt.query_id GROUP BY 1, 2),
            sel AS (SELECT * FROM (
                      SELECT query_id, neighbor_id, adc_dist,
                             ROW_NUMBER() OVER (PARTITION BY query_id
                                                ORDER BY adc_dist, neighbor_id) AS rank
                      FROM adc) WHERE rank <= 5)
          SELECT s.query_id, CAST(s.rank AS BIGINT) AS rank, s.neighbor_id, s.adc_dist,
                 CAST($exact64 AS BIGINT) AS exact_d2
          FROM sel s
          JOIN q a ON a.vec_id = s.query_id
          JOIN q b ON b.vec_id = s.neighbor_id
          ORDER BY query_id, rank"""
      sb.toString
  }

  /** Greedy k-center coreset (Gonzalez '85 farthest-point traversal) over
    * integer-quantized embeddings — the maximally-diverse-subset primitive
    * of data curation ([[graft.ml.Coreset]]). Each round is one map-side
    * running-min update against only the newest pick plus a top-1 reduce;
    * the oracle replays all 8 rounds as materialized CTE stages with
    * explicit 64-term integer distances, ties to smallest id. */
  val q209_coreset = Q(
    "q209_coreset",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").cast("long").as("vec_id"),
          graft.ml.Pq.quantized(col("embedding"), 64).as("qv"))
      val picks = graft.ml.Coreset.kCenterGreedy(emb, "vec_id", "qv", 8)
      picks.map { case (r, id, d) => (r.toLong, id, d) }
        .toDF("round", "vec_id", "maxmin_d2")
        .orderBy("round")
    },
    Some {
      val K = 8
      def dist(a: String, b: String): String =
        (1 to 64).map(d => s"(($a[$d] - $b[$d]) * ($a[$d] - $b[$d]))").mkString(" + ")
      val sb = new StringBuilder
      sb ++= """WITH q AS (SELECT CAST(vec_id AS BIGINT) AS id,
                   list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
                 FROM embeddings),
            p0 AS MATERIALIZED (SELECT id, qv FROM q ORDER BY id LIMIT 1),
            m0 AS MATERIALIZED (SELECT q.id, q.qv, """ + dist("q.qv", "s.qv") +
        " AS d FROM q CROSS JOIN p0 s),"
      for (i <- 1 until K) {
        val excl = (0 until i).map(j => s"SELECT id FROM p$j").mkString(" UNION ALL ")
        sb ++= s"""
            p$i AS MATERIALIZED (SELECT id, qv, d FROM m${i - 1}
                                 WHERE id NOT IN ($excl)
                                 ORDER BY d DESC, id LIMIT 1),"""
        if (i < K - 1) {
          sb ++= s"""
            m$i AS MATERIALIZED (SELECT m.id, m.qv,
                                        LEAST(m.d, ${dist("m.qv", "p.qv")}) AS d
                                 FROM m${i - 1} m CROSS JOIN p$i p),"""
        }
      }
      val rounds = (s"SELECT 0 AS round, id AS vec_id, 0 AS maxmin_d2 FROM p0" +:
        (1 until K).map(i => s"SELECT $i, id, d FROM p$i")).mkString(" UNION ALL ")
      sb ++= s"""
            res AS ($rounds)
          SELECT CAST(round AS BIGINT) AS round, vec_id,
                 CAST(maxmin_d2 AS BIGINT) AS maxmin_d2
          FROM res ORDER BY round"""
      sb.toString
    })

  /** A/B experiment readout with an integer-exact decision statistic:
    * users hash-split into arms, per-event-type 2×2 contingency tables,
    * and significance decided by the cross-multiplied Pearson χ² test
    * `25·N·(ad−bc)² ≥ 96·r₁·r₂·c₁·c₂` (χ²₁ ≥ 3.84 as the exact rational
    * 96/25) — no libm, no float flap; the same integer-decision move as
    * the TVD/CUSUM monitors. BIGINT products are safe through ~sf0.3
    * (documented bound: N·(ad−bc)² < 2⁶³/25); beyond that the statistic
    * needs the decimal path. */
  val q210_ab_chisq = Q(
    "q210_ab_chisq",
    (s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(max(col("value") > 75.0).as("conv"))
        .withColumn("arm", pmod(xxhash64(col("user_id")), lit(2)))
      perUser
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("arm") === 0 && col("conv"), 1L).otherwise(0L)).as("a"),
          sum(when(col("arm") === 0 && !col("conv"), 1L).otherwise(0L)).as("b"),
          sum(when(col("arm") === 1 && col("conv"), 1L).otherwise(0L)).as("c"),
          sum(when(col("arm") === 1 && !col("conv"), 1L).otherwise(0L)).as("d"))
        .withColumn("lhs",
          lit(25L) * (col("a") + col("b") + col("c") + col("d")) *
            (col("a") * col("d") - col("b") * col("c")) *
            (col("a") * col("d") - col("b") * col("c")))
        .withColumn("rhs",
          lit(96L) * (col("a") + col("b")) * (col("c") + col("d")) *
            (col("a") + col("c")) * (col("b") + col("d")))
        .withColumn("significant",
          when(col("rhs") > 0 && col("lhs") >= col("rhs"), 1L).otherwise(0L))
        .select(col("event_type"),
          col("a").cast("long").as("a"), col("b").cast("long").as("b"),
          col("c").cast("long").as("c"), col("d").cast("long").as("d"),
          col("significant"))
        .orderBy("event_type")
    },
    Some {
      import graft.tools.OracleSql._
      val pu = "SELECT event_type, user_id, " +
        "MAX(CASE WHEN value > 75.0 THEN 1 ELSE 0 END) AS conv " +
        "FROM events GROUP BY 1, 2"
      val hashed = xxhash64LongStages(pu, "user_id", "h")
      s"""WITH hashed AS ($hashed),
            armd AS (SELECT event_type, conv, ((h % 2) + 2) % 2 AS arm FROM hashed),
            ct AS (SELECT event_type,
                     CAST(SUM(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
                     CAST(SUM(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
                     CAST(SUM(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                     CAST(SUM(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
                   FROM armd GROUP BY 1)
          SELECT event_type, a, b, c, d,
                 CAST(CASE WHEN 96 * (a + b) * (c + d) * (a + c) * (b + d) > 0
                            AND 25 * (a + b + c + d) * (a * d - b * c) * (a * d - b * c)
                                >= 96 * (a + b) * (c + d) * (a + c) * (b + d)
                           THEN 1 ELSE 0 END AS BIGINT) AS significant
          FROM ct ORDER BY 1"""
    })

  /** Video near-duplicate detection by frame-signature shingles — the
    * multimodal face of the dedup family: REAL AVI payloads are demuxed
    * (q95's RIFF walker), per-frame solid-gray luminance recovered exactly
    * (dyadic means × 256 → integers), consecutive-frame 2-gram shingles
    * formed per video, and pairs scored by exact shingle Jaccard through
    * the inverted-index equi-join (never all-pairs). The corpus
    * construction plants near-dups (same footage, new last frame) and
    * distractors; the oracle derives every expected pair from the
    * (v, j) gray arithmetic — the demuxer never touches the oracle, so a
    * codec bug diverges the hash. */
  val q211_video_neardup = Q(
    "q211_video_neardup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val corpus = Multimodal.syntheticVideoCorpus(s, 120)
      val frames = Multimodal.sampleVideoFrames(corpus, 1)
        .select(col("id"), col("frame_index"),
          (col("frame_mean") * 256).cast("long").as("gray"))
      val w = Window.partitionBy(col("id")).orderBy(col("frame_index"))
      val sh = frames
        .withColumn("nxt", lead(col("gray"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("id"), (col("gray") * 256 + col("nxt")).as("key"))
        .distinct()
        .cache()
      val sz = sh.groupBy(col("id")).agg(count(lit(1)).as("s"))
      val inter = sh.as("x").join(sh.as("y"), col("x.key") === col("y.key") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
        .agg(count(lit(1)).as("n_shared"))
      val out = inter
        .join(sz.select(col("id").as("id1"), col("s").as("s1")), "id1")
        .join(sz.select(col("id").as("id2"), col("s").as("s2")), "id2")
        .withColumn("n_union", col("s1") + col("s2") - col("n_shared"))
        .withColumn("jaccard_ppm", expr("(1000000 * n_shared) div n_union"))
        .filter(col("jaccard_ppm") >= 500000)
        .select(col("id1"), col("id2"),
          col("n_shared").cast("long").as("n_shared"),
          col("n_union").cast("long").as("n_union"),
          col("jaccard_ppm").cast("long").as("jaccard_ppm"))
        .orderBy("id1", "id2")
      val materialized = out.localCheckpoint(true)
      sh.unpersist()
      materialized
    },
    Some("""WITH fr AS (
              SELECT v.range AS vid, j.range AS j,
                     ((v.range // 3) * 17 + j.range * 23 +
                      CASE WHEN v.range % 3 = 2 OR (v.range % 3 = 1 AND j.range = 5)
                           THEN 101 ELSE 0 END) % 256 AS gray
              FROM range(120) v CROSS JOIN range(6) j),
            sh AS (
              SELECT DISTINCT a.vid, a.gray * 256 + b.gray AS key
              FROM fr a JOIN fr b ON a.vid = b.vid AND b.j = a.j + 1),
            sz AS (SELECT vid, COUNT(*) AS s FROM sh GROUP BY 1),
            inter AS (
              SELECT x.vid AS id1, y.vid AS id2, COUNT(*) AS n_shared
              FROM sh x JOIN sh y ON x.key = y.key AND x.vid < y.vid
              GROUP BY 1, 2),
            sc AS (
              SELECT i.id1, i.id2, i.n_shared, s1.s + s2.s - i.n_shared AS n_union
              FROM inter i JOIN sz s1 ON s1.vid = i.id1 JOIN sz s2 ON s2.vid = i.id2)
            SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
                   CAST(n_shared AS BIGINT) AS n_shared,
                   CAST(n_union AS BIGINT) AS n_union,
                   CAST((1000000 * n_shared) // n_union AS BIGINT) AS jaccard_ppm
            FROM sc WHERE (1000000 * n_shared) // n_union >= 500000
            ORDER BY id1, id2"""))

  /** Filter-funnel attrition audit — the pipeline-composition artifact
    * every curation run ships: sequential gates (language → length →
    * exact-dedup winner → model-based classifier) with per-stage
    * survivor/dropped counts. One pass computes all gate flags map-side
    * (the classifier is the q205 codegen expression, the dedup winner one
    * hash-partitioned window over the survivors); the report is a 5-row
    * stack. The oracle replays every gate — including the xxhash64 dedup
    * hash and the full tokenize→bucket→ramp classifier — in SQL. */
  val q212_filter_funnel = Q(
    "q212_filter_funnel",
    (s, dir) => {
      import graft.text.TextFunctions
      import org.apache.spark.sql.graft.ExprColumn
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
        .withColumn("g_lang", col("lang").isin("en", "de", "fr"))
        .withColumn("g_len", col("n_chars").between(100, 500))
      val head = d.agg(
        count(lit(1)).as("n0"),
        sum(when(col("g_lang"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("g_lang") && col("g_len"), 1L).otherwise(0L)).as("n2"))
      val surv = d.filter(col("g_lang") && col("g_len"))
        .withColumn("rk",
          row_number().over(Window.partitionBy(xxhash64(col("text"))).orderBy(col("doc_id"))))
        .withColumn("score",
          ExprColumn(graft.plans.HashedLinearScore(
            ExprColumn.expr(TextFunctions.tokens(TextFunctions.normalize(col("text")))), 4096)))
      val tail = surv.agg(
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n3"),
        sum(when(col("rk") === 1 && col("score") > 0, 1L).otherwise(0L)).as("n4"))
      head.crossJoin(tail)
        .select(expr(
          """stack(5,
               0L, 'all', n0,
               1L, 'lang_gate', n1,
               2L, 'length_gate', n2,
               3L, 'exact_dedup', n3,
               4L, 'classifier_gate', n4) AS (stage, stage_name, n_out)"""))
        .withColumn("dropped",
          coalesce(lag(col("n_out"), 1).over(Window.orderBy(col("stage"))) - col("n_out"), lit(0L)))
        .select(col("stage").cast("long").as("stage"), col("stage_name"),
          col("n_out").cast("long").as("n_out"), col("dropped").cast("long").as("dropped"))
        .orderBy("stage")
    },
    Some {
      import graft.tools.OracleSql._
      val base = "SELECT doc_id, text, lang, n_chars, " +
        "(lang IN ('en', 'de', 'fr')) AS g1, " +
        "(n_chars BETWEEN 100 AND 500) AS g2 FROM documents"
      val hashed = xxhash64Stages(s"SELECT * FROM ($base) WHERE g1 AND g2", "text", "hv", pfx = "__fh")
      val toks = s"SELECT doc_id, unnest(list_filter(string_split(${normalizeSql("text")}, ' '), " +
        s"t -> len(t) > 0)) AS tok FROM ($base) WHERE g1 AND g2"
      val tokHashed = xxhash64Stages(toks, "tok", "tv", pfx = "__ft")
      s"""WITH d AS ($base),
            r AS (SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY hv ORDER BY doc_id) AS rk
                  FROM ($hashed)),
            sc AS (SELECT doc_id,
                          CAST(SUM(((((tv % 4096) + 4096) % 4096) % 7) - 3) AS BIGINT) AS score
                   FROM ($tokHashed) GROUP BY 1),
            counts AS (
              SELECT 0 AS stage, 'all' AS stage_name, (SELECT COUNT(*) FROM d) AS n_out
              UNION ALL
              SELECT 1, 'lang_gate', (SELECT COUNT(*) FROM d WHERE g1)
              UNION ALL
              SELECT 2, 'length_gate', (SELECT COUNT(*) FROM d WHERE g1 AND g2)
              UNION ALL
              SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM r WHERE rk = 1)
              UNION ALL
              SELECT 4, 'classifier_gate',
                     (SELECT COUNT(*) FROM r JOIN sc USING (doc_id)
                      WHERE rk = 1 AND sc.score > 0))
          SELECT CAST(stage AS BIGINT) AS stage, stage_name,
                 CAST(n_out AS BIGINT) AS n_out,
                 CAST(COALESCE(LAG(n_out) OVER (ORDER BY stage) - n_out, 0) AS BIGINT) AS dropped
          FROM counts ORDER BY stage"""
    })

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    * SIGMOD'03 — the MOSS local fingerprinting algorithm) driving a
    * near-duplicate pair report: n=4-token Rabin–Karp window hashes
    * (map-side [[graft.plans.WindowHash64]]) → rightmost-min selection over
    * w=4-hash windows (map-side [[graft.plans.WinnowSelect]] deque, O(L)
    * per doc) → inverted-index pair join on shared fingerprints. The corpus
    * plants a prefix-padded clone of every 7th document; winnowing's
    * guarantee (any shared ≥ w+n−1-token run shares a fingerprint) makes
    * each clone pair share nearly all selected prints while only ~2/(w+1)
    * of window hashes are ever kept — the local-fingerprint density bound.
    * The oracle replays token XXH64 → the 2⁶⁴-wrapping polynomial window
    * hash (B-power constants via [[graft.tools.OracleSql.mulConstSql]]) →
    * per-window rightmost-argmin → the same pair join, value-exactly. */
  val q213_winnowing = Q(
    "q213_winnowing",
    (s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val clones = base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(lit("intro preamble "), col("text")).as("text"))
      val corpus = base.unionByName(clones)
      Dedup.winnowingNearDuplicates(corpus, "doc_id", "text", n = 4, w = 4, minShared = 3)
        .select(
          col("id1").cast("long").as("id1"),
          col("id2").cast("long").as("id2"),
          col("shared").cast("long").as("shared"),
          col("n_fp1").cast("long").as("n_fp1"),
          col("n_fp2").cast("long").as("n_fp2"))
        .orderBy("id1", "id2")
    },
    Some {
      import graft.tools.OracleSql._
      val B = BigInt("9E3779B97F4A7C15", 16)
      val M = BigInt(2).pow(64)
      val b2 = (B * B).mod(M)
      val b3 = (B * B * B).mod(M)
      val corpus =
        """SELECT doc_id::BIGINT AS doc_id, text FROM documents
           UNION ALL
           SELECT doc_id::BIGINT + 3000000, 'intro preamble ' || text FROM documents
           WHERE doc_id % 7 = 0"""
      val toked =
        s"""SELECT doc_id,
              list_filter(regexp_split_to_array(trim(${normalizeSql("text")}), '\\s+'),
                          t -> len(t) > 0) AS toks
            FROM ($corpus)"""
      val tk =
        s"""SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p
            FROM ($toked)"""
      val hd = xxhash64Stages("SELECT DISTINCT tok FROM tk", "tok", "th", pfx = "__w")
      val wu = addModSql(
        addModSql(
          addModSql(mulConstSql("u0", b3), mulConstSql("u1", b2)),
          mulConstSql("u2", B)),
        "u3")
      s"""WITH tk AS ($tk),
            hd AS ($hd),
            hu AS (SELECT tk.doc_id, tk.p, ${unsignedOf("hd.th")} AS u
                   FROM tk JOIN hd USING (tok)),
            w4 AS (SELECT doc_id, p AS i, u AS u0,
                          LEAD(u, 1) OVER (PARTITION BY doc_id ORDER BY p) AS u1,
                          LEAD(u, 2) OVER (PARTITION BY doc_id ORDER BY p) AS u2,
                          LEAD(u, 3) OVER (PARTITION BY doc_id ORDER BY p) AS u3,
                          COUNT(*) OVER (PARTITION BY doc_id) AS mtok
                   FROM hu),
            hw AS (SELECT doc_id, i, mtok - 3 AS m, $wu AS wu
                   FROM w4 WHERE u3 IS NOT NULL),
            hs AS (SELECT doc_id, i, m,
                          CASE WHEN wu >= 9223372036854775808
                               THEN CAST(wu::HUGEINT - 18446744073709551616::HUGEINT AS BIGINT)
                               ELSE CAST(wu AS BIGINT) END AS h
                   FROM hw),
            exp AS (SELECT doc_id, i, h, i - off AS j
                    FROM hs, unnest(range(4)) AS o(off)
                    WHERE i - off >= 1 AND i - off <= GREATEST(1, m - 3)),
            picks AS (SELECT doc_id, i, h FROM (
                        SELECT *, ROW_NUMBER() OVER (
                          PARTITION BY doc_id, j ORDER BY h ASC, i DESC) AS rn
                        FROM exp) WHERE rn = 1),
            fps AS (SELECT DISTINCT doc_id, h FROM picks),
            sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fps GROUP BY 1),
            pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
                      FROM fps a JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id
                      GROUP BY 1, 2 HAVING COUNT(*) >= 3)
          SELECT p.id1, p.id2, CAST(p.shared AS BIGINT) AS shared,
                 CAST(s1.n_fp AS BIGINT) AS n_fp1, CAST(s2.n_fp AS BIGINT) AS n_fp2
          FROM pairs p
          JOIN sizes s1 ON s1.doc_id = p.id1
          JOIN sizes s2 ON s2.doc_id = p.id2
          ORDER BY p.id1, p.id2"""
    })

  /** Count-Min join-size estimation (Cormode & Muthukrishnan '05 §4.2):
    * the size of `A ⋈ B` on a key, estimated as the min-across-depths
    * inner product of the two sides' sketch rows — two 16-KiB artifacts
    * answer the question a planner asks before choosing a join order, with
    * the one-sided `estimate ≥ exact` guarantee. The exact join sizes ride
    * alongside as the fidelity reference (the q113/q200 convention): the
    * view⋈purchase cross size and the view self-join size (the F2 second
    * frequency moment). Oracle replays the fixed-8-byte XXH64 → bucket →
    * cell-sum → inner-product arithmetic in SQL. */
  val q214_join_size_est = Q(
    "q214_join_size_est",
    (s, dir) => {
      import graft.operators.Sketches
      val ev = t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view").select(col("user_id").as("k"))
      val buys = ev.filter(col("event_type") === "purchase").select(col("user_id").as("k"))
      val cmV = Sketches.buildCountMin(views, array(xxhash64(col("k"))), depth = 4, width = 512)
      val cmB = Sketches.buildCountMin(buys, array(xxhash64(col("k"))), depth = 4, width = 512)
      val cntV = views.groupBy("k").agg(count(lit(1)).as("cv"))
      val cntB = buys.groupBy("k").agg(count(lit(1)).as("cb"))
      val exacts = cntV.join(cntB, Seq("k"))
        .agg(sum(col("cv") * col("cb")).as("exact"))
        .withColumn("pair", lit("view_purchase"))
        .unionByName(
          cntV.agg(sum(col("cv") * col("cv")).as("exact"))
            .withColumn("pair", lit("view_view")))
      val ests = s.createDataFrame(Seq(
        ("view_purchase", cmV.innerProduct(cmB)),
        ("view_view", cmV.innerProduct(cmV)))).toDF("pair", "est")
      exacts.join(ests, Seq("pair"))
        .select(col("pair"), col("est").cast("long").as("est"),
          col("exact").cast("long").as("exact"))
        .orderBy("pair")
    },
    Some {
      import graft.tools.OracleSql._
      def side(tp: String, pfx: String): String = {
        val keys = s"SELECT user_id AS k, COUNT(*) AS c FROM events WHERE event_type = '$tp' GROUP BY 1"
        val hashed = xxhash64LongStages(keys, "k", "kh", pfx = pfx)
        val buckets = (0 until 4)
          .map(i => s"CAST(((h1 + $i * h2) % 4294967296) % 512 AS BIGINT) AS g$i")
          .mkString(", ")
        s"""SELECT k, c, $buckets FROM (
              SELECT k, c, u % 4294967296 AS h1, u // 4294967296 AS h2 FROM (
                SELECT k, c, ${unsignedOf("kh")} AS u FROM ($hashed)))"""
      }
      val cellsV = (0 until 4)
        .map(i => s"sv$i AS (SELECT g$i AS g, SUM(c) AS s FROM bv GROUP BY 1)")
        .mkString(",\n            ")
      val cellsB = (0 until 4)
        .map(i => s"sb$i AS (SELECT g$i AS g, SUM(c) AS s FROM bb GROUP BY 1)")
        .mkString(",\n            ")
      val ipVB = (0 until 4)
        .map(i => s"(SELECT SUM(a.s * b.s) FROM sv$i a JOIN sb$i b USING (g))")
        .mkString("LEAST(", ", ", ")")
      val ipVV = (0 until 4)
        .map(i => s"(SELECT SUM(a.s * a.s) FROM sv$i a)")
        .mkString("LEAST(", ", ", ")")
      s"""WITH bv AS (${side("view", "__jv")}),
            bb AS (${side("purchase", "__jb")}),
            $cellsV,
            $cellsB
          SELECT 'view_purchase' AS pair, CAST($ipVB AS BIGINT) AS est,
                 CAST((SELECT SUM(v.c * b.c) FROM bv v JOIN bb b USING (k)) AS BIGINT) AS exact
          UNION ALL
          SELECT 'view_view', CAST($ipVV AS BIGINT),
                 CAST((SELECT SUM(c * c) FROM bv) AS BIGINT)
          ORDER BY pair"""
    })

  /** Integer HITS hubs & authorities (Kleinberg JACM'99) over the
    * bipartite supplier→part supply graph: two unnormalized mutual-
    * reinforcement rounds ([[graft.operators.Graph.hits]] — exact BIGINT
    * scores, partitioning-deterministic), reporting the top-10 hubs
    * (suppliers whose parts are widely co-supplied) and top-10 authorities
    * (parts supplied by the best-connected suppliers) under a (score,
    * node) total order. Oracle = the same two aggregation rounds as plain
    * SQL joins. */
  val q215_hits = Q(
    "q215_hits",
    (s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_suppkey").cast("long").as("src"), col("l_partkey").cast("long").as("dst"))
        .distinct()
      val scored = graft.operators.Graph.hits(edges, rounds = 2)
      val hubs = scored.filter(col("hub").isNotNull)
        .select(lit("hub").as("side"), col("node"), col("hub").as("score"))
        .orderBy(col("score").desc, col("node")).limit(10)
      val auths = scored.filter(col("auth").isNotNull)
        .select(lit("authority").as("side"), col("node"), col("auth").as("score"))
        .orderBy(col("score").desc, col("node")).limit(10)
      hubs.unionByName(auths)
        .select(col("side"), col("node").cast("long").as("node"),
          col("score").cast("long").as("score"))
        .orderBy("side", "node")
    },
    Some("""WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem),
              h1 AS (SELECT src, COUNT(*) AS sc FROM e GROUP BY 1),
              a1 AS (SELECT dst, SUM(h1.sc) AS sc FROM e JOIN h1 USING (src) GROUP BY dst),
              h2 AS (SELECT src, SUM(a1.sc) AS sc FROM e JOIN a1 USING (dst) GROUP BY src),
              a2 AS (SELECT dst, SUM(h2.sc) AS sc FROM e JOIN h2 USING (src) GROUP BY dst),
              th AS (SELECT 'hub' AS side, src AS node, sc FROM h2
                     ORDER BY sc DESC, src LIMIT 10),
              ta AS (SELECT 'authority' AS side, dst AS node, sc FROM a2
                     ORDER BY sc DESC, dst LIMIT 10)
            SELECT side, CAST(node AS BIGINT) AS node, CAST(sc AS BIGINT) AS score
            FROM (SELECT * FROM th UNION ALL SELECT * FROM ta)
            ORDER BY side, node"""))

  /** Sorted-neighborhood record-linkage blocking (Hernandez & Stolfo
    * SIGMOD'95 merge/purge): documents keyed by their 40-char normalized
    * prefix, blocked on the first character, sorted within block, and
    * compared only against their 2 sort-successors
    * ([[graft.text.Dedup.sortedNeighborhoodPairs]] — one window shuffle,
    * LEAD-carried neighbor keys, codegen levenshtein verify; candidate
    * volume (window−1)·N, linear). The corpus plants a suffix-padded clone
    * of every 9th document — identical prefix keys sort adjacent, the
    * pattern blocking-by-sort exists to catch. Oracle = ROW_NUMBER rank
    * replay + rank-distance join + DuckDB's native levenshtein. */
  val q216_sorted_neighborhood = Q(
    "q216_sorted_neighborhood",
    (s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val clones = base.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"),
          concat(col("text"), lit(" trailing audit suffix")).as("text"))
      val keyed = base.unionByName(clones)
        .select(col("doc_id"),
          substring(TextFunctions.normalize(col("text")), 1, 40).as("key"))
        .withColumn("block", substring(col("key"), 1, 1))
      Dedup.sortedNeighborhoodPairs(keyed, "doc_id", "key", "block", window = 3, maxDist = 8)
        .select(col("id1").cast("long").as("id1"), col("id2").cast("long").as("id2"),
          col("dist"))
        .orderBy("id1", "id2")
    },
    Some {
      import graft.tools.OracleSql._
      s"""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id, text FROM documents
              UNION ALL
              SELECT doc_id::BIGINT + 4000000, text || ' trailing audit suffix'
              FROM documents WHERE doc_id % 9 = 0),
            keyed AS (
              SELECT doc_id, substr(${normalizeSql("text")}, 1, 40) AS key FROM corpus),
            kb AS (SELECT doc_id, key, substr(key, 1, 1) AS block FROM keyed),
            rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY block ORDER BY key, doc_id) AS rn
                   FROM kb)
          SELECT a.doc_id AS id1, b.doc_id AS id2,
                 CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
          FROM rk a JOIN rk b
            ON a.block = b.block AND b.rn - a.rn BETWEEN 1 AND 2
          WHERE levenshtein(a.key, b.key) <= 8
          ORDER BY id1, id2"""
    })

  /** Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    * '98) stability audit: every document assigned under 8 and under 9
    * shards by argmax xxhash64(doc_id, shard)
    * ([[graft.text.Sharding.rendezvousShard]], pure map-side), with
    * per-shard counts and moved-in counts. The HRW property the report
    * demonstrates — and the oracle proves value-exactly — is that growing
    * the fleet moves ONLY keys whose argmax is the NEW shard (moved_in = 0
    * for shards 0–7), the incremental-reshard guarantee a 100 TB corpus
    * layout needs. Oracle replays the chained two-argument XXH64 (doc hash
    * seeds the shard hash) over a doc×shard expansion. */
  val q217_rendezvous = Q(
    "q217_rendezvous",
    (s, dir) => {
      import graft.text.Sharding
      val docs = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"))
        .withColumn("s8", Sharding.rendezvousShard(col("doc_id"), 8))
        .withColumn("s9", Sharding.rendezvousShard(col("doc_id"), 9))
      val c8 = docs.groupBy(col("s8").as("shard")).agg(count(lit(1)).as("cnt8"))
      val c9 = docs.groupBy(col("s9").as("shard")).agg(count(lit(1)).as("cnt9"))
      val moved = docs.filter(col("s8") =!= col("s9"))
        .groupBy(col("s9").as("shard")).agg(count(lit(1)).as("moved_in"))
      c9.join(c8, Seq("shard"), "left").join(moved, Seq("shard"), "left")
        .select(col("shard").cast("long").as("shard"),
          coalesce(col("cnt8"), lit(0L)).cast("long").as("cnt8"),
          col("cnt9").cast("long").as("cnt9"),
          coalesce(col("moved_in"), lit(0L)).cast("long").as("moved_in"))
        .orderBy("shard")
    },
    Some {
      import graft.tools.OracleSql._
      val ids = "SELECT doc_id::BIGINT AS doc_id FROM documents"
      val h0s = xxhash64LongStages(ids, "doc_id", "h0", pfx = "__r0")
      val exp = s"SELECT doc_id, h0, s FROM ($h0s), unnest(range(9)) AS u(s)"
      val hs = xxhash64LongStages(exp, "s", "h", pfx = "__r1", seed = unsignedOf("h0"))
      s"""WITH hs AS ($hs),
            a8 AS (SELECT doc_id, s AS s8 FROM (
                     SELECT doc_id, s, ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
                     FROM hs WHERE s < 8) WHERE rn = 1),
            a9 AS (SELECT doc_id, s AS s9 FROM (
                     SELECT doc_id, s, ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
                     FROM hs) WHERE rn = 1),
            j AS (SELECT a9.doc_id, a8.s8, a9.s9 FROM a9 JOIN a8 USING (doc_id)),
            c8 AS (SELECT s8 AS shard, COUNT(*) AS cnt8 FROM j GROUP BY 1),
            c9 AS (SELECT s9 AS shard, COUNT(*) AS cnt9 FROM j GROUP BY 1),
            mv AS (SELECT s9 AS shard, COUNT(*) AS moved_in FROM j WHERE s8 <> s9 GROUP BY 1)
          SELECT CAST(c9.shard AS BIGINT) AS shard,
                 CAST(COALESCE(c8.cnt8, 0) AS BIGINT) AS cnt8,
                 CAST(c9.cnt9 AS BIGINT) AS cnt9,
                 CAST(COALESCE(mv.moved_in, 0) AS BIGINT) AS moved_in
          FROM c9 LEFT JOIN c8 ON c8.shard = c9.shard
          LEFT JOIN mv ON mv.shard = c9.shard
          ORDER BY shard"""
    })

  /** Local-DP randomized response (Warner '65; the RAPPOR-style frequency
    * mechanism) over event types: each row reports its TRUE type when its
    * coin bit is 1, otherwise a hash-chosen type uniform over the k-type
    * vocabulary; the collector sees only the randomized stream and
    * debiases with n̂_v = 2·c_v − N/k, emitted k-SCALED
    * (est_scaled = 2k·c_v − N) so every value is an exact BIGINT. The coin
    * and the replacement draw both derive from xxhash64(event_id) — the
    * DETERMINISTIC stand-in for the PRNG a real deployment uses, which is
    * what lets both engines replay the identical randomized stream
    * (the q135/q169 integer-randomness convention). True counts ride
    * alongside as the fidelity reference. Pure map-side randomization +
    * two k-sized aggregates. */
  val q218_randomized_response = Q(
    "q218_randomized_response",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id").cast("long").as("event_id"), col("event_type"))
      // bounded driver collect: the event-type vocabulary (the q80/q97
      // convention for semantically-forced small sets)
      val types = ev.select(col("event_type")).distinct()
        .orderBy("event_type").collect().map(_.getString(0)).toSeq
      val k = types.length.toLong
      val typesArr = array(types.map(lit): _*)
      val h = xxhash64(col("event_id"))
      val randomized = ev.select(
        col("event_type"),
        when(pmod(h, lit(2L)) === 1L, col("event_type"))
          .otherwise(element_at(typesArr,
            (shiftrightunsigned(h, 1) % k).cast("int") + 1)).as("reported"))
      val rep = randomized.groupBy(col("reported").as("event_type"))
        .agg(count(lit(1)).as("reported_cnt"))
      val tru = randomized.groupBy(col("event_type"))
        .agg(count(lit(1)).as("true_cnt"))
      val total = ev.count()
      tru.join(rep, Seq("event_type"), "left")
        .select(
          col("event_type"),
          coalesce(col("reported_cnt"), lit(0L)).cast("long").as("reported_cnt"),
          col("true_cnt").cast("long").as("true_cnt"),
          (lit(2L * k) * coalesce(col("reported_cnt"), lit(0L)) - lit(total))
            .cast("long").as("est_scaled"))
        .orderBy("event_type")
    },
    Some {
      import graft.tools.OracleSql._
      val base = "SELECT event_id::BIGINT AS event_id, event_type FROM events"
      val hashed = xxhash64LongStages(base, "event_id", "h", pfx = "__p")
      s"""WITH hashed AS ($hashed),
            types AS (SELECT event_type AS t,
                             ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS idx
                      FROM (SELECT DISTINCT event_type FROM events)),
            kc AS (SELECT COUNT(*)::BIGINT AS k FROM types),
            rnd AS (SELECT ev.event_type,
                           CASE WHEN ${unsignedOf("ev.h")} % 2 = 1 THEN ev.event_type
                                ELSE tt.t END AS reported
                    FROM (SELECT h, event_type,
                                 CAST((${unsignedOf("h")} // 2) % (SELECT k FROM kc) AS BIGINT) AS alt_idx
                          FROM hashed) ev
                    JOIN types tt ON tt.idx = ev.alt_idx),
            rep AS (SELECT reported AS event_type, COUNT(*) AS reported_cnt
                    FROM rnd GROUP BY 1),
            tru AS (SELECT event_type, COUNT(*) AS true_cnt FROM rnd GROUP BY 1),
            n AS (SELECT COUNT(*)::BIGINT AS total FROM events)
          SELECT t.event_type,
                 CAST(COALESCE(r.reported_cnt, 0) AS BIGINT) AS reported_cnt,
                 CAST(t.true_cnt AS BIGINT) AS true_cnt,
                 CAST(2 * kc.k * COALESCE(r.reported_cnt, 0) - n.total AS BIGINT) AS est_scaled
          FROM tru t
          LEFT JOIN rep r ON r.event_type = t.event_type
          CROSS JOIN kc CROSS JOIN n
          ORDER BY t.event_type"""
    })

  /** Bloom-pruned runtime-filter join ([[graft.operators.RuntimeFilter]]):
    * lineitem joined to the suppliers of ONE nation with the fact side
    * pre-pruned map-side by a Bloom filter built over the dim keys — the
    * semi-join reduction that keeps a selective join from shuffling the
    * full fact table (≈ |matching| + fpp·|fact| rows reach the exchange
    * instead of |fact|). Result is EXACTLY the plain join — no false
    * negatives by construction, false positives die in the join — so the
    * oracle IS the plain join, the q105/q116 convention for plan-level
    * operators. */
  val q219_bloom_join = Q(
    "q219_bloom_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey").cast("long").as("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"))
      val dim = t(s, dir, "supplier").join(
        t(s, dir, "nation").filter(col("n_name") === "NATION_9"),
        col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"))
      graft.operators.RuntimeFilter
        .bloomPrunedJoin(li, dim, "l_suppkey", "s_suppkey")
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).cast("long").as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_9'
            GROUP BY 1, 2 ORDER BY 1"""))

  /** Join-key skew diagnostic (the pre-flight report behind the salted
    * join/agg family q105/q116): per event type, the user_id key
    * distribution's concentration — key count, hottest-key count, top-10
    * mass (via the custom [[graft.operators.TopK]] bounded-heap physical
    * operator), hottest-key share in ppm, and the suggested salt factor
    * ceil(max_cnt · P / total) for P = 32 partitions (how many ways the
    * hottest key must split so no partition exceeds the mean load). All
    * integer; one groupBy + k-sized aggregates. */
  val q220_skew_report = Q(
    "q220_skew_report",
    (s, dir) => {
      val grp = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // feeds both the agg and the TopK operator
      val agg = grp.groupBy(col("event_type"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("c")).as("max_cnt"))
      val top10 = graft.operators.TopK
        .perGroup(grp, Seq("event_type"), Seq(("c", false), ("user_id", true)), 10)
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("top10_sum"))
      agg.join(top10, Seq("event_type"))
        .select(
          col("event_type"),
          col("n_rows").cast("long").as("n_rows"),
          col("n_keys").cast("long").as("n_keys"),
          col("max_cnt").cast("long").as("max_cnt"),
          col("top10_sum").cast("long").as("top10_sum"),
          expr("(1000000 * max_cnt) div n_rows").as("top1_share_ppm"),
          expr("(max_cnt * 32 + n_rows - 1) div n_rows").as("suggested_salt"))
        .orderBy("event_type")
    },
    Some("""WITH grp AS (SELECT event_type, user_id, COUNT(*) AS c
                         FROM events GROUP BY 1, 2),
              agg AS (SELECT event_type, SUM(c) AS n_rows, COUNT(*) AS n_keys,
                             MAX(c) AS max_cnt
                      FROM grp GROUP BY 1),
              t10 AS (SELECT event_type, SUM(c) AS top10_sum FROM (
                        SELECT event_type, c, ROW_NUMBER() OVER (
                          PARTITION BY event_type ORDER BY c DESC, user_id) AS rn
                        FROM grp) WHERE rn <= 10 GROUP BY 1)
            SELECT a.event_type,
                   CAST(a.n_rows AS BIGINT) AS n_rows,
                   CAST(a.n_keys AS BIGINT) AS n_keys,
                   CAST(a.max_cnt AS BIGINT) AS max_cnt,
                   CAST(t.top10_sum AS BIGINT) AS top10_sum,
                   CAST((1000000 * a.max_cnt) // a.n_rows AS BIGINT) AS top1_share_ppm,
                   CAST((a.max_cnt * 32 + a.n_rows - 1) // a.n_rows AS BIGINT) AS suggested_salt
            FROM agg a JOIN t10 t USING (event_type)
            ORDER BY a.event_type"""))

  /** Streaming SLIDING-window aggregation (6 h window, 3 h slide — every
    * event lands in exactly 2 overlapping windows), the overlap face of
    * q96's tumbling form: same file stream, AvailableNow drain, complete-
    * mode memory sink. Oracle replays the epoch-aligned window arithmetic
    * (each event expanded to its 2 covering window starts). */
  val q221_stream_sliding = Q(
    "q221_stream_sliding",
    (s, dir) => {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q221")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath)
      val stream = normalizeTs(s.readStream.schema(schema).parquet(streamDir.toString))
      val agg = graft.streaming.StreamOps.windowedAggregate(
        stream, "ts", "6 hours", Some("3 hours"), watermark = "1 hour",
        groupColumns = Seq("event_type"), aggName = "count", valueColumn = "value")
      val qname = s"graft_q221_${q221Runs.incrementAndGet()}"
      val query = scopedStreamStart(s)(agg.writeStream.format("memory").queryName(qname)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      query.awaitTermination()
      java.nio.file.Files.deleteIfExists(streamDir.resolve("events.parquet"))
      java.nio.file.Files.deleteIfExists(streamDir)
      s.table(qname).select(
        col("window.start").cast("long").as("win_start"),
        col("event_type"),
        col("value").cast("long").as("n"))
        .orderBy("win_start", "event_type")
    },
    Some("""SELECT CAST(((epoch_us(ts) // 10800000000) - o.range) * 10800 AS BIGINT) AS win_start,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events CROSS JOIN range(2) o
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Sweep-line maximum-concurrency profile: per-user 30-min-gap sessions
    * (q58's sessionization) as CLOSED [first-event, last-event] intervals,
    * swept by +1/−1 boundary points — the classic interval-overlap
    * counting operator (ends at an instant release before starts at the
    * same instant claim, i.e. [s, e+1µs) half-open arithmetic). Scale
    * shape: boundary points pre-aggregate to net deltas per DISTINCT
    * instant, so the one unavoidable global-order cumsum runs over
    * distinct boundary instants (≪ events — the q207 vocabulary-sort
    * move). Output: per day, the max concurrent sessions observed at
    * boundary instants that day. */
  val q222_concurrency = Q(
    "q222_concurrency",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sess = graft.time.Sessionize
        .assignSessions(t(s, dir, "events"), "ts", 1800L, Seq("user_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(unix_micros(min(col("ts"))).as("s"),
          (unix_micros(max(col("ts"))) + 1L).as("e"))
      val pts = sess.select(col("s").as("t"), lit(1L).as("d"))
        .unionAll(sess.select(col("e").as("t"), lit(-1L).as("d")))
      val byT = pts.groupBy(col("t")).agg(sum(col("d")).as("net"))
      val cum = byT.withColumn("cc",
        sum(col("net")).over(Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum.groupBy(date_format(timestamp_micros(col("t")), "yyyy-MM-dd").as("day"))
        .agg(max(col("cc")).cast("long").as("max_cc"))
        .orderBy("day")
    },
    Some("""WITH marked AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800000000
                     THEN 1 ELSE 0 END AS is_start
              FROM events),
            sess AS (
              SELECT user_id,
                     SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS sid, ts
              FROM marked),
            iv AS (SELECT user_id, sid, MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) + 1 AS e
                   FROM sess GROUP BY 1, 2),
            pts AS (SELECT s AS t, 1 AS d FROM iv UNION ALL SELECT e, -1 FROM iv),
            byt AS (SELECT t, SUM(d) AS net FROM pts GROUP BY 1),
            cum AS (SELECT t, SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cc
                    FROM byt)
          SELECT strftime(make_timestamp(t), '%Y-%m-%d') AS day,
                 CAST(MAX(cc) AS BIGINT) AS max_cc
          FROM cum GROUP BY 1 ORDER BY 1"""))

  /** Audio near-duplicate detection — the envelope-fingerprint member of
    * the multimodal dedup family (text q29 / image q184 / video q211):
    * real PCM WAV payloads demuxed to exact per-segment energy integers
    * ([[graft.multimodal.Multimodal.audioSegmentEnergies]], map-side),
    * consecutive-segment 2-gram shingles, exact Jaccard via the
    * inverted-index equi-join. The corpus plants a clone (first segment
    * re-recorded) for every 5th clip: 10 of 12 union shingles survive →
    * jaccard 833333 ppm, and every energy is a closed-form function of
    * (id, segment) — the oracle derives all expected pairs from the
    * arithmetic, never touching the codec (codec bugs diverge the hash). */
  val q223_audio_neardup = Q(
    "q223_audio_neardup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val n = 150
      val corpus = Multimodal.syntheticAudioCorpus(s, n)
      val seg = Multimodal.audioSegmentEnergies(corpus, 200)
        .select(col("id"), col("segment_index"), col("energy"))
      val w = Window.partitionBy(col("id")).orderBy(col("segment_index"))
      val sh = seg
        .withColumn("nxt", lead(col("energy"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("id"), (col("energy") * 4194304L + col("nxt")).as("key"))
        .distinct()
        .cache()
      val sz = sh.groupBy(col("id")).agg(count(lit(1)).as("s"))
      val inter = sh.as("x")
        .join(sh.as("y"), col("x.key") === col("y.key") && col("x.id") < col("y.id"))
        .groupBy(col("x.id").as("id1"), col("y.id").as("id2"))
        .agg(count(lit(1)).as("n_shared"))
      val out = inter
        .join(sz.select(col("id").as("id1"), col("s").as("s1")), "id1")
        .join(sz.select(col("id").as("id2"), col("s").as("s2")), "id2")
        .withColumn("n_union", col("s1") + col("s2") - col("n_shared"))
        .withColumn("jaccard_ppm", expr("(1000000 * n_shared) div n_union"))
        .filter(col("jaccard_ppm") >= 500000)
        .select(col("id1"), col("id2"),
          col("n_shared").cast("long").as("n_shared"),
          col("n_union").cast("long").as("n_union"),
          col("jaccard_ppm").cast("long").as("jaccard_ppm"))
        .orderBy("id1", "id2")
      val materialized = out.localCheckpoint(true)
      sh.unpersist()
      materialized
    },
    Some("""WITH ids AS (
              SELECT range AS id FROM range(150)
              UNION ALL
              SELECT range + 150 FROM range(150) WHERE range % 5 = 0),
            seg AS (
              SELECT i.id, k.range AS k,
                     200 * (CASE WHEN i.id >= 150 AND k.range = 0
                                 THEN 7500 + (i.id - 150) * 16
                                 ELSE 500 + (CASE WHEN i.id >= 150 THEN i.id - 150 ELSE i.id END) * 16 + k.range
                            END) AS energy
              FROM ids i CROSS JOIN range(12) k),
            sh AS (
              SELECT DISTINCT a.id, a.energy * 4194304 + b.energy AS key
              FROM seg a JOIN seg b ON a.id = b.id AND b.k = a.k + 1),
            sz AS (SELECT id, COUNT(*) AS s FROM sh GROUP BY 1),
            inter AS (
              SELECT x.id AS id1, y.id AS id2, COUNT(*) AS n_shared
              FROM sh x JOIN sh y ON x.key = y.key AND x.id < y.id
              GROUP BY 1, 2),
            sc AS (
              SELECT i.id1, i.id2, i.n_shared, s1.s + s2.s - i.n_shared AS n_union
              FROM inter i JOIN sz s1 ON s1.id = i.id1 JOIN sz s2 ON s2.id = i.id2)
          SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
                 CAST(n_shared AS BIGINT) AS n_shared,
                 CAST(n_union AS BIGINT) AS n_union,
                 CAST((1000000 * n_shared) // n_union AS BIGINT) AS jaccard_ppm
          FROM sc WHERE (1000000 * n_shared) // n_union >= 500000
          ORDER BY id1, id2"""))

  /** Price-tier classification via the broadcast interval-lookup join —
    * the SECOND whole-operator Catalyst extension
    * ([[graft.plans.IntervalJoin]]): lineitem prices joined to a table of
    * disjoint [lo, hi) tiers by binary search over the sorted broadcast
    * intervals, O(n log m) where the plan Spark writes for the same
    * `p >= lo AND p < hi` predicate is an O(n·m)
    * BroadcastNestedLoopJoin. Probe-side partitioning is preserved (no
    * shuffle before the aggregate's own exchange); disjointness is
    * validated, not assumed. Oracle = the plain containment join. */
  val q224_interval_lookup = Q(
    "q224_interval_lookup",
    (s, dir) => {
      import s.implicits._
      val tiers = Seq(
        ("budget", 0L, 5000L),
        ("value", 5000L, 15000L),
        ("mid", 15000L, 30000L),
        ("premium", 30000L, 60000L),
        ("luxury", 60000L, 120000L)).toDF("tier", "lo", "hi")
      val probe = t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice")).cast("long").as("price_pt"),
          col("l_quantity"))
      graft.operators.IntervalLookup
        .join(probe, tiers, "price_pt", "lo", "hi")
        .groupBy(col("tier"), col("lo"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(col("tier"), col("lo").cast("long").as("lo"), col("n"), col("sum_qty"))
        .orderBy("lo")
    },
    Some("""WITH tiers(tier, lo, hi) AS (VALUES
              ('budget', 0, 5000), ('value', 5000, 15000), ('mid', 15000, 30000),
              ('premium', 30000, 60000), ('luxury', 60000, 120000))
            SELECT tier, CAST(lo AS BIGINT) AS lo, CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem JOIN tiers
              ON FLOOR(l_extendedprice) >= lo AND FLOOR(l_extendedprice) < hi
            GROUP BY 1, 2 ORDER BY lo"""))

  /** Deterministic per-group uniform sample, exactly min(k, n) per source:
    * rows ordered by (xxhash64(id), id) — the engine-replayable stand-in
    * for a uniform draw (the q135/q195 integer-randomness convention) —
    * and cut at k by the custom [[graft.operators.TopK]] bounded-heap
    * physical operator: a per-group reservoir whose shuffle carries at
    * most k rows per group per input partition, no per-group sort. The
    * grouped-sampling shape every eval-set builder needs at corpus scale.
    * Oracle replays the hash order with ROW_NUMBER. */
  val q225_group_sample = Q(
    "q225_group_sample",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"), col("doc_id").cast("long").as("doc_id"))
        .withColumn("h", xxhash64(col("doc_id")))
      graft.operators.TopK
        .perGroup(d, Seq("source"), Seq(("h", true), ("doc_id", true)), 20)
        .select(col("source"), col("doc_id"))
        .orderBy("source", "doc_id")
    },
    Some {
      import graft.tools.OracleSql._
      val base = "SELECT source, doc_id::BIGINT AS doc_id FROM documents"
      val hashed = xxhash64LongStages(base, "doc_id", "h", pfx = "__s")
      s"""SELECT source, doc_id FROM (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
            FROM ($hashed))
          WHERE rn <= 20 ORDER BY source, doc_id"""
    })

  /** Dyadic-EWMA ingest smoothing monitor
    * ([[graft.operators.EventAnalytics.dyadicEwma]]): per event type and
    * day, the 8-day dyadic-weight history sum (weights 128..1, mass 255 —
    * exact BIGINT smoothing, no libm α-powers) with spike/drop flags by
    * cross-multiplication. The SMOOTHER face of the monitor family beside
    * CUSUM (level shifts, q198) and seasonal-naive (periodicity, q172).
    * Only flagged days are reported; full-history days only score. */
  val q226_dyadic_ewma = Q(
    "q226_dyadic_ewma",
    (s, dir) => {
      graft.operators.EventAnalytics
        .dyadicEwma(t(s, dir, "events").select(col("event_type"), col("ts")),
          "event_type", "ts", depth = 8)
        .select(
          col("key").as("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cnt").cast("long").as("cnt"),
          col("ewma_num").cast("long").as("ewma_num"),
          col("flag"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
              SELECT event_type AS key, ts::DATE AS day, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
            spine AS (
              SELECT k.key, d.day FROM
                (SELECT DISTINCT key FROM daily) k
              CROSS JOIN
                (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
                 FROM bounds) d),
            dense AS (
              SELECT s.key, s.day, COALESCE(dl.n, 0) AS cnt
              FROM spine s LEFT JOIN daily dl ON dl.key = s.key AND dl.day = s.day),
            lagged AS (
              SELECT key, day, cnt,
                     LAG(cnt, 8) OVER w AS oldest,
                     128*LAG(cnt,1) OVER w + 64*LAG(cnt,2) OVER w + 32*LAG(cnt,3) OVER w
                       + 16*LAG(cnt,4) OVER w + 8*LAG(cnt,5) OVER w
                       + 4*LAG(cnt,6) OVER w + 2*LAG(cnt,7) OVER w
                       + LAG(cnt,8) OVER w AS ewma_num
              FROM dense WINDOW w AS (PARTITION BY key ORDER BY day))
          SELECT key AS event_type, strftime(day, '%Y-%m-%d') AS day,
                 CAST(cnt AS BIGINT) AS cnt, CAST(ewma_num AS BIGINT) AS ewma_num,
                 CASE WHEN 255 * cnt > 2 * ewma_num THEN 'spike'
                      WHEN 510 * cnt < ewma_num THEN 'drop'
                      ELSE 'normal' END AS flag
          FROM lagged WHERE oldest IS NOT NULL
          ORDER BY event_type, day"""))

  /** Winsorized robust aggregation: per return flag, prices clamped to the
    * exact rank-based [p10, p90] before summing — the outlier-resistant
    * aggregate that, unlike q162's TRIMMED mean, keeps every row's vote
    * (clamped, not dropped). Percentiles are DISCRETE order statistics
    * (value at rank ceil(q·n) under the price order) — integer-exact and
    * engine-replayable where interpolated quantiles are float territory;
    * prices enter as floor() integer units. Two passes: one window rank,
    * one clamp-and-sum. */
  val q227_winsorize = Q(
    "q227_winsorize",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag").as("flag"),
        floor(col("l_extendedprice")).cast("long").as("p"),
        col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy(col("flag")).orderBy(col("p"), col("l_orderkey"), col("l_linenumber"))
      val ranked = li
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("flag"))))
      val pcts = ranked
        .groupBy(col("flag"))
        .agg(
          max(col("n")).as("n"),
          max(when(col("rn") === expr("(n + 9) div 10"), col("p"))).as("p10"),
          max(when(col("rn") === expr("(9 * n + 9) div 10"), col("p"))).as("p90"))
      li.join(pcts, Seq("flag"))
        .select(col("flag"), col("n"), col("p10"), col("p90"),
          least(greatest(col("p"), col("p10")), col("p90")).as("cl"), col("p"))
        .groupBy(col("flag"))
        .agg(
          max(col("n")).cast("long").as("n"),
          max(col("p10")).cast("long").as("p10"),
          max(col("p90")).cast("long").as("p90"),
          sum(col("cl")).cast("long").as("winsorized_sum"),
          sum(col("p")).cast("long").as("raw_sum"))
        .orderBy("flag")
    },
    Some("""WITH li AS (
              SELECT l_returnflag AS flag, CAST(FLOOR(l_extendedprice) AS BIGINT) AS p,
                     l_orderkey, l_linenumber
              FROM lineitem),
            ranked AS (
              SELECT flag, p,
                     ROW_NUMBER() OVER (PARTITION BY flag ORDER BY p, l_orderkey, l_linenumber) AS rn,
                     COUNT(*) OVER (PARTITION BY flag) AS n
              FROM li),
            pcts AS (
              SELECT flag, MAX(n) AS n,
                     MAX(CASE WHEN rn = (n + 9) // 10 THEN p END) AS p10,
                     MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN p END) AS p90
              FROM ranked GROUP BY flag)
          SELECT li.flag, CAST(MAX(pcts.n) AS BIGINT) AS n,
                 CAST(MAX(pcts.p10) AS BIGINT) AS p10,
                 CAST(MAX(pcts.p90) AS BIGINT) AS p90,
                 CAST(SUM(LEAST(GREATEST(li.p, pcts.p10), pcts.p90)) AS BIGINT) AS winsorized_sum,
                 CAST(SUM(li.p) AS BIGINT) AS raw_sum
          FROM li JOIN pcts ON li.flag = pcts.flag
          GROUP BY li.flag ORDER BY li.flag"""))

  /** Guaranteed heavy hitters via Misra–Gries + exact verify
    * ([[graft.operators.Sketches.guaranteedHeavyHitters]]): a planted
    * hot key (every third event) among ~1000 cold keys, k = 16 counters.
    * The one-pass MG summary (a NEW TypedImperativeAggregate with the
    * mergeable-summaries merge rule) bounds memory at k counters where a
    * full groupBy histograms every key; the exact verify of its ≤ k
    * candidates makes the output the EXACT set above N/(k+1) —
    * deterministic despite MG's order-dependent counters. Oracle = the
    * plain threshold aggregation. */
  val q228_misra_gries = Q(
    "q228_misra_gries",
    (s, dir) => {
      val keyed = t(s, dir, "events").select(
        when(col("user_id") % 3 === 0, 7L)
          .otherwise(lit(1000L) + pmod(col("user_id"), lit(997L))).as("k"))
      graft.operators.Sketches.guaranteedHeavyHitters(keyed, col("k"), 16)
        .select(col("key").cast("long").as("key"),
          col("exact").cast("long").as("exact"),
          col("total_n").cast("long").as("total_n"))
        .orderBy("key")
    },
    Some("""WITH keyed AS (
              SELECT CASE WHEN user_id % 3 = 0 THEN 7
                          ELSE 1000 + ((user_id % 997) + 997) % 997 END AS k
              FROM events),
            n AS (SELECT COUNT(*)::BIGINT AS total FROM keyed)
          SELECT CAST(k AS BIGINT) AS key, CAST(COUNT(*) AS BIGINT) AS exact,
                 CAST(MAX(n.total) AS BIGINT) AS total_n
          FROM keyed CROSS JOIN n
          GROUP BY k HAVING COUNT(*) * 17 > MAX(n.total)
          ORDER BY key"""))

  /** TextTiling-style topic segmentation (Hearst CL'97, integerized —
    * [[graft.text.TextFunctions.topicBoundaries]]): per document, w=10
    * token blocks, adjacent-block multiset-overlap similarity per gap,
    * boundary = strict local minimum below the per-doc median (med2
    * integer-median gate). Every 6th document gets a 40-token second
    * topic appended (disjoint vocabulary), planting a deep valley at the
    * junction the detector must find. Oracle replays the full block/gap/
    * median arithmetic in SQL — token equality only, no hashing needed. */
  val q229_topic_segments = Q(
    "q229_topic_segments",
    (s, dir) => {
      val topic2 = Seq.fill(8)("reactor turbine coolant valve inspection").mkString(" ")
      val corpus = t(s, dir, "documents").select(
        col("doc_id").cast("long").as("doc_id"),
        when(col("doc_id") % 6 === 0, concat(col("text"), lit(" " + topic2)))
          .otherwise(col("text")).as("text"))
      TextFunctions.topicBoundaries(corpus, "doc_id", "text", w = 10)
        .select(col("doc_id"),
          col("n_gaps").cast("long").as("n_gaps"),
          col("n_boundaries").cast("long").as("n_boundaries"),
          col("deepest_gap").cast("long").as("deepest_gap"),
          col("min_sim").cast("long").as("min_sim"))
        .orderBy("doc_id")
    },
    Some {
      import graft.tools.OracleSql._
      val topic2 = Seq.fill(8)("reactor turbine coolant valve inspection").mkString(" ")
      s"""WITH corpus AS (
              SELECT doc_id::BIGINT AS doc_id,
                     CASE WHEN doc_id % 6 = 0 THEN text || ' $topic2' ELSE text END AS text
              FROM documents),
            d AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(${normalizeSql("text")}), '\\s+'),
                                 t -> len(t) > 0) AS toks
              FROM corpus),
            pos AS (
              SELECT doc_id, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) - 1 AS p0, len(toks) AS L
              FROM d),
            blocked AS (
              SELECT doc_id, p0 // 10 AS blk, tok, L // 10 AS nblk
              FROM pos WHERE p0 < (L // 10) * 10),
            bc AS (
              SELECT doc_id, blk, tok, COUNT(*) AS c, MAX(nblk) AS nblk
              FROM blocked GROUP BY 1, 2, 3),
            sims AS (
              SELECT l.doc_id, r.blk AS g, SUM(LEAST(l.c, r.c)) AS sim
              FROM bc l JOIN bc r
                ON l.doc_id = r.doc_id AND l.tok = r.tok AND r.blk = l.blk + 1
              GROUP BY 1, 2),
            spine AS (
              SELECT doc_id, unnest(range(1, nblk)) AS g
              FROM (SELECT doc_id, MAX(nblk) AS nblk FROM bc GROUP BY 1)
              WHERE nblk >= 2),
            dense AS (
              SELECT s.doc_id, s.g, COALESCE(si.sim, 0) AS sim
              FROM spine s LEFT JOIN sims si ON si.doc_id = s.doc_id AND si.g = s.g),
            scored AS (
              SELECT doc_id, g, sim,
                     COUNT(*) OVER (PARTITION BY doc_id) AS m,
                     ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sim, g) AS rk,
                     COALESCE(LAG(sim) OVER (PARTITION BY doc_id ORDER BY g),
                              9223372036854775807) AS prv,
                     COALESCE(LEAD(sim) OVER (PARTITION BY doc_id ORDER BY g),
                              9223372036854775807) AS nxt
              FROM dense),
            med AS (
              SELECT doc_id,
                     MAX(CASE WHEN rk = (m + 1) // 2 THEN sim END) +
                       MAX(CASE WHEN rk = (m + 2) // 2 THEN sim END) AS med2
              FROM scored GROUP BY 1)
          SELECT s.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_gaps,
                 CAST(SUM(CASE WHEN s.sim < s.prv AND s.sim < s.nxt
                                AND 2 * s.sim < md.med2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries,
                 CAST(MAX(CASE WHEN s.rk = 1 THEN s.g END) AS BIGINT) AS deepest_gap,
                 CAST(MIN(s.sim) AS BIGINT) AS min_sim
          FROM scored s JOIN med md ON md.doc_id = s.doc_id
          GROUP BY s.doc_id ORDER BY s.doc_id"""
    })

  /** The textbook window top-k spelling, silently planned as the custom
    * bounded-heap operator: with `spark.graft.topk.rewriteWindow` on, the
    * opt-in optimizer rule
    * [[graft.plans.TopKPerGroup.RewriteRowNumberTopK]] rewrites
    * `row_number() OVER (PARTITION BY order ORDER BY price DESC, line)
    * <= 2` + rank-drop into TopKPerGroupNode — the user keeps the
    * idiomatic query, the plan loses its full shuffle + per-group sort
    * (≤ k rows per group per partition cross one exchange). The window
    * order here is TOTAL (linenumber breaks price ties), which is the
    * contract the conf asserts. Values must equal the window form
    * exactly — the oracle IS the window replay. */
  val q230_window_topk_rewrite = Q(
    "q230_window_topk_rewrite",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val prev = s.conf.getOption("spark.graft.topk.rewriteWindow")
      s.conf.set("spark.graft.topk.rewriteWindow", "true")
      try {
        val li = t(s, dir, "lineitem")
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
        val top2 = li
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("l_orderkey"), col("l_extendedprice"))
        val out = top2
          .groupBy(col("l_orderkey").cast("long").as("l_orderkey"))
          .agg(count(lit(1)).cast("long").as("n"),
            round(sum(col("l_extendedprice")), 2).as("top2_sum"))
          .orderBy("l_orderkey")
        // materialize under the conf scope — the rewrite fires at
        // optimization time, which localCheckpoint forces here
        out.localCheckpoint(true)
      } finally {
        prev match {
          case Some(v) => s.conf.set("spark.graft.topk.rewriteWindow", v)
          case None => s.conf.unset("spark.graft.topk.rewriteWindow")
        }
      }
    },
    Some("""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(l_extendedprice), 2) AS top2_sum
            FROM (
              SELECT l_orderkey, l_extendedprice,
                     ROW_NUMBER() OVER (PARTITION BY l_orderkey
                       ORDER BY l_extendedprice DESC, l_linenumber) AS rn
              FROM lineitem)
            WHERE rn <= 2
            GROUP BY 1 ORDER BY 1"""))

  /** The custom interval-lookup physical operator under STREAMING: a file
    * stream of events drained in micro-batches (maxFilesPerTrigger=1 over
    * a 4-file split), each batch enriched against the static tier table
    * via [[graft.operators.IntervalLookup]] inside foreachBatch and
    * upserted to its own `batch=<id>` directory (the q190 idempotent-sink
    * shape — a retry rewrites its own dir); the serving read sums the
    * per-batch partials. Per-batch aggregation + integer value sums make
    * the result independent of how files split into batches. Oracle = the
    * batch containment join. */
  val q231_stream_interval = Q(
    "q231_stream_interval",
    (s, dir) => {
      import s.implicits._
      val tiers = Seq(("low", 0L, 50L), ("mid", 50L, 150L),
        ("high", 150L, 300L), ("peak", 300L, 100000L)).toDF("tier", "lo", "hi")
      val inDir = java.nio.file.Files.createTempDirectory("graft-q231-in").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft-q231-out").toString
      t(s, dir, "events").select(col("event_id"), col("value"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      val schema = s.read.parquet(inDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val query = scopedStreamStart(s)(stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val pts = batch.select(floor(col("value")).cast("long").as("pt"))
          graft.operators.IntervalLookup.join(pts, tiers, "pt", "lo", "hi")
            .groupBy(col("tier"))
            .agg(count(lit(1)).as("n"), sum(col("pt")).as("fv"))
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start())
      query.awaitTermination()
      s.read.parquet(outDir)
        .groupBy(col("tier"))
        .agg(sum(col("n")).cast("long").as("n_events"),
          sum(col("fv")).cast("long").as("sum_fv"))
        .orderBy("tier")
    },
    Some("""WITH tiers(tier, lo, hi) AS (VALUES
              ('low', 0, 50), ('mid', 50, 150), ('high', 150, 300), ('peak', 300, 100000))
            SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_fv
            FROM events JOIN tiers
              ON FLOOR(value) >= lo AND FLOOR(value) < hi
            GROUP BY 1 ORDER BY tier"""))

  /** Trapezoidal time-weighted integration of an irregular series: per
    * user, Σ gap_µs · (v_i + v_{i+1}) over consecutive events under the
    * (ts, event_id) total order — twice the trapezoid integral, kept
    * UNDIVIDED and in integer cents so every value is an exact BIGINT
    * (values sampled at irregular times make the plain AVG meaningless —
    * this is the operator metering/billing pipelines actually need).
    * Overflow-safe by telescoping: Σ gaps = the user's span, so the sum
    * is bounded by span_µs · 2·max_cents regardless of event count. One
    * user-keyed window shuffle. */
  val q232_time_weighted = Q(
    "q232_time_weighted",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select(
        col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("t"),
        col("event_id").cast("long").as("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      ev
        .withColumn("pt", lag(col("t"), 1).over(w))
        .withColumn("pc", lag(col("cents"), 1).over(w))
        .filter(col("pt").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          (count(lit(1)) + 1).cast("long").as("n_events"),
          (max(col("t")) - min(col("pt"))).cast("long").as("span_us"),
          sum((col("t") - col("pt")) * (col("cents") + col("pc"))).cast("long").as("integral2"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, epoch_us(ts) AS t, event_id,
                     CAST(FLOOR(value * 100) AS BIGINT) AS cents
              FROM events),
            lagged AS (
              SELECT user_id, t, cents,
                     LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pt,
                     LAG(cents) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pc
              FROM ev)
          SELECT CAST(user_id AS BIGINT) AS user_id,
                 CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
                 CAST(MAX(t) - MIN(pt) AS BIGINT) AS span_us,
                 CAST(SUM((t - pt) * (cents + pc)) AS BIGINT) AS integral2
          FROM lagged WHERE pt IS NOT NULL
          GROUP BY user_id ORDER BY user_id"""))

  val all: Seq[Q] = Seq(
    q204_kmv_overlap, q205_hash_classifier, q206_lineage, q207_zipf,
    q208_pq_ann, q209_coreset, q210_ab_chisq, q211_video_neardup,
    q212_filter_funnel, q213_winnowing, q214_join_size_est, q215_hits,
    q216_sorted_neighborhood, q217_rendezvous, q218_randomized_response, q219_bloom_join,
    q220_skew_report, q221_stream_sliding, q222_concurrency, q223_audio_neardup,
    q224_interval_lookup, q225_group_sample, q226_dyadic_ewma, q227_winsorize,
    q228_misra_gries, q229_topic_segments, q230_window_topk_rewrite, q231_stream_interval,
    q232_time_weighted)
}
