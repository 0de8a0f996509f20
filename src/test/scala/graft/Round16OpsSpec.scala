package graft

import org.apache.spark.sql.functions._

import graft.text.{Dedup, TextFunctions}

/** Round-16 operator pins: the SQL-registered curation signature surface
  * must be value-equal to the audited Column-API forms it mirrors. */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "The quick brown fox... jumps over the lazy dog!\n- bullet line\nplain tail line"),
    (2L, "the quick brown fox jumps over the lazy dog and then the quick brown fox again"),
    (3L, "### symbols #### everywhere\nsecond line..."),
    (4L, ""),
    (5L, "be to of and that have with the — every required stopword present here"))
    .toDF("doc_id", "text")

  test("gopher_metrics struct (SQL surface) == gopherQualityColumns (column form)") {
    val df = corpus
    // column form: the audited materialized-column metrics
    val cols = TextFunctions.gopherQualityColumns(df, "text")
      .select("doc_id", "word_count", "mean_word_len", "symbol_word_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac", "stopword_hits")
    // SQL-text form through the registered function
    df.createOrReplaceTempView("graft_r16_gopher")
    val viaSql = spark.sql("""
      SELECT doc_id,
             gopher_metrics(text).word_count AS word_count,
             gopher_metrics(text).mean_word_len AS mean_word_len,
             gopher_metrics(text).symbol_word_ratio AS symbol_word_ratio,
             gopher_metrics(text).bullet_line_frac AS bullet_line_frac,
             gopher_metrics(text).ellipsis_line_frac AS ellipsis_line_frac,
             gopher_metrics(text).alpha_word_frac AS alpha_word_frac,
             gopher_metrics(text).stopword_hits AS stopword_hits
      FROM graft_r16_gopher""")
    assert(sortedRows(viaSql) == sortedRows(cols))
    // the template also composes: one call selecting the whole struct
    val whole = spark.sql(
      "SELECT doc_id, gopher_metrics(text) AS m FROM graft_r16_gopher")
      .select(col("doc_id"), col("m.*"))
    assert(sortedRows(whole) == sortedRows(cols))
  }

  test("SQL-text LSH pipeline == Dedup.minhashNearDuplicates (the q402 contract)") {
    // the q402 fixture family at miniature scale: copies with the last
    // word dropped are near-dups of their originals
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"),
      (3L, "totally unrelated words nothing shared here with any other document at all"))
      .toDF("doc_id", "text")
    val withCopies = docs.unionByName(docs.select(
      (col("doc_id") + 100L).as("doc_id"),
      array_join(slice(split(trim(col("text")), "\\s+"), lit(1),
        size(split(trim(col("text")), "\\s+")) - 1), " ").as("text")))
    val expected = Dedup.minhashNearDuplicates(withCopies, "doc_id", "text",
      bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("jaccard"))
    withCopies.createOrReplaceTempView("graft_r16_lsh")
    val viaSql = spark.sql("""
      WITH toked AS (
        SELECT doc_id,
               filter(split(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\\s]', ' '), '\\s+', ' ')), '\\s+'),
                 t -> length(t) > 0) AS toks
        FROM graft_r16_lsh),
      sh AS (
        SELECT doc_id, array_distinct(xxhash64_array(
          CASE WHEN size(toks) <= 3 THEN array(array_join(toks, ' '))
               ELSE transform(sequence(0, size(toks) - 3),
                      i -> concat_ws(' ', element_at(toks, i + 1),
                             element_at(toks, i + 2), element_at(toks, i + 3)))
          END)) AS sh
        FROM toked),
      sig AS (
        SELECT doc_id, sh, minhash_sig(sh, 64) AS sig FROM sh WHERE size(sh) > 0),
      buckets AS (
        SELECT doc_id, b.band,
               CAST(hash(element_at(sig, b.band * 4 + 1), element_at(sig, b.band * 4 + 2),
                         element_at(sig, b.band * 4 + 3), element_at(sig, b.band * 4 + 4))
                    AS BIGINT) AS bucket
        FROM sig LATERAL VIEW explode(sequence(0, 15)) b AS band),
      cands AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      j AS (
        SELECT c.id1, c.id2,
               size(array_intersect(s1.sh, s2.sh)) AS ic,
               size(s1.sh) AS sz1, size(s2.sh) AS sz2
        FROM cands c
        JOIN sh s1 ON s1.doc_id = c.id1
        JOIN sh s2 ON s2.doc_id = c.id2)
      SELECT id1, id2,
             ROUND(CAST(ic AS DOUBLE) / (sz1 + sz2 - ic), 4) AS jaccard
      FROM j
      WHERE CAST(ic AS DOUBLE) / (sz1 + sz2 - ic) >= 0.8""")
    assert(sortedRows(viaSql) == sortedRows(expected))
    // the fixture is non-vacuous: every copy pairs with its original
    assert(viaSql.count() == 3)
  }

  test("dataCard: hand census — counts, integral mean, median pick, top lang, dup rate") {
    val docs = Seq(
      (1L, "alpha", "en", "a"),
      (2L, "alpha beta", "en", "a"),
      (3L, "Alpha beta!", "en", "a"), // normalizes equal to doc 2 -> exact dup
      (4L, "a b c d", "fr", "a"),
      (5L, "a b c d e", "fr", "a"),
      (6L, "x y z", "de", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val card = graft.text.DataCard.dataCard(docs, "text", "lang", Seq("source"))
      .orderBy("source").collect()
    val a = card(0)
    assert(a.getString(0) == "a")
    assert(a.getLong(1) == 5L && a.getLong(2) == 14L && a.getLong(3) == 2L) // n, total, mean
    assert(a.getLong(4) == 2L) // p50 of {1,2,2,4,5}: lower-median rank pick
    assert(a.getLong(5) == 2L && a.getString(6) == "en" && a.getLong(7) == 600000L)
    assert(a.getLong(8) == 200000L) // 1 of 5 is a normalized duplicate
    val b = card(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 1L && b.getLong(8) == 0L)
  }
}
