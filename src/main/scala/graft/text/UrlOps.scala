package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup key of every web-crawl pipeline
  * (the same page arrives as `HTTP://WWW.Example.com:80/a/?utm_source=x`
  * and `http://example.com/a`). All pure column expressions (regex +
  * array ops), so canonicalization runs map-side at scan speed and the
  * subsequent "first fetch per canonical URL" is one hash aggregation.
  *
  * Canonical form (the usual crawl-frontier rules, cf. the normalization
  * sections of RFC 3986 §6):
  *   - drop the fragment;
  *   - lowercase scheme and host; strip a leading `www.`;
  *   - strip default ports (`:80` for http, `:443` for https);
  *   - strip tracking parameters (`utm_*`, `fbclid`, `gclid`) and empty
  *     params, then SORT the survivors (param order is non-semantic);
  *   - collapse trailing slashes in the path; empty path → `/`.
  */
object UrlOps {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val trackerRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="

  /** Canonical URL for an absolute `scheme://...` URL column. Inputs
    * without a scheme pass through lowercased-and-defragmented only (a
    * relative URL has no host to normalize). */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, schemeRe, 1))
    val rest = regexp_replace(noFrag, schemeRe, "")
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val noDefPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = regexp_replace(noDefPort, "^www\\.", "")
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => !p.rlike(trackerRe) && p =!= "")
    val sortedQs = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(params), "&")))
    when(scheme === "", lower(noFrag))
      .otherwise(concat(scheme, lit("://"), host, path, sortedQs))
  }

  /** All `href` targets of a raw HTML column (single- or double-quoted),
    * in document order — the link-graph extraction step of a crawl
    * pipeline (feed through [[canonicalize]] then [[host]] for in-degree /
    * frontier work). Pure `regexp_extract_all`, map-side. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("href=[\"']([^\"']+)[\"']"), lit(1))

  /** Host of an absolute URL (empty string when schemeless). Apply to
    * CANONICALIZED urls for aggregation keys — case and `www.` are already
    * folded there. */
  def host(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1)

  /** Keep the first fetch per canonical URL: canonicalize, then one
    * min-aggregate keyed by the canonical form (map-side partials absorb
    * the hot mirrors/tracking-variant URLs), then a semi-join back.
    * Returns the input rows whose `idCol` is the smallest id among its
    * canonical-URL group, plus the canonical form. */
  def dedupByCanonicalUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val withCanon = df.withColumn("canonical_url", canonicalize(col(urlCol)))
    val winners = withCanon
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as(idCol))
    withCanon.join(winners, Seq("canonical_url", idCol), "left_semi")
  }

  /** Every dot-suffix of a hostname with >= `minLabels` labels:
    * `a.b.c.com` → [a.b.c.com, b.c.com, c.com] at minLabels=2. The unit of
    * blocklist matching — a list entry `c.com` must block every subdomain
    * under it. */
  def hostSuffixes(hostCol: Column, minLabels: Int = 2): Column = {
    val parts = split(hostCol, "\\.")
    filter(
      transform(
        sequence(lit(0), greatest(size(parts) - minLabels, lit(-1))),
        i => array_join(slice(parts, i + 1, size(parts) - i), ".")),
      s => length(s) > 0)
  }

  /** Domain blocklist matching with subdomain semantics: a row is blocked
    * when ANY dot-suffix of its host appears in `blocklist` (column
    * `entry`); the MOST SPECIFIC (longest) matching entry wins and is
    * attached as `blocked_by` (null = allowed).
    *
    * Scale shape: hosts explode into their ≤ label-count suffixes (a
    * handful per row), the blocklist broadcasts into the equi-join, and
    * the argmax collapses back to one row per input row via
    * max(struct(length, entry)) — corpus-sized data shuffles only on the
    * row id for the collapse, and not at all when the blocklist join is
    * the final consumer of a per-partition pipeline. */
  def matchBlocklist(
      df: DataFrame,
      idCol: String,
      hostCol: String,
      blocklist: DataFrame): DataFrame = {
    val hits = df
      .select(col(idCol), explode(hostSuffixes(col(hostCol))).as("__graft_sfx"))
      .join(broadcast(blocklist.select(col("entry").as("__graft_sfx"))), Seq("__graft_sfx"))
      .groupBy(col(idCol))
      .agg(max(struct(length(col("__graft_sfx")).as("len"), col("__graft_sfx").as("e"))).as("__graft_m"))
      .select(col(idCol), col("__graft_m.e").as("blocked_by"))
    df.join(hits, Seq(idCol), "left")
  }
}
