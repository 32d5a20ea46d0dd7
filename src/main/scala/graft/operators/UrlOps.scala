package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass a web-crawl pipeline
  * runs before URL-level dedup: the same page arrives as byte-distinct
  * URLs (host case, default ports, trailing slashes, tracking params,
  * fragments) and without canonicalization each variant is its own
  * "document", inflating the corpus and splitting click/dup statistics
  * across copies.
  *
  * Reference surface: BULKINSERT's many-records-behind-one-argument
  * shape (`/root/reference/src/command/builder.rs:48-52`) — ingest-side
  * record normalization before dedup.
  *
  * All regexes stay in the Java-regex ∩ RE2 subset (character classes,
  * anchors, bounded groups — no lookaround, no alternation inside a
  * match), the same discipline as [[TextAnalysis.piiPatterns]], so the
  * canonical form is engine-reproducible. Pure codegen column math —
  * runs inside the scan, no UDF, no shuffle.
  */
object UrlOps {

  /** Query parameters dropped during canonicalization: `utm_*` plus the
    * common click-tracking ids. Prefix-matched against `name=`.
    */
  val trackingParams: Seq[String] = Seq("utm_", "gclid=", "fbclid=", "ref=")

  private val SchemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme ("" when `url` is not scheme://...). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, SchemePat, 1))

  /** host[:port] with the HOST lowercased and any `user:pass@` userinfo
    * preserved verbatim ("" when absent) — RFC 3986 makes only scheme
    * and host case-insensitive; userinfo is case-sensitive data.
    */
  def urlHostPort(url: Column): Column = {
    val auth = regexp_extract(url, SchemePat + "([^/?#]*)", 2)
    concat(regexp_extract(auth, "^([^@]*@)", 1),
      lower(regexp_replace(auth, "^[^@]*@", "")))
  }

  /** Canonical form:
    *  - scheme and host lowercased;
    *  - default port stripped (`:80` for http, `:443` for https);
    *  - trailing slashes trimmed from the path;
    *  - fragment dropped;
    *  - [[trackingParams]] filtered out of the query, remaining params
    *    kept in their original order (re-sorting would merge URLs whose
    *    servers treat order as significant);
    *  - a query left empty by the filter drops its `?`.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val hp = urlHostPort(url)
    val hpc = when(scheme === "https", regexp_replace(hp, ":443$", ""))
      .when(scheme === "http", regexp_replace(hp, ":80$", ""))
      .otherwise(hp)
    val path = rtrim(regexp_extract(url, SchemePat + "[^/?#]*([^?#]*)", 2), "/")
    // anchor the query to the pre-fragment region: a '?' INSIDE the
    // fragment (SPA routes like /app#/home?page=2) is fragment content
    // and must drop with it, not resurface as query params
    val qs = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val kept = filter(split(qs, "&"), p =>
      !trackingParams.map(t => p.startsWith(t)).reduce(_ || _))
    val qc = when(qs === "", lit(""))
      .when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(kept, "&")))
    // anything without a scheme://host shape is not a URL this
    // canonicalizer understands — pass it through untouched rather than
    // emit a degenerate "://" (the NULL-beats-misread doctrine, applied
    // to strings)
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), hpc, path, qc))
  }
}
