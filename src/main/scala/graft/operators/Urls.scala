package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-level dedup — the first pass of every
  * web-crawl pipeline: the same page arrives as `HTTP://Host:80/a#x`,
  * `http://host/a?utm_source=feed`, … and must collapse to one key
  * before any content dedup runs.
  *
  * The canonical form applies the safe RFC 3986 normalizations plus the
  * standard tracking-parameter strip:
  *
  *  - scheme and host lowercase (case-insensitive by spec);
  *  - default port dropped (`:80` for http, `:443` for https);
  *  - fragment dropped (never sent to the server);
  *  - `utm_*`, `fbclid`, `gclid` query parameters removed, remaining
  *    parameters kept IN ORIGINAL ORDER (re-sorting parameters is not
  *    semantics-preserving in general), `?` dropped when none remain;
  *  - empty path becomes `/`;
  *  - path case and encoding are preserved (paths are case-sensitive).
  *
  * Everything is a chain of `regexp_extract`/`regexp_replace`/`lower`
  * column expressions — one codegen'd projection, no UDF, replayable
  * verbatim in the oracle engine (patterns avoid lookaround so Java
  * and RE2 dialects agree). Non-URL strings (no `scheme://`) pass
  * through unchanged. */
object Urls {

  def canonicalize(url: Column): Column = {
    val u = trim(url)
    val scheme = regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val host = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // path+query, fragment excluded
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val ls = lower(scheme)
    val lhost0 = lower(host)
    val lhost = when(ls === "http", regexp_replace(lhost0, ":80$", ""))
      .when(ls === "https", regexp_replace(lhost0, ":443$", ""))
      .otherwise(lhost0)
    val cleanedQ0 = regexp_replace(query,
      "(^|&)(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*", "")
    val cleanedQ = regexp_replace(cleanedQ0, "^&", "")
    val npath = when(path === "", lit("/")).otherwise(path)
    when(scheme === "", u).otherwise(concat(
      ls, lit("://"), lhost, npath,
      when(cleanedQ === "", lit("")).otherwise(concat(lit("?"), cleanedQ))))
  }

  /** URL-level exact dedup: group by canonical form, keep the lowest id
    * (the deterministic winner rule every graft dedup uses). Returns
    * `(canonical_url, keep_id, cnt)` — one partial-aggregated groupBy,
    * the cheapest dedup pass a crawl pipeline runs (before any content
    * hashing). */
  def dedupByUrl(df: DataFrame, id: Column, url: Column): DataFrame =
    df.select(id.as("_id"), canonicalize(url).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col("_id")).as("keep_id"), count(lit(1)).as("cnt"))
}
