package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization and domain-policy operators — the CCNet /
 * FineWeb crawl-curation staples: dedup by canonical URL before any
 * content pass (the cheapest dedup there is), and drop blocklisted
 * registered domains. Everything is a pure column chain (regexp
 * extracts + higher-order list ops) with an identical restatement in
 * SQL, so the whole normalization CONTRACT is oracle-checkable:
 *
 *  1. scheme and host lowercase; path/query case preserved;
 *  2. userinfo (`user:pw@`) stripped from the authority — it is
 *     never part of the host, so `http://x@example.org/` collides
 *     with `http://example.org/` and cannot evade a blocklist;
 *  3. leading `www.` stripped from the host;
 *  4. a numeric `:port` is separated from the host (the host NEVER
 *     carries a port); the canonical form keeps the port unless it
 *     is the scheme default (`:80` for http, `:443` for https) — a
 *     non-numeric port-ish suffix stays in the host verbatim;
 *  5. fragment dropped;
 *  6. tracking params dropped (`utm_*`, `gclid`, `fbclid`, `msclkid`),
 *     remaining params SORTED (order-insensitive canonical form);
 *  7. one trailing slash stripped from the path; empty path → `/`;
 *  8. not an absolute `scheme://` URL → null (callers decide the
 *     disposition; a null never collides with a real canonical URL).
 *
 * Scale shape: normalization is a row-local map (zero exchanges); URL
 * dedup is ONE canonical-key shuffle of (url, id) pairs — at 100 TB
 * this runs before any text ever moves, which is the point.
 */
object Urls {

  private val trackingParam = "^(utm_[^=]*|gclid|fbclid|msclkid)(=.*)?$"

  /** Lowercased authority with any `user:pw@` userinfo stripped —
    * the shared front half of host/port extraction. */
  private def authorityNoUser(url: Column): Column = {
    val t = trim(url)
    val hostport = lower(regexp_extract(t, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    regexp_replace(hostport, "^[^@]*@", "")
  }

  /** Canonical host (lowercased; userinfo, www and ANY numeric port
    * stripped) of an absolute URL; null when `url` has no
    * `scheme://host`. This is the column blocklists and per-domain
    * stats key on — it never carries a port, so `:8080` and `user@`
    * variants cannot evade a domain match. */
  def urlHost(url: Column): Column = {
    val t = trim(url)
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      regexp_replace(authorityNoUser(url), ":[0-9]+$", ""), "^www\\.", "")
    when(scheme =!= "" && host =!= "", host)
  }

  /** Numeric port of an absolute URL as a string (`""` when absent). */
  private def urlPortStr(url: Column): Column =
    regexp_extract(authorityNoUser(url), ":([0-9]+)$", 1)

  /** Canonical form of an absolute URL per the contract above; null
    * when not `scheme://host`-shaped. */
  def normalizeUrl(url: Column): Column = {
    val t = trim(url)
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = urlHost(url)
    val port = urlPortStr(url)
    // non-default ports survive in the canonical form (they address a
    // different server); scheme defaults collapse
    val portSuffix = when(port =!= "" &&
        !(scheme === "http" && port === "80") &&
        !(scheme === "https" && port === "443"),
      concat(lit(":"), port)).otherwise(lit(""))
    val rest = regexp_extract(t, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path0 = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParam)))
    val path1 = regexp_replace(path0, "/$", "")
    val path = when(path1 === "", lit("/")).otherwise(path1)
    when(host.isNotNull,
      concat(scheme, lit("://"), host, portSuffix, path,
        when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
          .otherwise(lit(""))))
  }

  /** True when the canonical host is a blocked domain or any
    * subdomain of one (suffix semantics: `example.org` blocks
    * `a.example.org` but not `notexample.org`). Blocklist is a
    * macro-expanded literal OR chain — plan-time constants, no join,
    * identical restatement in SQL. */
  def hostBlocked(url: Column, blocked: Seq[String]): Column = {
    require(blocked.nonEmpty, "empty blocklist — nothing to filter")
    val host = urlHost(url)
    blocked.map { b =>
      val lb = b.toLowerCase
      host === lb || host.endsWith("." + lb)
    }.reduce(_ || _) && host.isNotNull
  }

  /**
   * Canonical-URL dedup verdicts: one row per input doc with the
   * canonical URL, the cluster's keeper (min id over the canonical
   * group), and `is_dup`. Docs whose URL does not canonicalize (null)
   * are their own keeper — a null URL never collides. One shuffle on
   * the canonical key; text never moves.
   */
  def urlDedupVerdicts(docs: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = docs.select(col(idCol).as("id"),
      normalizeUrl(col(urlCol)).as("canonical_url"))
    // keeper table is canonical-URL cardinality (≈ corpus) — NOT
    // broadcast; both sides shuffle on the same key and AQE picks the
    // strategy
    val keep = canon.filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url")).agg(min(col("id")).as("keep_id"))
    canon.join(keep, Seq("canonical_url"), "left")
      .withColumn("keep_id", coalesce(col("keep_id"), col("id")))
      .withColumn("is_dup", col("id") =!= col("keep_id"))
      .select(col("id").as(idCol), col("canonical_url"),
        col("keep_id"), col("is_dup"))
  }
}
