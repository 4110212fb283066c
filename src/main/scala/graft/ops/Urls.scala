package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL operators for web-corpus curation — the filtering stage every
 * crawl-derived training pipeline runs before text ever reaches dedup:
 * parse each document's source URL into (host, registered domain, TLD,
 * path depth), then flag documents whose domain sits on a blocklist.
 *
 * All extraction is `regexp_extract`/`regexp_replace` over the
 * RE2 ∩ java.regex common subset (same portability contract as
 * TextAnalysis.cleanText / piiRedact), so a SQL oracle evaluates the
 * identical expressions. Map-only — zero shuffle at any corpus size;
 * the blocklist applies as a literal IN (or a broadcast join for
 * list sizes past the literal threshold).
 */
object Urls {

  private val HostRe  = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
  /** Registered domain = last two dot-labels of the host. */
  private val DomainRe = "([^.]+\\.[^.]+)$"
  private val TldRe    = "\\.([^.]+)$"

  /** Host (lowercased, port stripped) of a URL column. */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostRe, 1)), ":\\d+$", "")

  /**
   * Parse per-doc URL facts: (id, url, host, domain, tld, path_depth).
   * Unparseable/relative URLs yield empty host/domain/tld and depth 0 —
   * surfaced, not dropped, so the caller's row accounting stays stable.
   */
  def parse(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val h = host(col(urlCol))
    df.select(col(idCol).as("id"), col(urlCol).as("url"), h.as("host"),
        regexp_extract(h, DomainRe, 1).as("domain"),
        regexp_extract(h, TldRe, 1).as("tld"),
        // slashes after the scheme+authority = path depth
        (length(regexp_replace(col(urlCol), "[^/]", "")) - 2)
          .cast("int").as("__slashes"))
      .withColumn("path_depth",
        when(col("host") === "", lit(0))
          .otherwise(greatest(col("__slashes"), lit(0))))
      .drop("__slashes")
      .orderBy(col("id"))
  }

  /**
   * Blocklist flag over parsed URL facts: `is_blocked` iff the registered
   * domain is listed. Kept as a flag (not a filter) so audits can count
   * what a removal pass WOULD drop before committing to it.
   */
  def flagBlocked(parsed: DataFrame, blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "blocklist must not be empty")
    parsed.withColumn("is_blocked",
      col("domain").isin(blockedDomains: _*))
  }

  /**
   * Canonical form of a URL for identity-level dedup — the
   * normalization every crawl pipeline applies before comparing URLs
   * (the same page is fetched as `HTTP://Host/p?utm_source=feed#top`
   * and `https://host/p`):
   *
   *   - fragment dropped; scheme collapsed to `https` (http/https serve
   *     the same document in the overwhelming case — callers who need
   *     scheme-distinct identity can pre-split on it);
   *   - host lowercased, userinfo (`user:pass@`) and default port
   *     (`:80`/`:443`) stripped — `https://user@host/p` and
   *     `https://host/p` fetch the same document;
   *   - tracking parameters (`utm_*`, `fbclid`, `gclid`) removed,
   *     case-insensitively (`UTM_SOURCE=x`) and whether or not they
   *     carry a value (`?utm_source`), with digits allowed in the
   *     suffix (`utm_id`);
   *   - remaining query parameters SORTED (param order is not
   *     identity); empty query dropped;
   *   - trailing path slashes stripped.
   *
   * Pure column expression in the RE2 ∩ java.regex subset plus
   * split/array_sort/array_join — map-only, codegen-friendly, no UDF.
   */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val hostPort = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    val h = regexp_replace(
      regexp_replace(lower(hostPort), "^[^@/]+@", ""), ":(80|443)$", "")
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val q = regexp_extract(rest, "\\?(.*)$", 1)
    val keptParams = filter(split(q, "&"), p =>
      !p.rlike("^(?i)(utm_[a-z0-9]+|fbclid|gclid)(=|$)") && p =!= "")
    val sortedQ = array_join(array_sort(keptParams), "&")
    // no parseable scheme+host → NULL, not "https://": otherwise every
    // malformed/relative/garbage URL would share one canonical identity
    // and a dedup pass would silently drop all but one of those docs
    when(h =!= "",
      concat(lit("https://"), h, path,
        when(length(sortedQ) > 0, concat(lit("?"), sortedQ)).otherwise(lit(""))))
      .otherwise(lit(null).cast("string"))
  }

  /**
   * URL-identity dedup: group documents by [[canonicalize]]d URL, keep
   * the min id per group — the cheap pre-text dedup tier (CCNet et al.
   * dedup by URL before ever hashing content). Output is the dedup
   * family shape (id, canon_url, keep_id, is_dup).
   *
   * Scale: canonicalization is map-only; the only shuffle is the
   * min-aggregation keyed by canonical URL (partial-combined), and the
   * rejoin is by the same key — two exchanges of (url, id) pairs.
   */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val c = df.select(col(idCol).as("id"),
      canonicalize(col(urlCol)).as("canon_url"))
    // NULL canon = "no URL identity": such docs are their own keepers —
    // they must NOT pool into one giant pseudo-group
    val reps = c.filter(col("canon_url").isNotNull)
      .groupBy(col("canon_url"))
      .agg(min(col("id")).as("keep_id"))
    c.join(reps, Seq("canon_url"), "left")
      .select(col("id"), col("canon_url"),
        coalesce(col("keep_id"), col("id")).as("keep_id"),
        (col("id") =!= coalesce(col("keep_id"), col("id"))).as("is_dup"))
      .orderBy(col("id"))
  }
}
