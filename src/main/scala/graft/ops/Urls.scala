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
}
