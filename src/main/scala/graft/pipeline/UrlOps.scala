package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction — the curation keys of
  * every web-crawl pipeline (per-domain caps, blocklists, URL-level
  * dedup all key on these).
  *
  * Everything here is a pure `Column` expression tree (regex extracts
  * + array HOFs — no UDF, fully codegen'd), so it runs scan-side at
  * 100 TB: canonicalization is map-only, and the per-domain
  * aggregation that typically follows gets its skew handling from the
  * same salting/capping machinery as [[Sampling.capPerStratum]].
  *
  * Canonical form (the C4/CCNet-style conservative subset — rules a
  * DuckDB oracle can replay exactly):
  *   - scheme and host lowercase; userinfo dropped
  *   - default ports dropped (http:80, https:443), others kept
  *   - fragment dropped
  *   - tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`),
  *     the rest SORTED for order-insensitive equality
  *   - empty path becomes "/"
  *
  * `registeredDomain` is a public-suffix HEURISTIC (the real PSL is a
  * data file, not an algorithm): 2-letter ccTLD preceded by a known
  * second-level label (co/com/net/org/ac/gov/edu) keeps three labels,
  * everything else keeps two.
  */
object UrlOps {

  private def afterScheme(url: Column): Column =
    regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  /** Lowercased scheme, or empty string when absent. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host: authority minus userinfo and port. A bracketed
    * IPv6 literal keeps its brackets (they are part of the authority
    * syntax, and splitting on ':' inside them would truncate it).
    */
  def host(url: Column): Column = {
    val auth = regexp_extract(afterScheme(url), "^([^/?#]*)", 1)
    val bare = regexp_replace(auth, "^[^@]*@", "")
    when(bare.startsWith("["),
      lower(regexp_extract(bare, "^(\\[[^\\]]+\\])", 1)))
      .otherwise(lower(regexp_extract(bare, "^([^:]*)", 1)))
  }

  /** Port as a string ("" when absent). */
  def port(url: Column): Column = {
    val auth = regexp_extract(afterScheme(url), "^([^/?#]*)", 1)
    regexp_extract(regexp_replace(auth, "^[^@]*@", ""), ":([0-9]+)$", 1)
  }

  /** Registered-domain heuristic over [[host]] (see class doc). */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val sld = element_at(labels, -2)
    val tld = element_at(labels, -1)
    val three = n >= 3 && length(tld) === 2 &&
      sld.isin("co", "com", "net", "org", "ac", "gov", "edu")
    when(n <= 1, hostCol).otherwise(
      when(three, concat_ws(".",
          element_at(labels, -3), sld, tld))
        .otherwise(concat_ws(".", sld, tld)))
  }

  /** Canonical URL (see class doc). Input without a scheme is returned
    * unchanged — not a URL this pipeline claims to understand.
    */
  def normalizeUrl(url: Column): Column = {
    val sch = scheme(url)
    val rest = afterScheme(url)
    val h = host(url)
    val p = port(url)
    val keepPort = p =!= "" &&
      !((sch === "http" && p === "80") || (sch === "https" && p === "443"))
    val pathQF = regexp_replace(rest, "^[^/?#]*", "")
    val path = regexp_extract(pathQF, "^([^?#]*)", 1)
    val query = regexp_extract(pathQF, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"), pm =>
      pm =!= "" && !pm.startsWith("utm_") && !pm.startsWith("fbclid=") &&
        !pm.startsWith("gclid=") && !pm.startsWith("ref="))
    val normQuery = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    val normPath = when(path === "", lit("/")).otherwise(path)
    when(sch === "", url).otherwise(
      concat(sch, lit("://"), h,
        when(keepPort, concat(lit(":"), p)).otherwise(lit("")),
        normPath, normQuery))
  }
}
