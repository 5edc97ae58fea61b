package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sparkext.RegistrableDomain

/** URL / domain curation — the C4/RefinedWeb recipe's pre-filter step
  * (Raffel et al. 2020 §2.2 "we removed any page [from] a blacklist";
  * Penedo et al. 2023 §3.1 URL filtering before any text is read): parse
  * hosts out of crawl URLs, normalize them, reduce to the REGISTRABLE
  * domain (eTLD+1, the unit block/allow lists are published in), and
  * gate the corpus on a domain list.
  *
  * All scalar pieces are pure projections over codegen'd builtins
  * (`regexp_extract`/`regexp_replace`) plus one custom expression,
  * [[graft.sparkext.RegistrableDomain]], that ships the public-suffix
  * rule set as a single reference object — so a 9k-rule production list
  * costs one broadcast-by-closure, not 9k AST nodes, and the whole lane
  * stays inside whole-stage codegen with zero shuffles. The list filter
  * itself is a broadcast semi/anti join on the eTLD+1 key — the
  * decontaminate shape: list-sized build side, corpus never reshuffled.
  *
  * At 100 TB this is the cheapest curation stage there is: one pass,
  * no state, prunes before tokenization/dedup touch the bytes. */
object Url {

  /** Host extraction: scheme-relative or absolute URLs; userinfo and
    * port stripped; null when no host-shaped component exists.
    * Deliberately REGEX-defined (not `java.net.URI`) so the DuckDB
    * oracle can replay it verbatim — both engines run the same pattern.
    * IPv6 bracket literals are out of scope (documented; crawl URL
    * lists are hostname-keyed). */
  private val HostPattern =
    "^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#:]+)"

  def host(url: Column): Column = {
    val h = lower(regexp_extract(url, HostPattern, 1))
    when(h === "", lit(null)).otherwise(regexp_replace(h, "\\.$", ""))
  }

  /** Conservative URL normalization (RFC 3986 §6 safe subset, plus the
    * one crawl-pipeline extra — tracking-parameter removal):
    *   - scheme and host lowercased (case-insensitive components);
    *   - fragment dropped (never sent to the server);
    *   - default ports stripped (`:80` for http, `:443` for https);
    *   - host's FQDN trailing dot stripped;
    *   - `utm_*` / `fbclid` / `gclid` query parameters removed (the
    *     standard tracking params — they make byte-identical pages look
    *     distinct to URL-level dedup), with a dangling `?`/`&` cleaned.
    * Path case, query order, and percent-encoding are left untouched —
    * those can change server-side meaning. Regex-only on purpose: the
    * oracle replays the exact same rewrites. */
  def normalize(url: Column): Column = {
    val c0 = regexp_replace(url, "#.*$", "") // fragment
    // lowercase the scheme://host[:port] prefix only (path/query keep
    // their case — it can be server-side significant). No lookarounds
    // anywhere in this chain: the DuckDB oracle's RE2 has none, and the
    // whole point of a regex-defined normalization is a verbatim replay.
    val pre = regexp_extract(c0,
      "^((?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/?#@]*@)?[^/?#]*)", 1)
    val c1 = when(pre === "", c0)
      .otherwise(concat(lower(pre), substr(c0, length(pre) + 1, length(c0))))
    val c2 = regexp_replace(c1, "^(http://[^/?#]*):80([/?#]|$)", "$1$2")
    val c3 = regexp_replace(c2, "^(https://[^/?#]*):443([/?#]|$)", "$1$2")
    val c4 = regexp_replace(c3,
      "^((?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/?#@]*@)?[^/?#:]+)\\.([:/?#]|$)", "$1$2")
    // tracking params, wherever they sit in the query
    val c5 = regexp_replace(c4, "([?&])(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", "$1")
    val c6 = regexp_replace(c5, "\\?&+", "?")
    val c7 = regexp_replace(c6, "&&+", "&")
    regexp_replace(c7, "[?&]$", "")
  }

  /** A WORKING SUBSET of the publicsuffix.org rule set: the high-traffic
    * ICANN suffixes crawl corpora actually hit, plus the spec's own
    * wildcard/exception showcase (`*.ck` / `!www.ck` are real PSL rules)
    * and the big private-registry suffixes (github.io etc.). The full
    * ~9k-rule list drops in through the same parameter — every API below
    * takes `rules` — this default just keeps the library dependency-free
    * and the subset choice explicit. Unknown TLDs fall back to the
    * spec's default `*` rule (last label), which is what the full list
    * does for them too. */
  val DefaultSuffixRules: Seq[String] = Seq(
    // generic
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "io", "co", "ai", "app", "dev", "xyz", "site", "online",
    // major ccTLDs with registrations at the second level
    "us", "ca", "mx", "de", "fr", "nl", "es", "it", "se", "no", "fi",
    "dk", "pl", "cz", "ch", "at", "be", "ru", "cn", "in", "ir", "tr",
    // layered ccTLD registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.nz", "net.nz", "org.nz",
    "co.kr", "or.kr", "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "com.mx", "com.tr", "com.tw",
    "co.za", "org.za",
    // the PSL's canonical wildcard + exception pair (real rules)
    "*.ck", "!www.ck",
    // private registries (the PSL's PRIVATE section — subdomain sites
    // are separate registrable domains)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "s3.amazonaws.com", "cloudfront.net"
  )

  /** eTLD+1 of a URL or bare hostname (anything without `//` is treated
    * as a host). Null when undefined — single-label hosts, public
    * suffixes themselves, IPv4 literals. */
  def registrableDomain(urlOrHost: Column,
      rules: Seq[String] = DefaultSuffixRules): Column =
    RegistrableDomain(hostOrSelf(urlOrHost), rules)

  /** The bare public suffix (observability: "what registry does this
    * corpus lean on"). */
  def publicSuffix(urlOrHost: Column,
      rules: Seq[String] = DefaultSuffixRules): Column =
    RegistrableDomain(hostOrSelf(urlOrHost), rules, suffixOnly = true)

  private def hostOrSelf(urlOrHost: Column): Column =
    when(urlOrHost.contains("//"), host(urlOrHost))
      .otherwise(lower(regexp_replace(trim(urlOrHost), "\\.$", "")))

  /** Block/allow filter on the registrable domain — the C4 blacklist
    * step as a broadcast anti/semi join (`domains` is a 1-column frame
    * of eTLD+1 values, list-sized; the corpus side is never shuffled).
    * `block = true` drops listed domains, `false` KEEPS only them.
    * Rows whose URL yields no registrable domain are kept under block
    * mode (nothing matched) and dropped under allow mode — the
    * conservative reading of each list kind. The domain list itself is
    * normalized through the same eTLD+1 reduction, so entries may be
    * full URLs, hosts, or bare domains. */
  def filterByDomainList(
      df: DataFrame,
      urlCol: String,
      domains: DataFrame,
      block: Boolean = true,
      rules: Seq[String] = DefaultSuffixRules): DataFrame = {
    require(domains.columns.length == 1,
      s"domain list must be a 1-column frame, got ${domains.columns.mkString(",")}")
    // collision-free working column: a user frame may legitimately carry
    // a __dom column of its own, which a fixed name would clobber
    val domCol = Iterator.from(0).map(i => s"__graft_dom_$i")
      .find(n => !df.columns.contains(n)).get
    val listKey = domains.toDF("__raw")
      .select(registrableDomain(col("__raw"), rules).as(domCol))
      .filter(col(domCol).isNotNull)
      .distinct()
    val keyed = df.withColumn(domCol, registrableDomain(col(urlCol), rules))
    val joined =
      if (block) keyed.join(broadcast(listKey), Seq(domCol), "left_anti")
      else keyed.join(broadcast(listKey), Seq(domCol), "left_semi")
    joined.drop(domCol)
  }
}
