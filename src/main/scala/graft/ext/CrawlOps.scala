package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain operators for crawl-scale pipelines — the layer between
  * the frontier dedup stream ([[graft.streaming.CorpusStreams]]) and
  * the per-source balancing caps ([[Sampling.capPerGroup]]): URL
  * canonicalization (the RFC 3986 §6 normalizations every crawl
  * dedup applies before hashing a URL), host/registered-domain
  * extraction, per-domain document caps, and link-graph domain
  * ranking (the Common-Crawl-style domain weighting that prioritizes
  * the frontier).
  *
  * Everything is EXACT string algebra — lower/regexp_extract/
  * regexp_replace/split with character-class patterns both Spark
  * (Java regex) and the SQL oracle (RE2) interpret identically — so
  * canonicalization replays bit-for-bit in an external engine; no
  * UDF, all codegen'd, per-row only (zero shuffle until grouping).
  *
  * Scale shape: canonicalization is a projection (linear, no
  * shuffle); domain caps shuffle once on the domain key
  * ([[Sampling.capPerGroup]]'s consistent-hash window — salt hot
  * domains upstream if one domain dominates a partition);
  * [[domainPageRank]] is [[graft.operators.PageRank.runTyped]] over
  * the distinct-domain edge list — linear in |edges| per fixed
  * iteration, no dense-id remap (string node keys join directly).
  */
object CrawlOps {

  private val SchemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)"
  private val PortPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]*:([0-9]+)"
  private val PathPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryPat = "\\?([^#]*)"

  /** Lowercased host with any trailing root-dot stripped (the
    * absolute-FQDN form `example.com.` ≡ `example.com`). */
  def hostOf(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostPat, 1)), "\\.$", "")

  /** The grouping domain: [[hostOf]] minus a leading `www.` — the
    * per-domain cap and the link graph treat `www.x.com` and `x.com`
    * as one publisher (crawl-pipeline convention, not RFC identity;
    * the canonical URL itself keeps `www.`). */
  def domainOf(url: Column): Column =
    regexp_replace(hostOf(url), "^www\\.", "")

  /** RFC 3986 §6.2.2.2 case normalization of percent-encodings:
    * `%3a` → `%3A` — the hex digits of every percent-triplet
    * uppercase (real crawl URLs mix producer casings constantly, and
    * without this `%2fa` and `%2Fa` dedup as different URLs).
    * Implemented as 12 chained `regexp_replace` passes — six per hex
    * position, each uppercasing one lowercase hex letter in context —
    * because a regex engine cannot case-shift a captured group: pass
    * one handles the FIRST hex digit (`%a(hex)` → `%A$1`, the
    * trailing hex-digit guard keeps a bare `%a` in path text
    * untouched), pass two the second (`%(HEX)a` → `%$1A`, first digit
    * already normalized). Pure codegen'd string algebra, replayed
    * verbatim by the RE2 oracle with `\1` backreferences. */
  def normalizePercentEncodings(c: Column): Column = {
    val firstUpper = "abcdef".foldLeft(c)((acc, d) =>
      regexp_replace(acc, s"%$d([0-9a-fA-F])", s"%${d.toUpper}$$1"))
    "abcdef".foldLeft(firstUpper)((acc, d) =>
      regexp_replace(acc, s"%([0-9A-F])$d", s"%$$1${d.toUpper}"))
  }

  /** RFC 3986 §6 canonical form plus the crawl-standard extras:
    * scheme and host lowercased, trailing host dot stripped, default
    * ports dropped (http:80 / https:443 — others kept), empty path
    * normalized to `/`, fragment dropped, `utm_*` tracking params
    * scrubbed from the query (empty query drops its `?`), and
    * percent-encoding hex case normalized
    * ([[normalizePercentEncodings]] — applied to the assembled URL,
    * which also restores the RFC's uppercase-hex form in host
    * triplets the host lowercasing just folded).
    *
    * INTERNATIONALIZED HOSTS: already-punycoded labels (`xn--…`)
    * canonicalize correctly (lowercasing is exactly their RFC 5890
    * normalization); raw-Unicode hosts must be IDNA-encoded UPSTREAM
    * at the ingest edge — see [[withAsciiHost]], which is JVM-side
    * (`java.net.IDN`) and deliberately NOT part of this oracle-
    * replayable string algebra. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemePat, 1))
    val host = hostOf(url)
    val port = regexp_extract(url, PortPat, 1)
    val path0 = regexp_extract(url, PathPat, 1)
    val query0 = regexp_extract(url, QueryPat, 1)
    // utm scrub as a pure regex chain, NOT a filter() lambda:
    // higher-order functions evaluate interpreted outside whole-stage
    // codegen (the TextHashes lesson) — three regexp_replace passes
    // keep the whole projection codegen'd. Strip anchored utm params,
    // then collapse '&' runs and trim edge '&'s.
    val q = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(query0, "(^|&)utm_[^&]*", "$1"),
      "&&+", "&"), "^&", ""), "&$", "")
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    normalizePercentEncodings(
      concat(scheme, lit("://"), host,
        when(port === "" || defaultPort, lit(""))
          .otherwise(concat(lit(":"), port)),
        when(path0 === "", lit("/")).otherwise(path0),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** IDNA-encode the host of each URL (ü → punycode `xn--…`) — the
    * ingest-edge pre-pass for raw-Unicode hosts, AFTER which
    * [[canonicalizeUrl]]'s pure string algebra applies. JVM-side
    * (`java.net.IDN`, RFC 3490) wrapped in a UDF: IDNA's Nameprep
    * tables are not expressible as portable regex algebra, so this
    * deliberately sits OUTSIDE the oracle-gated canonical chain —
    * run it once where URLs enter the system, not per query. A host
    * IDNA rejects (or a URL with no host) passes through unchanged:
    * dropping at the edge is the caller's policy, not the encoder's. */
  def withAsciiHost(df: DataFrame, urlCol: String,
      outCol: String = "url_ascii"): DataFrame = {
    val pat = java.util.regex.Pattern
      .compile("^([A-Za-z][A-Za-z0-9+.-]*://)([^/:?#]*)(.*)$",
        java.util.regex.Pattern.DOTALL)
    val toAscii = udf { (url: String) =>
      if (url == null) null
      else {
        val m = pat.matcher(url)
        if (!m.matches()) url
        else {
          val ascii =
            try java.net.IDN.toASCII(m.group(2))
            catch { case _: IllegalArgumentException => m.group(2) }
          m.group(1) + ascii + m.group(3)
        }
      }
    }
    df.withColumn(outCol, toAscii(col(urlCol)))
  }

  /** Adds `host`, `domain`, `canon_url` next to `urlCol` — the
    * projection a crawl pipeline runs before URL-keyed dedup. */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("host", hostOf(col(urlCol)))
      .withColumn("domain", domainOf(col(urlCol)))
      .withColumn("canon_url", canonicalizeUrl(col(urlCol)))

  /** Cap each registered domain at `k` documents by consistent hash
    * order ([[Sampling.capPerGroup]] over [[domainOf]]) — the
    * over-represented-publisher balance pass of corpus assembly. */
  def capPerDomain(df: DataFrame, urlCol: String, keyCol: String,
      k: Int, salt: String = ""): DataFrame =
    Sampling.capPerGroup(
      df.withColumn("domain", domainOf(col(urlCol))),
      Seq("domain"), keyCol, k, salt)

  /** Integer-exact PageRank over a (src_domain, dst_domain) link
    * list — crawl-frontier domain weighting. Duplicate rows are
    * parallel edges (a domain linking another N times contributes N
    * shares); output (domain, rank) in micro-units of `scale`
    * (see [[graft.operators.PageRank]]). */
  def domainPageRank(links: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, scale: Long = 1000000000000L): DataFrame =
    graft.operators.PageRank.runTyped(
        links.select(col(srcCol).cast("string").as("__src"),
          col(dstCol).cast("string").as("__dst")),
        "__src", "__dst", iterations, scale)
      .select(col("node").as("domain"), col("rank"))
}
