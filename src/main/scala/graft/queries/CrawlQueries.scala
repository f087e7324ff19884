package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.CrawlOps

/** URL/domain crawl-layer queries ([[graft.ext.CrawlOps]]). The
  * testdata ships no URL column, so each query synthesizes a messy
  * URL as a PURE FUNCTION of (doc_id, source) — the
  * [[MultiModalQueries]] posture (syntheticPng): the fixture is
  * in-plan, built from exact string ops both engines share, and the
  * operator under test (canonicalize / cap / rank) never sees
  * anything it could fabricate. The mess matrix covers every
  * canonicalization rule: mixed-case schemes and hosts, optional
  * `WWW.`, mixed-case punycode labels, trailing root dot, default
  * and non-default ports, empty paths, percent-encodings in every
  * hex casing (incl. a multibyte UTF-8 pair), `utm_*` tracking
  * params, fragments.
  */
trait CrawlQueries extends QueriesBase {

  /** The messy synthetic URL of a document row. */
  private def messyUrl: Column = {
    val id = col("doc_id")
    val scheme = when(pmod(id, lit(3)) === 0, lit("http"))
      .when(pmod(id, lit(3)) === 1, lit("HTTPS"))
      .otherwise(lit("HtTp"))
    val www = when(pmod(id, lit(2)) === 0, lit("WWW.")).otherwise(lit(""))
    // a mixed-case ALREADY-PUNYCODED label: canonicalization must
    // only lowercase it (RFC 5890 — raw-Unicode hosts IDNA-encode
    // upstream via CrawlOps.withAsciiHost)
    val puny = when(pmod(id, lit(9)) === 0, lit("XN--BCHER-KVA."))
      .otherwise(lit(""))
    val host = concat(www, puny, col("source"), lit(".Example.COM"),
      when(pmod(id, lit(7)) === 0, lit(".")).otherwise(lit("")))
    val port = when(pmod(id, lit(5)) === 0, lit(":80"))
      .when(pmod(id, lit(5)) === 1, lit(":443"))
      .when(pmod(id, lit(5)) === 2, lit(":8080"))
      .otherwise(lit(""))
    // percent-encodings in every hex casing — lowercase, canonical
    // uppercase, and a lowercase multibyte UTF-8 pair (é) — so the
    // §6.2.2.2 case normalization is exercised per position
    val enc = when(pmod(id, lit(8)) === 0, lit("%2fitem%3a7"))
      .when(pmod(id, lit(8)) === 1, lit("%2Fitem%3A7"))
      .when(pmod(id, lit(8)) === 2, lit("%c3%a9dition"))
      .otherwise(lit(""))
    val path = when(pmod(id, lit(11)) === 0, lit(""))
      .otherwise(concat(lit("/Page/"), id.cast("string"), enc))
    val query = when(pmod(id, lit(4)) === 0,
        concat(lit("?utm_source=feed&ref="), pmod(id, lit(10)).cast("string")))
      .when(pmod(id, lit(4)) === 1,
        concat(lit("?ref="), pmod(id, lit(10)).cast("string")))
      .otherwise(lit(""))
    val frag = when(pmod(id, lit(6)) === 0, lit("#Section-2"))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  private def urlDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), messyUrl.as("url"))

  /** URL canonicalization over the full mess matrix — every rule
    * hash-checked: case, trailing dot, default-port drop, empty-path
    * `/`, `utm_*` scrub, fragment drop (see
    * [[CrawlOps.canonicalizeUrl]]). */
  val crawlCanonicalize: Q = (s, dir) =>
    CrawlOps.withUrlParts(urlDocs(s, dir), "url")

  /** Per-domain document cap (k=10, consistent hash order) over the
    * extracted registered domain — [[Sampling.capPerGroup]] pointed
    * at URL space (see [[CrawlOps.capPerDomain]]). */
  val crawlDomainCap: Q = (s, dir) =>
    CrawlOps.capPerDomain(urlDocs(s, dir), "url", "doc_id",
        k = 10, salt = "graft")
      .select("doc_id", "domain", "sample_rank")

  /** Domain-graph PageRank: each doc links its domain to a
    * deterministically chosen peer domain (`src((7·id+3) mod 20)`),
    * ranks in exact integer micro-units over the ~20-node publisher
    * graph — the crawl-prioritization weighting
    * (see [[CrawlOps.domainPageRank]]). */
  val crawlDomainPagerank: Q = (s, dir) => {
    val links = urlDocs(s, dir)
      .select(graft.ext.CrawlOps.domainOf(col("url")).as("src_domain"),
        concat(lit("src"),
          pmod(col("doc_id") * 7 + 3, lit(20)).cast("string"),
          lit(".example.com")).as("dst_domain"))
    CrawlOps.domainPageRank(links, "src_domain", "dst_domain",
      iterations = 10)
  }

  /** Domain reputation — the domain PRIOR crawl pipelines gate on
    * (CCNet/RefinedWeb keep per-domain quality statistics so a new
    * page inherits its publisher's track record): per registered
    * domain, the Gopher keep-rate of its documents and a ≥50%
    * reputation gate. One linear gopher pass + one hash agg on the
    * domain key; `n_docs ≥ 1` by construction so the ratio is safe. */
  val crawlDomainReputation: Q = (s, dir) => {
    val keep = graft.ext.TextOps.gopherSignals(Tables.documents(s, dir))
      .select(col("doc_id"), col("keep"))
    urlDocs(s, dir)
      .select(col("doc_id"), graft.ext.CrawlOps.domainOf(col("url")).as("domain"))
      .join(keep, "doc_id")
      .groupBy("domain").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      // integer-scaled rounding — see TextOps.qualitySignals
      .withColumn("keep_ratio",
        round(col("n_keep") * lit(10000.0) / col("n_docs")) / 1e4)
      .withColumn("reputable",
        lit(100L) * col("n_keep") >= lit(50L) * col("n_docs"))
  }

  /** Crawl scheduling priority — link authority damped by the
    * publisher's observed quality: per domain, the integer PageRank
    * micro-rank scaled by the Gopher keep-rate, priority =
    * (rank · n_keep) div n_docs in exact integer space (rank ≤ 10¹²,
    * n_keep ≤ n_docs ⇒ the product stays far under 2⁶³). Domains
    * that appear only as link TARGETS (no crawled docs yet) take
    * priority 0 — no quality evidence, crawl on authority alone is
    * the caller's policy decision. One join of the two bounded
    * domain-grain frames. */
  val crawlPriority: Q = (s, dir) =>
    crawlDomainPagerank(s, dir)
      .join(crawlDomainReputation(s, dir)
        .select("domain", "n_docs", "n_keep"), Seq("domain"), "left")
      .select(col("domain"), col("rank"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_keep"), lit(0L)).as("n_keep"))
      .withColumn("priority",
        when(col("n_docs") > 0,
          expr("(rank * n_keep) DIV n_docs")).otherwise(0L))

  /** This family's slice of [[Queries.all]]. */
  protected def crawlRegistry: Map[String, Q] = Map(
    "crawl_canonicalize" -> crawlCanonicalize,
    "crawl_domain_cap" -> crawlDomainCap,
    "crawl_domain_pagerank" -> crawlDomainPagerank,
    "crawl_domain_reputation" -> crawlDomainReputation,
    "crawl_priority" -> crawlPriority)
}
