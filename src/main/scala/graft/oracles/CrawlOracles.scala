package graft

/** DuckDB twins for the [[CrawlQueries]] family. The synthetic messy
  * URL and the canonicalization are exact string algebra (concat /
  * lower / regexp with character-class patterns), so every query is
  * fully hash-checked; the domain PageRank reuses the unrolled
  * integer power-iteration stages of `graph_pagerank`, with domain
  * STRINGS as node keys (the stages only equality-join and group).
  */
private[graft] object CrawlOracles {

  /** The messy-URL + canonical-parts CTE chain shared by all three
    * queries; final relation `c(doc_id, url, host, domain,
    * canon_url)`. */
  // NOTE: embedded into outer stripMargin'd interpolations — no line
  // here may BEGIN with '|' (a leading '||' would lose its first char
  // to the second stripMargin pass), so concatenation '||'s sit at
  // line ends.

  /** RFC 3986 §6.2.2.2 percent-encoding case normalization as the
    * same 12 regexp_replace passes the engine chains
    * (CrawlOps.normalizePercentEncodings), RE2 `\1` backreferences in
    * place of Java's `$1`; generated so the two chains cannot drift. */
  private def pctNormSql(inner: String): String = {
    val p1 = "abcdef".foldLeft(inner)((acc, d) =>
      s"regexp_replace($acc, '%$d([0-9a-fA-F])', '%${d.toUpper}\\1', 'g')")
    "abcdef".foldLeft(p1)((acc, d) =>
      s"regexp_replace($acc, '%([0-9A-F])$d', '%\\1${d.toUpper}', 'g')")
  }

  private val urlCtes: String =
    """u AS (SELECT doc_id,
      |    (CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTPS' ELSE 'HtTp' END) ||
      |    '://' || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
      |    (CASE WHEN doc_id % 9 = 0 THEN 'XN--BCHER-KVA.' ELSE '' END) ||
      |    source || '.Example.COM' ||
      |    (CASE WHEN doc_id % 7 = 0 THEN '.' ELSE '' END) ||
      |    (CASE doc_id % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
      |          WHEN 2 THEN ':8080' ELSE '' END) ||
      |    (CASE WHEN doc_id % 11 = 0 THEN '' ELSE '/Page/' || doc_id::VARCHAR ||
      |          (CASE doc_id % 8 WHEN 0 THEN '%2fitem%3a7' WHEN 1 THEN '%2Fitem%3A7'
      |                WHEN 2 THEN '%c3%a9dition' ELSE '' END) END) ||
      |    (CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&ref=' || (doc_id % 10)::VARCHAR
      |          WHEN 1 THEN '?ref=' || (doc_id % 10)::VARCHAR ELSE '' END) ||
      |    (CASE WHEN doc_id % 6 = 0 THEN '#Section-2' ELSE '' END) AS url
      |  FROM documents),
      |p AS (SELECT doc_id, url,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(lower(regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)), '\.$', '') AS host,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]*:([0-9]+)', 1) AS port,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
      |    regexp_extract(url, '\?([^#]*)', 1) AS query0
      |  FROM u),
      |q AS (SELECT *, regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(query0, '(^|&)utm_[^&]*', '\1', 'g'),
      |    '&&+', '&', 'g'), '^&', ''), '&$', '') AS qs FROM p),
      |c0 AS (SELECT doc_id, url, host,
      |    regexp_replace(host, '^www\.', '') AS domain,
      |    scheme || '://' || host ||
      |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
      |           OR (scheme = 'https' AND port = '443')
      |     THEN '' ELSE ':' || port END) ||
      |    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
      |    (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canon0
      |  FROM q),
      |c AS (SELECT doc_id, url, host, domain,
      |    """.stripMargin +
      pctNormSql("canon0") + " AS canon_url FROM c0)"

  /** Gopher keep flag per doc (the quality_gopher battery), relation
    * `k(doc_id, keep)` — shared by reputation and priority. */
  private val gopherKeepCtes: String =
    """toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text,
      |           '[ \t\n\x0b\f\r]+'), t -> t <> '') AS tk,
      |           text FROM documents),
      |s AS (SELECT doc_id,
      |        CAST(len(tk) AS BIGINT) AS n_words,
      |        CAST(coalesce(list_sum(list_transform(tk, t -> length(t))), 0)
      |          AS BIGINT) AS sum_chars,
      |        CAST(len(list_filter(tk,
      |          t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
      |        CAST(len(list_filter(tk, t -> list_contains(
      |          ['the','be','to','of','and','that','have','with'], t)))
      |          AS BIGINT) AS n_stop,
      |        CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_sym
      |      FROM toks),
      |k AS (SELECT doc_id,
      |        ((n_words >= 50 AND n_words <= 100000)
      |          AND (sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words)
      |          AND (5 * n_alpha >= 4 * n_words)
      |          AND (n_stop >= 2)
      |          AND (10 * n_sym <= n_words)) AS keep
      |      FROM s)""".stripMargin

  /** The domain-PageRank CTE chain (link list → 10 unrolled integer
    * stages); final relation `r10(node, rank)`. */
  private val pagerankCtes: String = {
    val stages = (1 to 10).map { i =>
      s"""c$i AS (SELECT a.dst AS node, sum(r.rank // a.deg) AS i
         |  FROM adj a JOIN r${i - 1} r ON a.node = r.node GROUP BY 1),
         |r$i AS (SELECT nd.node,
         |    (SELECT (15 * (1000000000000 // n)) // 100 FROM nn)
         |      + (85 * coalesce(c.i, 0)) // 100 AS rank
         |  FROM nodes nd LEFT JOIN c$i c ON nd.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""g AS (SELECT domain AS src,
       |        'src' || ((7 * doc_id + 3) % 20)::VARCHAR || '.example.com' AS dst
       |      FROM c),
       |nodes AS (SELECT src AS node FROM g UNION SELECT dst FROM g),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |deg AS (SELECT src AS node, count(*) AS deg FROM g GROUP BY 1),
       |adj AS (SELECT d.node, g.dst, d.deg FROM g JOIN deg d ON g.src = d.node),
       |r0 AS (SELECT node, (SELECT 1000000000000 // n FROM nn) AS rank FROM nodes),
       |$stages""".stripMargin
  }

  val map: Map[String, String] = Map(
    // Mirrors CrawlOps.withUrlParts over the synthetic mess matrix.
    "crawl_canonicalize" ->
      s"""WITH $urlCtes
         |SELECT doc_id, url, host, domain, canon_url FROM c""".stripMargin,

    // Mirrors CrawlOps.capPerDomain (k=10, salt 'graft'): k smallest
    // md5(doc_id‖salt) per registered domain, id tiebreak — the
    // sample_cap_per_group construction over URL space.
    "crawl_domain_cap" ->
      s"""WITH $urlCtes
         |SELECT doc_id, domain, sample_rank FROM (
         |  SELECT doc_id, domain,
         |         CAST(row_number() OVER (PARTITION BY domain
         |           ORDER BY md5(doc_id::VARCHAR || 'graft'), doc_id) AS INTEGER)
         |           AS sample_rank
         |  FROM c)
         |WHERE sample_rank <= 10""".stripMargin,

    // Mirrors crawlDomainReputation: per registered domain, the Gopher
    // keep-rate of its docs (the quality_gopher keep expression) and
    // the >= 50% reputation gate in exact integer space.
    "crawl_domain_reputation" ->
      s"""WITH $urlCtes,
         |$gopherKeepCtes,
         |g AS (SELECT domain, count(*) AS n_docs,
         |        CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
         |      FROM c JOIN k USING (doc_id) GROUP BY 1)
         |SELECT domain, n_docs, n_keep,
         |       round(n_keep * 10000.0 / n_docs) / 10000 AS keep_ratio,
         |       100 * n_keep >= 50 * n_docs AS reputable
         |FROM g""".stripMargin,

    // Mirrors crawlPriority: rank × keep-rate in exact integer space —
    // priority = (rank · n_keep) // n_docs; docless (dst-only) domains
    // take priority 0. The crawl scheduler's ordering score.
    "crawl_priority" ->
      s"""WITH $urlCtes,
         |$gopherKeepCtes,
         |$pagerankCtes,
         |rep AS (SELECT domain, count(*) AS n_docs,
         |          CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
         |        FROM c JOIN k USING (doc_id) GROUP BY 1)
         |SELECT r.node AS domain, CAST(r.rank AS BIGINT) AS rank,
         |       CAST(coalesce(n_docs, 0) AS BIGINT) AS n_docs,
         |       CAST(coalesce(n_keep, 0) AS BIGINT) AS n_keep,
         |       CAST(CASE WHEN coalesce(n_docs, 0) > 0
         |            THEN (CAST(r.rank AS BIGINT) * n_keep) // n_docs
         |            ELSE 0 END AS BIGINT) AS priority
         |FROM r10 r LEFT JOIN rep ON r.node = rep.domain""".stripMargin,

    // Mirrors CrawlOps.domainPageRank over the deterministic
    // doc→peer link list: 10 unrolled integer power-iteration stages
    // (the graph_pagerank stage algebra) on domain-string nodes.
    "crawl_domain_pagerank" ->
      s"""WITH $urlCtes,
         |$pagerankCtes
         |SELECT node AS domain, CAST(rank AS BIGINT) AS rank FROM r10""".stripMargin)
}
