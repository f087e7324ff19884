package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CrawlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url")
      .select(CrawlOps.canonicalizeUrl(col("url")).as("c"))
      .as[String].head()

  test("canonicalization edge matrix") {
    val cases = Seq(
      // case folding: scheme + host only, path stays
      "HTTPS://WWW.Example.COM/Path/X" -> "https://www.example.com/Path/X",
      // default ports drop, scheme-sensitive
      "http://a.com:80/x" -> "http://a.com/x",
      "https://a.com:443/x" -> "https://a.com/x",
      "HtTpS://a.com:443/x" -> "https://a.com/x",
      // non-default ports keep; http:443 / https:80 are NOT default
      "http://a.com:443/x" -> "http://a.com:443/x",
      "https://a.com:80/x" -> "https://a.com:80/x",
      "http://a.com:8080/x" -> "http://a.com:8080/x",
      // trailing root dot strips; empty path → '/'
      "http://a.com./x" -> "http://a.com/x",
      "http://a.com" -> "http://a.com/",
      "http://a.com:80" -> "http://a.com/",
      // fragment drops, query survives it
      "http://a.com/x#frag" -> "http://a.com/x",
      "http://a.com/x?q=1#frag" -> "http://a.com/x?q=1",
      // utm_* params scrub; fully-scrubbed query drops its '?'
      "http://a.com/x?utm_source=f&q=1&utm_b=2" -> "http://a.com/x?q=1",
      "http://a.com/x?utm_source=f" -> "http://a.com/x",
      // query on empty path keeps the inserted '/'
      "http://a.com?q=1" -> "http://a.com/?q=1",
      // www is identity-preserved in the canonical URL
      "http://www.a.com/x" -> "http://www.a.com/x")
    cases.foreach { case (in, want) =>
      assert(canon(in) == want, s"canon($in)")
    }
  }

  test("percent-encoding case normalization (RFC 3986 §6.2.2.2)") {
    val cases = Seq(
      // each hex position independently, and both together
      "http://a.com/x%3a" -> "http://a.com/x%3A",
      "http://a.com/x%a3" -> "http://a.com/x%A3",
      "http://a.com/x%af" -> "http://a.com/x%AF",
      "http://a.com/x%AF" -> "http://a.com/x%AF",
      // multibyte UTF-8 pair (é), both triplets normalize
      "http://a.com/caf%c3%a9" -> "http://a.com/caf%C3%A9",
      // triplet followed by more hex-looking text: only the pair shifts
      "http://a.com/%2fabc" -> "http://a.com/%2Fabc",
      // query-side triplets normalize too; utm scrub runs first
      "http://a.com/x?q=%2f&utm_s=%2f" -> "http://a.com/x?q=%2F",
      // a bare % with ONE trailing hex char is not a valid triplet —
      // untouched (the trailing-hex guard)
      "http://a.com/100%a" -> "http://a.com/100%a",
      // host triplets end uppercase even though the host lowercases
      "http://a%3acom.net/x" -> "http://a%3Acom.net/x")
    cases.foreach { case (in, want) =>
      assert(canon(in) == want, s"canon($in)")
    }
  }

  test("withAsciiHost: raw-Unicode hosts punycode; ascii and pre-encoded pass through") {
    val out = CrawlOps.withAsciiHost(
        Seq(
          (1L, "http://bücher.example/x?ü=1"), // host encodes, path/query untouched
          (2L, "https://WWW.Ascii.COM/x"),     // pure-ascii unchanged
          (3L, "http://xn--bcher-kva.example/x"), // already punycoded: idempotent
          (4L, "not a url at all")             // no host → pass through
        ).toDF("doc_id", "url"), "url")
      .select("doc_id", "url_ascii").as[(Long, String)].collect().toMap
    assert(out(1L) == "http://xn--bcher-kva.example/x?ü=1")
    assert(out(2L) == "https://WWW.Ascii.COM/x")
    assert(out(3L) == "http://xn--bcher-kva.example/x")
    assert(out(4L) == "not a url at all")
    // composition with the canonical chain: encode at the edge, then
    // pure string algebra the oracle replays
    val canonized = Seq("http://BÜCHER.example/%2fx").toDF("url")
      .transform(df => CrawlOps.withAsciiHost(df, "url"))
      .select(CrawlOps.canonicalizeUrl(col("url_ascii")).as("c"))
      .as[String].head()
    assert(canonized == "http://xn--bcher-kva.example/%2Fx")
  }

  test("host and domain extraction") {
    val rows = Seq(
      (1L, "HTTPS://WWW.Example.COM.:443/x"),
      (2L, "http://sub.example.com/y"),
      (3L, "http://wwwx.example.com/z") // 'www' must match as a LABEL
    ).toDF("id", "url")
    val out = CrawlOps.withUrlParts(rows, "url")
      .select("id", "host", "domain").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, "www.example.com", "example.com")))
    assert(out(1) == ((2L, "sub.example.com", "sub.example.com")))
    assert(out(2) == ((3L, "wwwx.example.com", "wwwx.example.com")),
      "www-strip must only strip the dotted label")
  }

  test("capPerDomain groups www/case/port variants of one publisher") {
    val docs = (1L to 30L).map { i =>
      val host = if (i % 2 == 0) "WWW.One.COM" else "one.com."
      (i, s"http://$host/p/$i")
    }.toDF("doc_id", "url")
    val kept = CrawlOps.capPerDomain(docs, "url", "doc_id", k = 5)
      .select("doc_id", "domain").as[(Long, String)].collect()
    assert(kept.length == 5, "all 30 variants are ONE domain")
    assert(kept.forall(_._2 == "one.com"))
    // consistent sample: a rerun keeps the identical 5
    val again = CrawlOps.capPerDomain(docs, "url", "doc_id", k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("domainPageRank on string nodes ≡ PageRank.run on mapped ids") {
    val links = Seq(
      ("a.com", "b.com"), ("a.com", "b.com"), // parallel edge
      ("b.com", "c.com"), ("c.com", "a.com"), ("d.com", "a.com")
    ).toDF("s", "d")
    val byName = CrawlOps.domainPageRank(links, "s", "d", iterations = 10)
      .as[(String, Long)].collect().toMap
    val ids = Map("a.com" -> 1L, "b.com" -> 2L, "c.com" -> 3L, "d.com" -> 4L)
    val byId = graft.operators.PageRank.run(
        links.select(
          element_at(typedLit(ids), col("s")).as("s"),
          element_at(typedLit(ids), col("d")).as("d")),
        "s", "d", iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(ids.forall { case (name, id) => byName(name) == byId(id) },
      s"$byName vs $byId")
    // sink-heavy a.com must outrank the leaf d.com
    assert(byName("a.com") > byName("d.com"))
  }
}
