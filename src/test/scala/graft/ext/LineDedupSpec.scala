package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha\nbeta\nalpha\ngamma\nbeta"), // two intra-doc dups
    (2L, "alpha\nalpha\nalpha"),             // one distinct line
    (3L, "unique one\nunique two"),
    (4L, ""),                                // one empty line
    (5L, "footer\nbody five\nfooter"),
    (6L, "footer\nbody six"),
    (7L, "footer\nbody seven"),
    (8L, "footer\nbody eight"),
    (9L, "footer\nbody nine")
  ).toDF("doc_id", "text")

  test("dedupLines keeps first occurrences in order") {
    val out = TextOps.dedupLines(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 5L, 3L, "alpha\nbeta\ngamma")))
    assert(out(2L) == ((2L, 3L, 1L, "alpha")))
    assert(out(3L) == ((3L, 2L, 2L, "unique one\nunique two")))
    // "" splits to one empty line, kept verbatim
    assert(out(4L) == ((4L, 1L, 1L, "")))
    assert(out(5L) == ((5L, 3L, 2L, "footer\nbody five")))
  }

  test("stripFrequentLines strikes the global footer, keeps bodies") {
    // 'footer' appears in docs 5..9 = 5 distinct docs → df floor hit;
    // intra-doc repetition (doc 5 has it twice) must NOT inflate df
    val out = TextOps.stripFrequentLines(docs, minDocFreq = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(5L) == ((5L, 3L, 2L, "body five")), s"got ${out(5L)}")
    assert(out(6L) == ((6L, 2L, 1L, "body six")))
    assert(out(9L) == ((9L, 2L, 1L, "body nine")))
    // docs without the footer are untouched
    assert(out(1L)._3 == 0L && out(1L)._4 == "alpha\nbeta\nalpha\ngamma\nbeta")
    // a doc whose EVERY line is boilerplate empties honestly
    val allBoiler = (Seq((10L, "footer")) ++ (5L to 9L)
        .map(i => (i, docs.filter(col("doc_id") === i)
          .select("text").as[String].head())))
      .toDF("doc_id", "text")
    val res = TextOps.stripFrequentLines(allBoiler, minDocFreq = 5)
      .filter(col("doc_id") === 10L)
      .as[(Long, Long, Long, String)].head()
    assert(res == ((10L, 1L, 1L, "")))
  }

  test("df floor counts distinct docs: below-floor corpora are untouched") {
    val four = docs.filter(col("doc_id") =!= 9L) // footer df = 4 < 5
    val out = TextOps.stripFrequentLines(four, minDocFreq = 5)
      .as[(Long, Long, Long, String)].collect()
    assert(out.forall(_._3 == 0L), "nothing reaches the floor")
  }
}
