package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native [[WinnowingFingerprint]] expression against an
  * independent column-algebra formulation of the same algorithm
  * (xxhash64 over substrings + sliding-window array_min), plus the
  * containment property that makes winnowing useful for near-dup
  * detection.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Column-algebra winnowing: k-grams via substr (char-based — equals
    * byte-based on ASCII), window minima via slice+array_min. The
    * formulation the native expression replaced; O(n·k·w) and
    * interpreted, but an independent oracle for its semantics. */
  private def algebraWinnow(t: org.apache.spark.sql.Column, k: Int, w: Int) = {
    val grams = transform(
      sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
      i => xxhash64(t.substr(i, lit(k))))
    array_distinct(transform(
      sequence(lit(0), greatest(size(grams) - w, lit(0))),
      i => array_min(slice(grams, i + 1, lit(w)))))
  }

  test("native winnow matches column-algebra oracle on random ASCII docs") {
    val rnd = new scala.util.Random(42)
    val docs = (1 to 60).map { i =>
      val len = rnd.nextInt(120) // includes len<k and len<k+w edge cases
      (i, rnd.alphanumeric.take(len).mkString.toLowerCase + " the end")
    }
    val df = docs.toDF("id", "text")
    val mismatches = df.select(
        array_sort(Winnowing.winnow(col("text"), 8, 4)).as("native"),
        array_sort(algebraWinnow(col("text"), 8, 4)).as("algebra"))
      .filter(col("native") =!= col("algebra"))
      .count()
    assert(mismatches == 0)
  }

  test("short documents (< k bytes) produce exactly one fingerprint") {
    val out = Seq("ab", "", "1234567").toDF("text")
      .select(size(Winnowing.winnow(col("text"), 8, 4))).as[Int].collect()
    assert(out.toSeq == Seq(1, 1, 1))
  }

  test("containment: a document shares most fingerprints with itself + suffix") {
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val extended = base + " and then some extra trailing content appended"
    val df = Seq((1, base), (2, extended)).toDF("id", "text")
    val fps = df.select(col("id"), Winnowing.winnow(col("text"), 8, 4).as("fp"))
      .as[(Int, Seq[Long])].collect().toMap
    val shared = fps(1).toSet.intersect(fps(2).toSet).size.toDouble / fps(1).toSet.size
    assert(shared > 0.9, s"expected >90% shared fingerprints, got $shared")
    // and an unrelated document shares ~none
    val other = "completely different material with no overlap whatsoever here"
    val fpsOther = Seq((3, other)).toDF("id", "text")
      .select(Winnowing.winnow(col("text"), 8, 4)).as[Seq[Long]].head().toSet
    assert(fps(1).toSet.intersect(fpsOther).isEmpty)
  }

  test("winnow is deterministic across interpreted and codegen paths") {
    val doc = "some stable document text for determinism checking 0123456789"
    val df = Seq(doc).toDF("text")
    val viaCodegen = df.select(Winnowing.winnow(col("text"))).head().getSeq[Long](0)
    // force interpreted path through a non-codegen context: eval on literal
    val expr = WinnowingFingerprint(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(doc),
        org.apache.spark.sql.types.StringType), 8, 4)
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    assert(viaCodegen == interpreted)
  }
}
