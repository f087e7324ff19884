package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native [[WinnowingFingerprint]] expression against an
  * independent reference implementation of the same algorithm (BigInt
  * Horner gram hashes + brute-force window minima — none of the
  * native path's rolling update, Mersenne folding, or monotonic
  * deque), plus the containment property that makes winnowing useful
  * for near-dup detection.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Reference winnowing: gram i = code points [i, i+k), hashed with
    * the documented polynomial Σ cp·B^j mod P computed in BigInt;
    * window minima by brute-force slice-min; distinct. */
  private def refWinnow(text: String, k: Int, w: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    val Pb = BigInt(PortableHash.P)
    val Bb = BigInt(PortableHash.GramBase)
    val n = cps.length
    val numGrams = math.max(n - k + 1, 1)
    val grams = (0 until numGrams).map { i =>
      cps.slice(i, math.min(i + k, n))
        .foldLeft(BigInt(0))((acc, cp) => (acc * Bb + cp).mod(Pb)).toLong
    }
    (0 until numGrams).collect {
      case i if i >= w - 1 || i == numGrams - 1 =>
        grams.slice(math.max(0, i - w + 1), i + 1).min
    }.distinct
  }

  test("native winnow matches the BigInt reference (incl. multi-byte text)") {
    val rnd = new scala.util.Random(42)
    val docs = (1 to 60).map { i =>
      val len = rnd.nextInt(120) // includes len<k and len<k+w edge cases
      (i, rnd.alphanumeric.take(len).mkString.toLowerCase + " the end")
    } ++ Seq(
      (101, "héllo wörld with äccénts and ünïcode sprinkled through it"),
      (102, "混合テキスト with ascii and 日本語 characters interleaved"),
      (103, ""))
    val native = docs.toDF("id", "text")
      .select(col("id"), Winnowing.winnow(col("text"), 8, 4).as("fp"))
      .as[(Int, Seq[Long])].collect().toMap
    docs.foreach { case (id, text) =>
      val expected = refWinnow(text, 8, 4)
      assert(native(id).sorted == expected.sorted,
        s"doc $id fingerprints differ from reference")
    }
  }

  test("short documents (< k chars) produce exactly one fingerprint") {
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
