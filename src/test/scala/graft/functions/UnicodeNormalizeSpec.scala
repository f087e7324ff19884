package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextOps

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // expected outputs verified against DuckDB
  // regexp_replace(lower(trim(strip_accents(nfc_normalize(t)))), '\s+', ' ', 'g')
  private val cases = Seq(
    "Café  ÑOÑO" -> "cafe nono",       // composed accents strip
    "naïve  façade" -> "naive facade", // diaeresis + cedilla strip
    "e\u0301clair" -> "eclair",        // DECOMPOSED input canonicalizes too
    "ＡＢＣ" -> "ａｂｃ",               // compatibility forms survive (not NFKC)
    "ﬁne" -> "ﬁne",                    // ligature survives
    "Ωmega" -> "ωmega",                // case-fold without decomposition
    "ß sharp" -> "ß sharp",            // no decomposition for sharp s
    "中文 text" -> "中文 text",         // non-Latin untouched
    "  already   ascii  " -> "already ascii")

  test("normalizeText matches the DuckDB twin on composed/decomposed unicode") {
    val out = cases.map(_._1).toDF("t")
      .select(col("t"), TextOps.normalizeText(col("t")).as("c"))
      .as[(String, String)].collect().toMap
    for ((in, want) <- cases) assert(out(in) == want, s"input: ${in}")
  }

  test("composed and decomposed crawls canonicalize to the same key") {
    val composed = "caf\u00e9 r\u00e9sum\u00e9"        // é = U+00E9
    val decomposed = "cafe\u0301 re\u0301sume\u0301"   // e + U+0301
    val out = Seq(composed, decomposed).toDF("t")
      .select(TextOps.normalizeText(col("t"))).as[String].collect().toSet
    assert(out == Set("cafe resume"))
  }

  test("ascii fast path returns the input bytes unchanged") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii")
    assert(NfcNormalizeExpr.compute(s) eq s)
    assert(StripAccentsExpr.compute(s) eq s)
  }

  test("null propagates; non-string input is rejected at analysis") {
    val out = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(TextOps.normalizeText(col("t"))).as[Option[String]].head()
    assert(out.isEmpty)
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    assertThrows[Exception] {
      Seq(1L).toDF("x")
        .select(column(StripAccentsExpr(expression(col("x")))))
        .collect()
    }
  }
}
