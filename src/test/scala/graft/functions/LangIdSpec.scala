package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextOps

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("native langId agrees with the algebraic form on the test corpus") {
    val docs = Tables_documents
    val both = docs.select(
        col("doc_id"),
        TextOps.langId(col("text")).as("algebraic"),
        LangId.langId(col("text")).as("native"))
      .filter(col("algebraic") =!= col("native"))
    assert(both.count() == 0)
  }

  private def Tables_documents =
    graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("native langId: markers, ties, und, case/punct handling") {
    val out = Seq(
      ("en", "The cat IS in that house, and it is warm!"),
      ("de", "der hund ist nicht mit der katze und das ist gut"),
      ("es", "el perro y la casa es que una los las"),
      ("it", "il gatto che e di un per non va"),
      ("und", "zzz qqq 12345 xxx"),
      ("und", ""),
      // 'la' hits es/fr/it equally → alphabetical-first among max
      ("es", "la la la")
    ).toDF("expected", "text")
      .select(col("expected"), LangId.langId(col("text")).as("got"))
      .as[(String, String)].collect()
    out.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }
}
