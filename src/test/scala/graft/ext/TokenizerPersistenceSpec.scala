package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the tokenizer save/load lifecycle (the [[Pq]]/[[Ivf]]
  * train-once / apply-many posture): for each of BPE, unigram-LM and
  * WordPiece, a model persisted to the lake and loaded in a "later
  * job" segments the corpus IDENTICALLY to the in-memory model it was
  * saved from.
  */
class TokenizerPersistenceSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick quick fox and the lazy lazy dog dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "the the the fox box dog 中文 数据")
  ).toDF("doc_id", "text")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tok_$name").toString + "/model"

  test("BPE: loaded merge table segments identically") {
    val merges = Bpe.trainMerges(corpus, "text", nMerges = 8)
    val trained = merges.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val path = tmp("bpe")
    Bpe.saveModel(merges, path)
    val loaded = Bpe.loadModel(spark, path)
    assert(loaded == trained, "merge order must survive the round trip")
    val a = Bpe.segment(corpus, "text", trained).collect()
      .map(w => w.word -> w.tokens).toMap
    val b = Bpe.segment(corpus, "text", loaded).collect()
      .map(w => w.word -> w.tokens).toMap
    assert(a == b)
  }

  test("unigram: loaded cost table segments identically") {
    val (pieces, costs) = Unigram.train(corpus, "text",
      seedSize = 30, vocabSize = 20)
    val path = tmp("uni")
    Unigram.saveModel(spark, pieces, path)
    val (loadedPieces, loadedCosts) = Unigram.loadModel(spark, path)
    assert(loadedPieces == pieces && loadedCosts == costs)
    val a = Unigram.segment(corpus, "text", costs).collect()
      .map(w => w.word -> w.seg).toMap
    val b = Unigram.segment(corpus, "text", loadedCosts).collect()
      .map(w => w.word -> w.seg).toMap
    assert(a == b)
  }

  test("unigram: loaded model applied to a corpus with unseen code points degrades, not dies") {
    // r13 ADVICE #2: train-once/apply-many means the later corpus can
    // contain code points absent from the saved cost table; the apply
    // must fall back to single-point emission instead of killing the
    // job, while covered words segment exactly as before.
    val (pieces, costs) = Unigram.train(corpus, "text",
      seedSize = 30, vocabSize = 20)
    val path = tmp("uni_unseen")
    Unigram.saveModel(spark, pieces, path)
    val (_, loadedCosts) = Unigram.loadModel(spark, path)
    val later = Seq((0L, "the fox"), (1L, "日本語 fox")).toDF("doc_id", "text")
    val segs = Unigram.segment(later, "text", loadedCosts).collect()
      .map(w => w.word -> w.seg).toMap
    val covered = Unigram.segment(corpus, "text", loadedCosts).collect()
      .map(w => w.word -> w.seg).toMap
    assert(segs("the") == covered("the") && segs("fox") == covered("fox"),
      "covered words must segment exactly as on the training corpus")
    assert(segs("日本語") == "日~本~語",
      "unseen word must fall back to single code points, one per char")
  }

  test("WordPiece: loaded merges + pieces segment identically") {
    val (merges, pieces) = WordPiece.train(corpus, "text", nMerges = 8)
    val root = tmp("wp")
    WordPiece.saveModel(spark, merges, pieces, root)
    val (loadedMerges, loadedPieces) = WordPiece.loadModel(spark, root)
    assert(loadedMerges == merges && loadedPieces == pieces)
    val a = WordPiece.segment(corpus, "text", pieces).collect()
      .map(w => w.word -> w.seg).toMap
    val b = WordPiece.segment(corpus, "text", loadedPieces).collect()
      .map(w => w.word -> w.seg).toMap
    assert(a == b)
    assert(a.values.exists(_.contains("~##")), "fixture exercises continuations")
  }
}
