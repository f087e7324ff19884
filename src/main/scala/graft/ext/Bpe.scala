package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units", ACL — the algorithm behind BPE/GPT-style subword
  * vocabularies): repeatedly merge the most frequent adjacent symbol
  * pair across the corpus. The tokenizer-training operator a
  * training-data pipeline runs BEFORE token counting and packing mean
  * anything.
  *
  * Scale shape — the published algorithm, arranged for a cluster:
  *   - ONE corpus scan builds the word-frequency table (hash groupBy,
  *     map-side combined); every later step works on that
  *     vocab-bounded frame (|distinct words|, not |corpus|) — the
  *     same reduction Sennrich's reference implementation makes with
  *     its in-memory dict, kept DISTRIBUTED here because a 100 TB
  *     multilingual crawl's vocabulary does not fit one machine;
  *   - each merge step is one explode + hash-agg over the word table
  *     (pair counts weighted by word frequency) plus a 1-row
  *     `TakeOrdered` collect of the winning pair — the merge list is
  *     the MODEL being trained, so driver state is k rows by
  *     definition, never corpus data;
  *   - the merge is applied with a literal `replace` over the '~'-
  *     joined symbol string (left-to-right, non-overlapping — BPE's
  *     greedy application order, verified identical in Spark and
  *     DuckDB), and the word frame is checkpointed per step so plan
  *     depth stays constant (cluster: persist DISK_ONLY).
  *
  * Determinism: ties on pair count break lexicographically (smallest
  * left, then right symbol) — a pinned, engine-portable substitute for
  * the reference implementation's dict-order tie, so the whole merge
  * sequence replays bit-for-bit in the SQL oracle. Symbols are
  * lowercase letters/digits ([[TextOps.regexTokens]]), so '~' is a
  * safe separator and symbols embed safely in SQL literals.
  */
object Bpe {

  /** Word-frequency table: (word, freq) over regex tokens. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.regexTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `nMerges` BPE merges over the corpus; returns the merge
    * table (step, lhs, rhs, merged, pair_count) — the trained
    * tokenizer model, one row per merge in training order. Stops
    * early if the corpus runs out of adjacent pairs. */
  def trainMerges(df: DataFrame, textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    var words = wordFreq(df, textCol)
      .select(concat_ws("~", split(col("word"), "")).as("symbols"),
        col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val toks = split(col("symbols"), "~")
      val nPairs = greatest(size(toks) - 1, lit(0))
      val best = words
        .select(col("freq"), explode(zip_with(
          slice(toks, lit(1), nPairs), slice(toks, lit(2), nPairs),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, l, r, l + r, c))
        words = words
          .withColumn("symbols", expr(s"replace(symbols, '$l~$r', '$l$r')"))
          .localCheckpoint()
        step += 1
      }
    }
    merges.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** Segment each word of the corpus with a trained merge table:
    * (word, freq, tokens, n_tokens) — the apply side of the trained
    * model, replaying the merge list in training order (BPE inference
    * is exactly the training-order replay). `mergeList` is the
    * driver-held model (k rows); the corpus-side work is one scan. */
  def segment(df: DataFrame, textCol: String,
      mergeList: Seq[(String, String)]): DataFrame = {
    val words = wordFreq(df, textCol)
    // regexp_replace with a \Q-quoted literal ≡ the trainer's literal
    // replace (both Java-regex left-to-right non-overlapping)
    val seg = mergeList.foldLeft(
      concat_ws("~", split(col("word"), ""))) { case (acc, (l, r)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(l + "~" + r), l + r)
    }
    words
      .withColumn("tokens", split(seg, "~"))
      .withColumn("n_tokens", size(col("tokens")))
      .select("word", "freq", "tokens", "n_tokens")
  }
}
