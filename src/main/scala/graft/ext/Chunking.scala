package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-budget context-window chunking with overlap — the inverse of
  * [[Packing]]: long documents are cut into training-example-sized
  * token windows (RAG passages, pretraining context windows), each
  * chunk sharing `overlap` tokens with its predecessor so no span of
  * meaning is split across a hard boundary.
  *
  * Chunk i of a document starts at token `1 + i·(chunkSize − overlap)`
  * and takes `chunkSize` tokens (the tail chunk takes what remains). A
  * tail start that contributes no NEW tokens — fewer than `overlap + 1`
  * tokens remain, so the window is fully contained in its predecessor —
  * is dropped.
  *
  * Scale shape: pure per-row compute (tokenize → bounded explode →
  * slice), NO shuffle anywhere — chunking 100 TB is exactly as
  * parallel as reading it. Token order is the only order used, so the
  * output is deterministic under any partitioning. No reference analog
  * (the reference pipeline never splits records); this is the EXT
  * training-data surface.
  */
object Chunking {

  /** One row per (document, chunk): `chunk_idx` (0-based),
    * `chunk_start` (1-based token offset), `n_chunk_tokens`, and the
    * reassembled `chunk_text`. Tokens are [[TextOps.tokens]]
    * (whitespace-robust); `chunk_text` rejoins them single-spaced.
    * Empty/whitespace-only documents yield no chunks. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be in [0, chunkSize)")
    val step = chunkSize - overlap
    df
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(1), col("__n"), lit(step)))
          .as(Seq("chunk_idx", "chunk_start")))
      // a tail window adding no new tokens is subsumed by its
      // predecessor: keep a non-first chunk only if more than `overlap`
      // tokens remain at its start
      .filter(col("chunk_idx") === 0 ||
        col("__n") - col("chunk_start") + 1 > overlap)
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        least(lit(chunkSize), col("__n") - col("chunk_start") + 1)
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__toks"), col("chunk_start"), lit(chunkSize)))
          .as("chunk_text"))
  }
}
