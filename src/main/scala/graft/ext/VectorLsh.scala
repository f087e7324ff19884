package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hyperplane (random-projection / sign-bit) LSH for cosine
  * similarity — the vector-side analog of [[Dedup.minhashLshPairs]]:
  * candidate pairs come from equality joins on compact signatures,
  * never an all-pairs product, and survivors are verified with the
  * exact cosine. Charikar's SimHash-for-vectors scheme: for a random
  * hyperplane w, P[sign(w·a) = sign(w·b)] = 1 − θ(a,b)/π, so an
  * nBits-bit signature collides with probability (1 − θ/π)^nBits and
  * `tables` independent signatures amplify recall to
  * 1 − (1 − p^nBits)^tables (OR-of-ANDs banding).
  *
  * Hyperplanes are PSEUDO-random: component d of table t's bit-h plane
  * is xxhash64("vlsh", t, h, d) scaled to [−1, 1) — deterministic
  * across runs, executors, and cluster sizes, so signatures never need
  * to be stored or broadcast and incremental batches hash consistently
  * (the same property the md5-bucket split/sampling family relies on).
  * Uniform components stand in for Gaussians: the sign of w·v is
  * rotation-biased only negligibly for the collision bound, and the
  * determinism is worth far more at scale than the exact constant.
  *
  * Plan shape: per-row signature computation (codegen'd HOF folds,
  * O(tables·nBits·dim) hashes per vector), explode to `tables` rows of
  * (id, t, sig) — three fixed-width columns, same discipline as
  * [[Dedup.lshBandKeys]]: the exploded shuffle never carries the
  * vector — equi-join on (t, sig), dedup, then vectors join back once
  * per side for the exact-cosine verify. Output ⊆ the brute-force
  * pair set at the same threshold (the verify is exact); recall is the
  * amplified bound above (engine-specific signatures → rows-only at
  * the oracle gate; semantics are spec-pinned).
  */
object VectorLsh {

  /** Packed nBits-bit sign signature of `vec` against table `t`'s
    * pseudo-random hyperplanes — the ALGEBRAIC reference form, kept for
    * the equivalence spec. The hot path uses the codegen'd
    * [[graft.functions.VectorLshSigs.signatures]] (bit-identical; the
    * interpreted nested lambdas here cost ~8 s / 500 vectors). */
  private[graft] def signature(vec: Column, t: Column, nBits: Int): Column = {
    val dim = size(vec)
    // dim = 0 must yield an EMPTY index array, not sequence(0, -1)
    // (which descends to [0, -1] and indexes off the vector): the fold
    // then leaves dot = 0.0 for every bit → the all-zero signature the
    // native VectorLshSigs emits for empty vectors (r4 ADVICE #4)
    val dims = when(dim > 0, sequence(lit(0), dim - 1))
      .otherwise(array().cast("array<int>"))
    aggregate(sequence(lit(0), lit(nBits - 1)), lit(0L), (acc, h) => {
      val dot = aggregate(dims, lit(0.0d),
        (a, d) => a + element_at(vec, d + 1).cast("double") *
          (xxhash64(lit("vlsh"), t, h, d).cast("double") /
            lit(9.223372036854776e18)))
      shiftleft(acc, 1).bitwiseOR(when(dot > 0, lit(1L)).otherwise(lit(0L)))
    })
  }

  /** (id, t, sig) signature keys, one row per (vector, table) — keys
    * only: the tables×-exploded shuffle must not carry vectors (spec-
    * pinned on THIS frame's plan, since [[cosineLshPairs]] checkpoints
    * it and the explode disappears behind the materialization scan).
    * Signatures come from the single-pass codegen'd expression; the
    * algebraic twin above is spec-pinned bit-identical. */
  private[graft] def lshKeys(v: DataFrame, nBits: Int, tables: Int): DataFrame =
    v.select(col("id"),
      posexplode(graft.functions.VectorLshSigs.signatures(col("v"), nBits, tables))
        .as(Seq("t", "sig")))

  /** Near-neighbor pairs with exact cosine ≥ `threshold`, candidates
    * from `tables` independent sign-bit signatures. Unlike
    * [[Dedup.embeddingCosinePairs]] this needs no precomputed blocking
    * column — the signatures ARE the blocks. */
  def cosineLshPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nBits: Int = 8, tables: Int = 16): DataFrame = {
    require(nBits >= 1 && nBits <= 63, "nBits must be in [1, 63]")
    require(tables >= 1, "tables must be positive")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // materialized: both candidate self-join sides consume the keys
    // frame, and the O(tables·nBits·dim) signature hashing re-runs per
    // side without it (see Dedup.ngramJaccardPairs; persist(DISK_ONLY)
    // on a cluster). Neutral at catalog dim=8; the win is production
    // dims. The anchor below keeps its trivial constant keys
    // un-checkpointed.
    verifiedPairs(v, lshKeys(v, nBits, tables).localCheckpoint(), threshold)
  }

  /** Correctness anchor for the LSH machinery: the same candidate →
    * dedup → exact-cosine-verify tail as [[cosineLshPairs]] with a
    * single CONSTANT signature — every vector lands in one bucket, so
    * the candidate set is all pairs and the output ≡ the brute-force
    * cosine pair set at the threshold. Quadratic BY DESIGN (it exists
    * to hand the bucket-join/verify plumbing an exact-SQL oracle, the
    * `similarity_ivf_exhaustive` pattern) — run at verify scale, never
    * on a corpus. */
  def cosinePairsExhaustive(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val keys = v.select(col("id"), lit(0).as("t"), lit(0L).as("sig"))
    verifiedPairs(v, keys, threshold)
  }

  // The shared tail: equi-join candidates on (t, sig), dedup, join the
  // vectors back once per side, exact-cosine verify at `threshold`.
  private def verifiedPairs(v: DataFrame, keys: DataFrame,
      threshold: Double): DataFrame = {
    import graft.functions.VectorMath.cosineF
    val cand = keys.as("a").join(keys.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(v.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      // integer-scaled rounding — see Dedup.ngramJaccardPairs
      .select(col("id_a"), col("id_b"),
        (round(cosineF(col("v_a"), col("v_b")) * lit(10000.0)) / 1e4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
