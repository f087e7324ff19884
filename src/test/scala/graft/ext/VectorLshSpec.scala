package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorLshSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),          // identical to 1
    (3L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),         // near-dup of 1
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)),         // opposite of 1
    (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f))           // orthogonal
  ).toDF("vec_id", "embedding")

  test("identical vectors always collide; high-cosine pairs surface") {
    val out = VectorLsh.cosineLshPairs(vecs, "vec_id", "embedding",
        threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(r => (r._1, r._2) -> r._3).toMap
    // identical vectors share every signature in every table
    assert(pairs((1L, 2L)) == 1.0)
    // cos(1,3) ≈ 0.995: collision probability per 8-bit table ≈ 0.85^8,
    // amplified over 16 tables ≈ 0.97 — and the pseudo-random planes
    // are DETERMINISTIC, so this either passes always or fails always
    assert(pairs.contains((1L, 3L)))
  }

  test("output is a subset of brute force: verify is exact, no false pairs") {
    val out = VectorLsh.cosineLshPairs(vecs, "vec_id", "embedding",
        threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    // opposite and orthogonal vectors can never reach threshold even if
    // a degenerate signature collides — the exact-cosine verify holds
    assert(out.forall(r => r._3 >= 0.9))
    assert(!out.exists(r => r._2 == 4L || r._2 == 5L))
  }

  test("cosinePairsExhaustive ≡ brute force; LSH output ⊆ it") {
    val exhaustive = VectorLsh.cosinePairsExhaustive(vecs, "vec_id",
        "embedding", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    // all 3 pairs at cosine ≥ 0.9: (1,2)=1, (1,3)≈0.995, (2,3)≈0.995
    assert(exhaustive.map(r => (r._1, r._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val lsh = VectorLsh.cosineLshPairs(vecs, "vec_id", "embedding",
        threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exhaustive))
  }

  test("signatures are deterministic across runs and repartitionings") {
    val a = VectorLsh.cosineLshPairs(vecs, "vec_id", "embedding", 0.5)
      .collect().toSet
    val b = VectorLsh.cosineLshPairs(vecs.repartition(5), "vec_id", "embedding", 0.5)
      .collect().toSet
    assert(a == b)
  }

  test("native signature expression ≡ algebraic form, bit for bit") {
    // randomish but deterministic vectors, odd dims included — and the
    // EMPTY vector (r4 ADVICE #4: sequence(0, dim−1) descends for
    // dim=0; both forms must emit the all-zero signature)
    val dims = Seq(0, 1, 3, 8, 32)
    val data = dims.zipWithIndex.map { case (dim, i) =>
      (i.toLong, (0 until dim).map(d => ((d * 37 + i * 13) % 19 - 9) / 7.0f))
    }.toDF("vec_id", "embedding")
    val nBits = 8
    val tables = 16
    val native = data.select(col("vec_id"),
        graft.functions.VectorLshSigs.signatures(col("embedding"), nBits, tables).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val algebraic = data.select(col("vec_id"),
        transform(sequence(lit(0), lit(tables - 1)),
          t => VectorLsh.signature(col("embedding"), t, nBits)).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == algebraic)
    // the dim-0 row is index 0: all-zero signatures in every table
    assert(native(0L).forall(_ == 0L))
  }

  test("exploded signature frame carries keys only (no vector column)") {
    // asserted on the pre-checkpoint keys frame: cosineLshPairs
    // materializes it, which hides the Generate node behind the
    // checkpoint scan in the full query's plan
    val v = vecs.select(col("vec_id").as("id"), col("embedding").as("v"))
    val plan = VectorLsh.lshKeys(v, 8, 16)
      .queryExecution.optimizedPlan.toString
    // the generate (posexplode) node's output must not include `v`
    val genLine = plan.linesIterator.find(_.contains("Generate posexplode")).get
    assert(!genLine.contains(", v"), s"signature explode must drop vectors:\n$genLine")
  }
}
