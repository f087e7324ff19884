package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Opt-in pathological-distribution smoke for the benchmark screen's
  * pairing scans (set GRAFT_SCALE_SMOKE=1; r15 VERDICT #2): EVERY
  * bench token sorts lexically ABOVE every train token, so the whole
  * train side — millions of suffix positions — is ONE bench-free run
  * in suffix-array order. The r15 single-scan pairing buffered the
  * current bench-free run on the task heap (here: the entire
  * partition, ~N/parts rows ≈ GBs at production scale); the r16
  * two-direction scan carries ONE bench row per direction, so this
  * corpus costs O(1) scan memory by construction.
  *
  * Run it under a CONSTRAINED heap to make the bound observable:
  * `SPARK_DRIVER_MEM=2g GRAFT_SCALE_SMOKE=1 sbt "testOnly
  * graft.ext.CrossScreenSmokeSpec"` — the test JVM forks with that
  * -Xmx (build.sbt), and the run log records the max heap it actually
  * ran with. Asserts exactness too: one planted 60-token bench
  * passage inside one train doc must come back as exactly its span,
  * and every other train doc must report no overlap.
  */
class CrossScreenSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val enabled = sys.env.contains("GRAFT_SCALE_SMOKE")
  private def smokeTest(name: String)(body: => Unit): Unit =
    if (enabled) test(name)(body) else ignore(name)(())

  smokeTest("bench screen: one giant bench-free run stays O(1) scan memory, spans exact") {
    info(f"maxHeap=${Runtime.getRuntime.maxMemory / 1024.0 / 1024.0}%.0f MiB")
    val nDocs = 3000L
    val passage = (1 to 60).map(i => s"zz$i").mkString(" ")
    // train tokens are all 'w…' (unique per doc×pos — no accidental
    // repeats); doc 1500 carries the bench passage at token 1000
    val plainTrain = spark.range(nDocs).filter(col("id") =!= 1500L)
      .select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 1999), " +
          "i -> concat('w', id, 'x', i)), ' ')").as("text"))
    val plantedTrain = spark.range(1)
      .select(lit(1500L).as("doc_id"),
        concat(
          expr("array_join(transform(sequence(0, 999), " +
            "i -> concat('w1500x', i)), ' ')"),
          lit(" " + passage + " "),
          expr("array_join(transform(sequence(1060, 1999), " +
            "i -> concat('w1500x', i)), ' ')")).as("text"))
    // materialize to parquet and read back: a range+transform corpus
    // carries a bytes estimate of its TINY generator plan, which baits
    // AQE into broadcasting the N-row prefix frame (it OOMed this
    // smoke's first run) — parquet-backed reads plan from real sizes,
    // exactly like production inputs
    val root = java.nio.file.Files
      .createTempDirectory("graft-crossscreen").toString
    plainTrain.unionByName(plantedTrain)
      .write.mode("overwrite").parquet(s"$root/train")
    Seq((9000000L, s"zfillaaa $passage zfillbbb")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/bench")
    val train = spark.read.parquet(s"$root/train")
    val bench = spark.read.parquet(s"$root/bench")

    val t0 = System.nanoTime()
    val spans = SuffixDedup
      .benchOverlapSpans(train, bench, "doc_id", "text", minTokens = 50)
      .as[(Long, Int, Int, Int)].collect().toSet
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"benchOverlapSpans over ${nDocs * 2000} positions in $secs%.0f s")
    assert(spans == Set((1500L, 1000, 1060, 60)),
      s"planted passage must be the only overlap: $spans")

    val longest = SuffixDedup
      .benchLongestOverlap(train, bench, "doc_id", "text", minTokens = 50)
    val hits = longest.filter(col("longest_bench_tokens") > 0)
      .as[(Long, Int, Int)].collect().toSet
    assert(hits == Set((1500L, 60, 1000)),
      s"longest overlap must be the planted doc alone: $hits")
    assert(longest.count() == nDocs)
    assert(secs < 900, s"bench screen blew up on the pathological run: $secs s")
  }
}
