package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Opt-in spill-path smoke (set GRAFT_SCALE_SMOKE=1; r13 VERDICT #4):
  * the sf0.1 bench fits one machine's page cache, so until the driver
  * ships sf1 the external-spill code path — the thing that decides
  * whether a 100 TB shuffle completes or OOMs — had effectively never
  * fired in this repo. These tests FORCE it to fire and assert the
  * results stay exact while data goes through disk.
  *
  * Spark can't re-tune `spark.memory.fraction` inside a live JVM (one
  * SparkContext per JVM), so pressure comes from the DYNAMIC SQLConf
  * spill thresholds the operators themselves honor —
  * `windowExec.buffer.spill.threshold` and
  * `sortMergeJoinExec.buffer.spill.threshold` — set low enough that
  * the external sorters inside WindowExec and SortMergeJoin actually
  * page their buffers out (verified by nonzero task-metric
  * memory/disk spill bytes, not by inference). Each test computes an
  * exact expected answer, so "completed but wrong after spill" fails
  * as loudly as "OOMed".
  */
class SpillSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val enabled = sys.env.contains("GRAFT_SCALE_SMOKE")
  private def smokeTest(name: String)(body: => Unit): Unit =
    if (enabled) test(name)(body) else ignore(name)(())

  private def withSpillMetrics[A](body: => A): (A, Long, Long) = {
    val mem = new AtomicLong; val disk = new AtomicLong
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          mem.addAndGet(m.memoryBytesSpilled)
          disk.addAndGet(m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      org.apache.spark.GraftListenerFlush.flush(spark.sparkContext)
      (r, mem.get, disk.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  smokeTest("window aggregation under forced spill completes exactly") {
    // one fat key: 3M rows in a single window partition, buffer forced
    // to disk after 10k rows — the skewed-series shape at 100 TB
    val n = 3000000L
    withConf("spark.sql.windowExec.buffer.spill.threshold" -> "10000") {
      val ((rows, last), mem, disk) = withSpillMetrics {
        import org.apache.spark.sql.expressions.Window
        val df = spark.range(n)
          .select(lit("k").as("k"), col("id"),
            (col("id") % 1000).cast("double").as("v"))
        val w = Window.partitionBy("k").orderBy("id")
        val out = df.withColumn("run", sum("v").over(w))
          .agg(count(lit(1)), max("run"))
          .as[(Long, Double)].head()
        (out._1, out._2)
      }
      assert(rows == n, s"row count must survive the spill: $rows")
      // Σ over 3000 full cycles of (0+…+999)·3000 = 499500·3000
      assert(last == 499500.0 * 3000, s"running sum wrong after spill: $last")
      assert(mem > 0 || disk > 0,
        s"spill never fired (mem=$mem disk=$disk) — threshold not honored")
    }
  }

  smokeTest("sort-merge join under forced spill joins exactly") {
    // SMJ buffers the RIGHT side's per-key match group; 2000-deep
    // right keys overflow the 100-row in-memory form and page to disk
    // past 1000. The streamed left side stays SHALLOW (5 rows/key) on
    // purpose: every streamed row re-opens spill readers over the
    // buffered array (1 MB read-ahead buffers each), so a deep×deep
    // join under a forced-low threshold measures reader allocation,
    // not the spill path — the 100 TB-realistic shape is deep buffered
    // groups probed by a bounded stream.
    val keys = 100L
    withConf(
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "100",
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "1000",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val ((cnt, sv), mem, disk) = withSpillMetrics {
        val a = spark.range(keys * 5).select((col("id") % keys).as("k"),
          lit(1L).as("va"))
        val b = spark.range(keys * 2000).select((col("id") % keys).as("k"),
          lit(2L).as("vb"))
        a.join(b, "k").agg(count(lit(1)), sum(col("va") * col("vb")))
          .as[(Long, Long)].head()
      }
      val expected = keys * 5L * 2000L
      assert(cnt == expected, s"join cardinality must survive spill: $cnt")
      assert(sv == expected * 2, s"join values wrong after spill: $sv")
      assert(mem > 0 || disk > 0,
        s"spill never fired (mem=$mem disk=$disk) — threshold not honored")
    }
  }

  smokeTest("hash aggregation falls back to sort-based external agg exactly") {
    // high-cardinality agg: fallback threshold forces the hash agg to
    // switch to the sort-based external path after 10k distinct keys
    withConf("spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "100",
        "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "10000,10000") {
      val n = 5000000L
      val (out, _, _) = withSpillMetrics {
        spark.range(n).select((col("id") % 1000000).as("k"))
          .groupBy("k").agg(count(lit(1)).as("c"))
          .agg(count(lit(1)), sum("c"), max("c"))
          .as[(Long, Long, Long)].head()
      }
      assert(out == ((1000000L, n, 5L)),
        s"external agg must produce exact groups: $out")
    }
  }
}
