package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TrainingOrderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 400L).map(i => (i, s"doc$i"))
    .toDF("id", "payload")

  test("withOrder: deterministic under repartitioning, shard in range") {
    val a = TrainingOrder.withOrder(docs, "id", shards = 8, salt = "s", epoch = 0)
      .select("id", "shuffle_key", "shard").as[(Long, String, Int)]
      .collect().sortBy(_._1)
    val b = TrainingOrder.withOrder(docs.repartition(7), "id", shards = 8,
        salt = "s", epoch = 0)
      .select("id", "shuffle_key", "shard").as[(Long, String, Int)]
      .collect().sortBy(_._1)
    assert(a.sameElements(b))
    assert(a.forall { case (_, _, sh) => sh >= 0 && sh < 8 })
  }

  test("epochs are independent permutations; salt re-rolls everything") {
    def order(epoch: Int, salt: String = "s"): Seq[Long] =
      TrainingOrder.withOrder(docs, "id", shards = 8, salt = salt, epoch = epoch)
        .orderBy("shuffle_key").select("id").as[Long].collect().toSeq
    val e0 = order(0)
    val e1 = order(1)
    assert(e0.sorted == e1.sorted, "permutations cover the same ids")
    assert(e0 != e1, "epoch must change the order")
    assert(e0 != order(0, salt = "t"), "salt must change the order")
    assert(e0 == order(0), "same (salt, epoch) must replay exactly")
  }

  test("shards are roughly balanced (md5 uniformity)") {
    val counts = TrainingOrder.withOrder(docs, "id", shards = 8, salt = "s")
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(counts.keySet == (0 until 8).toSet)
    // 400 rows / 8 shards = 50 expected; 3σ ≈ 20 for binomial(400, 1/8)
    assert(counts.values.forall(c => c > 25 && c < 75),
      s"shard counts far from uniform: $counts")
  }

  test("withOrder plans zero shuffles — per-row compute only") {
    val plan = TrainingOrder.withOrder(docs, "id", shards = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("interleaveBySource: pos order cycles sources round-robin") {
    import spark.implicits._
    val rows = ((1L to 30L).map(i => (i, "web")) ++
      (31L to 50L).map(i => (i, "books")) ++
      (51L to 60L).map(i => (i, "code"))).toDF("id", "source")
    val out = TrainingOrder.interleaveBySource(rows, "id", "source")
      .select("id", "source", "src_rank", "source_idx", "interleave_pos")
      .as[(Long, String, Long, Int, Long)].collect().sortBy(_._5)
    assert(out.length == 60)
    assert(out.map(_._5).distinct.length == 60, "positions never collide")
    // pos ≡ source_idx (mod S) by construction ⇒ while every source
    // still has rows, consecutive positions cycle through all three
    assert(out.forall(r => r._5 % 3 == r._4))
    val firstNine = out.take(9).map(_._2)
    assert(firstNine.grouped(3).forall(_.toSet ==
      Set("web", "books", "code")), firstNine.mkString(","))
    // deterministic: a repartitioned rerun emits the identical layout
    val again = TrainingOrder.interleaveBySource(
        rows.repartition(7), "id", "source")
      .select("id", "interleave_pos").as[(Long, Long)].collect().toSet
    assert(again == out.map(r => (r._1, r._5)).toSet)
    // the bounded-vocabulary guard throws rather than strides huge
    val e = intercept[IllegalArgumentException] {
      TrainingOrder.interleaveBySource(rows, "id", "source", maxSources = 2)
    }
    assert(e.getMessage.contains("maxSources"))
  }

  test("layoutByOrder: files are contiguous key ranges in key order") {
    val parts = TrainingOrder.layoutByOrder(docs, "id", numPartitions = 4)
      .select("shuffle_key")
      .rdd.mapPartitions(it => Iterator(it.map(_.getString(0)).toSeq))
      .collect().filter(_.nonEmpty)
    // sorted within each partition
    assert(parts.forall(p => p == p.sorted))
    // partition ranges do not overlap (range partitioner contract)
    val spans = parts.map(p => (p.head, p.last)).sortBy(_._1)
    assert(spans.sliding(2).forall {
      case Array((_, hi), (lo, _)) => hi <= lo
      case _ => true
    })
  }
}
