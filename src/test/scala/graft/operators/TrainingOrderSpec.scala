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
