package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  // two tight bundles (near-dup groups) + two isolated vectors; ids
  // chosen arbitrarily — center selection is md5-keyed, so the spec
  // must hold for ANY id set
  private def fixture = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f)),         // exact dup of 1
    (3L, Array(0.99f, 0.1f, 0.0f)),        // near-dup of 1 (cos ≈ 0.995)
    (10L, Array(0.0f, 1.0f, 0.0f)),
    (11L, Array(0.0f, 0.98f, 0.15f)),      // near-dup of 10 (cos ≈ 0.988)
    (20L, Array(0.0f, 0.0f, 1.0f)),        // isolated
    (21L, Array(-1.0f, 0.5f, 0.0f))        // isolated
  ).toDF("vec_id", "embedding")

  private def run(nCenters: Int = 3, threshold: Double = 0.9) =
    SemDedup.semanticDedup(fixture, "vec_id", "embedding", nCenters, threshold)
      .select($"vec_id".as[Long], $"cluster".as[Long],
        $"dup_label".as[Long], $"is_keep".as[Boolean])
      .collect().sortBy(_._1).toSeq

  test("every input id appears exactly once; keep ⇔ own group label") {
    val out = run()
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L))
    out.foreach { case (id, _, label, keep) =>
      assert(keep == (label == id), s"id $id: is_keep must mean label == id")
    }
    // labels are always group minima, so each group keeps exactly one
    val groups = out.groupBy(_._3)
    groups.foreach { case (label, members) =>
      assert(members.count(_._4) == 1, s"group $label keeps exactly one")
      assert(members.map(_._1).min == label, s"group label $label is the min id")
    }
  }

  test("identical and near-identical vectors share a group; isolated vectors are singleton keeps") {
    val out = run()
    val label = out.map(r => r._1 -> r._3).toMap
    assert(label(1L) == label(2L) && label(2L) == label(3L),
      "the {1,2,3} bundle is one semantic-dup group")
    assert(label(10L) == label(11L), "the {10,11} bundle is one group")
    assert(label(20L) == 20L && label(21L) == 21L, "isolated vectors keep themselves")
    assert(out.filter(r => Set(20L, 21L)(r._1)).forall(_._4))
  }

  test("duplicate groups never span coarse clusters") {
    val out = run()
    out.groupBy(_._3).foreach { case (label, members) =>
      assert(members.map(_._2).distinct.size == 1,
        s"group $label spans clusters ${members.map(_._2).distinct}")
    }
  }

  test("result is invariant under input partitioning and row order") {
    val base = run()
    val shuffled = SemDedup.semanticDedup(
        fixture.orderBy(rand(7)).repartition(5), "vec_id", "embedding",
        nCenters = 3, threshold = 0.9)
      .select($"vec_id".as[Long], $"cluster".as[Long],
        $"dup_label".as[Long], $"is_keep".as[Boolean])
      .collect().sortBy(_._1).toSeq
    assert(shuffled == base)
  }

  test("nCenters ≥ corpus size degenerates to every-vector-a-center and still groups dups") {
    val out = run(nCenters = 100)
    val label = out.map(r => r._1 -> r._3).toMap
    // exact dups tie at cosine 1.0 for both their own centers — the
    // min-center tiebreak still co-locates them
    assert(label(1L) == label(2L), "exact dups group even in the degenerate quantizer")
  }

  test("threshold above every pairwise cosine yields all singletons") {
    val out = run(threshold = 0.9999)
    // exact dups (cos = 1.0) still group; everything else is singleton
    assert(out.count(!_._4) == 1, "only the exact dup is dropped")
  }

  test("maxCluster guard refuses a hot cluster instead of the quadratic pair join") {
    // nCenters=1 puts all 7 vectors in one cluster — over any cap < 7
    // the operator must throw with the remediation message, and with
    // the cap raised it must return normally
    val e = intercept[IllegalStateException] {
      SemDedup.semanticDedup(fixture, "vec_id", "embedding",
        nCenters = 1, threshold = 0.9, maxCluster = 3)
    }
    assert(e.getMessage.contains("maxCluster") && e.getMessage.contains("nCenters"))
    val ok = SemDedup.semanticDedup(fixture, "vec_id", "embedding",
      nCenters = 1, threshold = 0.9, maxCluster = 7)
    assert(ok.count() == 7)
  }

  test("two-level assignment ≡ flat assignment when every cluster holds a super-center") {
    // Build the fixture AROUND the md5 draw: rank candidate ids by
    // md5 exactly as the quantizer does, anchor the 3 smallest (the
    // supers for nCenters = 9) on orthogonal axes, and spread the rest
    // round-robin as perturbed cluster members. Every cluster then
    // contains its own super, so each vector's global argmax center
    // sits inside its super's bucket and the two plans must agree
    // id-for-id — the unambiguous-bucket equivalence regime.
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ranked = (1L to 12L).sortBy(id => (md5hex(id.toString), id))
    val axes = Seq(Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f))
    val rows = ranked.take(3).zipWithIndex.map { case (id, i) => (id, axes(i)) } ++
      ranked.drop(3).zipWithIndex.map { case (id, j) =>
        val i = j % 3
        // distinct deltas keep within-cluster cosines ≥ 0.95 while
        // cross-cluster stays ≤ 0.3 — argmax is never cross-cluster
        val v = axes(i).clone(); v((i + 1) % 3) = 0.1f * (j / 3 + 1)
        (id, v)
      }
    val df = rows.toDF("vec_id", "embedding")
    def assignments(r: org.apache.spark.sql.DataFrame) =
      r.select($"id".as[Long], $"cluster".as[Long]).collect().sortBy(_._1).toSeq
    val flat = assignments(SemDedup.assign(df, "vec_id", "embedding", nCenters = 9))
    val two = assignments(SemDedup.assignTwoLevel(df, "vec_id", "embedding", nCenters = 9))
    assert(two == flat, "two-level quantizer must reproduce the flat argmax " +
      "assignment when buckets are unambiguous")
    assert(flat.map(_._1) == (1L to 12L), "every vector assigned exactly once")
  }
}
