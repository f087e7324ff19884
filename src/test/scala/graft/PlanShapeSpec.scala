package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Physical-plan regression tests: the properties that decide whether
  * a query survives a 100 TB / 1000-executor scale-up. Each test pins
  * a plan shape (pushdown, pruning, broadcast, partial aggregation,
  * top-k short-circuit) rather than a result — results are covered by
  * the oracle gate; these fail loudly if a refactor silently
  * de-optimizes the plan.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Exchanges the OPERATOR requires (ENSURE_REQUIREMENTS), excluding
    * the conditional narrow-scan spread (REPARTITION_BY_NUM/_COL — see
    * TextOps.spreadNarrow): the spread fires only on a sub-parallelism
    * scan (these specs' single-split testdata) and is a no-op on a
    * production-scale input, so the zero/one-shuffle scale contracts
    * below are pinned NET of it. */
  private def requiredExchanges(plan: String): Int =
    "Exchange hashpartitioning[^\n]*ENSURE_REQUIREMENTS".r
      .findAllIn(plan).size

  /** True when the plan's only Exchange nodes are the narrow-scan
    * spread — the per-row/zero-shuffle contract, net of the spread. */
  private def shuffleFree(plan: String): Boolean =
    "Exchange [^\n]*".r.findAllIn(plan)
      .forall(l => l.contains("REPARTITION_BY_COL") ||
        l.contains("REPARTITION_BY_NUM"))

  test("filter + projection reach the parquet scan (pushdown, pruning)") {
    val df = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_totalprice")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"),
      s"columns not pruned:\n$scan")
  }

  test("A1 aggregate plans partial+final HashAggregate around one exchange") {
    val plan = executed(Queries.fredMonthlyAgg(spark, sf))
    val hashAggs = "HashAggregate".r.findAllIn(plan).size
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$plan")
    assert(exchanges == 1, s"expected exactly one shuffle:\n$plan")
  }

  test("star join broadcasts the small dimensions") {
    val plan = executed(Queries.joinStarRevenue(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"nation/region must broadcast:\n$plan")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = executed(Queries.topkOrders(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k short-circuit:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), s"global sort crept in:\n$plan")
  }

  test("partitioned-lake scan prunes partitions from a key filter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val df = Seq(
      ("A", 2024, 1, 1.0), ("A", 2024, 2, 2.0), ("B", 2024, 1, 3.0)
    ).toDF("indicator", "observation_year", "observation_month", "value")
    graft.fred.io.LakeIO.writeParquet(df, tmp)
    val pruned = graft.fred.io.LakeIO.readParquet(spark, tmp)
      .where(col("indicator") === "A" && col("observation_month") === 2)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    // partition filters appear as PartitionFilters, and only one
    // directory's file is selected
    assert(scan.contains("PartitionFilters:") && scan.contains("isnotnull(indicator"),
      s"no partition pruning:\n$scan")
    assert(pruned.count() == 1)
  }

  test("winnowing/minhash/simhash expressions run inside WholeStageCodegen") {
    val df = Tables.documents(spark, sf).select(
      graft.functions.Winnowing.winnow(col("text")).as("w"),
      graft.functions.TextHashes.simhash(col("text")).as("s"),
      graft.functions.TextHashes.minhashSig(
        graft.functions.TextHashes.hashedShingles(col("text"), 3), 16).as("m"))
    df.collect() // finalize THIS QueryExecution's adaptive plan
    val plan = executed(df)
    // the project sits under a WholeStageCodegen span, not a standalone
    // interpreted Project (any span index — the narrow-scan spread may
    // put an exchange below it)
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      s"expression fell out of codegen:\n$plan")
  }

  test("bucketed tables join and aggregate with zero Exchange") {
    val ta = s"graft_bkt_a_${System.nanoTime()}"
    val tb = s"graft_bkt_b_${System.nanoTime()}"
    try {
      val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
      graft.fred.io.LakeIO.writeBucketedTable(ev, ta, Seq("user_id"), 4)
      graft.fred.io.LakeIO.writeBucketedTable(
        ev.groupBy("user_id").count(), tb, Seq("user_id"), 4)
      // disable broadcast so the join would otherwise shuffle both sides
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table(ta).join(spark.table(tb), "user_id")
        val planJoin = joined.queryExecution.executedPlan.toString
        assert(!planJoin.contains("Exchange"),
          s"bucketed join must not shuffle:\n$planJoin")
        val agg = spark.table(ta).groupBy("user_id").agg(sum("value"))
        val planAgg = agg.queryExecution.executedPlan.toString
        assert(!planAgg.contains("Exchange"),
          s"bucketed aggregation must not shuffle:\n$planAgg")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ta")
      spark.sql(s"DROP TABLE IF EXISTS $tb")
    }
  }

  test("split/redact/repetition queries are pure per-row pipelines: zero Exchange") {
    for (q <- Seq("split_assign", "text_redact", "text_repetition")) {
      val df = Queries.all(q)(spark, sf)
      df.collect() // finalize THIS QueryExecution's adaptive plan
      val plan = executed(df)
      assert(shuffleFree(plan), s"$q must not shuffle:\n$plan")
      assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
        s"$q fell out of WholeStageCodegen:\n$plan")
    }
  }

  test("pack_budget plans exactly one shuffle (the per-group window)") {
    val plan = executed(Queries.packBudget(spark, sf))
    assert(requiredExchanges(plan) == 1,
      s"packing must cost one group-partitioned shuffle:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"a global sort crept into packing:\n$plan")
  }

  test("curation composite: membership checks are semi/anti joins, no cartesian") {
    val plan = executed(Queries.curateCorpus(spark, sf))
    assert(plan.contains("LeftSemi"), s"dedup keep-set must be a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"decontam must be an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
  }

  test("incremental substring screen: index probe is a semi join, no cartesian") {
    val plan = executed(Queries.all("dedup_substring_incremental")(spark, sf))
    assert(plan.contains("LeftSemi"),
      s"the gram-index probe must be a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair blowup crept into the incremental screen:\n$plan")
  }

  test("incremental screen over the BUCKETED saved index: zero Exchange on the index side of the probe") {
    // r15 VERDICT #4: the saved gram index is the biggest state in the
    // system at 100 TB — the probe must scan it IN PLACE. Build a tiny
    // bucketed index, run the same duplicatedSpansIncremental the
    // catalog query uses, and pin that the semi join's index side has
    // a bucketed FileScan with no shuffle anywhere beneath it.
    // Broadcast is disabled for the pin: at catalog scale the tiny
    // test index would broadcast (also exchange-free), but production
    // indexes can't — the bucketed-SMJ shape is the one that must hold.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-bkt-pin").toString + "/index"
    val tbl = graft.ext.SuffixDedup.gramIndexTableName(root)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpus = Seq((1L, "one two three four five six seven"))
        .toDF("doc_id", "text")
      graft.ext.SuffixDedup.updateSavedGramIndexBucketed(root, corpus,
        "text", 5, batchId = 0L, buckets = 4)
      val batch = Seq((10L, "intro one two three four five six outro"))
        .toDF("doc_id", "text")
      val screen = graft.ext.SuffixDedup.duplicatedSpansIncremental(batch,
        graft.ext.SuffixDedup.savedGramIndexBucketed(spark, root, 4),
        "doc_id", "text", 5, batchId = 1L)
      val all = flatten(screen.queryExecution.executedPlan)
      def isIndexScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table == tbl)
        case _ => false
      }
      val probeSide: Option[SparkPlan] = all.collectFirst {
        case j: SortMergeJoinExec
          if flatten(j.right).exists(isIndexScan) => j.right
        case j: ShuffledHashJoinExec
          if flatten(j.right).exists(isIndexScan) => j.right
      }
      assert(probeSide.isDefined,
        s"no shuffle-family semi join over the index table in:\n$screen")
      val sub = flatten(probeSide.get)
      assert(!sub.exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"the index side of the probe must not shuffle:\n${probeSide.get}")
      val scan = sub.collectFirst { case f: FileSourceScanExec if isIndexScan(f) => f }
      assert(scan.get.toString.contains("Bucketed: true"),
        s"index scan must be bucketed:\n${scan.get}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("curation composite over BUCKETED saved state: zero Exchange on the index side of BOTH probes") {
    // r16 VERDICT #1: curateBatch's fingerprint anti-probe and its
    // gram-index probe must scan the accumulated state IN PLACE. The
    // stages are pinned pre-localCheckpoint (the checkpoint barrier
    // hides the dedup stage's plan from the final frame); broadcast
    // is disabled as in the screen pin above — production indexes
    // can't broadcast, the bucketed-SMJ shape is the one that must
    // hold.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    def pinIndexSide(frame: org.apache.spark.sql.DataFrame,
        tbl: String, what: String): Unit = {
      val all = flatten(frame.queryExecution.executedPlan)
      def isIndexScan(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec =>
          f.tableIdentifier.exists(_.table == tbl)
        case _ => false
      }
      // the probe side is Project/Filter directly over the index scan:
      // demand the INNERMOST such join (no other join beneath its
      // right side), not an outer join transitively containing it
      def isProbe(right: SparkPlan): Boolean = {
        val sub = flatten(right)
        sub.exists(isIndexScan) &&
          !sub.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      }
      val side: Option[SparkPlan] = all.collectFirst {
        case j: SortMergeJoinExec if isProbe(j.right) => j.right
        case j: ShuffledHashJoinExec if isProbe(j.right) => j.right
      }
      assert(side.isDefined,
        s"$what: no shuffle-family join over the index table in:\n$frame")
      val sub = flatten(side.get)
      assert(!sub.exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"$what: the index side of the probe must not shuffle:\n${side.get}")
      val scan = sub.collectFirst {
        case f: FileSourceScanExec if isIndexScan(f) => f }
      assert(scan.get.toString.contains("Bucketed: true"),
        s"$what: index scan must be bucketed:\n${scan.get}")
    }
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-curate-bkt-pin").toString
    val (fpRoot, gramRoot) = (tmp + "/fp", tmp + "/grams")
    val fpTbl = graft.ext.SuffixDedup.gramIndexTableName(fpRoot)
    val gramTbl = graft.ext.SuffixDedup.gramIndexTableName(gramRoot)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val seen = Seq((1L, "the quick brown fox jumps over and lazy dogs sleep here today"))
        .toDF("doc_id", "text")
      graft.ext.SuffixDedup.updateSavedKeyIndexBucketed(fpRoot,
        seen.select(graft.ext.TextOps.fingerprint(col("text")).as("g")),
        batchId = 0L, buckets = 4)
      graft.ext.SuffixDedup.updateSavedGramIndexBucketed(gramRoot, seen,
        "text", 5, batchId = 0L, buckets = 4)
      val batch = Seq(
        (10L, "the quick brown fox jumps over and lazy dogs sleep here today"),
        (11L, "an entirely different body of plain text with its own words inside"))
        .toDF("doc_id", "text")
      val fpIdx = graft.ext.SuffixDedup.savedGramIndexBucketed(spark, fpRoot, 4)
      val deduped = graft.streaming.CorpusStreams.curateDedupStage(
        batch, fpIdx, batchId = 1L, minWords = 10, idCol = "doc_id",
        textCol = "text")
      pinIndexSide(deduped, fpTbl, "fingerprint anti-probe")
      val gramIdx = graft.ext.SuffixDedup.savedGramIndexBucketed(spark, gramRoot, 4)
      val applied = graft.ext.SuffixDedup.duplicatedSpansIncrementalApply(
        deduped.select(col("doc_id"), col("text")), gramIdx,
        "doc_id", "text", minTokens = 5, batchId = 1L)
      pinIndexSide(applied, gramTbl, "gram-index probe")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql(s"DROP TABLE IF EXISTS $fpTbl")
      spark.sql(s"DROP TABLE IF EXISTS $gramTbl")
    }
  }

  test("near-dup screen over SAVED state: zero Exchange on the band-index and shingle-table sides") {
    // r17: the self-accumulating near-dup screen's candidate join and
    // Jaccard-verify join must scan the persisted state IN PLACE —
    // the band table is clustered by band hash (a SUBSET of the
    // (band_idx, band_hash) join keys, which HashPartitioning
    // satisfies), the shingle table by doc. Broadcast disabled as in
    // the other pins: production state can't broadcast.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-near-pin").toString + "/state"
    val bandTbl = graft.ext.Dedup.nearDupBandsTableName(root)
    val shTbl = graft.ext.Dedup.nearDupShTableName(root)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the band table is clustered by band_hash, a SUBSET of the
    // (band_idx, band_hash) join keys: subset co-partitioning is what
    // this standard knob exists for (the hash carries all the
    // entropy, so the skew caveat behind the default does not bite)
    val requireAll = spark.conf
      .get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val kept = Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "an entirely different body of plain text right here"))
        .toDF("doc_id", "text")
      graft.ext.Dedup.updateSavedNearDupState(root, kept, "doc_id",
        "text", batchId = 0L, buckets = 4)
      val batch = Seq(
        (10L, "the quick brown fox jumps over the lazy dog today"))
        .toDF("doc_id", "text")
      val screened = graft.ext.Dedup.newAgainstIndex(batch,
        graft.ext.Dedup.savedNearDupIndex(spark, root, batchId = 1L,
          buckets = 4),
        "doc_id", "text")
      val all = flatten(screened.queryExecution.executedPlan)
      def pinned(tbl: String, what: String): Unit = {
        def isScan(p: SparkPlan): Boolean = p match {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table == tbl)
          case _ => false
        }
        val sides = all.collect {
          case j: BaseJoinExec
            if flatten(j.right).exists(isScan) &&
              !flatten(j.right).exists(p =>
                p.isInstanceOf[BaseJoinExec] && p.ne(j)) => j.right
          case j: BaseJoinExec
            if flatten(j.left).exists(isScan) &&
              !flatten(j.left).exists(p =>
                p.isInstanceOf[BaseJoinExec] && p.ne(j)) => j.left
        }
        assert(sides.nonEmpty, s"$what: no join over the table in:\n$screened")
        sides.foreach { side =>
          val sub = flatten(side)
          assert(!sub.exists(_.isInstanceOf[ShuffleExchangeLike]),
            s"$what: the state side of the join must not shuffle:\n$side")
          val scan = sub.collectFirst { case f: FileSourceScanExec if isScan(f) => f }
          assert(scan.get.toString.contains("Bucketed: true"),
            s"$what: state scan must be bucketed:\n${scan.get}")
        }
      }
      pinned(bandTbl, "band-index candidate join")
      pinned(shTbl, "shingle verify join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        requireAll)
      spark.sql(s"DROP TABLE IF EXISTS $bandTbl")
      spark.sql(s"DROP TABLE IF EXISTS $shTbl")
    }
  }

  test("semantic screen over SAVED state: zero Exchange on the assignment-table side") {
    // r17: the self-accumulating embedding screen's probe broadcasts
    // the (bounded) batch, so the accumulated state streams in place;
    // the fold's (g, doc) membership anti-probe joins on a SUPERSET of
    // the clustering key (g), which HashPartitioning satisfies under
    // the same subset co-partition knob as the band index. Broadcast
    // auto-threshold disabled: the PROBE's broadcast is the explicit
    // hint on the batch side, never a size estimate.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(flatten)
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-sem-pin").toString + "/state"
    val tbl = graft.ext.SemDedup.semanticAssignedTableName(root)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val requireAll = spark.conf
      .get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val kept = Seq(
        (1L, Array(1.0f, 0.0f, 0.0f)),
        (2L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
      graft.ext.SemDedup.updateSavedSemanticState(root, kept,
        "vec_id", "embedding", nCenters = 2, batchId = 0L, buckets = 4)
      val batch = Seq((10L, Array(0.99f, 0.05f, 0.0f)))
        .toDF("vec_id", "embedding")
      def pinned(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
        import org.apache.spark.sql.execution.joins.BaseJoinExec
        val all = flatten(df.queryExecution.executedPlan)
        def isStateScan(p: SparkPlan): Boolean = p match {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table == tbl)
          case _ => false
        }
        // the JOIN INPUT feeding from the state table must carry no
        // Exchange (the dup-id distinct ABOVE the join may shuffle —
        // it is bounded by the batch side, never by the state)
        val sides = all.collect {
          case j: BaseJoinExec
            if flatten(j.right).exists(isStateScan) &&
              !flatten(j.right).exists(p =>
                p.isInstanceOf[BaseJoinExec] && p.ne(j)) => j.right
          case j: BaseJoinExec
            if flatten(j.left).exists(isStateScan) &&
              !flatten(j.left).exists(p =>
                p.isInstanceOf[BaseJoinExec] && p.ne(j)) => j.left
        }
        assert(sides.nonEmpty, s"$what: no join over the state table in:\n$df")
        sides.foreach { side =>
          assert(!flatten(side).exists(_.isInstanceOf[ShuffleExchangeLike]),
            s"$what: the state side of the join must not shuffle:\n$side")
        }
      }
      pinned(graft.ext.SemDedup.newAgainstSavedSemantic(batch, root,
        "vec_id", "embedding", floor = 0.9, batchId = 1L, buckets = 4),
        "saved-state probe")
      // the fold's membership anti-probe, as foldAssignedIntoSemanticState
      // builds it before the insertInto
      val centers = graft.ext.SemDedup.readSemanticCenters(spark, root)
      val assigned = graft.ext.SemDedup
        .assignToCenters(batch, "vec_id", "embedding", centers)
        .select(col("cluster").as("g"), col("id").as("doc"), col("v"),
          lit(1L).as("first_batch_id"))
      val fresh = assigned.join(spark.table(tbl).select("g", "doc"),
        Seq("g", "doc"), "left_anti")
      pinned(fresh, "fold membership anti-probe")
      val scan = flatten(fresh.queryExecution.executedPlan).collectFirst {
        case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table == tbl) => f
      }
      assert(scan.get.toString.contains("Bucketed: true"),
        s"fold anti-probe state scan must be bucketed:\n${scan.get}")
      // the occupancy report's count groups on the clustering key —
      // the whole aggregate runs in place, zero Exchange
      val counts = spark.table(tbl).groupBy(col("g"))
        .agg(count(lit(1)).as("n"))
      assert(!flatten(counts.queryExecution.executedPlan)
        .exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"occupancy count over the bucketed state must not shuffle:\n$counts")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        requireAll)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("curate_corpus_ingest: keep-set and index probe are semi joins, no cartesian") {
    val plan = executed(Queries.all("curate_corpus_ingest")(spark, sf))
    assert("LeftSemi".r.findAllIn(plan).size >= 2,
      s"keep-set and frozen-index probe must both be semi joins:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair blowup crept into the ingest funnel:\n$plan")
  }

  test("bench-side exact decontam: no cartesian, no nested-loop join anywhere") {
    // the cross screen ranks train∪bench ONCE and pairs by a
    // per-partition scan — any cartesian/NLJ means the nearest-bench
    // pairing regressed to a pair join
    for (q <- Seq("decontam_substring_exact", "decontam_longest_bench")) {
      val plan = executed(Queries.all(q)(spark, sf))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q grew a pair join:\n$plan")
    }
  }

  test("curate_corpus_audit: membership flags are LEFT joins over one scored frame") {
    val plan = executed(Queries.all("curate_corpus_audit")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
    // the keep/contaminated memberships come back as outer joins (the
    // when-chain needs the null), never inner — an inner join would
    // silently drop the docs the audit exists to explain
    assert(plan.contains("LeftOuter"), s"membership joins must be outer:\n$plan")
  }

  test("text_chunk is a pure per-row pipeline: zero Exchange") {
    val plan = executed(Queries.all("text_chunk")(spark, sf))
    assert(shuffleFree(plan), s"chunking must not shuffle:\n$plan")
  }

  test("text_normalize runs inside WholeStageCodegen with zero Exchange") {
    val dfN = Queries.all("text_normalize")(spark, sf)
    dfN.collect() // finalize THIS QueryExecution's adaptive plan
    val plan = executed(dfN)
    assert(shuffleFree(plan), s"normalization must not shuffle:\n$plan")
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
      s"unicode-normalize expressions fell out of WholeStageCodegen:\n$plan")
  }

  test("drift_chisq scans the raw data exactly once") {
    // every marginal (per-bucket, per-group, total) must derive from
    // the counts frame, never a second pass over events
    val plan = executed(Queries.all("drift_chisq")(spark, sf))
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"drift marginals must reuse the one counts shuffle, not rescan:\n$plan")
  }

  test("minmax scale join: no static hint, AQE broadcasts at catalog scale") {
    val df = Queries.all("scalar_minmax")(spark, sf)
    df.count() // materialize so AQE finalizes the join strategy
    val plan = executed(df)
    assert(!df.queryExecution.logical.toString.contains("ResolvedHint"),
      s"minmax must not carry a data-dependent broadcast hint:\n${df.queryExecution.logical}")
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE should broadcast the tiny min/max frame at catalog scale:\n$plan")
  }

  test("winsorize clamp join: no static hint, AQE broadcasts at catalog scale") {
    val df = Queries.all("scalar_winsorize")(spark, sf)
    df.count() // materialize so AQE finalizes the join strategy
    val plan = executed(df)
    assert(!df.queryExecution.logical.toString.contains("ResolvedHint"),
      s"winsorize must not carry a data-dependent broadcast hint:\n${df.queryExecution.logical}")
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE should broadcast the tiny bounds frame at catalog scale:\n$plan")
  }

  test("scd2 history plans one shuffle: lead and row_number share the window sort") {
    val plan = executed(Queries.all("merge_scd2")(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"scd2 must cost one key-partitioned shuffle:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 1 && !plan.contains("Exchange rangepartitioning"),
      s"no global sort in scd2:\n$plan")
  }

  test("moments/corr/linfit plan partial+final aggregation around one exchange") {
    for (q <- Seq("agg_stats_moments", "agg_corr", "agg_linfit")) {
      val plan = executed(Queries.all(q)(spark, sf))
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"$q must partial-aggregate map-side:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"$q must cost exactly one shuffle:\n$plan")
    }
  }

  test("pivot → unpivot round-trips to the direct long-form aggregate") {
    import org.apache.spark.sql.functions.{col => c}
    val direct = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.dayofmonth(c("ts")).as("observation_day"),
        c("event_type"))
      .agg((org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions.round(c("value") * 1e6).cast("long"))
        .cast("double") / 1e6).as("value_sum"))
      .collect().toSet
    val roundTrip = Queries.all("unpivot_daily")(spark, sf).collect().toSet
    assert(roundTrip == direct)
  }

  test("LSH maxBucket guard plans a broadcast anti-join on the band keys") {
    val plan = executed(Queries.dedupMinhashLsh(spark, sf))
    // the giant-bucket exclusion must be a BROADCAST anti-join (the
    // hot list is tiny); a shuffled anti-join would re-shuffle the
    // bands×-exploded frame. The ANTI join itself must be broadcast —
    // the plan contains other BroadcastHashJoins (shingle verify), so
    // the two substrings must co-occur on one operator line
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).isDefined,
      s"giant-bucket guard not a broadcast anti-join:\n$plan")
  }

  test("IVF probe plan size stays bounded at production centroid counts") {
    // 4096 synthetic centroids (dim 8): the literal-array plan would
    // embed ~33k float literals; the broadcast-frame path must keep the
    // plan independent of k (r8 VERDICT "What's wrong" #1)
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(4096)(Array.fill(8)(rnd.nextFloat()))
    val assigned = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        (col("vec_id") % 4096).cast("int").as("cluster"))
    val index = graft.ext.Ivf.Index(assigned, centroids)
    val df = graft.ext.Ivf.searchTopK(index,
      Tables.embeddings(spark, sf).filter(col("vec_id") < 2),
      "vec_id", "embedding", k = 5, nprobe = 2)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.length < 100 * 1000,
      s"plan grew with centroid count: ${plan.length} chars")
    // the centroid relation enters as a broadcast of a local relation,
    // not as array literals
    assert(!plan.contains("[[["), s"literal centroid matrix in plan:\n${plan.take(2000)}")
  }

  test("semantic-dedup two-level assignment: only the √k super frame is nested-loop-broadcast") {
    // r9 VERDICT #1: the flat quantizer cross-joined the corpus with
    // ALL k centers (one BNLJ whose broadcast grows O(k·d) — ~3 GB at
    // SemDeDup's mandated k ∝ N). The two-level plan must show exactly
    // two nested-loop joins, both against the ⌈√k⌉-row super frame,
    // and move the k-row center frame through a super_id EQUALITY
    // join that Spark is free to shuffle at production k·d.
    val df = graft.ext.SemDedup.assignTwoLevel(
      Tables.embeddings(spark, sf), "vec_id", "embedding", nCenters = 1024)
    val plan = executed(df)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size == 2,
      s"expected exactly the two ×√k-supers nested-loop joins:\n$plan")
    // both nested-loop broadcasts are bounded by the nSuper = √1024 =
    // 32-row TakeOrdered prefix, never the k-row center frame
    assert("TakeOrderedAndProject\\(limit=32[,\\s]".r.findFirstIn(plan).isDefined,
      s"super frame not bounded at 32 rows:\n$plan")
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[super_id".r
      .findFirstIn(plan).isDefined,
      s"center bucket walk is not a super_id equality join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("catalog-wide invariant: no query plans a CartesianProduct") {
    // every membership/candidate step must be an equality/semi/anti
    // join — a cartesian anywhere is the one plan shape that cannot
    // survive 100 TB. (Tiny literal fixtures and 1-row scalar frames
    // broadcast as BroadcastNestedLoopJoin, which is fine and distinct.)
    for ((name, q) <- Queries.all) {
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("span dedup first-occurrence aggregate is partial+final (skew-safe)") {
    // the skew claim: a boilerplate span occurring in millions of docs
    // must combine map-side before the span exchange — a row_number
    // window formulation would funnel every occurrence through one
    // task. min(struct(doc, pos)) must therefore plan partial+final
    // aggregation, not a windowed sort.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val ex = graft.ext.Chunking.chunkByTokens(docs, "doc_id", "text", 5, 0)
      .select(col("doc_id").as("doc"), col("chunk_idx").as("pos"),
        col("chunk_text").as("span"))
    val plan = executed(ex.groupBy("span")
      .agg(min(struct(col("doc"), col("pos"))).as("__first")))
    val partials = "partial_min".r.findAllIn(plan).size
    assert(partials >= 1, s"no map-side partial min:\n$plan")
    assert(!plan.contains("Window"), s"window crept into first-occurrence:\n$plan")
  }

  test("dedup_substring: map-side first-occurrence, equality mark join, per-doc windows only") {
    // ExactSubstr's scale contract: the duplicated-gram gate is ONE
    // partial+final aggregate (a boilerplate gram occurring millions of
    // times collapses map-side), the mark join is an equality hash join
    // against the vocab-bounded dup-gram table, and the only Window
    // nodes are the per-doc interval union (running max-end + island
    // sum — two chained nodes over one doc-keyed sort, each bounded by
    // a doc's own marked-window count). No Expand, no corpus-wide sort.
    val plan = executed(Queries.all("dedup_substring")(spark, sf))
    assert("partial_min".r.findAllIn(plan).size >= 1,
      s"first-occurrence must combine map-side:\n$plan")
    assert(!plan.contains("Expand"), s"Expand crept in:\n$plan")
    assert("(?m)^[^\\n]*Window".r.findAllIn(plan).size <= 2,
      s"more Window nodes than the island merge needs:\n$plan")
  }

  test("quality_lm_indexed: LM side broadcast, corpus never shuffled for membership") {
    val plan = executed(Queries.all("quality_lm_indexed")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"frozen-LM membership must broadcast the LM side:\n$plan")
    assert("partial_count|partial_sum".r.findAllIn(plan).nonEmpty,
      s"per-doc re-agg must combine map-side:\n$plan")
  }

  test("agg_heavy_hitters: candidates broadcast back, exact pass never " +
      "sort-merges the corpus") {
    val plan = executed(Queries.all("agg_heavy_hitters")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"candidate membership must be a broadcast semi join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must never shuffle for candidate membership:\n$plan")
    assert("partial_count".r.findAllIn(plan).nonEmpty,
      s"the exact count must combine map-side:\n$plan")
  }

  test("window_interpolate: both anchor frames share one window, shuffle and sort") {
    val plan = executed(Queries.all("window_interpolate")(spark, sf))
    // exactly two exchanges: the upstream daily aggregation + the one
    // series partition both frames share
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"prev/next frames must share the series partition:\n$plan")
    assert("Window \\[".r.findAllIn(plan).size == 1,
      s"all four anchors must plan into ONE Window operator:\n$plan")
    assert("\\+\\- Sort \\[".r.findAllIn(plan).size == 1,
      s"prev/next frames must reuse one sort:\n$plan")
  }

  test("report_corpus: distinct-reduction pre-aggs, no countDistinct Expand") {
    val plan = executed(Queries.all("report_corpus")(spark, sf))
    assert(!plan.contains("Expand"),
      s"datacard must pre-aggregate distincts, not Expand:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
  }

  test("similarity_knn_graph: block-equality candidates; ranking window carries no vectors") {
    val plan = executed(Queries.all("similarity_knn_graph")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"knn graph must join on the block key:\n$plan")
    // the Exchange feeding the rank window must not carry the vector
    // columns — only (vec_id, neighbor_id, cosine) ride the shuffle
    val winExchange = "(?s)Exchange hashpartitioning\\(vec_id[^\\n]*".r
      .findFirstIn(plan)
    assert(winExchange.isDefined, s"no per-vector ranking exchange:\n$plan")
  }

  test("dedup-sync anti join broadcasts the sink side") {
    val incoming = Tables.events(spark, sf).select("user_id", "event_type").distinct()
    val existing = Tables.events(spark, sf).select("user_id", "event_type").limit(10)
    val plan = executed(graft.fred.ops.DedupSync.newRows(
      incoming, existing, Seq("user_id", "event_type")))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"anti join must broadcast existing keys:\n$plan")
  }

  test("bigram LM joins are equality joins with partial aggregation, no cartesian") {
    // the LM-side frames are vocab-bounded: the occurrence→LM joins
    // must stay equality hash joins (AQE broadcasts real LM tables) and
    // both the LM training aggs and the per-doc re-agg must combine
    // map-side — an occurrence-scale sort or cartesian would be the
    // 100 TB killer here
    for (q <- Seq("quality_lm_surprisal", "quality_dsir")) {
      val plan = executed(Queries.all(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$q cartesian:\n$plan")
      assert(!plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
        s"$q lost its hash joins:\n$plan")
      val partials = "partial_count|partial_sum".r.findAllIn(plan).size
      assert(partials >= 1, s"$q: no map-side partial aggregation:\n$plan")
    }
  }

  test("text_topgram: no Window sort anywhere — min-struct aggregate only") {
    // the 7.3 s → 1.2 s r10 lesson, pinned: the top pick must stay a
    // hash aggregate (map-side partials collapse each side to one
    // candidate per doc); a row_number window reintroduces a per-doc
    // sort the operator exists to avoid
    val plan = executed(Queries.all("text_topgram")(spark, sf))
    assert(!plan.contains("Window"), s"topgram regressed to a window:\n$plan")
    assert("partial_min|partial_sum".r.findAllIn(plan).nonEmpty,
      s"topgram lost its map-side partials:\n$plan")
  }

  test("text_boilerplate: gram-df equality join, partial aggregation, no countDistinct Expand") {
    val plan = executed(Queries.all("text_boilerplate")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    // per-doc-distinct explode makes count(*) the document frequency;
    // an Expand node would mean someone reintroduced countDistinct
    assert(!plan.contains("Expand"), s"countDistinct Expand crept in:\n$plan")
    assert("partial_count|partial_sum".r.findAllIn(plan).nonEmpty,
      s"no map-side partials:\n$plan")
  }

  test("sample_token_budget: exactly one shuffle (the per-source window), no join") {
    val plan = executed(Queries.all("sample_token_budget")(spark, sf))
    assert(requiredExchanges(plan) == 1,
      s"token budget must cost one source-partitioned shuffle:\n$plan")
    assert(!plan.contains("Join"), s"budget lookup must be a CASE, not a join:\n$plan")
  }

  test("text_bm25: broadcast df/totals, top-k short-circuit, no window") {
    val plan = executed(Queries.all("text_bm25")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"bm25 top-k must short-circuit, not globally sort:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort crept into bm25:\n$plan")
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).size >= 2,
      s"term-df and corpus totals must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"bm25 must not rank via a window:\n$plan")
  }

  test("text_boilerplate_indexed: the index side broadcasts; the corpus is never shuffled for membership") {
    val plan = executed(Queries.all("text_boilerplate_indexed")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate index must broadcast:\n$plan")
    // the MEMBERSHIP join (gram key) must never sort-merge; the final
    // per-doc stats join is doc-keyed corpus-to-corpus and may
    // legitimately shuffle (the r12 index localCheckpoint erases the
    // tiny-size estimate that used to broadcast it at spec SF)
    val smjKeys = "SortMergeJoin \\[(\\w+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(smjKeys.forall(_.startsWith("doc")),
      s"corpus shuffled against the index on a gram key ($smjKeys):\n$plan")
  }

  test("quality_classifier: weight table broadcasts; membership join never sort-merges") {
    val plan = executed(Queries.all("quality_classifier")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"classifier weights must broadcast:\n$plan")
    // the r12 boilerplate-index rule: doc-keyed stats joins may
    // shuffle, the feature-bucket membership join must not
    val smjKeys = "SortMergeJoin \\[(\\w+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(smjKeys.forall(_.startsWith("doc")),
      s"corpus shuffled against the weights on a bucket key ($smjKeys):\n$plan")
  }

  test("crawl_canonicalize is a pure projection: zero exchanges") {
    val dfC = Queries.all("crawl_canonicalize")(spark, sf)
    dfC.collect() // finalize THIS QueryExecution's adaptive plan
    val plan = executed(dfC)
    assert(shuffleFree(plan),
      s"canonicalization must be per-row string algebra:\n$plan")
    // '*' prefixes mark whole-stage-codegen'd nodes in the executed
    // plan string — the projection (the canonicalization itself) must
    // carry one (the r12 regex-chain rewrite: a filter() lambda here
    // evaluated interpreted and unstarred); with the narrow-scan
    // spread an AQE wrapper may sit above it, so the pin is on the
    // Project node, not the plan root
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined,
      s"canonicalization fell out of codegen:\n$plan")
  }

  test("crawl_domain_cap: one hash shuffle on the domain key, no join") {
    val plan = executed(Queries.all("crawl_domain_cap")(spark, sf))
    val exchanges = requiredExchanges(plan)
    assert(exchanges == 1, s"expected exactly the window shuffle:\n$plan")
    assert(!plan.contains("Join"), s"cap must not join:\n$plan")
  }

  test("text_strip_lines: line-df side is AQE-decided, reassembly partial-aggs") {
    val plan = executed(Queries.all("text_strip_lines")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"line strike must be an equality join:\n$plan")
    assert("partial_count|partial_sum".r.findAllIn(plan).nonEmpty,
      s"line df lost map-side partials:\n$plan")
  }

  test("dedup_image_phash / dedup_audio_fp: banded equality join resp. single-agg group, no cartesian") {
    val phash = executed(Queries.all("dedup_image_phash")(spark, sf))
    assert(!phash.contains("CartesianProduct") &&
      !phash.contains("BroadcastNestedLoopJoin"),
      s"phash pairs must come from the banded equality join:\n$phash")
    val afp = executed(Queries.all("dedup_audio_fp")(spark, sf))
    assert(!afp.contains("CartesianProduct"), s"cartesian:\n$afp")
    assert("partial_min|partial_count".r.findAllIn(afp).nonEmpty,
      s"exact-dup groups lost map-side partials:\n$afp")
  }

  test("vocab_bpe_shared: the segment frame is reused, not recomputed per consumer") {
    // the materialize-once boundary shows up as a scan of an existing
    // RDD (the localCheckpoint) rather than two full word-table plans
    val plan = executed(Queries.all("vocab_bpe_shared")(spark, sf))
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LocalTableScan"),
      s"shared segment frame must be materialized once:\n$plan")
  }

  test("sample_temperature: quotas broadcast back, no cartesian, one rank window") {
    val plan = executed(Queries.all("sample_temperature")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the driver-computed quota frame must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"cartesian:\n$plan")
    assert("Window".r.findAllIn(plan).length == 1,
      s"exactly one per-stratum rank window:\n$plan")
  }

  test("mine_triplets: knn frame materialized once; pair work stays equality-joined") {
    val plan = executed(Queries.all("mine_triplets")(spark, sf))
    assert(plan.contains("Scan ExistingRDD"),
      s"the knn graph must be materialized once for both consumers:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the block-equality join:\n$plan")
  }

  test("dedup_cdc: occurrence-linear — no pair join, map-side partial census") {
    val plan = executed(Queries.all("dedup_cdc")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"cartesian:\n$plan")
    assert(!plan.contains("Expand"),
      s"the distinct-doc census must not Expand:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"the chunk occurrence frame must be materialized once:\n$plan")
  }

  test("graph_pagerank: every iteration joins on equality, never nested-loop") {
    val plan = executed(Queries.all("graph_pagerank")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"cartesian:\n$plan")
  }

  test("curate_corpus_communities: fixed-round LPA + agg canonical-select, no windows") {
    val plan = executed(Queries.all("curate_corpus_communities")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"cartesian:\n$plan")
    // the canonical-select and every LPA winner step are (min ‖ count)
    // hash aggregates — a row_number window would shuffle-SORT every
    // (community, member) row where the agg combines map-side
    assert(!plan.contains("Window"),
      s"canonical-select must be an aggregate, not a window:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"the gated corpus and LPA adjacency must be materialized once:\n$plan")
  }

  test("similarity_rrf: query side broadcasts on both legs; fusion is one hash agg") {
    val plan = executed(Queries.all("similarity_rrf")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    // lexical leg: the query shingles and sizes BROADCAST onto the
    // corpus explode — the corpus is scanned, never shuffled for the
    // intersect counts' build side
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).size >= 3,
      s"query-side frames must broadcast:\n$plan")
    // rank windows partition by query over top-k-bounded frames; the
    // fused score is a (query, doc) hash aggregate with partials
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"RRF sum must be a hash aggregate:\n$plan")
  }

  test("graph_kcore: equality joins only; h-index windows partition per node") {
    val plan = executed(Queries.all("graph_kcore")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"cartesian:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"the iterated rounds must be materialized:\n$plan")
    // the final frame is a checkpointed scan, so the window shape is
    // pinned on the ROUND plan: every window is PARTITION BY node
    // (single-neighbor-list sorts, bounded by max degree) — an
    // unpartitioned window would move the whole edge list to one task
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L),
      (1L, 3L)).toDF("a", "b")
    val scores = Seq((1L, 2L), (2L, 2L), (3L, 2L)).toDF("node", "c")
    val round = executed(graft.operators.KCore.hRound(und, scores))
    assert(!round.contains("CartesianProduct") &&
      !round.contains("BroadcastNestedLoopJoin"), s"cartesian:\n$round")
    assert("windowspecdefinition\\(a#".r.findFirstIn(round).isDefined,
      s"h-index window must partition by the node column:\n$round")
    assert("HashAggregate".r.findAllIn(round).size >= 2,
      s"the per-node H reduce must combine map-side:\n$round")
  }

  test("sketch relations (bloom words, CMS join-card) are partial+final hash aggs") {
    val bloom = executed(Queries.all("agg_bloom_portable")(spark, sf))
    assert(!bloom.contains("Window") && !bloom.contains("CartesianProduct"),
      s"bloom words must be one agg chain:\n$bloom")
    assert("HashAggregate".r.findAllIn(bloom).size >= 2,
      s"bit_or must combine map-side:\n$bloom")
    val jc = executed(Queries.all("agg_cms_join_card")(spark, sf))
    assert(!jc.contains("CartesianProduct"),
      s"unbounded cartesian in join-card (the 1-row est crossJoin is " +
        s"broadcast):\n$jc")
    assert("HashAggregate".r.findAllIn(jc).size >= 2,
      s"inner products must aggregate with partials:\n$jc")
  }

  test("series_changepoint: one window pass per series, no self-join") {
    val plan = executed(Queries.all("series_changepoint")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("SortMergeJoin"),
      s"split scan must not join the series to itself:\n$plan")
  }

  test("quality_entropy: linear agg chain — no window, no join") {
    val plan = executed(Queries.all("quality_entropy")(spark, sf))
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"entropy must be a pure aggregate chain:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"term counts must combine map-side:\n$plan")
  }
}
