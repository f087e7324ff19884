package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fred.ops.{Clean, DedupSync, Merge, MonthlyAgg, YearlyGold}
import graft.ext.{Decontam, Dedup, Ivf, MultiModal, Packing, Profile, Sampling, SemDedup, SeriesOps, Similarity, Splits, TextOps, VectorLsh, VectorQuant, VectorStats}

/** Set operations, skew-salted joins/aggs, statistical aggregates, pivot. */
trait AggQueries extends QueriesBase {

  // ==================================================== [EXT] set ops

  val setExcept: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    ev.filter(dayofmonth(col("ts")) <= 15).select("user_id").distinct()
      .except(ev.filter(dayofmonth(col("ts")) > 15).select("user_id").distinct())
  }

  val setIntersect: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    // deterministic pick = min(event_type), kept INSIDE the plan as a
    // broadcast 1-row aggregate (scalar-subquery shape) — no driver
    // action at plan-build time
    val minType = broadcast(ev.agg(min("event_type").as("__min_et")))
    ev.join(minType).filter(col("event_type") === col("__min_et"))
      .select("user_id").distinct()
      .intersect(
        ev.join(minType).filter(col("event_type") =!= col("__min_et"))
          .select("user_id").distinct())
  }

  /** Salted fact-to-dim join: lineitem joined to orders through
    * [[graft.operators.Skew.saltedJoin]] (8 salts on the order key) —
    * the skew-join form for when a hot key's partition exceeds one
    * task and the dim side is too big to broadcast. The spread column
    * must vary WITHIN a key (here `l_linenumber` — a per-row value),
    * never the key itself, or every row of a hot key gets the same
    * salt and nothing spreads. Salting is plan-internal (left salt +
    * right replicate), so the output ≡ the plain join — exactly what
    * the oracle checks. */
  val joinSalted: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.Skew.saltedJoin(li, o, Seq("l_orderkey"),
        spread = col("l_linenumber"), salts = 8)
      .groupBy("o_orderpriority")
      // cents-scaled exact sum — see joinStarRevenue
      .agg(count(lit(1)).as("n_items"),
        (sum(round(col("l_extendedprice") * 100).cast("long"))
          .cast("double") / 100).as("total_price"))
  }

  /** Salted two-stage aggregate (hot-key mitigation) — result-identical
    * to the direct group-by: exact integer partial sums merge to the
    * same mean regardless of the salt split. */
  val aggSalted: Q = (s, dir) =>
    graft.operators.Skew.saltedAgg(
      Tables.events(s, dir).select("event_type", "event_id", "value"),
      keys = Seq("event_type"), spread = col("event_id"), salts = 8,
      partial = Seq(
        sum(round(col("value") * 1e6).cast("long")).as("__sum"),
        count(col("value")).as("__cnt")),
      merge = Seq(
        (sum("__sum").cast("double") / sum("__cnt") / 1e6).as("value"),
        sum("__cnt").as("observation_count")))

  /** Exact quartiles per group — the profiling aggregate. Micro-scaled
    * BIGINT inputs make the (n−1)·q linear interpolation bit-identical
    * across engines (fractions are .0/.25/.5/.75 — binary-exact).
    * Output is one SCALAR row per (group, quartile) — no catalog query
    * may emit an array column (the driver's pandas-based checker can't
    * sort numpy arrays; SURVEY §5). */
  val aggQuantiles: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(percentile(round(col("value") * 1e6).cast("long"),
        array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
      .select(col("event_type"), posexplode(col("qs")))
      .select(col("event_type"),
        ((col("pos") + 1) * 25).as("q_pct"),
        (col("col") / 1e6).as("value"))

  /** Approximate quartiles per group — the scale form of
    * [[aggQuantiles]]. `approx_percentile` (Greenwald-Khanna sketch) is
    * a partial aggregate: each task summarizes its partition into a
    * bounded sketch and only sketches shuffle, so a 100 TB profiling
    * pass never sorts the column (`percentile` is holistic — exact but
    * full-sort).
    *
    * The estimate itself is engine-specific, so the gate checks the
    * sketch's PUBLISHED CONTRACT instead of the value: the returned
    * element occupies the rank interval [count(v < est)+1,
    * count(v ≤ est)] (an interval because of TIES — duplicated values
    * make the naive |count(v≤est) − q·n| check overshoot), and the GK
    * guarantee is that this interval touches q·n ± n/accuracy (+1 for
    * the discrete rank step). Both interval ends are computed by
    * ranking the estimate against the group in the same plan; the
    * verdict is emitted as `rank_ok` and the oracle asserts TRUE, so a
    * contract violation hash-fails the gate (r8 "What's missing" #2:
    * the bound AggSketchSpec pins, replayed at the oracle layer). */
  val aggApproxPercentile: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select("event_type", "value")
    val acc = 10000
    val est = ev
      .groupBy("event_type")
      .agg(approx_percentile(col("value"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(acc)).as("qs"))
      .select(col("event_type"), posexplode(col("qs")))
      .select(col("event_type"),
        ((col("pos") + 1) * 25).as("q_pct"),
        col("col").as("__est"))
    // |groups|·3 rows join back to the data (AQE broadcasts); the rank
    // of each estimate is one map-side-combined aggregation
    ev.join(est, "event_type")
      .groupBy("event_type", "q_pct")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("__est"), 1L).otherwise(0L)).as("__lo"),
        sum(when(col("value") <= col("__est"), 1L).otherwise(0L)).as("__hi"))
      .select(col("event_type"), col("q_pct"), col("n"),
        (col("__lo") <= col("q_pct") * col("n") / 100
            + col("n") / lit(acc.toDouble) + 1.0
          && col("__hi") >= col("q_pct") * col("n") / 100
            - col("n") / lit(acc.toDouble) - 1.0).as("rank_ok"))
  }

  /** ROLLUP grouping sets with decimal-exact sums. */
  val aggRollup: Q = (s, dir) =>
    Tables.events(s, dir)
      .rollup(col("event_type"), dayofmonth(col("ts")).as("observation_day"))
      .agg(count(lit(1)).as("n"),
        (sumE6(col("value")).cast("double") / 1e6).as("value_sum"))

  /** CUBE grouping sets — all four (type × day) marginal combinations
    * in one pass (Spark expands grouping sets in a single shuffle). */
  val aggCube: Q = (s, dir) =>
    Tables.events(s, dir)
      .cube(col("event_type"), dayofmonth(col("ts")).as("observation_day"))
      .agg(count(lit(1)).as("n"),
        (sumE6(col("value")).cast("double") / 1e6).as("value_sum"))

  /** Per-group mode with deterministic tiebreak: the most frequent
    * user per event type (count desc, id asc). Two map-side-combined
    * shuffles — never a driver-side value scan. */
  val aggMode: Q = (s, dir) => {
    val counts = Tables.events(s, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("user_id").asc)
    counts.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select("event_type", "user_id", "n")
  }

  /** Pivot: one column per event type (explicit value list — no
    * schema-inference job, plan stable at any scale), decimal-exact
    * daily sums. */
  val pivotDaily: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(dayofmonth(col("ts")).as("observation_day"),
        col("event_type"), col("value"))
      .groupBy("observation_day")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg((sumE6(col("value")).cast("double") / 1e6).as("value_sum"))

  /** Unpivot (melt): the wide pivot back to long — the reshape pair
    * proving both directions round-trip. Nulls dropped on both sides
    * (engines differ on default null retention). */
  val unpivotDaily: Q = (s, dir) =>
    pivotDaily(s, dir)
      .unpivot(Array(col("observation_day")),
        Array(col("click"), col("error"), col("purchase"),
          col("signup"), col("view")),
        "event_type", "value_sum")
      .filter(col("value_sum").isNotNull)

  /** Edit-distance near-dups over canonical text: 16-byte prefix
    * blocking + length band, threshold-bounded Levenshtein verify. */
  val dedupEditdist: Q = (s, dir) =>
    Dedup.editDistancePairs(Tables.documents(s, dir), "doc_id", "text",
      maxDist = 8)


  /** This family's slice of [[Queries.all]]. */
  /** Portable HLL register table over the event user ids (p=12, 4096
    * registers): the MERGEABLE saved-state primitive behind
    * [[graft.ext.SketchState.updateSavedHll]] — registers merge by
    * elementwise max, so state after any micro-batching ≡ this
    * one-shot sketch. Unlike the opaque HLL++ buffer this register
    * table is fully HASH-CHECKED: index and rank derive from the
    * md5-top-15-hex posture the splits family already replays, and
    * the rank's leading-zero count rides the binary-string length —
    * exact integers end to end. */
  val aggHllPortable: Q = (s, dir) =>
    graft.ext.SketchState.hllRegisters(Tables.events(s, dir), "user_id")

  /** Count-Min cell table over the event user ids (4×512): the
    * frequency-sketch sibling of [[aggHllPortable]] — cells merge by
    * addition ([[graft.ext.SketchState.updateSavedCms]]), every cell
    * an exact integer from independent md5 lane draws, so the whole
    * sketch state is hash-checked in DuckDB. */
  val aggCountmin: Q = (s, dir) =>
    graft.ext.SketchState.cmsCells(Tables.events(s, dir), "user_id")

  /** Bloom word table over the event user ids (2^15 bits × 4 lanes,
    * packed 32/word): the membership-sketch sibling of
    * [[aggHllPortable]] — words merge by idempotent bitwise OR
    * ([[graft.ext.SketchState.updateSavedBloom]]), every word an
    * exact integer from independent md5 lane draws, so the whole
    * filter state is hash-checked in DuckDB. */
  val aggBloomPortable: Q = (s, dir) =>
    graft.ext.SketchState.bloomWords(Tables.events(s, dir), "user_id")

  /** Two-corpus overlap from HLL register states alone — no join ever
    * touches the corpora: per-side and max-merged-union register
    * summaries ([[graft.ext.SketchState.hllStats]] /
    * [[graft.ext.SketchState.hllUnion]]) as EXACT BIGINTs; the
    * inclusion-exclusion intersection estimate
    * est(A) + est(B) − est(A∪B) is the spec-bounded double half
    * (SketchStateSpec), kept out of the hashed relation because its
    * linear-counting branch calls libm log. */
  val aggHllOverlap: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val st = graft.ext.SketchState
    val a = st.hllRegisters(ev.filter(col("event_type") === "view"), "user_id")
    val b = st.hllRegisters(ev.filter(col("event_type") === "purchase"), "user_id")
    val sa = st.hllStats(a).select(col("n_empty").as("n_empty_a"),
      col("sum_scaled").as("sum_scaled_a"))
    val sb = st.hllStats(b).select(col("n_empty").as("n_empty_b"),
      col("sum_scaled").as("sum_scaled_b"))
    val su = st.hllStats(st.hllUnion(a, b)).select(
      col("n_empty").as("n_empty_union"),
      col("sum_scaled").as("sum_scaled_union"))
    // broadcast hints: 1-row frames, and the catalog-wide invariant
    // bans CartesianProduct plans
    sa.crossJoin(broadcast(sb)).crossJoin(broadcast(su))
  }

  /** Join-size estimate from sketch state alone: CMS cells of the
    * first- and second-half-of-month event user ids, per-lane
    * inner products + the min-lane upper bound on the self-join
    * cardinality ([[graft.ext.SketchState.cmsJoinCardinality]]) —
    * the pre-join planning read a 100 TB pipeline does against
    * SAVED sketches instead of scanning either side. */
  val aggCmsJoinCard: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val st = graft.ext.SketchState
    st.cmsJoinCardinality(
      st.cmsCells(ev.filter(dayofmonth(col("ts")) <= 15), "user_id"),
      st.cmsCells(ev.filter(dayofmonth(col("ts")) > 15), "user_id"))
  }

  /** Sketch-accuracy observability: CMS point estimates vs exact
    * counts for the 10 hottest users — overcount = estimate − exact
    * is ≥ 0 by the sketch guarantee and every column is an exact
    * BIGINT (the min-over-lanes estimate never touches a float), so
    * the whole accuracy report is hash-checked. The dashboard a
    * 100 TB monitor reads to decide whether the saved sketch shape
    * still fits the key distribution. */
  val aggCmsAccuracy: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val st = graft.ext.SketchState
    val exact = ev.filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("exact_count"))
    val top = exact.orderBy(col("exact_count").desc, col("user_id").asc)
      .limit(10)
    st.cmsEstimate(st.cmsCells(ev, "user_id"), top, "user_id")
      .join(top, Seq("user_id"))
      .select(col("user_id"), col("exact_count"), col("estimate"),
        (col("estimate") - col("exact_count")).as("overcount"))
  }

  protected def aggRegistry: Map[String, Q] = Map(
    "agg_cms_join_card" -> aggCmsJoinCard,
    "agg_cms_accuracy" -> aggCmsAccuracy,
    "agg_hll_portable" -> aggHllPortable,
    "agg_countmin" -> aggCountmin,
    "agg_bloom_portable" -> aggBloomPortable,
    "agg_hll_overlap" -> aggHllOverlap,
    "set_except" -> setExcept,
    "set_intersect" -> setIntersect,
    "agg_rollup" -> aggRollup,
    "agg_salted" -> aggSalted,
    "join_salted" -> joinSalted,
    "agg_quantiles" -> aggQuantiles,
    "agg_approx_percentile" -> aggApproxPercentile,
    "agg_cube" -> aggCube,
    "agg_mode" -> aggMode,
    "pivot_daily" -> pivotDaily,
    "unpivot_daily" -> unpivotDaily,
    "dedup_editdist" -> dedupEditdist)
}
