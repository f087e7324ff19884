package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fred.ops.{Clean, DedupSync, Merge, MonthlyAgg, YearlyGold}
import graft.ext.{Decontam, Dedup, Ivf, MultiModal, Packing, Profile, Sampling, SemDedup, SeriesOps, Similarity, Splits, TextOps, VectorLsh, VectorQuant, VectorStats}

/** Join shapes: star/semi/outer/top-k. */
trait JoinQueries extends QueriesBase {

  // ====================================================== [EXT] joins

  /** Star join with broadcast dims + decimal-exact revenue rollup. */
  val joinStarRevenue: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .groupBy("r_name", "n_name")
      // prices/discounts are 2-dp doubles: scale to exact BIGINT cents
      // so the revenue sum is order-independent and oracle-identical
      .agg(
        (sum(round(col("l_extendedprice") * 100).cast("long") *
             (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .cast("double") / 1e4).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Left semi join — EXISTS. */
  val joinSemi: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  /** Left outer join — the enrichment-join shape every pipeline uses
    * when the dim side has gaps: all orders kept, customers outside the
    * BUILDING segment null-extend. The null-extension semantics are
    * pinned by counting matched vs unmatched per order status (plus an
    * exact balance sum over the matched side, where sum skips nulls).
    * The dim side is a filtered projection of a small table — AQE
    * broadcasts it; the fact side never shuffles. */
  val joinLeftOuter: Q = (s, dir) => {
    val dim = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_acctbal")
    Tables.orders(s, dir)
      .join(dim, col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        count(col("c_custkey")).as("n_matched"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_unmatched"),
        (sumE6(col("c_acctbal")).cast("double") / 1e6).as("bal_sum"))
  }

  /** Full outer join of two aggregated activity sides: users who only
    * click and users who only purchase both survive with nulls on the
    * absent side; the join key coalesces (USING semantics). Both sides
    * pre-aggregate before the join, so the shuffle carries one row per
    * (user, side) — the scale-correct order for outer enrichment. */
  val joinFullOuter: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
    clicks.join(purchases, Seq("user_id"), "full_outer")
  }

  /** Top-k by global order (TakeOrderedAndProject, no full sort). */
  val topkOrders: Q = (s, dir) =>
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)


  /** This family's slice of [[Queries.all]]. */
  protected def joinRegistry: Map[String, Q] = Map(
    "join_star_revenue" -> joinStarRevenue,
    "join_semi" -> joinSemi,
    "join_left_outer" -> joinLeftOuter,
    "join_full_outer" -> joinFullOuter,
    "topk_orders" -> topkOrders)
}
