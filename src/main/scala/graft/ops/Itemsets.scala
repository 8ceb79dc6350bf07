package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over event baskets — the market-basket
  * co-occurrence primitive (Agrawal & Srikant, VLDB 1994, stated as
  * the single a-priori level a SQL oracle replays directly): a
  * basket is one (user, hour) window, its items are the DISTINCT
  * (event type, payload bucket) combinations seen inside it — the
  * payload k parsed from the fixed-shape props JSON by substring
  * (identical 1-based substr in both engines) — and a pair (a < b)
  * is frequent when at least `minSup` baskets contain both.
  *
  * Scale posture: basket size is bounded by the item vocabulary (a
  * few dozen types), so the within-basket pair expansion is a
  * CONSTANT fanout — one shuffle on the basket key builds distinct
  * (basket, item), a self-equi-join on the basket key emits pairs
  * (never a cross join across baskets), and the support count
  * partial-aggregates map-side on the pair key. At 10¹² events
  * the plan is two bounded hash shuffles; contrast the all-pairs-
  * of-users or FP-tree-on-the-driver shapes that don't distribute.
  * Hour bucketing uses floor(epoch/3600) — exact in both engines
  * (sub-second truncation can't cross an hour boundary).
  *
  * Returns (item_a < item_b, support) for pairs with support ≥
  * minSup, plus per-item basket counts for the same threshold —
  * the L1/L2 a-priori levels. */
object Itemsets {

  /** Distinct (basket, item) pairs: basket = (user_id, hour), item =
    * event_type '#' (props.k div 50). */
  def baskets(events: DataFrame): DataFrame =
    events.select(col("user_id"),
        expr("floor(unix_timestamp(ts) / 3600)").cast("long").as("hr"),
        concat(col("event_type"), lit("#"),
          expr("CAST(CAST(substr(props, 7, length(props)-7) AS INT) " +
               "div 50 AS STRING)")).as("item"))
      .distinct()

  /** Frequent pairs: (item_a, item_b, support), support ≥ minSup. */
  def frequentPairs(events: DataFrame, minSup: Long): DataFrame = {
    val b = baskets(events)
    val l = b.select(col("user_id"), col("hr"), col("item").as("item_a"))
    val r = b.select(col("user_id"), col("hr"), col("item").as("item_b"))
    l.join(r, Seq("user_id", "hr"))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSup)
  }

  /** Frequent single items: (item, support), support ≥ minSup. */
  def frequentItems(events: DataFrame, minSup: Long): DataFrame =
    baskets(events)
      .groupBy("item").agg(count(lit(1)).as("support"))
      .where(col("support") >= minSup)
}
