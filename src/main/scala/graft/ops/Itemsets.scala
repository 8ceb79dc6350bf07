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
  def frequentPairs(events: DataFrame, minSup: Long): DataFrame =
    frequentPairsFromBaskets(baskets(events), minSup)

  private def frequentPairsFromBaskets(b: DataFrame,
                                       minSup: Long): DataFrame = {
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

  /** ASSOCIATION RULES from the frequent pairs — the second half of
    * a-priori (Agrawal & Srikant 1994 §3): each frequent pair (a, b)
    * yields both directed rules with exact scaled metrics
    *
    *   conf(a→b)  = 10⁶·c_ab div c_a
    *   lift       = 10⁶·c_ab·n div (c_a·c_b)   (direction-free)
    *
    * where n = total baskets. Rules below `minConf` (scaled) are cut.
    * All integers; ties ordered by (antecedent, consequent). Scale:
    * the pair table is vocabulary²-bounded, item counts broadcast —
    * this stage never touches the corpus again. */
  def rules(events: DataFrame, minSup: Long, minConfScaled: Long)
      : DataFrame = {
    // one basket derivation feeds all three aggregates (ADVICE r5:
    // the pair join, item counts and basket total each re-scanned +
    // re-distinct'ed the events table)
    val b = baskets(events).localCheckpoint()
    val pairs = frequentPairsFromBaskets(b, minSup)
    val items = b
      .groupBy("item").agg(count(lit(1)).as("c"))
    val n = b
      .select("user_id", "hr").distinct()
      .agg(count(lit(1)).as("n"))
    val both = pairs
      .select(col("item_a").as("ante"), col("item_b").as("cons"),
        col("support"))
      .unionByName(pairs.select(col("item_b").as("ante"),
        col("item_a").as("cons"), col("support")))
    both
      .join(broadcast(items.select(col("item").as("ante"),
        col("c").as("ca"))), Seq("ante"))
      .join(broadcast(items.select(col("item").as("cons"),
        col("c").as("cb"))), Seq("cons"))
      .crossJoin(broadcast(n))
      .select(col("ante"), col("cons"), col("support"),
        Tiling.idiv(col("support") * 1000000L, col("ca")).as("conf_scaled"),
        Tiling.idiv(col("support") * col("n") * 1000000L,
          col("ca") * col("cb")).as("lift_scaled"))
      .where(col("conf_scaled") >= minConfScaled)
  }
}
