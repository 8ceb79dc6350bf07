package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic relational analytics missing from the join/agg family:
  * Pareto frontiers and robust (median/MAD) outlier statistics —
  * the "which rows are undominated / which rows are anomalous"
  * questions a curation dashboard asks of a 10¹²-row metrics table.
  * Both are stated in exact integers so the DuckDB oracle replays
  * them value-for-value. */
object Relational {

  /** 2-D skyline (Pareto frontier, maximize both dims) — Börzsönyi,
    * Kossmann, Stocker, "The Skyline Operator", ICDE 2001 (public
    * literature). A row is on the skyline iff no other row is ≥ in
    * both dimensions and > in at least one (strict dominance;
    * coincident maxima all survive).
    *
    * Plan (scale-first, never all-pairs): the frontier only depends
    * on the per-d1 maximum of d2, so
    *   1. per-d1 max (one map-side-combined aggregate, keys bounded
    *      by the d1 DOMAIN, not the row count),
    *   2. strict-prefix max over d1 descending on that collapsed
    *      table (a window over DISTINCT d1 values — domain-sized,
    *      orders of magnitude smaller than the input; at extreme d1
    *      cardinalities swap in a range-partitioned two-level prefix
    *      scan),
    *   3. broadcast the collapsed frontier candidates back and
    *      filter: a row survives iff d2 equals its d1-group max AND
    *      strictly exceeds every max at larger d1.
    *
    * @param pts (id, d1, d2) integer columns, maximize both
    * @return the skyline rows (id, d1, d2)
    */
  def skyline2d(pts: DataFrame): DataFrame = {
    val Seq(id, d1, d2) = pts.columns.toSeq.take(3)
    val m = pts.groupBy(col(d1)).agg(max(col(d2)).as("_m2"))
    val w = Window.orderBy(col(d1).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = m.withColumn("_pmax", max(col("_m2")).over(w))
    pts.join(broadcast(front), Seq(d1))
      .where(col(d2) === col("_m2") &&
        (col("_pmax").isNull || col("_pmax") < col(d2)))
      .select(id, d1, d2)
  }

  /** Per-group robust outlier census via median / MAD (median
    * absolute deviation, the 50% breakdown-point scale estimator —
    * Hampel 1974, public literature), stated in exact integers:
    * doubled medians (med2 = x⌊(n−1)/2⌋ + x⌊n/2⌋ over the sorted
    * values, 0-based) avoid the half-integer entirely, and the
    * outlier rule |x − med| > 3·MAD is applied as
    * 2·|2x − med2| > 3·mad4 with mad4 the doubled median of the
    * doubled deviations |2x − med2|.
    *
    * Plan (scale-first): medians come from ORDER STATISTICS OVER THE
    * VALUE HISTOGRAM, never a per-group sort of raw rows — one
    * map-side-combined (group, value) count, then a cumulative walk
    * over the DISTINCT values of each group (bounded by the value
    * domain, not the row count; a hot group with 10⁹ rows collapses
    * to ≤ domain-size histogram rows before any window runs).
    *
    * @param rows (grp, v) with v integral
    * @return (grp, n, med2, mad4, n_outliers) one row per group
    */
  def madOutliers(rows: DataFrame): DataFrame = {
    val Seq(grp, v) = rows.columns.toSeq.take(2)

    // order statistic at 0-based ranks lo=(n-1)/2 and hi=n/2 from a
    // (grp, value, cnt) histogram: doubled median = val(lo) + val(hi)
    def med2Of(hist: DataFrame, value: String): DataFrame = {
      val w = Window.partitionBy(col(grp)).orderBy(col(value))
      val cum = hist.withColumn("_upto", sum(col("_c")).over(w))
        .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col(grp))))
      val lo = expr("(_n - 1) div 2")
      val hi = expr("_n div 2")
      val vlo = cum.where(col("_upto") > lo && col("_upto") - col("_c") <= lo)
        .select(col(grp), col(value).as("_vlo"), col("_n").as("n"))
      val vhi = cum.where(col("_upto") > hi && col("_upto") - col("_c") <= hi)
        .select(col(grp), col(value).as("_vhi"))
      vlo.join(vhi, grp)
        .select(col(grp), col("n"), (col("_vlo") + col("_vhi")).as("_m2"))
    }

    val hist = rows.groupBy(col(grp), col(v))
      .agg(count(lit(1)).as("_c"))
    val med = med2Of(hist, v)
      .withColumnRenamed("_m2", "med2")
    val dev = hist.join(med.select(grp, "med2"), grp)
      .select(col(grp), abs(lit(2) * col(v) - col("med2")).as("_d"),
        col("_c"))
      .groupBy(col(grp), col("_d")).agg(sum(col("_c")).as("_c"))
    val mad = med2Of(dev, "_d").select(col(grp), col("_m2").as("mad4"))
    val out = dev.join(mad, grp)
      .where(lit(2) * col("_d") > lit(3) * col("mad4"))
      .groupBy(col(grp)).agg(sum(col("_c")).as("_nout"))
    med.join(mad, grp)
      .join(out, Seq(grp), "left")
      .select(col(grp), col("n").cast("long").as("n"),
        col("med2").cast("long").as("med2"),
        col("mad4").cast("long").as("mad4"),
        coalesce(col("_nout"), lit(0L)).cast("long").as("n_outliers"))
  }
}
