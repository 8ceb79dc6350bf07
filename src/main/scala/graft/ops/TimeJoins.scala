package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal joins Spark has no native operator for — as-of join and
  * bounded range (interval) join — built with the same two ideas the
  * engine's spatial join uses: turn the predicate into an EQUI key
  * (time bucket ↔ covering cell) or into a single partition-and-order
  * pass (window), so nothing ever nested-loops two data-sized inputs.
  *
  * Both are event-pipeline staples (attribute an event to the latest
  * preceding state; correlate events within a window) and both keep
  * the shuffle key = the entity key, so skew tooling (salting, AQE)
  * applies unchanged.
  */
object TimeJoins {

  /** AS-OF JOIN: for every left row, the single most recent right row
    * of the same `key` with right.ts <= left.ts (ties at equal ts
    * include the right row; among equal-ts right rows the largest
    * `rightId` wins — deterministic).
    *
    * Plan: tag + union + ONE window pass per key ordered by
    * (ts, tag, id) with `last(right_id) ignoreNulls` over an
    * unbounded-preceding frame — a single shuffle on `key`, no join at
    * all, O(n log n_partition) sort. The classic alternative (equi-join
    * then per-left max) shuffles twice and blows up on dense rights;
    * this stays linear in the union size, which is what survives
    * 10¹² events. Returns (l_id, key, asof_id); left rows with no
    * preceding right are DROPPED (inner as-of, DuckDB's default). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               leftId: String, rightId: String): DataFrame = {
    val l = left.select(col(key).as("k"), col(ts).as("t"),
        col(leftId).cast("long").as("l_id"))
      .withColumn("tag", lit(1))
      .withColumn("r_id", lit(null).cast("long"))
    val r = right.select(col(key).as("k"), col(ts).as("t"),
        col(rightId).cast("long").as("r_id"))
      .withColumn("tag", lit(0))
      .withColumn("l_id", lit(null).cast("long"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("tag"), col("r_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_id", last(col("r_id"), ignoreNulls = true).over(w))
      .where(col("tag") === 1 && col("asof_id").isNotNull)
      .select(col("l_id"), col("k").as(key), col("asof_id"))
  }

  /** RANGE (interval) JOIN: all (left, right) pairs of the same `key`
    * with 0 <= right.ts − left.ts <= maxGapSec — "right happened within
    * the window after left".
    *
    * Plan: 1-D covering-bucket equi-join, the time-axis analog of the
    * spatial covering-cell join: bucket width = the gap, left keys on
    * bucket(left.ts), right explodes to {bucket−1, bucket} (any
    * qualifying pair differs by at most one bucket), equi-join on
    * (key, bucket), exact refine after. Each pair meets in EXACTLY one
    * bucket (left's), so no distinct is needed. Candidate volume is
    * O(pairs within ~2 gaps), never |L|×|R|. */
  /** FUNNEL analysis: per entity, how deep into the ordered event
    * sequence `steps` it progressed, with a per-step max gap —
    * step d matches iff a step-d event lies in (t_{d-1}, t_{d-1}+gap]
    * where t_{d-1} is the previous step's matched time. Matching is
    * GREEDY-EARLIEST per step, which is optimal under per-step gaps
    * (taking the earliest feasible event can only enlarge every later
    * step's window), so the depth is exact, not heuristic.
    *
    * Plan: one conditional aggregate per step — each step filters to
    * its own event type (corpus-sublinear), equi-joins the shrinking
    * survivor set on the SAME entity key, and min-aggregates; steps
    * are a constant, every shuffle keys on the entity, and no window
    * spans more than one entity's events. Returns
    * (entity, t1..tn epoch-micros nullable, depth). */
  def funnel(events: DataFrame, entity: String, ts: String,
             typeCol: String, steps: Seq[String], gapUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col(entity),
      col(typeCol).as("_ft"), unix_micros(col(ts).cast("timestamp")).as("_fts"))
    val stages = new scala.collection.mutable.ArrayBuffer[DataFrame]
    stages += ev.filter(col("_ft") === steps.head)
      .groupBy(entity).agg(min("_fts").as("t1"))
    for (i <- 2 to steps.length) {
      stages += ev.filter(col("_ft") === steps(i - 1))
        .join(stages.last.select(col(entity), col(s"t${i - 1}")), entity)
        .where(col("_fts") > col(s"t${i - 1}") &&
          col("_fts") <= col(s"t${i - 1}") + gapUs)
        .groupBy(entity).agg(min("_fts").as(s"t$i"))
    }
    val joined = stages.zipWithIndex.drop(1).foldLeft(stages.head) {
      case (acc, (s, i)) =>
        acc.join(s.select(col(entity), col(s"t${i + 1}")),
          Seq(entity), "left")
    }
    val depth = (2 to steps.length)
      .map(i => when(col(s"t$i").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    joined.withColumn("depth", depth)
  }

  /** COHORT RETENTION — the classic product-analytics rollup: each
    * entity's cohort = its first-activity day; the matrix counts
    * distinct entities active at each day offset from their cohort.
    * Dates come from one timezone-pinned cast (the session is UTC) and
    * offsets are exact integer day differences — fully SQL-exact.
    *
    * Plan: one hash aggregate for first-activity (keyed on the
    * entity), an equi-join back on the entity key, then a (cohort,
    * offset) count-distinct — every shuffle keys on the entity or the
    * bounded (cohort, offset) pair; no window over a global order. */
  def cohortRetention(events: DataFrame, entity: String,
                      ts: String): DataFrame = {
    val d = to_date(col(ts).cast("timestamp"))
    val first = events.groupBy(col(entity))
      .agg(min(d).as("cohort"))
    events.select(col(entity), d.as("_d"))
      .join(first, entity)
      .groupBy(col("cohort"),
        datediff(col("_d"), col("cohort")).cast("long").as("day_offset"))
      .agg(count_distinct(col(entity)).as("users"))
  }

  def rangeJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
                leftId: String, rightId: String, maxGapSec: Long): DataFrame = {
    val gapUs = maxGapSec * 1000000L
    // NTZ-safe: parquet TIMESTAMP_NTZ won't feed unix_micros directly;
    // the session is pinned to UTC so the cast is deterministic
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    def bucket(c: Column): Column = floor(us(c) / gapUs).cast("long")
    val l = left.select(col(key).as("k"), col(leftId).cast("long").as("l_id"),
        col(ts).as("l_ts"))
      .withColumn("bkt", bucket(col("l_ts")))
    val r = right.select(col(key).as("k"), col(rightId).cast("long").as("r_id"),
        col(ts).as("r_ts"))
      .withColumn("bkt", explode(array(bucket(col("r_ts")) - 1, bucket(col("r_ts")))))
    l.join(r, Seq("k", "bkt"))
      .where(col("r_ts") >= col("l_ts") &&
             us(col("r_ts")) - us(col("l_ts")) <= gapUs)
      .select(col("l_id"), col("r_id"), col("k").as(key))
  }

  /** First-order MARKOV transition matrix over per-user event-type
    * sequences — the behavioral model behind next-action prediction
    * and funnel leak analysis: consecutive event pairs (ordered by
    * (ts, event_id) within each user, the engine's canonical event
    * order) are counted per (type a → type b), and the transition
    * probability is the exact scaled integer c_ab·10⁶ div c_a
    * (c_a = Σ_b c_ab, outgoing mass, so rows of the matrix sum to
    * ≤ 10⁶ with floor loss < #types).
    *
    * Scale posture: one window pass partitioned by the entity key
    * (per-user partitions, never global), then two type²-bounded
    * aggregates — the matrix is vocabulary-sized however large the
    * event log. Returns (a, b, c, p_scaled). */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val bi = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .where(col("next_type").isNotNull)
    val cnt = bi.groupBy(col("event_type").as("a"),
        col("next_type").as("b"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("a").agg(sum("c").as("ca"))
    cnt.join(tot, "a")
      .select(col("a"), col("b"), col("c"),
        Tiling.idiv(col("c") * 1000000L, col("ca")).as("p_scaled"))
  }
}
