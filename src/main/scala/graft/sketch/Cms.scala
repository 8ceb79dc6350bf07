package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005): d independent
  * hash rows of m counters; est(x) = min_i cnt[i][h_i(x)] is an
  * OVERESTIMATE-only frequency estimate with error ≤ εN at
  * probability 1−δ for d = ln(1/δ), m = e/ε.
  *
  * The row hashes are disjoint hex substrings of ONE md5 (the only
  * hash both engines share): h_i(x) = (16·hex[2i+1] + hex[2i+2])
  * mod m, with hex digits decoded via `ascii()` arithmetic — pure
  * codegen'd expressions any SQL engine replays exactly, which is
  * what makes the sketch oracle-checkable (unlike typical CMS builds
  * seeded from engine-private hashes).
  *
  * Scale: the build is explode(d) → hash aggregate on (row, bucket)
  * — at most d·m keys survive map-side combine per partition, so the
  * exchange carries sketches, not rows (the HLL/KMV mergeable
  * contract). Point queries broadcast the d·m-row sketch.
  */
object Cms {

  /** Value of the 1-based `pos`-th hex digit of `h`. */
  def hexVal(h: Column, pos: Int): Column = {
    val a = ascii(substring(h, pos, 1))
    when(a <= 57, a - 48).otherwise(a - 87)
  }

  /** Bucket of hash row `row` (0-based) for an md5 hex column. */
  def bucketCol(h: Column, row: Int, m: Int): Column =
    (hexVal(h, 2 * row + 1) * 16 + hexVal(h, 2 * row + 2)) % m

  /** Build the sketch table (r, b, cnt) from a term column. */
  def sketch(terms: DataFrame, termCol: Column, d: Int, m: Int): DataFrame = {
    val h = md5(termCol)
    terms
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucketCol(h, r, m).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query estimates: min over rows of the bucket counters.
    * `queries` must carry `termCol`; the sketch side broadcasts. */
  def estimate(sk: DataFrame, queries: DataFrame, termCol: Column,
               d: Int, m: Int): DataFrame = {
    val h = md5(termCol)
    queries
      .withColumn("rb", explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), bucketCol(h, r, m).as("b"))): _*)))
      .select(queries.columns.map(col) :+ col("rb.r").as("r") :+
        col("rb.b").as("b"): _*)
      .join(broadcast(sk), Seq("r", "b"))
      .groupBy(queries.columns.map(col): _*)
      .agg(min(col("cnt")).as("cms_est"))
  }
}
