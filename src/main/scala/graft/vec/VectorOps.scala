package graft.vec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-similarity operators over the `embeddings` table
  * (vec_id, embedding array<float>, label).
  *
  * Dot products run in DOUBLE with strict left-to-right folds
  * (`aggregate` over `zip_with`) so results are bit-reproducible and
  * match a sequential SQL evaluation. Brute-force top-k broadcasts the
  * (small) query set and windows by query id — the scale baseline; the
  * LSH-bucketed variant (deterministic sign-random-projection buckets)
  * is the 10^12-row path: candidates meet in buckets instead of a full
  * cross product.
  */
object VectorOps {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Brute-force cosine top-k for a set of query vector ids. */
  def cosineTopK(emb: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val q = emb.where(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cand = emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id"))
  }

  /** Per-label aggregate of norms (floor-scaled to exact integers). */
  def labelNormStats(emb: DataFrame): DataFrame =
    emb.select(col("label").cast("long").as("label"),
        floor(norm2(col("embedding")) * 1e6).cast("long").as("n2f"))
      .groupBy("label")
      .agg(count(lit(1)).as("cnt"), sum(col("n2f")).as("norm2_floor_sum"))

  /** Deterministic sign-random-projection LSH bucket id: `nb` planes,
    * plane j's component i = centered md5-derived pseudo-random in
    * [-0.5, 0.5) — fully deterministic, no RNG state. Returns bucket
    * (long) per row; ANN = equi-join on bucket then exact re-rank.
    * This is the 10^12-row ANN path: bucket cardinality 2^nb bounds
    * each candidate group. */
  def lshBucket(emb: DataFrame, dim: Int, nb: Int = 8): Column = {
    // plane weights as literal arrays (driver-computed, tiny, broadcast
    // with the plan): w_ji = frac(sin(j*1000003 + i) * 43758.5453) - 0.5
    def plane(j: Int): Seq[Double] = (0 until dim).map { i =>
      val s = math.sin(j * 1000003.0 + i) * 43758.5453123
      (s - math.floor(s)) - 0.5
    }
    (0 until nb).map { j =>
      val w = array(plane(j).map(lit): _*)
      when(dot(col("embedding"), w) >= 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate NN: candidates share a bucket; exact
    * cosine re-rank within bucket. Recall measured in the spec. */
  def lshTopK(emb: DataFrame, dim: Int, queryFilter: Column, k: Int,
              nb: Int = 8): DataFrame = {
    val withB = emb.withColumn("bucket", lshBucket(emb, dim, nb))
    val q = withB.where(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bucket"))
    val cand = withB.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id"))
  }
}
