package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.index.CellGrid

/** Exact k-nearest-neighbors via expanding k-ring candidate search —
  * the H3 kRing-expansion pattern the north rule names, made EXACT by a
  * ring-radius guarantee: any point outside kRing(qcell, r) lies at
  * Euclidean distance > r·cellSize, so once the kth candidate's
  * distance is ≤ r·cellSize the answer is final; otherwise the ring
  * doubles (driver-side loop over a tiny per-query aggregate — image
  * payloads never reach the driver).
  *
  * Queries are assumed ≪ images (broadcast); images shuffle only by
  * their single centroid cell. Scale: each round is one broadcast join
  * + one windowed top-k on qid — no cross join ever materializes.
  */
object Knn {

  /** images: (image_id, cxm, cym); queries: (qid, qxm, qym).
    * Returns (qid, rank, image_id, dist2), rank 1..k, ties broken by
    * image_id. */
  def knn(spark: SparkSession, images: DataFrame, queries: DataFrame,
          k: Int, res: Int = 7, initialRing: Int = 4): DataFrame = {
    val shift = CellGrid.Shift - res
    val cellSize = 1L << shift

    val imgCells = images
      .withColumn("cix", shiftright(col("cxm") + CellGrid.OffX, shift))
      .withColumn("ciy", shiftright(col("cym") + CellGrid.OffY, shift))

    var unresolved = queries
      .withColumn("qcix", shiftright(col("qxm") + CellGrid.OffX, shift))
      .withColumn("qciy", shiftright(col("qym") + CellGrid.OffY, shift))
    var results: DataFrame = null
    var r = initialRing.toLong
    val maxIx = 360000L >> shift
    val maxIy = 180000L >> shift

    while (unresolved != null) {
      val qCells = unresolved
        .withColumn("cix", explode(sequence(
          greatest(lit(0L), col("qcix") - r),
          least(lit(maxIx), col("qcix") + r))))
        .withColumn("ciy", explode(sequence(
          greatest(lit(0L), col("qciy") - r),
          least(lit(maxIy), col("qciy") + r))))

      val cand = imgCells.join(broadcast(qCells), Seq("cix", "ciy"))
        .withColumn("dist2",
          (col("cxm") - col("qxm")) * (col("cxm") - col("qxm")) +
          (col("cym") - col("qym")) * (col("cym") - col("qym")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("dist2"), col("image_id"))
      val topk = cand.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col("qid"), col("rank"), col("image_id"), col("dist2"))
        .cache()

      // guarantee check: kth distance within r*cellSize, and k found
      val bound = r * cellSize
      val status = topk.groupBy("qid")
        .agg(count(lit(1)).as("n"), max(col("dist2")).as("kd2"))
        .withColumn("done",
          col("n") === k && col("kd2") <= lit(bound) * lit(bound))
      val doneIds = status.where(col("done")).select("qid")
      val resolved = topk.join(broadcast(doneIds), Seq("qid"))
      results = if (results == null) resolved else results.union(resolved)

      val remaining = unresolved.join(
        broadcast(doneIds), Seq("qid"), "left_anti").cache()
      val nRemain = remaining.count()
      unresolved = if (nRemain == 0) null else remaining
      r *= 2
      // safety: once the ring covers the whole domain, everything is
      // resolved next round by construction (bound exceeds domain size)
      if (r > maxIx + maxIy + 2) {
        if (unresolved != null) {
          val w2 = Window.partitionBy(col("qid"))
            .orderBy(col("dist2"), col("image_id"))
          val all = imgCells.join(broadcast(unresolved.select("qid", "qxm", "qym")))
            .withColumn("dist2",
              (col("cxm") - col("qxm")) * (col("cxm") - col("qxm")) +
              (col("cym") - col("qym")) * (col("cym") - col("qym")))
            .withColumn("rank", row_number().over(w2))
            .where(col("rank") <= k)
            .select(col("qid"), col("rank"), col("image_id"), col("dist2"))
          results = results.union(all)
        }
        unresolved = null
      }
    }
    results
  }
}
