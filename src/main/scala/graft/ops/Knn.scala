package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.index.CellGrid

/** Exact k-nearest-neighbors via k-ring candidate search — the H3
  * kRing-expansion pattern the north rule names, made EXACT by a ring
  * guarantee: any point outside kRing(qcell, r) lies at Euclidean
  * distance > r·cellSize, so a query whose kth candidate distance is
  * ≤ r·cellSize is final.
  *
  * Two rounds, bounded: (1) one broadcast ring-join at `initialRing`
  * resolves the dense-region queries; (2) the (typically tiny) residue
  * falls back to a broadcast scan over all images — images shuffle
  * once per round at most, payloads never reach the driver, and the
  * windowed top-k partitions by query id. At cluster scale round 2's
  * residue is a skew-free broadcast-NL join over a pruned image set.
  */
object Knn {

  private def topk(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("dist2"), col("image_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("image_id"), col("dist2"))
  }

  private def dist2 =
    (col("cxm") - col("qxm")) * (col("cxm") - col("qxm")) +
    (col("cym") - col("qym")) * (col("cym") - col("qym"))

  /** images: (image_id, cxm, cym); queries: (qid, qxm, qym).
    * Returns (qid, rank, image_id, dist2), rank 1..k, ties by image_id. */
  def knn(spark: SparkSession, images: DataFrame, queries: DataFrame,
          k: Int, res: Int = 7, initialRing: Int = 4): DataFrame = {
    val shift = CellGrid.Shift - res
    val cellSize = 1L << shift
    val r = initialRing.toLong
    val maxIx = 360000L >> shift
    val maxIy = 180000L >> shift

    val imgCells = images
      .withColumn("cix", shiftright(col("cxm") + CellGrid.OffX, shift))
      .withColumn("ciy", shiftright(col("cym") + CellGrid.OffY, shift))

    val q = queries
      .withColumn("qcix", shiftright(col("qxm") + CellGrid.OffX, shift))
      .withColumn("qciy", shiftright(col("qym") + CellGrid.OffY, shift))

    val qCells = q
      .withColumn("cix", explode(sequence(
        greatest(lit(0L), col("qcix") - r), least(lit(maxIx), col("qcix") + r))))
      .withColumn("ciy", explode(sequence(
        greatest(lit(0L), col("qciy") - r), least(lit(maxIy), col("qciy") + r))))

    val round1 = topk(
      imgCells.join(broadcast(qCells), Seq("cix", "ciy")).withColumn("dist2", dist2),
      k).cache()

    // guarantee: k found AND kth distance ≤ r*cellSize
    val bound = r * cellSize
    val doneIds = round1.groupBy("qid")
      .agg(count(lit(1)).as("n"), max(col("dist2")).as("kd2"))
      .where(col("n") === k && col("kd2") <= lit(bound * bound))
      .select("qid")

    val resolved = round1.join(broadcast(doneIds), Seq("qid"))
    val unresolved = q.join(broadcast(doneIds), Seq("qid"), "left_anti")
      .select("qid", "qxm", "qym")

    if (unresolved.isEmpty) resolved
    else {
      // fallback: exact brute force for the residue (broadcast-NL join;
      // residue is small by construction at realistic densities)
      val round2 = topk(
        images.crossJoin(broadcast(unresolved)).withColumn("dist2", dist2), k)
      resolved.union(round2)
    }
  }
}
