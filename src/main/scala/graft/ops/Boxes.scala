package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Detection-box operators for image-curation pipelines: greedy
  * non-maximum suppression and greedy prediction↔ground-truth
  * matching (the TP/FP/FN kernel behind detection-quality filters).
  *
  * The reference's raster surface stops at pixel algorithms
  * (`/root/reference/GIP/GeoAlgorithms.cpp`); box post-processing is
  * part of the beyond-reference training-data surface (SURVEY §2.10):
  * a 10¹²-image corpus filtered by a detector needs NMS and
  * box-matching as *relational* operators, not per-machine loops.
  *
  * Scale posture: both kernels are per-image sequential over the
  * image's OWN candidate boxes — detector outputs are bounded (tens
  * to a few hundred boxes), so the kernel is O(n²) on a small n while
  * the corpus axis is a single hash shuffle on image_id (no cross-
  * image data motion, no skew: every image carries the same bounded
  * box count). All geometry is integer: the IoU(a,b) > τ test is the
  * cross-multiplied `τ_den·inter > τ_num·union`, so results are
  * engine-exact with no float rounding at the suppression boundary.
  */
object Boxes {

  /** Integer intersection area of two boxes (x1,y1,x2,y2), half-open
    * corners x1<x2, y1<y2. */
  def interArea(ax1: Long, ay1: Long, ax2: Long, ay2: Long,
                bx1: Long, by1: Long, bx2: Long, by2: Long): Long = {
    val iw = math.min(ax2, bx2) - math.max(ax1, bx1)
    val ih = math.min(ay2, by2) - math.max(ay1, by1)
    if (iw <= 0 || ih <= 0) 0L else iw * ih
  }

  /** IoU(a,b) > tauNum/tauDen, exact (cross-multiplied). */
  def iouExceeds(ax1: Long, ay1: Long, ax2: Long, ay2: Long,
                 bx1: Long, by1: Long, bx2: Long, by2: Long,
                 tauNum: Long, tauDen: Long): Boolean = {
    val inter = interArea(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    val union = (ax2 - ax1) * (ay2 - ay1) +
      (bx2 - bx1) * (by2 - by1) - inter
    tauDen * inter > tauNum * union
  }

  /** Greedy NMS over one image's boxes: process in (score DESC,
    * box_id ASC) order; keep a box iff its IoU with every
    * previously-KEPT box is ≤ τ. Returns the kept indices into the
    * sorted order. Standard detector post-processing (Felzenszwalb
    * et al., PAMI 2010 §4). */
  def nmsKeep(bs: Array[(Long, Long, Long, Long, Long, Long)],
              tauNum: Long, tauDen: Long): Array[Int] = {
    val kept = new scala.collection.mutable.ArrayBuffer[Int]
    var i = 0
    while (i < bs.length) {
      val (_, x1, y1, x2, y2, _) = bs(i)
      var ok = true
      var j = 0
      while (ok && j < kept.length) {
        val (_, kx1, ky1, kx2, ky2, _) = bs(kept(j))
        if (iouExceeds(x1, y1, x2, y2, kx1, ky1, kx2, ky2,
          tauNum, tauDen)) ok = false
        j += 1
      }
      if (ok) kept += i
      i += 1
    }
    kept.toArray
  }

  /** Per-image NMS aggregate: input structs (box_id, x1, y1, x2, y2,
    * score) in any order, output the kept boxes as structs in greedy
    * (score DESC, box_id ASC) kept order. */
  val nmsAgg = udf((boxes: Seq[org.apache.spark.sql.Row],
                    tauNum: Long, tauDen: Long) => {
    val bs = boxes.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(b => (-b._6, b._1)).toArray
    nmsKeep(bs, tauNum, tauDen).map(bs(_)).toSeq
  })

  /** NMS as a relational operator: boxes(img, box_id, x1, y1, x2, y2,
    * score) → kept subset, one hash shuffle on `img`. */
  def nms(boxes: DataFrame, img: String, tauNum: Long = 1L,
          tauDen: Long = 2L): DataFrame =
    boxes.groupBy(col(img))
      .agg(collect_list(struct(col("box_id"), col("x1"), col("y1"),
        col("x2"), col("y2"), col("score"))).as("bs"))
      .select(col(img),
        explode(nmsAgg(col("bs"), lit(tauNum), lit(tauDen))).as("kb"))
      .select(col(img), col("kb._1").as("box_id"), col("kb._2").as("x1"),
        col("kb._3").as("y1"), col("kb._4").as("x2"),
        col("kb._5").as("y2"), col("kb._6").as("score"))

  /** Quantized IoU ⌊2²⁰·inter/union⌋ — the deterministic matching
    * score both engines order by (two distinct true IoUs can share a
    * quantile, so the quantized value + gt_id tie-break IS the
    * operator's matching rule, not an approximation of a float one). */
  def qIou(ax1: Long, ay1: Long, ax2: Long, ay2: Long,
           bx1: Long, by1: Long, bx2: Long, by2: Long): Long = {
    val inter = interArea(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    val union = (ax2 - ax1) * (ay2 - ay1) +
      (bx2 - bx1) * (by2 - by1) - inter
    if (union <= 0) 0L else inter * 1048576L / union
  }

  /** Greedy detection matching for one image (COCO-style, single IoU
    * threshold): predictions in (score DESC, box_id ASC) order each
    * claim the unclaimed ground-truth box with the highest quantized
    * IoU (ties → smallest gt_id), provided qIoU > tauQ. Returns
    * (n_pred, tp, fp, fn, Σ matched qIoU). */
  val matchAgg = udf((preds: Seq[org.apache.spark.sql.Row],
                      gts: Seq[org.apache.spark.sql.Row], tauQ: Long) => {
    val ps = preds.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(p => (-p._6, p._1)).toArray
    val gs = gts.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(_._1).toArray
    val used = new Array[Boolean](gs.length)
    var tp = 0L; var qsum = 0L
    var i = 0
    while (i < ps.length) {
      val (_, x1, y1, x2, y2, _) = ps(i)
      var best = -1; var bestQ = tauQ // strict >: q must exceed tauQ
      var j = 0
      while (j < gs.length) {
        if (!used(j)) {
          val (_, gx1, gy1, gx2, gy2) = gs(j)
          val q = qIou(x1, y1, x2, y2, gx1, gy1, gx2, gy2)
          if (q > bestQ) { bestQ = q; best = j }
        }
        j += 1
      }
      if (best >= 0) { used(best) = true; tp += 1; qsum += bestQ }
      i += 1
    }
    (ps.length.toLong, tp, ps.length - tp, gs.length - tp, qsum)
  })
}
