package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Quantized IoU as a Column over two (x1,y1,x2,y2) box column
    * quadruples: ⌊2²⁰·inter/union⌋, all-integer (codegen arithmetic,
    * no UDF). Mirrors [[qIou]]. */
  def qIouCol(ax1: Column, ay1: Column, ax2: Column, ay2: Column,
              bx1: Column, by1: Column, bx2: Column, by2: Column): Column = {
    val inter = greatest(lit(0L), least(ax2, bx2) - greatest(ax1, bx1)) *
      greatest(lit(0L), least(ay2, by2) - greatest(ay1, by1))
    val union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    // exact integer floor-div: subtract the remainder first so the
    // double division is of an exact multiple (numerators reach ~6e11
    // where naive floor(a/b) can be off by one ulp)
    val num = inter * lit(1048576L)
    when(union <= 0, lit(0L))
      .otherwise((num - pmod(num, union)) / union).cast("long")
  }

  /** Multi-object IoU tracklet linking over per-video frame sequences
    * (the SORT-family "IoU tracker", Bochinski et al. AVSS 2017, with
    * the mutual-best association rule): detections in consecutive
    * frames are linked iff their quantized IoU exceeds `tauQ`/2²⁰ AND
    * each is the other's argmax (ties → smaller box_id). A track is
    * the chain of linked detections; every detection is labeled with
    * its track's ORIGIN (first frame, box_id) — births mid-sequence
    * start new tracks, unmatched detections end them.
    *
    * Fully relational — no per-video kernel: one self-join on
    * (video, frame→frame+1), two row_number windows for the mutual
    * argmax, then a `maxFrame−1`-step pointer walk (each step one
    * video-keyed hash join). At unbounded sequence length the walk
    * becomes the pointer-doubling loop of graph.ConnectedComponents
    * (log F rounds); frame counts per clip are bounded in practice so
    * the linear walk is the cheaper plan. All joins key on vid — a
    * single hash-partitioning is reused across every stage, and the
    * per-key work is bounded by the detector's per-frame box budget
    * (no skew).
    *
    * Input columns: vid, f, box_id, x1, y1, x2, y2 (integers).
    * Output: (vid, f, box_id, tr_f, tr_box). */
  def iouTracks(det: DataFrame, maxFrame: Int,
                tauQ: Long = 524288L): DataFrame = {
    val a = det.select(col("vid"), col("f").as("af"),
      col("box_id").as("abox"), col("x1").as("ax1"), col("y1").as("ay1"),
      col("x2").as("ax2"), col("y2").as("ay2"))
    val b = det.select(col("vid"), col("f").as("bf"),
      col("box_id").as("bbox"), col("x1").as("bx1"), col("y1").as("by1"),
      col("x2").as("bx2"), col("y2").as("by2"))
    val q = qIouCol(col("ax1"), col("ay1"), col("ax2"), col("ay2"),
      col("bx1"), col("by1"), col("bx2"), col("by2"))
    val pairs = a.join(b, a("vid") === b("vid") && col("bf") === col("af") + 1)
      .drop(b("vid"))
      .withColumn("q", q).where(col("q") > lit(tauQ))
    val wA = Window.partitionBy(col("vid"), col("af"), col("abox"))
      .orderBy(col("q").desc, col("bbox").asc)
    val wB = Window.partitionBy(col("vid"), col("bf"), col("bbox"))
      .orderBy(col("q").desc, col("abox").asc)
    val links = pairs
      .withColumn("ra", row_number().over(wA))
      .withColumn("rb", row_number().over(wB))
      .where(col("ra") === 1 && col("rb") === 1)
      .select(col("vid"), col("af"), col("abox"), col("bf"), col("bbox"))
    var lab = det.select(col("vid"), col("f"), col("box_id"),
      col("f").as("o_f"), col("box_id").as("o_b"))
    var step = 1
    while (step < maxFrame) {
      val ln = links.select(col("vid").as("l_vid"), col("af"), col("abox"),
        col("bf"), col("bbox"))
      lab = lab.join(ln, lab("vid") === col("l_vid") &&
          lab("o_f") === col("bf") && lab("o_b") === col("bbox"), "left")
        .select(col("vid"), col("f"), col("box_id"),
          coalesce(col("af"), col("o_f")).as("o_f"),
          coalesce(col("abox"), col("o_b")).as("o_b"))
      step += 1
    }
    lab.select(col("vid"), col("f"), col("box_id"),
      col("o_f").as("tr_f"), col("o_b").as("tr_box"))
  }
}
