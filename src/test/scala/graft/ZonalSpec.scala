package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.gen.Synth
import graft.ops.Stats

/** Zonal statistics: the distributed windowed kernel must agree with a
  * brute-force per-pixel center-in-rect evaluation on the same synth
  * images (window clamping — the scale optimization — changes nothing). */
class ZonalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-zonal-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // sf0.01: the smallest scale where small-raw images actually overlap
  // polygons (at sf0.001 the zonal result is legitimately empty)
  private val sfDir = "/root/testdata/sf0.01"

  /** Driver-side brute force: every pixel of every small-raw image vs
    * every polygon, center-in-[p0,p1) rule. */
  private def brute(): Map[Long, (Long, Long, Long, Long, Long)] = {
    val polys = Synth.polygons(spark, sfDir)
      .select("fid", "px0m", "py0m", "px1m", "py1m")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val imgs = Synth.images(spark, sfDir)
      .where(col("w") <= 64 && col("h") <= 64 &&
             (col("k") % 6 === 1 || col("k") % 6 === 2))
      .select("k", "w", "h", "fmt", "x0m", "y1m")
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt,
        r.getString(3), r.getLong(4), r.getLong(5)))
    val acc = scala.collection.mutable.Map[Long,
      (Set[Long], Long, Long, Long, Long)]()
    for ((fid, px0, py0, px1, py1) <- polys;
         (k, w, h, fmt, x0m, y1m) <- imgs;
         y <- 0 until h; x <- 0 until w) {
      val cx = x0m + 4L * x + 2
      val cy = y1m - 4L * y - 2
      if (cx >= px0 && cx < px1 && cy >= py0 && cy < py1) {
        val v = Synth.pixelValue(k, fmt, 0, x, y)
        if (!v.isNaN) {
          val vi = v.toLong
          val (ks, n, s, mn, mx) = acc.getOrElse(fid,
            (Set.empty[Long], 0L, 0L, Long.MaxValue, Long.MinValue))
          acc(fid) = (ks + k, n + 1, s + vi, math.min(mn, vi), math.max(mx, vi))
        }
      }
    }
    acc.map { case (fid, (ks, n, s, mn, mx)) =>
      fid -> (ks.size.toLong, n, s, mn, mx)
    }.toMap
  }

  test("zonalStatsPoly on a concave ring matches brute-force ray-casting") {
    import spark.implicits._
    // L-shaped (concave) zone: the rect [-100000,-50000]×[0,50000] minus
    // its upper-right quadrant
    val xs = Array(-100.0, -50.0, -50.0, -75.0, -75.0, -100.0)
    val ys = Array(0.0, 0.0, 25.0, 25.0, 50.0, 50.0)
    val wkt = "POLYGON ((" + (xs.indices :+ 0).map(i =>
      s"${xs(i % xs.length)} ${ys(i % xs.length)}").mkString(", ") + "))"
    val polys = Seq((0L, wkt, -100000L, 0L, -50000L, 50000L))
      .toDF("fid", "geom_wkt", "px0m", "py0m", "px1m", "py1m")
    val imgsB = Synth.imagesWithBytes(spark, sfDir, df =>
      df.where(col("w") <= 64 && col("h") <= 64 &&
               (col("k") % 6 === 1 || col("k") % 6 === 2)))
    val got = Stats.zonalStatsPoly(imgsB, polys, Synth.NumBands)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // brute force with the same PIP kernel, no window clamping
    val imgs = Synth.images(spark, sfDir)
      .where(col("w") <= 64 && col("h") <= 64 &&
             (col("k") % 6 === 1 || col("k") % 6 === 2))
      .select("k", "w", "h", "fmt", "x0m", "y1m")
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt,
        r.getString(3), r.getLong(4), r.getLong(5)))
    var ks = Set.empty[Long]; var n = 0L; var s = 0L
    var mn = Long.MaxValue; var mx = Long.MinValue
    for ((k, w, h, fmt, x0m, y1m) <- imgs; y <- 0 until h; x <- 0 until w) {
      val cx = (x0m + 4L * x + 2) / 1000.0
      val cy = (y1m - 4L * y - 2) / 1000.0
      if (graft.core.Geom.pointInPolygon(cx, cy, xs, ys)) {
        val v = Synth.pixelValue(k, fmt, 0, x, y)
        if (!v.isNaN) {
          val vi = v.toLong
          ks += k; n += 1; s += vi
          mn = math.min(mn, vi); mx = math.max(mx, vi)
        }
      }
    }
    assert(n > 0, "fixture zone should cover at least one image")
    assert(got === Map(0L -> ((ks.size.toLong, n, s, mn, mx))))
  }

  test("zonalStats matches brute-force center-in-rect evaluation") {
    val got = Stats.zonalStats(
        Synth.imagesWithBytes(spark, sfDir, df =>
          df.where(col("w") <= 64 && col("h") <= 64 &&
                   (col("k") % 6 === 1 || col("k") % 6 === 2))),
        Synth.polygons(spark, sfDir), Synth.NumBands)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val want = brute()
    assert(got.keySet === want.keySet)
    assert(got === want)
    assert(got.nonEmpty, "fixture should produce at least one zonal row")
  }
}
