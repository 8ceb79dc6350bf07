package graft.ops

import graft.core.Geom
import graft.core.Geom.BBoxD

/** Warp/reproject: output-grid calculation (bit-exact re-derivation of
  * the reference's /root/reference/GIP/GeoImage.cpp:293-326) plus
  * nearest/bilinear/cubic resampling kernels over decoded planes.
  *
  * The grid math is pure driver-free arithmetic; resampling is a
  * per-row gather kernel (image-per-row model). The distributed
  * many-tile variant reuses the same kernel per destination tile after
  * a tile-gather join (see Mosaic).
  */
object Warp {

  final case class Grid(x0: Double, y0: Double, x1: Double, y1: Double,
                        w: Int, h: Int, xres: Double, yres: Double)

  /** Output size: ceil(extent/res) (GeoImage.cpp:317-318). */
  def outputGrid(ext: BBoxD, xres: Double, yres: Double): Grid =
    Grid(ext.x0, ext.y0, ext.x1, ext.y1,
      math.ceil(ext.width / math.abs(xres)).toInt,
      math.ceil(ext.height / math.abs(yres)).toInt, xres, yres)

  /** Crop+anchor extent (GeoImage.cpp:308-316): intersect with the
    * feature extent, anchor x to the feature's left edge and y to the
    * feature's TOP edge on a res-multiple lattice. */
  def cropAnchoredExtent(ext: BBoxD, fext: BBoxD, xres: Double, yres: Double): BBoxD = {
    val i = ext.intersect(fext)
    BBoxD(
      fext.x0 + math.floor((i.x0 - fext.x0) / xres) * xres,
      i.y0,
      i.x1,
      fext.y1 - math.floor((fext.y1 - i.y1) / yres) * yres)
  }

  /** Reproject an extent 4326→3857 (the only cross-SRS pair the
    * reference tests exercise; see GeomCellSpec golden 1114×1114). */
  def extentTo3857(ext: BBoxD): BBoxD = Geom.Mercator.forwardBBox(ext)

  /** Gather-resample a source plane onto a destination grid.
    * `srcX0,srcY1,srcXres,srcYres`: source north-up affine; dst pixel
    * centers map through geo space (and optionally inverse mercator
    * when dstIsMercator). interp: 0=nearest, 1=bilinear, 2=cubic
    * (Catmull-Rom), per the reference's interpolation switch
    * (/root/reference/GIP/GeoRaster.cpp:240-246). Out-of-source or
    * nodata-touching samples yield NaN. */
  def resample(src: Array[Double], sw: Int, sh: Int,
               srcX0: Double, srcY1: Double, srcXres: Double, srcYres: Double,
               dst: Grid, interp: Int, dstIsMercator: Boolean = false): Array[Double] = {
    val out = new Array[Double](dst.w * dst.h)
    var j = 0
    while (j < dst.h) {
      var i = 0
      while (i < dst.w) {
        val gx0 = dst.x0 + (i + 0.5) * dst.xres
        val gy0 = dst.y1 - (j + 0.5) * math.abs(dst.yres)
        val (gx, gy) =
          if (dstIsMercator) Geom.Mercator.inverse(gx0, gy0) else (gx0, gy0)
        val px = (gx - srcX0) / srcXres - 0.5
        val py = (srcY1 - gy) / srcYres - 0.5
        out(j * dst.w + i) = interp match {
          case 0 =>
            val xi = math.round(px).toInt; val yi = math.round(py).toInt
            if (xi < 0 || xi >= sw || yi < 0 || yi >= sh) Double.NaN
            else src(yi * sw + xi)
          case 1 => bilinear(src, sw, sh, px, py)
          case _ => cubic(src, sw, sh, px, py)
        }
        i += 1
      }
      j += 1
    }
    out
  }

  private def at(src: Array[Double], sw: Int, sh: Int, x: Int, y: Int): Double = {
    val xc = math.max(0, math.min(sw - 1, x))
    val yc = math.max(0, math.min(sh - 1, y))
    src(yc * sw + xc)
  }

  private def bilinear(src: Array[Double], sw: Int, sh: Int,
                       px: Double, py: Double): Double = {
    if (px < -0.5 || px > sw - 0.5 || py < -0.5 || py > sh - 0.5) return Double.NaN
    val x0 = math.floor(px).toInt; val y0 = math.floor(py).toInt
    val fx = px - x0; val fy = py - y0
    val v00 = at(src, sw, sh, x0, y0);     val v10 = at(src, sw, sh, x0 + 1, y0)
    val v01 = at(src, sw, sh, x0, y0 + 1); val v11 = at(src, sw, sh, x0 + 1, y0 + 1)
    (v00 * (1 - fx) + v10 * fx) * (1 - fy) + (v01 * (1 - fx) + v11 * fx) * fy
  }

  private def cubic1(p0: Double, p1: Double, p2: Double, p3: Double, t: Double): Double =
    p1 + 0.5 * t * (p2 - p0 + t * (2 * p0 - 5 * p1 + 4 * p2 - p3 +
      t * (3 * (p1 - p2) + p3 - p0)))

  private def cubic(src: Array[Double], sw: Int, sh: Int,
                    px: Double, py: Double): Double = {
    if (px < -0.5 || px > sw - 0.5 || py < -0.5 || py > sh - 0.5) return Double.NaN
    val x1 = math.floor(px).toInt; val y1 = math.floor(py).toInt
    val fx = px - x1; val fy = py - y1
    val rows = (-1 to 2).map { dy =>
      cubic1(at(src, sw, sh, x1 - 1, y1 + dy), at(src, sw, sh, x1, y1 + dy),
             at(src, sw, sh, x1 + 1, y1 + dy), at(src, sw, sh, x1 + 2, y1 + dy), fx)
    }
    cubic1(rows(0), rows(1), rows(2), rows(3), fy)
  }
}
