package graft.core

/** Geometry primitives for the spatial engine.
  *
  * Re-creates the reference's rect/point algebra
  * (/root/reference/GIP/gip/geometry.h:34-223) as immutable Scala case
  * classes. Coordinates are carried in TWO spaces:
  *   - integer milli-degrees (mdeg, 1e-3 deg) for all join/tiling logic —
  *     exact, deterministic, and reproducible in any SQL engine;
  *   - double degrees / meters only at the API edge (warp, WKT export).
  */
object Geom {

  /** Integer bounding box in milli-degrees, half-open on neither side:
    * intersection predicate is OPEN (strict overlap, touching edges do
    * not intersect) — mirrors OGR Overlaps semantics used by the
    * reference spatial join (/root/reference/GIP/gip/GeoVector.h:166).
    */
  final case class BBoxI(x0: Long, y0: Long, x1: Long, y1: Long) {
    def width: Long  = x1 - x0
    def height: Long = y1 - y0
    def area: Long   = width * height
    def intersects(o: BBoxI): Boolean =
      x0 < o.x1 && o.x0 < x1 && y0 < o.y1 && o.y0 < y1
    def intersect(o: BBoxI): Option[BBoxI] = {
      val r = BBoxI(math.max(x0, o.x0), math.max(y0, o.y0),
                    math.min(x1, o.x1), math.min(y1, o.y1))
      if (r.x0 < r.x1 && r.y0 < r.y1) Some(r) else None
    }
    def unionWith(o: BBoxI): BBoxI =
      BBoxI(math.min(x0, o.x0), math.min(y0, o.y0),
            math.max(x1, o.x1), math.max(y1, o.y1))
    def pad(p: Long): BBoxI = BBoxI(x0 - p, y0 - p, x1 + p, y1 + p)
    def containsPoint(x: Long, y: Long): Boolean =
      x >= x0 && x < x1 && y >= y0 && y < y1
  }

  /** Double-space bounding box (degrees or meters). Mirrors
    * gip::BoundingBox (/root/reference/GIP/gip/geometry.h:218). */
  final case class BBoxD(x0: Double, y0: Double, x1: Double, y1: Double) {
    def width: Double  = x1 - x0
    def height: Double = y1 - y0
    def intersect(o: BBoxD): BBoxD =
      BBoxD(math.max(x0, o.x0), math.max(y0, o.y0),
            math.min(x1, o.x1), math.min(y1, o.y1))
    def unionWith(o: BBoxD): BBoxD =
      BBoxD(math.min(x0, o.x0), math.min(y0, o.y0),
            math.max(x1, o.x1), math.max(y1, o.y1))
  }

  /** 6-element affine transform, layout per the reference
    * (/root/reference/GIP/GeoResource.cpp:99-105):
    * [x0, xres, xshear, y1, yshear, -yres]; pixel(x,y) → geo =
    * (a0 + x*a1 + y*a2, a3 + x*a4 + y*a5). y1 is the TOP edge (north-up
    * rasters have negative a5). */
  final case class Affine(a0: Double, a1: Double, a2: Double,
                          a3: Double, a4: Double, a5: Double) {
    def geoloc(px: Double, py: Double): (Double, Double) =
      (a0 + px * a1 + py * a2, a3 + px * a4 + py * a5)
    /** Inverse for axis-aligned transforms (a2 = a4 = 0). */
    def invloc(gx: Double, gy: Double): (Double, Double) =
      ((gx - a0) / a1, (gy - a3) / a5)
  }

  object Affine {
    /** North-up affine from an extent + pixel size, per the reference's
      * create path (/root/reference/GIP/GeoResource.cpp:99-105). */
    def northUp(x0: Double, y1: Double, xres: Double, yres: Double): Affine =
      Affine(x0, xres, 0.0, y1, 0.0, -yres)
  }

  /** Minimal projection math (no PROJ available offline): spherical web
    * mercator EPSG:4326 ⇄ EPSG:3857, the pair the reference's warp tests
    * exercise (/root/reference/test/test_GeoImage.py:186-196). */
  object Mercator {
    val R: Double = 6378137.0
    val MaxLat = 85.05112877980659
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.max(-MaxLat, math.min(MaxLat, latDeg))
      (math.toRadians(lonDeg) * R,
       R * math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0)))
    }
    def inverse(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(x / R),
       math.toDegrees(2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0))
    /** Transform a bbox by projecting its 4 corners (matches the
      * 2-corner+edges behaviour the reference relies on for axis-aligned
      * extents, /root/reference/GIP/gip/geometry.h:153-156). */
    def forwardBBox(b: BBoxD): BBoxD = {
      val pts = Seq((b.x0, b.y0), (b.x0, b.y1), (b.x1, b.y0), (b.x1, b.y1))
        .map { case (x, y) => forward(x, y) }
      BBoxD(pts.map(_._1).min, pts.map(_._2).min,
            pts.map(_._1).max, pts.map(_._2).max)
    }
  }

  /** Transverse Mercator (Snyder series) — the projection behind the
    * reference's UTM fixtures (test/vectors/aoi1_epsg32416.prj:
    * WGS_72BE UTM zone 16N; exercised by test_GeoAlgorithms.py:86-111).
    * Forward verified against the fixture's own coordinate pairs to
    * sub-mm (GeomCellSpec); inverse is the standard series, round-trip
    * verified to <1e-6 m. No datum shift: the reference tooling applies
    * none between these fixture files (verified numerically). */
  final case class TransverseMercator(a: Double, invF: Double,
                                      lon0Deg: Double, k0: Double,
                                      falseEasting: Double,
                                      falseNorthing: Double = 0.0) {
    private val f = 1.0 / invF
    private val e2 = 2 * f - f * f
    private val ep2 = e2 / (1 - e2)
    private val lam0 = math.toRadians(lon0Deg)
    private val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))

    private def mDist(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi
        - (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi)
        + (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi)
        - (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))

    /** (lonDeg, latDeg) → (easting, northing) meters. */
    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat); val lam = math.toRadians(lon)
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val nRad = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = tanP * tanP
      val c = ep2 * cosP * cosP
      val aa = (lam - lam0) * cosP
      val x = falseEasting + k0 * nRad * (aa + (1 - t + c) * aa * aa * aa / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aa, 5) / 120)
      val y = falseNorthing + k0 * (mDist(phi) + nRad * tanP * (aa * aa / 2 +
        (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aa, 6) / 720))
      (x, y)
    }

    /** (easting, northing) → (lonDeg, latDeg). */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val m = (y - falseNorthing) / k0
      val mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
      val phi1 = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
        (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
        (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
        (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
      val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
      val c1 = ep2 * cosP * cosP
      val t1 = tanP * tanP
      val n1 = a / math.sqrt(1 - e2 * sinP * sinP)
      val r1 = a * (1 - e2) / math.pow(1 - e2 * sinP * sinP, 1.5)
      val d = (x - falseEasting) / (n1 * k0)
      val phi = phi1 - (n1 * tanP / r1) * (d * d / 2 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) *
          math.pow(d, 6) / 720)
      val lam = lam0 + (d - (1 + 2 * t1 + c1) * d * d * d / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) *
          math.pow(d, 5) / 120) / cosP
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** The fixture's CRS: WGS_72BE UTM zone 16N (aoi1_epsg32416.prj). */
  val Utm16N_Wgs72BE: TransverseMercator =
    TransverseMercator(a = 6378135.0, invF = 298.26, lon0Deg = -87.0,
      k0 = 0.9996, falseEasting = 500000.0)

  /** WGS84 UTM northern zone (EPSG:326xx): zone 1..60. */
  def utmWgs84(zone: Int): TransverseMercator =
    TransverseMercator(a = 6378137.0, invF = 298.257223563,
      lon0Deg = -183.0 + 6.0 * zone, k0 = 0.9996, falseEasting = 500000.0)

  /** Ray-casting point-in-polygon on a closed ring (pure Scala — JTS is
    * used only as a test oracle). Even-odd rule; points exactly on an
    * edge are resolved by the half-open crossing test (stable, but edge
    * cases are additionally covered by ScalaCheck vs JTS). Ring:
    * (x0,y0),…,(xn,yn) with first == last optional. */
  def pointInPolygon(px: Double, py: Double,
                     xs: Array[Double], ys: Array[Double]): Boolean = {
    var inside = false
    val n = xs.length
    var i = 0
    var j = n - 1
    while (i < n) {
      val (xi, yi) = (xs(i), ys(i))
      val (xj, yj) = (xs(j), ys(j))
      if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Does an axis-aligned rect overlap a polygon ring? Prefilter: bbox;
    * refine: any rect corner in poly, any poly vertex in rect, or any
    * edge pair crossing. This is the exact-refinement predicate behind
    * the spatial join (reference two-phase pattern,
    * /root/reference/GIP/gip/GeoVector.h:153-179). */
  def rectIntersectsPolygon(r: BBoxD, xs: Array[Double], ys: Array[Double]): Boolean = {
    val bx0 = xs.min; val bx1 = xs.max; val by0 = ys.min; val by1 = ys.max
    if (!(r.x0 < bx1 && bx0 < r.x1 && r.y0 < by1 && by0 < r.y1)) return false
    // any polygon vertex strictly inside rect
    var i = 0
    while (i < xs.length) {
      if (xs(i) > r.x0 && xs(i) < r.x1 && ys(i) > r.y0 && ys(i) < r.y1)
        return true
      i += 1
    }
    // any rect corner inside polygon
    val cs = Seq((r.x0, r.y0), (r.x0, r.y1), (r.x1, r.y0), (r.x1, r.y1))
    if (cs.exists { case (x, y) => pointInPolygon(x, y, xs, ys) }) return true
    // rect center inside polygon (poly may pierce rect without vertices inside)
    if (pointInPolygon((r.x0 + r.x1) / 2, (r.y0 + r.y1) / 2, xs, ys)) return true
    // edge crossing test
    def segInt(ax: Double, ay: Double, bx: Double, by: Double,
               cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
      def o(px: Double, py: Double, qx: Double, qy: Double,
            rx: Double, ry: Double): Int = {
        val v = (qy - py) * (rx - qx) - (qx - px) * (ry - qy)
        if (v > 0) 1 else if (v < 0) -1 else 0
      }
      val o1 = o(ax, ay, bx, by, cx, cy); val o2 = o(ax, ay, bx, by, dx, dy)
      val o3 = o(cx, cy, dx, dy, ax, ay); val o4 = o(cx, cy, dx, dy, bx, by)
      o1 != o2 && o3 != o4
    }
    val rx = Array(r.x0, r.x1, r.x1, r.x0, r.x0)
    val ry = Array(r.y0, r.y0, r.y1, r.y1, r.y0)
    i = 0
    while (i < xs.length) {
      val j = (i + 1) % xs.length
      var e = 0
      while (e < 4) {
        if (segInt(xs(i), ys(i), xs(j), ys(j),
                   rx(e), ry(e), rx(e + 1), ry(e + 1))) return true
        e += 1
      }
      i += 1
    }
    false
  }

  /** Sutherland–Hodgman clip of a polygon ring by an axis-aligned
    * rect — the exact intersection GEOMETRY the reference's
    * `intersections` returns per hit
    * (/root/reference/GIP/gip/GeoVector.h:167-169), specialized to the
    * image-footprint-rect case. Ring is open (first vertex not
    * repeated); returns the clipped ring, possibly empty.
    *
    * For an axis-aligned subject rect the intersection vertices land
    * EXACTLY on input coordinates (each clip plane substitutes its
    * bound on one axis and interpolates the other, which is exact for
    * axis-parallel edges), so integer-mdeg rect∩rect clips are
    * bit-exact — the oracle checks area equality against the closed
    * form. */
  def clipPolygonRect(xs: Array[Double], ys: Array[Double],
                      r: BBoxD): (Array[Double], Array[Double]) = {
    // inside predicates + intersection for the 4 half-planes
    type Pt = (Double, Double)
    def clip(pts: Seq[Pt], inside: Pt => Boolean,
             cross: (Pt, Pt) => Pt): Seq[Pt] = {
      if (pts.isEmpty) return pts
      val out = scala.collection.mutable.ArrayBuffer.empty[Pt]
      var i = 0
      while (i < pts.length) {
        val cur = pts(i); val prev = pts((i + pts.length - 1) % pts.length)
        val ci = inside(cur); val pi = inside(prev)
        if (ci) {
          if (!pi) out += cross(prev, cur)
          out += cur
        } else if (pi) out += cross(prev, cur)
        i += 1
      }
      out.toSeq
    }
    def xAt(a: Pt, b: Pt, y: Double): Pt =
      (a._1 + (y - a._2) * (b._1 - a._1) / (b._2 - a._2), y)
    def yAt(a: Pt, b: Pt, x: Double): Pt =
      (x, a._2 + (x - a._1) * (b._2 - a._2) / (b._1 - a._1))
    var pts: Seq[Pt] = xs.indices.map(i => (xs(i), ys(i)))
    pts = clip(pts, _._1 >= r.x0, (a, b) => yAt(a, b, r.x0))
    pts = clip(pts, _._1 <= r.x1, (a, b) => yAt(a, b, r.x1))
    pts = clip(pts, _._2 >= r.y0, (a, b) => xAt(a, b, r.y0))
    pts = clip(pts, _._2 <= r.y1, (a, b) => xAt(a, b, r.y1))
    // drop consecutive duplicates (degenerate touch cases)
    val dedup = pts.indices.filter(i =>
      pts(i) != pts((i + 1) % pts.length)).map(pts)
    (dedup.map(_._1).toArray, dedup.map(_._2).toArray)
  }

  /** Absolute shoelace area of an open ring. Exact for integer-valued
    * double coordinates below 2^26 (products stay in 2^53). */
  def polygonArea(xs: Array[Double], ys: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = xs.length
    while (i < n) {
      val j = (i + 1) % n
      s += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    math.abs(s) / 2.0
  }

  /** WKT of an open ring (closing vertex appended). */
  def ringWkt(xs: Array[Double], ys: Array[Double]): String =
    if (xs.isEmpty) "POLYGON EMPTY"
    else {
      val pts = (xs.indices :+ 0)
        .map(i => s"${xs(i)} ${ys(i)}").mkString(", ")
      s"POLYGON (($pts))"
    }

  /** Parse a simple `POLYGON ((x y, x y, ...))` WKT outer ring. */
  def parsePolygonWkt(wkt: String): (Array[Double], Array[Double]) = {
    val inner = wkt.substring(wkt.indexOf("((") + 2, wkt.indexOf("))"))
    val pts = inner.split(",").map(_.trim).map { p =>
      val xy = p.split("\\s+"); (xy(0).toDouble, xy(1).toDouble)
    }
    // drop closing vertex if it repeats the first
    val ring = if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
    (ring.map(_._1), ring.map(_._2))
  }

  def rectWkt(x0: Double, y0: Double, x1: Double, y1: Double): String =
    s"POLYGON (($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"

  /** Exact-integer ring measures in milli-degrees: vertex count,
    * signed shoelace double-area Σ(x_i·y_{i+1} − x_{i+1}·y_i), and the
    * centroid NUMERATORS Σ(x_i+x_{i+1})·cross / Σ(y_i+y_{i+1})·cross
    * (centroid = num / (3·area2)) — layer coordinates are degrees with
    * ≤3 decimals, so ×1000 round-trips to exact longs and every
    * cross-product term stays in BIGINT (≤ ~4·10¹⁶ for the mdeg
    * domain). Ring orientation is preserved (signed results). */
  def ringMeasuresMdeg(wkt: String): (Long, Long, Long, Long) = {
    val (xs, ys) = parsePolygonWkt(wkt)
    val n = xs.length
    val xi = xs.map(v => math.round(v * 1000))
    val yi = ys.map(v => math.round(v * 1000))
    var a2 = 0L; var cx = 0L; var cy = 0L
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val cr = xi(i) * yi(j) - xi(j) * yi(i)
      a2 += cr
      cx += (xi(i) + xi(j)) * cr
      cy += (yi(i) + yi(j)) * cr
      i += 1
    }
    (n.toLong, a2, cx, cy)
  }
}
