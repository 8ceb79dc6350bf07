package graft.index

import graft.core.Geom.BBoxI

/** Deterministic hierarchical discrete global grid (the engine's H3/S2
  * stand-in — no H3/S2 jars exist offline; see SURVEY.md §7.6).
  *
  * Design: an equirectangular quadtree over integer milli-degrees.
  * The (lon,lat) domain is shifted non-negative (lon+180000 ∈ [0,360000],
  * lat+90000 ∈ [0,180000], both < 2^19), and the cell index at
  * resolution r (0..19) is a RIGHT SHIFT by (19-r): cells halve in both
  * axes per resolution step, giving the S2-style hierarchical-prefix
  * property (parent index = child index >> 1) so prefix-range joins and
  * coarsening are O(1).
  *
  * Cell ids pack (res, ix, iy) into one long:
  *   id = res * 2^50 + ix * 2^25 + iy
  * — plain integer arithmetic, so the id scheme is reproducible in ANY
  * SQL engine (the correctness oracle re-derives it in DuckDB).
  *
  * Resolution guide: r=7 → 4096 mdeg ≈ 4.1°, r=10 → 512 mdeg ≈ 0.5°.
  */
object CellGrid {
  val Shift  = 19
  val OffX   = 180000L
  val OffY   = 90000L
  val ResMul = 1L << 50 // res * 2^50
  val IxMul  = 1L << 25 // ix  * 2^25

  /** Cell edge in milli-degrees at resolution r. */
  def cellSize(res: Int): Long = 1L << (Shift - res)

  def ix(res: Int, lonM: Long): Long = (lonM + OffX) >> (Shift - res)
  def iy(res: Int, latM: Long): Long = (latM + OffY) >> (Shift - res)

  def pack(res: Int, ix: Long, iy: Long): Long =
    res * ResMul + ix * IxMul + iy

  def cellOf(res: Int, lonM: Long, latM: Long): Long =
    pack(res, ix(res, lonM), iy(res, latM))

  def resOf(id: Long): Int  = (id >> 50).toInt
  def ixOf(id: Long): Long  = (id >> 25) & ((1L << 25) - 1)
  def iyOf(id: Long): Long  = id & ((1L << 25) - 1)

  /** Parent at res-1 (hierarchical prefix property). */
  def parent(id: Long): Long = {
    val r = resOf(id)
    pack(r - 1, ixOf(id) >> 1, iyOf(id) >> 1)
  }

  /** Covering set of an mdeg bbox at resolution r: all cells whose
    * extent intersects the CLOSED-OPEN box. Deterministic row-major
    * order (ix outer, iy inner). The analog of an H3 polyfill for the
    * axis-aligned footprints this engine indexes. */
  def cover(res: Int, b: BBoxI): Array[Long] = {
    val ix0 = ix(res, b.x0); val ix1 = ix(res, b.x1 - 1)
    val iy0 = iy(res, b.y0); val iy1 = iy(res, b.y1 - 1)
    val out = new Array[Long](((ix1 - ix0 + 1) * (iy1 - iy0 + 1)).toInt)
    var k = 0
    var cx = ix0
    while (cx <= ix1) {
      var cy = iy0
      while (cy <= iy1) { out(k) = pack(res, cx, cy); k += 1; cy += 1 }
      cx += 1
    }
    out
  }

  /** k-ring: all cells with Chebyshev distance ≤ k of `id` (the H3
    * kRing analog on a square grid), clamped to the domain. Row-major
    * deterministic order. */
  def kRing(id: Long, k: Int): Array[Long] = {
    val r = resOf(id); val cx = ixOf(id); val cy = iyOf(id)
    val maxIx = (360000L >> (Shift - r))
    val maxIy = (180000L >> (Shift - r))
    val buf = Array.newBuilder[Long]
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        val nx = cx + dx; val ny = cy + dy
        if (nx >= 0 && nx <= maxIx && ny >= 0 && ny <= maxIy)
          buf += pack(r, nx, ny)
        dy += 1
      }
      dx += 1
    }
    buf.result()
  }

  /** Cell bbox in mdeg (closed-open). */
  def cellBBox(id: Long): BBoxI = {
    val r = resOf(id); val s = cellSize(r)
    val x0 = ixOf(id) * s - OffX
    val y0 = iyOf(id) * s - OffY
    BBoxI(x0, y0, x0 + s, y0 + s)
  }

  /** Morton/Z-ORDER interleave of two ≤20-bit cell coordinates
    * (ix bit b → z bit 2b+1, iy bit b → z bit 2b): the space-filling
    * curve key behind spatially-clustered table layout (Iceberg's
    * z-ordering) — sorting rows by z co-locates spatial neighbors in
    * the same files, so footprint-filtered scans prune whole files.
    * Hierarchical like the grid itself: z >> 2 is the parent cell's z
    * ([[zInterleave]](ix>>1, iy>>1)). Pure shift/mask integer
    * arithmetic — the column mirror and the SQL oracle replay the
    * identical 40-term sum. */
  def zInterleave(ix: Long, iy: Long): Long = {
    var z = 0L; var b = 0
    while (b < 20) {
      z |= ((ix >> b) & 1L) << (2 * b + 1)
      z |= ((iy >> b) & 1L) << (2 * b)
      b += 1
    }
    z
  }

  /** Inverse of [[zInterleave]]: z → (ix, iy). */
  def zDeinterleave(z: Long): (Long, Long) = {
    var ix = 0L; var iy = 0L; var b = 0
    while (b < 20) {
      ix |= ((z >> (2 * b + 1)) & 1L) << b
      iy |= ((z >> (2 * b)) & 1L) << b
      b += 1
    }
    (ix, iy)
  }
}
