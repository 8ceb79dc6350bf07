package graft.ops

/** Deterministic geometric AUGMENTATION kernels over decoded planes —
  * the image-side training-data ops (a vision pipeline materializes
  * flipped/rotated variants at ingest). Pure per-row array remaps:
  * embarrassingly parallel, no shuffle at any scale; nodata (NaN)
  * pixels travel with the remap.
  *
  * Reference anchor: gippy exposes per-pixel/chunk processing but no
  * augmentation ops — these extend the surface for training-data
  * pipelines (flip/rot90 are the lossless subset: exact integer DNs
  * are preserved, unlike interpolating rotations which go through
  * [[Warp]]'s resample kernels).
  */
object Augment {

  /** Horizontal flip: output(x, y) = input(w-1-x, y). */
  def flipH(p: Array[Double], w: Int, h: Int): Array[Double] = {
    require(p.length == w * h, s"plane ${p.length} != ${w}x$h")
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      while (x < w) { out(row + x) = p(row + (w - 1 - x)); x += 1 }
      y += 1
    }
    out
  }

  /** Clockwise 90° rotation: an input (x, y) lands at output
    * (h-1-y, x); the output plane is h wide and w tall. */
  def rot90(p: Array[Double], w: Int, h: Int): Array[Double] = {
    require(p.length == w * h, s"plane ${p.length} != ${w}x$h")
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(x * h + (h - 1 - y)) = p(y * w + x); x += 1 }
      y += 1
    }
    out
  }

  /** Window crop: the cw×ch sub-plane anchored at (x0, y0) — the
    * kernel of seeded random-crop augmentation (the caller derives
    * (x0, y0) from a reproducible per-image hash so the "random"
    * crop is content-independent and reshuffle-stable). */
  def crop(p: Array[Double], w: Int, h: Int,
           x0: Int, y0: Int, cw: Int, ch: Int): Array[Double] = {
    require(p.length == w * h, s"plane ${p.length} != ${w}x$h")
    require(x0 >= 0 && y0 >= 0 && x0 + cw <= w && y0 + ch <= h,
      s"crop ($x0,$y0,$cw,$ch) outside ${w}x$h")
    val out = new Array[Double](cw * ch)
    var y = 0
    while (y < ch) {
      System.arraycopy(p, (y0 + y) * w + x0, out, y * cw, cw)
      y += 1
    }
    out
  }

  /** ViT-style PATCHIFY: cut the plane into the non-overlapping P×P
    * grid (ragged edge patches clipped to the image) and emit one
    * (px, py, n_valid, posChecksum) tuple per patch — the image
    * analog of sequence packing: the patch grid is what a vision
    * transformer's embedding layer consumes. Checksums weight by the
    * patch-LOCAL index so the oracle verifies each pixel's position
    * inside its patch. */
  /** Brightness-invariant per-patch signature for cross-image tile
    * near-dup detection (shared logos / watermarks / boilerplate
    * crops under exposure shift): over each ps×ps patch, with v0 =
    * the FIRST valid cell in local scan order (li = ly·ps + lx),
    * sig = Σ (v − v0)·li over valid cells — identical for two patches
    * that differ only by a constant brightness offset. Returns
    * (px, py, n_valid, sig) per patch; all-nodata patches carry
    * sig = 0. Exact integers for exact-codec payloads. */
  def patchSig(p: Array[Double], w: Int, h: Int,
               ps: Int): Seq[(Int, Int, Long, Long)] = {
    require(p.length == w * h, s"plane ${p.length} != ${w}x$h")
    val npx = (w + ps - 1) / ps
    val npy = (h + ps - 1) / ps
    for {
      py <- 0 until npy
      px <- 0 until npx
    } yield {
      val x0 = px * ps; val y0 = py * ps
      val cw = math.min(ps, w - x0); val ch = math.min(ps, h - y0)
      var n = 0L; var swl = 0L; var sl = 0L
      var v0 = 0L; var have = false
      var ly = 0
      while (ly < ch) {
        var lx = 0
        while (lx < cw) {
          val v = p((y0 + ly) * w + x0 + lx)
          if (!v.isNaN) {
            val li = ly * ps + lx
            val vl = math.floor(v).toLong
            if (!have) { v0 = vl; have = true }
            n += 1; swl += vl * li; sl += li
          }
          lx += 1
        }
        ly += 1
      }
      (px, py, n, if (have) swl - v0 * sl else 0L)
    }
  }

  def patchify(p: Array[Double], w: Int, h: Int,
               ps: Int): Seq[(Int, Int, Long, Long)] = {
    require(p.length == w * h, s"plane ${p.length} != ${w}x$h")
    val npx = (w + ps - 1) / ps
    val npy = (h + ps - 1) / ps
    for {
      py <- 0 until npy
      px <- 0 until npx
    } yield {
      val x0 = px * ps; val y0 = py * ps
      val cw = math.min(ps, w - x0); val ch = math.min(ps, h - y0)
      val (n, s) = posChecksumW(crop(p, w, h, x0, y0, cw, ch), cw, ps)
      (px, py, n, s)
    }
  }

  /** posChecksum with an explicit row stride for the weight (so a
    * clipped edge patch of width cw still weights positions on the
    * FULL ps-wide patch grid — local idx = y·ps + x). */
  private def posChecksumW(p: Array[Double], cw: Int, ps: Int)
      : (Long, Long) = {
    var n = 0L; var s = 0L; var i = 0
    while (i < p.length) {
      val v = p(i)
      if (!v.isNaN) {
        n += 1
        s += math.floor(v * 1e6).toLong * ((i / cw) * ps + i % cw)
      }
      i += 1
    }
    (n, s)
  }

  /** Position-weighted checksum: (n_valid, Σ floor(v·10⁶) · idx) over
    * the plane's linear index (= y·outW + x of the OUTPUT grid),
    * skipping NaN. The positional weight makes the checksum sensitive
    * to WHERE each pixel landed, so a flip/rotation that moved nothing
    * (or moved pixels wrongly) cannot pass — a plain value sum is
    * permutation-invariant and would. */
  def posChecksum(p: Array[Double]): (Long, Long) = {
    var n = 0L; var s = 0L; var i = 0
    while (i < p.length) {
      val v = p(i)
      if (!v.isNaN) { n += 1; s += math.floor(v * 1e6).toLong * i }
      i += 1
    }
    (n, s)
  }
}
