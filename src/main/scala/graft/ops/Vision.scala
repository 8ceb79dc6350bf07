package graft.ops

import org.apache.spark.sql.functions._
import graft.core.Codec
import graft.gen.Synth

/** Classic vision window kernels over single-band rasters — the
  * filtering/feature layer a user of the reference would stack on the
  * per-pixel algebra of `GeoRaster` (the reference ships the kernel
  * machinery in /root/reference/GIP/GeoRaster.h:225-233 and the
  * convolve/laplacian family; these are the standard published
  * neighbors: rank filtering, mathematical morphology (Serra), the
  * topographic position/ruggedness indices (Weiss 2001, Riley 1999),
  * normalized cross-correlation template matching (Lewis 1995), and
  * the Hough line transform (Duda-Hart 1972)).
  *
  * Every kernel decodes its payload ONCE and emits a per-image
  * aggregate (or a ≤bins-size histogram) — embarrassingly parallel
  * map work with no cross-image shuffle, so the 100 TB plan is scan →
  * kernel → tiny per-image agg. All math is integer or a fixed
  * sequence of correctly-rounded IEEE ops, so every operator is
  * DuckDB-oracle value-exact.
  */
object Vision {

  /** 3×3 median (rank) filter over interior pixels — the classic
    * salt-and-pepper denoiser. The median of 9 integers is the 5th
    * smallest (computed by insertion sort into a 9-slot buffer, no
    * floating point anywhere). Per image:
    * (n_int, Σ med, n_changed where med ≠ center, Σ med·(x+131·y)). */
  val medianAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val buf = new Array[Long](9)
    var n = 0L; var ms = 0L; var nc = 0L; var chk = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        var i = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = z((y + dy) * w + (x + dx)).toLong
            var j = i
            while (j > 0 && buf(j - 1) > v) { buf(j) = buf(j - 1); j -= 1 }
            buf(j) = v; i += 1
            dx += 1
          }
          dy += 1
        }
        val med = buf(4)
        n += 1; ms += med; chk += med * (x + 131L * y)
        if (med != z(y * w + x).toLong) nc += 1
        x += 1
      }
      y += 1
    }
    (n, ms, nc, chk)
  })

  /** Morphological gradient (Beucher): dilate3×3 − erode3×3 =
    * max − min over the 3×3 window, the standard edge-strength
    * operator of mathematical morphology. Interior pixels. Per image:
    * (n_int, Σ grad, max grad, Σ grad·(x+131·y)). */
  val morphGradAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    var n = 0L; var gs = 0L; var gm = 0L; var chk = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        var mn = Long.MaxValue; var mx = Long.MinValue
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = z((y + dy) * w + (x + dx)).toLong
            if (v < mn) mn = v
            if (v > mx) mx = v
            dx += 1
          }
          dy += 1
        }
        val g = mx - mn
        n += 1; gs += g; chk += g * (x + 131L * y)
        if (g > gm) gm = g
        x += 1
      }
      y += 1
    }
    (n, gs, gm, chk)
  })

  /** White top-hat: z − opening(z), where opening = dilate3×3 of the
    * erode3×3 plane — isolates bright features smaller than the
    * structuring element (the morphology residue behind bright-spot /
    * small-target extraction). Evaluated where the full 5×5 support
    * exists (x,y ∈ [2, w−3]×[2, h−3]); top-hat ≥ 0 by construction.
    * Per image: (n_eval, Σ th, n_pos with th > 0, Σ th·(x+131·y)). */
  val topHatAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    // erosion plane over interior (border cells stay MaxValue and the
    // 5×5 support bound keeps them out of every dilate window below)
    val ero = Array.fill((w * h).toInt)(Long.MaxValue)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        var mn = Long.MaxValue
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = z((y + dy) * w + (x + dx)).toLong
            if (v < mn) mn = v
            dx += 1
          }
          dy += 1
        }
        ero(y * w + x) = mn
        x += 1
      }
      y += 1
    }
    var n = 0L; var ts = 0L; var np = 0L; var chk = 0L
    y = 2
    while (y < h - 2) {
      var x = 2
      while (x < w - 2) {
        var mx = Long.MinValue
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = ero((y + dy) * w + (x + dx))
            if (v > mx) mx = v
            dx += 1
          }
          dy += 1
        }
        val th = z(y * w + x).toLong - mx
        n += 1; ts += th; chk += th * (x + 131L * y)
        if (th > 0) np += 1
        x += 1
      }
      y += 1
    }
    (n, ts, np, chk)
  })

  /** TPI (topographic position index, Weiss 2001) and TRI (terrain
    * ruggedness index, Riley 1999) over the 8-neighborhood, stated in
    * pure integers: tpi8 = 8·z_c − Σ z_n (8× the usual z_c − mean, so
    * no division) and tri = Σ |z_c − z_n|. Interior pixels. Per image:
    * (n_int, n_ridge with tpi8 > 0, n_valley with tpi8 < 0,
    * Σ tpi8, Σ tri). */
  val tpiAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    var n = 0L; var nr = 0L; var nv = 0L; var ts = 0L; var trs = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val zc = z(y * w + x).toLong
        var sn = 0L; var tri = 0L
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            if (dx != 0 || dy != 0) {
              val v = z((y + dy) * w + (x + dx)).toLong
              sn += v; tri += math.abs(zc - v)
            }
            dx += 1
          }
          dy += 1
        }
        val tpi = 8 * zc - sn
        n += 1; ts += tpi; trs += tri
        if (tpi > 0) nr += 1 else if (tpi < 0) nv += 1
        x += 1
      }
      y += 1
    }
    (n, nr, nv, ts, trs)
  })

  /** The fixed 8×8 template: the k=911 DEM surface's top-left patch —
    * deterministic, broadcast-by-value into the kernel (at 100 TB the
    * template is driver-side constant state; only the corpus scans). */
  val TemplateKey = 911L
  private lazy val template: Array[Long] = {
    val t = new Array[Long](64)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) { t(j * 8 + i) = Synth.demValue(TemplateKey, i, j); i += 1 }
      j += 1
    }
    t
  }

  /** Normalized cross-correlation template match (Lewis 1995),
    * exact-scored: for each 8×8 window position, num = 64·Σ(T·Z) −
    * ΣT·ΣZ and den = 64·ΣZ² − (ΣZ)² are exact integers; the reported
    * score floor(num/√den · 10⁶) is three correctly-rounded IEEE ops
    * in a fixed order (both operands < 2⁵³, so the int→double casts
    * are exact) — bit-identical across engines. Zero-variance windows
    * (den = 0, NCC undefined) are skipped. Best position = max score,
    * ties → lowest y then x. Per image: (bx, by, best score, n_cand).
    */
  val templateMatchAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val t = template
    val st = t.sum
    var bx = -1L; var by = -1L; var bs = Long.MinValue; var nc = 0L
    var y0 = 0
    while (y0 <= h - 8) {
      var x0 = 0
      while (x0 <= w - 8) {
        var sz = 0L; var szz = 0L; var stz = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val v = z((y0 + j) * w + (x0 + i)).toLong
            sz += v; szz += v * v; stz += t(j * 8 + i) * v
            i += 1
          }
          j += 1
        }
        val num = 64L * stz - st * sz
        val den = 64L * szz - sz * sz
        if (den > 0) {
          nc += 1
          val s = math.floor(num.toDouble / math.sqrt(den.toDouble) * 1e6)
            .toLong
          if (s > bs) { bs = s; bx = x0; by = y0 }
        }
        x0 += 1
      }
      y0 += 1
    }
    (bx, by, bs, nc)
  })

  /** GLCM (gray-level co-occurrence, Haralick 1973) at offset (1,0)
    * over 8 levels (level = z div 256): n_pairs, contrast
    * Σ c·(i−j)², dissimilarity Σ c·|i−j|, energy Σ c² — the classic
    * texture features, all exact integers. */
  val glcmAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val c = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        val i = (z(y * w + x).toLong / 256).toInt
        val j = (z(y * w + x + 1).toLong / 256).toInt
        c(i * 8 + j) += 1
        x += 1
      }
      y += 1
    }
    var np = 0L; var con = 0L; var dis = 0L; var en = 0L
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        val cc = c(i * 8 + j)
        np += cc; con += cc * (i - j) * (i - j)
        dis += cc * math.abs(i - j); en += cc * cc
        j += 1
      }
      i += 1
    }
    (np, con, dis, en)
  })

  /** Intensity-weighted image moments (Hu 1962 raw/central family),
    * divide-free: the scaled central moments mu20s = m00·Σz·x² − m10²
    * (= m00²·Var_x up to the weight normalization), mu02s, mu11s are
    * exact integers (< 2⁶² for 64×64 i16 planes). Orientation class =
    * (sign(mu11s)+1)·3 + (sign(mu20s−mu02s)+1) — the principal-axis
    * quadrant without the inexact ½·atan2. */
  val momentsAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    var m00 = 0L; var m10 = 0L; var m01 = 0L
    var mxx = 0L; var myy = 0L; var mxy = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = z(y * w + x).toLong
        m00 += v; m10 += v * x; m01 += v * y
        mxx += v * x * x; myy += v * y * y; mxy += v * x * y
        x += 1
      }
      y += 1
    }
    val mu20 = m00 * mxx - m10 * m10
    val mu02 = m00 * myy - m01 * m01
    val mu11 = m00 * mxy - m10 * m01
    val code = (java.lang.Long.signum(mu11) + 1) * 3 +
      (java.lang.Long.signum(mu20 - mu02) + 1)
    (mu20, mu02, mu11, code.toLong)
  })

  /** Otsu threshold (1979) over 32 levels (level = z div 64), decided
    * in exact integer arithmetic: maximize the between-class variance
    * BCV(t) = num²/den with num = w0·S − W·S0 and den = w0·(W−w0)
    * (both exact Longs), comparing candidates by the cross product
    * num²·den' ≷ num'²·den in BigInt — no floating point, ties → the
    * lowest threshold. Returns (t_best, w0, num, den). */
  val otsuAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val hist = new Array[Long](32)
    var i = 0
    val n = w * h
    while (i < n) { hist((z(i).toLong / 64).toInt) += 1; i += 1 }
    var wT = 0L; var sT = 0L
    i = 0
    while (i < 32) { wT += hist(i); sT += i * hist(i); i += 1 }
    var bt = -1L; var bw0 = 0L; var bnum = 0L; var bden = 1L
    var bKey = BigInt(-1)
    var w0 = 0L; var s0 = 0L
    var t = 0
    while (t < 31) {
      w0 += hist(t); s0 += t * hist(t)
      if (w0 > 0 && w0 < wT) {
        val num = w0 * sT - wT * s0
        val den = w0 * (wT - w0)
        val key = BigInt(num) * num * bden
        val ref = bKey * den
        if (bt < 0 || key > ref) {
          bt = t; bw0 = w0; bnum = num; bden = den
          bKey = BigInt(num) * num
        }
      }
      t += 1
    }
    (bt, bw0, bnum, bden)
  })

  /** Census transform (Zabih-Woodfill 1994): per interior pixel the
    * 8-bit neighbor-greater-than-center code; reported as the
    * popcount histogram — rows (popcount, cnt) for non-empty counts.
    * The popcount distribution is the texture signature stereo
    * matchers rank by. */
  val censusAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val cnt = new Array[Long](9)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val zc = z(y * w + x)
        var pc = 0
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            if ((dx != 0 || dy != 0) && z((y + dy) * w + (x + dx)) > zc)
              pc += 1
            dx += 1
          }
          dy += 1
        }
        cnt(pc) += 1
        x += 1
      }
      y += 1
    }
    cnt.toSeq.zipWithIndex.collect { case (c, i) if c > 0 =>
      (i.toLong, c) }
  })

  /** Gradient-orientation octant histogram (HOG-lite): Horn gradient
    * (gx, gy) per interior pixel classified into the eight 45° sectors
    * [k·45°, (k+1)·45°) by pure sign/magnitude comparisons (no atan2),
    * octant 8 = flat (gx = gy = 0). Rows (octant, cnt, Σ gx²+gy²) —
    * counts AND integer energy per direction. Screen-y axis: gy grows
    * downward, octants are in atan2(gy,gx) order. */
  val gradOctAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val cnt = new Array[Long](9)
    val mag = new Array[Long](9)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        var gx = 0L; var gy = 0L
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = z((y + dy) * w + (x + dx)).toLong
            gx += v * dx * (2 - math.abs(dy))
            gy += v * dy * (2 - math.abs(dx))
            dx += 1
          }
          dy += 1
        }
        val o = octant(gx, gy)
        cnt(o) += 1; mag(o) += gx * gx + gy * gy
        x += 1
      }
      y += 1
    }
    (0 to 8).flatMap { o =>
      if (cnt(o) > 0) Some((o.toLong, cnt(o), mag(o))) else None
    }
  })

  /** Box filter via a summed-area table (Crow 1984 integral image):
    * one O(w·h) pass builds the SAT, then every (2r+1)² window sum is
    * 4 lookups — O(1) per pixel independent of r, where the naive
    * window scan (what the DuckDB oracle replays) is O(r²) per pixel.
    * Full-support interior only (x,y ∈ [r, w−1−r]×[r, h−1−r]). All
    * integer. Per image: (n_eval, Σ box, max box, Σ box·(x+131·y)). */
  val integralBoxAgg = udf((bytes: Array[Byte], w: Int, h: Int, r: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    integralBox(z, w, h, r)
  })

  /** The SAT box kernel on a decoded plane (exposed for the bench's
    * cost-model evidence: O(1)/pixel at any radius). */
  def integralBox(z: Array[Double], w: Int, h: Int,
                  r: Int): (Long, Long, Long, Long) = {
    // sat(y)(x) = Σ z over [0,x)×[0,y) — (w+1)·(h+1), built in one pass
    val sat = new Array[Long]((w + 1) * (h + 1))
    var y = 0
    while (y < h) {
      var rowSum = 0L
      var x = 0
      while (x < w) {
        rowSum += z(y * w + x).toLong
        sat((y + 1) * (w + 1) + (x + 1)) = sat(y * (w + 1) + (x + 1)) + rowSum
        x += 1
      }
      y += 1
    }
    var n = 0L; var bs = 0L; var bmax = Long.MinValue; var chk = 0L
    y = r
    while (y < h - r) {
      val y0 = y - r; val y1 = y + r + 1
      var x = r
      while (x < w - r) {
        val x0 = x - r; val x1 = x + r + 1
        val box = sat(y1 * (w + 1) + x1) - sat(y0 * (w + 1) + x1) -
          sat(y1 * (w + 1) + x0) + sat(y0 * (w + 1) + x0)
        n += 1; bs += box; if (box > bmax) bmax = box
        chk += box * (x + 131L * y)
        x += 1
      }
      y += 1
    }
    (n, bs, if (n == 0) 0L else bmax, chk)
  }

  /** UNSHARP MASK — the classic USM sharpen out = v + k·(v − blur),
    * stated divide-free over the SAT box blur: with q = (2r+1)² and
    * k = 1, the q-scaled output is U = 2·q·v − Σz(window) (exact
    * integer; the real output is U/q). Per image over full-support
    * interior: (n_eval, ΣU, n_up = pixels sharpened upward, i.e.
    * U > q·v ⇔ v above its local mean, Σ U·(x+131·y) positional
    * checksum). O(1) per pixel at any radius via the SAT — the
    * oracle replays the naive O(r²) window scan. */
  val unsharpAgg = udf((bytes: Array[Byte], w: Int, h: Int, r: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val sat = new Array[Long]((w + 1) * (h + 1))
    var y = 0
    while (y < h) {
      var rowSum = 0L
      var x = 0
      while (x < w) {
        rowSum += z(y * w + x).toLong
        sat((y + 1) * (w + 1) + (x + 1)) = sat(y * (w + 1) + (x + 1)) + rowSum
        x += 1
      }
      y += 1
    }
    val q = (2L * r + 1L) * (2L * r + 1L)
    var n = 0L; var us = 0L; var up = 0L; var chk = 0L
    y = r
    while (y < h - r) {
      val y0 = y - r; val y1 = y + r + 1
      var x = r
      while (x < w - r) {
        val x0 = x - r; val x1 = x + r + 1
        val box = sat(y1 * (w + 1) + x1) - sat(y0 * (w + 1) + x1) -
          sat(y1 * (w + 1) + x0) + sat(y0 * (w + 1) + x0)
        val v = z(y * w + x).toLong
        val u = 2L * q * v - box
        n += 1; us += u; if (u > q * v) up += 1
        chk += u * (x + 131L * y)
        x += 1
      }
      y += 1
    }
    (n, us, up, chk)
  })

  /** Windowed local statistics from TWO summed-area tables (z and
    * z²) — the adaptive-threshold / texture-energy building block
    * (Niblack 1986 family, stated divide-free): with q = (2r+1)²,
    * a pixel is "above local mean" iff q·z > Σz, and the scaled
    * local variance is V = q·Σz² − (Σz)² — both exact integers.
    * O(1) per pixel at ANY radius (the oracle pays O(r²)). Per
    * image: (n_eval, n_above, ΣV, max V, Σ V·(x+131·y) mod 2^40
    * — the modulus keeps the positional checksum in range). */
  val localStatsAgg = udf((bytes: Array[Byte], w: Int, h: Int, r: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val sat = new Array[Long]((w + 1) * (h + 1))
    val sat2 = new Array[Long]((w + 1) * (h + 1))
    var y = 0
    while (y < h) {
      var rowSum = 0L; var rowSum2 = 0L
      var x = 0
      while (x < w) {
        val v = z(y * w + x).toLong
        rowSum += v; rowSum2 += v * v
        sat((y + 1) * (w + 1) + (x + 1)) = sat(y * (w + 1) + (x + 1)) + rowSum
        sat2((y + 1) * (w + 1) + (x + 1)) = sat2(y * (w + 1) + (x + 1)) + rowSum2
        x += 1
      }
      y += 1
    }
    def box(s: Array[Long], x0: Int, y0: Int, x1: Int, y1: Int): Long =
      s(y1 * (w + 1) + x1) - s(y0 * (w + 1) + x1) -
        s(y1 * (w + 1) + x0) + s(y0 * (w + 1) + x0)
    val q = (2L * r + 1) * (2L * r + 1)
    val m = 1L << 40
    var n = 0L; var nAbove = 0L; var vs = 0L; var vmax = Long.MinValue
    var chk = 0L
    y = r
    while (y < h - r) {
      var x = r
      while (x < w - r) {
        val s1 = box(sat, x - r, y - r, x + r + 1, y + r + 1)
        val s2 = box(sat2, x - r, y - r, x + r + 1, y + r + 1)
        val v = q * s2 - s1 * s1
        n += 1
        if (q * z(y * w + x).toLong > s1) nAbove += 1
        vs += v; if (v > vmax) vmax = v
        chk = (chk + (v % m) * ((x + 131L * y) % m)) % m
        x += 1
      }
      y += 1
    }
    (n, nAbove, vs, if (n == 0) 0L else vmax, chk)
  })

  /** Canny-lite edge chain (Canny 1986 restated in exact integers):
    * central-difference gradient gx = z(x+1)−z(x−1), gy = z(y+1)−
    * z(y−1) on the interior; direction floor-quantized to one of 4
    * axes via the 45°-boundary [[octant]] ladder (axis = octant mod
    * 4 — the same exact comparison ladder q_grad_octants gates);
    * non-max suppression keeps mag² > next-along-axis and ≥
    * prev-along-axis (out-of-support neighbors never suppress);
    * double threshold mag² ≥ th2 (strong) / ≥ tl2 (weak); hysteresis
    * promotes weak survivors 8-connected to a strong through the
    * survivor set (per-image BFS — O(edges), decode-once, no
    * shuffle; the oracle replays it as a recursive reachability
    * CTE). Per image: (n_nms, n_strong, n_edge, Σ (x+131·y) over
    * final edges). */
  val cannyAgg = udf((bytes: Array[Byte], w: Int, h: Int,
                      tl2: Long, th2: Long) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val DX = Array(1, 1, 0, -1, -1, -1, 0, 1)
    val DY = Array(0, 1, 1, 1, 0, -1, -1, -1)
    val m2 = new Array[Long](w * h) // -1 = outside gradient support
    val ax = new Array[Byte](w * h)
    java.util.Arrays.fill(m2, -1L)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val gx = z(y * w + x + 1).toLong - z(y * w + x - 1).toLong
        val gy = z((y + 1) * w + x).toLong - z((y - 1) * w + x).toLong
        m2(y * w + x) = gx * gx + gy * gy
        val o = octant(gx, gy)
        ax(y * w + x) = (if (o == 8) 0 else o % 4).toByte
        x += 1
      }
      y += 1
    }
    // NMS + double threshold: state 0 none, 1 weak, 2 strong
    val st = new Array[Byte](w * h)
    var nSur = 0L; var nStrong = 0L
    y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val i = y * w + x
        val v = m2(i)
        if (v >= tl2) {
          val a = ax(i)
          val nx = x + DX(a); val ny = y + DY(a)
          val px = x - DX(a); val py = y - DY(a)
          val nm = m2(ny * w + nx) // border ring is -1 (never suppresses)
          val pm = m2(py * w + px)
          if (v > nm && v >= pm) {
            nSur += 1
            if (v >= th2) { st(i) = 2; nStrong += 1 } else st(i) = 1
          }
        }
        x += 1
      }
      y += 1
    }
    // hysteresis BFS from strong through the survivor set
    val queue = new java.util.ArrayDeque[Int]()
    val edge = new Array[Boolean](w * h)
    var i = 0
    while (i < w * h) {
      if (st(i) == 2) { edge(i) = true; queue.add(i) }
      i += 1
    }
    while (!queue.isEmpty) {
      val c = queue.poll()
      val cx = c % w; val cy = c / w
      var d = 0
      while (d < 8) {
        val j = (cy + DY(d)) * w + (cx + DX(d))
        // survivors only exist on the interior, so j is in range
        if (st(j) != 0 && !edge(j)) { edge(j) = true; queue.add(j) }
        d += 1
      }
    }
    var nEdge = 0L; var chk = 0L
    i = 0
    while (i < w * h) {
      if (edge(i)) { nEdge += 1; chk += (i % w) + 131L * (i / w) }
      i += 1
    }
    (nSur, nStrong, nEdge, chk)
  })

  /** Block-matching motion estimation (the exhaustive-search SAD
    * kernel of MPEG/H.26x motion compensation, Jain & Jain 1981):
    * 8×8 reference blocks from the LATER frame, displacement search
    * d ∈ [−2,2]² in the earlier frame, winner = argmin SAD with ties
    * → smallest code (dy+2)·5+(dx+2). Blocks are placed on a margin-2
    * grid (x0,y0 ≡ 2 mod 8, block+displacement always in-bounds) so
    * every candidate window exists. Integer SAD — value-exact.
    * Input: the (t, bytes) epoch structs for t = 0 and t = 3 of the
    * DEM stack, plus a per-image true shift (sx, sy): the reference
    * block is read from epoch 3 at (x+sx, y+sy), so the search must
    * RECOVER the shift against epoch 0 through the trend noise —
    * the winning displacement varies per image instead of collapsing
    * to (0,0). Returns per-winning-displacement rows
    * (dx, dy, n_blocks, Σ best-SAD). */
  val blockMotionAgg = udf((w: Int, h: Int, sx: Int, sy: Int,
                            epochs: Seq[org.apache.spark.sql.Row]) => {
    val byT = epochs.map(r => (r.getInt(0),
      Codec.decode(r.getAs[Array[Byte]](1), w, h, 1, "raw-i16le")(0))).toMap
    val v0 = byT(0); val v3 = byT(3)
    // (dy+2)*5+(dx+2) -> (n, sadSum)
    val n = new Array[Long](25); val ss = new Array[Long](25)
    var y0 = 2
    while (y0 + 8 <= h - 2) {
      var x0 = 2
      while (x0 + 8 <= w - 2) {
        var bestSad = Long.MaxValue; var bestC = 0
        var dy = -2
        while (dy <= 2) {
          var dx = -2
          while (dx <= 2) {
            var sad = 0L
            var y = y0
            while (y < y0 + 8) {
              var x = x0
              while (x < x0 + 8) {
                sad += math.abs(v3((y + sy) * w + (x + sx)).toLong -
                  v0((y + dy) * w + (x + dx)).toLong)
                x += 1
              }
              y += 1
            }
            val c = (dy + 2) * 5 + (dx + 2)
            if (sad < bestSad) { bestSad = sad; bestC = c }
            dx += 1
          }
          dy += 1
        }
        n(bestC) += 1; ss(bestC) += bestSad
        x0 += 8
      }
      y0 += 8
    }
    (0 until 25).flatMap { c =>
      if (n(c) > 0) Some((c % 5 - 2, c / 5 - 2, n(c), ss(c))) else None
    }
  })

  /** Vertical minimum-energy seam (Avidan & Shamir 2007 seam
    * carving): energy e = |z(x+1,y)−z(x−1,y)| + |z(x,y+1)−z(x,y−1)|
    * on the interior, then the classic DP M(y,x) = e(y,x) +
    * min(M(y−1, x−1..x+1)) down the interior rows (column range
    * [1, w−2], parents clamped to it). Per image: (n_cols, min seam
    * cost over the bottom DP row, its argmin x with smallest-x tie,
    * Σ M over the bottom row). O(w·h) decode-once map work; the
    * oracle replays the DP as a strictly-increasing-y recursive CTE
    * (terminates naturally — no fixed round bound needed). */
  val seamAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    def e(x: Int, y: Int): Long =
      math.abs(z(y * w + x + 1).toLong - z(y * w + x - 1).toLong) +
        math.abs(z((y + 1) * w + x).toLong - z((y - 1) * w + x).toLong)
    var prev = Array.tabulate(w - 2)(i => e(i + 1, 1))
    var y = 2
    while (y < h - 1) {
      val cur = new Array[Long](w - 2)
      var i = 0
      while (i < w - 2) {
        var m = prev(i)
        if (i > 0 && prev(i - 1) < m) m = prev(i - 1)
        if (i < w - 3 && prev(i + 1) < m) m = prev(i + 1)
        cur(i) = e(i + 1, y) + m
        i += 1
      }
      prev = cur
      y += 1
    }
    var best = Long.MaxValue; var bestX = 0L; var tot = 0L
    var i = 0
    while (i < w - 2) {
      tot += prev(i)
      if (prev(i) < best) { best = prev(i); bestX = i + 1 }
      i += 1
    }
    (w - 2L, best, bestX, tot)
  })

  /** FAST-16 segment-test corner detector (Rosten & Drummond 2006):
    * a pixel is a corner when ≥ 9 CONTIGUOUS samples of the radius-3
    * Bresenham circle are all brighter than center+t or all darker
    * than center−t (circular contiguity — the oracle replays it as
    * a doubled-bitstring LIKE). Pure integer comparisons. Per image:
    * (n_eval, n_corners, Σ (x+131·y) over corners). */
  val FastDx = Array(0, 1, 2, 3, 3, 3, 2, 1, 0, -1, -2, -3, -3, -3, -2, -1)
  val FastDy = Array(-3, -3, -2, -1, 0, 1, 2, 3, 3, 3, 2, 1, 0, -1, -2, -3)

  val fastAgg = udf((bytes: Array[Byte], w: Int, h: Int, t: Long) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    def maxCircularRun(f: Array[Boolean]): Int = {
      if (f.forall(identity)) return 16
      var best = 0; var run = 0
      var i = 0
      while (i < 32) {
        if (f(i % 16)) { run += 1; if (run > best) best = run }
        else run = 0
        i += 1
      }
      best
    }
    val bright = new Array[Boolean](16)
    val dark = new Array[Boolean](16)
    var n = 0L; var nc = 0L; var chk = 0L
    var y = 3
    while (y < h - 3) {
      var x = 3
      while (x < w - 3) {
        val c = z(y * w + x).toLong
        var i = 0
        while (i < 16) {
          val v = z((y + FastDy(i)) * w + (x + FastDx(i))).toLong
          bright(i) = v >= c + t
          dark(i) = v <= c - t
          i += 1
        }
        n += 1
        if (maxCircularRun(bright) >= 9 || maxCircularRun(dark) >= 9) {
          nc += 1; chk += x + 131L * y
        }
        x += 1
      }
      y += 1
    }
    (n, nc, chk)
  })

  /** Bilinear Bayer demosaic (RGGB CFA), stated ×4 so every bilinear
    * average is integer: R sites at (even x, even y), B at (odd,
    * odd), G where x+y is odd. Per interior pixel the missing
    * channels come from the 2- or 4-sample neighbor means of the
    * matching color class — R4/G4/B4 are the reconstructed planes
    * ×4. Per image: (n_int, ΣR4, ΣG4, ΣB4, Σ(R4+2·G4+3·B4)·
    * (x+131·y)). Decode-once map work. */
  val demosaicAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    def p(x: Int, y: Int): Long = z(y * w + x).toLong
    var n = 0L; var rs = 0L; var gs = 0L; var bs = 0L; var chk = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val c4 = 4 * p(x, y)
        val horiz = p(x - 1, y) + p(x + 1, y)
        val vert = p(x, y - 1) + p(x, y + 1)
        val diag = p(x - 1, y - 1) + p(x + 1, y - 1) +
          p(x - 1, y + 1) + p(x + 1, y + 1)
        val orth = horiz + vert
        val ex = x % 2 == 0; val ey = y % 2 == 0
        val r4 =
          if (ex && ey) c4
          else if (!ex && ey) 2 * horiz
          else if (ex) 2 * vert
          else diag
        val b4 =
          if (!ex && !ey) c4
          else if (ex && !ey) 2 * horiz
          else if (!ex) 2 * vert
          else diag
        val g4 = if ((x + y) % 2 == 1) c4 else orth
        n += 1; rs += r4; gs += g4; bs += b4
        chk += (r4 + 2 * g4 + 3 * b4) * (x + 131L * y)
        x += 1
      }
      y += 1
    }
    (n, rs, gs, bs, chk)
  })

  /** Per-scanline run-length encoding of a binary mask: runs of
    * consecutive foreground cells along each row. Returns (n_runs,
    * max_run, Σ len², Σ len·(x_start + 131·y)) — the RLE compression
    * statistics plus a placement checksum. O(w·h) single pass. */
  def rleRuns(mask: Array[Boolean], w: Int, h: Int): (Long, Long, Long, Long) = {
    var nRuns = 0L; var maxRun = 0L; var sq = 0L; var chk = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (mask(y * w + x)) {
          val x0 = x
          while (x < w && mask(y * w + x)) x += 1
          val len = (x - x0).toLong
          nRuns += 1; if (len > maxRun) maxRun = len
          sq += len * len; chk += len * (x0 + 131L * y)
        } else x += 1
      }
      y += 1
    }
    (nRuns, maxRun, sq, chk)
  }

  /** Hole filling by border flood (morphological reconstruction of
    * the background from the frame, Soille ch. 6): background cells
    * 4-connected to the image border stay background; every other
    * background cell is a hole. Returns (n_hole_px, n_bg_open,
    * Σ (x+131·y) over hole cells). O(w·h) BFS — decode-once map
    * work; the oracle replays reachability as a recursive CTE. */
  def fillHoles(mask: Array[Boolean], w: Int, h: Int): (Long, Long, Long) = {
    val open = new Array[Boolean](w * h)
    val queue = new java.util.ArrayDeque[Int]()
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      if (!mask(i) && (x == 0 || y == 0 || x == w - 1 || y == h - 1)) {
        open(i) = true; queue.add(i)
      }
      i += 1
    }
    while (!queue.isEmpty) {
      val c = queue.poll()
      val cx = c % w; val cy = c / w
      var d = 0
      while (d < 4) {
        val nx = cx + (if (d == 0) 1 else if (d == 1) -1 else 0)
        val ny = cy + (if (d == 2) 1 else if (d == 3) -1 else 0)
        if (nx >= 0 && nx < w && ny >= 0 && ny < h) {
          val j = ny * w + nx
          if (!mask(j) && !open(j)) { open(j) = true; queue.add(j) }
        }
        d += 1
      }
    }
    var nHole = 0L; var nOpen = 0L; var chk = 0L
    i = 0
    while (i < w * h) {
      if (!mask(i)) {
        if (open(i)) nOpen += 1
        else { nHole += 1; chk += (i % w) + 131L * (i / w) }
      }
      i += 1
    }
    (nHole, nOpen, chk)
  }

  /** Region-quadtree leaf count (Samet 1984) of a binary mask padded
    * to size×size (pad cells = background): a node at level L covers
    * a 2^L-cell square; a LEAF is a uniform node whose parent is not
    * uniform (the root is a leaf if uniform). Bottom-up uniformity
    * merge — O(size²) total. Returns (n_leaves, n_fg_leaves,
    * Σ (L+1)·(cx + 131·cy + 7) over leaves). */
  def quadtreeLeaves(mask: Array[Boolean], w: Int, h: Int,
                     size: Int): (Long, Long, Long) = {
    val levels = java.lang.Integer.numberOfTrailingZeros(size)
    // state per node: 0 = uniform bg, 1 = uniform fg, 2 = mixed
    var cur = Array.tabulate(size * size) { i =>
      val x = i % size; val y = i / size
      if (x < w && y < h && mask(y * w + x)) 1 else 0
    }
    var nLeaves = 0L; var nFg = 0L; var chk = 0L
    var l = 0
    var n = size
    while (l < levels) {
      val half = n / 2
      val next = new Array[Int](half * half)
      var cy = 0
      while (cy < half) {
        var cx = 0
        while (cx < half) {
          val a = cur(2 * cy * n + 2 * cx)
          val b = cur(2 * cy * n + 2 * cx + 1)
          val c = cur((2 * cy + 1) * n + 2 * cx)
          val d = cur((2 * cy + 1) * n + 2 * cx + 1)
          val merged =
            if (a == b && b == c && c == d && a != 2) a else 2
          next(cy * half + cx) = merged
          // children that are uniform under a mixed parent are leaves
          if (merged == 2) {
            var ci = 0
            val vals = Array(a, b, c, d)
            val xs = Array(2 * cx, 2 * cx + 1, 2 * cx, 2 * cx + 1)
            val ys = Array(2 * cy, 2 * cy, 2 * cy + 1, 2 * cy + 1)
            while (ci < 4) {
              if (vals(ci) != 2) {
                nLeaves += 1
                if (vals(ci) == 1) nFg += 1
                chk += (l + 1L) * (xs(ci) + 131L * ys(ci) + 7)
              }
              ci += 1
            }
          }
          cx += 1
        }
        cy += 1
      }
      cur = next; n = half; l += 1
    }
    if (cur(0) != 2) { // uniform root
      nLeaves += 1
      if (cur(0) == 1) nFg += 1
      chk += (levels + 1L) * 7
    }
    (nLeaves, nFg, chk)
  }

  /** Octant of (a,b) with boundaries on the 45° lines: octant k covers
    * angle [k·45°, (k+1)·45°); (0,0) → 8 (flat). Stated as the exact
    * sign/comparison ladder both engines replay verbatim. */
  def octant(a: Long, b: Long): Int =
    if (a == 0 && b == 0) 8
    else if (a > 0 && b >= 0 && b < a) 0
    else if (a > 0 && b >= a) 1
    else if (b > 0 && a <= 0 && b > -a) 2
    else if (a < 0 && b > 0 && b <= -a) 3
    else if (a < 0 && b <= 0 && b > a) 4
    else if (a < 0 && b <= a) 5
    else if (b < 0 && a >= 0 && a < -b) 6
    else 7

  /** Hough line transform at the four exact angles θ ∈ {0°, 45°, 90°,
    * 135°}: edge pixels (morphological gradient ≥ 300 — the quadratic-
    * mod DEM's wrap discontinuities form curves) vote for
    * bin = floor(ρ/8) with ρ = x, (x+y)·√2/2, y, (y−x)·√2/2
    * respectively (√2/2 is one correctly-rounded literal; the multiply
    * is the only further rounding — /8 is exact). Returns the winning
    * bin per θ (max votes, ties → lowest bin) as (θ, bin, votes) rows;
    * a θ with zero edge pixels emits no row. */
  val houghAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val s22 = math.sqrt(2.0) / 2
    // (theta, bin) -> votes
    val acc = scala.collection.mutable.HashMap[(Int, Long), Long]()
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        var mn = Long.MaxValue; var mx = Long.MinValue
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = z((y + dy) * w + (x + dx)).toLong
            if (v < mn) mn = v
            if (v > mx) mx = v
            dx += 1
          }
          dy += 1
        }
        if (mx - mn >= 300) {
          val bins = Array(
            math.floor(x / 8.0).toLong,
            math.floor((x + y) * s22 / 8.0).toLong,
            math.floor(y / 8.0).toLong,
            math.floor((y - x) * s22 / 8.0).toLong)
          var th = 0
          while (th < 4) {
            val k = (th, bins(th))
            acc(k) = acc.getOrElse(k, 0L) + 1L
            th += 1
          }
        }
        x += 1
      }
      y += 1
    }
    (0 until 4).flatMap { th =>
      val cands = acc.collect { case ((t, b), c) if t == th => (b, c) }
      if (cands.isEmpty) None
      else {
        val (b, c) = cands.minBy { case (b, c) => (-c, b) }
        Some((th.toLong, b, c))
      }
    }
  })

  /** TWO-LEVEL LAPLACIAN PYRAMID (Burt & Adelson 1983) stated in
    * exact integers: G1 = floor-mean of each full 2×2 block of G0,
    * L0 = G0 − nearest-upsampled G1 on the block-covered region
    * (odd trailing row/column has no parent and is excluded — the
    * standard truncation); G2/L1 repeat one level down. Reconstruction
    * G0 = L0 + up(G1) is exact by construction; the gate checks the
    * DECOMPOSITION: per-image (n_l0, Σ|L0|, max|L0|, Σ|L1|, ΣG2) —
    * the subband energy split a pyramid codec would entropy-code.
    * Per-image sequential kernel, corpus-parallel. */
  val lapPyramidAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    def down(g: Array[Long], gw: Int, gh: Int): (Array[Long], Int, Int) = {
      val dw = gw / 2; val dh = gh / 2
      val out = new Array[Long](dw * dh)
      var v = 0
      while (v < dh) {
        var u = 0
        while (u < dw) {
          out(v * dw + u) = (g(2 * v * gw + 2 * u) +
            g(2 * v * gw + 2 * u + 1) + g((2 * v + 1) * gw + 2 * u) +
            g((2 * v + 1) * gw + 2 * u + 1)) / 4
          u += 1
        }
        v += 1
      }
      (out, dw, dh)
    }
    def lapStats(g: Array[Long], gw: Int, gh: Int, d: Array[Long],
                 dw: Int, dh: Int): (Long, Long, Long) = {
      var n = 0L; var s = 0L; var m = 0L
      var y = 0
      while (y < 2 * dh) {
        var x = 0
        while (x < 2 * dw) {
          val l = g(y * gw + x) - d((y / 2) * dw + (x / 2))
          n += 1; s += math.abs(l)
          if (math.abs(l) > m) m = math.abs(l)
          x += 1
        }
        y += 1
      }
      (n, s, m)
    }
    val g0 = z.map(_.toLong)
    val (g1, w1, h1) = down(g0, w, h)
    val (g2, w2, h2) = down(g1, w1, h1)
    val (n0, s0, m0) = lapStats(g0, w, h, g1, w1, h1)
    val (_, s1, _) = lapStats(g1, w1, h1, g2, w2, h2)
    (n0, s0, m0, s1, g2.sum)
  })

  /** Two-level 2D Haar (integer S-transform) subband decomposition:
    * each 2×2 block (a b / c d) yields LL = ⌊(a+b+c+d)/4⌋ and the
    * UNNORMALIZED oriented details HL = (a+c)−(b+d) (vertical-edge
    * energy), LH = (a+b)−(c+d) (horizontal-edge), HH = a−b−c+d
    * (diagonal); level 2 repeats on the LL plane. Odd trailing
    * row/column is dropped (as the Laplacian pyramid reduce does).
    * Unlike [[lapPyramidAgg]]'s isotropic residual, this splits detail
    * energy by ORIENTATION — the JPEG2000-style texture descriptor.
    * Returns (n_ll2, h1, v1, d1, h2, v2, d2, ll2_sum): per-level
    * absolute subband sums over exact integers.
    *
    * Scale posture: one decode per image, per-image O(w·h) kernel, no
    * shuffle beyond the image-key aggregate that consumes it. */
  val haarAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    haarStats(z.map(_.toLong), w, h)
  })

  /** Edge-preserving ε-filter (threshold bilateral with box spatial
    * support — Harashima et al.'s ε-separating nonlinear filter): each
    * output pixel is ⌊mean of the in-bounds 3×3 neighbors whose value
    * differs from the center by ≤ t⌋; the center always participates,
    * so the count is ≥ 1. Smooths sensor noise WITHOUT blurring edges
    * (a neighbor across an edge exceeds t and is excluded) — the
    * integer-exact counterpart of a bilateral filter with a hard range
    * kernel. Returns (n_px, Σout, #changed, max |out−z|). One decode,
    * per-image O(9·w·h), no shuffle beyond the image-key aggregate. */
  val epsilonFilterAgg = udf((bytes: Array[Byte], w: Int, h: Int,
                              t: Long) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    var outSum = 0L; var changed = 0L; var dev = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = z(y * w + x).toLong
        var s = 0L; var n = 0L
        var dy = -1
        while (dy <= 1) {
          val ny = y + dy
          if (ny >= 0 && ny < h) {
            var dx = -1
            while (dx <= 1) {
              val nx = x + dx
              if (nx >= 0 && nx < w) {
                val v = z(ny * w + nx).toLong
                if (math.abs(v - c) <= t) { s += v; n += 1 }
              }
              dx += 1
            }
          }
          dy += 1
        }
        val o = s / n // z ≥ 0 on the DEM fixture, so / is floor
        outSum += o
        if (o != c) changed += 1
        if (math.abs(o - c) > dev) dev = math.abs(o - c)
        x += 1
      }
      y += 1
    }
    (w.toLong * h, outSum, changed, dev)
  })

  /** Pure two-level Haar kernel (see [[haarAgg]]). */
  def haarStats(g0: Array[Long], w: Int, h: Int)
  : (Long, Long, Long, Long, Long, Long, Long, Long) = {
    def level(g: Array[Long], gw: Int, gh: Int)
    : (Array[Long], Int, Int, Long, Long, Long) = {
      val dw = gw / 2; val dh = gh / 2
      val ll = new Array[Long](dw * dh)
      var sh = 0L; var sv = 0L; var sd = 0L
      var v = 0
      while (v < dh) {
        var u = 0
        while (u < dw) {
          val a = g(2 * v * gw + 2 * u)
          val b = g(2 * v * gw + 2 * u + 1)
          val c = g((2 * v + 1) * gw + 2 * u)
          val d = g((2 * v + 1) * gw + 2 * u + 1)
          ll(v * dw + u) = (a + b + c + d) / 4
          sh += math.abs((a + c) - (b + d))
          sv += math.abs((a + b) - (c + d))
          sd += math.abs(a - b - c + d)
          u += 1
        }
        v += 1
      }
      (ll, dw, dh, sh, sv, sd)
    }
    val (g1, w1, h1, sh1, sv1, sd1) = level(g0, w, h)
    val (g2, _, _, sh2, sv2, sd2) = level(g1, w1, h1)
    (g2.length.toLong, sh1, sv1, sd1, sh2, sv2, sd2, g2.sum)
  }

  /** Blur / focus measure — variance of the discrete Laplacian
    * (Pech-Pacheco et al. ICPR 2000, the standard sharpness gate of
    * image-curation pipelines): over interior pixels, L = 4z −
    * z_left − z_right − z_up − z_down; the score is the EXACT scaled
    * variance n·ΣL² − (ΣL)² (no division), and the keep decision is
    * score > τ·n² (τ in L² units). Returns (n, lap_sum, lap_sq_sum,
    * score, sharp). One decode per image, O(n_px) ints. */
  val blurScoreAgg = udf((bytes: Array[Byte], w: Int, h: Int,
                          tau: Long) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    var n = 0L; var s = 0L; var s2 = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val l = 4L * z(y * w + x).toLong - z(y * w + x - 1).toLong -
          z(y * w + x + 1).toLong - z((y - 1) * w + x).toLong -
          z((y + 1) * w + x).toLong
        n += 1; s += l; s2 += l * l
        x += 1
      }
      y += 1
    }
    val score = n * s2 - s * s
    (n, s, s2, score, if (score > tau * n * n) 1L else 0L)
  })

  /** BT.601 luma/chroma statistics (ITU-R BT.601-7 §2.5.1 matrix —
    * the public SD colorimetry standard): per valid pixel, with the
    * sensor's (blue, green, red) = bands (0, 1, 2),
    *   Y1000  = 299·R + 587·G + 114·B        (luma ×1000, exact ints)
    *   Cb564k = 564·(1000·B − Y1000)          (B−Y chroma ×564000)
    *   Cr713k = 713·(1000·R − Y1000)          (R−Y chroma ×713000).
    * Returns (n, ΣY1000, min Y1000, max Y1000, ΣCb564k, ΣCr713k) —
    * the grayscale-conversion + chroma-screening constants of an
    * image-curation pipeline (|ΣCb|+|ΣCr| ≈ 0 flags grayscale scans;
    * ΣY/n is the brightness gate). One decode, O(n_px) integer ops,
    * no cross-image shuffle. Skips any pixel with a NaN channel. */
  val lumaChromaAgg = udf((bytes: Array[Byte], w: Int, h: Int,
                           fmt: String, nb: Int) => {
    val pl = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)
    val pb = pl(0); val pg = pl(1); val pr = pl(2)
    var n = 0L; var ys = 0L; var cb = 0L; var cr = 0L
    var ymin = Long.MaxValue; var ymax = Long.MinValue
    var i = 0
    while (i < w * h) {
      val b = pb(i); val g = pg(i); val r = pr(i)
      if (!java.lang.Double.isNaN(b) && !java.lang.Double.isNaN(g) &&
          !java.lang.Double.isNaN(r)) {
        val bl = math.floor(b).toLong; val gl = math.floor(g).toLong
        val rl = math.floor(r).toLong
        val y1000 = 299L * rl + 587L * gl + 114L * bl
        n += 1; ys += y1000
        if (y1000 < ymin) ymin = y1000
        if (y1000 > ymax) ymax = y1000
        cb += 564L * (1000L * bl - y1000)
        cr += 713L * (1000L * rl - y1000)
      }
      i += 1
    }
    if (n == 0L) (0L, 0L, 0L, 0L, 0L, 0L)
    else (n, ys, ymin, ymax, cb, cr)
  })

  /** HSV hue-SECTOR histogram + chroma mass — the dominant-color /
    * colorfulness screen of an image-curation pipeline, stated
    * DIVISION-FREE: the six 60° hue sectors of the standard RGB→HSV
    * hexagon (Smith 1978) are decided purely by which channel is the
    * max and the SIGN of the other two's difference (h′ = (G−B)/C ∈
    * [−1,1) when R is max ⇒ sector 0 iff G ≥ B else 5; h′ = 2+(B−R)/C
    * when G is max ⇒ sector 1 iff B < R else 2; h′ = 4+(R−G)/C when B
    * is max ⇒ sector 3 iff R < G else 4) — no float hue ever
    * computed. Chroma = max−min is exact. Argmax ties break R, G, B
    * (the CASE order); chroma = 0 ⇒ the achromatic bucket 6. With
    * (blue, green, red) = bands (0, 1, 2), returns one row per
    * occupied sector: (sector, n_px, chroma_sum). One decode,
    * integer-exact, ≤7 rows out per image. */
  val hueHistAgg = udf((bytes: Array[Byte], w: Int, h: Int,
                        fmt: String, nb: Int) => {
    val pl = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)
    val pb = pl(0); val pg = pl(1); val pr = pl(2)
    val n = new Array[Long](7); val cs = new Array[Long](7)
    var i = 0
    while (i < w * h) {
      val b = pb(i); val g = pg(i); val r = pr(i)
      if (!java.lang.Double.isNaN(b) && !java.lang.Double.isNaN(g) &&
          !java.lang.Double.isNaN(r)) {
        val bl = math.floor(b).toLong; val gl = math.floor(g).toLong
        val rl = math.floor(r).toLong
        val mx = math.max(rl, math.max(gl, bl))
        val mn = math.min(rl, math.min(gl, bl))
        val c = mx - mn
        val sec =
          if (c == 0L) 6
          else if (mx == rl) { if (gl >= bl) 0 else 5 }
          else if (mx == gl) { if (bl < rl) 1 else 2 }
          else { if (rl < gl) 3 else 4 }
        n(sec) += 1; cs(sec) += c
      }
      i += 1
    }
    (0 until 7).filter(n(_) > 0L).map(s => (s.toLong, n(s), cs(s)))
  })

  /** Bayer 4×4 index matrix (Bayer 1973, the public ordered-dither
    * pattern), row-major: M(x,y) = BayerM((y%4)·4 + x%4) ∈ [0,16). */
  val BayerM: Array[Int] =
    Array(0, 8, 2, 10, 12, 4, 14, 6, 3, 11, 1, 9, 15, 7, 13, 5)

  /** Ordered (Bayer 4×4) dithering — the classic halftone / 1-bit
    * quantization kernel. Pixel (x,y) lights iff v > 64·(2·M+1)
    * (thresholds 64, 192, …, 1984 — 16 levels spanning the synth
    * value range [200, ~1900]); the fixed threshold lattice trades
    * quantization error for spatial dispersion exactly as in the
    * published matrix. Returns (n_valid, n_on, Σ(x + w·y) over lit
    * pixels) — count plus a positional checksum that pins every lit
    * coordinate. One decode, integer-exact. */
  val ditherAgg = udf((bytes: Array[Byte], w: Int, h: Int,
                       fmt: String, nb: Int) => {
    val p = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)(0)
    var n = 0L; var on = 0L; var cs = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = p(y * w + x)
        if (!java.lang.Double.isNaN(v)) {
          n += 1
          val t = 64L * (2L * BayerM((y % 4) * 4 + (x % 4)) + 1L)
          if (math.floor(v).toLong > t) { on += 1; cs += x + w.toLong * y }
        }
        x += 1
      }
      y += 1
    }
    (n, on, cs)
  })

  /** Lee SIGMA filter (Lee 1983, the classic SAR speckle denoiser):
    * each interior pixel is replaced by the floor-mean of the 3×3
    * neighbors whose value lies within ±`tau` of the center (the
    * center always qualifies, so the divisor is ≥ 1) — edges survive
    * because dissimilar neighbors are excluded from the average.
    * All-integer. Per image: (n_int, Σ out, n_smoothed where out ≠ z,
    * Σ out·(x+131·y)). */
  val leeSigmaAgg = udf((bytes: Array[Byte], w: Int, h: Int, tau: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    var n = 0L; var os = 0L; var nc = 0L; var chk = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val c = z(y * w + x).toLong
        var s = 0L; var m = 0L
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val v = z((y + dy) * w + (x + dx)).toLong
            if (math.abs(v - c) <= tau) { s += v; m += 1 }
            dx += 1
          }
          dy += 1
        }
        val out = Math.floorDiv(s, m)
        n += 1; os += out; chk += out * (x + 131L * y)
        if (out != c) nc += 1
        x += 1
      }
      y += 1
    }
    (n, os, nc, chk)
  })

  /** SSIM (Wang et al. 2004) between the raster and its own 3×3
    * floor-box-mean — the no-reference sharpness/structure index a
    * curation gate thresholds on — over NON-overlapping 8×8 blocks of
    * the interior, stated as ONE exact scaled integer per block: with
    * block sums sa, sb, saa, sbb, sab over n = 64 pixels,
    *
    *   num = (2·sa·sb + C1·n²) · (2·(n·sab − sa·sb) + C2·n²)
    *   den = (sa² + sb² + C1·n²) · ((n·saa − sa²) + (n·sbb − sb²) + C2·n²)
    *   ssim_scaled = floor(num·10⁶ / den)
    *
    * (the n²-scaled SSIM with C1 = (0.01·L)², C2 = (0.03·L)², L = 2048
    * — constants keep den > 0 on flat blocks). num·10⁶ passes 2⁶³, so
    * the one wide step runs in BigInt here and HUGEINT in the oracle.
    * Partial edge blocks (n < 64) are dropped. Per image:
    * (n_blocks, Σ ssim_scaled, min ssim_scaled, Σ ssim·(bx+31·by)). */
  val ssimAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val c1 = 419L // round((0.01·2048)²)
    val c2 = 3775L // round((0.03·2048)²)
    // accumulate per 8×8 block of the interior: key (bx, by)
    val acc = scala.collection.mutable.HashMap[(Int, Int),
      (Long, Long, Long, Long, Long, Long)]()
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val a = z(y * w + x).toLong
        var s = 0L
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) { s += z((y + dy) * w + (x + dx)).toLong; dx += 1 }
          dy += 1
        }
        val b = Math.floorDiv(s, 9L)
        val key = ((x - 1) / 8, (y - 1) / 8)
        val (n0, sa, sb, saa, sbb, sab) =
          acc.getOrElse(key, (0L, 0L, 0L, 0L, 0L, 0L))
        acc(key) = (n0 + 1, sa + a, sb + b, saa + a * a, sbb + b * b,
          sab + a * b)
        x += 1
      }
      y += 1
    }
    var nb = 0L; var ss = 0L; var mn = Long.MaxValue; var chk = 0L
    acc.foreach { case ((bx, by), (n, sa, sb, saa, sbb, sab)) =>
      if (n == 64L) {
        val n2 = n * n
        val num = (BigInt(2) * sa * sb + BigInt(c1) * n2) *
          (BigInt(2) * (n * sab - sa * sb) + BigInt(c2) * n2)
        // den > 0 always: n·saa − sa² ≥ 0 (Cauchy–Schwarz) and the
        // C-terms are positive; num CAN be negative, so divide with
        // FLOOR semantics (BigInt / truncates toward zero; DuckDB //
        // floors) — adjust when signs differ and a remainder exists
        val den = (BigInt(sa) * sa + BigInt(sb) * sb + BigInt(c1) * n2) *
          (BigInt(n * saa - sa * sa) + (n * sbb - sb * sb) +
            BigInt(c2) * n2)
        val p = num * 1000000L
        val q0 = p / den
        val v = (if (p.signum < 0 && p % den != 0) q0 - 1 else q0).toLong
        nb += 1; ss += v; chk += v * (bx + 31L * by)
        if (v < mn) mn = v
      }
    }
    (nb, ss, if (nb == 0) 0L else mn, chk)
  })

  /** STRUCTURE-TENSOR coherence (Weickert 1998's anisotropy measure,
    * the edge-vs-texture discriminator): per 8×8 interior block, the
    * tensor sums a = Σgx², b = Σgy², c = Σgx·gy over central-
    * difference gradients give the eigenvalue anisotropy
    *
    *   coherence = ((λ₊−λ₋)/(λ₊+λ₋))² = ((a−b)² + 4c²) / (a+b)²
    *
    * stated as ONE exact scaled integer per block (numerator ≤ 5·10¹⁸
    * fits a Long; the ·10⁶ step runs in BigInt here and HUGEINT in
    * the oracle; flat blocks a+b = 0 score 0). 1 = single dominant
    * orientation (edge), 0 = isotropic texture/flat. Partial edge
    * blocks dropped. Per image: (n_blocks, Σ coh, max coh,
    * Σ coh·(bx+31·by)). */
  val coherenceAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val acc = scala.collection.mutable.HashMap[(Int, Int),
      (Long, Long, Long, Long)]()
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val gx = z(y * w + x + 1).toLong - z(y * w + x - 1).toLong
        val gy = z((y + 1) * w + x).toLong - z((y - 1) * w + x).toLong
        val key = ((x - 1) / 8, (y - 1) / 8)
        val (n, a, b, c) = acc.getOrElse(key, (0L, 0L, 0L, 0L))
        acc(key) = (n + 1, a + gx * gx, b + gy * gy, c + gx * gy)
        x += 1
      }
      y += 1
    }
    var nb = 0L; var cs = 0L; var mx = 0L; var chk = 0L
    acc.foreach { case ((bx, by), (n, a, b, c)) =>
      if (n == 64L) {
        val den = (a + b) * (a + b)
        val v =
          if (den == 0L) 0L
          else {
            val num = (a - b) * (a - b) + 4L * c * c
            (BigInt(num) * 1000000L / den).toLong
          }
        nb += 1; cs += v; chk += v * (bx + 31L * by)
        if (v > mx) mx = v
      }
    }
    (nb, cs, mx, chk)
  })

  /** HOG-style orientation histogram (Dalal & Triggs 2005, the
    * division-free integer core): interior pixels take central-
    * difference gradients gx, gy; orientation = [[octant]](gx, gy)
    * (sign/compare ladder only — no atan), magnitude = |gx| + |gy|
    * (L1 — no sqrt). Per (image, octant 0..7): pixel count and Σ
    * magnitude; flat pixels (gx = gy = 0 → octant 8) are skipped.
    * ≤ 8 rows per image, one decode. */
  val hogAgg = udf((bytes: Array[Byte], w: Int, h: Int) => {
    val z = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    val cnt = new Array[Long](8)
    val mag = new Array[Long](8)
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val gx = z(y * w + x + 1).toLong - z(y * w + x - 1).toLong
        val gy = z((y + 1) * w + x).toLong - z((y - 1) * w + x).toLong
        val o = octant(gx, gy)
        if (o < 8) {
          cnt(o) += 1
          mag(o) += math.abs(gx) + math.abs(gy)
        }
        x += 1
      }
      y += 1
    }
    (0 until 8).filter(cnt(_) > 0)
      .map(o => (o.toLong, cnt(o), mag(o)))
  })
}
