package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Codec, Pixels}
import graft.gen.Synth

class CodecPixelsSpec extends AnyFunSuite {

  private def ramp(w: Int, h: Int, base: Double, ax: Double, ay: Double,
                   nodataCols: Int = 0): Array[Double] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (x < nodataCols) Double.NaN else base + ax * x + ay * y
    }

  test("raw codecs round-trip exactly, nodata preserved") {
    val w = 33; val h = 21
    val p0 = ramp(w, h, 200, 3, 5, nodataCols = 2)
    val p1 = ramp(w, h, 700, 1, 0, nodataCols = 2)
    for (fmt <- Seq("raw-i16le", "raw-f32le")) {
      val bytes = Codec.encode(Array(p0, p1), w, h, fmt)
      val dec = Codec.decode(bytes, w, h, 2, fmt)
      assert(dec.length == 2)
      for (b <- 0 until 2; i <- 0 until w * h) {
        val e = if (b == 0) p0(i) else p1(i)
        if (e.isNaN) assert(dec(b)(i).isNaN)
        else assert(dec(b)(i) == e, s"fmt=$fmt b=$b i=$i")
      }
    }
    // u8: values 1..255 survive, nodata (NaN→0→NaN) round-trips
    val pu = Array.tabulate(w * h)(i => if (i % 7 == 0) Double.NaN else (1 + i % 255).toDouble)
    val bu = Codec.encode(Array(pu), w, h, "raw-u8")
    val du = Codec.decode(bu, w, h, 1, "raw-u8")
    for (i <- 0 until w * h)
      if (pu(i).isNaN) assert(du(0)(i).isNaN) else assert(du(0)(i) == pu(i))
  }

  test("new dtype lattice (u16/u32/i32/f64) round-trips, type ranges honored") {
    val w = 33; val h = 21
    val p0 = ramp(w, h, 200, 3, 5, nodataCols = 2)
    val p1 = ramp(w, h, 700, 1, 0, nodataCols = 2)
    for (fmt <- Seq("raw-u16le", "raw-u32le", "raw-i32le", "raw-f64le")) {
      val bytes = Codec.encode(Array(p0, p1), w, h, fmt)
      val dec = Codec.decode(bytes, w, h, 2, fmt)
      assert(dec.length == 2)
      for (b <- 0 until 2; i <- 0 until w * h) {
        val e = if (b == 0) p0(i) else p1(i)
        if (e.isNaN) assert(dec(b)(i).isNaN)
        else assert(dec(b)(i) == e, s"fmt=$fmt b=$b i=$i")
      }
    }
    // type-range extremes survive their own dtype exactly
    def rt1(fmt: String, v: Double): Double = {
      val p = Array.fill(4)(v)
      Codec.decode(Codec.encode(Array(p), 2, 2, fmt), 2, 2, 1, fmt)(0)(0)
    }
    assert(rt1("raw-u16le", 65534.0) == 65534.0) // 65535 is the sentinel
    assert(rt1("raw-u32le", 4000000000.0) == 4000000000.0) // > int32 range
    assert(rt1("raw-i32le", -2000000000.0) == -2000000000.0)
    assert(rt1("raw-i32le", 2000000000.0) == 2000000000.0)
    assert(rt1("raw-f64le", 0.123456789012345) == 0.123456789012345)
    // per-dtype nodata sentinels map back to NaN
    for (fmt <- Seq("raw-u16le", "raw-u32le", "raw-i32le", "raw-f64le"))
      assert(rt1(fmt, Double.NaN).isNaN, s"$fmt sentinel")
  }

  test("nodata sentinels are reserved values (encode∘decode ≠ id there)") {
    // the codec contract's one asymmetry (Codec.scala header): a
    // LEGITIMATE pixel equal to the dtype's sentinel encodes fine but
    // decodes to NaN — full-range exactness holds only off the
    // sentinel. Pin it so callers can't silently assume otherwise.
    def rt1(fmt: String, v: Double): Double = {
      val p = Array.fill(4)(v)
      Codec.decode(Codec.encode(Array(p), 2, 2, fmt), 2, 2, 1, fmt)(0)(0)
    }
    val sentinels = Seq(
      "raw-u8" -> Codec.NodataU8.toDouble,
      "raw-i16le" -> Codec.NodataI16.toDouble,
      "raw-f32le" -> Codec.NodataF32.toDouble,
      "raw-u16le" -> Codec.NodataU16.toDouble,
      "raw-u32le" -> Codec.NodataU32.toDouble,
      "raw-i32le" -> Codec.NodataI32.toDouble,
      "raw-f64le" -> Codec.NodataF64)
    for ((fmt, s) <- sentinels) {
      assert(rt1(fmt, s).isNaN, s"$fmt: sentinel $s must decode as nodata")
      // ...and the adjacent representable value survives exactly
      val near = fmt match {
        case "raw-u8"     => s + 1
        case "raw-u16le"  => s - 1
        case "raw-u32le"  => s - 1
        case "raw-i32le"  => s + 1
        case _            => s + 1 // i16/f32/f64: -32767 is representable
      }
      assert(rt1(fmt, near) == near, s"$fmt: $near must round-trip")
    }
  }

  test("resizeNearest: identity at same size; exact index map; NaN preserved") {
    import graft.ops.Bands
    val w = 7; val h = 5
    val p = Array.tabulate(w * h)(i =>
      if (i == 3) Double.NaN else (10 + i).toDouble)
    // identity
    val id = Bands.resizeNearest(p, w, h, w, h)
    for (i <- p.indices)
      if (p(i).isNaN) assert(id(i).isNaN) else assert(id(i) == p(i))
    // 2x downscale vs brute-force index map round((x+.5)*w/rw - .5)
    val (rw, rh) = (3, 2)
    val dn = Bands.resizeNearest(p, w, h, rw, rh)
    for (y <- 0 until rh; x <- 0 until rw) {
      val xi = math.round((x + 0.5) * w / rw - 0.5).toInt
      val yi = math.round((y + 0.5) * h / rh - 0.5).toInt
      val e = p(yi * w + xi)
      if (e.isNaN) assert(dn(y * rw + x).isNaN)
      else assert(dn(y * rw + x) == e, s"($x,$y) -> ($xi,$yi)")
    }
    // upscale repeats pixels, never invents values
    val up = Bands.resizeNearest(p, w, h, 14, 10)
    assert(up.filterNot(_.isNaN).toSet.subsetOf(p.filterNot(_.isNaN).toSet))
  }

  test("png/bmp lossless, jpg meets PSNR >= 40 dB invariant") {
    val w = 64; val h = 48
    val p = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (1 + (40 + 2 * x + 3 * y) % 255).toDouble   // smooth-ish, never 0
    }
    for (fmt <- Seq("png", "bmp")) {
      val dec = Codec.decode(Codec.encode(Array(p), w, h, fmt), w, h, 1, fmt)
      assert(dec(0).sameElements(p), s"$fmt not lossless")
    }
    val dj = Codec.decode(Codec.encode(Array(p), w, h, "jpg"), w, h, 1, "jpg")
    val psnr = Codec.psnr(p, dj(0))
    assert(psnr >= 40.0, s"jpg PSNR=$psnr < 40 dB")
  }

  test("synthesized image payloads decode to the formula values (all fmts)") {
    for (k <- 0L to 23L) {
      val fmt = Synth.fmtOf(k)
      val w = Synth.wOf(k); val h = Synth.hOf(k)
      val bytes = Synth.encodeImage(k)
      val nb = Codec.bandsStored(fmt, Synth.NumBands)
      val dec = Codec.decode(bytes, w, h, nb, fmt)
      if (fmt != "jpg") {
        for (b <- 0 until nb; y <- 0 until h by 7; x <- 0 until w by 5) {
          val e = Synth.pixelValue(k, fmt, b, x, y)
          val g = dec(b)(y * w + x)
          if (e.isNaN) assert(g.isNaN, s"k=$k fmt=$fmt b=$b ($x,$y)")
          else assert(g == e, s"k=$k fmt=$fmt b=$b ($x,$y): $g != $e")
        }
      } else {
        val truth = Synth.planes(k)(0)
        assert(Codec.psnr(truth, dec(0)) >= 40.0, s"k=$k jpg PSNR")
      }
    }
  }

  test("aHash: deterministic, near-identical images hamming-close") {
    val w = 80; val h = 80
    val p = ramp(w, h, 10, 2, 1)
    val h1 = Codec.aHash(p, w, h)
    assert(h1 == Codec.aHash(p.clone(), w, h))
    val p2 = p.map(_ + 0.01) // tiny perturbation
    assert(Codec.hamming(h1, Codec.aHash(p2, w, h)) <= 2)
    val p3 = p.reverse // structurally different
    assert(Codec.hamming(h1, Codec.aHash(p3, w, h)) > 10)
  }

  test("dHash: brute-force reference, brightness-shift invariance, nodata") {
    // brute reference: float block means over the same 8x9 grid
    def brute(p: Array[Double], w: Int, h: Int): Long = {
      def cell(r: Int, c: Int): (Long, Long) = {
        var s = 0L; var n = 0L
        for (y <- r * h / 8 until (r + 1) * h / 8;
             x <- c * w / 9 until (c + 1) * w / 9
             if !p(y * w + x).isNaN) {
          s += math.floor(p(y * w + x)).toLong; n += 1
        }
        (s, n)
      }
      var hash = 0L
      for (r <- 0 until 8; c <- 0 until 8) {
        val (s1, n1) = cell(r, c); val (s2, n2) = cell(r, c + 1)
        if (s2 * n1 > s1 * n2) hash |= (1L << (63 - (r * 8 + c)))
      }
      hash
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val w = 16 + rnd.nextInt(60); val h = 16 + rnd.nextInt(60)
      val nw = rnd.nextInt(5)
      val p = Array.tabulate(w * h) { i =>
        if (i % w < nw) Double.NaN else rnd.nextInt(2000).toDouble
      }
      assert(Codec.dHash(p, w, h) == brute(p, w, h), s"trial $trial")
      // EXACT brightness-shift invariance (the property aHash on raw
      // thresholds lacks): v -> v + 137 flips no bit
      val shifted = p.map(v => if (v.isNaN) v else v + 137.0)
      assert(Codec.dHash(shifted, w, h) == Codec.dHash(p, w, h))
      // integer contrast scaling v -> 3v flips no bit either
      val scaled = p.map(v => if (v.isNaN) v else v * 3.0)
      assert(Codec.dHash(scaled, w, h) == Codec.dHash(p, w, h))
    }
    // gradient direction is the signature: an increasing ramp sets
    // every row's bits to 1s, a decreasing ramp to 0s
    val inc = Array.tabulate(18 * 16)(i => (i % 18).toDouble)
    assert(Codec.dHash(inc, 18, 16) == -1L) // all 64 bits set
    assert(Codec.dHash(inc.map(180.0 - _), 18, 16) == 0L)
  }

  test("chain ops with nodata restore (reference GeoRaster.h:517-524 rule)") {
    val p = Array(4.0, Double.NaN, 9.0, -1.0)
    // sqrt of negative → NaN → restored as nodata
    val r = Pixels.applyChain(p, Seq(Pixels.sqrt))
    assert(r(0) == 2.0 && r(1).isNaN && r(2) == 3.0 && r(3).isNaN)
    // comparison chain keeps nodata as nodata (not 0/1)
    val c = Pixels.applyChain(p, Seq(Pixels.gt(3.0)))
    assert(c(0) == 1.0 && c(1).isNaN && c(2) == 1.0 && c(3) == 0.0)
    // scale clamps
    val s = Pixels.applyChain(Array(0.0, 5.0, 10.0, 20.0),
      Seq(Pixels.scale(0, 10, 0, 1)))
    assert(s sameElements Array(0.0, 0.5, 1.0, 1.0))
  }

  test("gain/offset read-apply and write-inverse round trip") {
    val p = Array(100.0, Double.NaN, 250.0)
    val read = Pixels.applyGainOffset(p, 0.0001, -5.0)
    assert(read(0) == 100.0 * 0.0001 - 5.0 && read(1).isNaN)
    val back = Pixels.inverseGainOffset(read, 0.0001, -5.0)
    assert(math.abs(back(0) - 100.0) < 1e-9 && back(1).isNaN &&
      math.abs(back(2) - 250.0) < 1e-9)
  }

  test("stats/histogram/percentile parity with naive recompute") {
    val r = new scala.util.Random(11)
    val p = Array.fill(5000)(if (r.nextInt(10) == 0) Double.NaN else r.nextDouble() * 100)
    val valid = p.filter(!_.isNaN)
    val st = Pixels.stats(p)
    assert(st.count == valid.length)
    assert(math.abs(st.mean - valid.sum / valid.length) < 1e-9)
    assert(st.min == valid.min && st.max == valid.max)
    val naiveSd = math.sqrt(valid.map(v => v * v).sum / valid.length -
      math.pow(valid.sum / valid.length, 2))
    assert(math.abs(st.stddev - naiveSd) < 1e-9)
    val hist = Pixels.histogram(p, 10)
    assert(hist.sum == valid.length)
    // percentile: 100-bin interpolation (reference algorithm) is within
    // one bin-width of the exact quantile
    val sorted = valid.sorted
    val exact50 = sorted(valid.length / 2)
    val p50 = Pixels.percentile(p, 50)
    assert(math.abs(p50 - exact50) <= (st.max - st.min) / 100.0 + 1e-9)
  }

  test("convolve_nodata: reference semantics (convolve.h:43-76)") {
    val w = 5; val h = 5
    val p = Array.fill(w * h)(10.0)
    p(12) = Double.NaN // center pixel nodata
    val k = Array.fill(9)(1.0)
    val out = Pixels.convolveNodata(p, w, h, k, 3, 3)
    assert(out(12) == 10.0)  // nodata center FILLED from valid neighbors
    assert(out(0) == 10.0)   // border ring untouched (original value)
    assert(out(6) == 10.0)   // interior: total/norm over 8 valid = 10
    // all-nodata neighborhood → nodata
    val q = Array.fill(w * h)(Double.NaN)
    assert(Pixels.convolveNodata(q, w, h, k, 3, 3)(12).isNaN)
    // laplacian of constant field = 0 everywhere (replicate boundary)
    val lap = Pixels.laplacian(Array.fill(w * h)(3.0), w, h)
    assert(lap.forall(_ == 0.0))
  }

  test("dilate/erode morphological semantics") {
    val w = 5; val h = 1
    val p = Array(0.0, 0.0, 5.0, 0.0, Double.NaN)
    val d = Pixels.dilate(p, w, h, 3, 1)
    assert(d(0) == 0.0 && d(1) == 5.0 && d(2) == 5.0 && d(3) == 5.0 && d(4).isNaN)
    val e = Pixels.erode(p, w, h, 3, 1)
    assert(e(2) == 0.0 && e(4).isNaN)
  }

  test("spectral stats across bands, stddev nodata when n<2") {
    val b0 = Array(1.0, Double.NaN, 3.0)
    val b1 = Array(3.0, Double.NaN, Double.NaN)
    val (mean, sd, cnt) = Pixels.spectralStats(Array(b0, b1))
    assert(mean(0) == 2.0 && cnt(0) == 2.0 && sd(0) == 1.0)
    assert(mean(1).isNaN && cnt(1) == 0.0)
    assert(mean(2) == 3.0 && cnt(2) == 1.0 && sd(2).isNaN) // n<2 ⇒ nodata
  }

  test("autoscale: min/max and percentile-trim variants") {
    // ramp 0..999 plus two outliers and a nodata hole (the ramp spans
    // ~20 of the 100 histogram bins, so the percentile interpolation
    // is meaningful — it is a histogram estimate, not an exact quantile)
    val p = Array.tabulate(1002) { i =>
      if (i == 1000) 3000.0 else if (i == 1001) -2000.0 else i.toDouble
    }
    p(500) = Double.NaN
    // min/max variant maps [-2000, 3000] → [0, 1000]
    val a = graft.core.Pixels.autoscale(p, 0, 1000)
    assert(a(1000) == 1000.0 && a(1001) == 0.0)
    assert(math.abs(a(0) - 400.0) < 1e-9) // (0-(-2000))/5000*1000
    assert(a(500).isNaN) // nodata preserved through the chain
    // percentile trim (2%) cuts the outliers: the ramp then spans most
    // of the output range and the outliers clamp to the bounds
    val t = graft.core.Pixels.autoscale(p, 0, 1000, percent = 2)
    assert(t(1000) == 1000.0 && t(1001) == 0.0)
    assert(t(999) > 800, s"trimmed scale top ${t(999)}")
    assert(t(1) < 200, s"trimmed scale bottom ${t(1)}")
    // degenerate constant band → minout
    val c = graft.core.Pixels.autoscale(Array(5.0, 5.0, Double.NaN), 0, 1000)
    assert(c(0) == 0.0 && c(1) == 0.0 && c(2).isNaN)
  }

  test("skeletonize: Zhang-Suen thinning invariants") {
    val w = 20; val h = 20
    // thick horizontal bar rows 8..11, cols 2..17
    val bar = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (y >= 8 && y <= 11 && x >= 2 && x <= 17) 1.0 else 0.0
    }
    val sk = graft.core.Pixels.skeletonize(bar, w, h)
    // subset of the original mask
    for (i <- 0 until w * h if sk(i) == 1.0) assert(bar(i) == 1.0)
    // thinner than the input, but non-empty (a 1-px line survives)
    val n = sk.count(_ == 1.0)
    assert(n > 0 && n < bar.count(_ == 1.0))
    // no 2×2 all-on block (1-px-wide result)
    for (y <- 0 until h - 1; x <- 0 until w - 1) {
      val full = sk(y * w + x) == 1.0 && sk(y * w + x + 1) == 1.0 &&
        sk((y + 1) * w + x) == 1.0 && sk((y + 1) * w + x + 1) == 1.0
      assert(!full, s"2x2 block at $x,$y")
    }
    // idempotent: thinning a skeleton changes nothing
    assert(graft.core.Pixels.skeletonize(sk, w, h).toSeq == sk.toSeq)
    // nodata preserved
    val withNaN = bar.clone(); withNaN(0) = Double.NaN
    assert(graft.core.Pixels.skeletonize(withNaN, w, h)(0).isNaN)
  }

  test("augment: flip/rot90 involutions, exact remap, NaN travels") {
    import graft.ops.Augment._
    val w = 5; val h = 3
    // asymmetric plane with one nodata pixel
    val p = Array.tabulate(w * h)(i => (i * 7 % 13).toDouble)
    p(7) = Double.NaN // (x=2, y=1)
    // flipH is an involution; rot90 has order 4
    assert(flipH(flipH(p, w, h), w, h).toSeq.toString == p.toSeq.toString)
    val r4 = rot90(rot90(rot90(rot90(p, w, h), h, w), w, h), h, w)
    assert(r4.toSeq.toString == p.toSeq.toString)
    // exact remap: flip (x,y)→(w-1-x,y); rot90 (x,y)→(h-1-y,x)
    val f = flipH(p, w, h)
    val r = rot90(p, w, h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = p(y * w + x)
      val fv = f(y * w + (w - 1 - x))
      val rv = r(x * h + (h - 1 - y))
      assert((v.isNaN && fv.isNaN && rv.isNaN) || (v == fv && v == rv))
    }
    // positional checksum distinguishes layouts a value-sum cannot
    val q = p.clone(); q(7) = 999.0 // no NaN variant, asymmetric
    assert(posChecksum(flipH(q, w, h))._2 != posChecksum(q)._2)
    assert(posChecksum(q)._1 == (w * h).toLong)
  }

  test("augment crop: exact window, bounds enforced") {
    import graft.ops.Augment._
    val w = 7; val h = 5
    val p = Array.tabulate(w * h)(_.toDouble)
    val c = crop(p, w, h, 2, 1, 3, 2)
    assert(c.toSeq == Seq(9.0, 10.0, 11.0, 16.0, 17.0, 18.0))
    intercept[IllegalArgumentException] { crop(p, w, h, 5, 0, 3, 2) }
    intercept[IllegalArgumentException] { crop(p, w, h, -1, 0, 3, 2) }
  }

  test("patchify: full cover, ragged edges clipped, local weights") {
    import graft.ops.Augment._
    val w = 20; val h = 9 // 2x1 grid of 16-patches with ragged edges
    val p = Array.tabulate(w * h)(i => (i % 11).toDouble)
    val pat = patchify(p, w, h, 16)
    assert(pat.map(t => (t._1, t._2)).toSet ==
      Set((0, 0), (1, 0)), "grid is ceil(20/16) x ceil(9/16)")
    // every valid pixel counted exactly once across patches
    assert(pat.map(_._3).sum == w * h)
    // patch (0,0) checksum equals a direct crop+stride computation
    val direct = {
      var s = 0L
      for (y <- 0 until 9; x <- 0 until 16)
        s += math.floor(p(y * w + x) * 1e6).toLong * (y * 16 + x)
      s
    }
    assert(pat.find(t => t._1 == 0 && t._2 == 0).get._4 == direct)
  }

  test("addBand/renameBand enforce the reference's uniqueness rules") {
    intercept[IllegalArgumentException] {
      graft.ops.Bands.renameBand(null, "nir", "RED") // case-insensitive dup
    }
    intercept[IllegalArgumentException] {
      graft.ops.Bands.renameBand(null, "missing", "x")
    }
    intercept[IllegalArgumentException] {
      graft.ops.Bands.addBand(null, "SWIR1", _ => Array())
    }
  }
}
