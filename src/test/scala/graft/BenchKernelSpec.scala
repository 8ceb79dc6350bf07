package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cache-tight Bench.decodeStatsKernel to its documented
  * contract: output == statsN.sum + percentileN(50) + popcount(aHash)
  * of the naively materialized pixel plane. */
class BenchKernelSpec extends AnyFunSuite {

  private def reference(k: Long): Double = {
    val w = 48 + (k % 64).toInt; val h = 48 + ((k * 7) % 64).toInt
    val n = w * h
    val p = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = i % w; val y = i / w
      p(i) = if (x < (k % 5)) Double.NaN
             else (200 + (k % 800) + (k % 8) * x + ((k + 17) % 8) * y).toDouble
      i += 1
    }
    // i16le round trip (nodata sentinel), as the kernel's codec leg does
    val dec = p.map { v =>
      val s = if (v.isNaN) Short.MinValue else v.toInt.toShort
      if (s == Short.MinValue) Double.NaN else s.toDouble
    }
    val st = graft.core.Pixels.statsN(dec, n)
    val med = graft.core.Pixels.percentileN(dec, n, 50)
    val ah = graft.core.Codec.aHash(dec, w, h)
    st.sum + med + java.lang.Long.bitCount(ah)
  }

  test("decodeStatsKernel matches the naive reference composition exactly") {
    // k*6+1 mirrors the bench's key pattern; plus small/edge keys
    val keys = (0L until 4000L).map(_ * 6 + 1) ++ Seq(0L, 2L, 3L, 4L, 5L, 63L, 64L, 4095L)
    keys.foreach { k =>
      val a = Bench.decodeStatsKernel(k)
      val b = reference(k)
      assert(a == b || (a.isNaN && b.isNaN), s"k=$k kernel=$a reference=$b")
    }
  }
}
