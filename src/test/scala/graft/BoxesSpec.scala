package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Boxes

/** Invariant checks for the detection-box kernels on deterministic
  * LCG box sets: NMS keeps the argmax, the kept set is mutually
  * non-overlapping above τ, every suppressed box overlaps some
  * HIGHER-SCORED kept box, and exact-IoU boundary behavior. */
class BoxesSpec extends AnyFunSuite {

  private def lcg(seed: Long, n: Int, mod: Int): Array[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => (s >>> 33) % mod).take(n).toArray

  private def boxes(seed: Long, n: Int) = {
    val x1 = lcg(seed, n, 4096); val y1 = lcg(seed + 1, n, 4096)
    val bw = lcg(seed + 2, n, 2048).map(_ + 128)
    val bh = lcg(seed + 3, n, 2048).map(_ + 128)
    val sc = lcg(seed + 4, n, 4096)
    (0 until n).map(i => (i.toLong, x1(i), y1(i), x1(i) + bw(i),
      y1(i) + bh(i), sc(i))).toArray
  }

  test("nmsKeep: argmax kept; kept set pairwise IoU <= tau; " +
    "suppressed boxes overlap an earlier kept box") {
    val bs = boxes(7, 60).sortBy(b => (-b._6, b._1))
    val kept = Boxes.nmsKeep(bs, 1, 2)
    assert(kept.contains(0), "highest-scored box must survive")
    val ks = kept.toSet
    for (i <- kept; j <- kept if i < j)
      assert(!Boxes.iouExceeds(bs(i)._2, bs(i)._3, bs(i)._4, bs(i)._5,
        bs(j)._2, bs(j)._3, bs(j)._4, bs(j)._5, 1, 2),
        s"kept boxes $i,$j overlap above tau")
    for (i <- bs.indices if !ks.contains(i)) {
      assert(kept.exists(j => j < i &&
        Boxes.iouExceeds(bs(i)._2, bs(i)._3, bs(i)._4, bs(i)._5,
          bs(j)._2, bs(j)._3, bs(j)._4, bs(j)._5, 1, 2)),
        s"suppressed box $i has no earlier kept suppressor")
    }
    // non-trivial on dense random boxes
    assert(kept.length < bs.length && kept.length > 1)
  }

  test("iouExceeds: exact at the tau boundary (no float rounding)") {
    // two 2x1 boxes overlapping in a 1x1 cell: inter=1, union=3,
    // IoU=1/3 — strictly NOT > 1/3, but > 1/4
    assert(!Boxes.iouExceeds(0, 0, 2, 1, 1, 0, 3, 1, 1, 3))
    assert(Boxes.iouExceeds(0, 0, 2, 1, 1, 0, 3, 1, 1, 4))
    // identical boxes: IoU = 1 > anything below 1
    assert(Boxes.iouExceeds(5, 5, 9, 9, 5, 5, 9, 9, 99, 100))
    assert(!Boxes.iouExceeds(5, 5, 9, 9, 5, 5, 9, 9, 1, 1))
    // disjoint boxes never exceed
    assert(!Boxes.iouExceeds(0, 0, 1, 1, 5, 5, 6, 6, 0, 1))
  }

  test("qIou: quantization bounds and degenerate-union guard") {
    assert(Boxes.qIou(0, 0, 4, 4, 0, 0, 4, 4) == 1048576L)
    assert(Boxes.qIou(0, 0, 2, 1, 1, 0, 3, 1) == 1048576L / 3)
    assert(Boxes.qIou(0, 0, 1, 1, 5, 5, 6, 6) == 0L)
  }

  test("haarStats: constant image has zero detail energy; " +
    "vertical stripes put level-1 energy in H only") {
    import graft.ops.Vision.haarStats
    val w = 16; val h = 12
    val const = Array.fill(w * h)(700L)
    val (n2, h1, v1, d1, h2, v2, d2, ll2) = haarStats(const, w, h)
    assert(n2 == (w / 4) * (h / 4))
    assert(h1 == 0 && v1 == 0 && d1 == 0 && h2 == 0 && v2 == 0 && d2 == 0)
    assert(ll2 == 700L * n2)
    // 1-px vertical stripes 0/2: every 2x2 block (0 2 / 0 2) →
    // HL=|0+0-2-2|=4, LH=0, HH=0; level-2 LL is constant 1
    val stripes = Array.tabulate(w * h)(i => 2L * (i % w % 2))
    val (_, sh1, sv1, sd1, sh2, sv2, sd2, sll2) = haarStats(stripes, w, h)
    assert(sh1 == 4L * (w / 2) * (h / 2) && sv1 == 0 && sd1 == 0)
    assert(sh2 == 0 && sv2 == 0 && sd2 == 0 && sll2 == (w / 4) * (h / 4))
  }

  test("nmsKeep: tau=1 (IoU>1 impossible) keeps everything; " +
    "tau=0 keeps only mutually disjoint boxes") {
    val bs = boxes(13, 30).sortBy(b => (-b._6, b._1))
    assert(Boxes.nmsKeep(bs, 1, 1).length == bs.length)
    val kept0 = Boxes.nmsKeep(bs, 0, 1)
    for (i <- kept0; j <- kept0 if i < j)
      assert(Boxes.interArea(bs(i)._2, bs(i)._3, bs(i)._4, bs(i)._5,
        bs(j)._2, bs(j)._3, bs(j)._4, bs(j)._5) == 0L,
        "tau=0 kept boxes must be disjoint")
  }
}
