package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Pixels

/** Hamilton-Jacobi (flux-ordered) skeleton invariants — the reference-
  * family algorithm next to the oracle-gated Zhang-Suen default. */
class SkeletonFluxSpec extends AnyFunSuite {

  private def mask(w: Int, h: Int)(fg: (Int, Int) => Boolean): Array[Double] =
    Array.tabulate(w * h)(i => if (fg(i % w, i / w)) 1.0 else 0.0)

  private def fgSet(p: Array[Double], w: Int): Set[(Int, Int)] =
    p.zipWithIndex.collect { case (v, i) if v == 1.0 => (i % w, i / w) }.toSet

  /** 8-connected component count (spec-side BFS). */
  private def comps(cells: Set[(Int, Int)]): Int = {
    var left = cells; var n = 0
    while (left.nonEmpty) {
      n += 1
      var frontier = Set(left.head)
      left -= left.head
      while (frontier.nonEmpty) {
        val nxt = for {
          (x, y) <- frontier
          dx <- -1 to 1; dy <- -1 to 1
          q = (x + dx, y + dy) if left(q)
        } yield q
        left --= nxt
        frontier = nxt
      }
    }
    n
  }

  test("rectangle: skeleton is a thin medial subset, topology preserved") {
    val (w, h) = (25, 13)
    val m = mask(w, h)((x, y) => x >= 2 && x <= 22 && y >= 2 && y <= 10)
    val sk = Pixels.skeletonizeFlux(m, w, h)
    val ms = fgSet(m, w); val ss = fgSet(sk, w)
    assert(ss.subsetOf(ms), "skeleton must be inside the mask")
    assert(ss.nonEmpty && ss.size < ms.size / 3, s"not thin: ${ss.size}/${ms.size}")
    assert(comps(ss) == comps(ms), "component count must be preserved")
    // medial-ness: a rectangle's medial axis is the central spine plus
    // 45° corner branches — assert every skeleton pixel keeps distance
    // ≥ 2 from the background (no boundary hugging), and the central
    // spine row survives through the middle
    def distToBg(px: Int, py: Int): Int =
      (for {x <- 0 until w; y <- 0 until h
            if !ms((x, y))} yield math.max(math.abs(x - px), math.abs(y - py))).min
    assert(ss.forall { case (x, y) => distToBg(x, y) >= 2 },
      s"boundary-hugging skeleton pixel in $ss")
    assert(ss.exists { case (x, y) => y == 6 && x >= 10 && x <= 14 })
    // no 2x2 block fully set (curve thinness)
    assert(!ss.exists { case (x, y) =>
      ss((x + 1, y)) && ss((x, y + 1)) && ss((x + 1, y + 1)) })
  }

  test("plus shape: all four arm tips survive as curve endpoints") {
    val (w, h) = (21, 21)
    val m = mask(w, h)((x, y) =>
      (math.abs(x - 10) <= 1 && y >= 2 && y <= 18) ||
      (math.abs(y - 10) <= 1 && x >= 2 && x <= 18))
    val sk = Pixels.skeletonizeFlux(m, w, h)
    val ss = fgSet(sk, w)
    assert(ss.subsetOf(fgSet(m, w)))
    assert(comps(ss) == 1)
    // the skeleton must still reach deep into each of the 4 arms
    assert(ss.exists { case (x, y) => x == 10 && y <= 4 }, "north arm lost")
    assert(ss.exists { case (x, y) => x == 10 && y >= 16 }, "south arm lost")
    assert(ss.exists { case (x, y) => y == 10 && x <= 4 }, "west arm lost")
    assert(ss.exists { case (x, y) => y == 10 && x >= 16 }, "east arm lost")
    // and keep the junction
    assert(ss((10, 10)))
  }

  test("two blobs stay two components; deterministic across runs") {
    val (w, h) = (30, 12)
    val m = mask(w, h)((x, y) =>
      (x >= 1 && x <= 10 && y >= 2 && y <= 9) ||
      (x >= 18 && x <= 28 && y >= 3 && y <= 8))
    val a = Pixels.skeletonizeFlux(m, w, h)
    val b = Pixels.skeletonizeFlux(m, w, h)
    assert(a.sameElements(b), "must be deterministic")
    assert(comps(fgSet(a, w)) == 2)
  }

  test("edt2: equals brute-force nearest background on random masks") {
    // brute force: min squared distance over every background cell,
    // where outside the image reduces to the 1-cell virtual ring
    // (clamping any outside cell to the ring never increases distance)
    def brute(fg: Array[Boolean], w: Int, h: Int): Array[Double] =
      Array.tabulate(w * h) { i =>
        if (!fg(i)) 0.0
        else {
          val x = i % w; val y = i / w
          var best = Long.MaxValue
          var by = -1
          while (by <= h) {
            var bx = -1
            while (bx <= w) {
              val inside = bx >= 0 && bx < w && by >= 0 && by < h
              if (!inside || !fg(by * w + bx)) {
                val d = (x - bx).toLong * (x - bx) + (y - by).toLong * (y - by)
                if (d < best) best = d
              }
              bx += 1
            }
            by += 1
          }
          best.toDouble
        }
      }
    val rnd = new scala.util.Random(20260818L)
    for (trial <- 0 until 6) {
      val w = 5 + rnd.nextInt(12); val h = 5 + rnd.nextInt(9)
      val density = 0.3 + 0.6 * rnd.nextDouble()
      val fg = Array.fill(w * h)(rnd.nextDouble() < density)
      val got = Pixels.edt2(fg, w, h)
      val want = brute(fg, w, h)
      assert(got.sameElements(want),
        s"trial $trial (${w}x$h): edt2 != brute force")
      // exact-integer representation claim
      assert(got.forall(v => v == math.rint(v)))
    }
    // all-foreground: closed form = squared min axial edge distance
    val (w, h) = (16, 11)
    val all = Pixels.edt2(Array.fill(w * h)(true), w, h)
    for (y <- 0 until h; x <- 0 until w) {
      val m = math.min(math.min(x + 1, w - x), math.min(y + 1, h - y))
      assert(all(y * w + x) == (m.toLong * m).toDouble)
    }
  }

  test("labelComponents: equals BFS labeling on random masks") {
    def bfs(fg: Array[Boolean], w: Int, h: Int): Array[Int] = {
      val lab = Array.fill(w * h)(-1)
      for (start <- 0 until w * h if fg(start) && lab(start) == -1) {
        // min-index canonical label: collect the whole component first
        var comp = List(start); lab(start) = -2
        var frontier = List(start)
        while (frontier.nonEmpty) {
          val nxt = for {
            p <- frontier
            dy <- -1 to 1; dx <- -1 to 1
            x = p % w + dx; y = p / w + dy
            if x >= 0 && x < w && y >= 0 && y < h
            q = y * w + x if fg(q) && lab(q) == -1
          } yield { lab(q) = -2; q }
          comp = comp ++ nxt
          frontier = nxt
        }
        val m = comp.min
        comp.foreach(p => lab(p) = m)
      }
      lab
    }
    val rnd = new scala.util.Random(424242L)
    for (trial <- 0 until 6) {
      val w = 6 + rnd.nextInt(12); val h = 5 + rnd.nextInt(10)
      val fg = Array.fill(w * h)(rnd.nextDouble() < 0.45)
      val got = Pixels.labelComponents(fg, w, h)
      val want = bfs(fg, w, h)
      assert(got.sameElements(want), s"trial $trial (${w}x$h)")
    }
    // deterministic degenerate cases
    assert(Pixels.labelComponents(Array.fill(6)(false), 3, 2)
      .forall(_ == -1))
    assert(Pixels.labelComponents(Array.fill(6)(true), 3, 2)
      .forall(_ == 0))
  }

  test("nodata preserved; empty mask fixpoint; isolated pixel survives") {
    val (w, h) = (8, 8)
    val m = Array.tabulate(w * h) { i =>
      if (i == 0) Double.NaN else if (i == 27) 1.0 else 0.0
    }
    val sk = Pixels.skeletonizeFlux(m, w, h)
    assert(sk(0).isNaN)
    assert(sk(27) == 1.0, "isolated pixel is its own skeleton")
    assert(sk.count(_ == 1.0) == 1)
  }
}
