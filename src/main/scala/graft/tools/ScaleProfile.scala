package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench

/** Diagnostic harness for the N→4N scaling investigation (round 2).
  * Modes (arg0), all taking cpus=arg1, n=arg2:
  *   kernel — pure multithreaded loop over Bench.decodeStatsKernel,
  *            no Spark at all: isolates the pixel kernel's own thread
  *            scaling from the engine.
  *   meta   — joinTilePipeline decode=false (metadata join+tiling leg).
  *   full   — joinTilePipeline decode=true (the scaling-protocol job).
  * Prints RATE=<items/sec> (best of 3 after warmup). Run under
  * `taskset -c 0-(cpus-1)` for the faithful pinned-core protocol.
  */
object ScaleProfile {

  private val scratchD = ThreadLocal.withInitial[Array[Double]](() => new Array[Double](112 * 112))
  private val scratchB = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](112 * 112 * 2))
  private val scratchD2 = ThreadLocal.withInitial[Array[Double]](() => new Array[Double](112 * 112))

  /** Variant 7: cache-tight rewrite — same outputs (stats sum + median
    * + aHash popcount) but only the 25KB byte buffer is materialized;
    * pixel values are recomputed per pass instead of stored, and the
    * aHash block means accumulate inline. Tests the bandwidth
    * hypothesis: full-array double scratch (225KB × several passes)
    * saturates shared L3 at 32 threads. */
  private def fusedKernel(k: Long): Double = {
    val w = 48 + (k % 64).toInt; val h = 48 + ((k * 7) % 64).toInt
    val n = w * h
    val bytes = scratchB.get()
    val nwk = (k % 5).toInt
    val base = 200 + (k % 800); val ax = (k % 8); val ay = ((k + 17) % 8)
    // pass 1: fill+encode fused (no double array)
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v: Short =
          if (x < nwk) Short.MinValue
          else (base + ax * x + ay * y).toShort
        bytes(2 * i) = (v & 0xFF).toByte
        bytes(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        x += 1; i += 1
      }
      y += 1
    }
    // pass 2: decode + stats + aHash block means fused. Block index
    // tables reproduce Codec.aHash's exact partition
    // (x0 = bx*w/8, x1 = max(x0+1, (bx+1)*w/8)).
    val xb = new Array[Byte](w); val yb = new Array[Byte](h)
    var bi = 0
    while (bi < 8) {
      val x0 = bi * w / 8; val x1 = math.min(w, math.max(x0 + 1, (bi + 1) * w / 8))
      var x = x0; while (x < x1) { xb(x) = bi.toByte; x += 1 }
      val y0 = bi * h / 8; val y1 = math.min(h, math.max(y0 + 1, (bi + 1) * h / 8))
      var yy = y0; while (yy < y1) { yb(yy) = bi.toByte; yy += 1 }
      bi += 1
    }
    val sums = new Array[Double](64); val cnts = new Array[Int](64)
    var cnt = 0L; var s = 0.0; var s2 = 0.0; var s3 = 0.0
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    y = 0; i = 0
    while (y < h) {
      val byOff = yb(y) * 8
      var x = 0
      while (x < w) {
        val sv = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
        if (sv != Short.MinValue) {
          val v = sv.toDouble
          cnt += 1; s += v; s2 += v * v; s3 += v * v * v
          if (v < mn) mn = v
          if (v > mx) mx = v
          val b = byOff + xb(x)
          sums(b) += v; cnts(b) += 1
        }
        x += 1; i += 1
      }
      y += 1
    }
    // pass 3: decode + histogram (needs min/max) — bytes only
    val hist = new Array[Long](100)
    val med =
      if (cnt == 0) Double.NaN
      else if (mx == mn) mn
      else {
        val step = (mx - mn) / 100
        i = 0
        while (i < n) {
          val sv = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
          if (sv != Short.MinValue) {
            var b = ((sv - mn) / step).toInt
            if (b >= 100) b = 99
            if (b < 0) b = 0
            hist(b) += 1
          }
          i += 1
        }
        val target = 0.5 * cnt
        var cum = 0.0; var bi = 0; var res = mx
        var found = false
        while (bi < 100 && !found) {
          val next = cum + hist(bi)
          if (next >= target) {
            val frac = if (hist(bi) == 0) 0.0 else (target - cum) / hist(bi)
            res = mn + step * (bi + frac); found = true
          }
          cum = next; bi += 1
        }
        res
      }
    // quantized compare — must match Codec.aHash bit-for-bit
    val q = new Array[Long](64); var tot = 0L; i = 0
    while (i < 64) {
      val m = if (cnts(i) == 0) 0.0 else sums(i) / cnts(i)
      q(i) = math.floor(m * 1048576.0).toLong; tot += q(i); i += 1
    }
    var hash = 0L; i = 0
    while (i < 64) { if (64L * q(i) > tot) hash |= (1L << (63 - i)); i += 1 }
    s + med + java.lang.Long.bitCount(hash)
  }

  /** Variant 9: fill+encode fused (no p array), decode once into dec,
    * then the original statsN/percentileN/aHash method calls. Working
    * set 125KB vs 225KB; outputs identical to decodeStatsKernel. */
  private def halfFusedKernel(k: Long): Double = {
    val w = 48 + (k % 64).toInt; val h = 48 + ((k * 7) % 64).toInt
    val n = w * h
    val bytes = scratchB.get(); val dec = scratchD2.get()
    val nwk = (k % 5).toInt
    val base = 200 + (k % 800); val ax = (k % 8); val ay = ((k + 17) % 8)
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v: Short =
          if (x < nwk) Short.MinValue
          else (base + ax * x + ay * y).toShort
        bytes(2 * i) = (v & 0xFF).toByte
        bytes(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        x += 1; i += 1
      }
      y += 1
    }
    i = 0
    while (i < n) {
      val v = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
      dec(i) = if (v == Short.MinValue) Double.NaN else v.toDouble
      i += 1
    }
    val st = graft.core.Pixels.statsN(dec, n)
    val med = graft.core.Pixels.percentileN(dec, n, 50)
    val ah = graft.core.Codec.aHash(dec, w, h)
    st.sum + med + java.lang.Long.bitCount(ah)
  }

  /** Variant 10: pure-FP register arithmetic, ~1 kernel's worth of flops,
    * zero memory traffic. Variant 11: L1-resident int array walk. */
  private def microKernel(k: Long, variant: Int): Double = {
    if (variant == 10) {
      var a = k.toDouble + 1.0; var b = a * 0.5; var c = b + 3.0; var d = c * 1.5
      var i = 0
      while (i < 12000) {
        a = a * 1.0000001 + 0.3; b = b * 0.9999999 + 0.7
        c = c * 1.0000002 + 0.1; d = d * 0.9999998 + 0.9
        i += 1
      }
      a + b + c + d
    } else {
      val buf = scratchI.get()
      var i = 0; var s = 0
      while (i < 12000) {
        val j = (i * 31 + k.toInt) & 2047
        buf(j) = buf(j) + i
        s += buf(j & 1023)
        i += 1
      }
      s.toDouble
    }
  }
  private val scratchI = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](2048))

  /** Kernel bisection variants: which passes of decodeStatsKernel run. */
  private def variantKernel(k: Long, variant: Int): Double = {
    if (variant == 7) return fusedKernel(k)
    if (variant == 9) return halfFusedKernel(k)
    if (variant >= 10) return microKernel(k, variant)
    val w = 48 + (k % 64).toInt; val h = 48 + ((k * 7) % 64).toInt
    val n = w * h
    val p = scratchD.get(); val bytes = scratchB.get(); val dec = scratchD2.get()
    var i = 0
    if (variant >= 6) { // fill without div/mod
      var y = 0; i = 0
      val nwk = (k % 5).toInt; val base = (200 + (k % 800)).toDouble
      val ax = (k % 8).toDouble; val ay = ((k + 17) % 8).toDouble
      while (y < h) {
        var x = 0
        while (x < w) {
          p(i) = if (x < nwk) Double.NaN else base + ax * x + ay * y
          x += 1; i += 1
        }
        y += 1
      }
    } else {
      while (i < n) {
        val x = i % w; val y = i / w
        p(i) = if (x < (k % 5)) Double.NaN
               else (200 + (k % 800) + (k % 8) * x + ((k + 17) % 8) * y).toDouble
        i += 1
      }
    }
    if (variant == 5 || variant == 6) return p(0 max (n - 1))
    i = 0
    while (i < n) {
      val v = if (p(i).isNaN) Short.MinValue else p(i).toInt.toShort
      bytes(2 * i) = (v & 0xFF).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    i = 0
    while (i < n) {
      val v = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
      dec(i) = if (v == Short.MinValue) Double.NaN else v.toDouble
      i += 1
    }
    if (variant == 4) return dec(n - 1)
    val st = graft.core.Pixels.statsN(dec, n)
    if (variant == 3) return st.sum
    val med = graft.core.Pixels.percentileN(dec, n, 50)
    if (variant == 2) return st.sum + med
    val ah = graft.core.Codec.aHash(dec, w, h)
    st.sum + med + java.lang.Long.bitCount(ah)
  }

  private def kernelRate(nt: Int, n: Long, variant: Int): Double = {
    // single-thread warmup: let C2 compile the hot kernel methods from a
    // clean profile before 32 threads race through them (bimodal-rate fix)
    if (sys.env.get("GRAFT_ST_WARM").contains("1")) {
      var k = 0L; var acc = 0.0
      while (k < 60000) {
        acc += (if (variant == 0) Bench.decodeStatsKernel(k * 6 + 1)
                else variantKernel(k * 6 + 1, variant))
        k += 1
      }
      if (acc == 42.0) println()
    }
    def run(): Double = {
      val t0 = System.nanoTime()
      val per = n / nt
      val ts = (0 until nt).map { t =>
        new Thread(() => {
          var k = t * per; val end = (t + 1) * per
          var acc = 0.0
          while (k < end) {
            acc += (if (variant == 0) Bench.decodeStatsKernel(k * 6 + 1)
                    else variantKernel(k * 6 + 1, variant))
            k += 1
          }
          if (acc == 42.0) println()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      n / ((System.nanoTime() - t0) / 1e9)
    }
    run() // warm
    (1 to 3).map(_ => run()).max
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val cpus = args(1).toInt
    val n = args(2).toLong
    mode match {
      case "kernel" =>
        val variant = if (args.length > 3) args(3).toInt else 0
        println(f"RATE=${kernelRate(cpus, n, variant)}%.0f")
      case "check" => // fusedKernel must equal decodeStatsKernel exactly
        var k = 0L; var bad = 0
        while (k < n) {
          val a = Bench.decodeStatsKernel(k); val b = fusedKernel(k)
          if (a != b && !(a.isNaN && b.isNaN)) {
            if (bad < 10) println(s"MISMATCH k=$k orig=$a fused=$b")
            bad += 1
          }
          k += 1
        }
        println(s"CHECK=${if (bad == 0) "OK" else s"$bad mismatches"}")
      case m =>
        // master override: GRAFT_MASTER=local-cluster[4,8,4096] emulates a
        // real 4-executor cluster (separate executor JVMs)
        val master = sys.env.getOrElse("GRAFT_MASTER", s"local[$cpus]")
        val spark = SparkSession.builder()
          .master(master)
          .appName(s"graft-profile-$m-$cpus")
          .config("spark.sql.shuffle.partitions", cpus.toString)
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.ui.enabled", "false")
          .config("spark.executor.extraClassPath",
            "/root/repo/target/scala-2.13/classes")
          .config("spark.executor.memory", "6g")
          .getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        val decode = m == "full"
        Bench.joinTilePipeline(spark, math.min(n / 8, 2000000L), 1000,
          cpus * 4, decode) // warm
        val secs = (1 to 3).map(_ =>
          Bench.joinTilePipeline(spark, n, 1000, cpus * 4, decode)._2)
        println(f"RATE=${n / secs.min}%.0f")
        spark.stop()
    }
  }
}
