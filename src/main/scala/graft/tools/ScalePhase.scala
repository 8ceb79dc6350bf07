package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench

/** One leg of the two-cluster-size scaling protocol: run the headline
  * join+tile+decode pipeline in THIS process at local[cpus] and print
  * its best-of-3 rate. Bench forks this main under `taskset` so each
  * "cluster size" owns exactly its cores (GC + JIT included) — the
  * faithful sandbox emulation of N vs 4N executors.
  *
  * Also prints CALIB_RATE: a pure-arithmetic multithread loop at the
  * same core count. On one shared socket, 4N active cores run at lower
  * turbo than N, so even perfect software scales below 4× — the
  * calibration measures that hardware ceiling so the report can show
  * efficiency both raw and relative to the ceiling (a real 4N-executor
  * cluster multiplies sockets, not threads on one socket).
  */
object ScalePhase {

  private def calibrate(nt: Int): Double = {
    val iters = 400000000L
    def burn(): Long = {
      // four independent chains: throughput-bound like the kernels,
      // not latency-bound (a single dependency chain would understate
      // the machine's scaling ceiling)
      var a = 1L; var b = 2L; var c = 3L; var d = 4L; var i = 0L
      while (i < iters) {
        a = a * 2654435761L + i; b = b ^ (b << 13) ^ i
        c = c + (c >> 5) + i;    d = d * 6364136223846793005L + 1442695040888963407L
        i += 1
      }
      a + b + c + d
    }
    burn() // warm
    val t0 = System.nanoTime()
    val ts = (0 until nt).map(_ => new Thread(() => { if (burn() == 42) println() }))
    ts.foreach(_.start()); ts.foreach(_.join())
    nt * iters / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    println(f"CALIB_RATE=${math.max(calibrate(cpus), calibrate(cpus))}%.0f")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scale-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.joinTilePipeline(spark, math.min(n / 8, 2000000L), 1000, cpus * 4,
      decode = true) // JIT/codegen warm-up
    val secs = (1 to 3).map { _ =>
      Bench.joinTilePipeline(spark, n, 1000, cpus * 4, decode = true)._2
    }
    println(f"SCALE_RATE=${n / secs.min}%.0f")
    spark.stop()
  }
}
