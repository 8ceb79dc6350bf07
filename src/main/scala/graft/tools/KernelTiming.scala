package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Ad-hoc steady-state timing of the kernel-bearing gate queries on
  * SPARK_GRAFT_SF_DIR — used to report the udf→codegen-expression
  * promotion delta (round 4). Prints one `name=seconds` line each,
  * best of 3 after an untimed warm-up. */
object KernelTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-kernel-timing")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q_minhash_sig", "q_jaccard_lsh", "q_ann_cosine_topk",
      "q_ann_lsh_topk", "q_emb_neardup_lsh",
      "q_mosaic_pixels", "q_mosaic_bands")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count() // warm
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$n=$best%.3f")
    }
    spark.stop()
  }
}
