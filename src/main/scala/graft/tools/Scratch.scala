package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling scratchpad (not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMING $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      val t1 = System.nanoTime()
      val n2 = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMING2 $name rows=$n2 sec=${(System.nanoTime() - t1) / 1e9}%.2f")
    }
    spark.stop()
  }
}
