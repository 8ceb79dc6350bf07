package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.Synth
import graft.ops.{SpatialJoin, Tiling}

/** Ad-hoc stage profiler (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val n = args.lift(1).getOrElse("4000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$r  rate=${n / ((System.nanoTime() - t0) / 1e9)}%.0f/s")
    }
    val im = Synth.imagesRange(spark, n, cpus * 4)
    val po = Synth.polygonsRange(spark, 1000, sizeDiv = 8)
    time("gen-only")(im.agg(count(lit(1))).collect()(0).getLong(0))
    time("gen+cells")(SpatialJoin.withCoverCells(im, 7, "x0m", "y0m", "x1m", "y1m")
      .agg(count(lit(1))).collect()(0).getLong(0))
    time("join")(SpatialJoin.joinRectsSmallImages(im, po, 7).agg(count(lit(1))).collect()(0).getLong(0))
    val joined = SpatialJoin.joinRectsSmallImages(im, po, 7)
    time("join+crop")(SpatialJoin.cropRects(joined).agg(count(lit(1))).collect()(0).getLong(0))
    val crops = SpatialJoin.cropRects(joined)
    val tiles = Tiling.tiles(crops.select(col("k"), col("fid"),
      (col("cpx1") - col("cpx0")).as("w"), (col("cpy1") - col("cpy0")).as("h")),
      chunkBytes = 65536)
    time("full")(tiles.agg(count(lit(1)), sum(col("th"))).collect()(0).getLong(0))
    spark.stop()
  }
}
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val im = graft.gen.Synth.imagesRange(spark, 1000000, 16)
    val po = graft.gen.Synth.polygonsRange(spark, 1000, 8)
    println("==== headline join+tile plan ====")
    val j = graft.ops.SpatialJoin.joinRectsSmallImages(im, po, 7)
    graft.ops.Tiling.tiles(graft.ops.SpatialJoin.cropRects(j)
      .select(org.apache.spark.sql.functions.col("k"),
        (org.apache.spark.sql.functions.col("cpx1") - org.apache.spark.sql.functions.col("cpx0")).as("w"),
        (org.apache.spark.sql.functions.col("cpy1") - org.apache.spark.sql.functions.col("cpy0")).as("h")), 65536)
      .explain("formatted")
    println("==== gate spatial join on parquet (pushdown check) ====")
    graft.ops.SpatialJoin.joinRects(
      graft.gen.Synth.images(spark, "/root/testdata/sf0.01"),
      graft.gen.Synth.polygons(spark, "/root/testdata/sf0.01"), 7)
      .select("image_id", "fid").explain("formatted")
    spark.stop()
  }
}
