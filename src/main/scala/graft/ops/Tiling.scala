package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic image→tile assignment map — the Spark re-creation of
  * the reference's chunk iterator (/root/reference/GIP/GeoResource.cpp:
  * 195-217; contract tested in
  * /root/reference/test/test_GeoResource.py:110-125):
  *   - tiles are FULL-WIDTH row bands;
  *   - rows per tile = floor(chunkBytes / 8 / width)  (8 = sizeof
  *     double, the reference's in-memory pixel size), capped at h;
  *   - tile count = ceil(h / rows); heights equal except the last;
  *   - contiguous: tile i starts at y0 = i*rows;
  *   - `padding` pads each tile and clips at image bounds
  *     (/root/reference/GIP/gip/GeoRaster.h:456-458).
  *
  * Implemented as pure Column arithmetic + `explode(sequence(...))` —
  * whole-stage-codegen'd, no UDF, no shuffle: at 10^12 rows this is a
  * map-only stage.
  */
object Tiling {

  /** Integer floor-division on non-negative long columns (Spark's `/`
    * is double division; floor+cast is exact below 2^53). */
  def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")

  /** Expand an images DF (needs image_id, w, h) into tiles. */
  def tiles(images: DataFrame, chunkBytes: Long, padding: Int = 0): DataFrame = {
    val rows = greatest(lit(1L), idiv(lit(chunkBytes / 8L), images("w")))
    tilesByRows(images, rows, padding)
  }

  /** Explicit-numchunks variant (reference: numchunks ⇒ rows =
    * ysize/numchunks, /root/reference/GIP/GeoResource.cpp:205-208). */
  def tilesNum(images: DataFrame, numchunks: Int, padding: Int = 0): DataFrame =
    tilesByRows(images, greatest(lit(1L), idiv(images("h"), lit(numchunks.toLong))), padding)

  private def tilesByRows(images: DataFrame, rowsExpr: Column, padding: Int): DataFrame = {
    images
      .withColumn("rows_per_tile", least(rowsExpr, col("h")))
      .withColumn("n_tiles",
        idiv(col("h") + col("rows_per_tile") - 1, col("rows_per_tile")))
      .withColumn("tile_idx", explode(sequence(lit(0L), col("n_tiles") - 1)))
      .withColumn("ty0", col("tile_idx") * col("rows_per_tile"))
      .withColumn("ty1", least(col("h"), (col("tile_idx") + 1) * col("rows_per_tile")))
      .withColumn("th", col("ty1") - col("ty0"))
      .withColumn("pty0", greatest(lit(0L), col("ty0") - padding))
      .withColumn("pty1", least(col("h"), col("ty1") + padding))
  }
}
