package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Codec, Pixels}
import graft.gen.Synth
import graft.ops._

/** Typed user-facing API — what a gippy user writes after switching
  * (reference Python surface: gippy.GeoImage / gippy.algorithms).
  * `Dataset[ImageMeta]` rows are the GeoImage analog; band math and
  * algorithms are Dataset→Dataset transformers; vector layers are
  * `Dataset[Feature]`.
  */
object Model {
  /** One image row (input_hint schema + derived georeferencing). */
  final case class ImageMeta(image_id: String, k: Long, w: Long, h: Long,
                             fmt: String, nw: Long,
                             x0m: Long, y0m: Long, x1m: Long, y1m: Long)
  /** One vector feature (reference GeoFeature.h:36-173). */
  final case class Feature(fid: Long, layer: String, geom_wkt: String,
                           px0m: Long, py0m: Long, px1m: Long, py1m: Long)
  final case class TileRef(image_id: String, tile_idx: Long,
                           ty0: Long, ty1: Long, th: Long)
}

final class GippySpark(val spark: SparkSession) {
  import Model._
  import spark.implicits._

  graft.expr.GraftFunctions.register(spark)

  /** Open the images table (metadata; payload columns stay lazy). */
  def openImages(sfDir: String): Dataset[ImageMeta] =
    Synth.images(spark, sfDir)
      .select("image_id", "k", "w", "h", "fmt", "nw",
        "x0m", "y0m", "x1m", "y1m")
      .as[ImageMeta]

  def openPolygons(sfDir: String): Dataset[Feature] =
    Synth.polygons(spark, sfDir)
      .select("fid", "layer", "geom_wkt", "px0m", "py0m", "px1m", "py1m")
      .as[Feature]

  /** GeoVector.where(attr, value) / where(sql) analogs
    * (/root/reference/GIP/gip/GeoVector.h:129-150). */
  def where(features: Dataset[Feature], sql: String): Dataset[Feature] =
    features.where(expr(sql))

  /** Primary-key feature lookup (GeoVector.h:63-114). */
  def byKey(features: Dataset[Feature], fid: Long): Dataset[Feature] =
    features.filter(_.fid == fid)

  /** The spatial join: images ∩ polygon layer (cell prefilter + exact
    * refine), typed pair output. */
  def intersections(images: Dataset[ImageMeta], features: Dataset[Feature],
                    res: Int = 7): DataFrame =
    SpatialJoin.joinPolygons(images.toDF(), features.toDF(), res)

  /** `intersections` WITH the per-hit intersection GEOMETRY — the
    * reference returns the exact Intersection WKT keyed by FID
    * (/root/reference/GIP/gip/GeoVector.h:167-169): adds `inter_wkt`
    * (clipped ring), `inter_nvert` and `inter_area_deg2` columns. */
  def intersectionGeometries(images: Dataset[ImageMeta],
                             features: Dataset[Feature],
                             res: Int = 7): DataFrame =
    SpatialJoin.intersectionGeom(intersections(images, features, res))

  /** Per-feature geometry measures — GeoFeature area/centroid parity
    * (the reference exposes feature geometry via OGR on GeoVector
    * features, /root/reference/GIP/gip/GeoVector.h:63-114): exact
    * shoelace double-area and centroid numerators in integer mdeg,
    * computed per row with no shuffle. */
  def measures(features: DataFrame): DataFrame = {
    val m = udf((w: String) => graft.core.Geom.ringMeasuresMdeg(w))
    features.withColumn("m", m(col("geom_wkt")))
      .select(col("fid"), col("m._1").as("nvert"),
        col("m._2").as("area2_mdeg"),
        col("m._3").as("cx_num"), col("m._4").as("cy_num"))
  }

  /** Tile map (chunks() parity). */
  def tiles(images: Dataset[ImageMeta], chunkBytes: Long): Dataset[TileRef] =
    Tiling.tiles(images.toDF(), chunkBytes)
      .select("image_id", "tile_idx", "ty0", "ty1", "th").as[TileRef]

  /** NDVI over decoded payloads (typed map — the lazy band-math chain
    * materializes per row, whole-stage-codegen around it). */
  def ndviStats(sfDir: String, keyFilter: DataFrame => DataFrame): DataFrame =
    Indices.indexStats(Synth.imagesWithBytes(spark, sfDir, keyFilter),
      Seq("ndvi"), Synth.NumBands)

  /** Zonal statistics per feature (extract-by-vector): rect layers via
    * the half-open center rule, arbitrary rings via ray-casting. */
  def zonalStats(imagesWithBytes: DataFrame, features: Dataset[Feature],
                 exactRects: Boolean = true): DataFrame =
    if (exactRects) Stats.zonalStats(imagesWithBytes, features.toDF(), Synth.NumBands)
    else Stats.zonalStatsPoly(imagesWithBytes, features.toDF(), Synth.NumBands)

  /** Near-dup dedup clusters over a documents table: LSH pair
    * candidates → exact Jaccard verify → connected components;
    * keep-one-per-cluster (`keep` column). */
  def dedupClusters(docs: DataFrame, threshold: Double): DataFrame =
    graft.graph.ConnectedComponents.dedupClusters(docs, threshold)

  /** Distributed warp/mosaic into destination grids — the
    * cookie_cutter analog (reference GeoAlgorithms.cpp:225-286): every
    * stored band of every overlapping image resamples onto each grid's
    * tiles through the covering-cell tile-gather join, merged
    * last-wins per (tile, band). `imagesWithBytes` = the payload table
    * (k, image_id, bytes, w, h, fmt, x0m..y1m); `grids` = (gid, gx0,
    * gy0, gx1, gy1) in mdeg. */
  def mosaicInto(imagesWithBytes: DataFrame, grids: DataFrame,
                 interp: Int = 0, nbBands: Int = Synth.NumBands): DataFrame =
    Warp.warpInto(imagesWithBytes, grids, interp = interp, nbBands = nbBands)

  /** Approximate nearest neighbors over an embeddings table
    * (vec_id, embedding array<float>): `"ivf"` = sample-trained
    * spherical-k-means quantizer (the deployment path), `"lsh"` =
    * multi-table SRP-LSH, `"exact"` = brute-force cosine.
    *
    * The LSH path needs the embedding dimension and a corpus-size
    * estimate (to size `nb` — see nbForCorpus); pass them explicitly
    * when known, or leave the defaults and this method derives dim
    * from the first row and corpusN from a count — two small driver
    * jobs, fine for an interactive entry point, wasteful inside a
    * loop. */
  def nearestNeighbors(emb: DataFrame, queryFilter: org.apache.spark.sql.Column,
                       k: Int, method: String = "ivf",
                       dim: Int = -1, corpusN: Long = -1L): DataFrame =
    method match {
      case "ivf"   => graft.vec.VectorOps.ivfTopKSeeded(spark, emb, queryFilter, k)
      case "lsh"   =>
        val d = if (dim > 0) dim
                else emb.select(size(col("embedding"))).head().getInt(0)
        val n = if (corpusN > 0) corpusN else emb.count()
        graft.vec.VectorOps.lshTopK(emb, d, queryFilter, k,
          nb = graft.vec.VectorOps.nbForCorpus(n), tables = 16)
      case "exact" => graft.vec.VectorOps.cosineTopK(emb, queryFilter, k)
      case other   => throw new IllegalArgumentException(
        s"method '$other' (ivf | lsh | exact)")
    }
}
