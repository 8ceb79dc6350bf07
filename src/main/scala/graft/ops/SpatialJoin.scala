package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Geom
import graft.index.CellGrid

/** The engine's spatial join: covering-cell equi-join prefilter + exact
  * geometric refinement — the distributed generalization of the
  * reference's two-phase pattern (bbox spatial filter → exact Overlaps,
  * /root/reference/GIP/gip/GeoVector.h:153-179).
  *
  * Scale design:
  *   - covering cells are generated with `explode(sequence(...))` over
  *     pure shift arithmetic (codegen, no UDF);
  *   - small polygon layers broadcast (zero shuffle); large layers take
  *     a shuffled equi-join on the cell key, with optional SALTING of
  *     hot cells plus AQE skew-split as the backstop;
  *   - duplicate (image, polygon) pairs from multi-cell overlap are
  *     eliminated WITHOUT a distinct shuffle: a pair is emitted only in
  *     the cell containing the top-left corner of the intersection
  *     rectangle (deterministic unique reporter cell).
  */
object SpatialJoin {

  private def sh(res: Int): Int = CellGrid.Shift - res

  def cellIx(c: Column, res: Int): Column =
    shiftright(c + CellGrid.OffX, sh(res))
  def cellIy(c: Column, res: Int): Column =
    shiftright(c + CellGrid.OffY, sh(res))

  /** Add exploded covering-cell columns (cix, ciy) for an mdeg bbox. */
  def withCoverCells(df: DataFrame, res: Int,
                     x0: String, y0: String, x1: String, y1: String): DataFrame =
    df.withColumn("cix",
        explode(sequence(cellIx(col(x0), res), cellIx(col(x1) - 1, res))))
      .withColumn("ciy",
        explode(sequence(cellIy(col(y0), res), cellIy(col(y1) - 1, res))))

  /** Hierarchical cell-density pyramid — the H3/S2-style drill-down
    * rollup over the engine's grid (CellGrid's parent = child >> 1
    * prefix property). Images are covered ONCE at `fineRes` and
    * aggregated per fine cell (cell-weighted image count + footprint
    * area sum); the `coarseRes` level is then derived from that fine
    * SUMMARY alone via O(1) parent arithmetic (ix >> Δ, iy >> Δ) —
    * a re-aggregation of a bounded per-cell table, never a second
    * scan of the images. At 10¹² images the fine summary has at most
    * min(N, 4^fineRes) rows, so every coarser level's shuffle is
    * independent of corpus size — build the whole pyramid for the
    * price of one image scan.
    *
    * Returns the coarse level: (cell_id, cix, ciy, n_cells — child
    * cells present, n_images — cell-weighted, area_sum — mdeg²). */
  def cellPyramid(images: DataFrame, fineRes: Int, coarseRes: Int): DataFrame = {
    require(coarseRes < fineRes && coarseRes >= 0,
      s"need 0 <= coarseRes < fineRes, got $coarseRes/$fineRes")
    val d = fineRes - coarseRes
    val fine = withCoverCells(images, fineRes, "x0m", "y0m", "x1m", "y1m")
      .groupBy("cix", "ciy")
      .agg(count(lit(1)).as("n_images"),
        sum((col("x1m") - col("x0m")) * (col("y1m") - col("y0m")))
          .as("area_sum"))
    fine
      .groupBy(shiftright(col("cix"), d).as("cix"),
        shiftright(col("ciy"), d).as("ciy"))
      .agg(count(lit(1)).as("n_cells"),
        sum("n_images").as("n_images"), sum("area_sum").as("area_sum"))
      .select(
        (lit(coarseRes.toLong * CellGrid.ResMul) +
          col("cix") * CellGrid.IxMul + col("ciy")).as("cell_id"),
        col("cix"), col("ciy"), col("n_cells"), col("n_images"),
        col("area_sum"))
  }

  /** Rect-layer spatial join. `images` needs (x0m,y0m,x1m,y1m), `polys`
    * needs (px0m,py0m,px1m,py1m). Returns all pairs with OPEN-interval
    * rectangle overlap, deduped, with all input columns.
    *
    * `salt > 1` spreads each hot cell across `salt` shuffle keys by
    * hashing `saltKey` (any image-side column with per-row-distinct
    * values — default the synth key "k"; pass e.g. "image_id" for
    * other tables). Salting changes only the shuffle distribution,
    * never the result rows. */
  def joinRects(images: DataFrame, polys: DataFrame, res: Int = 7,
                broadcastPolys: Boolean = true, salt: Int = 0,
                saltKey: String = "k"): DataFrame = {
    val imgCells = withCoverCells(images, res, "x0m", "y0m", "x1m", "y1m")
    val polCells0 = withCoverCells(polys, res, "px0m", "py0m", "px1m", "py1m")

    val overlap =
      col("x0m") < col("px1m") && col("px0m") < col("x1m") &&
      col("y0m") < col("py1m") && col("py0m") < col("y1m")
    // unique reporter cell = cell of the intersection's min corner
    val dedup =
      cellIx(greatest(col("x0m"), col("px0m")), res) === col("cix") &&
      cellIy(greatest(col("y0m"), col("py0m")), res) === col("ciy")

    // single packed long key on every path (broadcast builds the
    // allocation-free LongHashedRelation; SMJ sorts one column)
    val packed = col("cix") * CellGrid.IxMul + col("ciy")
    if (salt <= 1) {
      val polCells = if (broadcastPolys)
        broadcast(polCells0.withColumn("cell", packed).drop("cix", "ciy"))
      else polCells0.withColumn("cell", packed).drop("cix", "ciy")
      imgCells.withColumn("cell", packed)
        .join(polCells, Seq("cell")).where(overlap && dedup)
    } else {
      // salt the (usually skew-prone) image side; replicate polygons
      val imgS = imgCells.withColumn("cell", packed)
        .withColumn("salt", pmod(hash(col(saltKey)).cast("long"), lit(salt.toLong)))
      val polS = polCells0.withColumn("cell", packed).drop("cix", "ciy")
        .withColumn("salt", explode(sequence(lit(0L), lit(salt.toLong - 1))))
      imgS.join(polS, Seq("cell", "salt")).where(overlap && dedup)
    }
  }

  /** Z-order key column from two cell-coordinate columns — the
    * codegen shift/mask mirror of [[CellGrid.zInterleave]] (no UDF). */
  def zValue(ix: Column, iy: Column): Column =
    (0 until 20).map { b =>
      shiftleft(shiftright(ix, b).bitwiseAND(lit(1L)), 2 * b + 1) +
        shiftleft(shiftright(iy, b).bitwiseAND(lit(1L)), 2 * b)
    }.reduce(_ + _)

  /** Spatially CLUSTERED layout key (Iceberg z-ordering): each image's
    * min-corner cell at `res` on the Morton curve. Range-partitioning
    * or sorting the write by `z` co-locates spatial neighbors in the
    * same files, so a footprint-filtered scan prunes whole files via
    * their [min,max] z ranges (the zone-map pruning Lineage already
    * does on key ranges, now spatial). */
  def zOrdered(images: DataFrame, res: Int): DataFrame =
    images
      .withColumn("zix", cellIx(col("x0m"), res))
      .withColumn("ziy", cellIy(col("y0m"), res))
      .withColumn("z", zValue(col("zix"), col("ziy")))

  /** Shuffled spatial join with a BLOOM-FILTER runtime prefilter — the
    * row-level pruning a 100 TB shuffled join needs when neither side
    * broadcasts: a Bloom filter over the polygon side's covering cells
    * is built distributed (`stat.bloomFilter` tree-reduces sketch
    * partials; no row collect), broadcast (~1.2 MB at 10⁶ cells /
    * 1% fpp), and applied to image cell rows BEFORE they enter the
    * shuffle — images nowhere near any polygon never ship. False
    * positives only cost shuffled bytes; the exact equi-join + refine
    * keeps the result IDENTICAL to [[joinRects]] (oracle + spec
    * asserted). The hand-rolled analog of AQE's runtime row-level
    * filtering, usable on any Spark version and any plan shape. */
  def joinRectsBloom(images: DataFrame, polys: DataFrame, res: Int = 7,
                     expectedCells: Long = 1L << 20,
                     fpp: Double = 0.01): DataFrame = {
    val imgCells = withCoverCells(images, res, "x0m", "y0m", "x1m", "y1m")
    val polCells = withCoverCells(polys, res, "px0m", "py0m", "px1m", "py1m")
    val packed = col("cix") * CellGrid.IxMul + col("ciy")
    val overlap =
      col("x0m") < col("px1m") && col("px0m") < col("x1m") &&
      col("y0m") < col("py1m") && col("py0m") < col("y1m")
    val dedup =
      cellIx(greatest(col("x0m"), col("px0m")), res) === col("cix") &&
      cellIy(greatest(col("y0m"), col("py0m")), res) === col("ciy")
    val polKeyed = polCells.withColumn("cell", packed).drop("cix", "ciy")
    val bloom = polKeyed.stat.bloomFilter("cell", expectedCells, fpp)
    val bc = images.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((c: Long) => bc.value.mightContainLong(c))
    imgCells.withColumn("cell", packed)
      .filter(might(col("cell")))
      .join(polKeyed, Seq("cell"))
      .where(overlap && dedup)
  }

  /** Small-image fast path: when every image extent ≤ cellSize(res)
    * (true at res ≤ 7 for this engine's ≤1.02° footprints), an image's
    * MIN-CORNER cell alone suffices as the join key if the polygon
    * side pads its covering by one ring: overlap ⇒ the image's min
    * corner lies within one cell of the polygon bbox. One row per
    * image (no explode), each (image, polygon) candidate appears
    * exactly once (no dedup predicate) — the map side is 2 shifts per
    * row and the probe is a single broadcast-hash lookup. Requires
    * caller-guaranteed max image extent; falls back to [[joinRects]]
    * otherwise. */
  def joinRectsSmallImages(images: DataFrame, polys: DataFrame, res: Int = 7,
                           maxImageExtentM: Long = 1024): DataFrame = {
    require(maxImageExtentM <= CellGrid.cellSize(res),
      s"image extent exceeds cell size at res $res — use joinRects")
    // single packed long key -> Spark picks the allocation-free
    // LongHashedRelation for the broadcast build (a two-column key
    // would fall back to the generic UnsafeHashedRelation and allocate
    // per probe row)
    val imgCells = images.withColumn("cell",
      cellIx(col("x0m"), res) * CellGrid.IxMul + cellIy(col("y0m"), res))
    val polCells = broadcast(polys
      .withColumn("cix", explode(sequence(
        cellIx(col("px0m"), res) - 1, cellIx(col("px1m") - 1, res) + 1)))
      .withColumn("ciy", explode(sequence(
        cellIy(col("py0m"), res) - 1, cellIy(col("py1m") - 1, res) + 1)))
      .withColumn("cell", col("cix") * CellGrid.IxMul + col("ciy"))
      .drop("cix", "ciy"))
    val overlap =
      col("x0m") < col("px1m") && col("px0m") < col("x1m") &&
      col("y0m") < col("py1m") && col("py0m") < col("y1m")
    imgCells.join(polCells, Seq("cell")).where(overlap)
  }

  /** Anti-join: images matching NO polygon (reference analog: features
    * with empty intersections map). */
  def joinRectsAnti(images: DataFrame, polys: DataFrame, res: Int = 7): DataFrame = {
    val matched = joinRects(images, polys, res).select(col("image_id")).distinct()
    images.join(matched, Seq("image_id"), "left_anti")
  }

  /** Arbitrary-polygon layer join: cell prefilter on the polygon bbox,
    * exact refinement = rect-vs-ring test (ray casting, pure Scala —
    * /root/reference/GIP/gip/GeoVector.h:166's Overlaps analog).
    * `polys` needs (fid, geom_wkt, px0m..py1m bbox columns). */
  def joinPolygons(images: DataFrame, polys: DataFrame, res: Int = 7): DataFrame = {
    // native Catalyst refine expression: per-task WKT ring memoization
    // instead of a per-row-parsing UDF (graft.expr.RectIntersectsPoly)
    graft.expr.GraftFunctions.register(images.sparkSession)
    val refine = (a: Column, b: Column, c: Column, d: Column, w: Column) =>
      call_function("graft_rect_poly", a, b, c, d, w)
    val imgCells = withCoverCells(images, res, "x0m", "y0m", "x1m", "y1m")
    val polCells = broadcast(
      withCoverCells(polys, res, "px0m", "py0m", "px1m", "py1m"))
    val bboxOverlap =
      col("x0m") < col("px1m") && col("px0m") < col("x1m") &&
      col("y0m") < col("py1m") && col("py0m") < col("y1m")
    val dedup =
      cellIx(greatest(col("x0m"), col("px0m")), res) === col("cix") &&
      cellIy(greatest(col("y0m"), col("py0m")), res) === col("ciy")
    imgCells.join(polCells, Seq("cix", "ciy"))
      .where(bboxOverlap && dedup)
      .where(refine(col("x0m"), col("y0m"), col("x1m"), col("y1m"), col("geom_wkt")))
  }

  /** Per-hit intersection GEOMETRY — the reference's `intersections`
    * returns the exact Intersection geometry WKT keyed by FID
    * (/root/reference/GIP/gip/GeoVector.h:167-169); this emits it per
    * joined (image, polygon) row: Sutherland-Hodgman clip of the
    * polygon ring by the image footprint rect, plus vertex count and
    * shoelace area. `joined` needs the image bbox (x0m..y1m) and
    * `geom_wkt` (degree coordinates, as the layer stores them). */
  def intersectionGeom(joined: DataFrame): DataFrame = {
    val ig = udf((x0m: Long, y0m: Long, x1m: Long, y1m: Long, wkt: String) => {
      val (xs, ys) = Geom.parsePolygonWkt(wkt)
      val (cx, cy) = Geom.clipPolygonRect(xs, ys,
        Geom.BBoxD(x0m / 1000.0, y0m / 1000.0, x1m / 1000.0, y1m / 1000.0))
      (Geom.ringWkt(cx, cy), cx.length.toLong, Geom.polygonArea(cx, cy))
    })
    joined
      .withColumn("ig", ig(col("x0m"), col("y0m"), col("x1m"), col("y1m"),
        col("geom_wkt")))
      .withColumn("inter_wkt", col("ig._1"))
      .withColumn("inter_nvert", col("ig._2"))
      .withColumn("inter_area_deg2", col("ig._3"))
      .drop("ig")
  }

  /** Oracle-exact variant of [[intersectionGeom]] in INTEGER mdeg
    * space: the polygon ring is rebuilt from its integer bbox columns
    * so every clipped vertex and the shoelace area are exact integers —
    * the driver gate checks area == the closed-form rectangle overlap.
    * Same kernel as the WKT path (clip + shoelace), different ring
    * source. */
  def intersectionGeomMdeg(joined: DataFrame): DataFrame = {
    val ig = udf((x0m: Long, y0m: Long, x1m: Long, y1m: Long,
                  px0: Long, py0: Long, px1: Long, py1: Long) => {
      val xs = Array(px0.toDouble, px1.toDouble, px1.toDouble, px0.toDouble)
      val ys = Array(py0.toDouble, py0.toDouble, py1.toDouble, py1.toDouble)
      val (cx, cy) = Geom.clipPolygonRect(xs, ys,
        Geom.BBoxD(x0m.toDouble, y0m.toDouble, x1m.toDouble, y1m.toDouble))
      (Geom.ringWkt(cx, cy), cx.length.toLong,
        Geom.polygonArea(cx, cy).toLong)
    })
    joined
      .withColumn("ig", ig(col("x0m"), col("y0m"), col("x1m"), col("y1m"),
        col("px0m"), col("py0m"), col("px1m"), col("py1m")))
      .withColumn("inter_wkt", col("ig._1"))
      .withColumn("inter_nvert", col("ig._2"))
      .withColumn("inter_area", col("ig._3"))
      .drop("ig")
  }

  /** Pixel-space crop rect of a polygon(rect) ∩ image — the Extract /
    * crop semantics (reference read(chunk) window math,
    * /root/reference/GIP/gip/GeoRaster.h:452-530): intersection mapped
    * through the inverse affine (res 4 mdeg/px, y row 0 at y1m top).
    * Emits integer pixel bounds [px0,px1)×[py0,py1). */
  def cropRects(joined: DataFrame, resM: Long = 4L): DataFrame = {
    joined
      .withColumn("ix0m", greatest(col("x0m"), col("px0m")))
      .withColumn("iy0m", greatest(col("y0m"), col("py0m")))
      .withColumn("ix1m", least(col("x1m"), col("px1m")))
      .withColumn("iy1m", least(col("y1m"), col("py1m")))
      // x: floor((ix0m - x0m)/resM) .. ceil((ix1m - x0m)/resM)
      .withColumn("cpx0", Tiling.idiv(col("ix0m") - col("x0m"), lit(resM)))
      .withColumn("cpx1", Tiling.idiv(col("ix1m") - col("x0m") + resM - 1, lit(resM)))
      // y: row 0 is the TOP of the image (geo y1m), per the reference's
      // north-up affine (negative yres)
      .withColumn("cpy0", Tiling.idiv(col("y1m") - col("iy1m"), lit(resM)))
      .withColumn("cpy1", Tiling.idiv(col("y1m") - col("iy0m") + resM - 1, lit(resM)))
  }
}
