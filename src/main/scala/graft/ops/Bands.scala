package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Codec, Pixels}
import graft.gen.Synth

/** Band-level operators on the bands-in-payload model: the reference's
  * GeoImage band collection surface — select/reorder
  * (/root/reference/GIP/GeoImage.cpp:125-146), name registry with
  * case-insensitive lookup (/root/reference/GIP/gip/GeoImage.h:196-208,
  * :444-452), mask application (/root/reference/GIP/gip/GeoRaster.h:
  * 474-482) and overview pyramids (/root/reference/GIP/GeoImage.cpp:
  * 284-291 — GDAL NEAREST at levels 2,4,8).
  *
  * Band names live in a `bands` array column (lower-cased registry);
  * payload band ops are per-row re-encode kernels (no shuffle).
  * Overview levels become explicit rows of a derived pyramid table —
  * the cluster-scale replacement for GDAL's in-file side effect.
  */
object Bands {

  def bandIndex(names: Seq[String], name: String): Int = {
    val i = names.indexWhere(_.equalsIgnoreCase(name))
    require(i >= 0, s"band $name not found in $names")
    i
  }

  def bandsExist(names: Seq[String], want: Seq[String]): Boolean =
    want.forall(w => names.exists(_.equalsIgnoreCase(w)))

  /** select(names): keep subset/reorder; payload re-encoded. */
  def select(imagesWithBytes: DataFrame, names: Seq[String],
             allNames: Seq[String] = Synth.BandNames): DataFrame = {
    val idx = names.map(bandIndex(allNames, _))
    val tx = udf((bytes: Array[Byte], w: Int, h: Int, fmt: String) => {
      val cube = Codec.requireBands(
        Codec.decode(bytes, w, h,
          Codec.bandsStored(fmt, allNames.length), fmt),
        idx.max + 1, "select(bands)", fmt)
      Codec.encode(idx.map(cube).toArray, w, h, fmt)
    })
    imagesWithBytes
      .withColumn("bytes", tx(col("bytes"), col("w").cast("int"),
        col("h").cast("int"), col("fmt")))
      .withColumn("bands", array(names.map(n => lit(n.toLowerCase)): _*))
  }

  /** Mask application: pixels of band `target` where mask-band
    * predicate (v > threshold) fails become nodata; returns exact
    * aggregate (n_valid, vsum) of the masked band. */
  val maskStatsAgg = udf((bytes: Array[Byte], w: Int, h: Int, fmt: String,
                          nb: Int, maskBand: Int, thresh: Double,
                          target: Int) => {
    val cube = Codec.requireBands(
      Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt),
      math.max(maskBand, target) + 1, "apply_mask", fmt)
    val mask = Pixels.applyChain(cube(maskBand), Seq(Pixels.gt(thresh)))
    val masked = Pixels.applyMask(cube(target), mask)
    var n = 0L; var s = 0L; var i = 0
    while (i < masked.length) {
      if (!masked(i).isNaN) { n += 1; s += masked(i).toLong }
      i += 1
    }
    (n, s)
  })

  /** NEAREST 2:1 downsample of band 0 (overview level 2): out(x,y) =
    * src(2x,2y), out dims ceil(w/2)×ceil(h/2). Returns exact aggregate
    * (n_valid, vsum) of the overview plane. */
  val overviewAgg = udf((bytes: Array[Byte], w: Int, h: Int, fmt: String,
                         nb: Int) => {
    val p = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)(0)
    val ow = (w + 1) / 2; val oh = (h + 1) / 2
    var n = 0L; var s = 0L
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val v = p((2 * y) * w + 2 * x)
        if (!v.isNaN) { n += 1; s += v.toLong }
        x += 1
      }
      y += 1
    }
    (n, s)
  })
}
