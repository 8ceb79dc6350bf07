package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Codec, Pixels}

/** Per-image / per-band statistics over DECODED pixel payloads — the
  * Spark re-creation of the reference's band stats
  * (/root/reference/GIP/GeoRaster.cpp:82-176). Each row's statistics
  * are computed by a single-pass kernel inside a projection (one decode
  * per image, all bands in one go, no shuffle); cross-image rollups are
  * then ordinary Catalyst aggregates.
  */
object Stats {

  /** Row-level kernel: decode all stored bands, one stats pass each.
    * Returns array of (band, cnt, vsum, vmin, vmax, vsumsq) — values
    * are integral by synthesis, surfaced as exact BIGINTs. */
  val bandStatsUdf = udf(
    (bytes: Array[Byte], w: Int, h: Int, fmt: String, nb: Int) => {
      val planes = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)
      planes.zipWithIndex.map { case (p, b) =>
        val s = Pixels.stats(p)
        (b.toLong, s.count, s.sum.toLong, s.min.toLong, s.max.toLong,
         s.sumsq.toLong)
      }.toSeq
    })

  /** images (with bytes) → one row per (image, band) with exact stats. */
  def bandStats(imagesWithBytes: DataFrame, nb: Int): DataFrame =
    imagesWithBytes
      .withColumn("bs", explode(bandStatsUdf(
        col("bytes"), col("w").cast("int"), col("h").cast("int"),
        col("fmt"), lit(nb))))
      .select(col("image_id"),
        col("bs._1").as("band"), col("bs._2").as("cnt"),
        col("bs._3").as("vsum"), col("bs._4").as("vmin"),
        col("bs._5").as("vmax"), col("bs._6").as("vsumsq"))

  /** Histogram kernel: fixed-width bins over the band's own [min,max]
    * (/root/reference/GIP/GeoRaster.cpp:141-176). Emits (bin, cnt)
    * rows; deterministic. */
  val histogramUdf = udf(
    (bytes: Array[Byte], w: Int, h: Int, fmt: String, nb: Int,
     band: Int, bins: Int) => {
      val planes = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)
      Pixels.histogram(planes(band), bins).zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toSeq
    })

  /** Reference-parity percentile (100-bin interpolation,
    * /root/reference/GIP/GeoRaster.cpp:125-138). */
  val percentileUdf = udf(
    (bytes: Array[Byte], w: Int, h: Int, fmt: String, nb: Int,
     band: Int, pct: Double) => {
      val planes = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)
      Pixels.percentile(planes(band), pct)
    })

  /** Laplacian (replicate boundary) of band 0, aggregated: NaN-poisoned
    * outputs excluded; values are exact integers for linear-ramp
    * content → (n_valid, lap_sum) both BIGINT. */
  val laplacianAgg = udf(
    (bytes: Array[Byte], w: Int, h: Int, fmt: String, nb: Int) => {
      val p = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)(0)
      val lap = Pixels.laplacian(p, w, h)
      var n = 0L; var s = 0.0; var i = 0
      while (i < lap.length) {
        if (!lap(i).isNaN) { n += 1; s += lap(i) }
        i += 1
      }
      (n, s.toLong)
    })

  /** 3×3 box convolve_nodata of band 0 (reference-exact semantics),
    * aggregated as (n_valid, Σ floor(v·1e6)). */
  val convolveBoxAgg = udf(
    (bytes: Array[Byte], w: Int, h: Int, fmt: String, nb: Int) => {
      val p = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)(0)
      val out = Pixels.convolveNodata(p, w, h, Array.fill(9)(1.0), 3, 3)
      var n = 0L; var fs = 0L; var i = 0
      while (i < out.length) {
        if (!out(i).isNaN) { n += 1; fs += math.floor(out(i) * 1e6).toLong }
        i += 1
      }
      (n, fs)
    })

  /** Cross-band spectral statistics per pixel
    * (/root/reference/GIP/GeoImage.cpp:236-280), aggregated:
    * (n_valid_px, Σ floor(mean·1e6), Σ floor(stddev·1e6)). */
  val spectralAgg = udf(
    (bytes: Array[Byte], w: Int, h: Int, fmt: String, nb: Int) => {
      val cube = Codec.decode(bytes, w, h, Codec.bandsStored(fmt, nb), fmt)
      val (mean, sd, cnt) = Pixels.spectralStats(cube)
      var n = 0L; var ms = 0L; var ss = 0L; var i = 0
      while (i < mean.length) {
        if (cnt(i) > 0) {
          n += 1
          ms += math.floor(mean(i) * 1e6).toLong
          if (!sd(i).isNaN) ss += math.floor(sd(i) * 1e6).toLong
        }
        i += 1
      }
      (n, ms, ss)
    })
}
