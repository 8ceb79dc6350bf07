package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Audio-clip operators over opaque PCM payloads — the third modality
  * of the multimodal contract (image and video ship elsewhere in this
  * library; the reference's model of "opaque payload + typed metadata
  * + per-band kernels" — /root/reference/GIP/GeoRaster.h read/process
  * surface — carries over verbatim to a 1-D signal).
  *
  * Architecture mirrors the image side: each clip's samples are decoded
  * ONCE inside a projection kernel (no shuffle; the decode is the job),
  * emitting exact-integer per-clip or per-frame facts; everything
  * cross-clip afterwards — VAD islands, fingerprint near-dup joins —
  * is ordinary Catalyst (windows bounded per clip, banded equi-joins,
  * never a cross join). At 10¹² clips every operator here shuffles at
  * most per-frame rows keyed by clip (bounded by n/hop per clip) or
  * band-bucket keys (near-dup), so the plans survive a 100× scale-up.
  */
object Audio {

  val FrameLen = 160
  val FrameHop = 80

  /** Voiced-frame energy floor: soft frames (16× attenuated) land at
    * ≤ ~210k for the synth amplitude range, voiced at ≥ ~3.3M — the
    * threshold separates them with an order of magnitude on each side.
    * (The gate's correctness never depends on the classification being
    * "right": the oracle applies the same constant.) */
  val VadEnergyMin = 1600000L

  /** Fingerprint spans: 63 equal spans → 62 energy-delta bits, keeping
    * the packed value strictly positive (bit 62 max) so the DuckDB
    * mirror can pack with a plain SUM of powers of two — no sign-bit
    * (1L << 63) edge between BIGINT and HUGEINT. */
  val FpSpans = 63

  def decodePcm(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 2)(bb.getShort.toInt)
  }

  /** One decode, one pass: (n_samples, sum_sq, max_abs, zero_cross,
    * n_silent, first_voiced, last_voiced); first/last are -1 when the
    * clip is all-silence. */
  private val statsUdf = udf((bytes: Array[Byte]) => {
    val s = decodePcm(bytes)
    var i = 0; var sumsq = 0L; var maxAbs = 0L; var zc = 0L; var sil = 0L
    var first = -1L; var last = -1L
    while (i < s.length) {
      val v = s(i)
      sumsq += v.toLong * v
      if (math.abs(v).toLong > maxAbs) maxAbs = math.abs(v).toLong
      if (v == 0) sil += 1
      else { if (first < 0) first = i; last = i }
      if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
      i += 1
    }
    (s.length.toLong, sumsq, maxAbs, zc, sil, first, last)
  })

  /** Per-clip exact signal statistics (energy, peak, zero crossings,
    * silence count). */
  def clipStats(audioWithBytes: DataFrame): DataFrame =
    audioWithBytes.withColumn("st", statsUdf(col("bytes")))
      .select(col("audio_id"),
        col("st._1").as("n_samples"), col("st._2").as("sum_sq"),
        col("st._3").as("max_abs"), col("st._4").as("zero_cross"),
        col("st._5").as("n_silent"))

  /** Leading/trailing-silence trim bounds: first/last non-zero sample
    * index and the trimmed length (0 for an all-silent clip). */
  def trimBounds(audioWithBytes: DataFrame): DataFrame =
    audioWithBytes.withColumn("st", statsUdf(col("bytes")))
      .select(col("audio_id"),
        col("st._6").as("first_voiced"), col("st._7").as("last_voiced"),
        when(col("st._6") < 0, lit(0L))
          .otherwise(col("st._7") - col("st._6") + 1).as("trimmed_n"))

  private val resampleUdf = udf((bytes: Array[Byte], d: Int) => {
    val s = decodePcm(bytes)
    var j = 0; var cs = 0L; var cnt = 0L
    while (j * d < s.length) {
      cs += s(j * d).toLong * ((j % 97) + 1)
      cnt += 1; j += 1
    }
    (cnt, cs)
  })

  /** Integer decimation to a common output rate (every sr/outSr-th
    * sample — the standardize-sample-rate step of a speech pipeline).
    * Emits the output length and a position-weighted checksum so the
    * oracle pins every retained sample, not just the count. */
  def resampleTo(audioWithBytes: DataFrame, outSr: Int = 8000): DataFrame =
    audioWithBytes
      .withColumn("rs", resampleUdf(col("bytes"),
        (col("sr") / lit(outSr)).cast("int")))
      .select(col("audio_id"), lit(outSr.toLong).as("out_sr"),
        col("rs._1").as("out_n"), col("rs._2").as("checksum"))

  private val frameUdf = udf((bytes: Array[Byte]) => {
    val s = decodePcm(bytes)
    val nf =
      if (s.length < FrameLen) 0 else 1 + (s.length - FrameLen) / FrameHop
    (0 until nf).map { fr =>
      var e = 0L; var i = fr * FrameHop
      val end = i + FrameLen
      while (i < end) { e += s(i).toLong * s(i); i += 1 }
      (fr.toLong, e)
    }
  })

  /** Overlapped frame decomposition (len 160, hop 80) → one row per
    * (clip, frame) with exact energy — the frame-sample primitive
    * under VAD, fingerprints and any spectral feature extractor. */
  def frameEnergies(audioWithBytes: DataFrame): DataFrame =
    audioWithBytes.withColumn("fe", explode(frameUdf(col("bytes"))))
      .select(col("audio_id"), col("fe._1").as("frame_no"),
        col("fe._2").as("energy"))

  /** Voice-activity segments: threshold frames, then gaps-and-islands
    * (frame_no − row_number) entirely in Catalyst. Window partitions
    * are per clip (≤ n/hop rows), so the shuffle is bounded however
    * large the corpus. */
  def vadSegments(frames: DataFrame,
                  minEnergy: Long = VadEnergyMin): DataFrame = {
    val w = Window.partitionBy("audio_id").orderBy("frame_no")
    val segs = frames.where(col("energy") >= minEnergy)
      .withColumn("grp", col("frame_no") - row_number().over(w))
      .groupBy("audio_id", "grp")
      .agg(min("frame_no").as("f0"), max("frame_no").as("f1"),
        count(lit(1)).as("n_frames"))
    segs
      .withColumn("seg_no", row_number()
        .over(Window.partitionBy("audio_id").orderBy("f0")).cast("long"))
      .select("audio_id", "seg_no", "f0", "f1", "n_frames")
  }

  private val fpUdf = udf((bytes: Array[Byte]) => {
    val s = decodePcm(bytes)
    val n = s.length
    val e = new Array[Long](FpSpans)
    var i = 0
    while (i < n) {
      e(((i.toLong * FpSpans) / n).toInt) += s(i).toLong * s(i)
      i += 1
    }
    var fp = 0L; var j = 1
    while (j < FpSpans) { if (e(j) > e(j - 1)) fp |= 1L << (j - 1); j += 1 }
    fp
  })

  /** Span-energy-delta fingerprint (the Haitsma–Kalker shape: divide
    * the clip into FpSpans equal spans, bit j = [E(j+1) > E(j)]).
    * Duration-invariant (spans scale with n) and stable under tiny
    * perturbations — the audio analog of pHash. */
  def fingerprints(audioWithBytes: DataFrame): DataFrame =
    audioWithBytes.select(col("audio_id"), fpUdf(col("bytes")).as("fp"))

  /** Column form of the fingerprint kernel — for streaming ingest
    * projections (stateless, one decode per arriving clip). */
  def fpCol(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    fpUdf(bytes)

  /** Near-duplicate clips: banded Hamming join over fingerprints —
    * full recall for dist ≤ 3 by the 4×16-band pigeonhole, candidates
    * sub-quadratic (shared-band equi-join, never a cross join). */
  def nearDup(audioWithBytes: DataFrame, maxDist: Int = 3): DataFrame =
    Hamming.bandedPairs(fingerprints(audioWithBytes), "audio_id", "fp",
      maxDist)

  /** Candidate pitch lags for the autocorrelation estimator (in
    * samples; spans the synth's frame-alternation period 480 and its
    * subharmonics). */
  val PitchLags: Seq[Int] = Seq(40, 80, 120, 160, 240, 480)

  private val pitchUdf = udf((bytes: Array[Byte]) => {
    val s = decodePcm(bytes)
    var bestLag = 0L; var bestR = Long.MinValue
    PitchLags.foreach { tau =>
      var r = 0L; var i = 0
      val end = s.length - tau
      while (i < end) { r += s(i).toLong * s(i + tau); i += 1 }
      if (r > bestR) { bestR = r; bestLag = tau } // ties → lowest lag
    }
    (bestLag, bestR)
  })

  /** Autocorrelation pitch estimate: exact integer r(τ) = Σ s[i]·s[i+τ]
    * over a fixed lag set, argmax → (best_lag, r_best). One decode per
    * clip; the oracle restates r(τ) as a per-sample self-join. */
  def pitchLag(audioWithBytes: DataFrame): DataFrame =
    audioWithBytes.withColumn("pl", pitchUdf(col("bytes")))
      .select(col("audio_id"), col("pl._1").as("best_lag"),
        col("pl._2").as("r_best"))

  private val normUdf = udf((bytes: Array[Byte]) => {
    val s = decodePcm(bytes)
    var maxAbs = 0L; var i = 0
    while (i < s.length) {
      if (math.abs(s(i)).toLong > maxAbs) maxAbs = math.abs(s(i)).toLong
      i += 1
    }
    var cs = 0L; i = 0
    while (i < s.length) {
      cs += Math.floorDiv(s(i).toLong * 10000L, maxAbs) * ((i % 101) + 1)
      i += 1
    }
    (maxAbs, cs)
  })

  /** Peak normalization to ±10000: s′ = floorDiv(s·10000, max_abs),
    * emitted as a position-weighted checksum so every scaled sample is
    * pinned. floorDiv (NOT toward-zero division) — the oracle states
    * the same exact integer floor with a CASE (DuckDB `//` truncates
    * toward zero on negatives). Safe: the synth body always has a
    * non-zero peak. */
  def normalizePeak(audioWithBytes: DataFrame): DataFrame =
    audioWithBytes.withColumn("nm", normUdf(col("bytes")))
      .select(col("audio_id"), col("nm._1").as("max_abs"),
        col("nm._2").as("norm_checksum"))

  /** Fixed-window training packing (concat-and-chunk): clips stream
    * into `nShards` independent md5-sharded packing lanes; the running
    * sample offset is a per-shard window — bounded partitions, never a
    * global sort (the same skew-safe shape as text sequence packing).
    * Metadata-only: no payload decode. */
  def packWindows(audioMeta: DataFrame, winLen: Long = 4000L,
                  nShards: Int = 8): DataFrame = {
    val shard = pmod(graft.text.TextOps.md5Bucket(col("audio_id")),
      lit(nShards))
    val w = Window.partitionBy("shard").orderBy("audio_id")
    audioMeta.select(col("audio_id"), shard.cast("long").as("shard"),
        col("n"))
      .withColumn("samp_start",
        coalesce(sum("n").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("first_win", Tiling.idiv(col("samp_start"), lit(winLen)))
      .withColumn("last_win",
        Tiling.idiv(col("samp_start") + col("n") - 1, lit(winLen)))
  }
}
