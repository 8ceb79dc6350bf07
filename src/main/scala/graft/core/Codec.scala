package graft.core

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** Pixel payload codecs: bytes ⇄ band-major Double planes.
  *
  * The reference reads pixels through GDAL drivers
  * (/root/reference/GIP/gip/GeoRaster.h:452-485) and promotes to double
  * for any math (/root/reference/GIP/gip/GeoRaster.h:94-96). Here the
  * payload is one `binary` column per row; `fmt` names the codec:
  *   raw-u8 | raw-u16le | raw-i16le | raw-u32le | raw-i32le |
  *   raw-f32le | raw-f64le — plane-sequential, nb bands, exact (the
  *   reference's full 7-type lattice, DataType.h:43-54);
  *   png | bmp | jpg — 8-bit grayscale via javax.imageio (jpg is lossy →
  *   the PSNR ≥ 40 dB invariant, verified in CodecSpec).
  *
  * Nodata is represented as NaN inside decoded planes; each dtype has a
  * storage sentinel (u8→0, i16→-32768, f32→-32768f), mirroring the
  * reference's per-dtype nodata table
  * (/root/reference/GIP/gip/DataType.h:122-133 — values our own).
  *
  * SENTINEL ALIASING (the codec contract's one asymmetry): the
  * sentinel value is RESERVED per dtype — a legitimate pixel equal to
  * the sentinel (a real u8 0, i16 -32768, u16 65535, u32 2^32-1,
  * i32 Int.MinValue, f32/f64 -32768.0) encodes fine but decodes to
  * NaN, so encode∘decode is the identity only on the value range
  * MINUS the sentinel. This matches the reference semantics (a nodata
  * value is by definition not representable as data); CodecPixelsSpec
  * "nodata sentinels are reserved values" pins the behavior so callers
  * can't assume full-range exactness.
  */
object Codec {

  // javax.imageio defaults to a FILE-backed stream cache: every
  // png/bmp/jpg decode/encode writes a temp file before the codec
  // sees a byte. All payloads here are in-memory byte arrays —
  // memory-cache the streams instead (pure win; results unchanged).
  ImageIO.setUseCache(false)

  val NodataU8: Int     = 0
  val NodataI16: Short  = Short.MinValue
  val NodataF32: Float  = -32768.0f
  // full 7-type lattice (reference DataType.h:43-54 carries uint8,
  // uint16, int16, uint32, int32, float32, float64 with per-type
  // default nodata, DataType.h:122-133 — sentinel VALUES are our own):
  val NodataU16: Int    = 65535          // uint16 max (Landsat DN fill)
  val NodataU32: Long   = 0xFFFFFFFFL    // uint32 max
  val NodataI32: Int    = Int.MinValue
  val NodataF64: Double = -32768.0

  def isRaw(fmt: String): Boolean = fmt.startsWith("raw-")

  /** Encode band-major planes (band)(y*w+x) to bytes. NaN ⇒ nodata sentinel. */
  def encode(planes: Array[Array[Double]], w: Int, h: Int, fmt: String): Array[Byte] = {
    val nb = planes.length
    fmt match {
      case "raw-u8" =>
        val out = new Array[Byte](nb * w * h)
        var b = 0
        while (b < nb) {
          val p = planes(b); var i = 0
          while (i < w * h) {
            out(b * w * h + i) =
              if (p(i).isNaN) NodataU8.toByte
              else (p(i).toInt & 0xFF).toByte
            i += 1
          }
          b += 1
        }
        out
      case "raw-i16le" =>
        val bb = ByteBuffer.allocate(nb * w * h * 2).order(ByteOrder.LITTLE_ENDIAN)
        planes.foreach { p =>
          var i = 0
          while (i < w * h) {
            bb.putShort(if (p(i).isNaN) NodataI16 else p(i).toInt.toShort); i += 1
          }
        }
        bb.array()
      case "raw-f32le" =>
        val bb = ByteBuffer.allocate(nb * w * h * 4).order(ByteOrder.LITTLE_ENDIAN)
        planes.foreach { p =>
          var i = 0
          while (i < w * h) {
            bb.putFloat(if (p(i).isNaN) NodataF32 else p(i).toFloat); i += 1
          }
        }
        bb.array()
      case "raw-u16le" =>
        val bb = ByteBuffer.allocate(nb * w * h * 2).order(ByteOrder.LITTLE_ENDIAN)
        planes.foreach { p =>
          var i = 0
          while (i < w * h) {
            bb.putShort(if (p(i).isNaN) NodataU16.toShort
                        else (p(i).toLong & 0xFFFF).toShort)
            i += 1
          }
        }
        bb.array()
      case "raw-u32le" =>
        val bb = ByteBuffer.allocate(nb * w * h * 4).order(ByteOrder.LITTLE_ENDIAN)
        planes.foreach { p =>
          var i = 0
          while (i < w * h) {
            bb.putInt(if (p(i).isNaN) NodataU32.toInt
                      else (p(i).toLong & 0xFFFFFFFFL).toInt)
            i += 1
          }
        }
        bb.array()
      case "raw-i32le" =>
        val bb = ByteBuffer.allocate(nb * w * h * 4).order(ByteOrder.LITTLE_ENDIAN)
        planes.foreach { p =>
          var i = 0
          while (i < w * h) {
            bb.putInt(if (p(i).isNaN) NodataI32 else p(i).toInt); i += 1
          }
        }
        bb.array()
      case "raw-f64le" =>
        val bb = ByteBuffer.allocate(nb * w * h * 8).order(ByteOrder.LITTLE_ENDIAN)
        planes.foreach { p =>
          var i = 0
          while (i < w * h) {
            bb.putDouble(if (p(i).isNaN) NodataF64 else p(i)); i += 1
          }
        }
        bb.array()
      case "png" | "bmp" | "jpg" =>
        // single-band 8-bit gray; extra bands dropped by contract
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        val p = planes(0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = p(y * w + x)
            raster.setSample(x, y, 0, if (v.isNaN) NodataU8 else v.toInt & 0xFF)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        if (fmt == "jpg") {
          // explicit high quality so smooth content clears the 40 dB
          // PSNR invariant (default ~0.75 lands just under)
          val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
          val params = writer.getDefaultWriteParam
          params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          params.setCompressionQuality(0.97f)
          val ios = ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
          writer.dispose(); ios.close()
        } else {
          val ok = ImageIO.write(img, fmt, bos)
          require(ok, s"no imageio writer for $fmt")
        }
        bos.toByteArray
      case other => throw new IllegalArgumentException(s"unknown fmt: $other")
    }
  }

  /** Diagnostic guard for multi-band operators: png/bmp/jpg store a
    * single band (bandsStored == 1), so a kernel addressing band
    * index ≥ 1 must fail with a clear message, not an
    * ArrayIndexOutOfBoundsException. Returns `c` for chaining. */
  def requireBands(c: Array[Array[Double]], need: Int, op: String,
                   fmt: String): Array[Array[Double]] = {
    require(c.length >= need,
      s"$op needs $need stored band(s) but fmt '$fmt' stores ${c.length} " +
      "(png/bmp/jpg store one band) — filter to multi-band raw codecs first")
    c
  }

  /** Decode to band-major Double planes; nodata sentinel ⇒ NaN. */
  def decode(bytes: Array[Byte], w: Int, h: Int, nb: Int, fmt: String): Array[Array[Double]] = {
    decodeCounter.increment()
    fmt match {
      case "raw-u8" =>
        Array.tabulate(nb) { b =>
          val p = new Array[Double](w * h); var i = 0
          while (i < w * h) {
            val v = bytes(b * w * h + i) & 0xFF
            p(i) = if (v == NodataU8) Double.NaN else v.toDouble; i += 1
          }
          p
        }
      case "raw-i16le" =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(nb) { b =>
          val p = new Array[Double](w * h); var i = 0
          while (i < w * h) {
            val v = bb.getShort((b * w * h + i) * 2)
            p(i) = if (v == NodataI16) Double.NaN else v.toDouble; i += 1
          }
          p
        }
      case "raw-f32le" =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(nb) { b =>
          val p = new Array[Double](w * h); var i = 0
          while (i < w * h) {
            val v = bb.getFloat((b * w * h + i) * 4)
            p(i) = if (v == NodataF32 || v.isNaN) Double.NaN else v.toDouble; i += 1
          }
          p
        }
      case "raw-u16le" =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(nb) { b =>
          val p = new Array[Double](w * h); var i = 0
          while (i < w * h) {
            val v = bb.getShort((b * w * h + i) * 2) & 0xFFFF
            p(i) = if (v == NodataU16) Double.NaN else v.toDouble; i += 1
          }
          p
        }
      case "raw-u32le" =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(nb) { b =>
          val p = new Array[Double](w * h); var i = 0
          while (i < w * h) {
            val v = bb.getInt((b * w * h + i) * 4).toLong & 0xFFFFFFFFL
            p(i) = if (v == NodataU32) Double.NaN else v.toDouble; i += 1
          }
          p
        }
      case "raw-i32le" =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(nb) { b =>
          val p = new Array[Double](w * h); var i = 0
          while (i < w * h) {
            val v = bb.getInt((b * w * h + i) * 4)
            p(i) = if (v == NodataI32) Double.NaN else v.toDouble; i += 1
          }
          p
        }
      case "raw-f64le" =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        Array.tabulate(nb) { b =>
          val p = new Array[Double](w * h); var i = 0
          while (i < w * h) {
            val v = bb.getDouble((b * w * h + i) * 8)
            p(i) = if (v == NodataF64 || v.isNaN) Double.NaN else v; i += 1
          }
          p
        }
      case "png" | "bmp" | "jpg" =>
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        require(img != null, s"imageio failed to decode $fmt")
        val raster = img.getRaster
        val p = new Array[Double](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            p(y * w + x) = if (v == NodataU8) Double.NaN else v.toDouble
            x += 1
          }
          y += 1
        }
        Array(p)
      case other => throw new IllegalArgumentException(s"unknown fmt: $other")
    }
  }

  /** Bands stored per fmt: raw codecs carry all nb bands, image codecs 1. */
  def bandsStored(fmt: String, nb: Int): Int = if (isRaw(fmt)) nb else 1

  /** Count of real (non-memoized) payload decodes — instrumentation for
    * the decode-amplification specs/bench only; a LongAdder add is
    * noise next to a plane decode. */
  val decodeCounter = new java.util.concurrent.atomic.LongAdder

  /** Count of [[decodeMemo]] calls (≈ joined pairs through the pair
    * kernels) — together with [[decodeCounter]] this quantifies the
    * decode-amplification win in the bench report. */
  val memoCallCounter = new java.util.concurrent.atomic.LongAdder

  private val memoSlot =
    new ThreadLocal[(Long, Long, Int, String, Array[Array[Double]])]

  /** One-slot per-thread decode memo, keyed by image key `k` plus a
    * payload content hash.
    *
    * Kills the decode-per-joined-pair amplification in the pair kernels
    * (tile-gather warp, zonal): an image overlapping T tiles/polygons
    * appears in T consecutive join-output rows — broadcast-hash and
    * sort-merge joins both emit one streamed row's matches contiguously
    * — so a one-slot memo turns T decodes into 1 without any plan
    * change. Correctness never depends on row order (a miss just
    * decodes); the slot holds ONE image per thread, so memory stays
    * bounded at task width. The content guard (one cheap pass, orders
    * of magnitude under a decode) protects against two tables reusing
    * the same small integer keys inside one JVM — a hit requires key,
    * format, payload LENGTH and a 64-bit FNV-1a payload hash to match
    * (a 32-bit hash collides at ~2^16 distinct payloads per thread
    * lifetime — too weak a guard for silently-wrong planes). Callers
    * must not mutate returned planes. */
  def decodeMemo(k: Long, bytes: Array[Byte], w: Int, h: Int, nb: Int,
                 fmt: String): Array[Array[Double]] = {
    memoCallCounter.increment()
    val bh = fnv64(bytes)
    val cur = memoSlot.get()
    // nb is part of the key: two kernels in one JVM may decode the same
    // payload with different plane counts (e.g. a 1-band zonal then a
    // 6-band warp on a reused task thread) — a plane-count-blind hit
    // would hand the second caller a too-short array
    if (cur != null && cur._1 == k && cur._2 == bh && cur._3 == nb &&
        cur._4 == fmt) cur._5
    else {
      val p = decode(bytes, w, h, nb, fmt)
      memoSlot.set((k, bh, nb, fmt, p))
      p
    }
  }

  /** Fused per-band stats over the ENCODED payload — the decode loop
    * and [[graft.core.Pixels.stats]] folded into one streaming pass
    * with no plane materialization (q_channel_norm-scale corpus stats
    * were allocating ~whole-corpus-in-doubles of transient planes per
    * pass; guide §1.2 "per-task work"). Semantics are bit-identical to
    * `stats(decode(bytes,...)(b))` per band: same nodata-sentinel/NaN
    * skips, same empty-band (n=0 ⇒ 0,0,0,0,0 after the NaN.toLong=0
    * cast) rows, and the SAME accumulation arithmetic — ≤16-bit
    * integer formats (u8/i16le/u16le) accumulate in Long, which equals
    * the sequential double sum exactly (every partial stays < 2^53:
    * sumsq ≤ n·2^32 with n ≤ 2^16 pixels per plane... bounded by the
    * 255-pixel max dimension of the codec lattice, 2^46 worst case),
    * while f32le keeps the double accumulation order so fractional or
    * huge payloads truncate identically to the unfused path. Other
    * formats (u32/i32/f64, png/bmp/jpg) take the unfused
    * decode+stats path unchanged.
    * Returns (band, count, sum, min, max, sumsq) as Longs. */
  def bandStatsFused(bytes: Array[Byte], w: Int, h: Int, nbS: Int,
                     fmt: String): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val n = w * h
    fmt match {
      case "raw-u8" =>
        (0 until nbS).map { b =>
          var cnt = 0L; var s = 0L; var s2 = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          val off = b * n
          var i = 0
          while (i < n) {
            val u = bytes(off + i) & 0xFF
            if (u != NodataU8) {
              val v = u.toLong
              cnt += 1; s += v; s2 += v * v
              if (v < mn) mn = v
              if (v > mx) mx = v
            }
            i += 1
          }
          if (cnt == 0) (b.toLong, 0L, 0L, 0L, 0L, 0L)
          else (b.toLong, cnt, s, mn, mx, s2)
        }
      case "raw-i16le" =>
        (0 until nbS).map { b =>
          var cnt = 0L; var s = 0L; var s2 = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          val off = b * n * 2
          var i = 0
          while (i < n) {
            val j = off + i * 2
            val u = ((bytes(j) & 0xFF) | (bytes(j + 1) << 8)).toShort
            if (u != NodataI16) {
              val v = u.toLong
              cnt += 1; s += v; s2 += v * v
              if (v < mn) mn = v
              if (v > mx) mx = v
            }
            i += 1
          }
          if (cnt == 0) (b.toLong, 0L, 0L, 0L, 0L, 0L)
          else (b.toLong, cnt, s, mn, mx, s2)
        }
      case "raw-u16le" =>
        (0 until nbS).map { b =>
          var cnt = 0L; var s = 0L; var s2 = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          val off = b * n * 2
          var i = 0
          while (i < n) {
            val j = off + i * 2
            val u = (bytes(j) & 0xFF) | ((bytes(j + 1) & 0xFF) << 8)
            if (u != NodataU16) {
              val v = u.toLong
              cnt += 1; s += v; s2 += v * v
              if (v < mn) mn = v
              if (v > mx) mx = v
            }
            i += 1
          }
          if (cnt == 0) (b.toLong, 0L, 0L, 0L, 0L, 0L)
          else (b.toLong, cnt, s, mn, mx, s2)
        }
      case "raw-f32le" =>
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        (0 until nbS).map { b =>
          var cnt = 0L; var s = 0.0; var s2 = 0.0
          var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            val f = bb.getFloat((b * n + i) * 4)
            if (!(f == NodataF32 || f.isNaN)) {
              val v = f.toDouble
              cnt += 1; s += v; s2 += v * v
              if (v < mn) mn = v
              if (v > mx) mx = v
            }
            i += 1
          }
          if (cnt == 0) (b.toLong, 0L, 0L, 0L, 0L, 0L)
          else (b.toLong, cnt, s.toLong, mn.toLong, mx.toLong, s2.toLong)
        }
      case _ =>
        val planes = decode(bytes, w, h, nbS, fmt)
        planes.toIndexedSeq.zipWithIndex.map { case (p, b) =>
          val s = Pixels.stats(p)
          (b.toLong, s.count, s.sum.toLong, s.min.toLong, s.max.toLong,
           s.sumsq.toLong)
        }
    }
  }

  /** 64-bit FNV-1a over the payload, length folded in — the memo's
    * stale-hit guard. One multiply+xor per byte; a decode is ≥10×
    * this per byte, so the guard stays noise. */
  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L ^ bytes.length.toLong
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** PSNR (dB) between two planes over pixels valid in BOTH, for the
    * lossy-codec invariant (PSNR ≥ 40 dB, BASELINE.json input_hint). */
  def psnr(a: Array[Double], b: Array[Double], peak: Double = 255.0): Double = {
    var se = 0.0; var n = 0L; var i = 0
    while (i < a.length) {
      if (!a(i).isNaN && !b(i).isNaN) { val d = a(i) - b(i); se += d * d; n += 1 }
      i += 1
    }
    if (n == 0) Double.PositiveInfinity
    else if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(peak * peak / (se / n))
  }

  /** 64-bit average-hash (aHash) of a plane: 8×8 block-mean downsample,
    * bit set where block mean > global mean of the 64 block means.
    * Row-major bit order, bit 63 = block (0,0). NaN pixels excluded.
    *
    * The compare runs on 2^-20-QUANTIZED means (q = floor(mean·2^20);
    * bit ⇔ 64·q > Σq): pure integer comparison, so the hash is
    * bit-reproducible by any engine that can divide two exact integers
    * in IEEE double (the DuckDB oracle re-derives it in SQL — a raw
    * double compare of `mean > Σmean/64` would hinge on summation
    * order). Quantization error vs the unquantized hash is < 2^-20 of
    * a pixel unit — irrelevant at perceptual-hash granularity. */
  def aHash(p: Array[Double], w: Int, h: Int): Long = {
    val means = blockMeanEmbedding(p, w, h)
    val q = new Array[Long](64); var tot = 0L; var i = 0
    while (i < 64) {
      q(i) = math.floor(means(i) * 1048576.0).toLong; tot += q(i); i += 1
    }
    var hash = 0L; i = 0
    while (i < 64) { if (64L * q(i) > tot) hash |= (1L << (63 - i)); i += 1 }
    hash
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** 64-bit difference-hash (dHash, Krawetz's public gradient hash):
    * 8 rows × 9 columns of block sums; bit (r,c) set iff cell
    * (r,c+1)'s mean exceeds cell (r,c)'s — the horizontal GRADIENT
    * DIRECTION signature, complementary to [[aHash]]'s global-mean
    * bits. EXACTLY invariant to an integer brightness shift v → v+κ
    * ((s₂+κn₂)·n₁ > (s₁+κn₁)·n₂ reduces to s₂·n₁ > s₁·n₂ — the κ
    * terms cancel even when cell counts differ) and to positive
    * integer contrast scaling v → a·v: it catches exposure-shifted
    * duplicates that a raw-value hash misses. Division-free —
    * means compare via s₂·n₁ > s₁·n₂ over floor-quantized pixel
    * values, so the DuckDB oracle replays the hash bit-exactly; an
    * empty (all-nodata) cell carries (n,s) = (0,0), making both
    * sides of its compares 0 (bit stays 0). Bit (r,c) lives at
    * position 63 − (8r + c) (row-major from the MSB, like aHash).
    * Cell edges are the floor-division grid [c·w/9, (c+1)·w/9) ×
    * [r·h/8, (r+1)·h/8) — non-degenerate for w ≥ 9, h ≥ 8. */
  def dHash(p: Array[Double], w: Int, h: Int): Long = {
    require(w >= 9 && h >= 8, s"dHash needs >= 9x8 pixels, got ${w}x$h")
    require(p.length == w * h, s"plane ${p.length} != ${w}x$h")
    val n = new Array[Long](72); val sm = new Array[Long](72)
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var bx = 0
      while (bx < 9) {
        val x0 = bx * w / 9; val x1 = (bx + 1) * w / 9
        var s = 0L; var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val v = p(y * w + x)
            if (!java.lang.Double.isNaN(v)) {
              cnt += 1; s += math.floor(v).toLong
            }
            x += 1
          }
          y += 1
        }
        n(by * 9 + bx) = cnt; sm(by * 9 + bx) = s
        bx += 1
      }
      by += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val l = r * 9 + c
        if (sm(l + 1) * n(l) > sm(l) * n(l + 1))
          hash |= (1L << (63 - (r * 8 + c)))
        c += 1
      }
      r += 1
    }
    hash
  }

  /** 64-dim image feature vector: the aHash's 8×8 block means, exposed
    * as an embedding (row-major, block (0,0) first; empty blocks 0.0).
    * This is the pixel→vector feature-extract step of the training-
    * data pipeline — its output feeds cosineTopK / lshTopK / ivfTopK
    * exactly like the embeddings table. Deterministic integer-ratio
    * means, so the DuckDB oracle re-derives the 2^-20-quantized values
    * bit-exactly (same CTE as the phash gate). */
  def blockMeanEmbedding(p: Array[Double], w: Int, h: Int): Array[Double] = {
    val means = new Array[Double](64)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
        val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
        var s = 0.0; var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val v = p(y * w + x)
            if (!v.isNaN) { s += v; n += 1 }
            x += 1
          }
          y += 1
        }
        means(by * 8 + bx) = if (n == 0) 0.0 else s / n
        bx += 1
      }
      by += 1
    }
    means
  }
}
