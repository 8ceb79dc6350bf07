package graft.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static JVM kernels behind the codegen expressions in [[VecExprs]] —
  * called directly from generated Java (one static call per row, no
  * encoder/boxing round-trip). Each kernel is THE single source of
  * truth for its algorithm: the equality-spec'd udf twins in
  * `graft.text.TextOps` / `graft.vec.VectorOps` delegate here, so
  * bit-identity between the udf, the expression and the SQL-mirrored
  * spec is by construction, then re-asserted in LshSpec.
  */
object Kernels {

  private val hexD = "0123456789abcdef".toCharArray

  /** MinHash signature hex strings (n salted md5 minima over 3-token
    * shingles; <3 tokens → the whole text is the one shingle).
    * Split keeps trailing empty tokens (Spark split semantics). */
  def minhashHexes(text: String, n: Int): Array[String] = {
    val ts = text.split(" ", -1)
    val shingles: Array[String] =
      if (ts.length >= 3)
        Array.tabulate(ts.length - 2)(i => ts(i) + " " + ts(i + 1) + " " + ts(i + 2))
      else Array(text)
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n) { j =>
      val pfx = j.toString
      var min: String = null
      shingles.foreach { s =>
        md.reset()
        val d = md.digest((pfx + s).getBytes("UTF-8"))
        val sb = new java.lang.StringBuilder(32)
        var i = 0
        while (i < 16) {
          sb.append(hexD((d(i) >> 4) & 0xF)); sb.append(hexD(d(i) & 0xF))
          i += 1
        }
        val hex = sb.toString
        if (min == null || hex.compareTo(min) < 0) min = hex
      }
      min
    }
  }

  /** Codegen entry: UTF8String in, ArrayData of UTF8String out. */
  def minhashSig(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      minhashHexes(text.toString, n)
        .map(s => UTF8String.fromString(s): Any))

  /** SRP-LSH bucket ids for all tables; reads floats straight out of
    * the unsafe ArrayData (same left-to-right fold order as the
    * `aggregate(zip_with(...))` expression — bit-identical buckets).
    * Returns NULL (the caller raises isNull) for a too-short array or
    * any null element: getFloat past numElements on UnsafeArrayData
    * reads adjacent memory, and a null slot reads as 0.0 — both would
    * be silently wrong buckets instead of a null row. */
  def lshBuckets(e: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val tables = planes.length
    val dimNeed = planes(0)(0).length
    if (e.numElements() < dimNeed) return null
    var g = 0
    while (g < dimNeed) { if (e.isNullAt(g)) return null; g += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val pt = planes(t)
      val nb = pt.length
      var bucket = 0L
      var j = 0
      while (j < nb) {
        val w = pt(j)
        var acc = 0.0
        var i = 0
        val dim = w.length
        while (i < dim) { acc = acc + e.getFloat(i).toDouble * w(i); i += 1 }
        if (acc >= 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine similarity, double accumulation in index order — identical
    * IEEE result to the `aggregate(zip_with(...))` expression and the
    * udf twin. Returns NULL (boxed) on length mismatch or any null
    * element — the zip_with expression's semantics (a null slot nulls
    * the whole fold; reading it as 0.0 would be a silently wrong
    * similarity). */
  def cosineBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(d / (math.sqrt(na) * math.sqrt(nb)))
  }
}
