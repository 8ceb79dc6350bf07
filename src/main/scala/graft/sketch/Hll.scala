package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet–Fuss–Gandouet–Meunier,
  * AofA 2007) built from engine-portable primitives: the hash is md5
  * hex, the register index is the first `P` bits (2 hex chars), and
  * rho is 1 + the leading-zero count of the next 48 bits — every step
  * is string/CASE arithmetic that the DuckDB oracle replays verbatim,
  * so the REGISTER TABLE itself is value-exact across engines (the
  * q_hll_distinct gate pins it via three integer aggregates).
  *
  * Scale design: the sketch of any partition / table / day is a ≤ 256
  * row (register, rho) table; [[merge]] is a per-register MAX — the
  * classic mergeable-summary contract, so 10¹² rows reduce map-side to
  * 256-row partials and re-aggregate hierarchically (partition → file
  * → table → fleet) without ever re-scanning data. All register math
  * is built-in-function codegen (no UDF).
  *
  * Differs from Spark's own approx_count_distinct (HLL++, private
  * binary state) by exposing the registers as DATA — storable in a
  * lineage table, mergeable across engines, and oracle-checkable.
  */
object Hll {

  val P = 8            // register-index bits
  val M: Int = 1 << P  // 256 registers
  val MaxRho = 49      // 48 tail bits all zero → rho = 49

  private val Hex = "0123456789abcdef"

  private def hexVal(c: Column): Column = instr(lit(Hex), c) - 1

  /** (register, rho) for one hashed value — pure column arithmetic. */
  def registerOf(e: Column): Column = {
    val h = md5(e.cast("string"))
    (hexVal(substring(h, 1, 1)) * 16 + hexVal(substring(h, 2, 1)))
      .cast("long")
  }

  def rhoOf(e: Column): Column = {
    val tail = substring(md5(e.cast("string")), 3, 12)
    val z = length(regexp_extract(tail, "^0*", 0))
    val v = hexVal(tail.substr(z + 1, lit(1)))
    val lzInDigit =
      when(v >= 8, 0).when(v >= 4, 1).when(v >= 2, 2).otherwise(3)
    when(z === 12, MaxRho).otherwise(z * 4 + lzInDigit + 1).cast("long")
  }

  /** Sketch a column: ≤ M rows (register, rho = max over values).
    * One map-side-combined aggregate on a 256-key space. */
  def sketch(df: DataFrame, e: Column): DataFrame =
    df.select(registerOf(e).as("register"), rhoOf(e).as("rho"))
      .groupBy("register").agg(max("rho").as("rho"))

  /** Mergeable-summary union: per-register MAX over any number of
    * sketches — associative, commutative, idempotent. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("register").agg(max("rho").as("rho"))

  /** Cardinality estimate from a register table (collects ≤ M rows).
    * Standard HLL: E = alpha_m · m² / Σ 2^-M_j (absent registers
    * M_j = 0), with the small-range linear-counting correction
    * E ≤ 2.5m ∧ V>0 → m·ln(m/V). */
  def estimate(sk: DataFrame): Double = {
    val regs = sk.collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val alpha = 0.7213 / (1.0 + 1.079 / M) // m ≥ 128 constant
    val harm = (0 until M).map(j => math.pow(2.0, -regs.getOrElse(j, 0L).toDouble)).sum
    val e = alpha * M * M / harm
    val v = M - regs.size
    if (e <= 2.5 * M && v > 0) M * math.log(M.toDouble / v) else e
  }

  /** Gate-shape summary: one row of exact-integer invariants that pin
    * the full register table — non-empty count, the harmonic
    * numerator Σ 2^(50-rho) scaled so absent registers contribute
    * 2^50 (exact in BIGINT: ≤ 256·2^50 = 2^58), and a
    * position-weighted checksum. */
  def summary(sk: DataFrame): DataFrame =
    sk.agg(
      count(lit(1)).as("n_nonempty"),
      (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - rho AS INT))")) +
        (lit(M.toLong) - count(lit(1))) * lit(1L << 50))
        .as("harmonic_num"),
      sum((col("register") + 1) * col("rho")).as("reg_checksum"))
}
