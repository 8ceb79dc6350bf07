package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded Hamming-neighbor join over a 64-bit hash column — the
  * corpus-scale near-duplicate pattern shared by perceptual hashes
  * (pHash over image payloads) and SimHash (over document tokens).
  *
  * The hash splits into 4 disjoint 16-bit bands; candidates share at
  * least one band value (equi-join on (band index, band key), 65536
  * buckets per band). PIGEONHOLE GUARANTEE: any pair at Hamming
  * distance ≤ 3 differs in at most 3 bands, so it shares ≥ 1 band —
  * full recall for d ≤ 3 (proved equal to brute force in LshSpec).
  * For d > 3 the join is a candidate filter (subset of brute force;
  * the verified distance is emitted so callers threshold exactly).
  * No cross join anywhere; at 10¹² rows the plan is one exploded
  * equi-join + id-level distinct.
  */
object Hamming {

  /** (id_a, id_b, dist) pairs with verified Hamming distance ≤
    * `maxDist`, banded-candidate generation. `df` needs `idCol`
    * (orderable) and `hashCol` (long). */
  def bandedPairs(df: DataFrame, idCol: String, hashCol: String,
                  maxDist: Int): DataFrame = {
    val bands = df.select(col(idCol), col(hashCol),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("bj"),
            shiftright(col(hashCol), j * 16)
              .bitwiseAND(lit(0xFFFFL)).as("bk"))): _*)).as("b"))
      .select(col(idCol), col(hashCol),
        col("b.bj").as("bj"), col("b.bk").as("bk"))
    val cand = bands.select(col(idCol).as("id_a"), col(hashCol).as("h_a"),
        col("bj"), col("bk"))
      .join(bands.select(col(idCol).as("id_b"), col(hashCol).as("h_b"),
        col("bj"), col("bk")), Seq("bj", "bk"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
    cand
      .withColumn("dist", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }
}
