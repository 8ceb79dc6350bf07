package graft.gen

/** DuckDB-SQL mirrors of [[Synth]]'s integer derivations. Each query in
  * `SparkEntry.oracleSql` composes these CTEs so the driver's DuckDB
  * oracle re-derives the same tables from the same parquet files.
  * DuckDB list literals are 1-indexed; `//` is integer division (Spark
  * side uses `div`); all arithmetic is BIGINT-exact.
  */
object OracleCte {

  private def sqlList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("[", ",", "]")

  /** images metadata CTE: img2(k, image_id, w, h, fmt, nw, caption,
    * x0m, y0m, x1m, y1m). */
  val images: String =
    s"""img AS (
       |  SELECT CAST(p_partkey AS BIGINT) AS k,
       |         'img-' || CAST(p_partkey AS VARCHAR) AS image_id,
       |         CAST(16 + (p_partkey*13) % 240 AS BIGINT) AS w,
       |         CAST(16 + (p_partkey*29) % 240 AS BIGINT) AS h,
       |         ${sqlList(Synth.Formats)}[CAST(p_partkey % 6 AS INT)+1] AS fmt,
       |         CAST(p_partkey % 5 AS BIGINT) AS nw,
       |         'a ' || ${sqlList(Synth.Adjs)}[CAST(p_partkey % 16 AS INT)+1] ||
       |           ' photo of ' ||
       |           ${sqlList(Synth.Nouns)}[CAST((p_partkey*7) % 16 AS INT)+1] AS caption,
       |         (p_partkey*7919) % 300000 - 150000 AS x0m,
       |         (p_partkey*104729) % 120000 - 60000 AS y0m
       |  FROM part),
       |img2 AS (SELECT *, x0m + w*4 AS x1m, y0m + h*4 AS y1m FROM img)""".stripMargin

  /** polygon CTE: poly2(fid, px0m, py0m, pwm, phm, px1m, py1m). */
  val polygons: String =
    """poly AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS fid,
      |         (n_nationkey*51237 + 7919) % 280000 - 150000 AS px0m,
      |         (n_nationkey*26543 + 104729) % 100000 - 55000 AS py0m,
      |         4000 + (n_nationkey*3571) % 28000 AS pwm,
      |         3000 + (n_nationkey*2713) % 20000 AS phm
      |  FROM nation),
      |poly2 AS (SELECT *, px0m+pwm AS px1m, py0m+phm AS py1m FROM poly)""".stripMargin

  /** per-band pixel params: bandp(b, base, ax, ay) for a given image k
    * (join against img2). */
  val bandParams: String =
    """bands AS (SELECT unnest([0,1,2,3,4,5]) AS b),
      |bandp AS (
      |  SELECT k, CAST(b AS BIGINT) AS b,
      |         200 + (k*(b+3)) % 800 AS base,
      |         (k + 11*b) % 8 AS ax,
      |         (k + 17*b) % 8 AS ay
      |  FROM img2 CROSS JOIN bands)""".stripMargin

  /** SQL mirror of [[graft.vec.VectorOps.lshBucket]]: sign-random-
    * projection bucket id over `edCol` (a DOUBLE[] column), integer
    * plane weights — bit-exact across engines because every
    * weight·component product is an exact double. */
  def lshBucketSql(edCol: String, dim: Int, nb: Int, table: Int): String =
    (0 until nb).map { j =>
      val w = (0 until dim)
        .map(i => graft.vec.VectorOps.planeW(table, j, i)).mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product($edCol, $w::DOUBLE[]) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** audio metadata CTE — SQL mirror of [[Synth.audio]]:
    * aud(k, audio_id, sr, n, lead, tail, f, m, speaker, lang). */
  val audio: String =
    s"""aud AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS k,
       |         'aud-' || CAST(c_custkey AS VARCHAR) AS audio_id,
       |         CAST(8000*(1 + c_custkey % 2) AS BIGINT) AS sr,
       |         CAST(400 + (c_custkey*37) % 1600 AS BIGINT) AS n,
       |         CAST(c_custkey % 50 AS BIGINT) AS lead,
       |         CAST((c_custkey*3) % 50 AS BIGINT) AS tail,
       |         CAST(3 + c_custkey % 13 AS BIGINT) AS f,
       |         CAST(2*(500 + (c_custkey*13) % 1500) AS BIGINT) AS m,
       |         'spk-' || CAST(c_custkey % 20 AS VARCHAR) AS speaker,
       |         ${sqlList(Synth.AudioLangs)}[CAST((c_custkey*3) % 5 AS INT)+1]
       |           AS lang
       |  FROM customer)""".stripMargin

  /** Sample-exact waveform replay (lateral generate_series) — SQL
    * mirror of [[Synth.audioSample]]: asamp(k, audio_id, sr, n, i, s).
    * Requires a preceding CTE `saud` selecting a subset of aud. The
    * soft-frame attenuation is floor(raw/16.0), NOT `// 16`: DuckDB
    * `//` truncates toward zero on negatives while the Scala kernel
    * floor-divides. */
  val audioGen: String =
    """asamp AS (
      |  SELECT a.k, a.audio_id, a.sr, a.n, gs.i,
      |    CASE WHEN gs.i < a.lead OR gs.i >= a.n - a.tail THEN 0
      |         WHEN ((gs.i // 160) % 3) = 0 THEN
      |           CAST(floor((((gs.i*a.f + a.k*7) % a.m) - a.m//2)
      |                      / 16.0) AS BIGINT)
      |         ELSE ((gs.i*a.f + a.k*7) % a.m) - a.m//2 END AS s
      |  FROM saud a
      |  CROSS JOIN LATERAL (SELECT unnest(generate_series(0,
      |    CAST(a.n-1 AS INT))) AS i) gs)""".stripMargin

  /** Twin-aware waveform replay: like [[audioGen]] but `saud` must
    * carry a BOOLEAN `tw` column; twin rows add +1 where
    * (i*31 + k) % 997 = 0 (mirror of [[Synth.audioTwinSample]]). */
  val audioGenTw: String =
    """asamp AS (
      |  SELECT a.k, a.audio_id, a.sr, a.n, gs.i,
      |    (CASE WHEN gs.i < a.lead OR gs.i >= a.n - a.tail THEN 0
      |          WHEN ((gs.i // 160) % 3) = 0 THEN
      |            CAST(floor((((gs.i*a.f + a.k*7) % a.m) - a.m//2)
      |                       / 16.0) AS BIGINT)
      |          ELSE ((gs.i*a.f + a.k*7) % a.m) - a.m//2 END)
      |    + (CASE WHEN a.tw AND (gs.i*31 + a.k) % 997 = 0
      |            THEN 1 ELSE 0 END) AS s
      |  FROM saud a
      |  CROSS JOIN LATERAL (SELECT unnest(generate_series(0,
      |    CAST(a.n-1 AS INT))) AS i) gs)""".stripMargin

  /** Pixel-exact regeneration for small images (lateral
    * generate_series): px(k, b, x, y, v) over VALID pixels only.
    * Requires a preceding CTE `simg` selecting small rows of img2. */
  val pixelGen: String =
    """px AS (
      |  SELECT s.k, p.b, xs.x, ys.y,
      |         p.base + p.ax*xs.x + p.ay*ys.y AS v
      |  FROM simg s
      |  JOIN bandp p ON p.k = s.k
      |  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, CAST(s.w-1 AS INT))) AS x) xs
      |  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, CAST(s.h-1 AS INT))) AS y) ys
      |  WHERE xs.x >= s.nw)""".stripMargin
}
