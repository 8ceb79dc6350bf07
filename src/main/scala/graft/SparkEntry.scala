package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.{OracleCte, Synth}
import graft.index.CellGrid
import graft.ops.{Knn, SpatialJoin, Stats, Tiling}

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql` mirror)
  * per implemented operator from SURVEY.md §2. The geospatial input
  * tables are derived DETERMINISTICALLY (integer arithmetic) from the
  * driver's parquet (`part`→images, `nation`→polygons; see
  * [[graft.gen.Synth]]), so the DuckDB oracle re-derives identical
  * tables and every operator gets a value-exact check.
  */
object SparkEntry {

  val JoinRes = 7 // covering-cell resolution (4096 mdeg ≈ 4.1°)

  private def imgs(s: SparkSession, dir: String): DataFrame =
    Synth.images(s, dir)
  private def polys(s: SparkSession, dir: String): DataFrame =
    Synth.polygons(s, dir)

  private def overlapArea =
    (least(col("x1m"), col("px1m")) - greatest(col("x0m"), col("px0m"))) *
    (least(col("y1m"), col("py1m")) - greatest(col("y0m"), col("py0m")))

  /** Flagship: the spatial join at sf0.001 (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame =
    SpatialJoin.joinRects(
      imgs(spark, "/root/testdata/sf0.001"),
      polys(spark, "/root/testdata/sf0.001"), JoinRes)
      .select(col("image_id"), col("fid"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_images_meta" -> ((s, dir) =>
      imgs(s, dir)
        .select(col("image_id"), col("w"), col("h"), col("fmt"), col("nw"),
          col("caption"), col("x0m"), col("y0m"), col("x1m"), col("y1m"))
        .orderBy("image_id")),

    "q_cells_cover" -> ((s, dir) =>
      SpatialJoin.withCoverCells(imgs(s, dir), JoinRes, "x0m", "y0m", "x1m", "y1m")
        .select(col("image_id"), col("cix"), col("ciy"),
          (lit(JoinRes.toLong * CellGrid.ResMul) +
           col("cix") * CellGrid.IxMul + col("ciy")).as("cell_id"))
        .orderBy("image_id", "cell_id")),

    "q_spatial_join" -> ((s, dir) =>
      SpatialJoin.joinRects(imgs(s, dir), polys(s, dir), JoinRes)
        .select(col("image_id"), col("fid"), overlapArea.as("overlap_area"))
        .orderBy("image_id", "fid")),

    "q_spatial_join_agg" -> ((s, dir) =>
      SpatialJoin.joinRects(imgs(s, dir), polys(s, dir), JoinRes)
        .groupBy(col("fid"))
        .agg(count(lit(1)).as("n_images"),
             sum(overlapArea).as("area_sum"))
        .orderBy("fid")),

    "q_spatial_join_salted" -> ((s, dir) =>
      SpatialJoin.joinRects(imgs(s, dir), polys(s, dir), JoinRes,
          broadcastPolys = false, salt = 8)
        .select(col("image_id"), col("fid"), overlapArea.as("overlap_area"))
        .orderBy("image_id", "fid")),

    "q_spatial_anti" -> ((s, dir) =>
      SpatialJoin.joinRectsAnti(imgs(s, dir), polys(s, dir), JoinRes)
        .select(col("image_id")).orderBy("image_id")),

    "q_knn" -> ((s, dir) => {
      val im = imgs(s, dir)
        .withColumn("cxm", col("x0m") + col("w") * 2)
        .withColumn("cym", col("y0m") + col("h") * 2)
        .select("image_id", "cxm", "cym")
      val q = polys(s, dir)
        .select(col("fid").as("qid"),
          (col("px0m") + Tiling.idiv(col("pwm"), lit(2L))).as("qxm"),
          (col("py0m") + Tiling.idiv(col("phm"), lit(2L))).as("qym"))
      Knn.knn(s, im, q, 5, JoinRes)
        .select(col("qid"), col("rank").cast("long").as("rank"),
          col("image_id"), col("dist2"))
        .orderBy("qid", "rank")
    }),

    "q_tiles" -> ((s, dir) =>
      Tiling.tiles(imgs(s, dir), 8192)
        .select(col("image_id"), col("tile_idx"), col("ty0"), col("ty1"),
          col("th"))
        .orderBy("image_id", "tile_idx")),

    "q_tiles_pad" -> ((s, dir) =>
      Tiling.tilesNum(imgs(s, dir), 4, padding = 2)
        .select(col("image_id"), col("tile_idx"), col("ty0"), col("ty1"),
          col("pty0"), col("pty1"))
        .orderBy("image_id", "tile_idx")),

    "q_crop_rects" -> ((s, dir) =>
      SpatialJoin.cropRects(
          SpatialJoin.joinRects(imgs(s, dir), polys(s, dir), JoinRes))
        .select(col("image_id"), col("fid"), col("cpx0"), col("cpy0"),
          col("cpx1"), col("cpy1"))
        .orderBy("image_id", "fid")),

    "q_band_stats" -> ((s, dir) =>
      Stats.bandStats(
          Synth.imagesWithBytes(s, dir,
            _.where(col("k") % 6 === 1 || col("k") % 6 === 2)),
          Synth.NumBands)
        .orderBy("image_id", "band")),

    // ---- text pipeline (documents) ----
    "q_doc_tokens" -> ((s, dir) =>
      graft.text.TextOps.tokenStats(docs(s, dir)).orderBy("doc_id")),
    "q_doc_quality" -> ((s, dir) =>
      graft.text.TextOps.quality(docs(s, dir)).orderBy("doc_id")),
    "q_doc_langid" -> ((s, dir) =>
      graft.text.TextOps.langId(docs(s, dir)).orderBy("doc_id")),
    "q_doc_fingerprint" -> ((s, dir) =>
      graft.text.TextOps.fingerprint(docs(s, dir)).orderBy("doc_id")),
    "q_dedup_exact" -> ((s, dir) =>
      graft.text.TextOps.dedupExact(docs(s, dir)).orderBy("h")),
    "q_minhash_sig" -> ((s, dir) =>
      graft.text.TextOps.minhash(docs(s, dir), 4).orderBy("doc_id")),
    "q_minhash_bands" -> ((s, dir) =>
      graft.text.TextOps.minhashBands(docs(s, dir)).orderBy("band")),

    // ---- embeddings ----
    "q_ann_cosine_topk" -> ((s, dir) =>
      graft.vec.VectorOps.cosineTopK(emb(s, dir), col("vec_id") < 3, 10)
        .orderBy("qid", "rank")),
    "q_vec_label_stats" -> ((s, dir) =>
      graft.vec.VectorOps.labelNormStats(emb(s, dir)).orderBy("label")),

    // ---- events (window / sessionization) ----
    "q_events_top" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      ev.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy("user_id")
    }),
    "q_events_sessions" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      ev.withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("flag",
          when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("flag")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ---- relational baseline (lineitem/orders) ----
    "q_tpch_pricing" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(floor(col("l_extendedprice")).cast("long")).as("sum_price_fl"),
          avg(col("l_quantity")).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q_tpch_join" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("o_orderpriority")
    })
  )

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  // ---- DuckDB oracle SQL ----
  private val I = OracleCte.images
  private val P = OracleCte.polygons
  private val B = OracleCte.bandParams

  private val joinCte =
    s"""j AS (
       |  SELECT i.image_id, p.fid, i.x0m, i.y0m, i.x1m, i.y1m,
       |         p.px0m, p.py0m, p.px1m, p.py1m,
       |         (LEAST(i.x1m,p.px1m) - GREATEST(i.x0m,p.px0m)) *
       |         (LEAST(i.y1m,p.py1m) - GREATEST(i.y0m,p.py0m)) AS overlap_area
       |  FROM img2 i JOIN poly2 p
       |    ON i.x0m < p.px1m AND p.px0m < i.x1m
       |   AND i.y0m < p.py1m AND p.py0m < i.y1m)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_images_meta" ->
      s"""WITH $I
         |SELECT image_id, w, h, fmt, nw, caption, x0m, y0m, x1m, y1m
         |FROM img2 ORDER BY image_id""".stripMargin,

    "q_cells_cover" ->
      s"""WITH $I,
         |c AS (SELECT image_id,
         |  (x0m+180000)//4096 AS ix0, (x1m-1+180000)//4096 AS ix1,
         |  (y0m+90000)//4096 AS iy0, (y1m-1+90000)//4096 AS iy1 FROM img2)
         |SELECT image_id, cix, ciy,
         |       7*1125899906842624 + cix*33554432 + ciy AS cell_id
         |FROM c
         |CROSS JOIN LATERAL (SELECT unnest(generate_series(ix0, ix1)) AS cix) a
         |CROSS JOIN LATERAL (SELECT unnest(generate_series(iy0, iy1)) AS ciy) b
         |ORDER BY image_id, cell_id""".stripMargin,

    "q_spatial_join" ->
      s"""WITH $I, $P, $joinCte
         |SELECT image_id, fid, overlap_area FROM j
         |ORDER BY image_id, fid""".stripMargin,

    "q_spatial_join_agg" ->
      s"""WITH $I, $P, $joinCte
         |SELECT fid, CAST(COUNT(*) AS BIGINT) AS n_images,
         |       CAST(SUM(overlap_area) AS BIGINT) AS area_sum
         |FROM j GROUP BY fid ORDER BY fid""".stripMargin,

    "q_spatial_join_salted" ->
      s"""WITH $I, $P, $joinCte
         |SELECT image_id, fid, overlap_area FROM j
         |ORDER BY image_id, fid""".stripMargin,

    "q_spatial_anti" ->
      s"""WITH $I, $P
         |SELECT image_id FROM img2 i
         |WHERE NOT EXISTS (SELECT 1 FROM poly2 p
         |  WHERE i.x0m < p.px1m AND p.px0m < i.x1m
         |    AND i.y0m < p.py1m AND p.py0m < i.y1m)
         |ORDER BY image_id""".stripMargin,

    "q_knn" ->
      s"""WITH $I, $P,
         |q AS (SELECT fid AS qid, px0m + pwm//2 AS qxm, py0m + phm//2 AS qym
         |      FROM poly2),
         |cand AS (
         |  SELECT q.qid, i.image_id,
         |    (i.x0m + i.w*2 - q.qxm)*(i.x0m + i.w*2 - q.qxm) +
         |    (i.y0m + i.h*2 - q.qym)*(i.y0m + i.h*2 - q.qym) AS dist2
         |  FROM q CROSS JOIN img2 i),
         |ranked AS (
         |  SELECT qid, image_id, dist2,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, image_id)
         |      AS rank
         |  FROM cand)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, image_id, dist2
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    "q_tiles" ->
      s"""WITH $I,
         |t AS (SELECT image_id, h, GREATEST(1, 1024 // w) AS rpt FROM img2),
         |t2 AS (SELECT *, (h + rpt - 1) // rpt AS n_tiles FROM t)
         |SELECT image_id, tile_idx, tile_idx*rpt AS ty0,
         |       LEAST(h, (tile_idx+1)*rpt) AS ty1,
         |       LEAST(h, (tile_idx+1)*rpt) - tile_idx*rpt AS th
         |FROM t2
         |CROSS JOIN LATERAL
         |  (SELECT unnest(generate_series(0, n_tiles-1)) AS tile_idx) g
         |ORDER BY image_id, tile_idx""".stripMargin,

    "q_tiles_pad" ->
      s"""WITH $I,
         |t AS (SELECT image_id, h,
         |        LEAST(h, GREATEST(1, h // 4)) AS rpt FROM img2),
         |t2 AS (SELECT *, (h + rpt - 1) // rpt AS n_tiles FROM t)
         |SELECT image_id, tile_idx, tile_idx*rpt AS ty0,
         |       LEAST(h, (tile_idx+1)*rpt) AS ty1,
         |       GREATEST(0, tile_idx*rpt - 2) AS pty0,
         |       LEAST(h, LEAST(h, (tile_idx+1)*rpt) + 2) AS pty1
         |FROM t2
         |CROSS JOIN LATERAL
         |  (SELECT unnest(generate_series(0, n_tiles-1)) AS tile_idx) g
         |ORDER BY image_id, tile_idx""".stripMargin,

    "q_crop_rects" ->
      s"""WITH $I, $P, $joinCte,
         |c AS (SELECT image_id, fid, x0m, y1m,
         |        GREATEST(x0m,px0m) AS ix0m, GREATEST(y0m,py0m) AS iy0m,
         |        LEAST(x1m,px1m) AS ix1m, LEAST(y1m,py1m) AS iy1m
         |      FROM j)
         |SELECT image_id, fid,
         |       (ix0m - x0m)//4 AS cpx0, (y1m - iy1m)//4 AS cpy0,
         |       (ix1m - x0m + 3)//4 AS cpx1, (y1m - iy0m + 3)//4 AS cpy1
         |FROM c ORDER BY image_id, fid""".stripMargin,

    "q_band_stats" ->
      s"""WITH $I, $B,
         |stat AS (
         |  SELECT i.image_id, p.b, i.w, i.h, i.nw, p.base, p.ax, p.ay,
         |    ((i.w-1)*i.w)//2 - ((i.nw-1)*i.nw)//2 AS sx,
         |    ((i.w-1)*i.w*(2*i.w-1))//6 - ((i.nw-1)*i.nw*(2*i.nw-1))//6 AS sx2,
         |    (i.h*(i.h-1))//2 AS sy,
         |    ((i.h-1)*i.h*(2*i.h-1))//6 AS sy2
         |  FROM img2 i JOIN bandp p ON p.k = i.k
         |  WHERE i.k % 6 IN (1,2))
         |SELECT image_id, b AS band,
         |  (w-nw)*h AS cnt,
         |  base*(w-nw)*h + ax*sx*h + ay*sy*(w-nw) AS vsum,
         |  base + ax*nw AS vmin,
         |  base + ax*(w-1) + ay*(h-1) AS vmax,
         |  base*base*(w-nw)*h + ax*ax*sx2*h + ay*ay*sy2*(w-nw)
         |    + 2*base*ax*sx*h + 2*base*ay*sy*(w-nw) + 2*ax*ay*sx*sy AS vsumsq
         |FROM stat ORDER BY image_id, band""".stripMargin,

    "q_doc_tokens" ->
      s"""WITH $TokCte
         |SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(ts)) AS BIGINT) AS n_uniq,
         |  CAST(len(list_filter(ts, t -> t = 'the')) AS BIGINT) AS n_the,
         |  CAST(len(list_filter(ts, t -> t = 'a')) AS BIGINT) AS n_a
         |FROM tok ORDER BY doc_id""".stripMargin,

    "q_doc_quality" ->
      s"""WITH $TokCte,
         |t2 AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(ts)) AS BIGINT) AS n_uniq,
         |  CAST(len(list_filter(ts, t -> t = 'the')) AS BIGINT) AS n_the,
         |  CAST(len(list_filter(ts, t -> t = 'a')) AS BIGINT) AS n_a
         |FROM tok)
         |SELECT *,
         |  CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
         |  CAST(n_the + n_a AS DOUBLE) / n_tokens AS stop_ratio
         |FROM t2 ORDER BY doc_id""".stripMargin,

    "q_doc_langid" ->
      s"""WITH $TokCte,
         |sc AS (SELECT doc_id, lang,
         |  len(list_filter(ts, t -> t = 'the')) +
         |    len(list_filter(ts, t -> t = 'a')) AS en,
         |  len(list_filter(ts, t -> t = 'le')) +
         |    len(list_filter(ts, t -> t = 'la')) AS fr,
         |  len(list_filter(ts, t -> t = 'der')) +
         |    len(list_filter(ts, t -> t = 'und')) AS de
         |FROM tok)
         |SELECT doc_id, lang,
         |  CASE WHEN en >= fr AND en >= de AND en > 0 THEN 'en'
         |       WHEN fr >= de AND fr > 0 THEN 'fr'
         |       WHEN de > 0 THEN 'de' ELSE 'unk' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q_doc_fingerprint" ->
      s"""WITH $TokCte
         |SELECT doc_id,
         |  md5(concat_ws('|', ts[1], ts[2], ts[3], ts[-1],
         |      CAST(n_chars AS VARCHAR))) AS fp
         |FROM tok ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       MIN(doc_id) AS min_doc_id
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin,

    "q_minhash_sig" ->
      s"""WITH $TokCte, $ShCte
         |SELECT doc_id,
         |  list_min(list_transform(sh, s -> md5('0' || s))) AS h0,
         |  list_min(list_transform(sh, s -> md5('1' || s))) AS h1,
         |  list_min(list_transform(sh, s -> md5('2' || s))) AS h2,
         |  list_min(list_transform(sh, s -> md5('3' || s))) AS h3
         |FROM sh ORDER BY doc_id""".stripMargin,

    "q_minhash_bands" ->
      s"""WITH $TokCte, $ShCte,
         |sig AS (SELECT doc_id,
         |  list_min(list_transform(sh, s -> md5('0' || s))) AS h0 FROM sh)
         |SELECT substr(h0, 1, 2) AS band, CAST(COUNT(*) AS BIGINT) AS cnt,
         |       MIN(doc_id) AS min_doc_id
         |FROM sig GROUP BY 1 ORDER BY band""".stripMargin,

    "q_ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
        |           FROM embeddings WHERE vec_id < 3),
        |c AS (SELECT q.qid, e.vec_id,
        |        list_dot_product(q.qe, e.embedding::DOUBLE[]) /
        |        (sqrt(list_dot_product(q.qe, q.qe)) *
        |         sqrt(list_dot_product(e.embedding::DOUBLE[],
        |                               e.embedding::DOUBLE[]))) AS sim
        |      FROM q, embeddings e WHERE e.vec_id != q.qid),
        |r AS (SELECT qid, vec_id,
        |        ROW_NUMBER() OVER (PARTITION BY qid
        |          ORDER BY sim DESC, vec_id) AS rank FROM c)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id FROM r
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "q_vec_label_stats" ->
      """WITH n AS (SELECT CAST(label AS BIGINT) AS label,
        |  CAST(FLOOR(list_dot_product(embedding::DOUBLE[],
        |       embedding::DOUBLE[]) * 1e6) AS BIGINT) AS n2f
        |FROM embeddings)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(SUM(n2f) AS BIGINT) AS norm2_floor_sum
        |FROM n GROUP BY label ORDER BY label""".stripMargin,

    "q_events_top" ->
      """WITH r AS (SELECT user_id, event_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY value DESC, event_id) AS rn FROM events)
        |SELECT user_id, event_id, value FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q_events_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT user_id,
        |  CASE WHEN LAG(us) OVER (PARTITION BY user_id
        |         ORDER BY us, event_id) IS NULL THEN 1
        |       WHEN us - LAG(us) OVER (PARTITION BY user_id
        |         ORDER BY us, event_id) > 1800000000 THEN 1
        |       ELSE 0 END AS flag
        |  FROM e)
        |SELECT user_id, CAST(SUM(flag) AS BIGINT) AS n_sessions,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_tpch_pricing" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT)
        |    AS sum_price_fl,
        |  SUM(l_quantity) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_join" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )

  private val TokCte =
    """tok AS (SELECT doc_id, lang, n_chars, text,
      |  string_split(text, ' ') AS ts FROM documents)""".stripMargin
  private val ShCte =
    """sh AS (SELECT doc_id,
      |  CASE WHEN len(ts) >= 3 THEN
      |    list_transform(generate_series(1, CAST(len(ts)-2 AS INT)),
      |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
      |  ELSE [text] END AS sh FROM tok)""".stripMargin
}
