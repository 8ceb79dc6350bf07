package graft.vec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-similarity operators over the `embeddings` table
  * (vec_id, embedding array<float>, label).
  *
  * Dot products run in DOUBLE with strict left-to-right folds
  * (`aggregate` over `zip_with`) so results are bit-reproducible and
  * match a sequential SQL evaluation. Brute-force top-k broadcasts the
  * (small) query set and windows by query id — the scale baseline; the
  * LSH-bucketed variant (deterministic sign-random-projection buckets)
  * is the 10^12-row path: candidates meet in buckets instead of a full
  * cross product.
  */
object VectorOps {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Idempotent registration of the graft_* codegen expressions on the
    * input's session — every method that builds kernel columns calls
    * this first. */
  private def reg(df: DataFrame): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    df
  }

  /** Compiled cosine — BIT-IDENTICAL to the [[cosine]] expression
    * (same left-to-right folds for dot and both norms, same op order
    * for the final ratio; asserted in LshSpec). Round 4 promoted this
    * from a Scala udf to the codegen [[graft.expr.CosineSim]]
    * expression (generated Java calls the static Kernels.cosine over
    * the unsafe array — the udf's per-row Row↔Seq boxing is gone).
    * Null input or length mismatch → null, like the expression it
    * mirrors. Requires [[graft.expr.GraftFunctions.register]] on the
    * session (every VectorOps entry point does it). */
  def cosineFast(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Brute-force cosine top-k for a set of query vector ids. */
  def cosineTopK(emb0: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val emb = reg(emb0)
    val q = emb.where(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cand = emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", cosineFast(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id"))
  }

  /** Per-label aggregate of norms (floor-scaled to exact integers). */
  def labelNormStats(emb: DataFrame): DataFrame =
    emb.select(col("label").cast("long").as("label"),
        floor(norm2(col("embedding")) * 1e6).cast("long").as("n2f"))
      .groupBy("label")
      .agg(count(lit(1)).as("cnt"), sum(col("n2f")).as("norm2_floor_sum"))

  /** Deterministic sign-random-projection plane weight, table t, bit j,
    * component i — INTEGER in [-500, 500], so plane·embedding products
    * are exact doubles and the bucket is reproducible bit-for-bit by
    * any engine (the oracle INLINES the weights as SQL literals, so the
    * mixing function itself needs no SQL mirror).
    *
    * The weights come from a splitmix64-style avalanche of (t, j, i):
    * planes must be mutually DECORRELATED or buckets collapse. (The
    * previous affine family `((t·31+j)·1000003 + i·7919) mod 1001` had
    * 1000003 ≡ 4 (mod 1001), so consecutive planes differed by an
    * additive constant of 4 — near-identical plane vectors, ~2
    * effective buckets per table regardless of nb. Measured in LshSpec:
    * the fix cuts isotropic-corpus candidate pairs from ~78% of N²/2
    * to ~7%.) */
  def planeW(t: Int, j: Int, i: Int): Int = {
    var z = t.toLong * 131071L + j.toLong * 524287L + i.toLong + 1L
    z *= 0x9E3779B97F4A7C15L
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^= (z >>> 31)
    (java.lang.Math.floorMod(z, 1001L) - 500L).toInt
  }

  /** Number of SRP planes sized to the corpus: 2^nb buckets ≈
    * n / targetBucket, floored at 6. Candidate generation within a
    * bucket is quadratic, so nb MUST grow with the corpus — a fixed nb
    * (e.g. 6 = 64 buckets, fine for the 10⁴-row oracle gates) makes
    * the join Θ(N²/64) at 10¹² rows. nbForCorpus(10¹², 1024) = 30
    * planes → ~10⁹ buckets of ~10³ vectors (≈10⁶ pair-checks per
    * bucket per table — embarrassingly parallel). */
  def nbForCorpus(n: Long, targetBucket: Long = 1024L): Int =
    math.max(6, math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket))
      / math.log(2.0)).toInt)

  /** Deterministic sign-random-projection LSH bucket id for hash table
    * `table`: `nb` planes, bit j set iff embedding·plane_j ≥ 0.
    * Returns bucket (long, 0..2^nb−1); ANN / near-dup = equi-join on
    * (table, bucket) then exact re-rank or verify. This is the
    * 10^12-row path: bucket cardinality 2^nb bounds each candidate
    * group, and multiple tables trade shuffle volume for recall
    * (P[collision in ≥1 of L tables] = 1−(1−(1−θ/π)^nb)^L).
    *
    * `nb` is REQUIRED and must be sized to the corpus — see
    * [[nbForCorpus]]; the oracle-bounded gates pass nb=6 explicitly. */
  def lshBucket(dim: Int, nb: Int, table: Int = 0): Column =
    (0 until nb).map { j =>
      val w = array((0 until dim).map(i => lit(planeW(table, j, i).toDouble)): _*)
      when(dot(col("embedding"), w) >= 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)

  /** (vec_id, tj, bk) bucket rows for `tables` hash tables — the
    * explode side of every LSH join. Computed by the codegen
    * [[graft.expr.LshBuckets]] expression (generated Java calls the
    * static Kernels.lshBuckets over the unsafe float array, plane
    * weights shipped once as a reference object — round 4 promoted
    * the former Scala udf): higher-order aggregate lambdas are
    * codegen-fallback, and tables×nb×dim of them per row dominated
    * the LSH queries' wall time. BIT-IDENTICAL buckets — the kernel
    * folds the dot product in the same index order as
    * `aggregate(zip_with(...))`, so every IEEE sum matches the
    * expression (and the oracle's) exactly; asserted in LshSpec. */
  def lshBuckets(emb: DataFrame, dim: Int, nb: Int, tables: Int): DataFrame =
    reg(emb).select(col("vec_id"),
        posexplode(call_function("graft_lsh_buckets", col("embedding"),
          lit(tables), lit(nb), lit(dim))))
      .select(col("vec_id"), col("pos").cast("int").as("tj"),
        col("col").as("bk"))

  /** Expression-tree variant of one table's bucket rows — kept for the
    * fast-kernel equality spec. */
  def lshBucketsExpr(emb: DataFrame, dim: Int, nb: Int, tables: Int): DataFrame =
    emb.select(col("vec_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tj"), lshBucket(dim, nb, t).as("bk"))): _*)).as("b"))
      .select(col("vec_id"), col("b.tj").as("tj"), col("b.bk").as("bk"))

  /** LSH-bucketed approximate NN: candidates share a bucket in ANY of
    * `tables` hash tables; pair dedup on ids; exact cosine re-rank.
    * Recall vs the brute-force [[cosineTopK]] is measured in LshSpec.
    * Plan shape at 10^12 rows: bucket explode (×tables) → broadcast
    * equi-join on (tj,bk) → id-level distinct → join embeddings back —
    * candidates never exceed Σ bucket sizes of the query's buckets. */
  def lshTopK(emb: DataFrame, dim: Int, queryFilter: Column, k: Int,
              nb: Int, tables: Int = 4): DataFrame = {
    val buckets = lshBuckets(emb, dim, nb, tables)
    val qb = buckets.join(emb.where(queryFilter).select("vec_id"), Seq("vec_id"))
      .withColumnRenamed("vec_id", "qid")
    val pairs = buckets.join(broadcast(qb), Seq("tj", "bk"))
      .where(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    val cand = pairs
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(emb.where(queryFilter)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))), Seq("qid"))
      .withColumn("sim", cosineFast(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id"))
  }

  /** IVF (inverted-file) approximate NN — the cell-probing ANN family
    * next to SRP-LSH. Coarse quantizer = `kc` FIXED centroids (the kc
    * lowest vec_ids: deterministic, so any SQL engine re-derives the
    * same index); every vector lands in its max-cosine cell (ties →
    * lowest centroid id); a query probes its `nprobe` nearest cells
    * and re-ranks exactly inside them.
    *
    * Scale shape at 10¹² rows: assignment is one broadcast of kc
    * centroids + a per-row argmax (no shuffle); the candidate join is
    * an equi-join on cell id touching ~nprobe/kc of the corpus per
    * query. kc grows with the corpus exactly like LSH's 2^nb (cells ≈
    * N/targetCell); a real deployment uses [[ivfTopKSeeded]] (k-means
    * centroids) — fixed-id seeds keep the oracle gate value-exact. */
  def ivfTopK(emb: DataFrame, queryFilter: Column, k: Int,
              kc: Int = 16, nprobe: Int = 4): DataFrame =
    ivfTopKWithCentroids(emb,
      emb.where(col("vec_id") < kc)
        .select(col("vec_id").as("cid"), col("embedding").as("ce")),
      queryFilter, k, nprobe)

  /** DATA-ADAPTIVE IVF: coarse quantizer TRAINED on a bounded
    * deterministic sample (the `sampleN` lowest vec_ids) with
    * farthest-point seeding + Lloyd rounds on the driver — the
    * standard way IVF quantizers are built (sample-trained, then
    * broadcast-assigned), and the scale-correct one: training costs
    * one bounded collect, zero distributed iterations, and the
    * resulting centroids SPREAD over the corpus's actual geometry
    * instead of being whatever the kc lowest vec_ids look like (the
    * fixed-id variant stays as the oracle gate; this is the
    * deployment path). Recall vs the fixed-id quantizer is measured
    * in LshSpec. Deterministic for fixed data. */
  def ivfTopKSeeded(spark: org.apache.spark.sql.SparkSession,
                    emb: DataFrame, queryFilter: Column, k: Int,
                    kc: Int = 16, nprobe: Int = 4, iters: Int = 3,
                    sampleN: Int = 1024): DataFrame = {
    import spark.implicits._
    // SPHERICAL k-means: cells are assigned by max COSINE, so train on
    // L2-normalized vectors (Euclidean on the unit sphere ranks like
    // cosine) and re-normalize each Lloyd mean — a Euclidean quantizer
    // over raw magnitudes would disagree with the cosine cell rule
    def unit(v: Array[Double]): Array[Double] = {
      var n = 0.0; var i = 0
      while (i < v.length) { n += v(i) * v(i); i += 1 }
      if (n == 0.0) v else { val s = 1.0 / math.sqrt(n); v.map(_ * s) }
    }
    val sample: Array[Array[Double]] = emb
      .orderBy(col("vec_id")).limit(sampleN)
      .select(col("embedding").cast("array<double>"))
      .as[Array[Double]].collect().map(unit)
    val centers = graft.ops.Algorithms.lloyd(sample,
      graft.ops.Algorithms.farthestPointSeeds(sample, kc), iters, unit)
    val cents = centers.zipWithIndex
      .map { case (ce, i) => (i.toLong, ce.map(_.toFloat)) }
      .toSeq.toDF("cid", "ce")
    ivfTopKWithCentroids(emb, cents, queryFilter, k, nprobe)
  }

  /** Bounded collect of a kc-row centroid set, cid-ascending:
    * (cid labels, flat float components) — the reference-object form
    * the [[graft.expr.IvfAssign]] argmax kernel ships per task. */
  private def collectCents(cents: DataFrame): (Array[Long], Array[Float]) = {
    val rows = cents.orderBy(col("cid")).collect()
    (rows.map(_.getLong(0)), rows.flatMap(_.getSeq[Float](1)))
  }

  /** Cell-id column: codegen argmax over the broadcast centroid set —
    * assignment is ONE expression call per row (no crossJoin, no
    * window, no shuffle on the corpus side; bit-identical to the
    * windowed argmax it replaced — asserted in LshSpec). Positional
    * argmax maps back to cid labels; cid-ascending order keeps the
    * tie-break (bit-equal cosine → lowest cid) aligned. */
  private def assignCol(cids: Array[Long], flat: Array[Float]): Column =
    element_at(lit(cids),
      call_function("graft_ivf_assign", col("embedding"), lit(flat),
        lit(cids.length)) + lit(1))

  private def ivfTopKWithCentroids(emb0: DataFrame, cents: DataFrame,
                                   queryFilter: Column, k: Int,
                                   nprobe: Int): DataFrame = {
    val emb = reg(emb0)
    val (cids, flat) = collectCents(cents)
    val cells = emb.select(col("vec_id"), col("embedding"),
      assignCol(cids, flat).as("cid"))
    val q = emb.where(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("qsim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("qsim", cosineFast(col("qe"), col("ce")))
      .withColumn("prank", row_number().over(wProbe))
      .where(col("prank") <= nprobe)
      .select(col("qid"), col("qe"), col("cid"))
    val cand = cells.join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", cosineFast(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id"))
  }

  /** PERSISTENT IVF index (build once, probe many): writes under
    * `root` a `centroids` table (cid, ce) and a `postings` table
    * (vec_id, embedding, cid) hash-BUCKETED BY CID via the resumable
    * Lineage writer — the index build is itself crash-resumable, and
    * a probe later reads ONLY the committed buckets of its nprobe
    * cells (metadata bucket pruning, no corpus scan, no re-assignment
    * job per query batch). Idempotent: a root that is already fully
    * committed is left untouched, so repeated "ensure index" calls
    * cost one commit-log read. */
  def buildIvfIndex(spark: SparkSession, emb0: DataFrame, root: String,
                    kc: Int = 16, nParts: Int = 8): Unit = {
    val emb = reg(emb0)
    val cents = emb.where(col("vec_id") < kc)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    graft.table.Lineage.writeResumable(spark, cents,
      s"$root/centroids", "cid", 1)
    val (cids, flat) = collectCents(cents)
    val postings = emb.select(col("vec_id"), col("embedding"),
      assignCol(cids, flat).as("cid"))
    graft.table.Lineage.writeResumable(spark, postings,
      s"$root/postings", "cid", nParts)
  }

  /** Probe a [[buildIvfIndex]] index: queries (qid, qe) rank the
    * persisted centroids (broadcast), then ONLY the postings buckets
    * of the probed cells are opened (≤ kc `readForKey` bucket reads —
    * each prunes by the commit log, never a full-table scan). Ranking
    * is bit-identical to [[ivfTopK]] on the source table (the
    * q_ann_index gate shares q_ann_ivf_topk's oracle SQL). */
  def probeIvfIndex(spark: SparkSession, root: String,
                    queries: DataFrame, k: Int, nprobe: Int = 4,
                    nParts: Int = 8): DataFrame = {
    graft.expr.GraftFunctions.register(spark)
    val cents = graft.table.Lineage.read(spark, s"$root/centroids")
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("qsim").desc, col("cid"))
    val probes = queries.select(col("qid"), col("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("qsim", cosineFast(col("qe"), col("ce")))
      .withColumn("prank", row_number().over(wProbe))
      .where(col("prank") <= nprobe)
      .select(col("qid"), col("qe"), col("cid"))
    val probed = probes.select("cid").distinct().collect()
      .map(_.getLong(0)).toSeq
    require(probed.nonEmpty, "no probe cells - empty query set?")
    val posts = probed.map(c => graft.table.Lineage.readForKey(
        spark, s"$root/postings", "cid", c, nParts))
      .filter(_.columns.nonEmpty)
      .reduce(_.unionByName(_))
    val cand = posts.join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", cosineFast(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"))
  }

  // ---- product quantization (PQ) ANN -------------------------------
  //
  // The third ANN family next to SRP-LSH and IVF: each vector is
  // compressed to m sub-codes (one per dim/m-dim subspace, ks
  // sub-centroids each) and queries score candidates by ADC —
  // asymmetric distance computation, a per-query distance TABLE of
  // m×ks entries followed by m table lookups per candidate. At 10¹²
  // rows the codes column is m ints (conceptually m·log2(ks) bits =
  // 4 bytes at m=8, ks=16) against 256 bytes of f32: the scan becomes
  // memory-bound on a 64× smaller index, and the same codes compose
  // with the IVF cell join for a sub-linear probe. All distances run
  // on kmeans-exact-quantized integers (floor(x·2^20)) so the oracle
  // re-derives every code and every ADC score exactly in SQL.

  /** Flat FIXED-ID codebook: sub-centroids = the quantized sub-vectors
    * of the `ks` lowest vec_ids (deterministic — any SQL engine
    * re-derives the same codebook; the oracle gate's quantizer, like
    * [[ivfTopK]]'s fixed centroids). Layout
    * cb[(sub*ks + c)*dsub + i]; centroid index c = rank of the source
    * row in vec_id order. */
  /** Bounded collect of the `n` lowest-vec_id rows, vec_id-ascending:
    * (ids, embeddings) — the one driver job behind the fixed-id
    * codebook, the fixed-id centroid set, AND the code→vec_id label
    * map, so composed operators (ivfPqTopK, the q_pq_codes gate) don't
    * re-scan the table per constant. */
  private[graft] def lowestRows(emb: DataFrame, n: Int)
      : (Array[Long], Array[Array[Float]]) = {
    val rows = emb.orderBy(col("vec_id")).limit(n)
      .select(col("vec_id"), col("embedding")).collect()
    (rows.map(_.getLong(0)), rows.map(_.getSeq[Float](1).toArray))
  }

  private[graft] def pqCodebookFromRows(rows: Array[Array[Float]],
                                        dim: Int, m: Int,
                                        ks: Int): Array[Long] = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    require(rows.length >= ks, s"corpus has ${rows.length} < ks=$ks rows")
    val dsub = dim / m
    val cb = new Array[Long](m * ks * dsub)
    for (sub <- 0 until m; c <- 0 until ks; i <- 0 until dsub)
      cb((sub * ks + c) * dsub + i) =
        graft.expr.Kernels.pqQuant(rows(c)(sub * dsub + i))
    cb
  }

  def pqCodebookFixed(emb: DataFrame, dim: Int, m: Int, ks: Int): Array[Long] =
    pqCodebookFromRows(lowestRows(emb, ks)._2, dim, m, ks)

  /** DATA-ADAPTIVE flat codebook: per-subspace k-means (farthest-point
    * seeds + `iters` Lloyd rounds, Euclidean on the raw subspace — the
    * standard PQ training) over a bounded deterministic sample (the
    * `sampleN` lowest vec_ids), trained on the driver exactly like
    * [[ivfTopKSeeded]]'s coarse quantizer: one bounded collect, zero
    * distributed iterations, centroids quantized to the exact-integer
    * grid at the end so ADC stays engine-exact. Deployment path; the
    * fixed-id codebook stays as the oracle gate. */
  def pqCodebookTrained(emb: DataFrame, dim: Int, m: Int, ks: Int,
                        iters: Int = 5, sampleN: Int = 1024): Array[Long] = {
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub = dim / m
    val sample: Array[Array[Double]] = emb.orderBy(col("vec_id")).limit(sampleN)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    // farthestPointSeeds returns min(ks, n) seeds — fail with a clear
    // message rather than indexing past the center array below
    require(sample.length >= ks,
      s"pqCodebookTrained: sample has ${sample.length} < ks=$ks rows")
    val cb = new Array[Long](m * ks * dsub)
    for (sub <- 0 until m) {
      val subv = sample.map(v =>
        java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      val centers = graft.ops.Algorithms.lloyd(subv,
        graft.ops.Algorithms.farthestPointSeeds(subv, ks), iters)
      for (c <- 0 until ks; i <- 0 until dsub)
        cb((sub * ks + c) * dsub + i) =
          math.floor(centers(c)(i) * 1048576.0).toLong
    }
    cb
  }

  /** (vec_id, codes array<int>) under a flat codebook — the compressed
    * index. One broadcast constant (the codebook rides the codegen'd
    * [[graft.expr.PqCodes]] expression as a reference object), zero
    * shuffles: a pure projection over the corpus. */
  def pqCodes(emb: DataFrame, cb: Array[Long], m: Int, ks: Int): DataFrame =
    reg(emb).select(col("vec_id"),
      call_function("graft_pq_codes", col("embedding"), lit(cb),
        lit(m), lit(ks)).as("codes"))

  /** PQ ANN top-k by ADC under the FIXED-ID codebook (the oracle-gated
    * variant; [[pqTopKTrained]] is the deployment path). ADC ranks by
    * compressed SQUARED L2 distance — for cosine retrieval feed
    * L2-normalized embeddings (standard PQ practice: on the unit
    * sphere ||a−b||² = 2−2·cos, so the orderings coincide). Plan shape:
    * encode projection over the corpus (no shuffle) → broadcast of the
    * few query rows carrying their m×ks distance tables → per-pair m
    * table lookups → per-query top-k window. Returns
    * (qid, rank, vec_id, adist) with adist the exact integer ADC
    * score (ascending; ties → lowest vec_id). */
  def pqTopK(emb: DataFrame, queryFilter: Column, k: Int,
             dim: Int = 64, m: Int = 8, ks: Int = 16): DataFrame =
    pqTopKWithCodebook(emb, pqCodebookFixed(emb, dim, m, ks),
      queryFilter, k, m, ks)

  /** PQ ANN top-k under the trained (per-subspace k-means) codebook. */
  def pqTopKTrained(emb: DataFrame, queryFilter: Column, k: Int,
                    dim: Int = 64, m: Int = 8, ks: Int = 16,
                    iters: Int = 5, sampleN: Int = 1024): DataFrame =
    pqTopKWithCodebook(emb, pqCodebookTrained(emb, dim, m, ks, iters, sampleN),
      queryFilter, k, m, ks)

  private def pqTopKWithCodebook(emb0: DataFrame, cb: Array[Long],
                                 queryFilter: Column, k: Int,
                                 m: Int, ks: Int): DataFrame = {
    val emb = reg(emb0)
    val codes = pqCodes(emb, cb, m, ks)
    val q = emb.where(queryFilter)
      .select(col("vec_id").as("qid"),
        call_function("graft_pq_dtab", col("embedding"), lit(cb),
          lit(m), lit(ks)).as("dtab"))
    val cand = codes.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("adist",
        call_function("graft_pq_adc", col("dtab"), col("codes"), lit(ks)))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adist"))
  }

  /** IVF-PQ: the composed 10¹²-row ANN architecture — IVF cells prune
    * the candidate set to ~nprobe/kc of the corpus (sub-linear probe),
    * PQ ADC scores the survivors on compressed codes. The candidate
    * join ships (vec_id, cid, codes) — m ints, not the 256-byte f32
    * embedding — so at scale the probe is both sub-linear AND
    * memory-light; the embeddings column is never joined back at all.
    * Fixed-id coarse centroids + fixed-id codebook (the oracle-gated
    * variant, like [[ivfTopK]]/[[pqTopK]]); nprobe=kc degenerates to
    * exactly [[pqTopK]]'s full-scan ADC ranking (asserted in LshSpec).
    * Returns (qid, rank, vec_id, adist). */
  def ivfPqTopK(emb0: DataFrame, queryFilter: Column, k: Int,
                kc: Int = 16, nprobe: Int = 4,
                dim: Int = 64, m: Int = 8, ks: Int = 16): DataFrame = {
    val emb = reg(emb0)
    val spark = emb.sparkSession
    import spark.implicits._
    // ONE bounded collect feeds the codebook, the centroid reference
    // object, and the probe-side centroid rows (the kc and ks lowest
    // vec_ids coincide on a contiguous id domain, like the oracle's)
    val (ids, rows) = lowestRows(emb, math.max(kc, ks))
    val cb = pqCodebookFromRows(rows.take(ks), dim, m, ks)
    val cids = ids.take(kc)
    val flat = rows.take(kc).flatten
    val cents = cids.zip(rows.take(kc)).toSeq.toDF("cid", "ce")
    // the whole index build is ONE projection over the corpus: cell id
    // and codes are both per-row codegen calls — no crossJoin, no
    // window shuffle, no codes self-join
    val indexed = emb.select(col("vec_id"),
      assignCol(cids, flat).as("cid"),
      call_function("graft_pq_codes", col("embedding"), lit(cb),
        lit(m), lit(ks)).as("codes"))
    val q = emb.where(queryFilter)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        call_function("graft_pq_dtab", col("embedding"), lit(cb),
          lit(m), lit(ks)).as("dtab"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("qsim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("qsim", cosineFast(col("qe"), col("ce")))
      .withColumn("prank", row_number().over(wProbe))
      .where(col("prank") <= nprobe)
      .select(col("qid"), col("dtab"), col("cid"))
    val cand = indexed.join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("adist",
        call_function("graft_pq_adc", col("dtab"), col("codes"), lit(ks)))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist").asc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adist"))
  }

  /** Symmetric int8 quantization of an embedding column — the memory
    * move that makes a 10¹²-row ANN index feasible (4× smaller than
    * f32, SIMD-friendly dot products): per-vector scale = max |v|,
    * q_i = floor(127·v_i/scale) ∈ [−127, 127]. All steps (float→
    * double widen, IEEE divide, floor) are correctly-rounded and
    * engine-independent, so the oracle re-derives q exactly in SQL.
    * Returns (vec_id, scale, q array<int>); scale 0 (zero vector) →
    * all-zero q. */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
        array_max(transform(d(col("embedding")), x => abs(x))).as("scale"))
      .select(col("vec_id"), col("scale"),
        when(col("scale") === 0.0,
          transform(col("embedding"), _ => lit(0).cast("int")))
        .otherwise(transform(d(col("embedding")),
          x => floor(x * lit(127.0) / col("scale")).cast("int")))
        .as("q"))

  /** CORPUS-SCALE embedding near-dup pairs: LSH bucket-collision
    * candidates (any of `tables` tables) + exact cosine verification —
    * the no-crossJoin replacement for the bounded all-pairs query. */
  def embNearDupLsh(emb: DataFrame, dim: Int, threshold: Double,
                    nb: Int, tables: Int = 4): DataFrame = {
    val buckets = lshBuckets(emb, dim, nb, tables)
    val cand = buckets.select(col("vec_id").as("id_a"), col("tj"), col("bk"))
      .join(buckets.select(col("vec_id").as("id_b"), col("tj"), col("bk")),
        Seq("tj", "bk"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("ea")), Seq("id_a"))
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("eb")), Seq("id_b"))
      .where(cosineFast(col("ea"), col("eb")) > threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication" — public method):
    * k-means-cluster the embeddings, then prune near-duplicates
    * WITHIN each cluster, keeping the lowest vec_id of every
    * near-dup pair. Clustering is the bit-reproducible exact-integer
    * k-means (oracle-replayable); similarity is the bit-identical
    * [[cosine]] expression. `pairs` picks the within-cluster pairing:
    * exact all-pairs for oracle-bounded slices (default), or the
    * LSH-candidate path for corpus scale — cluster equality is then
    * one more equi-join key on the candidate pairs, so the plan stays
    * bucket-join + broadcast, never quadratic. Returns the SURVIVORS
    * (vec_id, cluster). */
  def semDeDup(spark: SparkSession, emb: DataFrame, k: Int, iters: Int,
               threshold: Double, exactPairs: Boolean = true,
               nb: Int = 4): DataFrame = {
    val asg = graft.ops.Algorithms.kmeansEmbeddingsExact(spark, emb, k, iters)
    val dupIds =
      if (exactPairs) {
        val wEmb = asg.join(emb.select("vec_id", "embedding"), Seq("vec_id"))
        val a = wEmb.select(col("cluster"), col("vec_id").as("id_a"),
          col("embedding").as("ea"))
        val b = wEmb.select(col("cluster"), col("vec_id").as("id_b"),
          col("embedding").as("eb"))
        a.join(b, Seq("cluster"))
          .where(col("id_a") < col("id_b"))
          .where(cosine(col("ea"), col("eb")) > threshold)
          .select(col("id_b").as("vec_id")).distinct()
      } else {
        embNearDupLsh(emb, 64, threshold, nb, tables = 16)
          .join(asg.select(col("vec_id").as("id_a"),
            col("cluster").as("ca")), Seq("id_a"))
          .join(asg.select(col("vec_id").as("id_b"),
            col("cluster").as("cb")), Seq("id_b"))
          .where(col("ca") === col("cb"))
          .select(col("id_b").as("vec_id")).distinct()
      }
    asg.join(dupIds, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"))
  }

  /** Image↔caption alignment score + corpus-mean keep flag — the
    * CLIP-score-shaped filter of web-scale image curation (LAION-style
    * pipelines drop rows whose image/text embeddings disagree; here
    * both embeddings are the engine's own deterministic features, so
    * the filter is oracle-exact end to end).
    *
    * Image side: the 64-d 2⁻²⁰-quantized block-mean embedding
    * (`Codec.blockMeanEmbedding`, the q_img_embedding vector). Caption
    * side: a 64-bucket hashed bag-of-words (md5 first-3-hex-digits mod
    * 64 per token — the Cms.hexVal derivation). Score = integer dot
    * product; keep = score ≥ corpus mean, tested as
    * `score·n ≥ Σscores` so no division happens.
    *
    * Scale posture: the score is a per-row map (decode + tokenize, no
    * join — the caption rides in the same row as the pixels); the
    * threshold is one scalar aggregate broadcast back as a literal
    * cross join — two passes over the corpus, zero sorts, zero
    * per-key windows. At 10¹² rows the mean could equally be a
    * sampled quantile; the mean keeps the gate value-exact. */
  def clipScores(images: DataFrame): DataFrame = {
    import graft.core.Codec
    val embU = udf((bytes: Array[Byte], w: Int, h: Int, fmt: String) => {
      val p = Codec.decode(bytes, w, h,
        Codec.bandsStored(fmt, graft.gen.Synth.NumBands), fmt)(0)
      Codec.blockMeanEmbedding(p, w, h)
        .map(m => math.floor(m * 1048576.0).toLong)
    })
    import graft.sketch.Cms.hexVal
    val tokHash = md5(col("tok"))
    val capBuckets = images
      .select(col("image_id"),
        explode(split(col("caption"), " ")).as("tok"))
      .withColumn("bi", (hexVal(tokHash, 1) * 256 + hexVal(tokHash, 2) * 16
        + hexVal(tokHash, 3)).cast("long") % 64)
      .groupBy("image_id", "bi").agg(count(lit(1)).as("cnt"))
    val scores = images
      .select(col("image_id"),
        posexplode(embU(col("bytes"), col("w").cast("int"),
          col("h").cast("int"), col("fmt"))).as(Seq("bi", "mq")))
      .select(col("image_id"), col("bi").cast("long").as("bi"), col("mq"))
      .join(capBuckets, Seq("image_id", "bi"), "left")
      .groupBy("image_id")
      .agg(coalesce(sum(col("mq") * col("cnt")), lit(0L)).as("score"))
    val tot = scores.agg(count(lit(1)).as("n"), sum("score").as("ts"))
    scores.crossJoin(broadcast(tot))
      .select(col("image_id"), col("score"),
        when(col("score") * col("n") >= col("ts"), 1L).otherwise(0L)
          .as("keep"))
  }
}
