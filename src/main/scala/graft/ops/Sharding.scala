package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WebDataset-style SHARD PACKING — the materialization stage of an
  * image training pipeline: payloads are laid into byte-budgeted
  * shard files (one tar per shard in a real writer), each shard the
  * work of exactly one writer task.
  *
  * Contract: writer = md5(image_id) mod `nWriters` (content-
  * independent, reshuffle-stable); within a writer, images pack in
  * image_id order by GREEDY first-fit — an image goes into the
  * current shard iff it fits in the remaining budget, else it opens
  * the next shard (an oversized image gets a shard to itself). Emits
  * (image_id, writer, nbytes, shard, offset): `offset` is the byte
  * position inside the shard, so the assignment doubles as the tar
  * index.
  *
  * Scale posture: greedy packing is inherently sequential PER WRITER,
  * so the writer axis is the parallelism — one hash shuffle to
  * co-locate each writer's rows, a partition-local sort, then a
  * single O(1)-state streaming pass (`mapPartitions`); no window over
  * a global order, no driver state. At 10¹² images you raise
  * `nWriters` to the cluster's write parallelism and every writer
  * streams its items once. */
object Sharding {

  def packShards(imgs: DataFrame, budget: Long, nWriters: Int): DataFrame = {
    val spark = imgs.sparkSession
    import spark.implicits._
    imgs.select(col("image_id").cast("string").as("image_id"),
        length(col("bytes")).cast("long").as("nbytes"),
        pmod(graft.text.TextOps.md5Bucket(col("image_id")),
          lit(nWriters)).cast("long").as("writer"))
      .as[(String, Long, Long)]
      .repartition(col("writer"))
      .sortWithinPartitions("writer", "image_id")
      .mapPartitions { it =>
        // a partition holds one or more COMPLETE writers (hash
        // partitioning on writer); state resets at writer boundaries
        var curWriter = Long.MinValue
        var shard = 0L
        var used = 0L
        it.map { case (id, n, w) =>
          if (w != curWriter) { curWriter = w; shard = 0L; used = 0L }
          if (used + n > budget && used > 0L) { shard += 1L; used = 0L }
          val off = used
          used += n
          (id, w, n, shard, off)
        }
      }
      .toDF("image_id", "writer", "nbytes", "shard", "offset")
  }

  /** ASPECT-RATIO BUCKETED BATCHING — how multimodal training jobs
    * batch variable-resolution images: every image is assigned to the
    * nearest aspect-ratio bucket from a fixed lattice, then packed
    * into fixed-size batches within its bucket so a batch shares one
    * resize target (no mixed-AR padding waste).
    *
    * Nearest bucket = argmin over buckets of |w/h − bw/bh|, evaluated
    * as the IEEE double |w·bh − h·bw| / bh (exact integer numerator,
    * one correctly-rounded divide — bit-identical in any engine);
    * ties → lowest bucket index. Batching: writer = md5(image_id) mod
    * `nWriters` (content-independent, reshuffle-stable, same contract
    * as [[packShards]]); within (writer, bucket), images order by
    * image_id and fill batches of `batchSize` (batch_idx, slot).
    *
    * Scale posture: bucket assignment is a per-row projection;
    * batching is one window per (writer, bucket) — parallelism =
    * nWriters × |buckets|, so at 10¹² images you raise nWriters to
    * the cluster's width exactly like shard packing; no global sort,
    * no driver state. */
  def arBuckets(imgs: DataFrame, buckets: Seq[(Int, Int)],
                batchSize: Int, nWriters: Int): DataFrame = {
    require(buckets.nonEmpty && batchSize > 0 && nWriters > 0)
    val scored = buckets.zipWithIndex.map { case ((bw, bh), i) =>
      struct(
        (abs(col("w") * bh - col("h") * bw).cast("double") /
          lit(bh.toDouble)).as("d"),
        lit(i.toLong).as("i"), lit(bw.toLong).as("bw"), lit(bh.toLong).as("bh"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("writer"), col("bucket"))
      .orderBy(col("image_id"))
    imgs
      // struct ordering is lexicographic (d, then i): array_min IS the
      // argmin with the ties → lowest-index rule
      .withColumn("bk", array_min(array(scored: _*)))
      .select(col("image_id"),
        col("bk.i").as("bucket"), col("bk.bw").as("bw"), col("bk.bh").as("bh"),
        pmod(graft.text.TextOps.md5Bucket(col("image_id")),
          lit(nWriters)).cast("long").as("writer"))
      .withColumn("rn", row_number().over(w) - 1)
      .select(col("image_id"), col("bucket"), col("bw"), col("bh"),
        col("writer"),
        floor(col("rn") / batchSize).cast("long").as("batch_idx"),
        (col("rn") % batchSize).cast("long").as("slot"))
  }

  /** End-to-end IMAGE curation pipeline — the image-side sibling of
    * `TextOps.curate`, composing four stages into one per-image
    * decision row:
    *
    *   1. pass_meta — resolution guardrail (w·h ≤ maxPixels): a pure
    *      per-row flag.
    *   2. is_canonical — caption-exact keep-one: the lowest image_id
    *      per caption survives (the text-dedup half of an image+
    *      caption corpus; the PERCEPTUAL near-dup variant — banded
    *      pHash + connected components — is the q_phash_clusters
    *      machinery and composes the same way, but the synthetic
    *      smallRaw fixture's linear-ramp aHashes collapse into two
    *      clusters, which would leave this gate's survivor path
    *      untested).
    *   3. AR-bucket batch assembly of the SURVIVORS (keep =
    *      pass_meta·is_canonical) — batches must be built after
    *      filtering, which is what makes the composition a pipeline
    *      and not five independent queries.
    *   4. Shard packing of the survivors' real payload bytes.
    *
    * Dropped images carry NULL bucket/batch/writer/shard/offset.
    * Scale: stages 1-2 are a projection + one caption-keyed window;
    * stages 3-4 window per (writer[, bucket]) — nWriters is the
    * parallelism knob. */
  def curateImages(imgs: DataFrame, buckets: Seq[(Int, Int)],
                   batchSize: Int, budget: Long, nWriters: Int,
                   maxPixels: Long): DataFrame = {
    val flag = (c: Column) => when(c, 1L).otherwise(0L)
    val wCap = org.apache.spark.sql.expressions.Window
      .partitionBy(col("caption")).orderBy(col("image_id"))
    val flags = imgs.select(col("image_id"), col("caption"),
        flag(col("w") * col("h") <= maxPixels).as("pass_meta"))
      .withColumn("is_canonical",
        flag(row_number().over(wCap) === 1))
      .drop("caption")
      .withColumn("keep", col("pass_meta") * col("is_canonical"))
    val kept = imgs.join(flags.where(col("keep") === 1L)
      .select("image_id"), Seq("image_id"))
    val ab = arBuckets(kept, buckets, batchSize, nWriters)
      .select(col("image_id"), col("bucket"), col("batch_idx"))
    val sh = packShards(kept, budget, nWriters)
      .select(col("image_id"), col("writer"), col("shard"), col("offset"))
    flags
      .join(ab, Seq("image_id"), "left")
      .join(sh, Seq("image_id"), "left")
      .select(col("image_id"), col("pass_meta"), col("is_canonical"),
        col("keep"), col("bucket"), col("batch_idx"), col("writer"),
        col("shard"), col("offset"))
  }
}
