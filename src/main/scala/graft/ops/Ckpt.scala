package graft.ops

import org.apache.spark.SparkContext

/** Checkpoint-block hygiene for iterative operators — the bpeTrain
  * discipline (TextOps.bpeTrain's scaladoc has the full rationale),
  * factored out: each loop round replaces its working DataFrame, but
  * the superseded round's localCheckpoint blocks stay pinned in the
  * block manager until the session dies. In a long-lived JVM (the
  * driver's ~190-gate bench run) hundreds of leaked generations
  * permanently occupy the unified-memory storage region — execution
  * can only evict storage down to `spark.memory.storageFraction` —
  * and every later query pays for it in spill and GC (guide §5:
  * unpersist when done; measured before this hygiene: late-suite
  * gates ran 2–4× their isolated walls).
  *
  * SAFETY RULE (why only MATERIALIZED generations may be freed): a
  * localCheckpoint truncates lineage, so once a generation's blocks
  * are dropped they can never be recomputed — freeing is sound only
  * when no future job will read them. A generation is provably dead
  * when the NEXT generation has fully materialized (its blocks, not
  * the plan, are what later rounds read). Loops whose rounds stay
  * lazy until one terminal action (e.g. LabelProp) must NOT free
  * anything mid-loop.
  *
  * Spark logs "RDD N was locally checkpointed, its lineage has been
  * truncated and cannot be recomputed after unpersisting" for every
  * freed generation — that is exactly the property the safety rule
  * above relies on (nothing will ever read the freed generation);
  * the warning is expected and benign here.
  */
object Ckpt {

  /** Snapshot of the ids of currently-persisted RDDs. */
  def persistedIds(sc: SparkContext): Set[Int] =
    sc.getPersistentRDDs.keySet.toSet

  /** Unpersist exactly `ids` (non-blocking). */
  def free(sc: SparkContext, ids: Set[Int]): Unit =
    for (id <- ids; rdd <- sc.getPersistentRDDs.get(id))
      rdd.unpersist(blocking = false)
}

/** Generational tracker over [[Ckpt]]: instantiate AFTER any seed
  * checkpoints that must outlive the loop (they become foreign and
  * are never freed); call `commit()` at the end of each round, after
  * the round's checkpoints are MATERIALIZED — the previous round's
  * generation is freed on the spot, bounding residency at two
  * generations. The final generation stays alive for the caller. */
final class CheckpointGen(sc: SparkContext) {
  private var mark = Ckpt.persistedIds(sc)
  private var prev = Set.empty[Int]
  def commit(): Unit = {
    val now = Ckpt.persistedIds(sc)
    val fresh = now -- mark
    Ckpt.free(sc, prev)
    mark = now -- prev
    prev = fresh
  }
}
