package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a near-dup pair list — the
  * CLUSTERING stage a corpus-scale dedup pipeline runs after candidate
  * generation + verification (pairs alone don't dedup: near-duplicity
  * is transitive in practice, so the unit of removal is the component,
  * keep-one-per-component).
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
  * and Beyond", SoCC 2014 — public literature). Each round is two
  * hash-shuffle stages (groupBy min + equi-join back); the edge set
  * converges to per-component stars centered on the component minimum
  * in O(log²  n) rounds (O(log n) observed). No driver-side iteration
  * over rows — the driver sees only a per-round convergence checksum.
  *
  * Scale posture at 10¹² rows: every stage is an equi-shuffle on node
  * id; edge count never grows beyond the input degree sum (large-star
  * only re-targets larger neighbors, small-star only smaller), and the
  * heavy-hub skew that worries label propagation is exactly what the
  * star operations flatten first. Convergence checking is a count +
  * order-insensitive hash aggregate, not a subtract/except.
  */
object ConnectedComponents {

  /** Canonicalize to undirected unique edges u < v. */
  private def canon(pairs: DataFrame): DataFrame =
    pairs.toDF("a", "b")
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
              greatest(col("a"), col("b")).as("v"))
      .distinct()

  /** Large-star: for every node u, connect each STRICTLY LARGER
    * neighbor to min(Γ⁺(u)) (its neighborhood incl. u). */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = nbrs.groupBy("u").agg(min(least(col("u"), col("v"))).as("m"))
    nbrs.join(m, "u")
      .where(col("v") > col("u"))
      .select(least(col("v"), col("m")).as("u"),
              greatest(col("v"), col("m")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: for every node u, connect each neighbor v ≤ u (and u
    * itself) to the minimum of those neighbors. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
                       least(col("u"), col("v")).as("v"))
    val m = dir.groupBy("u").agg(min(col("v")).as("m"))
    dir.join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(m.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
              greatest(col("u"), col("v")).as("v"))
      .distinct()
  }

  /** LAZY-checkpoint + order-insensitive convergence fingerprint
    * (#edges, bit_xor of per-edge hashes — overflow-free under ANSI)
    * in ONE action: the fingerprint aggregate is the first job over
    * the lazily-checkpointed edges, so it materializes the checkpoint
    * blocks while computing the (count, xor) row — one job per round
    * instead of checkpoint-then-fingerprint's two. The fingerprint row
    * is still the only thing the driver ever collects. */
  private def ckptFingerprint(df: DataFrame): (DataFrame, (Long, Long)) = {
    val c = df.localCheckpoint(false)
    val r = c.select(xxhash64(col("u"), col("v")).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).head()
    (c, (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
  }

  /** Rounds taken by the most recent [[starEdges]] call (diagnostic —
    * read by GraphSpec's one-action-per-round assertion). */
  @volatile var lastRounds: Int = 0

  /** One large-star + small-star round over a canonical edge set —
    * exposed for plan inspection (PlanDump) and round-level tests; the
    * fixpoint loop is [[starEdges]]. */
  def starRound(edges: DataFrame): DataFrame = smallStar(largeStar(edges))

  /** Canonical undirected unique edges (u < v) from an id pair list. */
  def canonEdges(pairs: DataFrame): DataFrame = canon(pairs)

  /** Run star rounds until the edge set is a fixpoint; returns the
    * star edges (node → its component min, for every non-min node).
    *
    * Each round ends in a lazy `localCheckpoint` whose materializing
    * job IS the convergence-fingerprint aggregate (one job per round —
    * see [[ckptFingerprint]]); iterative DataFrames otherwise double
    * their logical plan every round (lineage grows as 2^rounds:
    * analysis/codegen cost explodes long before data does). On a real
    * cluster swap in reliable `checkpoint()` (or a per-round Lineage
    * table write) so a lost executor can't lose a round. */
  def starEdges(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // each round's lazy checkpoint is materialized by its fingerprint
    // job, so the previous generation is provably dead at commit() —
    // freed on the spot instead of leaking one block set per round
    // into the session (graft.ops.Ckpt scaladoc; guide §5)
    val gen = new graft.ops.CheckpointGen(pairs.sparkSession.sparkContext)
    var (e, fp) = ckptFingerprint(canon(pairs))
    gen.commit()
    var done = false
    var it = 0
    while (!done && it < maxIter) {
      val (next, nfp) = ckptFingerprint(smallStar(largeStar(e)))
      gen.commit()
      e = next
      done = nfp == fp
      fp = nfp
      it += 1
    }
    lastRounds = it
    require(done, s"connectedComponents did not converge in $maxIter rounds")
    e
  }

  /** (id, comp) for EVERY node in `nodes` (single id column): comp =
    * min id of the node's component; isolated nodes map to themselves. */
  def components(nodes: DataFrame, pairs: DataFrame,
                 maxIter: Int = 50): DataFrame = {
    // converged star edges are canonical (u = component min, v = member)
    val stars = starEdges(pairs, maxIter)
      .select(col("u").as("comp"), col("v").as("id"))
    nodes.toDF("id")
      .join(stars, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Dedup-cluster view over `documents`: near-dup edges from the
    * corpus-scale MinHash-LSH pair pipeline
    * ([[graft.text.TextOps.jaccardPairsLsh]]), components over them,
    * keep = the component minimum. Returns one row per document:
    * (doc_id, cluster_id, keep) — the drop set is `where(!keep)`. */
  def dedupClusters(docs: DataFrame, threshold: Double,
                    nSigs: Int = 4): DataFrame = {
    val pairs = graft.text.TextOps.jaccardPairsLsh(docs, threshold, nSigs)
      .select("id_a", "id_b")
    components(docs.select("doc_id"), pairs)
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
              (col("id") === col("comp")).as("keep"))
  }
}
