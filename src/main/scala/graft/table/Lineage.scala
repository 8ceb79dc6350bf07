package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Iceberg-emulating table layer (no Iceberg runtime ships offline —
  * SURVEY.md §7.6): hash-partitioned parquet + an explicit commit log
  * giving the north rule's observable properties — atomic commits,
  * per-partition lineage + row/byte metrics, and resume-from-last-
  * checkpoint.
  *
  * Layout under `root/`:
  *   part=<i>/…parquet      one bucket per hash partition, promoted
  *                          into place with an atomic directory move
  *   _commits.jsonl         one line per committed bucket:
  *                          {part, rows, bytes, ts} — appended with
  *                          O_APPEND; readers accept only lines that
  *                          parse COMPLETELY, so a torn line from a
  *                          crash mid-append is ignored and the bucket
  *                          is simply redone on resume
  *
  * `writeResumable` scans the source exactly ONCE per invocation
  * (dynamic-partition write to a staging dir, then per-bucket atomic
  * promote + commit), skipping buckets already in the log — a
  * restarted job redoes only uncommitted work. Per-bucket row counts
  * come from parquet footers (metadata-only), not a data re-read.
  * The reference has no such machinery (single-process chunk loops);
  * this is the cluster-scale replacement for its temp-file lifecycle.
  */
object Lineage {

  final case class Commit(part: Int, rows: Long, bytes: Long, ts: Long)

  def logPath(root: String): Path = Paths.get(root, "_commits.jsonl")

  private val CommitRe =
    """\{"part":(\d+),"rows":(\d+),"bytes":(\d+),"ts":(\d+)\}""".r

  /** Strict whole-line parse: torn/partial lines (crash mid-append)
    * yield None and the bucket counts as uncommitted. */
  def parseCommit(line: String): Option[Commit] = line.trim match {
    case CommitRe(p, r, b, t) => Some(Commit(p.toInt, r.toLong, b.toLong, t.toLong))
    case _ => None
  }

  private def commits(root: String): Seq[Commit] = {
    val p = logPath(root)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p).asScala.toSeq.flatMap(parseCommit)
  }

  def committedParts(root: String): Set[Int] = commits(root).map(_.part).toSet

  private def appendCommit(root: String, c: Commit): Unit = {
    val p = logPath(root)
    // a torn final line (crash mid-append) has no trailing newline —
    // terminate it first so this commit starts on its own line instead
    // of concatenating into the garbage
    val needsNl = Files.exists(p) && Files.size(p) > 0 && {
      val ch = Files.newByteChannel(p, StandardOpenOption.READ)
      try {
        ch.position(ch.size() - 1)
        val b = java.nio.ByteBuffer.allocate(1)
        ch.read(b)
        b.get(0) != '\n'.toByte
      } finally ch.close()
    }
    val line = s"""{"part":${c.part},"rows":${c.rows},"bytes":${c.bytes},"ts":${c.ts}}\n"""
    Files.write(p, ((if (needsNl) "\n" else "") + line).getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def dirBytes(dir: Path): Long =
    if (!Files.exists(dir)) 0L
    else Files.walk(dir).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum

  private def deleteRec(dir: Path): Unit =
    if (Files.exists(dir))
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)

  private def hasParquet(dir: Path): Boolean =
    Files.exists(dir) && Files.list(dir).iterator().asScala
      .exists(_.getFileName.toString.endsWith(".parquet"))

  private def hasParquetRec(dir: Path): Boolean =
    Files.exists(dir) && Files.walk(dir).iterator().asScala
      .exists(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))

  /** Write `df` bucketed by hash(keyCol) % nParts with a commit log.
    * Returns the number of buckets committed THIS invocation (0 on a
    * fully-committed resume).
    *
    * ONE source scan: the pending buckets are written together via
    * `partitionBy("_part")` into a staging directory; each bucket is
    * then promoted with an atomic directory move and logged. A crash
    * anywhere redoes only unpromoted-or-unlogged buckets idempotently
    * (promote clears any partial previous attempt first). Row metrics
    * are read from parquet footers — no second pass over the data. */
  def writeResumable(spark: SparkSession, df: DataFrame, root: String,
                     keyCol: String, nParts: Int): Int = {
    Files.createDirectories(Paths.get(root))
    val done = committedParts(root)
    val todo = (0 until nParts).filterNot(done)
    if (todo.isEmpty) return 0
    val withPart = df.withColumn("_part", pmod(hash(col(keyCol)), lit(nParts)))
    val pending =
      if (done.isEmpty) withPart
      else withPart.where(!col("_part").isin(done.toSeq: _*))
    val stage = Paths.get(root, s"_stage")
    deleteRec(stage)
    pending.write.partitionBy("_part").mode("overwrite").parquet(stage.toString)
    // per-bucket row counts in ONE footer-only Spark job over the stage
    // (a per-bucket read.count() loop serializes nParts driver jobs)
    val counts: Map[Int, Long] =
      if (!hasParquetRec(stage)) Map.empty
      else spark.read.parquet(stage.toString)
        .groupBy("_part").count().collect()
        .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    var written = 0
    todo.foreach { p =>
      val src = stage.resolve(s"_part=$p")
      val dst = Paths.get(root, s"part=$p")
      deleteRec(dst) // clear partial previous attempt (idempotent redo)
      if (Files.exists(src))
        Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      else
        Files.createDirectories(dst) // empty bucket
      appendCommit(root, Commit(p, counts.getOrElse(p, 0L), dirBytes(dst),
        System.currentTimeMillis()))
      written += 1
    }
    deleteRec(stage)
    written
  }

  /** Read back a resumable table (only committed, non-empty buckets).
    * A committed table whose buckets are ALL empty reads back as an
    * empty (schemaless) DataFrame instead of throwing on a zero-path
    * parquet() call. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val parts = committedParts(root).toSeq.sorted
      .map(p => Paths.get(root, s"part=$p"))
      .filter(hasParquet)
      .map(_.toString)
    if (parts.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(parts: _*)
  }

  /** Lineage metrics table: one row per committed bucket. */
  def metrics(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    commits(root).map(c => (c.part, c.rows, c.bytes, c.ts))
      .toDF("part", "rows", "bytes", "ts")
  }

  /** Stage-level row/byte observation (`observe`): attach named metrics
    * to a DataFrame; read them from the returned observation after an
    * action — the per-stage metrics feed for the commit log. */
  def observed(df: DataFrame, name: String): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, count(lit(1)).as("rows")), obs)
  }
}
