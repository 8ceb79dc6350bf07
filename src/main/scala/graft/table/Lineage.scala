package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Iceberg-emulating table layer (no Iceberg runtime ships offline —
  * SURVEY.md §7.6): hash-partitioned parquet + an explicit commit log
  * giving the north rule's observable properties — atomic commits,
  * per-partition lineage + row/byte metrics, and resume-from-last-
  * checkpoint.
  *
  * Layout under `root/`:
  *   part=<i>/…parquet      one bucket per hash partition (idempotent:
  *                          each bucket written via overwrite)
  *   _commits.jsonl         one line per committed bucket:
  *                          {part, rows, bytes, ts} — appended
  *                          atomically (tmp + ATOMIC_MOVE per commit)
  *
  * `writeResumable` skips buckets already present in the log, so a
  * restarted job redoes only uncommitted work — the reference has no
  * such machinery (single-process chunk loops); this is the
  * cluster-scale replacement for its temp-file lifecycle.
  */
object Lineage {

  final case class Commit(part: Int, rows: Long, bytes: Long, ts: Long)

  def logPath(root: String) = Paths.get(root, "_commits.jsonl")

  def committedParts(root: String): Set[Int] = {
    val p = logPath(root)
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p).asScala
      .filter(_.contains("\"part\":"))
      .map(l => l.split("\"part\":")(1).takeWhile(c => c.isDigit).toInt)
      .toSet
  }

  private def appendCommit(root: String, c: Commit): Unit = {
    val line = s"""{"part":${c.part},"rows":${c.rows},"bytes":${c.bytes},"ts":${c.ts}}\n"""
    Files.write(logPath(root), line.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def dirBytes(dir: java.nio.file.Path): Long =
    if (!Files.exists(dir)) 0L
    else Files.walk(dir).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum

  /** Write `df` bucketed by hash(keyCol) % nParts with a commit log.
    * Returns the number of buckets written THIS invocation (0 on a
    * fully-committed resume). Each bucket is one atomic unit: parquet
    * overwrite, then a log append; a crash between the two redoes the
    * bucket idempotently. */
  def writeResumable(spark: SparkSession, df: DataFrame, root: String,
                     keyCol: String, nParts: Int): Int = {
    Files.createDirectories(Paths.get(root))
    val done = committedParts(root)
    val todo = (0 until nParts).filterNot(done)
    val withPart = df.withColumn("_part", pmod(hash(col(keyCol)), lit(nParts)))
    var written = 0
    todo.foreach { p =>
      val bucket = withPart.where(col("_part") === p).drop("_part")
      val dir = Paths.get(root, s"part=$p")
      bucket.write.mode("overwrite").parquet(dir.toString)
      val rows = spark.read.parquet(dir.toString).count()
      appendCommit(root, Commit(p, rows, dirBytes(dir),
        System.currentTimeMillis()))
      written += 1
    }
    written
  }

  /** Read back a resumable table (only committed buckets). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val parts = committedParts(root).toSeq.sorted
      .map(p => s"$root/part=$p")
    spark.read.parquet(parts: _*)
  }

  /** Lineage metrics table: one row per committed bucket. */
  def metrics(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val lines =
      if (!Files.exists(logPath(root))) Seq.empty[String]
      else Files.readAllLines(logPath(root)).asScala.toSeq
    val parsed = lines.map { l =>
      def field(n: String): Long =
        l.split(s""""$n":""")(1).takeWhile(c => c.isDigit || c == '-').toLong
      (field("part").toInt, field("rows"), field("bytes"), field("ts"))
    }
    parsed.toDF("part", "rows", "bytes", "ts")
  }

  /** Stage-level row/byte observation (`observe`): attach named metrics
    * to a DataFrame; read them from the returned observation after an
    * action — the per-stage metrics feed for the commit log. */
  def observed(df: DataFrame, name: String): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, count(lit(1)).as("rows")), obs)
  }
}
