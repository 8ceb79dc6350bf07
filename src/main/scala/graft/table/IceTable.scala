package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table abstraction the engine writes/reads through. The north rule
  * names Iceberg tables; this sandbox ships NO Iceberg runtime jar
  * (offline — SURVEY.md §7.6), so the default binding emulates the
  * observable properties the rule actually needs — atomic commits,
  * per-partition lineage + row/byte metrics, resume from the last
  * committed checkpoint — on partitioned Parquet + a commit log
  * ([[Lineage]]). If an Iceberg runtime appears on the classpath, bind
  * [[IcebergTable]] instead; call sites are unchanged.
  */
trait IceTable {
  def write(spark: SparkSession, df: DataFrame, ident: String,
            keyCol: String, nParts: Int): Int
  def read(spark: SparkSession, ident: String): DataFrame
  def metrics(spark: SparkSession, ident: String): DataFrame
}

/** Default offline binding: Parquet buckets + explicit commit log. */
object ParquetCommitLogTable extends IceTable {
  override def write(spark: SparkSession, df: DataFrame, ident: String,
                     keyCol: String, nParts: Int): Int =
    Lineage.writeResumable(spark, df, ident, keyCol, nParts)
  override def read(spark: SparkSession, ident: String): DataFrame =
    Lineage.read(spark, ident)
  override def metrics(spark: SparkSession, ident: String): DataFrame =
    Lineage.metrics(spark, ident)
}

/** Iceberg binding (requires iceberg-spark-runtime on the classpath;
  * not loadable in this sandbox — kept as the documented swap point). */
class IcebergTable extends IceTable {
  override def write(spark: SparkSession, df: DataFrame, ident: String,
                     keyCol: String, nParts: Int): Int = {
    df.writeTo(ident).createOrReplace(); nParts
  }
  override def read(spark: SparkSession, ident: String): DataFrame =
    spark.read.format("iceberg").load(ident)
  override def metrics(spark: SparkSession, ident: String): DataFrame =
    spark.read.format("iceberg").load(s"$ident.files")
}
