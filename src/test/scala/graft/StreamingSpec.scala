package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.CellStream
import graft.index.CellGrid

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-stream-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streaming cell counts over a memory stream of image rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val df = input.toDF().toDF("image_id", "x0m", "y0m")
    val counts = CellStream.cellCounts(df, res = 7)
    val q = counts.writeStream.format("memory")
      .queryName("cells").outputMode("complete").start()
    // two images in the same res-7 cell, one in another
    input.addData(("a", 0L, 0L), ("b", 100L, 100L), ("c", 50000L, 0L))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM cells ORDER BY cell")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).sum == 3)
    val cellAB = CellGrid.cellOf(7, 0, 0)
    val packed = CellGrid.ixOf(cellAB) * CellGrid.IxMul + CellGrid.iyOf(cellAB)
    assert(rows.contains((packed, 2L)))
    // incremental update: a fourth image lands in the first cell
    input.addData(("d", 200L, 50L))
    q.processAllAvailable()
    val rows2 = spark.sql("SELECT n_images FROM cells WHERE cell = " + packed)
      .collect().map(_.getLong(0))
    assert(rows2.sameElements(Array(3L)))
    q.stop()
  }
}
