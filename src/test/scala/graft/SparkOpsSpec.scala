package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.Geom
import graft.gen.Synth
import graft.ops._
import graft.table.Lineage
import java.nio.file.Files

class SparkOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def images(n: Long): DataFrame = Synth.imagesRange(spark, n, 4)
  private def polys(m: Long): DataFrame = Synth.polygonsRange(spark, m)

  test("joinRects matches brute-force theta join (all strategies)") {
    val im = images(3000).cache()
    val po = polys(40).cache()
    val brute = im.crossJoin(po)
      .where(col("x0m") < col("px1m") && col("px0m") < col("x1m") &&
             col("y0m") < col("py1m") && col("py0m") < col("y1m"))
      .select("image_id", "fid")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    for ((bcast, salt) <- Seq((true, 0), (false, 0), (false, 8))) {
      val got = SpatialJoin.joinRects(im, po, 7, bcast, salt)
        .select("image_id", "fid")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == brute, s"strategy bcast=$bcast salt=$salt")
    }
    // min-corner fast path (image extent ≤ cell size) — identical rows
    val fast = SpatialJoin.joinRectsSmallImages(im, po, 7)
      .select("image_id", "fid")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fast == brute, "small-image fast path")
    // and candidate multiplicity is exactly 1 (no dedup needed)
    val cnt = SpatialJoin.joinRectsSmallImages(im, po, 7)
      .groupBy("image_id", "fid").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(cnt == 1L)
  }

  test("headline join+tile plan shape: no shuffle, broadcast-only exchange") {
    val im = images(10000)
    val po = polys(100)
    val tiles = Tiling.tiles(
      SpatialJoin.cropRects(SpatialJoin.joinRectsSmallImages(im, po, 7))
        .select(col("k"),
          (col("cpx1") - col("cpx0")).as("w"),
          (col("cpy1") - col("cpy0")).as("h")),
      chunkBytes = 65536)
    val plan = tiles.queryExecution.executedPlan.toString
    val exchanges = "(?m)^.*Exchange.*$".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(_.contains("BroadcastExchange")),
      s"unexpected shuffle in headline plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
    // broadcast side joins on ONE long key (LongHashedRelation path)
    assert(plan.contains("HashedRelationBroadcastMode(List(input[") &&
      !plan.contains("SortMergeJoin"))
  }

  test("joinPolygons (ray-casting refine) matches JTS brute force") {
    import org.locationtech.jts.geom._
    val gf = new GeometryFactory()
    val im = images(2000).cache()
    // concave V-shaped polygon + a triangle, in mdeg
    val wkts = Seq(
      (0L, "POLYGON ((-50 -20, 10 -20, 10 30, -20 30, -20 0, -50 0, -50 -20))"),
      (1L, "POLYGON ((60 -40, 120 -40, 90 20, 60 -40))"))
    val pdf = wkts.map { case (fid, wkt) =>
      val (xs, ys) = Geom.parsePolygonWkt(wkt)
      (fid, wkt, (xs.min * 1000).toLong, (ys.min * 1000).toLong,
        (xs.max * 1000).toLong, (ys.max * 1000).toLong)
    }
    val polyDf = spark.createDataFrame(pdf)
      .toDF("fid", "geom_wkt", "px0m", "py0m", "px1m", "py1m")
    val got = SpatialJoin.joinPolygons(im, polyDf, 7)
      .select("image_id", "fid")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // JTS oracle
    val rows = im.select("image_id", "x0m", "y0m", "x1m", "y1m").collect()
    val expect = (for {
      r <- rows
      (fid, wkt) <- wkts
      poly = {
        val (xs, ys) = Geom.parsePolygonWkt(wkt)
        val ring = (xs.indices :+ 0).map(i => new Coordinate(xs(i), ys(i))).toArray
        gf.createPolygon(ring)
      }
      rect = gf.createPolygon(Array(
        new Coordinate(r.getLong(1) / 1000.0, r.getLong(2) / 1000.0),
        new Coordinate(r.getLong(3) / 1000.0, r.getLong(2) / 1000.0),
        new Coordinate(r.getLong(3) / 1000.0, r.getLong(4) / 1000.0),
        new Coordinate(r.getLong(1) / 1000.0, r.getLong(4) / 1000.0),
        new Coordinate(r.getLong(1) / 1000.0, r.getLong(2) / 1000.0)))
      if rect.intersects(poly) && !rect.touches(poly)
    } yield (r.getString(0), fid)).toSet
    assert(got == expect)
  }

  test("knn matches brute force and is exact") {
    val im = images(2000)
      .withColumn("cxm", col("x0m") + col("w") * 2)
      .withColumn("cym", col("y0m") + col("h") * 2)
      .select("image_id", "cxm", "cym").cache()
    val qs = spark.createDataFrame(Seq(
      (0L, 0L, 0L), (1L, -140000L, -55000L), (2L, 145000L, 58000L),
      (3L, 70000L, 10000L))).toDF("qid", "qxm", "qym")
    val got = Knn.knn(spark, im, qs, 7, 7)
      .select("qid", "rank", "image_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val brute = im.crossJoin(qs)
      .withColumn("dist2",
        (col("cxm") - col("qxm")) * (col("cxm") - col("qxm")) +
        (col("cym") - col("qym")) * (col("cym") - col("qym")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("dist2"), col("image_id"))))
      .where(col("rank") <= 7)
      .select("qid", "rank", "image_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == brute)
  }

  test("tiling reproduces the reference chunks() contract") {
    // contract (/root/reference/test/test_GeoResource.py:110-125):
    // full-width row bands, contiguous, equal heights except last
    val one = spark.createDataFrame(Seq(("i0", 2000L, 2000L)))
      .toDF("image_id", "w", "h")
    val t100 = Tiling.tilesNum(one, 100).orderBy("tile_idx")
      .select("ty0", "ty1", "th").collect()
    assert(t100.length == 100)
    assert(t100.head.getLong(0) == 0)
    assert(t100.last.getLong(1) == 2000)
    t100.sliding(2).foreach(p =>
      assert(p(0).getLong(1) == p(1).getLong(0), "contiguous"))
    assert(t100.map(_.getLong(2)).distinct.length <= 2)
    // chunkBytes formula: rows = floor(bytes/8/w)
    val tB = Tiling.tiles(one, 8 * 2000 * 64).orderBy("tile_idx")
      .select("ty0", "ty1").collect()
    assert(tB.length == math.ceil(2000.0 / 64).toInt)
    // padding clips at borders
    val tp = Tiling.tilesNum(one, 4, padding = 3)
      .orderBy("tile_idx").select("pty0", "pty1").collect()
    assert(tp.head.getLong(0) == 0 && tp.last.getLong(1) == 2000)
    assert(tp(1).getLong(0) == 500 - 3 && tp(1).getLong(1) == 1000 + 3)
  }

  test("warp: identity grid preserves pixels; 3857 output sizes") {
    val k = 13L // raw-i16le image
    val w = Synth.wOf(k); val h = Synth.hOf(k)
    val p = Synth.planes(k)(0)
    val grid = Warp.Grid(0, 0, w, h, w, h, 1.0, 1.0)
    val out = Warp.resample(p, w, h, 0, h, 1.0, 1.0, grid, interp = 0)
    assert(out.zip(p).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || a == b }, "identity warp must be exact")
    // bilinear at 2x then block-mean ≈ original mean (smooth ramp)
    val g2 = Warp.Grid(0, 0, w, h, w * 2, h * 2, 0.5, 0.5)
    val up = Warp.resample(p, w, h, 0, h, 1.0, 1.0, g2, interp = 1)
    val validUp = up.filter(!_.isNaN)
    val valid = p.filter(!_.isNaN)
    assert(math.abs(validUp.sum / validUp.length - valid.sum / valid.length) < 2.0)
  }

  test("pansharp brovey: constant-band sanity") {
    val w = 8; val h = 8
    val cube = Array.fill(6)(Array.fill(w * h)(100.0))
    val pan = Array.fill(w * h * 4)(200.0)
    val out = Algorithms.pansharpBrovey(cube, w, h, pan, w * 2, h * 2,
      Array(0.3, 0.3, 0.3, 0.1))
    // dnf = (200 - 0.1*100) / (0.3*100*3) = 190/90
    val expect = 100.0 * (190.0 / 90.0)
    assert(out(0).forall(v => math.abs(v - expect) < 1e-9))
  }

  test("kmeans embeddings: deterministic and separates clusters") {
    import spark.implicits._
    val r = new scala.util.Random(4)
    val pts = (0 until 200).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.0); base(c * 2) = 10.0
      (i.toLong, base.map(_ + r.nextGaussian() * 0.1))
    }
    val df = pts.toDF("vec_id", "embedding")
    val a1 = Algorithms.kmeansEmbeddings(spark, df, 4, 5)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toMap
    val a2 = Algorithms.kmeansEmbeddings(spark, df, 4, 5)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toMap
    assert(a1 == a2, "deterministic")
    // all members of a true cluster land together
    (0 until 4).foreach { c =>
      val labels = (0 until 200).filter(_ % 4 == c).map(i => a1(i.toLong))
      assert(labels.distinct.length == 1, s"true cluster $c split: $labels")
    }
  }

  test("rxd: injected anomaly scores highest") {
    val r = new scala.util.Random(8)
    val n = 400
    val cube = Array.fill(3)(Array.fill(n)(0.0))
    for (i <- 0 until n; b <- 0 until 3)
      cube(b)(i) = 100 + r.nextGaussian() * (b + 1)
    // anomaly at 17
    for (b <- 0 until 3) cube(b)(17) = 100 + 40 * (if (b == 1) -1 else 1)
    val rx = Algorithms.rxdPlane(cube)
    assert(rx.indexOf(rx.max) == 17)
  }

  test("lineage: resumable write skips committed buckets, metrics consistent") {
    val root = Files.createTempDirectory("graft_lineage").toString
    val df = images(1000).select("image_id", "k", "w", "h")
    val n1 = Lineage.writeResumable(spark, df, root, "image_id", 8)
    assert(n1 == 8)
    // full resume: nothing to do
    assert(Lineage.writeResumable(spark, df, root, "image_id", 8) == 0)
    // simulate partial failure: drop last 3 commits from the log
    val log = Lineage.logPath(root)
    val lines = Files.readAllLines(log)
    Files.write(log, lines.subList(0, 5))
    assert(Lineage.writeResumable(spark, df, root, "image_id", 8) == 3)
    val back = Lineage.read(spark, root)
    assert(back.count() == 1000)
    assert(back.select("image_id").distinct().count() == 1000)
    val m = Lineage.metrics(spark, root)
    assert(m.count() == 8) // 5 kept + 3 re-commits
    assert(m.groupBy().agg(sum("rows")).collect()(0).getLong(0) >= 1000)
  }

  test("subdataset expansion: sub_idx band order, names, dim-mismatch rejected") {
    import spark.implicits._
    import graft.core.Codec
    def sub(id: String, idx: Long, name: String, w: Int, h: Int, v: Double) =
      (id, idx, name,
        Codec.encode(Array(Array.fill(w * h)(v)), w, h, "raw-i16le"),
        w.toLong, h.toLong, "raw-i16le")
    // out-of-order input rows: expansion must sort by sub_idx
    val subs = Seq(sub("a", 2, "S3", 8, 8, 3), sub("a", 0, "S1", 8, 8, 1),
        sub("a", 1, "S2", 8, 8, 2))
      .toDF("image_id", "sub_idx", "name", "bytes", "w", "h", "fmt")
    val ex = Bands.expandSubdatasets(subs).collect()(0)
    assert(ex.getAs[scala.collection.Seq[String]]("bands").toSeq ==
      Seq("s1", "s2", "s3"))
    assert(ex.getAs[Long]("w") == 8 && ex.getAs[Long]("h") == 8)
    val cube = Codec.decode(ex.getAs[Array[Byte]]("bytes"), 8, 8, 3, "raw-i16le")
    assert(cube(1).forall(_ == 2.0) && cube(2).forall(_ == 3.0))
    // differing dims: rejected (the reference keeps per-band rasters;
    // the columnar cube model documents this as unsupported)
    val bad = Seq(sub("b", 0, "S1", 8, 8, 1), sub("b", 1, "S2", 4, 4, 2))
      .toDF("image_id", "sub_idx", "name", "bytes", "w", "h", "fmt")
    intercept[Exception] { Bands.expandSubdatasets(bad).collect() }
  }

  test("lineage: range buckets carry zone maps; range scan prunes, lookup hits one bucket") {
    val root = Files.createTempDirectory("graft_lineage_rng").toString
    val df = images(1000).select("image_id", "k", "w", "h")
    assert(Lineage.writeRangeResumable(spark, df, root, "k", 8) == 8)
    // resume is a no-op
    assert(Lineage.writeRangeResumable(spark, df, root, "k", 8) == 0)
    // zone maps: every non-empty bucket has stats, ranges are disjoint
    val cs = Lineage.latestCommits(root).values.filter(_.rows > 0).toSeq
      .sortBy(_.lo.get)
    assert(cs.nonEmpty && cs.forall(c => c.lo.isDefined && c.hi.isDefined))
    cs.sliding(2).foreach {
      case Seq(a, b) => assert(a.hi.get < b.lo.get)
      case _         =>
    }
    // pruning decision is metadata-only and strictly narrower than 8
    val lo = 100L; val hi = 200L
    val (sel, total) = Lineage.prunedParts(root, lo, hi)
    assert(total == 8 && sel.nonEmpty && sel.size < 8)
    // pruned read == unpruned filter
    val got = Lineage.readRange(spark, root, "k", lo, hi)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    val want = df.where(col("k") >= lo && col("k") <= hi)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
    // zone maps survive compaction (gen swap keeps lo/hi)
    Lineage.compact(spark, root, maxFiles = 1)
    val (sel2, _) = Lineage.prunedParts(root, lo, hi)
    assert(sel2 == sel)
    val got2 = Lineage.readRange(spark, root, "k", lo, hi)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got2 == want)
    // equality bucket pruning on the HASH layout: one dir, right rows
    val hroot = Files.createTempDirectory("graft_lineage_pt").toString
    assert(Lineage.writeResumable(spark, df, hroot, "image_id", 8) == 8)
    val one = Lineage.readForKey(spark, hroot, "image_id", "img-17", 8)
      .collect()
    assert(one.length == 1 && one(0).getAs[Long]("k") == 17L)
    // and its plan reads a single bucket directory
    val scanned = Lineage.readForKey(spark, hroot, "image_id", "img-17", 8)
      .queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString
    assert("part=\\d+".r.findAllIn(scanned).toSet.size <= 1)
  }

  test("lineage: range-bucket boundaries persist and resume reuses them verbatim") {
    // percentile_approx is not guaranteed run-to-run identical (partial
    // summary merge order), so a crash/resume that RECOMPUTED bucket
    // boundaries could route rows into already-committed buckets (rows
    // dropped) or duplicate them. The contract: boundaries are computed
    // once, published atomically to _bounds.jsonl BEFORE any commit,
    // and reused verbatim on resume.
    import java.nio.file.{Files => JFiles, Paths}
    import scala.jdk.CollectionConverters._
    val root = JFiles.createTempDirectory("graft_lineage_bnd").toString
    val df = images(1000).select("image_id", "k", "w", "h")
    assert(Lineage.writeRangeResumable(spark, df, root, "k", 4) == 4)
    val bf = Paths.get(root, "_bounds.jsonl")
    assert(JFiles.exists(bf), "bounds sidecar must be published")
    val b0 = JFiles.readAllLines(bf).asScala.map(_.toLong).toSeq
    assert(b0.length == 3 && b0 == b0.sorted)
    // simulate a crash that lost bucket 2: drop its commit line + dir,
    // then TAMPER the sidecar — if resume recomputed boundaries the
    // redone bucket would ignore the tampered values; if it reuses the
    // sidecar (the contract) the redone bucket holds exactly the keys
    // in the tampered range (b(1), b(2)]
    val log = Paths.get(root, "_commits.jsonl")
    val kept = JFiles.readAllLines(log).asScala
      .filterNot(_.contains("\"part\":2")).toSeq
    JFiles.write(log, kept.asJava)
    val p2 = Paths.get(root, "part=2")
    JFiles.walk(p2).iterator().asScala.toSeq.reverse
      .foreach(JFiles.deleteIfExists(_))
    val tampered = Seq(b0(0), b0(1), b0(2) + 37)
    JFiles.write(bf, tampered.map(_.toString).asJava)
    assert(Lineage.writeRangeResumable(spark, df, root, "k", 4) == 1)
    val rows2 = Lineage.latestCommits(root)(2).rows
    val want = df.where(col("k") > tampered(1) && col("k") <= tampered(2))
      .count()
    assert(rows2 == want,
      s"resume must bucket by the persisted (tampered) bounds: $rows2 != $want")
  }

  test("lineage: compaction swaps generations without losing a row") {
    val root = Files.createTempDirectory("graft_lineage_cmp").toString
    // many input partitions → many small files per bucket
    val df = images(1000).select("image_id", "k", "w", "h").repartition(16)
    assert(Lineage.writeResumable(spark, df, root, "image_id", 4) == 4)
    def files(p: Int, g: Int) = {
      val d = Lineage.partDir(root, p, g)
      if (!Files.exists(d)) 0
      else {
        import scala.jdk.CollectionConverters._
        Files.list(d).iterator().asScala.count(
          _.getFileName.toString.endsWith(".parquet"))
      }
    }
    assert((0 until 4).exists(files(_, 0) > 1), "fixture needs small files")
    val before = Lineage.read(spark, root).orderBy("image_id")
      .collect().map(_.getString(0)).toSeq
    assert(Lineage.compact(spark, root, maxFiles = 1) == 4)
    // every bucket now a single gen-1 file; gen-0 files vacuumed
    (0 until 4).foreach { p =>
      assert(files(p, 1) == 1)
      assert(files(p, 0) == 0)
    }
    val after = Lineage.read(spark, root).orderBy("image_id")
      .collect().map(_.getString(0)).toSeq
    assert(after == before)
    // idempotent: nothing left to compact
    assert(Lineage.compact(spark, root, maxFiles = 1) == 0)
    // crash-sim: compact died after writing a gen-2 dir but BEFORE its
    // commit line — readers must stay on committed gen 1 and ignore
    // the orphan; the next compact vacuums nothing (gen 2 > committed)
    val orphan = Lineage.partDir(root, 0, 2)
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("garbage.parquet"), Array[Byte](1, 2, 3))
    assert(Lineage.read(spark, root).count() == before.size)
    assert(Lineage.latestCommits(root)(0).gen == 1)
  }

  test("lineage: merge upserts with bucket pruning; delete removes; range layout rejected") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lineage_mrg").toString
    val df = images(500).select("image_id", "k", "w", "h")
    assert(Lineage.writeResumable(spark, df, root, "image_id", 8) == 8)
    val upd = df.where(col("image_id") === "img-7")
      .withColumn("w", col("w") + 9000)
    val ins = Seq(("img-x", 777777L, 11L, 12L)).toDF("image_id", "k", "w", "h")
    val delta = upd.unionByName(ins)
    val r1 = Lineage.merge(spark, delta, root, "image_id", 8)
    assert(r1 > 0 && r1 <= 2, s"2 keys touch at most 2 buckets, got $r1")
    val back = Lineage.read(spark, root)
    val wMerged = back.where(col("image_id") === "img-7")
      .head().getAs[Long]("w")
    assert(back.count() == 501)
    assert(wMerged ==
      df.where(col("image_id") === "img-7").head().getAs[Long]("w") + 9000)
    assert(back.where(col("image_id") === "img-x").count() == 1)
    // re-running the same merge (crash-redo) converges to the same table
    // (a handle from before the merge is stale — vacuumed generation —
    // so re-read the table, as after any snapshot swap)
    Lineage.merge(spark, delta, root, "image_id", 8)
    val back2 = Lineage.read(spark, root)
    assert(back2.count() == 501)
    assert(back2.where(col("image_id") === "img-7").head().getAs[Long]("w")
      == wMerged)
    // delete (one present + one absent key): present key gone, count drops
    val d = Lineage.deleteKeys(spark,
      Seq("img-7", "img-nope").toDF("image_id"), root, "image_id", 8)
    assert(d > 0 && d <= 2)
    val back3 = Lineage.read(spark, root)
    assert(back3.count() == 500)
    assert(back3.where(col("image_id") === "img-7").count() == 0)
    // merge against a range-bucketed (zone-mapped) table must refuse
    val rngRoot = Files.createTempDirectory("graft_lineage_mrg_rng").toString
    Lineage.writeRangeResumable(spark, df, rngRoot, "k", 8)
    intercept[IllegalArgumentException] {
      Lineage.merge(spark, delta, rngRoot, "image_id", 8)
    }
  }

  test("lineage: merge retains pre-merge snapshot when vacuumOld=false") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lineage_mrg_tt").toString
    val df = images(200).select("image_id", "k", "w", "h")
    Lineage.writeResumable(spark, df, root, "image_id", 4)
    val t0 = System.currentTimeMillis()
    Thread.sleep(5)
    val delta = Seq(("img-y", 888888L, 1L, 2L)).toDF("image_id", "k", "w", "h")
    Lineage.merge(spark, delta, root, "image_id", 4, vacuumOld = false)
    assert(Lineage.read(spark, root).count() == 201)
    // time travel to before the merge sees the pre-merge table
    assert(Lineage.readSnapshot(spark, root, t0).count() == 200)
  }

  test("lineage: schema evolution reconciles vintages; snapshot sees pre-evolution schema") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lineage_evo").toString
    val df = images(400).select("image_id", "k", "w", "h")
    Lineage.writeResumable(spark, df, root, "image_id", 4)
    val t0 = System.currentTimeMillis()
    Thread.sleep(5)
    Lineage.addColumn(root, "label", "string", Some("unlabeled"))
    Lineage.renameColumn(root, "h", "height")
    Lineage.dropColumn(root, "w")
    // reads reconcile instantly — no file was rewritten
    val evolved = Lineage.read(spark, root)
    assert(evolved.columns.toSet == Set("image_id", "k", "height", "label"))
    assert(evolved.where(col("label") === "unlabeled").count() == 400)
    // a merge writes the evolved physical schema for its buckets only
    val delta = Seq(("img-z", 555555L, 9L, "tagged"))
      .toDF("image_id", "k", "height", "label")
    Lineage.merge(spark, delta, root, "image_id", 4, vacuumOld = false)
    val mixed = Lineage.read(spark, root)
    assert(mixed.count() == 401)
    assert(mixed.where(col("image_id") === "img-z")
      .head().getAs[String]("label") == "tagged")
    assert(mixed.where(col("label") === "unlabeled").count() == 400)
    // point lookup and range scan reconcile too
    val one = Lineage.readForKey(spark, root, "image_id", "img-z", 4)
    assert(one.columns.toSet == Set("image_id", "k", "height", "label"))
    // schema TIME TRAVEL: the pre-evolution snapshot reads pre-evolution
    // columns (merge retained old generations via vacuumOld = false)
    val snap = Lineage.readSnapshot(spark, root, t0)
    assert(snap.columns.toSet == Set("image_id", "k", "w", "h"))
    assert(snap.count() == 400)
  }

  test("lineage: epoch CDC read returns only epochs past the cursor") {
    val root = Files.createTempDirectory("graft_lineage_cdc").toString
    val df = images(300).select("image_id", "k", "w", "h")
    import graft.streaming.CellStream
    assert(CellStream.latestLineageEpoch(root) == -1L)
    Lineage.writeResumable(spark, df.where(col("k") < 150),
      s"$root/epoch=0", "image_id", 4)
    Lineage.writeResumable(spark, df.where(col("k") >= 150 && col("k") < 250),
      s"$root/epoch=1", "image_id", 4)
    Lineage.writeResumable(spark, df.where(col("k") >= 250),
      s"$root/epoch=2", "image_id", 4)
    assert(CellStream.latestLineageEpoch(root) == 2L)
    assert(CellStream.readLineageEpochs(spark, root).count() == 300)
    val inc = CellStream.readLineageEpochsSince(spark, root, 0L)
    assert(inc.count() == 150)
    assert(inc.agg(min("k")).head().getLong(0) >= 150)
    assert(CellStream.readLineageEpochsSince(spark, root, 2L).isEmpty)
  }

  test("lineage: snapshot retention — time-travel read + expire (Iceberg analog)") {
    val root = Files.createTempDirectory("graft_lineage_tt").toString
    val df = images(500).select("image_id", "k", "w").repartition(8)
    assert(Lineage.writeResumable(spark, df, root, "image_id", 4) == 4)
    val before = Lineage.read(spark, root).count()
    Thread.sleep(5)
    val ts1 = System.currentTimeMillis()
    Thread.sleep(5)
    // retain old generations for time travel
    assert(Lineage.compact(spark, root, maxFiles = 0, vacuumOld = false) == 4)
    assert(Lineage.read(spark, root).count() == before)
    // as-of ts1 = the gen-0 snapshot, still readable (data retained)
    assert(Lineage.readSnapshot(spark, root, ts1).count() == before)
    // as-of now = the latest generations
    assert(Lineage.readSnapshot(spark, root,
      System.currentTimeMillis()).count() == before)
    // expire: superseded gen-0 data reclaimed; current reads untouched
    assert(Lineage.expireSnapshots(root, System.currentTimeMillis() + 1) == 4)
    assert(Lineage.read(spark, root).count() == before)
    // time travel past the horizon must FAIL LOUDLY, not shrink
    intercept[IllegalStateException] {
      Lineage.readSnapshot(spark, root, ts1)
    }
    // expire is idempotent
    assert(Lineage.expireSnapshots(root, System.currentTimeMillis() + 1) == 0)
  }

  test("lineage: fully-empty committed table reads back as empty") {
    val root = Files.createTempDirectory("graft_lineage_empty").toString
    val empty = images(1000).select("image_id", "k")
      .where(col("k") < 0) // zero rows → every bucket empty
    assert(Lineage.writeResumable(spark, empty, root, "image_id", 4) == 4)
    assert(Lineage.read(spark, root).isEmpty) // no zero-path parquet throw
    val m = Lineage.metrics(spark, root)
    assert(m.count() == 4)
    assert(m.agg(sum("rows")).collect()(0).getLong(0) == 0)
  }

  test("writeResumable scans the source exactly once") {
    val root = Files.createTempDirectory("graft-lineage-1scan").toString
    val acc = spark.sparkContext.longAccumulator("evals")
    val tick = udf((x: Long) => { acc.add(1); x }).asNondeterministic()
    val df = spark.range(0, 1000, 1, 4)
      .select(tick(col("id")).as("k"), (col("id") * 3).as("v"))
    assert(Lineage.writeResumable(spark, df, root, "k", 8) == 8)
    // the old per-bucket loop re-evaluated the source once PER BUCKET
    // (8000 evals here); the one-pass writer evaluates each row once
    assert(acc.value == 1000L, s"source rows evaluated ${acc.value} times")
    assert(Lineage.read(spark, root).count() == 1000)
  }

  test("commit log tolerates torn lines (crash mid-append)") {
    val root = Files.createTempDirectory("graft-lineage-torn").toString
    val df = spark.range(0, 200, 1, 4)
      .select(col("id").as("k"), (col("id") * 3).as("v"))
    assert(Lineage.writeResumable(spark, df, root, "k", 4) == 4)
    // simulate a crash mid-append: a torn line that still contains
    // '"part":2' but no complete record — must NOT count as committed
    val log = Lineage.logPath(root)
    val kept = Files.readAllLines(log).subList(0, 3)
    Files.write(log, (kept.toArray.mkString("\n") + "\n" +
      """{"part":3,"rows":""").getBytes)
    assert(Lineage.committedParts(root) == Set(0, 1, 2))
    assert(Lineage.metrics(spark, root).count() == 3) // parses cleanly
    // resume redoes exactly the torn bucket
    assert(Lineage.writeResumable(spark, df, root, "k", 4) == 1)
    assert(Lineage.read(spark, root).count() == 200)
  }

  test("joinRectsBloom: identical rows to joinRects, real pre-shuffle pruning") {
    val im = images(5000).cache()
    val po = polys(20).cache()
    val want = SpatialJoin.joinRects(im, po, 7)
      .select("image_id", "fid").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = SpatialJoin.joinRectsBloom(im, po, 7)
      .select("image_id", "fid").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty)
    // effectiveness: the bloom drops image cell rows before the
    // shuffle — survivors must be well under the full cover set
    val total = SpatialJoin
      .withCoverCells(im, 7, "x0m", "y0m", "x1m", "y1m").count()
    val polKeyed = SpatialJoin
      .withCoverCells(po, 7, "px0m", "py0m", "px1m", "py1m")
      .select((col("cix") * graft.index.CellGrid.IxMul + col("ciy"))
        .as("cell"))
    val bloom = polKeyed.stat.bloomFilter("cell", 1L << 20, 0.01)
    val survivors = SpatialJoin
      .withCoverCells(im, 7, "x0m", "y0m", "x1m", "y1m")
      .select((col("cix") * graft.index.CellGrid.IxMul + col("ciy"))
        .as("cell")).collect()
      .count(r => bloom.mightContainLong(r.getLong(0)))
    assert(survivors < total / 2,
      s"bloom pruned only ${total - survivors} of $total cell rows")
  }

  test("corpusPercentile: merged common-bin histogram == concatenated-pixel walk") {
    val im = Synth.imagesWithBytes(spark, "/root/testdata/sf0.001",
      _.where(col("w") <= 64 && col("h") <= 64 &&
        (col("k") % 6 === 1 || col("k") % 6 === 2))).cache()
    // brute force: decode every band-2 plane and concatenate
    val planes = im.select("bytes", "w", "h", "fmt").collect().flatMap { r =>
      graft.core.Codec.decode(r.getAs[Array[Byte]](0), r.getLong(1).toInt,
        r.getLong(2).toInt,
        graft.core.Codec.bandsStored(r.getString(3), Synth.NumBands),
        r.getString(3))(2)
    }
    assert(planes.nonEmpty)
    for (pct <- Seq(10.0, 50.0, 90.0)) {
      val dist = Stats.corpusPercentile(im, Synth.NumBands, 2, pct)
      val brute = graft.core.Pixels.percentile(planes, pct)
      assert(dist == brute, s"pct=$pct dist=$dist brute=$brute")
    }
  }

  test("stage metrics: observed pipeline stages persist exact counts") {
    val root = Files.createTempDirectory("graft-stages").toString
    val im = images(2000); val po = polys(30)
    val (joined, o1) = Lineage.observed(
      SpatialJoin.joinRects(im, po, 7), "spatial_join")
    val (cropped, o2) = Lineage.observed(
      SpatialJoin.cropRects(joined), "crop")
    val (tiles, o3) = Lineage.observed(
      Tiling.tiles(cropped
        .select(col("k"), col("fid"), col("cpx0"), col("cpy0"),
          (col("cpx1") - col("cpx0")).as("w"),
          (col("cpy1") - col("cpy0")).as("h"))
        .withColumn("image_id",
          concat(col("k").cast("string"), lit(":"), col("fid"))),
        chunkBytes = 65536), "tiles")
    // ONE action drives the whole pipeline; metrics ride along free
    assert(Lineage.writeResumable(spark, tiles
      .withColumnRenamed("image_id", "key"), root, "key", 4) == 4)
    Lineage.recordStages(root, Seq(o1, o2, o3))
    val m = Lineage.stageMetrics(spark, root)
      .select("stage", "rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact counts vs independent recomputation
    assert(m("spatial_join") == SpatialJoin.joinRects(im, po, 7).count())
    assert(m("crop") == m("spatial_join")) // crop is 1:1
    assert(m("tiles") == Lineage.read(spark, root).count())
    // append-only history: a second run adds three more lines
    Lineage.recordStages(root, Seq(o1, o2, o3))
    assert(Lineage.stageMetrics(spark, root).count() == 6)
  }

  test("cellPyramid: rollup conserves fine-level totals and parent arithmetic") {
    val im = images(2000).cache()
    val fine = SpatialJoin
      .withCoverCells(im, 10, "x0m", "y0m", "x1m", "y1m")
      .groupBy("cix", "ciy").count()
    val coarse = SpatialJoin.cellPyramid(im, 10, 7).cache()
    // conservation: cell-weighted image count and child-cell count at
    // res 7 must equal the res-10 summary's totals
    val Array(nCells, nImages) = coarse
      .agg(sum("n_cells"), sum("n_images")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    assert(nCells == fine.count())
    assert(nImages == fine.agg(sum("count")).collect()(0).getLong(0))
    // parent arithmetic: every coarse cell is a res-7 pack of its ix/iy
    val bad = coarse.filter(
      col("cell_id") =!= lit(7L * graft.index.CellGrid.ResMul) +
        col("cix") * graft.index.CellGrid.IxMul + col("ciy")).count()
    assert(bad == 0)
    // a coarse cell can hold at most 8×8 children
    assert(coarse.agg(max("n_cells")).collect()(0).getLong(0) <= 64)
  }

  test("hilbertRanges: exact rect coverage vs brute xy2d membership, " +
    "disjoint sorted merged ranges (orders 4..6, random rects)") {
    val rnd = new scala.util.Random(7)
    for (order <- 4 to 6; _ <- 1 to 12) {
      val n = 1L << order
      val x0 = rnd.nextInt(n.toInt - 1).toLong
      val x1 = x0 + 1 + rnd.nextInt((n - x0).toInt)
      val y0 = rnd.nextInt(n.toInt - 1).toLong
      val y1 = y0 + 1 + rnd.nextInt((n - y0).toInt)
      val ranges = graft.ops.SpatialJoin.hilbertRanges(x0, y0, x1, y1, order)
      // sorted, disjoint, nothing left unmerged
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
        case _ =>
      }
      val inRanges = ranges.flatMap { case (l, h) => l to h }.toSet
      val brute = (for (x <- x0 until x1; y <- y0 until y1)
        yield graft.expr.Kernels.hilbertXY2D(x, y, order)).toSet
      assert(inRanges === brute, s"order=$order rect=($x0,$y0,$x1,$y1)")
    }
    // full-grid query is ONE range
    assert(graft.ops.SpatialJoin.hilbertRanges(0, 0, 16, 16, 4) ===
      Seq((0L, 255L)))
  }

  test("geohash: canonical goldens and prefix nesting") {
    import spark.implicits._
    // classic reference points (geohash.org): (42.6, -5.6) → ezs42,
    // (57.64911, 10.40744) → u4pruyd (milli-degree truncation keeps
    // the first 7 chars: cell edge at 35 bits ≈ 0.01°)
    val df = Seq((1L, -5600L, 42600L), (2L, 10407L, 57649L))
      .toDF("id", "lon", "lat")
      .withColumn("gh", graft.ops.SpatialJoin.geohash(
        col("lon"), col("lat"), 8))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(1L).startsWith("ezs42"))
    assert(got(2L).startsWith("u4pruy"))
    // shorter precision is a strict prefix of longer
    val gh3 = df.withColumn("g3", graft.ops.SpatialJoin.geohash(
      col("lon"), col("lat"), 3)).collect()
      .map(r => r.getString(3).take(3) -> r.getString(4))
    gh3.foreach { case (pre, g3) => assert(pre == g3) }
  }

  test("quadkey: Bing tile-system goldens and parent-prefix property") {
    import spark.implicits._
    // MSDN "Bing Maps Tile System" worked example: tile (3,5) at
    // level 3 → "213"; (0,0) → all-zero key; (2^L−1, 2^L−1) → all 3s
    val df = Seq((3L, 5L), (0L, 0L), (7L, 7L), (4L, 2L))
      .toDF("tx", "ty")
      .withColumn("qk", graft.ops.SpatialJoin.quadkey(
        col("tx"), col("ty"), 3))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got((3L, 5L)) == "213")
    assert(got((0L, 0L)) == "000")
    assert(got((7L, 7L)) == "333")
    assert(got((4L, 2L)) == "120")
    // parent tile (tx/2, ty/2) at L−1 is the string PREFIX — the
    // property every pyramid rollup and range scan rides on
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(50)((rnd.nextInt(128).toLong,
      rnd.nextInt(128).toLong)).toDF("tx", "ty")
      .withColumn("qk7", graft.ops.SpatialJoin.quadkey(
        col("tx"), col("ty"), 7))
      .withColumn("qkp", graft.ops.SpatialJoin.quadkey(
        expr("tx div 2"), expr("ty div 2"), 6))
    pts.collect().foreach { r =>
      assert(r.getString(2).take(6) == r.getString(3))
    }
  }

}
