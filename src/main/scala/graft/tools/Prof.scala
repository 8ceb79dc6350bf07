package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Synth

/** Ad-hoc stage profiler for the optimization round (not part of the
  * driver contract): times named sub-pipelines with count() so the
  * expensive stage inside a slow gate can be localized (guide §1.1).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(name)
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = df.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = walls.map(_._1).sorted.apply(1)
      println(f"PROF $name rows=${walls.head._2} median=$med%.3f " +
        f"trials=${walls.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    val im = Synth.images(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    args.headOption.getOrElse("prox") match {
      case "prox" =>
        time("images")(im)
        time("proximityEdges")(
          graft.ops.SpatialJoin.proximityEdges(im, 3000L))
        val co = im.select(col("k"), (col("x0m") + col("x1m")).as("cx"),
          (col("y0m") + col("y1m")).as("cy"))
        val e0 = graft.ops.SpatialJoin.proximityEdges(im, 3000L)
        time("edges+weights") {
          e0.join(co.select(col("k").as("ka"), col("cx").as("cxa"),
              col("cy").as("cya")), Seq("ka"))
            .join(co.select(col("k").as("kb"), col("cx").as("cxb"),
              col("cy").as("cyb")), Seq("kb"))
            .withColumn("w", abs(col("cxa") - col("cxb")) +
              abs(col("cya") - col("cyb")))
        }
      case "lsh" =>
        time("minhashFast")(graft.text.TextOps.minhashFast(docs, 4))
        time("candidates")(graft.text.TextOps.jaccardCandidatesLsh(docs, 4))
        time("pairsLsh")(graft.text.TextOps.jaccardPairsLsh(docs, 0.01))
      case "lp" =>
        import graft.graph.ConnectedComponents
        val pairs = graft.ops.SpatialJoin.proximityEdges(im, 3000L)
        def und = ConnectedComponents.canonEdges(pairs)
        def dir = und.select(col("u").as("src"), col("v").as("dst"))
          .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
        time("deg")(dir.groupBy("src").agg(count(lit(1)).as("deg")))
        time("cn-smj") {
          dir.select(col("src").as("m"), col("dst").as("a"))
            .join(dir.select(col("src").as("m"), col("dst").as("b")), Seq("m"))
            .where(col("a") < col("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("cn"))
        }
        time("cn-bhj") {
          dir.select(col("src").as("m"), col("dst").as("a"))
            .join(broadcast(dir.select(col("src").as("m"),
              col("dst").as("b"))), Seq("m"))
            .where(col("a") < col("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("cn"))
        }
        time("cn-list") {
          val ns = dir.groupBy(col("src").as("m"))
            .agg(sort_array(collect_list(col("dst"))).as("ns"))
          ns.select(posexplode(col("ns")).as(Seq("i", "a")), col("ns"))
            .select(col("a"), explode(slice(col("ns"), col("i") + lit(2),
              size(col("ns")))).as("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("cn"))
        }
        time("lp-full-current")(graft.graph.LabelProp.linkPredict(pairs, 40))
      case "lp2" =>
        import graft.graph.ConnectedComponents
        def pairs = graft.ops.SpatialJoin.proximityEdges(im, 3000L)
        time("lp-ckpt-hints") {
          val und = ConnectedComponents.canonEdges(pairs).localCheckpoint()
          val dir = und.select(col("u").as("src"), col("v").as("dst"))
            .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
          val deg = dir.groupBy("src").agg(count(lit(1)).as("deg"))
          val cn = dir.select(col("src").as("m"), col("dst").as("a"))
            .join(dir.select(col("src").as("m"), col("dst").as("b")), Seq("m"))
            .where(col("a") < col("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("cn"))
          cn.join(broadcast(und.select(col("u").as("a"), col("v").as("b"))),
              Seq("a", "b"), "left_anti")
            .join(broadcast(deg.select(col("src").as("a"),
              col("deg").as("da"))), Seq("a"))
            .join(broadcast(deg.select(col("src").as("b"),
              col("deg").as("db"))), Seq("b"))
            .select(col("a"), col("b"), col("cn"), col("da"), col("db"),
              expr("(1000000 * cn) div (da + db - cn)").as("jacc_scaled"))
            .orderBy(col("jacc_scaled").desc, col("cn").desc, col("a"), col("b"))
            .limit(40)
        }
        time("lp-ckpt-list-hints") {
          val und = ConnectedComponents.canonEdges(pairs).localCheckpoint()
          val dir = und.select(col("u").as("src"), col("v").as("dst"))
            .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
          val deg = dir.groupBy("src").agg(count(lit(1)).as("deg"))
          val ns = dir.groupBy(col("src").as("m"))
            .agg(sort_array(collect_list(col("dst"))).as("ns"))
          val cn = ns.select(posexplode(col("ns")).as(Seq("i", "a")), col("ns"))
            .select(col("a"), explode(slice(col("ns"), col("i") + lit(2),
              size(col("ns")))).as("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("cn"))
          cn.join(broadcast(und.select(col("u").as("a"), col("v").as("b"))),
              Seq("a", "b"), "left_anti")
            .join(broadcast(deg.select(col("src").as("a"),
              col("deg").as("da"))), Seq("a"))
            .join(broadcast(deg.select(col("src").as("b"),
              col("deg").as("db"))), Seq("b"))
            .select(col("a"), col("b"), col("cn"), col("da"), col("db"),
              expr("(1000000 * cn) div (da + db - cn)").as("jacc_scaled"))
            .orderBy(col("jacc_scaled").desc, col("cn").desc, col("a"), col("b"))
            .limit(40)
        }
        time("lp-full-current")(graft.graph.LabelProp.linkPredict(
          graft.ops.SpatialJoin.proximityEdges(im, 3000L), 40))
      case "cnmicro" =>
        import graft.core.Codec
        val ks = (0L until 40000L).filter(k => k % 6 == 1 || k % 6 == 2)
          .take(400)
        def bench(name: String)(f: Long => Unit): Unit = {
          val t0 = System.nanoTime(); ks.foreach(f)
          println(f"PROF $name sec=${(System.nanoTime() - t0) / 1e9}%.3f")
        }
        bench("warm")(k => Codec.bandStatsFused(Synth.encodeImage(k),
          Synth.wOf(k), Synth.hOf(k),
          Codec.bandsStored(Synth.fmtOf(k), Synth.NumBands), Synth.fmtOf(k)))
        bench("encode-only")(k => Synth.encodeImage(k))
        bench("encode+fused")(k => Codec.bandStatsFused(Synth.encodeImage(k),
          Synth.wOf(k), Synth.hOf(k),
          Codec.bandsStored(Synth.fmtOf(k), Synth.NumBands), Synth.fmtOf(k)))
        bench("encode+decode+stats") { k =>
          val fmt = Synth.fmtOf(k)
          val nbS = Codec.bandsStored(fmt, Synth.NumBands)
          val planes = Codec.decode(Synth.encodeImage(k), Synth.wOf(k),
            Synth.hOf(k), nbS, fmt)
          planes.foreach(graft.core.Pixels.stats)
        }
      case "cn" =>
        val withBytes = Synth.imagesWithBytes(spark, sfDir,
          _.where(col("k") % 6 === 1 || col("k") % 6 === 2))
        time("scan-bytes")(withBytes.agg(
          sum(length(col("bytes"))).as("b")))
        time("channel-norm")(graft.ops.Stats.channelNorm(withBytes,
          Synth.NumBands))
      case other =>
        System.err.println(s"unknown mode $other")
    }
    spark.stop()
  }
}
