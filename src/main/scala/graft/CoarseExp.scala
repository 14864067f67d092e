package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AnnPolicy, PipelineQueries}

/** Two-level-routing recall experiment + witness (VERDICT r15 #1): the
  * q36c coarse hierarchy's recall at a grid of (index-side
  * multi-assignment width m, query-side coarse-probe width), measured
  * at 50-QUERY granularity (the r15 verdict's finding: a 5-query
  * witness cannot distinguish 0.68 from 0.80 — each query contributes
  * 0.04 to recall@5's mean, so 50 queries resolve 0.004 steps).
  * Ground truth is the exact-L2 top-5 over the same 50 queries.
  *
  *   sbt -batch "runMain graft.CoarseExp <corpusDir> [out.json] [grid]"
  *
  * `grid` = semicolon list of m,pcDiv pairs (e.g. "2,2;4,2;4,1");
  * default sweeps m ∈ {2,3,4,6} × pcDiv ∈ {2,1} plus the shipped
  * policy point first. Reports per-variant recall@5, the candidate
  * scan fraction (like-for-like cost), and wall seconds for the
  * index-assignment stage (the corpus-side cost m multiplies).
  */
object CoarseExp {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nq = 50L
    val e = PipelineQueries.embGlob(spark, dir).cache()
    val n = e.count()
    val k = AnnPolicy.grownK(n)
    val cents = PipelineQueries.trainedCodebookK(spark, dir, k)
      .select($"cid", $"ce").cache()
    val kActual = cents.count()
    val nprobe = AnnPolicy.ivfNprobe(kActual).toInt
    val step = math.ceil(math.sqrt(kActual.toDouble)).toLong

    val qv = e.filter($"vec_id" < nq)
      .select($"vec_id".as("query_id"), $"embedding".as("qe")).cache()
    qv.count()

    // Exact top-5 via the partial-aggregating TopKAgg (score = −l2, so
    // (cos desc, vec_id asc) ≡ (l2 asc, vec_id asc)) — the window form
    // sorted + shuffled every scored row and at the 16.9M-vector cap
    // corpus (845M ground-truth pairs) blew the disk; the aggregator
    // keeps ≤ 2k rows per group per map task.
    val topk = udaf(new graft.functions.TopKAgg(5))
    def top5(scored: DataFrame): Map[Long, Set[Long]] = scored
      .groupBy($"query_id").agg(topk($"vec_id", -$"l2").as("top"))
      .select($"query_id", explode($"top.vec_id").as("vec_id"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val gt = top5(e.crossJoin(broadcast(qv))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("l2",
        graft.functions.GraftFunctions.l2Sq($"embedding", $"qe")))

    // The q36c chain, parameterized: coarse = every step-th fine
    // centroid (or, `trained` variants, ONE Lloyd step over the fine
    // centroids from that init — the coarse level as a real quantizer
    // of centroid space instead of an arbitrary subsample); index side
    // assigns through the TOP-m coarse cells; query side probes
    // pc = scanCeil(C, pcDiv, 2) coarse cells.
    val coarseSub = cents.filter($"cid" % step === 0)
      .select($"cid".as("gid"), $"ce".as("ge")).cache()
    val centsAsE = cents.select($"cid".as("vec_id"), $"ce".as("embedding"))
    val coarseTrained = PipelineQueries.kmUpdate(centsAsE,
        PipelineQueries.kmAssign(centsAsE,
          coarseSub.select($"gid".as("cid"), $"ge".as("ce"))))
      .select($"cid".as("gid"), $"ce".as("ge")).cache()
    val nCoarse = coarseSub.count()
    val tfc = org.apache.spark.sql.functions
      .transform(_: Column, _: Column => Column)

    def variant(m: Int, pcDiv: Long,
        trained: Boolean): (Double, Double, Double, Long, Int) = {
      val coarse = if (trained) coarseTrained else coarseSub
      // pc (and the reported n_coarse) must come from the cell count of
      // the coarse level THIS variant routes through — trained coarse
      // can have fewer cells than the subsample init (empty cells drop
      // in kmUpdate), and the shipped q36c derives its probe width from
      // the actual trained count.
      val nc = coarse.count()
      val coarseArr = coarse
        .agg(array_sort(collect_list(struct($"gid", $"ge"))).as("ca"))
      val fineCell = cents.crossJoin(broadcast(coarse))
        .withColumn("gd", graft.functions.GraftFunctions.l2Sq($"ce", $"ge"))
        .groupBy($"cid")
        .agg(min_by($"gid", struct($"gd", $"gid")).as("gid"),
          first($"ce").as("ce"))
      val pc = AnnPolicy.scanCeil(nc, pcDiv, AnnPolicy.CoarseProbeFloor)
        .toInt
      val t0 = System.nanoTime()
      // In-row fine argmin over the broadcast fine-cell array filtered
      // to the row's top-m coarse cells — the registered q36c's shape
      // (map-only via the native L2ArgMinCid kernel; the old explode →
      // join → min_by chain sort-spilled the n·m·(K/C)-row stream at
      // the cap corpus, and the HOF form ran interpreted — §8.5).
      val faArr = fineCell
        .agg(array_sort(collect_list(struct($"gid", $"cid", $"ce"))).as("fa"))
      val asg = e.repartition(Par.width(spark), $"vec_id").crossJoin(broadcast(coarseArr))
        .withColumn("g2", slice(array_sort(tfc($"ca", c => struct(
          graft.functions.GraftFunctions.l2Sq($"embedding", c.getField("ge"))
            .as("gd"),
          c.getField("gid").as("gid")))), 1, m))
        .crossJoin(broadcast(faArr))
        .withColumn("cid", graft.functions.GraftFunctions
          .l2ArgminCid($"embedding", $"fa", $"g2.gid"))
        .select($"vec_id", $"cid", $"embedding")
        .cache()
      asg.count()
      val buildS = (System.nanoTime() - t0) / 1e9

      val gw = Window.partitionBy($"query_id").orderBy($"gd", $"gid")
      val qCoarse = qv.crossJoin(broadcast(coarse))
        .withColumn("gd", graft.functions.GraftFunctions.l2Sq($"qe", $"ge"))
        .withColumn("grk", row_number().over(gw))
        .filter($"grk" <= pc)
        .select($"query_id", $"qe", $"gid")
      val qw = Window.partitionBy($"query_id").orderBy($"qd", $"cid")
      val qFine = qCoarse
        .join(broadcast(fineCell.select($"gid", $"cid", $"ce")), "gid")
        .withColumn("qd", graft.functions.GraftFunctions.l2Sq($"qe", $"ce"))
        .withColumn("qrank", row_number().over(qw))
        .filter($"qrank" <= nprobe)
        .select($"query_id", $"qe", $"cid".as("qcid"))
      val cand = asg.join(broadcast(qFine),
        $"cid" === $"qcid" && $"vec_id" =!= $"query_id")
      val nCand = cand.count()
      val got = top5(cand
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe")))
      asg.unpersist()
      val recs = gt.keys.toSeq.map(q =>
        (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
      (recs.sum / recs.size, nCand.toDouble / (nq * n), buildS, nc, pc)
    }

    val grid: Seq[(Int, Long, Boolean)] =
      if (args.length > 2 && args(2) == "-") Seq.empty
      else if (args.length > 2)
        args(2).split("[;:]").toSeq.map { p =>
          val parts = p.split(",")
          (parts(0).toInt, parts(1).toLong,
            parts.length > 2 && parts(2) == "t")
        }
      else Seq((2, 2L, false), (3, 2L, false), (4, 2L, false),
        (6, 2L, false), (2, 1L, false), (4, 1L, false), (6, 1L, false))

    grid.foreach { case (m, pcDiv, trained) =>
      val (r, sf, bs, ncV, pc) = variant(m, pcDiv, trained)
      val json =
        f"""{"dir":"$dir","n_vectors":$n,"n_queries":$nq,"k":$kActual""" +
          f""","n_coarse":$ncV,"nprobe":$nprobe,"m":$m,"pc_div":$pcDiv""" +
          f""","pc":$pc,"trained_coarse":$trained,"recall5":$r%.4f""" +
          f""","scan_frac":$sf%.4f,"assign_wall_s":$bs%.2f}"""
      println(json)
      out.foreach(o => Files.writeString(Paths.get(o), json + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND))
    }

    // The SHIPPED plan, not a reimplementation: drive the registered
    // q36c at 50 queries (the spark.graft.ann.queryCount witness knob)
    // against the same exact-L2 truth. This line is the VERDICT r15 #1
    // acceptance number.
    val got = try {
      spark.conf.set("spark.graft.ann.queryCount", nq.toString)
      SparkEntry.queries("q36c_ann_ivf_coarse")(spark, dir)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    } finally spark.conf.unset("spark.graft.ann.queryCount")
    val regRecs = gt.keys.toSeq.map(q =>
      (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
    val rReg = regRecs.sum / regRecs.size
    val jr = f"""{"dir":"$dir","n_vectors":$n,"n_queries":$nq""" +
      f""","registered_q36c_recall5":$rReg%.4f}"""
    println(jr)
    out.foreach(o => Files.writeString(Paths.get(o), jr + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND))
    PipelineQueries.cleanupArtifacts(spark)
    spark.stop()
  }
}
