package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AnnPolicy, PipelineQueries}

/** Grow-K policy witness (VERDICT r14 #4): measures what growing the
  * trained codebook to [[AnnPolicy.grownK]](n) buys over the calibrated
  * fixed K = 64 at a large corpus — recall@5, index-build wall, probe
  * wall, and the actually-scanned candidate fraction — as one JSON
  * line:
  *
  *   spark-submit --class graft.GrowK <jar> <corpusDir> [out.json]
  *
  * Rationale measured here rather than assumed: with K lists and the
  * ⌈K/10⌉-list probe policy the TARGET scan fraction is ~10% at any K,
  * but what that fraction COSTS differs — at fixed K the lists are
  * n/64-sized, so every probed list drags in ever-larger candidate
  * sets per query as n grows; at K ∝ ⌈√n⌉ the per-list size grows only
  * as √n and the routing table stays a bounded broadcast until the
  * [[AnnPolicy.CoarseRouteBound]] cap, past which the two-level coarse
  * shape (q68b's) takes over. Ground truth is the exact-L2 top-5 over
  * 50 query vectors (more queries than the oracle's 5 for a stabler
  * mean at one corpus).
  */
object GrowK {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
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

    val e = PipelineQueries.embGlob(spark, dir).cache()
    val n = e.count()
    val nq = 50L
    val qv = e.filter($"vec_id" < nq)
      .select($"vec_id".as("query_id"), $"embedding".as("qe")).cache()
    qv.count()

    // Exact-L2 ground truth over the 50 queries.
    val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
    val gt = e.crossJoin(broadcast(qv))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("l2",
        graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    /** recall@5, build wall s, probe wall s, scanned candidate frac. */
    def ivfAt(k: Long): (Double, Double, Double, Double) = {
      val cb = PipelineQueries.trainedCodebookK(spark, dir, k)
      val cents = cb.select($"cid", $"ce").cache()
      val kActual = cents.count()
      val nprobe = AnnPolicy.ivfNprobe(kActual).toInt

      // Index build: one linear assignment pass, persisted like the
      // production artifact (codebook training time is inside
      // trainedCodebookK's materializeOnce and reported implicitly in
      // build wall on first call).
      val idxPath = s"${System.getProperty("java.io.tmpdir")}/growk_idx_" +
        spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_") +
        s"_$k"
      val t0 = System.nanoTime()
      e.repartition(Par.width(spark), $"vec_id").crossJoin(broadcast(cents))
        .withColumn("d",
          graft.functions.GraftFunctions.l2Sq($"embedding", $"ce"))
        .groupBy($"vec_id")
        .agg(min_by($"cid", struct($"d", $"cid")).as("cid"))
        .write.mode("overwrite").parquet(idxPath)
      val buildS = (System.nanoTime() - t0) / 1e9

      val idx = spark.read.parquet(idxPath).join(e, "vec_id")

      // Probe: nprobe nearest lists per query, exact re-rank inside.
      val wq = Window.partitionBy($"query_id").orderBy($"d", $"cid")
      val t1 = System.nanoTime()
      val qcells = qv.crossJoin(broadcast(cents))
        .withColumn("d",
          graft.functions.GraftFunctions.l2Sq($"qe", $"ce"))
        .withColumn("rk", row_number().over(wq)).filter($"rk" <= nprobe)
        .select($"query_id", $"qe", $"cid")
      val cand = qcells.join(idx, "cid")
        .filter($"vec_id" =!= $"query_id")
      val nCand = cand.count()
      val got = cand
        .withColumn("l2",
          graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val probeS = (System.nanoTime() - t1) / 1e9

      val recs = gt.keys.toSeq.map(q =>
        (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
      (recs.sum / recs.size, buildS, probeS, nCand.toDouble / (nq * n))
    }

    val kGrown = AnnPolicy.grownK(n)
    val (rF, bF, pF, sF) = ivfAt(AnnPolicy.TrainedK)
    val (rG, bG, pG, sG) = ivfAt(kGrown)

    val json =
      f"""{"dir":"$dir","n_vectors":$n,"n_queries":$nq""" +
        f""","k_fixed":${AnnPolicy.TrainedK},"k_grown":$kGrown""" +
        f""","nprobe_fixed":${AnnPolicy.ivfNprobe(AnnPolicy.TrainedK)}""" +
        f""","nprobe_grown":${AnnPolicy.ivfNprobe(kGrown)}""" +
        f""","fixed":{"recall5":$rF%.4f,"build_s":$bF%.2f,"probe_s":$pF%.2f,"scan_frac":$sF%.4f}""" +
        f""","grown":{"recall5":$rG%.4f,"build_s":$bG%.2f,"probe_s":$pG%.2f,"scan_frac":$sG%.4f}}"""
    if (args.length > 1) Files.writeString(Paths.get(args(1)), json + "\n")
    // Drop the two probe indexes (not materializeOnce-registered) plus
    // the session's codebook artifacts.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete(): Unit
    }
    Seq(AnnPolicy.TrainedK, kGrown).foreach { k =>
      rm(new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/growk_idx_" +
          spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_") +
          s"_$k"))
    }
    PipelineQueries.cleanupArtifacts(spark)
    spark.stop()
    println(json)
  }
}
