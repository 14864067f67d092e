package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AnnPolicy, PipelineQueries}

/** Giant-cell LOCAL-repair witness (VERDICT r15 #7): on a drifted
  * corpus whose q148 flag FIRES (the §10.2 unimodal collapse —
  * `tools/gen_drift_corpus.py <src> <dst> 5.0 1`), measure what the
  * q156 local split buys: per-query scan fraction and recall@5 for 20
  * SHIFTED queries, served by (a) the frozen index as-is and (b) the
  * repaired index — untouched cells' routing byte-identical, the
  * giant cell replaced by its S sub-cells. The repair is the
  * registered q156 chain (trained codebook, first-S-by-vec_id seeds,
  * one Lloyd step), re-derived here at witness granularity; the
  * UNTOUCHED-LEDGER contract is asserted, not assumed: every
  * non-giant cell's member set must be identical before and after.
  *
  *   sbt -batch "runMain graft.RepairWitness /tmp/drift_uni [out.json]"
  */
object RepairWitness {

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
    val cut = (e.agg(max($"vec_id")).first.getLong(0) + 1L) * 9L / 10L

    val cents = PipelineQueries.trainedCodebook(spark, dir)
      .select($"cid", $"ce").cache()
    val nLists = cents.count()
    val asg = e.repartition(Par.width(spark), $"vec_id").crossJoin(broadcast(cents))
      .withColumn("d", graft.functions.GraftFunctions.l2Sq($"embedding", $"ce"))
      .groupBy($"vec_id")
      .agg(min_by(struct($"cid", $"embedding"), struct($"d", $"cid")).as("m"))
      .select($"vec_id", $"m.cid".as("cid"), $"m.embedding".as("embedding"))
      .cache()
    asg.count()

    // The repaired ledger straight from the REGISTERED query.
    val repairLedger =
      graft.SparkEntry.queries("q156_cell_repair")(spark, dir).cache()
    val giants = repairLedger.filter($"sub" > 0)
      .select($"cid").distinct().as[Long].collect().sorted
    val nSub = repairLedger.filter($"sub" > 0).count()

    // Re-derive the split ASSIGNMENT (q156 emits counts; the witness
    // needs the member→sub map and sub-centroids to serve queries).
    val cellsG = asg.groupBy($"cid").agg(count(lit(1)).as("n_live"))
      .filter($"cid".isin(giants: _*))
      .withColumn("s_sub",
        expr(s"(n_live * $nLists + $n - 1) DIV $n"))
    val wv = Window.partitionBy($"cid").orderBy($"vec_id")
    val members = asg.join(broadcast(cellsG.select($"cid", $"s_sub")), "cid")
      .withColumn("rk", row_number().over(wv))
    val seeds = members.filter($"rk" <= $"s_sub")
      .select($"cid", $"rk".cast("long").as("sub"),
        $"embedding".cast("array<double>").as("se"))
    val a1 = members.join(broadcast(seeds), "cid")
      .withColumn("d", graft.functions.GraftFunctions.l2Sq($"embedding", $"se"))
      .groupBy($"vec_id")
      .agg(min_by(struct($"cid", $"sub", $"embedding"),
        struct($"d", $"sub")).as("m"))
      .select($"vec_id", $"m.cid".as("cid"), $"m.sub".as("sub"),
        $"m.embedding".as("embedding"))
    val subCents = a1
      .select($"cid", $"sub", posexplode($"embedding").as(Seq("dim", "v")))
      .groupBy($"cid", $"sub", $"dim")
      .agg(graft.operators.CrossRound.r(avg($"v"), 6).as("mm"))
      .groupBy($"cid", $"sub")
      .agg(array_sort(collect_list(struct($"dim", $"mm"))).as("pm"))
      .select($"cid", $"sub", expr("transform(pm, x -> x.mm)").as("sce"))
      .cache()
    val subAsg = members.join(broadcast(subCents), "cid")
      .withColumn("d", graft.functions.GraftFunctions.l2Sq($"embedding", $"sce"))
      .groupBy($"vec_id")
      .agg(min_by(struct($"cid", $"sub", $"embedding"),
        struct($"d", $"sub")).as("m"))
      .select($"vec_id", $"m.cid".as("cid"), $"m.sub".as("sub"),
        $"m.embedding".as("embedding"))

    // UNTOUCHED-LEDGER contract: the witness's sub-counts must equal
    // the registered ledger exactly, and untouched cells keep their
    // counts (they were never re-assigned — asserted via the ledger).
    val wantSub = repairLedger.filter($"sub" > 0)
      .select($"cid", $"sub", $"n_live").orderBy($"cid", $"sub").collect()
    val gotSub = subAsg.groupBy($"cid", $"sub")
      .agg(count(lit(1)).as("n_live")).orderBy($"cid", $"sub").collect()
    require(wantSub.map(_.toString).toSeq == gotSub.map(_.toString).toSeq,
      "witness split diverged from the registered q156 ledger")
    val untouched = repairLedger.filter($"sub" === 0)
      .select($"cid", $"n_live").orderBy($"cid").collect()
    val wantUn = asg.filter(!$"cid".isin(giants: _*))
      .groupBy($"cid").agg(count(lit(1)).as("n_live"))
      .unionByName(cents.select($"cid")
        .join(asg.groupBy($"cid").agg(count(lit(1)).as("n_live")),
          Seq("cid"), "left_anti")
        .select($"cid", lit(0L).as("n_live")))
      .filter(!$"cid".isin(giants: _*))
      .orderBy($"cid").collect()
    require(untouched.map(_.toString).toSeq == wantUn.map(_.toString).toSeq,
      "untouched cells' ledger rows changed — the repair was not local")

    // Serve 20 shifted queries both ways.
    val qv = e.filter($"vec_id" >= cut && $"vec_id" < cut + 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qe")).cache()
    val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
    val gt = e.crossJoin(broadcast(qv))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    /** lists: (lid, centroid); idx: (lid, vec_id, embedding). */
    def serve(lists: DataFrame, idx: DataFrame): (Double, Double) = {
      val nprobe = AnnPolicy.ivfNprobe(lists.count()).toInt
      val wq = Window.partitionBy($"query_id").orderBy($"d", $"lid")
      val qcells = qv.crossJoin(broadcast(lists))
        .withColumn("d", graft.functions.GraftFunctions.l2Sq($"qe", $"lc"))
        .withColumn("rk", row_number().over(wq)).filter($"rk" <= nprobe)
        .select($"query_id", $"qe", $"lid")
      val cand = qcells.join(idx, "lid").filter($"vec_id" =!= $"query_id")
      val nCand = cand.count()
      val got = cand
        .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recs = gt.keys.toSeq.map(q =>
        (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
      (recs.sum / recs.size, nCand.toDouble / (20L * n))
    }

    val (rFrozen, sFrozen) = serve(
      cents.select($"cid".cast("string").as("lid"), $"ce".as("lc")),
      asg.select($"cid".cast("string").as("lid"), $"vec_id", $"embedding"))

    val repairedLists = cents.filter(!$"cid".isin(giants: _*))
      .select($"cid".cast("string").as("lid"), $"ce".as("lc"))
      .unionByName(subCents.select(
        concat($"cid", lit("_"), $"sub").as("lid"), $"sce".as("lc")))
    val repairedIdx = asg.filter(!$"cid".isin(giants: _*))
      .select($"cid".cast("string").as("lid"), $"vec_id", $"embedding")
      .unionByName(subAsg.select(
        concat($"cid", lit("_"), $"sub").as("lid"), $"vec_id", $"embedding"))
    val (rRep, sRep) = serve(repairedLists, repairedIdx)

    val json =
      f"""{"dir":"$dir","n_vectors":$n,"cut":$cut,"n_lists":$nLists""" +
        f""","giant_cells":${giants.length},"sub_cells":$nSub""" +
        f""","recall5_frozen":$rFrozen%.4f,"scan_frac_frozen":$sFrozen%.4f""" +
        f""","recall5_repaired":$rRep%.4f,"scan_frac_repaired":$sRep%.4f}"""
    if (args.length > 1) Files.writeString(Paths.get(args(1)), json + "\n")
    PipelineQueries.cleanupArtifacts(spark)
    spark.stop()
    println(json)
  }
}
