package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AnnPolicy, PipelineQueries}

/** Drift-gate end-to-end witness (VERDICT r14 #2, second half): on a
  * corpus whose delta partition is DISTRIBUTION-SHIFTED, (1) the q145
  * gate fires, and (2) obeying it — retraining the codebook on the
  * full corpus — restores the delta's ANN recall that the frozen
  * codebook lost. One JSON line:
  *
  *   spark-submit --class graft.DriftWitness <jar> <corpusDir> [out.json]
  *
  * The corpus is expected to carry the drift in its tail (vec_id ≥ the
  * q143/q145 9/10 cut) — tools/gen_drift_corpus.py builds one from any
  * fuzz corpus: a MULTI-MODAL shift (8 sub-clusters, each displaced
  * along its own 8-dim block). Multi-modal matters: a single uniform
  * shift collapses the whole delta into one frozen cell that is always
  * probed, and recall survives at inflated scan cost (first-cut run
  * measured exactly that — recall 1.00 both sides); orthogonal modes
  * scatter each mode's members across frozen cells by their unshifted
  * dims, which is what actually breaks a frozen probe. Recall is
  * measured FOR THE SHIFTED QUERIES (20 query vectors drawn from the
  * delta); ground truth is the exact-L2 top-5 over the full corpus.
  */
object DriftWitness {

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

    // 1. The gate.
    val gate = SparkEntry.queries("q145_index_drift_gate")(spark, dir)
      .collect().head
    val kl = gate.getAs[Double]("kl")
    val floor = gate.getAs[Double]("noise_floor")
    val fired = gate.getAs[Boolean]("retrain")

    // 2. Recall for 20 shifted queries, frozen vs retrained codebook.
    val qv = e.filter($"vec_id" >= cut && $"vec_id" < cut + 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qe")).cache()
    val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
    val gt = e.crossJoin(broadcast(qv))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("l2",
        graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    def recallWith(cb: DataFrame): (Double, Double) = {
      val cents = cb.select($"cid", $"ce").cache()
      val nprobe = AnnPolicy.ivfNprobe(cents.count()).toInt
      val asg = e.repartition(Par.width(spark), $"vec_id").crossJoin(broadcast(cents))
        .withColumn("d",
          graft.functions.GraftFunctions.l2Sq($"embedding", $"ce"))
        .groupBy($"vec_id")
        .agg(min_by($"cid", struct($"d", $"cid")).as("cid"))
        .join(e, "vec_id").cache()
      asg.count()
      val wq = Window.partitionBy($"query_id").orderBy($"d", $"cid")
      val qcells = qv.crossJoin(broadcast(cents))
        .withColumn("d",
          graft.functions.GraftFunctions.l2Sq($"qe", $"ce"))
        .withColumn("rk", row_number().over(wq)).filter($"rk" <= nprobe)
        .select($"query_id", $"qe", $"cid")
      val cand = qcells.join(asg, "cid").filter($"vec_id" =!= $"query_id")
      val nCand = cand.count()
      val got = cand
        .withColumn("l2",
          graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      asg.unpersist(); cents.unpersist()
      val recs = gt.keys.toSeq.map(q =>
        (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
      (recs.sum / recs.size, nCand.toDouble / (20L * n))
    }

    val (rFrozen, sFrozen) = recallWith(
      PipelineQueries.trainedCodebookBefore(spark, dir, cut))

    // RETRAIN ≠ re-running the frozen trainer: the production trainer
    // seeds from the first-K vec_ids, which all predate the drift — a
    // new mode never gets a seed, one Lloyd step barely moves old
    // centroids (delta is 10% of the mass spread over K cells), and
    // the retrained codebook ≈ the frozen one. The retrain a fired
    // gate should trigger RE-SEEDS FROM THE CURRENT DISTRIBUTION: a
    // stride-⌈n/K⌉ stratified sample (≈10% of seeds land in the delta
    // partition by construction) + two Lloyd steps. Same per-step
    // shapes as the trainer (broadcast centroids, one row per vector
    // shuffled, K×D mean update).
    val k = AnnPolicy.TrainedK
    val stride = (n + k - 1) / k
    val seeds = e.filter($"vec_id" % stride === 0)
      .select($"vec_id".as("cid"), $"embedding".cast("array<double>").as("ce"))
    val ew = e.repartition(Par.width(spark), $"vec_id")
    val step1 = PipelineQueries.kmUpdate(ew, PipelineQueries.kmAssign(ew, seeds))
    val retrained = PipelineQueries.kmUpdate(ew, PipelineQueries.kmAssign(ew, step1))
      .cache()
    val (rRetrained, sRetrained) = recallWith(retrained)

    val json =
      f"""{"dir":"$dir","n_vectors":$n,"cut":$cut""" +
        f""","kl":$kl%.4f,"noise_floor":$floor%.4f,"gate_fired":$fired""" +
        f""","recall5_frozen":$rFrozen%.4f,"scan_frac_frozen":$sFrozen%.4f""" +
        f""","recall5_retrained":$rRetrained%.4f,"scan_frac_retrained":$sRetrained%.4f}"""
    if (args.length > 1) Files.writeString(Paths.get(args(1)), json + "\n")
    PipelineQueries.cleanupArtifacts(spark)
    spark.stop()
    println(json)
  }
}
