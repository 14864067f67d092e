package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN recall-at-scale witness (VERDICT r11 #1): mean recall@5 for the
  * three sublinear ANN paths against exact brute force, at an arbitrary
  * corpus dir, as one JSON line — the `AnnRecallSpec` measurement made
  * mechanical so the SCALE.md §6 curve re-measures with one command per
  * corpus instead of a hand-driven spark-shell session:
  *
  *   sbt -batch "runMain graft.AnnRecall /tmp/scale_10x [out.json]"
  *
  * Ground truth is q25's exact cosine top-5 for LSH/IVF and an exact-L2
  * scan for PQ (whose ADC approximates L2). Also reports the dial each
  * query's [[graft.operators.AnnPolicy]] resolved to at this corpus
  * size, so the recall curve and the policy curve land in the same
  * line.
  */
object AnnRecall {

  private def topSets(rows: Array[(Long, Long)]): Map[Long, Set[Long]] =
    rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

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

    def run(name: String): Map[Long, Set[Long]] =
      topSets(SparkEntry.queries(name)(spark, dir)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect())

    def recall(gt: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
      val recs = gt.keys.toSeq.map(q =>
        (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
      recs.sum / recs.size
    }

    val e = graft.operators.Tables(spark, dir).embeddings
      .select($"vec_id", $"embedding")
    val n = e.count()
    val numLists = e.filter($"vec_id" % 125 === 0).count()

    val gtCos = topSets(
      graft.operators.PipelineQueries.queries("q25_cosine_topk")(spark, dir)
        .filter($"rank" <= 5).select($"query_id", $"vec_id")
        .as[(Long, Long)].collect())
    val qv = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val w = Window.partitionBy($"query_id").orderBy($"l2", $"vec_id")
    val gtL2 = topSets(e.crossJoin(broadcast(qv))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect())

    val rLsh = recall(gtCos, run("q26_ann_lsh"))
    val rIvf = recall(gtCos, run("q36_ann_ivf"))
    val rPq = recall(gtL2, run("q60_ann_pq"))
    // Round-14 trained-quantizer variants (VERDICT r13 #1/#2): all three
    // are L2-metric (the metric the quantizer was trained in), so their
    // truth is the exact-L2 ranking.
    val rIvfT = recall(gtL2, run("q36b_ann_ivf_trained"))
    val rPqT = recall(gtL2, run("q60b_ann_pq_trained"))
    val rQ142 = recall(gtL2, run("q142_stream_ann_query"))
    // Round-15 two-level-coarse and matryoshka variants — graded at
    // 50-QUERY granularity via the spark.graft.ann.queryCount witness
    // knob (VERDICT r15 #1: 5 queries resolve recall@5 only in 0.04
    // steps — the r15 five-query 0.68 was actually 0.62). The other
    // lines keep the oracle's 5 queries; their operators have no knob.
    val qv50 = e.filter($"vec_id" < 50)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val gtL2w = topSets(e.crossJoin(broadcast(qv50))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect())
    val (rIvfC, rIvfM) = try {
      spark.conf.set("spark.graft.ann.queryCount", "50")
      (recall(gtL2w, run("q36c_ann_ivf_coarse")),
        recall(gtL2w, run("q151_ann_matryoshka")))
    } finally spark.conf.unset("spark.graft.ann.queryCount")
    val numListsTrained =
      graft.operators.PipelineQueries.trainedCodebook(spark, dir).count()

    // Round-15 filtered ANN (q147): truth is the exact label-filtered
    // L2 scan — the quantity the FilteredMatchTarget policy is supposed
    // to hold up as the predicate gets selective. The 10-row label
    // histogram also resolves the probe-width band the policy picked.
    val el = graft.operators.Tables(spark, dir).embeddings
      .select($"vec_id", $"embedding", $"label")
    val qvl = el.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        $"label".as("ql"))
    val gtFil = topSets(el.crossJoin(broadcast(qvl))
      .filter($"label" === $"ql" && $"vec_id" =!= $"query_id")
      .withColumn("l2", graft.functions.GraftFunctions.l2Sq($"embedding", $"qe"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect())
    val rFil = recall(gtFil, run("q147_ann_filtered"))
    val labelCounts = el.groupBy($"label").count()
      .as[(Int, Long)].collect().map(_._2) // 10 rows — bounded

    val pol = graft.operators.AnnPolicy
    val json = f"""{"dir":"${dir.replace("\\", "\\\\").replace("\"", "\\\"")}"""" +
      f""","n_vectors":$n,"num_lists":$numLists""" +
      f""","num_lists_trained":$numListsTrained""" +
      f""","lsh_radius":${pol.lshRadius(n)},"ivf_nprobe":${pol.ivfNprobe(numLists)}""" +
      f""","ivf_nprobe_trained":${pol.ivfNprobe(numListsTrained)}""" +
      f""","pq_shortlist":${pol.pqShortlist(n)}""" +
      f""","recall5_lsh":$rLsh%.4f,"recall5_ivf":$rIvf%.4f,"recall5_pq":$rPq%.4f""" +
      f""","recall5_ivf_trained":$rIvfT%.4f,"recall5_pq_trained":$rPqT%.4f""" +
      f""","recall5_q142_stream":$rQ142%.4f""" +
      f""","k_grown":${pol.grownK(n)},"recall5_ivf_coarse":$rIvfC%.4f""" +
      f""","recall5_ann_matryoshka":$rIvfM%.4f""" +
      f""","nq_coarse_matryoshka":50""" +
      f""","recall5_ann_filtered":$rFil%.4f""" +
      f""","filtered_np_min":${labelCounts.map(pol.filteredNprobe(numListsTrained, _)).min}""" +
      f""","filtered_np_max":${labelCounts.map(pol.filteredNprobe(numListsTrained, _)).max}}"""
    if (args.length > 1) Files.writeString(Paths.get(args(1)), json + "\n")
    // The trained-codebook / IVFPQ-index runs above materialized
    // session-keyed artifacts under java.io.tmpdir; drop them like
    // Bench's epilogue does — no later session can reuse another
    // application id's trees, so leaving them is a pure leak (ADVICE
    // r14 #1).
    graft.operators.PipelineQueries.cleanupArtifacts(spark)
    spark.stop()
    println(json)
  }
}
