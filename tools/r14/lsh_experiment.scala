// LSH at-scale recall experiment (VERDICT r13 next-round #3 / What's
// wrong #4): the 12-bit radius-3 floor wobbles at 20k (0.44 observed in
// r13's witness vs 0.64 at 80k). Candidates per the IVF div-sweep
// pattern (r13): decide on data between
//   A. the current single 12-bit table at the policy radius (baseline),
//   B. a SECOND independent 12-bit table (hyperplanes 12..23), probe
//      sets unioned at the same per-table radius,
//   C. 16-bit signatures at radii 4 and 5 (re-derived cum table:
//      cum16(4) = 2517/65536 = 3.8%, cum16(5) = 6885/65536 = 10.5% --
//      bracketing the 12-bit r=3 fraction 299/4096 = 7.3%).
// Reports recall@5 vs exact cosine top-5 AND the measured candidate
// fraction (scanned rows / (5 queries x n)), so variants compare at
// like-for-like scan cost. Run:
//   spark-shell --jars <graft jar> -i tools/r14/lsh_experiment.scala
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame

def topSets(df: DataFrame): Map[Long, Set[Long]] = {
  import spark.implicits._
  df.select($"query_id", $"vec_id").as[(Long, Long)].collect()
    .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
}
def recall(gt: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
  val r = gt.keys.toSeq.map(q => (gt(q) & got.getOrElse(q, Set.empty)).size.toDouble / gt(q).size)
  r.sum / r.size
}

def experiment(dir: String): Unit = {
  import spark.implicits._
  val e = spark.read.parquet(s"$dir/embeddings.parquet").select($"vec_id", $"embedding")
  val n = e.count()
  // ground truth: exact cosine top-5 (q25's contract)
  val qv = e.filter($"vec_id" < 5).select($"vec_id".as("query_id"), $"embedding".as("qe"))
  val wgt = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
  val gt = topSets(e.crossJoin(broadcast(qv)).filter($"vec_id" =!= $"query_id")
    .withColumn("cos", graft.functions.GraftFunctions.cosineSim($"embedding", $"qe"))
    .withColumn("rk", row_number().over(wgt)).filter($"rk" <= 5)
    .select($"query_id", $"vec_id"))

  // 24 hyperplane dots once; variants slice them.
  val eb = e.withColumn("dots", graft.functions.GraftFunctions.hyperplaneDots($"embedding", 24))
    .withColumn("b12", expr("""aggregate(sequence(0, 11), CAST(0 AS BIGINT),
        (acc, h) -> acc + IF(dots[h] >= 0D, shiftleft(CAST(1 AS BIGINT), h), CAST(0 AS BIGINT)))"""))
    .withColumn("b12b", expr("""aggregate(sequence(12, 23), CAST(0 AS BIGINT),
        (acc, h) -> acc + IF(dots[h] >= 0D, shiftleft(CAST(1 AS BIGINT), h - 12), CAST(0 AS BIGINT)))"""))
    .withColumn("b16", expr("""aggregate(sequence(0, 15), CAST(0 AS BIGINT),
        (acc, h) -> acc + IF(dots[h] >= 0D, shiftleft(CAST(1 AS BIGINT), h), CAST(0 AS BIGINT)))"""))
    .drop("dots").cache()
  eb.count()

  def run(tag: String, cond: org.apache.spark.sql.Column): Unit = {
    val q = eb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        $"b12".as("qb12"), $"b12b".as("qb12b"), $"b16".as("qb16"))
    val cand = eb.join(broadcast(q), cond && $"vec_id" =!= $"query_id")
    val nc = cand.count()
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    val got = topSets(cand
      .withColumn("cos", graft.functions.GraftFunctions.cosineSim($"embedding", $"qe"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
      .select($"query_id", $"vec_id"))
    val r = recall(gt, got)
    println(f"[lshexp] dir=$dir n=$n variant=$tag recall5=$r%.4f cand_frac=${nc.toDouble / (5.0 * n)}%.4f cand=$nc")
  }

  val rad = graft.operators.AnnPolicy.lshRadius(n)
  run(s"A_12bit_r$rad", expr(s"bit_count(b12 ^ qb12) <= $rad"))
  run(s"B_two12bit_r$rad",
    expr(s"bit_count(b12 ^ qb12) <= $rad") || expr(s"bit_count(b12b ^ qb12b) <= $rad"))
  run("C_16bit_r4", expr("bit_count(b16 ^ qb16) <= 4"))
  run("C_16bit_r5", expr("bit_count(b16 ^ qb16) <= 5"))
  eb.unpersist()
}

experiment("/tmp/scale_10x_r13")
experiment("/tmp/scale_40x_r13")
println("[lshexp] done")
sys.exit(0)
