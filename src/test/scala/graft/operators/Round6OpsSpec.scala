package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the round-6 additions: BM25 retrieval (q84) and the
  * weighted per-stratum sample (q85). Exact values are pinned by the
  * DuckDB oracle; these hold for any corpus.
  */
class Round6OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q84: ranked descending, positive scores, at most 5 matched terms") {
    val out = PipelineQueries.queries("q84_bm25_topk")(spark, dir).cache()
    val rows = out.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("score") > 0))
    assert(rows.forall { r =>
      val n = r.getAs[Long]("n_terms"); n >= 1 && n <= 5
    })
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse, "not ranked by score desc")
    out.unpersist()
  }

  test("q84: every returned doc actually contains a query term") {
    val docs = Tables(spark, dir).documents
    val inst = docs.select($"doc_id",
      explode(expr("array_remove(split(text, ' '), '')")).as("tok"))
    val qterms = inst.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(5).select($"tok")
    val matching = inst.join(qterms, "tok").select($"doc_id").distinct()
    val out = PipelineQueries.queries("q84_bm25_topk")(spark, dir)
    assert(out.join(matching, Seq("doc_id"), "left_anti").isEmpty)
  }

  test("q85: at most 10 per language, ranks contiguous, keys recompute") {
    val out = PipelineQueries.queries("q85_weighted_sample")(spark, dir).cache()
    val per = out.groupBy($"lang").agg(count(lit(1)).as("n"),
      max($"rk").as("mx"))
    // n == mx means ranks 1..n are contiguous within each stratum.
    assert(per.filter($"n" > 10 || $"n" =!= $"mx").isEmpty)
    // Rank order is key order: within each language the emitted keys
    // are non-decreasing in rk (exact key values are the oracle's job).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"rk")
    assert(out.withColumn("prev", lag($"key", 1).over(w))
      .filter($"prev".isNotNull && $"key" < $"prev").isEmpty)
    out.unpersist()
  }

  test("q85: heavier docs get stochastically smaller keys (bias witness)") {
    // Within each language, the mean token count of the SELECTED docs
    // must exceed the stratum mean — the whole point of weighting by
    // length. (Deterministic: fixed scramble, fixed corpus.)
    val sel = PipelineQueries.queries("q85_weighted_sample")(spark, dir)
      .groupBy($"lang").agg(avg($"n_tokens").as("sel_mean"))
    val all = Tables(spark, dir).documents
      .select($"lang",
        size(expr("array_remove(split(text, ' '), '')")).as("n_tokens"))
      .filter($"n_tokens" > 0)
      .groupBy($"lang").agg(avg($"n_tokens").as("all_mean"))
    val bad = sel.join(all, "lang").filter($"sel_mean" <= $"all_mean")
    assert(bad.isEmpty, "length bias missing in at least one stratum")
  }
}
