package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the round-7 additions: perplexity filtering (q93)
  * and importance resampling (q94). Exact values are pinned by the
  * DuckDB oracle; these hold for any corpus.
  */
class Round7OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q93: every doc scored once, keep flag is exactly nll <= mean(nll)") {
    val out = PipelineQueries.queries("q93_perplexity_filter")(spark, dir).cache()
    val nDocs = Tables(spark, dir).documents.count()
    assert(out.count() == nDocs, "every document must be scored")
    assert(out.filter($"nll" <= 0).isEmpty, "NLL of a proper LM is positive")
    // n_bigrams = token count - 1 (every doc has >= 10 tokens).
    val tok = Tables(spark, dir).documents.select($"doc_id",
      size(expr("array_remove(split(text, ' '), '')")).cast("long").as("nt"))
    assert(out.join(tok, "doc_id").filter($"n_bigrams" =!= $"nt" - 1).isEmpty)
    // The gate is internally consistent: recomputing the corpus-mean
    // threshold from the output reproduces every keep flag, and the
    // gate actually splits the corpus (corpus-adaptive threshold).
    val thr = out.agg(avg($"nll")).first.getDouble(0)
    val eps = 1e-6 // threshold is rounded to 6 dp in-query
    assert(out.filter(($"nll" <= thr - eps) && !$"keep").isEmpty)
    assert(out.filter(($"nll" > thr + eps) && $"keep").isEmpty)
    assert(out.filter($"keep").count() > 0 && out.filter(!$"keep").count() > 0,
      "corpus-mean threshold must split the corpus")
    out.unpersist()
  }

  test("q93: train-split docs score no worse than unseen docs on average") {
    // Train docs contain only seen bigrams (higher probability under
    // add-1 smoothing), so their mean NLL must be below the held-out
    // docs' mean — the sanity check that the LM actually trained.
    val out = PipelineQueries.queries("q93_perplexity_filter")(spark, dir)
      .withColumn("train", $"doc_id" % 5 === 0)
    val m = out.groupBy($"train").agg(avg($"nll").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) < m(false),
      s"train mean ${m(true)} should be below held-out mean ${m(false)}")
  }

  test("q94: p decreases with source size, keep flags recompute from u < p") {
    val out = PipelineQueries.queries("q94_importance_resample")(spark, dir).cache()
    val nDocs = Tables(spark, dir).documents.count()
    assert(out.count() == nDocs, "every document must carry a decision")
    assert(out.filter($"p_keep" <= 0 || $"p_keep" > 1).isEmpty)
    // Temperature scaling upweights small sources: p is monotone
    // non-increasing in per-source token count.
    val per = out.groupBy($"source")
      .agg(sum($"n_tokens").as("t"), max($"p_keep").as("p"))
    val pairs = per.as("a").crossJoin(per.as("b"))
      .filter($"a.t" < $"b.t" && $"a.p" < $"b.p" - lit(1e-9))
    assert(pairs.isEmpty, "a larger source must not get a larger keep-prob")
    // The thinning is real on this corpus (nothing saturates at 1 when
    // the adaptive budget is half the corpus and sources are similar).
    assert(out.filter($"keep").count() > 0 && out.filter(!$"keep").count() > 0)
    out.unpersist()
  }
}
