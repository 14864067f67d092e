package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Invariants for the round-8 additions: corpus-shape diagnostics
  * (q105 Heaps curve, q106 Zipf slope), the token-entropy gate (q107),
  * event funnel / transition analytics (q108, q110), and the
  * median+MAD outlier filter (q109). Exact values are pinned by the
  * DuckDB oracle; these hold for any corpus.
  */
class Round8OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val toks = "array_remove(split(text, ' '), '')"

  test("q105: deciles partition docs/tokens, cum_vocab ends at |vocab|") {
    val out = PipelineQueries.queries("q105_vocab_growth")(spark, dir).cache()
    val t = Tables(spark, dir)
    val nDocs = t.documents.count()
    val base = t.documents.select(explode(expr(toks)).as("w")).cache()
    val nToks = base.count()
    val nVocab = base.agg(countDistinct($"w")).first.getLong(0)
    assert(out.agg(sum($"n_docs")).first.getLong(0) == nDocs)
    assert(out.agg(sum($"n_tokens")).first.getLong(0) == nToks)
    val last = out.orderBy($"decile".desc).first
    assert(last.getAs[Long]("cum_vocab") == nVocab,
      "the curve must end at the full vocabulary size")
    assert(last.getAs[Long]("cum_tokens") == nToks)
    // Cumulative columns are running sums of the per-band columns.
    val rows = out.orderBy($"decile").collect()
    var (ct, cv) = (0L, 0L)
    rows.foreach { r =>
      ct += r.getAs[Long]("n_tokens"); cv += r.getAs[Long]("n_new")
      assert(r.getAs[Long]("cum_tokens") == ct)
      assert(r.getAs[Long]("cum_vocab") == cv)
    }
    base.unpersist(); out.unpersist()
  }

  test("q106: slope is non-positive and recomputes from the freq table") {
    val out = PipelineQueries.queries("q106_zipf_slope")(spark, dir).first
    // y = ln(freq) is non-increasing in rank, so the LS slope can't be
    // positive (Chebyshev's sum inequality on the centered products).
    assert(out.getAs[Double]("zipf_slope") <= 0.0)
    // Recompute the regression driver-side from the same top-100 cut.
    val top = Tables(spark, dir).documents
      .select(explode(expr(toks)).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .orderBy($"f".desc, $"w").limit(100)
      .collect().map(_.getLong(1).toDouble)
    val n = top.length
    assert(out.getAs[Long]("n_ranks") == n.toLong)
    val xs = (1 to n).map(r => math.log(r.toDouble))
    val ys = top.map(math.log)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.getAs[Double]("zipf_slope") - slope) < 1e-4,
      s"engine slope ${out.getAs[Double]("zipf_slope")} vs driver $slope")
  }

  test("q107: entropy bounded by ln(n_toks), gate recomputes from mean") {
    val out = PipelineQueries.queries("q107_token_entropy")(spark, dir).cache()
    val nDocs = Tables(spark, dir).documents
      .filter(size(expr(toks)) > 0).count()
    assert(out.count() == nDocs, "every non-empty doc must be scored")
    val eps = 1e-3 // entropy is rounded to 4 dp in-query
    assert(out.filter($"entropy" < -eps).isEmpty, "entropy is non-negative")
    assert(out.filter($"entropy" > log($"n_toks".cast("double")) + eps)
      .isEmpty, "uniform distribution maximizes entropy at ln(n)")
    val thr = out.agg(avg($"entropy")).first.getDouble(0)
    assert(out.filter(($"entropy" >= thr + eps) && !$"keep").isEmpty)
    assert(out.filter(($"entropy" < thr - eps) && $"keep").isEmpty)
    assert(out.filter($"keep").count() > 0 && out.filter(!$"keep").count() > 0,
      "corpus-mean threshold must split the corpus")
    out.unpersist()
  }

  test("q108: funnel counts are monotone, conversions recompute") {
    val out = RelationalQueries.queries("q108_event_funnel")(spark, dir)
      .orderBy($"step").collect()
    assert(out.length == 4)
    val ns = out.map(_.getAs[Long]("n_users"))
    assert(ns.sliding(2).forall(p => p(0) >= p(1)),
      "strict-after stages can only lose users")
    out.zipWithIndex.foreach { case (r, i) =>
      val prev = if (i == 0) ns(0) else ns(i - 1)
      val expPrev = if (prev == 0) 0.0
        else math.floor(ns(i).toDouble / prev * 10000 + 0.5) / 10000
      assert(r.getAs[Double]("conv_prev") == expPrev)
      val expFirst = if (ns(0) == 0) 0.0
        else math.floor(ns(i).toDouble / ns(0) * 10000 + 0.5) / 10000
      assert(r.getAs[Double]("conv_first") == expFirst)
    }
  }

  test("q109: med/MAD match a driver-side sort, flags recompute") {
    val out = PipelineQueries.queries("q109_mad_outlier")(spark, dir).cache()
    val vals = Tables(spark, dir).documents
      .select($"n_chars".cast("double")).collect().map(_.getDouble(0)).sorted
    def medOf(a: Array[Double]): Double = {
      val i = 0.5 * (a.length - 1)
      val (lo, hi) = (a(i.toInt), a(math.ceil(i).toInt))
      lo + (hi - lo) * (i - math.floor(i))
    }
    val med = medOf(vals)
    val mad = medOf(vals.map(v => math.abs(v - med)).sorted)
    val r0 = out.first
    assert(r0.getAs[Double]("med") == math.floor(med * 100 + 0.5) / 100 ||
      r0.getAs[Double]("med") == med, s"median ${r0.getAs[Double]("med")} vs $med")
    assert(math.abs(r0.getAs[Double]("mad") - mad) < 1e-9)
    // Every flag recomputes from the raw column and the two constants.
    val bad = out.filter(
      (abs($"n_chars".cast("double") - lit(med)) > lit(3.0) * lit(mad)) =!=
        $"is_outlier")
    assert(bad.isEmpty, "is_outlier must equal |x - med| > 3*MAD")
    out.unpersist()
  }

  test("q110: transition rows normalize per prev_type, counts total") {
    val out = RelationalQueries.queries("q110_type_transitions")(spark, dir)
      .cache()
    // Per-prev probabilities sum to 1 (up to the 6-dp per-cell round).
    val sums = out.groupBy($"prev_type").agg(sum($"p").as("sp"),
      sum($"n").as("sn")).collect()
    sums.foreach { r =>
      assert(math.abs(r.getAs[Double]("sp") - 1.0) < 1e-4,
        s"${r.getString(0)} probabilities sum to ${r.getAs[Double]("sp")}")
    }
    // Total transitions = events minus one per user with >= 1 event.
    val t = Tables(spark, dir)
    val nEvents = t.events.count()
    val nUsers = t.events.select($"user_id").distinct.count()
    assert(out.agg(sum($"n")).first.getLong(0) == nEvents - nUsers)
    out.unpersist()
  }
}
