package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Round-13 (build round 11) invariants: the star-contraction CC
  * algorithm (q136) against both min-label propagation (q46) and a
  * brute-force union-find, the KL drift identities (q134), the JL
  * audit's internal consistency (q137), and the dedup cascade's
  * sequential-survivor monotonicity (q138). q135's sketch guarantee
  * lives in `MisraGriesSpec`.
  */
class Round13OpsSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark

  private val dir = "/root/testdata/sf0.001"

  test("q136: star contraction equals min-label propagation on the fixture") {
    val a = PipelineQueries.queries("q46_dedup_groups")(spark, dir)
      .collect().map(_.toSeq).toSet
    val b = PipelineQueries.queries("q136_cc_bigstar")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(a.nonEmpty, "fixture should have near-dup groups")
    assert(a == b,
      s"algorithms disagree: only-propagation=${(a -- b).take(3)} " +
        s"only-bigstar=${(b -- a).take(3)}")
  }

  test("q136: bigStarLabels matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    for (trial <- 1 to 12) {
      val n = 8 + rnd.nextInt(50)
      val nEdges = rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (a, b)
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // Brute-force union-find with path compression.
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = nodes.map(v =>
          (v, {
            // Component minimum = minimum over nodes sharing the root.
            val r = find(v.toInt)
            nodes.filter(u => find(u.toInt) == r).min
          })).toSet
        val pairs = edges.toDF("doc_a", "doc_b")
        val got = PipelineQueries.bigStarLabels(pairs)
          .as[(Long, Long)].collect().toSet
        assert(got == expected,
          s"trial $trial (n=$n, e=${edges.size}): " +
            s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
      }
    }
  }

  test("q134: KL is non-negative and zero for a source equal to the corpus") {
    import spark.implicits._
    val out = PipelineQueries.queries("q134_source_kl_drift")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val kl = r.getAs[Double]("kl")
      // Gibbs' inequality: KL >= 0 exactly; rounding can dip one ulp of
      // the 6-dp grid below zero at most.
      assert(kl >= -1e-6, s"source ${r.get(0)}: negative KL $kl")
    }
    // Single-source corpus: p_source == p_corpus, every term ln(1)=0.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_kl_single")
    try {
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("source", lit("only"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val single = PipelineQueries.queries("q134_source_kl_drift")(
        spark, tmp.toString).collect()
      assert(single.length == 1 && single.head.getAs[Double]("kl") == 0.0,
        s"single-source KL must be exactly 0, got ${single.toSeq}")
    } finally {
      // The temp corpus leaked one directory per run before r12
      // (ADVICE r11); cleanup shared via Fixtures (handle-closing,
      // ADVICE r12).
      Fixtures.deleteRecursively(tmp)
    }
  }

  test("q137: per-pair err and corpus mean are internally consistent") {
    val rows = PipelineQueries.queries("q137_jl_projection")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    var scaled = 0L
    rows.foreach { r =>
      val cf = r.getAs[Double]("cos_full")
      val cp = r.getAs[Double]("cos_proj")
      val err = r.getAs[Double]("err")
      assert(math.abs(cp) <= 1.0 + 1e-6, s"cos_proj out of range: $cp")
      assert(err == math.floor(math.abs(cf - cp) * 1e6 + 0.5) / 1e6,
        s"err not the rounded |cos_full - cos_proj| at ${r.get(0)}")
      scaled += math.floor(err * 1e6 + 0.5).toLong
    }
    val mean = math.floor(
      scaled / (rows.length * 1e6) * 1e6 + 0.5) / 1e6
    assert(rows.forall(_.getAs[Double]("mean_err") == mean),
      "mean_err must equal the scaled-integer mean of the per-pair errs")
  }

  test("q139: streaming sketch + exact verify equals batch q135 row-for-row") {
    // Misra–Gries summary CONTENT is partition/merge-order dependent —
    // the streaming run's candidate set may differ from the batch
    // run's — but both are guaranteed supersets of the true heavy
    // hitters, so the exact-verified OUTPUT must be identical.
    val batch = PipelineQueries.queries("q135_heavy_hitters")(spark, dir)
      .collect().map(_.toSeq).toSet
    val streamed = graft.streaming.StreamingQueries
      .queries("q139_stream_heavy_hitters")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "fixture should have heavy tokens")
    assert(streamed == batch,
      s"paths disagree: only-batch=${(batch -- streamed).take(3)} " +
        s"only-stream=${(streamed -- batch).take(3)}")
  }

  test("q138: cascade stages are monotone; exact stage sums to distinct texts") {
    import spark.implicits._
    val rows = PipelineQueries.queries("q138_dedup_cascade")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, e, b, nd) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_bow"), r.getAs[Long]("n_neardup"))
      assert(d >= e && e >= b && b >= nd && nd >= 0,
        s"source ${r.get(0)}: stages not monotone ($d, $e, $b, $nd)")
    }
    val totalExact = rows.map(_.getAs[Long]("n_exact")).sum
    val distinctTexts = spark.read.parquet(s"$dir/documents.parquet")
      .select(md5(col("text"))).distinct().count()
    assert(totalExact == distinctTexts,
      s"stage-1 survivors ($totalExact) must equal distinct texts ($distinctTexts)")
  }
}
