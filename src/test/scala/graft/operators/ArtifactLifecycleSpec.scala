package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures

/** Lifecycle of the session-keyed persisted artifacts (dedup labels,
  * q81's bucketed signature index, the BPE training artifact, the
  * duplicated-span table, the rare-shingle and winnow pair streams): they
  * materialize once per (session, dir, data-fingerprint), and
  * `cleanupArtifacts` — the Verify/Bench epilogue — drops every path
  * and catalog entry, after which the next caller REBUILDS from data
  * rather than serving a dangling reference (VERDICT r6 #5).
  */
class ArtifactLifecycleSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark

  private val dir = "/root/testdata/sf0.001"

  test("cleanup drops all persisted artifacts; a later call rebuilds") {
    // Materialize all six artifact families (collect forces the build).
    PipelineQueries.queries("q46_dedup_groups")(spark, dir).collect()
    PipelineQueries.queries("q81_delta_dedup")(spark, dir).collect()
    PipelineQueries.queries("q86_bpe_train")(spark, dir).collect()
    PipelineQueries.queries("q89_dup_spans")(spark, dir).collect()
    PipelineQueries.queries("q23_ngram_jaccard")(spark, dir).collect()
    PipelineQueries.queries("q125_winnow_neardup")(spark, dir).collect()
    val labels = new java.io.File(PipelineQueries.dedupLabelsPath(spark, dir))
    val index = new java.io.File(PipelineQueries.deltaIndexPath(spark, dir))
    val bpe = new java.io.File(PipelineQueries.bpeArtifactPath(spark, dir))
    val spans = new java.io.File(PipelineQueries.spanArtifactPath(spark, dir))
    val rare = new java.io.File(PipelineQueries.rarePairsPath(spark, dir))
    val winnow = new java.io.File(PipelineQueries.winnowPairsPath(spark, dir))
    val mhp = new java.io.File(PipelineQueries.minhashPairsPath(spark, dir))
    val idxKey = PipelineQueries.deltaIndexKey(spark, dir)
    assert(labels.exists && index.exists && bpe.exists && spans.exists &&
      rare.exists && winnow.exists && mhp.exists,
      "artifacts must exist on disk after their queries ran")
    assert(spark.catalog.tableExists(idxKey))

    PipelineQueries.cleanupArtifacts(spark)
    assert(!labels.exists && !index.exists && !bpe.exists && !spans.exists &&
      !rare.exists && !winnow.exists && !mhp.exists,
      "cleanup must remove every artifact path")
    assert(!spark.catalog.tableExists(idxKey),
      "cleanup must drop the bucketed index's catalog entry")

    // Rebuild-on-demand: the memo was cleared with the files, so the
    // same queries are green again and the artifacts are back.
    assert(PipelineQueries.queries("q86_bpe_train")(spark, dir)
      .collect().length == 3)
    assert(PipelineQueries.queries("q81_delta_dedup")(spark, dir)
      .collect() != null)
    assert(bpe.exists && index.exists, "artifacts must re-materialize")
  }

  test("concurrent callers of one artifact block until the build completes") {
    // The ADVICE r6 race: under check-then-write, a second caller whose
    // membership test lost proceeded straight to reading a half-written
    // parquet. computeIfAbsent makes losers BLOCK; four threads racing
    // the same cold artifact must all read the complete result.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    PipelineQueries.cleanupArtifacts(spark)
    assert(!new java.io.File(PipelineQueries.bpeArtifactPath(spark, dir)).exists)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val runs = (1 to 4).map(_ => Future {
        PipelineQueries.queries("q86_bpe_train")(spark, dir).collect().length
      })
      val ns = Await.result(Future.sequence(runs), 5.minutes)
      assert(ns.forall(_ == 3), s"a racer saw a partial artifact: $ns")
    } finally pool.shutdown()
  }

  test("q86 and q92 share one training artifact (no retrain on the second)") {
    PipelineQueries.cleanupArtifacts(spark)
    val bpe = new java.io.File(PipelineQueries.bpeArtifactPath(spark, dir))
    assert(!bpe.exists)
    PipelineQueries.queries("q86_bpe_train")(spark, dir).collect()
    assert(bpe.exists)
    val mergesDir = new java.io.File(bpe, "merges")
    val stamp = mergesDir.lastModified
    // q92 must read the persisted artifact, not rewrite it.
    val enc = PipelineQueries.queries("q92_bpe_encode")(spark, dir).collect()
    assert(enc.nonEmpty)
    assert(mergesDir.lastModified == stamp,
      "q92 re-materialized the BPE artifact instead of sharing it")
  }

  test("q89 and q100 share one span artifact (no re-sweep on the second)") {
    PipelineQueries.cleanupArtifacts(spark)
    val spans = new java.io.File(PipelineQueries.spanArtifactPath(spark, dir))
    assert(!spans.exists)
    PipelineQueries.queries("q89_dup_spans")(spark, dir).collect()
    assert(spans.exists)
    val stamp = spans.lastModified
    // q100 must read the persisted spans, not recompute the sweep.
    val out = PipelineQueries.queries("q100_span_excise")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(spans.lastModified == stamp,
      "q100 re-materialized the span artifact instead of sharing it")
  }
}
