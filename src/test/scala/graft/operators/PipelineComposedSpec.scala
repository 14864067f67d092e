package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gsheets.Fixtures

/** Row-count oracle for the composed curation pipeline (VERDICT r14
  * #5): every stage's survivor count must tie back to the REGISTERED
  * query it is built from — the composition can't drift from the
  * operators the DuckDB oracle grades. The 200k-doc wall/shuffle
  * witness runs through the same [[ComposedPipeline.run]]
  * (evidence/r15/pipeline_composed_200k.json, SCALE.md §10).
  */
class PipelineComposedSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("composed pipeline: stage counts equal the registered queries' " +
      "own accounting at sf0.01") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_composed")
    try {
      val r = ComposedPipeline.run(spark, dir, tmp.toString)
      val Seq(s1, s2, s3, s4, s5) = r.stages
      r.stages.foreach(st => info(
        f"${st.name}%-18s ${st.inDocs}%6d -> ${st.outDocs}%6d " +
          f"${st.wallS}%6.2fs shufW=${st.shuffleWriteMb}%.1fMB"))

      // Stage 1 == q138's per-source near-dup survivor totals.
      val q138 = DedupQueries.queries("q138_dedup_cascade")(spark, dir)
        .agg(sum($"n_neardup"), sum($"n_docs")).first
      assert(s1.inDocs == q138.getLong(1))
      assert(s1.outDocs == q138.getLong(0),
        "cascade survivors differ from q138's rollup")
      assert(s1.outDocs > 0 && s1.outDocs < s1.inDocs,
        "fixture must exercise all three cascade tiers")

      // Stage 2 rewrites text; only sub-minimal fragments (< 3 tokens
      // after excision — can't form one shingle) drop.
      val q100Kept = DedupQueries.queries("q100_span_excise")(
        spark, s"$tmp/stage1").filter($"kept_tokens" >= 3).count()
      assert(s2.outDocs == q100Kept)
      assert(s2.outDocs <= s1.outDocs)
      // ...but actually excises: total characters must shrink vs stage 1.
      val chars1 = spark.read.parquet(s"$tmp/stage1/documents.parquet")
        .agg(sum(length($"text"))).first.getLong(0)
      val chars2 = spark.read.parquet(s"$tmp/stage2/documents.parquet")
        .agg(sum(length($"text"))).first.getLong(0)
      assert(chars2 < chars1, "span excision removed no text")

      // Stage 3 == q73 keeps ∩ q51 clean docs on the stage-2 corpus.
      val q73Keep = TextQueries.queries("q73_quality_classifier")(
        spark, s"$tmp/stage2").filter($"keep")
        .select($"doc_id").as[Long].collect().toSet
      val q51Clean = DedupQueries.queries("q51_decontaminate")(
        spark, s"$tmp/stage2").filter(!$"contaminated")
        .select($"doc_id").as[Long].collect().toSet
      assert(s3.outDocs == (q73Keep & q51Clean).size.toLong,
        "stage 3 differs from q73 ∩ q51 on the staged corpus")
      assert(s3.outDocs < s2.outDocs,
        "fixture must drop bench docs + at least one quality reject")

      // Stage 4 == q79's selection on the stage-3 corpus.
      val q79 = SamplingQueries.queries("q79_budget_select")(
        spark, s"$tmp/stage3")
      assert(s4.outDocs == q79.count())

      // Stage 5 == q48 on the stage-4 corpus; token mass conserved:
      // packed tokens == the budget selection's token total.
      val q48 = SamplingQueries.queries("q48_pack_sequences")(
        spark, s"$tmp/stage4")
      assert(r.packedSeqs == q48.count())
      val selTokens = q79.agg(sum($"n_tokens")).first.getLong(0)
      assert(r.packedTokens == selTokens,
        "packing lost or invented tokens")
      assert(r.packedSeqs > 0)
    } finally Fixtures.deleteRecursively(tmp)
  }
}
