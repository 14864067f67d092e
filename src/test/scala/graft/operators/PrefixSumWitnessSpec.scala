package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures

/** Witness that q79's documented scale form — per-band partial sums +
  * broadcast offsets (the distributed prefix-sum) — produces exactly
  * the window formulation's rows, for several band counts including
  * degenerate ones (1 band = the window form itself; more bands than
  * distinct token counts). Integer sums are exact in any grouping, so
  * equality is literal, not approximate.
  */
class PrefixSumWitnessSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark

  private val dir = "/root/testdata/sf0.001"

  test("distributed prefix-sum equals the window form row for row") {
    val expected = PipelineQueries.queries("q79_budget_select")(spark, dir)
      .collect().toSeq
    for (b <- Seq(1, 3, 8, 64)) {
      val got = PipelineQueries.budgetSelectPrefixSum(spark, dir, b)
        .collect().toSeq
      assert(got == expected, s"prefix-sum variant diverges at nBuckets=$b")
    }
  }

  test("the variant's running sums are intra-band, not per-source") {
    // The scale property: no window partition spans a whole source —
    // the widest window partition is a single (source, bucket) band.
    // With 8 bands over sf0.001's token range every source splits into
    // >1 non-empty band, so the plan's window partitioning must list
    // BOTH source and bucket.
    val p = PipelineQueries.budgetSelectPrefixSum(spark, dir, 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(source"), s"no window in:\n$p")
    assert("windowspecdefinition\\(source#\\d+, bucket".r.findFirstIn(p).isDefined,
      s"intra-band window lost its bucket key:\n$p")
  }
}
