package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** q44 has no DuckDB oracle (HLL sketches are engine-specific); this
  * spec is its correctness gate: the sketch estimate must sit within
  * HLL's expected relative-error envelope of the exact count.
  */
class ApproxDistinctSpec extends AnyFunSuite {

  private lazy val spark = graft.gsheets.Fixtures.spark

  private def assertWithinThreeRsd(sfDir: String): Unit = {
    val df = RelationalQueries.queries("q44_approx_distinct")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      // q44 uses rsd = 0.02; allow 3 standard deviations.
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx_count_distinct lands within 3 rsd of exact on sf0.001") {
    assertWithinThreeRsd("/root/testdata/sf0.001")
  }

  test("approx_count_distinct lands within 3 rsd of exact on sf0.1 (driver scale)") {
    assertWithinThreeRsd("/root/testdata/sf0.1")
  }
}
