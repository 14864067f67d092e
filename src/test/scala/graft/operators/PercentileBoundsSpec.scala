package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** q17b has no DuckDB oracle (percentile sketches are engine-specific);
  * this spec is its quantitative gate: each approximate percentile must
  * land inside the exact-value envelope implied by approx_percentile's
  * documented accuracy. With accuracy = 10000 the rank error is
  * 1/accuracy = 1e-4 of the group size; we allow 10x that slack
  * (quantile ±1e-3) and compare against EXACT percentiles at the
  * shifted quantiles, at the driver's sf0.1 scale.
  */
class PercentileBoundsSpec extends AnyFunSuite {

  private lazy val spark = graft.gsheets.Fixtures.spark

  test("q17b approx percentiles sit inside the exact ±1e-3 quantile envelope at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val approx = RelationalQueries.queries("q17b_percentiles_approx")(spark, dir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

    import org.apache.spark.sql.functions._
    val slack = 0.001 // 10x the documented 1/accuracy rank error
    val ps = Seq(0.5, 0.9, 0.99)
    val loHi = ps.flatMap { p =>
      Seq(expr(s"percentile(o_totalprice, ${math.max(0.0, p - slack)})")
            .as(f"lo_$p%.2f"),
          expr(s"percentile(o_totalprice, ${math.min(1.0, p + slack)})")
            .as(f"hi_$p%.2f"))
    }
    val exact = Tables(spark, dir).orders
      .groupBy(col("o_orderstatus")).agg(loHi.head, loHi.tail: _*)
      .collect().map(r => r.getString(0) ->
        (1 until 7).map(r.getDouble).toSeq).toMap

    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((status, app) <- approx; i <- 0 until 3) {
      val lo = exact(status)(2 * i)
      val hi = exact(status)(2 * i + 1)
      // 0.01 covers the round(_, 2) in q17b's output.
      assert(app(i) >= lo - 0.01 && app(i) <= hi + 0.01,
        s"$status p=${ps(i)}: approx ${app(i)} outside [$lo, $hi]")
    }
  }
}
