package graft.gsheets

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.In

import graft.sources.gsheets.core.{MockHttp, TransportRegistry}
import graft.sources.gsheets.{GSheetsBind, GSheetsInputPartition}

/** Runtime (dynamic-pruning) filtering on the sheet scan: when the
  * sheet probes a broadcast join, the build side's keys arrive at
  * execution time as an `In` filter and prune snapshot rows before
  * they ship. Covers the direct Scan contract and the end-to-end
  * planner path.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  import Fixtures._

  private def sheetDf(tag: String) = {
    val mock = new MockHttp
    mock.addJson(metadataJson)
    mock.addJson(sheet1Json())
    TransportRegistry.register(tag, mock)
    GSheetsBind.clearCache()
    spark.read.format("gsheets")
      .option("token", "test-token").option("transport", tag)
      .option("cachebust", tag)
      .load(s"https://docs.google.com/spreadsheets/d/$SpreadsheetId/edit#gid=0")
  }

  test("Scan contract: filterAttributes advertises sheet columns; In prunes") {
    val df = sheetDf("mock-rtf-1")
    val scanExec = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    val scan = scanExec.scan.asInstanceOf[SupportsRuntimeFiltering]
    assert(scan.filterAttributes().map(_.describe()).toSet ==
      Set("name", "age", "city"))

    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("name", Array("Alice", "Bob"))))
    val shipped = scan.toBatch.planInputPartitions().collect {
      case p: GSheetsInputPartition => p.rows.length
    }.sum
    assert(shipped == 2)
  }

  test("unsupported runtime filters are ignored, not fatal") {
    val df = sheetDf("mock-rtf-2")
    val scanExec = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    val scan = scanExec.scan.asInstanceOf[SupportsRuntimeFiltering]
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("no_such_column", Array("x"))))
    val shipped = scan.toBatch.planInputPartitions().collect {
      case p: GSheetsInputPartition => p.rows.length
    }.sum
    assert(shipped == 6)
  }

  test("dotted sheet headers advertise single-part references") {
    val mock = new MockHttp
    mock.addJson(metadataJson)
    mock.addJson(valueRangeJson("Sheet1!A1:Z1000", Seq(
      Seq("rev.q1", "rev.q2"), Seq("10", "20"), Seq("30", "40"))))
    TransportRegistry.register("mock-rtf-dots", mock)
    GSheetsBind.clearCache()
    val df = spark.read.format("gsheets")
      .option("token", "test-token").option("transport", "mock-rtf-dots")
      .option("cachebust", "mock-rtf-dots")
      .load(s"https://docs.google.com/spreadsheets/d/$SpreadsheetId/edit#gid=0")

    val scanExec = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    val scan = scanExec.scan.asInstanceOf[SupportsRuntimeFiltering]
    // Expressions.column would PARSE "rev.q1" into a 2-part nested
    // reference that can never resolve against the scan output —
    // failing analysis for every join on this sheet. Each attribute
    // must stay one part.
    val attrs = scan.filterAttributes()
    assert(attrs.nonEmpty)
    assert(attrs.forall(_.fieldNames().length == 1),
      attrs.map(_.describe()).mkString(", "))
    // And the sheet still joins fine.
    import spark.implicits._
    val dim = Seq(10.0).toDF("rev.q1")
    assert(df.join(dim, Seq("rev.q1")).count() == 1)
  }

  test("end-to-end: broadcast join keys prune the sheet at execution") {
    import spark.implicits._
    val df = sheetDf("mock-rtf-3")
    // Static (non-AQE) plan so the BatchScanExec and its runtime
    // filters are directly observable; AQE composes with DPP through
    // PlanAdaptiveDynamicPruningFilters and is covered by Spark itself.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // Tiny filtered dimension broadcasts; the sheet is the probe
      // side. Dynamic pruning should hand the dim's surviving names to
      // the sheet scan as a runtime In filter. The dim is Range-backed
      // (NOT a local Seq: ConvertToLocalRelation would fold the filter
      // away and PartitionPruning requires a live selective Filter on
      // the build side).
      import org.apache.spark.sql.functions.{concat, lit, when}
      val dim = spark.range(6).select(
          when($"id" === 0, "Alice").when($"id" === 1, "Bob")
            .when($"id" === 2, "Charlie")
            .otherwise(concat(lit("zz"), $"id".cast("string"))).as("name"),
          $"id".as("flag"))
        .filter($"flag" < 2)
      // Inspect the EXECUTED dataset's plan — a further .select would
      // build a fresh queryExecution with a fresh (unfiltered) scan.
      val joined = df.join(
        org.apache.spark.sql.functions.broadcast(dim), "name")
        .select("name", "age")

      val got = joined.collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(got == Set(("Alice", 30.0), ("Bob", 25.0)))

      val scanExec = joined.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b
      }.get
      if (scanExec.runtimeFilters.nonEmpty) {
        // Execution called scan.filter() with the dim's keys: the live
        // scan now plans only the 2 joinable rows, not the sheet's 6.
        val shipped = scanExec.scan.toBatch.planInputPartitions().collect {
          case p: GSheetsInputPartition => p.rows.length
        }.sum
        assert(shipped == 2)
      } else {
        // Planner chose not to insert a runtime filter (heuristics are
        // version-dependent); the contract path is covered above.
        info("no runtime filter inserted by the planner in this plan")
      }
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
