package graft.gsheets

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger

import graft.sources.gsheets.GSheetsBind
import graft.sources.gsheets.core.{MockHttp, TransportRegistry}

/** Streaming tail-read of a sheet: each poll re-fetches the grid and
  * emits only rows past the committed row offset; a checkpoint-sharing
  * second run picks up exactly the newly appended rows.
  */
class StreamReadSpec extends AnyFunSuite {

  import Fixtures._

  private def newCheckpoint(): String =
    Files.createTempDirectory("gsheets-stream-ckpt").toString

  private val baseRows = Seq(
    Seq("name", "age", "city"),
    Seq("Alice", "30", "Toronto"),
    Seq("Bob", "25", "New York"))

  private val appendedRows = baseRows ++ Seq(
    Seq("Charlie", "45", "Chicago"),
    Seq("Dina", "33", "Berlin"))

  // Parquet sink: the memory sink can't recover from a checkpoint, and
  // checkpoint recovery (run 2 resuming run 1's row offset) is exactly
  // what these tests exercise.
  private def runOnce(transport: String, outDir: String,
      checkpoint: String): Unit = {
    GSheetsBind.clearCache()
    val stream = spark.readStream.format("gsheets")
      .option("transport", transport)
      .option("token", "test-token")
      .option("cachebust", transport)
      .load(s"https://docs.google.com/spreadsheets/d/$SpreadsheetId/edit#gid=0")
    val q = stream.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
  }

  private def sinkRows(outDir: String): Seq[(String, Double)] =
    spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(_._1)

  test("AvailableNow run emits all current rows; restart emits only appended rows") {
    val ckpt = newCheckpoint()
    val out = Files.createTempDirectory("gsheets-stream-out").toString

    // Run 1: sheet has 2 data rows.
    val mock1 = new MockHttp
    mock1.addJson(metadataJson)                                 // schema bind: metadata
    mock1.addJson(valueRangeJson("Sheet1!A1:Z1000", baseRows))  // schema bind: values
    mock1.addJson(metadataJson)                                 // poll: metadata
    mock1.addJson(valueRangeJson("Sheet1!A1:Z1000", baseRows))  // poll: values
    TransportRegistry.register("mock-stream-1", mock1)
    runOnce("mock-stream-1", out, ckpt)

    assert(sinkRows(out) == Seq(("Alice", 30.0), ("Bob", 25.0)))

    // Run 2, same checkpoint: sheet grew by 2 rows → only those arrive
    // (no duplicate Alice/Bob in the cumulative sink).
    val mock2 = new MockHttp
    mock2.addJson(metadataJson)                                      // schema bind
    mock2.addJson(valueRangeJson("Sheet1!A1:Z1000", appendedRows))
    mock2.addJson(metadataJson)                                      // poll
    mock2.addJson(valueRangeJson("Sheet1!A1:Z1000", appendedRows))
    TransportRegistry.register("mock-stream-1", mock2)
    runOnce("mock-stream-1", out, ckpt)

    assert(sinkRows(out) == Seq(
      ("Alice", 30.0), ("Bob", 25.0), ("Charlie", 45.0), ("Dina", 33.0)))
  }

  test("AvailableNow with max_rows_per_trigger drains in multiple committed batches") {
    val ckpt = newCheckpoint()
    val out = Files.createTempDirectory("gsheets-stream-out").toString

    // 4 data rows, 2-row batches → the AvailableNow run must commit two
    // micro-batches (the SupportsTriggerAvailableNow path; the plain
    // fallback would collapse to one unbounded batch).
    val mock1 = new MockHttp
    mock1.addJson(metadataJson)                                      // schema bind
    mock1.addJson(valueRangeJson("Sheet1!A1:Z1000", appendedRows))
    mock1.addJson(metadataJson)                                      // prepare pin
    mock1.addJson(valueRangeJson("Sheet1!A1:Z1000", appendedRows))
    TransportRegistry.register("mock-stream-3", mock1)

    GSheetsBind.clearCache()
    val stream = spark.readStream.format("gsheets")
      .option("transport", "mock-stream-3")
      .option("token", "test-token")
      .option("cachebust", "mock-stream-3")
      .option("max_rows_per_trigger", "2")
      .load(s"https://docs.google.com/spreadsheets/d/$SpreadsheetId/edit#gid=0")
    val q = stream.writeStream
      .format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    assert(sinkRows(out) == Seq(
      ("Alice", 30.0), ("Bob", 25.0), ("Charlie", 45.0), ("Dina", 33.0)))
    // Two committed batches (0 and 1), each bounded at 2 rows — the
    // checkpoint commit log is the witness that the run was multi-batch.
    val commits = new java.io.File(s"$ckpt/commits")
      .listFiles().map(_.getName).filter(_.forall(_.isDigit)).sorted.toSeq
    assert(commits == Seq("0", "1"))

    // Restart against a grown sheet: offsets resume past the 4 emitted
    // rows; only the newly appended row arrives (again under the pinned
    // prepare snapshot).
    val grownRows = appendedRows :+ Seq("Edith", "52", "Oslo")
    val mock2 = new MockHttp
    mock2.addJson(metadataJson)
    mock2.addJson(valueRangeJson("Sheet1!A1:Z1000", grownRows))
    mock2.addJson(metadataJson)
    mock2.addJson(valueRangeJson("Sheet1!A1:Z1000", grownRows))
    TransportRegistry.register("mock-stream-3", mock2)
    GSheetsBind.clearCache()
    val stream2 = spark.readStream.format("gsheets")
      .option("transport", "mock-stream-3")
      .option("token", "test-token")
      .option("cachebust", "mock-stream-3")
      .option("max_rows_per_trigger", "2")
      .load(s"https://docs.google.com/spreadsheets/d/$SpreadsheetId/edit#gid=0")
    val q2 = stream2.writeStream
      .format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    assert(sinkRows(out) == Seq(
      ("Alice", 30.0), ("Bob", 25.0), ("Charlie", 45.0),
      ("Dina", 33.0), ("Edith", 52.0)))
  }

  test("unchanged sheet on restart emits an empty batch") {
    val ckpt = newCheckpoint()
    val out = Files.createTempDirectory("gsheets-stream-out").toString

    val mock1 = new MockHttp
    (1 to 2).foreach { _ =>
      mock1.addJson(metadataJson)
      mock1.addJson(valueRangeJson("Sheet1!A1:Z1000", baseRows))
    }
    TransportRegistry.register("mock-stream-2", mock1)
    runOnce("mock-stream-2", out, ckpt)
    assert(sinkRows(out).size == 2)

    val mock2 = new MockHttp
    (1 to 2).foreach { _ =>
      mock2.addJson(metadataJson)
      mock2.addJson(valueRangeJson("Sheet1!A1:Z1000", baseRows))
    }
    TransportRegistry.register("mock-stream-2", mock2)
    runOnce("mock-stream-2", out, ckpt)
    assert(sinkRows(out).size == 2)
  }
}
