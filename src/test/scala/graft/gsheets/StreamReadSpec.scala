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
