package graft.gsheets

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.sources.gsheets.core.{MockHttp, TransportRegistry}

/** Streaming gsheets sink: per-epoch appends in append mode, per-epoch
  * clear-and-rewrite in complete mode.
  */
class StreamWriteSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import Fixtures.SpreadsheetId
  import spark.implicits._

  private def appendReply(range: String): String =
    s"""{"spreadsheetId":"$SpreadsheetId","updates":{"updatedRange":"$range"}}"""

  test("append mode: one values:append per epoch, sheet grows monotonically") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val mock = new MockHttp
    mock.addJson(appendReply("write_fixture!A1:B2")) // epoch 0
    mock.addJson(appendReply("write_fixture!A3:B3")) // epoch 1
    TransportRegistry.register("mock-swrite-1", mock)

    val q = input.toDS().toDF("name", "score").writeStream
      .format("gsheets")
      .outputMode(OutputMode.Append())
      .option("transport", "mock-swrite-1")
      .option("token", "test-token")
      .option("sheet", "write_fixture")
      .option("checkpointLocation",
        Files.createTempDirectory("gsheets-swrite-ckpt").toString)
      .option("path", SpreadsheetId)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      input.addData(("c", 3.0))
      q.processAllAvailable()
    } finally q.stop()

    val appends = mock.recordedRequests.filter(_.url.contains(":append"))
    assert(appends.size == 2)
    assert(appends(0).body.contains("""["a","1.0"]""") &&
      appends(0).body.contains("""["b","2.0"]"""))
    assert(appends(1).body.contains("""["c","3.0"]"""))
    // append mode, no header requested → no clears, no header row
    assert(!mock.recordedRequests.exists(_.url.contains(":clear")))
    assert(!appends.exists(_.body.contains("\"name\"")))
  }

  test("complete mode: each epoch clears, rewrites header, then appends state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val mock = new MockHttp
    (1 to 2).foreach { _ =>
      mock.addJson("{}")                                // clear
      mock.addJson(appendReply("write_fixture!A1:B1"))  // header
      mock.addJson(appendReply("write_fixture!A2:B3"))  // rows
    }
    TransportRegistry.register("mock-swrite-2", mock)

    val agg = input.toDS().toDF("name", "score")
      .groupBy($"name").agg(sum($"score").as("total"))

    val q = agg.writeStream
      .format("gsheets")
      .outputMode(OutputMode.Complete())
      .option("transport", "mock-swrite-2")
      .option("token", "test-token")
      .option("sheet", "write_fixture")
      .option("checkpointLocation",
        Files.createTempDirectory("gsheets-swrite-ckpt").toString)
      .option("path", SpreadsheetId)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData(("a", 1.0), ("a", 2.0))
      q.processAllAvailable()
      input.addData(("a", 4.0))
      q.processAllAvailable()
    } finally q.stop()

    val urls = mock.recordedRequests.map(r =>
      if (r.url.contains(":clear")) "clear" else if (r.url.contains(":append")) "append" else "other")
    assert(urls == Vector("clear", "append", "append", "clear", "append", "append"))
    // header rewritten per epoch; final epoch shows the updated total
    val appends = mock.recordedRequests.filter(_.url.contains(":append"))
    assert(appends(0).body.contains("""["name","total"]"""))
    assert(appends(1).body.contains("""["a","3.0"]"""))
    assert(appends(3).body.contains("""["a","7.0"]"""))
  }

  test("complete mode: createWriter has no sheet side effects (retry-safe)") {
    // A task RETRY or speculative attempt re-invokes createWriter after a
    // prior attempt ran — if the clear lived there, one epoch could
    // interleave clear/header/data. The sheet mutation must belong to the
    // driver-side per-epoch commit alone.
    import org.apache.spark.sql.types._
    val mock = new MockHttp
    TransportRegistry.register("mock-swrite-3", mock)
    val schema = StructType(Seq(StructField("name", StringType)))
    val factory = new graft.sources.gsheets.GSheetsStreamingWriterFactory(
      Map("transport" -> "mock-swrite-3", "token" -> "test-token",
        "path" -> SpreadsheetId),
      SpreadsheetId, "write_fixture", "write_fixture", schema,
      truncateMode = true)
    // Two attempts of the same (partition, epoch) — e.g. a retry.
    val w1 = factory.createWriter(0, taskId = 1L, epochId = 0L)
    val w2 = factory.createWriter(0, taskId = 2L, epochId = 0L)
    assert(mock.recordedRequests.isEmpty,
      s"createWriter touched the sheet: ${mock.recordedRequests.map(_.url)}")
    // The abandoned attempt's buffered rows die with its message; only
    // what reaches commit() is applied.
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("x"))
    w1.write(row); w2.write(row)
    w1.abort()
    assert(mock.recordedRequests.isEmpty)
  }
}
