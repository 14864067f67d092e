package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.gsheets.Fixtures

/** Exactly-once witness for the batchId-keyed foreachBatch sink:
  * multi-batch ingest lands every source row exactly once, and a
  * replayed micro-batch (foreachBatch's at-least-once failure mode)
  * overwrites its own partition instead of duplicating it.
  */
class IdempotentSinkSpec extends AnyFunSuite {

  private lazy val spark = Fixtures.spark
  import spark.implicits._

  test("multi-batch ingest lands exactly the source rows; replay is a no-op") {
    val srcDir = Files.createTempDirectory("graft_idem_src").toString
    val sinkDir = Files.createTempDirectory("graft_idem_sink").toString + "/out"
    val ckpt = Files.createTempDirectory("graft_idem_ckpt").toString

    // Three source files -> three micro-batches under maxFilesPerTrigger=1.
    (0 until 3).foreach { i =>
      Seq.tabulate(10)(j => (i * 10 + j).toLong).toDF("v")
        .coalesce(1).write.parquet(s"$srcDir/f$i")
    }

    val schema = StructType(Seq(StructField("v", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir + "/*")

    val writer = IdempotentSink.parquetWriter(sinkDir)
    val q = stream.writeStream
      .foreachBatch(writer)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val sunk = spark.read.parquet(sinkDir)
    assert(sunk.select("batch_id").distinct().count() == 3)
    assert(sunk.count() == 30)
    assert(sunk.agg(sum($"v")).head().getLong(0) == (0L until 30L).sum)

    // Replay batch 1 (what a post-write/pre-commit crash does on
    // restart): same batchId, same rows -> the partition is replaced,
    // not appended; the sink is unchanged. Rows are materialized first
    // — a real replay re-reads them from the SOURCE offsets, not from
    // the sink being overwritten.
    val replayValues = sunk.filter($"batch_id" === 1)
      .select("v").as[Long].collect().toSeq
    writer(replayValues.toDF("v"), 1L)
    val after = spark.read.parquet(sinkDir)
    assert(after.count() == 30)
    assert(after.agg(sum($"v")).head().getLong(0) == (0L until 30L).sum)
    assert(after.filter($"batch_id" === 1).count() == 10)
  }
}
