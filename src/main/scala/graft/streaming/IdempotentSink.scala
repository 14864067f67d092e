package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once file sink for `foreachBatch` pipelines.
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once: a
  * failure after the sink write but before the checkpoint commit
  * replays the SAME micro-batch (same `batchId`, same rows — the
  * offset range is pinned in the WAL) on restart. Exactly-once
  * therefore reduces to idempotence in the writer, and the standard
  * shape is batchId-keyed overwrite: every batch owns the directory
  * `path/batch_id=<id>`, and a replay overwrites it with identical
  * content instead of appending a duplicate. Readers see the whole
  * sink as one partitioned dataset (`batch_id` becomes a discovered
  * partition column, prunable like any other).
  *
  * The gsheets streaming sink (per-epoch `values.append`) is the
  * at-least-once counterpart — a sheet has no atomic
  * replace-by-predicate, which is exactly why a file sink is the
  * durable landing zone at scale and the sheet is the serving surface.
  */
object IdempotentSink {

  /** A `foreachBatch` function writing each micro-batch to its own
    * batchId-keyed partition directory, idempotently under replay.
    */
  def parquetWriter(path: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      df.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
}
