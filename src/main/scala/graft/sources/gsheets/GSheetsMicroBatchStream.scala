package graft.sources.gsheets

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Streaming read of a sheet as an append-only tail
  * (`spark.readStream.format("gsheets").load(url)`).
  *
  * The reference is batch-only (`src/include/gsheets_read.hpp:14`,
  * SURVEY §2.2 "Streaming"); this is the Spark-native extension SURVEY
  * §3.2/§4.3 sketches: each micro-batch re-polls the sheet
  * (`values.get`, same REST call as the batch bind) and emits only the
  * data rows past the last committed row offset. Offsets are plain row
  * counts, so checkpoint/restart resumes where the last run stopped and
  * a `Trigger.AvailableNow` run over an unchanged sheet emits nothing.
  *
  * Admission control ([[SupportsTriggerAvailableNow]]):
  *   - `Trigger.AvailableNow` pins the target offset at
  *     [[prepareForTriggerAvailableNow]] — ONE fetch bounds the whole
  *     run (no per-batch re-poll, no mid-run sheet growth bleed-in),
  *     and the run is genuine multi-batch rather than the
  *     single-batch-fallback WARN path Spark uses for plain sources;
  *   - `max_rows_per_trigger` caps each micro-batch's row count (a
  *     [[ReadLimit.maxRows]] default limit), so a large backlog drains
  *     in bounded, checkpointed steps in both AvailableNow and
  *     continuous-trigger modes.
  *
  * Rows already emitted are assumed immutable (append-only sheet) — the
  * same contract as a file tail; in-place edits of old rows are not
  * re-emitted. A shrunken sheet yields an empty batch, never an error.
  */
final class GSheetsMicroBatchStream(
    initial: BoundSheet,
    options: GSheetsOptions,
    required: StructType) extends MicroBatchStream with SupportsTriggerAvailableNow {

  import GSheetsMicroBatchStream.RowOffset

  // Latest polled grid; planInputPartitions slices it by row offset.
  @volatile private var latest: BoundSheet = initial

  // Row count pinned by prepareForTriggerAvailableNow; -1 = unbounded
  // (continuous triggers re-poll on every latestOffset call).
  @volatile private var availableNowCap: Long = -1L

  private def refresh(): Unit = {
    latest = GSheetsBind.bindFresh(options)
    latest.error.foreach(msg => throw new IllegalStateException(msg))
  }

  override def prepareForTriggerAvailableNow(): Unit = {
    refresh()
    availableNowCap = latest.dataRows.size.toLong
  }

  override def getDefaultReadLimit: ReadLimit =
    options.maxRowsPerTrigger
      .map(n => ReadLimit.maxRows(n))
      .getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = RowOffset(0L)

  // Admission-control sources are driven through latestOffset(start,
  // limit); Spark never calls the no-arg form (same contract as the
  // built-in Kafka source).
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[RowOffset].rows
    val target =
      if (availableNowCap >= 0L) availableNowCap // pinned; no re-poll mid-run
      else { refresh(); latest.dataRows.size.toLong }
    val end = limit match {
      case r: ReadMaxRows => math.min(target, from + r.maxRows())
      case _              => target
    }
    RowOffset(end)
  }

  override def reportLatestOffset(): Offset =
    RowOffset(latest.dataRows.size.toLong)

  override def deserializeOffset(json: String): Offset = RowOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[RowOffset].rows.toInt
    val until = end.asInstanceOf[RowOffset].rows.toInt
    val rows = latest.dataRows
    if (until <= from || from >= rows.size) return Array.empty
    // Project to the pruned columns using the *streaming* schema (fixed
    // at stream start); later-added columns are ignored, ragged rows pad
    // with NULL — same conversion semantics as the batch reader.
    // Case-insensitive, like the batch path (Spark's default resolution).
    val nameToIdx = latest.schema.fieldNames.map(_.toLowerCase).zipWithIndex.toMap
    val colIdx = required.fieldNames.map { n =>
      nameToIdx.getOrElse(n.toLowerCase,
        if (n.equalsIgnoreCase(GSheetsScan.SheetRowCol)) -2 else -1)
    }
    // `_sheet_row` provenance works on the stream too: the source's row
    // offsets ARE grid positions, so batch row i carries the absolute
    // sheet row it was tailed from.
    val baseRow = GSheetsScan.firstDataRow(latest)
    val slice = rows.slice(from, math.min(until, rows.size)).zipWithIndex
      .map { case (row, ri) =>
        colIdx.map { i =>
          if (i == -2) (baseRow + from + ri).toString
          else if (i >= 0 && i < row.size) row(i)
          else null
        }
      }.toArray
    Array(GSheetsInputPartition(slice, required.fields.map(_.dataType)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GSheetsReaderFactory

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GSheetsMicroBatchStream(${initial.spreadsheetId} ${initial.apiRange})"
}

object GSheetsMicroBatchStream {
  /** Row-count offset: `json` is the count itself. */
  final case class RowOffset(rows: Long) extends Offset {
    override def json(): String = rows.toString
  }
}
