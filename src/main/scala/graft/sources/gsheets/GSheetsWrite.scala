package graft.sources.gsheets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.SortOrder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._

import graft.sources.gsheets.core._

/** Write path, port of the reference COPY sink (`src/gsheets_copy.cpp`).
  *
  * Option semantics (reference `:30-52`):
  *   - `overwrite_range` (default false) takes precedence over
  *     `overwrite_sheet` at clear time (`:98-104`);
  *   - `header` defaults to the overwrite mode — append ⇒ no header
  *     (`:43-44`);
  *   - `create_if_not_exists` requires `sheet` (`:46-48`).
  *
  * SaveMode mapping: `.mode("overwrite")` (DSV2 truncate) defaults
  * `overwrite_sheet=true` — the reference COPY default; `.mode("append")`
  * defaults both overwrite flags false — the reference's append
  * configuration. Explicit options always win.
  *
  * Execution: a single ordered writer task
  * ([[RequiresDistributionAndOrdering]] `requiredNumPartitions=1`,
  * matching the reference's single-threaded sink) appending in
  * 2048-row batches (`:129-181`). Sheets appends are not transactional;
  * like the reference, a failed write may leave partial data (abort is
  * best-effort, SURVEY §7.3).
  */
final class GSheetsWriteBuilder(info: LogicalWriteInfo, options: GSheetsOptions)
  extends WriteBuilder with SupportsTruncate {

  private var truncateMode = false

  override def truncate(): WriteBuilder = { truncateMode = true; this }

  override def build(): Write =
    new GSheetsWrite(info.schema(), options, truncateMode)
}

final class GSheetsWrite(schema: StructType, options: GSheetsOptions,
    truncateMode: Boolean) extends Write with RequiresDistributionAndOrdering {

  // Spark rejects numPartitions with an unspecified distribution, so
  // cluster on the first column — with requiredNumPartitions=1 every row
  // reaches the single writer no matter the clustering key. Callers who
  // need exact row order should coalesce(1)/sort upstream (the Sheets
  // append API offers no ordering guarantee across requests anyway).
  override def requiredDistribution(): Distribution =
    if (schema.isEmpty) Distributions.unspecified()
    else Distributions.clustered(Array(
      org.apache.spark.sql.connector.expressions.Expressions.column(
        schema.fieldNames.head)))
  override def requiredOrdering(): Array[SortOrder] = Array.empty
  override def requiredNumPartitions(): Int = if (schema.isEmpty) 0 else 1

  override def toBatch: BatchWrite = new GSheetsBatchWrite(schema, options, truncateMode)

  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new GSheetsStreamingWrite(schema, options, truncateMode)

  override def description(): String = s"gsheets ${options.url}"
}

final case class GSheetsCommitMessage(rowsWritten: Long) extends WriterCommitMessage

/** Complete-mode streaming commit payload: the task's serialized rows,
  * carried to the driver so the sheet mutation happens exactly once per
  * epoch (see [[GSheetsStreamingWrite.commit]]).
  */
final case class GSheetsRowsMessage(rows: Vector[Vector[String]])
  extends WriterCommitMessage

final class GSheetsBatchWrite(schema: StructType, options: GSheetsOptions,
    truncateMode: Boolean) extends BatchWrite {

  /** Driver-side global init, port of `GSheetWriteInitializeGlobal`
    * (`src/gsheets_copy.cpp:54-122`): resolve sheet, optionally create
    * it, clear range-or-sheet, append the header row — all exactly once
    * before any task writes.
    */
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val overwriteSheet = options.overwriteSheet.getOrElse(truncateMode)
    val overwriteRange = options.overwriteRange.getOrElse(false)
    val header = options.headerOpt.getOrElse(overwriteRange || overwriteSheet)

    if (options.createIfNotExists && options.sheet.isEmpty)
      throw new IllegalArgumentException("Must provide sheet name")

    val url = options.url
    val spreadsheetId = Urls.extractSpreadsheetId(url)
    val client = options.newClient()

    // Param takes precedence over the URL query string (`:72-78`).
    val sheetName =
      if (options.sheet.nonEmpty) options.sheet
      else client.getSheetById(spreadsheetId, Urls.extractSheetId(url)).properties.title

    if (options.createIfNotExists) {
      try { client.getSheetByName(spreadsheetId, sheetName); () }
      catch {
        case _: SheetNotFoundException =>
          client.createSheet(spreadsheetId, sheetName)
      }
    }

    val sheetRange =
      if (options.range.nonEmpty) options.range
      else Urls.extractSheetRange(url)

    val encodedName = Urls.urlEncode(sheetName)

    // OVERWRITE_RANGE takes precedence: defaults false and is less
    // destructive (`:98-104`).
    if (overwriteRange)
      client.valuesClear(spreadsheetId, A1Range(s"$encodedName!$sheetRange"))
    else if (overwriteSheet)
      client.valuesClear(spreadsheetId, A1Range(encodedName))

    val apiRange =
      if (sheetRange.nonEmpty) s"$encodedName!$sheetRange" else encodedName
    val bodyRange =
      if (sheetRange.nonEmpty) s"$sheetName!$sheetRange" else sheetName

    if (header) {
      client.valuesAppend(spreadsheetId, A1Range(apiRange),
        ValueRange(bodyRange, "ROWS", Vector(schema.fieldNames.toVector)))
    }

    new GSheetsWriterFactory(options.raw, spreadsheetId, apiRange, bodyRange, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  override def useCommitCoordinator(): Boolean = false
}

/** Streaming sink (Spark-native extension; the reference COPY sink is
  * batch-only): each micro-batch epoch appends its rows. In append
  * output mode the sheet grows monotonically — the mirror image of the
  * tail-read source; in complete mode (`truncateMode`) each epoch
  * replaces the sheet with the latest aggregate state.
  *
  * Complete mode mutates the sheet ONLY in the driver-side
  * [[commit]] (tasks just serialize rows into their commit message):
  * `createWriter` runs per task ATTEMPT, so a retry or speculative
  * attempt clearing the sheet there could interleave clear/header/data
  * with a prior attempt's appends (ADVICE r2). Epoch commit remains
  * best-effort like the batch path — Sheets appends are not
  * transactional (SURVEY §7.3), so a driver crash mid-commit may leave
  * partial rows; exactly-once would need an idempotent key column,
  * which the reference offers no analog for.
  */
final class GSheetsStreamingWrite(schema: StructType, options: GSheetsOptions,
    truncateMode: Boolean)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private lazy val spreadsheetId = Urls.extractSpreadsheetId(options.url)

  /** (apiRange, bodyRange): sheet resolution + create_if_not_exists,
    * once per query (lazy — both the factory and per-epoch commits need
    * it, whichever runs first).
    */
  private lazy val ranges: (String, String) = {
    if (options.createIfNotExists && options.sheet.isEmpty)
      throw new IllegalArgumentException("Must provide sheet name")
    val client = options.newClient()
    val sheetName =
      if (options.sheet.nonEmpty) options.sheet
      else client.getSheetById(spreadsheetId,
        Urls.extractSheetId(options.url)).properties.title
    if (options.createIfNotExists) {
      try { client.getSheetByName(spreadsheetId, sheetName); () }
      catch {
        case _: SheetNotFoundException =>
          client.createSheet(spreadsheetId, sheetName)
      }
    }
    val encodedName = Urls.urlEncode(sheetName)
    val sheetRange =
      if (options.range.nonEmpty) options.range
      else Urls.extractSheetRange(options.url)
    (if (sheetRange.nonEmpty) s"$encodedName!$sheetRange" else encodedName,
     if (sheetRange.nonEmpty) s"$sheetName!$sheetRange" else sheetName)
  }

  // Append-mode header (explicit opt-in only, like the reference's
  // append COPY) is written once at stream start, guarded in case the
  // engine re-creates the factory per epoch.
  @volatile private var headerWritten = false

  // One driver-side client for the stream's lifetime: constructing per
  // epoch would pay a service-account JWT round-trip on every commit
  // (Auth already refreshes tokens 60 s early, so reuse is safe).
  private lazy val driverClient = options.newClient()

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val (apiRange, bodyRange) = ranges
    if (!truncateMode && options.headerOpt.getOrElse(false) && !headerWritten) {
      driverClient.valuesAppend(spreadsheetId, A1Range(apiRange),
        ValueRange(bodyRange, "ROWS", Vector(schema.fieldNames.toVector)))
      headerWritten = true
    }
    new GSheetsStreamingWriterFactory(options.raw, spreadsheetId, apiRange,
      bodyRange, schema, truncateMode)
  }

  /** Complete mode: replace the sheet exactly once per epoch — clear,
    * header (on by default, as in the batch overwrite path), then the
    * epoch's rows in 2048-row batches. Runs on the driver after every
    * task attempt has finished, so no attempt can race the clear.
    */
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = if (truncateMode) {
    val (apiRange, bodyRange) = ranges
    val client = driverClient
    client.valuesClear(spreadsheetId, A1Range(apiRange.takeWhile(_ != '!')))
    if (options.headerOpt.getOrElse(true)) {
      client.valuesAppend(spreadsheetId, A1Range(apiRange),
        ValueRange(bodyRange, "ROWS", Vector(schema.fieldNames.toVector)))
    }
    val rows = messages.iterator.collect {
      case GSheetsRowsMessage(r) => r
    }.flatten.toVector
    rows.grouped(GSheetsDataWriter.BatchRows).foreach { chunk =>
      client.valuesAppend(spreadsheetId, A1Range(apiRange),
        ValueRange(bodyRange, "ROWS", chunk))
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = ()
}

final class GSheetsStreamingWriterFactory(rawOptions: Map[String, String],
    spreadsheetId: String, apiRange: String, bodyRange: String,
    schema: StructType, truncateMode: Boolean)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    if (truncateMode) new GSheetsBufferingWriter(schema)
    else new GSheetsDataWriter(GSheetsOptions(rawOptions), spreadsheetId,
      apiRange, bodyRange, schema)
}

/** Complete-mode streaming writer: serializes rows but never touches
  * the sheet — the driver's per-epoch commit does (retry-safe).
  */
final class GSheetsBufferingWriter(schema: StructType)
  extends DataWriter[InternalRow] {

  private val serializers: Array[(InternalRow, Int) => String] =
    schema.fields.map(f => GSheetsDataWriter.cellSerializer(f.dataType))
  private val buffer = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]

  override def write(row: InternalRow): Unit =
    buffer += Vector.tabulate(serializers.length) { i =>
      if (row.isNullAt(i)) "" else serializers(i)(row, i)
    }

  override def commit(): WriterCommitMessage = GSheetsRowsMessage(buffer.toVector)
  override def abort(): Unit = buffer.clear()
  override def close(): Unit = ()
}

final class GSheetsWriterFactory(rawOptions: Map[String, String],
    spreadsheetId: String, apiRange: String, bodyRange: String,
    schema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GSheetsDataWriter(GSheetsOptions(rawOptions), spreadsheetId,
      apiRange, bodyRange, schema)
}

/** Buffers rows and POSTs one `values:append` per 2048-row batch, the
  * reference's chunk shape (`src/gsheets_copy.cpp:129-181`).
  */
final class GSheetsDataWriter(options: GSheetsOptions, spreadsheetId: String,
    apiRange: String, bodyRange: String, schema: StructType)
  extends DataWriter[InternalRow] {

  import GSheetsDataWriter.BatchRows

  private lazy val client = options.newClient()
  private val buffer = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
  private var written = 0L

  private val serializers: Array[(InternalRow, Int) => String] =
    schema.fields.map(f => GSheetsDataWriter.cellSerializer(f.dataType))

  override def write(row: InternalRow): Unit = {
    val cells = Vector.tabulate(serializers.length) { i =>
      if (row.isNullAt(i)) "" else serializers(i)(row, i)
    }
    buffer += cells
    if (buffer.size >= BatchRows) flush()
  }

  private def flush(): Unit = {
    if (buffer.nonEmpty) {
      client.valuesAppend(spreadsheetId, A1Range(apiRange),
        ValueRange(bodyRange, "ROWS", buffer.toVector))
      written += buffer.size
      buffer.clear()
    }
  }

  override def commit(): WriterCommitMessage = {
    flush()
    GSheetsCommitMessage(written)
  }

  override def abort(): Unit = buffer.clear()
  override def close(): Unit = ()
}

object GSheetsDataWriter {

  /** Reference chunk size = DuckDB STANDARD_VECTOR_SIZE. */
  val BatchRows = 2048

  /** Value → cell text, the analog of DuckDB `Value::ToString()` with
    * NULL→"" (`src/gsheets_copy.cpp:163-175`). Sent with
    * `valueInputOption=USER_ENTERED` so Google re-parses into native cell
    * types. Renderings follow JVM conventions where DuckDB's differ
    * (documented divergence, SURVEY §7.3: e.g. large doubles print
    * `1.0E20` here vs DuckDB `1e+20`).
    */
  def cellSerializer(dt: DataType): (InternalRow, Int) => String = dt match {
    case StringType  => (r, i) => r.getUTF8String(i).toString
    case BooleanType => (r, i) => if (r.getBoolean(i)) "true" else "false"
    case ByteType    => (r, i) => r.getByte(i).toString
    case ShortType   => (r, i) => r.getShort(i).toString
    case IntegerType => (r, i) => r.getInt(i).toString
    case LongType    => (r, i) => r.getLong(i).toString
    case FloatType   => (r, i) => r.getFloat(i).toString
    case DoubleType  => (r, i) => r.getDouble(i).toString
    case d: DecimalType =>
      (r, i) => r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString
    case DateType =>
      (r, i) => java.time.LocalDate.ofEpochDay(r.getInt(i).toLong).toString
    case TimestampType | TimestampNTZType => (r, i) => {
      val micros = r.getLong(i)
      val secs = java.lang.Math.floorDiv(micros, 1000000L)
      val frac = java.lang.Math.floorMod(micros, 1000000L)
      val ldt = java.time.LocalDateTime.ofEpochSecond(secs, frac.toInt * 1000,
        java.time.ZoneOffset.UTC)
      val base = ldt.format(GSheetsDataWriter.TsFormat)
      if (frac == 0) base
      else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
    }
    case other => (r, i) => String.valueOf(r.get(i, other))
  }

  private val TsFormat =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
}
