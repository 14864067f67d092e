package graft.sources.gsheets

import org.apache.spark.sql.types._

import graft.sources.gsheets.core._

/** Parsed DSV2 options (string map → typed), covering the reference's
  * `read_gsheet` named params (`src/gsheets_read.cpp:114-158`) and COPY
  * options (`src/gsheets_copy.cpp:37-48`) plus connector plumbing
  * (auth, transport, baseUrl, numPartitions).
  */
final case class GSheetsOptions(raw: Map[String, String]) {
  private val lower = raw.map { case (k, v) => k.toLowerCase -> v }
  private def get(keys: String*): Option[String] =
    keys.iterator.flatMap(k => lower.get(k)).nextOption()

  private def boolOpt(name: String, keys: String*): Option[Boolean] =
    get(keys: _*).map { v =>
      v.toLowerCase match {
        case "true"  => true
        case "false" => false
        case _ => throw new IllegalArgumentException(
          s"Invalid value for '$name' parameter. Expected a boolean value.")
      }
    }

  def url: String = get("path", "url").getOrElse(
    throw new IllegalArgumentException(
      "gsheets: missing path — spark.read.format(\"gsheets\").load(<url or id>)"))

  def header: Boolean = boolOpt("header", "header").getOrElse(true)
  def allVarchar: Boolean =
    boolOpt("all_varchar", "all_varchar", "allvarchar").getOrElse(false)
  def sheet: String = get("sheet").getOrElse("")
  def range: String = get("range").getOrElse("")
  def numPartitions: Int =
    get("numpartitions", "num_partitions").map(_.toInt).getOrElse(1).max(1)

  /** Streaming admission control: cap rows emitted per micro-batch
    * (`ReadLimit.maxRows`). Unset = drain all available each trigger.
    */
  def maxRowsPerTrigger: Option[Long] =
    get("maxrowspertrigger", "max_rows_per_trigger").map { v =>
      val n = v.toLong
      if (n <= 0) throw new IllegalArgumentException(
        s"gsheets: max_rows_per_trigger must be positive, got $n")
      n
    }

  /** `fetch_on_executor=true`: scan partitions carry only (id, range,
    * auth options) and the reader fetches cell values on the executor —
    * task binaries and driver memory no longer scale with sheet size.
    * Default false: rows ship inside the partition, preserving the
    * bind-time snapshot (same materialization point as the reference).
    */
  def fetchOnExecutor: Boolean = boolOpt("fetch_on_executor",
    "fetch_on_executor", "fetchonexecutor").getOrElse(false)

  // write-side (COPY) options; None = unset (defaults depend on SaveMode)
  def overwriteSheet: Option[Boolean] =
    boolOpt("overwrite_sheet", "overwrite_sheet", "overwritesheet")
  def overwriteRange: Option[Boolean] =
    boolOpt("overwrite_range", "overwrite_range", "overwriterange")
  def createIfNotExists: Boolean = boolOpt("create_if_not_exists",
    "create_if_not_exists", "createifnotexists").getOrElse(false)
  def headerOpt: Option[Boolean] = boolOpt("header", "header")

  def baseUrl: String =
    get("baseurl", "base_url").getOrElse(GoogleSheetsClient.DefaultBaseUrl)
  def transport: Option[String] = get("transport")

  def proxy: Option[ProxyConfig] = get("httpproxy", "http_proxy").map { h =>
    ProxyConfig.parse(h,
      get("httpproxyusername", "http_proxy_username").getOrElse(""),
      get("httpproxypassword", "http_proxy_password").getOrElse(""))
  }

  def newHttp(): SheetsHttp = TransportRegistry.resolve(transport, proxy)
  def newClient(): GoogleSheetsClient = {
    val http = newHttp()
    new GoogleSheetsClient(http, AuthFactory.fromOptions(raw, http), baseUrl)
  }

  /** Canonical cache key: sorted options. */
  def cacheKey: String =
    lower.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
}

/** Result of the bind step (the analog of the reference's
  * `ReadSheetBindData`, `src/include/gsheets_read.hpp:10-21`): resolved
  * identifiers, the eagerly fetched grid, and the inferred schema.
  *
  * `error` carries a deferred bind failure (empty range, sheet not
  * found) so explicit-schema reads and edge paths can still plan; reads
  * surface the error at scan build with the reference's exact message.
  * (Writes never bind: Spark's V2 write path passes the DataFrame schema
  * straight to `getTable` since `supportsExternalMetadata` is true.)
  */
final case class BoundSheet(
    spreadsheetId: String,
    sheetName: String,
    apiRange: String,
    header: Boolean,
    allVarchar: Boolean,
    schema: StructType,
    values: Vector[Vector[String]],
    error: Option[String]) {

  /** Data rows (header row skipped when `header=true`). */
  def dataRows: Vector[Vector[String]] = if (header) values.drop(1) else values
}

object GSheetsBind {

  /** Bound sheets are cached briefly ONLY to hand the `inferSchema`
    * fetch over to `getTable` (the two calls of one `load()` are
    * milliseconds apart; the reference holds the same data in its bind
    * object). [[GSheetsTable]] then [[take]]s the entry — removing it —
    * and owns the snapshot for its lifetime: every scan build of that
    * table (self-join/union branches, repeated actions on one
    * DataFrame) shares the snapshot, so one query never mixes two sheet
    * states, while a separate `load()` or SQL-table resolution creates
    * a new table and re-binds fresh instead of seeing a ≤60 s-old
    * snapshot (r2 ADVICE). The TTL bounds entries whose table never
    * materialized; [[sweep]] keeps the map from accumulating them.
    */
  private val CacheTtlMillis = 60000L
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, BoundSheet)]()

  def clearCache(): Unit = cache.clear()

  /** Remove expired entries (called on every bind; the map only ever
    * holds in-flight load() handoffs, so this is cheap).
    */
  private def sweep(now: Long): Unit =
    cache.forEach((k, v) =>
      if (now - v._1 >= CacheTtlMillis) cache.remove(k, v))

  /** Transfer ownership of the handoff entry to the caller (removing
    * it); binds fresh when absent or expired. See cache scaladoc.
    */
  def take(options: GSheetsOptions): BoundSheet = {
    val hit = cache.remove(options.cacheKey)
    if (hit != null && System.currentTimeMillis() - hit._1 < CacheTtlMillis) hit._2
    else doBind(options)
  }

  /** Uncached re-bind for the streaming source: every poll must observe
    * the sheet's current contents, not a ≤60 s-old snapshot.
    */
  def bindFresh(options: GSheetsOptions): BoundSheet = {
    val bound = doBind(options)
    cache.put(options.cacheKey, (System.currentTimeMillis(), bound))
    bound
  }

  def bind(options: GSheetsOptions): BoundSheet = {
    val key = options.cacheKey
    val now = System.currentTimeMillis()
    sweep(now)
    val hit = cache.get(key)
    if (hit != null && now - hit._1 < CacheTtlMillis) hit._2
    else {
      val bound = doBind(options)
      cache.put(key, (now, bound))
      bound
    }
  }

  /** Port of `ReadSheetBind` (`src/gsheets_read.cpp:86-241`). */
  private def doBind(options: GSheetsOptions): BoundSheet = {
    val url = options.url
    // Validate params before any network round-trip, like the reference's
    // named-parameter loop (`:114-158`) which throws on bad booleans.
    val header = options.header
    val allVarchar = options.allVarchar
    val spreadsheetId = Urls.extractSpreadsheetId(url)
    var sheetRange = Urls.extractSheetRange(url)
    var sheetName = ""
    var deferredError: Option[String] = None

    val client = options.newClient()

    if (options.sheet.nonEmpty) {
      // `sheet` may embed A1 notation after the (possibly quoted) name
      // (`src/gsheets_read.cpp:127-150`).
      val (name, embedded) = A1Range.splitSheetParam(options.sheet)
      sheetName = name
      if (embedded.nonEmpty) sheetRange = embedded
      // Validate for better error messaging, like the reference; missing
      // sheet is deferred (write path + create_if_not_exists needs it).
      try client.getSheetByName(spreadsheetId, sheetName)
      catch {
        case e: SheetNotFoundException => deferredError = Some(e.getMessage)
      }
    } else {
      val gid = Urls.extractSheetId(url)
      if (gid.isEmpty) {
        sheetName = client.getSheetByIndex(spreadsheetId, 0).properties.title
      } else {
        sheetName = client.getSheetById(spreadsheetId, gid).properties.title
      }
    }

    // Explicit `range` option wins over URL/sheet-embedded ranges.
    if (options.range.nonEmpty) sheetRange = options.range

    val apiRange = {
      val enc = Urls.urlEncode(sheetName)
      if (sheetRange.nonEmpty) s"$enc!$sheetRange" else enc
    }

    if (deferredError.isDefined) {
      return BoundSheet(spreadsheetId, sheetName, apiRange, header,
        allVarchar, StructType(Nil), Vector.empty, deferredError)
    }

    val valueRange = client.valuesGet(spreadsheetId, A1Range(apiRange))
    if (valueRange.values.isEmpty) {
      // Reference bind error (`src/gsheets_read.cpp:190-192`), deferred to
      // scan build so an overwrite of an empty sheet still plans.
      return BoundSheet(spreadsheetId, sheetName, apiRange, header,
        allVarchar, StructType(Nil), Vector.empty,
        Some(s"Range ${valueRange.range} is empty"))
    }

    val schema = inferSchema(valueRange.values, header, allVarchar)
    BoundSheet(spreadsheetId, sheetName, apiRange, header,
      allVarchar, schema, valueRange.values, None)
  }

  /** First-data-row type sniffing, port of
    * `src/gsheets_read.cpp:196-238`:
    *   - width = max(first-data-row, header row) when `header=true`;
    *   - names from header cells, `columnN` (1-based) fallback;
    *   - `TRUE`/`FALSE` (exact) → BOOLEAN; stod-parseable → DOUBLE;
    *     blank-in-first-row / `allVarchar` / anything else → VARCHAR.
    */
  def inferSchema(values: Vector[Vector[String]], header: Boolean,
      allVarchar: Boolean): StructType = {
    require(values.nonEmpty, "inferSchema requires at least one row")
    val startIndex = if (header) 1 else 0
    val firstDataRow =
      if (startIndex >= values.size) Vector.empty[String] else values(startIndex)
    val headerRow = if (header) values(0) else Vector.empty[String]
    val width = math.max(firstDataRow.size, headerRow.size)

    val fields = (0 until width).map { i =>
      val name =
        if (header && i < headerRow.size) headerRow(i) else s"column${i + 1}"
      val tpe: DataType =
        if (i >= firstDataRow.size || allVarchar) StringType
        else {
          val v = firstDataRow(i)
          if (v == "TRUE" || v == "FALSE") BooleanType
          else if (isValidNumber(v)) DoubleType
          else StringType
        }
      StructField(name, tpe, nullable = true)
    }
    StructType(fields)
  }

  /** `IsValidNumber` (`src/gsheets_read.cpp:14-29`): true iff C++
    * `std::stod` consumes the whole string — decimal/scientific forms,
    * `inf`/`infinity`/`nan` (any case, optional sign), leading (not
    * trailing) whitespace, and hex floats.
    */
  private val NumberRe =
    """^[\s]*[+-]?(((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?)|(0[xX][0-9a-fA-F]+(\.[0-9a-fA-F]*)?([pP][+-]?\d+)?)|((?i)inf(inity)?|nan))$""".r

  def isValidNumber(value: String): Boolean =
    value.nonEmpty && NumberRe.matches(value)
}
