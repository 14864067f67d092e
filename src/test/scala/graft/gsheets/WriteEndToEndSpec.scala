package graft.gsheets

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.sources.gsheets.GSheetsBind
import graft.sources.gsheets.core.{HttpMethod, MockHttp, TransportRegistry}

/** End-to-end write scenarios replaying `test/sql/copy_to.test`,
  * `copy_to_range_flags.test` and `copy_multiple_vectors.test` against
  * MockHttp: request sequences, clear/header/append semantics, option
  * precedence, 2048-row batching.
  *
  * Note: Spark's V2 write path hands the DataFrame schema straight to
  * `getTable` (`supportsExternalMetadata=true`), so — like the reference's
  * COPY, and unlike the read path — no bind/fetch happens before a write:
  * the first HTTP call is the clear/create/append of the global init.
  */
class WriteEndToEndSpec extends AnyFunSuite {

  import Fixtures._

  private var counter = 0

  private def writer(mock: MockHttp, df: DataFrame): (org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row], String) = {
    counter += 1
    val name = s"mock-write-$counter"
    TransportRegistry.register(name, mock)
    GSheetsBind.clearCache()
    (df.write.format("gsheets")
      .option("transport", name)
      .option("token", "test-token")
      .option("cachebust", name), name)
  }

  private def companies: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("Microsoft", "Excel", 1985L),
      ("Google", "Google Sheets", 2006L),
      ("Apple", "Numbers", 1984L),
      ("LibreOffice", "Calc", 2000L))
      .toDF("company", "product", "year_founded")
      .coalesce(1)
  }

  private val appendReply =
    """{"spreadsheetId":"x","tableRange":"t","updates":{"updatedCells":1}}"""
  private val clearReply =
    """{"spreadsheetId":"x","clearedRange":"write_fixture"}"""

  test("overwrite mode: clear sheet, header, then data (reference COPY default)") {
    val mock = new MockHttp
    mock.addJson(clearReply)   // clear whole sheet
    mock.addJson(appendReply)  // header append
    mock.addJson(appendReply)  // data append
    val (w, _) = writer(mock, companies)
    w.option("sheet", "write_fixture").mode("overwrite").save(SpreadsheetId)

    val reqs = mock.recordedRequests
    assert(reqs.size == 3)
    assert(reqs(0).method == HttpMethod.POST)
    assert(reqs(0).url.endsWith("/values/write_fixture:clear"))
    assert(reqs(0).body == "{}")
    assert(reqs(1).body ==
      """{"majorDimension":"ROWS","range":"write_fixture","values":[["company","product","year_founded"]]}""")
    assert(reqs(2).url.endsWith("/values/write_fixture:append?valueInputOption=USER_ENTERED"))
    assert(reqs(2).body ==
      """{"majorDimension":"ROWS","range":"write_fixture","values":[["Microsoft","Excel","1985"],["Google","Google Sheets","2006"],["Apple","Numbers","1984"],["LibreOffice","Calc","2000"]]}""")
  }

  test("overwrite_range=true clears only the range (precedence over overwrite_sheet)") {
    val mock = new MockHttp
    mock.addJson(metadataJson) // init: gid → sheet name lookup
    mock.addJson(clearReply)   // clear range only
    mock.addJson(appendReply)  // header (default true under overwrite_range)
    mock.addJson(appendReply)  // data
    val (w, _) = writer(mock, companies)
    w.option("overwrite_range", "true").option("overwrite_sheet", "false")
      .mode("append")
      .save(s"https://docs.google.com/spreadsheets/d/$SpreadsheetId/edit?gid=341836654#gid=341836654&range=C6:E10")

    val reqs = mock.recordedRequests
    assert(reqs.size == 4)
    assert(reqs(0).method == HttpMethod.GET)
    assert(reqs(1).url.endsWith("/values/write_fixture!C6:E10:clear"))
    // body range uses the unencoded sheet name (reference `:163-175`)
    assert(reqs(3).body.contains(""""range":"write_fixture!C6:E10""""))
  }

  test("plain append mode: no clear, no header") {
    val mock = new MockHttp
    mock.addJson(appendReply) // data only
    val (w, _) = writer(mock, companies)
    w.option("sheet", "write_fixture").mode("append").save(SpreadsheetId)

    val reqs = mock.recordedRequests
    assert(reqs.size == 1)
    assert(reqs(0).method == HttpMethod.POST)
    assert(reqs(0).url.contains(":append"))
  }

  test("header=true in append mode is honored (explicit beats default)") {
    val mock = new MockHttp
    mock.addJson(appendReply) // header
    mock.addJson(appendReply) // data
    val (w, _) = writer(mock, companies)
    w.option("sheet", "write_fixture").option("header", "true")
      .mode("append").save(SpreadsheetId)
    assert(mock.recordedRequests.size == 2)
  }

  test("sheet/range params take precedence over the URL query string") {
    val mock = new MockHttp
    mock.addJson(appendReply) // data; no gid lookup since sheet param given
    val (w, _) = writer(mock, companies)
    w.option("sheet", "write_fixture").option("range", "C6:E10")
      .mode("append")
      .save(s"https://docs.google.com/spreadsheets/d/$SpreadsheetId/edit?gid=0#gid=0&range=A1:B2")

    val reqs = mock.recordedRequests
    assert(reqs.size == 1)
    assert(reqs(0).url.endsWith("/values/write_fixture!C6:E10:append?valueInputOption=USER_ENTERED"))
  }

  test("multi-chunk append: 5000 rows → 2048+2048+904 in three POSTs") {
    val s = spark
    import s.implicits._
    val df = s.range(5000).toDF("i")
    val mock = new MockHttp
    (1 to 3).foreach(_ => mock.addJson(appendReply))
    val (w, _) = writer(mock, df)
    w.option("sheet", "write_fixture").mode("append").save(SpreadsheetId)

    val appends = mock.recordedRequests.filter(_.url.contains(":append"))
    assert(appends.size == 3)
    def nRows(body: String): Int = body.sliding(2).count(_ == "[\"")
    assert(nRows(appends(0).body) == 2048)
    assert(nRows(appends(1).body) == 2048)
    assert(nRows(appends(2).body) == 904)
  }

  test("create_if_not_exists creates a missing sheet then appends") {
    val mock = new MockHttp
    mock.addJson(metadataJson)  // init: create check (missing → create)
    mock.addJson("""{"replies":[{"addSheet":{"properties":{"sheetId":77,"title":"NewSheet","index":10,"sheetType":"GRID"}}}]}""")
    mock.addJson(appendReply)   // data
    val (w, _) = writer(mock, companies)
    w.option("sheet", "NewSheet").option("create_if_not_exists", "true")
      .mode("append").save(SpreadsheetId)

    val reqs = mock.recordedRequests
    assert(reqs.size == 3)
    assert(reqs(1).url.endsWith(":batchUpdate"))
    assert(reqs(1).body == """{"requests":[{"addSheet":{"properties":{"title":"NewSheet"}}}]}""")
    assert(reqs(2).url.contains("/values/NewSheet:append"))
  }

  test("create_if_not_exists without sheet errors like the reference bind") {
    val mock = new MockHttp
    val (w, _) = writer(mock, companies)
    val e = intercept[Throwable] {
      w.option("create_if_not_exists", "true").mode("append").save(SpreadsheetId)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("Must provide sheet name")))
    assert(mock.recordedRequests.isEmpty)
  }

  test("NULLs serialize as empty cells; typed values render as cell text") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Option("x"), Option(true), Option(1.5), Option(java.sql.Date.valueOf("2024-02-29")),
        Option(java.sql.Timestamp.valueOf("2024-02-29 12:34:56"))),
      (None: Option[String], None: Option[Boolean], None: Option[Double],
        None: Option[java.sql.Date], None: Option[java.sql.Timestamp]))
      .toDF("s", "b", "d", "dt", "ts").coalesce(1)
    val mock = new MockHttp
    mock.addJson(appendReply)
    val (w, _) = writer(mock, df)
    w.option("sheet", "write_fixture").mode("append").save(SpreadsheetId)

    val body = mock.recordedRequests.last.body
    assert(body.contains("""["x","true","1.5","2024-02-29","2024-02-29 12:34:56"]"""))
    assert(body.contains("""["","","","",""]"""))
  }

  test("multi-partition input still writes through a single writer") {
    val s = spark
    import s.implicits._
    val df = s.range(100).toDF("i").repartition(4)
    val mock = new MockHttp
    mock.addJson(appendReply)
    val (w, _) = writer(mock, df)
    w.option("sheet", "write_fixture").mode("append").save(SpreadsheetId)
    // exactly one data append despite 4 input partitions
    assert(mock.recordedRequests.count(_.url.contains(":append")) == 1)
  }
}
