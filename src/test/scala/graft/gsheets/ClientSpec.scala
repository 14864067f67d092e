package graft.gsheets

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.gsheets.core._

/** Port of `test/unit/sheets/resources/test_values.cpp` +
  * `test_spreadsheet.cpp`: URL/method/body per endpoint, error taxonomy,
  * all against the MockHttp seam.
  */
class ClientSpec extends AnyFunSuite {

  private val Base = "https://sheets.googleapis.com/v4"

  private def client(mock: MockHttp): GoogleSheetsClient =
    new GoogleSheetsClient(mock, new BearerTokenAuth("tok"), Base)

  private val metadataJson = """{
    "spreadsheetId": "abc123",
    "properties": {"title": "My Spreadsheet", "locale": "en_US", "timeZone": "America/New_York"},
    "sheets": [
      {"properties": {"sheetId": 0, "title": "Sheet1", "index": 0, "sheetType": "GRID"}},
      {"properties": {"sheetId": 1, "title": "Sheet2", "index": 1, "sheetType": "GRID"}}
    ]
  }"""

  test("valuesGet returns ValueRange and builds correct URL") {
    val mock = new MockHttp
    mock.addJson("""{"range":"Sheet1!A1:B2","majorDimension":"ROWS","values":[["a","b"],["c","d"]]}""")
    val result = client(mock).valuesGet("spreadsheet123", A1Range("Sheet1!A1:B2"))
    assert(result.range == "Sheet1!A1:B2")
    assert(result.majorDimension == "ROWS")
    assert(result.values == Vector(Vector("a", "b"), Vector("c", "d")))
    val reqs = mock.recordedRequests
    assert(reqs.size == 1)
    assert(reqs(0).url == s"$Base/spreadsheets/spreadsheet123/values/Sheet1!A1:B2")
    assert(reqs(0).method == HttpMethod.GET)
    assert(reqs(0).headers("Authorization") == "Bearer tok")
    assert(reqs(0).headers("Content-Type") == "application/json")
    assert(reqs(0).headers("Accept") == "application/json")
  }

  test("valuesGet throws SheetsApiException on HTTP error") {
    val mock = new MockHttp
    mock.addJson("""{"error":{"message":"Not found"}}""", status = 404)
    val e = intercept[SheetsApiException] {
      client(mock).valuesGet("s", A1Range("Sheet1!A1"))
    }
    assert(e.statusCode == 404)
    assert(e.getMessage.startsWith("Google Sheets API error (404):"))
  }

  test("valuesGet throws SheetsParseException on invalid JSON") {
    val mock = new MockHttp
    mock.addJson("not valid json")
    intercept[SheetsParseException] {
      client(mock).valuesGet("s", A1Range("Sheet1!A1"))
    }
  }

  test("valuesUpdate sends PUT with USER_ENTERED and body") {
    val mock = new MockHttp
    mock.addJson("""{"spreadsheetId":"spreadsheet123","updatedRange":"Sheet1!A1:B2",
      "updatedRows":2,"updatedColumns":2,"updatedCells":4}""")
    val result = client(mock).valuesUpdate("spreadsheet123", A1Range("Sheet1!A1:B2"),
      ValueRange("Sheet1!A1:B2", "ROWS", Vector(Vector("x", "y"), Vector("z", "w"))))
    assert(result.updatedCells == 4)
    val req = mock.recordedRequests.head
    assert(req.method == HttpMethod.PUT)
    assert(req.url == s"$Base/spreadsheets/spreadsheet123/values/Sheet1!A1:B2?valueInputOption=USER_ENTERED")
    // nlohmann-parity: alphabetical keys
    assert(req.body ==
      """{"majorDimension":"ROWS","range":"Sheet1!A1:B2","values":[["x","y"],["z","w"]]}""")
  }

  test("valuesAppend sends POST to :append with USER_ENTERED") {
    val mock = new MockHttp
    mock.addJson("""{"spreadsheetId":"spreadsheet123","tableRange":"Sheet1!A1:B2","updates":{}}""")
    val result = client(mock).valuesAppend("spreadsheet123", A1Range("Sheet1!A1"),
      ValueRange("Sheet1!A1", "ROWS", Vector(Vector("new", "row"))))
    assert(result.spreadsheetId == "spreadsheet123")
    val req = mock.recordedRequests.head
    assert(req.method == HttpMethod.POST)
    assert(req.url == s"$Base/spreadsheets/spreadsheet123/values/Sheet1!A1:append?valueInputOption=USER_ENTERED")
    assert(req.body.contains("\"values\""))
  }

  test("valuesClear sends POST to :clear with empty-object body") {
    val mock = new MockHttp
    mock.addJson("""{"spreadsheetId":"spreadsheet123","clearedRange":"Sheet1!A1:B2"}""")
    val result = client(mock).valuesClear("spreadsheet123", A1Range("Sheet1!A1:B2"))
    assert(result.clearedRange == "Sheet1!A1:B2")
    val req = mock.recordedRequests.head
    assert(req.method == HttpMethod.POST)
    assert(req.url.endsWith(":clear"))
    assert(req.body == "{}")
  }

  test("spreadsheetGet parses metadata and builds correct URL") {
    val mock = new MockHttp
    mock.addJson(metadataJson)
    val result = client(mock).spreadsheetGet("abc123")
    assert(result.spreadsheetId == "abc123")
    assert(result.properties.title == "My Spreadsheet")
    assert(result.properties.locale == "en_US")
    assert(result.properties.timeZone == "America/New_York")
    assert(result.sheets.size == 2)
    assert(result.sheets(0).properties.title == "Sheet1")
    assert(result.sheets(0).properties.sheetType == SheetType.Grid)
    assert(mock.recordedRequests.head.url == s"$Base/spreadsheets/abc123")
  }

  test("getSheetBy id/name/index hit and miss") {
    val mock = new MockHttp
    (1 to 6).foreach(_ => mock.addJson(metadataJson))
    val c = client(mock)
    assert(c.getSheetById("abc123", 1).properties.title == "Sheet2")
    assert(c.getSheetByName("abc123", "Sheet1").properties.sheetId == 0)
    assert(c.getSheetByIndex("abc123", 1).properties.title == "Sheet2")
    assert(intercept[SheetNotFoundException](
      c.getSheetById("abc123", 99)).getMessage == "Sheet not found: 99")
    assert(intercept[SheetNotFoundException](
      c.getSheetByName("abc123", "Nope")).getMessage == "Sheet not found: Nope")
    intercept[SheetNotFoundException](c.getSheetByIndex("abc123", 7))
  }

  test("getSheetById(string) rejects non-integer before lookup") {
    val mock = new MockHttp // no response queued: must throw before any HTTP
    intercept[IllegalArgumentException] {
      client(mock).getSheetById("abc123", "notanint")
    }
    assert(mock.recordedRequests.isEmpty)
  }

  test("createSheet posts batchUpdate addSheet and parses reply") {
    val mock = new MockHttp
    mock.addJson("""{"replies":[{"addSheet":{"properties":{"sheetId":42,"title":"New","index":2,"sheetType":"GRID"}}}]}""")
    val sheet = client(mock).createSheet("abc123", "New")
    assert(sheet.properties.sheetId == 42)
    val req = mock.recordedRequests.head
    assert(req.method == HttpMethod.POST)
    assert(req.url == s"$Base/spreadsheets/abc123:batchUpdate")
    assert(req.body == """{"requests":[{"addSheet":{"properties":{"title":"New"}}}]}""")
  }

  test("createSheet with empty replies throws SheetNotCreatedException") {
    val mock = new MockHttp
    mock.addJson("""{"replies":[]}""")
    intercept[SheetNotCreatedException](client(mock).createSheet("abc123", "New"))
  }

  test("MockHttp throws when queue exhausted") {
    val mock = new MockHttp
    intercept[IllegalStateException](mock.get("http://x", Map.empty))
  }
}
