package graft.gsheets

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.gsheets.core.Urls

/** URL extraction behavior parity with reference
  * `src/gsheets_utils.cpp:11-51` + the documented urlEncode divergence.
  */
class UrlsSpec extends AnyFunSuite {

  private val docUrl =
    "https://docs.google.com/spreadsheets/d/11QdEasMWbETbFVxry-SsD8jVcdYIT1zBQszcF84MdE8/edit?gid=0#gid=0&range=B1:C7"

  test("extractSpreadsheetId: bare id passes through") {
    assert(Urls.extractSpreadsheetId("11QdEasMWbETbFVxry-SsD8jVcdYIT1zBQszcF84MdE8")
      == "11QdEasMWbETbFVxry-SsD8jVcdYIT1zBQszcF84MdE8")
  }
  test("extractSpreadsheetId: docs URL yields /d/ segment") {
    assert(Urls.extractSpreadsheetId(docUrl)
      == "11QdEasMWbETbFVxry-SsD8jVcdYIT1zBQszcF84MdE8")
  }
  test("extractSpreadsheetId: non-sheets URL throws") {
    assertThrows[Urls.InvalidSheetUrlException] {
      Urls.extractSpreadsheetId("https://example.com/d/abc")
    }
  }
  test("extractSheetId: gid from URL") {
    assert(Urls.extractSheetId(docUrl) == "0")
    assert(Urls.extractSheetId(
      "https://docs.google.com/spreadsheets/d/X/edit?gid=732080485#gid=732080485") == "732080485")
  }
  test("extractSheetId: empty without gid or for bare id") {
    assert(Urls.extractSheetId("bare-id") == "")
    assert(Urls.extractSheetId("https://docs.google.com/spreadsheets/d/X/edit") == "")
  }
  test("extractSheetRange: range query param") {
    assert(Urls.extractSheetRange(docUrl) == "B1:C7")
    assert(Urls.extractSheetRange(
      "https://docs.google.com/spreadsheets/d/X/edit?range=A2:B7&gid=0") == "A2:B7")
  }
  test("extractSheetRange: empty without range") {
    assert(Urls.extractSheetRange("https://docs.google.com/spreadsheets/d/X/edit#gid=0") == "")
  }

  test("urlEncode: passthrough of unreserved chars") {
    assert(Urls.urlEncode("Sheet1") == "Sheet1")
    assert(Urls.urlEncode("a-b_c.d~e") == "a-b_c.d~e")
  }
  test("urlEncode: space and punctuation") {
    assert(Urls.urlEncode("My Sheet") == "My%20Sheet")
    assert(Urls.urlEncode("a!b") == "a%21b")
  }
  test("urlEncode: zero-padded hex divergence from reference is pinned") {
    // Reference emits unpadded %A for '\n' (`gsheets_utils.cpp:70-82`);
    // we deliberately emit standards-correct %0A (SURVEY §7.3).
    assert(Urls.urlEncode("\n") == "%0A")
  }
  test("urlEncode: UTF-8 multibyte") {
    assert(Urls.urlEncode("é") == "%C3%A9")
  }
}
