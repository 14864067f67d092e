package graft.gsheets

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.gsheets.core.A1Range

/** Port of the reference's A1 FSM case table
  * (`test/unit/sheets/test_range.cpp`, all cases incl. rejects) plus the
  * `sheet`-param splitting cases from `src/gsheets_read.cpp:127-150`.
  */
class A1Spec extends AnyFunSuite {

  private def valid(rs: String*): Unit =
    rs.foreach(r => assert(A1Range(r).isValid, s"expected valid: $r"))
  private def invalid(rs: String*): Unit =
    rs.foreach(r => assert(!A1Range(r).isValid, s"expected invalid: $r"))

  test("validates single cell reference") {
    valid("A1", "B2", "Z99", "AA100", "XFD1048576")
  }
  test("validates cell range") {
    valid("A1:B2", "A1:Z99", "AA1:ZZ100")
  }
  test("validates column-only range") {
    valid("A:A", "A:Z", "AA:ZZ")
  }
  test("validates row-only range") {
    valid("1:1", "1:100", "5:10")
  }
  test("validates mixed range (cell to column)") {
    valid("A5:A", "B10:B")
  }
  test("validates sheet name with cell reference") {
    valid("Sheet1!A1", "Sheet1!A1:B2", "Data!A:A", "MySheet!1:5")
  }
  test("validates unquoted sheet name only (whole sheet)") {
    valid("Sheet1", "Data", "MySheet2024")
  }
  test("validates quoted sheet name") {
    valid("'My Sheet'!A1", "'My Sheet'!A1:B2", "'Sheet With Spaces'!A:A")
  }
  test("validates quoted sheet name only (whole sheet)") {
    valid("'My Sheet'", "'Sheet With Spaces'")
  }
  test("validates escaped apostrophe in sheet name") {
    valid("'Jon''s Data'!A1", "'It''s a sheet'!A1:B2",
      "'Multiple''quotes''here'!A1")
  }
  test("validates absolute column reference") {
    valid("$A1", "$Z99", "$AA100")
  }
  test("validates absolute row reference") {
    valid("A$1", "Z$99", "AA$100")
  }
  test("validates fully absolute reference") {
    valid("$A$1", "$Z$99", "$AA$100")
  }
  test("validates absolute references in ranges") {
    valid("$A$1:$B$2", "$A1:B$2", "A$1:$B2", "$A:$B", "$A$1:B2")
  }
  test("validates absolute references with sheet names") {
    valid("Sheet1!$A$1", "Sheet1!$A1:$B2", "'My Sheet'!$A$1:$B$2")
  }
  test("rejects invalid absolute reference syntax") {
    invalid("$$A1", "A$$1", "$1", "$", "A1$", "$:A")
  }
  test("rejects empty string") {
    invalid("")
  }
  test("rejects invalid characters") {
    invalid("A1#B2", "A1@", "A1 B2")
  }
  test("rejects unclosed quote") {
    invalid("'Unclosed", "'Sheet!A1")
  }
  test("rejects dangling colon") {
    invalid("A1:", ":A1", "A:")
  }
  test("rejects dangling bang") {
    invalid("Sheet1!", "!A1")
  }
  test("rejects invalid quote placement") {
    invalid("Sheet'1!A1", "'Sheet'1!A1")
  }
  test("rejects double colon") {
    invalid("A1::B2", "A1:B2:C3")
  }
  test("rejects double bang") {
    invalid("Sheet1!!A1", "Sheet1!Sheet2!A1")
  }

  // --- sheet-param splitting (`src/gsheets_read.cpp:127-150`) ---

  test("splitSheetParam: quoted name with embedded bang + A1") {
    assert(A1Range.splitSheetParam("'Sheet1!'!A2:B7") == (("Sheet1!", "A2:B7")))
  }
  test("splitSheetParam: quoted name only") {
    assert(A1Range.splitSheetParam("'My Sheet'") == (("My Sheet", "")))
  }
  test("splitSheetParam: unquoted with A1") {
    assert(A1Range.splitSheetParam("Sheet1!A2:B7") == (("Sheet1", "A2:B7")))
  }
  test("splitSheetParam: plain name") {
    assert(A1Range.splitSheetParam("Sheet1") == (("Sheet1", "")))
  }
  test("splitSheetParam: unclosed quote passes through") {
    assert(A1Range.splitSheetParam("'Unclosed") == (("'Unclosed", "")))
  }
}
