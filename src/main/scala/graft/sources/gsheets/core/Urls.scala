package graft.sources.gsheets.core

/** URL parsing utilities with the reference's exact behavior
  * (`src/gsheets_utils.cpp:11-51`).
  */
object Urls {

  private val DocsPrefix = "docs.google.com/spreadsheets/d/"
  private val IdRe = "/d/([a-zA-Z0-9-_]+)".r
  private val GidRe = "gid=([0-9]+)".r
  private val RangeRe = "range=([^&]+)".r

  final class InvalidSheetUrlException(msg: String)
      extends IllegalArgumentException(msg)

  /** Bare IDs (no `/`) pass through; docs.google.com URLs yield the
    * `/d/<id>` segment; anything else throws — message parity with
    * reference `src/gsheets_utils.cpp:27`.
    */
  def extractSpreadsheetId(input: String): String = {
    if (!input.contains('/')) return input
    if (input.contains(DocsPrefix)) {
      IdRe.findFirstMatchIn(input) match {
        case Some(m) => return m.group(1)
        case None    => ()
      }
    }
    throw new InvalidSheetUrlException("Invalid Google Sheets URL or ID")
  }

  /** `gid=N` from a docs URL, else "" (`src/gsheets_utils.cpp:30-39`). */
  def extractSheetId(input: String): String =
    if (input.contains(DocsPrefix) && input.contains("gid="))
      GidRe.findFirstMatchIn(input).map(_.group(1)).getOrElse("")
    else ""

  /** `range=X` (up to `&`) from a docs URL, else ""
    * (`src/gsheets_utils.cpp:41-51`).
    */
  def extractSheetRange(input: String): String =
    if (input.contains(DocsPrefix) && input.contains("range="))
      RangeRe.findFirstMatchIn(input).map(_.group(1)).getOrElse("")
    else ""

  /** Percent-encodes everything outside `[A-Za-z0-9-_.~]`. The reference
    * (`src/gsheets_utils.cpp:70-82`) emits non-zero-padded hex for bytes
    * < 0x10; we use standard zero-padded encoding (documented divergence,
    * SURVEY §7.3 — practical inputs are sheet names and never hit it).
    * Encodes UTF-8 bytes, uppercase hex, like the standard form.
    */
  def urlEncode(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder
    bytes.foreach { b =>
      val c = (b & 0xff).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~')
        sb.append(c)
      else
        sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }
}
