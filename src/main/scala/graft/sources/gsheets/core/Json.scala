package graft.sources.gsheets.core

import scala.collection.mutable.ArrayBuffer

/** Minimal dependency-free JSON codec for the Google Sheets API payloads
  * (the reference vendors `third_party/json.hpp` for the same purpose;
  * our payloads are small and fixed-shape, so a compact recursive-descent
  * parser suffices — no external library per the offline build rules).
  *
  * Numbers keep their raw token text ([[JNum.raw]]) so cell values can be
  * round-tripped without re-formatting.
  */
sealed trait JValue {
  def apply(key: String): JValue = this match {
    case o: JObj => o.get(key).getOrElse(JNull)
    case _       => JNull
  }
  def asOpt: Option[JValue] = if (this == JNull) None else Some(this)
  def str: String = this match {
    case JStr(s)      => s
    case JNum(raw)    => raw
    case JBool(true)  => "true"
    case JBool(false) => "false"
    case JNull        => ""
    case other        => Json.write(other)
  }
  /** Total: non-numeric content yields 0 (the reference's nlohmann
    * `value(key, default)` pattern — missing/garbage never throws here).
    */
  def int: Int = this match {
    case JNum(raw) => raw.toDoubleOption.map(_.toInt).getOrElse(0)
    case JStr(s)   => s.toDoubleOption.map(_.toInt).getOrElse(0)
    case _         => 0
  }
  def long: Long = this match {
    case JNum(raw) => raw.toDoubleOption.map(_.toLong).getOrElse(0L)
    case JStr(s)   => s.toDoubleOption.map(_.toLong).getOrElse(0L)
    case _         => 0L
  }
  def arr: Vector[JValue] = this match {
    case JArr(items) => items
    case _           => Vector.empty
  }
}
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
final case class JNum(raw: String) extends JValue
final case class JStr(value: String) extends JValue
final case class JArr(items: Vector[JValue]) extends JValue
/** Insertion-ordered object so parse→write round-trips field order and
  * request bodies serialize with a deterministic key order (the reference's
  * nlohmann::json emits alphabetically-sorted keys; our client sorts at
  * build time instead — see the body builders in Model).
  */
final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
  def get(key: String): Option[JValue] = fields.collectFirst {
    case (k, v) if k == key => v
  }
}
object JObj {
  def of(kvs: (String, JValue)*): JObj = JObj(kvs.toVector)
}

final class JsonParseException(msg: String) extends RuntimeException(msg)

object Json {

  def parse(s: String): JValue = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw new JsonParseException(s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!atEnd && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
             s.charAt(pos) == '\n' || s.charAt(pos) == '\r')) pos += 1
    private def fail(msg: String) =
      throw new JsonParseException(s"$msg at offset $pos")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    private def expectWord(w: String): Unit = {
      if (!s.regionMatches(pos, w, 0, w.length)) fail(s"expected '$w'")
      pos += w.length
    }

    def parseValue(): JValue = {
      skipWs()
      if (atEnd) fail("unexpected end of input")
      s.charAt(pos) match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JStr(parseString())
        case 't' => expectWord("true"); JBool(true)
        case 'f' => expectWord("false"); JBool(false)
        case 'n' => expectWord("null"); JNull
        case c if c == '-' || (c >= '0' && c <= '9') => parseNum()
        case c   => fail(s"unexpected char '$c'")
      }
    }

    private def parseObj(): JValue = {
      expect('{'); skipWs()
      val fields = ArrayBuffer.empty[(String, JValue)]
      if (!atEnd && s.charAt(pos) == '}') { pos += 1; return JObj(fields.toVector) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        fields += (k -> parseValue())
        skipWs()
        if (!atEnd && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(fields.toVector)
    }

    private def parseArr(): JValue = {
      expect('['); skipWs()
      val items = ArrayBuffer.empty[JValue]
      if (!atEnd && s.charAt(pos) == ']') { pos += 1; return JArr(items.toVector) }
      var done = false
      while (!done) {
        items += parseValue()
        skipWs()
        if (!atEnd && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(items.toVector)
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (atEnd) fail("unterminated string")
        val c = s.charAt(pos); pos += 1
        c match {
          case '"'  => return sb.toString
          case '\\' =>
            if (atEnd) fail("bad escape")
            val e = s.charAt(pos); pos += 1
            e match {
              case '"'  => sb += '"'
              case '\\' => sb += '\\'
              case '/'  => sb += '/'
              case 'b'  => sb += '\b'
              case 'f'  => sb += '\f'
              case 'n'  => sb += '\n'
              case 'r'  => sb += '\r'
              case 't'  => sb += '\t'
              case 'u'  =>
                if (pos + 4 > s.length) fail("bad \\u escape")
                val hex = s.substring(pos, pos + 4)
                if (!hex.forall(h => (h >= '0' && h <= '9') ||
                    (h >= 'a' && h <= 'f') || (h >= 'A' && h <= 'F')))
                  fail(s"bad \\u escape '\\u$hex'")
                sb += Integer.parseInt(hex, 16).toChar
                pos += 4
              case other => fail(s"bad escape '\\$other'")
            }
          case other => sb += other
        }
      }
      sb.toString
    }

    private def parseNum(): JValue = {
      val start = pos
      if (!atEnd && s.charAt(pos) == '-') pos += 1
      while (!atEnd && { val c = s.charAt(pos)
        (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-' }) pos += 1
      val raw = s.substring(start, pos)
      if (raw.isEmpty || raw == "-") fail("bad number")
      JNum(raw)
    }
  }

  def write(v: JValue): String = {
    val sb = new StringBuilder
    writeTo(v, sb)
    sb.toString
  }

  private def writeTo(v: JValue, sb: StringBuilder): Unit = v match {
    case JNull        => sb.append("null")
    case JBool(b)     => sb.append(if (b) "true" else "false")
    case JNum(raw)    => sb.append(raw)
    case JStr(s)      => writeString(s, sb)
    case JArr(items)  =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(',')
        first = false
        writeTo(it, sb)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, value) =>
        if (!first) sb.append(',')
        first = false
        writeString(k, sb)
        sb.append(':')
        writeTo(value, sb)
      }
      sb.append('}')
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case '\b'          => sb.append("\\b")
      case '\f'          => sb.append("\\f")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"')
  }
}
