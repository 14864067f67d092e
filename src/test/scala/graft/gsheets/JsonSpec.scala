package graft.gsheets

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.gsheets.core._

class JsonSpec extends AnyFunSuite {

  test("parses scalars") {
    assert(Json.parse("true") == JBool(true))
    assert(Json.parse("false") == JBool(false))
    assert(Json.parse("null") == JNull)
    assert(Json.parse("42") == JNum("42"))
    assert(Json.parse("-3.25e2") == JNum("-3.25e2"))
    assert(Json.parse("\"hi\"") == JStr("hi"))
  }

  test("parses nested structures and preserves field order") {
    val j = Json.parse("""{"b":1,"a":[{"x":"y"},2,null],"c":{"d":true}}""")
    assert(j.asInstanceOf[JObj].fields.map(_._1) == Vector("b", "a", "c"))
    assert(j("a").arr(1) == JNum("2"))
    assert(j("c")("d") == JBool(true))
  }

  test("write round-trips parse (incl. field order)") {
    val s = """{"b":1,"a":[{"x":"y"},2,null],"c":{"d":true}}"""
    assert(Json.write(Json.parse(s)) == s)
  }

  test("string escapes round-trip") {
    val s = "\"a\\\"b\\\\c\\nd\\te\\u0001f\""
    val parsed = Json.parse(s).asInstanceOf[JStr].value
    assert(parsed == "a\"b\\c\nd\tef")
    assert(Json.parse(Json.write(JStr(parsed))) == JStr(parsed))
  }

  test("number raw tokens preserved") {
    assert(Json.write(Json.parse("[1.50, 1e5, -0.0]")) == "[1.50,1e5,-0.0]")
  }

  test("malformed input throws JsonParseException") {
    val bad = Seq("{", "[1,", "\"unterminated", "{\"a\" 1}", "tru",
      "[1]extra", "\"bad\\u00zzesc\"", "\"bad\\q\"")
    bad.foreach { s =>
      assertThrows[JsonParseException](Json.parse(s))
    }
  }

  test("JValue.int is total") {
    assert(Json.parse("\"12\"").int == 12)
    assert(Json.parse("\"notanum\"").int == 0)
    assert(Json.parse("null").int == 0)
    assert(Json.parse("3.9").int == 3)
  }

  test("missing object keys yield JNull") {
    assert(Json.parse("""{"a":1}""")("zzz") == JNull)
  }
}
