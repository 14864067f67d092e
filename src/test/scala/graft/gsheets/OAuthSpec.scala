package graft.gsheets

import graft.sources.gsheets.core.OAuth
import org.scalatest.funsuite.AnyFunSuite

/** A2/U7 coverage: auth-URL shape parity with the reference's
  * `InitiateOAuthFlow` (`src/gsheets_auth.cpp:140-184`) and
  * `generate_random_string` (`src/gsheets_utils.cpp:53-68`), plus the
  * round-9 fail-fast contract (VERDICT r8 #6): the reference's
  * third-party defaults are an explicit opt-in.
  */
class OAuthSpec extends AnyFunSuite {

  test("auth URL carries the reference's client, redirect, scope, response_type") {
    val req = OAuth.authRequest(state = "abcXYZ0123",
      allowThirdPartyDefaults = true)
    assert(req.url.startsWith("https://accounts.google.com/o/oauth2/v2/auth?"))
    assert(req.url.contains("client_id=" + OAuth.DefaultClientId))
    assert(req.url.contains("redirect_uri=https://duckdb-gsheets.com/oauth"))
    assert(req.url.contains("response_type=token"))
    assert(req.url.contains(
      "scope=https://www.googleapis.com/auth/spreadsheets"))
    assert(req.url.endsWith("&state=abcXYZ0123"))
    assert(req.state == "abcXYZ0123")
  }

  test("defaults fail fast without the explicit third-party opt-in") {
    // Either default alone is enough to deliver the token through the
    // reference project's endpoint or its client registration, so both
    // must be explicit — not just one.
    assertThrows[IllegalArgumentException](OAuth.authRequest())
    assertThrows[IllegalArgumentException](
      OAuth.authRequest(clientId = "my-client")) // default redirect
    assertThrows[IllegalArgumentException](
      OAuth.authRequest(redirectUri = "https://example.com/cb")) // default client
    assertThrows[IllegalArgumentException](OAuth.interactiveFlow(
      new java.io.BufferedReader(new java.io.StringReader("tok\n")),
      new java.io.PrintStream(new java.io.ByteArrayOutputStream())))
  }

  test("custom client id and redirect need no opt-in and override the defaults") {
    val req = OAuth.authRequest(clientId = "my-client",
      redirectUri = "https://example.com/cb", state = "s1")
    assert(req.url.contains("client_id=my-client"))
    assert(req.url.contains("redirect_uri=https://example.com/cb"))
  }

  test("generateRandomString: requested length, alphanumeric charset only") {
    val s = OAuth.generateRandomString(10)
    assert(s.length == 10)
    assert(s.forall(_.isLetterOrDigit))
    val long = OAuth.generateRandomString(500)
    assert(long.length == 500)
    assert(long.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')))
  }

  test("generateRandomString: fresh states differ (CSRF utility)") {
    val a = OAuth.generateRandomString(16)
    val b = OAuth.generateRandomString(16)
    assert(a != b)
  }

  test("opted-in default authRequest generates a 10-char state like the reference") {
    val req = OAuth.authRequest(allowThirdPartyDefaults = true)
    assert(req.state.length == 10)
    assert(req.url.endsWith("&state=" + req.state))
  }

  test("interactive flow prints the auth URL and returns the pasted token") {
    val in = new java.io.BufferedReader(
      new java.io.StringReader("  ya29.pasted-token \n"))
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bytes, true, "UTF-8")
    val token = OAuth.interactiveFlow(in, out, clientId = "cid",
      redirectUri = "https://example.com/cb")
    assert(token == "ya29.pasted-token")
    val printed = bytes.toString("UTF-8")
    assert(printed.contains("https://accounts.google.com/o/oauth2/v2/auth?"))
    assert(printed.contains("client_id=cid"))
    assert(printed.contains("redirect_uri=https://example.com/cb"))
    assert(printed.contains("Access token: "))
  }

  test("opted-in interactive flow still prints the third-party warning") {
    val in = new java.io.BufferedReader(new java.io.StringReader("tok\n"))
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bytes, true, "UTF-8")
    val token = OAuth.interactiveFlow(in, out,
      allowThirdPartyDefaults = true)
    assert(token == "tok")
    assert(bytes.toString("UTF-8").contains("WARNING"),
      "parity mode must still surface the third-party delivery warning")
  }

  test("interactive flow rejects an empty or missing token") {
    def run(inputs: String) = OAuth.interactiveFlow(
      new java.io.BufferedReader(new java.io.StringReader(inputs)),
      new java.io.PrintStream(new java.io.ByteArrayOutputStream()),
      clientId = "cid", redirectUri = "https://example.com/cb")
    assertThrows[IllegalArgumentException](run("\n"))
    assertThrows[IllegalArgumentException](run("")) // EOF -> null line
  }
}
