package graft.sources.gsheets.core

/** Token-paste OAuth helper, port of the reference's
  * `InitiateOAuthFlow` (`src/gsheets_auth.cpp:140-184`) minus the
  * interactive stdin/browser steps, which don't exist in a cluster
  * engine (SURVEY §7.3): we build and return the authorization URL; the
  * caller opens it, grants access, and passes the resulting token back
  * as the `token` option (the same "paste the token" contract the
  * reference prints to stdout).
  */
object OAuth {

  /** Web-app implicit-flow client the reference ships
    * (`src/gsheets_auth.cpp:142-144`).
    *
    * ==SECURITY WARNING==
    * These defaults point at the reference project's THIRD-PARTY
    * endpoint: with `DefaultRedirectUri`, Google delivers the granted
    * access token to `duckdb-gsheets.com`, an external party outside
    * your control (the reference's documented flow, kept only for
    * parity). For any real deployment pass your own
    * `clientId`/`redirectUri` to [[authRequest]] — or skip the helper
    * entirely and supply a token/key-file through the `token` /
    * `key_file` options, which never touch a third party. Since build
    * round 9 the helpers FAIL FAST when either default is used without
    * `allowThirdPartyDefaults = true` (VERDICT r8 #6) — the parity
    * behavior is opt-in, not a default.
    */
  val DefaultClientId: String =
    "793766532675-rehqgocfn88h0nl88322ht6d1i12kl4e.apps.googleusercontent.com"
  val DefaultRedirectUri: String = "https://duckdb-gsheets.com/oauth"
  val AuthUrl: String = "https://accounts.google.com/o/oauth2/v2/auth"
  val Scope: String = "https://www.googleapis.com/auth/spreadsheets"

  /** CSRF `state` + full authorization URL. */
  final case class AuthRequest(url: String, state: String)

  /** Builds the implicit-flow (`response_type=token`) authorization URL
    * with a fresh 10-char CSRF state, parameter-for-parameter with
    * `src/gsheets_auth.cpp:147-151`.
    *
    * FAIL-FAST by default (VERDICT r8 #6): the reference's defaults
    * deliver the granted token to the third-party endpoint described
    * in the security warning above, so using either default without
    * `allowThirdPartyDefaults = true` throws — reference parity is an
    * explicit opt-in, never a silent fallback.
    */
  def authRequest(
      clientId: String = DefaultClientId,
      redirectUri: String = DefaultRedirectUri,
      state: String = generateRandomString(10),
      allowThirdPartyDefaults: Boolean = false): AuthRequest = {
    if (!allowThirdPartyDefaults &&
        (clientId == DefaultClientId || redirectUri == DefaultRedirectUri))
      throw new IllegalArgumentException(
        "OAuth defaults point at the reference project's third-party " +
          s"endpoint ($DefaultRedirectUri); the granted access token " +
          "would be delivered outside your control. Pass your own " +
          "clientId AND redirectUri, or opt in to reference parity " +
          "explicitly with allowThirdPartyDefaults = true.")
    val url = AuthUrl +
      "?client_id=" + clientId +
      "&redirect_uri=" + redirectUri +
      "&response_type=token" +
      "&scope=" + Scope +
      "&state=" + state
    AuthRequest(url, state)
  }

  /** The reference's interactive flow (`src/gsheets_auth.cpp:140-184`):
    * print the authorization URL, then read the token the user pastes
    * back. Parameterized over the streams instead of hard-wiring
    * stdin/stdout — a cluster driver can pass a console, a notebook a
    * widget callback, and tests a string pair; the console convenience
    * overload matches the reference exactly. Returns the trimmed token
    * (the caller passes it as the `token` option, the analog of the
    * reference's CreateSecret step).
    */
  def interactiveFlow(
      in: java.io.BufferedReader,
      out: java.io.PrintStream,
      clientId: String = DefaultClientId,
      redirectUri: String = DefaultRedirectUri,
      allowThirdPartyDefaults: Boolean = false): String = {
    val req = authRequest(clientId, redirectUri,
      allowThirdPartyDefaults = allowThirdPartyDefaults)
    out.println("Visit this URL to authorize access to your Google Sheets:")
    out.println()
    out.println(req.url)
    out.println()
    // Defaults point at the reference project's endpoint — make the
    // trust decision visible at the moment it matters, not only in docs.
    if (redirectUri == DefaultRedirectUri)
      out.println(
        "WARNING: the granted token will be delivered via the third-party " +
          s"redirect $DefaultRedirectUri; pass your own clientId/redirectUri " +
          "(or use the token/key_file options) to avoid it.")
    out.println("After authorizing, copy the access token and paste it below.")
    out.print("Access token: ")
    out.flush()
    val line = in.readLine()
    val token = if (line == null) "" else line.trim
    if (token.isEmpty)
      throw new IllegalArgumentException("OAuth flow: no token was provided")
    token
  }

  /** Console overload — the reference's exact stdin/stdout contract.
    * Fail-fast like [[authRequest]]: with no arguments this throws
    * (the defaults are the third-party endpoint); pass `true` to opt
    * in to reference parity.
    */
  def interactiveFlow(): String = interactiveFlow(false)

  def interactiveFlow(allowThirdPartyDefaults: Boolean): String =
    interactiveFlow(
      new java.io.BufferedReader(new java.io.InputStreamReader(System.in)),
      System.out,
      allowThirdPartyDefaults = allowThirdPartyDefaults)

  /** Alphanumeric random string, port of `generate_random_string`
    * (`src/gsheets_utils.cpp:53-68`): charset `[0-9A-Za-z]`, uniform.
    */
  def generateRandomString(length: Int): String = {
    val charset =
      "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    val rnd = new java.security.SecureRandom()
    val sb = new StringBuilder(length)
    var i = 0
    while (i < length) {
      sb.append(charset.charAt(rnd.nextInt(charset.length)))
      i += 1
    }
    sb.toString
  }
}
