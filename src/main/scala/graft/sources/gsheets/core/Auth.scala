package graft.sources.gsheets.core

/** Credential providers, port of reference `src/sheets/auth` +
  * `src/sheets/auth_factory.cpp:10-34`.
  *
  * The reference's interactive browser OAuth provider
  * (`src/gsheets_auth.cpp:140-184`) is stdin-driven and deliberately not
  * ported — a cluster engine supports the two CI-tested paths: static
  * bearer token and service-account key (SURVEY §7.3).
  */
trait AuthProvider {
  def authorizationHeader(): String
}

/** Static `Bearer <token>` header (`bearer_token_auth.cpp:6-8`). */
final class BearerTokenAuth(token: String) extends AuthProvider {
  override def authorizationHeader(): String = s"Bearer $token"
  override def toString: String = "BearerTokenAuth(token=***)"
}

/** Service-account RS256 JWT flow
  * (`src/sheets/auth/service_account_auth.cpp:44-150`):
  * JWT {iss=email, scope=spreadsheets, aud=token endpoint, iat, exp=iat+1800}
  * signed SHA256withRSA, exchanged at the OAuth token endpoint; the
  * access token is cached and refreshed 60 s early. `clock` and
  * `tokenEndpoint` are injectable for hermetic tests (the reference
  * injects `IHttpClient` for the same reason).
  */
final class ServiceAccountAuth(
    http: SheetsHttp,
    email: String,
    privateKey: String,
    clock: () => Long = () => System.currentTimeMillis() / 1000L,
    tokenEndpoint: String = ServiceAccountAuth.TokenEndpoint)
  extends AuthProvider {

  import ServiceAccountAuth.TokenTtlSeconds

  private var cachedToken: String = ""
  private var expirationTime: Long = 0L

  override def authorizationHeader(): String = synchronized {
    if (isExpired) refresh()
    s"Bearer $cachedToken"
  }

  private def isExpired: Boolean =
    cachedToken.isEmpty || clock() >= expirationTime

  /** Visible for tests: the signed JWT (header.claims.signature). */
  private[graft] def createJwt(): String = {
    val header = """{"alg":"RS256","typ":"JWT"}"""
    val now = clock()
    // Claim key order matches the reference's nlohmann dump (alphabetical).
    val claims = Json.write(JObj.of(
      "aud" -> JStr(tokenEndpoint),
      "exp" -> JNum((now + TokenTtlSeconds).toString),
      "iat" -> JNum(now.toString),
      "iss" -> JStr(email),
      "scope" -> JStr("https://www.googleapis.com/auth/spreadsheets")))
    val signInput =
      Encoding.base64UrlEncode(header) + "." + Encoding.base64UrlEncode(claims)
    val sig = java.security.Signature.getInstance("SHA256withRSA")
    sig.initSign(Encoding.parsePkcs8RsaKey(privateKey))
    sig.update(signInput.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    signInput + "." + Encoding.base64UrlEncode(sig.sign())
  }

  private def refresh(): Unit = {
    val jwt = createJwt()
    val body =
      s"grant_type=urn:ietf:params:oauth:grant-type:jwt-bearer&assertion=$jwt"
    val response = http.post(
      tokenEndpoint,
      Map("Content-Type" -> "application/x-www-form-urlencoded"),
      body)
    if (response.statusCode != 200)
      throw new SheetsApiException(response.statusCode,
        s"Token exchange failed: ${response.body}")
    val json =
      try Json.parse(response.body)
      catch {
        case e: JsonParseException => throw new SheetsParseException(
          s"Failed to parse token response: ${response.body}")
      }
    json("access_token") match {
      case JStr(tok) =>
        cachedToken = tok
        val expiresIn = json("expires_in").asOpt.map(_.long)
          .getOrElse(TokenTtlSeconds)
        expirationTime = clock() + expiresIn - 60L // refresh 1 min early
      case _ => throw new SheetsParseException(
        s"Token response missing 'access_token': ${response.body}")
    }
  }

  override def toString: String = s"ServiceAccountAuth(email=$email)"
}

object ServiceAccountAuth {
  val TokenTtlSeconds: Long = 1800L
  val TokenEndpoint: String = "https://oauth2.googleapis.com/token"
}

/** Option-driven factory — the DSV2 analog of the reference's secret
  * lookup (`auth_factory.cpp:10-34`): service-account (key file or inline
  * email+privateKey) wins over a static token, mirroring the reference's
  * provider==key_file branch.
  *
  * Recognized options (camelCase with snake_case aliases):
  *   - `keyFilePath` / `key_file` — JSON file with client_email/private_key
  *   - `email` + `privateKey` / `private_key` — inline service account
  *   - `token` — static bearer token
  */
object AuthFactory {

  def fromOptions(options: Map[String, String], http: SheetsHttp): AuthProvider = {
    val lower = options.map { case (k, v) => k.toLowerCase -> v }
    def opt(keys: String*): Option[String] =
      keys.iterator.flatMap(k => lower.get(k)).find(_.nonEmpty)

    opt("keyfilepath", "key_file_path", "key_file") match {
      case Some(path) =>
        val content = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
          java.nio.charset.StandardCharsets.UTF_8)
        fromKeyFileJson(content, http)
      case None =>
        (opt("email"), opt("privatekey", "private_key")) match {
          case (Some(email), Some(key)) =>
            new ServiceAccountAuth(http, email, key)
          case _ =>
            opt("token") match {
              case Some(token) => new BearerTokenAuth(token)
              case None => throw new IllegalArgumentException(
                "No gsheets credentials: provide option 'token', " +
                "'keyFilePath', or 'email'+'privateKey'")
            }
        }
    }
  }

  /** Key-file JSON → provider; reads `client_email`/`private_key` like
    * the reference's key_file secret (`src/gsheets_auth.cpp:83-90`).
    */
  def fromKeyFileJson(content: String, http: SheetsHttp): AuthProvider = {
    val json = Json.parse(content)
    (json("client_email"), json("private_key")) match {
      case (JStr(email), JStr(key)) => new ServiceAccountAuth(http, email, key)
      case _ => throw new IllegalArgumentException(
        "Key file JSON must contain 'client_email' and 'private_key'")
    }
  }
}
