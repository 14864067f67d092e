package graft.sources.gsheets.core

import java.nio.charset.StandardCharsets

/** JWT building blocks, port of reference
  * `src/sheets/util/encoding.cpp:14-53`.
  */
object Encoding {

  /** Unpadded base64url (RFC 4648 §5), identical output to the
    * reference's hand-rolled encoder.
    */
  def base64UrlEncode(data: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(data)

  def base64UrlEncode(s: String): String =
    base64UrlEncode(s.getBytes(StandardCharsets.UTF_8))

  /** Literal `\n` escapes → real newlines (`encoding.cpp:45-53`) — key
    * files pasted through JSON carry escaped newlines in `private_key`.
    */
  def normalizePemKey(key: String): String = key.replace("\\n", "\n")

  /** PEM (PKCS#8 `BEGIN PRIVATE KEY`) → RSA PrivateKey. Google
    * service-account key files ship PKCS#8; that is the only format the
    * token flow needs.
    */
  def parsePkcs8RsaKey(pem: String): java.security.PrivateKey = {
    val norm = normalizePemKey(pem)
    val body = norm.linesIterator
      .filterNot(l => l.startsWith("-----") || l.trim.isEmpty)
      .mkString
    val der = java.util.Base64.getMimeDecoder.decode(body)
    val spec = new java.security.spec.PKCS8EncodedKeySpec(der)
    java.security.KeyFactory.getInstance("RSA").generatePrivate(spec)
  }
}
