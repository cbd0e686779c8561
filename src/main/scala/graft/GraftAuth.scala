package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Bearer-token identity for the façade — the local stand-in for the
  * reference's Firebase verifier (`verifyFBToken`,
  * /root/reference/index.js:93-110).
  *
  * The reference delegates signature verification to
  * `admin.auth().verifyIdToken` (an external identity provider) and
  * then trusts `decoded.email`. The engine keeps the same contract
  * with a self-contained signed token: `base64url(email) "."
  * base64url(HMAC-SHA256(secret, email))` — the JWT shape minus the
  * provider round-trip. Verification is REAL cryptography (a forged or
  * tampered token fails the constant-time MAC compare exactly as a
  * forged JWT fails Firebase's RSA check); only the issuer is local.
  * Everything DOWNSTREAM of the decode — the role lookups of
  * `verifyRole` (index.js:70-89) and `verifyAdmin` (:115-129) against
  * the live users table, and every 401/403 shape — is dataflow and
  * lives in [[RestServe]].
  *
  * Scale note: verification is a pure per-request HMAC over a
  * dozen-byte payload — no store read, no shared state — so the auth
  * gate adds zero Spark work and parallelizes with the server's
  * executor; only the ROLE checks read (one key-pruned point lookup,
  * the same class as the routes' own guards).
  */
object GraftAuth {
  private val Alg = "HmacSHA256"

  private def b64(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  private def hmac(secret: String, payload: String): Array[Byte] = {
    val mac = Mac.getInstance(Alg)
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), Alg))
    mac.doFinal(payload.getBytes(UTF_8))
  }

  /** Issue a token asserting `email` under `secret`. */
  def token(secret: String, email: String): String =
    b64(email.getBytes(UTF_8)) + "." + b64(hmac(secret, email))

  /** Verify and decode: Some(email) iff the signature matches under
    * `secret`. Tampered payloads, forged signatures, and malformed
    * base64 all answer None (the middleware's 403,
    * index.js:104-108). */
  def verify(secret: String, tok: String): Option[String] =
    tok.split("\\.", 2) match {
      case Array(p, s) =>
        try {
          val email = new String(Base64.getUrlDecoder.decode(p), UTF_8)
          val got = Base64.getUrlDecoder.decode(s)
          // MessageDigest.isEqual is constant-time: a byte-by-byte
          // short-circuit compare would leak signature prefixes.
          if (MessageDigest.isEqual(hmac(secret, email), got)) Some(email)
          else None
        } catch { case _: IllegalArgumentException => None }
      case _ => None
    }
}
