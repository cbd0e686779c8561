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

  /** Issue a token asserting `email` under `secret`, optionally
    * expiring at `expEpochSec` (Firebase ID tokens always carry `exp`;
    * a token without one never expires — the spec/bench convenience).
    * The expiry rides INSIDE the MAC'd payload (`email\nexp`), so it
    * can no more be stripped or extended than the email can. */
  def token(secret: String, email: String, expEpochSec: Option[Long] = None): String = {
    // The newline is the payload's field separator; no identity
    // provider issues an email containing one.
    require(!email.contains("\n"), "email cannot contain a newline")
    val payload = expEpochSec.fold(email)(e => email + "\n" + e)
    b64(payload.getBytes(UTF_8)) + "." + b64(hmac(secret, payload))
  }

  /** Verify and decode: Some(email) iff the signature matches under
    * `secret` AND any embedded expiry is still in the future at
    * `nowEpochSec`. Tampered payloads, forged signatures, malformed
    * base64, and expired tokens all answer None — Firebase's
    * verifyIdToken throws on each, and the middleware maps every
    * throw to the one 403 (index.js:104-108). */
  def verify(secret: String, tok: String,
             nowEpochSec: Long = System.currentTimeMillis() / 1000L): Option[String] =
    tok.split("\\.", 2) match {
      case Array(p, s) =>
        try {
          val payload = new String(Base64.getUrlDecoder.decode(p), UTF_8)
          val got = Base64.getUrlDecoder.decode(s)
          // MessageDigest.isEqual is constant-time: a byte-by-byte
          // short-circuit compare would leak signature prefixes.
          if (!MessageDigest.isEqual(hmac(secret, payload), got)) None
          else payload.split("\n", 2) match {
            case Array(email, exp) =>
              // A MAC-valid payload with a malformed exp is still an
              // invalid token (None), never a crash.
              exp.toLongOption.filter(_ > nowEpochSec).map(_ => email)
            case _ => Some(payload)
          }
        } catch { case _: IllegalArgumentException => None }
      case _ => None
    }
}
