package graft

import javax.security.sasl.AuthenticationException

/** HiveServer2 CUSTOM authentication provider validating the SAME
  * HMAC tokens [[GraftAuth]] mints for the HTTP façade — the closure
  * of the live-view security boundary (r10 verdict #3): published
  * `global_temp.live_*` views are context-visible, so an armed façade
  * with an OPEN Thrift side would let JDBC bypass the HTTP middleware
  * chain. HiveServer2's own auth layer is the right place to gate the
  * wire: `hive.server2.authentication=CUSTOM` +
  * `hive.server2.custom.authentication.class=graft.GraftThriftAuth`
  * makes the Thrift PLAIN/SASL handshake call [[Authenticate]] per
  * connection — reject throws, and the JDBC client sees the standard
  * SASL failure before any session (or query) exists.
  *
  * Contract: the JDBC PASSWORD carries the bearer token; the username
  * must equal the token's embedded identity (the email GraftAuth
  * signed). Tampered/forged/expired tokens fail exactly as they fail
  * the HTTP 403 path — one verifier, two wires. The verifying secret
  * reaches this class through the `graft.auth.secret` system property
  * (HiveServer2 instantiates the provider reflectively inside the same
  * JVM; ThriftServe sets the property before the server starts). An
  * unset secret fails CLOSED: with auth configured on but no secret to
  * verify against, every connection is rejected rather than silently
  * admitted. */
final class GraftThriftAuth extends
    org.apache.hive.service.auth.PasswdAuthenticationProvider {

  override def Authenticate(user: String, password: String): Unit = {
    val secret = sys.props.get(GraftThriftAuth.SecretProp)
      .getOrElse(throw new AuthenticationException(
        "server misconfiguration: no verification secret — failing closed"))
    GraftAuth.verify(secret, password) match {
      case Some(email) if email == user => () // authenticated
      case Some(_) => throw new AuthenticationException(
        "token identity does not match the presented username")
      case None => throw new AuthenticationException(
        "invalid or expired token")
    }
  }
}

object GraftThriftAuth {
  /** In-JVM channel to the reflectively-constructed provider. */
  val SecretProp = "graft.auth.secret"
}
