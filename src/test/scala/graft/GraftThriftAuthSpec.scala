package graft

import javax.security.sasl.AuthenticationException
import org.scalatest.funsuite.AnyFunSuite

/** Unit half of the armed-wire contract (the child-JVM SASL handshake
  * is pinned in ThriftServerSpec): the provider verifies GraftAuth
  * tokens, binds them to the presented username, and fails CLOSED when
  * the secret is unset. */
class GraftThriftAuthSpec extends AnyFunSuite {
  private val secret = "unit-secret"

  private def withSecret[A](s: Option[String])(body: => A): A = {
    val old = sys.props.get(GraftThriftAuth.SecretProp)
    s match {
      case Some(v) => sys.props(GraftThriftAuth.SecretProp) = v
      case None    => sys.props -= GraftThriftAuth.SecretProp
    }
    try body
    finally old match {
      case Some(v) => sys.props(GraftThriftAuth.SecretProp) = v
      case None    => sys.props -= GraftThriftAuth.SecretProp
    }
  }

  test("valid token + matching username authenticates; everything else throws") {
    withSecret(Some(secret)) {
      val p = new GraftThriftAuth
      val tok = GraftAuth.token(secret, "a@graft.io")
      p.Authenticate("a@graft.io", tok) // must not throw
      assertThrows[AuthenticationException](
        p.Authenticate("b@graft.io", tok)) // identity mismatch
      assertThrows[AuthenticationException](
        p.Authenticate("a@graft.io", tok.dropRight(2) + "xx")) // forged MAC
      assertThrows[AuthenticationException](
        p.Authenticate("a@graft.io", GraftAuth.token("wrong-secret", "a@graft.io")))
      assertThrows[AuthenticationException](
        p.Authenticate("a@graft.io", GraftAuth.token(secret, "a@graft.io",
          expEpochSec = Some(1L)))) // expired
    }
  }

  test("no verification secret fails CLOSED, never open") {
    withSecret(None) {
      val p = new GraftThriftAuth
      assertThrows[AuthenticationException](
        p.Authenticate("a@graft.io", GraftAuth.token(secret, "a@graft.io")))
    }
  }
}
