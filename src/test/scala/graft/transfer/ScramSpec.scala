package graft.transfer

import org.scalatest.funsuite.AnyFunSuite

/** [[Scram]] primitives against the RFC 7677 §3 canonical exchange (user
  * "user", password "pencil") — byte-exact proof and server-signature
  * values, so the client math is pinned to the published vectors rather
  * than only to our own scripted backend. */
class ScramSpec extends AnyFunSuite {

  private val clientFirstBare = "n=user,r=rOprNGfwEbeRWgbNEkqO"
  private val serverFirst =
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
  private val fullNonce = "rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"

  test("client-final message matches the RFC 7677 test vector exactly") {
    val cf = Scram.clientFinal("pencil", clientFirstBare, serverFirst, fullNonce)
    assert(cf.message ===
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
  }

  test("expected server signature matches the RFC 7677 v= value exactly") {
    val cf = Scram.clientFinal("pencil", clientFirstBare, serverFirst, fullNonce)
    assert(java.util.Base64.getEncoder.encodeToString(cf.serverSignature) ===
      "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("attr parsing tolerates '=' padding inside base64 values") {
    val attrs = Scram.parseAttrs(serverFirst)
    assert(attrs('r') === fullNonce)
    assert(attrs('s') === "W22ZaJ0SNY7soEsUEjb6gQ==")
    assert(attrs('i') === "4096")
  }

  test("a different password fails the proof, not silently") {
    val good = Scram.clientFinal("pencil", clientFirstBare, serverFirst, fullNonce)
    val bad = Scram.clientFinal("pEncil", clientFirstBare, serverFirst, fullNonce)
    assert(good.message !== bad.message)
    assert(!java.util.Arrays.equals(good.serverSignature, bad.serverSignature))
  }

  test("nonces are attr-safe and non-repeating") {
    val ns = Seq.fill(64)(Scram.nonce())
    assert(ns.distinct.size === 64)
    assert(ns.forall(n => !n.contains(',') && n.length >= 20))
  }
}
