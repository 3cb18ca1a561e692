package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** `logprep pseudo`-equivalent CLI: keygen PEM round-trip, single and
  * dual-key pseudonymize/depseudonymize, and decrypting a token the
  * pseudonymizer's mapping stream actually emitted.
  */
class PseudoToolsSpec extends AnyFunSuite with Matchers {

  test("generate → pseudonymize → depseudonymize round-trip (single key)") {
    val (priv, pub) = PseudoTools.generate(2048)
    priv should include("BEGIN PRIVATE KEY")
    pub should include("BEGIN PUBLIC KEY")
    val (digest, token) = PseudoTools.pseudonymize("secret-user", Seq(pub))
    digest should fullyMatch regex "[0-9a-f]{64}"
    token should not include "secret-user"
    PseudoTools.depseudonymize(token, Seq(priv)) shouldBe "secret-user"
  }

  test("dual-key compose: both private keys needed, in reverse wrap order") {
    val (aPriv, aPub) = PseudoTools.generate(2048)
    val (dPriv, dPub) = PseudoTools.generate(2048)
    val (_, token) = PseudoTools.pseudonymize("10.1.2.3", Seq(aPub, dPub))
    // outermost wrap is the SECOND (depseudo) key
    PseudoTools.depseudonymize(token, Seq(dPriv, aPriv)) shouldBe "10.1.2.3"
    // one key alone cannot recover the plaintext
    PseudoTools.depseudonymize(token, Seq(dPriv)) should not be "10.1.2.3"
    intercept[Exception](PseudoTools.depseudonymize(token, Seq(aPriv)))
  }

  test("pseudonym digest matches the processor's sha256 identifier") {
    val (_, pub) = PseudoTools.generate(2048)
    val (digest, _) = PseudoTools.pseudonymize("value", Seq(pub))
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("value".getBytes("UTF-8")).map("%02x".format(_)).mkString
    digest shouldBe expected
  }

  test("key files written by the CLI load back for decryption") {
    val dir = java.nio.file.Files.createTempDirectory("pseudo").toString
    val base = s"$dir/pair"
    PseudoTools.main(Array("generate", "2048", "-f", base))
    val pub = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base + ".crt")), "UTF-8")
    val priv = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(base + ".key")), "UTF-8")
    val (_, token) = PseudoTools.pseudonymize("from-files", Seq(pub))
    PseudoTools.depseudonymize(token, Seq(priv)) shouldBe "from-files"
  }
}
