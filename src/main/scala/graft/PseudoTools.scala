package graft

import graft.operators.Crypto

/** Pseudonymization CLI (reference: `logprep pseudo` command set,
  * util/pseudo/commands/{generate_keys,pseudonymize,depseudonymize}.py):
  *
  *   runMain graft.PseudoTools generate [bits] [-f basename]
  *     → `<basename>.key` (PKCS#8 PEM private) + `<basename>.crt`
  *       (public PEM), or both printed without -f.
  *   runMain graft.PseudoTools pseudonymize <pub.crt> [<pub2.crt>] <string>
  *     → `<sha256-hex> <token>`: the pseudonym the processor writes and
  *       the encrypted origin. With two public keys the token composes
  *       analyst-then-depseudo (the dual-key mode — Crypto scaladoc).
  *   runMain graft.PseudoTools depseudonymize <priv.key> [<priv2.key>] <token>
  *     → the original string (keys in reverse wrap order).
  */
object PseudoTools {

  def generate(bits: Int): (String, String) = {
    val kp = Crypto.generateRsaKeyPair(bits)
    (Crypto.privateKeyPem(kp), Crypto.publicKeyPem(kp))
  }

  def pseudonymize(value: String, publicKeyPems: Seq[String]): (String, String) = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(value.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val token = publicKeyPems.foldLeft(value) { (acc, pem) =>
      Crypto.encrypt(acc, Crypto.publicKeyDerFromPem(pem))
    }
    (digest, token)
  }

  def depseudonymize(token: String, privateKeyPems: Seq[String]): String =
    privateKeyPems.foldLeft(token) { (acc, pem) =>
      Crypto.decrypt(acc, Crypto.privateKeyDerFromPem(pem))
    }

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")

  def main(args: Array[String]): Unit = args.toList match {
    case "generate" :: rest =>
      val file = rest.sliding(2).collectFirst { case List("-f", f) => f }
      // drop the "-f <basename>" pair before reading the key size, or
      // the basename would shadow it
      val bits = rest.zipWithIndex.filterNot { case (a, i) =>
        a == "-f" || (i > 0 && rest(i - 1) == "-f")
      }.map(_._1).headOption.flatMap(_.toIntOption).getOrElse(2048)
      val (priv, pub) = generate(bits)
      file match {
        case Some(f) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(f + ".key"),
            priv.getBytes("UTF-8"))
          java.nio.file.Files.write(java.nio.file.Paths.get(f + ".crt"),
            pub.getBytes("UTF-8"))
        case None => println(priv); println(pub)
      }
    case "pseudonymize" :: rest if rest.length >= 2 =>
      val (digest, token) = pseudonymize(rest.last, rest.init.map(read))
      println(s"$digest $token")
    case "depseudonymize" :: rest if rest.length >= 2 =>
      try println(depseudonymize(rest.last, rest.init.map(read)))
      catch {
        case e: Exception =>
          System.err.println(s"Error: ${e.getMessage}")
          sys.exit(1)
      }
    case _ =>
      System.err.println(
        "usage: graft.PseudoTools generate [bits] [-f basename] | " +
          "pseudonymize <pub.crt>... <string> | " +
          "depseudonymize <priv.key>... <token>")
      sys.exit(2)
  }
}
