package graft.operators

import java.security.{KeyPair, KeyPairGenerator, SecureRandom}
import java.security.spec.X509EncodedKeySpec
import javax.crypto.{Cipher, KeyGenerator}
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import java.util.Base64

/** Hybrid encryption for the pseudonymizer's mapping stream — the GDPR
  * depseudonymization path (reference: dual-key hybrid CTR/GCM encrypter,
  * logprep/util/pseudo/encrypter.py; mode config
  * processor/pseudonymizer/processor.py:62-120). JCA implementation:
  * fresh AES-256 session key per value, AES-GCM over the plaintext,
  * RSA-OAEP over the session key (the "analyst" public key; the
  * reference's second "depseudo" key wraps once more — same shape,
  * compose [[encrypt]] twice with two key pairs for that mode).
  *
  * Wire format (all base64, ':'-joined): rsa(aes_key) : gcm_iv : ciphertext.
  * Encryption is nondeterministic by construction (fresh key + IV) — the
  * engine exposes it only on the side-output mapping stream, never in an
  * oracle-checked path, and the UDF is marked nondeterministic so
  * Catalyst won't re-execute or reorder it.
  */
object Crypto {

  def generateRsaKeyPair(bits: Int = 2048): KeyPair = {
    val kpg = KeyPairGenerator.getInstance("RSA")
    kpg.initialize(bits)
    kpg.generateKeyPair()
  }

  /** Encrypt with a fresh AES-256-GCM session key wrapped under RSA-OAEP. */
  def encrypt(plaintext: String, rsaPublicKeyDer: Array[Byte]): String = {
    val pub = java.security.KeyFactory.getInstance("RSA")
      .generatePublic(new X509EncodedKeySpec(rsaPublicKeyDer))
    val kg = KeyGenerator.getInstance("AES")
    kg.init(256)
    val aesKey = kg.generateKey()
    val iv = new Array[Byte](12)
    new SecureRandom().nextBytes(iv)
    val aes = Cipher.getInstance("AES/GCM/NoPadding")
    aes.init(Cipher.ENCRYPT_MODE, aesKey, new GCMParameterSpec(128, iv))
    val ct = aes.doFinal(plaintext.getBytes("UTF-8"))
    val rsa = Cipher.getInstance("RSA/ECB/OAEPWithSHA-256AndMGF1Padding")
    rsa.init(Cipher.ENCRYPT_MODE, pub)
    val wrappedKey = rsa.doFinal(aesKey.getEncoded)
    val b64 = Base64.getEncoder
    Seq(wrappedKey, iv, ct).map(b64.encodeToString).mkString(":")
  }

  // ---- PEM helpers for the pseudo CLI (reference util/pseudo/keygenerator) ----

  def privateKeyPem(kp: KeyPair): String =
    pemWrap("PRIVATE KEY", kp.getPrivate.getEncoded) // PKCS#8
  def publicKeyPem(kp: KeyPair): String =
    pemWrap("PUBLIC KEY", kp.getPublic.getEncoded)   // X.509 SubjectPublicKeyInfo

  private def pemWrap(header: String, der: Array[Byte]): String = {
    val b64 = Base64.getMimeEncoder(64, "\n".getBytes("UTF-8")).encodeToString(der)
    s"-----BEGIN $header-----\n$b64\n-----END $header-----\n"
  }

  private def pemDer(text: String, header: String): Array[Byte] = {
    val re = ("(?s)-----BEGIN " + header + "-----(.*?)-----END " + header + "-----").r
    val body = re.findFirstMatchIn(text).getOrElse(throw new IllegalArgumentException(
      s"no 'BEGIN $header' PEM block")).group(1)
    Base64.getMimeDecoder.decode(body.replaceAll("\\s", ""))
  }

  def publicKeyDerFromPem(pemText: String): Array[Byte] = pemDer(pemText, "PUBLIC KEY")
  def privateKeyDerFromPem(pemText: String): Array[Byte] = pemDer(pemText, "PRIVATE KEY")

  /** Decrypt (depseudonymization tooling / tests). */
  def decrypt(token: String, rsaPrivateKeyDer: Array[Byte]): String = {
    val priv = java.security.KeyFactory.getInstance("RSA")
      .generatePrivate(new java.security.spec.PKCS8EncodedKeySpec(rsaPrivateKeyDer))
    val Array(wk, iv, ct) = token.split(":").map(Base64.getDecoder.decode)
    val rsa = Cipher.getInstance("RSA/ECB/OAEPWithSHA-256AndMGF1Padding")
    rsa.init(Cipher.DECRYPT_MODE, priv)
    val aesKey = new SecretKeySpec(rsa.doFinal(wk), "AES")
    val aes = Cipher.getInstance("AES/GCM/NoPadding")
    aes.init(Cipher.DECRYPT_MODE, aesKey, new GCMParameterSpec(128, iv))
    new String(aes.doFinal(ct), "UTF-8")
  }
}
