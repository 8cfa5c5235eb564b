package graft.server.pg

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.{Mac, SecretKeyFactory}

/** SCRAM-SHA-256 server side (RFC 5802/7677) over javax.crypto — the
  * same flow and verifier format as the reference (pg_auth.go:18-110,
  * verifier "SCRAM-SHA-256$iter:salt$storedKey:serverKey", the
  * PostgreSQL rolpassword layout), so a users table written by the
  * reference authenticates unchanged here.
  */
object Scram {
  case class Verifier(iterations: Int, salt: Array[Byte],
      storedKey: Array[Byte], serverKey: Array[Byte])

  private val b64e = Base64.getEncoder
  private val b64d = Base64.getDecoder

  def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg)
  }
  private def h(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(bytes)

  def saltedPassword(password: String, salt: Array[Byte], iter: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iter, 256)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256").generateSecret(spec).getEncoded
  }

  /** Build a PostgreSQL-format SCRAM verifier for CREATE USER
    * (reference pg_auth SCRAMEncryptPassword equivalent). */
  def encryptPassword(password: String, iter: Int = 4096): String = {
    val salt = new Array[Byte](16)
    new SecureRandom().nextBytes(salt)
    val sp = saltedPassword(password, salt, iter)
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8))
    val storedKey = h(clientKey)
    val serverKey = hmac(sp, "Server Key".getBytes(UTF_8))
    s"SCRAM-SHA-256$$$iter:${b64e.encodeToString(salt)}$$" +
      s"${b64e.encodeToString(storedKey)}:${b64e.encodeToString(serverKey)}"
  }

  def parseVerifier(s: String): Option[Verifier] = s.split('$') match {
    case Array("SCRAM-SHA-256", iterSalt, keys) =>
      (iterSalt.split(':'), keys.split(':')) match {
        case (Array(it, salt), Array(stored, server)) =>
          Some(Verifier(it.toInt, b64d.decode(salt), b64d.decode(stored), b64d.decode(server)))
        case _ => None
      }
    case _ => None
  }

  /** One in-progress SCRAM conversation (server side). */
  final class Conversation(verifier: Verifier) {
    private var clientFirstBare: String = _
    private var serverFirst: String = _
    private var clientNonce: String = _
    private var serverNonce: String = _

    /** client-first-message → server-first-message. */
    def serverFirstMessage(clientFirst: String): String = {
      // gs2 header "n,," then bare message "n=user,r=nonce"
      val bare = clientFirst.split(",", 3).drop(2).mkString(",") match {
        case "" => clientFirst // already bare (defensive)
        case b => b
      }
      clientFirstBare = bare
      clientNonce = bare.split(",").collectFirst { case s if s.startsWith("r=") => s.drop(2) }
        .getOrElse(throw new IllegalArgumentException("SCRAM: missing client nonce"))
      val ext = new Array[Byte](18)
      new SecureRandom().nextBytes(ext)
      serverNonce = clientNonce + b64e.encodeToString(ext)
      serverFirst = s"r=$serverNonce,s=${b64e.encodeToString(verifier.salt)},i=${verifier.iterations}"
      serverFirst
    }

    /** client-final-message → Right(server-final) or Left(error). */
    def verifyClientFinal(clientFinal: String): Either[String, String] = {
      val parts = clientFinal.split(",").map(_.splitAt(2)).toMap.map { case (k, v) => k.take(1) -> v }
      val fields = clientFinal.split(",")
      def field(p: String) = fields.collectFirst { case s if s.startsWith(p) => s.drop(2) }
      val nonce = field("r=").getOrElse("")
      val proof = field("p=").getOrElse("")
      if (nonce != serverNonce) return Left("SCRAM: nonce mismatch")
      val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
      val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof".getBytes(UTF_8)
      val clientSignature = hmac(verifier.storedKey, authMessage)
      val proofBytes = b64d.decode(proof)
      val clientKey = clientSignature.zip(proofBytes).map { case (a, b) => (a ^ b).toByte }
      if (!MessageDigest.isEqual(h(clientKey), verifier.storedKey))
        Left("password authentication failed")
      else
        Right("v=" + b64e.encodeToString(hmac(verifier.serverKey, authMessage)))
    }
  }
}
