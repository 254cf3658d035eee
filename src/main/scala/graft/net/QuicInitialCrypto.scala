package graft.net

import javax.crypto.{Cipher, Mac}
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** RFC 9001 Initial packet protection, pure JDK — the key-schedule half
  * of the packet-protection divergence documented in [[QuicLite]]. The
  * reference's transport is rustls-backed quinn
  * (/root/reference/subsystem/net-quinn/src/lib.rs), where every packet
  * is protected per RFC 9001. Initial packets are special: their keys
  * derive from the client's Destination Connection ID and a PUBLIC salt
  * (RFC 9001 §5.2) — no TLS secrets involved — so a JDK-only stack CAN
  * implement them exactly: HKDF is two HMAC-SHA256 primitives (RFC
  * 5869), packet protection is AES-128-GCM with the header as AAD
  * (§5.3), and header protection is a 5-byte mask from one AES-ECB
  * block over a ciphertext sample (§5.4). This module closes that part
  * of the gap; what REMAINS out of reach is Handshake/1-RTT protection,
  * whose keys come from TLS handshake traffic secrets the JDK
  * `SSLEngine` does not export — stream payloads keep riding
  * [[QuicTls]] for confidentiality, exactly as documented there.
  *
  * Initial protection is deliberately derivable by any on-path observer
  * (the salt is public): RFC 9001 frames it as ossification armor, not
  * secrecy. Implementing it buys wire-format parity (protected first
  * byte, packet numbers, and INITIAL payload — where the SNI-equivalent
  * domain field sits) and the exact key schedule a native TLS layer
  * would extend to the later spaces.
  */
object QuicInitialCrypto {

  /** QUIC v1 initial salt (RFC 9001 §5.2 — a public constant). */
  private val InitialSalt: Array[Byte] =
    hex("38762cf7f55934b34d179ae6a4c80cadccbb7f0a")

  final case class Keys(key: Array[Byte], iv: Array[Byte], hp: Array[Byte])

  // ---- HKDF (RFC 5869) over HMAC-SHA256 ----

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data)
  }

  // per-thread reusable Cipher instances: Cipher.getInstance is a JCE
  // provider lookup + allocation — measurable at per-datagram rates on
  // the transport hot path; init() re-keys the cached instance per call
  private val gcmCipher = ThreadLocal.withInitial[Cipher](
    () => Cipher.getInstance("AES/GCM/NoPadding"))
  private val ecbCipher = ThreadLocal.withInitial[Cipher](
    () => Cipher.getInstance("AES/ECB/NoPadding"))

  def hkdfExtract(salt: Array[Byte], ikm: Array[Byte]): Array[Byte] =
    hmac(salt, ikm)

  def hkdfExpand(prk: Array[Byte], info: Array[Byte], len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var t = Array.emptyByteArray
    var counter = 1
    while (out.size < len) {
      t = hmac(prk, t ++ info ++ Array(counter.toByte))
      out.write(t, 0, t.length)
      counter += 1
    }
    out.toByteArray.take(len)
  }

  /** TLS 1.3 HKDF-Expand-Label (RFC 8446 §7.1): the info wrapper QUIC
    * uses for every derivation, label prefixed with "tls13 ". */
  def hkdfExpandLabel(secret: Array[Byte], label: String, len: Int): Array[Byte] = {
    val full = ("tls13 " + label).getBytes("US-ASCII")
    val info = Array[Byte]((len >> 8).toByte, (len & 0xff).toByte,
      full.length.toByte) ++ full :+ 0.toByte // empty context
    hkdfExpand(secret, info, len)
  }

  /** (client, server) initial secrets from the client's DCID (§5.2). */
  def initialSecrets(dcid: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val initial = hkdfExtract(InitialSalt, dcid)
    (hkdfExpandLabel(initial, "client in", 32),
      hkdfExpandLabel(initial, "server in", 32))
  }

  /** AEAD key / IV / header-protection key for one direction (§5.1). */
  def keys(secret: Array[Byte]): Keys = Keys(
    hkdfExpandLabel(secret, "quic key", 16),
    hkdfExpandLabel(secret, "quic iv", 12),
    hkdfExpandLabel(secret, "quic hp", 16))

  /** Per-packet AEAD nonce: IV xor left-padded packet number (§5.3). */
  def nonce(iv: Array[Byte], packetNumber: Long): Array[Byte] = {
    val n = iv.clone()
    var i = 0
    while (i < 8) {
      n(n.length - 1 - i) = (n(n.length - 1 - i) ^ ((packetNumber >>> (8 * i)) & 0xff)).toByte
      i += 1
    }
    n
  }

  /** AES-128-GCM seal: ciphertext || 16-byte tag, header bytes as AAD. */
  def seal(k: Keys, packetNumber: Long, header: Array[Byte],
           payload: Array[Byte]): Array[Byte] = {
    val c = gcmCipher.get()
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(k.key, "AES"),
      new GCMParameterSpec(128, nonce(k.iv, packetNumber)))
    c.updateAAD(header)
    c.doFinal(payload)
  }

  /** AES-128-GCM open; throws AEADBadTagException on any tamper of
    * ciphertext, tag, header (AAD), or packet number (nonce). */
  def open(k: Keys, packetNumber: Long, header: Array[Byte],
           sealed_ : Array[Byte]): Array[Byte] = {
    val c = gcmCipher.get()
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(k.key, "AES"),
      new GCMParameterSpec(128, nonce(k.iv, packetNumber)))
    c.updateAAD(header)
    c.doFinal(sealed_)
  }

  /** Keys for a transport-specific packet space derived from one
    * direction's initial secret — [[QuicLite]] uses "graft data"
    * (STREAM) and "graft ack" (ACK) spaces so the data plane gets the
    * same AEAD + pn-masking treatment as INITIAL. Initial secrets are
    * publicly derivable (the salt is public), so like QUIC's own
    * Initial space this is ossification armor and tamper/garbage
    * rejection, NOT confidentiality — that rides [[QuicTls]]; real
    * Handshake/1-RTT keys would need TLS traffic secrets the JDK does
    * not export. */
  def spaceKeys(secret: Array[Byte], label: String): Keys =
    keys(hkdfExpandLabel(secret, label, 32))

  /** 5-byte header-protection mask: AES-ECB of a 16-byte ciphertext
    * sample under the hp key (§5.4.1/§5.4.3). */
  def hpMask(hp: Array[Byte], sample: Array[Byte]): Array[Byte] =
    hpBlock(hp, sample).take(5)

  /** Widened 9-byte mask for this transport's fixed 8-byte packet-number
    * field (RFC QUIC pns are ≤4 bytes, so §5.4.1 takes 5) — same single
    * AES-ECB block, more of it used. */
  def hpMaskWide(hp: Array[Byte], sample: Array[Byte]): Array[Byte] =
    hpBlock(hp, sample).take(9)

  private def hpBlock(hp: Array[Byte], sample: Array[Byte]): Array[Byte] = {
    require(sample.length == 16, "header-protection sample must be 16 bytes")
    val c = ecbCipher.get()
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(hp, "AES"))
    c.doFinal(sample)
  }

  /** XOR a packet-number byte sequence with mask bytes 1.. — the pn
    * half of header protection, its own inverse. [[QuicLite]] routes
    * its 1-byte (initial space) and 8-byte (data plane, via
    * [[maskPn64]]) pn fields through this rule. */
  def maskPnBytes(pnBytes: Array[Byte], mask: Array[Byte]): Array[Byte] =
    pnBytes.zipWithIndex.map { case (b, i) => (b ^ mask(1 + i)).toByte }

  /** [[maskPnBytes]] specialised to a big-endian 64-bit pn field with a
    * wide mask (bytes 1..8) — allocation-free for the per-packet path. */
  def maskPn64(pkt: Long, mask: Array[Byte]): Long = {
    var m = 0L
    var i = 0
    while (i < 8) { m = (m << 8) | (mask(1 + i) & 0xffL); i += 1 }
    pkt ^ m
  }

  /** Apply/remove header protection in place (§5.4.1): long-header
    * packets mask the low 4 bits of the first byte and XOR the packet
    * number bytes; the operation is an involution. */
  def protectHeader(firstByte: Byte, pnBytes: Array[Byte],
                    mask: Array[Byte]): (Byte, Array[Byte]) = {
    val fb = (firstByte ^ (mask(0) & 0x0f)).toByte
    (fb, maskPnBytes(pnBytes, mask))
  }

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private[net] def toHex(b: Array[Byte]): String =
    b.map("%02x".format(_)).mkString
}
