package graft.net

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9001 Initial key schedule + packet protection. The derivation
  * test pins the Appendix A.1 vectors (QUIC v1, DCID
  * 0x8394c8f03e515708) — an independent implementation reproducing the
  * published constants verifies salt, HKDF, and the Expand-Label
  * encoding in one shot; the remaining tests cover the AEAD/header
  * protection roundtrip and tamper rejection, which the vectors alone
  * would not.
  */
class QuicInitialCryptoSuite extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def h(b: Array[Byte]): String = QuicInitialCrypto.toHex(b)

  private val dcid = hex("8394c8f03e515708")

  test("RFC 9001 A.1: initial secrets and client/server keys") {
    val (cs, ss) = QuicInitialCrypto.initialSecrets(dcid)
    assert(h(cs) ==
      "c00cf151ca5be075ed0ebfb5c80323c42d6b7db67881289af4008f1f6c357aea")
    assert(h(ss) ==
      "3c199828fd139efd216c155ad844cc81fb82fa8d7446fa7d78be803acdda951b")
    val ck = QuicInitialCrypto.keys(cs)
    assert(h(ck.key) == "1f369613dd76d5467730efcbe3b1a22d")
    assert(h(ck.iv) == "fa044b2f42a3fd3b46fb255c")
    assert(h(ck.hp) == "9f50449e04a0e810283a1e9933adedd2")
    val sk = QuicInitialCrypto.keys(ss)
    assert(h(sk.key) == "cf3a5331653c364c88f0f379b6067e37")
    assert(h(sk.iv) == "0ac1493ca1905853b0bba03e")
    assert(h(sk.hp) == "c206b8d9b9f0f37644430b490eeaa314")
  }

  test("seal/open roundtrip with header AAD and packet-number nonce") {
    val (cs, _) = QuicInitialCrypto.initialSecrets(dcid)
    val k = QuicInitialCrypto.keys(cs)
    val header = hex("c300000001088394c8f03e5157080000449e00000002")
    val payload = ("hello initial " * 10).getBytes("US-ASCII")
    val sealed_ = QuicInitialCrypto.seal(k, 2L, header, payload)
    assert(sealed_.length == payload.length + 16) // 16-byte GCM tag
    assert(!sealed_.startsWith(payload.take(8)), "payload left in clear")
    val opened = QuicInitialCrypto.open(k, 2L, header, sealed_)
    assert(opened.sameElements(payload))
  }

  test("tampered ciphertext, header, or packet number is rejected") {
    val (cs, _) = QuicInitialCrypto.initialSecrets(dcid)
    val k = QuicInitialCrypto.keys(cs)
    val header = hex("c0000000010800010203040506070000449e00000001")
    val sealed_ = QuicInitialCrypto.seal(k, 1L, header, "payload".getBytes)
    def rejects(f: => Array[Byte]): Unit =
      intercept[javax.crypto.AEADBadTagException](f)
    val flipped = sealed_.clone(); flipped(0) = (flipped(0) ^ 1).toByte
    rejects(QuicInitialCrypto.open(k, 1L, header, flipped))
    val badHeader = header.clone(); badHeader(2) = 9
    rejects(QuicInitialCrypto.open(k, 1L, badHeader, sealed_))
    rejects(QuicInitialCrypto.open(k, 2L, header, sealed_)) // wrong pn → wrong nonce
  }

  test("wire capture: INITIAL carries the domain sealed, recoverable per RFC observer model") {
    // a raw UDP socket plays "server": capture the client's INITIAL off
    // the wire, assert the domain is NOT in cleartext anywhere in the
    // datagram, then recover it the way any on-path observer can under
    // RFC 9001 (initial keys derive from the public salt + the DCID) —
    // proving the framing is real protection, not scrambling
    val sniffer = java.nio.channels.DatagramChannel.open()
      .bind(new java.net.InetSocketAddress("127.0.0.1", 0))
    val port = sniffer.getLocalAddress
      .asInstanceOf[java.net.InetSocketAddress].getPort
    val ep = QuicLite.endpoint()
    try {
      val t = new Thread(() =>
        try ep.connect("127.0.0.1", port, "secret.example", timeoutMs = 400)
        catch { case _: Throwable => () })
      t.start()
      val buf = java.nio.ByteBuffer.allocate(2048)
      sniffer.receive(buf)
      t.join(3000)
      buf.flip()
      val pkt = new Array[Byte](buf.remaining()); buf.get(pkt)
      val domain = "secret.example".getBytes("UTF-8")
      assert(!pkt.sliding(domain.length).exists(_.sameElements(domain)),
        "domain visible in cleartext on the wire")
      // observer recovery: type(1) | cid(8) | pn'(1) | len(2) | sealed
      assert(pkt(0) == 1, "not an INITIAL")
      val bb = java.nio.ByteBuffer.wrap(pkt, 1, pkt.length - 1)
      val cid = bb.getLong
      val pnProt = bb.get()
      val sealedSni = new Array[Byte](bb.getShort & 0xffff); bb.get(sealedSni)
      val dcid = java.nio.ByteBuffer.allocate(8).putLong(cid).array()
      val ck = QuicInitialCrypto.keys(QuicInitialCrypto.initialSecrets(dcid)._1)
      val mask = QuicInitialCrypto.hpMask(ck.hp, sealedSni.take(16))
      val pn = (pnProt ^ mask(1)).toByte
      val aad = java.nio.ByteBuffer.allocate(10)
        .put(1.toByte).putLong(cid).put(pn).array()
      val recovered = QuicInitialCrypto.open(ck, pn.toLong & 0xff, aad, sealedSni)
      assert(new String(recovered, "UTF-8") == "secret.example")
    } finally { sniffer.close(); ep.close() }
  }

  test("wire capture: STREAM payloads and frame metadata travel sealed (relay MITM)") {
    // a UDP relay sits between client and server, recording every
    // datagram both ways; after a request/reply round-trip, no captured
    // datagram may contain the application payload in cleartext
    import java.net.InetSocketAddress
    import java.nio.channels.DatagramChannel
    val server = QuicLite.endpoint()
    val handle = server.bind("relay.test")
    val relay = DatagramChannel.open()
      .bind(new InetSocketAddress("127.0.0.1", 0))
    val relayPort = relay.getLocalAddress.asInstanceOf[InetSocketAddress].getPort
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val serverAddr = new InetSocketAddress("127.0.0.1", server.port)
    @volatile var clientAddr: java.net.SocketAddress = null
    val relayThread = new Thread(() => {
      val buf = java.nio.ByteBuffer.allocate(4096)
      try while (!stop.get()) {
        buf.clear()
        val from = relay.receive(buf)
        buf.flip()
        val pkt = new Array[Byte](buf.remaining()); buf.get(pkt)
        captured.add(pkt)
        val fromServer = from.asInstanceOf[InetSocketAddress].getPort == server.port
        if (fromServer) { if (clientAddr != null) relay.send(java.nio.ByteBuffer.wrap(pkt), clientAddr) }
        else { clientAddr = from; relay.send(java.nio.ByteBuffer.wrap(pkt), serverAddr) }
      } catch { case _: Throwable => () }
    })
    relayThread.start()
    val client = QuicLite.endpoint()
    try {
      val conn = client.connect("127.0.0.1", relayPort, "relay.test")
      val secret = "TOPSECRET-payload-7f3a" * 8
      val st = conn.openStream()
      st.write(secret.getBytes("UTF-8"))
      val got = handle.accept(5000).map(s => new String(s.readAll(), "UTF-8"))
      assert(got.contains(secret), "relay round-trip failed")
      val needle = secret.take(22).getBytes("UTF-8")
      import scala.jdk.CollectionConverters._
      val pkts = captured.asScala.toSeq
      assert(pkts.exists(_.headOption.contains(3.toByte)), "no STREAM captured")
      assert(!pkts.exists(_.sliding(needle.length).exists(_.sameElements(needle))),
        "application payload visible in cleartext on the wire")
    } finally {
      stop.set(true); relay.close(); relayThread.join(2000)
      client.close(); server.close()
    }
  }

  test("header protection is a masked involution and direction-keyed") {
    val (cs, ss) = QuicInitialCrypto.initialSecrets(dcid)
    val ck = QuicInitialCrypto.keys(cs)
    val sample = (0 until 16).map(_.toByte).toArray
    val mask = QuicInitialCrypto.hpMask(ck.hp, sample)
    assert(mask.length == 5)
    val (fb, pn) = QuicInitialCrypto.protectHeader(0xc3.toByte,
      Array[Byte](0, 0, 0, 2), mask)
    // long-header: only the low 4 bits of the first byte may change
    assert((fb & 0xf0) == 0xc0)
    val (fb2, pn2) = QuicInitialCrypto.protectHeader(fb, pn, mask)
    assert(fb2 == 0xc3.toByte && pn2.sameElements(Array[Byte](0, 0, 0, 2)))
    // a different direction's hp key yields a different mask
    val smask = QuicInitialCrypto.hpMask(QuicInitialCrypto.keys(ss).hp, sample)
    assert(!mask.sameElements(smask))
  }
}
