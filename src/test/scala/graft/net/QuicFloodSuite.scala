package graft.net

import java.net.InetSocketAddress
import java.nio.ByteBuffer
import java.nio.channels.DatagramChannel
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Flow-control-bound tests for the QUIC-subset transport: a hostile peer
  * must not be able to grow endpoint memory without limit (the bound real
  * QUIC gets from MAX_STREAM_DATA / MAX_STREAMS). Lives in `graft.net` to
  * craft raw frames against a live connection's cid.
  */
class QuicFloodSuite extends AnyFunSuite {

  /** CRYPTO-VALID hostile STREAM datagram: the data plane is sealed
    * under initial-derived space keys (QuicLite data-plane protection),
    * and those keys are PUBLICLY derivable from the cid — so a hostile
    * peer can always speak the protocol, and the flow-control caps must
    * bound it anyway (the claim these tests pin). Layout `handle`
    * parses: type(1) cid(8) maskedPkt(8) len(2) sealed. */
  private def streamFrame(cid: Long, pkt: Long, streamId: Long, offset: Long,
                          data: Array[Byte]): ByteBuffer = {
    val dcid = ByteBuffer.allocate(8).putLong(cid).array()
    val k = QuicInitialCrypto.spaceKeys(
      QuicInitialCrypto.initialSecrets(dcid)._1, "graft data") // client role
    val plain = ByteBuffer.allocate(8 + 8 + 1 + 2 + data.length)
      .putLong(streamId).putLong(offset).put(0.toByte)
      .putShort(data.length.toShort).put(data).array()
    val aad = ByteBuffer.allocate(17)
      .put(3.toByte).putLong(cid).putLong(pkt).array()
    val sealedBytes = QuicInitialCrypto.seal(k, pkt, aad, plain)
    val mask = QuicInitialCrypto.hpMaskWide(k.hp, sealedBytes.take(16))
    var m = 0L
    (0 until 8).foreach(i => m = (m << 8) | (mask(1 + i) & 0xffL))
    val b = ByteBuffer.allocate(1 + 8 + 8 + 2 + sealedBytes.length)
    b.put(3.toByte).putLong(cid).putLong(pkt ^ m)
      .putShort(sealedBytes.length.toShort).put(sealedBytes)
    b.flip(); b
  }

  /** CRYPTO-VALID INITIAL for `cid` (sealed under the client initial
    * keys, pn 0 header-protected) — the datagram a protocol-speaking
    * flood source sends to mint server-side connection state. */
  private def initialFrame(cid: Long, domain: String): ByteBuffer = {
    val dcid = ByteBuffer.allocate(8).putLong(cid).array()
    val k = QuicInitialCrypto.keys(QuicInitialCrypto.initialSecrets(dcid)._1)
    val aad = ByteBuffer.allocate(10).put(1.toByte).putLong(cid).put(0.toByte).array()
    val sealedBytes = QuicInitialCrypto.seal(k, 0L, aad, domain.getBytes(UTF_8))
    val mask = QuicInitialCrypto.hpMask(k.hp, sealedBytes.take(16))
    val b = ByteBuffer.allocate(1 + 8 + 1 + 2 + sealedBytes.length)
    b.put(1.toByte).putLong(cid).put((0 ^ mask(1)).toByte)
      .putShort(sealedBytes.length.toShort).put(sealedBytes)
    b.flip(); b
  }

  test("INITIAL flood is capped at MaxConnections; idle sweep frees the table") {
    // Each distinct-cid INITIAL mints a server-side Connection — without
    // a cap the conns map is an unbounded-memory DoS from a spoofed
    // source. Beyond the cap new INITIALs are dropped STATELESSLY; the
    // RFC 9000 idle timeout then discards the flood's half-open state,
    // and a legitimate client lands afterwards.
    val prevCap = QuicLite.MaxConnections
    val prevIdle = QuicLite.IdleTimeoutMs
    QuicLite.MaxConnections = 8
    QuicLite.IdleTimeoutMs = 300
    val server = QuicLite.endpoint()
    val gun = DatagramChannel.open()
    try {
      server.bind("cap.test")
      val target = new InetSocketAddress("127.0.0.1", server.port)
      (1 to 200).foreach(i => gun.send(initialFrame(5000L + i, "cap.test"), target))
      Thread.sleep(200) // drain the receive loop
      val grown = server.conns.size()
      assert(grown <= 8, s"connection table grew to $grown under the flood")
      assert(grown > 0, "flood never reached the endpoint (test setup)")
      // idle sweep: the half-open flood state ages out...
      Thread.sleep(700) // > IdleTimeoutMs + sweep period
      assert(server.conns.size() == 0,
        s"idle sweep left ${server.conns.size()} flood connections")
      // restore the production idle window BEFORE the legitimate
      // exchange — a 300 ms window could race a slow scheduler
      QuicLite.IdleTimeoutMs = prevIdle
      // ...and a legitimate handshake + stream succeeds afterwards
      val client = QuicLite.endpoint()
      try {
        val conn = client.connect("127.0.0.1", server.port, "cap.test",
          timeoutMs = 5000)
        val st = conn.openStream()
        st.write("after the flood".getBytes(UTF_8))
        val inbound = server.bind("cap.test").accept(timeoutMs = 5000)
          .getOrElse(fail("no stream accepted"))
        assert(new String(inbound.readAll(), UTF_8) == "after the flood")
      } finally client.close()
    } finally {
      gun.close(); server.close()
      QuicLite.MaxConnections = prevCap
      QuicLite.IdleTimeoutMs = prevIdle
    }
  }

  test("far-offset frame spray trips the reassembly cap and fails the connection") {
    val prevCap = QuicLite.MaxPendingBytes
    QuicLite.MaxPendingBytes = 64 * 1024 // UDP drops most of a fast spray
    val server = QuicLite.endpoint()
    val client = QuicLite.endpoint()
    val gun = DatagramChannel.open()
    try {
      server.bind("flood.test")
      val conn = client.connect("127.0.0.1", server.port, "flood.test")
      val target = new InetSocketAddress("127.0.0.1", server.port)
      // spray 1 KiB frames at disjoint far offsets that can never become
      // contiguous; the per-stream cap (16 MiB) must fail the server-side
      // connection long before memory matters
      val chunk = new Array[Byte](1024)
      var off = 1L << 20
      var pkt = 1000L
      var i = 0
      val serverConn = {
        // the server registered the connection under the SAME cid
        var c: QuicLite.Connection = null
        val deadline = System.currentTimeMillis() + 2000
        while (c == null && System.currentTimeMillis() < deadline) {
          c = server.conns.get(conn.cid)
          if (c == null) Thread.sleep(10)
        }
        assert(c != null, "server connection not established")
        c
      }
      while (i < 2000 && serverConn.failure.isEmpty) {
        gun.send(streamFrame(conn.cid, pkt, 0L, off, chunk), target)
        off += 2048 // gap after every frame: never contiguous
        pkt += 1
        i += 1
        if (i % 50 == 0) Thread.sleep(5) // let the receive loop drain
      }
      val deadline = System.currentTimeMillis() + 3000
      while (serverConn.failure.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(serverConn.failure.exists(_.contains("flow-control violation")),
        s"connection not failed after $i frames: ${serverConn.failure}")
    } finally {
      QuicLite.MaxPendingBytes = prevCap
      gun.close(); server.close(); client.close()
    }
  }

  test("in-order no-FIN spray trips the total-stream-size cap") {
    // the contiguous prefix is held until consumed, so a peer streaming
    // in-order frames forever (never FINing) must hit the
    // MAX_STREAM_DATA-style total bound, not grow `assembled` to OOM
    val prevCap = QuicLite.MaxStreamBytes
    QuicLite.MaxStreamBytes = 64 * 1024
    val server = QuicLite.endpoint()
    val client = QuicLite.endpoint()
    val gun = DatagramChannel.open()
    try {
      server.bind("inorder.test")
      val conn = client.connect("127.0.0.1", server.port, "inorder.test")
      val target = new InetSocketAddress("127.0.0.1", server.port)
      val serverConn = {
        var c: QuicLite.Connection = null
        val deadline = System.currentTimeMillis() + 2000
        while (c == null && System.currentTimeMillis() < deadline) {
          c = server.conns.get(conn.cid)
          if (c == null) Thread.sleep(10)
        }
        assert(c != null, "server connection not established")
        c
      }
      val chunk = new Array[Byte](1024)
      var off = 0L
      var pkt = 90000L
      var i = 0
      while (i < 2000 && serverConn.failure.isEmpty) {
        gun.send(streamFrame(conn.cid, pkt, 0L, off, chunk), target)
        off += chunk.length // perfectly contiguous, never FIN
        pkt += 1; i += 1
        if (i % 50 == 0) Thread.sleep(5)
      }
      val deadline = System.currentTimeMillis() + 3000
      while (serverConn.failure.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(serverConn.failure.exists(_.contains("flow-control violation")),
        s"connection not failed after $i in-order frames: ${serverConn.failure}")
    } finally {
      QuicLite.MaxStreamBytes = prevCap
      gun.close(); server.close(); client.close()
    }
  }

  test("stream-id flood trips the per-connection stream cap") {
    val prevCap = QuicLite.MaxStreamsPerConn
    QuicLite.MaxStreamsPerConn = 64
    val server = QuicLite.endpoint()
    val client = QuicLite.endpoint()
    val gun = DatagramChannel.open()
    try {
      server.bind("manystreams.test")
      val conn = client.connect("127.0.0.1", server.port, "manystreams.test")
      val target = new InetSocketAddress("127.0.0.1", server.port)
      val serverConn = {
        var c: QuicLite.Connection = null
        val deadline = System.currentTimeMillis() + 2000
        while (c == null && System.currentTimeMillis() < deadline) {
          c = server.conns.get(conn.cid)
          if (c == null) Thread.sleep(10)
        }
        assert(c != null, "server connection not established")
        c
      }
      val payload = "x".getBytes(UTF_8)
      var sid = 0L
      var pkt = 50000L
      while (sid < 4L * 64 * 4 && serverConn.failure.isEmpty) {
        gun.send(streamFrame(conn.cid, pkt, sid, 0L, payload), target)
        sid += 4; pkt += 1
        if (sid % 40 == 0) Thread.sleep(5)
      }
      val deadline = System.currentTimeMillis() + 3000
      while (serverConn.failure.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(serverConn.failure.exists(_.contains("flow-control violation")),
        s"connection not failed after ${sid / 4} streams: ${serverConn.failure}")
      assert(serverConn.streams.size() <= QuicLite.MaxStreamsPerConn + 1,
        s"stream map kept growing: ${serverConn.streams.size()}")
    } finally {
      QuicLite.MaxStreamsPerConn = prevCap
      gun.close(); server.close(); client.close()
    }
  }
}
