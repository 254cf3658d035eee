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
