package graft.net

import java.net.{InetSocketAddress, SocketAddress}
import java.nio.ByteBuffer
import java.nio.channels.DatagramChannel
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.jdk.CollectionConverters._

/** A userspace QUIC-subset transport over UDP — the S4 network driver
  * (reference subsystem/net-quinn: quinn-backed QUIC listener/dialer,
  * driver.rs:60-136). The JDK ships no QUIC stack, so this implements the
  * RFC 9000 machinery the reference's capability surface actually uses:
  *
  *  - connection IDs demultiplexing many connections over one UDP socket
  *    (endpoint model, lib.rs:155-157);
  *  - a port-shared listener registry with SNI-style domain routing —
  *    connections for an unrouted domain are closed with reason
  *    "unrouted domain" (lib.rs:178-202 `accept_for_domain`);
  *  - bidirectional streams multiplexed per connection, client-initiated
  *    ids 0,4,8,… (accept_bi / open_bi parity, driver.rs:125-135);
  *  - reliable ordered delivery over lossy UDP: per-packet numbers,
  *    immediate ACKs, RTO-based retransmission, offset-keyed reassembly
  *    (the recovery subset of RFC 9002).
  *
  * TLS: the reference rides rustls' QUIC-native crypto (lib.rs:9-27)
  * where the TLS handshake IS the QUIC handshake and every packet is
  * encrypted at the packet layer (RFC 9001). The JDK has no TLS-over-UDP
  * primitive, so this engine layers [[QuicTls]] — JDK `SSLEngine` over
  * each bidirectional stream — on top: stream payloads (the data a user
  * hands the transport) get the full TLS properties (confidentiality,
  * integrity, cert-based peer refusal). The INITIAL space additionally
  * carries REAL RFC 9001 initial protection ([[QuicInitialCrypto]],
  * key schedule vector-tested against RFC 9001 Appendix A.1): the
  * domain field (where a ClientHello SNI would sit) travels AEAD-sealed
  * under the client initial keys with a header-protected packet-number
  * byte, ACCEPT is sealed under the server initial keys, and hostile or
  * forged handshake datagrams fail the tag and are dropped statelessly.
  * The DATA plane gets the same treatment from initial-DERIVED space
  * keys ("graft data" / "graft ack", [[QuicInitialCrypto.spaceKeys]]):
  * STREAM frame metadata (stream id, offset, fin) and payload bytes are
  * AEAD-sealed per packet with masked packet numbers, ACKs likewise,
  * each direction under its own role's keys so (key, nonce) pairs never
  * collide across the two counters. Because initial secrets derive from
  * the public salt + cid, this — like QUIC's own Initial space — is
  * ossification armor plus garbage/tamper rejection, NOT secrecy: real
  * confidentiality rides QuicTls, and true Handshake/1-RTT keys would
  * need the TLS traffic secrets `SSLEngine` does not export. That key
  * provenance is the residual divergence from full RFC 9001, along with
  * the cleartext type byte (this transport demuxes 5 explicit types
  * instead of QUIC's try-keys-then-parse) and the cleartext CLOSE (see
  * `close()`). The packet layout keeps QUIC's shape so a native TLS
  * layer could swap real traffic secrets into the same key schedule
  * without touching stream/recovery logic.
  */
object QuicLite {

  // Packet types (first byte). INITIAL/ACCEPT/CLOSE are the "long header"
  // handshake packets; STREAM/ACK are the 1-RTT data plane.
  private val INITIAL: Byte = 1
  private val ACCEPT: Byte = 2
  private val STREAM: Byte = 3
  private val ACK: Byte = 4
  private val CLOSE: Byte = 5

  /** Conservative payload budget per datagram (QUIC's 1200-byte minimum
    * datagram size, RFC 9000 §14.1); stream data is fragmented to fit. */
  val MaxData = 1100

  private val RtoMillis = 100L
  private val MaxRetries = 12

  /** 8-byte big-endian DCID form of a connection id — the HKDF input for
    * the RFC 9001 initial secrets (QuicInitialCrypto.initialSecrets). */
  private def dcidOf(cid: Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(cid).array()

  /** AAD for an initial-space packet: the cleartext header bytes (type,
    * cid, RAW pn) exactly as they precede the sealed payload on the wire
    * (the pn byte travels header-protected; the AAD uses its true value,
    * so a flipped pn fails the tag like any other header tamper). */
  private def initialAad(tpe: Byte, cid: Long, pn: Byte): Array[Byte] =
    ByteBuffer.allocate(10).put(tpe).putLong(cid).put(pn).array()

  /** AAD for a data-plane packet (STREAM/ACK): type, cid, RAW 64-bit
    * packet number. */
  private def dataAad(tpe: Byte, cid: Long, pkt: Long): Array[Byte] =
    ByteBuffer.allocate(17).put(tpe).putLong(cid).putLong(pkt).array()

  /** Assemble one sealed DATA-plane packet — THE one copy of the
    * seal → mask → frame dance for the 8-byte-pn spaces (STREAM, ACK):
    * `tpe | cid | maskedPn(8) | len(2) | sealed`. */
  private def sealedDataPacket(tpe: Byte, cid: Long, k: QuicInitialCrypto.Keys,
      pkt: Long, plain: Array[Byte]): Array[Byte] = {
    val sealedBytes = QuicInitialCrypto.seal(k, pkt, dataAad(tpe, cid, pkt), plain)
    val mask = QuicInitialCrypto.hpMaskWide(k.hp, sealedBytes.take(16))
    val buf = ByteBuffer.allocate(1 + 8 + 8 + 2 + sealedBytes.length)
    buf.put(tpe).putLong(cid).putLong(QuicInitialCrypto.maskPn64(pkt, mask))
      .putShort(sealedBytes.length.toShort).put(sealedBytes)
    buf.flip()
    val bytes = new Array[Byte](buf.remaining()); buf.get(bytes)
    bytes
  }

  /** Unmask + AEAD-open a DATA-plane packet body positioned after the
    * cid; None on truncation or a failed tag (drop the datagram). */
  private def openDataPacket(tpe: Byte, cid: Long, k: QuicInitialCrypto.Keys,
      buf: ByteBuffer): Option[(Long, ByteBuffer)] = {
    val pktProt = buf.getLong
    val sealedLen = buf.getShort & 0xffff
    if (buf.remaining() < sealedLen || sealedLen < 16) return None
    val sealedBytes = new Array[Byte](sealedLen); buf.get(sealedBytes)
    val mask = QuicInitialCrypto.hpMaskWide(k.hp, sealedBytes.take(16))
    val pkt = QuicInitialCrypto.maskPn64(pktProt, mask)
    try Some((pkt, ByteBuffer.wrap(
      QuicInitialCrypto.open(k, pkt, dataAad(tpe, cid, pkt), sealedBytes))))
    catch { case _: javax.crypto.AEADBadTagException => None }
  }

  /** Same dance for the INITIAL space (1-byte pn, always 0):
    * `tpe | cid | maskedPn(1) | len(2) | sealed`. */
  private def sealedInitialPacket(tpe: Byte, cid: Long,
      k: QuicInitialCrypto.Keys, plain: Array[Byte]): Array[Byte] = {
    val sealedBytes = QuicInitialCrypto.seal(k, 0L, initialAad(tpe, cid, 0), plain)
    val mask = QuicInitialCrypto.hpMask(k.hp, sealedBytes.take(16))
    val buf = ByteBuffer.allocate(1 + 8 + 1 + 2 + sealedBytes.length)
    buf.put(tpe).putLong(cid)
      .put(QuicInitialCrypto.maskPnBytes(Array(0.toByte), mask)(0))
      .putShort(sealedBytes.length.toShort).put(sealedBytes)
    buf.flip()
    val bytes = new Array[Byte](buf.remaining()); buf.get(bytes)
    bytes
  }

  /** Unmask + open an INITIAL-space packet body positioned after the
    * cid; None on truncation or a failed tag. */
  private def openInitialPacket(tpe: Byte, cid: Long,
      k: QuicInitialCrypto.Keys, buf: ByteBuffer): Option[Array[Byte]] = {
    val pnProt = buf.get()
    val sealedLen = buf.getShort & 0xffff
    if (buf.remaining() < sealedLen || sealedLen < 16) return None
    val sealedBytes = new Array[Byte](sealedLen); buf.get(sealedBytes)
    val mask = QuicInitialCrypto.hpMask(k.hp, sealedBytes.take(16))
    val pn = QuicInitialCrypto.maskPnBytes(Array(pnProt), mask)(0)
    try Some(QuicInitialCrypto.open(k, pn.toLong & 0xff,
      initialAad(tpe, cid, pn), sealedBytes))
    catch { case _: javax.crypto.AEADBadTagException => None }
  }

  /** Flow-control bounds — the memory limits real QUIC gets from
    * MAX_STREAM_DATA / MAX_STREAMS; a peer exceeding them has its
    * connection failed. Three knobs: MaxPendingBytes caps out-of-order
    * (not-yet-contiguous) reassembly bytes per stream; MaxStreamsPerConn
    * caps concurrently open streams per connection; MaxStreamBytes caps
    * RETAINED (unconsumed) bytes per stream — an un-FINned in-order
    * spray hits it, while a promptly consumed long-lived stream (the TLS
    * layer's readSome path trims as it goes) can move unlimited total
    * bytes. */
  private[net] var MaxPendingBytes = 16L * 1024 * 1024 // var: tests lower it
  private[net] var MaxStreamsPerConn = 4096 // var: tests lower it
  private[net] var MaxStreamBytes = 64L * 1024 * 1024 // var: tests lower it
  /** Endpoint-level connection-table bounds (RFC 9000 §10.1 idle timeout
    * + an anti-amplification cap): a spoofed-source INITIAL flood creates
    * server-side Connection state per distinct cid, so without a cap the
    * conns map is an unbounded-memory DoS. Beyond MaxConnections, new
    * INITIALs are DROPPED statelessly (a legitimate client retries and
    * lands once idle sweeps free a slot); a SERVER-SIDE connection with
    * no inbound datagram for IdleTimeoutMs is silently discarded
    * (RFC 9000's idle-timeout posture — state vanishes, no close
    * packet; client-side handles are app-managed and never swept). */
  private[net] var MaxConnections = 4096 // var: tests lower it
  private[net] var IdleTimeoutMs = 120000L // var: tests lower it

  final case class QuicError(message: String) extends RuntimeException(message)

  /** One bidirectional stream: outbound writes fragment into STREAM
    * frames; inbound frames reassemble by offset until FIN. Reassembly
    * keeps a contiguous prefix (`assembled`) plus a map of out-of-order
    * frames ahead of it, so readers can consume incrementally
    * ([[readSome]], the TLS layer's handshake path) or whole-payload
    * ([[readAll]]). */
  final class QuicStream private[net] (
      val conn: Connection, val streamId: Long) {
    // frames ahead of the contiguous prefix, keyed by offset
    private val pending = new java.util.TreeMap[Long, Array[Byte]]()
    private var pendingBytes = 0L
    private val assembled = new java.io.ByteArrayOutputStream()
    private var assembledBase = 0L // stream offset of assembled's byte 0
    private var contiguousEnd = 0L
    private var consumed = 0L // readSome's cursor into `assembled`
    private val routedFlag = new AtomicBoolean(false)
    private[net] var finAt: Long = -1L
    private[net] val complete = new CountDownLatch(1)
    private[net] var delivered: Array[Byte] = null
    private var writeOffset = 0L

    // first-frame accept routing: true exactly once, on the frame that
    // makes this stream visible to the server's accept queue
    private[net] def markRouted(): Boolean = routedFlag.compareAndSet(false, true)

    /** Append bytes to the stream; `fin = true` closes our direction.
      * Fragments into ≤MaxData frames, each retransmitted until acked. */
    def write(bytes: Array[Byte], fin: Boolean = true): Unit = {
      var off = 0
      do {
        val n = math.min(MaxData, bytes.length - off)
        val last = off + n == bytes.length
        conn.sendStreamFrame(streamId, writeOffset + off,
          java.util.Arrays.copyOfRange(bytes, off, off + n), fin && last)
        off += n
      } while (off < bytes.length)
      writeOffset += bytes.length
    }

    /** Block until the peer FINs its direction; returns the whole
      * reassembled inbound payload. Throws [[QuicError]] on timeout AND on
      * connection failure — fail() counts the latch down with `delivered`
      * still null, which must surface as the transport error, never as a
      * null payload. */
    def readAll(timeoutMs: Long = 5000): Array[Byte] = {
      if (!complete.await(timeoutMs, TimeUnit.MILLISECONDS))
        throw QuicError(conn.failure.getOrElse(s"stream $streamId: read timeout"))
      val out = delivered
      if (out == null)
        throw QuicError(conn.failure.getOrElse(s"stream $streamId: connection closed"))
      out
    }

    /** Incremental read: block until at least one NEW contiguous inbound
      * byte past what earlier [[readSome]] calls returned, end-of-stream,
      * or connection failure. Returns the fresh bytes; an EMPTY array is
      * clean end-of-stream (FIN reached, everything consumed). The TLS
      * layer ([[QuicTls]]) reads handshake flights this way — don't mix
      * with [[readAll]] on the same stream. */
    def readSome(timeoutMs: Long = 5000): Array[Byte] = synchronized {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (consumed == contiguousEnd) {
        conn.failure.foreach(f => throw QuicError(f))
        if (finAt >= 0 && contiguousEnd == finAt) return Array.emptyByteArray
        val waitMs = (deadline - System.nanoTime()) / 1000000L
        if (waitMs <= 0) throw QuicError(s"stream $streamId: read timeout")
        wait(waitMs)
      }
      val all = assembled.toByteArray
      val out = java.util.Arrays.copyOfRange(all,
        (consumed - assembledBase).toInt, all.length)
      consumed = assembledBase + all.length
      // trim: the consumed prefix is never re-read (readAll must not be
      // mixed with readSome — documented above), so dropping it keeps
      // retained memory AND the flow-control budget proportional to
      // UNCONSUMED data — a long-lived promptly-consumed stream (TLS)
      // can move unlimited total bytes
      assembled.reset()
      assembledBase = consumed
      out
    }

    // connection failure: wake both read paths with `delivered` still null
    private[net] def abort(): Unit = synchronized {
      complete.countDown()
      notifyAll()
    }

    // Receiver side: returns true when this frame completed the stream.
    private[net] def offer(offset: Long, data: Array[Byte], fin: Boolean): Boolean =
      synchronized {
        if (delivered != null) return false // already complete (dup frame)
        if (fin) finAt = offset + data.length
        // a frame below the contiguous prefix is a retransmitted dup —
        // frame boundaries are stable across retries, so skip whole
        if (offset >= contiguousEnd && !pending.containsKey(offset)) {
          // flow-control posture (quinn/RFC 9000 parity in spirit).
          // Order matters: the dup check above runs FIRST so a
          // retransmitted already-pending frame (lost ACK) can never be
          // double-counted into a spurious violation. Two bounds:
          //  - MaxPendingBytes caps out-of-order frames that never
          //    become contiguous (disjoint-offset spray) — legit loss
          //    windows are RTO-sized, far below it;
          //  - MaxStreamBytes caps the TOTAL stream size: the contiguous
          //    prefix is held until consumed, so an in-order no-FIN
          //    spray must also hit a wall (real MAX_STREAM_DATA bounds
          //    total unconsumed data, not just out-of-order data).
          // Violation fails the CONNECTION.
          if (pendingBytes + data.length > MaxPendingBytes) {
            conn.fail(s"stream $streamId: reassembly buffer exceeded " +
              s"($pendingBytes pending bytes) — flow-control violation")
            return false
          }
          // subtraction form: offset near Long.MaxValue must trip the
          // bound, not overflow past it; the budget is RETAINED bytes
          // (beyond the consumed-and-trimmed prefix), so promptly
          // consumed long-lived streams are unaffected
          if (offset - assembledBase > MaxStreamBytes - data.length) {
            conn.fail(s"stream $streamId: retained stream bytes exceed " +
              s"$MaxStreamBytes — flow-control violation")
            return false
          }
          pending.put(offset, data)
          pendingBytes += data.length
        }
        // fold newly contiguous frames into the assembled prefix; an
        // entry stranded BELOW the prefix (hostile overlap — legit
        // retransmits have stable frame boundaries) is dropped whole so
        // its bytes can't leak the pending budget or wedge the fold
        var e = pending.firstEntry()
        while (e != null && e.getKey <= contiguousEnd) {
          pending.remove(e.getKey)
          pendingBytes -= e.getValue.length
          if (e.getKey == contiguousEnd) {
            assembled.write(e.getValue)
            contiguousEnd += e.getValue.length
          }
          e = pending.firstEntry()
        }
        notifyAll()
        if (finAt >= 0 && contiguousEnd == finAt) {
          delivered = assembled.toByteArray
          complete.countDown()
          true
        } else false
      }
  }

  /** Connection state shared by both endpoint roles. Stream id parity is
    * RFC 9000 §2.1: the client allocates 0,4,8,…; replies travel on the
    * same id in the opposite direction. */
  final class Connection private[net] (
      endpoint: QuicEndpoint, val cid: Long, @volatile var remote: SocketAddress,
      val domain: String, private[net] val isServerSide: Boolean) {
    private[net] val streams = new ConcurrentHashMap[Long, QuicStream]()
    private[net] val established = new CountDownLatch(1)
    private val nextStreamId = new AtomicLong(0L)
    private val nextPacket = new AtomicLong(0L)
    // Data-plane packet spaces (QuicInitialCrypto.spaceKeys): each role
    // seals with keys from ITS initial secret and opens with the peer's,
    // so the two directions never share a (key, nonce) pair even though
    // both sides count packets from 0. The nonce is the packet number;
    // retransmissions resend the identical sealed bytes.
    private[net] val (dataSendK, dataRecvK, ackSendK, ackRecvK, initialPeerK) = {
      val (cs, ss) = QuicInitialCrypto.initialSecrets(dcidOf(cid))
      val (mine, theirs) = if (isServerSide) (ss, cs) else (cs, ss)
      (QuicInitialCrypto.spaceKeys(mine, "graft data"),
        QuicInitialCrypto.spaceKeys(theirs, "graft data"),
        QuicInitialCrypto.spaceKeys(mine, "graft ack"),
        QuicInitialCrypto.spaceKeys(theirs, "graft ack"),
        // the peer's INITIAL-space keys (the client caches the server's
        // here for O(map-probe + open) ACCEPT verification)
        QuicInitialCrypto.keys(theirs))
    }
    // pktNum -> (datagram bytes, last-send nanos, retries); the retransmit
    // loop resends entries past RTO and kills the connection at MaxRetries.
    private[net] val unacked = new ConcurrentHashMap[Long, (Array[Byte], Long, Int)]()
    // last INBOUND datagram (nanos) — the RFC 9000 §10.1 idle-timeout
    // clock. Inbound-only deliberately: a hostile peer that never speaks
    // again must age out no matter how much WE retransmit at it.
    @volatile private[net] var lastSeen: Long = System.nanoTime()
    // Server side: the sealed ACCEPT datagram, cached for VERBATIM
    // retransmission. A duplicate INITIAL means our ACCEPT was lost;
    // re-SEALING it would re-init AES-GCM under the identical
    // (key, nonce) pair — pn is fixed at 0 in the initial space — which
    // the JCE rejects (InvalidAlgorithmParameterException: "Cannot reuse
    // iv for GCM encryption"), and a swallowed throw would deterministically
    // stall the handshake until the client's connect() timeout. Caching
    // also mirrors the client's cached `initial`: handshake
    // retransmissions are byte-identical, never a nonce reuse across
    // plaintexts. Written only by the endpoint's single rx thread.
    @volatile private[net] var acceptBytes: Array[Byte] = null
    @volatile private[net] var failure: Option[String] = None

    def isOpen: Boolean = failure.isEmpty

    def openStream(): QuicStream = {
      val id = nextStreamId.getAndAdd(4)
      val s = new QuicStream(this, id)
      streams.put(id, s)
      s
    }

    private[net] def stream(id: Long): QuicStream = {
      // MAX_STREAMS-style bound: a hostile peer cycling fresh stream ids
      // must not grow the stream map without limit. The over-limit stream
      // is returned DETACHED (never retained) so continued flooding after
      // the failure can't grow the map either.
      if (!streams.containsKey(id) && streams.size() >= MaxStreamsPerConn) {
        fail(s"stream limit exceeded (${streams.size()}) — flow-control violation")
        val dead = new QuicStream(this, id)
        dead.abort() // readers fail fast instead of waiting out a timeout
        return dead
      }
      streams.computeIfAbsent(id, _ => new QuicStream(this, id))
    }

    private[net] def sendStreamFrame(
        streamId: Long, offset: Long, data: Array[Byte], fin: Boolean): Unit = {
      failure.foreach(f => throw QuicError(f))
      val pkt = nextPacket.getAndIncrement()
      // frame metadata (stream id, offset, fin) rides INSIDE the sealed
      // payload; the wire shows type, cid, and a masked packet number
      val plain = ByteBuffer.allocate(8 + 8 + 1 + 2 + data.length)
        .putLong(streamId).putLong(offset)
        .put(if (fin) 1.toByte else 0.toByte)
        .putShort(data.length.toShort).put(data).array()
      val bytes = sealedDataPacket(STREAM, cid, dataSendK, pkt, plain)
      unacked.put(pkt, (bytes, System.nanoTime(), 0))
      endpoint.transmit(bytes, remote, pkt)
    }

    /** Seal-and-send an ACK for `ackedPkt` under the ack-space keys; the
      * ACK consumes its own packet number for nonce uniqueness (spaces
      * have distinct keys, so sharing the counter with STREAM is fine). */
    private[net] def sendAck(ackedPkt: Long): Unit = {
      val pkt = nextPacket.getAndIncrement()
      val plain = ByteBuffer.allocate(2 + 8)
        .putShort(1.toShort).putLong(ackedPkt).array()
      endpoint.transmit(
        sealedDataPacket(ACK, cid, ackSendK, pkt, plain), remote, -1L)
    }

    private[net] def fail(reason: String): Unit = {
      failure = Some(reason)
      unacked.clear()
      streams.values().asScala.foreach(_.abort())
      established.countDown()
      // deregister: dead connections must not accumulate in the endpoint
      // map (long-lived servers see unbounded connection churn) or keep
      // the retransmit loop iterating their corpses
      endpoint.dropConnection(cid)
    }

    // CLOSE stays a cleartext control packet: it carries only a code and
    // reason (no payload-secrecy claim), may legitimately repeat with
    // differing reasons (which rules out the deterministic pn-as-nonce
    // scheme the other spaces use), and a spoofed CLOSE was always part
    // of the unauthenticated-close threat model here — QUIC itself only
    // weakly protects CONNECTION_CLOSE in the initial space.
    def close(code: Int = 0, reason: String = "bye"): Unit = {
      val r = reason.getBytes(UTF_8)
      val buf = ByteBuffer.allocate(1 + 8 + 4 + 2 + r.length)
      buf.put(CLOSE).putLong(cid).putInt(code).putShort(r.length.toShort).put(r)
      buf.flip()
      val bytes = new Array[Byte](buf.remaining()); buf.get(bytes)
      endpoint.transmit(bytes, remote, -1L) // fire-and-forget
      endpoint.dropConnection(cid)
    }
  }

  /** A bound domain on a listening endpoint: completed inbound streams
    * (request FIN received) queue here — accept_for_domain parity. */
  final class ListenerHandle private[net] (val domain: String) {
    private[net] val inbox = new java.util.concurrent.LinkedBlockingQueue[QuicStream]()
    def accept(timeoutMs: Long = 5000): Option[QuicStream] =
      Option(inbox.poll(timeoutMs, TimeUnit.MILLISECONDS))
  }

  /** One UDP socket acting as QUIC endpoint — server, client, or both
    * (quinn Endpoint parity). Owns the receive loop and the retransmit
    * timer. */
  final class QuicEndpoint private[net] (channel: DatagramChannel) {
    private[net] val conns = new ConcurrentHashMap[Long, Connection]()
    private val listeners = new ConcurrentHashMap[String, ListenerHandle]()
    private val closed = new AtomicBoolean(false)
    private val cids = new java.security.SecureRandom()

    /** Test hook: return true to drop this outbound datagram (first-class
      * loss injection so recovery is testable deterministically). */
    @volatile var lossRule: (Long) => Boolean = _ => false

    /** Test hook for the HANDSHAKE plane (datagrams sent with pkt = -1,
      * which [[lossRule]] never sees): return true to drop, given the
      * packet-type first byte. Covers the INITIAL/ACCEPT recovery path —
      * a lost ACCEPT must be re-sent (verbatim) on the client's
      * retransmitted INITIAL. */
    @volatile var handshakeLossRule: (Byte) => Boolean = _ => false

    def port: Int = channel.getLocalAddress.asInstanceOf[InetSocketAddress].getPort

    /** Register a domain route (get_or_try_init + ensure_domain parity:
      * many domains share the port; re-binding a domain reuses the
      * existing handle). */
    def bind(domain: String): ListenerHandle =
      listeners.computeIfAbsent(domain, d => new ListenerHandle(d))

    /** Dial: send INITIAL (retrying — handshake packets get the same
      * loss treatment as data) until ACCEPT, or fail. */
    def connect(host: String, port: Int, domain: String,
                timeoutMs: Long = 3000): Connection = {
      val cid = cids.nextLong()
      val remote = new InetSocketAddress(host, port)
      val conn = new Connection(this, cid, remote, domain, isServerSide = false)
      conns.put(cid, conn)
      // RFC 9001 Initial protection (QuicInitialCrypto): the domain —
      // where a ClientHello's SNI would sit — travels sealed under the
      // client initial keys derived from the connection id, with the
      // type+cid+pn header as AAD and the pn byte header-protected by a
      // mask sampled from the ciphertext. Retransmissions resend the
      // identical sealed bytes (same key/nonce/plaintext — a true
      // retransmission, not a nonce reuse across plaintexts).
      val initial = sealedInitialPacket(INITIAL, cid,
        QuicInitialCrypto.keys(QuicInitialCrypto.initialSecrets(dcidOf(cid))._1),
        domain.getBytes(UTF_8))
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      transmit(initial, remote, -1L)
      while (!conn.established.await(RtoMillis, TimeUnit.MILLISECONDS)) {
        conn.failure.foreach(f => throw QuicError(f))
        if (System.nanoTime() > deadline) {
          conns.remove(cid)
          throw QuicError(s"connect to $domain@$host:$port timed out")
        }
        transmit(initial, remote, -1L) // handshake retransmission
      }
      conn.failure.foreach(f => throw QuicError(f))
      conn
    }

    private[net] def transmit(bytes: Array[Byte], to: SocketAddress, pkt: Long): Unit = {
      if (pkt >= 0 && lossRule(pkt)) return // dropped "on the wire"
      if (pkt < 0 && bytes.length > 0 && handshakeLossRule(bytes(0))) return
      channel.send(ByteBuffer.wrap(bytes), to)
    }

    private[net] def dropConnection(cid: Long): Unit = conns.remove(cid)

    private def receiveLoop(): Unit = {
      val buf = ByteBuffer.allocate(2048)
      while (!closed.get()) {
        buf.clear()
        val from = try channel.receive(buf) catch { case _: Exception => null }
        if (from != null) {
          buf.flip()
          try handle(buf, from) catch { case _: Exception => () } // malformed: drop
        }
      }
    }

    private def handle(buf: ByteBuffer, from: SocketAddress): Unit = buf.get() match {
      case INITIAL =>
        val cid = buf.getLong
        // AEAD-open under the client initial keys (derived per packet —
        // a conn does not exist yet; real QUIC servers pay the same
        // per-INITIAL derivation); a forged/hostile INITIAL fails the
        // tag and is DROPPED (no close, no state) instead of parsed as
        // garbage
        val sni = openInitialPacket(INITIAL, cid,
          QuicInitialCrypto.keys(QuicInitialCrypto.initialSecrets(dcidOf(cid))._1),
          buf) match {
          case Some(b) => b
          case None => return
        }
        val domain = new String(sni, UTF_8)
        listeners.get(domain) match {
          case null => // unrouted domain → close(0) parity (lib.rs:198)
            val r = "unrouted domain".getBytes(UTF_8)
            val out = ByteBuffer.allocate(1 + 8 + 4 + 2 + r.length)
            out.put(CLOSE).putLong(cid).putInt(0).putShort(r.length.toShort).put(r)
            out.flip()
            val b = new Array[Byte](out.remaining()); out.get(b)
            transmit(b, from, -1L)
          case _ =>
            // connection-table cap: a spoofed-source INITIAL flood with
            // distinct cids must not grow server memory without bound —
            // beyond the cap, NEW connections are dropped statelessly
            // (no state, no reply; retries land once idle sweeps free
            // slots). Existing cids pass (ACCEPT retransmission).
            if (!conns.containsKey(cid) && conns.size() >= MaxConnections)
              return
            // idempotent: duplicate INITIAL (lost ACCEPT) re-sends the
            // CACHED sealed ACCEPT verbatim — sealing exactly once per
            // connection (see `acceptBytes` for why re-sealing would
            // throw and stall the handshake)
            val conn = conns.computeIfAbsent(cid,
              _ => new Connection(this, cid, from, domain, isServerSide = true))
            conn.remote = from
            conn.lastSeen = System.nanoTime()
            // ACCEPT is sealed under the SERVER initial keys (empty
            // payload → a bare 16-byte tag over the header AAD), so the
            // handshake proves key directionality both ways and a
            // forged ACCEPT cannot establish the client side
            if (conn.acceptBytes == null)
              conn.acceptBytes = sealedInitialPacket(ACCEPT, cid,
                QuicInitialCrypto.keys(QuicInitialCrypto.initialSecrets(dcidOf(cid))._2),
                Array.emptyByteArray)
            transmit(conn.acceptBytes, from, -1L)
        }

      case ACCEPT =>
        val cid = buf.getLong
        // conn lookup BEFORE any key work: an ACCEPT for an unknown cid
        // must cost a map probe, not an HKDF derivation (unauthenticated
        // CPU amplification otherwise); the expected peer initial keys
        // were cached on the Connection at connect time
        val conn = conns.get(cid)
        if (conn == null) return
        if (openInitialPacket(ACCEPT, cid, conn.initialPeerK, buf).isEmpty) return
        conn.lastSeen = System.nanoTime()
        conn.established.countDown()

      case STREAM =>
        val cid = buf.getLong
        val conn = conns.get(cid)
        if (conn != null) {
          val (pkt, pb) = openDataPacket(STREAM, cid, conn.dataRecvK, buf) match {
            case Some(r) => r
            case None => return
          }
          conn.lastSeen = System.nanoTime()
          val streamId = pb.getLong
          val offset = pb.getLong
          val fin = pb.get() != 0
          val data = new Array[Byte](pb.getShort & 0xffff); pb.get(data)
          // ACK every packet, duplicates included (the dup means our
          // previous ACK was lost).
          conn.sendAck(pkt)
          val s = conn.stream(streamId)
          s.offer(offset, data, fin)
          if (conn.isServerSide && conn.isOpen && s.markRouted()) {
            // FIRST frame of a client-initiated stream routes it to the
            // domain's accept queue (markRouted is sticky, so dup frames
            // can't re-enqueue). Routing must not wait for FIN: a TLS
            // handshake needs the server reading/answering flights long
            // before the client FINs its direction.
            Option(listeners.get(conn.domain)).foreach(_.inbox.put(s))
          }
        }

      case ACK =>
        val cid = buf.getLong
        val conn = conns.get(cid)
        if (conn != null) {
          openDataPacket(ACK, cid, conn.ackRecvK, buf).foreach { case (_, pb) =>
            conn.lastSeen = System.nanoTime()
            val n = pb.getShort & 0xffff
            (0 until n).foreach(_ => conn.unacked.remove(pb.getLong))
          }
        }

      case CLOSE =>
        val cid = buf.getLong
        val code = buf.getInt
        val r = new Array[Byte](buf.getShort & 0xffff); buf.get(r)
        Option(conns.remove(cid))
          .foreach(_.fail(s"closed by peer ($code): ${new String(r, UTF_8)}"))

      case _ => () // unknown packet type: drop
    }

    private def retransmitLoop(): Unit = {
      while (!closed.get()) {
        Thread.sleep(RtoMillis / 2)
        val now = System.nanoTime()
        conns.values().asScala.foreach { conn =>
          // idle-timeout sweep (RFC 9000 §10.1): no inbound datagram for
          // IdleTimeoutMs → discard the connection state. No close packet
          // travels (the RFC's silent-discard posture); local blocked
          // readers are woken with the failure instead of hanging.
          // SERVER-SIDE only: the sweep exists to bound REMOTE-initiated
          // state (the INITIAL-flood DoS) — a client-side connection is
          // app-managed (close() when done), and silently destroying a
          // held-but-quiet handle would regress every request/response
          // caller. The asymmetry mirrors real deployments: servers
          // expire idle peers; clients that want to outlive the server's
          // window must send periodic traffic (RFC 9000's PING posture).
          if (conn.isServerSide && now - conn.lastSeen > IdleTimeoutMs * 1000000L)
            conn.fail("idle timeout")
          else conn.unacked.entrySet().asScala.foreach { e =>
            val (bytes, sentAt, retries) = e.getValue
            if (now - sentAt > RtoMillis * 1000000L) {
              if (retries >= MaxRetries) conn.fail(s"packet ${e.getKey} lost after $MaxRetries retries")
              else if (conn.unacked.replace(e.getKey, e.getValue, (bytes, now, retries + 1)))
                transmit(bytes, conn.remote, e.getKey)
            }
          }
        }
      }
    }

    private[net] def start(): this.type = {
      val rx = new Thread(() => receiveLoop(), s"quic-rx-$port")
      val rt = new Thread(() => retransmitLoop(), s"quic-rto-$port")
      rx.setDaemon(true); rt.setDaemon(true)
      rx.start(); rt.start()
      this
    }

    def close(): Unit = {
      closed.set(true)
      channel.close()
    }
  }

  /** Bind an endpoint (server, or client with a fixed port). Port 0 picks
    * an ephemeral port. */
  def endpoint(port: Int = 0): QuicEndpoint = {
    val ch = DatagramChannel.open()
    ch.bind(new InetSocketAddress("127.0.0.1", port))
    new QuicEndpoint(ch).start()
  }
}
