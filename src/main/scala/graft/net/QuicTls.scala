package graft.net

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import javax.net.ssl.{SSLContext, SSLEngine, SSLEngineResult, SSLException, SSLSession}
import javax.net.ssl.SSLEngineResult.{HandshakeStatus, Status}

import graft.net.QuicLite.{Connection, QuicError, QuicStream}

/** TLS on the QUIC edge — JDK `SSLEngine` layered over a [[QuicLite]]
  * bidirectional stream, closing the encryption gap with the reference's
  * TLS-native QUIC transport (`subsystem/net-quinn/src/lib.rs` rides
  * rustls; cert wiring in `tests/request-reply/src/lib.rs`). Reuses the
  * same [[Tls.sslContext]] keystore plumbing as the HTTPS edge, so one
  * cert serves both listeners.
  *
  * Scope, stated where the no-TLS divergence used to be: this is
  * TLS-over-stream, not RFC 9001 QUIC packet protection (see
  * [[QuicLite]]'s scaladoc for the residual metadata-visibility
  * divergence). What a user gets is the reference's security contract at
  * the payload level: encrypted request/reply bodies, integrity, and
  * handshake refusal of peers that don't trust the server certificate.
  *
  * Mechanics: handshake flights travel as ordinary (reliable, ordered)
  * stream frames with `fin = false`; application data follows, and the
  * writer's final record carries the stream FIN, preserving QuicLite's
  * FIN-delimited request/reply shape. The server side is driven by
  * [[QuicIngress]] when constructed with a TLS context.
  */
object QuicTls {

  /** Open a stream on `conn` and run the client side of the handshake.
    * Throws `SSLHandshakeException` if the server's certificate doesn't
    * validate against `ctx`'s trust material — the refusal property. */
  def client(conn: Connection, ctx: SSLContext, timeoutMs: Long = 5000): TlsStream = {
    val engine = ctx.createSSLEngine()
    engine.setUseClientMode(true)
    val t = new TlsStream(conn.openStream(), engine)
    t.handshake(timeoutMs)
    t
  }

  /** Run the server side of the handshake over an accepted stream. */
  def server(stream: QuicStream, ctx: SSLContext, timeoutMs: Long = 5000): TlsStream = {
    val engine = ctx.createSSLEngine()
    engine.setUseClientMode(false)
    val t = new TlsStream(stream, engine)
    t.handshake(timeoutMs)
    t
  }

  /** A TLS session over one QUIC stream: [[write]]/[[readAll]] mirror
    * [[QuicStream]]'s API with TLS record framing in between. */
  final class TlsStream private[net] (val stream: QuicStream, engine: SSLEngine) {
    private val emptyApp = ByteBuffer.allocate(0)
    // netIn stays in "write mode": unprocessed inbound TLS bytes at
    // [0, position), compact()ed after every unwrap
    private var netIn = ByteBuffer.allocate(engine.getSession.getPacketBufferSize)
    private val netOut = ByteBuffer.allocate(engine.getSession.getPacketBufferSize)
    private var appIn = ByteBuffer.allocate(engine.getSession.getApplicationBufferSize)
    private var sawEof = false

    /** Negotiated session (protocol/cipher introspection for tests/ops). */
    def session: SSLSession = engine.getSession

    private def arr(b: ByteBuffer): Array[Byte] = {
      val a = new Array[Byte](b.remaining()); b.get(a); a
    }

    // pull more ciphertext off the stream into netIn (growing it if a
    // large contiguous burst arrived); empty readSome = peer FIN
    private def fill(deadline: Long): Unit = {
      val remain = math.max(1L, (deadline - System.nanoTime()) / 1000000L)
      val bytes = stream.readSome(remain)
      if (bytes.isEmpty) { sawEof = true; return }
      if (netIn.remaining() < bytes.length) {
        val bigger = ByteBuffer.allocate((netIn.position() + bytes.length) * 2)
        netIn.flip(); bigger.put(netIn); netIn = bigger
      }
      netIn.put(bytes)
    }

    private[net] def handshake(timeoutMs: Long): Unit = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      engine.beginHandshake()
      var hs = engine.getHandshakeStatus
      try {
        while (hs != HandshakeStatus.FINISHED && hs != HandshakeStatus.NOT_HANDSHAKING) {
          hs match {
            case HandshakeStatus.NEED_TASK =>
              var task = engine.getDelegatedTask
              while (task != null) { task.run(); task = engine.getDelegatedTask }
              hs = engine.getHandshakeStatus
            case HandshakeStatus.NEED_WRAP =>
              netOut.clear()
              val res = engine.wrap(emptyApp, netOut)
              netOut.flip()
              if (netOut.hasRemaining) stream.write(arr(netOut), fin = false)
              if (res.getStatus == Status.CLOSED)
                throw new SSLException("TLS handshake: engine closed")
              hs = res.getHandshakeStatus
            case _ => // NEED_UNWRAP / NEED_UNWRAP_AGAIN
              if (netIn.position() == 0) {
                fill(deadline)
                if (sawEof) throw new SSLException("peer closed during TLS handshake")
              }
              netIn.flip(); appIn.clear()
              val res = engine.unwrap(netIn, appIn)
              netIn.compact()
              res.getStatus match {
                case Status.BUFFER_UNDERFLOW => // partial record: need more net bytes
                  fill(deadline)
                  if (sawEof) throw new SSLException("peer closed during TLS handshake")
                case Status.CLOSED =>
                  throw new SSLException("TLS handshake: closed by peer")
                case _ => ()
              }
              hs = res.getHandshakeStatus
          }
        }
      } catch {
        case e: SSLException =>
          // flush the engine's pending fatal alert (best-effort) so the
          // peer learns the refusal instead of hanging to its timeout
          try {
            netOut.clear()
            engine.wrap(emptyApp, netOut)
            netOut.flip()
            if (netOut.hasRemaining) stream.write(arr(netOut), fin = false)
          } catch { case _: Exception => () }
          throw e
      }
    }

    /** Wrap `bytes` as TLS application data onto the stream; `fin = true`
      * FINs the QUIC direction with the last record, preserving the
      * FIN-delimited request/reply shape. */
    def write(bytes: Array[Byte], fin: Boolean = true): Unit = {
      val src = ByteBuffer.wrap(bytes)
      do {
        netOut.clear()
        val res = engine.wrap(src, netOut)
        if (res.getStatus != Status.OK)
          throw QuicError(s"TLS wrap failed: ${res.getStatus}")
        netOut.flip()
        stream.write(arr(netOut), fin = fin && !src.hasRemaining)
      } while (src.hasRemaining)
    }

    /** Read to end-of-stream (peer FIN), unwrapping TLS records to the
      * plaintext payload — the TLS twin of [[QuicStream.readAll]].
      * Post-handshake records carrying no application data (TLS 1.3
      * session tickets) are consumed transparently. */
    def readAll(timeoutMs: Long = 5000): Array[Byte] = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      val out = new ByteArrayOutputStream()
      while (!sawEof) {
        var need = netIn.position() == 0
        while (!need && !sawEof) {
          netIn.flip(); appIn.clear()
          val res = engine.unwrap(netIn, appIn)
          netIn.compact()
          res.getStatus match {
            case Status.OK =>
              appIn.flip()
              out.write(arr(appIn))
              need = netIn.position() == 0
            case Status.BUFFER_UNDERFLOW => need = true
            case Status.BUFFER_OVERFLOW => // app record larger than appIn
              appIn = ByteBuffer.allocate(appIn.capacity() * 2)
            case Status.CLOSED => // close_notify: treat as end-of-stream
              sawEof = true
          }
        }
        if (!sawEof) fill(deadline)
      }
      out.toByteArray
    }
  }
}
