package graft.net

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import graft.channel.Channel
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}

/** QUIC ingress (S4): the [[QuicLite]] transport terminated at the driver
  * edge, flowing typed request records into a channel — the same
  * record-flow seam as [[HttpIngress]] (SURVEY §7.4.5), fed by the
  * reference's net-quinn capability surface instead of net-hyper
  * (create → accept → read → reply, subsystem/net-quinn/src/driver.rs:
  * 60-136). Replies go back synchronously on the originating stream (the
  * load-balancer answers on the connection it received from); analytics
  * legs consume the channel downstream.
  */
object QuicIngress {

  /** One ingested request frame. */
  case class QuicRequest(request_id: Long, domain: String, stream_id: Long,
                         remote_addr: String, body: Array[Byte])

  implicit val enc: Encoder[QuicRequest] = Encoders.product[QuicRequest]

  val schema = enc.schema

  /** Bind `domain` on a (possibly shared) endpoint and pump accepted
    * streams into `channel` via [[Ingress.flush]]. `reply` computes the
    * synchronous response from the request body. */
  def start(spark: SparkSession, channel: Channel, domain: String,
            endpoint: QuicLite.QuicEndpoint = null, writerId: Int = 101,
            reply: Array[Byte] => Array[Byte] = _ => "accepted".getBytes("UTF-8"))
      : Ingress = {
    val ep = Option(endpoint).getOrElse(QuicLite.endpoint())
    val ingress = new Ingress(spark, channel, ep, ep.bind(domain), writerId, reply)
    ingress.start()
    ingress
  }

  final class Ingress(spark: SparkSession, channel: Channel,
                      val endpoint: QuicLite.QuicEndpoint,
                      listener: QuicLite.ListenerHandle, writerId: Int,
                      reply: Array[Byte] => Array[Byte]) {
    private val pending = new ConcurrentLinkedQueue[QuicRequest]()
    private val ids = new AtomicLong(0)
    private val stopped = new AtomicBoolean(false)

    def port: Int = endpoint.port

    private[net] def start(): Unit = {
      val t = new Thread(() => {
        while (!stopped.get()) {
          listener.accept(timeoutMs = 200).foreach { s =>
            val body = s.readAll()
            pending.add(QuicRequest(ids.getAndIncrement(), listener.domain,
              s.streamId, s.conn.remote.toString, body))
            s.write(reply(body)) // synchronous response, same stream
          }
        }
      }, s"quic-ingress-${listener.domain}")
      t.setDaemon(true)
      t.start()
    }

    /** Append everything received so far to the channel (one micro-batch).
      * Returns the number of records flushed. A rejected write (channel
      * backpressure / closed) restores the drained records — the stream
      * reply already acknowledged them, so they must survive a failed
      * flush. */
    def flush(): Int = synchronized {
      val batch = Iterator.continually(pending.poll()).takeWhile(_ != null).toSeq
      if (batch.nonEmpty) {
        try channel.write(spark.createDataset(batch)(enc).toDF(), writerId)
        catch { case e: Throwable =>
          val arrived = Iterator.continually(pending.poll()).takeWhile(_ != null).toSeq
          (batch ++ arrived).foreach(pending.add)
          throw e
        }
      }
      batch.size
    }

    /** Records accepted but not yet flushed (ops/metrics surface). */
    def pendingCount: Int = pending.size

    def stop(): Unit = {
      stopped.set(true)
      endpoint.close()
    }
  }
}
