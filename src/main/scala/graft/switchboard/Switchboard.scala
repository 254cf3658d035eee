package graft.switchboard

import java.nio.file.Path

import graft.channel.{Channel, ChannelRegistry}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Typed pub/sub routing — the user-facing API surface of the reference's
  * switchboard layer (`Publisher`, `Subscriber`, `Fanout`, `Client`,
  * `Server`; consumed from crates.io as selium-switchboard 0.4, observable
  * in every example: SURVEY.md preamble + §2.5 J4/J5/J7). A reference user
  * programs against exactly these five types; here they are Dataset[T]
  * facades over durable channels.
  *
  * Delivery semantics parity:
  *  - Publisher/Subscriber = broadcast: every subscriber reads the full
  *    channel (its own streaming source, J5);
  *  - Fanout = work-queue: each record lands in exactly one of N
  *    partitions, order waived (J4);
  *  - Client/Server = request-reply over two channels with request-id
  *    correlation (J7; FlatResult.request_id convention,
  *    reference system/userland/src/encoding.rs:64-81).
  */
final class Switchboard(val spark: SparkSession, val registry: ChannelRegistry) {

  def publisher[T: Encoder](topic: String): Publisher[T] = {
    val enc = implicitly[Encoder[T]]
    val ch = if (registry.exists(topic)) registry.get(topic)
             else registry.create(topic, enc.schema)
    new Publisher[T](ch)
  }

  def subscriber[T: Encoder](topic: String): Subscriber[T] =
    new Subscriber[T](registry.get(topic))

  def fanout[T: Encoder](topic: String, workers: Int): Fanout[T] = {
    val enc = implicitly[Encoder[T]]
    val ch = if (registry.exists(topic)) registry.get(topic)
             else registry.create(topic, enc.schema, partitions = workers)
    new Fanout[T](ch, workers)
  }

  def client[Req, Rep](service: String)(
      implicit reqEnc: Encoder[Correlated[Req]],
      repEnc: Encoder[Correlated[Rep]]): Client[Req, Rep] =
    new Client[Req, Rep](this, service)

  def server[Req, Rep](service: String)(
      implicit reqEnc: Encoder[Correlated[Req]],
      repEnc: Encoder[Correlated[Rep]]): Server[Req, Rep] =
    new Server[Req, Rep](this, service)
}

/** Strong typed writer (K1). */
final class Publisher[T: Encoder](val channel: Channel) {
  private val writerId = Publisher.ids.getAndIncrement()
  def publish(items: Dataset[T]): Unit = channel.write(items.toDF(), writerId)
  def publish(items: Seq[T])(implicit spark: SparkSession): Unit = {
    val enc = implicitly[Encoder[T]]
    publish(spark.createDataset(items)(enc))
  }
}
object Publisher {
  private val ids = new java.util.concurrent.atomic.AtomicInteger(1)
}

/** Strong typed reader (S2): batch view or streaming subscription; every
  * subscriber sees the whole topic (broadcast). */
final class Subscriber[T: Encoder](val channel: Channel) {
  private val enc = implicitly[Encoder[T]]
  private def payloadCols = enc.schema.fieldNames.map(col).toSeq
  def snapshot(): Dataset[T] = channel.read().select(payloadCols: _*).as[T](enc)
  def stream(): Dataset[T] = channel.readStream().select(payloadCols: _*).as[T](enc)
}

/** Work-queue (J4): each record consumed by exactly one worker partition. */
final class Fanout[T: Encoder](val channel: Channel, val workers: Int) {
  private val enc = implicitly[Encoder[T]]
  private def payloadCols = enc.schema.fieldNames.map(col).toSeq
  def send(items: Dataset[T]): Unit = channel.write(items.toDF(), 0)
  /** Worker view: partition-local iterators over this worker's share. */
  def workerStream(): Dataset[T] =
    channel.read().select(payloadCols: _*).repartition(workers).as[T](enc)
}

/** Request envelope: payload + correlation id (+ requesting writer). */
case class Correlated[T](request_id: Long, body: T)

/** Request-reply client (J7): append to the request channel, await the
  * correlated reply on the response channel. */
final class Client[Req, Rep](sb: Switchboard, service: String)(
    implicit reqEnc: Encoder[Correlated[Req]],
    repEnc: Encoder[Correlated[Rep]]) {
  import sb.spark
  private val reqCh =
    if (sb.registry.exists(s"$service-req")) sb.registry.get(s"$service-req")
    else sb.registry.create(s"$service-req", reqEnc.schema)
  private def repCh = sb.registry.get(s"$service-rep")
  private val nextId = new java.util.concurrent.atomic.AtomicLong(1)

  /** Fire a request; returns its correlation id. */
  def request(body: Req): Long = {
    val id = nextId.getAndIncrement()
    reqCh.write(spark.createDataset(Seq(Correlated(id, body)))(reqEnc).toDF(), 1)
    id
  }

  /** Poll for the reply with the given id (None until the server ran). */
  def reply(id: Long): Option[Rep] = {
    if (!sb.registry.exists(s"$service-rep")) return None
    val rows = repCh.read()
      .filter(col("request_id") === id)
      .select(col("request_id"), col("body"))
      .as[Correlated[Rep]](repEnc)
      .collect()
    rows.headOption.map(_.body)
  }
}

/** Request-reply server (J7): a streaming query mapping the request
  * channel through a handler into the response channel —
  * `try_for_each(req → responder.send)` parity (reference
  * examples/echo/src/lib.rs:25-62). */
final class Server[Req, Rep](sb: Switchboard, service: String)(
    implicit reqEnc: Encoder[Correlated[Req]],
    repEnc: Encoder[Correlated[Rep]]) {
  import sb.spark

  def serve(checkpoint: Path)(handler: Req => Rep): StreamingQuery = {
    val repCh =
      if (sb.registry.exists(s"$service-rep")) sb.registry.get(s"$service-rep")
      else sb.registry.create(s"$service-rep", repEnc.schema)
    val reqCh = sb.registry.get(s"$service-req")
    val requests = reqCh.readStream()
      .select(col("request_id"), col("body")).as[Correlated[Req]](reqEnc)
    val responses: Dataset[Correlated[Rep]] =
      requests.map(c => Correlated(c.request_id, handler(c.body)))(repEnc)
    repCh.sink(responses.toDF(), writerId = 2, checkpoint)
  }
}
