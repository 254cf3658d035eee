package graft.runtime

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.channel.Channel
import graft.streaming.LogAnalyser.{LogField, LogRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Capability names mirror the reference's full 20-grant hostcall-gating
  * catalogue (system/abi/src/lib.rs:114-135) plus the engine's own
  * ConfigRead/LogWrite/ChannelShare; the engine checks them BEFORE
  * building a plan — parity with link-time PermissionDenied stubs
  * (subsystem/wasmtime/src/lib.rs:295-380): deny-by-default, monotonic
  * attenuation on child sessions. Net grants are per-protocol AND
  * per-direction (bind/accept/connect/read/write), exactly as the
  * reference splits them; the TLS-config grants gate the engine's TLS
  * material on both edges (HTTPS termination in net/Tls.scala, QUIC
  * stream TLS in net/QuicTls.scala — the remaining handshake-integration
  * divergence is documented there).
  */
object Capability extends Enumeration {
  val SessionLifecycle,
      ChannelCreate, ChannelRead, ChannelWrite, ChannelShare,
      ProcessLifecycle,
      NetQuicBind, NetQuicAccept, NetQuicConnect, NetQuicRead, NetQuicWrite,
      NetHttpBind, NetHttpAccept, NetHttpConnect, NetHttpRead, NetHttpWrite,
      NetTlsServerConfig, NetTlsClientConfig,
      SingletonRegister, SingletonLookup,
      TimeRead, ConfigRead, LogWrite = Value

  /** Grant set each engine source/sink class needs — what a session must
    * hold before [[QueryManager.start]] will build the pipeline (the
    * reference gates the same surfaces per-hostcall,
    * system/abi/src/lib.rs hostcall→capability table). */
  object Needs {
    val QuicSource: Set[Value] = Set(NetQuicBind, NetQuicAccept, NetQuicRead)
    val QuicSink: Set[Value] = Set(NetQuicConnect, NetQuicWrite)
    val HttpSource: Set[Value] = Set(NetHttpBind, NetHttpAccept, NetHttpRead)
    val HttpReply: Set[Value] = Set(NetHttpBind, NetHttpAccept, NetHttpRead, NetHttpWrite)
    val HttpSink: Set[Value] = Set(NetHttpConnect, NetHttpWrite)
    val ChannelSubscribe: Set[Value] = Set(ChannelRead)
    val ChannelPublish: Set[Value] = Set(ChannelWrite)
    val ChannelAttach: Set[Value] = Set(ChannelShare, ChannelRead)
    val Singleton: Set[Value] = Set(SingletonRegister, SingletonLookup)
    val all: Map[String, Set[Value]] = Map(
      "quic-source" -> QuicSource, "quic-sink" -> QuicSink,
      "http-source" -> HttpSource, "http-reply" -> HttpReply,
      "http-sink" -> HttpSink,
      "channel-subscribe" -> ChannelSubscribe,
      "channel-publish" -> ChannelPublish,
      "channel-attach" -> ChannelAttach,
      "singleton" -> Singleton)
  }
}

/** A capability session: what a pipeline is entitled to do. Child sessions
  * can only attenuate (session.rs:18-101 monotonic-attenuation parity). */
final case class Session(name: String, capabilities: Set[Capability.Value]) {
  def authorise(c: Capability.Value): Unit =
    if (!capabilities.contains(c))
      throw new SecurityException(s"session '$name' lacks capability $c")
  def child(name: String, wanted: Set[Capability.Value]): Session =
    Session(name, capabilities intersect wanted)
}

/** ProcessBuilder/ProcessHandle parity (reference
  * system/userland/src/process.rs:44-188): named pipelines started and
  * stopped through one registry; ACL-checked before the plan is built.
  */
final class QueryManager(val spark: SparkSession,
                         logsChannel: Option[Channel] = None) {

  private val running = new ConcurrentHashMap[String, StreamingQuery]()

  /** Engine observability (K4/S8 parity): lifecycle events are themselves
    * a typed LogRecord stream on a channel any pipeline can subscribe to
    * (reference: every process's tracing is a channel,
    * system/userland/src/logging.rs:232-313). Writer id 0 = the engine. */
  private def log(level: String, message: String, fields: (String, String)*): Unit =
    logsChannel.foreach { ch =>
      import spark.implicits._
      val rec = LogRecord(level, "graft.runtime", message,
        fields.map { case (k, v) => LogField(k, v) }, Nil,
        System.currentTimeMillis())
      ch.write(Seq(rec).toDF(), writerId = 0)
    }

  /** Module-store path denials ride the same engine-log channel as
    * capability refusals (the reference surfaces InvalidPath through the
    * module store's error path the same way). */
  private[graft] def logModuleDenial(path: String, reason: String): Unit =
    log("Warn", "module path denied", "path" -> path, "reason" -> reason)

  /** Per-trigger progress telemetry into the engine-log channel — the
    * reference streams every process's tracing over a channel
    * (logging.rs:232-313); here each micro-batch emits a typed record any
    * pipeline can subscribe to. Opt-in (a listener is session-global);
    * returns the listener so callers can detach. Only queries this
    * manager started are reported. */
  /** Listener shell shared by the progress-driven features: empty
    * lifecycle stubs, and the swallow-all-exceptions telemetry contract
    * (observation must never stall or error the pipelines it observes —
    * lossy like the reference's Drop-mode logging channel, 512 KiB,
    * logging.rs:280) lives in exactly one place. */
  private def progressListener(
      f: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent => Unit)
      : org.apache.spark.sql.streaming.StreamingQueryListener =
    new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        try f(e) catch { case _: Exception => () }
    }

  def attachProgressLogger(): org.apache.spark.sql.streaming.StreamingQueryListener = {
    val l = progressListener { e =>
      val mine = running.entrySet().asScala
        .find(_.getValue.id == e.progress.id).map(_.getKey)
      mine.foreach { name =>
        log("Info", "pipeline progress",
          "pipeline" -> name,
          "batch" -> e.progress.batchId.toString,
          "input_rows" -> e.progress.numInputRows.toString,
          "rows_per_sec" -> f"${e.progress.processedRowsPerSecond}%.1f")
      }
    }
    spark.streams.addListener(l)
    l
  }

  def detachProgressLogger(l: org.apache.spark.sql.streaming.StreamingQueryListener): Unit =
    spark.streams.removeListener(l)

  /** Hands-off consumption-driven retention: every progress event of `q`
    * advances `reader`'s head on `ch` from the query's OWN committed
    * progress (Channel.ackFromProgress — acks never overreach what the
    * subscription durably processed), so a periodic `ch.pruneConsumed()`
    * follows the subscription with no manual ack loop. Takes the QUERY
    * handle, not a pipeline name: listener events are async, so a
    * name-to-running-map lookup would silently drop progress delivered
    * before registration or after stop. Attach order doesn't matter
    * either — acks are MONOTONE, so the synchronous catch-up from
    * `lastProgress` at attach covers anything the bus already delivered,
    * and callers of short-lived pipelines close the tail the same way
    * (`ch.ackFromProgress(reader, q)` after the final batch). Registers
    * the reader if absent; ack failures are swallowed (a missed ack only
    * retains MORE history). Detach with [[detachProgressLogger]]. */
  def autoAck(q: StreamingQuery, ch: Channel, reader: String)
      : org.apache.spark.sql.streaming.StreamingQueryListener = {
    ch.registerReader(reader)
    val l = progressListener { e =>
      if (e.progress.id == q.id) ch.ackFromProgress(reader, e.progress)
    }
    spark.streams.addListener(l)
    try ch.ackFromProgress(reader, q) // catch up past already-fired events
    catch { case _: Exception => () }
    l
  }

  /** Start a named pipeline. `build` constructs and starts the streaming
    * query only after the ACL check passes. */
  def start(name: String, session: Session,
            needs: Set[Capability.Value])(build: SparkSession => StreamingQuery): StreamingQuery = {
    try needs.foreach(session.authorise)
    catch { case e: SecurityException =>
      log("Warn", s"pipeline denied", "pipeline" -> name, "reason" -> e.getMessage)
      throw e
    }
    require(!running.containsKey(name), s"pipeline '$name' already running")
    val q = build(spark)
    // Atomic claim: two concurrent starts can both pass the pre-check, and
    // a plain put would silently overwrite (and leak) the loser's query.
    if (running.putIfAbsent(name, q) != null) {
      q.stop()
      throw new IllegalArgumentException(s"pipeline '$name' already running")
    }
    log("Info", "pipeline started", "pipeline" -> name, "session" -> session.name)
    q
  }

  /** PROCESS_STOP parity (drivers/process.rs:163-192). */
  def stop(name: String): Unit =
    Option(running.remove(name)).foreach { q =>
      q.stop()
      log("Info", "pipeline stopped", "pipeline" -> name)
    }

  def get(name: String): Option[StreamingQuery] = Option(running.get(name))
  def list: Seq[String] = running.keySet().asScala.toSeq.sorted
  def stopAll(): Unit = running.keySet().asScala.toSeq.foreach(stop)
}

/** Boot-time module-spec parser: `name=…;capabilities=a,b;arg:k=v` —
  * the declarative deployment syntax parity (reference
  * system/runtime/src/modules.rs:153-302 `path=…;capabilities=…;args=…`).
  */
object ModuleSpec {
  final case class Spec(name: String, capabilities: Set[Capability.Value],
                        args: Map[String, String])

  def parse(spec: String): Spec = {
    val parts = spec.split(';').map(_.trim).filter(_.nonEmpty)
    var name = ""
    var caps = Set.empty[Capability.Value]
    val args = Map.newBuilder[String, String]
    parts.foreach {
      case s if s.startsWith("name=") => name = s.stripPrefix("name=")
      case s if s.startsWith("capabilities=") =>
        caps = s.stripPrefix("capabilities=").split(',').filter(_.nonEmpty)
          .map(c => Capability.withName(c.trim)).toSet
      case s if s.startsWith("arg:") =>
        val kv = s.stripPrefix("arg:").split("=", 2)
        require(kv.length == 2, s"malformed arg in module spec: $s")
        args += kv(0) -> kv(1)
      case other => throw new IllegalArgumentException(s"bad module-spec field: $other")
    }
    require(name.nonEmpty, s"module spec needs name=…: $spec")
    Spec(name, caps, args.result())
  }
}
