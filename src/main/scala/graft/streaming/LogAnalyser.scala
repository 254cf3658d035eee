package graft.streaming

import graft.channel.Enums
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's flagship example pipeline (M2 slice, SURVEY §7.2):
  * a typed LogRecord stream → tumbling window → per-severity counts →
  * threshold filter → Warning records
  * (reference examples/log-analyser/src/lib.rs:31-125, window.rs:10-67).
  *
  * Schema parity: LogRecord mirrors system/userland/schemas/logging.fbs
  * (FIXTURES.md §1). The engine's window is event-time over timestamp_ms
  * (the reference windows on arrival time, but arrival order IS event
  * order there — SURVEY §2.9 — so event-time on the stamped timestamp is
  * the faithful translation, and it additionally survives replays).
  */
object LogAnalyser {

  case class LogField(key: String, value: String)
  case class LogSpan(name: String, fields: Seq[LogField])
  case class LogRecord(level: String, target: String, message: String,
                       fields: Seq[LogField], spans: Seq[LogSpan],
                       timestamp_ms: Long)
  case class Warning(message: String)

  /** The reference's LogLevel enum including its `Unknown(i8)` fallback
    * (system/userland/src/logging.rs:52-71): catalogued variants ride the
    * wire as their byte ordinal, unknown bytes survive as `unknown(<n>)`
    * and re-encode to themselves. */
  val Level: Enums.EnumDef =
    Enums.EnumDef("LogLevel", IndexedSeq("Trace", "Debug", "Info", "Warn", "Error"))

  private val fieldT = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))

  /** LogRecord as the binary wire codec carries it — `level` is the enum's
    * byte ordinal (1-byte slot), `fields`/`spans` are nested Vec<table>
    * child frames (v2 layout). This is the schema whose 16-byte hash rides
    * every frame; the enum's variant catalogue is hashed with it. */
  val wireSchema: StructType = StructType(Seq(
    Level.field("level"),
    StructField("target", StringType), StructField("message", StringType),
    StructField("fields", ArrayType(fieldT)),
    StructField("spans", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("fields", ArrayType(fieldT)))))),
    StructField("timestamp_ms", LongType)))

  /** Typed LogRecord columns → one wire frame per record: the S8 log
    * channel riding the engine's own runtime-wire format (the reference
    * serializes LogRecord over its channel the same way —
    * logging.rs:101-121 + encoding.rs:29-62). */
  def toWire(logs: DataFrame): DataFrame =
    logs.select(graft.functions.Codec.encodeBinary(
      Level.encode(col("level")).as("level", Level.field("level").metadata),
      col("target"), col("message"), col("fields"), col("spans"),
      col("timestamp_ms")).as("frame"))

  /** Wire frames → typed LogRecord columns, enum level decoded back to
    * its display form (unknown ordinals preserved as `unknown(<n>)`). */
  def fromWire(frames: DataFrame): DataFrame =
    frames.select(graft.functions.Codec.decodeBinary(col("frame"), wireSchema).as("r"))
      .select(Level.decode(col("r.level")).as("level"),
        col("r.target").as("target"), col("r.message").as("message"),
        col("r.fields").as("fields"), col("r.spans").as("spans"),
        col("r.timestamp_ms").as("timestamp_ms"))

  /** Window + count + threshold. Works on batch or streaming input
    * (same plan; streaming runs need complete/update output mode, or an
    * `withWatermark` upstream for append). */
  def alerts(logs: DataFrame, windowSeconds: Int = 5,
             errorThreshold: Long = 10, warnThreshold: Long = 50): DataFrame =
    logs
      .groupBy(window(timestamp_millis(col("timestamp_ms")), s"$windowSeconds seconds").as("w"))
      .agg(
        count(when(col("level") === "Error", 1)).as("errors"),
        count(when(col("level") === "Warn", 1)).as("warnings"))
      .filter(col("errors") > errorThreshold || col("warnings") > warnThreshold)
      .select(col("w.start").as("window_start"),
        col("errors"), col("warnings"),
        format_string("%d errors observed in window", col("errors")).as("message"))

  /** Typed end: Warning records only (reference output schema,
    * examples/log-analyser/schemas/log.fbs). */
  def warnings(logs: DataFrame, windowSeconds: Int = 5,
               errorThreshold: Long = 10, warnThreshold: Long = 50): Dataset[Warning] = {
    val spark = logs.sparkSession
    import spark.implicits._
    alerts(logs, windowSeconds, errorThreshold, warnThreshold)
      .select(col("message")).as[Warning]
  }
}
