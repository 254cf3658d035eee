package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

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
