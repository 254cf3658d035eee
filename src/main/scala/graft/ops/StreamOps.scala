package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's stream-combinator surface (SURVEY §2.3–§2.5) as Dataset
  * extension methods. Each is a thin, plan-transparent wrapper over
  * built-in declarative ops, so Catalyst sees through all of them —
  * pushdown, pruning and codegen are unaffected.
  *
  * Usage: `import graft.ops.StreamOps._` then `df.windowedTumbling(...)`.
  */
object StreamOps {

  implicit final class RichStream(private val df: DataFrame) extends AnyVal {

    /** T3 filter_map: keep rows where `c` is non-null, projecting it —
      * the reference's decode-error stripping
      * (`filter_map(|res| ready(res.ok()))`, log-analyser src/lib.rs:65). */
    def filterMap(c: Column, as: String): DataFrame =
      df.withColumn(as, c).filter(col(as).isNotNull)

    /** A1 tumbling event-time window over an epoch-nanos long column;
      * works for batch and streaming plans alike. */
    def windowedTumbling(tsNanosCol: String, seconds: Long): Column =
      window(timestamp_micros(expr(s"$tsNanosCol div 1000")), s"$seconds seconds")

    /** A2 threshold alert: keep groups whose `countCol` exceeds n, with a
      * reference-style Warning message (log-analyser src/lib.rs:103-125). */
    def thresholdAlert(countCol: String, n: Long): DataFrame =
      df.filter(col(countCol) > n)
        .withColumn("alert",
          format_string(s"%d ${countCol.stripPrefix("n_")}s observed in window", col(countCol)))

    /** J4 fanout: distribute rows across n workers, order waived (the
      * reference's Fanout work-queue, load-balancer src/lib.rs:21-61).
      * Round-robin repartition — no key skew by construction. */
    def fanout(n: Int): DataFrame = df.repartition(n)

    /** J5 broadcast pub/sub needs no operator: every reader of a channel
      * simply gets its own full-data DataFrame. */

    /** J7 request-reply: correlate this df (requests) with replies on a
      * correlation id (FlatResult.request_id convention, reference
      * system/userland/src/encoding.rs:64-81). Inner join ⇒ only answered
      * requests; left ⇒ pending requests kept with null reply columns. */
    def requestReply(replies: DataFrame, idCol: String,
                     joinType: String = "inner"): DataFrame =
      df.join(replies, Seq(idCol), joinType)
  }
}
