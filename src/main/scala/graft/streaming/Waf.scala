package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The WAF example pipeline (M3, reference examples/waf/src/lib.rs): every
  * request gets a verdict (block iff the path contains "/admin"); the
  * audit leg records every verdict, the alert leg only blocks — one input,
  * two routed sinks (T4/T5).
  */
object Waf {

  /** Enrich requests with verdicts (reference validate_request,
    * waf/src/lib.rs:101-110). Expects a `path` column. */
  def verdicts(requests: DataFrame): DataFrame =
    requests.select(
      col("request_id"),
      when(col("path").contains("/admin"), "block").otherwise("allow").as("decision"),
      when(col("path").contains("/admin"),
        concat(lit("blocked path "), col("path"))).otherwise(lit("ok")).as("reason"))

  /** Audit leg: every verdict (waf/src/lib.rs:216-231 audit subscriber). */
  def audit(verdicts: DataFrame): DataFrame = verdicts

  /** Alert leg: blocks only, rendered as SecurityAlert records. */
  def alerts(verdicts: DataFrame): DataFrame =
    verdicts.filter(col("decision") === "block")
      .select(col("request_id"),
        concat(lit("security alert: "), col("reason")).as("summary"))
}
