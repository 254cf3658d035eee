package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the streaming form of the dedup north-star:
  * exact dedup on a key (content hash / fingerprint) over an unbounded
  * stream, with bounded state via watermark (a duplicate arriving later
  * than the watermark horizon is no longer caught; state stays finite).
  */
object StreamingDedup {

  /** Exact streaming dedup on `keyCols`, state bounded by the watermark on
    * `tsCol` (event-time column, TimestampType). Duplicates are matched on
    * the keys alone — `dropDuplicatesWithinWatermark` evicts key state once
    * the watermark passes, unlike plain dropDuplicates which would either
    * grow state forever or (with ts in the key) miss same-key-different-ts
    * duplicates. */
  def dedup(stream: DataFrame, tsCol: String, horizon: String,
            keyCols: String*): DataFrame =
    stream
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols.toSeq)

  /** Content-hash streaming dedup for document streams: fingerprint the
    * text (whitespace/case-insensitive), dedup on the fingerprint. */
  def dedupByContent(stream: DataFrame, tsCol: String, horizon: String,
                     textCol: String): DataFrame =
    dedup(
      stream.withColumn("_fp",
        graft.functions.TextFunctions.fingerprint(col(textCol))),
      tsCol, horizon, "_fp")
}
