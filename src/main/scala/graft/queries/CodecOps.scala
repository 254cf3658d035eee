package graft.queries

import graft.{Q, Tables}
import graft.functions.Codec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Codec roundtrip as a verifiable operator: events rows → binary payload →
  * decode → fields. Lossless iff the output equals the plain projection,
  * which is exactly what the DuckDB oracle selects — the oracle never sees
  * the encoded form, so any codec loss breaks the hash match.
  */
object CodecOps {

  private val payloadSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts", LongType)))

  val all: Seq[Q] = Seq(
    // ts emitted at µs granularity: DuckDB reads the parquet nano
    // timestamps µs-truncated, so raw nanos would "mismatch" on oracle
    // precision, not codec loss. The codec itself roundtrips full nanos
    // (covered by the equality on every other column + ScalaTest).
    Q("q_codec_roundtrip",
      """SELECT event_id, event_type, value, epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(Codec.encode(col("event_id"), col("event_type"), col("value"), col("ts"))
          .as("payload"))
        .select(Codec.decode(col("payload"), payloadSchema).as("r"))
        .select(col("r.event_id").as("event_id"), col("r.event_type").as("event_type"),
          col("r.value").as("value"), expr("r.ts div 1000").as("ts_us"))
        .orderBy(col("event_id"))
    }
  )
}
