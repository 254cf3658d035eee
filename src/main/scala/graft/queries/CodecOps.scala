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
    },

    // ---- The same roundtrip through the length/offset BINARY wire codec
    // (functions.BinaryCodec — the Flatbuffers-parity runtime-wire format
    // with the 16-byte schema hash stamped per frame). The oracle never
    // sees the encoded form, so any loss, misalignment, or hash-check
    // regression in the binary layout breaks the hash match. JSON codec
    // above stays as the diagnostic form; this is the data-plane one.
    Q("q_codec_binary",
      """SELECT event_id, event_type, value, epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(Codec.encodeBinary(col("event_id"), col("event_type"), col("value"), col("ts"))
          .as("payload"))
        .select(Codec.decodeBinary(col("payload"), payloadSchema).as("r"))
        .select(col("r.event_id").as("event_id"), col("r.event_type").as("event_type"),
          col("r.value").as("value"), expr("r.ts div 1000").as("ts_us"))
        .orderBy(col("event_id"))
    },

    // ---- Channel roundtrip through the DSv2 connector: an events slice
    // is published into a fresh topic (writer-attributed parquet batches)
    // and read back via format("graft-channel") — the whole
    // write→commit→scan path sits inside the correctness gate, and the
    // oracle never sees the channel, so any loss/duplication/metadata leak
    // in the connector breaks the hash. The aggregate is localCheckpointed
    // eagerly so the staged topic can be deleted before the result is
    // consumed (no temp-dir leak per run).
    Q("q_channel_roundtrip",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.ensureConf(s)
      val root = java.nio.file.Files.createTempDirectory("graft_chan_rt")
      try {
        val reg = new graft.channel.ChannelRegistry(s, root)
        val slice = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("event_type"), col("value"))
        val ch = reg.create("rt", slice.schema)
        ch.write(slice, writerId = 1)
        ch.readV2()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), Tables.exactSum(col("value")).as("total"))
          .orderBy(col("event_type"))
          .localCheckpoint()
      } finally {
        val walk = java.nio.file.Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        } finally walk.close()
      }
    }
  )
}
