package graft.queries

import graft.{Q, Tables}
import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries: `documents.text` bytes stand in for media
  * payloads (no media libs in this environment — SURVEY.md north-star
  * multimodal row). The binary-column plumbing (schema, batching,
  * partition-local decode) is real; the decode itself is the deterministic
  * fake in [[graft.functions.Multimodal]].
  */
object MultimodalOps {

  val all: Seq[Q] = Seq(

    // ---- Metadata extraction over a binary payload column. The arithmetic
    // "decode" is SQL-expressible, so this one keeps a DuckDB oracle.
    Q("q_media_meta",
      """SELECT media_id, n_bytes,
        |  CAST((n_bytes % 64 + 1) * 16 AS INT) AS width,
        |  CAST((n_bytes % 48 + 1) * 16 AS INT) AS height,
        |  CAST(n_bytes % 30 + 1 AS INT) AS n_frames
        |FROM (SELECT doc_id AS media_id,
        |        CAST(octet_length(encode(text)) AS INT) AS n_bytes
        |      FROM documents)
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          length(col("text").cast("binary")).as("n_bytes"))
        .select(col("media_id"), col("n_bytes"),
          Multimodal.fakeWidth(col("n_bytes")).cast("int").as("width"),
          Multimodal.fakeHeight(col("n_bytes")).cast("int").as("height"),
          Multimodal.fakeFrames(col("n_bytes")).cast("int").as("n_frames"))
        .orderBy(col("media_id"))
    },

    // ---- Partition-local decode via typed mapPartitions (rows-only check:
    // the FNV checksum has no SQL twin). Exercises the real decoder shape.
    Q.noOracle("q_media_decode") { (s, d) =>
      import s.implicits._
      val ds = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("payload"),
          lit("text/plain").as("mime"))
        .as[Multimodal.MediaRecord]
      Multimodal.decodePartitions(ds).toDF().orderBy(col("media_id"))
    }
  )
}
