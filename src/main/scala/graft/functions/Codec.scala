package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stage-boundary codec (T6): the reference encodes/decodes every frame at
  * pipeline boundaries (`FlatMsg::encode/decode`, reference
  * system/userland/src/encoding.rs:29-35 and every example). The engine's
  * wire format for cross-channel payloads is JSON-in-binary for
  * diagnosability (columnar parquet remains the storage format; this codec
  * is only for payload columns traveling through byte-oriented channels).
  *
  * Decode is PERMISSIVE: malformed payloads yield null structs, which
  * pipelines strip with `filterMap` — T3's error-stripping semantics
  * (`filter_map(|res| res.ok())`).
  */
object Codec {

  /** Encode columns into a single binary payload. */
  def encode(cols: Column*): Column = to_json(struct(cols: _*)).cast("binary")

  /** Decode a binary payload into a typed struct column (null on failure). */
  def decode(payload: Column, schema: StructType): Column =
    from_json(payload.cast("string"), schema)
}
