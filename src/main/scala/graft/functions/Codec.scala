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

  /** Encode columns into a single binary payload (JSON diagnostic form). */
  def encode(cols: Column*): Column = to_json(struct(cols: _*)).cast("binary")

  /** Decode a binary payload into a typed struct column (null on failure). */
  def decode(payload: Column, schema: StructType): Column =
    from_json(payload.cast("string"), schema)

  /** Encode columns into one binary frame of the length/offset wire format
    * ([[BinaryCodec]]) — the runtime-wire codec (Flatbuffers-parity
    * policy); the JSON form above stays as the diagnostic codec. Field
    * names/types are taken from the column aliases, and the frame carries
    * the 16-byte schema hash. */
  def encodeBinary(cols: Column*): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(StructEncode(toExpression(struct(cols: _*))))
  }

  /** Decode a wire-format frame into a typed struct column. The frame's
    * embedded schema hash must match `schema`: null on mismatch or
    * malformed frame (permissive, T3 filter_map semantics), or an
    * attach-refusal error with `strict = true`. */
  def decodeBinary(payload: Column, schema: StructType, strict: Boolean = false): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(StructDecode(toExpression(payload), schema, strict))
  }
}
