package graft.channel

import java.security.MessageDigest

import org.apache.spark.sql.types._

/** Content-addressed schema identity, mirroring the reference's 16-byte
  * BLAKE3 schema hashes (`SchemaDescriptor`, reference
  * system/userland/src/encoding.rs:55-62; hash derivation
  * system/userland/macros/src/schema.rs:44-50). We hash the canonical JSON
  * of the Spark StructType with SHA-256 (public, JVM-built-in) and keep the
  * first 16 bytes, hex-encoded.
  *
  * Channels record their schema hash at creation; attaching a reader or
  * writer with a different schema is refused — the same attach-time
  * equality check the reference performs on channel frames.
  */
object SchemaRegistry {

  /** Canonical form: field names + types only. Nullability and metadata
    * are erased — `Seq(...).toDF` marks primitives non-nullable while the
    * same declared schema is nullable, and that distinction is not part of
    * channel identity (the reference hashes the .fbs text, where optional
    * is explicit in the type; Spark's nullable flag is an inference
    * artifact). The one metadata key that SURVIVES is [[Enums.MetaKey]]:
    * an enum's ordered variant list IS part of the type in the reference's
    * .fbs text, so two channels whose byte column means different enums
    * must not share a hash. */
  def canonical(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map { f =>
        val meta =
          if (f.metadata.contains(Enums.MetaKey))
            new MetadataBuilder().putStringArray(
              Enums.MetaKey, f.metadata.getStringArray(Enums.MetaKey)).build()
          else Metadata.empty
        StructField(f.name, canonical(f.dataType), nullable = true, metadata = meta)
      })
    case a: ArrayType => ArrayType(canonical(a.elementType), containsNull = true)
    case m: MapType => MapType(canonical(m.keyType), canonical(m.valueType), true)
    case other => other
  }

  /** 32-hex-char (16-byte) content hash of a schema. */
  def hash(schema: StructType): String = {
    val json = canonical(schema).json // stable field order
    val digest = MessageDigest.getInstance("SHA-256").digest(json.getBytes("UTF-8"))
    digest.take(16).map(b => f"$b%02x").mkString
  }

  final case class SchemaMismatch(channel: String, expected: String, got: String)
      extends RuntimeException(
        s"schema hash mismatch on channel '$channel': expected $expected, got $got")

  /** Attach-time check: throws [[SchemaMismatch]] unless hashes agree. */
  def check(channel: String, expected: String, schema: StructType): Unit = {
    val got = hash(schema)
    if (got != expected) throw SchemaMismatch(channel, expected, got)
  }
}
