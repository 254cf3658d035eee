package graft.channel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Enum-with-fallback for the schema layer, mirroring the reference's enum
  * story: unit variants encode as a small integer on the wire, and UNKNOWN
  * wire values are preserved — not errors, not nulls — via an explicit
  * fallback variant (reference `macros/src/schema.rs:199-239` generates
  * `Unknown(i8)` alongside the declared variants; e.g. `LogLevel` at
  * `system/userland/src/logging.rs:52-71`). That fallback is what lets a
  * v1 reader survive a v2 writer's new variant and re-emit it unchanged.
  *
  * Spark mapping (SURVEY §1.2's resolution): the WIRE/storage type is
  * ByteType — it rides parquet, the binary codec (1-byte slot) and channel
  * frames as-is — and the DISPLAY form is a string, `variants(b)` for
  * catalogued values and `unknown(<b>)` for the rest. Both directions are
  * plain Catalyst CASE expressions (codegen'd, no UDF), and
  * `encode(decode(x)) == x` for EVERY byte, catalogued or not — the
  * reference's round-trip guarantee.
  *
  * Enum identity is channel identity: [[EnumDef.field]] tags the
  * StructField with the ordered variant list in metadata, and
  * [[SchemaRegistry.canonical]] folds that metadata into the schema hash —
  * two channels whose byte column means different enums do NOT share a
  * hash (the reference hashes the .fbs text, where the enum definition is
  * part of the type).
  */
object Enums {

  /** Metadata key carrying the ordered variant list on a ByteType field. */
  val MetaKey = "graft.enum.variants"

  final case class EnumDef(name: String, variants: IndexedSeq[String]) {
    require(variants.nonEmpty && variants.size <= 127, "1..127 variants")
    require(variants.distinct.size == variants.size, "variant names must be unique")
    require(variants.forall(v => !v.startsWith("unknown(")),
      "variant names must not collide with the unknown(<n>) fallback form")

    /** The wire-typed field, enum identity in metadata (hash-relevant). */
    def field(fieldName: String): StructField =
      StructField(fieldName, ByteType,
        metadata = new MetadataBuilder()
          .putStringArray(MetaKey, variants.toArray).build())

    /** byte → display string: catalogued variants by ordinal, anything
      * else as the value-preserving `unknown(<n>)` fallback. */
    def decode(wire: Column): Column = {
      val known = variants.zipWithIndex.foldLeft(lit(null).cast(StringType)) {
        case (acc, (v, i)) => when(wire === lit(i.toByte), lit(v)).otherwise(acc)
      }
      coalesce(known, concat(lit("unknown("), wire.cast(StringType), lit(")")))
    }

    /** display string → byte: variant names to their ordinal, the
      * `unknown(<n>)` fallback back to its original value, anything else
      * null (permissive — strip with filterMap, T3 semantics). */
    def encode(display: Column): Column = {
      val known = variants.zipWithIndex.foldLeft(lit(null).cast(ByteType)) {
        case (acc, (v, i)) => when(display === lit(v), lit(i.toByte)).otherwise(acc)
      }
      // digits bounded to 3 and the range re-checked before the byte cast:
      // ANSI mode turns an overflowing cast into a runtime error, and
      // encode must map foreign strings to null, never crash the task
      val num = regexp_extract(display, "^unknown\\((-?[0-9]{1,3})\\)$", 1)
      coalesce(known,
        when(display.rlike("^unknown\\(-?[0-9]{1,3}\\)$"),
          when(num.cast(IntegerType).between(-128, 127),
            num.cast(IntegerType).cast(ByteType))))
    }
  }

  /** Recover the enum definition a field was tagged with, if any. */
  def of(f: StructField): Option[EnumDef] =
    if (f.metadata.contains(MetaKey))
      Some(EnumDef(f.name, f.metadata.getStringArray(MetaKey).toIndexedSeq))
    else None
}
