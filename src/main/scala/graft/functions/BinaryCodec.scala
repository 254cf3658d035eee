package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import graft.channel.SchemaRegistry
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Length/offset-based binary struct codec — the engine's Flatbuffers-
  * parity wire format for typed channel payloads (reference policy:
  * Flatbuffers on public wires, no JSON for runtime wires —
  * /root/reference/AGENTS.md; `FlatMsg::encode/decode` at
  * system/userland/src/encoding.rs:29-62). Original layout, not a
  * Flatbuffers implementation: what is carried over is the CONTRACT —
  * fixed-offset scalar access, offset/length slots for variable-width
  * fields, and a 16-byte content-addressed schema hash travelling with
  * every frame (`SchemaDescriptor`, encoding.rs:55-62; hash derivation
  * macros/src/schema.rs:44-50 — ours is [[SchemaRegistry.hash]], SHA-256/16
  * over the canonical schema JSON).
  *
  * Wire layout (little-endian):
  * {{{
  *   [0]        magic 0x47 'G'
  *   [1]        version 0x01
  *   [2..17]    schema hash (16 bytes)
  *   [18..]     null bitmap, ceil(nFields/8) bytes (bit i ⇒ field i null)
  *   fixed section: one slot per field in schema order —
  *     bool/i8 1B, i16 2B, i32/f32/date 4B, i64/f64/timestamp 8B,
  *     string/binary/array<fixed-scalar>: u32 offset + u32 length
  *     (offset from frame start; length in bytes for string/binary,
  *     in ELEMENTS for arrays)
  *   variable tail: string/binary bytes and packed array elements
  * }}}
  *
  * Supported field types mirror the reference's `#[schema]` type system
  * (scalars, String, Vec<u8>, Vec<scalar> — schema.rs:536-553,399-461)
  * plus, as of v2, nested tables (`table` and `Vec<table>`,
  * schema.rs:399-461) — the reference's own flagship system record is
  * nested (`LogRecord { fields: Vec<LogField>, spans: Vec<…> }`,
  * system/userland/src/logging.rs:101-121), so the S8 log channel rides
  * this format. Nested slots are u32 offset + u32 payload:
  *   - `struct` field: offset + byte length of ONE headerless child frame
  *     (same layout as a frame minus magic/version/hash — the parent's
  *     schema hash already covers the child layout, since it is taken
  *     over the canonical JSON of the full nested schema);
  *   - `array<struct>` field: offset + element count; at offset sit
  *     count × u32 child-frame byte lengths (0 ⇒ null element), then the
  *     concatenated headerless child frames in order. Child-frame
  *     offsets are relative to the child's own start, so frames compose
  *     recursively (any depth, though the reference only needs one).
  * Frames whose schema contains a nested field carry version byte 2;
  * flat schemas keep the byte-identical v1 layout.
  *
  * Decode is PERMISSIVE by default: malformed frames and schema-hash
  * mismatches yield null structs, which pipelines strip with `filterMap`
  * (T3's `filter_map(|res| res.ok())` semantics). `strict = true` turns a
  * hash mismatch into the reference's attach-time refusal
  * ([[SchemaRegistry.SchemaMismatch]]).
  */
object BinaryCodec {
  val Magic: Byte = 0x47
  val Version: Byte = 1

  private[functions] def fixedWidth(dt: DataType): Option[Int] = dt match {
    case BooleanType | ByteType => Some(1)
    case ShortType => Some(2)
    case IntegerType | FloatType | DateType => Some(4)
    case LongType | DoubleType | TimestampType | TimestampNTZType => Some(8)
    case _ => None
  }

  private[functions] def supported(dt: DataType): Boolean = dt match {
    case StringType | BinaryType => true
    // zero-field structs are refused, not vacuously accepted: a present
    // empty-schema element encodes to a 0-byte child frame, which the
    // Vec<table> layout reserves as its null-element sentinel — accepting
    // the type would decode non-null empty elements back as null
    case st: StructType =>
      st.fields.nonEmpty && st.fields.forall(f => supported(f.dataType))
    case ArrayType(st: StructType, _) =>
      st.fields.nonEmpty && st.fields.forall(f => supported(f.dataType))
    case ArrayType(el, _) => fixedWidth(el).isDefined
    case other => fixedWidth(other).isDefined
  }

  private def hasNested(dt: DataType): Boolean = dt match {
    case _: StructType => true
    case ArrayType(_: StructType, _) => true
    case _ => false
  }

  /** v1 for flat schemas (byte-identical to the original layout), v2 when
    * any field is a nested table. */
  private[functions] def versionFor(schema: StructType): Byte =
    if (schema.fields.exists(f => hasNested(f.dataType))) 2 else Version

  private[functions] def slotWidth(dt: DataType): Int = fixedWidth(dt).getOrElse(8)

  private[functions] def hashBytes(schema: StructType): Array[Byte] =
    SchemaRegistry.hash(schema).grouped(2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray // hex pairs

  private def writeFixed(bb: ByteBuffer, dt: DataType, row: InternalRow, i: Int): Unit =
    dt match {
      case BooleanType => bb.put(if (row.getBoolean(i)) 1.toByte else 0.toByte)
      case ByteType => bb.put(row.getByte(i))
      case ShortType => bb.putShort(row.getShort(i))
      case IntegerType | DateType => bb.putInt(row.getInt(i))
      case FloatType => bb.putFloat(row.getFloat(i))
      case LongType | TimestampType | TimestampNTZType => bb.putLong(row.getLong(i))
      case DoubleType => bb.putDouble(row.getDouble(i))
      case other => throw new IllegalStateException(s"not fixed: $other")
    }

  private def writeElem(bb: ByteBuffer, at: Int, el: DataType, a: ArrayData, j: Int): Unit =
    el match {
      case BooleanType => bb.put(at, if (a.getBoolean(j)) 1.toByte else 0.toByte)
      case ByteType => bb.put(at, a.getByte(j))
      case ShortType => bb.putShort(at, a.getShort(j))
      case IntegerType | DateType => bb.putInt(at, a.getInt(j))
      case FloatType => bb.putFloat(at, a.getFloat(j))
      case LongType | TimestampType | TimestampNTZType => bb.putLong(at, a.getLong(j))
      case DoubleType => bb.putDouble(at, a.getDouble(j))
      case other => throw new IllegalStateException(s"not fixed: $other")
    }

  private def readFixed(bb: ByteBuffer, at: Int, dt: DataType): Any = dt match {
    case BooleanType => bb.get(at) != 0
    case ByteType => bb.get(at)
    case ShortType => bb.getShort(at)
    case IntegerType | DateType => bb.getInt(at)
    case FloatType => bb.getFloat(at)
    case LongType | TimestampType | TimestampNTZType => bb.getLong(at)
    case DoubleType => bb.getDouble(at)
    case other => throw new IllegalStateException(s"not fixed: $other")
  }

  /** Encode a row of `schema` into one frame. */
  private[functions] def encodeRow(schema: StructType, hash: Array[Byte],
                                   row: InternalRow): Array[Byte] = {
    val out = encodeFrame(schema, row, headerLen = 18)
    out(0) = Magic
    out(1) = versionFor(schema)
    System.arraycopy(hash, 0, out, 2, 16)
    out
  }

  /** One frame with `headerLen` zeroed bytes reserved up front (18 for a
    * wire frame, 0 for a nested child frame); every stored offset is
    * relative to index 0 of the RESULT, so child frames compose by plain
    * concatenation. */
  private def encodeFrame(schema: StructType, row: InternalRow,
                          headerLen: Int): Array[Byte] = {
    val n = schema.length
    val bitmapLen = (n + 7) / 8
    val fixedBase = headerLen + bitmapLen
    val fixedLen = schema.fields.map(f => slotWidth(f.dataType)).sum
    // pre-encode child frames and size the variable tail (long arithmetic:
    // a frame that would exceed 2 GiB must fail loudly, not wrap)
    val kids = new Array[AnyRef](n)
    var varLen = 0L
    var i = 0
    while (i < n) {
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case StringType => varLen += row.getUTF8String(i).numBytes()
        case BinaryType => varLen += row.getBinary(i).length
        case st: StructType =>
          val k = encodeFrame(st, row.getStruct(i, st.length), 0)
          kids(i) = k
          varLen += k.length
        case ArrayType(st: StructType, _) =>
          val a = row.getArray(i)
          val m = a.numElements()
          val ks = new Array[Array[Byte]](m)
          var j = 0
          while (j < m) {
            if (!a.isNullAt(j)) ks(j) = encodeFrame(st, a.getStruct(j, st.length), 0)
            j += 1
          }
          kids(i) = ks
          varLen += 4L * m
          var j2 = 0
          while (j2 < m) { if (ks(j2) != null) varLen += ks(j2).length; j2 += 1 }
        case ArrayType(el, _) =>
          varLen += row.getArray(i).numElements().toLong * fixedWidth(el).get
        case _ => ()
      }
      i += 1
    }
    val total = fixedBase.toLong + fixedLen + varLen
    require(total <= Int.MaxValue, s"frame too large: $total bytes")
    val out = new Array[Byte](total.toInt)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    // null bitmap
    i = 0
    while (i < n) {
      if (row.isNullAt(i))
        out(headerLen + (i >> 3)) = (out(headerLen + (i >> 3)) | (1 << (i & 7))).toByte
      i += 1
    }
    bb.position(fixedBase)
    var varAt = fixedBase + fixedLen
    i = 0
    while (i < n) {
      val dt = schema.fields(i).dataType
      if (row.isNullAt(i)) {
        bb.position(bb.position() + slotWidth(dt)) // zeroed slot
      } else dt match {
        case StringType =>
          val b = row.getUTF8String(i).getBytes
          bb.putInt(varAt).putInt(b.length)
          System.arraycopy(b, 0, out, varAt, b.length); varAt += b.length
        case BinaryType =>
          val b = row.getBinary(i)
          bb.putInt(varAt).putInt(b.length)
          System.arraycopy(b, 0, out, varAt, b.length); varAt += b.length
        case _: StructType =>
          val k = kids(i).asInstanceOf[Array[Byte]]
          bb.putInt(varAt).putInt(k.length)
          System.arraycopy(k, 0, out, varAt, k.length); varAt += k.length
        case ArrayType(_: StructType, _) =>
          val ks = kids(i).asInstanceOf[Array[Array[Byte]]]
          bb.putInt(varAt).putInt(ks.length)
          var at2 = varAt + 4 * ks.length
          var j = 0
          while (j < ks.length) {
            val k = ks(j)
            bb.putInt(varAt + 4 * j, if (k == null) 0 else k.length) // 0 ⇒ null elem
            if (k != null) { System.arraycopy(k, 0, out, at2, k.length); at2 += k.length }
            j += 1
          }
          varAt = at2
        case ArrayType(el, _) =>
          val a = row.getArray(i)
          val m = a.numElements()
          val w = fixedWidth(el).get
          bb.putInt(varAt).putInt(m)
          var j = 0
          while (j < m) { writeElem(bb, varAt + j * w, el, a, j); j += 1 }
          varAt += m * w
        case other => writeFixed(bb, other, row, i)
      }
      i += 1
    }
    out
  }

  /** Decode one frame against `schema`; None when the frame is malformed
    * or carries a different schema hash. */
  private[functions] def decodeRow(schema: StructType, hash: Array[Byte],
                                   bytes: Array[Byte]): Option[InternalRow] = {
    if (bytes.length < 18) return None
    if (bytes(0) != Magic || bytes(1) != versionFor(schema)) return None
    var h = 0
    while (h < 16) { if (bytes(2 + h) != hash(h)) return None; h += 1 }
    decodeFrame(schema, bytes, 0, bytes.length, headerLen = 18)
  }

  /** Decode the frame occupying `[start, end)` of `bytes`; stored offsets
    * are relative to `start`. All offset/length checks run in LONG
    * arithmetic — a crafted frame with l ≈ Int.MaxValue must fail the
    * bounds test, not wrap negative and pass into an unchecked
    * `UTF8String.fromBytes` unsafe read. */
  private def decodeFrame(schema: StructType, bytes: Array[Byte],
                          start: Int, end: Int, headerLen: Int): Option[InternalRow] = {
    val n = schema.length
    val bitmapLen = (n + 7) / 8
    val fixedBase = start + headerLen + bitmapLen
    val fixedLen = schema.fields.map(f => slotWidth(f.dataType)).sum
    if (start < 0 || end > bytes.length ||
      end.toLong - start < headerLen.toLong + bitmapLen + fixedLen) return None
    val span = (end - start).toLong
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val vals = new Array[Any](n)
    var at = fixedBase
    var i = 0
    try {
      while (i < n) {
        val dt = schema.fields(i).dataType
        val isNull = (bytes(start + headerLen + (i >> 3)) & (1 << (i & 7))) != 0
        if (!isNull) dt match {
          case StringType =>
            val (o, l) = (bb.getInt(at), bb.getInt(at + 4))
            if (o < 0 || l < 0 || o.toLong + l > span) return None
            vals(i) = UTF8String.fromBytes(bytes, start + o, l)
          case BinaryType =>
            val (o, l) = (bb.getInt(at), bb.getInt(at + 4))
            if (o < 0 || l < 0 || o.toLong + l > span) return None
            val b = new Array[Byte](l)
            System.arraycopy(bytes, start + o, b, 0, l)
            vals(i) = b
          case st: StructType =>
            val (o, l) = (bb.getInt(at), bb.getInt(at + 4))
            if (o < 0 || l < 0 || o.toLong + l > span) return None
            decodeFrame(st, bytes, start + o, start + o + l, 0) match {
              case Some(r) => vals(i) = r
              case None => return None
            }
          case ArrayType(st: StructType, _) =>
            val (o, m) = (bb.getInt(at), bb.getInt(at + 4))
            if (o < 0 || m < 0 || o.toLong + 4L * m > span) return None
            val arr = new Array[Any](m)
            var cur = start.toLong + o + 4L * m
            var j = 0
            while (j < m) {
              val l = bb.getInt(start + o + 4 * j)
              if (l < 0 || cur + l > start + span) return None
              if (l > 0) { // 0 ⇒ null element
                decodeFrame(st, bytes, cur.toInt, (cur + l).toInt, 0) match {
                  case Some(r) => arr(j) = r
                  case None => return None
                }
              }
              cur += l
              j += 1
            }
            vals(i) = new GenericArrayData(arr)
          case ArrayType(el, _) =>
            val (o, m) = (bb.getInt(at), bb.getInt(at + 4))
            val w = fixedWidth(el).get
            if (o < 0 || m < 0 || o.toLong + m.toLong * w > span) return None
            val arr = new Array[Any](m)
            var j = 0
            while (j < m) { arr(j) = readFixed(bb, start + o + j * w, el); j += 1 }
            vals(i) = new GenericArrayData(arr)
          case other => vals(i) = readFixed(bb, at, other)
        }
        at += slotWidth(dt)
        i += 1
      }
      Some(new GenericInternalRow(vals))
    } catch { case _: IndexOutOfBoundsException => None }
  }
}

/** `struct → binary`: one frame per row, schema hash stamped in the
  * header. The byte copying dwarfs one call per row, but real
  * `doGenCode` (round 7, same stance as `WordShingleHashes`) keeps the
  * SURROUNDING stage — typically a scan→project feeding a channel
  * write — inside WholeStageCodegen instead of splitting it. */
case class StructEncode(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "struct_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.forall(f => BinaryCodec.supported(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case s: StructType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: unsupported field type in ${s.simpleString} " +
        "(wire format: fixed scalars, string, binary, array<fixed scalar>, " +
        "nested struct / array<struct> thereof)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects struct, got ${other.simpleString}")
  }

  @transient private lazy val schema = child.dataType.asInstanceOf[StructType]
  @transient private lazy val hash = BinaryCodec.hashBytes(schema)

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[InternalRow])

  /** Public for the generated code path (called through a reference obj). */
  def kernel(row: InternalRow): Array[Byte] = BinaryCodec.encodeRow(schema, hash, row)

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    val ref = ctx.addReferenceObj("structEncode", this, classOf[StructEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `binary → struct` against a declared schema. The frame's embedded hash
  * must equal the declared schema's hash: mismatch ⇒ null struct
  * (permissive pipelines filterMap it away) or, with `strict = true`, the
  * attach-refusal error the reference raises on schema disagreement. */
case class StructDecode(child: Expression, schema: StructType, strict: Boolean)
    extends UnaryExpression {
  override def dataType: DataType =
    StructType(schema.fields.map(_.copy(nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "struct_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if schema.fields.forall(f => BinaryCodec.supported(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: unsupported field type in ${schema.simpleString}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.simpleString}")
  }

  @transient private lazy val hash = BinaryCodec.hashBytes(schema)

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  /** Public for the generated code path. Returns null for a frame that
    * fails the permissive decode — the generated code re-derives isNull
    * from the result, unlike the plain nullSafeCodeGen contract. */
  def kernel(bytes: Array[Byte]): InternalRow =
    BinaryCodec.decodeRow(schema, hash, bytes) match {
      case Some(row) => row
      case None if strict =>
        val got =
          if (bytes.length >= 18 && bytes(0) == BinaryCodec.Magic)
            bytes.slice(2, 18).map(b => f"$b%02x").mkString
          else "<malformed frame>"
        throw SchemaRegistry.SchemaMismatch("<frame>", SchemaRegistry.hash(schema), got)
      case None => null
    }

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    // NOT nullSafeCodeGen: the kernel itself returns null on a failed
    // permissive decode, so isNull must be re-derived from the result
    // (the helper would leave isNull=false with a null value → NPE
    // downstream).
    val ref = ctx.addReferenceObj("structDecode", this, classOf[StructDecode].getName)
    val c = child.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code = c.code +
      code"""
        $rowCls ${ev.value} = ${c.isNull} ? null : $ref.kernel(${c.value});
        boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
