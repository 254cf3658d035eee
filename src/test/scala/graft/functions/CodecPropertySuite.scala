package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property + fuzz tests for the wire codec's core (`encodeRow` /
  * `decodeRow`): random supported schemas × random rows (nulls included)
  * roundtrip losslessly; a foreign schema hash is refused; and — the
  * bounds-hardening claim tested as a PROPERTY — arbitrary byte
  * corruption of a valid frame either decodes to something or returns
  * None, but never throws (a crafted length must fail the long-arithmetic
  * bounds check, not wrap into an unchecked unsafe read).
  */
class CodecPropertySuite extends AnyFunSuite {

  // -Dgraft.fuzz.scale=N multiplies case counts for one-off soaks
  private val fuzzScale = java.lang.Integer.getInteger("graft.fuzz.scale", 1)
  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n * fuzzScale), p)
    assert(res.passed, res.status.toString)
  }

  // ---- random supported schemas -------------------------------------

  private val scalarTypes: Seq[DataType] = Seq(BooleanType, ByteType,
    ShortType, IntegerType, LongType, FloatType, DoubleType, StringType,
    BinaryType, TimestampType, DateType)

  private val fixedElemTypes: Seq[DataType] = Seq(BooleanType, ByteType,
    ShortType, IntegerType, LongType, FloatType, DoubleType)

  private def genFlatField(i: Int): Gen[StructField] = for {
    dt <- Gen.frequency(
      (6, Gen.oneOf(scalarTypes)),
      (2, Gen.oneOf(fixedElemTypes).map(el => ArrayType(el, containsNull = false))))
    nullable <- Gen.oneOf(true, false)
  } yield StructField(s"f$i", dt, nullable)

  private def genFlatStruct(maxFields: Int): Gen[StructType] = for {
    n <- Gen.choose(1, maxFields)
    fields <- Gen.sequence[Seq[StructField], StructField](
      (0 until n).map(genFlatField))
  } yield StructType(fields)

  /** Schema with optional one level of nesting (struct + Vec<table>) —
    * the v2 surface. */
  private val genSchema: Gen[StructType] = for {
    base <- genFlatStruct(4)
    withNested <- Gen.oneOf(true, false)
    nested <- genFlatStruct(3)
    vec <- genFlatStruct(2)
  } yield
    if (!withNested) base
    else StructType(base.fields ++ Seq(
      StructField("nested", nested, nullable = true),
      StructField("vec", ArrayType(vec, containsNull = true), nullable = true)))

  // ---- random values for a schema -----------------------------------

  private def genValue(dt: DataType, nullable: Boolean): Gen[Any] = {
    val v: Gen[Any] = dt match {
      case BooleanType => Gen.oneOf(true, false)
      case ByteType => Gen.choose(Byte.MinValue, Byte.MaxValue)
      case ShortType => Gen.choose(Short.MinValue, Short.MaxValue)
      case IntegerType | DateType => Gen.choose(Int.MinValue, Int.MaxValue)
      case LongType | TimestampType => Gen.choose(Long.MinValue, Long.MaxValue)
      case FloatType => Gen.oneOf(Gen.choose(-1e9f, 1e9f), Gen.oneOf(
        0.0f, -0.0f, Float.NaN, Float.PositiveInfinity))
      case DoubleType => Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.oneOf(
        0.0, -0.0, Double.NaN, Double.NegativeInfinity))
      case StringType =>
        Gen.choose(0, 12).flatMap(n => Gen.stringOfN(n, Gen.asciiPrintableChar))
          .map(UTF8String.fromString)
      case BinaryType =>
        Gen.choose(0, 12).flatMap(n =>
          Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
      case ArrayType(st: StructType, cn) =>
        Gen.choose(0, 3).flatMap(n => Gen.sequence[Seq[Any], Any](
          (0 until n).map(_ =>
            if (cn) Gen.frequency((4, genRow(st).map(identity[Any])), (1, Gen.const(null)))
            else genRow(st).map(identity[Any]))))
          .map(vs => new GenericArrayData(vs.toArray): Any)
      case st: StructType => genRow(st).map(identity[Any])
      case ArrayType(el, _) =>
        Gen.choose(0, 5).flatMap(n => Gen.sequence[Seq[Any], Any](
          (0 until n).map(_ => genValue(el, nullable = false))))
          .map(vs => new GenericArrayData(vs.toArray): Any)
      case other => sys.error(s"no generator for $other")
    }
    if (nullable) Gen.frequency((5, v), (1, Gen.const(null))) else v
  }

  private def genRow(schema: StructType): Gen[InternalRow] =
    Gen.sequence[Seq[Any], Any](
      schema.fields.toSeq.map(f => genValue(f.dataType, f.nullable)))
      .map(vs => new GenericInternalRow(vs.toArray))

  // ---- structural equality (InternalRow has no schema-aware equals) --

  private def sameValue(dt: DataType, a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case _ => dt match {
      case st: StructType =>
        sameRow(st, a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
      case ArrayType(el, _) =>
        val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
        x.numElements() == y.numElements() &&
          (0 until x.numElements()).forall { i =>
            val (xe, ye) = (x.get(i, el), y.get(i, el))
            sameValue(el, xe, ye)
          }
      case BinaryType =>
        java.util.Arrays.equals(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
      case FloatType =>
        java.lang.Float.floatToIntBits(a.asInstanceOf[Float]) ==
          java.lang.Float.floatToIntBits(b.asInstanceOf[Float])
      case DoubleType =>
        java.lang.Double.doubleToLongBits(a.asInstanceOf[Double]) ==
          java.lang.Double.doubleToLongBits(b.asInstanceOf[Double])
      case _ => a == b
    }
  }

  private def sameRow(schema: StructType, a: InternalRow, b: InternalRow): Boolean =
    schema.fields.zipWithIndex.forall { case (f, i) =>
      val (x, y) = (
        if (a.isNullAt(i)) null else a.get(i, f.dataType),
        if (b.isNullAt(i)) null else b.get(i, f.dataType))
      sameValue(f.dataType, x, y)
    }

  // ---- the properties ------------------------------------------------

  test("codec roundtrip: random supported schemas × random rows, lossless") {
    check(Prop.forAll(genSchema.flatMap(s => genRow(s).map(s -> _))) {
      case (schema, row) =>
        assert(BinaryCodec.supported(schema), s"generator produced unsupported $schema")
        val hash = BinaryCodec.hashBytes(schema)
        val bytes = BinaryCodec.encodeRow(schema, hash, row)
        val back = BinaryCodec.decodeRow(schema, hash, bytes)
        assert(back.isDefined, s"decode refused its own encoding for $schema")
        assert(sameRow(schema, row, back.get),
          s"roundtrip mismatch for $schema: $row vs ${back.get}")
        true
    })
  }

  test("codec refuses a foreign schema hash on every frame") {
    check(Prop.forAll(genSchema.flatMap(s => genRow(s).map(s -> _))) {
      case (schema, row) =>
        val hash = BinaryCodec.hashBytes(schema)
        val bytes = BinaryCodec.encodeRow(schema, hash, row)
        val foreign = hash.clone(); foreign(3) = (foreign(3) ^ 0x5A).toByte
        assert(BinaryCodec.decodeRow(schema, foreign, bytes).isEmpty)
        true
    }, n = 100)
  }

  test("codec never throws on corrupted frames (bounds hardening)") {
    val mutation = for {
      pos <- Gen.choose(0, 1000)
      b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield (pos, b)
    check(Prop.forAll(
      genSchema.flatMap(s => genRow(s).map(s -> _)),
      Gen.listOfN(4, mutation)) { case ((schema, row), muts) =>
      val hash = BinaryCodec.hashBytes(schema)
      val bytes = BinaryCodec.encodeRow(schema, hash, row)
      muts.foreach { case (pos, b) => if (pos < bytes.length) bytes(pos) = b }
      // any outcome is fine except an exception: corruption in the header
      // or hash region returns None; corruption in the body may decode to
      // different values or fail a bounds check — both must be graceful
      BinaryCodec.decodeRow(schema, hash, bytes)
      true
    })
  }
}
