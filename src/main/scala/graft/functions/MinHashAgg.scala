package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE custom aggregate: the buffer is the int[k]
  * of running minima, updated with k murmur3 hashes (seed = hash index)
  * per input string.
  *
  * Why custom instead of k separate `min(hash(s, i))` columns: one
  * aggregation buffer and one pass over the bytes per row (the hash seeds
  * share the UTF8 payload), k× fewer aggregate expressions for the
  * planner, and the exact shape a streaming sketch needs (mergeable
  * buffer → works under partial aggregation and in
  * `Dataset.agg` over grouped streams). This is the engine's
  * TypedImperativeAggregate extension-point demonstration (SURVEY §7.3).
  */
case class MinHashSignature(
    child: Expression,
    numHashes: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Int] =
    Array.fill(numHashes)(Int.MaxValue)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val bytes = s.getBytes
      var i = 0
      while (i < numHashes) {
        val h = Murmur3_x86_32.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf.map(Int.box))

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * numHashes)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashSignature =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashSignature =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object MinHashSignature {
  /** Column form: `minhashSig($"shingle")` inside `groupBy(...).agg(...)`. */
  def minhashSig(c: Column, numHashes: Int = 32): Column =
    GraftSqlBridge.toColumn(
      MinHashSignature(GraftSqlBridge.toExpression(c), numHashes)
        .toAggregateExpression())
}
