package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a mergeable sketch aggregate: at most
  * `capacity` counters; any item with true frequency > n/capacity is
  * guaranteed present, counts are underestimates by at most n/capacity.
  * The buffer merges associatively (counter-wise add, then joint
  * decrement), so it works under partial aggregation and in streaming
  * state — the bounded-memory answer to "top tokens / hot keys over 100 TB"
  * where an exact groupBy would shuffle the full key space.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.Map[String, Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.Map[String, Long] =
    mutable.Map.empty[String, Long]

  private def offer(buf: mutable.Map[String, Long], item: String, weight: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf(item) = c + weight
      case None if buf.size < capacity => buf(item) = weight
      case None => // joint decrement: shrink all counters by min(weight, minCount)
        val dec = math.min(weight, buf.values.min)
        val dead = mutable.ArrayBuffer[String]()
        buf.mapValuesInPlace((_, c) => c - dec)
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
        if (weight > dec && buf.size < capacity) buf(item) = weight - dec
    }
  }

  override def update(buf: mutable.Map[String, Long], input: InternalRow): mutable.Map[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, c) => offer(a, k, c) }
    a
  }

  override def eval(buf: mutable.Map[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(kv => UTF8String.fromString(kv._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.Map[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.Map[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.Map.empty[String, Long]
    (0 until n).foreach(_ => buf(in.readUTF()) = in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): HeavyHitters =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HeavyHitters =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object HeavyHitters {
  def heavyHitters(c: Column, capacity: Int = 64): Column =
    GraftSqlBridge.toColumn(
      HeavyHitters(GraftSqlBridge.toExpression(c), capacity).toAggregateExpression())
}
