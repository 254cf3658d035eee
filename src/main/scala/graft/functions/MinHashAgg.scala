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
  * of running minima. Each input string is byte-hashed ONCE (two murmur3
  * passes fused into a 64-bit base), then the k component hashes are
  * affine transforms `a_i·base + b_i` of that base — the standard
  * universal-hashing MinHash family. That turns the per-row cost from
  * k byte-scans into one byte-scan + k multiply-adds (~10× on 3-word
  * shingles at k=64, measured at sf0.1).
  *
  * Why custom instead of k separate `min(hash(s, i))` columns: one
  * aggregation buffer and one pass over the bytes per row, k× fewer
  * aggregate expressions for the planner, and the exact shape a
  * streaming sketch needs (mergeable buffer → works under partial
  * aggregation and in `Dataset.agg` over grouped streams). This is the
  * engine's TypedImperativeAggregate extension-point demonstration
  * (SURVEY §7.3).
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

  // analysis-time rejection of anything update() can't hash — without
  // this an Int/Binary/Decimal child surfaced as a raw MatchError at
  // execution time instead of a plan error naming the type
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string (raw element) or bigint (pre-hashed element key), " +
          s"got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Int] =
    Array.fill(numHashes)(Int.MaxValue)

  // fixed odd multipliers/offsets (splitmix64-expanded from the hash
  // index) — deterministic across executors and rounds; shared with the
  // per-row form in the companion so streaming and batch signatures are
  // bit-identical over the same key set
  @transient private lazy val (coefA, coefB) = MinHashSignature.coefs(numHashes)
  private def mix(z0: Long): Long = MinHashSignature.mix(z0)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      // base hash: strings get ONE byte-scan (two seeded murmur3 halves);
      // a long input is taken as an already-hashed element key (the
      // shingle relations shuffle xxhash64 keys, not raw strings)
      val base = v match {
        case l: java.lang.Long => mix(l.longValue())
        case s: UTF8String =>
          val bytes = s.getBytes
          val lo = Murmur3_x86_32.hashUnsafeBytes(
            bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 0x5bd1e995)
          val hi = Murmur3_x86_32.hashUnsafeBytes(
            bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 0x1b873593)
          (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
      }
      var i = 0
      while (i < numHashes) {
        val h = ((coefA(i) * base + coefB(i)) >>> 33).toInt // top bits mix best
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

  private[functions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private[functions] def coefs(numHashes: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numHashes, k =>
      (Array.tabulate(k)(i => mix(2L * i + 1) | 1L),
       Array.tabulate(k)(i => mix(2L * i + 2))))

  /** The same signature computed in one pass over an already-distinct set
    * of pre-hashed (xxhash64) element keys — the per-row form used where a
    * whole document is in hand (the streaming near-dup state operator).
    * Bit-identical to the aggregate fed the same long keys. */
  def signatureOf(keys: Iterable[Long], numHashes: Int): Array[Int] = {
    val (ca, cb) = coefs(numHashes)
    val buf = Array.fill(numHashes)(Int.MaxValue)
    keys.foreach { k =>
      val base = mix(k)
      var i = 0
      while (i < numHashes) {
        val h = ((ca(i) * base + cb(i)) >>> 33).toInt
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }
}
