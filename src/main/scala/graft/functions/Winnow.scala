package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed document fingerprints (Schleimer/Wilkerson/Aiken local
  * winnowing, the MOSS scheme): a Rabin–Karp ROLLING hash over character
  * k-grams (O(1) per shift, O(n) per document), then the minimum hash of
  * each w-window is selected — guaranteeing any shared substring of
  * length ≥ k+w-1 yields at least one shared fingerprint, while storing
  * only ~2/(w+1) of the hashes.
  *
  * Unlike the whole-document [[TextFunctions.fingerprint]], winnowed
  * prints survive partial edits: two documents sharing long runs of text
  * share prints even when their full-document hashes differ. At 100 TB
  * the candidate join on shared prints is an equi-join (shuffle on the
  * 8-byte print), never a cross join — the same scale shape as MinHash
  * banding, but robust to sub-document overlap.
  *
  * Real `doGenCode` (round 7, same stage-fusion rationale as
  * [[WordShingleHashes]]): the kernel cost is unchanged, but a
  * CodegenFallback splits the enclosing WholeStageCodegen span and drops
  * the winnow query's scan→project→explode neighbours to volcano
  * iteration. Normalization (lowercase, whitespace collapse) should be
  * applied by the caller so the fingerprint matches the dedup canonical
  * form.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  require(k >= 2 && window >= 1, "need k >= 2, window >= 1")

  override def dataType: DataType = ArrayType(LongType, false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  private val Base = 1000003L

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  /** Public for the generated code path (called through a reference obj). */
  def kernel(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling k-gram hashes, natural 2^64 wraparound
    var bk = 1L // Base^k
    var i = 0
    while (i < k) { bk *= Base; i += 1 }
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = h * Base + (bytes(i + k - 1) & 0xff) - bk * (bytes(i - 1) & 0xff)
      hashes(i) = h
      i += 1
    }
    // winnow: rightmost minimum of each w-window, recorded once per position
    val selected = new scala.collection.mutable.ArrayBuffer[Long]()
    var lastPos = -1
    var w0 = 0
    val nWindows = math.max(1, m - window + 1)
    while (w0 < nWindows) {
      var minPos = w0
      var j = w0 + 1
      val end = math.min(w0 + window, m)
      while (j < end) { if (hashes(j) <= hashes(minPos)) minPos = j; j += 1 }
      if (minPos != lastPos) { selected += hashes(minPos); lastPos = minPos }
      w0 += 1
    }
    new GenericArrayData(selected.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFingerprints", this,
      classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Winnow {
  import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}

  /** Winnowed fingerprint array for a text column. k = gram length,
    * window = winnowing window; any shared substring of length ≥ k+w-1
    * produces a shared fingerprint. */
  def fingerprints(text: Column, k: Int = 8, window: Int = 4): Column =
    toColumn(WinnowFingerprints(toExpression(text), k, window))
}
