package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `xxhash64` of every word n-gram shingle, computed ZERO-COPY over the
  * text bytes — bit-identical to
  * `transform(TextFunctions.shingles(text, n), s => xxhash64(s))` without
  * materializing a single shingle string.
  *
  * Why the identity holds: `shingles` is `split(text, " ")` re-joined
  * with `concat_ws(" ")` over n consecutive tokens. Split cuts at EVERY
  * separator occurrence (Spark's split keeps empty tokens, including
  * trailing ones), so consecutive tokens are separated by exactly one
  * space in the source — re-joining them with one space reproduces the
  * source bytes verbatim, empty tokens and all. Each shingle is therefore
  * the contiguous byte range [tokStart(i), tokEnd(i+n-1)) of the text,
  * and its xxhash64 (seed 42, Spark's default) can be taken straight off
  * the UTF8String's memory. (0x20 never occurs inside a UTF-8 multibyte
  * sequence, so byte scanning is charset-safe.)
  *
  * This removes the dominant CPU of the dedup/decontamination block: at
  * sf0.1 one query materialized ~1.4M ~90-char shingle strings per run
  * only to hash-and-discard them. A property test pins bit-equality with
  * the composed form (multi-space, unicode, short-doc edges included).
  *
  * Real `doGenCode` (round 7): the kernel's own cost is unchanged — the
  * O(doc) work dwarfs one virtual call per row — but a CodegenFallback
  * here would split the ENCLOSING WholeStageCodegen span, dropping the
  * scan→project→explode neighbours of every dedup query to volcano
  * iteration. The generated code calls the kernel through a reference
  * object, keeping the stage fused.
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "need n >= 1")

  override def dataType: DataType = ArrayType(LongType, false)
  // bit-parity includes NULL: the composed form's `when(size(toks) >= n,
  // ...)` sees NULL >= n as false and falls to otherwise(array()), so
  // null text yields [] — never null — and so does this expression
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingle_hashes"

  private val Empty = new GenericArrayData(Array.empty[Long])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Empty else nullSafeEval(v)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  private val Seed = 42L // xxhash64()'s seed — bit-parity is the contract

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  /** Public for the generated code path (called through a reference obj). */
  def kernel(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // space positions → token boundaries (tokens = spaces + 1)
    var spaces = 0
    var i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') spaces += 1
      i += 1
    }
    val tokens = spaces + 1
    if (tokens < n) return Empty
    val sp = new Array[Int](spaces)
    var j = 0
    i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') { sp(j) = i; j += 1 }
      i += 1
    }
    def tokStart(t: Int): Int = if (t == 0) 0 else sp(t - 1) + 1
    def tokEnd(t: Int): Int = if (t == spaces) len else sp(t)
    val m = tokens - n + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      val a = tokStart(i)
      val b = tokEnd(i + n - 1)
      out(i) = XXH64.hashUnsafeBytes(base, off + a, b - a, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Public for the generated code's null branch. */
  def emptyResult: ArrayData = Empty

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingleHashes", this, classOf[WordShingleHashes].getName)
    val c = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = c.code + code"""
        final $arrCls ${ev.value} = ${c.isNull}
          ? $ref.emptyResult() : $ref.kernel(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  /** Column form: `word_shingle_hashes(text, n)`. */
  def apply(text: Column, n: Int): Column =
    toColumn(WordShingleHashes(toExpression(text), n))
}

/** `xxhash64` of every CHARACTER n-gram, zero-copy over the text bytes —
  * bit-identical to `transform(TextFunctions.charGrams(text, n), xxhash64)`
  * without materializing the gram substrings (same stance as
  * [[WordShingleHashes]], null text → empty array like the composed
  * form's `when(length(null) >= n)` falling to `otherwise(array())`).
  *
  * Char grams are positions in CHARACTERS (`substr` semantics), so the
  * byte range of gram i is [charStart(i), charStart(i+n)) — one pass
  * records the char-boundary byte offsets, then each gram hashes straight
  * off the UTF8String memory. Feeds the winnow exact-verify stage, which
  * otherwise materialized ~n_chars 30-char substrings per document only
  * to hash-and-discard them. Real `doGenCode` for the same stage-fusion
  * reason as [[WordShingleHashes]]. */
case class CharGramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "need n >= 1")

  override def dataType: DataType = ArrayType(LongType, false)
  override def nullable: Boolean = false
  override def prettyName: String = "char_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  private val Seed = 42L // xxhash64()'s seed — bit-parity is the contract
  private val Empty = new GenericArrayData(Array.empty[Long])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Empty else nullSafeEval(v)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  /** Public for the generated code path (called through a reference obj). */
  def kernel(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // char-boundary byte offsets; starts(c) = byte offset of char c,
    // starts(nChars) = len sentinel
    val starts = new Array[Int](len + 1)
    var nChars = 0
    var i = 0
    while (i < len) {
      starts(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
    }
    starts(nChars) = len
    if (nChars < n) return Empty
    val m = nChars - n + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      out(i) = XXH64.hashUnsafeBytes(
        base, off + starts(i), starts(i + n) - starts(i), Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Public for the generated code's null branch. */
  def emptyResult: ArrayData = Empty

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charGramHashes", this, classOf[CharGramHashes].getName)
    val c = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = c.code + code"""
        final $arrCls ${ev.value} = ${c.isNull}
          ? $ref.emptyResult() : $ref.kernel(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

object CharGramHashes {
  /** Column form: `char_gram_hashes(text, n)`. */
  def apply(text: Column, n: Int): Column =
    toColumn(CharGramHashes(toExpression(text), n))
}
