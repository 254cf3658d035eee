package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document most-frequent word n-gram — `struct(gram, cnt)` — in ONE
  * map-side pass over the text bytes, the kernel behind the Gopher-style
  * repetition filters (Rae et al. 2021 §A1.1: drop documents whose most
  * common 2-/3-gram covers too large a character fraction).
  *
  * The composed form (explode n-grams → groupBy(doc, gram) → count →
  * per-doc max) shuffles the corpus TOKEN stream — at 100 TB that is the
  * single largest relation the pipeline could materialize, for a
  * per-document scalar. This expression keeps the whole computation
  * inside the row: n-grams are contiguous byte ranges of the source (the
  * [[WordShingleHashes]] identity — split-on-space re-joined with one
  * space reproduces the source bytes, empty tokens included), so the
  * kernel sorts the O(tokens) ranges by raw byte order and counts equal
  * runs without materializing a single gram string. Winner = highest
  * count, ties to the LEXICOGRAPHICALLY SMALLEST gram (bytewise UTF-8
  * order = code-point order, and the engines' default binary collation),
  * which is what a `ORDER BY cnt DESC, gram` oracle computes.
  *
  * NULL text or fewer than n tokens → null struct (no gram exists).
  * Real `doGenCode` for the same stage-fusion reason as
  * [[WordShingleHashes]]: a CodegenFallback would break the enclosing
  * WholeStageCodegen span of every scan→project quality query.
  */
case class TopNgramStats(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "need n >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "top_ngram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else kernel(v.asInstanceOf[UTF8String])
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  /** Public for the generated code path (called through a reference obj).
    * Returns null when the text has fewer than n tokens. */
  def kernel(s: UTF8String): InternalRow = {
    val len = s.numBytes()
    // token boundaries: split-on-space semantics, empties included
    var spaces = 0
    var i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') spaces += 1
      i += 1
    }
    val tokens = spaces + 1
    if (tokens < n) return null
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
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    i = 0
    while (i < m) {
      starts(i) = tokStart(i)
      ends(i) = tokEnd(i + n - 1)
      i += 1
    }
    // sort gram indices by raw byte order (unsigned lexicographic, then
    // length) — equal grams become adjacent runs; ascending order makes
    // the FIRST maximal run the lexicographically-smallest tie winner
    def cmp(a: Int, b: Int): Int = {
      val la = ends(a) - starts(a)
      val lb = ends(b) - starts(b)
      val lim = math.min(la, lb)
      var k = 0
      while (k < lim) {
        val ba = s.getByte(starts(a) + k) & 0xff
        val bb = s.getByte(starts(b) + k) & 0xff
        if (ba != bb) return ba - bb
        k += 1
      }
      la - lb
    }
    // stable PRIMITIVE merge sort over the gram indices — this runs per
    // ROW inside the fused scan stage (the whole point of the kernel),
    // so no boxed Integers or megamorphic comparator dispatch in the
    // hot path; two int arrays, O(m log m) byte-range compares
    val idx = Array.range(0, m)
    val tmp = new Array[Int](m)
    def msort(lo: Int, hi: Int): Unit = {
      if (hi - lo < 2) return
      val mid = (lo + hi) >>> 1
      msort(lo, mid); msort(mid, hi)
      var a = lo; var b = mid; var k = lo
      while (a < mid && b < hi) {
        if (cmp(idx(a), idx(b)) <= 0) { tmp(k) = idx(a); a += 1 }
        else { tmp(k) = idx(b); b += 1 }
        k += 1
      }
      while (a < mid) { tmp(k) = idx(a); a += 1; k += 1 }
      while (b < hi) { tmp(k) = idx(b); b += 1; k += 1 }
      System.arraycopy(tmp, lo, idx, lo, hi - lo)
    }
    msort(0, m)
    var bestStart = 0 // position in `idx` where the best run begins
    var bestCount = 0
    var runStart = 0
    i = 1
    while (i <= m) {
      if (i == m || cmp(idx(runStart), idx(i)) != 0) {
        val runLen = i - runStart
        if (runLen > bestCount) { bestCount = runLen; bestStart = runStart }
        runStart = i
      }
      i += 1
    }
    val w = idx(bestStart)
    val blen = ends(w) - starts(w)
    val bytes = new Array[Byte](blen)
    var k = 0
    while (k < blen) { bytes(k) = s.getByte(starts(w) + k); k += 1 }
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(bytes), bestCount.toLong))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topNgramStats", this, classOf[TopNgramStats].getName)
    val c = child.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    val tmp = ctx.freshName("topGramRow")
    ev.copy(code = c.code + code"""
      final $rowCls $tmp = ${c.isNull} ? null : $ref.kernel(${c.value});
      final boolean ${ev.isNull} = $tmp == null;
      final $rowCls ${ev.value} = $tmp;""")
  }

  override protected def withNewChildInternal(newChild: Expression): TopNgramStats =
    copy(child = newChild)
}

object TopNgramStats {
  /** Column form: `top_ngram_stats(text, n)` → `struct(gram, cnt)`. */
  def apply(text: Column, n: Int): Column =
    toColumn(TopNgramStats(toExpression(text), n))
}
