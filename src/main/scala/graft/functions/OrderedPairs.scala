package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}

/** `ordered_pairs(array<long>)` → `array<struct<doc_a, doc_b>>`: every
  * ordered element pair (i < j) of the input array, in one tight loop.
  *
  * This is the pair-emission kernel of the per-key-group dedup joins
  * (q_ngram_jaccard / q_winnow_dedup verify): each shingle/gram group's
  * sorted doc list explodes into its ordered doc pairs IN PLACE — one
  * shuffle on the key, no self-join. The HOF formulation it replaces
  * (`flatten(transform(ds, (x,i) => transform(slice(ds, i+2, …), …)))`)
  * evaluates an interpreted lambda per element and materializes a sliced
  * copy of the tail per OUTER element — O(m²) interpreted allocations per
  * group across millions of groups. Semantics are identical for a sorted,
  * non-null input (which `sort_array(collect_set/collect_list)` supplies):
  * output order is (i,j) lexicographic, exactly the flatten order.
  *
  * Real `doGenCode` for the usual stage-fusion reason: a fallback here
  * would split the enclosing WholeStageCodegen span of the whole
  * aggregate→explode→count chain.
  */
case class OrderedPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "ordered_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }

  private val Empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Empty else nullSafeEval(v)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  /** Public for the generated code path (called through a reference obj). */
  def kernel(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m < 2) return Empty
    val out = new Array[Any](m * (m - 1) / 2)
    var k = 0
    var i = 0
    while (i < m - 1) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < m) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Public for the generated code's null branch. */
  def emptyResult: ArrayData = Empty

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("orderedPairs", this, classOf[OrderedPairs].getName)
    val c = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = c.code + code"""
        final $arrCls ${ev.value} = ${c.isNull}
          ? $ref.emptyResult() : $ref.kernel(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  /** Column form: `ordered_pairs(sortedIds)`. */
  def apply(sortedIds: Column): Column =
    toColumn(OrderedPairs(toExpression(sortedIds)))
}
