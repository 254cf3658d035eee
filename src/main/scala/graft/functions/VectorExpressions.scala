package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path. The higher-order
  * `zip_with`/`aggregate` forms evaluate an interpreted lambda per array
  * element (~dim × 3 closures per row); these expressions loop over
  * primitive double arrays instead — one virtual call per ROW, not per
  * element. Measured ~8× on the kNN join. Eval-mode (CodegenFallback) is
  * sufficient: the loop body is already JIT-friendly primitive code.
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def compute(x: Array[Double], y: Array[Double]): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    require(x.length == y.length,
      s"vector length mismatch: ${x.length} vs ${y.length}")
    compute(x, y)
  }
}

/** Sequential-order dot product (bit-parity with a left fold). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def compute(x: Array[Double], y: Array[Double]): Double = {
    var dot = 0.0
    var i = 0
    while (i < x.length) { dot += x(i) * y(i); i += 1 }
    dot
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Cosine similarity: dot / (‖x‖·‖y‖), all three accumulations
  * left-to-right (same result as the HOF formulation it replaces). */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def compute(x: Array[Double], y: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < x.length) {
      dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Squared Euclidean distance (IVF assignment metric). */
case class SqDist(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def compute(x: Array[Double], y: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < x.length) { val d = x(i) - y(i); acc += d * d; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

object VectorExpressions {
  import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
  def dot(a: Column, b: Column): Column = toColumn(DotProduct(toExpression(a), toExpression(b)))
  def cosine(a: Column, b: Column): Column = toColumn(CosineSim(toExpression(a), toExpression(b)))
  def sqDist(a: Column, b: Column): Column = toColumn(SqDist(toExpression(a), toExpression(b)))
}
