package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product quantization for embedding columns: split a dim-d vector into
  * `m` subvectors, quantize each against a per-subspace codebook of `k`
  * centroids, and store only the m byte-sized codes — a 64× compression
  * of a 64-dim f64 vector at m=8. Approximate distances then come from
  * code lookups (ADC), not vector arithmetic.
  *
  * All training passes are distributed (sampled init + one Lloyd step per
  * subspace, computed for ALL subspaces in one shuffle); only the m×k×sub
  * codebook matrix ever reaches the driver. At 100 TB this is the standard
  * memory-bound ANN path: codes fit in RAM where raw vectors cannot.
  */
object ProductQuantizer {

  type Codebooks = IndexedSeq[IndexedSeq[IndexedSeq[Double]]] // [m][k][sub]

  /** Train codebooks: `k` stride-sampled vectors seed each subspace
    * (matches the data distribution, same rationale as q_ann_ivf), then
    * one Lloyd step refines every subspace in a single distributed
    * aggregation.
    */
  def train(df: DataFrame, vCol: String, idCol: String,
            m: Int = 8, k: Int = 16): Codebooks = {
    val dim = df.select(size(col(vCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val n = df.count()
    val stride = math.max(1L, n / k)
    val sampled = df
      .filter(col(idCol) % stride === 0 && col(idCol) < stride * k)
      .orderBy(col(idCol)).select(col(vCol))
      .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    require(sampled.nonEmpty, s"no seed vectors sampled (n=$n, idCol=$idCol)")
    // a tiny corpus (or sparse ids) can yield fewer than k seeds — clamp
    // the codebook size rather than indexing past the sample
    val kEff = math.min(k, sampled.length)
    val init: Codebooks = (0 until m).map(s =>
      sampled.take(kEff).map(v => v.slice(s * sub, (s + 1) * sub)))
    // One Lloyd step for all m subspaces in one pass: explode (dim, x),
    // recover (subspace, code, subdim) per element, mean per cell.
    val means = df
      .withColumn("_codes", encode(col(vCol), init))
      .select(col("_codes"), posexplode(col(vCol)).as(Seq("pos", "x")))
      .select((col("pos") / sub).cast("int").as("s"),
        (col("pos") % sub).as("sd"),
        element_at(col("_codes"), (col("pos") / sub).cast("int") + 1).as("code"),
        col("x"))
      .groupBy(col("s"), col("code"), col("sd"))
      .agg(avg(col("x")).as("mv"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .view.mapValues(rows =>
        rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toIndexedSeq).toMap
    (0 until m).map { s =>
      (0 until kEff).map { c =>
        means.getOrElse((s, c), init(s)(c)) // empty cell keeps its seed
      }.toIndexedSeq
    }.toIndexedSeq
  }

  /** Code column: array<int> of the argmin centroid per subspace. */
  def encode(v: Column, codebooks: Codebooks): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(PqEncode(toExpression(v), codebooks))
  }

  /** Per-query ADC lookup table, flattened [m*k]: squared distance from
    * the query's s-th subvector to centroid c of subspace s. Driver-side,
    * m×k doubles — broadcast as a plain literal. */
  def adcTable(q: IndexedSeq[Double], codebooks: Codebooks): IndexedSeq[Double] = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    (0 until m).flatMap { s =>
      codebooks(s).map { cent =>
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val d = q(s * sub + i) - cent(i); acc += d * d; i += 1
        }
        acc
      }
    }
  }

  /** Approximate squared distance: Σ_s table[s*k + code_s]. */
  def adc(codes: Column, table: IndexedSeq[Double], k: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(PqAdc(toExpression(codes), table, k))
  }
}

/** Fused PQ encoder: argmin centroid per subspace in one pass over the
  * vector; codebooks are constructor values, not literal subtrees (same
  * plan-size rationale as [[SignLshBuckets]]). Real `doGenCode` (round
  * 7): the kernel runs once per input row, but a CodegenFallback split
  * the encode stage out of WholeStageCodegen — the generated code calls
  * the kernel through a reference object, keeping the stage fused. */
case class PqEncode(child: Expression, codebooks: ProductQuantizer.Codebooks)
    extends UnaryExpression {
  private val m = codebooks.length
  private val k = codebooks.head.length
  private val sub = codebooks.head.head.length

  override def dataType: DataType = ArrayType(IntegerType, false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  @transient private lazy val flat: Array[Double] = // [m][k][sub] row-major
    codebooks.flatten.flatten.toArray

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  /** Public for the generated code path (called through a reference obj). */
  def kernel(v: ArrayData): ArrayData = {
    require(v.numElements() == m * sub,
      s"vector length mismatch: ${v.numElements()} vs ${m * sub}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (s * k + c) * sub
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val d = v.getDouble(s * sub + i) - flat(base + i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC distance: sum of per-subspace table lookups — 8 additions per row
  * instead of a 64-dim vector kernel; same codegen stance as
  * [[PqEncode]]. */
case class PqAdc(child: Expression, table: IndexedSeq[Double], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int> codes, got ${other.simpleString}")
  }

  @transient private lazy val flat: Array[Double] = table.toArray

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  /** Public for the generated code path (called through a reference obj). */
  def kernel(codes: ArrayData): Double = {
    var acc = 0.0
    var s = 0
    val m = codes.numElements()
    while (s < m) { acc += flat(s * k + codes.getInt(s)); s += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
