package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType

/** Driver-built Bloom filters for map-side semi-join pruning.
  *
  * The 100 TB decontamination shape: the benchmark suite is metadata-scale
  * (thousands of documents) while the training corpus is the 100 TB side.
  * Building a Bloom filter of the benchmark shingle set on the driver and
  * shipping it as a literal into the corpus scan turns the overlap check
  * into a pure map-side filter — the only rows that ever reach a shuffle
  * are the candidates (true overlap + the configured false-positive rate),
  * and the exact verify join against the real benchmark set removes the
  * false positives, so the result is bit-identical to the exact join.
  *
  * This is the same mechanism Spark's AQE runtime filter injection uses
  * (`BloomFilterMightContain`); making it explicit lets us size the filter
  * from the small side's actual cardinality and place it before the
  * explode-side distinct, which AQE cannot do across our aggregate.
  */
object Bloom {

  /** Build a Bloom filter over a LongType column of `small` and serialize
    * it. Runs two driver-visible jobs over `small` (a count to size the
    * filter and a treeAggregate to fill it) — callers should pass the
    * already-small side (benchmark/dimension scale), ideally persisted.
    */
  def buildLong(small: DataFrame, colName: String, fpp: Double): Array[Byte] = {
    val n = small.count() max 1L // overestimate (pre-distinct) is safe: filter only gets bigger
    val bf = small.stat.bloomFilter(colName, n, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Predicate `bloom.mightContainLong(value)` as a codegen'd expression.
    * `value` must be LongType (we pass xxhash64 keys). No false negatives:
    * every member of the built set passes; non-members pass at ~fpp.
    */
  def mightContainLong(bloomBytes: Array[Byte], value: Column): Column =
    toColumn(BloomFilterMightContain(Literal(bloomBytes, BinaryType), toExpression(value)))
}
