package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<double>` columns, composed from
  * codegen'd higher-order functions (zip_with / aggregate) — no UDFs, so
  * the dot products stay inside WholeStageCodegen.
  *
  * Scale path: brute-force cosine is the correctness baseline; ANN via
  * sign-random-projection LSH (`SignLsh`) buckets vectors so the
  * candidate join is an equi-join on bucket id instead of a cross join.
  */
object VectorFunctions {

  /** Sequential dot product — native expression ([[VectorExpressions]]);
    * same accumulation order as a left fold over zip_with. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  /** Euclidean distance (squared), for IVF-style assignment. */
  def sqDist(a: Column, b: Column): Column = VectorExpressions.sqDist(a, b)

  /** The HOF formulations, kept for plans that must stay pure-builtin
    * (e.g. when shipping SQL text instead of a library call). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))
}

/** Sign-random-projection LSH for approximate nearest neighbor: `nPlanes`
  * fixed pseudo-random hyperplanes; a vector's bucket is the bit pattern of
  * dot-product signs. Cosine-similar vectors collide with high probability.
  * Deterministic: planes come from a seeded LCG expanded at plan time into
  * literal arrays (no runtime randomness — resumable, cluster-reproducible).
  */
object SignLsh {

  /** Deterministic plane components in [-0.5, 0.5) from a 64-bit LCG. */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): IndexedSeq[IndexedSeq[Double]] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    IndexedSeq.fill(nPlanes)(IndexedSeq.fill(dim)(next()))
  }

  /** Bucket id column: bit b set iff dot(v, plane_b) > 0. */
  def bucket(v: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val ps = planes(nPlanes, dim, seed)
    (0 until nPlanes).map { b =>
      val plane = array(ps(b).map(lit): _*)
      when(VectorFunctions.dot(v, plane) > 0.0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }
}
