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

/** Coarse-quantizer training for IVF: one Lloyd (k-means) step refines a
  * centroid set against the data. All heavy work is distributed (argmin
  * assignment + per-(cell,dim) mean); only the k×dim centroid matrix ever
  * reaches the driver — legitimate at any scale.
  */
object KMeans {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  def assignCell(df: DataFrame, vCol: String, centroids: Seq[Seq[Double]]): DataFrame =
    df.withColumn("cell", element_at(
      VectorExpressions.nearestCells(
        col(vCol), centroids.map(_.toIndexedSeq).toIndexedSeq, 1), 1))

  /** `iters` Lloyd steps (each one distributed pass + k×dim driver
    * matrix). Returns after convergence-by-iteration-count; k-means on a
    * sampled-seed codebook typically stabilizes in a handful of steps. */
  def lloydSteps(df: DataFrame, vCol: String, centroids: Seq[Seq[Double]],
                 iters: Int): IndexedSeq[IndexedSeq[Double]] =
    (1 to iters).foldLeft(centroids.map(_.toIndexedSeq).toIndexedSeq) {
      (c, _) => lloydStep(df, vCol, c)
    }

  /** One Lloyd step: assign, recompute per-cell means. Cells that lose all
    * members keep their previous centroid. */
  def lloydStep(df: DataFrame, vCol: String,
                centroids: Seq[Seq[Double]]): IndexedSeq[IndexedSeq[Double]] = {
    val means = assignCell(df, vCol, centroids)
      .select(col("cell"), posexplode(col(vCol)).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(rows =>
        rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq).toMap
    centroids.indices.map(c => means.getOrElse(c, centroids(c).toIndexedSeq)).toIndexedSeq
  }
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
  def bucket(v: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    bucketFrom(v, planes(nPlanes, dim, seed))

  private def bucketFrom(v: Column, ps: IndexedSeq[IndexedSeq[Double]]): Column =
    ps.indices.map { b =>
      val plane = array(ps(b).map(lit): _*)
      when(VectorFunctions.dot(v, plane) > 0.0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)

  /** Multi-table LSH: element `t` of the result array is table `t`'s
    * bucket id. A single many-plane table has recall p^planes — tiny for
    * weakly-clustered vectors; L independent few-plane tables recall
    * 1-(1-p^k)^L. Measured on the test embeddings (recall@1 of the true
    * nearest neighbor landing in a shared bucket): 1×6 planes = 0.04,
    * 16 tables × 4 planes = 0.93. Candidates are still equi-join bounded:
    * per-table buckets hold ~n/2^k vectors.
    *
    * All tables hash in one fused pass ([[SignLshBuckets]]); the sign
    * logic and per-plane accumulation order are identical to the
    * per-plane [[bucket]] form, so bucket ids agree bit-for-bit. */
  def bucketTables(v: Column, nTables: Int = 16, nPlanes: Int = 4,
                   dim: Int = 64, seed: Long = 42L): Column =
    VectorExpressions.signLshBuckets(
      v, planes(nTables * nPlanes, dim, seed), nTables, nPlanes)
}
