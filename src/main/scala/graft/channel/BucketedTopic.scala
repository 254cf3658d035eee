package graft.channel

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed topics: co-located storage for the joins that dominate a
  * 100 TB deployment. A topic bucketed by its join key writes each bucket
  * to a fixed file set (hash(key) → bucket), so a join between two topics
  * bucketed the same way needs NO shuffle exchange on either side —
  * Catalyst recognizes the bucketing as a satisfying output partitioning.
  *
  * This intentionally uses Spark's managed-table bucketing (`bucketBy` +
  * `saveAsTable`): bucketing metadata must live in a catalog for the
  * optimizer to trust it, which plain directory topics can't provide.
  * Use for the heavy, repeatedly-joined fact streams; plain channels
  * remain the general transport.
  */
final class BucketedTopic(val spark: SparkSession, val name: String,
                          val bucketKey: String, val numBuckets: Int) {

  /** Append a batch, bucketed and sorted by the key. */
  def append(df: DataFrame): Unit =
    df.write
      .bucketBy(numBuckets, bucketKey)
      .sortBy(bucketKey)
      .mode(if (spark.catalog.tableExists(name)) "append" else "errorifexists")
      .saveAsTable(name)

  def read(): DataFrame = spark.table(name)

  /** Shuffle-free equi-join with another topic bucketed identically. */
  def colocatedJoin(other: BucketedTopic): DataFrame = {
    require(other.bucketKey == bucketKey && other.numBuckets == numBuckets,
      s"topics must share bucketing: ($bucketKey,$numBuckets) vs " +
        s"(${other.bucketKey},${other.numBuckets})")
    read().join(other.read(), bucketKey)
  }
}

object BucketedTopic {
  def create(spark: SparkSession, name: String, bucketKey: String,
             numBuckets: Int): BucketedTopic =
    new BucketedTopic(spark, name, bucketKey, numBuckets)
}
