package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: when one side has hot keys too large for a single
  * shuffle partition and the other side is too big to broadcast, salt the
  * skewed side into `saltFactor` sub-keys and replicate the other side
  * once per salt. AQE's skew-join handles moderate skew automatically;
  * this is the explicit form for pathological keys (and for engines/plans
  * where AQE is off).
  *
  * Cost model: shuffle volume of the replicated side × saltFactor — use
  * the smallest factor that splits the hot key under the partition-size
  * target.
  */
object SkewOps {

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // spread each skewed row across salts; spark_partition_id+offset is
    // deterministic per task layout, monotonically unique per row
    val saltedBig = skewed.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
