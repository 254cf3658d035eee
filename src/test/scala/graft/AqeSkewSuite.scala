package graft

import org.apache.spark.sql.functions._

/** The hot-key shuffle posture at 100 TB: a skewed shuffle join must be
  * re-planned by AQE at runtime (OptimizeSkewedJoin splitting the hot
  * partition), not left to one straggler reducer. This pins the runtime
  * behavior the SCALE.md salting/AQE story relies on — a conf regression
  * (AQE off, skew-join disabled, thresholds broken) fails here instead
  * of surfacing as a mystery straggler on real data.
  */
class AqeSkewSuite extends SparkSpec {

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed side of a shuffle join at runtime") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // 90% of the left lands on key 0 — the boilerplate-domain /
      // null-surrogate hot key every real corpus has
      val left = spark.range(0, 12000).select(
        when(col("id") % 10 =!= 0, 0L).otherwise(col("id") % 100).as("k"),
        concat(lit("pad-payload-to-make-rows-wide-"), col("id")).as("v"))
      val right = spark.range(0, 3000).select(
        (col("id") % 100).as("k"), col("id").as("w"))
      val joined = left.join(right, "k")
      // collect() executes THIS Dataset's QueryExecution — count()/foreach
      // build their own and leave joined's adaptive plan unfinalized
      val n = joined.collect().length.toLong
      val expected = left.join(broadcast(right), "k").count()
      assert(n == expected, s"skew-split join lost/duplicated rows: $n vs $expected")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot partition:\n${plan.take(2000)}")
    }
  }
}
