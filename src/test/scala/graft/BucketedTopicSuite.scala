package graft

import graft.channel.BucketedTopic
import org.apache.spark.sql.functions._

/** Proves the co-located join claim: two topics bucketed on the same key
  * join with NO shuffle exchange in the physical plan. */
class BucketedTopicSuite extends SparkSpec {
  import spark.implicits._

  test("identically-bucketed topics join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_items")
    try {
      val a = BucketedTopic.create(spark, "bt_orders", "k", 4)
      val b = BucketedTopic.create(spark, "bt_items", "k", 4)
      a.append((1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "o"))
      b.append((1 to 1000).flatMap(i => Seq((i.toLong, s"i$i"))).toDF("k", "it"))

      val joined = a.colocatedJoin(b)
      assert(joined.count() == 1000)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")

      // contrast: the same join over unbucketed data DOES exchange
      val ua = (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "o")
      val ub = (1 to 1000).map(i => (i.toLong, s"i$i")).toDF("k", "it")
      val uj = ua.join(ub, "k")
      uj.collect()
      assert(uj.queryExecution.executedPlan.toString().contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bt_orders")
      spark.sql("DROP TABLE IF EXISTS bt_items")
    }
  }
}
