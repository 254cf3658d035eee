package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSuite extends SparkSpec {
  import spark.implicits._

  test("asOf picks the latest at-or-before right row per key") {
    val trades = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 15L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq((100L, "a", 5L, 1.0), (101L, "a", 10L, 2.0),
      (102L, "a", 19L, 3.0), (103L, "b", 99L, 9.0))
      .toDF("quote_id", "sym", "t", "px")
    val out = TemporalJoins.asOf(trades,
        quotes.withColumnRenamed("quote_id", "qid"),
        keys = Seq("sym"), order = Seq("t"), payload = Seq("qid", "px"))
      .orderBy("trade_id")
      .select("trade_id", "asof_qid", "asof_px")
      .as[(Long, Option[Long], Option[Double])].collect()
    // trade 1 at t=10: quote 101 (t=10 ties match, at-or-before)
    assert(out(0) == ((1L, Some(101L), Some(2.0))))
    // trade 2 at t=20: quote 102 (t=19)
    assert(out(1) == ((2L, Some(102L), Some(3.0))))
    // trade 3 ("b" at t=15): only quote is t=99 (after) -> null payload
    assert(out(2) == ((3L, None, None)))
  }

  test("asOf left rows survive with null payload when right side is empty for the key") {
    val l = Seq((1L, "x", 5L)).toDF("id", "k", "t")
    val r = Seq.empty[(Long, String, Long, Double)].toDF("rid", "k", "t", "v")
    val out = TemporalJoins.asOf(l, r, Seq("k"), Seq("t"), Seq("rid", "v"))
      .select("id", "asof_rid").as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq((1L, None)))
  }

  test("pointInterval matches [lo, hi) exactly, no duplicates across buckets") {
    val pts = Seq((1L, 10.0), (2L, 15.0), (3L, 25.0), (4L, 24.999), (5L, 9.999))
      .toDF("pid", "x")
    // interval [10, 25) spans buckets 1..5 at width 5 — a point must match
    // at most once despite the interval exploding to 4 buckets
    val iv = Seq((100L, 10.0, 25.0)).toDF("ivid", "lo", "hi")
    val out = TemporalJoins.pointInterval(pts, iv, "x", "lo", "hi", bucketWidth = 5.0)
      .select("pid", "ivid").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 100L), (2L, 100L), (4L, 100L)))
  }

  test("pointInterval plans an equi-join on bucket, not a nested loop") {
    val pts = Seq((1L, 10.0)).toDF("pid", "x")
    val iv = Seq((100L, 5.0, 15.0)).toDF("ivid", "lo", "hi")
    val plan = TemporalJoins.pointInterval(pts, iv, "x", "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }

  test("pointInterval handles negative coordinates (floor-division buckets)") {
    val pts = Seq((1L, -7.0), (2L, -5.0), (3L, -10.0), (4L, -4.9)).toDF("pid", "x")
    val iv = Seq((9L, -10.0, -5.0)).toDF("ivid", "lo", "hi") // [-10, -5)
    val out = TemporalJoins.pointInterval(pts, iv, "x", "lo", "hi", bucketWidth = 5.0)
      .select("pid").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L)) // -7 and -10 in; -5 excluded (hi), -4.9 out
  }

  test("asOf plans zero joins: one keyed window over the tagged union") {
    val l = Seq((1L, "k", 5L)).toDF("id", "k", "t")
    val r = Seq((2L, "k", 3L, 1.0)).toDF("rid", "k", "t", "v")
    val plan = TemporalJoins.asOf(l, r, Seq("k"), Seq("t"), Seq("rid", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asOf must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected the window formulation:\n$plan")
  }

  test("q_asof_join and q_range_join run on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val asof = SparkEntry.queries("q_asof_join")(spark, d)
    assert(asof.count() > 0)
    val rj = SparkEntry.queries("q_range_join")(spark, d)
    assert(rj.count() > 0)
  }
}
