package graft.queries

import graft.SparkSpec

/** Crafted-graph cases for the incremental label merge behind
  * q_incremental_dedup_clusters — above all the BRIDGE case: a new doc
  * whose pairs connect two previously-separate historical clusters must
  * merge them to the global min label, exactly as a full re-cluster
  * would. Exactness rides on min-labeling being associative over graph
  * unions; these tests pin the claim on graphs where each mechanism
  * (bridge, absorption, new-new chain, isolation, new-id-as-min) acts
  * alone.
  */
class IncrementalCcSuite extends SparkSpec {

  private def labels(hist: Seq[(Long, Long)], pairs: Seq[(Long, Long)],
      newIds: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    DedupOps.mergeIncrementalLabels(
        hist.toDF("node", "component"),
        pairs.toDF("doc_a", "doc_b"),
        newIds.toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a new doc bridging two historical clusters merges them to the min label") {
    // hist: {1,2} labeled 1, {5,6} labeled 5; new doc 8 pairs with 2 AND 6
    val got = labels(
      hist = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)),
      pairs = Seq((2L, 8L), (6L, 8L)),
      newIds = Seq(8L, 16L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 8L -> 1L, 16L -> 16L),
      s"bridge must merge both clusters to label 1; isolated new doc labels itself: $got")
  }

  test("a new doc with the global-min id renames the cluster it joins") {
    // new doc 0 joins {3,4} (labeled 3) — the merged label must be 0
    val got = labels(
      hist = Seq((3L, 3L), (4L, 3L), (9L, 9L)),
      pairs = Seq((0L, 4L)),
      newIds = Seq(0L))
    assert(got == Map(0L -> 0L, 3L -> 0L, 4L -> 0L, 9L -> 9L), s"$got")
  }

  test("new-new chains propagate through historical components transitively") {
    // 8-24 new-new, 24 absorbs into {7} — all three collapse to 7;
    // untouched {11,12} keeps its label
    val got = labels(
      hist = Seq((7L, 7L), (11L, 11L), (12L, 11L)),
      pairs = Seq((8L, 24L), (7L, 24L)),
      newIds = Seq(8L, 24L))
    assert(got == Map(7L -> 7L, 8L -> 7L, 24L -> 7L, 11L -> 11L, 12L -> 11L), s"$got")
  }

  test("stored-label and new-id domains are disjoint at sf0.001 (real predicate)") {
    // The merge algebra maps a pair end to its GROUP id — stored label
    // for historical ends, own id for new ends — and a collision between
    // the two domains would conflate a new doc with a historical cluster
    // in the mini graph. Disjointness holds by construction as long as
    // every engine-side split reads the ONE isNewDoc predicate (labels
    // are min ids of ¬isNewDoc docs; new ids satisfy isNewDoc); this
    // pins it against a future predicate edit drifting one call site
    // (ADVICE r15 #2). Runs the REAL artifact derivation at sf0.001.
    val d = "/root/testdata/sf0.001"
    val root = tmpDir("inccc_art")
    spark.conf.set("graft.artifacts.root", root.toString)
    try {
      val labels = DedupOps.histCcLabels(spark, d)
        .select(org.apache.spark.sql.functions.col("component")).distinct()
      val newIds = graft.Tables.documents(spark, d)
        .filter(DedupOps.isNewDoc)
        .select(org.apache.spark.sql.functions.col("doc_id").as("component"))
      assert(newIds.limit(1).count() == 1L, "vacuous: no new-batch docs at sf0.001")
      val clash = labels.join(newIds, Seq("component"), "left_semi").count()
      assert(clash == 0L,
        s"$clash stored labels collide with new-batch ids — the incremental " +
        "label merge would conflate them; did a call site's batch predicate drift?")
    } finally spark.conf.unset("graft.artifacts.root")
  }

  test("no pairs: historical labels unchanged, new docs label themselves") {
    val got = labels(
      hist = Seq((1L, 1L), (2L, 1L)),
      pairs = Seq.empty,
      newIds = Seq(8L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 8L -> 8L), s"$got")
  }
}
