package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The drift monitor's per-tick filesystem work must be O(1) in stream
  * lifetime (r17 verdict #2): the r17 shape re-walked the whole postings
  * tree every trigger (`recursiveFileLookup` — O(#batch-dirs) per tick,
  * quadratic over the stream's life against rate-limited cloud-store
  * LIST calls). [[VectorOps.DriftMonitorState]] replaces that with the
  * channel-source cursor discipline: each tick lists exactly its own
  * just-written batch dir, and a fresh state (the restart path) pays one
  * recovery enumeration before the cursor takes over. This suite drives
  * a growing batch count through the production tick and pins both
  * claims via the state's listing counter — a regression back to
  * tree-walking shows up as a counter that grows with batch count.
  */
class DriftTickListingSuite extends SparkSpec {

  private val Dim = 64

  private def vec(id: Long): Seq[Double] =
    (0 until Dim).map(j =>
      if (j == 0) (id % 13).toDouble + 1.0
      else (java.lang.Math.floorMod(id * 31L + j * 17L, 7L) - 3L) * 0.01)

  private def batchDf(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, vec(i.toLong))).toDF("vec_id", "v")
  }

  test("tick listing work stays constant as batch count grows") {
    val hist = batchDf(0 until 64)
    val centroids = VectorOps.ivfCentroids(hist.cache())
    try {
      val out = tmpDir("drift_tick_listing").toString
      val mon = new VectorOps.DriftMonitorState(spark, centroids, out)
      val listedPerTick = (0 until 8).map { t =>
        mon.tick(batchDf(t * 16 until (t + 1) * 16), t.toLong)
        mon.dirsListedLastTick
      }
      // tick 0 pays the one-time recovery enumeration of an empty root
      // (0 dirs found) + its own dir; every later tick lists exactly its
      // own batch dir — CONSTANT while the accumulated dir count grows 8×
      assert(listedPerTick.head == 1, s"first tick listed ${listedPerTick.head}")
      assert(listedPerTick.tail.forall(_ == 1),
        s"listing work grew with batch count: $listedPerTick — " +
        "the O(#batch-dirs) tree-walk is back")
      // the cursor still accumulated the full index: every batch's
      // postings are visible to the NEXT tick's probe (verdict rows
      // exist for all 8 triggers and postings cover all 128 + 64 ids)
      val postings = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$out/postings")
      assert(postings.count() == 8 * 16, "cursor lost a batch's postings")
      val verdicts = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$out/verdicts")
      assert(verdicts.count() == 8, "a tick failed to land its verdict row")

      // restart path: a FRESH state over the same tree pays one recovery
      // enumeration (8 committed dirs) plus its own dir, then returns to
      // the O(1) cursor — and a replayed trigger id is re-listed (its
      // dir was re-written), never served from a stale relation
      val mon2 = new VectorOps.DriftMonitorState(spark, centroids, out)
      mon2.tick(batchDf(112 until 128), 7L) // replay of the last trigger
      assert(mon2.dirsListedLastTick == 9,
        s"recovery listed ${mon2.dirsListedLastTick}, expected 8 dirs + own")
      mon2.tick(batchDf(128 until 144), 8L)
      assert(mon2.dirsListedLastTick == 1,
        s"post-recovery tick listed ${mon2.dirsListedLastTick}")
      val after = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$out/postings")
      assert(after.count() == 9 * 16,
        "replayed batch double-counted or new batch lost")
    } finally { hist.unpersist(); () }
  }

  test("compaction re-stages the base to ONE parquet dir and stays O(1)") {
    // r19 (r18 verdict finding #4): every compactEvery ticks the
    // accumulated union is re-staged to parquet under postings_base —
    // storage-backed, not block-manager-resident — the superseded
    // compact dir is deleted, and per-tick listing stays O(1): 1 dir on
    // plain ticks, 2 on a compaction tick (own batch + fresh base).
    val hist = batchDf(0 until 64)
    val centroids = VectorOps.ivfCentroids(hist.cache())
    try {
      val out = tmpDir("drift_tick_compact").toString
      val mon = new VectorOps.DriftMonitorState(spark, centroids, out,
        compactEvery = 3)
      val listedPerTick = (0 until 7).map { t =>
        mon.tick(batchDf(t * 16 until (t + 1) * 16), t.toLong)
        mon.dirsListedLastTick
      }
      // ticks 2 and 5 compact (perBatch reaches 3); tick 0 additionally
      // pays the empty recovery enumeration (0 dirs found)
      assert(listedPerTick == Seq(1, 1, 2, 1, 1, 2, 1),
        s"listing per tick: $listedPerTick — compaction broke the O(1) cursor")
      val baseRoot = new java.io.File(s"$out/postings_base")
      val baseDirs = baseRoot.listFiles().map(_.getName).sorted.toSeq
      assert(baseDirs == Seq("c5"),
        s"superseded compact dirs not reclaimed: $baseDirs")
      // the compacted base + cursor still hold the FULL accumulated
      // index: the compact dir carries ticks 0..5, perBatch tick 6, and
      // every tick's verdict row probed a complete accumulation (12
      // probes per trigger — the denominator rides the probe job)
      val baseRows = spark.read.parquet(s"$out/postings_base/c5").count()
      assert(baseRows == 6 * 16, s"compacted base carries $baseRows rows")
      val verdicts = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$out/verdicts")
      assert(verdicts.count() == 7, "a tick failed to land its verdict row")
      assert(verdicts.agg(org.apache.spark.sql.functions.sum(col("n_probes")))
        .head().getLong(0) == 7 * 12,
        "a tick's probe denominator under-filled")
    } finally { hist.unpersist(); () }
  }
}
