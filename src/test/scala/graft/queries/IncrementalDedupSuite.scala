package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Crafted-corpus contract for the incremental cross-snapshot dedup:
  * new-vs-old pairs surface, new-vs-new pairs surface, old-vs-old pairs
  * are NEVER reported (they were settled by the previous snapshot's
  * run), and a replayed increment is idempotent — same output, and the
  * historical band index derives exactly once (one artifact dir under
  * the configured root across both runs).
  */
class IncrementalDedupSuite extends SparkSpec {

  test("new-vs-old and new-vs-new pairs found; old-vs-old excluded; replay idempotent") {
    import spark.implicits._
    val dir = tmpDir("incdedup").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (1 to 40).map(i => s"alt$i").mkString(" ")
    val third = (1 to 40).map(i => s"mid$i").mkString(" ")
    // doc_id % 8 == 0 → new batch. Pairs by construction:
    //   old 1 ≈ old 2      (same text)  → settled previously, EXCLUDED
    //   new 8 ≈ old 3      (same text)  → new-vs-old, reported
    //   new 16 ≈ new 24    (same text)  → new-vs-new, reported
    //   new 32 unique                    → nothing
    val docs = Seq(
      (1L, base), (2L, base), (3L, other),
      (8L, other), (16L, third), (24L, third),
      (32L, (1 to 40).map(i => s"uniq$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val root = tmpDir("incdedup_art")
    spark.conf.set("graft.artifacts.root", root.toString)
    try {
      def run() = SparkEntry.queries("q_incremental_dedup")(spark, dir)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val first = run()
      assert(first == Seq((3L, 8L), (16L, 24L)), s"pairs=$first")
      // replayed increment: identical output, no duplicated pairs
      val second = run()
      assert(second == first, s"replay diverged: $second vs $first")
      // the historical index derived ONCE across both runs
      val artDirs = root.toFile.listFiles()
        .filter(_.getName.startsWith("graft_art_inc_band_index"))
      assert(artDirs.length == 1,
        s"expected one stored band index, got ${artDirs.map(_.getName).mkString(",")}")
    } finally spark.conf.unset("graft.artifacts.root")
  }

  test("index maintenance: appending an increment's bands closes the refresh loop") {
    // the full production cycle: snapshot index → increment 1 deduped
    // against it → increment 1's bands APPENDED (plain parquet append,
    // no historical recompute) → increment 2 deduped against the grown
    // index, finding pairs vs the ORIGINAL corpus and vs increment 1
    import spark.implicits._
    val mk = (id: Long, base: String) =>
      (id, (1 to 40).map(i => s"$base$i").mkString(" "))
    val hist = Seq(mk(1L, "tok"), mk(2L, "alt")) // snapshot corpus
    val inc1 = Seq(mk(10L, "alt"), mk(11L, "new")) // 10 ≈ old 2
    val inc2 = Seq(mk(20L, "tok"), mk(21L, "new")) // 20 ≈ old 1, 21 ≈ inc1's 11
    def docsDf(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
    val idx = tmpDir("incdedup_idx").resolve("bands").toString
    DedupOps.bandIndex(docsDf(hist)).write.mode("overwrite").parquet(idx)

    def step(inc: Seq[(Long, String)]): Set[(Long, Long)] = {
      val newBands = DedupOps.bandIndex(docsDf(inc)).localCheckpoint()
      val pairs = DedupOps.incrementalCandidatePairs(
          spark.read.parquet(idx), newBands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      newBands.write.mode("append").parquet(idx) // maintenance: grow the index
      pairs
    }
    assert(step(inc1) == Set((2L, 10L)), "increment 1 must pair with the snapshot")
    assert(step(inc2) == Set((1L, 20L), (11L, 21L)),
      "increment 2 must pair with BOTH the original corpus and increment 1")
  }
}
