package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Exactness contract for the incremental BPE refresh seam
  * (q_incremental_bpe_merges): the refresh-trained merge table must
  * EQUAL a full retrain on the union corpus — including on a corpus
  * where the new batch FLIPS a round winner, the case a
  * freeze-the-prefix-and-extend refresh gets wrong (the stored prefix
  * would keep the stale winner). Also pins replay idempotence and the
  * single-derivation artifact contract (the IncrementalDedupSuite
  * shape).
  */
class IncrementalBpeSuite extends SparkSpec {

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def merges(name: String, dir: String): Seq[(Int, String, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq

  test("refresh == full retrain when the new batch flips the round-1 winner") {
    // hist (ids ≢ 0 mod 8): pair (x y) count 5, (z w) count 3 — hist-only
    // round-1 winner is "x y". New batch (id 8) adds 4 more (z w): union
    // winner flips to "z w" (7 > 5). An extend-only refresh would keep
    // "x y" first; the exact seam must re-select.
    val hist = Seq(
      1L -> "xy xy xy xy xy",
      2L -> "zw zw zw")
    val newBatch = Seq(8L -> "zw zw zw zw")

    val union = tmpDir("incbpe_union").toString
    writeDocs(union, hist ++ newBatch)
    val histOnly = tmpDir("incbpe_hist").toString
    writeDocs(histOnly, hist)

    val root = tmpDir("incbpe_art")
    spark.conf.set("graft.artifacts.root", root.toString)
    try {
      val refresh = merges("q_incremental_bpe_merges", union)
      val full = merges("q_bpe_merges", union)
      assert(refresh == full,
        s"refresh-trained diverged from full retrain:\n$refresh\nvs\n$full")
      // non-vacuity: the new batch really flipped the round-1 winner —
      // otherwise this corpus wouldn't distinguish exact from extend-only
      val histFirst = merges("q_bpe_merges", histOnly).head._2
      assert(histFirst == "x y" && full.head._2 == "z w",
        s"crafted flip missing: hist-only first=$histFirst, union first=${full.head._2}")
      // replay idempotence + the hist artifact derived exactly once —
      // and SHARED with the WordPiece refresh (asserted here, on this
      // test's unique dataset dir: the sf0.001 key can be staged by
      // another suite under the default root, so an artifact count
      // there would be test-order dependent)
      assert(merges("q_incremental_bpe_merges", union) == refresh)
      SparkEntry.queries("q_incremental_wordpiece_merges")(spark, union).collect()
      val artDirs = root.toFile.listFiles()
        .filter(_.getName.startsWith("graft_art_inc_tok_wordfreq"))
      assert(artDirs.length == 1,
        s"bpe+wordpiece must share one stored word-freq artifact, got " +
        artDirs.map(_.getName).mkString(","))
    } finally spark.conf.unset("graft.artifacts.root")
  }

  test("wordpiece refresh == full retrain when the new batch flips the likelihood winner") {
    // WordPiece picks by c(ab)/(c(a)·c(b)) — rare-UNIT pairs score high,
    // so a new batch can demote a winner by inflating its unit counts
    // without touching the pair itself. hist: "a b" scores 1/(1·1)=1,
    // "c d" scores 1/(6·6). New batch adds 20 bare "a" and "b" words:
    // union "a b" drops to 1/(21·21) < 1/36 — the winner flips to "c d".
    val hist = Seq(
      1L -> "ab cd",
      2L -> "c c c c c d d d d d")
    val newBatch = Seq(8L -> (("a " * 20) + ("b " * 20)).trim)

    val union = tmpDir("incwp_union").toString
    writeDocs(union, hist ++ newBatch)
    val histOnly = tmpDir("incwp_hist").toString
    writeDocs(histOnly, hist)

    val root = tmpDir("incwp_art")
    spark.conf.set("graft.artifacts.root", root.toString)
    try {
      def rows(name: String, dir: String): Seq[String] =
        SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      val refresh = rows("q_incremental_wordpiece_merges", union)
      val full = rows("q_wordpiece_merges", union)
      assert(refresh == full,
        s"wp refresh diverged from full retrain:\n$refresh\nvs\n$full")
      def firstPair(dir: String): String =
        SparkEntry.queries("q_wordpiece_merges")(spark, dir)
          .collect().head.getString(1)
      assert(firstPair(histOnly) == "a b" && firstPair(union) == "c d",
        s"crafted flip missing: hist-only first=${firstPair(histOnly)}, " +
        s"union first=${firstPair(union)}")
    } finally spark.conf.unset("graft.artifacts.root")
  }

  test("refresh == full retrain on the real sf0.001 corpus — all three trainer families") {
    val d = "/root/testdata/sf0.001"
    val root = tmpDir("incbpe_sf").toString
    spark.conf.set("graft.artifacts.root", root)
    try {
      val refresh = merges("q_incremental_bpe_merges", d)
      val full = merges("q_bpe_merges", d)
      assert(refresh.nonEmpty && refresh == full,
        s"bpe refresh diverged at sf0.001:\n$refresh\nvs\n$full")
      def rows(name: String): Seq[String] =
        SparkEntry.queries(name)(spark, d).collect().map(_.toString).toSeq
      // WordPiece rides the SAME stored word-freq state; unigram has its
      // own (w, f) artifact — both must retrain to the full model
      val wpR = rows("q_incremental_wordpiece_merges")
      val wpF = rows("q_wordpiece_merges")
      assert(wpR.nonEmpty && wpR == wpF,
        s"wordpiece refresh diverged at sf0.001:\n$wpR\nvs\n$wpF")
      val ugR = rows("q_incremental_unigram_tokenizer")
      val ugF = rows("q_unigram_tokenizer")
      assert(ugR.nonEmpty && ugR == ugF,
        s"unigram refresh diverged at sf0.001:\n$ugR\nvs\n$ugF")
    } finally spark.conf.unset("graft.artifacts.root")
  }
}
