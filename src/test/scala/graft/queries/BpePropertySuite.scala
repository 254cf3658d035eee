package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Randomized cross-check of the BPE training queries against an
  * INDEPENDENT driver-side reference implementation. The DuckDB oracle
  * is generated from the same algorithm spec as the engine, so an
  * algorithmic misunderstanding (wrong tie-break, wrong overlap rule,
  * wrong greedy-selection window) could pass the gate on both sides —
  * this suite re-derives the expected merges with plain sequential
  * Scala (greedy left-to-right is literally a while-loop scan here, so
  * the islands/parity rule EMERGES instead of being re-encoded) and
  * pins engine == reference on seeded random corpora.
  */
class BpePropertySuite extends SparkSpec {

  // mirrors of the engine dials (CurationOps: BpeRounds / Batched*)
  private val Rounds = 3
  private val BatchedRounds = 2
  private val BatchedM = 2
  private val BatchedTopK = 8

  /** Greedy left-to-right application of one merge — the sequential
    * definition the distributed islands-rule implementation must match. */
  private def applyGreedy(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def pairCounts(tab: Seq[(List[String], Long)]): Map[(String, String), Long] =
    tab.flatMap { case (syms, f) =>
      syms.zip(syms.tail).map(p => (p, f))
    }.groupBy(_._1).map { case (p, fs) => (p, fs.map(_._2).sum) }

  private def ranking(counts: Map[(String, String), Long]): Seq[((String, String), Long)] =
    counts.toSeq.sortBy { case ((a, b), c) => (-c, s"$a $b") }

  private def refClassic(words: Seq[String]): Seq[(String, Long)] = {
    var tab = words.groupBy(identity).toSeq
      .map { case (w, ws) => (w.map(_.toString).toList, ws.size.toLong) }
    val merges = scala.collection.mutable.Buffer.empty[(String, Long)]
    var done = false
    for (_ <- 1 to Rounds if !done) {
      val counts = pairCounts(tab)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = ranking(counts).head
        merges += ((s"$a $b", c))
        tab = tab.map { case (syms, f) => (applyGreedy(syms, a, b), f) }
      }
    }
    merges.toSeq
  }

  /** SIMULTANEOUS pre-round application of a symbol-disjoint batch —
    * the engine/oracle semantics. Kept positions are computed per pair
    * on the PRE-batch table (greedy islands per pair), then one rebuild.
    * NOT always equal to sequential application: a pair that consumes
    * another selected pair's OUTPUT symbol (reachable: select (a,ab) and
    * (aab,q) in one round once 'aab' exists via (aa,b)) creates
    * post-apply adjacencies that the batch deliberately defers to the
    * next round. Disjointness does guarantee no two pairs claim
    * overlapping positions, so the combined rebuild is well-defined. */
  private def applyBatch(syms: List[String],
      pairs: Seq[(String, String)]): List[String] = {
    val kept = scala.collection.mutable.Set.empty[Int]
    for ((a, b) <- pairs) {
      val pos = (0 until syms.length - 1)
        .filter(i => syms(i) == a && syms(i + 1) == b)
      var i = 0
      while (i < pos.length) {
        var j = i
        while (j + 1 < pos.length && pos(j + 1) == pos(j) + 1) j += 1
        var k = i // island pos(i..j): keep alternating from the left
        while (k <= j) { kept += pos(k); k += 2 }
        i = j + 1
      }
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (kept(i)) { out += (syms(i) + syms(i + 1)); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refBatched(words: Seq[String]): Seq[(Int, Int, String, Long)] = {
    var tab = words.groupBy(identity).toSeq
      .map { case (w, ws) => (w.map(_.toString).toList, ws.size.toLong) }
    val merges = scala.collection.mutable.Buffer.empty[(Int, Int, String, Long)]
    var done = false
    for (r <- 1 to BatchedRounds if !done) {
      val rank = ranking(pairCounts(tab)).take(BatchedTopK)
      val used = scala.collection.mutable.Set.empty[String]
      val sel = scala.collection.mutable.Buffer.empty[((String, String), Long)]
      for ((p @ (a, b), c) <- rank if sel.size < BatchedM)
        if (!used(a) && !used(b)) { sel += ((p, c)); used += a; used += b }
      if (sel.isEmpty) done = true
      else {
        sel.zipWithIndex.foreach { case (((a, b), c), i) =>
          merges += ((r, i + 1, s"$a $b", c))
        }
        tab = tab.map { case (syms, f) =>
          (applyBatch(syms, sel.map(_._1).toSeq), f) }
      }
    }
    merges.toSeq
  }

  test("classic and batched training match the sequential reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 10) {
      val nWords = 8 + rnd.nextInt(13)
      val words = Seq.fill(nWords)(
        (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      val dir = tmpDir(s"bpe_prop$trial").toString
      Seq((0L, words.mkString(" "), "en", "src0", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val gotClassic = SparkEntry.queries("q_bpe_merges")(spark, dir)
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(gotClassic == refClassic(words),
        s"trial $trial classic drift on ${words.mkString(" ")}: " +
          s"$gotClassic vs ${refClassic(words)}")

      val gotBatched = SparkEntry.queries("q_bpe_merges_batched")(spark, dir)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
      assert(gotBatched == refBatched(words),
        s"trial $trial batched drift on ${words.mkString(" ")}: " +
          s"$gotBatched vs ${refBatched(words)}")
    }
  }
}
