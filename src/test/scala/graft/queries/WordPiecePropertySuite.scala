package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Randomized cross-check of the WordPiece trainers against an
  * INDEPENDENT driver-side sequential reference (the BpePropertySuite
  * discipline for the likelihood criterion). The DuckDB oracle is
  * generated from the same algorithm spec as the engine, so a shared
  * misunderstanding (wrong score table, wrong disjointness rule, wrong
  * greedy window) could pass the gate on both sides — this suite
  * re-derives the expected merges with plain sequential Scala and pins
  * engine == reference on seeded random corpora, for both the classic
  * one-merge-per-round trainer and the symbol-disjoint batched mode.
  * It also pins batched(m=1) == classic round-for-round: with a
  * singleton batch the bounded top-K ranking must select exactly the
  * global likelihood argmax.
  */
class WordPiecePropertySuite extends SparkSpec {

  // mirrors of the engine dials (CurationOps: WpRounds / Batched*)
  private val Rounds = 3
  private val BatchedRounds = 2
  private val BatchedM = 2
  private val BatchedTopK = 8

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

  private def symCounts(tab: Seq[(List[String], Long)]): Map[String, Long] =
    tab.flatMap { case (syms, f) => syms.map(s => (s, f)) }
      .groupBy(_._1).map { case (s, fs) => (s, fs.map(_._2).sum) }

  /** Likelihood ranking (score DESC, pair ASC) with the exact integer
    * triple per row — the same IEEE division of identical integers both
    * engines perform. */
  private def ranking(tab: Seq[(List[String], Long)])
      : Seq[((String, String), Long, Long, Long)] = {
    val sc = symCounts(tab)
    pairCounts(tab).toSeq
      .map { case (p @ (a, b), cab) => (p, cab, sc(a), sc(b)) }
      .sortBy { case ((a, b), cab, ca, cb) =>
        (-(cab.toDouble / (ca.toDouble * cb.toDouble)), s"$a $b") }
  }

  private def refClassic(words: Seq[String])
      : Seq[(Int, String, Long, Long, Long)] = {
    var tab = words.groupBy(identity).toSeq
      .map { case (w, ws) => (w.map(_.toString).toList, ws.size.toLong) }
    val merges = scala.collection.mutable.Buffer.empty[(Int, String, Long, Long, Long)]
    var done = false
    for (r <- 1 to Rounds if !done) {
      val rank = ranking(tab)
      if (rank.isEmpty) done = true
      else {
        val ((a, b), cab, ca, cb) = rank.head
        merges += ((r, s"$a $b", cab, ca, cb))
        tab = tab.map { case (syms, f) => (applyGreedy(syms, a, b), f) }
      }
    }
    merges.toSeq
  }

  /** SIMULTANEOUS pre-round application of a symbol-disjoint batch —
    * the engine/oracle semantics (see BpePropertySuite.applyBatch for
    * why sequential application is NOT equivalent when one pair
    * consumes another selected pair's output symbol). */
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

  private def refBatched(words: Seq[String], rounds: Int, m: Int, topK: Int)
      : Seq[(Int, Int, String, Long, Long, Long)] = {
    var tab = words.groupBy(identity).toSeq
      .map { case (w, ws) => (w.map(_.toString).toList, ws.size.toLong) }
    val merges =
      scala.collection.mutable.Buffer.empty[(Int, Int, String, Long, Long, Long)]
    var done = false
    for (r <- 1 to rounds if !done) {
      val rank = ranking(tab).take(topK)
      val used = scala.collection.mutable.Set.empty[String]
      val sel = scala.collection.mutable.Buffer.empty[((String, String), Long, Long, Long)]
      for ((p @ (a, b), cab, ca, cb) <- rank if sel.size < m)
        if (!used(a) && !used(b)) { sel += ((p, cab, ca, cb)); used += a; used += b }
      if (sel.isEmpty) done = true
      else {
        sel.zipWithIndex.foreach { case (((a, b), cab, ca, cb), i) =>
          merges += ((r, i + 1, s"$a $b", cab, ca, cb))
        }
        tab = tab.map { case (syms, f) =>
          (applyBatch(syms, sel.map(_._1).toSeq), f) }
      }
    }
    merges.toSeq
  }

  private def writeCorpus(words: Seq[String], dir: String): Unit = {
    import spark.implicits._
    Seq((0L, words.mkString(" "), "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("classic and batched WordPiece match the sequential reference on random corpora") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 8) {
      val nWords = 8 + rnd.nextInt(13)
      val words = Seq.fill(nWords)(
        (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      val dir = tmpDir(s"wp_prop$trial").toString
      writeCorpus(words, dir)

      val gotClassic = SparkEntry.queries("q_wordpiece_merges")(spark, dir)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(gotClassic == refClassic(words),
        s"trial $trial classic drift on ${words.mkString(" ")}: " +
          s"$gotClassic vs ${refClassic(words)}")

      val gotBatched = SparkEntry.queries("q_wordpiece_merges_batched")(spark, dir)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      assert(gotBatched == refBatched(words, BatchedRounds, BatchedM, BatchedTopK),
        s"trial $trial batched drift on ${words.mkString(" ")}: " +
          s"$gotBatched vs ${refBatched(words, BatchedRounds, BatchedM, BatchedTopK)}")
    }
  }

  test("batched m=1 equals the classic trainer round for round") {
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 1 to 4) {
      val nWords = 10 + rnd.nextInt(10)
      val words = Seq.fill(nWords)(
        (1 to (2 + rnd.nextInt(3))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
      val dir = tmpDir(s"wp_m1_$trial").toString
      writeCorpus(words, dir)
      val classic = refClassic(words)
      val m1 = CurationOps.wpTrainBatched(spark, dir,
        rounds = Rounds, m = 1, topK = BatchedTopK)
      assert(m1.map { case (r, _, p, cab, ca, cb) => (r, p, cab, ca, cb) } == classic,
        s"trial $trial m=1 drift: $m1 vs $classic")
    }
  }
}
