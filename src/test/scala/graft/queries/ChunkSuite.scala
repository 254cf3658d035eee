package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Boundary coverage for the context-window chunker: the oracle corpus
  * has a narrow length distribution, so window/stride edge cases
  * (exact-multiple lengths, one-under/one-over, single-token docs) are
  * pinned here against an independent plain-Scala reference.
  */
class ChunkSuite extends SparkSpec {

  private val W = 64
  private val S = 48

  /** Reference chunker: windows of W tokens at stride S; the final
    * window carries the tail remainder; ≤W tokens → exactly one chunk. */
  private def refChunks(toks: Vector[String]): Vector[Vector[String]] = {
    val nExtra =
      if (toks.length > W) math.ceil((toks.length - W) / S.toDouble).toInt else 0
    (0 to nExtra).toVector.map(i => toks.slice(i * S, math.min(i * S + W, toks.length)))
  }

  test("chunk boundaries match the reference at window/stride edges") {
    val dir = tmpDir("chunk").toString
    import spark.implicits._
    // lengths straddling every boundary: 1, under/at/over one window,
    // under/at/over two strides, and a long tail case
    val lengths = Seq(1, 2, 5, 47, 48, 49, 63, 64, 65, 111, 112, 113,
      159, 160, 161, 200)
    val docs = lengths.zipWithIndex.map { case (n, id) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      (id.toLong, text, "en", "src0", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q_doc_chunk")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)

    for (((n, id)) <- lengths.zipWithIndex) {
      val toks = (1 to n).map(i => s"t$i").toVector
      val want = refChunks(toks)
      val gotChunks = got(id.toLong).sortBy(_._2)
      assert(gotChunks.length == want.length,
        s"len $n: ${gotChunks.length} chunks, expected ${want.length}")
      for ((chunk, idx) <- want.zipWithIndex) {
        val (_, chunkId, nTok, md5) = gotChunks(idx)
        assert(chunkId == idx)
        assert(nTok == chunk.length, s"len $n chunk $idx: $nTok vs ${chunk.length}")
        val wantMd5 = java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(md5 == wantMd5, s"len $n chunk $idx content drifted")
      }
    }
    // coverage property ON ENGINE OUTPUT: chunk idx starts at idx*S, so
    // the chunks are gap-free iff each start ≤ the previous chunk's end,
    // and no tail is dropped iff the last chunk ends at n
    for (((n, id)) <- lengths.zipWithIndex) {
      val chunks = got(id.toLong).sortBy(_._2)
      var prevEnd = 0
      for ((_, chunkId, nTok, _) <- chunks) {
        val start = chunkId * S
        assert(start <= prevEnd, s"len $n: gap before chunk $chunkId")
        prevEnd = start + nTok
      }
      assert(prevEnd == n, s"len $n: engine dropped the tail ($prevEnd != $n)")
    }
  }
}
