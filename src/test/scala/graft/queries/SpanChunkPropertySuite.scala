package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Randomized cross-check of span dedup and context-window chunking
  * against independent sequential Scala references (the BPE property
  * suite's rationale: the DuckDB oracle is generated from the same
  * algorithm spec as the engine, so a shared misunderstanding passes
  * the gate — a plain `grouped`/`sliding` re-derivation cannot share
  * it). Corpora are built from a small pool of 32-token blocks so
  * cross-document and in-document segment collisions are dense, plus
  * ragged tails to exercise the partial last segment/window.
  */
class SpanChunkPropertySuite extends SparkSpec {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refSpan(docs: Seq[(Long, String)]): Seq[(Long, Int, Int, String)] = {
    val occ = docs.flatMap { case (id, text) =>
      text.split(" ").grouped(32).zipWithIndex.map {
        case (seg, i) => (seg.mkString(" "), (id, i))
      }
    }
    val first = occ.groupBy(_._1).map { case (t, os) => (t, os.map(_._2).min) }
    docs.map { case (id, text) =>
      val segs = text.split(" ").grouped(32).map(_.mkString(" ")).zipWithIndex.toSeq
      val kept = segs.filter { case (seg, i) => first(seg) == ((id, i)) }
      (id, segs.size, kept.size, md5(kept.map(_._1).mkString(" ")))
    }
  }

  private def refChunk(docs: Seq[(Long, String)]): Seq[(Long, Int, Int, String)] =
    docs.flatMap { case (id, text) =>
      val toks = text.split(" ")
      val nExtra =
        if (toks.length > 64) math.ceil((toks.length - 64) / 48.0).toInt else 0
      (0 to nExtra).map { i =>
        val chunk = toks.slice(i * 48, math.min(i * 48 + 64, toks.length))
        (id, i, chunk.length, md5(chunk.mkString(" ")))
      }
    }

  test("span dedup and chunking match sequential references on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 6) {
      // block pool: 6 distinct 32-token blocks; docs are 0-4 whole
      // blocks (with repeats) plus a ragged 0-40-token tail
      val pool = Seq.tabulate(6)(b => (1 to 32).map(t => s"b${b}t$t").mkString(" "))
      val docs = (0L until (3L + rnd.nextInt(4))).map { id =>
        val blocks = Seq.fill(rnd.nextInt(5))(pool(rnd.nextInt(pool.size)))
        val tailLen = 1 + rnd.nextInt(40)
        val tail = (1 to tailLen).map(t => s"d${id}x${t % 7}").mkString(" ")
        (id, (blocks :+ tail).mkString(" "))
      }
      val dir = tmpDir(s"spanprop$trial").toString
      docs.map { case (id, t) => (id, t, "en", "src0", 1L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val gotSpan = SparkEntry.queries("q_span_dedup")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSeq.sortBy(_._1)
      assert(gotSpan == refSpan(docs).sortBy(_._1),
        s"trial $trial span drift:\n$gotSpan\nvs\n${refSpan(docs).sortBy(_._1)}")

      val gotChunk = SparkEntry.queries("q_doc_chunk")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSeq.sortBy(t => (t._1, t._2))
      assert(gotChunk == refChunk(docs).sortBy(t => (t._1, t._2)),
        s"trial $trial chunk drift")
    }
  }
}
