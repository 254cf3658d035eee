package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Crafted-corpus edges for duplicated-span removal: a segment repeated
  * WITHIN one document (self-duplicate), a document that is entirely
  * duplicates of an earlier one (every segment dropped, cleaned text
  * empty), and first-occurrence ordering across documents.
  */
class SpanDedupSuite extends SparkSpec {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("self-duplicates, full-duplicate docs, and first-occurrence order") {
    val dir = tmpDir("span").toString
    import spark.implicits._
    val seg = (1 to 32).map(i => s"w$i").mkString(" ") // one full segment
    val other = (1 to 32).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      // doc 0: seg twice (self-duplicate) + a unique tail segment
      (0L, s"$seg $seg $other", "en", "src0", 1L),
      // doc 1: entirely made of doc 0's segments → everything dropped
      (1L, s"$other $seg", "en", "src0", 1L),
      // doc 2: unique content, untouched
      (2L, (1 to 20).map(i => s"y$i").mkString(" "), "en", "src0", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q_span_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq.sortBy(_._1)

    // doc 0: 3 segments, second (the self-dup) dropped → seg + other
    assert(got(0) == ((0L, 3, 2, md5(s"$seg $other"))), s"doc0: ${got(0)}")
    // doc 1: both segments already seen in doc 0 → cleaned text empty
    assert(got(1) == ((1L, 2, 0, md5(""))), s"doc1: ${got(1)}")
    // doc 2: untouched
    assert(got(2)._2 == 1 && got(2)._3 == 1, s"doc2: ${got(2)}")
  }

  test("a >1000-segment document keeps correct first-occurrence order") {
    // Regression for the packed (doc_id, seg_idx) key width: under the
    // old doc_id*1000 pack, doc 0's segment 1040 packed to 1040 while
    // doc 1's segment 0 packed to 1000 — doc 1 would silently win
    // "first occurrence" of a segment doc 0 emitted earlier. The 2^20
    // pack keeps every doc-0 key below every doc-1 key.
    val dir = tmpDir("span_wide").toString
    import spark.implicits._
    val nSeg = 1050
    val doc0 = (0 until nSeg).flatMap(s => (1 to 32).map(i => s"d0s${s}t$i"))
      .mkString(" ")
    // doc 1 = a verbatim copy of doc 0's segment #1040 (past the old cap)
    val dup = (1 to 32).map(i => s"d0s1040t$i").mkString(" ")
    Seq((0L, doc0, "en", "src0", 1L), (1L, dup, "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q_span_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .toSeq.sortBy(_._1)
    assert(got(0) == ((0L, nSeg, nSeg)), s"doc0 lost segments: ${got(0)}")
    assert(got(1) == ((1L, 1, 0)), s"doc1 should drop its copy: ${got(1)}")
  }
}
