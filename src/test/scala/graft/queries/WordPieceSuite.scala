package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row

/** Pins the WordPiece selection CRITERION against BPE's: likelihood
  * c(ab)/(c(a)·c(b)) must pick a rarer-but-exclusive pair over a
  * more-frequent-but-promiscuous one, where raw count would not.
  */
class WordPieceSuite extends SparkSpec {

  test("likelihood ratio beats raw count: exclusive pair wins") {
    import spark.implicits._
    val dir = tmpDir("graft_wp").toString
    // "ab" appears 10× but 'a'/'b' also occur apart (in "az", "zb"),
    // so c(ab)/(c(a)c(b)) = 10/(20·20) = 0.025; "xy" appears 3× and
    // x,y occur ONLY there: 3/(3·3) = 0.333 — likelihood picks (x,y)
    // first, raw count would pick (a,b)
    val text = (Seq.fill(10)("ab") ++ Seq.fill(10)("az") ++
      Seq.fill(10)("zb") ++ Seq.fill(3)("xy")).mkString(" ")
    Seq((1L, text, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val merges = SparkEntry.queries("q_wordpiece_merges")(spark, dir)
      .collect().map { case Row(r: Int, p: String, c: Long, ca: Long, cb: Long) =>
        (r, p, c, ca, cb) }
    assert(merges.head._2 === "x y", s"round-1 winner: ${merges.head}")
    assert(merges.head._3 === 3L && merges.head._4 === 3L && merges.head._5 === 3L)
    // after (x,y) fuses, the score table rebuilds over the NEW symbols;
    // (a,b) = 10/(20·20) beats (a,z) and (z,b) = 10/(20·20) only on the
    // pair-asc tie-break — all three tie at 0.025, "a b" < "a z" < "z b"
    assert(merges(1)._2 === "a b", s"round-2 winner: ${merges(1)}")
  }
}
