package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Pins the BPE merge loop's greedy-overlap semantics on a crafted
  * corpus the synthetic documents table cannot exercise: a SELF-pair
  * winner ((a,a) inside a run of a's) must merge every OTHER position
  * left-to-right — `aaaa → [aa, aa]`, never `[aa, a, a]` (missed
  * second occurrence) or an overlap artifact. The driver's oracle
  * replays the same algorithm in SQL; this suite fixes the expected
  * merges by hand so BOTH sides would fail if the islands/parity rule
  * drifted.
  */
class BpeSuite extends SparkSpec {

  test("self-pair merges apply greedily left-to-right (every other position)") {
    val dir = tmpDir("bpe").toString
    import spark.implicits._
    // 3 docs × "aaaa aaaa ab": word freqs aaaa=6, ab=3.
    // Round 1: (a,a) count 3 positions × 6 = 18 beats (a,b)=3.
    //   Greedy on [a,a,a,a]: positions {1,2,3} are one island; keep 1,3
    //   → [aa,aa]. A parity bug yields [aa,a,a] (count drift downstream).
    // Round 2: (aa,aa)=6 beats (a,b)=3 → aaaa=[aaaa].
    // Round 3: only (a,b)=3 remains.
    Seq.tabulate(3)(i => (i.toLong, "aaaa aaaa ab", "en", "src0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val merges = SparkEntry.queries("q_bpe_merges")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(merges == Seq((1, "a a", 18L), (2, "aa aa", 6L), (3, "a b", 3L)),
      s"greedy self-pair merge drifted: $merges")

    val enc = SparkEntry.queries("q_bpe_encode")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // per doc: chars 4+4+2 = 10; after merges aaaa→1 sym ×2, ab→1 sym
    assert(enc == Seq((0L, 10, 3), (1L, 10, 3), (2L, 10, 3)),
      s"encode compression drifted: $enc")
  }

  test("tie-break picks the lexicographically smallest pair") {
    val dir = tmpDir("bpe2").toString
    import spark.implicits._
    // "cd" and "ab" both appear twice → (a,b) and (c,d) tie at 2;
    // the contract (count DESC, pair ASC) must select "a b" first.
    Seq((0L, "ab cd ab cd", "en", "src0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = SparkEntry.queries("q_bpe_merges")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(merges.head == ((1, "a b")), s"tie-break drifted: $merges")
  }
}
