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

  test("batched mode selects symbol-disjoint pairs and applies them at once") {
    val dir = tmpDir("bpe3").toString
    import spark.implicits._
    // Word freqs: ab×6, bc×5, de×4, abde×2 →
    // round-1 pair counts: (a b)=8, (d e)=6, (b c)=5, (b d)=2.
    // Greedy m=2: take (a b); (d e) is disjoint → take it too. The
    // conflict case comes in round 2: after ab→[ab], de→[de],
    // abde→[ab,de] (BOTH merges land in one word, one pass),
    // counts are (b c)=5 and (ab de)=2 — disjoint, both selected.
    val text = (Seq.fill(6)("ab") ++ Seq.fill(5)("bc") ++
      Seq.fill(4)("de") ++ Seq.fill(2)("abde")).mkString(" ")
    Seq((0L, text, "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = SparkEntry.queries("q_bpe_merges_batched")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges == Seq((1, 1, "a b", 8L), (1, 2, "d e", 6L),
      (2, 1, "b c", 5L), (2, 2, "ab de", 2L)),
      s"batched selection drifted: $merges")
  }

  test("batched mode skips a runner-up that shares a symbol with the winner") {
    val dir = tmpDir("bpe4").toString
    import spark.implicits._
    // (a b)=6 wins; (b c)=5 shares b → SKIPPED; (d e)=4 is rank 2.
    val text = (Seq.fill(6)("ab") ++ Seq.fill(5)("bc") ++
      Seq.fill(4)("de")).mkString(" ")
    Seq((0L, text, "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = SparkEntry.queries("q_bpe_merges_batched")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges.take(2) == Seq((1, 1, "a b", 6L), (1, 2, "d e", 4L)),
      s"conflict skip drifted: $merges")
    // round 2: only (b c) remains selectable
    assert(merges.drop(2) == Seq((2, 1, "b c", 5L)),
      s"round-2 selection drifted: $merges")
  }

  test("OOV replay applies train-split merges to unseen test-split words") {
    val dir = tmpDir("bpe5").toString
    import spark.implicits._
    // Hash-split gate (first md5 hex digit of the doc id): docs 4/6/7
    // start 'a'/'1'/'8' → train; doc 3 starts 'e' → test. Train corpus
    // "abab"×6 learns (a,b) then (ab,ab), then exhausts (<3 merges —
    // the replay must tolerate that). Test word "abababab" was NEVER
    // seen in training; replaying the two merges greedily gives
    // [ab,ab,ab,ab] → (islands rule on the (ab,ab) run) → [abab,abab].
    Seq((4L, "abab abab"), (6L, "abab abab"), (7L, "abab abab"),
        (3L, "abababab cd"))
      .map { case (id, t) => (id, t, "en", "src0", 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_bpe_oov")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == Seq(("abababab", 1L, 8, 2), ("cd", 1L, 2, 2)),
      s"OOV replay drifted: $got")
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
