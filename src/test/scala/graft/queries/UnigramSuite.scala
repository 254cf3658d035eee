package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The unigram tokenizer's Viterbi DP against brute-force enumeration:
  * the oracle picks (max score, then lexicographically smallest
  * space-joined segmentation) over ALL segmentations; the engine's
  * local DP tie-break must equal that global choice on every input —
  * including crafted exact-tie vocabularies where the tie-break is the
  * whole answer.
  */
class UnigramSuite extends AnyFunSuite {

  /** All segmentations of `word` into pieces from `lp`'s key set. */
  private def enumerate(word: String, lp: Map[String, Long]): Seq[(Long, String)] = {
    if (word.isEmpty) Seq((0L, ""))
    else (1 to math.min(4, word.length)).flatMap { k =>
      val q = word.substring(0, k)
      lp.get(q).toSeq.flatMap { w =>
        enumerate(word.substring(k), lp).map { case (sc, seg) =>
          (sc + w, if (seg.isEmpty) q else q + " " + seg)
        }
      }
    }
  }

  private def brute(word: String, lp: Map[String, Long]): String = {
    val all = enumerate(word, lp)
    assert(all.nonEmpty, s"no segmentation for '$word'")
    all.minBy { case (sc, seg) => (-sc, seg) }._2
  }

  test("Viterbi equals brute force on a vocabulary with exact score ties") {
    // 'ab'+'cd' and 'abc'+'d' tie exactly at -200; 'a b c d' scores
    // -400. The winner must be the lexicographically smaller string:
    // "ab cd" < "abc d" (space sorts before 'c').
    val lp = Map("a" -> -100L, "b" -> -100L, "c" -> -100L, "d" -> -100L,
      "ab" -> -100L, "cd" -> -100L, "abc" -> -100L)
    assert(UnigramOps.viterbi("abcd", lp) == "ab cd")
    assert(UnigramOps.viterbi("abcd", lp) == brute("abcd", lp))
  }

  test("Viterbi equals brute force on deterministic pseudo-random vocabularies") {
    val words = Seq("spark", "join", "stream", "window", "customer",
      "a", "scan", "group", "vector", "batch")
    // hash-derived piece scores over all substrings ≤ 4 — no RNG
    val pieces = words.flatMap { w =>
      for (l <- 1 to math.min(4, w.length); s <- 0 to w.length - l)
        yield w.substring(s, s + l)
    }.distinct
    val lp = pieces.map { p =>
      val h = p.foldLeft(1125899906842597L)((a, c) => a * 31 + c)
      p -> -(100L + ((h >>> 8) % 1000L)) // negative micro-nat-ish scores
    }.toMap
    for (w <- words)
      assert(UnigramOps.viterbi(w, lp) == brute(w, lp), s"word '$w'")
  }

  test("single-char-only vocabulary degrades to character segmentation") {
    val lp = "abc".map(c => c.toString -> -500L).toMap
    assert(UnigramOps.viterbi("abc", lp) == "a b c")
  }

  test("parity bound: words past the enumeration limit fail loudly") {
    val lp = "x".map(c => c.toString -> -1L).toMap
    intercept[IllegalArgumentException] {
      UnigramOps.viterbi("x" * 17, lp.updated("x", -1L))
    }
  }
}

/** The seed cap binds: on a corpus whose raw 2..4-gram candidate set far
  * exceeds SeedCap, the collected seed stays ≤ |alphabet| + SeedCap —
  * the driver crossing is tokenizer-artifact scale by construction, not
  * by fixture luck. Spark-backed (the cap runs as a distributed
  * TakeOrderedAndProject, which is the thing under test).
  */
class UnigramSeedCapSuite extends graft.SparkSpec {

  test("seed collect is capped at |alphabet| + SeedCap on an oversized corpus") {
    import spark.implicits._
    // 2000 distinct 8-char words over a 20-letter alphabet: ≥ 2000
    // distinct 4-grams alone (hash-derived, no RNG) — far over SeedCap
    val alpha = "abcdefghijklmnopqrst"
    val words = (0 until 2000).map { i =>
      val sb = new StringBuilder
      var h = i.toLong * 2654435761L + 17
      for (_ <- 0 until 8) { sb += alpha(((h >>> 7) % 20).toInt); h = h * 31 + 11 }
      (sb.toString, 1L + (i % 7))
    }
    val rel = words.toDF("w", "f")
    // precondition: the UNCAPPED candidate set really exceeds the cap
    val raw = rel.select(org.apache.spark.sql.functions.expr(
        "explode(flatten(transform(sequence(1, 4), " +
          "L -> transform(sequence(1, greatest(length(w) - L + 1, 1)), " +
          "st -> substring(w, st, L)))))").as("p"))
      .filter(org.apache.spark.sql.functions.length($"p") > 1)
      .distinct().count()
    assert(raw > UnigramOps.SeedCap * 2L,
      s"fixture too small to exercise the cap: $raw candidates")

    val seed = UnigramOps.seedCounts(rel)
    val singles = seed.keys.count(_.length == 1)
    val multis = seed.keys.count(_.length > 1)
    assert(singles <= alpha.length)
    assert(multis == UnigramOps.SeedCap,
      s"cap should BIND here: got $multis multi-char pieces")
    assert(seed.size <= alpha.length + UnigramOps.SeedCap)
    // coverage floor: every alphabet char that occurs is in the seed
    val used = words.flatMap(_._1.toSeq).toSet
    assert(used.forall(c => seed.contains(c.toString)))
  }
}
