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
