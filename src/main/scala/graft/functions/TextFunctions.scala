package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, quality heuristics, language-ID scoring,
  * document fingerprinting. All are composed from codegen'd built-in
  * expressions (no UDFs) so they stay inside WholeStageCodegen and scale
  * linearly with input splits — no shuffle is introduced by any function
  * here.
  */
object TextFunctions {

  /** Whitespace tokenization. The corpus is single-space separated; for
    * arbitrary text use `tokensRegex`. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenization: words, numbers, or single non-space
    * symbols (public GPT-2-style pre-tokenizer shape). */
  def tokensRegex(text: Column): Column =
    filter(split(text, "(?=[^A-Za-z0-9'])|(?<=[^A-Za-z0-9'])"), t => t =!= "" && t =!= " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Token count EXCLUDING empty tokens — the suite's canonical token
    * definition (every LM/vocab/DSIR metric filters `w <> ''`). Use this
    * where the count feeds packing/sizing decisions; `tokenCount` keeps
    * the raw-split semantics for length heuristics where a run of spaces
    * is itself a signal. */
  def tokenCountNonEmpty(text: Column): Column =
    size(filter(tokens(text), t => t =!= ""))

  /** Word n-gram shingles (space-joined). Empty array when the document is
    * shorter than n tokens — `sequence(1,0)` would otherwise count DOWN. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val idx = sequence(lit(1), size(toks) - (n - 1))
    val make = transform(idx, i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    when(size(toks) >= n, make).otherwise(array().cast("array<string>"))
  }

  /** `xxhash64` of every word n-gram shingle, zero-copy over the text
    * bytes — bit-identical to `transform(shingles(text, n), xxhash64)`
    * without materializing the shingle strings (see
    * [[WordShingleHashes]]). The dedup/decontamination block shuffles
    * shingles as these hashes; this computes them without the string
    * detour. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    WordShingleHashes(text, n)

  /** `xxhash64` of every character n-gram, zero-copy (see
    * [[CharGramHashes]]) — bit-identical to
    * `transform(charGrams(text, n), xxhash64)` without the substring
    * materialization. */
  def charGramHashes(text: Column, n: Int): Column =
    CharGramHashes(text, n)

  /** Character n-grams (every substring of length n), for exact
    * sub-document overlap verification on candidate pairs. Empty array for
    * texts shorter than n — `sequence(1, negative)` would count DOWN. */
  def charGrams(text: Column, n: Int): Column = {
    val idx = sequence(lit(1), length(text) - (n - 1))
    when(length(text) >= n, transform(idx, i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Ratio of stopword tokens (tiny public stopword list; deterministic). */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks)
  }

  /** Mean token length in characters (spaces excluded). */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / size(tokens(text))

  /** Composite quality score in [0,1]: length band + stopword presence +
    * token-length sanity. Mirrors public quality-filter heuristics
    * (Gopher/C4 rules): hard thresholds, monotone in each signal. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenOk = when(nTok >= 20 && nTok <= 1000, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) > 0.0, 1.0).otherwise(0.0)
    val tokLen = meanTokenLen(text)
    val tokOk = when(tokLen >= 2.0 && tokLen <= 12.0, 1.0).otherwise(0.0)
    (lenOk + stopOk + tokOk) / 3.0
  }

  /** Language-ID by marker-token voting (n-gram-profile heuristic collapsed
    * to its word-unigram form; real profiles plug into the same shape).
    * Deterministic: ties broken by fixed language order, no match → "und".
    */
  def langIdVote(text: Column, markers: Map[String, Seq[String]]): Column = {
    val toks = tokens(text)
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, "und").otherwise(null).cast("string")) {
      case (acc, (lang, score)) => coalesce(acc, when(score === best, lang))
    }
  }

  /** Content fingerprint: 64-bit-equivalent hex prefix of the MD5 of
    * whitespace-normalized, lowercased text. Whitespace-insensitive
    * near-exact dedup key (reference identity hashing: BLAKE3-16 content
    * ids, system/userland/macros/src/schema.rs:44-50 — same idea, public
    * hash). */
  def fingerprint(text: Column): Column =
    substring(md5(normalize(text).cast("binary")), 1, 16)

  /** Whitespace-normalize + lowercase (the canonical form for dedup). */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))
}
