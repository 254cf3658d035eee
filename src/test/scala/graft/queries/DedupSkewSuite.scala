package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew regression for the edit-distance dedup's df-gated prefix
  * blocking: a boilerplate-heavy corpus (thousands of documents sharing
  * one 16-char prefix) must produce ZERO candidate pairs from the hot
  * block — an ungated join would expand it quadratically (C(3000,2) ≈
  * 4.5M pairs before the DP even runs) — while small blocks still emit
  * their exact within-block pairs.
  */
class DedupSkewSuite extends SparkSpec {

  test("hot boilerplate-prefix block is dropped before pair expansion; small blocks survive") {
    import spark.implicits._
    val boiler = "COPYRIGHT NOTICE " // 17 chars → identical 16-char prefix
    val hot = (1 to 3000).map(i => (i.toLong, "en", s"$boiler body $i unique tail ${i * 7}"))
    // two small blocks: one of 2 docs (gated in), one singleton (df=1, out)
    val small = Seq(
      (100001L, "en", "shared prefix ab first variant"),
      (100002L, "en", "shared prefix ab second variant"),
      (100003L, "en", "a lone document nothing shares this prefix"))
    val docs = (hot ++ small).toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 16).as("blk"),
        length(col("text")).as("len"), col("text"))
    val cands = DedupOps.editBlockCandidates(docs, maxBlock = 64, lenBand = 20)
    val got = cands.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 3000-doc hot block contributes nothing; the df=2 block yields
    // exactly its one pair; the singleton yields nothing
    assert(got == Set((100001L, 100002L)), s"candidates=$got")
  }

  /** The LSH-recall GATE (VERDICT r14 #2): ~10 queries (cluster labels,
    * keeper, leakage audit, source stats, pagerank) ride the banded
    * `minhashVerifiedPairs` artifact on the DOCUMENTED assumption that
    * 16-band × 4-hash banding misses no ≥0.8-Jaccard pair of this corpus
    * (miss probability (1-j⁴)¹⁶ ≈ 4e-8 at the j≥0.9 pairs it contains,
    * but ~6e-2 at a hypothetical j=0.8 boundary pair). This test converts
    * the math into a checked property: enumerate ALL ≥0.8 pairs
    * exhaustively (q_ngram_jaccard — complete, since a ≥0.8 pair must
    * share shingles and the shared-shingle groups emit every such pair)
    * and assert the banded pair set (q_minhash_lsh) equals it. A band or
    * hash retune that opens a recall hole turns THIS red instead of
    * silently corrupting every artifact consumer. */
  test("LSH-recall gate: banded verified pairs equal the exhaustive ≥0.8-Jaccard pair set at sf0.001") {
    val d = "/root/testdata/sf0.001"
    def pairSet(q: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(q)(spark, d)
        .select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustive = pairSet("q_ngram_jaccard")
    val banded = pairSet("q_minhash_lsh")
    assert(exhaustive.nonEmpty, "fixture must contain ≥0.8 near-dup pairs — a vacuous gate proves nothing")
    val missed = exhaustive -- banded
    assert(missed.isEmpty, s"banding recall hole — pairs missed by LSH: $missed")
    // exactness of the verify kernel: no false extras either
    assert(banded == exhaustive, s"extras=${banded -- exhaustive}")
  }

  test("gate boundary: a block of exactly maxBlock docs is fully expanded") {
    import spark.implicits._
    val docs = (1 to 64).map(i => (i.toLong, "en", s"same sixteen chr doc $i"))
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 16).as("blk"),
        length(col("text")).as("len"), col("text"))
    val n = DedupOps.editBlockCandidates(docs, maxBlock = 64, lenBand = 20).count()
    assert(n == 64L * 63 / 2, s"expected C(64,2)=2016, got $n")
    val gatedOut = DedupOps.editBlockCandidates(docs, maxBlock = 63, lenBand = 20).count()
    assert(gatedOut == 0, s"df=64 block must be dropped at maxBlock=63, got $gatedOut")
  }
}
