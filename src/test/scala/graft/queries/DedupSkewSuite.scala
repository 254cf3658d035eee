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
