package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection primitives: MinHash+LSH and SimHash.
  *
  * Scale design (the point of these over exact pairwise Jaccard): candidate
  * generation is an equi-join on (band, bandKey) — at 100 TB this shuffles
  * only (docId, bandKey) pairs, never full cross products. Verification
  * runs only on candidates. All hashing uses Spark's codegen'd murmur3 /
  * xxhash64 expressions; signatures are fixed-width int arrays, no UDFs.
  */
object MinHash {

  /** Per-document MinHash signature over distinct word shingles.
    * `sigDf(doc_id, sig: array<int>)` — one groupBy (single shuffle on
    * doc_id) with ONE custom aggregate ([[MinHashSignature]]): the int[k]
    * running-minima buffer updates map-side with k seeded murmur3 hashes
    * per shingle, and merges under partial aggregation. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 32, shingleSize: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol), explode(TextFunctions.shingles(col(textCol), shingleSize)).as("s"))
      .distinct()
    sh.groupBy(col(idCol))
      .agg(MinHashSignature.minhashSig(col("s"), numHashes).as("sig"))
  }

  /** LSH banding: explode each signature into (band, bandKey) rows.
    * Docs sharing any band key are candidate pairs. */
  def bands(sig: DataFrame, idCol: String, numBands: Int = 8,
            numHashes: Int = 32): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val bandKeys = (0 until numBands).map { b =>
      val slice = (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), hash(slice: _*).as("band_key"))
    }
    sig.select(col(idCol), explode(array(bandKeys: _*)).as("bk"))
      .select(col(idCol), col("bk.band"), col("bk.band_key"))
  }

  /** Candidate pairs from band collisions (distinct, a < b). */
  def candidates(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col("band"), col("band_key"), col(idCol).as("doc_a"))
    val b = bandsDf.select(col("band"), col("band_key"), col(idCol).as("doc_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Estimated Jaccard from two signatures = fraction of equal components. */
  def estimatedJaccard(sigA: Column, sigB: Column, numHashes: Int = 32): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast("double") / numHashes
}

/** SimHash: 60-bit similarity-preserving fingerprints (bit 60+ avoided so
  * the value stays positive in a signed long). Near-dups have small
  * Hamming distance.
  *
  * The per-token hash is the first 15 hex chars of md5 — 60 bits with an
  * exact SQL twin on any engine with `md5()`, which is what makes the
  * whole signature (and therefore the near-pair set) ORACLE-CHECKABLE:
  * DuckDB recomputes identical signatures bit-for-bit and verifies the
  * pair listing, instead of trusting the engine's own sketch. md5 is a
  * codegen'd built-in, so the hot path stays in WholeStageCodegen. */
object SimHash {

  val Bits = 60

  /** Per-document simhash. Single shuffle: explode tokens, then one
    * groupBy(doc) computing 60 conditional counts map-side (no 60× row
    * blowup — bit counts are aggregate columns, not exploded rows). */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("t"))
      .withColumn("h",
        conv(substring(md5(col("t").cast("binary")), 1, Bits / 4), 16, 10).cast("long"))
    val bitCounts = (0 until Bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(0L)).as(s"c$b")
    }
    val agg = tok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), bitCounts: _*)
    val simhash = (0 until Bits).map { b =>
      when(col(s"c$b") * 2 > col("n_tok"), lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col(idCol), simhash.as("simhash"))
  }

  /** Hamming-LSH band rows for a `(idCol, simhash)` relation: the 60 bits
    * split into `nChunks` near-equal contiguous chunks —
    * `(idCol, simhash, chunk, ck)`. Pairs within Hamming distance
    * `nChunks - 1` must collide on ≥1 chunk (pigeonhole: fewer flipped
    * bits than chunks ⇒ some chunk is untouched). The signature rides
    * along so the exact verify is a pure column expression on the
    * collision row. The 4-chunk default (4×15 bits, complete for ≤3) is
    * also the SCHEMA the incremental media dedup stores as its
    * historical band index (no historical re-decode at verify time) —
    * a stored index bands once and is complete for every radius below
    * its chunk count, so widening a QUERY radius past 3 needs a
    * re-banded index, not a schema change. */
  def chunkRows(sig: DataFrame, idCol: String, nChunks: Int = 4): DataFrame = {
    require(nChunks >= 1 && nChunks <= SimHash.Bits,
      s"nChunks=$nChunks outside [1, ${SimHash.Bits}]")
    // widths differ by at most 1 (e.g. 7 chunks over 60 bits = 9,9,9,9,8,8,8)
    val base = SimHash.Bits / nChunks
    val extra = SimHash.Bits % nChunks
    val widths = (0 until nChunks).map(c => base + (if (c < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    val chunks = (0 until nChunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), offsets(c))
          .bitwiseAND((1L << widths(c)) - 1).as("ck"))
    }
    sig.select(col(idCol), col("simhash"), explode(array(chunks: _*)).as("b"))
      .select(col(idCol), col("simhash"), col("b.chunk"), col("b.ck"))
  }

  /** Exact-Hamming verify over banded candidate collisions: `a` and `b`
    * are [[chunkRows]]-shaped relations; emits distinct ordered pairs
    * with Hamming ≤ maxDist. */
  def verifiedPairs(a: DataFrame, b: DataFrame, idCol: String,
                    maxDist: Int): DataFrame = {
    val l = a.select(col("chunk"), col("ck"),
      col(idCol).as("doc_a"), col("simhash").as("sim_a"))
    val r = b.select(col("chunk"), col("ck"),
      col(idCol).as("doc_b"), col("simhash").as("sim_b"))
    l.join(r, Seq("chunk", "ck"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Hamming-LSH candidate pairs: [[chunkRows]] banding into
    * `max(4, maxDist + 1)` chunks (pigeonhole-complete for the requested
    * radius — recall is structural at EVERY supported radius, never
    * probabilistic), exact Hamming ≤ maxDist verified on candidates
    * only. Avoids the O(n²) cross join at scale. Radii ≤ 3 keep the
    * historical 4×15-bit banding (the stored-index schema); wider radii
    * band finer, which is the selectivity trade: chunk width shrinks as
    * 60/(k+1), so each band key carries fewer bits and the candidate
    * set grows — at maxDist 15 the chunks are 3–4 bits and banding
    * degrades toward all-pairs, hence the cap (an r16 `require`
    * refused >3 outright; widening-by-banding supersedes it,
    * ADVICE r16 #3). */
  def nearPairs(sig: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 15,
      s"maxDist=$maxDist outside [0, 15]: beyond 15 the ${SimHash.Bits}-bit " +
      "signature bands into chunks of < 4 bits and candidate generation " +
      "degrades toward the all-pairs cross join banding exists to avoid")
    val banded = chunkRows(sig, idCol, math.max(4, maxDist + 1))
    verifiedPairs(banded, banded, idCol, maxDist)
  }
}
