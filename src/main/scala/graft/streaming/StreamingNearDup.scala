package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{MinHashSignature, TextFunctions}

/** Streaming NEAR-duplicate detection — MinHash-LSH over an unbounded
  * document stream, the at-ingest form of the batch `q_minhash_lsh`
  * pipeline: a new document is checked against every earlier one through
  * per-bucket state, never a corpus re-scan.
  *
  * Shape (the streaming twin of "candidates via equi-join, never a cross
  * join"): each document fans out to its 16 LSH band rows; state lives per
  * band BUCKET (`flatMapGroupsWithState` keyed on the band's signature
  * slice), so a new document only ever meets bucket-mates. A colliding
  * pair is emitted exactly once — by its lowest colliding band, decidable
  * locally because both full signatures are in hand — then exact-verified
  * in place from the carried shingle-hash sets. With the corpus's true
  * pairs far above the banding threshold (j ≥ 0.9 here), the verified
  * pair set equals the batch exact join, which is what the shared oracle
  * checks.
  *
  * State bounding: `ttl = Some(duration)` arms a processing-time timeout
  * per bucket — a bucket idle past the TTL drops its member list, the
  * dedup-horizon eviction a production intake pipeline runs (a duplicate
  * arriving later than the horizon is no longer caught; state stays
  * finite). `None` keeps state forever (the oracle-checked batch-parity
  * mode). Event-time TTL would need a watermark column threaded through
  * [[NdBanded]]; processing-time matches the intake-stream use where
  * arrival time IS the dedup clock.
  *
  * Operational note for TTL mode: ProcessingTimeTimeout makes the engine
  * re-trigger (possibly empty) micro-batches so timeout sweeps can run —
  * under the default 0 ms trigger that is a busy loop, so give the query a
  * real trigger interval (e.g. `Trigger.ProcessingTime("5 seconds")`), and
  * don't use `processAllAvailable()` (it waits for a no-new-data latch the
  * re-triggering never sets — poll `recentProgress` instead).
  */
object StreamingNearDup {

  /** One LSH band row: band index + the band's 4-int signature slice (the
    * group key — slice equality IS band-key collision) + the member. */
  case class NdBanded(band: Int, k1: Int, k2: Int, k3: Int, k4: Int, m: NdMember)

  /** A document as bucket state sees it: id, distinct shingle-hash set
    * (exact verify), 64-hash MinHash signature (band ownership). */
  case class NdMember(doc_id: Long, sh: Array[Long], sig: Array[Int])

  /** Verified near-dup pair, schema-aligned with the batch oracle. */
  case class NdPair(doc_a: Long, doc_b: Long, shared: Long, n_a: Long, n_b: Long,
                    jaccard: Double)

  /** Near-dup pairs (exact Jaccard ≥ `threshold`) over a stream of
    * `(doc_id, text)`. 3-word shingles, 64 hashes, 16 bands × 4 rows —
    * the same constants as the batch path, so signatures are
    * bit-identical and batch/stream results agree over the same corpus.
    */
  def pairs(docs: Dataset[(Long, String)],
            threshold: Double = 0.8,
            ttl: Option[java.time.Duration] = None): Dataset[NdPair] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs.toDF("doc_id", "text")
      // a micro-batch's files arrive as one partition per file; the
      // shingling + 64-hash signature work below is the CPU of this
      // operator, so spread it across the session's shuffle width before
      // computing (the exchange moves raw text once — at production scale
      // multi-file triggers parallelize the scan anyway and this exchange
      // is noise next to the signature math it spreads)
      .repartition(col("doc_id"))
      .select(col("doc_id"), array_distinct(
        TextFunctions.shingleHashes(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0) // shingle-less docs never signature in batch either
      .as[(Long, Array[Long])]
      .flatMap { case (id, sh) =>
        val sig = MinHashSignature.signatureOf(sh, 64)
        (0 until 16).map { b =>
          NdBanded(b, sig(4 * b), sig(4 * b + 1), sig(4 * b + 2), sig(4 * b + 3),
            NdMember(id, sh, sig))
        }
      }
      .groupByKey(r => (r.band, r.k1, r.k2, r.k3, r.k4))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        onBucket(threshold, ttl))
  }

  /** Lowest band whose 4-slice matches between two signatures — the
    * pair's unique "owner" bucket, making cross-band emission
    * exactly-once without a downstream stateful dedup. */
  private def minCollidingBand(a: Array[Int], b: Array[Int]): Int = {
    var band = 0
    while (band < 16) {
      var r = 0
      var eq = true
      while (r < 4 && eq) { eq = a(4 * band + r) == b(4 * band + r); r += 1 }
      if (eq) return band
      band += 1
    }
    -1
  }

  private def verified(x: NdMember, y: NdMember, threshold: Double): Option[NdPair] = {
    val (a, b) = if (x.doc_id < y.doc_id) (x, y) else (y, x)
    val setB = b.sh.toSet
    var shared = 0L
    a.sh.foreach(k => if (setB.contains(k)) shared += 1)
    val nA = a.sh.length.toLong
    val nB = b.sh.length.toLong
    val j = shared.toDouble / (nA + nB - shared)
    if (j >= threshold) Some(NdPair(a.doc_id, b.doc_id, shared, nA, nB, j)) else None
  }

  /** Per-bucket state transition: remember every member seen inside the
    * TTL horizon; a new doc pairs with bucket-mates (old AND same-batch),
    * emitting the exact-verified pair iff this band owns it. */
  private def onBucket(threshold: Double, ttl: Option[java.time.Duration])(
      key: (Int, Int, Int, Int, Int), rows: Iterator[NdBanded],
      state: GroupState[Seq[NdMember]]): Iterator[NdPair] = {
    if (state.hasTimedOut) { // idle past the dedup horizon: drop the bucket
      state.remove()
      return Iterator.empty
    }
    val old = state.getOption.getOrElse(Seq.empty)
    val known = old.map(_.doc_id).toSet
    val fresh = rows.map(_.m).filterNot(m => known.contains(m.doc_id))
      .toSeq.distinctBy(_.doc_id)
    if (fresh.isEmpty) {
      // still an arrival: re-arm the horizon so TTL measures idleness
      ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
      return Iterator.empty
    }
    state.update(old ++ fresh)
    ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
    val out = Seq.newBuilder[NdPair]
    // old × fresh, plus ordered pairs within fresh — every unordered pair
    // with at least one new endpoint, exactly once
    fresh.iterator.zipWithIndex.foreach { case (n, i) =>
      old.iterator.foreach { o =>
        if (minCollidingBand(o.sig, n.sig) == key._1)
          verified(o, n, threshold).foreach(out += _)
      }
      fresh.iterator.drop(i + 1).foreach { n2 =>
        if (minCollidingBand(n.sig, n2.sig) == key._1)
          verified(n, n2, threshold).foreach(out += _)
      }
    }
    out.result().iterator
  }
}
