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
  * Two chained stateful stages (both `flatMapGroupsWithState` in Append
  * mode — Spark supports multiple FMGWS when all run in append):
  *
  *   1. '''Candidates''' — each document fans out to its 16 LSH band rows;
  *      state lives per band BUCKET (keyed on the band's signature slice),
  *      so a new document only ever meets bucket-mates. Bucket state holds
  *      only `(doc_id, signature)` — 64 ints per member, independent of
  *      document length. A colliding pair is emitted exactly once — by its
  *      lowest colliding band, decidable locally because both signatures
  *      are in hand — as an UNVERIFIED candidate that carries the fresh
  *      document's shingle-hash set transiently through the shuffle (it
  *      arrived in this batch; nothing is re-read).
  *   2. '''Verify''' — keyed on doc_id over a union of registrations
  *      (doc_id → shingle set, stored ONCE per document) and candidates
  *      (keyed on the partner whose shingles were NOT carried). The exact
  *      Jaccard is computed from the stored set × the carried set and the
  *      pair emitted iff it clears the threshold.
  *
  * Versus holding each member's shingle set in every colliding bucket,
  * state per document drops from 16 × (shingles + signature) to
  * 16 × signature + 1 × shingles — the shingle set (the size-dominant,
  * document-length-proportional part) no longer scales with band count.
  * With the corpus's true pairs far above the banding threshold the
  * verified pair set equals the batch exact join, which is what the
  * shared oracle checks.
  *
  * State bounding: `ttl = Some(duration)` arms a processing-time timeout
  * per bucket AND per doc-state entry — state idle past the TTL is
  * dropped, the dedup-horizon eviction a production intake pipeline runs
  * (a duplicate arriving later than the horizon is no longer caught;
  * state stays finite). `None` keeps state forever (the oracle-checked
  * batch-parity mode). [[pairsEventTime]] is the watermark-driven twin
  * for replayed history. TTL recall caveats (both modes): (a) pair
  * emission is pinned to the lowest colliding band, so a pair still
  * inside the horizon is missed if its OWNER bucket idled out while a
  * higher colliding bucket stayed live (kept alive by other members) —
  * ownership by lowest LIVE band is not locally decidable, so this
  * approximation is inherent to local exactly-once emission; (b) the
  * candidate and verify stores evict independently — a candidate whose
  * partner's doc-state idled out inside a still-live bucket is dropped at
  * verify. Both misses are strictly within the "older than the horizon"
  * contract a TTL already accepts.
  *
  * Identity contract: `doc_id` names IMMUTABLE content. Both stateful
  * stages are first-delivery-wins idempotent — a re-delivered id is
  * ignored by the bucket stage's known-member filter and by the verify
  * stage's register-once guard, so at-least-once upstream delivery never
  * double-pairs. The flip side: re-ingesting an id with DIFFERENT text
  * is out of contract (the first-seen shingle set keeps winning, in both
  * this and the previous single-stage design) — content revisions must
  * arrive under a fresh id, which is how a content-addressed intake
  * pipeline behaves anyway.
  *
  * Operational note for TTL mode: ProcessingTimeTimeout makes the engine
  * re-trigger (possibly empty) micro-batches so timeout sweeps can run —
  * under the default 0 ms trigger that is a busy loop, so give the query a
  * real trigger interval (e.g. `Trigger.ProcessingTime("5 seconds")`), and
  * don't use `processAllAvailable()` (it waits for a no-new-data latch the
  * re-triggering never sets — poll `recentProgress` instead).
  */
object StreamingNearDup {

  /** The session confs [[pairsEventTime]] needs (legacy multi-stateful
    * watermark mode) — public so callers opting out of `autoConf` can
    * set and restore them deliberately. */
  val legacyWatermarkConfs: Seq[(String, String)] = Seq(
    "spark.sql.streaming.statefulOperator.checkCorrectness.enabled" -> "false",
    "spark.sql.streaming.statefulOperator.allowMultiple" -> "false")

  /** One LSH band row: band index + the band's 4-int signature slice (the
    * group key — slice equality IS band-key collision) + the member
    * (shingle set rides the shuffle transiently; it is NOT stored). */
  case class NdBanded(band: Int, k1: Int, k2: Int, k3: Int, k4: Int, m: NdMember,
                      ts: java.sql.Timestamp)

  /** A document as the candidate stage sees it in-batch: id, distinct
    * shingle-hash set (carried to verify), 64-hash MinHash signature
    * (band ownership). Only `(doc_id, sig)` enters bucket state. */
  case class NdMember(doc_id: Long, sh: Array[Long], sig: Array[Int])

  /** Bucket-state member: signature only — fixed 64 ints regardless of
    * document length. */
  case class NdSlim(doc_id: Long, sig: Array[Int])

  /** Shuffle payload of the shared compute stage: shingle set + signature,
    * computed once per document per trigger below the exchange. */
  case class NdSigned(doc_id: Long, sh: Array[Long], sig: Array[Int],
                      ts: java.sql.Timestamp)

  /** Verify-stage event. `kind` 0 = registration (`key` = doc_id, `sh` =
    * its own shingle set, stored once); 1 = candidate (`key` = the partner
    * whose shingles live in doc-state, `other` = the doc whose shingles
    * are carried in `sh`). `ts` threads event time for [[pairsEventTime]]. */
  case class NdEvent(kind: Int, key: Long, other: Long, sh: Array[Long],
                     ts: java.sql.Timestamp)

  /** Verified near-dup pair, schema-aligned with the batch oracle. */
  case class NdPair(doc_a: Long, doc_b: Long, shared: Long, n_a: Long, n_b: Long,
                    jaccard: Double)

  /** Doc-state for the verify stage: the shingle set, stored exactly once. */
  case class NdDoc(sh: Array[Long])

  /** Near-dup pairs (exact Jaccard ≥ `threshold`) over a stream of
    * `(doc_id, text)`. 3-word shingles, 64 hashes, 16 bands × 4 rows —
    * the same constants as the batch path, so signatures are
    * bit-identical and batch/stream results agree over the same corpus.
    */
  def pairs(docs: Dataset[(Long, String)],
            threshold: Double = 0.8,
            ttl: Option[java.time.Duration] = None): Dataset[NdPair] = {
    build(docs.toDF("doc_id", "text")
        .withColumn("ts", lit(new java.sql.Timestamp(0L))),
      threshold, ttl.map(_.toMillis), eventTime = false, delay = "0 seconds")
  }

  /** Watermark-driven twin of [[pairs]] for event-time streams (replayed
    * history, out-of-order intake): state idles out when the WATERMARK —
    * not the wall clock — passes the last arrival's event time plus
    * `horizon`. A duplicate whose twin's event time fell beyond the
    * horizon before it arrived is no longer caught; one inside the
    * horizon is. `docs` columns: (doc_id, text, ts); `delay` is the
    * watermark lateness bound applied to `ts` — a row arriving with an
    * event time already behind the watermark is dropped as late input
    * (standard lateness semantics, before any state is consulted), so
    * size `delay` to the intake's real out-of-orderness.
    *
    * Session conf note: this form chains two `flatMapGroupsWithState`
    * stages under a watermark, a shape the post-3.4 multi-stateful
    * watermark propagator cannot express: `EventTimeTimeout` demands a
    * watermarked column in each stage's input, typed stages strip that
    * attribute metadata, and re-declaring the watermark downstream is
    * exactly what the new propagator forbids (`Redefining watermark is
    * disallowed`). So this method flips the session to the legacy
    * watermark mode Spark's own error message points at —
    * `spark.sql.streaming.statefulOperator.allowMultiple = false`
    * (global watermark = min across watermark nodes; chained all-append
    * FMGWS was already legal there) — and downgrades the conservative
    * chained-stateful correctness check to a warning
    * (`...statefulOperator.checkCorrectness.enabled = false`). Both are
    * safe for this operator: FMGWS never discards late input rows; the
    * watermark's only downstream role is the eviction horizon, which is
    * exactly the approximation the TTL contract documents. The confs are
    * analysis-time (read at `start()`), so they must be session-level —
    * a session mixing this with watermarked multi-stateful AGGREGATION
    * chains (which need the new propagator) should isolate the two, or
    * pass `autoConf = false` and manage [[legacyWatermarkConfs]] itself
    * (the query then fails analysis loudly if they are missing, rather
    * than this method mutating the session behind the caller's back).
    */
  def pairsEventTime(docs: Dataset[(Long, String, java.sql.Timestamp)],
                     horizon: java.time.Duration,
                     threshold: Double = 0.8,
                     delay: String = "0 seconds",
                     autoConf: Boolean = true): Dataset[NdPair] = {
    if (autoConf) {
      val conf = docs.sparkSession.conf
      legacyWatermarkConfs.foreach { case (k, v) => conf.set(k, v) }
    }
    val df = docs.toDF("doc_id", "text", "ts").withWatermark("ts", delay)
    build(df, threshold, Some(horizon.toMillis), eventTime = true, delay)
  }

  private def build(docsDf: org.apache.spark.sql.DataFrame,
                    threshold: Double,
                    ttlMs: Option[Long],
                    eventTime: Boolean,
                    delay: String): Dataset[NdPair] = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs.isEmpty) GroupStateTimeout.NoTimeout
      else if (eventTime) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    // The shingle+signature math — this operator's per-document CPU —
    // runs BELOW the repartition exchange: the micro-batch plan consumes
    // `signed` twice (band fan-out and registrations), and everything
    // above an exchange is recomputed per consumer while the exchange
    // subtree itself is deduplicated by ReuseExchange. Computing first
    // and shuffling the (hashes, signature) payload does the per-doc
    // work ONCE per trigger; the exchange still spreads the downstream
    // fan-out across the session's shuffle width, and at production
    // scale multi-file triggers parallelize the compute-side scan anyway.
    val signed = docsDf
      .select(col("doc_id"),
        array_distinct(TextFunctions.shingleHashes(col("text"), 3)).as("sh"),
        col("ts"))
      .filter(size(col("sh")) > 0) // shingle-less docs never signature in batch either
      .as[(Long, Array[Long], java.sql.Timestamp)]
      .map { case (id, sh, ts) =>
        NdSigned(id, sh, MinHashSignature.signatureOf(sh, 64), ts)
      }
      .repartition(col("doc_id"))

    // typed flatMap/map strip watermark attribute metadata, so each
    // stateful stage re-declares the watermark on its own `ts` column.
    // EventTimeTimeout refuses an input with no watermarked column, and
    // re-declaration downstream is only legal in the legacy watermark
    // mode pairsEventTime switches on (min across nodes — same clock).
    def rewatermark[T](ds: Dataset[T]): Dataset[T] =
      if (eventTime) ds.withWatermark("ts", delay) else ds

    val banded = rewatermark(signed.flatMap { d =>
      (0 until 16).map { b =>
        NdBanded(b, d.sig(4 * b), d.sig(4 * b + 1), d.sig(4 * b + 2), d.sig(4 * b + 3),
          NdMember(d.doc_id, d.sh, d.sig), d.ts)
      }
    })
    val candidates = banded
      .groupByKey(r => (r.band, r.k1, r.k2, r.k3, r.k4))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        onBucket(ttlMs, eventTime))

    val registrations = signed.map(d => NdEvent(0, d.doc_id, d.doc_id, d.sh, d.ts))
    rewatermark(registrations.union(candidates))
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        onDoc(threshold, ttlMs, eventTime))
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

  /** Arm the state horizon: processing-time measures idleness from now;
    * event-time from the newest arrival's event time (watermark-driven). */
  private def arm(state: GroupState[_], ttlMs: Option[Long], eventTime: Boolean,
                  maxTs: Long): Unit =
    ttlMs.foreach { t =>
      if (eventTime) {
        // the engine refuses a timeout at-or-before the current watermark —
        // a fully-late horizon collapses to "evict at the next sweep"
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(math.max(maxTs + t, wm + 1))
      } else state.setTimeoutDuration(t)
    }

  /** Candidate stage: remember `(doc_id, sig)` for every member seen
    * inside the TTL horizon; a new doc pairs with bucket-mates (old AND
    * same-batch). The pair's owner band emits ONE unverified candidate,
    * keyed on the partner whose shingles are NOT in this batch (its set
    * lives in verify-stage doc-state); the fresh side's set is carried. */
  private def onBucket(ttlMs: Option[Long], eventTime: Boolean)(
      key: (Int, Int, Int, Int, Int), rows: Iterator[NdBanded],
      state: GroupState[Seq[NdSlim]]): Iterator[NdEvent] = {
    if (state.hasTimedOut) { // idle past the dedup horizon: drop the bucket
      state.remove()
      return Iterator.empty
    }
    val old = state.getOption.getOrElse(Seq.empty)
    val known = old.map(_.doc_id).toSet
    var maxTs = Long.MinValue
    val fresh = rows.map { r => maxTs = math.max(maxTs, r.ts.getTime); r.m }
      .filterNot(m => known.contains(m.doc_id))
      .toSeq.distinctBy(_.doc_id)
    if (fresh.isEmpty) {
      // still an arrival: re-arm the horizon so TTL measures idleness
      arm(state, ttlMs, eventTime, maxTs)
      return Iterator.empty
    }
    state.update(old ++ fresh.map(m => NdSlim(m.doc_id, m.sig)))
    arm(state, ttlMs, eventTime, maxTs)
    val outTs = new java.sql.Timestamp(maxTs)
    val out = Seq.newBuilder[NdEvent]
    // old × fresh, plus ordered pairs within fresh — every unordered pair
    // with at least one new endpoint, exactly once
    fresh.iterator.zipWithIndex.foreach { case (n, i) =>
      old.iterator.foreach { o =>
        if (minCollidingBand(o.sig, n.sig) == key._1)
          out += NdEvent(1, o.doc_id, n.doc_id, n.sh, outTs)
      }
      fresh.iterator.drop(i + 1).foreach { n2 =>
        if (minCollidingBand(n.sig, n2.sig) == key._1)
          out += NdEvent(1, n.doc_id, n2.doc_id, n2.sh, outTs)
      }
    }
    out.result().iterator
  }

  /** Verify stage: registrations store this doc's shingle set (once);
    * candidates exact-verify against it using the carried partner set.
    * A candidate for a same-batch partner works because its registration
    * arrives in the same micro-batch and registrations are applied first
    * within the group. */
  private def onDoc(threshold: Double, ttlMs: Option[Long], eventTime: Boolean)(
      key: Long, rows: Iterator[NdEvent],
      state: GroupState[NdDoc]): Iterator[NdPair] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val events = rows.toSeq
    var maxTs = Long.MinValue
    events.foreach(e => maxTs = math.max(maxTs, e.ts.getTime))
    if (state.getOption.isEmpty)
      events.find(_.kind == 0).foreach(e => state.update(NdDoc(e.sh)))
    arm(state, ttlMs, eventTime, maxTs)
    val mySh = state.getOption.map(_.sh) // None: doc-state evicted → drop pair
    val out = Seq.newBuilder[NdPair]
    mySh.foreach { a =>
      val setA = a.toSet
      events.iterator.filter(_.kind == 1).foreach { c =>
        var shared = 0L
        c.sh.foreach(k => if (setA.contains(k)) shared += 1)
        val nA = a.length.toLong
        val nB = c.sh.length.toLong
        val j = shared.toDouble / (nA + nB - shared)
        if (j >= threshold) {
          val (lo, hi) = if (key < c.other) (key, c.other) else (c.other, key)
          val (nLo, nHi) = if (key < c.other) (nA, nB) else (nB, nA)
          out += NdPair(lo, hi, shared, nLo, nHi, j)
        }
      }
    }
    out.result().iterator
  }
}
