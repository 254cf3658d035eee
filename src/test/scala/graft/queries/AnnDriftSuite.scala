package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.Row

/** Crafted-corpus contract for the quantizer-drift rebuild verdict
  * (q_ann_drift_rebuild): a drifted new batch — vectors spread where the
  * bootstrap quantizer collapsed all its centroids — must flip
  * `rebuild_due` to true AND the rebuild path must restore the recall
  * floor from stored postings alone; an in-distribution batch must keep
  * `rebuild_due` false. Both directions through the REGISTERED query
  * (the RuleNonVacuity discipline: the tri-SF gate only ever sees the
  * no-drift side, so without this suite a monitor that hardcodes `false`
  * would pass every gate run).
  */
class AnnDriftSuite extends SparkSpec {

  private val Dim = 64

  /** deterministic pseudo-random spread vector: components in [-1, 1],
    * a pure function of (id, j) so every run sees the same corpus. */
  private def spread(id: Long): Seq[Float] =
    (0 until Dim).map { j =>
      ((java.lang.Math.floorMod(id * 2654435761L + j * 40503L + 7L, 2001L)
        - 1000L) / 1000.0).toFloat
    }

  /** historical ladder vector: λ(id)·e0 with tiny id-dependent noise in
    * the other dims — the bootstrap quantizer learns a 1-D ladder of
    * cells along e0, sharp in exactly one direction. */
  private def ladder(id: Long): Seq[Float] = {
    val lambda = (id % 21) + 1.0
    (0 until Dim).map { j =>
      val noise = (java.lang.Math.floorMod(id * 31L + j * 17L, 7L) - 3L) * 0.01
      (if (j == 0) lambda + noise else noise).toFloat
    }
  }

  /** drifted pair member: v0·e0 + 10·e(2 + pairIdx) — pairs share an
    * orthogonal component the ladder quantizer cannot see, and split
    * along e0, the one direction it IS sharp in. The low member (v0=2)
    * probes low-λ cells while its true neighbor (the high member,
    * cos ≈ 0.69) homes at λ≈16 — structurally unreachable in 6 probes. */
  private def pairMember(pairIdx: Int, v0: Double): Seq[Float] =
    (0 until Dim).map { j =>
      (if (j == 0) v0 else if (j == 2 + pairIdx) 10.0 else 0.0).toFloat
    }

  private def writeEmbeddings(dir: String, rows: Seq[(Long, Seq[Float])]): Unit = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def runQuery(dir: String): (Long, Long, Long, Boolean, Boolean, Boolean) =
    SparkEntry.queries("q_ann_drift_rebuild")(spark, dir).collect() match {
      case Array(Row(nv: Long, nn: Long, nq: Long, due: Boolean,
          okF: Boolean, okR: Boolean)) => (nv, nn, nq, due, okF, okR)
      case other => fail(s"unexpected verdict shape: ${other.toSeq}")
    }

  test("drifted batch: rebuild_due flips true; rebuild restores the floor") {
    val dir = tmpDir("anndrift_drift").toString
    // ids 0..127. Hist (id % 8 != 0, 112 rows) = the positive λ-ladder
    // along e0: the bootstrap quantizer is sharp along e0 and blind to
    // every other dim. New batch (id % 8 == 0, 16 rows) = 8 drifted
    // pairs, pair k at ids (16k, 16k+8): members 2·e0 + 10·e(2+k) and
    // 16·e0 + 10·e(2+k). FROZEN failure is structural: the low member's
    // exact NN is its partner (cos ≈ 0.69, beating every hist vector's
    // 0.196), but 6 probes around λ≈2 never reach the partner's λ≈16
    // cell → 8 of 16 queries miss (recall 0.5, below floor AND below the
    // rebuild threshold); the high member's best is any hist vector
    // (cos 0.846), served from its own probes → hit. REBUILT success is
    // also structural: n=128 makes retrainFromIndex's stride exactly 8,
    // so the seeds are precisely the 16 new vectors — the drifted
    // structure enters the quantizer by sampling, hist absorbs into the
    // high-member cells (hist vbn ≈ e0, cos 0.85 to high members), and
    // both pair members reach their true best within 6 probes.
    writeEmbeddings(dir, (0L until 128L).map { id =>
      id -> (if (id % 8 == 0) pairMember((id / 16).toInt, if (id % 16 == 0) 2.0 else 16.0)
             else ladder(id))
    })
    val root = tmpDir("anndrift_drift_art")
    spark.conf.set("graft.artifacts.root", root.toString)
    try {
      val (nv, nn, nq, due, okFrozen, okRebuilt) = runQuery(dir)
      assert(nv == 128L && nn == 16L && nq == 16L, s"counts: ($nv, $nn, $nq)")
      assert(due, "drifted batch must flip rebuild_due to true")
      assert(!okFrozen,
        "the frozen quantizer must be BELOW the floor on drifted queries " +
        "(otherwise this fixture isn't exercising the failure the monitor exists for)")
      assert(okRebuilt,
        "the rebuilt index (retrained from stored postings only) must restore the floor")
    } finally spark.conf.unset("graft.artifacts.root")
  }

  test("in-distribution batch: rebuild_due stays false") {
    val dir = tmpDir("anndrift_ctrl").toString
    // same generator for hist and batch — the bootstrap quantizer saw
    // this distribution, so frozen serving holds the floor with margin
    writeEmbeddings(dir, (0L until 240L).map(id => id -> spread(id)))
    val root = tmpDir("anndrift_ctrl_art")
    spark.conf.set("graft.artifacts.root", root.toString)
    try {
      val (nv, nn, nq, due, okFrozen, okRebuilt) = runQuery(dir)
      assert(nv == 240L && nn == 30L && nq == 30L, s"counts: ($nv, $nn, $nq)")
      assert(!due, "in-distribution batch must not trigger a rebuild")
      assert(okFrozen, "frozen serving must hold the floor in-distribution")
      assert(okRebuilt, "a rebuild from in-distribution state must also hold it")
    } finally spark.conf.unset("graft.artifacts.root")
  }

  test("probedHits one-pass kernel: hit / probed-miss / empty-probe / self-exclusion accounting") {
    // Pins the r18 one-pass rewrite's semantics on a hand-computable
    // geometry: 4 axis centroids, 4 index vectors, nprobe=1.
    //  - src 100 (pv=qvn=e0): probe cell 0 holds the global best → HIT
    //  - src 101 (pv=e1, qvn=e2): probe cell 1 has candidates but the
    //    exact best lives in cell 2 → counted, NOT a hit (the drift case)
    //  - src 102 (pv=qvn=e3): probe cell 3 is EMPTY → served is all-null
    //    under max; counted in n_queries, never a hit
    //  - src 0 (pv=qvn=e0): the index row with nbr=0 is self-excluded on
    //    BOTH sides, so nbr=1 is served AND exact best → HIT
    import spark.implicits._
    def e(j: Int): Seq[Double] = (0 until Dim).map(i => if (i == j) 1.0 else 0.0)
    val mix = {
      val raw = (0 until Dim).map(i => if (i == 0) 0.9 else if (i == 1) 0.1 else 0.0)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val cents = IndexedSeq(e(0), e(1), e(2), e(3)).map(_.toIndexedSeq)
    val vecs = Seq((0L, e(0)), (1L, mix), (2L, e(1)), (3L, e(2)))
      .toDF("nbr", "vbn")
    val index = VectorOps.indexRows(vecs, "nbr", "vbn", cents, normalize = false)
    val queries = Seq(
      (100L, e(0), e(0)),
      (101L, e(1), e(2)),
      (102L, e(3), e(3)),
      (0L, e(0), e(0))
    ).toDF("src", "pv", "qvn")
    val r = VectorOps.probedHits(index, cents, queries, 1).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L,
      s"(n_hits, n_queries) = (${r.getLong(0)}, ${r.getLong(1)}), expected (2, 4)")
  }

  test("an offset/sparse id space is refused loudly, not hash-mismatched") {
    val dir = tmpDir("anndrift_offset").toString
    // contiguous 0..199 (so centroid seed sampling works) PLUS 25 new
    // ids planted at 8000+8k — OUTSIDE the [0, 8000) query-sample
    // window. The "first min(n_new, 1000) new ids" assumption breaks:
    // the window catches 25 of 50 new vectors, and the registered query
    // must refuse with a diagnostic instead of probing a silently
    // truncated sample and hash-mismatching the oracle's count
    writeEmbeddings(dir,
      (0L until 200L).map(id => id -> ladder(id)) ++
      (0L until 25L).map(k => (8000L + 8L * k) -> ladder(k)))
    val root = tmpDir("anndrift_offset_art")
    spark.conf.set("graft.artifacts.root", root.toString)
    try {
      val e = intercept[IllegalArgumentException] {
        runQuery(dir)
      }
      assert(e.getMessage.contains("contiguous"),
        s"refusal lost its diagnostic: ${e.getMessage}")
    } finally spark.conf.unset("graft.artifacts.root")
  }
}
