package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Per-trigger drift-monitor contract ([[VectorOps.driftMonitorTick]] —
  * the kernel q_stream_drift_monitor runs every trigger): an
  * in-distribution batch must land a clean verdict row, a drifted batch
  * arriving LATER over the same accumulated index must flip
  * rebuild_due=true on ITS trigger — the monitor samples each batch's
  * own vectors precisely so drift in new data is visible (the gate only
  * ever sees the no-drift side on real testdata).
  */
class StreamDriftSuite extends SparkSpec {

  private val Dim = 64

  private def ladder(id: Long): Seq[Double] = {
    val lambda = (id % 21) + 1.0
    (0 until Dim).map { j =>
      val noise = (java.lang.Math.floorMod(id * 31L + j * 17L, 7L) - 3L) * 0.01
      if (j == 0) lambda + noise else noise
    }
  }

  private def pairMember(pairIdx: Int, v0: Double): Seq[Double] =
    (0 until Dim).map { j =>
      if (j == 0) v0 else if (j == 2 + pairIdx) 10.0 else 0.0
    }

  test("drifted trigger flips rebuild_due; in-distribution trigger does not") {
    import spark.implicits._
    // bootstrap corpus + batch 1: a 128-rung λ-ladder along e0 — the
    // quantizer is sharp along e0 (16 distinct rungs sampled) and blind
    // to every other dim
    val hist = (0L until 128L).map(id => (id, ladder(id))).toDF("vec_id", "v")
    val centroids = VectorOps.ivfCentroids(hist.cache())
    // batch 2: 6 drifted pairs (2·e0 + 10·e(2+k), 16·e0 + 10·e(2+k)) —
    // the low member's true NN is its partner across the ladder
    // (cos 0.686 ≫ any hist 0.196), structurally unreachable in 6
    // probes around λ≈2; the high member's best is any hist rung
    // (cos 0.846), served from its own probes
    val drifted = (0 until 6).flatMap { k =>
      Seq((200L + 2 * k, pairMember(k, 2.0)), (201L + 2 * k, pairMember(k, 16.0)))
    }.toDF("vec_id", "v")
    val out = tmpDir("stream_drift").toString
    val mon = new VectorOps.DriftMonitorState(spark, centroids, out)
    mon.tick(hist, 0L)
    mon.tick(drifted, 1L)
    val verdicts = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$out/verdicts").orderBy(col("trigger")).collect()
      .map { case Row(t: Long, h: Long, n: Long, due: Boolean) => (t, h, n, due) }
    assert(verdicts.length == 2, s"got ${verdicts.toSeq}")
    val (_, h0, n0, due0) = verdicts(0)
    assert(n0 == 12 && !due0,
      s"in-distribution trigger must not trip ($h0/$n0 hits)")
    assert(h0 * 10 >= n0 * 6, s"in-distribution recall below floor: $h0/$n0")
    val (_, h1, n1, due1) = verdicts(1)
    assert(n1 == 12 && due1,
      s"drifted trigger must trip rebuild_due ($h1/$n1 hits)")
    // the accumulated index kept the exactly-once contract alongside
    val postings = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$out/postings")
    assert(postings.count() == 140, "postings lost or doubled a batch")
    hist.unpersist()
  }

  test("a corpus under 48 embeddings is refused loudly, not hash-mismatched") {
    import spark.implicits._
    // 20 vectors cannot fill the 4-trigger × 12-probe pooled-verdict
    // contract — the registered query must fail with a diagnostic BEFORE
    // staging anything (r17 verdict #3: previously this surfaced as a
    // confusing oracle count mismatch)
    val dir = tmpDir("drift_tiny").toString
    (0L until 20L).map(id => (id, ladder(id).map(_.toFloat), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.SparkEntry.queries("q_stream_drift_monitor")(spark, dir).collect()
    }
    assert(e.getMessage.contains("48") && e.getMessage.contains("got 20"),
      s"refusal lost its diagnostic: ${e.getMessage}")
  }
}
