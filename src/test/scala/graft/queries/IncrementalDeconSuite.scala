package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The decontamination index MAINTENANCE loop — the production cycle
  * behind q_incremental_decon's stored artifact: snapshot shingle index →
  * new TRAIN batches append only their NOVEL shingles (left_anti against
  * the stored index, no historical re-shingle) → a NEW benchmark probes
  * the grown index and is flagged against the whole accumulated corpus.
  * Mirrors IncrementalDedupSuite's band-index maintenance test.
  */
class IncrementalDeconSuite extends SparkSpec {

  test("appended train batches flag a new benchmark; duplicates never double-count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 40-token docs: two docs sharing a base share all 28 distinct 13-grams
    def mk(id: Long, base: String): (Long, String) =
      (id, (1 to 40).map(i => s"$base$i").mkString(" "))
    def df(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

    val idx = tmpDir("incdecon_idx").resolve("sh").toString
    // snapshot corpus: bases "tok" and "alt"
    TextOps.deconShingleIndex(df(mk(1L, "tok"), mk(2L, "alt")))
      .write.mode("overwrite").parquet(idx)

    def probe(bench: DataFrame): Map[Long, Long] =
      TextOps.deconProbe(spark.read.parquet(idx), bench)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def appendBatch(batch: DataFrame): Unit =
      // maintenance: only the batch's NOVEL shingles enter the index —
      // the invariant deconProbe counts on (each shingle held once)
      TextOps.deconShingleIndex(batch)
        .join(spark.read.parquet(idx), Seq("s"), "left_anti")
        .write.mode("append").parquet(idx)

    val bench1 = df(mk(100L, "tok")) // overlaps the snapshot
    val bench2 = df(mk(200L, "new")) // overlaps only the future increment
    assert(probe(bench1) == Map(100L -> 28L), "snapshot overlap must flag (28 distinct 13-grams)")
    assert(probe(bench2) == Map.empty[Long, Long], "no overlap before the increment lands")

    appendBatch(df(mk(10L, "new"))) // increment 1: novel base
    assert(probe(bench2) == Map(200L -> 28L),
      "the grown index must flag the new benchmark without re-shingling history")

    appendBatch(df(mk(20L, "tok"))) // increment 2: ALL duplicate shingles
    assert(probe(bench1) == Map(100L -> 28L),
      "a duplicate-heavy increment must not double-count hits (anti-join maintenance)")
    // and the duplicate increment added zero rows: snapshot (tok, alt)
    // + increment 1 (new) = 3 bases × 28 shingles, nothing more
    val idxRows = spark.read.parquet(idx).count()
    assert(idxRows == 3 * 28L, s"index must hold each shingle once, got $idxRows rows")
  }
}
