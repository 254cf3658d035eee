package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.Row

/** Crafted-corpus contract for the incremental SemDeDup refresh: new
  * vectors are absorbed into the stored cluster of their probe cell, a
  * new member with a lower centroid cosine DISPLACES the historical
  * keeper (the production refresh semantics), the replayed increment is
  * idempotent, and the snapshot artifacts derive exactly once across
  * runs.
  */
class IncrementalSemdedupSuite extends SparkSpec {

  private val Dim = 64

  /** unit vector along axis `a`, plus optional component along `b`. */
  private def vec(a: Int, wa: Double, b: Int = -1, wb: Double = 0.0): Array[Float] = {
    val v = new Array[Float](Dim)
    v(a) = wa.toFloat
    if (b >= 0) v(b) = wb.toFloat
    v
  }

  test("absorption, keeper displacement, replay idempotence, single derivation") {
    import spark.implicits._
    val dir = tmpDir("incsem").toString
    // ids 0..119; hist = id % 8 != 0 (105 rows → kc = 3 → quantizer =
    // hist ids {1, 2}). Group U (ids < 60) points along axis 0; group W
    // (ids >= 60) along axis 1 — two cells, two historical clusters
    // (labels 1 and 60). New ids are multiples of 8; id 8 is U-ish but
    // perturbed off-centroid (cos to the stored centroid ≈ 0.6 < the
    // hist members' 1.0), so it must take over cluster 1's keeper slot.
    val rows = (0 until 120).map { id =>
      val v =
        if (id == 8) vec(0, 0.6, 2, 0.8)
        else if (id < 60) vec(0, 1.0)
        else vec(1, 1.0)
      (id.toLong, v.toSeq, id % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val root = tmpDir("incsem_art")
    spark.conf.set("graft.artifacts.root", root.toString)
    try {
      def run(): Map[Long, (Long, Double, Boolean)] =
        SparkEntry.queries("q_incremental_semdedup")(spark, dir).collect()
          .map { case Row(v: Long, c: Long, cc: Double, k: Boolean) =>
            v -> ((c, cc, k)) }.toMap
      val first = run()
      assert(first.size == 120, "every vector (old and new) is in the merged ledger")
      // absorption: new U-ish vectors joined cluster 1, new W-ish cluster 60
      assert(first(0L)._1 == 1L, s"id 0 cluster: ${first(0L)}")
      assert(first(8L)._1 == 1L, s"id 8 cluster: ${first(8L)}")
      assert(first(64L)._1 == 60L, s"id 64 cluster: ${first(64L)}")
      // historical members keep their snapshot labels
      assert(first(1L)._1 == 1L && first(61L)._1 == 60L)
      // keeper displacement: id 8's centroid cosine (~0.6) undercuts the
      // hist members' 1.0 → it takes the SemDeDup keep slot of cluster 1
      assert(first(8L)._3, s"id 8 should be cluster 1's keeper: ${first(8L)}")
      assert(first(8L)._2 < 0.99, s"id 8 cent_cos should be off-centroid: ${first(8L)}")
      assert(!first(1L)._3, "the historical keeper must be displaced")
      assert(first.count { case (_, (c, _, k)) => c == 1L && k } == 1,
        "exactly one keeper per cluster")
      // replay: identical output, artifacts derived once
      val second = run()
      assert(second == first, "replayed increment diverged")
      val artDirs = root.toFile.listFiles()
        .filter(_.getName.startsWith("graft_art_inc_sem")).map(_.getName).sorted
      assert(artDirs.count(_.startsWith("graft_art_inc_sem_quant")) == 1 &&
        artDirs.count(_.startsWith("graft_art_inc_sem_centroids")) == 1 &&
        artDirs.count(_.startsWith("graft_art_inc_sem_ledger")) == 1,
        s"expected one dir per artifact, got ${artDirs.mkString(",")}")
    } finally spark.conf.unset("graft.artifacts.root")
  }
}
