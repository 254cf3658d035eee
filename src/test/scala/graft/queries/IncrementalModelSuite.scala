package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Exactness contract for the trained-model refresh seams: the
  * incremental DSIR and quality-classifier paths (stored sufficient-
  * statistic artifact + new-batch-only derivation) must reproduce the
  * full-corpus derivation bit-for-bit — λ/weights, scores, and the drawn
  * sample alike. Engine-vs-engine at sf0.001; the DuckDB gate re-checks
  * both against the shared full-derivation oracle at sf0.01.
  */
class IncrementalModelSuite extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, d).collect().map(_.toString).toSeq

  test("incremental dsir == full dsir sample at sf0.001") {
    val root = tmpDir("incmodel_dsir").toString
    spark.conf.set("graft.artifacts.root", root)
    try {
      val refresh = rows("q_incremental_dsir")
      val full = rows("q_dsir_sample")
      assert(refresh.nonEmpty && refresh == full,
        s"refresh diverged:\n${refresh.take(3)}\nvs\n${full.take(3)}")
    } finally spark.conf.unset("graft.artifacts.root")
  }

  test("incremental quality classifier == full training at sf0.001") {
    val root = tmpDir("incmodel_qc").toString
    spark.conf.set("graft.artifacts.root", root)
    try {
      val refresh = rows("q_incremental_quality_classifier")
      val full = rows("q_quality_classifier")
      assert(refresh.nonEmpty && refresh == full,
        s"refresh diverged:\n${refresh.take(3)}\nvs\n${full.take(3)}")
    } finally spark.conf.unset("graft.artifacts.root")
  }
}
