package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The parquet-artifact staging helper's contract: one derivation per
  * (context, sf, name), fresh columnar reads on every call, and the
  * second call must NOT re-run the derivation.
  */
class ArtifactsSuite extends SparkSpec {

  test("derive runs once; later calls re-read the staged parquet") {
    import spark.implicits._
    var derivations = 0
    def get() = Artifacts.parquet(spark, "art-suite-sf", "arts_once") {
      derivations += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    val first = get().orderBy("id").collect().map(_.toString).toSeq
    val second = get().orderBy("id").collect().map(_.toString).toSeq
    assert(derivations == 1, s"derivation ran $derivations times")
    assert(first == second)
    assert(first.size == 2)
  }

  test("artifacts are keyed by name and sf dir — no cross-talk") {
    import spark.implicits._
    val a = Artifacts.parquet(spark, "art-suite-sf", "arts_a") {
      Seq(1L).toDF("x")
    }
    val b = Artifacts.parquet(spark, "art-suite-sf2", "arts_a") {
      Seq(2L, 3L).toDF("x")
    }
    assert(a.count() == 1 && b.count() == 2)
  }

  test("a failed derivation leaks nothing and the next call retries") {
    import spark.implicits._
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def orphans() = tmp.listFiles()
      .count(_.getName.startsWith("graft_art_arts_fail"))
    val before = orphans()
    var attempts = 0
    def get(fail: Boolean) = Artifacts.parquet(spark, "art-suite-sf", "arts_fail") {
      attempts += 1
      if (fail) sys.error("synthetic derivation failure")
      Seq(7L).toDF("x")
    }
    intercept[Exception] { get(fail = true) }
    assert(orphans() == before, "failed derivation leaked its temp dir")
    assert(get(fail = false).count() == 1, "retry after failure did not derive")
    assert(attempts == 2)
  }

  test("the staged read is a plain parquet scan (no lineage onto the derivation)") {
    import spark.implicits._
    val df = Artifacts.parquet(spark, "art-suite-sf", "arts_scan") {
      Seq((1L, "x")).toDF("id", "v")
    }
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("FileScan parquet") || plan.contains("BatchScan"),
      s"not a parquet scan:\n${plan.take(800)}")
    assert(!plan.contains("LocalTableScan"), "lineage kept the in-memory relation")
  }

  test("graft.artifacts.root relocates staging; failure sweep honors the configured root") {
    import spark.implicits._
    val root = tmpDir("arts_root").resolve("nested").resolve("staging")
    spark.conf.set("graft.artifacts.root", root.toString)
    try {
      def stagedDirs() =
        if (!java.nio.file.Files.isDirectory(root)) Array.empty[java.io.File]
        else root.toFile.listFiles().filter(_.getName.startsWith("graft_art_arts_root"))
      val df = Artifacts.parquet(spark, "art-suite-sf", "arts_root_ok") {
        Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      }
      assert(df.count() == 2)
      // the artifact landed under the configured (auto-created) root,
      // not java.io.tmpdir
      assert(stagedDirs().count(_.getName.startsWith("graft_art_arts_root_ok")) == 1,
        s"artifact not under configured root: ${stagedDirs().mkString(",")}")
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      assert(!tmp.listFiles().exists(_.getName.startsWith("graft_art_arts_root_ok")),
        "artifact leaked into java.io.tmpdir despite configured root")
      // a failed derivation must sweep its directory under THIS root too
      intercept[Exception] {
        Artifacts.parquet(spark, "art-suite-sf", "arts_root_fail") {
          sys.error("synthetic failure under configured root")
        }
      }
      assert(!stagedDirs().exists(_.getName.startsWith("graft_art_arts_root_fail")),
        "failed derivation leaked under the configured root")
    } finally spark.conf.unset("graft.artifacts.root")
  }
}
