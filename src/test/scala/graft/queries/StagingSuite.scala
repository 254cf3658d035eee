package graft.queries

import org.apache.spark.sql.functions._

/** The Staging harness's cleanup CONTRACT is load-bearing for long-lived
  * sessions (a failed gate query must not leak memory-sink views, cached
  * relations, or temp trees) — so the failure paths are tested directly,
  * not assumed from the happy path.
  */
class StagingSuite extends graft.SparkSpec {

  test("runAndDrain drops the sink view even when the streaming run throws") {
    import spark.implicits._
    val sink = "staging_suite_fail_sink"
    val boom = intercept[RuntimeException] {
      Staging.runAndDrain(spark, sink) {
        // simulate a memory sink that registered its view, then a
        // micro-batch failure
        Seq((1L, "a")).toDF("id", "v").createOrReplaceTempView(sink)
        throw new RuntimeException("batch failed")
      } { identity }
    }
    assert(boom.getMessage == "batch failed")
    assert(!spark.catalog.tableExists(sink),
      "failed run leaked the memory-sink view")
  }

  test("runAndDrain tolerates a failure BEFORE the sink view exists") {
    val thrown = intercept[RuntimeException] {
      Staging.runAndDrain(spark, "staging_suite_never_registered") {
        throw new RuntimeException("failed before start")
      } { identity }
    }
    assert(thrown.getMessage == "failed before start")
  }

  test("withStagedInput removes the staged tree on success and on failure") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    var staged: java.nio.file.Path = null
    Staging.withStagedInput(df, "doc_id", nFiles = 2, prefix = "staging_suite_ok") { in =>
      staged = java.nio.file.Paths.get(in)
      assert(java.nio.file.Files.exists(staged), "input not staged")
      assert(spark.read.parquet(in).count() == 2)
    }
    assert(!java.nio.file.Files.exists(staged), "staged tree survived success")

    var staged2: java.nio.file.Path = null
    intercept[RuntimeException] {
      Staging.withStagedInput(df, "doc_id", nFiles = 2, prefix = "staging_suite_fail") { in =>
        staged2 = java.nio.file.Paths.get(in)
        throw new RuntimeException("body failed")
      }
    }
    assert(!java.nio.file.Files.exists(staged2), "staged tree survived failure")
  }

  test("runAndDrain returns a LOCAL relation (survives sink drop)") {
    import spark.implicits._
    val sink = "staging_suite_local"
    val out = Staging.runAndDrain(spark, sink) {
      Seq((2L, "b"), (1L, "a")).toDF("id", "v").createOrReplaceTempView(sink)
    } { _.orderBy(col("id")) }
    assert(!spark.catalog.tableExists(sink))
    // the sink view is gone — the result must still be materializable
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L, 2L))
  }
}
