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

  test("writeBatch is idempotent: a replayed batch id rewrites, never appends") {
    import spark.implicits._
    val dir = tmpDir("wb").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    Staging.writeBatch(df, dir, 7L)
    Staging.writeBatch(df, dir, 7L) // foreachBatch at-least-once replay
    val out = Staging.drainParquet(spark, dir, col("id"))
    assert(out.count() == 3, "replayed batch duplicated rows")
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L, 2L, 3L))
  }

  test("foreachBatch pipeline restarts from checkpoint exactly-once") {
    import spark.implicits._
    // 4 staged files → 4 micro-batches; kill after ≥2 committed, restart
    // with the SAME checkpoint + out dir, and the drained result must be
    // exactly the batch answer — nothing missing, nothing doubled.
    val docs = (0L until 40L).map(i => (i, s"v$i")).toDF("doc_id", "text")
    val outRoot = tmpDir("wb_restart").toString
    Staging.withStagedInput(docs, "doc_id", nFiles = 4, prefix = "wb_restart_in") { in =>
      val schema = spark.read.parquet(in).schema
      def run(stopAfterBatches: Option[Int]): Unit = {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(in)
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$outRoot/ck")
          .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, id: Long) =>
            Staging.writeBatch(
              bdf.select(col("doc_id"), upper(col("text")).as("u")),
              s"$outRoot/res", id)
          }
          .start()
        try stopAfterBatches match {
          case Some(n) =>
            val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
            while (Option(q.lastProgress).forall(_.batchId < n - 1) &&
              System.nanoTime < deadline) Thread.sleep(50)
          case None => q.processAllAvailable()
        } finally q.stop()
      }
      run(stopAfterBatches = Some(2)) // kill mid-stream
      run(stopAfterBatches = None)    // restart, drain the rest
      val out = Staging.drainParquet(spark, s"$outRoot/res", col("doc_id"))
      val got = out.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == (0L until 40L).map(i => (i, s"V$i")),
        s"restart lost or duplicated rows: ${got.size} rows")
    }
  }
}
