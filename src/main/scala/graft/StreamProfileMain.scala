package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Local profiling harness for the STREAMING queries (not part of the
  * library surface): runs named queries from [[SparkEntry.queries]] and
  * prints every micro-batch's `durationMs` breakdown (triggerExecution,
  * queryPlanning, addBatch, getBatch, latestOffset, walCommit,
  * commitOffsets, statementizing etc.) so the per-trigger wall floor is
  * attributable to a phase, not guessed. Batch queries run too — they just
  * produce no trigger rows.
  */
object StreamProfileMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensureConf(spark)

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        rows.add(f"START ${e.name}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2.longValue)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        rows.add(f"BATCH ${p.name} id=${p.batchId} rows=${p.numInputRows} $d")
        p.stateOperators.foreach { so =>
          rows.add(s"  STATE ${so.operatorName} rows=${so.numRowsTotal} " +
            s"upd=${so.allUpdatesTimeMs} rm=${so.allRemovalsTimeMs} " +
            s"commit=${so.commitTimeMs} mem=${so.memoryUsedBytes}")
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        rows.add(s"END")
    })

    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        rows.clear()
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events ride an async bus; give it a beat to drain
        Thread.sleep(300)
        println(f"SPROF $name run$i $wall%.2fs rows=$n")
        import scala.jdk.CollectionConverters._
        rows.asScala.foreach(r => println(s"  $r"))
      }
    }
    spark.stop()
  }
}
