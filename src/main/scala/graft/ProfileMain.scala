package graft
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Local profiling harness (not part of the library surface): runs named
  * queries from [[SparkEntry.queries]] at sf0.1 and prints per-stage
  * wall/CPU so hotspots are attributable to a plan stage, not guessed. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new ConcurrentLinkedQueue[(Int, Int, Double, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val m = info.taskMetrics
        stages.add((info.stageId, info.numTasks,
          m.executorRunTime / 1e3, m.executorCpuTime / 1e9,
          info.name.linesIterator.next().take(120)))
      }
    })
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        stages.clear()
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        // listener events arrive on an ASYNC bus — drain it or the
        // heaviest (last) stages are missing / credited to the next run
        org.apache.spark.GraftSparkBridge.drainListenerBus(spark.sparkContext)
        println(f"PROF $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
        import scala.jdk.CollectionConverters._
        val top = stages.asScala.toSeq.sortBy(-_._4).take(12)
        top.foreach { case (id, nt, run, cpu, nm) =>
          println(f"  stage $id%5d tasks=$nt%3d run=$run%8.2fs cpu=$cpu%8.2fs  $nm")
        }
        val (allRun, allCpu) = stages.asScala.foldLeft((0.0, 0.0)) {
          case ((r, c), s) => (r + s._3, c + s._4)
        }
        println(f"  TOTAL stages=${stages.size} run=$allRun%.2fs cpu=$allCpu%.2fs")
      }
    }
    spark.stop()
  }
}
