package graft

import java.nio.file.Files

import graft.channel.ChannelRegistry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming micro-benchmark (BASELINE.md "streaming micro-bench" row):
  * events (sf dir from SPARK_GRAFT_SF_DIR) are written into a durable
  * channel in micro-batches, then a channel-source → tumbling-window-agg →
  * sink query consumes everything; reports end-to-end rows/s for both
  * legs. This is the M2 slice under load rather than under test.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensureConf(spark)

    val events = Tables.events(spark, sfDir)
    val n = events.count()
    val root = Files.createTempDirectory("graft_streambench")
    val registry = new ChannelRegistry(spark, root)
    val ch = registry.create("events", events.schema,
      capacityBytes = 4L * 1024 * 1024 * 1024)

    // ingest leg: 8 CONCURRENT writers (the many-writer shape, for real —
    // each thread races the atomic seq reservation like independent
    // processes would; local[n] schedules their jobs in parallel)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val t0 = System.nanoTime()
    Await.result(Future.sequence((0 until 8).map { w =>
      Future(ch.write(events.filter(col("event_id") % 8 === w), writerId = w))
    }), Duration.Inf)
    val ingestSec = (System.nanoTime() - t0) / 1e9
    require(ch.read().count() == n, "concurrent ingest lost or duplicated rows")

    // query leg: strong subscription → day window → counts by type.
    // State partitions sized to the aggregate's key count (150 windows):
    // the shuffle-partition width freezes into the streaming checkpoint,
    // and near-empty state stores are pure per-batch overhead.
    val t1 = System.nanoTime()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = try ch.readStream()
        .groupBy(Tables.tsDay("ts").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), Tables.exactSum(col("value")).as("v"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("streambench").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", cpus)
    try q.processAllAvailable() finally q.stop()
    val querySec = (System.nanoTime() - t1) / 1e9
    val outRows = spark.table("streambench").count()

    // DSv2 leg: the same subscription through the seq-offset connector
    // (graft.sources.ChannelSource) — measures the connector's scan path
    // against the file-stream source on identical data and aggregation.
    val t2 = System.nanoTime()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q2 = try ch.readStreamV2()
        .groupBy(Tables.tsDay("ts").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), Tables.exactSum(col("value")).as("v"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("streambench_v2").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", cpus)
    try q2.processAllAvailable() finally q2.stop()
    val v2Sec = (System.nanoTime() - t2) / 1e9
    val v2Rows = spark.table("streambench_v2").count()
    require(v2Rows == outRows,
      s"DSv2 leg window rows ($v2Rows) != file-source leg ($outRows)")

    println(f"""{"metric":"stream_rows_per_sec","ingest_rps":${n / ingestSec}%.0f,"query_rps":${n / querySec}%.0f,"query_v2_rps":${n / v2Sec}%.0f,"rows":$n,"ingest_sec":$ingestSec%.2f,"query_sec":$querySec%.2f,"query_v2_sec":$v2Sec%.2f,"window_rows":$outRows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
