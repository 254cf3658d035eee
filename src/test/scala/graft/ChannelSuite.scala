package graft

import scala.jdk.CollectionConverters._

import graft.channel.{Channel, ChannelRegistry, SchemaRegistry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, IntegerType, StringType}

class ChannelSuite extends SparkSpec {
  import spark.implicits._

  private def schema = StructType(Seq(
    StructField("id", IntegerType), StructField("msg", StringType)))

  test("write/read roundtrip stamps _writer_id and preserves order") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t1", schema)
    ch.write(Seq((1, "a"), (2, "b")).toDF("id", "msg"), writerId = 7)
    ch.write(Seq((3, "c")).toDF("id", "msg"), writerId = 8)
    val rows = ch.read().select("id", "msg", Channel.WriterIdCol).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3)) // offset order
    assert(rows.map(_.getInt(2)).toSeq == Seq(7, 7, 8)) // attribution
  }

  test("consumption-driven retention: prune only below every registered head") {
    // reference frame pruning parity: history is deleted once ALL heads
    // pass it — never because of one fast consumer, never with no
    // consumers registered at all
    val reg = new ChannelRegistry(spark, tmpDir("chan_prune"))
    val ch = reg.create("pr1", schema)
    ch.write(Seq((1, "a")).toDF("id", "msg"), 1) // seq 0
    ch.write(Seq((2, "b")).toDF("id", "msg"), 1) // seq 1
    ch.write(Seq((3, "c")).toDF("id", "msg"), 1) // seq 2
    assert(ch.pruneConsumed(0) == 0L, "no registered readers must mean no pruning")
    ch.registerReader("etl")
    ch.registerReader("audit")
    ch.ackReader("etl", 3)   // consumed everything
    ch.ackReader("audit", 1) // only seq 0
    assert(ch.readerHeads == Map("etl" -> 3L, "audit" -> 1L))
    assert(ch.pruneConsumed(0) > 0L)
    assert(ch.read().select("id").as[Int].collect().sorted.toSeq == Seq(2, 3),
      "only the batch below BOTH heads may go")
    // a lower (retried/out-of-order) ack can never regress a head
    ch.ackReader("etl", 1)
    assert(ch.readerHeads("etl") == 3L)
    ch.ackReader("audit", 3)
    ch.pruneConsumed(0)
    // the newest committed batch survives even a fully-passed topic
    // (same anchor invariant as Drop eviction's batches.size > 1)
    assert(ch.read().select("id").as[Int].collect().toSeq == Seq(3),
      "all heads passed: everything but the newest batch prunes")
    ch.write(Seq((4, "d")).toDF("id", "msg"), 1) // topic still serves writes
    assert(ch.read().select("id").as[Int].collect().sorted.toSeq == Seq(3, 4))
    // hostile reader names are refused before they become marker files
    intercept[IllegalArgumentException](ch.registerReader("../escape"))
    intercept[IllegalArgumentException](ch.registerReader(""))
  }

  test("many-writer union interleaves whole batches (J1)") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t2", schema)
    (0 until 4).foreach(w => ch.write(Seq((w, s"w$w")).toDF("id", "msg"), w))
    val writers = ch.read().select(Channel.WriterIdCol).as[Int].collect().toSeq
    assert(writers == Seq(0, 1, 2, 3))
  }

  test("schema hash mismatch is refused at attach (write) time") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t3", schema)
    val bad = Seq((1L, "a")).toDF("id", "msg") // id is long, not int
    intercept[SchemaRegistry.SchemaMismatch] { ch.write(bad, 0) }
  }

  test("drop mode evicts oldest batches and accounts dropped bytes") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t4", schema, capacityBytes = 4 * 1024, dropMode = true)
    (0 until 6).foreach(i => ch.write(Seq((i, "x" * 100)).toDF("id", "msg"), 0))
    assert(ch.droppedBytes > 0) // ReaderBehind parity: loss is reported
    val ids = ch.read().select("id").as[Int].collect().toSeq
    assert(ids.nonEmpty && ids == ids.sorted && ids.last == 5) // newest survive
    // eviction publishes the pruned floor: a snapshot pinned below it is
    // refused instead of silently returning fewer rows than it once held
    val ex = intercept[Exception](ch.readSnapshot(endSeq = 6).collect())
    assert(ex.getMessage != null && ex.getMessage.contains("pruned floor"),
      s"wrong refusal: ${ex.getMessage}")
  }

  test("park mode rejects writes over capacity") {
    val root = tmpDir("chan")
    val reg = new ChannelRegistry(spark, root)
    val ch = reg.create("t5", schema, capacityBytes = 1, dropMode = false)
    intercept[Channel.ChannelBackpressure] {
      ch.write(Seq((1, "a")).toDF("id", "msg"), 0)
    }
    // the un-published seq is tombstoned (a reader must see an aborted
    // hole, not data loss) and is never handed out again — the capacity
    // path must leave the same trace discipline reserveSeq's post-claim
    // re-check assumes (trace visible before the marker is gone)
    val dir = root.resolve("t5")
    assert(Channel.abortSeqs(dir) == Seq(0L))
    assert(Channel.resSeqs(dir).isEmpty)
    val next = Channel.reserveSeq(dir)
    assert(next == 1L, s"aborted seq reissued: $next")
    java.nio.file.Files.deleteIfExists(dir.resolve(f"${Channel.ResPrefix}$next%012d"))
  }

  test("drain refuses writes but serves reads; terminate refuses both") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t6", schema)
    ch.write(Seq((1, "a")).toDF("id", "msg"), 0)
    ch.drain()
    intercept[Channel.ChannelClosed] { ch.write(Seq((2, "b")).toDF("id", "msg"), 0) }
    assert(ch.read().count() == 1)
    ch.terminate()
    intercept[Channel.ChannelClosed] { ch.read() }
  }

  test("registry attach + glob listing") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    reg.create("logs-a", schema)
    reg.create("logs-b", schema)
    reg.create("data", schema)
    assert(reg.list("logs-*") == Seq("logs-a", "logs-b"))
    val again = reg.get("logs-a")
    assert(again.schemaHash == SchemaRegistry.hash(schema))
  }

  test("streaming subscribe sees appended batches (strong reader, S2)") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t7", schema)
    ch.write(Seq((1, "a"), (2, "b")).toDF("id", "msg"), 1)
    val q = ch.readStream().groupBy().agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("chan_stream").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("chan_stream").as[Long].collect().head == 2L)
  }

  test("streaming sink leg: a streaming df lands in the channel (K1)") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val src = reg.create("src", schema)
    val dst = reg.create("dst", schema)
    src.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "msg"), 1)
    val ck = tmpDir("ck")
    val q = dst.sink(
      src.readStream().select(col("id"), col("msg")),
      writerId = 9, checkpoint = ck, availableNow = true)
    q.awaitTermination(30000)
    val rows = dst.read().select("id", Channel.WriterIdCol).as[(Int, Int)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    assert(rows.forall(_._2 == 9))
  }

  test("sink restart from checkpoint is exactly-once across new data") {
    val reg = new ChannelRegistry(spark, tmpDir("chan_restart"))
    val src = reg.create("src_r", schema)
    val dst = reg.create("dst_r", schema)
    val ck = tmpDir("ck_r")
    src.write(Seq((1, "a"), (2, "b")).toDF("id", "msg"), 1)
    def runLeg(): Unit = {
      val q = dst.sink(src.readStream().select(col("id"), col("msg")),
        writerId = 9, checkpoint = ck, availableNow = true)
      q.awaitTermination(30000)
    }
    runLeg()
    // more source data arrives, the pipeline restarts from its checkpoint
    src.write(Seq((3, "c")).toDF("id", "msg"), 1)
    runLeg()
    // and an idle restart with nothing new must add nothing
    runLeg()
    val ids = dst.read().select("id").as[Int].collect().sorted.toSeq
    assert(ids == Seq(1, 2, 3), s"expected exactly-once delivery, got $ids")
  }

  test("weak readStream skips evicted batches (S3)") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t8", schema, capacityBytes = 4 * 1024, dropMode = true)
    (0 until 6).foreach(i => ch.write(Seq((i, "y" * 100)).toDF("id", "msg"), 0))
    assert(ch.droppedBytes > 0)
    val q = ch.readStream(weak = true).groupBy().agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("weak_stream").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("weak_stream").as[Long].collect().head
    assert(n > 0 && n < 6) // survivors only, no failure on the pruned ones
  }

  test("writeEpoch is idempotent per (writer, epoch) — exactly-once replay") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t9", schema)
    val batch = Seq((1, "a"), (2, "b")).toDF("id", "msg")
    ch.writeEpoch(batch, writerId = 3, epochId = 0)
    ch.writeEpoch(batch, writerId = 3, epochId = 0) // replay: no-op
    ch.writeEpoch(batch, writerId = 3, epochId = 1) // next epoch: appended
    assert(ch.read().count() == 4)
  }

  test("writeEpoch replaces a partial (uncommitted) batch on replay") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t9b", schema)
    // Simulate a crash mid-write: the batch dir exists (Spark creates it
    // before job commit) but has no _SUCCESS and no data.
    val partial = ch.dir.resolve("batch_000000000000_w3_e0")
    java.nio.file.Files.createDirectories(partial)
    val batch = Seq((1, "a"), (2, "b")).toDF("id", "msg")
    ch.writeEpoch(batch, writerId = 3, epochId = 0) // replay must NOT skip
    assert(ch.read().count() == 2)
    // …and a committed epoch is still idempotent.
    ch.writeEpoch(batch, writerId = 3, epochId = 0)
    assert(ch.read().count() == 2)
  }

  test("park-mode rejection leaves nothing visible to readers") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t5b", schema, capacityBytes = 1, dropMode = false)
    intercept[Channel.ChannelBackpressure] {
      ch.write(Seq((1, "a")).toDF("id", "msg"), 0)
    }
    assert(ch.read().count() == 0) // the parked frame was never accepted
  }

  test("compaction merges batches, preserving order and attribution") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t10", schema)
    (0 until 5).foreach(i => ch.write(Seq((i, s"m$i")).toDF("id", "msg"), i))
    val before = ch.read().select("id", Channel.WriterIdCol)
      .as[(Int, Int)].collect().toSeq
    ch.compact()
    assert(ch.metrics().collect().head.getAs[Long]("n_batches") == 1)
    // Compacted output lives OUTSIDE the `batch_*` glob readStream watches,
    // so checkpointed subscribers don't re-ingest the whole topic.
    val names = java.nio.file.Files.list(ch.dir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.exists(_.startsWith("compact_")))
    assert(!names.exists(_.startsWith("batch_")))
    val after = ch.read().select("id", Channel.WriterIdCol)
      .as[(Int, Int)].collect().toSeq
    assert(after == before)
    // writes continue after compaction with fresh sequence numbers
    ch.write(Seq((9, "post")).toDF("id", "msg"), 9)
    assert(ch.read().select("id").as[Int].collect().last == 9)
  }

  test("writeEpoch stays idempotent across compaction (no replay duplicates)") {
    val reg = new ChannelRegistry(spark, tmpDir("chan"))
    val ch = reg.create("t10b", schema)
    val batch = Seq((1, "a"), (2, "b")).toDF("id", "msg")
    ch.writeEpoch(batch, writerId = 3, epochId = 0)
    ch.writeEpoch(batch, writerId = 3, epochId = 1)
    ch.compact() // absorbs both epochs' marker dirs into compact_*
    // A sink restarted after the maintenance-window compaction replays its
    // last micro-batch: the absorbed epoch must still be recognized.
    ch.writeEpoch(batch, writerId = 3, epochId = 1)
    assert(ch.read().count() == 4, "compaction broke epoch idempotence")
    // a genuinely new epoch still appends…
    ch.writeEpoch(batch, writerId = 3, epochId = 2)
    assert(ch.read().count() == 6)
    // …and the markers chain through a SECOND compaction
    ch.compact()
    ch.writeEpoch(batch, writerId = 3, epochId = 2)
    assert(ch.read().count() == 6)
  }

  test("registerViews exposes topics to SQL with pushdown intact") {
    val reg = new ChannelRegistry(spark, tmpDir("chanviews"))
    val ch = reg.create("viewt", schema)
    ch.write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "msg"), 0)
    reg.create("viewu", schema)
    val views = reg.registerViews()
    assert(views.sorted == Seq("graft_viewt", "graft_viewu"))
    val got = spark.sql("SELECT msg FROM graft_viewt WHERE id >= 2 ORDER BY id")
      .as[String].collect().toSeq
    assert(got == Seq("b", "c"))
    // the view resolves to the native parquet scan: the filter reaches it
    val plan = spark.sql("SELECT msg FROM graft_viewt WHERE id >= 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThanOrEqual(id,2)"),
      s"filter not pushed to the scan:\n$plan")
  }
}
