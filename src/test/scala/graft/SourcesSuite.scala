package graft

import java.io.PrintWriter
import java.net.ServerSocket

import graft.streaming.Generators
import org.apache.spark.sql.functions._

class SourcesSuite extends SparkSpec {
  import spark.implicits._

  test("LCG generator matches the reference sequence (S7, golden)") {
    // wrapping i32: state = state * 1103515245 + 12345, seed -1
    // (reference examples/data-pipeline/src/lib.rs:28-30)
    val seq = Generators.lcgSequence(4)
    assert(seq(0) == -1 * 1103515245 + 12345)
    assert(seq(1) == seq(0) * 1103515245 + 12345) // native wrapping
    val df = Generators.lcgBatch(spark, 4)
    assert(df.orderBy("idx").select("value").as[Int].collect().toSeq == seq)
  }

  test("streaming LCG (rate source shape) equals the golden sequence") {
    // drive the same positional-LCG expression over a batch stand-in for
    // the rate source (identical expression tree, deterministic input)
    val rateLike = (0L until 8L).toDF("value")
    def wrap(x: org.apache.spark.sql.Column) =
      pmod(x + lit(2147483648L), lit(4294967296L)) - lit(2147483648L)
    val out = rateLike.select(
      aggregate(sequence(lit(0L), col("value")), lit(-1L),
        (acc, _) => wrap(acc * lit(1103515245L) + lit(12345L))).as("v"))
      .as[Long].collect().toSeq
    assert(out == Generators.lcgSequence(8).map(_.toLong))
  }

  test("socket source ingests framed text (S4/S5 parity shape)") {
    // the network edge terminates at the driver-side source and flows
    // request records (SURVEY §7.4.5); Spark's built-in socket source is
    // the minimal TCP form of that
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val feeder = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      (1 to 5).foreach(i => out.println(s"req-$i GET /path/$i"))
      out.flush()
      Thread.sleep(2000)
      sock.close(); server.close()
    })
    feeder.setDaemon(true)
    feeder.start()

    val stream = spark.readStream.format("socket")
      .option("host", "localhost").option("port", port.toString).load()
      .select(split(col("value"), " ").as("t"))
      .select(element_at(col("t"), 1).as("req_id"), element_at(col("t"), 3).as("path"))
    val q = stream.writeStream.format("memory").queryName("sock").start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (spark.table("sock").count() < 5 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
    } finally q.stop()
    val rows = spark.table("sock").as[(String, String)].collect().sortBy(_._1)
    assert(rows.length == 5)
    assert(rows.head == ("req-1", "/path/1"))
  }
  test("events.ts normalizes to nano longs from BOTH shipped parquet forms") {
    // The driver's testdata generator has shipped events.ts as INT64
    // TIMESTAMP(NANOS) (read as raw longs via nanosAsLong) and as a plain
    // microsecond timestamp (reads as TIMESTAMP_NTZ). Every engine-side
    // `ts div 1000` and every DuckDB `epoch_us(ts)` oracle assumes nano
    // longs — pin both normalizeEventsTs branches. (Spark cannot WRITE a
    // nanos-annotated parquet, so the "long" leg below pins the
    // LongType-identity branch with a plain INT64 column, not the
    // nanosAsLong decode itself; the timestamp leg pins the µs→nanos
    // conversion exactly.)
    import org.apache.spark.sql.types._
    val dir = tmpDir("events_forms")
    Tables.ensureConf(spark)

    // long-nanos form: already the canonical representation → identity
    val nanos = Seq((1L, 1700000000123456000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    nanos.write.mode("overwrite").parquet(s"$dir/long/events.parquet")
    val viaLong = Tables.events(spark, s"$dir/long")
    assert(viaLong.schema("ts").dataType == LongType)
    assert(viaLong.select("ts").as[Long].head() == 1700000000123456000L)

    // timestamp form (µs precision): NTZ wall time in the UTC session →
    // the SAME nano long, exact to the microsecond
    val tsForm = Seq((1L, new java.sql.Timestamp(0L), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(1700000000123456)"))
    tsForm.write.mode("overwrite").parquet(s"$dir/tstype/events.parquet")
    val viaTs = Tables.events(spark, s"$dir/tstype")
    assert(viaTs.schema("ts").dataType == LongType)
    assert(viaTs.select("ts").as[Long].head() == 1700000000123456000L)

    // and the day-bucket helper — the form most oracles consume — agrees
    val d1 = viaLong.select(Tables.tsDay("ts")).as[String].head()
    val d2 = viaTs.select(Tables.tsDay("ts")).as[String].head()
    assert(d1 == d2)
  }

}
