package graft

import graft.catalog.Atlas
import graft.ops.StreamOps._
import graft.runtime.{Capability, ModuleSpec, QueryManager, Session}
import graft.streaming.{ConfigFold, LogAnalyser}
import graft.udf.WasmHost
import org.apache.spark.sql.functions._

class EngineSuite extends SparkSpec {
  import spark.implicits._

  // ---- stream ops -------------------------------------------------------

  test("filterMap drops decode failures (T3)") {
    // try_cast = PERMISSIVE decode: failures → null → dropped (ANSI cast
    // would throw, which is exactly the error filterMap exists to strip)
    val df = Seq("1", "x", "3").toDF("raw")
      .filterMap(expr("try_cast(raw AS int)"), "v")
    assert(df.select("v").as[Int].collect().toSeq == Seq(1, 3))
  }

  test("fanout delivers each row exactly once across workers (J4)") {
    val df = (1 to 100).toDF("v").fanout(4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select("v").as[Int].collect().sorted.toSeq == (1 to 100))
  }

  test("requestReply correlates on request_id (J7)") {
    val req = Seq((1L, "ping"), (2L, "pong"), (3L, "lost")).toDF("request_id", "msg")
    val rep = Seq((1L, "ping!"), (2L, "pong!")).toDF("request_id", "reply")
    val joined = req.requestReply(rep, "request_id")
    assert(joined.count() == 2)
    val pending = req.requestReply(rep, "request_id", "left_anti")
    assert(pending.select("msg").as[String].collect().toSeq == Seq("lost"))
  }

  // ---- log-analyser (M2 slice) -----------------------------------------

  test("log-analyser alerts on windows over threshold (A1/A2)") {
    // window [0,5s): 11 errors → alert; [5,10s): 3 errors no alert;
    // [10,15s): 51 warnings → alert
    val logs =
      (0 until 11).map(i => LogAnalyser.LogRecord("Error", "t", s"e$i", Nil, Nil, 1000L + i)) ++
      (0 until 3).map(i => LogAnalyser.LogRecord("Error", "t", s"e$i", Nil, Nil, 6000L + i)) ++
      (0 until 51).map(i => LogAnalyser.LogRecord("Warn", "t", s"w$i", Nil, Nil, 11000L + i))
    val out = LogAnalyser.alerts(logs.toDF(), windowSeconds = 5)
      .orderBy("window_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("errors") == 11)
    assert(out(0).getAs[String]("message") == "11 errors observed in window")
    assert(out(1).getAs[Long]("warnings") == 51)
  }

  test("S8: LogRecord rides the engine's own wire format (nested Vec + enum level)") {
    import LogAnalyser.{LogField, LogRecord, LogSpan}
    // the reference's flagship nested system record over its own runtime
    // wire (logging.rs:101-121 + encoding.rs:29-62): Vec<table> fields,
    // nested spans, enum level incl. the Unknown(i8) fallback
    val recs = Seq(
      LogRecord("Error", "graft.app", "boom",
        Seq(LogField("code", "7"), LogField("op", "scan")),
        Seq(LogSpan("root", Seq(LogField("span_id", "1"))),
          LogSpan("leaf", Nil)), 1000L),
      LogRecord("unknown(9)", "graft.app", "from-the-future", Nil, Nil, 2000L),
      LogRecord("Info", "graft.net", "ok", Nil,
        Seq(LogSpan("conn", Seq(LogField("peer", "10.0.0.1")))), 3000L))
    val df = recs.toDF()
    val wire = LogAnalyser.toWire(df)
    // real v2 frames: magic + nested-layout version byte
    assert(wire.as[Array[Byte]].collect()
      .forall(f => f(0) == 0x47 && f(1) == 2))
    val back = LogAnalyser.fromWire(wire)
    assert(back.toJSON.collect().sorted.toSeq == df.toJSON.collect().sorted.toSeq)
    // a reader declaring a DIFFERENT enum catalogue refuses the frames
    // (schema hash covers the variant list)
    val otherLevels = graft.channel.Enums.EnumDef("LogLevel",
      IndexedSeq("Trace", "Debug", "Info", "Warn", "Fatal"))
    val otherSchema = org.apache.spark.sql.types.StructType(
      otherLevels.field("level") +: LogAnalyser.wireSchema.fields.tail)
    assert(wire.select(
        graft.functions.Codec.decodeBinary(col("frame"), otherSchema).as("r"))
      .filter(col("r").isNotNull).count() == 0)
  }

  // ---- config-state fold (A4/J6) ---------------------------------------

  test("config fold applies latest config, floor 1, in seq order") {
    val tagged = Seq(
      ConfigFold.Tagged("w1", 0, isConfig = false, 0, "p0"),     // before any config
      ConfigFold.Tagged("w1", 1, isConfig = true, 3, ""),        // v1 mult 3
      ConfigFold.Tagged("w1", 2, isConfig = false, 0, "p1"),
      ConfigFold.Tagged("w1", 3, isConfig = true, 0, ""),        // v2 mult floors to 1
      ConfigFold.Tagged("w1", 4, isConfig = false, 0, "p2"),
      ConfigFold.Tagged("w2", 0, isConfig = false, 0, "q0"))     // other key untouched
    val out = ConfigFold(tagged.toDS()).collect().sortBy(a => (a.key, a.seq))
    assert(out.toSeq == Seq(
      ConfigFold.Applied("w1", 0, 0, 1, "p0 x 1"),
      ConfigFold.Applied("w1", 2, 1, 3, "p1 x 3"),
      ConfigFold.Applied("w1", 4, 2, 1, "p2 x 1"),
      ConfigFold.Applied("w2", 0, 0, 1, "q0 x 1")))
  }

  // ---- wasm udf host ----------------------------------------------------

  test("wasm stub module transforms payloads partition-locally") {
    WasmHost.register("m1", () => new WasmHost.WasmModule.Stub())
    val df = Seq((1, "abc"), (2, "xyz")).toDF("id", "s")
      .withColumn("payload", col("s").cast("binary")).drop("s")
    val out = WasmHost.transform(df, "m1", "upper", "payload")
      .select(col("id"), col("payload").cast("string").as("s"))
      .as[(Int, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1, "ABC"), (2, "XYZ")))
    intercept[Exception] {
      WasmHost.transform(df, "m1", "nope", "payload").collect()
    }
  }

  // ---- control plane ----------------------------------------------------

  test("capability sessions attenuate and deny (ACL)") {
    val root = Session("root", Capability.values.toSet)
    val child = root.child("limited", Set(Capability.ChannelRead))
    child.authorise(Capability.ChannelRead)
    intercept[SecurityException] { child.authorise(Capability.ChannelWrite) }
    // child cannot amplify
    val grandchild = child.child("amplify?", Set(Capability.ProcessLifecycle))
    intercept[SecurityException] { grandchild.authorise(Capability.ProcessLifecycle) }
  }

  test("query manager streams per-batch progress telemetry to the log channel") {
    import graft.channel.ChannelRegistry
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val reg = new ChannelRegistry(spark, tmpDir("qmp"))
    val logsCh = reg.create("engine_logs_p",
      implicitly[org.apache.spark.sql.Encoder[LogAnalyser.LogRecord]].schema)
    val qm = new QueryManager(spark, logsChannel = Some(logsCh))
    val listener = qm.attachProgressLogger()
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Long]
      val q = qm.start("prog", Session("ops", Set(Capability.ChannelRead)),
        Set(Capability.ChannelRead)) { _ =>
        input.toDF().writeStream.format("memory").queryName("qm_prog").start()
      }
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      // listener events deliver asynchronously — poll for the record
      val deadline = System.currentTimeMillis() + 15000
      def progressRows() = logsCh.read()
        .filter(col("message") === "pipeline progress").count()
      while (progressRows() == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(progressRows() >= 1, "no progress telemetry landed in the channel")
      qm.stop("prog")
    } finally qm.detachProgressLogger(listener)
  }

  test("autoAck: a managed pipeline's progress drives retention hands-off") {
    // the full production retention loop with no manual ack call: the
    // pipeline subscribes to a topic under QueryManager, autoAck advances
    // the reader head from each progress event, and pruneConsumed then
    // follows the subscription
    import graft.channel.ChannelRegistry
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val reg = new ChannelRegistry(spark, tmpDir("qmaa"))
    val data = reg.create("aa_topic",
      StructType(Seq(StructField("v", LongType))))
    import spark.implicits._
    data.write(Seq(1L, 2L).toDF("v"), writerId = 1)
    data.write(Seq(3L).toDF("v"), writerId = 1)
    val qm = new QueryManager(spark)
    val q = qm.start("tailp", Session("ops", Set(Capability.ChannelRead)),
      Set(Capability.ChannelRead)) { _ =>
      data.readStreamV2().writeStream.format("memory")
        .queryName("qm_autoack").start()
    }
    var listener: org.apache.spark.sql.streaming.StreamingQueryListener = null
    try {
      q.processAllAvailable()
      // attach AFTER the batches ran: the synchronous catch-up from
      // lastProgress must cover everything the bus already delivered —
      // no poll, no race (acks are monotone, so order never matters)
      listener = qm.autoAck(q, data, "tail")
      assert(data.readerHeads("tail") == 2L,
        s"catch-up ack did not land: ${data.readerHeads}")
      assert(data.pruneConsumed(0) > 0L,
        "retention must follow the auto-acked head")
      assert(data.read().select("v").as[Long].collect().toSeq == Seq(3L),
        "history below the auto-acked head prunes; newest batch anchors")
      // the listener path: a LATER batch advances the head asynchronously
      data.write(Seq(4L).toDF("v"), writerId = 1)
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 15000
      while (data.readerHeads("tail") < 3L &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(data.readerHeads("tail") == 3L,
        s"listener ack did not land: ${data.readerHeads}")
    } finally {
      qm.stop("tailp") // stop in finally: an assert above must not leak the stream
      if (listener != null) qm.detachProgressLogger(listener)
    }
  }

  test("query manager refuses pipelines lacking capabilities, logs lifecycle") {
    import graft.channel.ChannelRegistry
    val reg = new ChannelRegistry(spark, tmpDir("qml"))
    val logsCh = reg.create("engine_logs",
      implicitly[org.apache.spark.sql.Encoder[LogAnalyser.LogRecord]].schema)
    val qm = new QueryManager(spark, logsChannel = Some(logsCh))
    val weak = Session("weak", Set.empty)
    intercept[SecurityException] {
      qm.start("p1", weak, Set(Capability.ChannelRead))(_ => fail("must not build"))
    }
    assert(qm.list.isEmpty)
    // the denial is itself an observable LogRecord on the engine channel
    val logs = logsCh.read().select("level", "message").as[(String, String)].collect()
    assert(logs.exists { case (lvl, msg) => lvl == "Warn" && msg == "pipeline denied" })
  }

  test("every source/sink class is deny-by-default across the full grant catalogue") {
    import graft.channel.ChannelRegistry
    val reg = new ChannelRegistry(spark, tmpDir("qmcat"))
    val logsCh = reg.create("engine_logs_cat",
      implicitly[org.apache.spark.sql.Encoder[LogAnalyser.LogRecord]].schema)
    val qm = new QueryManager(spark, logsChannel = Some(logsCh))
    // catalogue parity: the reference's 20 grants (abi lib.rs:114-135)
    // all have an engine counterpart, plus ConfigRead/LogWrite/ChannelShare
    assert(Capability.values.size == 23)
    assert(Capability.Needs.all.size == 9)
    Capability.Needs.all.foreach { case (surface, needs) =>
      // no grants at all → refused before the plan is built
      intercept[SecurityException] {
        qm.start(s"p-$surface", Session(s"none-$surface", Set.empty), needs)(
          _ => fail(s"$surface built without grants"))
      }
      // one grant short → still refused (no partial grants)
      intercept[SecurityException] {
        qm.start(s"p2-$surface", Session(s"short-$surface", needs - needs.head), needs)(
          _ => fail(s"$surface built one grant short"))
      }
      // unrelated grants don't help (deny-by-default, not allow-by-overlap)
      intercept[SecurityException] {
        qm.start(s"p3-$surface", Session(s"other-$surface",
          Set(Capability.LogWrite, Capability.SessionLifecycle)), needs)(
          _ => fail(s"$surface built on unrelated grants"))
      }
    }
    assert(qm.list.isEmpty)
    // every refusal is an observable denial on the engine-log channel,
    // attributed to the refused pipeline (reference: denials surface as
    // PermissionDenied in the process's own tracing channel)
    val denied = logsCh.read()
      .filter(col("message") === "pipeline denied" && col("level") === "Warn")
      .select(explode(col("fields")).as("f"))
      .filter(col("f.key") === "pipeline")
      .select(col("f.value")).as[String].collect().toSet
    Capability.Needs.all.keys.foreach { surface =>
      Seq(s"p-$surface", s"p2-$surface", s"p3-$surface").foreach { p =>
        assert(denied.contains(p), s"no denial logged for $p")
      }
    }
  }

  test("module spec parser (boot deployment syntax)") {
    val s = ModuleSpec.parse("name=waf;capabilities=ChannelRead,ChannelWrite;arg:uri=sel://waf/in")
    assert(s.name == "waf")
    assert(s.capabilities == Set(Capability.ChannelRead, Capability.ChannelWrite))
    assert(s.args == Map("uri" -> "sel://waf/in"))
    intercept[IllegalArgumentException] { ModuleSpec.parse("capabilities=;bogus") }
  }

  test("module store refuses path escapes, logs the denial (validate_path parity)") {
    import graft.channel.ChannelRegistry
    import graft.runtime.ModuleStore
    val reg = new ChannelRegistry(spark, tmpDir("modstore"))
    val logsCh = reg.create("engine_logs_mod",
      implicitly[org.apache.spark.sql.Encoder[LogAnalyser.LogRecord]].schema)
    val qm = new QueryManager(spark, logsChannel = Some(logsCh))
    val base = tmpDir("modbase")
    val store = new ModuleStore(base, onDeny = qm.logModuleDenial)
    // a module inside the store fetches fine
    java.nio.file.Files.createDirectories(store.base.resolve("wasm"))
    java.nio.file.Files.write(store.base.resolve("wasm/m1.wasm"),
      Array[Byte](0, 'a', 's', 'm'))
    assert(store.fetch("wasm/m1.wasm").length == 4)
    // traversal, however spelled, and absolute paths are refused
    intercept[SecurityException] { store.resolve("../outside.wasm") }
    intercept[SecurityException] { store.resolve("wasm/../../etc/passwd") }
    intercept[SecurityException] { store.resolve("/etc/passwd") }
    // a symlink planted INSIDE the store cannot alias a target outside it
    val outside = tmpDir("modoutside")
    java.nio.file.Files.write(outside.resolve("secret"), Array[Byte](42))
    java.nio.file.Files.createSymbolicLink(
      store.base.resolve("link"), outside.resolve("secret"))
    intercept[SecurityException] { store.resolve("link") }
    // dangling link: refused at resolve, not NoSuchFileException at fetch
    java.nio.file.Files.createSymbolicLink(
      store.base.resolve("dangling"), outside.resolve("not-yet-there"))
    intercept[SecurityException] { store.resolve("dangling") }
    // every refusal is an observable denial on the engine-log channel,
    // reason attached (reference: InvalidPath carries base+path)
    val denied = logsCh.read()
      .filter(col("message") === "module path denied" && col("level") === "Warn")
      .select(explode(col("fields")).as("f"))
      .filter(col("f.key") === "path")
      .select(col("f.value")).as[String].collect().toSet
    assert(denied == Set("../outside.wasm", "wasm/../../etc/passwd",
      "/etc/passwd", "link", "dangling"))
  }

  test("atlas URI catalogue with glob lookup (J3)") {
    val atlas = new Atlas
    atlas.insert("sel://logs/svc-a", "ch_a")
    atlas.insert("sel://logs/svc-b", "ch_b")
    atlas.insert("sel://data/in", "ch_d")
    assert(atlas.lookup("sel://logs/*") == Seq("ch_a", "ch_b"))
    assert(atlas.get("sel://data/in").contains("ch_d"))
    atlas.registerSingleton("switchboard", "SB")
    assert(atlas.requireSingleton[String]("switchboard") == "SB")
    intercept[IllegalArgumentException] { atlas.registerSingleton("switchboard", "SB2") }
  }

  test("watermark + append mode finalizes windows (event-time, late data)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val windows = input.toDF().toDF("ts_ms", "level")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "5 seconds"))
      .agg(count(lit(1)).as("n"))
    val q = windows.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_append").start()
    try {
      input.addData((1000L, "a"), (2000L, "b"), (6000L, "c"))
      q.processAllAvailable()
      // watermark hasn't passed the first window's end yet → nothing final
      assert(spark.table("wm_append").count() == 0)
      input.addData((30000L, "late-mover")) // watermark → 20s, closes earlier windows
      q.processAllAvailable()
      input.addData((40000L, "flush"))
      q.processAllAvailable()
      val done = spark.table("wm_append")
        .select(col("window.start").cast("long"), col("n")).as[(Long, Long)]
        .collect().toMap
      assert(done(0L) == 2)  // [0,5s): a,b finalized
      assert(done(5L) == 1)  // [5,10s): c finalized
    } finally q.stop()
  }

  test("channel metrics row reports size and drop accounting") {
    import graft.channel.ChannelRegistry
    import org.apache.spark.sql.types._
    val reg = new ChannelRegistry(spark, tmpDir("m"))
    val schema = StructType(Seq(StructField("id", IntegerType)))
    val ch = reg.create("m1", schema, capacityBytes = 4 * 1024, dropMode = true)
    (0 until 5).foreach(i => ch.write(Seq(i).toDF("id"), 1))
    val m = ch.metrics().collect().head
    assert(m.getAs[String]("channel") == "m1")
    assert(m.getAs[Long]("n_batches") >= 1)
    assert(m.getAs[Long]("dropped_bytes") > 0)
    assert(!m.getAs[Boolean]("drained"))
    // retention observability: Drop eviction already moved the pruned
    // floor; no readers registered yet
    assert(m.getAs[Long]("pruned_floor") > 0L)
    assert(m.getAs[Long]("n_readers") == 0L &&
      m.getAs[Long]("min_reader_head") == -1L)
  }

  test("salted join equals plain join under skew (scale pattern)") {
    import graft.ops.SkewOps
    // hot key: 10k rows of key 1, a handful elsewhere
    val skewed = ((1 to 10000).map(_ => (1L, "hot")) ++ Seq((2L, "cold"), (3L, "cold")))
      .toDF("k", "tag")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).count()
    val salted = SkewOps.saltedJoin(skewed, dim, "k", saltFactor = 8).count()
    assert(salted == plain && plain == 10001L)
  }

  test("streaming dedup by content fingerprint within watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = StreamingDedup.dedupByContent(
      input.toDF().toDF("ts_ms", "text")
        .withColumn("ts", timestamp_millis(col("ts_ms"))),
      "ts", "10 seconds", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    try {
      input.addData(
        (1000L, "Hello  World"), (2000L, "hello world"), // dups after normalize
        (3000L, "another doc"))
      q.processAllAvailable()
      input.addData((4000L, "HELLO WORLD"), (5000L, "third one")) // another dup
      q.processAllAvailable()
      val texts = spark.table("sdedup").select("text").as[String].collect().toSet
      assert(texts.size == 3)
      assert(texts.map(_.toLowerCase.replaceAll("\\s+", " ")) ==
        Set("hello world", "another doc", "third one"))
    } finally q.stop()
  }

  test("stream-stream join: requests meet replies within the window (J7 live)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val reqs = MemoryStream[(Long, Long, String)] // (request_id, ts_ms, msg)
    val reps = MemoryStream[(Long, Long, String)]
    val reqDf = reqs.toDF().toDF("request_id", "ts_ms", "msg")
      .withColumn("req_ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
      .withWatermark("req_ts", "10 seconds")
    val repDf = reps.toDF().toDF("request_id", "ts_ms", "reply")
      .withColumn("rep_ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
      .withWatermark("rep_ts", "10 seconds")
    val j = reqDf.as("q").join(repDf.as("p"),
      col("q.request_id") === col("p.request_id") &&
        col("p.rep_ts").between(col("q.req_ts"),
          col("q.req_ts") + expr("INTERVAL 30 seconds")))
      .select(col("q.request_id"), col("q.msg"), col("p.reply"))
    val query = j.writeStream.format("memory").queryName("ssj").start()
    try {
      reqs.addData((1L, 1000L, "ping"), (2L, 2000L, "pong"))
      reps.addData((1L, 5000L, "ping!"))
      query.processAllAvailable()
      reps.addData((2L, 90000L, "too-late")) // outside the 30s join window
      query.processAllAvailable()
      val rows = spark.table("ssj").select("request_id", "reply")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "ping!")))
    } finally query.stop()
  }

  test("Graft.boot wires the full runtime in one call") {
    val g = Graft.boot(spark, tmpDir("boot"))
    assert(g.atlas.get("sel://graft/logs").contains(Graft.LogsChannel))
    assert(g.atlas.requireSingleton[graft.switchboard.Switchboard]("switchboard") eq g.switchboard)
    // lifecycle events land on the engine logs channel
    intercept[SecurityException] {
      g.queries.start("x", graft.runtime.Session("nobody", Set.empty),
        Set(graft.runtime.Capability.ChannelRead))(_ => fail("unreachable"))
    }
    assert(g.logs.read().count() >= 1)
    // the module store is wired under root/modules and its path denials
    // land on the SAME engine-log channel (the boot CLI resolves every
    // spec path through it before dispatch)
    intercept[SecurityException] { g.modules.resolve("../escape.wasm") }
    assert(g.logs.read()
      .filter(col("message") === "module path denied").count() >= 1)
  }

  test("approx percentiles satisfy the rank-error contract (q_approx_percentiles)") {
    // the query itself encodes the contract: p50_ok/p90_ok assert the
    // returned value's rank window contains p·n within slack — plus the
    // raw sketch stays within 5% of the exact interpolated values
    // (percentile_approx returns a data value; the exact query
    // interpolates, so the semantic gap dominates at small n).
    val d = "/root/testdata/sf0.001"
    val verdict = SparkEntry.queries("q_approx_percentiles")(spark, d)
      .select("event_type", "p50_ok", "p90_ok")
      .as[(String, Boolean, Boolean)].collect()
    assert(verdict.nonEmpty && verdict.forall(v => v._2 && v._3),
      s"rank contract violated: ${verdict.mkString(",")}")
    val got = Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(expr("percentile_approx(value, 0.5, 10000)").as("a50"),
        expr("percentile_approx(value, 0.9, 10000)").as("a90"))
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val exact = SparkEntry.queries("q_percentiles")(spark, d)
      .select("event_type", "median_v", "p90_v")
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    exact.foreach { case (k, (m, p90)) =>
      val (am, ap90) = got(k)
      assert(math.abs(am - m) / math.max(math.abs(m), 1e-9) <= 0.05, s"$k p50: $am vs $m")
      assert(math.abs(ap90 - p90) / math.max(math.abs(p90), 1e-9) <= 0.05, s"$k p90: $ap90 vs $p90")
    }
  }

  test("approx distinct stays within its error contract (q_approx_distinct)") {
    val verdict = SparkEntry.queries("q_approx_distinct")(spark, "/root/testdata/sf0.001")
      .select("event_type", "hll_ok").as[(String, Boolean)].collect()
    assert(verdict.nonEmpty && verdict.forall(_._2),
      s"HLL error contract violated: ${verdict.mkString(",")}")
    val got = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (k, ap, ex) =>
      assert(math.abs(ap - ex).toDouble / ex <= 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("streaming near-dup: cross-batch pairs via state; TTL evicts idle buckets") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingNearDup
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two near-identical docs (one word differs out of ~40 → j ≈ 0.95)
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val twin = base.replace("w40", "zz")
    val far  = (1 to 40).map(i => s"x$i").mkString(" ")

    def run(ttl: Option[java.time.Duration], name: String,
            spacer: Boolean): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, String)]
      val q = StreamingNearDup.pairs(input.toDS(), 0.8, ttl)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      // processAllAvailable() cannot be used with a TTL: ProcessingTimeTimeout
      // makes the engine re-trigger no-data batches for timeout sweeps
      // (FlatMapGroupsWithStateExec.shouldRunAnotherBatch), so `noNewData`
      // is never latched and the call blocks forever. Await SOURCE rows
      // processed via progress telemetry instead.
      def awaitInput(total: Long): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        def processed = q.recentProgress.map(_.numInputRows).sum
        while (processed < total && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(processed >= total, s"$name: only $processed/$total rows processed")
      }
      try {
        input.addData((1L, base))
        awaitInput(1)
        if (spacer) {
          Thread.sleep(50) // let the TTL deadline pass before the next trigger
          input.addData((7L, far)) // unrelated arrival drives the timeout batch
          awaitInput(2)
        }
        input.addData((2L, twin)) // near-dup of doc 1, a later micro-batch
        awaitInput(if (spacer) 3 else 2)
        // the pair (if any) is emitted in doc 2's batch, which is committed
        // once its rows are counted; give the memory sink one settle beat
        Thread.sleep(300)
        spark.table(name).select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      } finally q.stop()
    }

    // unbounded state: the pair is found across micro-batches
    assert(run(None, "snd_unbounded", spacer = false) == Set((1L, 2L)))
    // TTL far beyond the gap: still found (re-arm keeps live buckets)
    assert(run(Some(java.time.Duration.ofHours(1)), "snd_live", spacer = true) ==
      Set((1L, 2L)))
    // TTL shorter than the gap: doc 1's buckets evicted before doc 2 arrives
    assert(run(Some(java.time.Duration.ofMillis(1)), "snd_evicted", spacer = true) ==
      Set.empty[(Long, Long)])
  }

  test("streaming near-dup: bucket state is signature-only (no shingle sets)") {
    // The verify store holds each doc's shingle set ONCE; the 16-way band
    // bucket store holds only (doc_id, 64-int sig). Proof by scaling: grow
    // the documents 16× in length and the bucket store's bytes must stay
    // flat while the doc store's bytes grow with the text.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingNearDup
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // per run: (bucketStoreBytes, docStoreBytes) from the final progress
    def stateBytes(wordsPerDoc: Int, name: String): (Long, Long) = {
      val input = MemoryStream[(Long, String)]
      val q = StreamingNearDup.pairs(input.toDS(), 0.8)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        // all-distinct vocabularies: no near-dup pairs, 16 buckets per doc
        input.addData((0L until 8L).map(d =>
          (d, (1 to wordsPerDoc).map(i => s"d${d}w$i").mkString(" "))))
        q.processAllAvailable()
        val ops = q.lastProgress.stateOperators
        assert(ops.length == 2, s"expected 2 stateful operators, got ${ops.length}")
        // the bucket store has ~16 rows per doc; the doc store exactly 1
        val Array(docOp, bucketOp) = ops.sortBy(_.numRowsTotal)
        assert(bucketOp.numRowsTotal > 4 * docOp.numRowsTotal,
          s"bucket=${bucketOp.numRowsTotal} doc=${docOp.numRowsTotal}")
        (bucketOp.memoryUsedBytes, docOp.memoryUsedBytes)
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }

    val (bShort, dShort) = stateBytes(50, "snd_state_short")
    val (bLong, dLong) = stateBytes(800, "snd_state_long")
    // doc store carries the shingle sets: 16× longer text → much bigger
    assert(dLong > 4 * dShort, s"doc store flat: $dShort -> $dLong")
    // bucket store is signature-only: flat in document length
    assert(bLong < 2 * bShort,
      s"bucket store scales with text: $bShort -> $bLong (shingles leaked into band state?)")
  }

  test("streaming near-dup: checkpoint restart resumes state exactly-once") {
    // The production failure mode: the intake pipeline dies mid-stream
    // and restarts from its checkpoint. Both stateful stages (band
    // buckets + doc-keyed shingle store) must come back from the state
    // store such that (a) a near-dup pair whose members STRADDLE the
    // stop/restart boundary is still found — through restored state, the
    // pre-crash member never re-enters the source — and (b) nothing is
    // emitted twice (the file sink replays only uncommitted batches).
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    def variant(tag: String) = base.replace("w40", tag)
    val mk = (id: Long, words: String) => (id, words)
    // docs 1..4 are all one-word variants of `base` (every pair j ≥ 0.8);
    // 1,2,3 arrive before the restart, 4 after — so (1,4),(2,4),(3,4)
    // are only findable through RESTORED state; (5,6) is entirely
    // post-restart; 7 is unrelated everywhere
    val before = Seq(
      Seq(mk(1L, base), mk(7L, (1 to 40).map(i => s"x$i").mkString(" "))),
      Seq(mk(2L, variant("aa")), mk(3L, variant("ab"))))
    val after = Seq(
      Seq(mk(4L, variant("ac"))),
      Seq(mk(5L, (1 to 40).map(i => s"y$i").mkString(" ") + " p"),
          mk(6L, (1 to 40).map(i => s"y$i").mkString(" ") + " q")))

    val in = tmpDir("snd_restart_in")
    val ck = tmpDir("snd_restart_ck").toString
    val out = tmpDir("snd_restart_out").toString
    var fileNo = 0
    // flat dir of single parquet files, one per intended micro-batch
    def stage(batches: Seq[Seq[(Long, String)]]): Unit = batches.foreach { b =>
      val scratch = tmpDir(s"snd_restart_scratch$fileNo")
      b.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(scratch.toString)
      val listing = java.nio.file.Files.list(scratch)
      val part =
        try {
          import scala.jdk.CollectionConverters._
          listing.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
        } finally listing.close()
      java.nio.file.Files.move(part, in.resolve(f"f$fileNo%03d.parquet"))
      fileNo += 1
    }
    def run(): Unit = {
      val schema = spark.read.parquet(in.toString).schema
      val stream = graft.streaming.StreamingNearDup.pairs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(in.toString)
          .as[(Long, String)], 0.8)
      val q = stream.writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    stage(before)
    run() // first incarnation: sees docs 1,7,2,3 then dies (q.stop)
    stage(after)
    run() // restart from checkpoint: sees only docs 4,5,6

    val got = spark.read.parquet(out)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    // batch truth: every pair among {1,2,3,4} (all j ≥ 0.9 variants of
    // base) plus (5,6); (1,4),(2,4),(3,4) REQUIRE restored state
    val want = Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
      (3L, 4L), (5L, 6L))
    assert(got.toSet == want, s"got ${got.toSet}")
    assert(got.size == want.size, s"duplicate emissions: $got")
  }

  test("streaming funnel: checkpoint restart carries stage state across the boundary") {
    // The CEP analogue of the near-dup restart claim: a funnel whose
    // stages STRADDLE the stop/restart boundary must complete through
    // RESTORED per-user state (the pre-crash signup/click never re-enter
    // the source), and a funnel completed pre-crash must not re-emit.
    import spark.implicits._
    import graft.streaming.FunnelMatch
    val H = 3600000000L // 1 h in µs
    def ev(id: Long, u: Long, tpe: String, t: Long) = (u, id, tpe, t)
    val before = Seq(
      Seq(ev(1, 10, "signup", 0L), ev(2, 20, "signup", 0L)),
      Seq(ev(3, 10, "click", H), ev(4, 20, "click", H),
        ev(5, 20, "purchase", 2 * H), // user 20 completes pre-crash
        ev(6, 30, "signup", 0L)))
    val after = Seq(
      Seq(ev(7, 10, "purchase", 3 * H), // completes ONLY via restored state
        ev(8, 30, "click", 30 * H))) // outside the 24 h window → no match
    val in = tmpDir("funnel_restart_in")
    val ck = tmpDir("funnel_restart_ck").toString
    val out = tmpDir("funnel_restart_out").toString
    var fileNo = 0
    def stage(batches: Seq[Seq[(Long, Long, String, Long)]]): Unit =
      batches.foreach { b =>
        val scratch = tmpDir(s"funnel_restart_scratch$fileNo")
        b.toDF("user_id", "event_id", "event_type", "t").coalesce(1)
          .write.mode("overwrite").parquet(scratch.toString)
        val listing = java.nio.file.Files.list(scratch)
        val part =
          try {
            import scala.jdk.CollectionConverters._
            listing.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet")).get
          } finally listing.close()
        java.nio.file.Files.move(part, in.resolve(f"f$fileNo%03d.parquet"))
        fileNo += 1
      }
    def run(): Unit = {
      val schema = spark.read.parquet(in.toString).schema
      val q = FunnelMatch(spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(in.toString)
          .as[FunnelMatch.Ev])
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    stage(before)
    run() // first incarnation dies after user 20 completed
    stage(after)
    run() // restart: user 10's purchase meets restored (t0, t1) state
    val got = spark.read.parquet(out)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = Set((20L, 0L, H, 2 * H), (10L, 0L, H, 3 * H))
    assert(got.toSet == want, s"got ${got.toSet}")
    assert(got.size == want.size, s"duplicate emissions: $got")
  }

  test("streaming funnel: one pathologically hot user concentrated in single triggers") {
    // The hot-key posture under test: FunnelMatch.step buffers and sorts
    // ONE key's events from ONE micro-batch in task heap, so a single
    // hot user concentrates a whole trigger in one task. Correctness
    // must hold under that concentration: the unordered group iterator
    // (thousands of interleaved noise/decoy events, written shuffled)
    // still steps the machine in (t, event_id) order, takes the FIRST
    // qualifying event per stage, and emits exactly once — a second
    // complete sequence after the match must not re-fire.
    import spark.implicits._
    import graft.streaming.FunnelMatch
    val rnd = new scala.util.Random(7)
    def ev(id: Long, u: Long, tpe: String, t: Long) = (u, id, tpe, t)
    val noise1 = (1000L until 4000L).map(i =>
      ev(i, 1L, if (i % 3 == 0) "noise" else "click", 1000000L + i))
    val hotBatch1 = rnd.shuffle(noise1 ++ Seq(
      ev(5L, 1L, "purchase", 15L), // before any click → ignored
      ev(1L, 1L, "signup", 10L),
      ev(2L, 1L, "click", 20L), // FIRST qualifying click (noise clicks are later)
      ev(3L, 1L, "purchase", 30L), // completes
      ev(7L, 2L, "signup", 10L))) // a cold user coexists in the trigger
    val hotBatch2 = rnd.shuffle((5000L until 6000L).map(i =>
      ev(i, 1L, "click", 2000000L + i)) ++ Seq(
      ev(8L, 1L, "signup", 3000000L), // full second sequence post-match
      ev(9L, 1L, "click", 3000010L),
      ev(10L, 1L, "purchase", 3000020L),
      ev(11L, 2L, "click", 40L),
      ev(12L, 2L, "purchase", 60L))) // cold user completes normally
    val in = tmpDir("funnel_hot_in")
    var fileNo = 0
    def stage(b: Seq[(Long, Long, String, Long)]): Unit = {
      val scratch = tmpDir(s"funnel_hot_scratch$fileNo")
      b.toDF("user_id", "event_id", "event_type", "t").coalesce(1)
        .write.mode("overwrite").parquet(scratch.toString)
      val listing = java.nio.file.Files.list(scratch)
      val part =
        try {
          import scala.jdk.CollectionConverters._
          listing.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
        } finally listing.close()
      java.nio.file.Files.move(part, in.resolve(f"f$fileNo%03d.parquet"))
      fileNo += 1
    }
    stage(hotBatch1); stage(hotBatch2)
    val schema = spark.read.parquet(in.toString).schema
    val got = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    val dups = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val q = FunnelMatch(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in.toString)
        .as[FunnelMatch.Ev])
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelMatch.Completion], _: Long) =>
        b.collect().foreach { c =>
          val row = (c.user_id, c.t0, c.t1, c.t2)
          if (!got.add(row)) dups += row
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.toSet == Set((1L, 10L, 20L, 30L), (2L, 10L, 40L, 60L)),
      s"got $got")
    assert(dups.isEmpty, s"re-emissions under hot-key concentration: $dups")
  }

  test("streaming near-dup: event-time TTL drops beyond-horizon duplicates") {
    // pairsEventTime: the dedup horizon is watermark-driven — once the
    // WATERMARK passes a document's event time + horizon, its state is
    // swept, and a twin arriving after that is missed; a twin arriving
    // while the original is still inside the horizon is caught. The twin
    // itself is on-time in both runs (ts ≥ watermark — a row older than
    // the watermark is dropped as late input by FMGWS before state is
    // consulted, which is standard lateness-bound semantics, not the
    // eviction under test). Wall-clock plays no part (replayed history
    // works).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingNearDup
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val twin = base.replace("w40", "zz")
    val far  = (1 to 40).map(i => s"x$i").mkString(" ")
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

    def run(advanceTo: Long, name: String): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = StreamingNearDup.pairsEventTime(input.toDS(),
          horizon = java.time.Duration.ofSeconds(10), threshold = 0.8)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        input.addData((1L, base, ts(1000)))      // doc 1 @ t=1000
        q.processAllAvailable()
        input.addData((7L, far, ts(advanceTo)))  // watermark → advanceTo
        q.processAllAvailable()                  // + no-data sweep batch
        input.addData((2L, twin, ts(advanceTo + 1))) // on-time twin
        q.processAllAvailable()
        spark.table(name).select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }

    // pairsEventTime flips the session to legacy multi-stateful watermark
    // mode (analysis-time confs); restore afterwards — the suite's session
    // is shared JVM-wide via getOrCreate, and later suites' watermarked
    // queries must analyze under the default propagator
    val confs = Seq(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
      "spark.sql.streaming.statefulOperator.allowMultiple")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    try {
      // watermark 1008 < 1000+10: doc 1 still inside the horizon → caught
      assert(run(1008, "snd_et_live") == Set((1L, 2L)))
      // watermark 1020 > 1000+10: doc 1 swept before the twin → missed
      assert(run(1020, "snd_et_evicted") == Set.empty[(Long, Long)])
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("streaming near-dup rides the engine's own channel source") {
    // the reference's pipeline shape: documents arrive on a channel and
    // are deduped AT INGEST — StreamingNearDup over the DSv2 seq-offset
    // connector, one channel write per micro-batch, pair found through
    // band-bucket state across the batch boundary
    import graft.channel.ChannelRegistry
    import graft.streaming.StreamingNearDup
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import spark.implicits._
    val reg = new ChannelRegistry(spark, tmpDir("snd_ch"))
    val ch = reg.create("docs_in", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
    val base = (1 to 40).map(i => s"c$i").mkString(" ")
    val twin = base.replace("c40", "zz")
    ch.write(Seq((10L, base)).toDF("doc_id", "text"), writerId = 1)
    ch.write(Seq((11L, twin)).toDF("doc_id", "text"), writerId = 1)
    val stream = ch.readStreamV2(maxBatchesPerTrigger = Some(1))
      .select(col("doc_id"), col("text")).as[(Long, String)]
    val q = StreamingNearDup.pairs(stream, 0.8)
      .writeStream.outputMode("append").format("memory").queryName("snd_ch").start()
    try {
      q.processAllAvailable()
      val got = spark.table("snd_ch")
        .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
      assert(got.map(p => (p._1, p._2)).toSet == Set((10L, 11L)), got.mkString(","))
      assert(got.head._3 >= 0.9, s"jaccard ${got.head._3}")
    } finally q.stop()
  }

  test("sampling gate is independent of the split gate (disjoint digest regions)") {
    // Regression guard for a review-caught bug: the weighted-sampling
    // gate originally read md5 hex digits 1-4 while the train/val/test
    // split reads digit 1 — a w=0.5 sample then kept ONLY first-digit
    // 0-7 docs, i.e. 100% train, and the DuckDB oracle could not see it
    // because both sides computed the same biased gate. The sampler now
    // reads digits 5-8; this asserts the composed property directly:
    // a 50% hash sample must retain every split, in roughly the split's
    // own proportion.
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val h1 = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
    val split = when(h1 <= "b", "train").when(h1 <= "d", "val").otherwise("test")
    val h58 = substring(md5(col("doc_id").cast("string").cast("binary")), 5, 4)
    val sampled = docs.filter(h58 < "8000") // w = 0.5 gate, digits 5-8
      .groupBy(split.as("split")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(sampled.keySet == Set("train", "val", "test"),
      s"sample lost whole splits: $sampled")
    val total = sampled.values.sum.toDouble
    // splits are 12/2/2 sixteenths of the corpus; allow generous noise
    assert(sampled("train") / total > 0.55 && sampled("train") / total < 0.92,
      s"train share skewed: $sampled")
  }

  test("streaming session windows: checkpoint restart merges state across the boundary") {
    // The production failure mode for sessionization: the pipeline dies
    // with sessions OPEN in the state store and restarts from its
    // checkpoint. A session whose events straddle the stop/restart
    // boundary must come back as ONE merged session (the pre-crash events
    // never re-enter the source — only restored state can supply them),
    // and nothing may be emitted twice. user 10: events at 10:00 and
    // 10:30 pre-crash, 10:50 post-restart → one 3-event session through
    // restored state. user 20: 10:00 pre-crash, 13:00 post-restart →
    // gap > 1h, two distinct 1-event sessions. Sentinels at 16:00/20:00
    // drive the watermark over every real session end (emission lags the
    // watermark by one batch — the same two-sentinel contract as
    // q_stream_sessions).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val before = Seq(
      Seq((10L, ts("10:00")), (20L, ts("10:00"))),
      Seq((10L, ts("10:30"))))
    val after = Seq(
      Seq((10L, ts("10:50")), (20L, ts("13:00"))),
      Seq((-1L, ts("16:00"))),
      Seq((-1L, ts("20:00"))))
    val in = tmpDir("sess_restart_in")
    val ck = tmpDir("sess_restart_ck").toString
    val out = tmpDir("sess_restart_out").toString
    var fileNo = 0
    def stage(batches: Seq[Seq[(Long, java.sql.Timestamp)]]): Unit = batches.foreach { b =>
      val scratch = tmpDir(s"sess_restart_scratch$fileNo")
      b.toDF("user_id", "ets").coalesce(1)
        .write.mode("overwrite").parquet(scratch.toString)
      val listing = java.nio.file.Files.list(scratch)
      val part =
        try {
          import scala.jdk.CollectionConverters._
          listing.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
        } finally listing.close()
      java.nio.file.Files.move(part, in.resolve(f"f$fileNo%03d.parquet"))
      fileNo += 1
    }
    def run(): Unit = {
      val schema = spark.read.parquet(in.toString).schema
      val sessions = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in.toString)
        .withWatermark("ets", "0 seconds")
        .groupBy(session_window(col("ets"), "1 hour").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), col("sw.start").cast("long").as("start_s"), col("cnt"))
      val q = sessions.writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    stage(before)
    run() // first incarnation: user 10's session open at 10:30, dies
    stage(after)
    run() // restart: 10:50 must extend the RESTORED 10:00–10:30 session
    val got = spark.read.parquet(out)
      .filter(col("user_id") >= 0)
      .select("user_id", "start_s", "cnt").as[(Long, Long, Long)]
      .collect().toSet
    def epoch(hhmm: String) = ts(hhmm).getTime / 1000
    val want = Set(
      (10L, epoch("10:00"), 3L), // merged across the restart boundary
      (20L, epoch("10:00"), 1L),
      (20L, epoch("13:00"), 1L))
    assert(got == want, s"got $got")
  }
}
