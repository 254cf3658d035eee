package graft

import graft.functions._
import org.apache.spark.sql.functions._

class FunctionsSuite extends SparkSpec {
  import spark.implicits._

  test("nfc_normalize: composes decomposed sequences, identity on NFC, null-safe") {
    val decomposed = "cafe\u0301"           // e + combining acute
    val composed = "caf\u00e9"              // precomposed e-acute
    val multi = "a\u0301b\u0308c"          // two combining-mark sequences
    val df = Seq(
      ("d", decomposed), ("c", composed), ("a", "plain ascii"), ("m", multi))
      .toDF("id", "text")
      .select(col("id"), NfcNormalize(col("text")).as("n"))
    val out = df.as[(String, String)].collect().toMap
    assert(out("d") == composed)
    assert(out("c") == composed)           // already NFC -> unchanged
    assert(out("a") == "plain ascii")      // ASCII fast path
    assert(out("m") ==
      java.text.Normalizer.normalize(multi, java.text.Normalizer.Form.NFC))
    // null flows through the standard null-safe codegen path
    val n = Seq(Option.empty[String], Some(decomposed)).toDF("text")
      .select(NfcNormalize(col("text"))).collect()
    assert(n(0).isNullAt(0) && n(1).getString(0) == composed)
  }

  test("tokenCount / shingles") {
    val df = Seq("a b c d", "x y", "solo").toDF("text")
    assert(df.select(TextFunctions.tokenCount(col("text"))).as[Int].collect().toSeq
      == Seq(4, 2, 1))
    val sh = df.select(TextFunctions.shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Nil) // shorter than n → empty, not sequence(1,0) garbage
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val df = Seq(
      ("a", "Hello  World"), ("b", "hello world"), ("c", "hello there"))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.fingerprint(col("text")).as("fp"))
    val fps = df.as[(String, String)].collect().toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
    assert(fps("a").length == 16)
  }

  test("langIdVote picks marker language, und on no match") {
    val markers = Map("en" -> Seq("the"), "fr" -> Seq("le"))
    val df = Seq("the cat sat", "le chat", "zzz yyy").toDF("text")
      .select(TextFunctions.langIdVote(col("text"), markers))
    assert(df.as[String].collect().toSeq == Seq("en", "fr", "und"))
  }

  test("minhash estimates Jaccard; near-dups collide in LSH bands") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"tok$i").mkString(" ") + " alt59 alt60"
    val distinct = (100 to 160).map(i => s"other$i").mkString(" ")
    val docs = Seq((0L, base), (1L, nearDup), (2L, distinct)).toDF("doc_id", "text")
    val sig = MinHash.signatures(docs, "doc_id", "text")
    val cands = MinHash.candidates(MinHash.bands(sig, "doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 1L)))    // planted near-dup found
    assert(!cands.contains((0L, 2L)))   // unrelated doc not a candidate
    val est = sig.as[(Long, Seq[Int])].collect().toMap
    val estJ = est(0L).zip(est(1L)).count { case (a, b) => a == b } / 32.0
    assert(estJ > 0.6) // true jaccard ≈ 56/64 shingle overlap ≈ 0.87
  }

  test("simhash: identical docs distance 0, near-dups close, others far") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val near = (1 to 48).map(i => s"w$i").mkString(" ") + " q1 q2"
    val far = (200 to 250).map(i => s"z$i").mkString(" ")
    val docs = Seq((0L, base), (1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val sig = SimHash.signatures(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sig(0L) == sig(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0L), sig(2L)) < ham(sig(0L), sig(3L)))
    val pairs = SimHash.nearPairs(SimHash.signatures(docs, "doc_id", "text"), "doc_id", 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    // wider radii band into maxDist+1 chunks (pigeonhole-complete for
    // that radius) — recall must equal the brute-force pair set, and a
    // radius past the selectivity cap is still refused
    intercept[IllegalArgumentException] {
      SimHash.nearPairs(SimHash.signatures(docs, "doc_id", "text"), "doc_id", 16)
    }
  }

  test("simhash nearPairs: wide radii are pigeonhole-complete vs brute force") {
    // crafted signatures exercising every banding regime: planted pairs
    // at exact Hamming distances 0..9 (bits spread so that for the
    // larger distances EVERY 4x15 chunk is touched — the old banding
    // would have missed them), plus far-apart fillers
    val sigs: Seq[(Long, Long)] = Seq(
      0L -> 0x0L,
      1L -> 0x0L,                              // d(0,1)=0
      2L -> ((1L << 2) | (1L << 17)),          // d(0,2)=2, spans 2 chunks
      3L -> ((1L << 1) | (1L << 16) | (1L << 31) | (1L << 46)), // d=4, all 4 chunks
      4L -> ((1L << 3) | (1L << 12) | (1L << 22) | (1L << 33) |
             (1L << 44) | (1L << 55)),         // d(0,4)=6
      5L -> ((1L << 0) | (1L << 7) | (1L << 14) | (1L << 21) | (1L << 28) |
             (1L << 35) | (1L << 42) | (1L << 49) | (1L << 56)), // d(0,5)=9
      6L -> 0x0FFFFFFFFFFFFFFFL,               // far from everything sparse
      7L -> 0x0AAAAAAAAAAAAAAAL)
    val df = sigs.toDF("doc_id", "simhash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (k <- Seq(0, 3, 4, 6, 9, 15)) {
      val expect = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs
        if ia < ib && ham(sa, sb) <= k
      } yield (ia, ib)).toSet
      val got = SimHash.nearPairs(df, "doc_id", k)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == expect, s"maxDist=$k")
    }
  }

  test("vector cosine: identity 1, orthogonal 0; LSH buckets stable") {
    val df = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("id", "v")
    val sims = df.as("a").crossJoin(df.as("b"))
      .select(col("a.id"), col("b.id"),
        round(VectorFunctions.cosine(col("a.v"), col("b.v")), 9).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(sims((0L, 1L)) == 1.0)
    assert(sims((0L, 2L)) == 0.0)
    val buckets = df.select(col("id"), SignLsh.bucket(col("v"), 4, 4).as("bk"))
      .as[(Long, Long)].collect().toMap
    assert(buckets(0L) == buckets(1L)) // identical vectors → same bucket
  }

  test("multimodal decodePartitions emits deterministic metadata") {
    import graft.functions.Multimodal
    val ds = Seq(
      Multimodal.MediaRecord(1L, "hello".getBytes("UTF-8"), "text/plain"),
      Multimodal.MediaRecord(2L, Array.emptyByteArray, "text/plain")).toDS()
    val out = Multimodal.decodePartitions(ds).collect().sortBy(_.media_id)
    assert(out(0).n_bytes == 5 && out(0).width == (5 % 64 + 1) * 16)
    assert(out(1).n_bytes == 0 && out(1).n_frames == 1)
    // determinism: same input, same checksum
    val again = Multimodal.decodePartitions(ds).collect().sortBy(_.media_id)
    assert(out.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("schema hash is stable and field-order sensitive") {
    import org.apache.spark.sql.types._
    val s1 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val s2 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val s3 = StructType(Seq(StructField("b", StringType), StructField("a", IntegerType)))
    assert(graft.channel.SchemaRegistry.hash(s1) == graft.channel.SchemaRegistry.hash(s2))
    assert(graft.channel.SchemaRegistry.hash(s1) != graft.channel.SchemaRegistry.hash(s3))
  }

  test("tokensRegex splits words, numbers and symbols (BPE-ish pre-tokenizer)") {
    val df = Seq("hello, world! x2", "don't stop").toDF("text")
    val toks = df.select(TextFunctions.tokensRegex(col("text"))).as[Seq[String]].collect()
    assert(toks(0) == Seq("hello", ",", "world", "!", "x2"))
    assert(toks(1) == Seq("don't", "stop"))
  }

  test("multi-table LSH recall@1 >= 0.85 on real embeddings (deterministic)") {
    val d = "/root/testdata/sf0.001"
    val lsh = graft.queries.VectorOps.annLshNeighbors(spark, d)
      .select("src", "nbr").as[(Long, Long)].collect().toMap
    val exact = {
      val e = spark.read.parquet(s"$d/embeddings.parquet")
        .withColumn("v", col("embedding").cast("array<double>"))
      val a = e.select(col("vec_id").as("src"), col("v").as("va"))
      val b = e.select(col("vec_id").as("nbr"), col("v").as("vb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("sim").desc, col("nbr"))
      a.crossJoin(b).filter(col("src") =!= col("nbr"))
        .select(col("src"), col("nbr"),
          round(VectorFunctions.cosine(col("va"), col("vb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("src", "nbr").as[(Long, Long)].collect().toMap
    }
    val recall = exact.count { case (src, nn) => lsh.get(src).contains(nn) }.toDouble / exact.size
    info(f"LSH recall@1 = $recall%.3f over ${exact.size} vectors")
    assert(recall >= 0.85)
  }

  test("ANN recall holds at sf0.1: LSH auto-sized, IVF, PQ (deterministic)") {
    // auto-sized LSH planes (log2(n/32)) and stride-sampled IVF/PQ
    // training all change regime above sf0.001 — pin recall at n=2000
    val d = "/root/testdata/sf0.1"
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
      .repartition(4, col("vec_id"))
    val a = e.select(col("vec_id").as("src"), col("v").as("va"))
    val b = e.select(col("vec_id").as("nbr"), col("v").as("vb"))
    val exact = a.crossJoin(broadcast(b)).filter(col("src") =!= col("nbr"))
      .select(col("src"), col("nbr"),
        VectorFunctions.cosine(col("va"), col("vb")).as("sim"))
      .groupBy(col("src"))
      .agg(min(struct((-col("sim")).as("ns"), col("nbr").as("nb"))).as("m"))
      .select(col("src"), col("m.nb").as("nbr"))
      .as[(Long, Long)].collect().toMap

    val lsh = graft.queries.VectorOps.annLshNeighbors(spark, d)
      .select("src", "nbr").as[(Long, Long)].collect().toMap
    val lshR = exact.count { case (s0, nn) => lsh.get(s0).contains(nn) }.toDouble / exact.size
    info(f"LSH recall@1 at sf0.1 = $lshR%.3f")
    assert(lshR >= 0.7)

    val ivf = graft.queries.VectorOps.annIvfNeighbors(spark, d)
      .select("src", "nbr").as[(Long, Long)].collect().toMap
    val ivfR = exact.count { case (s0, nn) => ivf.get(s0).contains(nn) }.toDouble / exact.size
    info(f"IVF recall@1 at sf0.1 = $ivfR%.3f")
    assert(ivfR >= 0.6)

    val pq = graft.queries.VectorOps.annPqTopk(spark, d)
      .select("vec_id").as[Long].collect().toSet
    val exactTop10 = SparkEntry.queries("q_embed_topk")(spark, d)
      .select("vec_id").as[Long].collect().toSet
    val pqR = (pq intersect exactTop10).size.toDouble / exactTop10.size
    info(f"PQ recall@10 at sf0.1 = $pqR%.2f")
    assert(pqR >= 0.7)
  }

  test("IVF ANN recall@1 >= 0.65 on real embeddings (deterministic)") {
    val d = "/root/testdata/sf0.001"
    val ivf = graft.queries.VectorOps.annIvfNeighbors(spark, d)
      .select("src", "nbr").as[(Long, Long)].collect().toMap
    val e = spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("v", col("embedding").cast("array<double>"))
    val a = e.select(col("vec_id").as("src"), col("v").as("va"))
    val b = e.select(col("vec_id").as("nbr"), col("v").as("vb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("sim").desc, col("nbr"))
    val exact = a.crossJoin(b).filter(col("src") =!= col("nbr"))
      .select(col("src"), col("nbr"),
        round(VectorFunctions.cosine(col("va"), col("vb")), 6).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("src", "nbr").as[(Long, Long)].collect().toMap
    val recall = exact.count { case (s0, nn) => ivf.get(s0).contains(nn) }.toDouble / exact.size
    info(f"IVF recall@1 = $recall%.3f over ${exact.size} vectors")
    assert(recall >= 0.65)
  }

  test("PQ ANN recall@10 >= 0.9 vs exact top-10 (deterministic)") {
    val d = "/root/testdata/sf0.001"
    val pq = graft.queries.VectorOps.annPqTopk(spark, d)
      .select("vec_id").as[Long].collect().toSet
    val exact = SparkEntry.queries("q_embed_topk")(spark, d)
      .select("vec_id").as[Long].collect().toSet
    val recall = (pq intersect exact).size.toDouble / exact.size
    info(f"PQ recall@10 = $recall%.2f")
    assert(recall >= 0.9)
  }

  test("winnowed fingerprints: shared substrings collide, edits keep overlap") {
    import graft.functions.Winnow
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val edited = base.replace("lazy", "hazy") // small local edit
    val unrelated = "completely different content with no shared runs at all " * 4
    val df = Seq((1L, base), (2L, edited), (3L, unrelated), (4L, base))
      .toDF("id", "t")
      .select(col("id"), Winnow.fingerprints(col("t")).as("fps"))
    val fps = df.as[(Long, Seq[Long])].collect().toMap
    // identical docs → identical prints (deterministic)
    assert(fps(1L) == fps(4L) && fps(1L).nonEmpty)
    def overlap(a: Seq[Long], b: Seq[Long]) =
      (a.toSet intersect b.toSet).size.toDouble / a.toSet.size
    // a one-word edit preserves most prints (the rolling-hash win over
    // whole-document hashing)
    assert(overlap(fps(1L), fps(2L)) > 0.5, s"edit overlap ${overlap(fps(1L), fps(2L))}")
    // unrelated text shares (essentially) nothing
    assert(overlap(fps(1L), fps(3L)) < 0.05)
    // winnowing guarantee: any shared substring of length >= k+w-1 (11)
    // yields a shared print
    val s1 = Seq((10L, "xxxxx SHARED-RUN-OF-TEXT-LONG-ENOUGH yyyyy"))
      .toDF("id", "t").select(Winnow.fingerprints(col("t")).as("f"))
      .as[Seq[Long]].head().toSet
    val s2 = Seq((11L, "aaaaa SHARED-RUN-OF-TEXT-LONG-ENOUGH bbbbb"))
      .toDF("id", "t").select(Winnow.fingerprints(col("t")).as("f"))
      .as[Seq[Long]].head().toSet
    assert((s1 intersect s2).nonEmpty)
  }

  test("binary codec: lossless roundtrip over every supported type, nulls included") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i8", ByteType),
      StructField("i16", ShortType), StructField("i32", IntegerType),
      StructField("i64", LongType), StructField("f32", FloatType),
      StructField("f64", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("xs", ArrayType(LongType))))
    val rows = Seq(
      (true, 1.toByte, 2.toShort, 3, 4L, 0.5f, 0.25, "héllo ütf-8 ∆", Array[Byte](1, 2, 3), Seq(7L, 8L)),
      (false, -1.toByte, -2.toShort, -3, -4L, -0.5f, -0.25, "", Array.emptyByteArray, Seq.empty[Long]))
    val df = rows.toDF("b", "i8", "i16", "i32", "i64", "f32", "f64", "s", "bin", "xs")
    val back = df.select(Codec.encodeBinary(df.columns.map(col).toSeq: _*).as("p"))
      .select(Codec.decodeBinary(col("p"), schema).as("r"))
      .select(col("r.*"))
    // binary column via hex (Array[Byte].toString is reference identity)
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.withColumn("bin", hex(col("bin"))).collect().map(_.toString).sorted.toSeq
    assert(canon(back) == canon(df))
    // nulls survive (null bitmap, not sentinel values)
    val withNull = Seq((Some(1L), Option.empty[String]), (None, Some("x")))
      .toDF("a", "s")
    val ns = StructType(Seq(StructField("a", LongType), StructField("s", StringType)))
    val nBack = withNull.select(Codec.encodeBinary(col("a"), col("s")).as("p"))
      .select(Codec.decodeBinary(col("p"), ns).as("r"))
      .select(col("r.a"), col("r.s")).as[(Option[Long], Option[String])]
      .collect().toSet
    assert(nBack == Set((Some(1L), None), (None, Some("x"))))
  }

  test("binary codec: schema-hash mismatch → null (permissive) or refusal (strict)") {
    import org.apache.spark.sql.types._
    val enc = Seq((1L, "a")).toDF("id", "msg")
      .select(Codec.encodeBinary(col("id"), col("msg")).as("p"))
    val wrong = StructType(Seq(StructField("id", LongType), StructField("msg", IntegerType)))
    // permissive: the frame decodes to null, filter_map strips it (T3)
    assert(enc.select(Codec.decodeBinary(col("p"), wrong).as("r"))
      .filter(col("r").isNotNull).count() == 0)
    // strict: attach-refusal, like the reference's schema check (raw or
    // Spark-wrapped depending on where the projection evaluates)
    val ex = intercept[Throwable] {
      enc.select(Codec.decodeBinary(col("p"), wrong, strict = true)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.isInstanceOf[graft.channel.SchemaRegistry.SchemaMismatch]),
      s"no SchemaMismatch in cause chain: $ex")
    // malformed frames (foreign bytes) are null, never a crash
    val junk = Seq(Array[Byte](1, 2, 3), Array.emptyByteArray).toDF("p")
    val s2 = StructType(Seq(StructField("id", LongType)))
    assert(junk.select(Codec.decodeBinary(col("p"), s2).as("r"))
      .filter(col("r").isNotNull).count() == 0)
  }

  test("binary codec v2: nested tables (LogRecord shape) roundtrip, nulls + empty Vec") {
    import org.apache.spark.sql.types._
    // the reference's flagship nested record: LogRecord { fields: Vec<LogField> }
    // (system/userland/src/logging.rs:101-121) — a struct field plus a
    // Vec<table> field, with a null child, a null element and an empty Vec
    val fieldT = StructType(Seq(StructField("k", StringType), StructField("v", StringType)))
    val schema = StructType(Seq(
      StructField("ts", LongType), StructField("msg", StringType),
      StructField("ctx", StructType(Seq(
        StructField("mod", StringType), StructField("line", IntegerType)))),
      StructField("fields", ArrayType(fieldT))))
    val rec = Seq((1L, "boot"), (2L, "warn")).toDF("ts", "msg").select(
      col("ts"), col("msg"),
      when(col("ts") === 1,
        struct(concat(col("msg"), lit("-mod")).as("mod"),
          (col("ts") * 10).cast("int").as("line"))).as("ctx"), // null ctx for ts=2
      when(col("ts") === 1,
        array(struct(lit("a").as("k"), lit("1").as("v")),
          lit(null).cast(fieldT),                              // null element
          struct(lit("b").as("k"), lit(null).cast(StringType).as("v"))))
        .otherwise(array().cast(ArrayType(fieldT))).as("fields")) // empty Vec
    val enc = rec.select(
      Codec.encodeBinary(col("ts"), col("msg"), col("ctx"), col("fields")).as("p"))
    // frames carry version byte 2; flat schemas stay on the v1 byte
    assert(enc.select(col("p")).as[Array[Byte]].collect().forall(_(1) == 2))
    val back = enc.select(Codec.decodeBinary(col("p"), schema).as("r")).select(col("r.*"))
    assert(back.toJSON.collect().sorted.toSeq == rec.toJSON.collect().sorted.toSeq)

    // child-frame truncation: every strict prefix of a nested frame decodes
    // to null (permissive), never crashes or returns garbage
    val frame = enc.as[Array[Byte]].head()
    val truncated = Seq(frame.length * 3 / 4, frame.length - 1, 20, 3)
      .map(n => frame.take(n))
    val junk = truncated.toDF("p")
    assert(junk.select(Codec.decodeBinary(col("p"), schema).as("r"))
      .filter(col("r").isNotNull).count() == 0)

    // zero-field nested structs are refused at ANALYSIS, not encoded: a
    // present empty-schema element would be a 0-byte child frame — the
    // Vec<table> null-element sentinel — and decode back as null
    val emptyT = StructType(Seq.empty)
    val degenerate = Seq(1L).toDF("ts")
      .select(col("ts"), array(struct()).cast(ArrayType(emptyT)).as("fields"))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      degenerate.select(Codec.encodeBinary(col("ts"), col("fields")).as("p")).collect()
    }
    assert(err.getMessage.contains("unsupported field type"))
  }

  test("enum-with-fallback: every byte value roundtrips; enum identity is hashed") {
    import org.apache.spark.sql.types._
    import graft.channel.{Enums, SchemaRegistry}
    // LogLevel shape: 5 catalogued variants + Unknown(i8) fallback
    // (reference system/userland/src/logging.rs:52-71)
    val lvl = Enums.EnumDef("LogLevel", IndexedSeq("trace", "debug", "info", "warn", "error"))
    // exhaustive: encode(decode(b)) == b for EVERY byte, catalogued or not
    val allBytes = (-128 to 127).map(_.toByte).toDF("b")
    val rt = allBytes
      .select(col("b"), lvl.encode(lvl.decode(col("b"))).as("back"))
      .filter(col("b") =!= col("back") || col("back").isNull)
    assert(rt.count() == 0)
    // catalogued ordinals render as names, the rest as unknown(<n>)
    val shown = allBytes.select(lvl.decode(col("b")).as("d"))
      .as[String].collect().toSet
    assert(Set("trace", "debug", "info", "warn", "error", "unknown(-1)", "unknown(100)")
      .subsetOf(shown))
    // foreign display strings are null (permissive), never a crash —
    // including unknown(...) forms outside the byte range (ANSI casts)
    val foreign = Seq("fatal", "unknown(999)", "unknown(x)", "").toDF("d")
    assert(foreign.select(lvl.encode(col("d")).as("b"))
      .filter(col("b").isNotNull).count() == 0)
    // the variant catalogue is part of channel identity...
    val s1 = StructType(Seq(StructField("id", LongType), lvl.field("level")))
    val lvl2 = Enums.EnumDef("LogLevel", IndexedSeq("trace", "debug", "info", "warn", "fatal"))
    val s2 = StructType(Seq(StructField("id", LongType), lvl2.field("level")))
    assert(SchemaRegistry.hash(s1) != SchemaRegistry.hash(s2))
    // ...but incidental metadata and nullability still are not
    val noisy = StructType(Seq(
      StructField("id", LongType, nullable = false,
        new MetadataBuilder().putString("comment", "x").build()),
      lvl.field("level")))
    assert(SchemaRegistry.hash(noisy) == SchemaRegistry.hash(s1))
    // the tagged field is plain ByteType on the wire: it rides the binary
    // codec's 1-byte slot unchanged
    assert(Enums.of(lvl.field("level")).contains(lvl.copy(name = "level")))
  }

  test("word_shingle_hashes: bit-identical to xxhash64 over materialized shingles") {
    // the zero-copy contract: hashes equal the composed explode(shingles)+
    // xxhash64 form on EVERY input shape, including the awkward ones
    // (split keeps empty tokens, so multi-space/leading/trailing-space
    // shingles contain the extra spaces verbatim — both forms must agree)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a  double  spaced  text here",      // empty tokens between words
      " leading space", "trailing space ", // boundary empties
      "  ", " ", "",                       // only separators / empty
      "one two",                           // fewer tokens than n=3
      "exactly three tokens",
      "unicode café straße 日本語 tokens here",
      (1 to 200).map(i => s"w$i").mkString(" ")) // long doc
    val df = docs.toDF("text")
    for (n <- Seq(1, 3, 13)) {
      val composed = df.select(transform(
        TextFunctions.shingles(col("text"), n), s => xxhash64(s)).as("h"))
        .as[Seq[Long]].collect().toSeq
      val native = df.select(TextFunctions.shingleHashes(col("text"), n).as("h"))
        .as[Seq[Long]].collect().toSeq
      assert(native == composed, s"n=$n mismatch")
    }
    // null text → empty array in BOTH forms (the composed form's
    // when(size(NULL) >= n) is false → otherwise(array()); parity holds)
    val nulls = Seq[String](null).toDF("text")
    val composedNull = nulls.select(transform(
      TextFunctions.shingles(col("text"), 3), s => xxhash64(s)).as("h"))
      .as[Seq[Long]].collect().head
    val nativeNull = nulls.select(TextFunctions.shingleHashes(col("text"), 3).as("h"))
      .as[Seq[Long]].collect().head
    assert(composedNull == Seq.empty && nativeNull == Seq.empty)
  }

  test("top_ngram_stats: matches the exploded groupBy/top form, ties to smallest gram") {
    // the map-only kernel must agree with the composed corpus-shuffle
    // form it replaces (explode n-grams → groupBy → per-doc max, count
    // ties broken by the lexicographically smallest gram) on every input
    // shape: clear winners, full ties, empty-token edges, unicode, and
    // seeded random docs over a tiny alphabet (dense tie structure)
    val rnd = new scala.util.Random(20260814L)
    val alphabet = Seq("aa", "b", "ccc", "dd", "")
    val randomDocs = (1 to 30).map { _ =>
      (1 to (1 + rnd.nextInt(40)))
        .map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
    val docs = Seq(
      "a b a b a c", "x y x y", "t t t t t t", "one two", "solo",
      "", " ", "  ", "a  b  a  b",
      "unicode café straße café straße 日本語 café straße",
      (1 to 150).map(i => s"w${i % 7}").mkString(" ")) ++ randomDocs
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").cache()
    for (n <- Seq(1, 2, 3)) {
      val native = df
        .select(col("doc_id"), graft.functions.TopNgramStats(col("text"), n).as("s"))
        .select(col("doc_id"), col("s.gram").as("gram"), col("s.cnt").as("cnt"))
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getString(1), r.getLong(2)))))
        .toMap
      val composed = df
        .select(col("doc_id"), explode(TextFunctions.shingles(col("text"), n)).as("gram"))
        .groupBy(col("doc_id"), col("gram")).count()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
            .orderBy(col("count").desc, col("gram"))))
        .filter(col("rn") === 1)
        .collect()
        .map(r => r.getLong(0) -> Some((r.getString(1), r.getLong(2))))
        .toMap
      docs.indices.foreach { i =>
        assert(native(i.toLong) == composed.getOrElse(i.toLong, None),
          s"n=$n doc=$i '${docs(i).take(40)}': " +
            s"native=${native(i.toLong)} composed=${composed.get(i.toLong)}")
      }
    }
    // null text → null struct (the composed form emits no row)
    val nullRow = Seq[String](null).toDF("text")
      .select(graft.functions.TopNgramStats(col("text"), 2).as("s"))
      .collect().head
    assert(nullRow.isNullAt(0))
    df.unpersist()
  }

  test("ordered_pairs: identical to the HOF pair-emission it replaces") {
    // the pair-emission contract of the dedup group joins: for a sorted
    // id list, ordered_pairs must emit exactly the pairs (and the order)
    // of the flatten(transform(slice…)) formulation — sizes 0,1,2,3 and
    // a larger-than-typical group, plus a seeded random sweep
    val rnd = new scala.util.Random(20260814L)
    val cases: Seq[Seq[Long]] =
      Seq(Seq.empty[Long], Seq(5L), Seq(1L, 2L), Seq(1L, 2L, 3L),
        (1L to 12L).toSeq) ++
      (1 to 20).map(_ => Seq.fill(rnd.nextInt(8))(rnd.nextLong()).distinct.sorted.toSeq)
    val df = cases.toDF("ds")
    val hof = df.select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b")).as[(Long, Long)].collect().toSeq
    val native = df.select(explode(graft.functions.OrderedPairs(col("ds"))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b")).as[(Long, Long)].collect().toSeq
    assert(native == hof, s"native=$native hof=$hof")
  }

  test("char_gram_hashes: bit-identical to xxhash64 over materialized char grams") {
    // multibyte chars make char positions diverge from byte positions —
    // the boundary-offset walk must agree with substr's char semantics
    val docs = Seq(
      "plain ascii text body",
      "café straße 日本語テキスト mixed width",
      "ab",                                  // shorter than wide n
      "", " ",
      "exactly30chars-abcdefghijklmno",
      (1 to 50).map(_ => "日").mkString)       // all-multibyte long doc
    val df = docs.toDF("text")
    for (n <- Seq(2, 5, 30)) {
      val composed = df.select(transform(
        TextFunctions.charGrams(col("text"), n), g => xxhash64(g)).as("h"))
        .as[Seq[Long]].collect().toSeq
      val native = df.select(TextFunctions.charGramHashes(col("text"), n).as("h"))
        .as[Seq[Long]].collect().toSeq
      assert(native == composed, s"n=$n mismatch")
    }
    // null text → empty array in both forms
    val nulls = Seq[String](null).toDF("text")
    val composedNull = nulls.select(transform(
      TextFunctions.charGrams(col("text"), 3), g => xxhash64(g)).as("h"))
      .as[Seq[Long]].collect().head
    val nativeNull = nulls.select(TextFunctions.charGramHashes(col("text"), 3).as("h"))
      .as[Seq[Long]].collect().head
    assert(composedNull == Seq.empty && nativeNull == Seq.empty)
  }

  test("driver-built bloom: no false negatives, bounded false positives") {
    val members = (0L until 20000L).map(_ * 2654435761L)
    val small = members.toDF("s")
    val bytes = Bloom.buildLong(small, "s", fpp = 1e-3)
    // completeness is the correctness-critical half: a false NEGATIVE would
    // silently drop true overlap before the exact-verify join
    assert(small.filter(Bloom.mightContainLong(bytes, col("s"))).count() == members.size)
    val nonMembers = (0L until 20000L).map(_ * 7919L + 13L).toSet.diff(members.toSet)
    val fp = nonMembers.toSeq.toDF("s")
      .filter(Bloom.mightContainLong(bytes, col("s"))).count()
    assert(fp <= nonMembers.size / 100, s"fp rate ${fp.toDouble / nonMembers.size}")
  }

  test("heavy hitters sketch: guaranteed recall above n/k, bounded error") {
    // 1000 "hot" + 200 "warm" + 500 singletons; capacity 16 → threshold ~106
    val items = Seq.fill(1000)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 500).map(i => s"rare$i")
    val df = scala.util.Random.shuffle(items).toDF("w") // order-insensitive guarantees
    val m = df.agg(HeavyHitters.heavyHitters(col("w"), 16).as("hh"))
      .as[Map[String, Long]].collect().head
    assert(m.contains("hot") && m.contains("warm")) // freq > n/k must survive
    assert(m("hot") <= 1000 && m("hot") >= 1000 - items.size / 16)
    assert(m.size <= 16)
  }
}
