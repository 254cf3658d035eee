package graft.queries

import graft.{Q, Tables}
import graft.udf.wasm.{WasmAssembler, WasmModule}
import org.apache.spark.sql.functions._

/** WASM-guest compute inside the correctness gate: real WebAssembly
  * modules (assembled in-process, executed by the built-in interpreter)
  * whose outputs hash-match plain-SQL oracles — an integer affine map
  * over event ids and f64 L2 norms over the embedding vectors. Any
  * interpreter bug (decode, arithmetic, float semantics, instance reuse)
  * breaks the match.
  */
object WasmOps {

  /** Guest l2norm(n) → f64: sum of squares of the n f64s at offset 0,
    * then sqrt. Accumulator lives in a local (f64 raw bits). */
  private def l2normModule: Array[Byte] = {
    val body = Seq(
      0x44, 0, 0, 0, 0, 0, 0, 0, 0,      // f64.const 0.0 → acc slot init
      0x21, 0x02,                         // local.set acc (local 2, f64)
      0x02, 0x40, 0x03, 0x40,             // block loop
      0x20, 0x01, 0x20, 0x00, 0x4e,       //   i >= n ?
      0x0d, 0x01,                         //   br_if exit
      0x20, 0x02,                         //   acc
      0x20, 0x01, 0x41, 0x08, 0x6c, 0x2b, 0x00, 0x00, // x = mem[i*8]
      0x20, 0x01, 0x41, 0x08, 0x6c, 0x2b, 0x00, 0x00, // x again
      0xa2, 0xa0,                         //   x*x; acc + …
      0x21, 0x02,                         //   local.set acc
      0x20, 0x01, 0x41, 0x01, 0x6a, 0x21, 0x01,       // i += 1
      0x0c, 0x00, 0x0b, 0x0b,             //   br 0; end; end
      0x20, 0x02, 0x9f                    // sqrt(acc)
    ).map(_.toByte)
    // locals: param n (idx 0), i32 counter i (idx 1), f64 acc (idx 2)
    WasmAssembler.module("l2norm", nParams = 1, nLocals = 0, body = body,
      resultType = 0x7c, localGroups = Seq((1, 0x7f), (1, 0x7c)))
  }

  /** Module bytes for the interpreter microbenchmark (WasmMicro). */
  private[graft] def l2normModuleForBench: Array[Byte] = l2normModule

  /** Guest `shift(ptr, len) → outLen`: reads the i64 at offset 0, adds
    * `env.config_get(0)` (an imported, capability-gated hostcall), stores
    * the result back at offset 0 and returns 8. Assembled by hand because
    * [[WasmAssembler.module]] has no import support: type 0 is the
    * import's `(i64)→(i64)`, type 1 the export's `(i64,i64)→(i64)`;
    * imports precede local functions in the index space, so `call 0` is
    * the hostcall and the export binds function index 1. */
  private def configShiftModule: Array[Byte] = {
    val A = WasmAssembler
    val i64 = 0x7e.toByte
    val typeSec = A.section(1, A.vec(Seq(
      Seq(0x60.toByte) ++ A.vec(Seq(Seq(i64))) ++ A.vec(Seq(Seq(i64))),
      Seq(0x60.toByte) ++ A.vec(Seq(Seq(i64), Seq(i64))) ++ A.vec(Seq(Seq(i64))))))
    val imports = A.importSection(Seq(("env", "config_get", 0)))
    val funcSec = A.section(3, A.vec(Seq(A.uleb(1))))
    val memSec = A.section(5, A.vec(Seq(Seq(0x00.toByte) ++ A.uleb(1))))
    val exportSec = A.section(7, A.vec(Seq(A.name("shift") ++ Seq(0x00.toByte) ++ A.uleb(1))))
    val body = A.vec(Nil) ++ Seq(
      0x41, 0x00,        // i32.const 0 (store addr)
      0x41, 0x00,        // i32.const 0 (load addr)
      0x29, 0x03, 0x00,  // i64.load align=8 offset=0
      0x42, 0x00,        // i64.const 0 (config key)
      0x10, 0x00,        // call 0 → env.config_get
      0x7c,              // i64.add
      0x37, 0x03, 0x00,  // i64.store align=8 offset=0
      0x42, 0x08         // i64.const 8 → outLen
    ).map(_.toByte) :+ 0x0b.toByte
    val codeSec = A.section(10, A.vec(Seq(A.uleb(body.length.toLong) ++ body)))
    (Seq(0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00).map(_.toByte) ++
      typeSec ++ imports ++ funcSec ++ memSec ++ exportSec ++ codeSec).toArray
  }

  val all: Seq[Q] = Seq(

    // ---- WASM float compute over embeddings: guest-computed L2 norms
    // hash-matched against the SQL oracle (exercises the interpreter's
    // f64 path + the per-partition instance reuse on real vector data).
    Q("q_wasm_vector_norm",
      """SELECT vec_id, round(sqrt(s), 6) AS l2
        |FROM (SELECT vec_id, SUM(x * x) AS s
        |      FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
        |            FROM embeddings)
        |      GROUP BY vec_id)
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val moduleBytes = l2normModule
      // spread the guest compute across cores when the scan doesn't
      // (one interpreter instance per partition)
      Tables.spread(Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
          col("vec_id"))
        .as[(Long, Seq[Double])]
        .mapPartitions { rows =>
          val guest = new WasmModule(moduleBytes)
          rows.map { case (id, v) =>
            val bb = java.nio.ByteBuffer.allocate(8 * v.size)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            v.foreach(bb.putDouble)
            guest.writeMemory(0, bb.array())
            val bits = guest.invoke("l2norm", v.size.toLong).get
            (id, java.lang.Double.longBitsToDouble(bits))
          }
        }
        .toDF("vec_id", "raw")
        .select(col("vec_id"), round(col("raw"), 6).as("l2"))
        .orderBy(col("vec_id"))
    },
    // ---- br_table dispatch under the hash gate: the guest routes each
    // event id through a 4-way switch (the compiler lowering of `switch`)
    // with per-case arithmetic; any mis-decoded label vector or depth
    // handling breaks the match against the SQL CASE oracle.
    Q("q_wasm_branch",
      """SELECT event_id,
        |  CAST(CASE CAST(event_id % 4 AS INT)
        |    WHEN 0 THEN event_id * 2
        |    WHEN 1 THEN event_id + 100
        |    WHEN 2 THEN event_id // 2
        |    ELSE 0 END AS BIGINT) AS routed
        |FROM events WHERE event_id < 20000 ORDER BY event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val body = Seq(
        0x02, 0x40, 0x02, 0x40, 0x02, 0x40, 0x02, 0x40, 0x02, 0x40, // 5 blocks
        0x20, 0x00, 0x42, 0x04, 0x82, 0xa7, // (x % 4) wrapped to i32
        0x0e, 0x04, 0x00, 0x01, 0x02, 0x03, 0x03, // br_table [0,1,2,3] dflt 3
        0x0b,                                     // end case-0 block
        0x20, 0x00, 0x42, 0x02, 0x7e, 0x0f,       //   x * 2; return
        0x0b,                                     // end case-1 block
        0x20, 0x00, 0x42, 0xe4, 0x00, 0x7c, 0x0f, //   x + 100; return
        0x0b,                                     // end case-2 block
        0x20, 0x00, 0x42, 0x02, 0x7f, 0x0f,       //   x / 2; return
        0x0b,                                     // end case-3 block
        0x42, 0x00, 0x0f,                         //   0; return
        0x0b,                                     // end outer
        0x42, 0x00                                // (unreachable fallthrough)
      ).map(_.toByte)
      val moduleBytes = WasmAssembler.module("route", nParams = 1, nLocals = 0,
        body = body, paramTypes = Seq(0x7e), resultType = 0x7e)
      Tables.events(s, d)
        .select(col("event_id"))
        .filter(col("event_id") < 20000)
        .as[Long]
        .mapPartitions { ids =>
          val guest = new WasmModule(moduleBytes)
          ids.map(id => (id, guest.invoke("route", id).get))
        }
        .toDF("event_id", "routed")
        .orderBy(col("event_id"))
    },

    // ---- Guest-initiated READ-ONLY hostcall under the hash gate: the
    // guest reads config slot 0 through the capability-gated
    // `env.config_get` hostcall (graft.udf.WasmHost.Interpreted —
    // Context::require parity, reference
    // system/userland/src/context.rs:38-73) and shifts every event id by
    // it. The oracle knows only the host-frozen config VALUE, so a broken
    // hostcall dispatch, a mis-linked import, or a capability-gate
    // regression all hash-mismatch. Runs through the bytes→bytes ABI
    // (payload at offset 0, f(ptr,len)→outLen) — the full UDF-host path,
    // not a bare interpreter call.
    Q("q_wasm_hostcall",
      """SELECT event_id, event_id + 1000 AS shifted
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val moduleBytes = configShiftModule
      Tables.spread(Tables.events(s, d).select(col("event_id")),
          col("event_id"))
        .as[Long]
        .mapPartitions { ids =>
          val guest = new graft.udf.WasmHost.WasmModule.Interpreted(moduleBytes,
            capabilities = Set(graft.runtime.Capability.ConfigRead),
            hostConfig = Map(0L -> 1000L))
          ids.map { id =>
            val bb = java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.putLong(id)
            val out = guest.invoke("shift", bb.array())
            (id, java.nio.ByteBuffer.wrap(out)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
          }
        }
        .toDF("event_id", "shifted")
        .orderBy(col("event_id"))
    },

    Q("q_wasm_map",
      """SELECT event_id, CAST(event_id * 3 + 7 AS BIGINT) AS mapped
        |FROM events WHERE event_id < 10000 ORDER BY event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      // event_id < 10000 keeps x*3+7 < 2^31: i32 wrapping == SQL BIGINT here
      val moduleBytes = WasmAssembler.affineModule("affine", 3, 7)
      Tables.events(s, d)
        .select(col("event_id"))
        .filter(col("event_id") < 10000)
        .as[Long]
        .mapPartitions { ids =>
          val guest = new WasmModule(moduleBytes) // one instance per partition
          ids.map(id => (id, guest.invoke("affine", id).get))
        }
        .toDF("event_id", "mapped")
        .orderBy(col("event_id"))
    }
  )
}
