package graft

import graft.udf.WasmHost
import graft.udf.wasm.WasmModule
import org.apache.spark.sql.functions._

/** Tests the built-in WASM interpreter against hand-assembled modules
  * (no wasm toolchain ships here; the binaries are constructed from the
  * public binary-format spec byte by byte).
  */
class WasmSuite extends SparkSpec {
  import spark.implicits._

  // ---- tiny wasm assembler ----------------------------------------------

  private def uleb(v: Long): Seq[Byte] = {
    var x = v; val out = Seq.newBuilder[Byte]
    while ({ val b = (x & 0x7f).toInt; x >>>= 7
             out += (if (x != 0) (b | 0x80) else b).toByte; x != 0 }) ()
    out.result()
  }
  private def section(id: Int, content: Seq[Byte]): Seq[Byte] =
    id.toByte +: (uleb(content.length.toLong) ++ content)
  private def vec(items: Seq[Seq[Byte]]): Seq[Byte] =
    uleb(items.length.toLong) ++ items.flatten
  private def name(s: String): Seq[Byte] =
    uleb(s.length.toLong) ++ s.getBytes("UTF-8").toSeq

  /** One-function module: params i32×nParams → i32, with a memory. */
  private def module(export: String, nParams: Int, nLocals: Int,
                     body: Seq[Byte]): Array[Byte] = {
    val header = Seq(0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00).map(_.toByte)
    val typeSec = section(1, vec(Seq(
      Seq(0x60.toByte) ++ vec(Seq.fill(nParams)(Seq(0x7f.toByte))) ++
        vec(Seq(Seq(0x7f.toByte))))))
    val funcSec = section(3, vec(Seq(uleb(0))))
    val memSec = section(5, vec(Seq(Seq(0x00.toByte) ++ uleb(1))))
    val exportSec = section(7, vec(Seq(name(export) ++ Seq(0x00.toByte) ++ uleb(0))))
    val locals = if (nLocals > 0) vec(Seq(uleb(nLocals.toLong) ++ Seq(0x7f.toByte)))
                 else vec(Nil)
    val code = locals ++ body :+ 0x0b.toByte
    val codeSec = section(10, vec(Seq(uleb(code.length.toLong) ++ code)))
    (header ++ typeSec ++ funcSec ++ memSec ++ exportSec ++ codeSec).toArray
  }

  // (func add5 (param i32) (result i32) local.get 0; i32.const 5; i32.add)
  private val add5 = module("add5", nParams = 1, nLocals = 0,
    Seq(0x20, 0x00, 0x41, 0x05, 0x6a).map(_.toByte))

  // (func xor255 (param ptr i32) (param len i32) (result i32) (local i i32)
  //   block loop  i >= len → br_if 1
  //     mem[ptr+i] = mem[ptr+i] xor 255 ; i += 1 ; br 0
  //   end end ; return len)
  private val xor255 = module("xor255", nParams = 2, nLocals = 1, Seq(
    0x02, 0x40,             // block void
    0x03, 0x40,             //   loop void
    0x20, 0x02,             //     local.get i
    0x20, 0x01,             //     local.get len
    0x4e,                   //     i32.ge_s
    0x0d, 0x01,             //     br_if 1 (exit block)
    0x20, 0x00, 0x20, 0x02, 0x6a, //  addr = ptr + i   (for store)
    0x20, 0x00, 0x20, 0x02, 0x6a, //  addr = ptr + i   (for load)
    0x2d, 0x00, 0x00,       //     i32.load8_u align=0 offset=0
    0x41, 0xff, 0x01,       //     i32.const 255 (sleb)
    0x73,                   //     i32.xor
    0x3a, 0x00, 0x00,       //     i32.store8
    0x20, 0x02, 0x41, 0x01, 0x6a, // i + 1
    0x21, 0x02,             //     local.set i
    0x0c, 0x00,             //     br 0 (continue loop)
    0x0b,                   //   end loop
    0x0b,                   // end block
    0x20, 0x01              // local.get len (result)
  ).map(_.toByte))

  test("interpreter executes arithmetic function (add5)") {
    val m = new WasmModule(add5)
    assert(m.invoke("add5", 37L).contains(42L))
    assert(m.invoke("add5", -10L).contains(-5L))
    intercept[NoSuchMethodException] { m.invoke("nope") }
  }

  test("interpreter executes memory loop (xor255 over linear memory)") {
    val m = new WasmModule(xor255)
    m.writeMemory(0, Array[Byte](0, 1, 127, -1))
    assert(m.invoke("xor255", 0L, 4L).contains(4L))
    assert(m.readMemory(0, 4).toSeq == Seq[Byte](-1, -2, -128, 0))
  }

  test("fuel cap halts runaway guests") {
    // loop forever: block loop br 0 end end → no way out
    val loopForever = module("spin", nParams = 0, nLocals = 0, Seq(
      0x02, 0x40, 0x03, 0x40, 0x0c, 0x00, 0x0b, 0x0b, 0x41, 0x00).map(_.toByte))
    val m = new WasmModule(loopForever, fuel = 10000)
    val e = intercept[IllegalStateException] { m.invoke("spin") }
    assert(e.getMessage.contains("fuel"))
  }

  test("real wasm module as a Spark UDF over a DataFrame (the north star)") {
    val moduleBytes = xor255 // local copy: the closure must not capture the suite
    WasmHost.register("wasm-xor", () => new WasmHost.WasmModule.Interpreted(moduleBytes))
    val df = Seq((1, Array[Byte](10, 20)), (2, Array[Byte](-1, 0, 64)))
      .toDF("id", "payload")
    val out = WasmHost.transform(df, "wasm-xor", "xor255", "payload")
      .select(col("id"), col("payload"))
      .as[(Int, Array[Byte])].collect().sortBy(_._1)
    assert(out(0)._2.toSeq == Seq[Byte](-11, -21))
    assert(out(1)._2.toSeq == Seq[Byte](0, -1, -65))
  }

  // ---- spec-hole regression tests (from adversarial review) -------------

  test("br to the function-level label acts as return") {
    // (func (param i32) (result i32) local.get 0; br 0)
    val m = new WasmModule(module("f", 1, 0,
      Seq(0x20, 0x00, 0x0c, 0x00).map(_.toByte)))
    assert(m.invoke("f", 9L).contains(9L))
  }

  test("br out of a result-typed block carries the value") {
    // (func (result i32) (block (result i32) i32.const 42 br 0) )
    val m = new WasmModule(module("f", 0, 0,
      Seq(0x02, 0x7f, 0x41, 42, 0x0c, 0x00, 0x0b).map(_.toByte)))
    assert(m.invoke("f").contains(42L))
  }

  test("i32.eq is canonical: loaded 0xFFFFFFFF equals const -1") {
    // store -1 at 0, then: i32.const 0; i32.load; i32.const -1; i32.eq
    val m = new WasmModule(module("f", 0, 0, Seq[Byte](
      0x41, 0x00, 0x2d.toByte, 0x00, 0x00) ++ Seq[Byte](0x1a) ++ // touch mem (drop)
      Seq(0x41, 0x00).map(_.toByte) ++ Seq(0x28, 0x00, 0x00).map(_.toByte) ++
      Seq(0x41, 0x7f).map(_.toByte) ++ Seq(0x46).map(_.toByte)))
    m.writeMemory(0, Array[Byte](-1, -1, -1, -1))
    assert(m.invoke("f").contains(1L))
  }

  test("out-of-bounds access traps instead of growing memory") {
    // i32.const 2_000_000; i32.load8_u  (module has 1 page = 64 KiB)
    val m = new WasmModule(module("f", 0, 0,
      Seq(0x41.toByte) ++ Seq(0x80, 0x89, 0x7a).map(_.toByte) // sleb(2000000)
        ++ Seq(0x2d, 0x00, 0x00).map(_.toByte)))
    val e = intercept[IllegalStateException] { m.invoke("f") }
    assert(e.getMessage.contains("out-of-bounds"))
  }

  test("modules with unsupported sections are rejected at decode time") {
    // append a START section (id 8) to add5 → must fail loudly (implicit
    // instantiation side effects are outside the subset)
    val withStart = add5 ++ Array[Byte](8, 1, 0)
    val e = intercept[UnsupportedOperationException] { new WasmModule(withStart) }
    assert(e.getMessage.contains("section"))
  }

  test("rows cannot see each other's payload bytes (memory cleared)") {
    val host = new WasmHost.WasmModule.Interpreted(xor255)
    val big = host.invoke("xor255", Array.fill[Byte](64)(7))
    assert(big.forall(_ == (7 ^ 0xff).toByte))
    // short second payload: guest scanning past len must see zeros, so a
    // third call reading beyond its own payload gets 0^255, not old bytes
    host.invoke("xor255", Array[Byte](1))
    val probeModule = new WasmModule(xor255)
    // direct engine check on a fresh interpreter mirrors the convention:
    // after the host writes+clears, bytes beyond payload are zero
    val h2 = new WasmHost.WasmModule.Interpreted(xor255)
    h2.invoke("xor255", Array.fill[Byte](32)(5))
    val out2 = h2.invoke("xor255", Array[Byte](9))
    assert(out2.toSeq == Seq[Byte]((9 ^ 0xff).toByte))
  }

  test("i64 arithmetic beyond 32 bits") {
    import graft.udf.wasm.WasmAssembler
    // g(x: i64) = x*2 + 1
    val m = new WasmModule(WasmAssembler.module("g", 1, 0,
      Seq(0x20, 0x00, 0x42, 0x02, 0x7e, 0x42, 0x01, 0x7c).map(_.toByte),
      paramTypes = Seq(0x7e), resultType = 0x7e))
    val big = 10_000_000_000L
    assert(m.invoke("g", big).contains(big * 2 + 1))
  }

  test("function imports dispatch to host functions (hostcall parity)") {
    val A = graft.udf.wasm.WasmAssembler
    // type0: (i32)->()  [host env.log]; type1: (i32)->(i32) [exported f]
    val typeSec = A.section(1, A.vec(Seq(
      Seq(0x60.toByte) ++ A.vec(Seq(Seq(0x7f.toByte))) ++ A.vec(Nil),
      Seq(0x60.toByte) ++ A.vec(Seq(Seq(0x7f.toByte))) ++ A.vec(Seq(Seq(0x7f.toByte))))))
    val imports = A.importSection(Seq(("env", "log", 0)))
    val funcSec = A.section(3, A.vec(Seq(A.uleb(1))))
    val memSec = A.section(5, A.vec(Seq(Seq(0x00.toByte) ++ A.uleb(1))))
    val exportSec = A.section(7, A.vec(Seq(A.name("f") ++ Seq(0x00.toByte) ++ A.uleb(1))))
    // f(x): env.log(x); return x*10
    val body = A.vec(Nil) ++ Seq(
      0x20, 0x00, 0x10, 0x00,           // local.get x; call 0 (host)
      0x20, 0x00, 0x41, 0x0a, 0x6c      // x * 10
    ).map(_.toByte) :+ 0x0b.toByte
    val codeSec = A.section(10, A.vec(Seq(A.uleb(body.length.toLong) ++ body)))
    val bytes = (Seq(0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00).map(_.toByte) ++
      typeSec ++ imports ++ funcSec ++ memSec ++ exportSec ++ codeSec).toArray

    val logged = scala.collection.mutable.ArrayBuffer[Long]()
    val m = new WasmModule(bytes,
      hostFns = Map("env.log" -> { args => logged += args.head; None }))
    assert(m.invoke("f", 7L).contains(70L))
    assert(logged.toSeq == Seq(7L))
    // unresolved import fails loudly at decode
    intercept[IllegalArgumentException] { new WasmModule(bytes) }
  }

  test("gated read-only hostcalls: time needs TimeRead, deny-by-default traps") {
    import graft.runtime.Capability
    val A = graft.udf.wasm.WasmAssembler
    val i64 = 0x7e.toByte
    // type0: ()->(i64) [env.time_millis]; type1: (i64,i64)->(i64) [ABI tick]
    val typeSec = A.section(1, A.vec(Seq(
      Seq(0x60.toByte) ++ A.vec(Nil) ++ A.vec(Seq(Seq(i64))),
      Seq(0x60.toByte) ++ A.vec(Seq(Seq(i64), Seq(i64))) ++ A.vec(Seq(Seq(i64))))))
    val imports = A.importSection(Seq(("env", "time_millis", 0)))
    val funcSec = A.section(3, A.vec(Seq(A.uleb(1))))
    val memSec = A.section(5, A.vec(Seq(Seq(0x00.toByte) ++ A.uleb(1))))
    val exportSec = A.section(7, A.vec(Seq(A.name("tick") ++ Seq(0x00.toByte) ++ A.uleb(1))))
    // tick(ptr, len): mem[0] = time_millis(); return 8
    val body = A.vec(Nil) ++ Seq(
      0x41, 0x00,       // i32.const 0 (store addr)
      0x10, 0x00,       // call 0 → env.time_millis
      0x37, 0x03, 0x00, // i64.store align=8 offset=0
      0x42, 0x08        // outLen = 8
    ).map(_.toByte) :+ 0x0b.toByte
    val codeSec = A.section(10, A.vec(Seq(A.uleb(body.length.toLong) ++ body)))
    val bytes = (Seq(0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00).map(_.toByte) ++
      typeSec ++ imports ++ funcSec ++ memSec ++ exportSec ++ codeSec).toArray

    // granted: the guest reads the HOST-supplied clock (deterministic)
    val granted = new WasmHost.WasmModule.Interpreted(bytes,
      capabilities = Set(Capability.TimeRead), hostClockMillis = () => 123456789L)
    val out = granted.invoke("tick", Array.emptyByteArray)
    assert(java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong == 123456789L)

    // deny-by-default: the import LINKS (reference stub-linking parity)
    // but calling it without the grant traps with PermissionDenied
    val denied = new WasmHost.WasmModule.Interpreted(bytes)
    val ex = intercept[SecurityException] { denied.invoke("tick", Array.emptyByteArray) }
    assert(ex.getMessage.contains("PermissionDenied") && ex.getMessage.contains("TimeRead"))

    // config_get is gated independently (ConfigRead ≠ TimeRead)
    val wrongGrant = new WasmHost.WasmModule.Interpreted(bytes,
      capabilities = Set(Capability.ConfigRead))
    intercept[SecurityException] { wrongGrant.invoke("tick", Array.emptyByteArray) }
  }

  test("call_indirect dispatches through the funcref table") {
    val A = graft.udf.wasm.WasmAssembler
    // two local funcs of type (i32)->(i32): double (idx 0) and inc (idx 1);
    // exported sel(which, x) picks through the table: table[0]=1, table[1]=0
    val typeSec = A.section(1, A.vec(Seq(
      Seq(0x60.toByte) ++ A.vec(Seq(Seq(0x7f.toByte))) ++ A.vec(Seq(Seq(0x7f.toByte))),
      Seq(0x60.toByte) ++ A.vec(Seq(Seq(0x7f.toByte), Seq(0x7f.toByte))) ++
        A.vec(Seq(Seq(0x7f.toByte))))))
    val funcSec = A.section(3, A.vec(Seq(A.uleb(0), A.uleb(0), A.uleb(1))))
    val tableSec = A.section(4, A.vec(Seq(Seq(0x70.toByte, 0x00.toByte) ++ A.uleb(2))))
    val memSec = A.section(5, A.vec(Seq(Seq(0x00.toByte) ++ A.uleb(1))))
    val exportSec = A.section(7, A.vec(Seq(A.name("sel") ++ Seq(0x00.toByte) ++ A.uleb(2))))
    val elemSec = A.section(9, A.vec(Seq(
      A.uleb(0) ++ Seq(0x41.toByte, 0x00.toByte, 0x0b.toByte) ++
        A.vec(Seq(A.uleb(1), A.uleb(0)))))) // table[0]=func1(inc), table[1]=func0(double)
    def code(body: Seq[Byte]) = A.vec(Nil) ++ body :+ 0x0b.toByte
    val doubleBody = code(Seq(0x20, 0x00, 0x41, 0x02, 0x6c).map(_.toByte))
    val incBody = code(Seq(0x20, 0x00, 0x41, 0x01, 0x6a).map(_.toByte))
    val selBody = code(Seq(
      0x20, 0x01,       // x
      0x20, 0x00,       // which (table slot)
      0x11, 0x00, 0x00  // call_indirect type0, table 0
    ).map(_.toByte))
    val codeSec = A.section(10, A.vec(Seq(doubleBody, incBody, selBody).map(c =>
      A.uleb(c.length.toLong) ++ c)))
    val bytes = (Seq(0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00).map(_.toByte) ++
      typeSec ++ funcSec ++ tableSec ++ memSec ++ exportSec ++ elemSec ++ codeSec).toArray
    val m = new WasmModule(bytes)
    assert(m.invoke("sel", 0L, 10L).contains(11L)) // table[0] → inc
    assert(m.invoke("sel", 1L, 10L).contains(20L)) // table[1] → double
    val e = intercept[IllegalStateException] { m.invoke("sel", 5L, 1L) }
    assert(e.getMessage.contains("table"))
  }

  test("float trunc and conversion boundary semantics (spec regressions)") {
    import graft.udf.wasm.WasmAssembler
    def d64(x: Double) = {
      val bits = java.lang.Double.doubleToRawLongBits(x)
      Seq(0x44.toByte) ++ (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte)
    }
    // f64.trunc(NaN) must stay NaN (not 0.0)
    val truncNaN = new WasmModule(WasmAssembler.module("t", 0, 0,
      d64(Double.NaN) ++ Seq(0x9d.toByte), resultType = 0x7c))
    assert(java.lang.Double.longBitsToDouble(truncNaN.invoke("t").get).isNaN)
    // f64.trunc(1e300) is identity (not Long.MaxValue.toDouble)
    val truncBig = new WasmModule(WasmAssembler.module("t", 0, 0,
      d64(1e300) ++ Seq(0x9d.toByte), resultType = 0x7c))
    assert(java.lang.Double.longBitsToDouble(truncBig.invoke("t").get) == 1e300)
    // i32.trunc_f64_s(2147483647.5) converts (truncated value in range)
    val convEdge = new WasmModule(WasmAssembler.module("t", 0, 0,
      d64(2147483647.5) ++ Seq(0xaa.toByte)))
    assert(convEdge.invoke("t").contains(2147483647L))
    // …but 2147483648.5 traps
    val convOver = new WasmModule(WasmAssembler.module("t", 0, 0,
      d64(2147483648.5) ++ Seq(0xaa.toByte)))
    intercept[IllegalStateException] { convOver.invoke("t") }
  }

  test("sign-extension ops: extend8_s/extend16_s/extend32_s") {
    import graft.udf.wasm.WasmAssembler
    // f(x: i64) = i64.extend8_s(x)
    val m8 = new WasmModule(WasmAssembler.module("e", 1, 0,
      Seq(0x20, 0x00, 0xc2).map(_.toByte), paramTypes = Seq(0x7e), resultType = 0x7e))
    assert(m8.invoke("e", 0x80L).get == -128L)  // high bit of byte -> negative
    assert(m8.invoke("e", 0x7fL).get == 127L)
    val m32 = new WasmModule(WasmAssembler.module("e", 1, 0,
      Seq(0x20, 0x00, 0xc4).map(_.toByte), paramTypes = Seq(0x7e), resultType = 0x7e))
    assert(m32.invoke("e", 0xffffffffL).get == -1L)
    assert(m32.invoke("e", 0x7fffffffL).get == Int.MaxValue.toLong)
  }

  test("i64 narrow loads/stores round-trip with correct extension") {
    import graft.udf.wasm.WasmAssembler
    // f(x: i64): store32 x at 0; return load32_s(0)
    def roundtrip(storeOp: Int, loadOp: Int, x: Long): Long = {
      val body = Seq(
        0x41, 0x00, 0x20, 0x00, storeOp, 0x00, 0x00, // store at addr 0
        0x41, 0x00, loadOp, 0x00, 0x00               // load from addr 0
      ).map(_.toByte)
      val m = new WasmModule(WasmAssembler.module("r", 1, 0, body,
        paramTypes = Seq(0x7e), resultType = 0x7e))
      m.invoke("r", x).get
    }
    assert(roundtrip(0x3e, 0x34, 0xffffffffL) == -1L)        // store32/load32_s
    assert(roundtrip(0x3e, 0x35, 0xffffffffL) == 0xffffffffL) // load32_u
    assert(roundtrip(0x3d, 0x32, 0x8000L) == -32768L)         // store16/load16_s
    assert(roundtrip(0x3d, 0x33, 0x8000L) == 0x8000L)         // load16_u
    assert(roundtrip(0x3c, 0x30, 0x80L) == -128L)             // store8/load8_s
    assert(roundtrip(0x3c, 0x31, 0x80L) == 0x80L)             // load8_u
  }

  test("saturating truncation: NaN -> 0, out-of-range clamps, no traps") {
    import graft.udf.wasm.WasmAssembler
    def run(bits: Long, sub: Int, resultType: Int): Long = {
      // f(x: f64-bits as i64) = trunc_sat(reinterpret)
      val body = Seq(0x20, 0x00, 0xbf, 0xfc, sub).map(_.toByte) // f64.reinterpret_i64
      val m = new WasmModule(WasmAssembler.module("t", 1, 0, body,
        paramTypes = Seq(0x7e), resultType = resultType))
      m.invoke("t", bits).get
    }
    def d(x: Double) = java.lang.Double.doubleToRawLongBits(x)
    assert(run(d(Double.NaN), 2, 0x7f) == 0L)            // i32_s: NaN -> 0
    assert(run(d(1e12), 2, 0x7f) == Int.MaxValue.toLong) // clamp high
    assert(run(d(-1e12), 2, 0x7f) == Int.MinValue.toLong)
    assert(run(d(-5.0), 3, 0x7f) == 0L)                  // i32_u: negative -> 0
    assert(run(d(5e9), 3, 0x7f) == 0xffffffffL)          // clamp to 2^32-1
    assert(run(d(42.9), 6, 0x7e) == 42L)                 // i64_s plain trunc
    assert(run(d(2e19), 7, 0x7e) == -1L)                 // i64_u clamp 2^64-1
  }

  test("bulk memory: memory.copy and memory.fill with full bounds checks") {
    import graft.udf.wasm.WasmAssembler
    // f(): fill [0,4)=0x2a; copy [0,4) -> [8,12); return mem[8] (load8_u)
    val body = Seq(
      0x41, 0x00, 0x41, 0x2a, 0x41, 0x04, // dst=0 val=0x2a n=4
      0xfc, 11, 0x00,                     // memory.fill
      0x41, 0x08, 0x41, 0x00, 0x41, 0x04, // dst=8 src=0 n=4
      0xfc, 10, 0x00, 0x00,               // memory.copy
      0x41, 0x08, 0x2d, 0x00, 0x00        // i32.load8_u mem[8]
    ).map(_.toByte)
    val m = new WasmModule(WasmAssembler.module("bk", 0, 0, body))
    assert(m.invoke("bk").get == 0x2aL)
    // out-of-bounds fill traps before touching anything
    val oob = Seq(
      0x41, 0x7f, 0x41, 0x00, 0x41, 0x10, // dst=-1 val=0 n=16
      0xfc, 11, 0x00,
      0x41, 0x00).map(_.toByte)
    val bad = new WasmModule(WasmAssembler.module("oob", 0, 0, oob))
    val e = intercept[IllegalStateException] { bad.invoke("oob") }
    assert(e.getMessage.contains("out of bounds"))
  }

  test("br_table selects branch depth by operand (switch lowering)") {
    import graft.udf.wasm.WasmAssembler
    // block A { block B { block C { br_table [C,B] default=A on x }
    //   -> 10 } -> 20 } -> 30
    val body = Seq(
      0x02, 0x40,                 // block A
      0x02, 0x40,                 //   block B
      0x02, 0x40,                 //     block C
      0x20, 0x00,                 //       local.get x
      0x0e, 0x02, 0x00, 0x01, 0x02, //    br_table [0,1] default 2
      0x0b,                       //     end C
      0x41, 10, 0x0f,             //     i32.const 10; return
      0x0b,                       //   end B
      0x41, 20, 0x0f,             //   i32.const 20; return
      0x0b,                       // end A
      0x41, 30                    // i32.const 30
    ).map(_.toByte)
    val m = new WasmModule(WasmAssembler.module("sw", nParams = 1, nLocals = 0, body = body))
    assert(m.invoke("sw", 0L).get == 10L)
    assert(m.invoke("sw", 1L).get == 20L)
    assert(m.invoke("sw", 2L).get == 30L)
    assert(m.invoke("sw", 99L).get == 30L) // out of range -> default
  }

  test("signed division overflow traps (INT_MIN / -1)") {
    val A = graft.udf.wasm.WasmAssembler
    // i32: JVM wraps Int.MinValue / -1 silently; wasm must trap.
    val i32Div = new WasmModule(A.module("t", 0, 0,
      Seq(0x41.toByte) ++ A.sleb(Int.MinValue.toLong) ++
        Seq(0x41.toByte) ++ A.sleb(-1L) ++ Seq(0x6d.toByte)))
    val e32 = intercept[IllegalStateException] { i32Div.invoke("t") }
    assert(e32.getMessage.contains("integer overflow"))
    // i64 likewise.
    val i64Div = new WasmModule(A.module("t", 0, 0,
      Seq(0x42.toByte) ++ A.sleb(Long.MinValue) ++
        Seq(0x42.toByte) ++ A.sleb(-1L) ++ Seq(0x7f.toByte), resultType = 0x7e))
    val e64 = intercept[IllegalStateException] { i64Div.invoke("t") }
    assert(e64.getMessage.contains("integer overflow"))
    // rem_s at the same operands is defined (0), not a trap.
    val i32Rem = new WasmModule(A.module("t", 0, 0,
      Seq(0x41.toByte) ++ A.sleb(Int.MinValue.toLong) ++
        Seq(0x41.toByte) ++ A.sleb(-1L) ++ Seq(0x6f.toByte)))
    assert(i32Rem.invoke("t").contains(0L))
  }

  test("call_indirect traps on value-type mismatch with equal arity") {
    val A = graft.udf.wasm.WasmAssembler
    // type0: (i32)->(i32) [declared at call site]; type1: (f64)->(f64)
    // [what the table slot actually holds]
    val typeSec = A.section(1, A.vec(Seq(
      Seq(0x60.toByte) ++ A.vec(Seq(Seq(0x7f.toByte))) ++ A.vec(Seq(Seq(0x7f.toByte))),
      Seq(0x60.toByte) ++ A.vec(Seq(Seq(0x7c.toByte))) ++ A.vec(Seq(Seq(0x7c.toByte))))))
    val funcSec = A.section(3, A.vec(Seq(A.uleb(1), A.uleb(0)))) // f64 fn, then caller
    val tableSec = A.section(4, A.vec(Seq(Seq(0x70.toByte, 0x00.toByte) ++ A.uleb(1))))
    val memSec = A.section(5, A.vec(Seq(Seq(0x00.toByte) ++ A.uleb(1))))
    val exportSec = A.section(7, A.vec(Seq(A.name("f") ++ Seq(0x00.toByte) ++ A.uleb(1))))
    val elemSec = A.section(9, A.vec(Seq(
      A.uleb(0) ++ Seq(0x41.toByte, 0x00.toByte, 0x0b.toByte) ++ A.vec(Seq(A.uleb(0))))))
    def code(body: Seq[Byte]) = A.vec(Nil) ++ body :+ 0x0b.toByte
    val f64Body = code(Seq(0x20, 0x00).map(_.toByte))           // identity f64
    val callerBody = code(Seq(
      0x20, 0x00, 0x41, 0x00, 0x11, 0x00, 0x00).map(_.toByte)) // call_indirect type0
    val codeSec = A.section(10, A.vec(Seq(f64Body, callerBody).map(c =>
      A.uleb(c.length.toLong) ++ c)))
    val bytes = (Seq(0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00).map(_.toByte) ++
      typeSec ++ funcSec ++ tableSec ++ memSec ++ exportSec ++ elemSec ++ codeSec).toArray
    val m = new WasmModule(bytes)
    val e = intercept[IllegalArgumentException] { m.invoke("f", 4L) }
    assert(e.getMessage.contains("type mismatch"))
  }

  test("f64 guest compute: dot product over linear memory") {
    import graft.udf.wasm.WasmAssembler
    // dotf(n) -> f64: vectors a at 0, b at 1024, both n f64s
    // local 1 (i32): i ; local via separate group not supported by the
    // mini-assembler, so use an f64 accumulator in memory at 2048
    val body = Seq(
      // acc = 0.0 stored at 2048
      0x41, 0x80+0x00, 0x10,        // i32.const 2048 (uleb 0x80 0x10)
      0x44, 0, 0, 0, 0, 0, 0, 0, 0, // f64.const 0.0
      0x39, 0x00, 0x00,             // f64.store
      0x02, 0x40,                   // block
      0x03, 0x40,                   //   loop
      0x20, 0x01,                   //     local.get i
      0x20, 0x00,                   //     local.get n
      0x4e,                         //     i32.ge_s
      0x0d, 0x01,                   //     br_if 1
      0x41, 0x80+0x00, 0x10,        //     i32.const 2048 (store addr)
      0x41, 0x80+0x00, 0x10, 0x2b, 0x00, 0x00, // load acc
      // a[i]: addr = i*8
      0x20, 0x01, 0x41, 0x08, 0x6c, 0x2b, 0x00, 0x00,
      // b[i]: addr = 1024 + i*8
      0x20, 0x01, 0x41, 0x08, 0x6c, 0x41, 0x80+0x00, 0x08, 0x6a, 0x2b, 0x00, 0x00,
      0xa2,                         //     f64.mul
      0xa0,                         //     f64.add
      0x39, 0x00, 0x00,             //     store acc
      0x20, 0x01, 0x41, 0x01, 0x6a, 0x21, 0x01, // i += 1
      0x0c, 0x00,                   //     br 0
      0x0b, 0x0b,                   // end end
      0x41, 0x80+0x00, 0x10, 0x2b, 0x00, 0x00 // load acc (result)
    ).map(_.toByte)
    val m = new WasmModule(WasmAssembler.module("dotf", 1, 1, body,
      resultType = 0x7c))
    def putF64(off: Int, ds: Seq[Double]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(8 * ds.size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ds.foreach(bb.putDouble)
      m.writeMemory(off, bb.array())
    }
    putF64(0, Seq(1.5, 2.0, -3.0))
    putF64(1024, Seq(2.0, 0.5, 1.0))
    val bits = m.invoke("dotf", 3L).get
    val got = java.lang.Double.longBitsToDouble(bits)
    assert(got == 1.5 * 2.0 + 2.0 * 0.5 + -3.0 * 1.0) // = 1.0
  }

  test("data segments initialize memory; globals are readable/mutable") {
    import graft.udf.wasm.WasmAssembler
    // f(i) = mem[i] + global0 ; global1 counts invocations
    val m = new WasmModule(WasmAssembler.module("f", 1, 0, Seq(
      0x23, 0x01, 0x41, 0x01, 0x6a, 0x24, 0x01, // g1 = g1 + 1
      0x20, 0x00, 0x2d, 0x00, 0x00,             // load8 mem[i]
      0x23, 0x00, 0x6a                          // + g0
    ).map(_.toByte),
      globals = Seq((false, 100L), (true, 0L)),
      data = Seq((0, Array[Byte](7, 8, 9)))))
    assert(m.invoke("f", 0L).contains(107L))
    assert(m.invoke("f", 2L).contains(109L))
    // immutable global rejects writes
    val bad = new WasmModule(WasmAssembler.module("g", 0, 0,
      Seq(0x41, 0x01, 0x24, 0x00).map(_.toByte) ++ Seq(0x41.toByte, 0x00.toByte),
      globals = Seq((false, 0L))))
    intercept[IllegalArgumentException] { bad.invoke("g") }
  }
}
