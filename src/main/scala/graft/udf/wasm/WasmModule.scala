package graft.udf.wasm

import scala.collection.mutable

/** Minimal WebAssembly 1.0 module decoder + interpreter — a spec-subset,
  * pure-JVM engine for the UDF host (the reference's guest compute is WASM;
  * BASELINE's north-star is "Structured Streaming with WebAssembly UDFs").
  * No external dependency ships in this environment, so this implements
  * the core needed for bytes→bytes / scalar transforms directly from the
  * public WebAssembly binary-format spec:
  *
  *  - sections: type, function, memory, global, export, code, data
  *    (+ custom, skipped);
  *  - values: i32/i64 sign-extended in a Long; f32/f64 as raw bits;
  *  - instructions: control (block/loop/if/else/br/br_if/br_table/
  *    return/call/call_indirect), locals/globals, i32/i64/f32/f64 const +
  *    arithmetic/logic/comparison, conversions (trunc with spec traps,
  *    trunc_sat, convert, demote/promote, reinterpret, extend*_s), memory
  *    load/store (incl. 8/16-bit), memory.size/grow, bulk memory
  *    (memory.copy/fill), drop/select, nop.
  *
  * Function imports resolve against a host-function registry at decode
  * time (the reference's hostcall surface, SURVEY §3.1 — collapsed to
  * synchronous calls per §7.4.1); funcref tables + call_indirect dispatch
  * with full-type checks. Unresolved imports and everything outside the
  * subset (start sections, unknown opcodes) fail LOUDLY when the module
  * is constructed, never silently mis-executed. Function bodies are opcode-validated and their block
  * structure is precomputed once at decode, not per invocation.
  *
  * Isolation invariants mirror the reference's sandbox rules
  * (AGENTS.md; subsystem/wasmtime/src/lib.rs:36,63-64): linear memory is
  * capped at `maxMemoryPages`, out-of-bounds access traps (it does NOT
  * grow memory), and execution is metered by `fuel`.
  */
final class WasmModule(bytes: Array[Byte],
                       maxMemoryPages: Int = 256, // 16 MiB, reference parity
                       fuel: Long = 1L << 26,
                       hostFns: Map[String, Seq[Long] => Option[Long]] = Map.empty)
    extends Serializable {

  import WasmModule._

  // ---- decode ------------------------------------------------------------

  // Every read is bounds-checked: the module bytes are UNTRUSTED guest
  // input, and a truncated/corrupt module must be REFUSED
  // (IllegalArgumentException) rather than crash the host with a raw
  // AIOOBE — the contract WasmFuzzSuite pins with random blobs and
  // mutation fuzzing.
  private var pos = 0
  private def u8(): Int = {
    if (pos >= bytes.length)
      throw new IllegalArgumentException("truncated wasm module")
    val b = bytes(pos) & 0xff; pos += 1; b
  }
  private def uleb(): Long = { val (v, np) = ulebAt(bytes, pos); pos = np; v }
  private def take(n: Int): Array[Byte] = {
    // subtraction form: `pos + n` overflows Int for a hostile 5-byte uleb
    // length, wrapping negative and slipping past an addition-form check
    require(n >= 0 && n <= bytes.length - pos, "truncated wasm module (bytes)")
    val a = bytes.slice(pos, pos + n); pos += n; a
  }
  private def rawU32(): Long =
    u8().toLong | (u8().toLong << 8) | (u8().toLong << 16) | (u8().toLong << 24)

  private val types = mutable.ArrayBuffer[FuncType]()
  /** imported functions first (they occupy the low function indices),
    * then module-local functions — the wasm function index space. */
  private val importedFns = mutable.ArrayBuffer[(String, Int)]() // (key, typeIdx)
  private val funcTypeIdx = mutable.ArrayBuffer[Int]()
  private val exports = mutable.Map[String, Int]()
  private val codes = mutable.ArrayBuffer[Code]()
  private var memPagesMin = 0
  private val globals = mutable.ArrayBuffer[Long]() // values (i32/i64)
  private val globalMutable = mutable.ArrayBuffer[Boolean]()
  // data segments decoded before memory exists: applied after sizing
  private val dataSegments = mutable.ArrayBuffer[(Int, Array[Byte])]()
  // funcref table (call_indirect dispatch); -1 = uninitialized slot
  private var table: Array[Int] = Array.emptyIntArray

  /** Decode a constant-expression initializer: `i32.const n end` /
    * `i64.const n end` (the only forms the subset accepts). */
  private def constExpr(): Long = {
    val op = u8()
    val v = op match {
      case 0x41 | 0x42 =>
        val (sv, np) = slebAt(bytes, pos); pos = np
        if (op == 0x41) sv.toInt.toLong else sv
      case 0x43 => // f32.const: raw bits, zero-extended
        take(4).zipWithIndex.map { case (b, i) => (b & 0xffL) << (8 * i) }.sum
      case 0x44 => // f64.const: raw bits
        take(8).zipWithIndex.map { case (b, i) => (b & 0xffL) << (8 * i) }.sum
      case other =>
        throw new UnsupportedOperationException(f"const initializer 0x$other%02x")
    }
    require(u8() == 0x0b, "malformed const initializer")
    v
  }

  require(rawU32() == 0x6d736100L, "not a wasm module (magic)") // "\0asm" LE
  require(rawU32() == 1L, "unsupported wasm version")

  while (pos < bytes.length) {
    val id = u8()
    val size = uleb().toInt
    val end = pos + size
    // a negative/oversized declared size would otherwise move `pos`
    // BACKWARD at the `pos = end` sync (infinite decode loop) or past
    // the buffer — refuse up front
    require(size >= 0 && size <= bytes.length - pos, s"section $id size out of bounds")
    id match {
      case 0 => pos = end // custom section: names/producers, safe to skip
      case 1 => // types
        val n = uleb().toInt
        (0 until n).foreach { _ =>
          require(u8() == 0x60, "expected functype")
          val np = uleb().toInt
          val ps = IndexedSeq.fill(np) {
            val t = u8(); require(ValTypes(t), "unsupported param type"); t
          }
          val nr = uleb().toInt
          val rs = IndexedSeq.fill(nr) {
            val t = u8(); require(ValTypes(t), "unsupported result type"); t
          }
          require(nr <= 1, "multi-value results unsupported")
          types += FuncType(ps, rs)
        }
      case 3 => // functions
        val n = uleb().toInt
        (0 until n).foreach(_ => funcTypeIdx += uleb().toInt)
      case 5 => // memory
        val n = uleb().toInt
        (0 until n).foreach { _ =>
          val flags = u8()
          memPagesMin = uleb().toInt
          // the allocation below multiplies by PageSize: an unchecked huge
          // min would overflow into NegativeArraySizeException (or OOM)
          require(memPagesMin >= 0 && memPagesMin <= maxMemoryPages,
            s"memory min $memPagesMin exceeds cap $maxMemoryPages")
          if ((flags & 1) != 0) uleb() // declared max; we cap ourselves
        }
      case 7 => // exports
        val n = uleb().toInt
        (0 until n).foreach { _ =>
          val name = new String(take(uleb().toInt), "UTF-8")
          val kind = u8()
          val idx = uleb().toInt
          if (kind == 0) exports(name) = idx
        }
      case 10 => // code
        val n = uleb().toInt
        (0 until n).foreach { _ =>
          val bodySize = uleb().toInt
          val bodyEnd = pos + bodySize
          require(bodySize >= 0 && bodySize <= end - pos, "function body size out of bounds")
          var nLocalsL = 0L
          val nGroups = uleb().toInt
          (0 until nGroups).foreach { _ =>
            val cnt = uleb().toInt
            val t = u8(); require(ValTypes(t), "unsupported local type")
            require(cnt >= 0, "negative local count")
            nLocalsL += cnt // Long: two hostile groups cannot wrap the sum
            require(nLocalsL <= (1 << 16), "too many locals")
          }
          val nLocals = nLocalsL.toInt
          val body = bytes.slice(pos, bodyEnd)
          val (endOf, elseOf) = scanBlocks(body) // validates opcodes too
          codes += Code(nLocals, body, endOf, elseOf)
          pos = bodyEnd
        }
      case 6 => // globals: const-initialized i32/i64
        val n = uleb().toInt
        (0 until n).foreach { _ =>
          val t = u8(); require(ValTypes(t), "unsupported global type")
          val mut = u8()
          globalMutable += (mut == 1)
          globals += constExpr()
        }
      case 11 => // data: active segments with i32.const offsets
        val n = uleb().toInt
        (0 until n).foreach { _ =>
          val flags = uleb().toInt
          require(flags == 0, "only active data segments on memory 0 supported")
          val offset = constExpr().toInt
          val len = uleb().toInt
          dataSegments += ((offset, take(len)))
        }
      case 2 => // imports: function imports resolve against hostFns
        val n = uleb().toInt
        (0 until n).foreach { _ =>
          val mod = new String(take(uleb().toInt), "UTF-8")
          val fld = new String(take(uleb().toInt), "UTF-8")
          val kind = u8()
          require(kind == 0, s"only function imports supported ($mod.$fld)")
          val typeIdx = uleb().toInt
          val key = s"$mod.$fld"
          require(hostFns.contains(key), s"unresolved wasm import '$key'")
          importedFns += ((key, typeIdx))
        }
      case 4 => // tables: a single funcref table
        val n = uleb().toInt
        require(n <= 1, "at most one table supported")
        (0 until n).foreach { _ =>
          require(u8() == 0x70, "only funcref tables supported")
          val flags = u8()
          val min = uleb().toInt
          require(min >= 0 && min <= (1 << 20), s"table size $min out of bounds")
          if ((flags & 1) != 0) uleb()
          table = Array.fill(min)(-1)
        }
      case 9 => // elements: active funcref segments with i32.const offsets
        val n = uleb().toInt
        (0 until n).foreach { _ =>
          val flags = uleb().toInt
          require(flags == 0, "only active element segments on table 0 supported")
          val offset = constExpr().toInt
          val cnt = uleb().toInt
          require(offset >= 0 && cnt >= 0 && cnt <= table.length - offset,
            "element segment out of table bounds")
          (0 until cnt).foreach { k =>
            val fIdx = uleb().toInt
            // function section precedes elements, so the index space is known
            require(fIdx >= 0 && fIdx < importedFns.size + funcTypeIdx.size,
              s"element references unknown function $fIdx")
            table(offset + k) = fIdx
          }
        }
      case other =>
        // start(8): implicit side effects at instantiation are out of scope
        throw new UnsupportedOperationException(
          s"wasm section id $other unsupported (start)")
    }
    require(pos == end, s"section $id malformed")
  }

  // ---- cross-section validation ------------------------------------------
  // Mutated modules can reorder/contradict sections, so every index that
  // later drives an array lookup is range-checked HERE, once — the
  // interpreter then never needs per-dispatch guards for them.
  require(funcTypeIdx.forall(i => i >= 0 && i < types.size),
    "function type index out of range")
  require(importedFns.forall { case (_, t) => t >= 0 && t < types.size },
    "import type index out of range")
  require(codes.size == funcTypeIdx.size,
    s"code section (${codes.size}) does not match function section (${funcTypeIdx.size})")
  require(exports.values.forall(i => i >= 0 && i < importedFns.size + funcTypeIdx.size),
    "export references unknown function")

  // ---- runtime -----------------------------------------------------------

  private var memory = new Array[Byte](memPagesMin * PageSize)
  dataSegments.foreach { case (offset, data) =>
    require(offset >= 0 && data.length <= memory.length - offset,
      "data segment exceeds initial memory")
    System.arraycopy(data, 0, memory, offset, data.length)
  }

  def memorySize: Int = memory.length
  def readMemory(offset: Int, len: Int): Array[Byte] = memory.slice(offset, offset + len)
  /** Host-side write; grows up to the cap (guest loads/stores trap instead). */
  def writeMemory(offset: Int, data: Array[Byte]): Unit = {
    growTo(offset + data.length)
    System.arraycopy(data, 0, memory, offset, data.length)
  }
  /** Host-side clear (e.g. between payloads). */
  def clearMemory(from: Int, until: Int): Unit = {
    val hi = math.min(until, memory.length)
    if (from < hi) java.util.Arrays.fill(memory, from, hi, 0.toByte)
  }
  private def growTo(minBytes: Int): Unit = {
    if (memory.length >= minBytes) return
    val pages = (minBytes + PageSize - 1) / PageSize
    require(pages <= maxMemoryPages, s"memory cap exceeded ($pages pages)")
    memory = java.util.Arrays.copyOf(memory, pages * PageSize)
  }
  @inline private def checkAddr(addr: Long, size: Int): Int = {
    if (addr < 0 || addr + size > memory.length)
      throw new IllegalStateException(
        s"wasm trap: out-of-bounds memory access ($addr+$size of ${memory.length})")
    addr.toInt
  }

  /** Invoke an exported function. i32 results are sign-extended Longs. */
  def invoke(`export`: String, args: Long*): Option[Long] = {
    val fIdx = exports.getOrElse(`export`,
      throw new NoSuchMethodException(s"wasm export '${`export`}'"))
    var remainingFuel = fuel

    def callFunction(idx: Int, argv: Array[Long], depth: Int = 0): Option[Long] = {
      // spec "call stack exhaustion" trap: a self-recursive guest must
      // trap here, not ride JVM recursion into StackOverflowError
      if (depth > 128) // each guest frame costs many JVM frames — cap
        throw new IllegalStateException("wasm trap: call stack exhausted")
      if (idx < importedFns.size) { // host function (hostcall parity)
        val (key, typeIdx) = importedFns(idx)
        val ft0 = types(typeIdx)
        require(argv.length == ft0.params.length, s"arity mismatch calling import $key")
        val res = hostFns(key)(argv.toSeq)
        require(res.isDefined == ft0.results.nonEmpty,
          s"host '$key' result arity violates import type")
        return res
      }
      val local = idx - importedFns.size
      val ft = types(funcTypeIdx(local))
      require(argv.length == ft.params.length, s"arity mismatch calling func $idx")
      val code = codes(local)
      val body = code.body
      val f = new Frame(body, ft.params.length + code.nLocals, ft.results.nonEmpty)
      System.arraycopy(argv, 0, f.locals, 0, argv.length)

      // Dispatch is SPLIT: control flow + calls + locals/globals here,
      // everything else in the four opcode-family handlers below. A
      // single method holding all ~140 cases exceeds HotSpot's
      // HugeMethodLimit (8000 bytecode bytes, -XX:DontCompileHugeMethods
      // default true) and is therefore NEVER JIT-compiled — measured 25×
      // slower per invoke (535 µs vs 21 µs on the l2norm guest) and 300×
      // inside a busy Spark session. Keeping every method well under the
      // limit is a correctness-of-performance invariant; WasmPerfSuite
      // pins it with a throughput floor.
      while (f.running && f.pc < body.length) {
        remainingFuel -= 1
        if (remainingFuel <= 0) throw new IllegalStateException("wasm fuel exhausted")
        val op = body(f.pc) & 0xff
        f.pc += 1
        op match {
          case 0x00 => throw new IllegalStateException("wasm trap: unreachable")
          case 0x01 => // nop
          case 0x02 | 0x03 => // block | loop
            val bt = body(f.pc) & 0xff; f.pc += 1
            val arity = if (bt == 0x40) 0 else 1
            f.cPush(op, f.pc, code.endOf(f.pc - 2), f.sp, arity)
          case 0x04 => // if
            val bt = body(f.pc) & 0xff; f.pc += 1
            val arity = if (bt == 0x40) 0 else 1
            val cond = f.pop()
            val opening = f.pc - 2
            f.cPush(0x02, f.pc, code.endOf(opening), f.sp, arity)
            if (cond == 0) {
              val e = code.elseOf(opening)
              f.pc = if (e >= 0) e + 1
                     else { f.csp -= 1; code.endOf(opening) + 1 }
            }
          case 0x05 => // else reached = end of then-branch
            f.csp -= 1
            f.pc = f.cFrames(f.csp * 5 + 2) + 1
          case 0x0b => // end
            if (f.csp > 0) f.csp -= 1
            else f.running = false
          case 0x0c => f.branch(f.immU().toInt)
          case 0x0d => val d = f.immU().toInt; if (f.pop() != 0) f.branch(d)
          case 0x0e => // br_table: n labels + default, select by operand
            val n = f.immU().toInt
            val labels = new Array[Int](n)
            var i = 0
            while (i < n) { labels(i) = f.immU().toInt; i += 1 }
            val dflt = f.immU().toInt
            val sel = f.pop().toInt
            f.branch(if (sel >= 0 && sel < n) labels(sel) else dflt)
          case 0x0f => f.doReturn()
          case 0x10 =>
            val callee = f.immU().toInt
            val calleeType =
              if (callee < importedFns.size) types(importedFns(callee)._2)
              else types(funcTypeIdx(callee - importedFns.size))
            val argv2 = new Array[Long](calleeType.params.length)
            var i = calleeType.params.length - 1
            while (i >= 0) { argv2(i) = f.pop(); i -= 1 }
            callFunction(callee, argv2, depth + 1).foreach(f.push)
          case 0x11 => // call_indirect: (type imm, table imm 0x00)
            val expectType = f.immU().toInt
            f.pc += 1 // table index byte (always 0)
            val slot = f.pop().toInt
            if (slot < 0 || slot >= table.length || table(slot) < 0)
              throw new IllegalStateException("wasm trap: undefined table element")
            val callee = table(slot)
            val calleeType =
              if (callee < importedFns.size) types(importedFns(callee)._2)
              else types(funcTypeIdx(callee - importedFns.size))
            require(calleeType == types(expectType),
              "wasm trap: indirect call type mismatch")
            val argv2 = new Array[Long](calleeType.params.length)
            var i = calleeType.params.length - 1
            while (i >= 0) { argv2(i) = f.pop(); i -= 1 }
            callFunction(callee, argv2, depth + 1).foreach(f.push)
          case 0x1a => f.pop() // drop
          case 0x1b => // select
            val c = f.pop(); val b = f.pop(); val a = f.pop()
            f.push(if (c != 0) a else b)
          case 0x20 => f.push(f.locals(f.immU().toInt))
          case 0x21 => f.locals(f.immU().toInt) = f.pop()
          case 0x22 => f.locals(f.immU().toInt) = f.vstack(f.sp - 1) // local.tee
          case 0x23 => f.push(globals(f.immU().toInt)) // global.get
          case 0x24 => // global.set
            val g = f.immU().toInt
            require(globalMutable(g), s"wasm trap: global $g immutable")
            globals(g) = f.pop()
          case 0x41 => f.push(f.immS().toInt.toLong) // i32.const
          case 0x42 => f.push(f.immS())              // i64.const
          case other =>
            if (!execNum(f, other) && !execMem(f, other) &&
                !execFp(f, other) && !execCvt(f, other))
              throw new UnsupportedOperationException(
                f"wasm opcode 0x$other%02x unsupported")
        }
      }
      f.result
    }

    // A body that passed opcode validation can still carry hostile
    // IMMEDIATES (local.get 200 with 3 locals, branch depths past the
    // control stack, …). Rather than tax every dispatch with a guard,
    // convert the JVM's own index checks into the wasm trap they
    // semantically are — the guest dies, the host survives (the
    // contract WasmFuzzSuite pins with mutation fuzzing).
    try callFunction(fIdx, args.toArray)
    catch {
      case e: IndexOutOfBoundsException =>
        throw new IllegalStateException(s"wasm trap: invalid access (${e.getMessage})", e)
      case e: NoSuchElementException =>
        throw new IllegalStateException(s"wasm trap: stack underflow (${e.getMessage})", e)
      case e: NegativeArraySizeException =>
        throw new IllegalStateException(s"wasm trap: invalid allocation (${e.getMessage})", e)
      case e: StackOverflowError =>
        // last-resort: the explicit depth cap above should fire first;
        // the interpreter holds no host locks and its only mutable state
        // is this module's own memory/globals, so converting at the
        // boundary is safe
        throw new IllegalStateException("wasm trap: call stack exhausted (jvm)", e)
    }
  }

  /** Memory ops (0x28–0x40): loads, stores, memory.size/grow. */
  private def execMem(f: Frame, op: Int): Boolean = {
    import f._
    op match {
      case 0x28 => // i32.load (canonical: sign-extended)
        immU(); val off = immU()
        val addr = checkAddr(pop() + off, 4)
        push((((memory(addr) & 0xff)) | ((memory(addr + 1) & 0xff) << 8) |
          ((memory(addr + 2) & 0xff) << 16) | ((memory(addr + 3) & 0xff) << 24)).toLong)
      case 0x29 => // i64.load
        immU(); val off = immU()
        val addr = checkAddr(pop() + off, 8)
        var v = 0L; var i = 7
        while (i >= 0) { v = (v << 8) | (memory(addr + i) & 0xffL); i -= 1 }
        push(v)
      case 0x2a => // f32.load
        immU(); val off = immU()
        val addr = checkAddr(pop() + off, 4)
        var v = 0L; var i = 3
        while (i >= 0) { v = (v << 8) | (memory(addr + i) & 0xffL); i -= 1 }
        push(v)
      case 0x2b => // f64.load
        immU(); val off = immU()
        val addr = checkAddr(pop() + off, 8)
        var v = 0L; var i = 7
        while (i >= 0) { v = (v << 8) | (memory(addr + i) & 0xffL); i -= 1 }
        push(v)
      case 0x2c => // i32.load8_s
        immU(); val off = immU()
        push(memory(checkAddr(pop() + off, 1)).toLong)
      case 0x2d => // i32.load8_u (0..255 — canonical either way)
        immU(); val off = immU()
        push(memory(checkAddr(pop() + off, 1)) & 0xffL)
      case 0x2e => // i32.load16_s
        immU(); val off = immU()
        val a = checkAddr(pop() + off, 2)
        push((((memory(a) & 0xff) | (memory(a + 1) << 8))).toShort.toLong)
      case 0x2f => // i32.load16_u
        immU(); val off = immU()
        val a = checkAddr(pop() + off, 2)
        push(((memory(a) & 0xffL)) | ((memory(a + 1) & 0xffL) << 8))
      case 0x30 => // i64.load8_s
        immU(); val off = immU()
        push(memory(checkAddr(pop() + off, 1)).toLong)
      case 0x31 => // i64.load8_u
        immU(); val off = immU()
        push(memory(checkAddr(pop() + off, 1)) & 0xffL)
      case 0x32 => // i64.load16_s
        immU(); val off = immU()
        val a = checkAddr(pop() + off, 2)
        push((((memory(a) & 0xff) | ((memory(a + 1) & 0xff) << 8)).toShort).toLong)
      case 0x33 => // i64.load16_u
        immU(); val off = immU()
        val a = checkAddr(pop() + off, 2)
        push(((memory(a) & 0xffL)) | ((memory(a + 1) & 0xffL) << 8))
      case 0x34 => // i64.load32_s
        immU(); val off = immU()
        val a = checkAddr(pop() + off, 4)
        push((((memory(a) & 0xff)) | ((memory(a + 1) & 0xff) << 8) |
          ((memory(a + 2) & 0xff) << 16) | ((memory(a + 3) & 0xff) << 24)).toLong)
      case 0x35 => // i64.load32_u
        immU(); val off = immU()
        val a = checkAddr(pop() + off, 4)
        push(((memory(a) & 0xffL)) | ((memory(a + 1) & 0xffL) << 8) |
          ((memory(a + 2) & 0xffL) << 16) | ((memory(a + 3) & 0xffL) << 24))
      case 0x36 => // i32.store
        immU(); val off = immU()
        val v = pop(); val addr = checkAddr(pop() + off, 4)
        memory(addr) = v.toByte; memory(addr + 1) = (v >> 8).toByte
        memory(addr + 2) = (v >> 16).toByte; memory(addr + 3) = (v >> 24).toByte
      case 0x37 => // i64.store
        immU(); val off = immU()
        val v = pop(); val addr = checkAddr(pop() + off, 8)
        var i = 0
        while (i < 8) { memory(addr + i) = (v >> (8 * i)).toByte; i += 1 }
      case 0x38 => // f32.store
        immU(); val off = immU()
        val v = pop(); val addr = checkAddr(pop() + off, 4)
        var i = 0
        while (i < 4) { memory(addr + i) = (v >> (8 * i)).toByte; i += 1 }
      case 0x39 => // f64.store
        immU(); val off = immU()
        val v = pop(); val addr = checkAddr(pop() + off, 8)
        var i = 0
        while (i < 8) { memory(addr + i) = (v >> (8 * i)).toByte; i += 1 }
      case 0x3a => // i32.store8
        immU(); val off = immU()
        val v = pop(); val addr = checkAddr(pop() + off, 1)
        memory(addr) = v.toByte
      case 0x3b => // i32.store16
        immU(); val off = immU()
        val v = pop(); val addr = checkAddr(pop() + off, 2)
        memory(addr) = v.toByte; memory(addr + 1) = (v >> 8).toByte
      case 0x3c => // i64.store8
        immU(); val off = immU()
        val v = pop(); memory(checkAddr(pop() + off, 1)) = v.toByte
      case 0x3d => // i64.store16
        immU(); val off = immU()
        val v = pop(); val a = checkAddr(pop() + off, 2)
        memory(a) = v.toByte; memory(a + 1) = (v >> 8).toByte
      case 0x3e => // i64.store32
        immU(); val off = immU()
        val v = pop(); val a = checkAddr(pop() + off, 4)
        memory(a) = v.toByte; memory(a + 1) = (v >> 8).toByte
        memory(a + 2) = (v >> 16).toByte; memory(a + 3) = (v >> 24).toByte
      case 0x3f => immU(); push(memory.length / PageSize) // memory.size
      case 0x40 => // memory.grow
        immU(); val delta = pop().toInt
        val cur = memory.length / PageSize
        if (delta >= 0 && cur + delta <= maxMemoryPages) {
          growTo((cur + delta) * PageSize); push(cur)
        } else push(-1L)
      case _ => return false
    }
    true
  }

  /** Integer compare/arithmetic/bit ops (i32 + i64) and the pure
    * integer width conversions. */
  private def execNum(f: Frame, op: Int): Boolean = {
    import f._
    @inline def i32(v: Long): Long = v.toInt.toLong
    op match {
      // ---- i32 ----
      case 0x45 => push(if (pop() == 0) 1 else 0)
      case 0x46 => push(if (pop() == pop()) 1 else 0)
      case 0x47 => push(if (pop() != pop()) 1 else 0)
      case 0x48 => val b = pop().toInt; val a = pop().toInt; push(if (a < b) 1 else 0)
      case 0x49 => val b = pop(); val a = pop()
        push(if (java.lang.Integer.compareUnsigned(a.toInt, b.toInt) < 0) 1 else 0)
      case 0x4a => val b = pop().toInt; val a = pop().toInt; push(if (a > b) 1 else 0)
      case 0x4b => val b = pop(); val a = pop()
        push(if (java.lang.Integer.compareUnsigned(a.toInt, b.toInt) > 0) 1 else 0)
      case 0x4c => val b = pop().toInt; val a = pop().toInt; push(if (a <= b) 1 else 0)
      case 0x4d => val b = pop(); val a = pop()
        push(if (java.lang.Integer.compareUnsigned(a.toInt, b.toInt) <= 0) 1 else 0)
      case 0x4e => val b = pop().toInt; val a = pop().toInt; push(if (a >= b) 1 else 0)
      case 0x4f => val b = pop(); val a = pop()
        push(if (java.lang.Integer.compareUnsigned(a.toInt, b.toInt) >= 0) 1 else 0)
      case 0x67 => push(java.lang.Integer.numberOfLeadingZeros(pop().toInt).toLong)
      case 0x68 => push(java.lang.Integer.numberOfTrailingZeros(pop().toInt).toLong)
      case 0x69 => push(java.lang.Integer.bitCount(pop().toInt).toLong)
      case 0x6a => push(i32(pop() + pop()))
      case 0x6b => val b = pop(); val a = pop(); push(i32(a - b))
      case 0x6c => push(i32(pop().toInt * pop().toInt))
      case 0x6d => val b = pop().toInt; val a = pop().toInt
        if (b == 0) throw new IllegalStateException("wasm trap: div by zero")
        // Wasm spec: INT_MIN / -1 overflows and must trap (JVM wraps).
        if (a == Int.MinValue && b == -1)
          throw new IllegalStateException("wasm trap: integer overflow")
        push(i32(a / b))
      case 0x6e => val b = pop().toInt; val a = pop().toInt
        if (b == 0) throw new IllegalStateException("wasm trap: div by zero")
        push(java.lang.Integer.divideUnsigned(a, b).toLong)
      case 0x6f => val b = pop().toInt; val a = pop().toInt
        if (b == 0) throw new IllegalStateException("wasm trap: rem by zero")
        push(i32(a % b))
      case 0x70 => val b = pop().toInt; val a = pop().toInt
        if (b == 0) throw new IllegalStateException("wasm trap: rem by zero")
        push(java.lang.Integer.remainderUnsigned(a, b).toLong)
      case 0x71 => push(i32(pop() & pop()))
      case 0x72 => push(i32(pop() | pop()))
      case 0x73 => push(i32(pop() ^ pop()))
      case 0x74 => val b = pop().toInt; val a = pop().toInt; push(i32(a << (b & 31)))
      case 0x75 => val b = pop().toInt; val a = pop().toInt; push(i32(a >> (b & 31)))
      case 0x76 => val b = pop().toInt; val a = pop().toInt; push(i32(a >>> (b & 31)))
      case 0x77 => val b = pop().toInt; val a = pop().toInt
        push(i32(java.lang.Integer.rotateLeft(a, b & 31).toLong))
      case 0x78 => val b = pop().toInt; val a = pop().toInt
        push(i32(java.lang.Integer.rotateRight(a, b & 31).toLong))
      // ---- i64 ----
      case 0x50 => push(if (pop() == 0) 1 else 0) // i64.eqz
      case 0x51 => push(if (pop() == pop()) 1 else 0)
      case 0x52 => push(if (pop() != pop()) 1 else 0)
      case 0x53 => val b = pop(); val a = pop(); push(if (a < b) 1 else 0)
      case 0x54 => val b = pop(); val a = pop()
        push(if (java.lang.Long.compareUnsigned(a, b) < 0) 1 else 0)
      case 0x55 => val b = pop(); val a = pop(); push(if (a > b) 1 else 0)
      case 0x56 => val b = pop(); val a = pop()
        push(if (java.lang.Long.compareUnsigned(a, b) > 0) 1 else 0)
      case 0x57 => val b = pop(); val a = pop(); push(if (a <= b) 1 else 0)
      case 0x58 => val b = pop(); val a = pop()
        push(if (java.lang.Long.compareUnsigned(a, b) <= 0) 1 else 0)
      case 0x59 => val b = pop(); val a = pop(); push(if (a >= b) 1 else 0)
      case 0x5a => val b = pop(); val a = pop()
        push(if (java.lang.Long.compareUnsigned(a, b) >= 0) 1 else 0)
      case 0x79 => push(java.lang.Long.numberOfLeadingZeros(pop()).toLong)
      case 0x7a => push(java.lang.Long.numberOfTrailingZeros(pop()).toLong)
      case 0x7b => push(java.lang.Long.bitCount(pop()).toLong)
      case 0x7c => push(pop() + pop())
      case 0x7d => val b = pop(); val a = pop(); push(a - b)
      case 0x7e => push(pop() * pop())
      case 0x7f => val b = pop(); val a = pop()
        if (b == 0) throw new IllegalStateException("wasm trap: div by zero")
        if (a == Long.MinValue && b == -1L)
          throw new IllegalStateException("wasm trap: integer overflow")
        push(a / b)
      case 0x80 => val b = pop(); val a = pop()
        if (b == 0) throw new IllegalStateException("wasm trap: div by zero")
        push(java.lang.Long.divideUnsigned(a, b))
      case 0x81 => val b = pop(); val a = pop()
        if (b == 0) throw new IllegalStateException("wasm trap: rem by zero")
        push(a % b)
      case 0x82 => val b = pop(); val a = pop()
        if (b == 0) throw new IllegalStateException("wasm trap: rem by zero")
        push(java.lang.Long.remainderUnsigned(a, b))
      case 0x83 => push(pop() & pop())
      case 0x84 => push(pop() | pop())
      case 0x85 => push(pop() ^ pop())
      case 0x86 => val b = pop(); val a = pop(); push(a << (b & 63))
      case 0x87 => val b = pop(); val a = pop(); push(a >> (b & 63))
      case 0x88 => val b = pop(); val a = pop(); push(a >>> (b & 63))
      case 0x89 => val b = pop(); val a = pop()
        push(java.lang.Long.rotateLeft(a, (b & 63).toInt))
      case 0x8a => val b = pop(); val a = pop()
        push(java.lang.Long.rotateRight(a, (b & 63).toInt))
      case 0xa7 => push(i32(pop())) // i32.wrap_i64
      case 0xac => push(pop().toInt.toLong) // i64.extend_i32_s
      case 0xad => push(pop() & 0xffffffffL) // i64.extend_i32_u
      // sign-extension ops (merged into core wasm; llvm emits by default)
      case 0xc0 => push(pop().toByte.toLong)  // i32.extend8_s
      case 0xc1 => push(pop().toShort.toLong) // i32.extend16_s
      case 0xc2 => push(pop().toByte.toLong)  // i64.extend8_s
      case 0xc3 => push(pop().toShort.toLong) // i64.extend16_s
      case 0xc4 => push(pop().toInt.toLong)   // i64.extend32_s
      case _ => return false
    }
    true
  }

  /** Float consts, compares, and arithmetic (raw-bits-in-Long
    * representation on the value stack). */
  private def execFp(f: Frame, op: Int): Boolean = {
    import f._
    op match {
      case 0x43 => // f32.const
        var v = 0L; var i = 3
        while (i >= 0) { v = (v << 8) | (body(pc + i) & 0xffL); i -= 1 }
        pc += 4; push(v)
      case 0x44 => // f64.const
        var v = 0L; var i = 7
        while (i >= 0) { v = (v << 8) | (body(pc + i) & 0xffL); i -= 1 }
        pc += 8; push(v)
      case fop if fop >= 0x5b && fop <= 0x60 => // f32 compare
        val b = java.lang.Float.intBitsToFloat(pop().toInt)
        val a = java.lang.Float.intBitsToFloat(pop().toInt)
        val r = fop match {
          case 0x5b => a == b; case 0x5c => a != b; case 0x5d => a < b
          case 0x5e => a > b; case 0x5f => a <= b; case 0x60 => a >= b
        }
        push(if (r) 1 else 0)
      case fop if fop >= 0x61 && fop <= 0x66 => // f64 compare
        val b = java.lang.Double.longBitsToDouble(pop())
        val a = java.lang.Double.longBitsToDouble(pop())
        val r = fop match {
          case 0x61 => a == b; case 0x62 => a != b; case 0x63 => a < b
          case 0x64 => a > b; case 0x65 => a <= b; case 0x66 => a >= b
        }
        push(if (r) 1 else 0)
      case fop if fop >= 0x8b && fop <= 0x97 => // f32 unary/binary
        @inline def pf() = java.lang.Float.intBitsToFloat(pop().toInt)
        @inline def pushF(x: Float): Unit =
          push(java.lang.Float.floatToRawIntBits(x) & 0xffffffffL)
        fop match {
          case 0x8b => pushF(math.abs(pf()))
          case 0x8c => pushF(-pf())
          case 0x8d => pushF(math.ceil(pf().toDouble).toFloat)
          case 0x8e => pushF(math.floor(pf().toDouble).toFloat)
          case 0x8f => val x = pf()
            pushF(if (x.isNaN || x.isInfinite) x
                  else if (x < 0) math.ceil(x.toDouble).toFloat
                  else math.floor(x.toDouble).toFloat)
          case 0x90 => pushF(math.rint(pf().toDouble).toFloat)
          case 0x91 => pushF(math.sqrt(pf().toDouble).toFloat)
          case 0x92 => val b = pf(); val a = pf(); pushF(a + b)
          case 0x93 => val b = pf(); val a = pf(); pushF(a - b)
          case 0x94 => val b = pf(); val a = pf(); pushF(a * b)
          case 0x95 => val b = pf(); val a = pf(); pushF(a / b)
          case 0x96 => val b = pf(); val a = pf(); pushF(math.min(a, b))
          case 0x97 => val b = pf(); val a = pf(); pushF(math.max(a, b))
        }
      case 0x98 => // f32.copysign
        val b = java.lang.Float.intBitsToFloat(pop().toInt)
        val a = java.lang.Float.intBitsToFloat(pop().toInt)
        push(java.lang.Float.floatToRawIntBits(math.copySign(a, b)) & 0xffffffffL)
      case fop if fop >= 0x99 && fop <= 0xa5 => // f64 unary/binary
        @inline def pd() = java.lang.Double.longBitsToDouble(pop())
        @inline def pushD(d: Double): Unit =
          push(java.lang.Double.doubleToRawLongBits(d))
        fop match {
          case 0x99 => pushD(math.abs(pd()))
          case 0x9a => pushD(-pd())
          case 0x9b => pushD(math.ceil(pd()))
          case 0x9c => pushD(math.floor(pd()))
          case 0x9d => val x = pd()
            pushD(if (x.isNaN || x.isInfinite) x
                  else if (x < 0) math.ceil(x) else math.floor(x))
          case 0x9e => pushD(math.rint(pd()))
          case 0x9f => pushD(math.sqrt(pd()))
          case 0xa0 => val b = pd(); val a = pd(); pushD(a + b)
          case 0xa1 => val b = pd(); val a = pd(); pushD(a - b)
          case 0xa2 => val b = pd(); val a = pd(); pushD(a * b)
          case 0xa3 => val b = pd(); val a = pd(); pushD(a / b)
          case 0xa4 => val b = pd(); val a = pd(); pushD(math.min(a, b))
          case 0xa5 => val b = pd(); val a = pd(); pushD(math.max(a, b))
        }
      case 0xa6 => // f64.copysign
        val b = java.lang.Double.longBitsToDouble(pop())
        val a = java.lang.Double.longBitsToDouble(pop())
        push(java.lang.Double.doubleToRawLongBits(math.copySign(a, b)))
      case _ => return false
    }
    true
  }

  /** Float↔int conversions (trapping truncs, converts, demote/promote,
    * reinterprets) and the 0xFC prefix (saturating truncs +
    * memory.copy/fill). */
  private def execCvt(f: Frame, op: Int): Boolean = {
    import f._
    op match {
      case 0xa8 => // i32.trunc_f32_s
        val d = java.lang.Float.intBitsToFloat(pop().toInt).toDouble
        val t = if (d < 0) math.ceil(d) else math.floor(d)
        if (d.isNaN || t < Int.MinValue.toDouble || t > Int.MaxValue.toDouble)
          throw new IllegalStateException("wasm trap: invalid conversion")
        push(t.toInt.toLong)
      case 0xaa => // i32.trunc_f64_s
        val d = java.lang.Double.longBitsToDouble(pop())
        val t = if (d < 0) math.ceil(d) else math.floor(d)
        if (d.isNaN || t < Int.MinValue.toDouble || t > Int.MaxValue.toDouble)
          throw new IllegalStateException("wasm trap: invalid conversion")
        push(t.toInt.toLong)
      case 0xb2 => // f32.convert_i32_s
        push(java.lang.Float.floatToRawIntBits(pop().toInt.toFloat) & 0xffffffffL)
      case 0xb3 => // f32.convert_i32_u
        push(java.lang.Float.floatToRawIntBits(
          (pop() & 0xffffffffL).toFloat) & 0xffffffffL)
      case 0xb4 => // f32.convert_i64_s
        push(java.lang.Float.floatToRawIntBits(pop().toFloat) & 0xffffffffL)
      case 0xb5 => // f32.convert_i64_u
        val v = pop()
        val d = if (v >= 0) v.toDouble else ((v >>> 1) | (v & 1)).toDouble * 2.0
        push(java.lang.Float.floatToRawIntBits(d.toFloat) & 0xffffffffL)
      case 0xb6 => // f32.demote_f64
        push(java.lang.Float.floatToRawIntBits(
          java.lang.Double.longBitsToDouble(pop()).toFloat) & 0xffffffffL)
      case 0xb7 => // f64.convert_i32_s
        push(java.lang.Double.doubleToRawLongBits(pop().toInt.toDouble))
      case 0xb8 => // f64.convert_i32_u
        push(java.lang.Double.doubleToRawLongBits((pop() & 0xffffffffL).toDouble))
      case 0xb9 => // f64.convert_i64_s
        push(java.lang.Double.doubleToRawLongBits(pop().toDouble))
      case 0xba => // f64.convert_i64_u
        val v = pop()
        val d = if (v >= 0) v.toDouble else ((v >>> 1) | (v & 1)).toDouble * 2.0
        push(java.lang.Double.doubleToRawLongBits(d))
      case 0xbb => // f64.promote_f32
        push(java.lang.Double.doubleToRawLongBits(
          java.lang.Float.intBitsToFloat(pop().toInt).toDouble))
      // reinterpret ops: the value stack already holds raw bits for
      // floats, so all four are identity on the representation
      case 0xbc | 0xbd | 0xbe | 0xbf => ()
      case 0xfc => // bulk-memory prefix (the memcpy/memset every
        // compiled module emits); ranges bounds-checked IN FULL before
        // any byte moves (spec: partial copies never happen)
        def checkRange(a: Int, n: Int): Unit =
          if (a < 0 || n < 0 || a.toLong + n > memory.length)
            throw new IllegalStateException("wasm trap: out of bounds memory access")
        // saturating float→int (trunc_sat, subops 0-7): NaN → 0,
        // out-of-range clamps — the JVM's toInt/toLong semantics for
        // the signed cases, explicit clamps for unsigned
        def satU32(d: Double): Long =
          if (d.isNaN || d <= -1.0) 0L
          else if (d >= 4294967295.0) 0xffffffffL
          else d.toLong & 0xffffffffL
        def satU64(d: Double): Long =
          if (d.isNaN || d <= -1.0) 0L
          else if (d >= 1.8446744073709552e19) -1L // 2^64-1, all bits
          else if (d < 9.223372036854776e18) d.toLong
          else (d - 9.223372036854776e18).toLong | Long.MinValue
        @inline def popF32: Double = java.lang.Float.intBitsToFloat(pop().toInt).toDouble
        @inline def popF64: Double = java.lang.Double.longBitsToDouble(pop())
        immU().toInt match {
          case 0 => push(popF32.toInt.toLong)  // i32.trunc_sat_f32_s
          case 1 => push(satU32(popF32))       // i32.trunc_sat_f32_u
          case 2 => push(popF64.toInt.toLong)  // i32.trunc_sat_f64_s
          case 3 => push(satU32(popF64))       // i32.trunc_sat_f64_u
          case 4 => push(popF32.toLong)        // i64.trunc_sat_f32_s
          case 5 => push(satU64(popF32))       // i64.trunc_sat_f32_u
          case 6 => push(popF64.toLong)        // i64.trunc_sat_f64_s
          case 7 => push(satU64(popF64))       // i64.trunc_sat_f64_u
          case 10 => // memory.copy: dst src n (+ two reserved bytes)
            pc += 2
            val n = pop().toInt; val src = pop().toInt; val dst = pop().toInt
            checkRange(src, n); checkRange(dst, n)
            if (n > 0) System.arraycopy(memory, src, memory, dst, n)
          case 11 => // memory.fill: dst value n (+ one reserved byte)
            pc += 1
            val n = pop().toInt; val v = pop().toByte; val dst = pop().toInt
            checkRange(dst, n)
            if (n > 0) java.util.Arrays.fill(memory, dst, dst + n, v)
          case sub => throw new UnsupportedOperationException(
            s"wasm 0xfc subopcode $sub unsupported")
        }
      case _ => return false
    }
    true
  }

}

object WasmModule {
  val PageSize = 65536

  /** Per-call interpreter frame: primitive value stack (raw Array[Long]
    * + top index — a generic ArrayDeque[Long] boxes every push/pop),
    * control frames as one flat Int array (5 slots per frame: opcode,
    * startPc, endPc, entry-sp, labelArity), locals, and pc. Shared
    * mutable state between the split dispatch methods above; immediates
    * decode allocation-free (bodies were bounds/overlength-checked at
    * decode time by scanBlocks, so the invoke-boundary trap conversion
    * covers the pathological leftovers). */
  private[wasm] final class Frame(
      val body: Array[Byte], nSlots: Int, val hasResult: Boolean) {
    val locals = new Array[Long](nSlots)
    var vstack = new Array[Long](64)
    var sp = 0
    var cFrames = new Array[Int](5 * 16)
    var csp = 0
    var pc = 0
    var running = true
    var returned: Option[Long] = None

    def push(v: Long): Unit = {
      if (sp == vstack.length)
        vstack = java.util.Arrays.copyOf(vstack, vstack.length << 1)
      vstack(sp) = v; sp += 1
    }
    def pop(): Long = {
      sp -= 1
      if (sp < 0) throw new IllegalStateException("wasm trap: value stack underflow")
      vstack(sp)
    }
    def immU(): Long = {
      var r = 0L; var shift = 0; var x = 0
      do {
        x = body(pc) & 0xff; pc += 1
        r |= (x & 0x7fL) << shift; shift += 7
      } while ((x & 0x80) != 0)
      r
    }
    def immS(): Long = {
      var r = 0L; var shift = 0; var x = 0
      do {
        x = body(pc) & 0xff; pc += 1
        r |= (x & 0x7fL) << shift; shift += 7
      } while ((x & 0x80) != 0)
      if (shift < 64 && (x & 0x40) != 0) r |= -1L << shift
      r
    }
    def cPush(op: Int, start: Int, end: Int, entrySp: Int, arity: Int): Unit = {
      if (csp * 5 == cFrames.length)
        cFrames = java.util.Arrays.copyOf(cFrames, cFrames.length << 1)
      val b = csp * 5
      cFrames(b) = op; cFrames(b + 1) = start; cFrames(b + 2) = end
      cFrames(b + 3) = entrySp; cFrames(b + 4) = arity
      csp += 1
    }
    def doReturn(): Unit = {
      returned = if (hasResult) Some(pop()) else None
      running = false
    }
    def branch(depth: Int): Unit = {
      if (depth >= csp) { doReturn(); return } // function label
      csp -= depth // discard the crossed frames
      val b = (csp - 1) * 5
      val op = cFrames(b); val start = cFrames(b + 1)
      val endPc = cFrames(b + 2)
      val entrySp = cFrames(b + 3); val arity = cFrames(b + 4)
      if (op == 0x03) { // loop: target = start, label params none (MVP)
        if (sp > entrySp) sp = entrySp
        pc = start
      } else { // block/if: target = after end, carry label-arity results
        csp -= 1
        if (sp - arity < 0)
          throw new IllegalStateException("wasm trap: value stack underflow")
        System.arraycopy(vstack, sp - arity, vstack, entrySp, arity)
        sp = entrySp + arity
        pc = endPc + 1
      }
    }
    def result: Option[Long] =
      returned.orElse(if (hasResult && sp > 0) Some(pop()) else None)
  }

  /** Full function type: value-type lists (call_indirect compares these
    * for the spec type-mismatch trap; arity alone is not enough). */
  final case class FuncType(params: IndexedSeq[Int], results: IndexedSeq[Int])
  /** Per-function: locals count, body bytes, block-end map, else map. */
  final case class Code(nLocals: Int, body: Array[Byte],
                        endOf: Map[Int, Int], elseOf: Map[Int, Int])

  /** Opcodes the interpreter executes, with their immediate shapes. Used
    * by decode-time validation: a body containing anything else is
    * rejected when the module loads, so the branch maps can never be
    * corrupted by mis-parsed immediates of an unknown instruction. */
  val ValTypes = Set(0x7f, 0x7e, 0x7d, 0x7c) // i32 i64 f32 f64
  private val NoImm = Set(0x00, 0x01, 0x05, 0x0f, 0x1a, 0x1b) ++ (0x45 to 0xa6) ++
    Set(0xa7, 0xa8, 0xaa, 0xac, 0xad, 0xb2, 0xb3, 0xb4, 0xb5,
      0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xbb) ++
    (0xbc to 0xbf) ++ // reinterpret ops (identity on the raw-bits stack)
    (0xc0 to 0xc4) // sign-extension ops
  private val OneULeb = Set(0x0c, 0x0d, 0x10, 0x20, 0x21, 0x22, 0x23, 0x24, 0x3f, 0x40)
  private val OneSLeb = Set(0x41, 0x42)
  private val MemImm = Set(0x28, 0x29, 0x2a, 0x2b, 0x2c, 0x2d, 0x2e, 0x2f,
    0x30, 0x31, 0x32, 0x33, 0x34, 0x35,
    0x36, 0x37, 0x38, 0x39, 0x3a, 0x3b, 0x3c, 0x3d, 0x3e)

  /** Validate opcodes and map block/loop/if openings → end / else. */
  private def scanBlocks(body: Array[Byte]): (Map[Int, Int], Map[Int, Int]) = {
    val endOf = mutable.Map[Int, Int]()
    val elseOf = mutable.Map[Int, Int]()
    val stack = mutable.ArrayDeque[Int]()
    var pc = 0
    while (pc < body.length) {
      val op = body(pc) & 0xff
      val at = pc
      pc += 1
      op match {
        case 0x02 | 0x03 | 0x04 =>
          require(pc < body.length, "truncated function body (block type)")
          val bt = body(pc) & 0xff
          require(bt == 0x40 || ValTypes(bt), "unsupported block type")
          stack.prepend(at); pc += 1
        case 0x05 =>
          require(stack.nonEmpty, "else outside any block")
          elseOf(stack.head) = at
        case 0x0b => if (stack.nonEmpty) endOf(stack.removeHead()) = at
        case 0x11 => pc = ulebAt(body, pc)._2; pc += 1 // call_indirect
        case 0x0e => // br_table: count n, then n+1 label ulebs
          val (n, p1) = ulebAt(body, pc); pc = p1
          var i = 0L
          while (i <= n) { pc = ulebAt(body, pc)._2; i += 1 }
        case 0xfc => // prefix: uleb subop (+ reserved memory bytes)
          val (sub, p1) = ulebAt(body, pc); pc = p1
          sub match {
            case s0 if s0 >= 0 && s0 <= 7 => // trunc_sat: no immediates
            case 10 => pc += 2 // memory.copy
            case 11 => pc += 1 // memory.fill
            case other => throw new UnsupportedOperationException(
              s"wasm 0xfc subopcode $other unsupported (decode-time)")
          }
        case o if OneULeb(o) => pc = ulebAt(body, pc)._2
        case o if OneSLeb(o) => pc = slebAt(body, pc)._2
        case o if MemImm(o) => pc = ulebAt(body, pc)._2; pc = ulebAt(body, pc)._2
        case 0x43 => pc += 4 // f32.const raw bits
        case 0x44 => pc += 8 // f64.const raw bits
        case o if NoImm(o) => // no immediates
        case other =>
          throw new UnsupportedOperationException(
            f"wasm opcode 0x$other%02x unsupported (decode-time)")
      }
    }
    require(stack.isEmpty, "unbalanced blocks in function body")
    (endOf.toMap, elseOf.toMap.withDefaultValue(-1))
  }

  /** Bounds-checked LEB reads: untrusted bytes reach these both at decode
    * time and as body immediates, so running off the end must be a
    * CONTROLLED refusal (IllegalArgumentException), never a raw AIOOBE —
    * found by WasmFuzzSuite, which pins the contract. */
  private def ulebAt(b: Array[Byte], start: Int): (Long, Int) = {
    var result = 0L; var shift = 0; var p = start; var x = 0
    do {
      if (p < 0 || p >= b.length)
        throw new IllegalArgumentException("truncated wasm module (uleb)")
      x = b(p) & 0xff; p += 1; result |= (x & 0x7fL) << shift; shift += 7
      if (shift >= 64 && (x & 0x80) != 0) // JVM shift masking would corrupt
        throw new IllegalArgumentException("over-long uleb encoding")
    } while ((x & 0x80) != 0)
    (result, p)
  }
  private def slebAt(b: Array[Byte], start: Int): (Long, Int) = {
    var result = 0L; var shift = 0; var p = start; var x = 0
    do {
      if (p < 0 || p >= b.length)
        throw new IllegalArgumentException("truncated wasm module (sleb)")
      x = b(p) & 0xff; p += 1; result |= (x & 0x7fL) << shift; shift += 7
      if (shift >= 64 && (x & 0x80) != 0)
        throw new IllegalArgumentException("over-long sleb encoding")
    } while ((x & 0x80) != 0)
    if (shift < 64 && (x & 0x40) != 0) result |= -1L << shift
    (result, p)
  }
}
