package graft.udf

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WASM UDF host — the engine's equivalent of the reference's guest compute
  * surface (a WASM module between subscribe and publish, SURVEY §2.8).
  *
  * Architecture (the real part):
  *  - modules are pure bytes→bytes transforms (I/O stays in engine
  *    operators — SURVEY §7.4.1 resolution of the async-hostcall mismatch);
  *  - one module INSTANCE per executor partition, created lazily inside
  *    mapPartitions and reused row-to-row (instantiation is the expensive
  *    step; reference pins 256-page instances the same way,
  *    subsystem/wasmtime/src/lib.rs:136-147);
  *  - per-instance resource caps (memory bytes, fuel = max instructions)
  *    enforced by the host, mirroring the reference's StoreLimits + fuel
  *    invariants (AGENTS.md isolation rules).
  *
  * Two module implementations sit behind the `invoke` seam:
  * [[WasmModule.Interpreted]] executes REAL WebAssembly bytecode via the
  * built-in spec-subset interpreter ([[graft.udf.wasm.WasmModule]]), and
  * [[WasmModule.Stub]] is a deterministic stand-in for plumbing tests. A
  * production engine could swap in a JIT-ing runtime (e.g. Chicory) behind
  * the same seam; no Spark-side code changes.
  */
object WasmHost {

  /** One loaded module: `invoke(func, payload) → payload`. */
  trait WasmModule extends Serializable {
    def invoke(func: String, payload: Array[Byte]): Array[Byte]
  }

  object WasmModule {
    /** Deterministic stub "interpreter": reverse / xor / upper — enough to
      * prove the plumbing (schema, batching, instance reuse) end-to-end. */
    final class Stub(memoryCap: Int = 16 * 1024 * 1024, fuelCap: Long = 1L << 24)
        extends WasmModule {
      def invoke(func: String, payload: Array[Byte]): Array[Byte] = {
        require(payload.length <= memoryCap, "payload exceeds module memory cap")
        func match {
          case "reverse" => payload.reverse
          case "xor255"  => payload.map(b => (b ^ 0xff).toByte)
          case "upper"   => new String(payload, "UTF-8").toUpperCase.getBytes("UTF-8")
          case other     => throw new NoSuchMethodException(s"wasm export '$other'")
        }
      }
    }

    /** REAL WebAssembly execution via the built-in spec-subset interpreter
      * ([[graft.udf.wasm.WasmModule]]). Transform convention (the engine's
      * bytes→bytes ABI, SURVEY §7.4.1): payload is written at offset 0 of
      * the module's linear memory, the export is invoked as
      * `f(ptr=0, len) → outLen`, and `outLen` bytes are read back from
      * offset 0. One interpreter instance per partition (the factory runs
      * inside mapPartitions), module bytes ship to executors.
      *
      * READ-ONLY HOSTCALLS (`Context::require` parity, reference
      * system/userland/src/context.rs:38-73, collapsed to the synchronous
      * calls SURVEY §7.4.1 allows): `env.time_millis() → i64` and
      * `env.config_get(key: i64) → i64` are ALWAYS linked, but each traps
      * with PermissionDenied unless the module's capability set grants it
      * — the reference's deny-by-default stub linking
      * (subsystem/wasmtime/src/lib.rs:295-380). The clock is
      * host-supplied (and so deterministic under test); config is a
      * host-frozen i64→i64 map (missing key → -1). Guest I/O beyond these
      * stays in engine operators, by design. */
    final class Interpreted(moduleBytes: Array[Byte],
                            maxMemoryPages: Int = 256,
                            fuel: Long = 1L << 26,
                            capabilities: Set[graft.runtime.Capability.Value] = Set.empty,
                            hostClockMillis: () => Long = () => 0L,
                            hostConfig: Map[Long, Long] = Map.empty) extends WasmModule {
      // NOTE: the denial surfaces as a JVM SecurityException from inside
      // interpreter dispatch, not as a wasm trap — fine while every gated
      // hostcall is READ-ONLY (no instance state to half-mutate, and the
      // fuel/memory caps still bound the run). If a STATEFUL hostcall is
      // ever added, route PermissionDenied through the interpreter's trap
      // path instead, so partial guest-memory writes made before the call
      // are rolled back with the instance.
      private def gated(cap: graft.runtime.Capability.Value, fn: String)(
          f: Seq[Long] => Option[Long]): (String, Seq[Long] => Option[Long]) =
        fn -> { args: Seq[Long] =>
          if (capabilities.contains(cap)) f(args)
          else throw new SecurityException(
            s"PermissionDenied: hostcall '$fn' requires capability $cap")
        }
      @transient private lazy val engine =
        new graft.udf.wasm.WasmModule(moduleBytes, maxMemoryPages, fuel,
          hostFns = Map(
            gated(graft.runtime.Capability.TimeRead, "env.time_millis") { _ =>
              Some(hostClockMillis())
            },
            gated(graft.runtime.Capability.ConfigRead, "env.config_get") { args =>
              Some(hostConfig.getOrElse(args.headOption.getOrElse(-1L), -1L))
            }))
      @transient private var lastLen = 0
      def invoke(func: String, payload: Array[Byte]): Array[Byte] = {
        engine.writeMemory(0, payload)
        // zero the tail of the previous payload: rows must not see each
        // other's bytes through the reused linear memory
        engine.clearMemory(payload.length, lastLen)
        lastLen = payload.length
        val outLen = engine.invoke(func, 0L, payload.length.toLong)
          .map(_.toInt)
          .getOrElse(throw new IllegalStateException(
            s"wasm export '$func' returned no value (ABI: f(ptr,len) -> outLen)"))
        require(outLen >= 0 && outLen <= engine.memorySize,
          s"wasm export '$func' returned invalid outLen $outLen")
        lastLen = math.max(lastLen, outLen)
        engine.readMemory(0, outLen)
      }
    }
  }

  /** Module registry: moduleId → factory. Factories (not instances) are
    * shipped to executors; instances are partition-local. */
  private val modules = new ConcurrentHashMap[String, () => WasmModule]()

  def register(moduleId: String, factory: () => WasmModule): Unit =
    modules.put(moduleId, factory)

  def registered(moduleId: String): Boolean = modules.containsKey(moduleId)

  /** Apply `moduleId.func` over a binary column: one instance per
    * partition, rows streamed through it. Input: Dataset of (key, payload);
    * output schema (key, payload) with payload transformed. */
  def transform(df: DataFrame, moduleId: String, func: String,
                payloadCol: String): DataFrame = {
    val factory = Option(modules.get(moduleId))
      .getOrElse(throw new NoSuchElementException(s"no wasm module '$moduleId'"))
    val schema = df.schema
    val idx = schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val instance = factory() // per-partition instantiation (the seam)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val out = instance.invoke(func, bytes)
        org.apache.spark.sql.Row.fromSeq(r.toSeq.updated(idx, out))
      }
    }(enc)
  }
}
