package graft

import org.scalatest.funsuite.AnyFunSuite

/** Throughput floor for the WASM interpreter — pins the JIT-compilability
  * invariant documented in WasmModule.callFunction: every dispatch method
  * must stay under HotSpot's HugeMethodLimit (8000 bytecode bytes,
  * -XX:DontCompileHugeMethods default), because an over-limit method is
  * NEVER JIT-compiled and runs 25× slower (measured 535 µs vs ~10-20 µs
  * per l2norm invoke). A regression that re-merges the dispatch into one
  * giant method trips this floor long before it would show in the bench.
  */
class WasmPerfSuite extends AnyFunSuite {

  test("l2norm guest sustains the JIT-compiled throughput floor") {
    val guest = new graft.udf.wasm.WasmModule(
      graft.queries.WasmOps.l2normModuleForBench)
    val bb = java.nio.ByteBuffer.allocate(8 * 64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (1 to 64).foreach(i => bb.putDouble(i.toDouble))
    val payload = bb.array()
    val n = 2000
    // three rounds, keep the best: round 1 pays C2 warmup; an
    // interpreted-only regression cannot reach the floor in ANY round
    // (25× over it), so flake margin is wide on a busy host
    val best = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        guest.writeMemory(0, payload)
        guest.invoke("l2norm", 64L).get
        i += 1
      }
      System.nanoTime() - t0
    }.min
    val ms = best / 1e6
    // floor: 500 ms for 2000 invokes (~250 µs each). JIT-compiled runs
    // at ~10-50 µs/invoke; the un-JIT-able giant-method regression ran
    // at ~535 µs/invoke and fails this by >2×.
    assert(ms < 500.0,
      f"interpreter throughput regressed: $ms%.0f ms for $n invokes " +
        "(is a dispatch method over HotSpot's HugeMethodLimit again?)")
  }
}
