package graft.queries

import graft.{Q, Tables}
import graft.udf.wasm.{WasmAssembler, WasmModule}
import org.apache.spark.sql.functions._

/** WASM-guest compute inside the correctness gate: a real WebAssembly
  * module (assembled in-process, executed by the built-in interpreter)
  * maps event ids through `f(x) = x*3 + 7`; the oracle recomputes the
  * affine map in plain SQL. Any interpreter bug — decode, arithmetic,
  * instance reuse — breaks the hash match.
  */
object WasmOps {

  val all: Seq[Q] = Seq(
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
