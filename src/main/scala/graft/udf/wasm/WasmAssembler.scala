package graft.udf.wasm

/** Tiny WebAssembly binary assembler (single-function modules) — enough to
  * author guest transforms in-process where no wasm toolchain exists, and
  * the source of the test binaries. Byte layout follows the public
  * binary-format spec.
  */
object WasmAssembler {

  def uleb(v: Long): Seq[Byte] = {
    var x = v; val out = Seq.newBuilder[Byte]
    while ({ val b = (x & 0x7f).toInt; x >>>= 7
             out += (if (x != 0) (b | 0x80) else b).toByte; x != 0 }) ()
    out.result()
  }

  def section(id: Int, content: Seq[Byte]): Seq[Byte] =
    id.toByte +: (uleb(content.length.toLong) ++ content)

  def vec(items: Seq[Seq[Byte]]): Seq[Byte] = uleb(items.length.toLong) ++ items.flatten

  def name(s: String): Seq[Byte] = uleb(s.length.toLong) ++ s.getBytes("UTF-8").toSeq

  /** One exported function (+1 memory page), optionally with
    * const-initialized globals `(mutable, init)`, active data segments
    * `(offset, bytes)`, and explicit value types (default all-i32).
    * Valtypes: 0x7f=i32 0x7e=i64 0x7d=f32 0x7c=f64. */
  def module(`export`: String, nParams: Int, nLocals: Int, body: Seq[Byte],
             globals: Seq[(Boolean, Long)] = Nil,
             data: Seq[(Int, Array[Byte])] = Nil,
             paramTypes: Seq[Int] = Nil,
             resultType: Int = 0x7f,
             localType: Int = 0x7f,
             localGroups: Seq[(Int, Int)] = Nil): Array[Byte] = {
    val pts = if (paramTypes.nonEmpty) paramTypes else Seq.fill(nParams)(0x7f)
    require(pts.length == nParams)
    val groups = if (localGroups.nonEmpty) localGroups
                 else if (nLocals > 0) Seq((nLocals, localType)) else Nil
    val header = Seq(0x00, 0x61, 0x73, 0x6d, 0x01, 0x00, 0x00, 0x00).map(_.toByte)
    val typeSec = section(1, vec(Seq(
      Seq(0x60.toByte) ++ vec(pts.map(t => Seq(t.toByte))) ++
        vec(Seq(Seq(resultType.toByte))))))
    val funcSec = section(3, vec(Seq(uleb(0))))
    val memSec = section(5, vec(Seq(Seq(0x00.toByte) ++ uleb(1))))
    val globalSec = if (globals.isEmpty) Nil else section(6, vec(globals.map {
      case (mut, init) =>
        Seq(0x7f.toByte, (if (mut) 1 else 0).toByte, 0x41.toByte) ++
          sleb(init) :+ 0x0b.toByte
    }))
    val exportSec = section(7, vec(Seq(name(`export`) ++ Seq(0x00.toByte) ++ uleb(0))))
    val locals = vec(groups.map { case (cnt, t) => uleb(cnt.toLong) ++ Seq(t.toByte) })
    val code = locals ++ body :+ 0x0b.toByte
    val codeSec = section(10, vec(Seq(uleb(code.length.toLong) ++ code)))
    val dataSec = if (data.isEmpty) Nil else section(11, vec(data.map {
      case (off, d) =>
        (uleb(0) ++ Seq(0x41.toByte) ++ sleb(off.toLong) :+ 0x0b.toByte) ++
          uleb(d.length.toLong) ++ d.toSeq
    }))
    (header ++ typeSec ++ funcSec ++ memSec ++ globalSec ++ exportSec ++
      codeSec ++ dataSec).toArray
  }

  /** Import section: function imports `(module, field, typeIdx)`. Insert
    * between type(1) and function(3) sections when assembling by hand. */
  def importSection(imports: Seq[(String, String, Int)]): Seq[Byte] =
    section(2, vec(imports.map { case (m, f, t) =>
      name(m) ++ name(f) ++ Seq(0x00.toByte) ++ uleb(t.toLong)
    }))

  /** `f(x) = (x * a + b)` over i32 (wrapping) — the demo guest transform. */
  def affineModule(`export`: String, a: Int, b: Int): Array[Byte] =
    module(`export`, nParams = 1, nLocals = 0,
      Seq[Byte](0x20, 0x00) ++                       // local.get 0
        (0x41.toByte +: sleb(a.toLong)) ++           // i32.const a
        Seq(0x6c.toByte) ++                          // i32.mul
        (0x41.toByte +: sleb(b.toLong)) ++           // i32.const b
        Seq(0x6a.toByte))                            // i32.add

  def sleb(v: Long): Seq[Byte] = {
    var x = v; val out = Seq.newBuilder[Byte]
    var more = true
    while (more) {
      val b = (x & 0x7f).toInt
      x >>= 7
      if ((x == 0 && (b & 0x40) == 0) || (x == -1 && (b & 0x40) != 0)) {
        out += b.toByte; more = false
      } else out += (b | 0x80).toByte
    }
    out.result()
  }
}
