package graft

import org.scalatest.funsuite.AnyFunSuite

/** Growth regression guard (r16 verdict #1): the scale ladder measured
  * every bucketed dedup path ≤ ~linear cpu growth at ×10 rows
  * (SCALE.md r17 table; worst offender q_winnow_dedup at 9.3×, exponent
  * 0.97). A super-linear regression — a dropped df gate, a hot-key
  * group un-capped, a verify join gone quadratic — multiplies the
  * SHUFFLE VOLUME first, so the guard pins shuffle-write growth of the
  * worst offender on a ×8 synthetic corpus: linear ⇒ ~8–19×
  * (rows ×8, plus replica-suffixed tokens compressing worse — the
  * ladder measured 18.8× at ×10 on the same construction); quadratic ⇒
  * ≥64×. The 30× bound separates the regimes with margin on both
  * sides. Wall/cpu are deliberately NOT asserted (host-load flaky);
  * shuffle bytes are a property of the plan and the data.
  */
class ScaleGrowthSuite extends SparkSpec {

  test("winnow dedup shuffle volume grows ~linearly on a x8 corpus") {
    val base = "/root/testdata/sf0.001"
    val dir = tmpDir("growth_x8").toString
    ScaleLadder.buildCorpus(spark, base, dir, factor = 8)
    def shufW(d: String): Long = {
      // warm pass outside the window (codegen + parquet footers)
      SparkEntry.queries("q_winnow_dedup")(spark, d).count()
      spark.sharedState.cacheManager.clearCache()
      val (w, _) = ScaleLadder.measure(spark) {
        SparkEntry.queries("q_winnow_dedup")(spark, d).count()
        ()
      }
      spark.sharedState.cacheManager.clearCache()
      w
    }
    val w1 = shufW(base)
    val w8 = shufW(dir)
    assert(w1 > 0, s"no shuffle measured at x1 ($w1 bytes) — guard is vacuous")
    val ratio = w8.toDouble / w1
    assert(ratio < 30.0,
      f"winnow shuffle volume grew $ratio%.1fx on a x8 corpus " +
      f"($w1%d -> $w8%d bytes): super-linear candidate growth " +
      "(dropped df gate / un-capped hot key / quadratic verify?)")
  }
}
