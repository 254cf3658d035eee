package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the evaluation operators' numeric kernels — the gate
  * verifies them against DuckDB on the corpus, these pin the math on
  * crafted inputs where the right answer is known in closed form.
  */
class EvalSuite extends SparkSpec {

  /** Brute-force ROC-AUC: fraction of (pos, neg) pairs ranked correctly,
    * ties at 0.5 — the definition the rank-statistic must equal. */
  private def bruteAuc(scores: Seq[(Double, Int)]): Double = {
    val pos = scores.filter(_._2 == 1).map(_._1)
    val neg = scores.filter(_._2 == 0).map(_._1)
    val s = (for { p <- pos; n <- neg } yield {
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    }).sum
    s / (pos.size * neg.size)
  }

  private def metricsFor(scores: Seq[(Double, Int)]) = {
    import spark.implicits._
    val df = scores.toDF("p_en", "label_en")
      .withColumn("pred_en", col("p_en") >= 0.5)
    TextOps.classifierMetrics(df).head()
  }

  test("histogram-AUC equals brute-force pair counting, with ties") {
    // pos {0.9, 0.8}, neg {0.8, 0.3}: 3 correct pairs + 1 tie → 0.875
    val scores = Seq((0.9, 1), (0.8, 0), (0.8, 1), (0.3, 0))
    val r = metricsFor(scores)
    assert(r.getAs[Double]("auc") == 0.875)
    assert(math.abs(r.getAs[Double]("auc") - bruteAuc(scores)) < 1e-9)
  }

  test("histogram-AUC matches brute force on a deterministic pseudo-random set") {
    // hash-derived scores/labels — no RNG, reproducible
    val scores = (1 to 200).map { i =>
      val h = ((i * 2654435761L) >>> 16) & 0xffff
      val p = math.floor((h / 65536.0) * 1e6 + 0.5) / 1e6
      (p, if (((i * 40503L) >>> 8) % 3 == 0) 1 else 0)
    }
    val r = metricsFor(scores)
    assert(math.abs(r.getAs[Double]("auc") - bruteAuc(scores)) < 5e-7,
      s"auc=${r.getAs[Double]("auc")} brute=${bruteAuc(scores)}")
  }

  test("confusion counts and operating-point metrics, including the all-negative guard") {
    val r = metricsFor(Seq((0.9, 1), (0.7, 0), (0.4, 1), (0.1, 0)))
    assert(r.getAs[Long]("tp") == 1 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("fn") == 1)
    assert(r.getAs[Double]("prec") == 0.5 && r.getAs[Double]("rec") == 0.5 &&
      r.getAs[Double]("f1") == 0.5)
    // all-negative predictor: precision is DEFINED as 0, not a crash/NaN
    val z = metricsFor(Seq((0.2, 1), (0.1, 0)))
    assert(z.getAs[Double]("prec") == 0.0 && z.getAs[Double]("rec") == 0.0 &&
      z.getAs[Double]("f1") == 0.0)
  }

  test("single-class input pins AUC to 0.0 instead of NaN") {
    // np = n (all positive) and np = 0 (all negative) leave the
    // Mann-Whitney denominator at zero — the guard defines AUC as 0.0
    // on both engines rather than Spark-NaN vs DuckDB-error divergence
    val allPos = metricsFor(Seq((0.9, 1), (0.4, 1)))
    assert(allPos.getAs[Double]("auc") == 0.0)
    val allNeg = metricsFor(Seq((0.9, 0), (0.4, 0)))
    assert(allNeg.getAs[Double]("auc") == 0.0)
  }

  test("histogram nearest-rank quantiles equal a brute-force sorted pick") {
    // the q_seq_len_quantiles / q_curriculum_buckets threshold rule:
    // smallest value whose cumulative count reaches ceil(q·n) — must
    // equal indexing the sorted values at ceil(q·n)-1, ties included
    import spark.implicits._
    val values = Seq(5L, 3L, 9L, 3L, 7L, 3L, 9L, 1L, 7L, 7L, 2L)
    val sortedV = values.sorted
    def brute(q: Double) = sortedV(math.ceil(q * values.size).toInt - 1)
    val h = values.toDF("v").groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val wnd = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cc = h.withColumn("cum", sum(col("cnt")).over(wnd))
    for (q <- Seq(0.25, 0.5, 0.75, 0.9, 0.99, 1.0)) {
      val got = cc.filter(col("cum") >= math.ceil(q * values.size))
        .agg(min(col("v"))).head().getLong(0)
      assert(got == brute(q), s"q=$q: histogram=$got brute=${brute(q)}")
    }
  }

  test("rank-sum product is decimal-exact past the int64 overflow point") {
    // pos·(2·below+cnt+1) with counts ~3e9 overflows int64 (~1.8e19 >
    // 9.2e18); the decimal-cast operands must carry it exactly. Feed the
    // histogram aggregate synthetic GROUP counts at that magnitude by
    // checking the decimal arithmetic directly on crafted columns.
    import spark.implicits._
    // pos = 4e9, term = 8e9+1 → product 3.2e19+4e9, past int64 max 9.2e18
    val df = Seq((4000000000L, 8000000001L)).toDF("pos", "term")
    val prod = df.select((col("pos").cast("decimal(38,0)") *
      col("term").cast("decimal(38,0)")).as("p")).head().getDecimal(0)
    assert(prod.toBigInteger.toString == "32000000004000000000",
      s"decimal product wrong: $prod")
  }

  test("calibration bins span all 10 buckets; p=1.0 clamps into bin 9, p=0.0 into bin 0") {
    // the gate's corpus lands every p_en in one bin, so the
    // LEAST(floor(p·10), 9) clamp is pinned here on synthetic scores:
    // two per decile (one at the lower boundary), plus exact 0.0/1.0
    import spark.implicits._
    val scores =
      (0 until 10).flatMap { b =>
        Seq((b / 10.0, b % 2), (b / 10.0 + 0.05, 1 - b % 2))
      } ++ Seq((1.0, 1), (0.0, 0)) // boundary: 1.0 must NOT open bin 10
    val bins = TextOps.calibrationBins(scores.toDF("p_en", "label_en"))
      .collect()
    assert(bins.map(_.getAs[Int]("bin")).toSeq == (0 until 10),
      s"bins=${bins.map(_.getAs[Int]("bin")).mkString(",")}")
    // bin 0 holds {0.0 (twice: boundary row + decile row), 0.05}; bin 9
    // holds {0.9, 0.95, 1.0} — the clamp, not an 11th bin
    val b0 = bins.find(_.getAs[Int]("bin") == 0).get
    val b9 = bins.find(_.getAs[Int]("bin") == 9).get
    assert(b0.getAs[Long]("n") == 3 && b9.getAs[Long]("n") == 3)
    assert(b9.getAs[Double]("mean_p") == 0.95) // (0.9+0.95+1.0)/3 via decimal sum
    // a middle bin's mean/pos_rate/gap agree with hand arithmetic:
    // bin 4 = {(0.4, 0), (0.45, 1)} → mean 0.425, pos_rate 0.5, gap 0.075
    val b4 = bins.find(_.getAs[Int]("bin") == 4).get
    assert(b4.getAs[Double]("mean_p") == 0.425 &&
      b4.getAs[Double]("pos_rate") == 0.5 && b4.getAs[Double]("gap") == 0.075)
  }
}
