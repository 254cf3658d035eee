package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.Row

/** q_bigram_lm_perplexity pinned against a from-scratch Scala brute force
  * on a synthetic corpus, plus the half-up integer-quotient idiom at its
  * exact .5 boundary (the case where round(s/n, 6) diverged between
  * DuckDB's scaled round and the JVM's BigDecimal-of-double).
  */
class BigramLmSuite extends SparkSpec {

  test("engine matches a from-scratch brute force on a synthetic corpus") {
    import spark.implicits._
    val dir = tmpDir("graft_bilm").toString
    // two word-salad "dialects" with different bigram structure so the
    // below-mean keep flag splits; varied lengths incl. a 1-token doc
    // (no bigrams — must be absent from the output on both paths)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    def text(id: Long): String = {
      val n = 3 + (id % 7).toInt
      val ws = (0 until n).map { i =>
        val r = (id * 31 + i * 17 + (id % 2) * 7) % words.size
        words(r.toInt)
      }
      ws.mkString(" ")
    }
    val docs = (0L until 40L).map(i => (i, text(i), "en", "src0", 0L)) :+
      ((40L, "alpha", "en", "src0", 0L)) // single-token: zero bigrams
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q_bigram_lm_perplexity")(spark, dir)
      .collect().map { case Row(id: Long, n: Long, x: Double, k: Boolean) =>
        (id, n, x, k) }

    // brute force, independent data structures
    val toks = docs.map { case (id, t, _, _, _) =>
      id -> t.split(" ").filter(_.nonEmpty).toVector }.toMap
    val bigrams = toks.map { case (id, ws) => id -> ws.sliding(2).toVector
      .filter(_.size == 2).map(p => s"${p(0)} ${p(1)}") }
    val c12 = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = c12.groupBy(_._1.split(" ")(0)).view.mapValues(_.values.sum).toMap
    val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val nt = uni.values.sum.toDouble
    def mcost(g: String): Long = {
      val Array(w1, w2) = g.split(" ")
      val p = 0.7 * c12(g) / c1(w1) + 0.3 * uni(w2) / nt
      val c = BigDecimal(-math.log(p))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (c * 1000000).toLongExact
    }
    val want = bigrams.collect { case (id, bgs) if bgs.nonEmpty =>
      val s = bgs.map(mcost).sum
      val n = bgs.size.toLong
      (id, n, (2 * s + n) / (2 * n))
    }.toVector
    val txm = want.map(_._3).sum
    val k = want.size
    val wantRows = want.map { case (id, n, xm) =>
      (id, n, xm.toDouble / 1000000.0, xm.toDouble <= txm.toDouble / k)
    }.sortBy(_._1)

    assert(got.toVector === wantRows)
    assert(got.map(_._1).toSet === (0L until 40L).toSet,
      "the single-token doc must be absent")
    assert(got.exists(_._4) && got.exists(!_._4), "keep flag must split")
  }

  test("half-up integer quotient at the exact .5 boundary") {
    import spark.implicits._
    // 141918063 / 42 = 3379001.5 exactly — round(s/n, 6) on doubles sees
    // 3.3790014999... and engines disagreed; the integer form is exact
    val rows = Seq((121774590L, 36L, 3382628L), (141918063L, 42L, 3379002L),
      (41118618L, 12L, 3426552L), (7L, 2L, 4L) /* 3.5 half-up → 4 */)
      .toDF("s", "n", "want")
    val bad = rows.selectExpr("(2 * s + n) div (2 * n) AS got", "want")
      .where("got <> want").count()
    assert(bad === 0)
  }
}
