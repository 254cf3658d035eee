package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSuite extends AnyFunSuite {

  test("graft SQL functions are injectable via SparkSessionExtensions") {
    // getOrCreate would reuse another suite's session and silently skip
    // the extensions — force a fresh one
    SparkSession.getActiveSession.foreach(_ => ())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val r = spark.sql(
        """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
          |       sq_dist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS s""".stripMargin)
        .collect().head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 11.0)
      assert(r.getDouble(2) == 25.0)
      // sketch aggregates usable straight from SQL
      import spark.implicits._
      Seq("a", "a", "b").toDF("w").createOrReplaceTempView("words")
      val hh = spark.sql("SELECT heavy_hitters(w, 8) FROM words")
        .collect().head.getMap[String, Long](0)
      assert(hh("a") == 2L && hh("b") == 1L)
      val sig = spark.sql("SELECT minhash_sig(w, 16) FROM words")
        .collect().head.getSeq[Int](0)
      assert(sig.length == 16)
      val buckets = spark.sql(
        "SELECT sign_lsh_buckets(array_repeat(0.5d, 64), 8, 4, 64, 42L) AS b")
        .collect().head.getSeq[Long](0)
      assert(buckets.length == 8 && buckets.forall(b => b >= 0 && b < 16))
      val wf = spark.sql(
        "SELECT winnow_fingerprints('the quick brown fox jumps over the dog') AS f")
        .collect().head.getSeq[Long](0)
      assert(wf.nonEmpty)
      val op = spark.sql(
        "SELECT explode(ordered_pairs(array(1L, 2L, 3L))) AS p")
        .selectExpr("p.doc_a", "p.doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(op == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    } finally {
      // don't stop(): that would kill the SparkContext shared with the
      // other suites in this JVM — just hand back the default-session slot
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
