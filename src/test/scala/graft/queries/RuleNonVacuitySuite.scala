package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Non-vacuity GATE for the hard-filter rule bundles (VERDICT r14 #4).
  *
  * The Gopher and C4 bundles are made non-vacuous by deterministic
  * doc_id-keyed page-structure injection — but that was BY CONSTRUCTION:
  * if a future fixture or injection change made a rule vacuous (one that
  * never fires, or never passes), both engines would still agree and the
  * oracle sweep would stay green. These tests convert the construction
  * into a checked property: every rule verdict column must take BOTH
  * values on the shipped fixture, so a rule that stops discriminating
  * turns a test red instead of silently becoming dead code.
  */
class RuleNonVacuitySuite extends SparkSpec {

  // sf0.01 is the gate SF (the driver's correctness runs there); it is
  // also the smallest SF guaranteed to exercise every injection residue
  // class (mod 3/5/7/9/11/13 over the full doc_id range).
  private val sf = "/root/testdata/sf0.01"

  private def bothValues(df: DataFrame, cols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    // one pass: per-column true-count + row count
    val aggs = cols.map(c => sum(col(c).cast("long")).as(c)) :+
      count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    cols.foreach { c =>
      val t = row.getAs[Long](c)
      assert(t > 0, s"rule $c is vacuous: never true on $n docs")
      assert(t < n, s"rule $c is vacuous: never false on $n docs")
    }
  }

  test("every Gopher rule verdict column takes both values on the fixture") {
    val df = graft.SparkEntry.queries("q_gopher_quality")(spark, sf)
    bothValues(df, Seq("r_word_count", "r_mean_word_len", "r_alpha_words",
      "r_symbol_ratio", "r_bullet_lines", "r_ellipsis_lines", "r_dup_lines",
      "r_stopwords", "keep"))
  }

  test("every C4 rule counter takes both values on the fixture") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("q_c4_clean")(spark, sf)
    bothValues(df, Seq("has_lorem", "has_brace", "keep"))
    // the per-LINE rules (terminal period, ≥5 words, no 'javascript')
    // aggregate into n_kept — they fire iff some doc loses lines while
    // some doc keeps lines
    val r = df.agg(
      sum((col("n_kept") < col("n_lines")).cast("long")).as("dropped_some"),
      sum((col("n_kept") === col("n_lines")).cast("long")).as("kept_all")).collect()(0)
    assert(r.getAs[Long]("dropped_some") > 0, "line rules never dropped a line")
    assert(r.getAs[Long]("kept_all") > 0, "line rules dropped lines from every doc")
    // the lose-EVERY-line edge exists only at sf0.001 on the shipped
    // fixtures (2 docs there, 0 at sf0.01) — pin it where it lives
    val r001 = graft.SparkEntry.queries("q_c4_clean")(spark, "/root/testdata/sf0.001")
      .agg(sum((col("n_kept") === 0).cast("long")).as("kept_none")).collect()(0)
    assert(r001.getAs[Long]("kept_none") > 0,
      "no doc loses every line at sf0.001 — the all-dropped edge is unexercised")
  }
}
