package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._

class TopKSuite extends SparkSpec {
  import spark.implicits._

  test("custom top-k operator matches the window formulation") {
    val df = (1 to 1000).map(i => (s"g${i % 7}", i, (i * 37 % 1000).toDouble))
      .toDF("g", "id", "score").repartition(4)
    val native = TopKPerKey(df, Seq("g"), Seq(col("score").desc, col("id").asc), 3)
      .select("g", "id", "score").orderBy("g", "id")
      .as[(String, Int, Double)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("g", "id", "score").orderBy("g", "id")
      .as[(String, Int, Double)].collect().toSeq
    assert(native == windowed)
  }

  test("k larger than group keeps whole groups; ascending order works") {
    val df = Seq(("a", 3), ("a", 1), ("b", 2)).toDF("g", "v")
    val out = TopKPerKey(df, Seq("g"), Seq(col("v").asc), 10)
      .orderBy("g", "v").as[(String, Int)].collect().toSeq
    assert(out == Seq(("a", 1), ("a", 3), ("b", 2)))
    val top1 = TopKPerKey(df, Seq("g"), Seq(col("v").asc), 1)
      .orderBy("g").as[(String, Int)].collect().toSeq
    assert(top1 == Seq(("a", 1), ("b", 2)))
  }

  test("plans partial -> exchange -> final (shuffle pruned to k per key per partition)") {
    val df = (1 to 100).map(i => (i % 3, i)).toDF("g", "v").repartition(4)
    val plan = TopKPerKey(df, Seq("g"), Seq(col("v").asc), 2)
      .queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2, s"expected two phases:\n$plan")
    assert(plan.contains("Exchange"), s"expected an exchange between phases:\n$plan")
    // and no sort anywhere — the whole point vs the window formulation
    assert(!plan.contains("Sort "), s"top-k must not sort:\n$plan")
  }

  test("participates in whole-stage codegen (blocking-operator pattern)") {
    val df = (1 to 100).map(i => (i % 3, i)).toDF("g", "v").repartition(4)
    val out = TopKPerKey(df, Seq("g"), Seq(col("v").asc), 2)
    assert(out.collect().length == 6)
    // after execution, fused stages print as *(n); both phases must be
    // inside a WholeStageCodegen span, not running as iterator fallbacks
    val plan = out.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) TopKPerKey".r.findAllIn(plan).size >= 2,
      s"TopKPerKey not fused into whole-stage codegen:\n$plan")
  }

  test("generated code COMPILES when the child defers expression code") {
    // Regression: a child whose output vars carry deferred expression
    // code (Project computing a score over a join) used to make the
    // fused stage emit the same locals twice — janino rejected it and
    // the stage silently fell back to interpreted execution. Compile
    // the generated source directly so the failure is loud again.
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    // AQE wraps codegen stages in QueryStageExec nodes that hide them
    // from collect(); plan without it so the stages are inspectable
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probes = (1 to 5).map(i => (i, Array.fill(4)(i.toDouble))).toDF("src", "va")
      val cands = (1 to 50).map(i => (i, Array.fill(4)(1.0 / i))).toDF("nbr", "vb")
      val scored = broadcast(probes).crossJoin(cands)
        .filter(col("nbr") =!= col("src"))
        .select(col("src"), col("nbr"),
          round(graft.functions.VectorFunctions.cosine(col("va"), col("vb")), 6).as("sim"))
      val out = TopKPerKey(scored, Seq("src"), Seq(col("sim").desc, col("nbr").asc), 3)
      assert(out.collect().nonEmpty)
      val stages = out.queryExecution.executedPlan.collect {
        case w: WholeStageCodegenExec if w.toString.contains("TopKPerKey") => w
      }
      assert(stages.nonEmpty,
        s"no fused TopKPerKey stage:\n${out.queryExecution.executedPlan}")
      stages.foreach { st =>
        val (_, source) = st.doCodeGen()
        // throws CompileException on duplicate locals — the regression
        org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
          .compile(source)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
