package graft

// Scratch plan-dump for the r18 probedHits rewrite (not part of the
// library surface): prints the formatted physical plan of the drift
// verdict kernel over the real sf0.1 drift state.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbedHitsPlanMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensureConf(spark)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (cent0, _, index, queries) = graft.queries.VectorOps.annDriftState(spark, d)
    println("===== probedHits(index, cent0, queries, 6) =====")
    graft.queries.VectorOps.probedHits(index, cent0, queries, 6).explain("formatted")
    spark.stop()
  }
}
