package graft
import org.apache.spark.sql.SparkSession
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm + timed
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        println(f"PROF $name run$i ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
