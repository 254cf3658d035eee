// simulates the driver's smoke: a session WITHOUT any graft confs
package graft
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show(5, false)
    println("ENTRY_ROWS=" + df.count())
    spark.stop()
  }
}
