package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic sources (S7): the reference's demo generators as Spark
  * sources. The LCG reproduces examples/data-pipeline/src/lib.rs:17-33
  * exactly (i32 wrapping `state = state * 1103515245 + 12345`, seed -1) so
  * golden outputs of the map/filter/union pipeline are reproducible
  * bit-for-bit.
  */
object Generators {

  /** Reference LCG next-state (wrapping i32 arithmetic). */
  def lcgNext(state: Int): Int = state * 1103515245 + 12345

  /** First n LCG values after the seed (the emitted stream). */
  def lcgSequence(n: Int, seed: Int = -1): IndexedSeq[Int] = {
    var s = seed
    IndexedSeq.fill(n) { s = lcgNext(s); s }
  }

  /** Batch form: n LCG values as a DataFrame (value, idx). Generated
    * distributively via sequence+transform — the closed form of an LCG is
    * not worth it at this size; each partition replays from the seed
    * (cheap: ints), so no driver-side materialization. */
  def lcgBatch(spark: SparkSession, n: Int, seed: Int = -1): DataFrame = {
    import spark.implicits._
    lcgSequence(n, seed).zipWithIndex.toDF("value", "idx")
  }

  /** Streaming form: the built-in rate source mapped through the LCG
    * applied positionally — `rate` supplies (timestamp, value=row index),
    * the LCG state for index i is iterate(seed, i+1), via the aggregate
    * HOF over a bounded range. i32 wrapping is emulated in long arithmetic
    * (pmod recentering): ANSI mode would throw on a real int overflow,
    * and the reference semantics ARE the wraparound. */
  def lcgStream(spark: SparkSession, rowsPerSecond: Int = 2, seed: Int = -1): DataFrame = {
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
    def wrap(x: org.apache.spark.sql.Column) =
      pmod(x + lit(2147483648L), lit(4294967296L)) - lit(2147483648L)
    stream.select(col("timestamp"), col("value").as("idx"),
      aggregate(
        sequence(lit(0L), col("value")),
        lit(seed.toLong),
        (acc, _) => wrap(acc * lit(1103515245L) + lit(12345L))).as("value"))
  }
}
