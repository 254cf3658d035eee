package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Table loaders + session configuration shared by every query.
  *
  * All reads go through [[Tables.t]] so that required runtime confs are in
  * place no matter who constructed the SparkSession (the driver's smoke
  * harness builds its own).
  */
object Tables {

  /** Confs that must hold for correctness parity with the DuckDB oracle.
    * All of these are runtime-settable (no session restart needed).
    */
  def ensureConf(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.parquet stores INT64 TIMESTAMP(NANOS); Spark has no ns
    // timestamp type and rejects the file outright. Reading the raw
    // nanosecond longs keeps ordering/bucketing EXACT (bit-equal with the
    // oracle's TIMESTAMP_NS) instead of silently truncating to micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Deterministic plans at small scale, efficient at large: AQE coalesces
    // the 32 shuffle partitions when maps are tiny.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** Footer-inferred schema per table path, computed once per JVM: every
    * `spark.read.parquet(path)` without an explicit schema runs parquet
    * footer inference at plan time, and a 233-query bench session makes
    * ~1200 `t()` calls (queries × tables × warmup + 2 passes) — each one
    * re-reading the footer of an immutable file (r18 verdict task #6, the
    * batch-tail planning floor). METADATA cache only (a StructType per
    * path), never data or results: every query still computes from the
    * parquet bytes. Keyed on the full path, so different SF dirs (and any
    * test fixture at its own temp path) each infer once; the gate's
    * testdata is immutable for a session's lifetime, which is what makes
    * the cache sound. `ts` physical-form variance (nanos-as-long vs µs
    * timestamp) is per-file and therefore per-path — captured correctly. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureConf(spark)
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` has shipped in two physical forms: INT64 TIMESTAMP(NANOS)
    * (read as raw nano longs via `nanosAsLong`) and plain µs TIMESTAMP
    * (isAdjustedToUTC=false → TIMESTAMP_NTZ under the default NTZ
    * inference). Engine-side code and the DuckDB oracle agree on
    * MICROSECONDS (`ts div 1000` ↔ `epoch_us(ts)`), so normalize the
    * timestamp form back to nano longs here — `unix_micros` × 1000 is
    * exact (epoch µs ≈ 1.7e15, ×1000 is far below Long.Max), and the NTZ
    * → LTZ cast is identity under the UTC session timezone ensureConf
    * pins, matching DuckDB's naive-as-UTC `epoch_us`. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(t(s, d, "events"))

  /** Same normalization for a DataFrame read off events.parquet directly
    * (the streaming queries' staged file sources). Safe on either form. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Spread a narrow relation across the session width BEFORE a CPU-heavy
    * map pass (explode / JSON parse / guest interpreter) — but ONLY when
    * the plan actually under-parallelizes. The bench fixture's parquet
    * tables are a single row group each, so the scan plans ONE split and
    * the whole map pass runs on one core; a production multi-file table
    * (a 100 TB input has thousands of splits) already parallelizes, and
    * there an unconditional corpus-wide exchange before a map-only pass
    * is a real, avoidable cost. The partition-count probe is plan-time
    * only (`.rdd` builds the physical plan; no job runs). When `keys` are
    * given the spread is hash-partitioned on them so a downstream
    * groupBy/join on the same keys reuses the exchange. */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    val target =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.isEmpty) df.repartition(target)
    else df.repartition(target, keys: _*)
  }

  /** Exact-sum idiom: double sums are order-dependent (shuffle order is not
    * deterministic, and the oracle engine sums in its own order), so every
    * money/measure sum goes through a per-row DECIMAL cast — identical on
    * both engines — and the exact decimal total is cast back to double.
    */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Exact average: exact decimal sum divided by count, both deterministic,
    * so the double division result is bit-identical across engines. */
  def exactAvg(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double") / count(lit(1))

  /** `ts` nanos → 'yyyy-MM-dd' day string in UTC (oracle:
    * strftime(date_trunc('day', ts), '%Y-%m-%d')). SQL `div` is exact
    * integer division — `/` goes through double and loses precision at
    * 1.7e18 epoch-nanos. */
  def tsDay(tsCol: String): Column =
    expr(s"date_format(timestamp_micros($tsCol div 1000), 'yyyy-MM-dd')")

  /** `ts` nanos → 'yyyy-MM-dd HH' hour string in UTC. */
  def tsHour(tsCol: String): Column =
    expr(s"date_format(timestamp_micros($tsCol div 1000), 'yyyy-MM-dd HH')")
}
