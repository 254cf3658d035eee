package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 with a SQL-expressible batch equivalent
  * appears in [[queries]] with a DuckDB oracle in [[oracleSql]]; streaming-
  * only and hash-dependent operators appear without an oracle (driver
  * records a rows-only check) and are additionally covered by ScalaTest in
  * src/test/scala/graft.
  */
object SparkEntry {

  import graft.{queries => qs}

  /** All verifiable queries, grouped by area. */
  val registry: Seq[Q] =
    qs.Relational.all ++
    qs.TpchCanon.all ++
    qs.TemporalOps.all ++
    qs.Streamish.all ++
    qs.TextOps.all ++
    qs.CurationOps.all ++
    qs.UnigramOps.all ++
    qs.DedupOps.all ++
    qs.PrivacyOps.all ++
    qs.RetrievalOps.all ++
    qs.VectorOps.all ++
    qs.MultimodalOps.all ++
    qs.CodecOps.all ++
    qs.WasmOps.all

  // A duplicate name would silently shadow an earlier query in the
  // `queries` Map — its oracle entry would vanish from the correctness
  // gate without anything turning red (this happened in round 11 with two
  // q_stratified_sample definitions). Fail loudly at class-init instead.
  private[graft] def requireUniqueNames(qs: Seq[Q]): Unit = {
    val dups = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names in registry: ${dups.mkString(", ")}")
  }
  requireUniqueNames(registry)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The log-analyser slice (SURVEY §7.2 M2): tumbling day window over the
    * events stream, severity counts, threshold alert. */
  def entry(spark: SparkSession): DataFrame = {
    Tables.ensureConf(spark)
    Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(Tables.tsDay("ts").as("day"))
      .agg(
        count(when(col("event_type") === "error", 1)).as("n_error"),
        count(lit(1)).as("n_total"))
      .filter(col("n_error") >= 1)
      .withColumn("alert", format_string("%d errors observed in window", col("n_error")))
      .orderBy(col("day"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
