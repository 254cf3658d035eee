package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark implementation plus
  * (optionally) the ANSI-SQL oracle that DuckDB runs over the same parquet
  * tables. Keeping both halves adjacent in source prevents column-name
  * drift — the driver's comparator sorts columns by name before hashing, so
  * every computed column must carry the same alias on both sides.
  *
  * Determinism rules applied throughout (see Tables.exactSum):
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - double sums go through per-row DECIMAL casts (order-independent);
  *  - timestamps are emitted as formatted strings or epoch integers.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), run)
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, None, run)
}
