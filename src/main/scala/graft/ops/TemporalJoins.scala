package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/non-equi join operators Spark's API lacks as primitives,
  * composed from shuffle-friendly building blocks (SURVEY §2.5's join
  * algebra extended for the analytics surface; no counterpart in the
  * reference — these are the training-pipeline operators a 100 TB corpus
  * needs).
  *
  * Both operators deliberately avoid theta-join physical plans
  * (BroadcastNestedLoopJoin / CartesianProduct): as-of is a union + one
  * keyed window (single shuffle, linear scan per key), range is an
  * equi-join on a derived bucket id with a residual filter. Either shape
  * survives a 1000-executor scale-up; a nested loop does not.
  */
object TemporalJoins {

  /** As-of join: for each left row, the LATEST right row at-or-before it
    * per key — "enrich each event with the most recent prior quote".
    *
    * Implementation: tag both sides, union, and take `last(payload,
    * ignoreNulls)` over a per-key window ordered by (`order`, side) with
    * right rows sorting before left rows at identical order keys. One
    * shuffle on `keys`, one sort, zero joins — the classic scalable
    * formulation (a join-based version re-shuffles per candidate and
    * explodes on hot keys).
    *
    * Semantics: a right row matches when its `order` tuple is <= the left
    * row's (ties match; pass a unique tiebreaker column in `order` for
    * strictness). Left rows with no prior right row keep null payloads
    * (left-outer). Matched payload columns come back `asof_`-prefixed.
    *
    * @param keys    equality key columns (present on both sides)
    * @param order   ordering columns (present on both sides); typically
    *                (event_time, unique_id)
    * @param payload right-side columns to carry onto the left rows
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           order: Seq[String], payload: Seq[String]): DataFrame = {
    val shared = keys ++ order
    val lRest = left.columns.toSeq.filterNot(shared.contains)
    val lT = if (lRest.isEmpty) org.apache.spark.sql.types.StructType(Nil)
      else left.select(struct(lRest.map(col): _*).as("_l")).schema("_l").dataType
    val pT = right.select(struct(payload.map(col): _*).as("_p")).schema("_p").dataType
    val lSide = left.select(
      shared.map(col) ++ Seq(
        (if (lRest.isEmpty) lit(null).cast(lT) else struct(lRest.map(col): _*)).as("_l"),
        lit(null).cast(pT).as("_p"),
        lit(1).as("_side")): _*)
    val rSide = right.select(
      shared.map(col) ++ Seq(
        lit(null).cast(lT).as("_l"),
        struct(payload.map(col): _*).as("_p"),
        lit(0).as("_side")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((order :+ "_side").map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    lSide.unionByName(rSide)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(shared.map(col) ++
        lRest.map(c => col("_l").getField(c).as(c)) ++
        payload.map(c => col("_m").getField(c).as(s"asof_$c")): _*)
  }

  /** Point-in-interval range join: `points` rows matched to every
    * `intervals` row with `lo <= point < hi`.
    *
    * Implementation: pick a bucket width near the median interval width;
    * each interval explodes to the buckets it covers (⌈width/w⌉+1 rows),
    * each point lands in exactly one bucket, and the match becomes an
    * equi-join on bucket id plus a residual bounds filter. No duplicate
    * pairs arise (a point joins through its single bucket). At scale the
    * bucket equi-join shuffles/broadcasts like any other key join; the
    * naive formulation (a theta join) degenerates to a nested loop over
    * every (point, interval) pair.
    */
  def pointInterval(points: DataFrame, intervals: DataFrame,
                    pointCol: String, loCol: String, hiCol: String,
                    bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("_b", floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("_b", explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(ib, "_b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_b")
  }
}
