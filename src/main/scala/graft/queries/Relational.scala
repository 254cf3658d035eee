package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage over the TPC-H-ish star schema: hash/sort
  * aggregation, multi-way joins (broadcast for dims), distinct, top-k per
  * group, semi/anti joins, set ops, scalar string/JSON functions.
  *
  * The reference engine (seliumlabs/selium) has no relational algebra at
  * all — Catalyst supplies these for free (SURVEY.md §2.5/§2.6 "absent").
  * They are included as first-class queries because a user replacing the
  * reference with this library gets them as part of the engine surface,
  * and because they exercise the scans/joins the 100 TB deployment lives on.
  *
  * Scale notes: dims (region/nation/supplier/part/customer) are broadcast —
  * at 100 TB the fact tables (lineitem/orders/events) shuffle on join keys
  * only when both sides are large; AQE handles skew.
  */
object Relational {

  /** Shared funnel-stage CTEs — q_funnel (below) and q_stream_funnel
    * (Streamish). ONE definition: the CEP machine's equals-the-batch-
    * formulation claim is only checkable while the two oracles are
    * identical, so a threshold/window edit cannot diverge them (the
    * bm25Ctes / bpeEncodeSql no-drift convention). */
  private[queries] val funnelCtes: String =
    """e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      |s AS (SELECT user_id, MIN(t) AS t0 FROM e
      |      WHERE event_type = 'signup' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.t) AS t1 FROM e
      |      JOIN s ON s.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND e.t > s.t0
      |        AND e.t <= s.t0 + 86400000000
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.t) AS t2 FROM e
      |      JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.t > c.t1
      |        AND e.t <= c.t1 + 86400000000
      |      GROUP BY e.user_id)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- Full-scan aggregation (TPC-H Q1 shape): map-side partial agg,
    // 6 groups, no shuffle pressure at any scale.
    Q("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy($("l_returnflag"), $("l_linestatus"))
        .agg(
          Tables.exactSum(col("l_quantity")).as("sum_qty"),
          Tables.exactSum(col("l_extendedprice")).as("sum_base_price"),
          Tables.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          Tables.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          Tables.exactAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($("l_returnflag"), $("l_linestatus"))
    },

    // ---- Fact-fact-dim join + agg + top-k (TPC-H Q3 shape). customer is
    // broadcast into orders; lineitem is the PROBE side of the second join
    // (the build side is the segment-filtered orders⋈customer, ~1/5 of
    // orders — broadcastable at bench scale). NOTE the hint is a hard
    // pin: Spark enforces explicit broadcast() up to the 8 GB cap rather
    // than degrading, so a 100 TB deployment DROPS the hint and lets
    // size estimates + AQE pick shuffle-vs-broadcast on the order key
    // (the hint exists here only to beat the pruned-size mis-estimate
    // below). Written `l.join(o⋈c)` deliberately: with lineitem on
    // the right, column pruning shrank its size ESTIMATE under the
    // broadcast threshold and the planner shipped the whole fact table to
    // every task — ~2× slower at sf0.1 and a scale-killer shape.
    Q("q3_top_orders",
      """SELECT o.o_orderkey,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
        |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderkey, order_day
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter($("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(broadcast(o.join(broadcast(c), o("o_custkey") === c("c_custkey"))),
          l("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderkey"), date_format(o("o_orderdate"), "yyyy-MM-dd").as("order_day"))
        .agg(Tables.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- Six-table star join (TPC-H Q5 shape): all dims broadcast, single
    // shuffle between the two fact tables.
    Q("q5_region_revenue",
      """SELECT r.r_name, n.n_name,
        |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM region r
        |JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        |GROUP BY r.r_name, n.n_name
        |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      o.join(l, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), sup("s_suppkey") === l("l_suppkey") && sup("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), n("n_nationkey") === c("c_nationkey"))
        .join(broadcast(r), r("r_regionkey") === n("n_regionkey"))
        .groupBy($("r_name"), $("n_name"))
        .agg(
          Tables.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($("r_name"), $("n_name"))
    },

    // ---- Salted skew join in the gate: event_type has 5 distinct values
    // over 100k+ rows — the pathological hot-key shape where a plain
    // shuffle join puts whole keys on single partitions. The salted path
    // (SkewOps.saltedJoin: hot side split across 8 salts, dim replicated
    // per salt) must be RESULT-IDENTICAL to the plain join the oracle
    // runs; this query proves it under the hash gate.
    Q("q_skew_join",
      """WITH dim AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_n
        |             FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, d.type_n
        |FROM events e JOIN dim d USING (event_type)
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val dim = e.groupBy(col("event_type")).agg(count(lit(1)).as("type_n"))
      graft.ops.SkewOps.saltedJoin(
          e.select(col("event_id"), col("event_type")), dim, "event_type")
        .select(col("event_id"), col("event_type"), col("type_n"))
        .orderBy(col("event_id"))
    },

    // ---- Two-dimension join volume (TPC-H Q7 shape): supplier nation ×
    // customer nation shipping volume by year.
    Q("q7_nation_volume",
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
        |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS volume
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |WHERE sn.n_name IN ('NATION_3', 'NATION_7') AND cn.n_name IN ('NATION_3', 'NATION_7')
        |GROUP BY supp_nation, cust_nation, ship_year
        |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d).filter($("n_name").isin("NATION_3", "NATION_7"))
      val sn = n.select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val cn = n.select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      l.join(broadcast(sup), sup("s_suppkey") === l("l_suppkey"))
        .join(broadcast(sn), col("sk") === sup("s_nationkey"))
        .join(o, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(c), c("c_custkey") === o("o_custkey"))
        .join(broadcast(cn), col("ck") === c("c_nationkey"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("ship_year"))
        .agg(Tables.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("volume"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
    },

    // ---- Returned-item revenue per customer, top 20 (TPC-H Q10 shape).
    Q("q10_returned_revenue",
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, n.n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).filter($("l_returnflag") === "R")
      val n = Tables.nation(s, d)
      l.join(o, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(c), c("c_custkey") === o("o_custkey"))
        .join(broadcast(n), n("n_nationkey") === c("c_nationkey"))
        .groupBy($("c_custkey"), $("c_name"), $("n_name"))
        .agg(Tables.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, $("c_custkey"))
        .limit(20)
    },

    // ---- DISTINCT aggregation.
    Q("q_distinct_segments",
      """SELECT c_mktsegment,
        |  COUNT(DISTINCT c_nationkey) AS n_nations,
        |  COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy($("c_mktsegment"))
        .agg(
          countDistinct($("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_cust"),
          Tables.exactSum(col("c_acctbal")).as("sum_bal"))
        .orderBy($("c_mktsegment"))
    },

    // ---- Top-k per group via ranking window.
    Q("q_topk_per_group",
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 5
        |ORDER BY o_orderpriority, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select($("o_orderpriority"), $("o_orderkey"), $("o_totalprice"), col("rn"))
        .orderBy($("o_orderpriority"), col("rn"))
    },

    // ---- The same top-k-per-key computed by the CUSTOM physical operator
    // (graft.plans.TopKPerKey: logical node + strategy + bounded-heap
    // exec, partial phase pruning the shuffle to ≤k rows per key per
    // partition). Hash-matching the window-formulation oracle proves the
    // operator's semantics; the window form above shuffles and sorts every
    // row, this one never sorts and shuffles O(k × keys × partitions).
    Q("q_topk_native",
      """SELECT o_orderpriority, o_orderkey, o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 5
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
      graft.plans.TopKPerKey(Tables.orders(s, d), Seq("o_orderpriority"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 5)
        .select($("o_orderpriority"), $("o_orderkey"), $("o_totalprice"))
        .orderBy($("o_orderpriority"), col("o_totalprice").desc, $("o_orderkey"))
    },

    // ---- Window navigation (lag/lead): each order sees its customer's
    // previous and next order — the offset functions as first-class
    // operators (they also back sessionize/state_fold internally).
    Q("q_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS day,
        |  lag(o_orderkey) OVER w AS prev_order,
        |  lead(o_orderkey) OVER w AS next_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($("o_custkey"))
        .orderBy($("o_orderdate"), $("o_orderkey"))
      Tables.orders(s, d)
        .select($("o_custkey"), $("o_orderkey"),
          date_format($("o_orderdate"), "yyyy-MM-dd").as("day"),
          lag($("o_orderkey"), 1).over(w).as("prev_order"),
          lead($("o_orderkey"), 1).over(w).as("next_order"))
        .orderBy($("o_custkey"), $("o_orderkey"))
    },

    // ---- ntile: spend quartiles per market segment (equal-height
    // bucketing over a total order).
    Q("q_ntile",
      """SELECT c_mktsegment, c_custkey, q
        |FROM (SELECT c_mktsegment, c_custkey, CAST(ntile(4) OVER (
        |        PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |      AS INT) AS q
        |      FROM customer)
        |WHERE q = 1
        |ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, $("c_custkey"))
      Tables.customer(s, d)
        .select($("c_mktsegment"), $("c_custkey"), ntile(4).over(w).as("q"))
        .filter(col("q") === 1)
        .orderBy($("c_mktsegment"), $("c_custkey"))
    },

    // ---- Relative-rank window functions (dense_rank / percent_rank /
    // cume_dist) over a tie-broken total order, so every rank value is
    // deterministic. Doubles rounded to 6dp: both engines compute
    // (rank−1)/(n−1) and rows≤/n in IEEE doubles, but rounding keeps the
    // parity structural rather than expression-shape dependent.
    Q("q_rank_fns",
      """SELECT c_mktsegment, c_custkey,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, $("c_custkey"))
      Tables.customer(s, d)
        .select($("c_mktsegment"), $("c_custkey"),
          dense_rank().over(w).cast("long").as("drank"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy($("c_mktsegment"), $("c_custkey"))
    },

    // ---- Correlated scalar subquery shape: orders above their own
    // customer's average order value. Declaratively: a per-customer
    // aggregate broadcast back onto the fact — the plan a correlated
    // subquery decorrelates to anyway. The comparison is price×n > total
    // with a DECIMAL-exact total (a raw double AVG is addition-order
    // dependent — both engines would be unstable near ties).
    Q("q_above_avg",
      """WITH t AS (SELECT o_custkey AS ck,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n FROM orders GROUP BY ck)
        |SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders JOIN t ON o_custkey = ck
        |WHERE o_totalprice * n > total
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val avgs = o.groupBy(col("o_custkey").as("ck"))
        .agg(Tables.exactSum($("o_totalprice")).as("total"),
          count(lit(1)).as("n"))
      // avgs is one row per CUSTOMER (fact-derived, unbounded at scale) —
      // un-hinted: AQE broadcasts at bench scale, shuffles at 100 TB
      o.join(avgs, col("o_custkey") === col("ck"))
        .filter($("o_totalprice") * col("n") > col("total"))
        .select($("o_orderkey"), $("o_custkey"), $("o_totalprice"))
        .orderBy($("o_orderkey"))
    },

    // ---- Semi join (EXISTS).
    Q("q_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val urgent = Tables.orders(s, d).filter($("o_orderpriority") === "1-URGENT")
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select($("c_custkey"), $("c_name"))
        .orderBy($("c_custkey"))
    },

    // ---- Anti join (NOT EXISTS).
    Q("q_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val big = Tables.orders(s, d).filter($("o_totalprice") > 300000)
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select($("c_custkey"), $("c_name"))
        .orderBy($("c_custkey"))
    },

    // ---- Doubly-correlated EXISTS / NOT EXISTS over a self-joined fact
    // table (TPC-H Q21 shape, re-keyed to this schema's columns): for
    // 'F' orders, a supplier "waited alone" when it shipped a line > 60
    // days after the order date, the order had other suppliers, and no
    // OTHER supplier was late on it. Both correlations decorrelate into
    // fact-fact self-joins on l_orderkey: late⋈semi(lineitem) then
    // ⋈anti(late). Scale shape: all three legs hash on the SAME key
    // (l_orderkey), so the probe-side exchanges line up, and the two
    // `late` occurrences are identical subtrees → Catalyst's
    // ReuseExchange serves the anti leg from the semi leg's shuffle
    // files instead of rescanning lineitem⋈orders. The non-equi
    // suppkey<>suppkey conjunct stays a cheap residual on the hash
    // match. Supplier dim broadcasts.
    Q("q21_late_suppliers",
      """WITH late AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val ordersF = Tables.orders(s, d).filter($("o_orderstatus") === "F")
        .select($("o_orderkey"), $("o_orderdate"))
      val late = li.select($("l_orderkey"), $("l_suppkey"), $("l_shipdate"))
        .join(ordersF, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select($("l_orderkey"), $("l_suppkey"))
        .distinct()
      val others = li.select(col("l_orderkey").as("o2_orderkey"),
        col("l_suppkey").as("o2_suppkey"))
      val lateOthers = late.select(col("l_orderkey").as("o3_orderkey"),
        col("l_suppkey").as("o3_suppkey"))
      late
        .join(others, col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("o3_orderkey") &&
          col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
        .join(broadcast(Tables.supplier(s, d).select($("s_suppkey"), $("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy($("s_name")).agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, $("s_name"))
        .limit(20)
    },

    // ---- Correlated scalar subquery against the fact table ITSELF
    // (TPC-H Q17 shape): lines whose quantity is below 20% of their
    // part's average quantity. Decorrelates into a per-partkey aggregate
    // joined back to the detail rows — no window, no per-part subquery
    // execution. The aggregate side is map-side-combined BEFORE its
    // exchange, so its shuffle carries one row per (partition, partkey),
    // a rounding error next to the detail shuffle; at test scale AQE
    // then broadcasts the finished thresh relation onto the detail scan
    // (zero detail shuffles), and at 100 TB it degrades to the
    // co-partitioned join on l_partkey both sides already hash to.
    // The threshold (0.2 × avg of integral doubles) is exact in IEEE
    // arithmetic in any summation order, so the < comparison is
    // engine-stable. Part dim broadcasts for the final brand rollup.
    Q("q17_small_quantity",
      """WITH a AS (SELECT l_partkey, 0.2 * avg(l_quantity) AS thresh
        |           FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_rev,
        |  COUNT(*) AS n_lines
        |FROM lineitem l JOIN a ON l.l_partkey = a.l_partkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_quantity < a.thresh
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select($("l_partkey"), $("l_quantity"), $("l_extendedprice"))
      val thresh = li.groupBy($("l_partkey"))
        .agg((lit(0.2) * avg($("l_quantity"))).as("thresh"))
        .select(col("l_partkey").as("t_partkey"), col("thresh"))
      li.join(thresh, col("l_partkey") === col("t_partkey"))
        .filter($("l_quantity") < col("thresh"))
        .join(broadcast(Tables.part(s, d).select($("p_partkey"), $("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy($("p_brand"))
        .agg(Tables.exactSum(col("l_extendedprice")).as("small_rev"),
          count(lit(1)).as("n_lines"))
        .orderBy($("p_brand"))
    },

    // ---- Conditional aggregation over a join (TPC-H Q14 shape): promo
    // revenue share in a ship-date quarter. The date range pushes into
    // the lineitem parquet scan; part broadcasts; the CASE folds into the
    // map-side partial aggregate so the exchange carries two partial
    // decimal sums and a count, not rows. Both engines sum identical
    // per-row DECIMAL(18,4) casts, so the share divides two exact totals
    // and is bit-stable.
    Q("q14_promo_share",
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |    ELSE 0 END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |         AS DOUBLE) AS promo_share,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin) { (s, d) =>
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d).select($("p_partkey"), $("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) * sum(when(col("p_type").startsWith("PROMO"), rev)
            .otherwise(lit(0))).cast("double")
            / sum(rev).cast("double")).as("promo_share"),
          count(lit(1)).as("n_lines"))
    },

    // ---- Scalar subquery + correlated NOT EXISTS combined (TPC-H Q22
    // shape): high-balance customers with no urgent orders, rolled up by
    // nation. The global average is a broadcast scalar (computed as an
    // exact decimal sum / count so the > threshold is engine-stable on
    // boundary balances); the NOT EXISTS decorrelates to a left-anti
    // join against the filtered orders, probing only the ~6% of
    // customers that survive the balance gate.
    Q("q22_idle_customers",
      """WITH avg_bal AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |           / COUNT(*) AS ab
        |  FROM customer WHERE c_acctbal > 0.00),
        |eligible AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer, avg_bal
        |  WHERE c_acctbal > ab
        |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT'))
        |SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM eligible GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val avgBal = c.filter($("c_acctbal") > 0.0)
        .agg(Tables.exactAvg(col("c_acctbal")).as("ab"))
      val urgent = Tables.orders(s, d)
        .filter($("o_orderpriority") === "1-URGENT").select($("o_custkey"))
      c.crossJoin(broadcast(avgBal))
        .filter($("c_acctbal") > col("ab"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy($("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          Tables.exactSum(col("c_acctbal")).as("totacctbal"))
        .orderBy($("c_nationkey"))
    },

    // ---- National market share over a 5-way join (TPC-H Q8 shape): one
    // nation's fraction of a part-type's revenue per year. The fact
    // table crosses exactly one exchange (the final year rollup) — the
    // type filter prunes at the part scan, all four dims broadcast, the
    // numerator CASE folds into the map-side partial, and the share
    // divides two exact decimal totals in identical op order on both
    // engines.
    Q("q8_market_share",
      """WITH rev AS (
        |  SELECT year(o.o_orderdate) AS yr,
        |    CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
        |    n.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  WHERE p.p_type = 'STANDARD' AND year(o.o_orderdate) IN (1996, 1997))
        |SELECT yr,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
        |       AS DOUBLE) / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
        |  COUNT(*) AS n
        |FROM rev GROUP BY yr ORDER BY yr""".stripMargin) { (s, d) =>
      val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select($("o_orderkey"), $("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(year($("o_orderdate")).isin(1996, 1997))
        .join(broadcast(Tables.part(s, d).filter($("p_type") === "STANDARD")
          .select($("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d).select($("s_suppkey"), $("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d).select($("n_nationkey"), $("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(year($("o_orderdate")).as("yr"))
        .agg(
          (Tables.exactSum(when(col("n_name") === "NATION_1", volume)
            .otherwise(lit(0)), 4)
            / Tables.exactSum(volume, 4)).as("mkt_share"),
          count(lit(1)).as("n"))
        .orderBy(col("yr"))
    },

    // ---- Profit by nation and year over the full join tree (TPC-H Q9
    // shape; supply cost approximated from p_retailprice — the schema
    // carries no partsupp). Same scale posture as q8: dims broadcast,
    // per-row amount computed once in the scan projection (identical
    // double op order both engines, then a per-row decimal cast so the
    // sums are order-independent), one exchange for the (nation, year)
    // rollup.
    Q("q9_nation_profit",
      """WITH pr AS (
        |  SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
        |    CAST(l.l_extendedprice * (1 - l.l_discount)
        |         - 0.4 * p.p_retailprice * l.l_quantity AS DECIMAL(18,4)) AS amount
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey)
        |SELECT nation, yr, CAST(SUM(amount) AS DOUBLE) AS profit, COUNT(*) AS n
        |FROM pr GROUP BY nation, yr ORDER BY nation, yr DESC""".stripMargin) { (s, d) =>
      val amount = col("l_extendedprice") * (lit(1) - col("l_discount")) -
        lit(0.4) * col("p_retailprice") * col("l_quantity")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select($("o_orderkey"), $("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d).select($("p_partkey"), $("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d).select($("s_suppkey"), $("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d).select($("n_nationkey"), $("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year($("o_orderdate")).as("yr"))
        .agg(Tables.exactSum(amount, 4).as("profit"), count(lit(1)).as("n"))
        .orderBy(col("nation"), col("yr").desc)
    },

    // ---- Outer join with null-group handling: every customer, including
    // the order-less, with order stats.
    Q("q_outer_join",
      """SELECT c.c_custkey,
        |  COUNT(o.o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(coalesce(o.o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
        |  CASE WHEN COUNT(o.o_orderkey) = 0 THEN 1 ELSE 0 END AS inactive
        |FROM customer c
        |LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter($("o_totalprice") > 300000)
      c.join(o, o("o_custkey") === c("c_custkey"), "left")
        .groupBy($("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          Tables.exactSum(coalesce(col("o_totalprice"), lit(0))).as("total_spent"),
          when(count(col("o_orderkey")) === 0, 1).otherwise(0).as("inactive"))
        .orderBy($("c_custkey"))
    },

    // ---- CUBE grouping sets (all combinations; Catalyst freebie exposed).
    Q("q_cube",
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube($("l_returnflag"), $("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce($("l_returnflag"), lit("ALL")).as("rf"),
          coalesce($("l_linestatus"), lit("ALL")).as("ls"),
          col("n"))
        .orderBy(col("rf"), col("ls"))
    },

    // ---- Explicit GROUPING SETS with grouping() disambiguation: an
    // ASYMMETRIC set list ((rf,ls), (ls), ()) that neither ROLLUP nor
    // CUBE can express, plus the grouping() flags that distinguish a
    // subtotal NULL from a genuine NULL in the data — the part of the
    // grouping-sets surface q_cube/q_rollup don't exercise. One expanded
    // aggregate (each input row replicated once per matching set,
    // map-side combined) — no per-set re-scan.
    Q("q_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, rf, ls""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq($("l_returnflag"), $("l_linestatus")), Seq($("l_linestatus")), Seq()),
          $("l_returnflag"), $("l_linestatus"))
        .agg(grouping($("l_returnflag")).cast("int").as("g_rf"),
          grouping($("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("n"), Tables.exactSum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce($("l_returnflag"), lit("ALL")).as("rf"),
          coalesce($("l_linestatus"), lit("ALL")).as("ls"),
          col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
        .orderBy(col("g_rf"), col("g_ls"), col("rf"), col("ls"))
    },

    // ---- Set operation: EXCEPT (distinct semantics on both engines).
    Q("q_except_setop",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val building = Tables.customer(s, d)
        .filter($("c_mktsegment") === "BUILDING").select($("c_custkey"))
      val finished = Tables.orders(s, d)
        .filter($("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey"))
      building.except(finished).orderBy($("c_custkey"))
    },

    // ---- INTERSECT (the other set operator; EXCEPT above): customers in
    // the BUILDING segment who DO have a finished order.
    Q("q_intersect_setop",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val building = Tables.customer(s, d)
        .filter($("c_mktsegment") === "BUILDING").select($("c_custkey"))
      val finished = Tables.orders(s, d)
        .filter($("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey"))
      building.intersect(finished).orderBy($("c_custkey"))
    },

    // ---- Ordered string aggregation (deterministic: sorted before join).
    Q("q_string_agg",
      """SELECT c_mktsegment,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names,
        |  COUNT(*) AS n
        |FROM (SELECT c_mktsegment, c_name FROM customer WHERE c_custkey <= 50)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .filter($("c_custkey") <= 50)
        .groupBy($("c_mktsegment"))
        .agg(
          concat_ws(",", array_sort(collect_list($("c_name")))).as("names"),
          count(lit(1)).as("n"))
        .orderBy($("c_mktsegment"))
    },

    // ---- Pivot: event counts per day spread across type columns. The
    // oracle expresses the same reshaping portably with conditional sums.
    Q("q_pivot",
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(Tables.tsDay("ts").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("day"))
    },

    // ---- HLL++ approximate distinct — the bounded-memory COUNT(DISTINCT)
    // at 100 TB (the sketch is mergeable map-side). Sketch internals
    // differ between engines, so the oracle checks the sketch's ERROR
    // CONTRACT instead of its value: the query emits the exact distinct
    // count (SQL-predictable) plus `hll_ok` = |approx − exact| ≤ 6%·exact
    // (3× the 2% target rsd); DuckDB asserts the counts and `true`. A
    // drifting or broken sketch flips the boolean and hash-mismatches.
    // (The exact countDistinct here is the verification harness, not the
    // scale path — the operator under test is approx_count_distinct.)
    Q("q_approx_distinct",
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  COUNT(*) AS n, true AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("approx") - col("exact_users")).cast("double")
            <= col("exact_users") * 0.06).as("hll_ok"))
        .orderBy(col("event_type"))
    },

    // ---- Scalar string functions (SURVEY §2.7): lower/length/split/LIKE/
    // trim/concat, all codegen'd built-ins.
    Q("q_scalar_string",
      """SELECT p_partkey,
        |  lower(p_name) AS name_lc,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS has_red,
        |  trim(concat(p_brand, ' ', p_type)) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        $("p_partkey"),
        lower($("p_name")).as("name_lc"),
        length($("p_name")).as("name_len"),
        element_at(split($("p_name"), " "), 1).as("first_word"),
        when($("p_name").contains("red"), 1).otherwise(0).as("has_red"),
        trim(concat($("p_brand"), lit(" "), $("p_type"))).as("brand_type"))
        .orderBy($("p_partkey"))
    },

    // ---- ROLLUP grouping sets (absent in the reference, free from
    // Catalyst — SURVEY §2.4 "absent" row, exposed as engine surface).
    // NULL group markers are rendered as 'ALL' so the oracle compare is
    // well-defined on the sorted string columns.
    Q("q_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .rollup($("o_orderstatus"), $("o_orderpriority"))
        .agg(count(lit(1)).as("n"), Tables.exactSum(col("o_totalprice")).as("total"))
        .select(
          coalesce($("o_orderstatus"), lit("ALL")).as("status"),
          coalesce($("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    },

    // ---- Running window aggregate (frame-based, not just ranking).
    Q("q_running_sum",
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_value,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS k
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($("user_id")).orderBy($("event_id"))
      Tables.events(s, d).select(
        $("user_id"), $("event_id"),
        sum(col("value").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_value"),
        row_number().over(w).cast("long").as("k"))
        .orderBy($("user_id"), $("event_id"))
    },

    // ---- Event-time RANGE frame: per-user trailing-1-hour count and
    // exact-decimal sum — the VALUE-bounded window class (ROWS frames are
    // q_running_sum above). Same-microsecond ties are all in-frame
    // regardless of intra-tie order, so the frame content is
    // deterministic; the DECIMAL cast keeps the sum order-independent.
    // Scale: partitioned by user key — a pathologically hot key is
    // re-bucketed by coarse time range first (the q_seq_pack note), which
    // keeps frames intact because range frames only look backward within
    // one hour.
    Q("q_time_range_frame",
      """SELECT user_id, event_id, CAST(t AS BIGINT) AS t,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY t
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, t, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy($("user_id")).orderBy($("t"))
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables.events(s, d)
        .select($("user_id"), $("event_id"), expr("ts div 1000").as("t"),
          $("value"))
        .select($("user_id"), $("event_id"), $("t"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("sum_1h"))
        .orderBy($("user_id"), $("t"), $("event_id"))
    },

    // ---- Gap fill + LOCF resampling: densify each user's daily series
    // over the full calendar spine and carry the last observation
    // forward through the holes (0 before the first) — the resampling
    // step monitoring/feature pipelines run before any rolling math.
    // The spine is a 30-row broadcast literal; observed daily sums
    // partial-combine before their shuffle; the fill window runs per
    // key over |days| rows (never the raw feed). Exact-decimal daily
    // sums make the carried values engine-bit-stable.
    Q("q_gap_fill",
      """WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 10),
        |days AS (SELECT strftime(d, '%Y-%m-%d') AS day
        |         FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
        |                              INTERVAL 1 DAY) t(d)),
        |obs AS (SELECT user_id,
        |          strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |        FROM events WHERE user_id < 10 GROUP BY 1, 2),
        |g AS (SELECT u.user_id, days.day, obs.v FROM u CROSS JOIN days
        |      LEFT JOIN obs ON obs.user_id = u.user_id AND obs.day = days.day)
        |SELECT user_id, day, (v IS NOT NULL) AS observed,
        |  COALESCE(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    0.0) AS filled
        |FROM g ORDER BY user_id, day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter($("user_id") < 10)
      val users = ev.select($("user_id")).distinct()
      val days = s.range(1).select(explode(expr(
        "transform(sequence(to_date('2024-01-01'), to_date('2024-01-30')), " +
          "d -> date_format(d, 'yyyy-MM-dd'))")).as("day"))
      val obs = ev.groupBy($("user_id"), Tables.tsDay("ts").as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      val w = Window.partitionBy($("user_id")).orderBy($("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      users.crossJoin(broadcast(days))
        .join(obs, Seq("user_id", "day"), "left")
        .select($("user_id"), $("day"), col("v").isNotNull.as("observed"),
          coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0.0))
            .as("filled"))
        .orderBy($("user_id"), $("day"))
    },

    // ---- Cohort retention: users grouped by first-purchase week, then
    // the fraction still purchasing at each day offset — the standard
    // product-analytics matrix. First-touch is a map-side-combinable MIN
    // per user; day offsets are exact integer µs division; the per-user
    // first-touch table joins the feed un-hinted (fact-scale — AQE
    // broadcasts at bench scale, shuffles beyond the cap at 100 TB).
    Q("q_cohort_retention",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events
        |           WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, MIN(t) AS first_t FROM e GROUP BY user_id),
        |c AS (SELECT user_id, first_t,
        |        strftime(date_trunc('week', make_timestamp(first_t)),
        |                 '%Y-%m-%d') AS cohort
        |      FROM f),
        |n AS (SELECT cohort, COUNT(*) AS cohort_n FROM c GROUP BY cohort),
        |a AS (SELECT DISTINCT c.cohort, e.user_id,
        |        CAST((e.t - c.first_t) // 86400000000 AS INT) AS dayoff
        |      FROM e JOIN c USING (user_id))
        |SELECT a.cohort, a.dayoff, CAST(COUNT(*) AS BIGINT) AS n_active,
        |  n.cohort_n,
        |  round(CAST(COUNT(*) AS DOUBLE) / n.cohort_n, 6) AS retention
        |FROM a JOIN n ON n.cohort = a.cohort
        |GROUP BY a.cohort, a.dayoff, n.cohort_n
        |ORDER BY a.cohort, a.dayoff""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).filter($("event_type") === "purchase")
        .select($("user_id"), expr("ts div 1000").as("t"))
      val c = e.groupBy($("user_id")).agg(min($("t")).as("first_t"))
        .withColumn("cohort", date_format(
          date_trunc("week", expr("timestamp_micros(first_t)")), "yyyy-MM-dd"))
      val n = c.groupBy($("cohort")).agg(count(lit(1)).as("cohort_n"))
      val a = e.join(c, "user_id")
        .select($("cohort"), $("user_id"),
          expr("(t - first_t) div 86400000000").cast("int").as("dayoff"))
        .distinct()
      a.join(n, "cohort")
        .groupBy($("cohort"), $("dayoff"), $("cohort_n"))
        .agg(count(lit(1)).as("n_active"))
        .select($("cohort"), $("dayoff"), $("n_active"), $("cohort_n"),
          round($("n_active").cast("double") / $("cohort_n"), 6).as("retention"))
        .orderBy($("cohort"), $("dayoff"))
    },

    // ---- Ordered funnel with conversion windows: signup → first click
    // within 24 h → first purchase within 24 h of that click. Each stage
    // is a MIN-per-user aggregate gated on the previous stage's time
    // (never a per-user event sort); the per-user stage tables join the
    // feed un-hinted. One summary row.
    Q("q_funnel",
      s"""WITH $funnelCtes
        |SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
        |  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
        |  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
        |  round(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
        |    / (SELECT COUNT(*) FROM s), 6) AS conv_click,
        |  round(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
        |    / (SELECT COUNT(*) FROM c), 6) AS conv_purchase""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select($("user_id"), $("event_type"), expr("ts div 1000").as("t"))
      val sStage = e.filter($("event_type") === "signup")
        .groupBy($("user_id")).agg(min($("t")).as("t0"))
      val cStage = e.filter($("event_type") === "click").join(sStage, "user_id")
        .filter($("t") > $("t0") && $("t") <= $("t0") + 86400000000L)
        .groupBy($("user_id")).agg(min($("t")).as("t1"))
      val pStage = e.filter($("event_type") === "purchase").join(cStage, "user_id")
        .filter($("t") > $("t1") && $("t") <= $("t1") + 86400000000L)
        .groupBy($("user_id")).agg(min($("t")).as("t2"))
      sStage.agg(count(lit(1)).as("n_signup"))
        .crossJoin(cStage.agg(count(lit(1)).as("n_click")))
        .crossJoin(pStage.agg(count(lit(1)).as("n_purchase")))
        .select($("n_signup"), $("n_click"), $("n_purchase"),
          round($("n_click").cast("double") / $("n_signup"), 6).as("conv_click"),
          round($("n_purchase").cast("double") / $("n_click"), 6).as("conv_purchase"))
    },

    // ---- JSON extraction from the events.props column (SURVEY §2.7 JSON
    // row; reference: serde_json in examples/rest-api/src/lib.rs:113-121).
    Q("q_json_extract",
      """SELECT CAST(k % 10 AS INT) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k, value
        |      FROM events)
        |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      // JSON parsing is the CPU hog here (9 CPU-s single-threaded at
      // sf0.1 on the one-row-group bench file) — spread the two raw
      // columns so the parse runs post-exchange on all cores;
      // Tables.spread no-ops once the scan has real splits.
      Tables.spread(Tables.events(s, d)
        .select($("props"), $("value")))
        .select(get_json_object($("props"), "$.k").cast("int").as("k"), $("value"))
        .groupBy(($("k") % 10).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"), Tables.exactSum(col("value")).as("sum_value"))
        .orderBy($("bucket"))
    }
  )

  private def $(name: String) = col(name)
}
