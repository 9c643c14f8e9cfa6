package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Second relational batch: multi-dimensional aggregation (rollup / cube /
  * grouping sets), set operators, subqueries (IN / scalar), window-argmax,
  * exact percentiles. Some run through `spark.sql` over temp views to
  * exercise the SQL parse→analyze→optimize→execute lifecycle end-to-end
  * (the reference's one real SQL entry point, SURVEY.md §3.3).
  */
object AdvancedQueries {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val all: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    // ROLLUP: hierarchical subtotals; grouping nulls disambiguated with
    // COALESCE sentinels so null-ordering dialects can't disagree.
    QuerySpec(
      "q34_rollup",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n"), col("sum_qty"))
          .orderBy("rf", "ls"),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             |  COALESCE(l_linestatus, 'ALL') AS ls,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    // ------------------------------------------------------------------
    // CUBE: all grouping combinations.
    QuerySpec(
      "q35_cube",
      (s, dir) =>
        Tables.orders(s, dir)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("revenue"))
          .orderBy("status", "priority"),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             |  COALESCE(o_orderpriority, 'ALL') AS priority,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // ------------------------------------------------------------------
    // INTERSECT / EXCEPT set operators.
    QuerySpec(
      "q36_intersect",
      (s, dir) =>
        Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
          .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    QuerySpec(
      "q37_except",
      (s, dir) =>
        Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
          .except(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    // ------------------------------------------------------------------
    // IN-subquery (planned as a left-semi join).
    QuerySpec(
      "q38_in_subquery",
      (s, dir) => {
        val rich = Tables.customer(s, dir)
          .filter(col("c_acctbal") > 9000.0).select(col("c_custkey"))
        Tables.orders(s, dir)
          .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
             |ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Scalar subquery through the FULL spark.sql lifecycle (parse →
    // analyze → optimize → execute over a temp view).
    QuerySpec(
      "q39_scalar_subquery",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
        s.sql(
          """SELECT o_orderkey, o_totalprice FROM graft_orders
            |WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM graft_orders)
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // GROUPING SETS via spark.sql.
    QuerySpec(
      "q40_grouping_sets",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("graft_lineitem")
        s.sql(
          """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
            |  COALESCE(l_linestatus, 'ALL') AS ls,
            |  COUNT(*) AS n
            |FROM graft_lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY rf, ls""".stripMargin)
      },
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             |  COALESCE(l_linestatus, 'ALL') AS ls,
             |  COUNT(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY rf, ls""".stripMargin)),

    // ------------------------------------------------------------------
    // Argmax per group via window (deterministic tie-break on both sides).
    QuerySpec(
      "q41_argmax_order",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderpriority"), col("o_orderkey").as("best_order"),
            col("o_totalprice").as("best_price"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, o_orderkey AS best_order, o_totalprice AS best_price
             |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
             |WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // As-of join (an operator Spark lacks natively; graft.ops.AsOfJoin is
    // the one-shuffle union+window composition): for each purchase, the
    // most recent prior-or-equal signup of the same user. Oracle uses
    // DuckDB's native ASOF LEFT JOIN.
    QuerySpec(
      "q43_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("ts_us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_us"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts_us").as("signup_us"))
        graft.ops.AsOfJoin.backward(purchases, signups, "user_id",
          "ts_us", "signup_us", Seq("signup_us"))
          .select(col("event_id"), col("user_id"), col("ts_us"), col("signup_us"))
          .sortWithinPartitions("event_id")
      },
      Some("""SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
             |  epoch_us(s.ts) AS signup_us
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
             |  ON p.user_id = s.user_id AND p.ts >= s.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // FORWARD as-of join (AsOfJoin.forward): q43's complement — for each
    // signup, the user's FIRST purchase at-or-after it (time-to-convert).
    // Same union + one-window-pass plan, window looking forward. DuckDB
    // replays it natively: ASOF LEFT JOIN with s.ts <= p.ts picks the
    // nearest following row.
    QuerySpec(
      "q94_asof_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts_ns div 1000").as("ts_us"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("event_id"), col("ts_us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us").as("purchase_us"))
        graft.ops.AsOfJoin.forward(signups, purchases, "user_id",
          "ts_us", "purchase_us", Seq("purchase_us"))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("purchase_us"),
            (col("purchase_us") - col("ts_us")).as("us_to_convert"))
          .sortWithinPartitions("event_id")
      },
      Some("""SELECT g.event_id, g.user_id, epoch_us(g.ts) AS ts_us,
             |  epoch_us(p.ts) AS purchase_us,
             |  epoch_us(p.ts) - epoch_us(g.ts) AS us_to_convert
             |FROM (SELECT * FROM events WHERE event_type = 'signup') g
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON g.user_id = p.user_id AND g.ts <= p.ts
             |ORDER BY g.event_id""".stripMargin)),

    // ------------------------------------------------------------------
    // Exact distinct counting per group (the sketch-free baseline;
    // approx_count_distinct is the drop-in at 100 TB but is not
    // oracle-comparable across engines).
    QuerySpec(
      "q44_count_distinct",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
             |  COUNT(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Window function family: lag/lead/ntile/first over a deterministic
    // per-customer order sequence.
    QuerySpec(
      "q45_window_family",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"),
            lag(col("o_orderkey"), 1).over(w).as("prev_order"),
            lead(col("o_orderkey"), 1).over(w).as("next_order"),
            ntile(4).over(w).as("quartile"),
            first(col("o_orderkey")).over(w).as("first_order"))
          .sortWithinPartitions("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  LAG(o_orderkey, 1) OVER w AS prev_order,
             |  LEAD(o_orderkey, 1) OVER w AS next_order,
             |  NTILE(4) OVER w AS quartile,
             |  FIRST_VALUE(o_orderkey) OVER w AS first_order
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Date part extraction + calendar grouping.
    QuerySpec(
      "q48_monthly_orders",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
          .orderBy("yr", "mo"),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |  CAST(month(o_orderdate) AS BIGINT) AS mo,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin)),

    // ------------------------------------------------------------------
    // LIKE pattern filters (pushed to the scan as StringContains /
    // StringStartsWith).
    QuerySpec(
      "q49_like_filter",
      (s, dir) =>
        Tables.part(s, dir)
          .filter(col("p_name").like("%widget%") && col("p_type").like("PROMO%"))
          .select(col("p_partkey"), col("p_name"), col("p_type"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE p_name LIKE '%widget%' AND p_type LIKE 'PROMO%'
             |ORDER BY p_partkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Nested aggregation: average per-customer spend by nation (agg over
    // an agg — the classic two-level rollup re-aggregation).
    QuerySpec(
      "q50_avg_customer_spend",
      (s, dir) => {
        val perCustomer = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(dsum(col("o_totalprice")).as("spend"))
        val c = Tables.customer(s, dir)
        perCustomer
          .join(broadcast(c), perCustomer("o_custkey") === c("c_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_customers"),
            (dsum(col("spend"), 4) / count(lit(1))).as("avg_spend"))
          .orderBy("c_nationkey")
      },
      Some("""WITH per_customer AS (
             |  SELECT o_custkey,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
             |  FROM orders GROUP BY o_custkey
             |)
             |SELECT c_nationkey, COUNT(*) AS n_customers,
             |  CAST(SUM(CAST(spend AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_spend
             |FROM per_customer JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ------------------------------------------------------------------
    // LEFT OUTER join: every customer, with urgent-order stats where they
    // exist (NULL-extended otherwise — COALESCE'd to sentinels so the
    // hash-compare is null-free). Shuffle join on o_custkey after the
    // orders side is PRE-AGGREGATED (the join input shrinks from 1.5M
    // orders to ≤1 row per customer before it shuffles).
    QuerySpec(
      "q51_left_outer_join",
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("__n"), dsum(col("o_totalprice")).as("__spend"))
        Tables.customer(s, dir)
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(col("c_custkey"),
            coalesce(col("__n"), lit(0L)).as("n_urgent"),
            coalesce(col("__spend"), lit(0.0)).as("urgent_spend"))
          .orderBy("c_custkey")
      },
      Some("""WITH urgent AS (
             |  SELECT o_custkey, COUNT(*) AS n,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
             |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
             |)
             |SELECT c_custkey, COALESCE(n, 0) AS n_urgent,
             |  COALESCE(spend, 0.0) AS urgent_spend
             |FROM customer LEFT OUTER JOIN urgent ON c_custkey = o_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // RIGHT OUTER join: per-supplier returned-lineitem stats RIGHT JOIN
    // supplier — suppliers with no returns appear NULL-extended.
    QuerySpec(
      "q52_right_outer_join",
      (s, dir) => {
        val returns = Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R")
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("__n"), dsum(col("l_extendedprice")).as("__value"))
        returns
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"), "right_outer")
          .select(col("s_suppkey"),
            coalesce(col("__n"), lit(0L)).as("n_returned"),
            coalesce(col("__value"), lit(0.0)).as("returned_value"))
          .sortWithinPartitions("s_suppkey")
      },
      Some("""WITH returns AS (
             |  SELECT l_suppkey, COUNT(*) AS n,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
             |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_suppkey
             |)
             |SELECT s_suppkey, COALESCE(n, 0) AS n_returned,
             |  COALESCE(value, 0.0) AS returned_value
             |FROM returns RIGHT OUTER JOIN supplier ON l_suppkey = s_suppkey
             |ORDER BY s_suppkey""".stripMargin)),

    // ------------------------------------------------------------------
    // FULL OUTER join: reconcile two disjointly-filtered per-customer
    // aggregates — unmatched rows surface from BOTH sides.
    QuerySpec(
      "q53_full_outer_join",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_custkey").as("cust_u")).agg(count(lit(1)).as("__nu"))
        val low = orders.filter(col("o_orderpriority") === "5-LOW")
          .groupBy(col("o_custkey").as("cust_l")).agg(count(lit(1)).as("__nl"))
        urgent.join(low, col("cust_u") === col("cust_l"), "full_outer")
          .select(coalesce(col("cust_u"), col("cust_l")).as("custkey"),
            coalesce(col("__nu"), lit(0L)).as("n_urgent"),
            coalesce(col("__nl"), lit(0L)).as("n_low"))
          .orderBy("custkey")
      },
      Some("""WITH urgent AS (
             |  SELECT o_custkey AS cust_u, COUNT(*) AS nu FROM orders
             |  WHERE o_orderpriority = '1-URGENT' GROUP BY 1
             |), low AS (
             |  SELECT o_custkey AS cust_l, COUNT(*) AS nl FROM orders
             |  WHERE o_orderpriority = '5-LOW' GROUP BY 1
             |)
             |SELECT COALESCE(cust_u, cust_l) AS custkey,
             |  COALESCE(nu, 0) AS n_urgent, COALESCE(nl, 0) AS n_low
             |FROM urgent FULL OUTER JOIN low ON cust_u = cust_l
             |ORDER BY custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Correlated EXISTS through the full spark.sql lifecycle (Catalyst's
    // RewritePredicateSubquery plans it as a left-semi join — asserted in
    // PlanSpec).
    QuerySpec(
      "q54_exists",
      (s, dir) => {
        // per-call unique view names: two concurrent callers on one shared
        // session must never read each other's registrations. sql() resolves
        // the views at analysis time, so they are dropped immediately after.
        val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
        Tables.supplier(s, dir).createOrReplaceTempView(s"graft_supplier_$tag")
        Tables.lineitem(s, dir).createOrReplaceTempView(s"graft_lineitem_$tag")
        val out = s.sql(
          s"""SELECT s_suppkey, s_name FROM graft_supplier_$tag s
             |WHERE EXISTS (SELECT 1 FROM graft_lineitem_$tag l
             |              WHERE l.l_suppkey = s.s_suppkey AND l.l_discount > 0.09)
             |ORDER BY s_suppkey""".stripMargin)
        s.catalog.dropTempView(s"graft_supplier_$tag")
        s.catalog.dropTempView(s"graft_lineitem_$tag")
        out
      },
      Some("""SELECT s_suppkey, s_name FROM supplier s
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_suppkey = s.s_suppkey AND l.l_discount > 0.09)
             |ORDER BY s_suppkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Correlated NOT EXISTS (planned as a left-anti join).
    QuerySpec(
      "q55_not_exists",
      (s, dir) => {
        val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
        Tables.customer(s, dir).createOrReplaceTempView(s"graft_customer_$tag")
        Tables.orders(s, dir).createOrReplaceTempView(s"graft_orders_$tag")
        val out = s.sql(
          s"""SELECT c_custkey, c_name FROM graft_customer_$tag c
             |WHERE NOT EXISTS (SELECT 1 FROM graft_orders_$tag o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_totalprice > 300000.0)
             |ORDER BY c_custkey""".stripMargin)
        s.catalog.dropTempView(s"graft_customer_$tag")
        s.catalog.dropTempView(s"graft_orders_$tag")
        out
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_totalprice > 300000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Exact interpolated percentiles per group.
    QuerySpec(
      "q42_percentiles",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            count(lit(1)).as("n"))
          .sortWithinPartitions("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |  COUNT(*) AS n
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // PIVOT: long→wide with EXPLICIT pivot values — passing the value list
    // skips the extra distinct-scan job Spark otherwise runs to discover
    // them (the 100 TB rule: never scan the fact table to learn a 3-value
    // enum). Oracle spells the same thing as conditional aggregation.
    QuerySpec(
      "q57_pivot",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
          .select(col("o_orderpriority"),
            coalesce(col("F_n"), lit(0L)).as("f_n"),
            coalesce(col("F_rev"), lit(0.0)).as("f_rev"),
            coalesce(col("O_n"), lit(0L)).as("o_n"),
            coalesce(col("O_rev"), lit(0.0)).as("o_rev"),
            coalesce(col("P_n"), lit(0L)).as("p_n"),
            coalesce(col("P_rev"), lit(0.0)).as("p_rev"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS f_n,
             |  COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'F'
             |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS f_rev,
             |  CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS o_n,
             |  COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'O'
             |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS o_rev,
             |  CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS p_n,
             |  COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'P'
             |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS p_rev
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // UNPIVOT (melt): wide→long over the four lineitem measures, then a
    // per-metric aggregate. One scan, no shuffle for the melt itself
    // (Expand node); sums routed through DECIMAL for order-independence.
    QuerySpec(
      "q58_unpivot",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
          .unpivot(
            Array.empty[org.apache.spark.sql.Column],
            Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
            "metric", "value")
          .groupBy(col("metric"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("total"))
          .orderBy("metric"),
      Some("""WITH m AS (
             |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
             |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
             |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
             |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
             |)
             |SELECT metric, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
             |FROM m GROUP BY metric ORDER BY metric""".stripMargin)),

    // ------------------------------------------------------------------
    // LATERAL VIEW explode (1→N in SQL): token frequencies over the
    // documents corpus through the full SQL lifecycle; the DuckDB oracle
    // uses its LATERAL unnest spelling of the same plan. Per-call unique
    // view name (see q54).
    QuerySpec(
      "q59_lateral_explode",
      (s, dir) => {
        val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
        Tables.documents(s, dir).createOrReplaceTempView("graft_docs_" + tag)
        val out = s.sql(
          """SELECT token, COUNT(*) AS n
            |FROM graft_docs_""".stripMargin + tag +
          """
            |LATERAL VIEW explode(split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')) t AS token
            |WHERE length(token) >= 4
            |GROUP BY token
            |HAVING COUNT(*) >= 20
            |ORDER BY n DESC, token""".stripMargin)
        s.catalog.dropTempView("graft_docs_" + tag)
        out
      },
      Some("""SELECT t.token AS token, COUNT(*) AS n
             |FROM documents, LATERAL unnest(string_split(
             |  trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t(token)
             |WHERE length(t.token) >= 4
             |GROUP BY t.token HAVING COUNT(*) >= 20
             |ORDER BY n DESC, token""".stripMargin)),

    // ------------------------------------------------------------------
    // RANGE window frame (value-based, not row-based): trailing 7-day
    // moving revenue over DAILY aggregates. The window input is O(distinct
    // dates) — it does NOT grow with data volume, so the unpartitioned
    // window (single-task sort) is fine even at 100 TB; the heavy
    // reduction happened in the groupBy before it. Window sums routed
    // through DECIMAL on both engines: Spark accumulates the frame
    // running-style, DuckDB uses a segment tree — different double
    // addition orders would diverge, decimal is order-free.
    QuerySpec(
      "q60_range_window",
      (s, dir) => {
        val daily = Tables.orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_dec"),
            count(lit(1)).as("n"))
        // daily plane (days-in-range-bounded): single-partition window
        val w = Window.partitionBy(graft.functions.ArrayMath.boundedKey(daily))
          .orderBy(col("dnum")).rangeBetween(-6, 0)
        daily
          .withColumn("dnum", datediff(col("d"), lit("1970-01-01")))
          .withColumn("rev_7d", sum(col("rev_dec")).over(w).cast("double"))
          .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("n"),
            col("rev_dec").cast("double").as("rev"), col("rev_7d"))
          .orderBy("day")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS d,
             |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev,
             |         COUNT(*) AS n
             |  FROM orders GROUP BY 1
             |)
             |SELECT strftime(d, '%Y-%m-%d') AS day, n, CAST(rev AS DOUBLE) AS rev,
             |  CAST(SUM(rev) OVER (ORDER BY d
             |    RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d
             |FROM daily ORDER BY day""".stripMargin)),

    // ------------------------------------------------------------------
    // SCD1 merge/upsert (ScaleOps.upsert): updates win on key collision,
    // new keys insert, untouched base rows survive — the MERGE INTO
    // semantics an incremental refresh needs. One left-anti join (AQE
    // broadcasts the small update batch; the base never shuffles). The
    // update/insert batches are derived deterministically from orders
    // itself; price arithmetic is a single IEEE add (exact on any engine)
    // and the final sums route through DECIMAL.
    QuerySpec(
      "q69_merge_upsert",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val updates = orders.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        val inserts = orders.filter(col("o_orderkey") % 97 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
        graft.ops.ScaleOps.upsert(orders, updates.unionByName(inserts), Seq("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH upd AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
             |  FROM orders WHERE o_orderkey % 10 = 0
             |  UNION ALL
             |  SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
             |  FROM orders WHERE o_orderkey % 97 = 0
             |), merged AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
             |  UNION ALL
             |  SELECT * FROM upd
             |)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // SCD Type-2 merge (ScaleOps.upsertScd2): q69's history-keeping
    // sibling — a matched key's current row CLOSES (valid_to = version,
    // is_current = false) and the update inserts as the new current
    // version; untouched keys and history pass through byte-identical.
    // One pass over the base (left join vs the skinny winner keys, AQE
    // broadcasts), inserts union on. Customers dimension, segment change
    // for every 7th key at version 100.
    QuerySpec(
      "q93_scd2_merge",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val base = cust.select(col("c_custkey"), col("c_mktsegment"),
          lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"),
          lit(true).as("is_current"))
        val updates = cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"),
            lower(col("c_mktsegment")).as("c_mktsegment"),
            lit(100L).as("version"))
        graft.ops.ScaleOps.upsertScd2(base, updates, Seq("c_custkey"), "version")
          .orderBy("c_custkey", "valid_from")
      },
      Some("""WITH closed AS (
             |  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS valid_from,
             |    CAST(100 AS BIGINT) AS valid_to, FALSE AS is_current
             |  FROM customer WHERE c_custkey % 7 = 0
             |), untouched AS (
             |  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS valid_from,
             |    CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
             |  FROM customer WHERE c_custkey % 7 != 0
             |), inserted AS (
             |  SELECT c_custkey, lower(c_mktsegment) AS c_mktsegment,
             |    CAST(100 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
             |    TRUE AS is_current
             |  FROM customer WHERE c_custkey % 7 = 0
             |)
             |SELECT * FROM (
             |  SELECT * FROM closed UNION ALL
             |  SELECT * FROM untouched UNION ALL
             |  SELECT * FROM inserted
             |) ORDER BY c_custkey, valid_from""".stripMargin)),

    // ------------------------------------------------------------------
    // Snapshot diff / CDC (ScaleOps.snapshotDiff): classify every key
    // across two full snapshots as insert / delete / update with a
    // null-safe payload compare — union-tag-aggregate, ONE shuffle of
    // old ∪ new on the key, per-snapshot key uniqueness enforced free in
    // the same aggregate. The new snapshot is derived deterministically:
    // every 97th key deleted, every 5th rebalanced (+10.0, one IEEE add),
    // every 101st re-inserted under a shifted key. DuckDB replays it as a
    // FULL JOIN + IS DISTINCT FROM (equivalent for unique non-null keys).
    QuerySpec(
      "q95_snapshot_diff",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val newSnap = cust.filter(col("c_custkey") % 97 =!= 0)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 5 === 0, col("c_acctbal") + lit(10.0))
              .otherwise(col("c_acctbal")))
          .unionByName(cust.filter(col("c_custkey") % 101 === 0)
            .select((col("c_custkey") + lit(10000000L)).as("c_custkey"),
              lit("NEW").as("c_mktsegment"), lit(0.0).as("c_acctbal")))
        graft.ops.ScaleOps.snapshotDiff(cust, newSnap, Seq("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""WITH oldsnap AS (
             |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
             |), newsnap AS (
             |  SELECT c_custkey, c_mktsegment,
             |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 10.0
             |         ELSE c_acctbal END AS c_acctbal
             |  FROM customer WHERE c_custkey % 97 != 0
             |  UNION ALL
             |  SELECT c_custkey + 10000000, 'NEW', 0.0
             |  FROM customer WHERE c_custkey % 101 = 0
             |), diff AS (
             |  SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             |    CASE WHEN n.c_custkey IS NULL THEN o.c_mktsegment
             |         ELSE n.c_mktsegment END AS c_mktsegment,
             |    CASE WHEN n.c_custkey IS NULL THEN o.c_acctbal
             |         ELSE n.c_acctbal END AS c_acctbal,
             |    CASE WHEN o.c_custkey IS NULL THEN 'insert'
             |         WHEN n.c_custkey IS NULL THEN 'delete'
             |         WHEN (o.c_mktsegment IS DISTINCT FROM n.c_mktsegment)
             |           OR (o.c_acctbal IS DISTINCT FROM n.c_acctbal) THEN 'update'
             |         ELSE 'unchanged' END AS change_type
             |  FROM oldsnap o FULL JOIN newsnap n ON o.c_custkey = n.c_custkey
             |)
             |SELECT * FROM diff WHERE change_type != 'unchanged'
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Incremental aggregate maintenance (ops.AggState): the materialized-
    // view pattern — per-group partial state (count / DECIMAL sum / sumsq
    // / min / max) built over disjoint increments, MERGED (cost ∝ groups,
    // not history), finalized as a pure projection. The oracle aggregates
    // the full table DIRECTLY — equality proves the split-build-merge
    // path is exact, not approximate. Decimal state is order-independent;
    // the finalize step is one fixed IEEE tree replayed verbatim in SQL.
    QuerySpec(
      "q96_agg_state_merge",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val incA = o.filter(col("o_orderkey") % 3 === 0)
        val incB = o.filter(col("o_orderkey") % 3 === 1)
        val incC = o.filter(col("o_orderkey") % 3 === 2)
        val keys = Seq("o_orderstatus", "o_orderpriority")
        val merged = graft.ops.AggState.merge(keys,
          graft.ops.AggState.build(incA, keys, "o_totalprice"),
          graft.ops.AggState.build(incB, keys, "o_totalprice"),
          graft.ops.AggState.build(incC, keys, "o_totalprice"))
        graft.ops.AggState.finalizeState(merged, keys)
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      Some("""WITH st AS (
             |  SELECT o_orderstatus, o_orderpriority,
             |    COUNT(o_totalprice) AS n,
             |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s,
             |    SUM(CAST(o_totalprice AS DECIMAL(19,4)) *
             |        CAST(o_totalprice AS DECIMAL(19,4))) AS ss,
             |    MIN(CAST(o_totalprice AS DOUBLE)) AS min_v,
             |    MAX(CAST(o_totalprice AS DOUBLE)) AS max_v
             |  FROM orders GROUP BY 1, 2
             |)
             |SELECT o_orderstatus, o_orderpriority, CAST(n AS BIGINT) AS n,
             |  CASE WHEN n > 0 THEN
             |    CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
             |  END AS mean_v,
             |  CASE WHEN n > 1 THEN
             |    (CAST(CAST(ss AS VARCHAR) AS DOUBLE)
             |      - CAST(CAST(s AS VARCHAR) AS DOUBLE) * CAST(CAST(s AS VARCHAR) AS DOUBLE)
             |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) END AS var_v,
             |  min_v, max_v
             |FROM st ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // ------------------------------------------------------------------
    // Z-order (Morton) code (ScaleOps.zorderValue): the multi-dimensional
    // clustering key behind data-skipping layouts — interleaves the low 8
    // bits of customer and order-day bins so files clustered by z carry
    // tight min/max envelopes on BOTH dimensions (ScaleOpsSpec asserts
    // the locality win; this query pins the code itself). Pure codegen
    // bit arithmetic, replayed term-for-term with DuckDB's bit operators.
    QuerySpec(
      "q98_zorder_code",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          pmod(col("o_custkey"), lit(256)).cast("long").as("bx"),
          pmod(datediff(to_date(col("o_orderdate")), lit("1970-01-01")),
            lit(256)).cast("long").as("bd"))
        o.withColumn("z",
            graft.ops.ScaleOps.zorderValue(Seq(col("bx"), col("bd")), 8))
          .sortWithinPartitions("o_orderkey")
      },
      Some {
        val terms = (for { j <- 0 to 1; i <- 0 until 8 } yield {
          val c = if (j == 0) "bx" else "bd"
          s"((($c >> $i) & 1) << ${i * 2 + j})"
        }).mkString(" | ")
        s"""WITH b AS (
           |  SELECT o_orderkey, o_custkey % 256 AS bx,
           |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 256 AS bd
           |  FROM orders
           |)
           |SELECT o_orderkey, bx, bd, ($terms) AS z
           |FROM b ORDER BY o_orderkey""".stripMargin
      }),

    // ------------------------------------------------------------------
    // IQR (Tukey-fence) outlier gate (Profile.iqrOutliers): q86's
    // distribution-robust sibling. Quartiles round to 4 decimals before
    // the fence arithmetic — percentile interpolation is the one exact
    // aggregate whose last ulp differs across engines (q42 parity), so
    // the rounded fences make the verdict SET replayable; the outlier
    // values themselves then aggregate through the usual rounded stats.
    QuerySpec(
      "q102_iqr_outliers",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
        graft.ops.Profile.iqrOutliers(ev, "event_type", "value")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_outliers"),
            round(min(col("value")), 4).as("min_out"),
            round(max(col("value")), 4).as("max_out"),
            // fences ride RAW: they derive from identically-rounded
            // quartiles, so the doubles are bit-identical cross-engine,
            // while re-rounding them can land on exact .5 ties
            // (1.5 x odd-digit IQR) where engines' ROUND disagrees
            min(col("lo")).as("lo"),
            min(col("hi")).as("hi"))
          .orderBy("event_type")
      },
      Some("""WITH st AS (
             |  SELECT event_type,
             |    ROUND(quantile_cont(value, 0.25), 4) AS q1,
             |    ROUND(quantile_cont(value, 0.75), 4) AS q3
             |  FROM events GROUP BY 1
             |), b AS (
             |  SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo,
             |    q3 + 1.5 * (q3 - q1) AS hi FROM st
             |)
             |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_outliers,
             |  ROUND(MIN(e.value), 4) AS min_out,
             |  ROUND(MAX(e.value), 4) AS max_out,
             |  MIN(b.lo) AS lo, MIN(b.hi) AS hi
             |FROM events e JOIN b ON e.event_type = b.event_type
             |WHERE e.value < b.lo OR e.value > b.hi
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------------------
    // ANALYZE-style numeric profile (Profile.numericProfile): one
    // aggregation statement for all columns — Spark plans the multiple
    // exact distinct-counts with a single Expand over one scan, not k jobs.
    QuerySpec(
      "q71_profile",
      (s, dir) =>
        graft.ops.Profile.numericProfile(Tables.lineitem(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .orderBy("col_name"),
      Some("""SELECT * FROM (
             |  SELECT 'l_quantity' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
             |    CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
             |    CAST(MIN(l_quantity) AS DOUBLE) AS min_v, CAST(MAX(l_quantity) AS DOUBLE) AS max_v
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
             |    CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
             |    CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
             |    CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
             |    CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
             |    CAST(COUNT(DISTINCT l_discount) AS BIGINT),
             |    CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
             |    CAST(COUNT(*) - COUNT(l_tax) AS BIGINT),
             |    CAST(COUNT(DISTINCT l_tax) AS BIGINT),
             |    CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE)
             |  FROM lineitem
             |) ORDER BY col_name""".stripMargin)),

    // ------------------------------------------------------------------
    // Fixed-bin histogram of order totals (Profile.fixedHistogram):
    // floor((x-lo)/width) clamped — pure projection + one agg; fixed edges
    // make the binning an exact IEEE computation on any engine.
    QuerySpec(
      "q72_histogram",
      (s, dir) =>
        graft.ops.Profile.fixedHistogram(Tables.orders(s, dir),
          "o_totalprice", lo = 0.0, width = 25000.0, nBins = 24)
          .orderBy("bin"),
      Some("""SELECT GREATEST(0, LEAST(CAST(FLOOR((o_totalprice - 0.0) / 25000.0) AS BIGINT), 23)) AS bin,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM orders WHERE o_totalprice IS NOT NULL
             |GROUP BY 1 ORDER BY bin""".stripMargin)),

    // ------------------------------------------------------------------
    // Ordered funnel (ops.EventOps.funnel — strict-order, bounded-window
    // conversion: signup → view → purchase within 72 h of the signup):
    // per-step per-user first-occurrence times chain through user-keyed
    // joins of skinny frames — no window over the raw event stream, and
    // everything is exact epoch-MICROsecond integer arithmetic, so the
    // whole per-user trajectory (and the step totals) replays in DuckDB.
    QuerySpec(
      "q156_funnel",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val times = graft.ops.EventOps.funnel(ev, "user_id", "event_type",
          "us", Seq("signup", "view", "purchase"),
          windowUs = 259200000000L)
        graft.ops.EventOps.funnelReport(times,
          Seq("signup", "view", "purchase")).orderBy("step")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
             |), s1 AS (
             |  SELECT user_id, MIN(us) AS t1 FROM e
             |  WHERE event_type = 'signup' GROUP BY 1
             |), s2 AS (
             |  SELECT e.user_id, MIN(s1.t1) AS t1, MIN(e.us) AS t2
             |  FROM e JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'view' AND e.us > s1.t1
             |    AND e.us <= s1.t1 + 259200000000
             |  GROUP BY 1
             |), s3 AS (
             |  SELECT e.user_id, MIN(s2.t1) AS t1, MIN(e.us) AS t3
             |  FROM e JOIN s2 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.us > s2.t2
             |    AND e.us <= s2.t1 + 259200000000
             |  GROUP BY 1
             |)
             |SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
             |  (SELECT COUNT(*) FROM s1) AS n_users,
             |  CAST(0 AS BIGINT) AS sum_us_from_t1
             |UNION ALL
             |SELECT 2, 'view', (SELECT COUNT(*) FROM s2),
             |  CAST(COALESCE((SELECT SUM(t2 - t1) FROM s2), 0) AS BIGINT)
             |UNION ALL
             |SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3),
             |  CAST(COALESCE((SELECT SUM(t3 - t1) FROM s3), 0) AS BIGINT)
             |ORDER BY step""".stripMargin)),

    // ------------------------------------------------------------------
    // Cohort retention triangle (EventOps.retentionCohorts): cohort =
    // absolute 7-day period of the user's FIRST event, offset = full
    // periods since it, cells = distinct active users. Two shuffles
    // (per-user min, cohort-cell count-distinct), only (user, us)
    // travels. Integer division end to end — exact replay.
    QuerySpec(
      "q157_retention",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        graft.ops.EventOps.retentionCohorts(ev, "user_id", "us",
            periodUs = 604800000000L)
          .orderBy("cohort_period", "period_offset")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS us FROM events
             |), f AS (
             |  SELECT user_id, MIN(us) AS first_us FROM e GROUP BY 1
             |)
             |SELECT f.first_us // 604800000000 AS cohort_period,
             |  (e.us - f.first_us) // 604800000000 AS period_offset,
             |  COUNT(DISTINCT e.user_id) AS n_users
             |FROM e JOIN f USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ------------------------------------------------------------------
    // PSI drift gate (Profile.psiDrift): the deploy-time distribution-
    // shift check between two snapshots of a numeric column — here the
    // first vs second half of the events month. Fixed shared bins
    // (q102's histogram edges rule), Laplace-smoothed proportions, each
    // PSI term four ln's of exact integers times an IEEE-exact rational
    // difference, DECIMAL-routed sum (the q122 recipe) — bit-stable and
    // fully DuckDB-replayable, threshold verdict included.
    QuerySpec(
      "q158_psi_drift",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val cut = lit(java.time.LocalDateTime.of(2024, 1, 16, 0, 0))
        graft.ops.Profile.psiDrift(
          ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          "value", lo = 0.0, width = 25.0, nBins = 20, threshold = 0.25)
      },
      Some("""WITH a AS (
             |  SELECT GREATEST(0, LEAST(CAST(FLOOR(value / 25.0) AS BIGINT), 19)) AS bin,
             |         COUNT(*) AS na
             |  FROM events WHERE ts < TIMESTAMP '2024-01-16' AND value IS NOT NULL
             |  GROUP BY 1
             |), b AS (
             |  SELECT GREATEST(0, LEAST(CAST(FLOOR(value / 25.0) AS BIGINT), 19)) AS bin,
             |         COUNT(*) AS nb
             |  FROM events WHERE ts >= TIMESTAMP '2024-01-16' AND value IS NOT NULL
             |  GROUP BY 1
             |), bins AS (SELECT unnest(range(20)) AS bin
             |), j AS (
             |  SELECT bins.bin, COALESCE(a.na, 0) AS na, COALESCE(b.nb, 0) AS nb
             |  FROM bins LEFT JOIN a ON a.bin = bins.bin
             |            LEFT JOIN b ON b.bin = bins.bin
             |), t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM j)
             |SELECT CAST(t.ta AS BIGINT) AS n_a, CAST(t.tb AS BIGINT) AS n_b,
             |  ROUND(CAST(CAST(SUM(CAST(
             |    (CAST(j.na + 1 AS DOUBLE) / (t.ta + 20) -
             |     CAST(j.nb + 1 AS DOUBLE) / (t.tb + 20)) *
             |    (ln(CAST(j.na + 1 AS DOUBLE)) - ln(CAST(t.ta + 20 AS DOUBLE)) -
             |     ln(CAST(j.nb + 1 AS DOUBLE)) + ln(CAST(t.tb + 20 AS DOUBLE)))
             |  AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE), 6) AS psi,
             |  ROUND(CAST(CAST(SUM(CAST(
             |    (CAST(j.na + 1 AS DOUBLE) / (t.ta + 20) -
             |     CAST(j.nb + 1 AS DOUBLE) / (t.tb + 20)) *
             |    (ln(CAST(j.na + 1 AS DOUBLE)) - ln(CAST(t.ta + 20 AS DOUBLE)) -
             |     ln(CAST(j.nb + 1 AS DOUBLE)) + ln(CAST(t.tb + 20 AS DOUBLE)))
             |  AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE), 6) > 0.25 AS drifted
             |FROM j CROSS JOIN t
             |GROUP BY t.ta, t.tb""".stripMargin))
  )
}
