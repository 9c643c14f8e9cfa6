package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** One declared query = a Spark DataFrame builder + (when SQL-expressible) an
  * equivalent DuckDB SQL oracle run by the driver on the same parquet tables.
  */
final case class QuerySpec(
    name: String,
    builder: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Relational query inventory covering the reference's operator surface
  * (SURVEY.md §2: scans, projections/filters, casts, aggregation, validation
  * counts, JSON handling) plus the general query capability the north star
  * mandates (joins, windows, sorts/limits, set ops).
  *
  * Hash-stability conventions (oracle compares column-sorted value hashes):
  *   - Every aggregate / computed column is aliased identically on both sides.
  *   - Double sums go through DECIMAL(18,x) so the result is independent of
  *     partial-aggregation order (Spark) vs sequential order (DuckDB), then
  *     back to DOUBLE so both sides have the same schema.
  *   - Integer sums are CAST to BIGINT (DuckDB's SUM(int) is HUGEINT).
  *   - No raw TIMESTAMP outputs: buckets/extracts become BIGINT.
  *   - Every query ends in a deterministic total ORDER BY.
  *
  * Scale notes are given per query: all joins against dimension tables carry
  * broadcast hints, facts aggregate with map-side partial aggregation, and
  * nothing collects to the driver.
  */
object RelationalQueries {

  /** Exact, order-independent sum of a double column: per-row value is cast
    * to DECIMAL (exact, commutative addition), summed, then returned to
    * DOUBLE. Mirrors the SQL idiom CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE).
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  val all: Seq[QuerySpec] = Seq(

    // ------------------------------------------------------------------
    // q01: grouped aggregation over the fact table (TPC-H Q1 shape).
    // Reference surface: A1 global/grouped counting generalized
    // (dataflow_transform.py:192-195). Scale: partial HashAggregate on 6
    // grouping cells -> single tiny shuffle; filter pushed to parquet scan.
    QuerySpec(
      "q01_pricing_summary",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit(java.time.LocalDateTime.of(1998, 9, 1, 0, 0)))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ------------------------------------------------------------------
    // q02: projection + filter (reference P4/P5, airflow.py:110-115).
    // Scale: predicate + column pruning pushed into the parquet scan.
    QuerySpec(
      "q02_filter_project",
      (s, dir) =>
        Tables.orders(s, dir)
          .filter(col("o_totalprice") > 150000.0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .sortWithinPartitions("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders WHERE o_totalprice > 150000.0
             |ORDER BY o_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // q03: fact-to-dimension join + grouped agg. customer is a dimension ->
    // broadcast hint (no shuffle of orders; at 100 TB AQE would still pick
    // broadcast for a dim under the threshold).
    QuerySpec(
      "q03_join_agg_segment",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("revenue"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ------------------------------------------------------------------
    // q04: 5-way star join (TPC-H Q5 shape): region/nation broadcast,
    // customer broadcast, lineitem->orders is the only real shuffle join.
    QuerySpec(
      "q04_revenue_by_nation",
      (s, dir) => {
        val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val n = Tables.nation(s, dir)
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit(java.time.LocalDateTime.of(1996, 1, 1, 0, 0)) &&
                  col("o_orderdate") <  lit(java.time.LocalDateTime.of(1999, 1, 1, 0, 0)))
        val l = Tables.lineitem(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ------------------------------------------------------------------
    // q05: global sort + limit (top-k). Spark plans TakeOrderedAndProject:
    // per-partition top-k then driver merge — no full sort at scale.
    QuerySpec(
      "q05_topk_orders",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // ------------------------------------------------------------------
    // q06: DISTINCT (exact dedup primitive; hash-aggregate, map-side partial).
    QuerySpec(
      "q06_distinct_nation_segment",
      (s, dir) =>
        Tables.customer(s, dir)
          .select(col("c_nationkey"), col("c_mktsegment"))
          .distinct()
          .orderBy("c_nationkey", "c_mktsegment"),
      Some("""SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
             |ORDER BY c_nationkey, c_mktsegment""".stripMargin)),

    // ------------------------------------------------------------------
    // q07: set op — UNION (distinct) of two key sets.
    QuerySpec(
      "q07_union_nations",
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
        c.union(su).distinct().orderBy("nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    // ------------------------------------------------------------------
    // q08: anti join (NOT EXISTS). Customers with no orders.
    QuerySpec(
      "q08_customers_no_orders",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // q09: window functions — rank within partition + running sum. The
    // running double sum is sequential in the same (o_orderdate, o_orderkey)
    // order on both engines, so it is bit-reproducible.
    QuerySpec(
      "q09_window_order_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, dir)
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"),
            round(sum(col("o_totalprice"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
              .as("running_spend"))
          .sortWithinPartitions("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  ROW_NUMBER() OVER w AS rn,
             |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, rn""".stripMargin)),

    // ------------------------------------------------------------------
    // q10: grouped agg + HAVING.
    QuerySpec(
      "q10_having_big_customers",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(
            count(lit(1)).as("n_orders"),
            (dsum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
          .filter(col("n_orders") > 10)
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_price
             |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 10
             |ORDER BY o_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // q11: conditional aggregation (CASE WHEN) — the warn/fail policy shape
    // of the reference's validation summary (dataflow.py:76-84).
    QuerySpec(
      "q11_conditional_agg",
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("n_urgent"),
            sum(when(col("o_totalprice") > 200000.0, 1L).otherwise(0L)).as("n_big"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
             |  CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ------------------------------------------------------------------
    // q12: scalar string functions (reference §2.6: trim/str/concat +
    // absent-beam.py regex cleanup README.md:34).
    QuerySpec(
      "q12_string_funcs",
      (s, dir) =>
        Tables.part(s, dir)
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_type"), 1, 4).as("type_pfx"),
            length(col("p_name")).cast("long").as("name_len"),
            concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_name"), "[^a-z0-9 ]", "").as("name_clean"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u,
             |  SUBSTRING(p_type, 1, 4) AS type_pfx,
             |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
             |  CONCAT(p_brand, '#', p_type) AS brand_type,
             |  REGEXP_REPLACE(p_name, '[^a-z0-9 ]', '', 'g') AS name_clean
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ------------------------------------------------------------------
    // q13: truncating numeric cast — Python int(float(x)) parity
    // (dataflow_transform.py:45). Spark double->long truncates toward zero;
    // DuckDB CAST rounds, so the oracle spells it TRUNC().
    QuerySpec(
      "q13_trunc_cast",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("qty_int"),
            (col("l_extendedprice") / 1000.0).cast("long").as("price_k"))
          .sortWithinPartitions("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(TRUNC(l_quantity) AS BIGINT) AS qty_int,
             |  CAST(TRUNC(l_extendedprice/1000.0) AS BIGINT) AS price_k
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // q14: REQUIRED-field semantics (dataflow_transform.py:39-41): non-null
    // and non-empty-after-trim, counted per group.
    QuerySpec(
      "q14_nonempty_docs",
      (s, dir) =>
        Tables.documents(s, dir)
          .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("total_chars"))
          .orderBy("source"),
      Some("""SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM documents
             |WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
             |GROUP BY source ORDER BY source""".stripMargin)),

    // ------------------------------------------------------------------
    // q15: global count (reference A1, beam.combiners.Count.Globally,
    // dataflow_transform.py:192-195). Partial count per partition + final.
    QuerySpec(
      "q15_global_count",
      (s, dir) =>
        Tables.lineitem(s, dir).agg(count(lit(1)).as("cnt")),
      Some("SELECT COUNT(*) AS cnt FROM lineitem")),

    // ------------------------------------------------------------------
    // q16: one-pass validation summary (reference §2.7, dataflow.py:62-134):
    // several rule-violation counts computed in a single scan.
    QuerySpec(
      "q16_validation_summary",
      (s, dir) =>
        Tables.documents(s, dir)
          .agg(
            count(lit(1)).as("total_records"),
            sum(when(col("text").isNull || length(trim(col("text"))) === 0, 1L).otherwise(0L)).as("empty_text"),
            sum(when(!col("lang").isin("en", "de", "es", "fr", "zh"), 1L).otherwise(0L)).as("bad_lang"),
            sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)).as("nchars_mismatch"),
            sum(when(col("n_chars") < 50L, 1L).otherwise(0L)).as("too_short")),
      Some("""SELECT COUNT(*) AS total_records,
             |  CAST(SUM(CASE WHEN text IS NULL OR LENGTH(TRIM(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
             |  CAST(SUM(CASE WHEN lang NOT IN ('en','de','es','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
             |  CAST(SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END) AS BIGINT) AS nchars_mismatch,
             |  CAST(SUM(CASE WHEN n_chars < 50 THEN 1 ELSE 0 END) AS BIGINT) AS too_short
             |FROM documents""".stripMargin)),

    // ------------------------------------------------------------------
    // q17: JSON field extraction (reference S5/json.loads, dataflow.py:209-234)
    // over the events.props JSON column.
    QuerySpec(
      "q17_json_extract",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            from_json(col("props"), "k BIGINT", Map.empty[String, String])
              .getField("k").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"),
            max(col("k")).as("max_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // q18: event-time bucketing on the nanosecond timestamps. Bucketing is
    // integer floor-division on raw nanos on BOTH sides, so no
    // timestamp-precision ambiguity can leak into the hash.
    QuerySpec(
      "q18_hourly_events",
      (s, dir) =>
        Tables.events(s, dir)
          .select(expr("ts_ns div 3600000000000").as("hour_bucket"),
            col("event_type"), col("value"))
          .groupBy(col("hour_bucket"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("hour_bucket"),
      Some("""SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, COUNT(*) AS n,
             |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY hour_bucket""".stripMargin)),

    // ------------------------------------------------------------------
    // q19: sessionization (gaps-and-islands): new session when the per-user
    // gap exceeds 30 min. Arithmetic on exact MICROseconds (DuckDB reads the
    // parquet NANOS column at micro precision, so micros is the shared exact
    // unit); windows ordered by a unique key — fully deterministic.
    QuerySpec(
      "q19_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("ts_us"))
          .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("gap").isNull || col("gap") > lit(1800L * 1000000L), 1L).otherwise(0L))
          .withColumn("session_id",
            sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts_us")).as("sess_start_us"),
            max(col("ts_us")).as("sess_end_us"))
          .sortWithinPartitions("user_id", "session_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             |    epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |), sess AS (
             |  SELECT user_id, event_id, ts_us,
             |    SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g
             |)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  COUNT(*) AS n_events,
             |  MIN(ts_us) AS sess_start_us, MAX(ts_us) AS sess_end_us
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin))
  )
}
