package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Deeper analytics coverage beyond the reference's own surface —
  * multi-join pipelines, set operations, rollup and pivot: the
  * query shapes a complete warehouse engine must plan well (join
  * ordering, broadcast selection, partial aggregation), each with a
  * DuckDB oracle.
  */
object Analytics extends QueryModule {

  /** Shipping-priority shape (TPC-H Q3): 3-way join, grouped revenue,
    * top-10. The two dimension-ish sides prune before the fact join;
    * TakeOrdered avoids a total sort. */
  private val q22ShippingPriority = GraftQuery(
    "q22_shipping_priority",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_orderdate,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey ASC LIMIT 10"""))

  /** Local-supplier-volume shape (TPC-H Q5): 5-way join with the
    * same-nation constraint; small sides broadcast. */
  private val q23NationRevenue = GraftQuery(
    "q23_nation_revenue",
    (s, dir) => {
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name"""))

  /** INTERSECT / EXCEPT (set semantics — both engines dedup):
    * customers active in 1995 but not 1996. */
  private val q24SetOps = GraftQuery(
    "q24_set_ops",
    (s, dir) => {
      val ord = Tables.orders(s, dir)
      def activeIn(y: Int) = ord.filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey").as("custkey"))
      activeIn(1995).except(activeIn(1996)).orderBy(col("custkey"))
    },
    Some("""SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      ORDER BY custkey"""))

  /** ROLLUP: order counts/revenue by (year, status) with subtotals and
    * a grand total; grouping level made explicit so null group keys
    * sort deterministically in both engines. */
  private val q25Rollup = GraftQuery(
    "q25_rollup",
    (s, dir) => Tables.orders(s, dir)
      .rollup(year(col("o_orderdate")).as("order_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        grouping_id().cast("int").as("lvl"))
      .orderBy(col("lvl"), col("order_year").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first),
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
        count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price,
        CAST(GROUPING(year(o_orderdate)) * 2 + GROUPING(o_orderstatus) AS INT) AS lvl
      FROM orders
      GROUP BY ROLLUP(year(o_orderdate), o_orderstatus)
      ORDER BY lvl, order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""))

  /** PIVOT: per-year order counts spread across status columns
    * (Spark's .pivot with explicit values → stable schema). */
  private val q26Pivot = GraftQuery(
    "q26_pivot",
    (s, dir) => Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("order_year"), col("o_orderstatus"))
      .groupBy(col("order_year"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .count()
      .na.fill(0L)
      .orderBy(col("order_year")),
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
      FROM orders GROUP BY 1 ORDER BY order_year"""))

  /** Correlated-aggregate shape (TPC-H Q17): per-key average feeding a
    * filter on the same table — planned as join-with-reused-aggregate
    * in Spark, a correlated scalar subquery in the oracle. Threshold
    * arithmetic is identical double math on both sides (integral
    * quantities → exact avg), so the comparison can't flip. */
  private val q27CorrelatedAvg = GraftQuery(
    "q27_correlated_avg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val perPart = li.groupBy(col("l_partkey"))
        .agg((avg(col("l_quantity")) * 0.2).as("q_thresh"))
      li.join(perPart, "l_partkey")
        .filter(col("l_quantity") < col("q_thresh"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    },
    Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      FROM lineitem l1
      WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l1.l_partkey)"""))

  /** String-function battery beyond the reference's surface: case
    * mapping, padding, translate, reverse, split_part, instr,
    * levenshtein — all same-named in both engines. */
  private val q28StringFuncs = GraftQuery(
    "q28_string_funcs",
    (s, dir) => Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        length(col("c_name")).as("name_len"),
        reverse(col("c_mktsegment")).as("segment_rev"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("segment_tr"),
        split_part(col("c_name"), lit("#"), lit(2)).as("name_num"),
        instr(col("c_name"), "#").as("hash_pos"),
        levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("seg_dist"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
        upper(c_name) AS name_upper,
        CAST(length(c_name) AS INT) AS name_len,
        reverse(c_mktsegment) AS segment_rev,
        lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS segment_tr,
        split_part(c_name, '#', 2) AS name_num,
        CAST(instr(c_name, '#') AS INT) AS hash_pos,
        CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS seg_dist
      FROM customer ORDER BY c_custkey"""))

  /** Date-arithmetic battery: day differences, month arithmetic with
    * end-of-month clamping, month truncation, last_day. */
  private val q29DateFuncs = GraftQuery(
    "q29_date_funcs",
    (s, dir) => Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .as("days_since_epoch_start"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus_quarter"),
        trunc(col("o_orderdate").cast("date"), "month").as("month_start"),
        last_day(col("o_orderdate").cast("date")).as("month_end"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
        CAST(o_orderdate AS DATE) AS order_date,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
          AS days_since_epoch_start,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_quarter,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        last_day(CAST(o_orderdate AS DATE)) AS month_end
      FROM orders ORDER BY o_orderkey"""))

  /** Window-function battery beyond rank/running-sum: offsets,
    * tiles, frame-bounded first/last, distribution functions — all
    * over a total per-partition order so both engines tie-break
    * identically. */
  private val q30WindowBattery = GraftQuery(
    "q30_window_battery",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("first_value_so_far", first(col("value")).over(wFrame))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .drop("ts", "value")
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
        lag(value, 1) OVER w AS prev_value,
        lead(value, 1) OVER w AS next_value,
        CAST(ntile(4) OVER w AS INT) AS quartile,
        first_value(value) OVER
          (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value_so_far,
        round(percent_rank() OVER w, 6) AS pct_rank
      FROM events
      WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      ORDER BY user_id, event_id"""))

  override def queries: Seq[GraftQuery] = Seq(
    q22ShippingPriority, q23NationRevenue, q24SetOps, q25Rollup, q26Pivot,
    q27CorrelatedAvg, q28StringFuncs, q29DateFuncs, q30WindowBattery)
}
