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

  override def queries: Seq[GraftQuery] = Seq(
    q22ShippingPriority, q23NationRevenue, q24SetOps, q25Rollup, q26Pivot)
}
