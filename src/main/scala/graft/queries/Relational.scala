package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage for SURVEY.md §2 on the driver's
  * testdata tables. Each query exercises one operator family from the
  * reference's ELT (`spark_elt_emr.py`) / check (`spark_check_emr.py`)
  * surface, re-expressed Spark-first.
  *
  * Scale notes (100 TB thinking, verified via `.explain`):
  *   - aggregations rely on two-phase HashAggregate (map-side partial);
  *   - small dimension joins are explicitly `broadcast()` so no shuffle
  *     of the fact side ever happens;
  *   - fact-fact joins shuffle on the join key only after map-side
  *     projection has pruned columns (pushed into the parquet scan);
  *   - ORDER BY is range-partitioned sample sort — only used where the
  *     reference sorts (before a write) or where output determinism
  *     needs it at driver-compare time.
  */
object Relational extends QueryModule {

  /** A1/A2 + grouped agg: TPC-H-Q1-shaped pricing summary over the
    * fact table (reference analysis goal, README.md:5). */
  private val q1Agg = GraftQuery(
    "q1_agg",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 6).as("avg_qty"),
          round(avg($"l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      sum(l_quantity) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      round(avg(l_quantity), 6) AS avg_qty,
      round(avg(l_discount), 6) AS avg_disc,
      count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Fact-to-fact equi-join + aggregation. At scale both sides shuffle
    * on the join key; column pruning keeps the shuffle narrow (only
    * key + 3 payload columns move). */
  private val q2JoinAgg = GraftQuery(
    "q2_join_agg",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_extendedprice", $"l_discount")
      val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Snowflake dimension join with explicit broadcast (SURVEY §4: the
    * reference's covid/weather joins are Catalyst auto-broadcast; we
    * pin it). Zero shuffle of the customer side. */
  private val q3BroadcastJoin = GraftQuery(
    "q3_broadcast_join",
    (s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      cust
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(
          count(lit(1)).as("n_customers"),
          round(avg($"c_acctbal"), 6).as("avg_acctbal"))
        .orderBy($"r_name")
    },
    Some("""SELECT r_name, count(*) AS n_customers,
      round(avg(c_acctbal), 6) AS avg_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** A1: SELECT DISTINCT over projected keys (reference dim builds,
    * spark_elt_emr.py:88-90/:109-114/:121-124/:167-182). */
  private val q4Distinct = GraftQuery(
    "q4_distinct",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_type", $"user_id")
        .distinct()
        .orderBy($"event_type", $"user_id")
    },
    Some("""SELECT DISTINCT event_type, user_id FROM events
      ORDER BY event_type, user_id"""))

  /** J1 parity: LEFT OUTER equi-join on a *computed date key*
    * (reference: to_date(starttime) = to_date(date_of_interest),
    * spark_elt_emr.py:76-77), plus F12 null-default via coalesce. */
  private val q5LeftJoinDate = GraftQuery(
    "q5_left_join_date",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val daily = ev.groupBy(to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n_events"))
      val sparse = ev.filter($"event_type" === "error" && $"value" > 400.0)
        .groupBy(to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n_big_errors"))
      daily.join(sparse, Seq("day"), "left")
        .select($"day", $"n_events",
          coalesce($"n_big_errors", lit(0L)).as("n_big_errors"))
        .orderBy($"day")
    },
    Some("""WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1),
      sparse AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_big_errors
        FROM events WHERE event_type = 'error' AND value > 400
        GROUP BY 1)
      SELECT d.day, d.n_events, coalesce(s.n_big_errors, 0) AS n_big_errors
      FROM daily d LEFT JOIN sparse s ON d.day = s.day
      ORDER BY d.day"""))

  /** J2 parity: hour-bucket "as-of" join expressed as an equi-join on
    * a computed epoch key (reference spark_elt_emr.py:78-79: substr
    * to the hour, re-suffix ':00:00', unix_seconds). The bucketed
    * side is tiny (one row/hour) → broadcast, so the event side never
    * shuffles — exactly how the reference's weather join scales. */
  private val q6HourBucketJoin = GraftQuery(
    "q6_hour_bucket_join",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val hourly = ev
        .groupBy(unix_seconds(date_trunc("hour", $"ts".cast("timestamp"))).as("bucket"))
        .agg(round(avg($"value"), 6).as("hourly_avg"))
      val keyed = ev.select(
        $"event_id",
        unix_seconds(to_timestamp(
          concat(substring($"ts".cast("timestamp").cast("string"), 1, 13), lit(":00:00"))))
          .as("bucket"))
      keyed.join(broadcast(hourly), Seq("bucket"), "left")
        .select($"event_id", $"bucket", $"hourly_avg")
        .orderBy($"event_id")
    },
    Some("""WITH hourly AS (
        SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS bucket,
               round(avg(value), 6) AS hourly_avg
        FROM events GROUP BY 1)
      SELECT e.event_id, k.bucket, h.hourly_avg
      FROM events e
      CROSS JOIN LATERAL (SELECT CAST(epoch(CAST(
          substr(CAST(CAST(e.ts AS TIMESTAMP) AS VARCHAR), 1, 13) || ':00:00'
          AS TIMESTAMP)) AS BIGINT) AS bucket) k
      LEFT JOIN hourly h ON k.bucket = h.bucket
      ORDER BY e.event_id"""))

  /** O1/O2: global ORDER BY + LIMIT (top-k). Spark plans this as
    * TakeOrderedAndProject — per-partition top-k then driver merge,
    * no total sort, which is the right plan at 100 TB. */
  private val q7SortLimit = GraftQuery(
    "q7_sort_limit",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id", $"user_id", $"event_type", $"value")
        .orderBy($"value".desc, $"event_id".asc)
        .limit(100)
    },
    Some("""SELECT event_id, user_id, event_type, value FROM events
      ORDER BY value DESC, event_id ASC LIMIT 100"""))

  /** U1/U2: vertical union (reference: covid complement ∪ live data;
    * multi-file glob scan as implicit UNION ALL). */
  private val q8Union = GraftQuery(
    "q8_union",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val clicks = ev.filter($"event_type" === "click")
      val errors = ev.filter($"event_type" === "error")
      clicks.unionByName(errors)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      FROM (SELECT * FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT * FROM events WHERE event_type = 'error')
      GROUP BY event_type ORDER BY event_type"""))

  /** J4/U3: anti-join (reference: incremental-upload filename set
    * difference, operator_data_upload.py:123-131). */
  private val q9AntiJoin = GraftQuery(
    "q9_anti_join",
    (s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir).select($"c_custkey", $"c_name")
      val fOrders = Tables.orders(s, dir)
        .filter($"o_orderstatus" === "F").select($"o_custkey")
      cust.join(fOrders, $"c_custkey" === $"o_custkey", "left_anti")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  /** Semi-join (EXISTS): customers holding at least one open order. */
  private val q10SemiJoin = GraftQuery(
    "q10_semi_join",
    (s, dir) => {
      import s.implicits._
      val cust = Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment")
      val open = Tables.orders(s, dir)
        .filter($"o_orderstatus" === "O").select($"o_custkey")
      cust.join(open, $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_customers FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Window ranking (SURVEY §2.5 extension surface: top-k per group —
    * "top stations per month" analog). Deterministic tiebreak on the
    * unique key keeps the oracle hash stable. */
  private val q11WindowRank = GraftQuery(
    "q11_window_rank",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"p_brand")
        .orderBy($"p_retailprice".desc, $"p_partkey".asc)
      Tables.part(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"p_brand", $"rk", $"p_partkey", $"p_name", $"p_retailprice")
        .orderBy($"p_brand", $"rk")
    },
    Some("""SELECT p_brand, rk, p_partkey, p_name, p_retailprice FROM (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
               CAST(row_number() OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rk
        FROM part) WHERE rk <= 3
      ORDER BY p_brand, rk"""))

  /** Running-total window (rowsBetween unbounded-preceding..current).
    * Both engines accumulate in the same frame order, so the float
    * running sum is reproducible; rounded anyway. */
  private val q12WindowRunning = GraftQuery(
    "q12_window_running",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("running_value", round(sum($"value").over(w), 4))
        .drop("value", "ts")
        .orderBy($"user_id", $"event_id")
    },
    Some("""SELECT user_id, event_id,
        round(sum(value) OVER (PARTITION BY user_id
          ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
      FROM events WHERE event_type = 'purchase'
      ORDER BY user_id, event_id"""))

  /** F7/F8: time-dimension decomposition (reference dim_time_table,
    * spark_elt_emr.py:86-105) — distinct timestamps → calendar parts.
    * DuckDB widens date parts to BIGINT and 0-bases dayofweek; the
    * oracle casts/shifts to match Spark's INT, Sunday=1 semantics. */
  private val q13TimeDim = GraftQuery(
    "q13_time_dim",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"ts".cast("timestamp").as("start_time")).distinct()
        .select(
          $"start_time",
          minute($"start_time").as("minute"),
          hour($"start_time").as("hour"),
          dayofmonth($"start_time").as("day"),
          weekofyear($"start_time").as("week"),
          month($"start_time").as("month"),
          year($"start_time").as("year"),
          dayofweek($"start_time").as("weekday"))
        .orderBy($"start_time")
    },
    Some("""SELECT start_time,
        CAST(minute(start_time) AS INT) AS minute,
        CAST(hour(start_time) AS INT) AS hour,
        CAST(day(start_time) AS INT) AS day,
        CAST(weekofyear(start_time) AS INT) AS week,
        CAST(month(start_time) AS INT) AS month,
        CAST(year(start_time) AS INT) AS year,
        CAST(dayofweek(start_time) + 1 AS INT) AS weekday
      FROM (SELECT DISTINCT CAST(ts AS TIMESTAMP) AS start_time FROM events)
      ORDER BY start_time"""))

  /** F1/F2/F9: surrogate-key construction — md5 over concat of
    * stringified natural keys (reference fact id, spark_elt_emr.py:64)
    * plus a composite dim key (:72). DuckDB concat() ignores NULLs,
    * Spark's propagates — oracle uses `||` which propagates too. */
  private val q14SurrogateKeys = GraftQuery(
    "q14_surrogate_keys",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select(
          $"event_id",
          md5(concat(
            date_format($"ts", "yyyy-MM-dd HH:mm:ss"),
            $"event_id".cast("string"))).as("row_key"),
          concat($"event_type", lit("_"), $"user_id".cast("string")).as("type_user_key"),
          substring($"event_type", 1, 2).as("type_prefix"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
        md5(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
            || CAST(event_id AS VARCHAR)) AS row_key,
        event_type || '_' || CAST(user_id AS VARCHAR) AS type_user_key,
        substr(event_type, 1, 2) AS type_prefix
      FROM events ORDER BY event_id"""))

  /** F12/F13: conditional defaults + explicit casts. Spark CAST
    * double→int truncates while DuckDB rounds, so both sides floor()
    * first (the semantics the reference's implicit casts rely on are
    * Spark's; the oracle adapts). */
  private val q15Conditional = GraftQuery(
    "q15_conditional",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select(
          $"event_id",
          when($"value" > 100.0, lit("high"))
            .otherwise(lit("low")).as("value_band"),
          coalesce(nullif($"event_type", lit("error")), lit("ok")).as("masked_type"),
          floor($"value").cast("long").as("value_floor"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
        CASE WHEN value > 100 THEN 'high' ELSE 'low' END AS value_band,
        coalesce(nullif(event_type, 'error'), 'ok') AS masked_type,
        CAST(floor(value) AS BIGINT) AS value_floor
      FROM events ORDER BY event_id"""))

  /** F14: CTE through the engine's SQL surface (temp views + spark.sql,
    * the reference's native idiom, spark_elt_emr.py:87-91). */
  private val q16Cte = GraftQuery(
    "q16_cte",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
      s.sql("""
        WITH yearly AS (
          SELECT year(o_orderdate) AS order_year,
                 count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS total_price
          FROM graft_orders
          GROUP BY year(o_orderdate))
        SELECT order_year, n_orders, total_price
        FROM yearly
        WHERE n_orders > 100
        ORDER BY order_year""")
    },
    Some("""WITH yearly AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders GROUP BY 1)
      SELECT order_year, n_orders, total_price
      FROM yearly WHERE n_orders > 100
      ORDER BY order_year"""))

  /** A2/A3/A4: the reference's data-quality harness shape
    * (spark_check_emr.py:63-85) — named checks unioned into one
    * result: non-empty row counts and null-key counts. */
  private val q17QualityChecks = GraftQuery(
    "q17_quality_checks",
    (s, dir) => {
      import s.implicits._
      def cnt(df: DataFrame, name: String) =
        df.agg(count(lit(1)).as("observed")).select(lit(name).as("check_name"), $"observed")
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val ev = Tables.events(s, dir)
      cnt(li, "lineitem_nonempty")
        .unionByName(cnt(ord, "orders_nonempty"))
        .unionByName(cnt(ev, "events_nonempty"))
        .unionByName(cnt(li.filter($"l_orderkey".isNull), "lineitem_null_keys"))
        .unionByName(cnt(ord.filter($"o_orderkey".isNull), "orders_null_keys"))
        .orderBy($"check_name")
    },
    Some("""SELECT check_name, observed FROM (
        SELECT 'lineitem_nonempty' AS check_name, count(*) AS observed FROM lineitem
        UNION ALL SELECT 'orders_nonempty', count(*) FROM orders
        UNION ALL SELECT 'events_nonempty', count(*) FROM events
        UNION ALL SELECT 'lineitem_null_keys', count(*) FROM lineitem WHERE l_orderkey IS NULL
        UNION ALL SELECT 'orders_null_keys', count(*) FROM orders WHERE o_orderkey IS NULL)
      ORDER BY check_name"""))

  /** P1/P2: bulk column-name normalization (reference header cleanup,
    * spark_elt_emr.py:33-34/:56-57): uppercase-with-spaces headers →
    * lowercase_underscored, applied as a pure rename pipeline. */
  private val q18RenameNormalize = GraftQuery(
    "q18_rename_normalize",
    (s, dir) => {
      import s.implicits._
      val messy = Tables.events(s, dir)
        .select($"event_id".as("Event Id"), $"event_type".as("EVENT TYPE"),
          $"user_id".as("User Id"))
      val normalized = messy.toDF(
        messy.columns.map(_.replace(" ", "_").toLowerCase).toIndexedSeq: _*)
      normalized
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users"),
          count($"event_id").as("n_events"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
        count(event_id) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** GROUP BY + HAVING (extension analytics surface). */
  private val q19GroupHaving = GraftQuery(
    "q19_group_having",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
        .filter($"n_events" > 70)
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM events GROUP BY user_id HAVING count(*) > 70
      ORDER BY user_id"""))

  /** P4/A3: NULL-test filter over an outer join's unmatched side
    * (reference check: `WHERE id IS NULL`, spark_check_emr.py:65). */
  private val q20NullFilter = GraftQuery(
    "q20_null_filter",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
      val daily = ev.groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("n_events"))
      val sparse = ev.filter($"event_type" === "error" && $"value" > 400.0)
        .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("n_big_errors"))
      daily.join(sparse, Seq("day"), "left")
        .filter($"n_big_errors".isNull)
        .agg(count(lit(1)).as("days_without_big_errors"))
    },
    Some("""SELECT count(*) AS days_without_big_errors FROM (
        SELECT CAST(ts AS DATE) AS day FROM events GROUP BY 1) d
      LEFT JOIN (
        SELECT CAST(ts AS DATE) AS day FROM events
        WHERE event_type = 'error' AND value > 400 GROUP BY 1) s
      ON d.day = s.day
      WHERE s.day IS NULL"""))

  /** JSON scalar extraction (the reference only parses JSON at scan
    * time, S2; a data-lake engine needs it as an expression too). */
  private val q21JsonExtract = GraftQuery(
    "q21_json_extract",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select(
          $"event_id",
          get_json_object($"props", "$.k").cast("int").as("k_value"))
        .groupBy($"k_value")
        .agg(count(lit(1)).as("n"))
        .orderBy($"k_value")
    },
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
        count(*) AS n
      FROM events GROUP BY 1 ORDER BY 1"""))

  override def queries: Seq[GraftQuery] = Seq(
    q1Agg, q2JoinAgg, q3BroadcastJoin, q4Distinct, q5LeftJoinDate,
    q6HourBucketJoin, q7SortLimit, q8Union, q9AntiJoin, q10SemiJoin,
    q11WindowRank, q12WindowRunning, q13TimeDim, q14SurrogateKeys,
    q15Conditional, q16Cte, q17QualityChecks, q18RenameNormalize,
    q19GroupHaving, q20NullFilter, q21JsonExtract)
}
