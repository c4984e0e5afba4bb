package graft.queries

import graft.{GraftQuery, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage for SURVEY.md §2 on the driver's
  * testdata tables. Each query exercises one operator family from the
  * reference's ELT (`spark_elt_emr.py`) / check (`spark_check_emr.py`)
  * surface, re-expressed Spark-first.
  */
object Relational extends QueryModule {

  /** A1/A2 family + grouped aggregation (the README's stated analysis
    * goal, README.md:5): TPC-H Q1-shaped pricing summary.
    * Two-phase HashAggregate; at 100 TB the partial agg runs map-side
    * so the shuffle carries only |groups| rows per partition.
    */
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
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""".stripMargin))

  override def queries: Seq[GraftQuery] = Seq(q1Agg)
}
