package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions for oracle parity (driver compares Spark parquet output
  * against DuckDB running `oracleSql` on the same tables):
  *  - every query output is deterministically and totally ordered;
  *  - double aggregates are `round(...)`-ed on BOTH sides (partial-agg
  *    summation order differs between engines in the last ulp);
  *  - timestamps are emitted as epoch-millis BIGINT (`unix_millis` /
  *    `epoch_ms`) so parquet timestamp encodings never skew the compare;
  *  - pure row-level double arithmetic (a*b) is NOT rounded — IEEE 754
  *    gives bit-identical results in both engines.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(spark, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------------
    // Relational core (reference = DataFusion-inherited, SURVEY §2.2-2.5)
    // ------------------------------------------------------------------
    "q1_agg" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "q2_filter_project" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount" > 0.05 && $"l_quantity" < 24)
        .select($"l_orderkey", $"l_linenumber",
          ($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q3_join_agg" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total_price"))
        .orderBy($"n_name")
    }),

    "q4_semi_join" -> ((s, d) => {
      import s.implicits._
      val big = t(s, d, "lineitem").filter($"l_quantity" > 45)
      t(s, d, "orders")
        .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    "q5_anti_join" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .join(t(s, d, "orders").filter($"o_totalprice" > 400000),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    }),

    "q6_topk" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .groupBy($"l_orderkey")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // ------------------------------------------------------------------
    // Time windows (reference's core operator, SURVEY §2.4) — run in
    // batch mode here; streaming path is exercised in ScalaTest specs.
    // ------------------------------------------------------------------
    "q7_window_tumbling" -> ((s, d) => {
      import s.implicits._
      t(s, d, "events")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .select(unix_millis($"w.start").as("window_start_ms"),
          unix_millis($"w.end").as("window_end_ms"),
          $"event_type", $"n", $"total_value")
        .orderBy($"window_start_ms", $"event_type")
    }),
  )

  /** DuckDB-runnable oracle SQL, column-name-aligned with `queries`. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount > 0.05 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_join_agg" ->
      """SELECT n_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q4_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q5_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q6_topk" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q7_window_tumbling" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
        |  epoch_ms(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS window_end_ms,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY window_start_ms, event_type""".stripMargin,
  )
}
