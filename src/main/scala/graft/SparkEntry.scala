package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every `queries` key has a matching DuckDB oracle in [[oracleSql]]
  * unless the operator is not ANSI-SQL-expressible (then a ScalaTest
  * spec carries correctness and the driver does a rows>0 check).
  */
object SparkEntry {

  /** Flagship: the reference's end-to-end sales summary on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    salesSummary(spark, "/root/testdata/sf0.001")

  // ---- §2.A retail ETL -------------------------------------------------

  private def onlineSales(s: SparkSession, dir: String) =
    RetailEtl.salesFromLineitem(Tables.lineitem(s, dir), Some("O"))
  private def storeSales(s: SparkSession, dir: String) =
    RetailEtl.salesFromLineitem(Tables.lineitem(s, dir), Some("F"))

  private def extractTyped(s: SparkSession, dir: String): DataFrame =
    RetailEtl.convertTyped(
      RetailEtl.asTransportStrings(
        RetailEtl.validateColumns(storeSales(s, dir))))

  private def unionSources(s: SparkSession, dir: String): DataFrame =
    RetailEtl.combine(
      onlineSales(s, dir).withColumn("source", lit("online")),
      storeSales(s, dir).withColumn("source", lit("store")))

  private def cleanSales(s: SparkSession, dir: String): DataFrame =
    RetailEtl.clean(RetailEtl.combine(onlineSales(s, dir), storeSales(s, dir)))

  private def salesSummary(s: SparkSession, dir: String): DataFrame =
    RetailEtl.pipeline(onlineSales(s, dir), storeSales(s, dir))

  private def dailySummary(s: SparkSession, dir: String): DataFrame =
    RetailEtl.dailySummary(cleanSales(s, dir))

  private def loadValidated(s: SparkSession, dir: String): DataFrame =
    RetailEtl.validateSummary(RetailEtl.aggregate(cleanSales(s, dir)))

  // ---- the inventory ---------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A retail ETL
    "etl_extract_typed" -> ((s, dir) => extractTyped(s, dir)),
    "etl_union_sources" -> ((s, dir) => unionSources(s, dir)),
    "etl_clean" -> ((s, dir) => cleanSales(s, dir)),
    "etl_sales_summary" -> ((s, dir) => salesSummary(s, dir)),
    "etl_daily_product_summary" -> ((s, dir) => dailySummary(s, dir)),
    "etl_load_validated" -> ((s, dir) => loadValidated(s, dir)),
    // §2.B analytics
    "q1_pricing_summary" -> ((s, dir) => Analytics.pricingSummary(Tables.lineitem(s, dir))),
    "q3_top_unshipped" -> ((s, dir) =>
      Analytics.topRevenueOrders(Tables.customer(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    "q5_regional_revenue" -> ((s, dir) =>
      Analytics.regionalRevenue(Tables.region(s, dir), Tables.nation(s, dir),
        Tables.customer(s, dir), Tables.supplier(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir), regionName = "ASIA")),
    "q_customer_enrich" -> ((s, dir) =>
      Analytics.enrichOrders(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir))),
    "q_topn_per_group" -> ((s, dir) =>
      Analytics.topCustomersPerSegment(Tables.customer(s, dir))
        .withColumn("rank_in_segment", col("rank_in_segment").cast("long"))),
    "q_running_totals" -> ((s, dir) => Analytics.runningTotals(Tables.orders(s, dir))),
    "q_semi_anti" -> ((s, dir) =>
      Analytics.customerOrderPresence(Tables.customer(s, dir), Tables.orders(s, dir))),
    "q_rollup_revenue" -> ((s, dir) =>
      Analytics.rollupRevenue(Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.nation(s, dir))),
    "q_events_hourly" -> ((s, dir) =>
      EventOps.hourlyStats(Tables.events(s, dir), withApproxUsers = false)),
    "q_events_sessionize" -> ((s, dir) => EventOps.sessionize(Tables.events(s, dir))),
    "q_events_pivot" -> ((s, dir) => EventOps.eventTypePivot(Tables.events(s, dir))),
    "q_events_json" -> ((s, dir) => EventOps.jsonPropStats(Tables.events(s, dir))),
  )

  // ---- DuckDB oracles --------------------------------------------------

  /** The lineitem→sales mapping as a SQL fragment (SURVEY.md §1). */
  private def salesSql(where: String): String =
    s"""SELECT l_orderkey * 10 + l_linenumber AS sale_id,
       | l_partkey AS product_id,
       | l_quantity AS quantity,
       | l_extendedprice AS sale_amount,
       | CAST(l_shipdate AS DATE) AS sale_date
       |FROM lineitem $where""".stripMargin.replace("\n", " ")

  private val cleanSalesSql: String =
    s"""SELECT * FROM (${salesSql("")}) s
       | WHERE sale_id IS NOT NULL AND product_id IS NOT NULL
       |   AND quantity IS NOT NULL AND sale_amount IS NOT NULL
       |   AND sale_date IS NOT NULL AND quantity > 0 AND sale_amount > 0""".stripMargin
      .replace("\n", " ")

  private val summarySql: String =
    s"""SELECT product_id, sum(quantity) AS total_quantity,
       | sum(sale_amount) AS total_sale_amount
       |FROM ($cleanSalesSql) c GROUP BY product_id""".stripMargin.replace("\n", " ")

  def oracleSql: Map[String, String] = Map(
    "etl_extract_typed" -> salesSql("WHERE l_linestatus = 'F'"),
    "etl_union_sources" ->
      ("""SELECT l_orderkey * 10 + l_linenumber AS sale_id, l_partkey AS product_id,
         | l_quantity AS quantity, l_extendedprice AS sale_amount,
         | CAST(l_shipdate AS DATE) AS sale_date,
         | CASE WHEN l_linestatus = 'O' THEN 'online' ELSE 'store' END AS source
         |FROM lineitem""".stripMargin.replace("\n", " ")),
    "etl_clean" -> cleanSalesSql,
    "etl_sales_summary" -> summarySql,
    "etl_daily_product_summary" ->
      s"""SELECT product_id, sale_date, sum(quantity) AS total_quantity,
         | sum(sale_amount) AS total_sale_amount, count(*) AS num_sales,
         | avg(sale_amount) AS avg_sale_amount
         |FROM ($cleanSalesSql) c GROUP BY product_id, sale_date""".stripMargin
        .replace("\n", " "),
    "etl_load_validated" -> summarySql,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | sum(l_extendedprice) AS sum_base_price,
        | sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        | sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        | avg(l_quantity) AS avg_qty, avg(l_extendedprice) AS avg_price,
        | avg(l_discount) AS avg_disc, count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "),
    "q3_top_unshipped" ->
      """SELECT o_orderkey, o_orderdate,
        | sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin.replace("\n", " "),
    "q5_regional_revenue" ->
      """SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name""".stripMargin.replace("\n", " "),
    "q_customer_enrich" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
        | c_name AS customer_name, c_mktsegment AS segment, n_name AS nation
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey""".stripMargin.replace("\n", " "),
    "q_topn_per_group" ->
      """SELECT c_mktsegment, rank_in_segment, c_custkey, c_name, c_acctbal FROM (
        | SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey) AS rank_in_segment
        | FROM customer) r WHERE rank_in_segment <= 5""".stripMargin.replace("\n", " "),
    "q_running_totals" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        | sum(o_totalprice) OVER w AS running_total,
        | avg(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
        .replace("\n", " "),
    "q_semi_anti" ->
      """SELECT c_custkey, c_name, 'has_order' AS status FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, c_name, 'no_order' AS status FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""
        .stripMargin.replace("\n", " "),
    "q_rollup_revenue" ->
      """SELECT n_name, c_mktsegment,
        | sum(o_totalprice) AS revenue, count(*) AS num_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin.replace("\n", " "),
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS num_events, sum(value) AS total_value,
        | avg(value) AS avg_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin
        .replace("\n", " "),
    "q_events_sessionize" ->
      """WITH flagged AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        | SELECT user_id, ts, value,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        | FROM flagged)
        |SELECT user_id, session_seq, min(ts) AS session_start,
        | max(ts) AS session_end, count(*) AS num_events, sum(value) AS total_value
        |FROM numbered GROUP BY user_id, session_seq""".stripMargin.replace("\n", " "),
    "q_events_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type = 'click') AS click,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(*) FILTER (WHERE event_type = 'error') AS error,
        | count(*) FILTER (WHERE event_type = 'signup') AS signup,
        | count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin.replace("\n", " "),
    "q_events_json" ->
      """SELECT k % 10 AS k_bucket, count(*) AS num_events,
        | avg(value) AS avg_value, max(k) AS max_k
        |FROM (SELECT CAST(props->>'$.k' AS BIGINT) AS k, value FROM events) e
        |WHERE k IS NOT NULL GROUP BY k % 10""".stripMargin.replace("\n", " "),
  )
}
