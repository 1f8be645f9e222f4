package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables.{t, cents, tenK}
import graft.operators.AsOfJoin

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query aggregates doubles via exact integer scaling (see
  * [[graft.core.Tables]]) so results hash-match the DuckDB oracle bit-for-bit,
  * and carries an ORDER BY so row order is deterministic on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Projection + filter + grouped aggregation (TPC-H Q1 shape).
    // Reference surface: EngineMapTest/EngineAggregationTest map+agg queries.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))) / lit(100.0)).as("sum_base_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            / lit(1e6)).as("sum_disc_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))
            * (lit(100) + cents(col("l_tax")))) / lit(1e8)).as("sum_charge"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ── Tumbling 1-day window aggregation over the event stream.
    // Reference surface: GROUP BY TUMBLE(event_time, INTERVAL '1' DAY)
    // (README.md:8-18, EngineAggregationTest) — batch-incremental form.
    "q2_daily_events" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(
          date_trunc("day", col("ts")).as("day"),
          col("event_type")
        )
        .agg(
          count(lit(1)).as("n_events"),
          (sum(tenK(col("value"))) / lit(1e4)).as("sum_value"),
          countDistinct(col("user_id")).as("n_users")
        )
        .orderBy(col("day"), col("event_type"))
    }),

    // ── Top-N per group with deterministic tiebreak.
    // Reference surface: row_number() OVER (...) + place <= N (EngineTopNTest).
    "q3_topn_orders" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("place", row_number().over(w).cast("long"))
        .where(col("place") <= 3)
        .select("o_orderpriority", "place", "o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_orderpriority"), col("place"))
    }),

    // ── Stream-to-stream interval join (batch-incremental form).
    // Reference surface: LEFT JOIN ... ON key AND t BETWEEN t2 AND t2 + INTERVAL
    // (README.md:20-35, EngineJoinStreamToStreamTest).
    "q4_interval_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(
          l,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_outer"
        )
        .groupBy(col("o_orderkey"))
        .agg(
          count(col("l_partkey")).as("n_shipped_30d"),
          coalesce(sum(col("l_quantity").cast("long")), lit(0L)).as("qty_shipped_30d")
        )
        .orderBy(col("o_orderkey"))
    }),

    // ── Multi-join aggregate with broadcastable dimensions.
    "q6_revenue_by_nation" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          (sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
            / lit(1e6)).as("revenue"),
          count(lit(1)).as("n_items")
        )
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ── Changelog compaction / temporal-table snapshot: latest row per key.
    // Reference surface: temporal table registration (TransformEngine.scala:164-200).
    "q7_latest_by_key" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("user_id", "event_id", "event_type")
        .orderBy(col("user_id"))
    }),

    // ── Exact deduplication by content hash over the documents table.
    "q8_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(
          min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies")
        )
        .orderBy(col("content_hash"))
    }),

    // ── AS-OF join: each purchase event gets the user's latest prior 'view'.
    // Reference surface: FOR SYSTEM_TIME AS OF / LATERAL TABLE temporal join
    // (EngineJoinStreamToTemporalTableTest) — via graft.operators.AsOfJoin.
    "q5_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val probe = ev
        .where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val build = ev
        .where(col("event_type") === "view")
        .select(
          col("user_id"),
          col("ts").as("view_ts"),
          col("event_id").as("view_event_id")
        )
      AsOfJoin
        .leftAsOf(
          probe,
          build,
          keys = Seq("user_id"),
          probeTime = "ts",
          buildTime = "view_ts",
          buildCols = Seq("view_event_id" -> "last_view_event_id")
        )
        .select(
          col("event_id"),
          col("user_id"),
          (tenK(col("value")) / lit(1e4)).as("value"),
          col("last_view_event_id")
        )
        .orderBy(col("event_id"))
    })
  )

  /** DuckDB-runnable oracle per query (same column names & order-by). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) / 1e6 AS sum_disc_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) / 1e8 AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_daily_events" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(round(value*10000) AS BIGINT)) AS BIGINT) / 1e4 AS sum_value,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q3_topn_orders" ->
      """SELECT o_orderpriority, place, o_orderkey, o_custkey, o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS place
        |  FROM orders)
        |WHERE place <= 3
        |ORDER BY o_orderpriority, place""".stripMargin,

    "q4_interval_join" ->
      """SELECT o_orderkey,
        |  COUNT(l_partkey) AS n_shipped_30d,
        |  CAST(COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) AS BIGINT) AS qty_shipped_30d
        |FROM orders LEFT JOIN lineitem
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q6_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) / 1e6 AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q7_latest_by_key" ->
      """SELECT user_id, event_id, event_type
        |FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "q8_dedup_exact" ->
      """SELECT md5(text) AS content_hash,
        |  MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q5_asof_join" ->
      """SELECT p.event_id,
        |  p.user_id,
        |  CAST(round(p.value*10000) AS BIGINT) / 1e4 AS value,
        |  b.event_id AS last_view_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') b
        |  ON p.user_id = b.user_id AND p.ts >= b.ts
        |ORDER BY p.event_id""".stripMargin
  )
}
