package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Relational operator inventory (SURVEY §2.3–§2.5) expressed over the
  * driver's TPC-H-ish testdata (TESTDATA.md), one oracle-checked query
  * per operator family. Reference citations per query below.
  *
  * Scale notes (100 TB): every aggregate here is a hash aggregate with
  * map-side partial aggregation; dimension joins are explicitly
  * broadcast; fact-fact joins shuffle on their join key only. Doubles
  * that pass through an order-sensitive reduction are rounded before
  * emission so results are stable under any partitioning.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** A1 filtered counts/sums — reference issues one COUNT per listed
    * website (faexport_db/models/website.py:19–35, an N+1 we refuse to
    * copy); here one grouped aggregate computes all groups in one pass. */
  private val q01Agg: Q = (s, d) => {
    import s.implicits._
    t(s, d, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-01"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** A2 DISTINCT id listing (submission.py:193–200, web.py:143–146). */
  private val q02Distinct: Q = (s, d) => {
    import s.implicits._
    t(s, d, "orders").select($"o_custkey").distinct()
  }

  /** J1 equi join fact ⟕ broadcast dimension (submission.py:139–147:
    * snapshots ⟕ archive_contributors). */
  private val q03BroadcastJoin: Q = (s, d) => {
    import s.implicits._
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), $"o_custkey" === $"c_custkey", "left")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  /** J2 multi-hop join chain (hash search joins 4 tables,
    * submission.py:400–412); small dims broadcast. */
  private val q04JoinChain: Q = (s, d) => {
    import s.implicits._
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, d, "region")), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** J3 semi join — IN-list child fetch (keyword.py:86–109,
    * file.py:117–141). */
  private val q05SemiJoin: Q = (s, d) => {
    import s.implicits._
    val bigLines = t(s, d, "lineitem").filter($"l_quantity" >= 48)
    t(s, d, "orders")
      .join(bigLines, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"))
  }

  /** J4 anti join — orphan detection (cron/remove_duplicates.py:87–104:
    * LEFT JOIN parent WHERE parent IS NULL). */
  private val q06AntiJoin: Q = (s, d) => {
    import s.implicits._
    val urgent = t(s, d, "orders").filter($"o_orderpriority" === "1-URGENT")
    t(s, d, "customer")
      .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_mktsegment")
  }

  /** A6 dedup-rank window — row_number per entity key, keep rank 1
    * (remove_duplicates.py:107–124). */
  private val q07DedupRank: Q = (s, d) => {
    import s.implicits._
    // (l_orderkey, l_linenumber) is not unique in the synthetic data;
    // tie-break on the emitted l_partkey so the kept row is total-ordered.
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_linenumber".desc, $"l_partkey".desc)
    t(s, d, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_orderkey", $"l_linenumber".as("last_line"),
        $"l_partkey".as("last_part"))
  }

  /** A5 frequency count + top-k (e621_db_export/main.py:132–186:
    * Counter(...).most_common(5)); deterministic tie-break on key. */
  private val q08TopK: Q = (s, d) => {
    import s.implicits._
    t(s, d, "lineitem")
      .groupBy($"l_partkey")
      .agg(count(lit(1)).as("n_uses"))
      .orderBy($"n_uses".desc, $"l_partkey".asc)
      .limit(5)
  }

  /** A3/A4 min/max/count scan aggregates (fuzzysearch/main.py:58–75
    * earliest updated_at; ingestion_job.py:19–22 row counts). */
  private val q09MinMax: Q = (s, d) => {
    import s.implicits._
    t(s, d, "orders").agg(
      min($"o_orderdate").as("first_date"),
      max($"o_orderdate").as("last_date"),
      round(max($"o_totalprice"), 2).as("max_price"),
      round(min($"o_totalprice"), 2).as("min_price"),
      count(lit(1)).as("n_rows"))
  }

  /** A10 set-op union (get-or-create upsert shape,
    * archive_contributor.py:41–57). */
  private val q10Union: Q = (s, d) => {
    import s.implicits._
    val c = t(s, d, "customer")
    c.filter($"c_acctbal" > 9000).select($"c_custkey")
      .union(c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey"))
      .distinct()
  }

  /** A11 EXISTS check (website.py:46–55) as a semi-join count. */
  private val q11Exists: Q = (s, d) => {
    import s.implicits._
    t(s, d, "supplier")
      .join(t(s, d, "lineitem").filter($"l_quantity" >= 49),
        $"s_suppkey" === $"l_suppkey", "left_semi")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"))
  }

  /** F1–F7/F15 scalar string functions (id-from-URL tail split
    * faexport.py:24; substring/concat/cleanup §2.6). */
  private val q12ScalarFuncs: Q = (s, d) => {
    import s.implicits._
    t(s, d, "part").select(
      $"p_partkey",
      element_at(split($"p_name", " "), -1).as("name_last"),
      substring($"p_name", 1, 4).as("name_prefix"),
      upper($"p_brand").as("brand_up"),
      length($"p_name").cast("long").as("name_len"),
      concat_ws("/", $"p_brand", $"p_type").as("brand_type"),
      regexp_replace($"p_name", "\\s+", "_").as("name_snake"))
  }

  /** F10–F12 date functions (lenient parse/render db.py:34–50). */
  private val q13DateFuncs: Q = (s, d) => {
    import s.implicits._
    t(s, d, "orders")
      .groupBy(
        year($"o_orderdate").cast("long").as("y"),
        month($"o_orderdate").cast("long").as("m"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  /** A8 running-sum window (sort family §2.5) — per-customer ordered
    * prefix aggregation. */
  private val q14RunningWindow: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders").select(
      $"o_custkey", $"o_orderkey",
      round(sum($"o_totalprice").over(w), 2).as("running_total"))
  }

  /** Rollup with grouping-id (beyond the reference surface — standard
    * analytics completeness; subtotal rows disambiguated from genuine
    * nulls by GROUPING). */
  private val q57Rollup: Q = (s, d) => {
    import s.implicits._
    t(s, d, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"))
  }

  val queries: Map[String, Q] = Map(
    "q57_rollup" -> q57Rollup,
    "q01_agg" -> q01Agg,
    "q02_distinct" -> q02Distinct,
    "q03_broadcast_join" -> q03BroadcastJoin,
    "q04_join_chain" -> q04JoinChain,
    "q05_semi_join" -> q05SemiJoin,
    "q06_anti_join" -> q06AntiJoin,
    "q07_dedup_rank" -> q07DedupRank,
    "q08_topk" -> q08TopK,
    "q09_minmax" -> q09MinMax,
    "q10_union" -> q10Union,
    "q11_exists" -> q11Exists,
    "q12_scalar_funcs" -> q12ScalarFuncs,
    "q13_date_funcs" -> q13DateFuncs,
    "q14_running_window" -> q14RunningWindow)

  val oracles: Map[String, String] = Map(
    "q57_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_distinct" ->
      "SELECT DISTINCT o_custkey FROM orders",
    "q03_broadcast_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_join_chain" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n_orders
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderstatus""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q07_dedup_rank" ->
      """SELECT l_orderkey, l_linenumber AS last_line, l_partkey AS last_part
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY l_orderkey
        |        ORDER BY l_linenumber DESC, l_partkey DESC) AS rn
        |      FROM lineitem)
        |WHERE rn = 1""".stripMargin,
    "q08_topk" ->
      """SELECT l_partkey, count(*) AS n_uses FROM lineitem
        |GROUP BY l_partkey
        |ORDER BY n_uses DESC, l_partkey ASC LIMIT 5""".stripMargin,
    "q09_minmax" ->
      """SELECT min(o_orderdate) AS first_date, max(o_orderdate) AS last_date,
        | round(max(o_totalprice), 2) AS max_price,
        | round(min(o_totalprice), 2) AS min_price,
        | count(*) AS n_rows
        |FROM orders""".stripMargin,
    "q10_union" ->
      """SELECT DISTINCT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin,
    "q11_exists" ->
      """SELECT s_nationkey, count(*) AS n_suppliers FROM supplier
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
        |GROUP BY s_nationkey""".stripMargin,
    "q12_scalar_funcs" ->
      """SELECT p_partkey,
        | (string_split(p_name, ' '))[-1] AS name_last,
        | substr(p_name, 1, 4) AS name_prefix,
        | upper(p_brand) AS brand_up,
        | length(p_name) AS name_len,
        | p_brand || '/' || p_type AS brand_type,
        | regexp_replace(p_name, '\s+', '_', 'g') AS name_snake
        |FROM part""".stripMargin,
    "q13_date_funcs" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q14_running_window" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders""".stripMargin)
}
