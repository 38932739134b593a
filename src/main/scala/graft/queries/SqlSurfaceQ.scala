package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The `spark.sql` surface: temp views over the driver tables plus the
  * registered custom functions (GraftFunctions), exercised end to end
  * — declarative SQL goes through the same Catalyst planning as the
  * DataFrame queries, so both front doors are checked. */
object SqlSurfaceQ {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q4-shaped correlated EXISTS, pure SQL text. */
  private val q53SqlExists: Q = (s, d) => {
    Tables.createViews(s, d)
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** Custom Catalyst expression called from SQL (`shingles` is
    * registered in the session function registry). */
  private val q54SqlCustomFunc: Q = (s, d) => {
    Tables.createViews(s, d)
    s.sql(
      """SELECT doc_id,
        |  CAST(size(shingles(split(lower(trim(text)), '\\s+'), 3)) AS BIGINT)
        |    AS n_shingles
        |FROM documents""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q53_sql_exists" -> q53SqlExists,
    "q54_sql_custom_func" -> q54SqlCustomFunc)

  val oracles: Map[String, String] = Map(
    "q53_sql_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q54_sql_custom_func" ->
      """SELECT doc_id, CAST(CASE WHEN length(t) >= 3
        |  THEN length(list_distinct(list_transform(range(0, length(t) - 2),
        |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])))
        |  ELSE 1 END AS BIGINT) AS n_shingles
        |FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |      FROM documents)""".stripMargin)
}
