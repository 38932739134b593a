package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the LATEST right
  * row with rightTime <= leftTime on the same key — the canonical
  * feature-store / market-data lookup ("what was the last known state
  * when this event happened"). The reference resolves this per entity
  * in Python at read time (latest snapshot before a date); here it is
  * a whole-corpus operator.
  *
  * Spark has no built-in as-of join, and the naive formulations are
  * scale traps: an inequality theta-join explodes to O(L·R) rows per
  * key before a per-left argmax; a windowed subquery per left row
  * re-scans the right side. This implementation uses the union +
  * ordered-window formulation instead: tag right rows side=0 and left
  * rows side=1, sort within each key by (time, side, tieBreak), and
  * carry the last non-null right payload forward. ONE shuffle on the
  * key, O((L+R) log(L+R)) per partition, zero row amplification.
  *
  * 100 TB: the only shuffle is the window's hash-partition on the key
  * — the same cost class as any keyed aggregation over both inputs.
  * A skewed key can be pre-split by coarse time bucket (carrying each
  * bucket's last right row into the next bucket) without changing the
  * semantics.
  *
  * Determinism: right rows tied on rightTime are ordered by `tieBreak`
  * and the LAST wins (i.e. the max tieBreak), so results are stable
  * under any partitioning. A right row at exactly leftTime matches
  * (<= semantics, side 0 sorts before side 1).
  *
  * Null times: right rows with a null rightTime are EXCLUDED — "no
  * timestamp" cannot satisfy `rightTime <= leftTime`, matching SQL
  * comparison semantics (a correlated `WHERE r.t <= l.t` drops them).
  * Left rows with a null leftTime get a null `asof` payload for the
  * same reason (they sort before every timestamped right row).
  *
  * Output: every left row and column, plus an `asof` struct of the
  * right side's non-key columns (null when no prior right row exists
  * — left-outer semantics).
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: String): DataFrame = {
    require(left.columns.forall(_ != "asof"),
      "left side already has an 'asof' column")
    val reserved = Set("__t", "__side", "__tie", "__payload")
    require((left.columns ++ right.columns).forall(!reserved.contains(_)),
      s"input columns may not use the reserved names ${reserved.mkString(", ")}")
    val leftCols = left.columns.filterNot(keys.contains).toSeq
    val rightPayloadCols = right.columns.filterNot(keys.contains).toSeq
    val rStruct = struct(rightPayloadCols.map(col): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val tieType = right.schema(tieBreak).dataType
    val leftSchema = left.schema

    val lSide = left.select(
      keys.map(col) ++ leftCols.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(rType).as("__payload")): _*)
    val rSide = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ leftCols.map(c =>
        lit(null).cast(leftSchema(c).dataType).as(c)) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        col(tieBreak).as("__tie"),
        rStruct.as("__payload")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__tie", "__payload")
  }
}
