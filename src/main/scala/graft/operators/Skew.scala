package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (builder brief: "salting for skew, AQE for
  * runtime re-plan"). AQE's skew-join handling covers joins; these
  * cover skewed AGGREGATIONS — e.g. merge-on-read when one entity has
  * millions of snapshots, or LSH buckets full of boilerplate docs —
  * where a single reducer would otherwise own the hot key.
  */
object Skew {

  /** Two-stage salted aggregation: rows are spread over `salts`
    * sub-keys (deterministically, by hashing tie-break columns so
    * re-runs are stable), partially aggregated per (key, salt), then
    * finally combined per key. Use for algebraic aggregates
    * (sum/count/min/max/struct-max latest-pick): both stages shuffle,
    * but the hot key's first-stage work fans out across `salts`
    * reducers instead of one.
    *
    * @param saltSource columns whose hash spreads rows (any stable
    *                   per-row columns, e.g. the snapshot id)
    * @param partial    aggregates applied per (key, salt)
    * @param finalAgg   aggregates combining the partials per key —
    *                   column names must line up with `partial` outputs
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Seq[Column],
      salts: Int,
      partial: Seq[Column],
      finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(saltSource: _*), lit(salts)))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted per-key count — the common case packaged. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltSource: Seq[Column],
      salts: Int = 16): DataFrame =
    saltedAggregate(df, keys, saltSource, salts,
      partial = Seq(count(lit(1)).as("__n")),
      finalAgg = Seq(sum(col("__n")).as("n")))
}
