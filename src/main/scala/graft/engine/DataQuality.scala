package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Validation as observation (SURVEY §5: "ported --validate rules as a
  * DataQuality module (observe() + constraint filters)").
  *
  * The reference's --validate mode is a separate full pass over the
  * dump with per-row asserts (ingestion_job.py:117–122); `observe`
  * attaches the same checks to the INGEST plan itself, so violation
  * counters come out of the one pass that was already running — zero
  * extra scans, and the same API works under Structured Streaming
  * (metrics per micro-batch via the listener).
  */
object DataQuality {

  /** Attach named violation counters to a DataFrame; read them back
    * with [[metricsOf]] after any action on the returned frame. */
  def observed(df: DataFrame, gateName: String,
      checks: Seq[(String, Column)]): DataFrame = {
    val counters = count(lit(1)).as("n_rows") +:
      checks.map { case (name, pred) => count(when(!pred, 1)).as(s"bad_$name") }
    df.observe(gateName, counters.head, counters.tail: _*)
  }

  /** The observed metrics row for a gate, after an action has run on
    * THIS Dataset's own QueryExecution (e.g. collect/count — a
    * `.write` spawns a separate execution; production code reads
    * metrics in a QueryExecutionListener / StreamingQueryListener
    * instead). */
  def metricsOf(df: DataFrame, gateName: String): Option[Row] =
    df.queryExecution.observedMetrics.get(gateName)

  /** Constraint filter: drop rows failing any check (the "skip bad
    * rows" ingest stance, P5), typically combined with [[observed]] so
    * the drop count is measured by the same plan. */
  def enforce(df: DataFrame, checks: Seq[(String, Column)]): DataFrame =
    checks.foldLeft(df) { case (d, (_, pred)) => d.filter(pred) }
}
