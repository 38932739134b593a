package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-ranked vocabulary construction with a coverage curve —
  * the step that PRODUCES the broadcast vocab tables the scoring
  * operators consume (unigram-LM q75, OOV-style quality signals):
  * top-`vocabSize` tokens by corpus frequency, each with its rank and
  * the cumulative share of all token occurrences covered up to that
  * rank (the curve a tokenizer team reads to pick a vocab size).
  *
  * Reference analog: none — the reference stores keywords verbatim
  * (faexport_db/models/keywords.py); this is the LLM-pipeline suite.
  *
  * At 100 TB: the token count is one map-side-combined grouped agg
  * (the only corpus-scale shuffle — partial counts per partition, so
  * the exchange carries one row per distinct token per partition, not
  * one per occurrence). The top-V cut uses orderBy+limit, which Spark
  * plans as TakeOrderedAndProject — a per-partition top-V plus a
  * driver-side merge of V-row heaps, NO global sort shuffle. Rank and
  * cumulative coverage then run in a single-partition window that is
  * BOUNDED BY THE CONSTANT V (not by data size) — the same
  * "single-partition stage carries only a bounded frame" contract as
  * q88/q96/q98 — and the grand total rides in as a one-row broadcast.
  */
object Vocab {

  /** (rank, token, n, cum_coverage): top-`vocabSize` tokens by
    * (count desc, token asc) — a total order, so the boundary cut is
    * deterministic; `cum_coverage` is the running occurrence share
    * rounded to 6 dp for engine-portable hashing. */
  def coverage(docs: DataFrame, textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    val counts = docs
      .select(explode(Dedup.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).cast("double").as("tot"))
    val top = counts.orderBy(col("n").desc, col("token").asc).limit(vocabSize)
    val w = Window.orderBy(col("n").desc, col("token").asc)
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("token"), col("n"),
        round(col("cum") / col("tot"), 6).as("cum_coverage"))
  }
}
