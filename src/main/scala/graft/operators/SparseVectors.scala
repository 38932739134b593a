package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed TF-IDF document vectors — the text→vector bridge for
  * corpora with no embedding column: the classic feature-hashing
  * trick (signed buckets, L2-normalized weights, top-m
  * sparsification) built from nothing but the token stream, feeding
  * the same similarity machinery the embedding suite uses.
  *
  * Hashing is md5-based and engine-portable end to end (the bucket IS
  * the first three hex chars of md5(term) — 4096 buckets — and the
  * sign is the parity of the fourth hex digit), so the DuckDB oracle
  * replays every weight bit for bit; a production variant would swap
  * md5 for xxhash64 % B with no other change. The IDF convention is
  * q68's: ln((N+1)/(df+1)).
  *
  * Scale shape: tf is one shuffle keyed (doc, term); df one shuffle
  * keyed term with the result broadcast back (vocab-sized, so the tf
  * side never re-shuffles for the join); the bucket aggregation
  * re-keys by (doc, bucket) with map-side partial aggregation — its
  * input is already one row per (doc, term), far smaller than the
  * token stream; the norm + top-m cut are doc-keyed aggregations over
  * each doc's ≤B bucket rows.
  * Nothing touches pairs until [[sparseTopK]], which joins only on
  * shared buckets of the sparsified (top-m) vectors — candidate
  * volume is Σ_b n_b², the same bucket-join shape as the LSH-ANN
  * path. B matters: at B=256 the 5k-doc bench corpus put ~65% of ALL
  * pairs in a shared bucket and the join degenerated to all-pairs
  * (measured 84 s); at B=4096 occupancy drops 16× and the same query
  * runs in seconds — size B so n·m/B stays task-sized, the same dial
  * as LSH bucket width.
  *
  * Reference analog: none — the reference has no text pipeline; this
  * is the LLM-pipeline suite.
  */
object SparseVectors {

  private val hexDigits = "0123456789abcdef"

  /** +1.0 / −1.0 from the parity of md5's fourth hex digit (the
    * first three are the bucket). */
  private def signOf(term: Column): Column =
    when((instr(lit(hexDigits), substring(md5(term), 4, 1)) - 1) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** Sparse hashed-TF-IDF components: (doc_id, bucket, wgt,
    * comp_rank) — the top `topM` buckets per document by |weight|
    * (ties by bucket), weights L2-normalized over the FULL hashed
    * vector before the cut and rounded to 6 places (ranking runs on
    * the rounded value so it is noise-robust and replayable). */
  def hashedTfidf(docs: DataFrame, idCol: String, textCol: String,
      topM: Int = 16): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.tokens(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w0 = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), substring(md5(col("term")), 1, 3).as("bucket"),
        (signOf(col("term")) * col("tf") *
          log((col("n_docs") + 1).cast("double") / (col("df") + 1)))
          .as("contrib"))
      .groupBy("doc_id", "bucket").agg(sum(col("contrib")).as("wraw"))
    val nrm = w0.groupBy("doc_id")
      .agg(sqrt(sum(col("wraw") * col("wraw"))).as("nn"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(abs(col("wgt")).desc, col("bucket").asc)
    w0.join(nrm, Seq("doc_id"))
      .select(col("doc_id"), col("bucket"),
        // + 0.0 normalizes IEEE -0.0 (a bucket whose contributions
        // cancel) so both engines emit the same zero
        (round(col("wraw") / col("nn"), 6) + lit(0.0)).as("wgt"))
      .withColumn("comp_rank", row_number().over(win).cast("long"))
      .filter(col("comp_rank") <= topM)
  }

  /** Top-k most-similar documents per document from sparsified
    * vectors: candidates = pairs sharing ≥1 bucket, similarity = the
    * partial dot over shared buckets (exact on the sparsified
    * vectors; positive-only neighbors), ranked (cos desc, neighbor id
    * asc). `components` is [[hashedTfidf]]'s output.
    *
    * Candidate volume is Σ_b n_b² over bucket occupancies — at corpus
    * scale the knob is B (more hash buckets ⇒ smaller n_b), exactly
    * the LSH bucket-sizing trade. */
  def sparseTopK(components: DataFrame, k: Int = 3): DataFrame = {
    val a = components.select(col("doc_id").as("qid"), col("bucket"),
      col("wgt").as("wa"))
    val b = components.select(col("doc_id").as("nid"), col("bucket"),
      col("wgt").as("wb"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    a.join(b, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid")
      .agg(round(sum(col("wa") * col("wb")), 6).as("cos"))
      .filter(col("cos") > 0)
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }
}
