package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain.bloomMightContain

/** Benchmark decontamination at eval-set sizes past the broadcast
  * limit. q77's exact path broadcasts the distinct eval-gram set into
  * the corpus-side join — right while the eval suite is small, dead
  * once it isn't (a 10M-gram eval set is past sensible broadcast
  * size, and the corpus side's exploded gram frame is the largest
  * frame in the whole pipeline — at 100 TB of text, ~100 G gram rows
  * hitting a shuffle join is the single most expensive exchange the
  * curation DAG would run).
  *
  * The fix is the classic bloom-prune + exact-confirm sandwich:
  *
  *  1. build a [[org.apache.spark.util.sketch.BloomFilter]] over the
  *     eval grams' xxhash64 (distributed treeAggregate, a few MB on
  *     the driver regardless of corpus size — sized by the eval-gram
  *     count, fpp 1%);
  *  2. prune the corpus gram frame with the NARROW
  *     `bloom_might_contain` filter BEFORE any exchange — only
  *     true-overlap grams plus ~fpp of the rest survive to shuffle;
  *  3. exact confirm join against the real eval-gram set (no
  *     broadcast hint — AQE picks; the probe side is already tiny),
  *     which removes every bloom false positive.
  *
  * Net: identical output to the exact path (the oracle replays the
  * plain join), with shuffle volume proportional to the overlap
  * instead of the corpus. Reference analog: none — the reference has
  * no dedup/decontamination at all; this is the LLM-pipeline suite.
  *
  * Filter sizing: ~1.2 MB per million distinct eval grams at fpp
  * 0.01, shipped with the task binary. A truly enormous eval set
  * (≫100M grams) should raise fpp instead of growing the filter —
  * the confirm join keeps the output exact at ANY fpp; fpp only
  * moves the prune's selectivity, trading shuffle rows for filter
  * bytes. Measured curve: SCALE_EVIDENCE.json "decontamination".
  */
object Decontaminate {

  /** (doc_id, n_contaminated_grams) for every corpus doc sharing at
    * least one k-token gram with `evalDocs` — exact, bloom-accelerated.
    * The `evalDocs.count()`-derived filter sizing is a driver action
    * on the (small) distinct gram frame, same class of action as
    * collecting a broadcast dimension. */
  def flagOverlap(corpus: DataFrame, evalDocs: DataFrame, k: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    // retained: the frame feeds the count, the filter build, and the
    // confirm join (released by the caller's withRetained scope)
    val evalGrams = graft.engine.CacheRegistry.retain(evalDocs
      .select(explode(Dedup.shingles(col("text"), k)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct())
    val bf = evalGrams.stat.bloomFilter("gh",
      math.max(evalGrams.count(), 1L), fpp)
    corpus
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), k)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .filter(bloomMightContain(col("gh"), bf))
      .join(evalGrams, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_grams"))
  }
}
