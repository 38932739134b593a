package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge LEARNING — the tokenizer-training step that
  * produces the merge table a BPE tokenizer runs with (the reference
  * has nothing comparable; q56's BPE-ish token counting CONSUMES such
  * rules, this operator learns them). Classic corpus-level BPE à la
  * Sennrich: count symbol-pair frequencies weighted by word frequency,
  * merge the argmax pair everywhere (greedy left-to-right within each
  * word), repeat.
  *
  * Distribution shape — the same one production tokenizer trainers
  * use: the corpus is touched ONCE (whitespace word count, one
  * map-side-combined shuffle); every iteration thereafter runs on the
  * DISTINCT-WORD table (vocab-sized, ≪ corpus — millions of rows at
  * 100 TB, not billions), so N merges cost N small jobs, not N corpus
  * scans. Per iteration: pair counts are one grouped agg over
  * per-word adjacent symbol pairs (weighted by the precomputed word
  * freq); the winning pair is a TakeOrdered(1) — a SINGLE row to the
  * driver, the same broadcast-scalar-decision shape as a k-means
  * centroid collect; applying the merge is a narrow per-word fold.
  *
  * The fold uses a STRING accumulator ('|'-joined symbols, greedy
  * left-to-right: a tail symbol equal to `left` followed by `right`
  * collapses) — chosen because DuckDB's `list_reduce` can replay it
  * with identical semantics, making the learned rules AND their
  * application oracle-checkable end to end. Tokens must not contain
  * the '|' separator (whitespace-split tokens here cannot).
  */
object BpeTrain {

  /** (step, merge_left, merge_right, pair_count): the first
    * `numMerges` learned rules in order, ties broken by
    * (count desc, left asc, right asc) — a total order, so the
    * learned sequence is deterministic — plus a final
    * (numMerges+1, '&lt;eos&gt;', '&lt;eos&gt;', Σ freq·|symbols|)
    * row that pins the post-merge segmentation of EVERY word. */
  def learnMerges(docs: DataFrame, textCol: String,
      numMerges: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    val (merges, words) = learn(docs, textCol, numMerges)
    val totalSyms = words.agg(sum(col("freq") * size(col("s"))))
      .collect()(0).getLong(0)
    spark.createDataFrame(
        merges :+ ((numMerges + 1L, "<eos>", "<eos>", totalSyms)))
      .toDF("step", "merge_left", "merge_right", "pair_count")
  }

  /** The learned tokenizer APPLIED: every distinct word with its
    * final symbol segmentation after `numMerges` learned merges —
    * the vocab-sized dictionary a tokenization pass broadcasts.
    * (word, freq, n_syms, syms = '|'-joined segmentation). */
  def segmentations(docs: DataFrame, textCol: String,
      numMerges: Int = 5): DataFrame =
    learn(docs, textCol, numMerges)._2
      .select(col("word"), col("freq"),
        size(col("s")).cast("long").as("n_syms"),
        array_join(col("s"), "|").as("syms"))

  private def learn(docs: DataFrame, textCol: String, numMerges: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = graft.engine.CacheRegistry.retain(docs
      .select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .withColumn("s", transform(sequence(lit(1), length($"word")),
        i => $"word".substr(i, lit(1)))))
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (step <- 1 to numMerges) {
      // Spark's sequence() counts DOWN when start > stop — guard the
      // single-symbol words instead of emitting a [1, 0] ramp
      val best = words
        .filter(size($"s") >= 2)
        .select($"freq", explode(transform(sequence(lit(1), size($"s") - 1),
          j => struct(element_at($"s", j).as("l"),
            element_at($"s", j + 1).as("r")))).as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"l".asc, $"r".asc)
        .limit(1).collect()(0)
      val (l, r) = (best.getString(0), best.getString(1))
      merges += ((step.toLong, l, r, best.getLong(2)))
      val folded = aggregate($"s", lit(""), (acc, x) =>
        when(acc === "", x)
          .when((acc === lit(l) ||
              endswith(acc, lit("|" + l))) && x === lit(r),
            when(acc === lit(l), lit(l + r))
              .otherwise(concat(
                acc.substr(lit(1), length(acc) - (l.length + 1)),
                lit("|" + l + r))))
          .otherwise(concat(acc, lit("|"), x)))
      words = graft.engine.CacheRegistry.retain(
        words.select($"word", $"freq", split(folded, "\\|").as("s")))
    }
    (merges.toSeq, words)
  }
}
