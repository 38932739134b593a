package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the long-document pretreatment
  * that turns raw documents into overlapping fixed-size token windows
  * before packing (q98) or retrieval indexing: window `window` tokens,
  * step `stride` (< window ⇒ adjacent chunks share `window − stride`
  * tokens of context so no span is ever cut without overlap coverage).
  *
  * Chunk count for an n-token document is 1 if n ≤ window, else
  * 1 + ⌈(n − window) / stride⌉ — the last window is allowed to run
  * short so every token is covered exactly by construction (start of
  * chunk i is i·stride; the final start is < n). Everything emitted is
  * a pure function of the token array, so the whole operator is
  * oracle-replayable: (doc_id, chunk_idx, start_tok, n_tok, md5 of the
  * space-joined chunk).
  *
  * Scale shape: narrow per-row explode with fan-out n/stride — no
  * shuffle, no state, pipelines straight into the scan. The md5 is the
  * downstream dedup key (chunk-level exact dedup composes with q23 for
  * free).
  *
  * Reference analog: none — the reference has no text pipeline; this
  * is the LLM-pipeline suite.
  */
object Chunker {

  /** Chunk token arrays in `tokensCol`; emits one row per chunk. */
  def chunkTokens(docs: DataFrame, idCol: String, tokensCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val n = size(col(tokensCol))
    val nChunks: Column = when(n <= window, lit(1))
      .otherwise(ceil((n - lit(window)).cast("double") / stride).cast("int")
        + lit(1))
    docs
      .select(col(idCol).as("doc_id"), col(tokensCol).as("w"), n.as("n"),
        nChunks.as("nc"))
      .select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0), col("nc") - 1)).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("chunk_idx"),
        (col("i") * stride).cast("long").as("start_tok"),
        least(lit(window), col("n") - col("i") * stride).cast("long")
          .as("n_tok"),
        md5(array_join(slice(col("w"), col("i") * stride + 1,
          least(lit(window), col("n") - col("i") * stride)), " "))
          .as("chunk_md5"))
  }

  /** Convenience: tokenize `textCol` with the suite-standard
    * whitespace tokenizer, then chunk. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 64, stride: Int = 48): DataFrame =
    chunkTokens(
      docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__toks")),
      idCol, "__toks", window, stride)
}
