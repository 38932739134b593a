package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns — the
  * standard 4× memory/bandwidth reduction for corpus-scale ANN (a
  * 100 TB float32 embedding store becomes 25 TB, and int dot products
  * vectorize wider on every CPU).
  *
  * q_i = round(x_i * 127 / max|x|), so values lie in [-127, 127].
  * Cosine similarity over quantized vectors is scale-free (each
  * vector's scale cancels in the normalization), so ANN ranking needs
  * only the quantized values; the scale column is kept for dequantized
  * dot products or distance estimates.
  *
  * Quantized values are carried as integral DOUBLEs: every product and
  * partial sum stays far below 2^53, so the arithmetic is EXACT and
  * engine-portable — a SQL oracle replays the entire quantized
  * pipeline bit-for-bit (float multiply-accumulate would not be).
  *
  * The scale is computed in its own column first: referencing the
  * max-abs subexpression inside the per-element lambda would
  * re-evaluate it once per element after CollapseProject (the nested
  * higher-order-function trap — see operators.Dedup notes).
  */
object Quantize {

  /** Adds `outCol` (array<double> of integers in [-127, 127]) and
    * `outCol + "_scale"` (the per-vector multiplier 127/max|x|; null
    * for all-zero vectors AND for vectors containing a null element,
    * whose quantized form is null too — the output array never has
    * null slots, so consumers like DotProductExpr may read elements
    * without per-slot null checks; callers filter on isNotNull). */
  def quantizeInt8(df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.withColumn(s"${outCol}_scale",
        when(forall(col(vecCol), x => x.isNotNull) && maxAbs > 0d,
          lit(127.0) / maxAbs))
      // whole-array null for zero vectors (NOT an array of null
      // elements — consumers like DotProductExpr read elements without
      // per-slot null checks); callers filter on isNotNull
      .withColumn(outCol,
        when(col(s"${outCol}_scale").isNotNull,
          transform(col(vecCol),
            x => round(x.cast("double") * col(s"${outCol}_scale")))))
  }
}
