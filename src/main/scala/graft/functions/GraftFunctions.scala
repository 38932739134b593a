package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom Catalyst expressions —
  * after `registerAll`, `spark.sql` users can call them like builtins
  * (the engine's SQL surface is the DataFrame surface; these close the
  * gap for the custom semantics).
  *
  * Registered names:
  *  - `json_merge_objects(array<string>)` — M5 ordered JSON merge
  *  - `merge_files(array<struct…>)`       — M7 clash-aware file fold
  *  - `long_to_big_endian_binary(bigint)` — F9
  *  - `minhash_signature(array<string>, k)`
  *  - `simhash64(array<string>)`
  *  - `shingles(array<string>, w)`
  *  - `dot_product(array<float>, array<float>)`
  *  - `hamming_bytes(binary, binary)`
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "json_merge_objects", exprs => JsonMergeObjects(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "merge_files", exprs => MergeFiles(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "long_to_big_endian_binary", exprs => LongToBigEndianBinary(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "minhash_signature", exprs => MinhashSignatureExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    registry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "shingles", exprs => ShinglesExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    registry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProductExpr(exprs.head, exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "hamming_bytes", exprs => HammingBytesExpr(exprs.head, exprs(1)), "scala_udf")
  }
}
