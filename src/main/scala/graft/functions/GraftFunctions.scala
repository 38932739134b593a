package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

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

  /** (name, builder) for every SQL-surfaced custom expression — the
    * single source both registration routes share: [[registerAll]]
    * (runtime, temp-function registry) and
    * [[graft.GraftExtensions]] (session build time, via
    * `spark.sql.extensions`). */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "json_merge_objects" ->
        ((exprs: Seq[Expression]) => JsonMergeObjects(exprs.head)),
      "merge_files" -> ((exprs: Seq[Expression]) => MergeFiles(exprs.head)),
      "long_to_big_endian_binary" ->
        ((exprs: Seq[Expression]) => LongToBigEndianBinary(exprs.head)),
      "minhash_signature" -> ((exprs: Seq[Expression]) =>
        MinhashSignatureExpr(exprs.head, exprs(1).eval().asInstanceOf[Int])),
      "simhash64" -> ((exprs: Seq[Expression]) => SimHash64Expr(exprs.head)),
      "shingles" -> ((exprs: Seq[Expression]) =>
        ShinglesExpr(exprs.head, exprs(1).eval().asInstanceOf[Int])),
      "dot_product" ->
        ((exprs: Seq[Expression]) => DotProductExpr(exprs.head, exprs(1))),
      "hamming_bytes" ->
        ((exprs: Seq[Expression]) => HammingBytesExpr(exprs.head, exprs(1))))

  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    // idempotent: callers re-enter per query (Tables.createViews runs
    // per Verify/Bench query); re-registering an identical builder is
    // harmless but floods the logs with "replaced a previously
    // registered function" warnings — the only content a truncated
    // driver artifact may capture
    builders.foreach { case (name, builder) =>
      if (!registry.functionExists(FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
