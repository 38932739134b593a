package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: cross-validate the two near-dup candidate generators at a
  * scale the DuckDB oracle gate does not reach — the simhash
  * pigeonhole-complete path (q27) and the minhash banding path (q28)
  * must emit identical verified pair sets. */
object CrossCheck {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q27 = SparkEntry.queries("q27_simhash")(spark, d)
      .select("doc_a", "doc_b").persist()
    val q28 = SparkEntry.queries("q28_minhash_lsh")(spark, d)
      .select("doc_a", "doc_b").persist()
    val only27 = q27.except(q28).count()
    val only28 = q28.except(q27).count()
    println(s"[crosscheck] $d q27=${q27.count()} q28=${q28.count()} " +
      s"only_simhash=$only27 only_minhash=$only28")
    // jaccard distribution of the disagreement pairs
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val docs = Tables.t(spark, d, "documents")
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    def withJ(pairs: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      pairs
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round(Dedup.jaccard(col("sh_a"), col("sh_b")), 3).as("j"))
        .orderBy("j").collect()
        .foreach(r => println(s"[crosscheck] $tag ${r.getLong(0)},${r.getLong(1)} j=${r.getDouble(2)}"))
    }
    withJ(q27.except(q28), "missed_by_minhash")
    withJ(q28.except(q27), "missed_by_simhash")
    spark.stop()
  }
}
