package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timings/counts for the sketch-pair family. */
object ProfileSketch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    GraftSession.requireSqlSurface(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Dedup, SimhashPairs}

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val docs = Tables.t(spark, sfDir, "documents")
    println(s"[prof] docs=${docs.count()}")

    // simhash chunk candidates (q27 shape)
    val chunks = 8; val bits = 64 / chunks
    val sh = docs.select($"doc_id".as("doc"), Dedup.simhash($"text").as("simhash"))
    timed("simhash only")(sh.write.format("noop").mode("overwrite").save())
    val chunked = sh.select($"doc", $"simhash",
      explode(transform(sequence(lit(0), lit(chunks - 1)), c => struct(
        c.as("chunk_idx"),
        call_function("shiftright", $"simhash", c * bits)
          .bitwiseAND(lit((1L << bits) - 1)).as("chunk_value")))).as("ch"))
      .select($"doc", $"simhash", $"ch.chunk_idx", $"ch.chunk_value")
    val joined = chunked.select($"chunk_idx", $"chunk_value", $"doc".as("doc_a"), $"simhash".as("sim_a"))
      .join(chunked.select($"chunk_idx", $"chunk_value", $"doc".as("doc_b"), $"simhash".as("sim_b")),
        Seq("chunk_idx", "chunk_value"))
      .filter($"doc_a" < $"doc_b")
    val nCand = timed("simhash chunk join count")(joined.count())
    println(s"[prof] simhash raw candidates=$nCand")
    val nHam = timed("after hamming<=7")(
      joined.filter(Dedup.hamming($"sim_a", $"sim_b") <= 7).count())
    println(s"[prof] simhash hamming-pass=$nHam")
    val nDist = timed("distinct pairs")(
      joined.filter(Dedup.hamming($"sim_a", $"sim_b") <= 7)
        .select("doc_a", "doc_b").distinct().count())
    println(s"[prof] simhash distinct pairs=$nDist")
    timed("q27 full verifiedPairs")(
      SimhashPairs.verifiedPairs(docs, "doc_id", "text", 0.8, 8)
        .write.format("noop").mode("overwrite").save())
    graft.engine.CacheRegistry.releaseAll()

    // minhash banding (q28/q62 shape)
    val sh2 = docs.select($"doc_id".as("doc"), Dedup.shingles($"text").as("sh"))
    timed("shingles only")(sh2.write.format("noop").mode("overwrite").save())
    timed("shingles+minhash sig")(sh2.select($"doc",
      Dedup.minhashSignature($"sh", 32).as("sig"))
      .write.format("noop").mode("overwrite").save())
    timed("multiSketchPairs")(
      Dedup.multiSketchPairs(docs, "doc_id", "text", 0.8)
        .write.format("noop").mode("overwrite").save())
    graft.engine.CacheRegistry.releaseAll()
    val pairs = Dedup.multiSketchPairs(docs, "doc_id", "text", 0.8)
    timed("connectedComponents")(
      Dedup.connectedComponents(pairs, "doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save())
    graft.engine.CacheRegistry.releaseAll()
    spark.stop()
  }
}
