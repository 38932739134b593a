package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every SparkEntry
  * query against SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries are forced through the `noop` sink, not `count()` — count
  * lets Catalyst prune every computed column (a projection-only query
  * would measure nothing but the row count), while noop materializes
  * each output row exactly once with zero write cost.
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and the
  * per-query MEDIAN is reported — single-shot timings on a shared
  * machine mix JIT, page-cache, and scheduler noise into the number
  * (observed 69s vs 4s for the same unchanged query across rounds);
  * medians make the reported figure reproducible. Runs interleave
  * whole passes (pass 1 of all queries, then pass 2, …) so one query's
  * warm caches don't flatter its own immediate re-run.
  *
  * A small warmup job runs first so JVM/classloader startup isn't
  * billed to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch the biggest table + codegen machinery once
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to runs; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
      // queries persist() internally; no cross-run reuse — and drop
      // the registry's references so they don't accumulate over
      // 79 queries × runs
      graft.engine.CacheRegistry.releaseAll()
      spark.catalog.clearCache()
    }
    val results = names.map { case (name, _) =>
      val sorted = samples(name).sorted
      (name, sorted.head, sorted(sorted.size / 2), sorted.last)
    }
    val qs = results.map { case (k, _, med, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    // [min, median, max] per query so a cross-round swing on unchanged
    // code is attributable to shared-machine noise from the artifact
    // alone (observed 5–15× single-shot swings); `queries` stays the
    // plain median map for contract compatibility
    val spread = results
      .map { case (k, mn, med, mx) => "\"" + k + "\":[" + mn + "," + med + "," + mx + "]" }
      .mkString("{", ",", "}")
    val total = results.map(_._3).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"sf":"$sfDir"}"""
    println(json)
    // The driver snapshot keeps only a truncated tail of stdout (≈ the
    // last 32 queries), so the full per-query {min, median, max} map is
    // also written to a file that gets committed with the round —
    // without it, most of the corpus is invisible to round-over-round
    // trend analysis. Override the path with SPARK_GRAFT_BENCH_OUT.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL_latest.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
