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
  *
  * Budget mode: the driver's bench invocation runs under a timeout it
  * does not announce (round 7 hit it: rc=124 under machine contention,
  * leaving the driver blind). SPARK_GRAFT_BENCH_BUDGET_SEC (default
  * 600) bounds measurement wall-clock — remaining passes are SKIPPED
  * once a completed pass crosses the budget (every query keeps at
  * least one sample; fewer passes only widens the median's noise), and
  * the flag lands in the JSON (`passes`, `budget_exceeded`). The full
  * result file is rewritten after every pass — and periodically during
  * the first — so even a hard kill mid-run leaves a parseable
  * per-query artifact.
  *
  * Per-query cap: any query whose measured pass exceeds
  * SPARK_GRAFT_BENCH_QUERY_CAP_SEC (default 60) keeps that sample but
  * runs NO further passes — its name lands in the JSON `capped` list.
  * One degenerate query (or a contention spike on one query) can no
  * longer starve the other ~100 queries of their remaining passes the
  * way round 9's 626 s > 600 s run lost pass 3 for everyone. Normal
  * queries are unaffected.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "600").toDouble
    val queryCapSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERY_CAP_SEC", "60").toDouble
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL_latest.json")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch the biggest table + codegen machinery once
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    // dev facility: SPARK_GRAFT_BENCH_ONLY=q102_semantic_dedup,q62_…
    // times just the named queries (same passes/medians machinery) —
    // for before/after comparisons of one operator without the full
    // 100-query sweep. Unset for the driver's full run.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val samples = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val capped = collection.mutable.LinkedHashSet.empty[String]
    val began = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - began) / 1e9

    /** One JSON line over every query sampled so far; written to
      * `outPath` on each call so ANY truncation of the surrounding
      * process leaves the latest complete snapshot on disk. */
    def snapshot(passes: Int, budgetExceeded: Boolean,
        partialPass: Boolean): String = {
      val results = names.collect { case (name, _) if samples(name).nonEmpty =>
        val sorted = samples(name).sorted
        (name, sorted.head, sorted(sorted.size / 2), sorted.last)
      }
      val qs = results.map { case (k, _, med, _) => "\"" + k + "\":" + med }
        .mkString("{", ",", "}")
      // [min, median, max] per query so a cross-round swing on
      // unchanged code is attributable to shared-machine noise from
      // the artifact alone (observed 5–15× single-shot swings);
      // `queries` stays the plain median map for contract
      // compatibility
      val spread = results
        .map { case (k, mn, med, mx) => "\"" + k + "\":[" + mn + "," + med + "," + mx + "]" }
        .mkString("{", ",", "}")
      val total = results.map(_._3).sum
      val cappedJson = capped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val json =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"sf":"$sfDir","passes":$passes,"budget_sec":$budgetSec,"budget_exceeded":$budgetExceeded,"partial_pass":$partialPass,"query_cap_sec":$queryCapSec,"capped":$cappedJson}"""
      // the driver snapshot keeps only a truncated tail of stdout, so
      // the full per-query map is also persisted to a committed file
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
      catch { case e: java.io.IOException =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
      }
      json
    }

    var pass = 0
    var budgetExceeded = false
    while (pass < runs && !budgetExceeded) {
      pass += 1
      var qIdx = 0
      for ((name, fn) <- names if !capped.contains(name)) {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        samples(name) = sec :: samples(name)
        if (sec > queryCapSec) {
          capped += name
          System.err.println(f"[bench] $name capped after $sec%.1f s " +
            s"(> $queryCapSec s); skipping its remaining passes")
        }
        // queries persist() internally; no cross-run reuse — and drop
        // the registry's references so they don't accumulate over
        // 92 queries × runs
        graft.engine.CacheRegistry.releaseAll()
        spark.catalog.clearCache()
        qIdx += 1
        // mid-first-pass checkpoints: a kill before any pass finishes
        // still leaves the queries measured so far
        if (pass == 1 && qIdx % 10 == 0 && qIdx < names.size)
          snapshot(passes = 0, budgetExceeded = false, partialPass = true)
      }
      budgetExceeded = pass < runs && elapsedSec > budgetSec
      snapshot(pass, budgetExceeded, partialPass = false)
    }
    println(snapshot(pass, budgetExceeded, partialPass = false))
    spark.stop()
  }
}
