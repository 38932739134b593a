package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump NAMED queries (args) to SPARK_GRAFT_OUT_DIR for a
  * targeted oracle compare, instead of the full all-query Verify run —
  * the iteration loop when one query's oracle is under repair.
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_OUT_DIR=... \
  *        sbt "runMain graft.VerifyOne q86_incremental_dedup" */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT_DIR", "/tmp/verify_one")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    GraftSession.requireSqlSurface(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (q <- args) {
      Verify.runOne(spark, sfDir, outDir, q, SparkEntry.queries(q))
      // runOne's withRetained scope must have released every frame the
      // query retained — same contract Verify's full loop enforces
      assert(graft.engine.CacheRegistry.liveCount == 0,
        s"$q leaked ${graft.engine.CacheRegistry.liveCount} retained frames")
      spark.catalog.clearCache()
    }
    // the dump is selfcheck-ready: oracle SQL for exactly the queries run
    Verify.writeOracleJson(outDir,
      SparkEntry.oracleSql.view.filterKeys(args.contains).toMap)
    spark.stop()
  }
}
