package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time individual queries by name at SPARK_GRAFT_SF_DIR. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    GraftSession.requireSqlSurface(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    for (q <- args; r <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[qtime] $q run$r ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      graft.engine.CacheRegistry.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
