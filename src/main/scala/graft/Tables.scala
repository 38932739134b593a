package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's table registry role (reference:
  * faexport_db/db.py:53–89 — all reads flow through one Database object);
  * here every read flows through one parquet loader so path layout,
  * and any future bucketing/partitioning decisions, live in one place.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one driver table from an sf directory.
    *
    * `events.ts` encoding varies across driver testdata generations:
    * INT64 TIMESTAMP(NANOS) (through round 9) — which Spark's
    * vectorized reader refuses ([PARQUET_TYPE_ILLEGAL]) unless read
    * as a raw nanosecond long via the legacy flag set here — or plain
    * TIMESTAMP(MICROS) (round 10 on), where the flag is a no-op and
    * the column arrives as a timestamp. Consumers that do time
    * arithmetic canonicalize via EventsMerge.eventsTsMicros, which
    * handles both shapes exactly.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every driver table as a temp view (plus the custom
    * functions), giving `spark.sql` users the whole engine surface. */
  def createViews(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.registerAll(spark)
    all.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
  }

  /** Rebalance an under-partitioned scan before CPU-heavy per-row work
    * downstream: a single-row-group parquet file is ONE split, so the
    * map side of the first aggregation (partial collects, regex,
    * struct building) would run on one core. At real scale scans have
    * >= defaultParallelism splits and this is a no-op (no shuffle
    * added). Decode itself still happens in the scan task — use only
    * where downstream per-row work dominates decode.
    *
    * Width is estimated from the scan's file list, NOT
    * `df.rdd.getNumPartitions` — the RDD probe compiles a physical
    * plan on the driver per call. `inputFiles` walks the analyzed
    * plan's relations only. The estimate counts splittable files as
    * ceil(size / maxPartitionBytes) splits, so a few huge multi-split
    * files are not mistaken for an under-partitioned scan. A non-file
    * source (empty `inputFiles`) is left untouched — in this codebase
    * spread() guards parquet scans only. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty) df
    else {
      val maxSplit = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        .replaceAll("[^0-9]", "") match { case "" => 134217728L; case n => n.toLong }
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val estSplits = files.map { f =>
        try math.max(1L,
          (fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
            + maxSplit - 1) / maxSplit)
        catch { case _: java.io.IOException => 1L }
      }.sum
      if (estSplits < p) df.repartition(p) else df
    }
  }
}
