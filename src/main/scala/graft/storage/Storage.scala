package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table registry — replaces the reference's Database object
  * (faexport_db/db.py:53–137) and schema bootstrap
  * (faexport_db/schema/faexport_db.sql).
  *
  * Layout: one directory per table under a root; the append-only fact
  * tables (`user_snapshots`, `submission_snapshots` and their children)
  * are hive-partitioned by `website_id` because every reference read
  * path filters on it (web.py:68–153) — partition pruning replaces the
  * covering indexes of indexes.sql:6–24. Bulk-insert chunking
  * (db.py:102–127, 1000 rows/statement) is subsumed by parquet row
  * groups; "deferred index builds" (indexes.sql:1–3) are moot.
  *
  * 100 TB note: for shuffle-free merge-on-read, write snapshot tables
  * sorted within partitions by the entity key
  * (`sortWithinPartitions`) so the M-family groupBy can use
  * sort-based aggregation without re-sorting; with a catalog, the same
  * tables would be `bucketBy(entityKey)` to remove the merge shuffle
  * entirely (SURVEY §4.4).
  */
class Storage(spark: SparkSession, root: String) {

  private val partitioned = Set(
    "user_snapshots", "submission_snapshots")

  def path(table: String): String = s"$root/$table"

  def append(table: String, df: DataFrame): Unit = {
    val w = df.write.mode(SaveMode.Append)
    if (partitioned(table)) w.partitionBy("website_id").parquet(path(table))
    else w.parquet(path(table))
  }

  def overwrite(table: String, df: DataFrame): Unit = {
    // rewrite via temp dir: reading and overwriting the same parquet
    // path in one job is unsafe
    val tmp = s"$root/.tmp_$table"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path(table))
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def exists(table: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(path(table)))
  }

  /** Bucketed append via the catalog (SURVEY §4.4 "bucket/sort the
    * snapshot tables by entity key so merge becomes a shuffle-free
    * aggregation"): rows are hash-bucketed and sorted by the entity
    * key at write time, so the M-family `groupBy(entityKey)` reads
    * bucket-local data and the Exchange disappears from the merge plan
    * (asserted in StorageSpec). This is the 100 TB layout — the
    * shuffle this removes is the single largest cost in merge-on-read
    * at scale. */
  def appendBucketed(table: String, df: DataFrame, bucketCols: Seq[String],
      numBuckets: Int = 64): Unit = {
    df.write.mode(SaveMode.Append)
      .format("parquet")
      .option("path", path(table))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Bucketed write with a sort order FINER than the bucket key (e.g.
    * bucket by entity, sort by (entity, time, tieBreak) — the at-rest
    * layout a merge-ordered reader needs). The input is repartitioned
    * onto the bucket key with numBuckets partitions first: Spark's
    * bucket-id function IS HashPartitioning's, so each write task then
    * holds exactly one bucket and writes exactly one file — the
    * one-file-per-bucket condition under which the scan reports its
    * sort order and downstream operators skip their Sort entirely. */
  def appendBucketedSorted(table: String, df: DataFrame,
      bucketCols: Seq[String], sortCols: Seq[String],
      numBuckets: Int = 64): Unit = {
    // fail fast on a second write: one-file-per-bucket (what lets the
    // scan report its at-rest sort and downstream plans skip their
    // Sort) only holds for the FIRST write — a later Append makes a
    // second file per bucket and the plan contract silently breaks
    // (answers stay right, the dim-side Sort quietly returns). Every
    // legitimate caller is a build-once/rebuild path that starts from
    // a dropped table.
    require(!spark.catalog.tableExists(table) && !exists(table),
      s"appendBucketedSorted('$table') targets a table that already " +
        "exists — a second append breaks the one-file-per-bucket sorted-" +
        "scan contract; drop and rebuild the table instead")
    df.repartition(numBuckets, bucketCols.map(df.col): _*)
      .write.mode(SaveMode.Append)
      .format("parquet")
      .option("path", path(table))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table through the catalog (bucket metadata only
    * lives there; a bare parquet read would lose it). */
  def readBucketed(table: String): DataFrame = spark.table(table)

  /** Catalog-registered append, hive-partitioned by `partitionCols`
    * — the at-rest layout for probe-style reads (e.g. the cosine
    * index member table partitioned by cell): a reader filtering on
    * the partition column touches only the matching directories
    * (static or dynamic partition pruning). */
  def appendPartitioned(table: String, df: DataFrame,
      partitionCols: Seq[String]): Unit = {
    df.write.mode(SaveMode.Append)
      .format("parquet")
      .option("path", path(table))
      .partitionBy(partitionCols: _*)
      .saveAsTable(table)
  }

  /** Catalog-registered plain append (small unpartitioned tables that
    * travel with a partitioned/bucketed store, e.g. centroids). */
  def appendTable(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append)
      .format("parquet")
      .option("path", path(table))
      .saveAsTable(table)

  /** A10/A11 get-or-create dimension upsert: append only the rows whose
    * natural key is absent (archive_contributor.py:41–57 ON CONFLICT DO
    * NOTHING; website.py:46–55 EXISTS check). */
  def upsertDimension(table: String, rows: DataFrame, keyCols: Seq[String]): Unit = {
    if (!exists(table)) append(table, rows.dropDuplicates(keyCols))
    else {
      val fresh = rows.dropDuplicates(keyCols)
        .join(read(table), keyCols, "left_anti")
      if (!fresh.isEmpty) append(table, fresh)
    }
  }

  /** Small-files compaction — the operational companion of streaming
    * ingest: micro-batch appends accumulate many small parquet files,
    * degrading scan parallelism and footer overhead at scale. Rewrites
    * the table into ~`targetFiles` files (per hive partition when the
    * table is partitioned) via the same temp-dir swap as [[overwrite]].
    * Contents are unchanged — compaction is pure layout maintenance. */
  def compact(table: String, targetFiles: Int = 1): Unit = {
    val df = read(table)
    val tmp = s"$root/.tmp_$table"
    val w = df.repartition(targetFiles).write.mode(SaveMode.Overwrite)
    if (partitioned(table)) w.partitionBy("website_id").parquet(tmp)
    else w.parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path(table))
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Settings bootstrap — version seed row (faexport_db.sql:116–124). */
  def initSettings(): Unit = {
    import spark.implicits._
    upsertDimension("settings",
      Seq(("version", "0.2.1")).toDF("setting_id", "setting_value"),
      Seq("setting_id"))
  }
}

object Storage {
  /** Catalog-safe per-directory table name: a readable sanitized tail
    * plus an md5 of the EXACT path, so two distinct dirs can never
    * share a table (same scheme as the q83 bucketed store,
    * MergeScaleQ.bucketedTableName). */
  def tableNameFor(prefix: String, dir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val readable = dir.replaceAll("[^A-Za-z0-9]", "_").takeRight(40)
    s"${prefix}_${readable}_$digest"
  }
}
