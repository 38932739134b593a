package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Merge
import graft.functions.JsonMergeObjects.jsonMergeObjects
import graft.functions.MergeFiles.mergeFiles

/** Dev-only: stage-by-stage timing of the q55 merge pipeline to find
  * where the wall-clock goes. Not part of the driver contract. */
object ProfileMerge {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val orders = Tables.t(spark, d, "orders")
    val lineitem = Tables.t(spark, d, "lineitem")
    val snaps = orders.select(
      $"o_orderkey".as("submission_snapshot_id"),
      lit("w").as("website_id"),
      $"o_custkey".cast("string").as("site_submission_id"),
      $"o_orderdate".as("scan_datetime"),
      ($"o_orderkey" % 2 + 1).as("archive_contributor_id"),
      $"o_orderdate".as("ingest_datetime"),
      when($"o_orderstatus" === "O", $"o_orderpriority").as("uploader_site_user_id"),
      ($"o_orderstatus" === "F").as("is_deleted"),
      when($"o_totalprice" > 100000, $"o_orderpriority").as("title"),
      lit(null).cast("string").as("description"),
      lit(null).cast("timestamp").as("datetime_posted"),
      ($"o_orderkey" % 2 === 0).as("keywords_recorded"),
      when($"o_orderkey" % 3 =!= 0,
        to_json(struct($"o_orderpriority".as("p")))).as("extra_data"))
    val keywords = lineitem.select(
      ($"l_orderkey" * 10 + $"l_linenumber").as("keyword_id"),
      $"l_orderkey".as("submission_snapshot_id"),
      $"l_returnflag".as("keyword"),
      $"l_linenumber".as("ordinal"))
    val files = lineitem.filter($"l_linenumber" <= 3).select(
      ($"l_orderkey" * 10 + $"l_linenumber").as("file_id"),
      $"l_orderkey".as("submission_snapshot_id"),
      ($"l_partkey" % 20).cast("string").as("site_file_id"),
      concat(lit("u"), ($"l_partkey" % 20)).as("file_url"),
      ($"l_quantity" * 10).cast("long").as("file_size"),
      lit(null).cast("string").as("extra_data"))
    val hashes = lineitem.filter($"l_linenumber" <= 3).select(
      ($"l_orderkey" * 10 + $"l_linenumber").as("hash_id"),
      ($"l_orderkey" * 10 + $"l_linenumber").as("file_id"),
      lit(1L).as("algo_id"),
      unhex(lpad(hex($"l_suppkey" % 200 + 1), 4, "0")).as("hash_value"))
    val contributors = Seq((1L, "c1", "k1"), (2L, "c2", "k2"))
      .toDF("contributor_id", "name", "api_key")

    val nested = Merge.nestedSubmissionSnapshots(
      snaps, keywords, files, hashes, contributors)

    time("nested hydration only")(nested)

    val scan = col("scan_datetime")
    val sid = col("submission_snapshot_id")

    time("groupBy count only")(
      nested.groupBy("website_id", "site_submission_id")
        .agg(count(lit(1)).as("snapshot_count")))

    time("scalar picks only (no collects)")(
      nested.groupBy("website_id", "site_submission_id")
        .agg(
          count(lit(1)).as("snapshot_count"),
          min(scan).as("first_scanned"),
          max(scan).as("latest_update"),
          max(struct(scan, sid, col("is_deleted").as("v"))).getField("v").as("is_deleted"),
          max(when(col("title").isNotNull, struct(scan, sid, col("title").as("v")))).getField("v").as("title")))

    time("+ extra_data collect+jsonMerge")(
      nested.groupBy("website_id", "site_submission_id")
        .agg(jsonMergeObjects(transform(
          sort_array(collect_list(when(col("extra_data").isNotNull,
            struct(scan, sid, col("extra_data").as("v"))))),
          x => x.getField("v"))).as("extra_data")))

    time("+ kw collect only")(
      nested.groupBy("website_id", "site_submission_id")
        .agg(max(when(col("keywords_recorded"),
          struct(scan, sid, coalesce(col("keywords"),
            array().cast("array<struct<keyword:string,ordinal:int>>")).as("v"))))
          .getField("v").as("kw_raw")))

    time("files collect only (no mergeFiles)")(
      nested.groupBy("website_id", "site_submission_id")
        .agg(flatten(transform(
          sort_array(collect_list(when(col("files").isNotNull,
            struct(scan, sid, col("files").as("v"))))),
          x => x.getField("v"))).as("files_flat")))

    time("files collect + mergeFiles")(
      nested.groupBy("website_id", "site_submission_id")
        .agg(mergeFiles(flatten(transform(
          sort_array(collect_list(when(col("files").isNotNull,
            struct(scan, sid, col("files").as("v"))))),
          x => x.getField("v")))).as("files")))

    time("full mergeSubmissions")(Merge.mergeSubmissions(nested))

    time("full q55 query")(
      queries.MergeScaleQ.queries("q55_merge_scale")(spark, d))

    spark.stop()
  }
}
