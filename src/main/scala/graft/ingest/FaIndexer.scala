package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fa_indexer bulk ingest (S4; scripts/ingest/fa_indexer/main.py).
  * Source: a directory tree of JSON files, each `{ "<id>": submission |
  * null }` (main.py:128–135). The reference's 10-process queue pipeline
  * (T4, main.py:116–144) is deleted, not ported — Spark partitions ARE
  * the parallelism; its broken `__main__` (SURVEY Appendix A4) is
  * skipped and only the working Processor semantics (34–113) are kept.
  */
object FaIndexer {

  private val entrySchema =
    "map<string, struct<id:bigint, username:string, title:string," +
      "description:string, date:string, rating:string," +
      "keywords:array<string>, filename:string>>"

  /** NUL-character cleanup (F15; main.py:71–83): submission 641877 gets
    * its NULs replaced with "/0" (mis-formatted date), all others are
    * stripped. */
  private def cleanDescription(id: Column, desc: Column): Column =
    when(id === 641877L, regexp_replace(desc, "\u0000", "/0"))
      .otherwise(regexp_replace(desc, "\u0000", ""))

  /** Parse a DataFrame of raw JSON file texts (`payloadCol`) into
    * nested submission snapshot rows. */
  def submissions(files: DataFrame, payloadCol: String,
      scanDatetime: Column, ingestDatetime: Column): DataFrame = {
    files
      .select(explode(map_values(
        from_json(col(payloadCol), entrySchema, Map.empty[String, String]))).as("s"))
      .filter(col("s").isNotNull)
      .select(
        lit("fa").as("website_id"),
        col("s.id").cast("string").as("site_submission_id"),
        scanDatetime.as("scan_datetime"),
        lit("fa-indexer data ingest").as("contributor_name"),
        ingestDatetime.as("ingest_datetime"),
        col("s.username").as("uploader_site_user_id"),
        lit(false).as("is_deleted"),
        col("s.title").as("title"),
        cleanDescription(col("s.id"), col("s.description")).as("description"),
        Formats.parseTs(col("s.date")).as("datetime_posted"),
        lit(true).as("keywords_recorded"),
        to_json(struct(col("s.rating").as("rating")),
          Map("ignoreNullFields" -> "false")).as("extra_data"),
        transform(col("s.keywords"),
          (k, i) => struct(k.as("keyword"), i.cast("int").as("ordinal"))).as("keywords"),
        array(struct(
          lit(null).cast("string").as("site_file_id"),
          col("s.filename").as("file_url"),
          lit(null).cast("long").as("file_size"),
          lit(null).cast("string").as("extra_data"),
          array().cast("array<struct<algo_id:bigint,hash_value:binary>>").as("hashes")))
          .as("files"))
  }

  /** One bare user snapshot per distinct uploader (A7 — the reference's
    * per-worker `seen_usernames` set, main.py:85–93, made global and
    * deterministic with dropDuplicates). */
  def uploaderUsers(nestedSubmissions: DataFrame): DataFrame =
    nestedSubmissions
      .select(
        col("website_id"),
        col("uploader_site_user_id").as("site_user_id"),
        col("scan_datetime"), col("contributor_name"), col("ingest_datetime"),
        lit(false).as("is_deleted"),
        lit(null).cast("string").as("display_name"),
        lit(null).cast("string").as("extra_data"))
      .dropDuplicates("website_id", "site_user_id")
}
