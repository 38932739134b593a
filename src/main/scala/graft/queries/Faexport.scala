package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Fixtures, Merge}

/** The faexport entity queries — Q1/Q2/Q7-shaped (SURVEY §2.9) — run
  * over the deterministic in-memory fixture corpus (Fixtures), since
  * the driver testdata has no faexport-shaped tables. The oracle for
  * each is a literal VALUES relation hand-derived from the reference
  * semantics (models/submission.py, models/file.py, models/user.py), so
  * the full M1–M8 merge is still hash-checked end-to-end by the t2
  * gate.
  *
  * Nested outputs (keywords, files, hashes) are rendered to
  * deterministic scalar encodings (csv of keywords, `algo:HEX` hash
  * pairs) because the compare layer hashes flat values.
  */
object Faexport {

  type Q = (SparkSession, String) => DataFrame

  private def fmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  private def mergedSubmissions(s: SparkSession): DataFrame =
    Merge.mergeSubmissions(Merge.nestedSubmissionSnapshots(
      Fixtures.submissionSnapshots(s), Fixtures.keywords(s),
      Fixtures.files(s), Fixtures.fileHashes(s), Fixtures.contributors(s)))

  /** Q1 view_submission merged shape (web.py:68–78,
    * submission.py:106–125) for every entity at once. */
  private val q30SubmissionMerge: Q = (s, _) => {
    import s.implicits._
    mergedSubmissions(s).select(
      $"website_id", $"site_submission_id", $"snapshot_count",
      fmt($"first_scanned").as("first_scanned"),
      fmt($"latest_update").as("latest_update"),
      $"is_deleted", $"uploader_site_user_id", $"title", $"description",
      fmt($"datetime_posted").as("datetime_posted"),
      concat_ws(",", transform($"keywords", k => k.getField("keyword"))).as("kw_csv"),
      $"extra_data",
      size($"files").cast("long").as("n_files"))
  }

  /** Q1 files detail — the merged file dict rendered per row
    * (submission.py:89–104 fold; file.py to_web_json:32–37). */
  private val q31MergedFiles: Q = (s, _) => {
    import s.implicits._
    mergedSubmissions(s)
      .select($"site_submission_id", posexplode($"files").as(Seq("file_pos", "f")))
      .select(
        $"site_submission_id",
        $"file_pos".cast("long").as("file_pos"),
        $"f.site_file_id".as("site_file_id"),
        $"f.file_url".as("file_url"),
        $"f.file_size".as("file_size"),
        $"f.extra_data".as("extra_data"),
        concat_ws(",", transform($"f.hashes", h =>
          concat(h.getField("algo_id").cast("string"), lit(":"),
            upper(hex(h.getField("hash_value")))))).as("hashes_csv"))
  }

  /** Q4 view_user merged shape (web.py:112–124, user.py:50–72). */
  private val q32UserMerge: Q = (s, _) => {
    import s.implicits._
    Merge.mergeUsers(Fixtures.userSnapshots(s)).select(
      $"website_id", $"site_user_id", $"snapshot_count",
      fmt($"first_scanned").as("first_scanned"),
      fmt($"latest_update").as("latest_update"),
      $"is_deleted", $"display_name", $"extra_data")
  }

  /** Q7 hash_search — 3-hop join chain filtered on (algo_id,
    * hash_value) (web.py:202–216, submission.py:400–448). */
  private val q33HashSearch: Q = (s, _) => {
    import s.implicits._
    val needle = Array(0xAA.toByte, 0xBB.toByte, 0x01.toByte)
    Fixtures.fileHashes(s)
      .filter($"algo_id" === 1L && $"hash_value" === lit(needle))
      .join(Fixtures.files(s), Seq("file_id"))
      .join(Fixtures.submissionSnapshots(s), Seq("submission_snapshot_id"))
      .join(broadcast(Fixtures.contributors(s)
        .select($"contributor_id".as("archive_contributor_id"),
          $"name".as("contributor_name"))),
        Seq("archive_contributor_id"), "left")
      .select($"submission_snapshot_id", $"website_id", $"site_submission_id",
        fmt($"scan_datetime").as("scan_datetime"), $"contributor_name")
  }

  /** Q2 view_submission_snapshots — nested hydration listing
    * (web.py:81–94, submission.py:127–133). */
  private val q34SnapshotListing: Q = (s, _) => {
    import s.implicits._
    Merge.nestedSubmissionSnapshots(
      Fixtures.submissionSnapshots(s), Fixtures.keywords(s),
      Fixtures.files(s), Fixtures.fileHashes(s), Fixtures.contributors(s))
      .select(
        $"submission_snapshot_id", $"website_id", $"site_submission_id",
        fmt($"scan_datetime").as("scan_datetime"), $"contributor_name",
        coalesce(size($"keywords"), lit(0)).cast("long").as("n_keywords"),
        coalesce(size($"files"), lit(0)).cast("long").as("n_files"))
  }

  val queries: Map[String, Q] = Map(
    "q30_submission_merge" -> q30SubmissionMerge,
    "q31_merged_files" -> q31MergedFiles,
    "q32_user_merge" -> q32UserMerge,
    "q33_hash_search" -> q33HashSearch,
    "q34_snapshot_listing" -> q34SnapshotListing)

  val oracles: Map[String, String] = Map(
    "q30_submission_merge" ->
      """SELECT website_id, site_submission_id,
        | CAST(snapshot_count AS BIGINT) AS snapshot_count,
        | first_scanned, latest_update, is_deleted, uploader_site_user_id,
        | title, description, datetime_posted, kw_csv, extra_data,
        | CAST(n_files AS BIGINT) AS n_files
        |FROM (VALUES
        | ('fa','s1',3,'2022-01-01 10:00:00','2022-03-01 10:00:00',TRUE,'u9',
        |  'Final Title','A description','2021-12-25 00:00:00','art,beta,wolf',
        |  '{"fav_count":3,"rating":"general","views":25}',2),
        | ('fa','s2',1,'2022-01-15 10:00:00','2022-01-15 10:00:00',FALSE,'u1',
        |  'Solo','d',CAST(NULL AS VARCHAR),'','{"x":1}',1)
        |) t(website_id, site_submission_id, snapshot_count, first_scanned,
        |    latest_update, is_deleted, uploader_site_user_id, title,
        |    description, datetime_posted, kw_csv, extra_data, n_files)""".stripMargin,
    "q31_merged_files" ->
      """SELECT site_submission_id, CAST(file_pos AS BIGINT) AS file_pos,
        | site_file_id, file_url, CAST(file_size AS BIGINT) AS file_size,
        | extra_data, hashes_csv
        |FROM (VALUES
        | ('s1',0,'f-main','https://cdn.fa/1-new.png',2000,CAST(NULL AS VARCHAR),'1:EEFF03'),
        | ('s1',1,'f-thumb','https://cdn.fa/1-thumb.jpg',500,CAST(NULL AS VARCHAR),''),
        | ('s2',0,CAST(NULL AS VARCHAR),'https://cdn.fa/2.png',42,CAST(NULL AS VARCHAR),'3:1234')
        |) t(site_submission_id, file_pos, site_file_id, file_url, file_size,
        |    extra_data, hashes_csv)""".stripMargin,
    "q32_user_merge" ->
      """SELECT website_id, site_user_id,
        | CAST(snapshot_count AS BIGINT) AS snapshot_count,
        | first_scanned, latest_update, is_deleted, display_name, extra_data
        |FROM (VALUES
        | ('fa','u9',2,'2022-01-05 10:00:00','2022-02-05 10:00:00',TRUE,'Niner',
        |  '{"age":5,"country":"US"}'),
        | ('fa','u1',1,'2022-01-20 10:00:00','2022-01-20 10:00:00',FALSE,'Uno',
        |  CAST(NULL AS VARCHAR))
        |) t(website_id, site_user_id, snapshot_count, first_scanned,
        |    latest_update, is_deleted, display_name, extra_data)""".stripMargin,
    "q33_hash_search" ->
      """SELECT CAST(submission_snapshot_id AS BIGINT) AS submission_snapshot_id,
        | website_id, site_submission_id, scan_datetime, contributor_name
        |FROM (VALUES
        | (101,'fa','s1','2022-01-01 10:00:00','alice'),
        | (102,'fa','s1','2022-02-01 10:00:00','bob')
        |) t(submission_snapshot_id, website_id, site_submission_id,
        |    scan_datetime, contributor_name)""".stripMargin,
    "q34_snapshot_listing" ->
      """SELECT CAST(submission_snapshot_id AS BIGINT) AS submission_snapshot_id,
        | website_id, site_submission_id, scan_datetime, contributor_name,
        | CAST(n_keywords AS BIGINT) AS n_keywords,
        | CAST(n_files AS BIGINT) AS n_files
        |FROM (VALUES
        | (101,'fa','s1','2022-01-01 10:00:00','alice',2,1),
        | (102,'fa','s1','2022-02-01 10:00:00','bob',0,1),
        | (103,'fa','s1','2022-03-01 10:00:00','alice',3,2),
        | (104,'fa','s2','2022-01-15 10:00:00','alice',0,1)
        |) t(submission_snapshot_id, website_id, site_submission_id,
        |    scan_datetime, contributor_name, n_keywords, n_files)""".stripMargin)
}
