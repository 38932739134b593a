package graft.engine

import java.sql.Timestamp

/** Typed row model of the reference schema
  * (faexport_db/schema/faexport_db.sql) — one case class per table,
  * nullable columns as Option. Surrogate ids are plain longs; at ingest
  * we derive them deterministically (xxhash64 of the natural key) so
  * child joins survive re-runs without INSERT..RETURNING round-trips
  * (SURVEY §1.5).
  */
object Model {

  /** faexport_db.sql:1–11 */
  case class WebsiteRow(website_id: String, full_name: String, link: String)

  /** faexport_db.sql:13–23 */
  case class ContributorRow(contributor_id: Long, name: String, api_key: String)

  /** faexport_db.sql:94–104 */
  case class HashAlgoRow(algo_id: Long, language: String, algorithm_name: String)

  /** faexport_db.sql:25–44 */
  case class UserSnapshotRow(
      user_snapshot_id: Long,
      website_id: String,
      site_user_id: String,
      scan_datetime: Timestamp,
      archive_contributor_id: Long,
      ingest_datetime: Timestamp,
      is_deleted: Boolean,
      display_name: Option[String],
      extra_data: Option[String])

  /** faexport_db.sql:46–69 */
  case class SubmissionSnapshotRow(
      submission_snapshot_id: Long,
      website_id: String,
      site_submission_id: String,
      scan_datetime: Timestamp,
      archive_contributor_id: Long,
      ingest_datetime: Timestamp,
      uploader_site_user_id: Option[String],
      is_deleted: Boolean,
      title: Option[String],
      description: Option[String],
      datetime_posted: Option[Timestamp],
      keywords_recorded: Boolean,
      extra_data: Option[String])

  /** faexport_db.sql:71–79; ordinal nullable for unordered-keyword
    * sites (README.md:20–21). */
  case class KeywordRow(
      keyword_id: Long,
      submission_snapshot_id: Long,
      keyword: String,
      ordinal: Option[Int])

  /** faexport_db.sql:81–92 */
  case class FileRow(
      file_id: Long,
      submission_snapshot_id: Long,
      site_file_id: Option[String],
      file_url: Option[String],
      file_size: Option[Long],
      extra_data: Option[String])

  /** faexport_db.sql:106–114 */
  case class FileHashRow(
      hash_id: Long,
      file_id: Long,
      algo_id: Long,
      hash_value: Array[Byte])
}
