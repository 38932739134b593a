package graft.queries

/** Literal-VALUES oracles for the ingest queries — expected outputs
  * hand-derived from the reference converter semantics (each field
  * cross-checked against the cited lines in ingest.Formats: e621
  * main.py:49–97, fuzzysearch main.py:76–118, foxoblue main.py:43–75,
  * submission.py:281–306) and locked as goldens. */
object Oracles {
  val ingest: Map[String, String] = Map(
    "q36_ingest_e621" ->
      """SELECT website_id, site_submission_id, uploader_site_user_id,
        | is_deleted, scan_datetime, datetime_posted, description,
        | CAST(n_keywords AS BIGINT) AS n_keywords, kw_csv, file_url,
        | CAST(file_size AS BIGINT) AS file_size, file_extra,
        | CAST(algo_id AS BIGINT) AS algo_id, md5_hex, extra_data
        |FROM (VALUES
        | ('e621','1001','77',FALSE,'2022-07-13 00:00:00','2022-07-01 12:30:45',
        |  'A pic',3,'dragon,art,sky',
        |  'https://static1.e621.net/data/aa/bb/aabbccdd00112233445566778899aabb.png',
        |  12345,'{"width":800,"height":600,"ext":"png","duration":null}',1,
        |  'AABBCCDD00112233445566778899AABB',
        |  '{"sources":["https://a.example/x"],"rating":"s","locked_tags":[],"fav_count":5,"comment_count":2,"parent_id":"","change_seq":"12","approver_id":"","updated_datetime":"2022-07-02T00:00:00Z","is_pending":false,"is_flagged":false,"score":10,"up_score":12,"down_score":-2,"is_rating_locked":false,"is_status_locked":false,"is_note_locked":true}'),
        | ('e621','1002','88',TRUE,'2022-07-13 00:00:00','2022-07-03 08:00:00',
        |  'second',1,'wolf',
        |  'https://static1.e621.net/data/ff/ee/ffee00112233445566778899aabbccdd.swf',
        |  999,'{"width":-1,"height":-1,"ext":"swf","duration":0.0}',1,
        |  'FFEE00112233445566778899AABBCCDD',
        |  '{"sources":[""],"rating":"e","locked_tags":[],"fav_count":0,"comment_count":-1,"parent_id":"5","change_seq":"13","approver_id":"9","updated_datetime":null,"is_pending":true,"is_flagged":false,"score":-3,"up_score":0,"down_score":-5,"is_rating_locked":true,"is_status_locked":false,"is_note_locked":false}')
        |) t(website_id, site_submission_id, uploader_site_user_id, is_deleted,
        |    scan_datetime, datetime_posted, description, n_keywords, kw_csv,
        |    file_url, file_size, file_extra, algo_id, md5_hex, extra_data)""".stripMargin,
    "q37_validate_e621" ->
      """SELECT CAST(2 AS BIGINT) AS n_rows,
        | CAST(0 AS BIGINT) AS bad_created_at_parses,
        | CAST(0 AS BIGINT) AS bad_md5_len,
        | CAST(0 AS BIGINT) AS bad_is_deleted_domain,
        | CAST(0 AS BIGINT) AS bad_rating_domain,
        | CAST(0 AS BIGINT) AS bad_fav_count_nonneg,
        | CAST(0 AS BIGINT) AS bad_down_score_nonpos,
        | CAST(0 AS BIGINT) AS bad_up_score_nonneg,
        | CAST(0 AS BIGINT) AS bad_width_int,
        | CAST(0 AS BIGINT) AS bad_height_int""".stripMargin,
    "q38_ingest_fuzzysearch" ->
      """SELECT website_id, site_submission_id, scan_datetime, is_deleted,
        | datetime_posted, file_url, hashes_csv
        |FROM (VALUES
        | ('fa','222','2022-06-01 10:00:00',FALSE,'2022-05-30 00:00:00',
        |  'https://d.example/f.png','2:A5A5A5A5A5A5A5A5,4:AABBCCDD'),
        | ('e621','333','2022-05-02 00:00:00',TRUE,CAST(NULL AS VARCHAR),
        |  CAST(NULL AS VARCHAR),'2:0123456789ABCDEF')
        |) t(website_id, site_submission_id, scan_datetime, is_deleted,
        |    datetime_posted, file_url, hashes_csv)""".stripMargin,
    "q39_ingest_foxoblue" ->
      """SELECT website_id, site_user_id, scan_datetime, is_deleted
        |FROM (VALUES
        | ('fa','userA','2022-03-04 05:06:07',FALSE),
        | ('fa','userB','2022-01-02 00:00:00',FALSE),
        | ('fa','userD','2022-01-02 00:00:00',TRUE)
        |) t(website_id, site_user_id, scan_datetime, is_deleted)""".stripMargin,
    "q40_ingest_web_submission" ->
      """SELECT website_id, site_submission_id, scan_datetime, is_deleted,
        | keywords_recorded, title, kw_csv, site_file_id, file_url,
        | CAST(file_size AS BIGINT) AS file_size, hash_hex
        |FROM (VALUES
        | ('fa','55','2022-04-01 10:00:00',FALSE,TRUE,'T','a:1,b:0','f1',
        |  'https://u.example/1.png',10,'AABBCCDD')
        |) t(website_id, site_submission_id, scan_datetime, is_deleted,
        |    keywords_recorded, title, kw_csv, site_file_id, file_url,
        |    file_size, hash_hex)""".stripMargin)
}
