package graft.queries

/** Literal-VALUES oracles for the ingest queries — expected outputs
  * hand-derived from the reference converter semantics (each field
  * cross-checked against the cited lines in ingest.Formats: e621
  * main.py:49–97, fuzzysearch main.py:76–118, foxoblue main.py:43–75,
  * submission.py:281–306) and locked as goldens. */
object Oracles {
  val webListing: Map[String, String] = Map(
    "q42_faexport_submission" ->
      """SELECT * FROM (VALUES
        | ('fa','12345','2022-08-01 00:00:00','artist9','Sunrise',
        |  '2022-03-15 09:30:00','sun:0,sky:1','https://d.furaffinity.net/art/x.png',
        |  '{"thumbnail_url":"https://t.furaffinity.net/x.jpg","full_preview_url":"https://d.furaffinity.net/full/x.png","image_width":"1280","image_height":"720"}',
        |  '{"rating":"General","category":"Artwork","theme":"All","species":"Dragon","gender":"Male","fav_count":42,"comment_count":7,"view_count":1234}')
        |) t(website_id, site_submission_id, scan_datetime,
        |    uploader_site_user_id, title, datetime_posted, kw_csv, file_url,
        |    file_extra, extra_data)""".stripMargin,
    "q43_faexport_user_users" ->
      """SELECT * FROM (VALUES
        | ('fa','artist9',FALSE,'Artist Nine',
        |  '{"account_type":"Member","avatar_url":"https://a.fa/av.gif","user_title":"Painter","registered_datetime":"2019-01-02T03:04:05Z","guest_access":true,"current_mood":"happy","profile_html":"<p>hi</p>","view_count":100,"submission_count":12,"comments_received_count":34,"comments_given_count":56,"journal_count":3,"favorite_count":78,"featured_submission_id":"111","profile_id_submission_id":"222","artist_information":"info","contact_information":"contact","watchers_count":2,"watching_count":1,"watchers_recent":[{"site_user_id":"w1","display_name":"Watcher One"},{"site_user_id":"w2","display_name":"Watcher Two"}],"watching_recent":[{"site_user_id":"w3","display_name":"Watching Three"}]}'),
        | ('fa','w1',FALSE,'Watcher One',CAST(NULL AS VARCHAR)),
        | ('fa','w2',FALSE,'Watcher Two',CAST(NULL AS VARCHAR)),
        | ('fa','w3',FALSE,'Watching Three',CAST(NULL AS VARCHAR)),
        | ('fa','goneuser',TRUE,CAST(NULL AS VARCHAR),CAST(NULL AS VARCHAR))
        |) t(website_id, site_user_id, is_deleted, display_name, extra_data)""".stripMargin,
    "q44_faexport_user_featured" ->
      """SELECT * FROM (VALUES
        | ('fa','111','artist9','Feat',FALSE,'{"thumbnail_url":"https://t.fa/f.jpg"}'),
        | ('fa','222','artist9','PID',FALSE,'{"thumbnail_url":"https://t.fa/p.jpg"}')
        |) t(website_id, site_submission_id, uploader_site_user_id, title,
        |    keywords_recorded, file_extra)""".stripMargin,
    "q45_websites_listing" ->
      """SELECT website_id, full_name, link,
        | CAST(n_submission_snapshots AS BIGINT) AS n_submission_snapshots,
        | CAST(n_user_snapshots AS BIGINT) AS n_user_snapshots
        |FROM (VALUES
        | ('fa','Fur Affinity','https://furaffinity.net',4,3),
        | ('ws','Weasyl','https://weasyl.com',0,0)
        |) t(website_id, full_name, link, n_submission_snapshots, n_user_snapshots)""".stripMargin,
    "q46_contributors_listing" ->
      """SELECT name,
        | CAST(n_submission_snapshots AS BIGINT) AS n_submission_snapshots,
        | CAST(n_user_snapshots AS BIGINT) AS n_user_snapshots
        |FROM (VALUES ('alice',3,1), ('bob',1,2)
        |) t(name, n_submission_snapshots, n_user_snapshots)""".stripMargin,
    "q47_hash_algos_listing" ->
      """SELECT CAST(algo_id AS BIGINT) AS algo_id, language, algorithm_name,
        | CAST(n_hashes AS BIGINT) AS n_hashes
        |FROM (VALUES (1,'any','md5',3), (2,'rust','dhash',1), (3,'python','phash',1)
        |) t(algo_id, language, algorithm_name, n_hashes)""".stripMargin,
    "q48_fa_indexer" ->
      """SELECT * FROM (VALUES
        | ('fa','10','ua','T10','dx','2019-11-01 00:00:00','k1:0,k2:1',
        |  'https://f.fa/10.png','{"rating":"general"}'),
        | ('fa','12','ua','T12','plain','2019-11-02 00:00:00','',
        |  'https://f.fa/12.png','{"rating":"mature"}')
        |) t(website_id, site_submission_id, uploader_site_user_id, title,
        |    description, datetime_posted, kw_csv, file_url, extra_data)""".stripMargin,
    "q49_investigate_e621" ->
      """SELECT kind, value, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('protocol','https',3), ('protocol','http',1),
        | ('domain','twitter.com',2), ('domain','deviantart.com',1),
        | ('domain','a.example',1),
        | ('raw_domain','example.com',1),
        | ('twitter','artist1',2),
        | ('probably_wrong','posts',1)
        |) t(kind, value, n)""".stripMargin)

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
      """SELECT CAST(3 AS BIGINT) AS n_rows,
        | CAST(1 AS BIGINT) AS bad_created_at_parses,
        | CAST(1 AS BIGINT) AS bad_md5_len,
        | CAST(1 AS BIGINT) AS bad_is_deleted_domain,
        | CAST(1 AS BIGINT) AS bad_rating_domain,
        | CAST(1 AS BIGINT) AS bad_fav_count_nonneg,
        | CAST(1 AS BIGINT) AS bad_down_score_nonpos,
        | CAST(1 AS BIGINT) AS bad_up_score_nonneg,
        | CAST(1 AS BIGINT) AS bad_width_int,
        | CAST(1 AS BIGINT) AS bad_height_int""".stripMargin,
    "q61_sqlite_findfurrypicbot" ->
      """SELECT website_id, site_submission_id, scan_datetime, is_deleted,
        | hashes_csv
        |FROM (VALUES
        | ('fa','1','2020-01-09 00:00:00',FALSE,
        |  '3:31BF5573D0F26D8E,5:FD863B01647CB662,6:6749B9D0651F2ABC,7:95176C2468EED92B'),
        | ('fa','2','2020-01-09 00:00:00',FALSE,
        |  '3:FF39B4C31096E1B8,5:180957EFF8611A6C,6:1DCAAFCBD819D08D,7:A7EFA51463944F48'),
        | ('fa','300','2020-01-09 00:00:00',FALSE,
        |  '3:F0848FF62FDE0A78,5:B019A01E5E746FD6,6:B6F0A4C158367524,7:B43E4405CFFC03D9')
        |) t(website_id, site_submission_id, scan_datetime, is_deleted,
        |    hashes_csv)""".stripMargin,
    "q60_investigate_fuzzysearch" ->
      """SELECT kind, value, CAST(n AS BIGINT) AS n FROM (VALUES
        | ('rows','csv',6),
        | ('earliest','2022-05-02 00:00:00',1),
        | ('site','furaffinity',3), ('site','e621',1), ('site','weasyl',2),
        | ('weasyl_usernames','unique',2),
        | ('odd_weasyl','oddé',1),
        | ('odd_fa','bad!name',1)
        |) t(kind, value, n)""".stripMargin,
    "q52_validate_fuzzysearch" ->
      """SELECT CAST(6 AS BIGINT) AS n_rows,
        | CAST(1 AS BIGINT) AS bad_site_domain,
        | CAST(1 AS BIGINT) AS bad_id_charset,
        | CAST(1 AS BIGINT) AS bad_hash_long,
        | CAST(1 AS BIGINT) AS bad_deleted_domain,
        | CAST(1 AS BIGINT) AS bad_updated_parses,
        | CAST(1 AS BIGINT) AS bad_posted_parses""".stripMargin,
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
