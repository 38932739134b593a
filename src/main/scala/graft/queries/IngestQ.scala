package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Formats, Normalize}

/** Ingest-path queries (SURVEY §2.2, §3.2–3.3): each format converter
  * runs over a small embedded fixture dump and emits flat converted
  * columns; the oracle is the hand-derived expected output (literal
  * VALUES), locking the conversion expressions (F1–F18) end to end.
  * Surrogate ids are engine-specific hashes and are never emitted.
  */
object IngestQ {

  type Q = (SparkSession, String) => DataFrame

  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  private def csvOf(s: SparkSession, lines: Seq[String]): DataFrame =
    s.read.option("header", "true").csv(s.createDataset(lines)(Encoders.STRING))

  // ---- e621 db_export fixture (29 columns, S3) ----
  private val e621Header =
    "id,uploader_id,created_at,md5,source,rating,image_width,image_height," +
      "tag_string,locked_tags,fav_count,file_ext,parent_id,change_seq," +
      "approver_id,file_size,comment_count,description,duration,updated_at," +
      "is_deleted,is_pending,is_flagged,score,up_score,down_score," +
      "is_rating_locked,is_status_locked,is_note_locked"
  private val e621Rows = Seq(
    "1001,77,2022-07-01 12:30:45.123456,aabbccdd00112233445566778899aabb," +
      "https://a.example/x ,s,800,600,dragon art sky,,5,png,,12,,12345,2," +
      "A pic,,2022-07-02 00:00:00,f,f,f,10,12,-2,f,f,t",
    "1002,88,2022-07-03 08:00:00,ffee00112233445566778899aabbccdd,,e,-1,-1," +
      "wolf,,0,swf,5,13,9,999,-1,second,0.0,,t,t,f,-3,0,-5,t,f,f")

  private val q36IngestE621: Q = (s, _) => {
    import s.implicits._
    val converted = Formats.e621(
      csvOf(s, e621Header +: e621Rows),
      to_timestamp(lit("2022-07-13 00:00:00")),
      to_timestamp(lit("2022-07-14 00:00:00")))
    val (snaps, kw, files, hashes) = Normalize.splitChildren(converted)
    val kwAgg = kw.groupBy("submission_snapshot_id")
      .agg(concat_ws(",", collect_list($"keyword")).as("kw_csv"),
        count(lit(1)).as("n_keywords"))
    snaps
      .join(kwAgg, Seq("submission_snapshot_id"), "left")
      .join(files, Seq("submission_snapshot_id"))
      .join(hashes, Seq("file_id"))
      .select(
        $"website_id", $"site_submission_id", $"uploader_site_user_id",
        $"is_deleted", fmt($"scan_datetime").as("scan_datetime"),
        fmt($"datetime_posted").as("datetime_posted"),
        $"description", $"n_keywords", $"kw_csv",
        $"file_url", $"file_size", files("extra_data").as("file_extra"),
        $"algo_id", upper(hex($"hash_value")).as("md5_hex"),
        snaps("extra_data").as("extra_data"))
  }

  /** e621 --validate over the fixture plus one row violating EVERY
    * rule (ingestion_job.py --validate; SURVEY §5) — without it all
    * counts are zero and the predicates themselves go unproven. Rows
    * 1001/1002 violate nothing structural (negative width is allowed,
    * main.py:106). */
  private val q37ValidateE621: Q = (s, _) => {
    Formats.e621Validate(csvOf(s, e621Header +: (e621Rows :+
      "9999,1,notadate,abc,,zz,w1,h2,,,-5,png,,1,,10,0,bad,,,maybe,f,f,0,-1,3,f,f,f")))
  }

  // ---- fuzzysearch dump fixture (9 columns, S2) ----
  private val fuzzyHeader = "site,id,artists,hash,posted_at,updated_at,sha256,deleted,content_url"
  private val fuzzyRows = Seq(
    "furaffinity,111,artA,,2022-05-01 00:00:00,2022-05-02 00:00:00,,false,", // empty hash → skipped
    "furaffinity,222,artB,-6510615555426900571,2022-05-30 00:00:00,2022-06-01 10:00:00,qrvM3Q==,false,https://d.example/f.png",
    "e621,333,artC,81985529216486895,,,,true,")

  private val q38IngestFuzzysearch: Q = (s, _) => {
    import s.implicits._
    val converted = Formats.fuzzysearch(
      csvOf(s, fuzzyHeader +: fuzzyRows),
      to_timestamp(lit("2022-06-22 00:00:00")))
    val (snaps, _, files, hashes) = Normalize.splitChildren(converted)
    val hashAgg = hashes.groupBy("file_id")
      .agg(concat_ws(",", sort_array(collect_list(
        concat($"algo_id".cast("string"), lit(":"), upper(hex($"hash_value")))))).as("hashes_csv"))
    snaps
      .join(files, Seq("submission_snapshot_id"))
      .join(hashAgg, Seq("file_id"))
      .select(
        $"website_id", $"site_submission_id",
        fmt($"scan_datetime").as("scan_datetime"), $"is_deleted",
        fmt($"datetime_posted").as("datetime_posted"),
        $"file_url", $"hashes_csv")
  }

  // ---- foxoblue userlist fixture (3 columns, S2) ----
  private val foxoHeader = "username,updated_at,error"
  private val foxoRows = Seq(
    "userA,2022-03-04 05:06:07,NULL",
    "userB,NULL,NULL",
    "userC,NULL,unknown_user", // skipped (P5)
    "userD,NULL,account_disabled") // deleted

  private val q39IngestFoxoblue: Q = (s, _) => {
    import s.implicits._
    Formats.foxoblue(
      csvOf(s, foxoHeader +: foxoRows),
      to_timestamp(lit("2022-01-02 00:00:00")),
      to_timestamp(lit("2022-01-03 00:00:00")))
      .select($"website_id", $"site_user_id",
        fmt($"scan_datetime").as("scan_datetime"), $"is_deleted")
  }

  // ---- web-push submission format (S6) ----
  private val webPayload =
    """{"website_id":"fa","site_submission_id":"55",""" +
      """"scan_datetime":"2022-04-01T10:00:00","title":"T",""" +
      """"ordered_keywords":["b","a"],""" +
      """"files":[{"site_file_id":"f1","file_url":"https://u.example/1.png",""" +
      """"file_size":10,"file_hashes":[{"algo_id":1,"hash_value":"qrvM3Q=="}]}]}"""

  private val q40IngestWebSubmission: Q = (s, _) => {
    import s.implicits._
    val payloads = Seq(webPayload).toDF("payload")
    val converted = Formats.webSubmission(payloads, "payload",
      lit("alice"), to_timestamp(lit("2022-04-02 00:00:00")))
    val (snaps, kw, files, hashes) = Normalize.splitChildren(converted)
    val kwAgg = kw.groupBy("submission_snapshot_id")
      .agg(concat_ws(",", sort_array(collect_list(
        concat($"keyword", lit(":"), $"ordinal".cast("string"))))).as("kw_csv"))
    snaps
      .join(kwAgg, Seq("submission_snapshot_id"), "left")
      .join(files, Seq("submission_snapshot_id"))
      .join(hashes, Seq("file_id"))
      .select(
        $"website_id", $"site_submission_id",
        fmt($"scan_datetime").as("scan_datetime"),
        $"is_deleted", $"keywords_recorded", $"title", $"kw_csv",
        $"site_file_id", $"file_url", $"file_size",
        upper(hex($"hash_value")).as("hash_hex"))
  }

  /** fuzzysearch --validate over a fixture with one bad-charset id and
    * one bad site (F16 charset predicates). */
  private val q52ValidateFuzzy: Q = (s, _) => {
    Formats.fuzzysearchValidate(csvOf(s, fuzzyHeader +: (fuzzyRows ++ Seq(
      "badsite,444,a,,,,,false,",
      "weasyl,has spaces!,a,,,,,true,",
      // violates hash-long, both date parses, and the deleted domain —
      // without it those four predicates count zero and go unproven
      "e621,555,a,notanumber,badposted,badupdated,,yes,"))))
  }

  /** fuzzysearch --investigate over a fixture exercising every report
    * kind: an odd weasyl username (non-printable char), an odd FA
    * username ('!' outside the allowed set), and an e621 row that must
    * skip username checks. */
  private val q60InvestigateFuzzy: Q = (s, _) => {
    graft.ingest.Investigate.fuzzysearchDump(csvOf(s, fuzzyHeader +: (fuzzyRows ++ Seq(
      "weasyl,444,oddé,,,,,false,",
      "weasyl,555,goodname,,,,,false,",
      "furaffinity,666,bad!name,,,,,false,"))))
  }

  /** findfurrypicbot over the REAL SQLite read path (S5): the fixture
    * .sqlite3 (multi-level B-tree, 512-byte pages) is scanned by
    * [[graft.sources.SqliteFile]], converted, and three sample posts
    * emitted with full hash fidelity; SqliteSpec covers all 300 rows
    * byte-for-byte. */
  private val q61SqliteFindfurrypicbot: Q = (s, _) => {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempFile("graft_fa_bin", ".sqlite3")
    tmp.toFile.deleteOnExit() // lazily scanned later, so clean up at JVM exit
    val in = getClass.getResourceAsStream("/graft/fixtures/fa_bin.sqlite3")
    try java.nio.file.Files.copy(in, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    val posts = graft.sources.SqliteFile.read(s, tmp.toString, "posts")
    val nested = graft.ingest.BulkSources.findfurrypicbot(posts,
      to_timestamp(lit("2020-01-09 00:00:00")),
      to_timestamp(lit("2020-01-10 00:00:00")))
    nested
      .filter($"site_submission_id".isin("1", "2", "300"))
      .select($"website_id", $"site_submission_id",
        fmt($"scan_datetime").as("scan_datetime"), $"is_deleted",
        concat_ws(",", sort_array(transform(
          $"files".getField("hashes").getItem(0),
          h => concat(h.getField("algo_id").cast("string"), lit(":"),
            upper(hex(h.getField("hash_value"))))))).as("hashes_csv"))
  }

  val queries: Map[String, Q] = Map(
    "q52_validate_fuzzysearch" -> q52ValidateFuzzy,
    "q60_investigate_fuzzysearch" -> q60InvestigateFuzzy,
    "q61_sqlite_findfurrypicbot" -> q61SqliteFindfurrypicbot,
    "q36_ingest_e621" -> q36IngestE621,
    "q37_validate_e621" -> q37ValidateE621,
    "q38_ingest_fuzzysearch" -> q38IngestFuzzysearch,
    "q39_ingest_foxoblue" -> q39IngestFoxoblue,
    "q40_ingest_web_submission" -> q40IngestWebSubmission)

  /** Oracles filled in after output inspection — see ORACLES val. */
  val oracles: Map[String, String] = Oracles.ingest
}
