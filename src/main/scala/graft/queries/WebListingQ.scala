package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Fixtures
import graft.ingest.{FaIndexer, Investigate}
import graft.ingest.FaexportFormats

/** FAExport web-format fan-out, fa_indexer JSON-dir ingest, the
  * investigate profiler, and the listing endpoints (Q3/Q8/Q9/Q10,
  * web.py:97–199) — oracles are literal VALUES locked from
  * run-inspected output after cross-checking each field against the
  * reference semantics. */
object WebListingQ {

  type Q = (SparkSession, String) => DataFrame

  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  private val faexportSubPayloads = Seq(
    """{"link":"https://www.furaffinity.net/view/12345/","profile_name":"artist9",""" +
      """"name":"Artist Nine","title":"Sunrise","description":"desc here",""" +
      """"posted_at":"2022-03-15T09:30:00","rating":"General","category":"Artwork",""" +
      """"theme":"All","species":"Dragon","gender":"Male","favorites":42,""" +
      """"comments":7,"views":1234,"keywords":["sun","sky"],""" +
      """"download":"https://d.furaffinity.net/art/x.png",""" +
      """"thumbnail":"https://t.furaffinity.net/x.jpg",""" +
      """"full":"https://d.furaffinity.net/full/x.png","resolution":"1280x720",""" +
      """"avatar":"https://a.furaffinity.net/artist9.gif"}""",
    """{"error":"Submission not found"}""")

  /** Q11/faexport_submission (faexport.py:18–68): 1 payload → 1
    * submission snapshot (+1 user, checked in WebFormatsSpec). */
  private val q42FaexportSubmission: Q = (s, _) => {
    import s.implicits._
    val resp = FaexportFormats.faexportSubmission(
      faexportSubPayloads.toDF("payload"), "payload",
      lit("alice"), to_timestamp(lit("2022-08-01 00:00:00")))
    resp.submissions.select(
      $"website_id", $"site_submission_id",
      fmt($"scan_datetime").as("scan_datetime"),
      $"uploader_site_user_id", $"title",
      fmt($"datetime_posted").as("datetime_posted"),
      concat_ws(",", transform($"keywords", k =>
        concat(k.getField("keyword"), lit(":"), k.getField("ordinal")))).as("kw_csv"),
      element_at($"files", 1).getField("file_url").as("file_url"),
      element_at($"files", 1).getField("extra_data").as("file_extra"),
      $"extra_data")
  }

  private val faexportUserPayloads = Seq(
    """{"profile":"https://www.furaffinity.net/user/artist9/","name":"Artist Nine",""" +
      """"account_type":"Member","avatar":"https://a.fa/av.gif","user_title":"Painter",""" +
      """"registered_at":"2019-01-02T03:04:05","guest_access":true,"current_mood":"happy",""" +
      """"artist_profile":"<p>hi</p>","pageviews":100,"submissions":12,""" +
      """"comments_received":34,"comments_given":56,"journals":3,"favorites":78,""" +
      """"featured_submission":{"id":"111","title":"Feat","thumbnail":"https://t.fa/f.jpg"},""" +
      """"profile_id":{"id":"222","title":"PID","thumbnail":"https://t.fa/p.jpg"},""" +
      """"artist_information":"info","contact_information":"contact",""" +
      """"watchers":{"count":2,"recent":[{"profile_name":"w1","name":"Watcher One"},""" +
      """{"profile_name":"w2","name":"Watcher Two"}]},""" +
      """"watching":{"count":1,"recent":[{"profile_name":"w3","name":"Watching Three"}]}}""",
    """{"error":"User has disabled their account: gone",""" +
      """"url":"https://www.furaffinity.net/user/goneuser/"}""")

  /** faexport_user users fan-out (faexport.py:74–142): main user +
    * watchers/watching + disabled-account deleted user. */
  private val q43FaexportUserUsers: Q = (s, _) => {
    import s.implicits._
    val resp = FaexportFormats.faexportUser(
      faexportUserPayloads.toDF("payload"), "payload",
      lit("bob"), to_timestamp(lit("2022-08-01 00:00:00")))
    resp.users.select(
      $"website_id", $"site_user_id", $"is_deleted", $"display_name", $"extra_data")
  }

  /** faexport_user featured/profile-id submissions (faexport.py:144–152,
    * 155–174). */
  private val q44FaexportUserFeatured: Q = (s, _) => {
    import s.implicits._
    val resp = FaexportFormats.faexportUser(
      faexportUserPayloads.toDF("payload"), "payload",
      lit("bob"), to_timestamp(lit("2022-08-01 00:00:00")))
    resp.submissions.select(
      $"website_id", $"site_submission_id", $"uploader_site_user_id",
      $"title", $"keywords_recorded",
      element_at($"files", 1).getField("extra_data").as("file_extra"))
  }

  /** Q8 websites.json — counts joined to the dimension in ONE pass
    * (web.py:172–179; the reference's per-row COUNT N+1,
    * website.py:19–35, deliberately not copied). */
  private val q45WebsitesListing: Q = (s, _) => {
    import s.implicits._
    val subCounts = Fixtures.submissionSnapshots(s)
      .groupBy($"website_id").agg(count(lit(1)).as("n_submission_snapshots"))
    val userCounts = Fixtures.userSnapshots(s)
      .groupBy($"website_id").agg(count(lit(1)).as("n_user_snapshots"))
    Fixtures.websites(s)
      .join(subCounts, Seq("website_id"), "left")
      .join(userCounts, Seq("website_id"), "left")
      .na.fill(0L, Seq("n_submission_snapshots", "n_user_snapshots"))
      .select($"website_id", $"full_name", $"link",
        $"n_submission_snapshots", $"n_user_snapshots")
  }

  /** Q10 archive_contributors.json (web.py:192–199). */
  private val q46ContributorsListing: Q = (s, _) => {
    import s.implicits._
    val subCounts = Fixtures.submissionSnapshots(s)
      .groupBy($"archive_contributor_id".as("contributor_id"))
      .agg(count(lit(1)).as("n_submission_snapshots"))
    val userCounts = Fixtures.userSnapshots(s)
      .groupBy($"archive_contributor_id".as("contributor_id"))
      .agg(count(lit(1)).as("n_user_snapshots"))
    Fixtures.contributors(s)
      .join(subCounts, Seq("contributor_id"), "left")
      .join(userCounts, Seq("contributor_id"), "left")
      .na.fill(0L, Seq("n_submission_snapshots", "n_user_snapshots"))
      .select($"name", $"n_submission_snapshots", $"n_user_snapshots")
  }

  /** Q9 hash_algos.json with per-algo hash counts (web.py:182–189,
    * file.py:276–283). */
  private val q47HashAlgosListing: Q = (s, _) => {
    import s.implicits._
    val counts = Fixtures.fileHashes(s)
      .groupBy($"algo_id").agg(count(lit(1)).as("n_hashes"))
    Fixtures.hashAlgos(s)
      .join(counts, Seq("algo_id"), "left")
      .na.fill(0L, Seq("n_hashes"))
      .select($"algo_id", $"language", $"algorithm_name", $"n_hashes")
  }

  // NUL travels JSON-escaped (backslash-u0000) like in the real dumps;
  // built by concatenation so the Scala lexer does not eat the escape
  private val nul = "\\" + "u0000"
  private val faIndexerPayload =
    s"""{"10":{"id":10,"username":"ua","title":"T10","description":"d${nul}x",""" +
      """"date":"2019-11-01 00:00:00","rating":"general","keywords":["k1","k2"],""" +
      """"filename":"https://f.fa/10.png"},"11":null,""" +
      """"12":{"id":12,"username":"ua","title":"T12","description":"plain",""" +
      """"date":"2019-11-02 00:00:00","rating":"mature","keywords":[],""" +
      """"filename":"https://f.fa/12.png"}}"""

  /** S4 fa_indexer JSON-dir ingest: null entries skipped, NULs stripped
    * (F15), ordered keywords, rating extra. */
  private val q48FaIndexer: Q = (s, _) => {
    import s.implicits._
    FaIndexer.submissions(
      Seq(faIndexerPayload).toDF("payload"), "payload",
      to_timestamp(lit("2019-12-04 00:00:00")),
      to_timestamp(lit("2019-12-05 00:00:00")))
      .select(
        $"website_id", $"site_submission_id", $"uploader_site_user_id",
        $"title", $"description",
        fmt($"datetime_posted").as("datetime_posted"),
        concat_ws(",", transform($"keywords", k =>
          concat(k.getField("keyword"), lit(":"), k.getField("ordinal")))).as("kw_csv"),
        element_at($"files", 1).getField("file_url").as("file_url"),
        $"extra_data")
  }

  /** A5/F18 — investigate report over a source-URL fixture. */
  private val q49InvestigateE621: Q = (s, _) => {
    import s.implicits._
    val rows = Seq(
      ("1", "https://twitter.com/artist1/status/123\nhttps://www.deviantart.com/a/art/1"),
      ("2", "http://twitter.com/artist1?lang=en"),
      ("3", "example.com"),
      ("4", "https://a.example/x, https://b.example/y"),
      ("5", "")).toDF("id", "source")
    Investigate.e621Sources(rows)
  }

  val queries: Map[String, Q] = Map(
    "q42_faexport_submission" -> q42FaexportSubmission,
    "q43_faexport_user_users" -> q43FaexportUserUsers,
    "q44_faexport_user_featured" -> q44FaexportUserFeatured,
    "q45_websites_listing" -> q45WebsitesListing,
    "q46_contributors_listing" -> q46ContributorsListing,
    "q47_hash_algos_listing" -> q47HashAlgosListing,
    "q48_fa_indexer" -> q48FaIndexer,
    "q49_investigate_e621" -> q49InvestigateE621)

  val oracles: Map[String, String] = Oracles.webListing
}
