package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{FaexportFormats, Formats}

/** Converter edge cases the fixture queries don't hit: explicit
  * keyword structs, null resolution, error-payload drops, validate-mode
  * violation counting, weasyl site passthrough. */
class WebFormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("webSubmission: explicit keyword structs with mixed ordinals pass through") {
    val s = spark
    import s.implicits._
    val payload =
      """{"website_id":"fa","site_submission_id":"7",""" +
        """"scan_datetime":"2022-01-01T00:00:00",""" +
        """"keywords":[{"keyword":"z","ordinal":5},{"keyword":"a"}]}"""
    val out = Formats.webSubmission(Seq(payload).toDF("payload"), "payload",
      lit("c"), to_timestamp(lit("2022-01-02 00:00:00")))
      .select(expr("transform(keywords, k -> concat(k.keyword, ':', coalesce(cast(k.ordinal as string), 'null')))"))
      .head().getSeq[String](0)
    assert(out === Seq("z:5", "a:null"))
  }

  test("faexportSubmission: null resolution yields null width/height, error payload drops") {
    val s = spark
    import s.implicits._
    val payloads = Seq(
      """{"link":"https://x/view/9/","profile_name":"p","name":"P","title":"t",""" +
        """"description":"d","posted_at":"2022-01-01T00:00:00","rating":"G",""" +
        """"category":"c","theme":"t","species":"s","gender":"g","favorites":1,""" +
        """"comments":2,"views":3,"keywords":[],"download":"u","thumbnail":"th",""" +
        """"full":"f","resolution":null,"avatar":"a"}""",
      """{"error":"boom"}""").toDF("payload")
    val resp = FaexportFormats.faexportSubmission(payloads, "payload",
      lit("c"), to_timestamp(lit("2022-08-01 00:00:00")))
    val subs = resp.submissions.collect()
    assert(subs.length === 1) // error payload dropped (faexport.py:21-22)
    val fileExtra = resp.submissions
      .select(element_at($"files", 1).getField("extra_data")).head().getString(0)
    assert(fileExtra.contains("\"image_width\":null"))
    assert(resp.users.count() === 1L)
  }

  test("e621Validate counts actual violations per rule") {
    val s = spark
    import s.implicits._
    val header = "id,uploader_id,created_at,md5,source,rating,image_width," +
      "image_height,tag_string,locked_tags,fav_count,file_ext,parent_id," +
      "change_seq,approver_id,file_size,comment_count,description,duration," +
      "updated_at,is_deleted,is_pending,is_flagged,score,up_score,down_score," +
      "is_rating_locked,is_status_locked,is_note_locked"
    val bad = "2,1,not-a-date,ab,src,x,800,600,t,,-5,png,,1,,10,0,d,,," +
      "maybe,f,f,0,-1,3,f,f,f" // bad date, short md5, bad rating, negative fav, bad deleted, neg up, pos down
    val good = "1,1,2022-01-01 00:00:00,aabbccddeeff,src,s,800,600,t,,0,png,,1,,10,0,d,,,f,f,f,0,0,0,f,f,f"
    val res = Formats.e621Validate(
      s.read.option("header", "true").csv(s.createDataset(Seq(header, good, bad))(
        org.apache.spark.sql.Encoders.STRING))).head()
    assert(res.getAs[Long]("n_rows") === 2L)
    assert(res.getAs[Long]("bad_created_at_parses") === 1L)
    assert(res.getAs[Long]("bad_md5_len") === 1L)
    assert(res.getAs[Long]("bad_rating_domain") === 1L)
    assert(res.getAs[Long]("bad_fav_count_nonneg") === 1L)
    assert(res.getAs[Long]("bad_is_deleted_domain") === 1L)
    assert(res.getAs[Long]("bad_up_score_nonneg") === 1L)
    assert(res.getAs[Long]("bad_down_score_nonpos") === 1L)
  }

  test("fuzzysearch: weasyl site passes through; furaffinity maps to fa") {
    val s = spark
    import s.implicits._
    val header = "site,id,artists,hash,posted_at,updated_at,sha256,deleted,content_url"
    val rows = Seq(
      "weasyl,1,a,5,,2022-01-01 00:00:00,,false,",
      "furaffinity,2,a,6,,2022-01-01 00:00:00,,false,")
    val out = Formats.fuzzysearch(
      s.read.option("header", "true").csv(
        s.createDataset(header +: rows)(org.apache.spark.sql.Encoders.STRING)),
      to_timestamp(lit("2022-06-22 00:00:00")))
      .select($"website_id").collect().map(_.getString(0)).sorted
    assert(out === Array("fa", "weasyl"))
  }
}
