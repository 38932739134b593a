package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Api
import graft.engine.Fixtures
import graft.ingest.{BulkSources, Enrichment, Normalize}
import graft.storage.Storage

/** End-to-end API surface over Storage: ingest → point lookups → merge
  * → web envelopes; plus the S5/S7/P4 source helpers. */
class ApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshApi(): Api = {
    val s = spark
    val root = Files.createTempDirectory("graft_api").toString
    val st = new Storage(s, root)
    st.append("submission_snapshots", Fixtures.submissionSnapshots(s))
    st.append("submission_snapshot_keywords", Fixtures.keywords(s))
    st.append("submission_snapshot_files", Fixtures.files(s))
    st.append("submission_snapshot_file_hashes", Fixtures.fileHashes(s))
    st.append("user_snapshots", Fixtures.userSnapshots(s))
    st.append("archive_contributors", Fixtures.contributors(s))
    new Api(st)
  }

  test("viewSubmission merges one entity; listSubmissions distinct (Q1/Q3)") {
    val api = freshApi()
    val row = api.viewSubmission("fa", "s1").collect()
    assert(row.length === 1)
    assert(row.head.getAs[String]("title") === "Final Title")
    assert(api.viewSubmission("fa", "missing").count() === 0L)
    assert(api.listSubmissions("fa").collect().map(_.getString(0)).sorted
      === Array("s1", "s2"))
  }

  test("Verify.runOne and submissionJsonOr404 release operator-retained frames") {
    val s = spark
    import s.implicits._
    import graft.engine.CacheRegistry
    CacheRegistry.releaseAll()
    val out = Files.createTempDirectory("graft_verify_scope").toString
    // a query that retains internally, like Dedup/Similarity do
    Verify.runOne(s, "unused", out, "retainer",
      (sp, _) => {
        val df = CacheRegistry.retain(Seq(1, 2, 3).toDF("v"))
        assert(CacheRegistry.liveCount === 1)
        df
      })
    assert(CacheRegistry.liveCount === 0,
      "Verify's per-query scope must release retained frames")
    assert(s.read.parquet(s"$out/retainer").count() === 3L)
    // a FAILING query releases too (withRetained releases on exception)
    Verify.runOne(s, "unused", out, "boom",
      (sp, _) => {
        CacheRegistry.retain(Seq(1).toDF("v"))
        throw new RuntimeException("boom")
      })
    assert(CacheRegistry.liveCount === 0)
    // the materializing Api entry point is scoped the same way
    val api = freshApi()
    assert(Api.submissionJsonOr404(api, "fa", "s1").contains("cache_data"))
    assert(CacheRegistry.liveCount === 0)
  }

  test("hashSearch joins through files to snapshots (Q7)") {
    val api = freshApi()
    val hits = api.hashSearch(1L, Array(0xAA.toByte, 0xBB.toByte, 0x01.toByte))
      .select("submission_snapshot_id").collect().map(_.getLong(0)).sorted
    assert(hits === Array(101L, 102L))
  }

  test("web JSON envelopes carry the reference shape (submission.py:106-125)") {
    val api = freshApi()
    val json = Api.submissionWebJson(api.viewSubmission("fa", "s1"))
      .head().getString(0)
    assert(json.contains(""""cache_data":{"snapshot_count":3"""))
    assert(json.contains(""""submission_data":{"is_deleted":true"""))
    assert(json.contains(""""file_hashes":[{"algo_id":1,"hash_value":"7v8D"}"""))
    val userJson = Api.userWebJson(api.viewUser("fa", "u9")).head().getString(0)
    assert(userJson.contains(""""user_data":{"is_deleted":true,"display_name":"Niner""""))
  }

  test("format registry resolves the four web formats; 404 envelope for missing entities") {
    import graft.ingest.FormatRegistry
    assert(FormatRegistry.all.keySet ===
      Set("submission", "user", "faexport_submission", "faexport_user"))
    assert(FormatRegistry.lookup("nope").isEmpty)
    val api = freshApi()
    val ok = Api.submissionJsonOr404(api, "fa", "s1")
    assert(ok.contains("\"cache_data\""))
    val miss = Api.submissionJsonOr404(api, "fa", "zzz")
    assert(miss === """{"error":{"code":404,"message":"Submission fa/zzz not found"}}""")
  }

  test("ingest acks counts and lands in storage (A6 fix)") {
    val s = spark
    import s.implicits._
    val api = freshApi()
    val payload =
      """{"website_id":"fa","site_submission_id":"90",""" +
        """"scan_datetime":"2022-05-01T00:00:00","title":"New",""" +
        """"unordered_keywords":["k"],"files":[]}"""
    val nested = graft.ingest.Formats.webSubmission(
      Seq(payload).toDF("payload"), "payload",
      lit("alice"), to_timestamp(lit("2022-05-02 00:00:00")))
    val ack = api.ingestSubmissions(nested)
    assert(ack("submission_snapshots") === 1L)
    assert(ack("submission_snapshot_keywords") === 1L)
    assert(api.viewSubmission("fa", "90").head().getAs[String]("title") === "New")
  }

  test("findfurrypicbot posts → 4 hashes per file (S5)") {
    val s = spark
    import s.implicits._
    val posts = Seq((42L, Array[Byte](1), Array[Byte](2), Array[Byte](3), Array[Byte](4)))
      .toDF("id", "a_hash", "p_hash", "d_hash", "w_hash")
    val nested = BulkSources.findfurrypicbot(posts,
      to_timestamp(lit("2020-01-09 00:00:00")),
      to_timestamp(lit("2020-01-10 00:00:00")))
    val (_, _, files, hashes) = Normalize.splitChildren(nested)
    assert(files.count() === 1L)
    assert(hashes.select("algo_id").collect().map(_.getLong(0)).sorted
      === Array(3L, 5L, 6L, 7L))
  }

  test("skipRows resumes after N in stable order (P4)") {
    val s = spark
    import s.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    val resumed = BulkSources.skipRows(df, "id", 7).collect().map(_.getLong(0))
    assert(resumed === Array(8L, 9L, 10L))
  }

  test("enrichment: cache hit, memoized lookup, username guess (S7/F15)") {
    val s = spark
    import s.implicits._
    val df = Seq("Artist Name!", "Cached One", "Artist Name!").toDF("display")
    var calls = 0
    val out = Enrichment.enrichUsernames(
      df, "display", Map("Cached One" -> "precached"), minIntervalMs = 0L,
      lookup = d => { calls += 1; Some(Enrichment.guessUsername(d)) })
      .collect().map(_.getString(1))
    assert(out.toSet === Set("artistname", "precached"))
    assert(Enrichment.guessUsername("A_b-C 9") === "abc9")
  }
}
