package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Fixtures
import graft.ingest.{Formats, Normalize}
import graft.maintenance.Dump
import graft.storage.Storage
import graft.streaming.StreamingIngest

/** Storage registry, dimension upsert, JSONL dump, and the Structured
  * Streaming ingest path (file-drop source → foreachBatch append). */
class StorageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    Files.createTempDirectory("graft_storage").toString

  test("append + read roundtrip with website_id partitioning") {
    val s = spark
    val st = new Storage(s, tmpDir())
    st.append("submission_snapshots", Fixtures.submissionSnapshots(s))
    val back = st.read("submission_snapshots")
    assert(back.count() === 4L)
    // partition column survives (moved to directory, still readable)
    assert(back.select("website_id").distinct().collect().map(_.getString(0)).toSet === Set("fa"))
    // appends accumulate
    st.append("submission_snapshots", Fixtures.submissionSnapshots(s))
    assert(st.read("submission_snapshots").count() === 8L)
  }

  test("dimension upsert is get-or-create (A10/A11)") {
    val s = spark
    import s.implicits._
    val st = new Storage(s, tmpDir())
    st.upsertDimension("websites", Fixtures.websites(s), Seq("website_id"))
    st.upsertDimension("websites", Fixtures.websites(s), Seq("website_id")) // no-op
    val extra = Seq(("sf", "SoFurry", "https://sofurry.com")).toDF("website_id", "full_name", "link")
    st.upsertDimension("websites", Fixtures.websites(s).union(extra), Seq("website_id"))
    assert(st.read("websites").count() === 3L)
    st.initSettings()
    assert(st.read("settings").filter($"setting_id" === "version")
      .head().getString(1) === "0.2.1")
  }

  test("overwrite rewrites a table in place (repair target)") {
    val s = spark
    val st = new Storage(s, tmpDir())
    st.append("submission_snapshot_keywords", Fixtures.keywords(s))
    st.overwrite("submission_snapshot_keywords",
      st.read("submission_snapshot_keywords").filter(col("keyword_id") <= 2L))
    assert(st.read("submission_snapshot_keywords").count() === 2L)
  }

  test("JSONL dump is uncapped and valid JSON per line (S8, A8 fix)") {
    val s = spark
    val out = tmpDir() + "/dump"
    Dump.snapshotsJsonl(Fixtures.submissionSnapshots(s), out)
    val lines = s.read.textFile(out).collect()
    assert(lines.length === 4)
    lines.foreach { l =>
      assert(l.startsWith("{") && l.contains("\"website_id\":\"fa\""))
    }
  }

  test("Bootstrap seeds dimensions and settings idempotently") {
    val s = spark
    import s.implicits._
    val st = new Storage(s, tmpDir())
    graft.storage.Bootstrap.init(st, s)
    graft.storage.Bootstrap.init(st, s) // idempotent
    assert(st.read("websites").count() === 3L)
    assert(st.read("hash_algos").count() === 7L)
    assert(st.read("settings").filter($"setting_id" === "version").count() === 1L)
    assert(st.read("hash_algos")
      .filter($"language" === "python" && $"algorithm_name" === "phash")
      .head().getLong(0) === 3L)
  }

  test("DataQuality.observe counts violations inside the ingest pass; enforce drops them") {
    val s = spark
    import s.implicits._
    import graft.engine.DataQuality
    val rows = Seq(("a", 1), ("b", -2), ("", 3), ("d", -4)).toDF("name", "v")
    val checks = Seq(
      "name_nonempty" -> (length(col("name")) > 0),
      "v_positive" -> (col("v") > 0))
    val obs = DataQuality.observed(rows, "gate", checks)
    obs.collect() // one action on this QE; counters ride along
    val m = DataQuality.metricsOf(obs, "gate").get
    assert(m.getAs[Long]("n_rows") === 4L)
    assert(m.getAs[Long]("bad_name_nonempty") === 1L)
    assert(m.getAs[Long]("bad_v_positive") === 2L)
    assert(DataQuality.enforce(rows, checks).count() === 1L)
  }

  test("website_id point lookups prune to one hive partition") {
    val s = spark
    val st = new Storage(s, tmpDir())
    st.append("submission_snapshots", Fixtures.submissionSnapshots(s))
    // add a second website so pruning has something to skip
    st.append("submission_snapshots",
      Fixtures.submissionSnapshots(s).withColumn("website_id", lit("ws")))
    val q = st.read("submission_snapshots").filter(col("website_id") === "fa")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(q.count() === 4L)
    val planLine = scan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(planLine.contains("website_id"), planLine)
  }

  test("compaction shrinks the file count without changing contents") {
    val s = spark
    val st = new Storage(s, tmpDir())
    // simulate micro-batch appends: many small files
    (1 to 5).foreach(_ => st.append("submission_snapshots", Fixtures.submissionSnapshots(s)))
    def files() = new java.io.File(st.path("submission_snapshots"))
      .listFiles().filter(_.getName.startsWith("website_id="))
      .flatMap(_.listFiles()).count(_.getName.endsWith(".parquet"))
    val before = st.read("submission_snapshots")
      .orderBy("submission_snapshot_id", "scan_datetime").toJSON.collect().toSeq
    assert(files() >= 5)
    st.compact("submission_snapshots")
    assert(files() === 1)
    val after = st.read("submission_snapshots")
      .orderBy("submission_snapshot_id", "scan_datetime").toJSON.collect().toSeq
    assert(after === before)
  }

  test("bucketed entity-key layout makes the merge aggregation shuffle-free (SURVEY §4.4)") {
    val s = spark
    val st = new Storage(s, tmpDir())
    st.appendBucketed("user_snapshots_bucketed", Fixtures.userSnapshots(s),
      Seq("website_id", "site_user_id"), numBuckets = 4)
    val merged = graft.engine.Merge.mergeUsers(st.readBucketed("user_snapshots_bucketed"))
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"merge over bucketed table should not shuffle:\n$plan")
    // same results as the unbucketed path
    val viaBuckets = merged.orderBy("site_user_id").toJSON.collect().toSeq
    val direct = graft.engine.Merge.mergeUsers(Fixtures.userSnapshots(s))
      .orderBy("site_user_id").toJSON.collect().toSeq
    assert(viaBuckets === direct)
  }

  test("streaming ingest: file-drop source flows through the batch converter (T1)") {
    val s = spark
    val root = tmpDir()
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"
    new java.io.File(inDir).mkdirs()
    // drop a foxoblue-style file? No — submission path: use the web
    // payload JSONL as the drop format
    val payload =
      """{"website_id":"fa","site_submission_id":"77",""" +
        """"scan_datetime":"2022-04-05T10:00:00","title":"Streamed",""" +
        """"unordered_keywords":["x","y"],"files":[]}"""
    Files.writeString(java.nio.file.Paths.get(s"$inDir/batch1.txt"), payload)
    val st = new Storage(s, s"$root/tables")
    val source = s.readStream.text(inDir).toDF("payload")
    val q = StreamingIngest.startSubmissionIngest(
      source,
      df => Formats.webSubmission(df, "payload", lit("alice"),
        to_timestamp(lit("2022-04-06 00:00:00"))),
      st, ckpt, Trigger.AvailableNow())
    q.awaitTermination(60000)
    val snaps = st.read("submission_snapshots")
    assert(snaps.count() === 1L)
    assert(snaps.head().getAs[String]("title") === "Streamed")
    assert(st.read("submission_snapshot_keywords").count() === 2L)
    // resume: re-dropping the same file name is checkpointed away; a new
    // file appends
    val payload2 = payload.replace("\"77\"", "\"78\"")
    Files.writeString(java.nio.file.Paths.get(s"$inDir/batch2.txt"), payload2)
    val q2 = StreamingIngest.startSubmissionIngest(
      source,
      df => Formats.webSubmission(df, "payload", lit("alice"),
        to_timestamp(lit("2022-04-06 00:00:00"))),
      st, ckpt, Trigger.AvailableNow())
    q2.awaitTermination(60000)
    assert(st.read("submission_snapshots").count() === 2L)
  }
}
